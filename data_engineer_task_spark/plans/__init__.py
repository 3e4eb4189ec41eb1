from .netflix import NetflixPipeline, transform

__all__ = ["NetflixPipeline", "transform"]
