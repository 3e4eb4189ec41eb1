from .aggregate import hourly_event_counts, run_stream_once, sessionize

__all__ = ["hourly_event_counts", "run_stream_once", "sessionize"]
