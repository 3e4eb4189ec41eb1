from .relational import (
    anti_join,
    semi_join,
    top_k,
    top_k_per_group,
    yoy_growth,
)
from .normalize import explode_multivalue, normalize_multivalue, surrogate_key
from .quality import assert_referential, assert_unique, null_counts

__all__ = [
    "anti_join",
    "semi_join",
    "top_k",
    "top_k_per_group",
    "yoy_growth",
    "explode_multivalue",
    "normalize_multivalue",
    "surrogate_key",
    "assert_referential",
    "assert_unique",
    "null_counts",
]
