"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains necessary when one side must be
replicated deterministically (e.g. a hot-key dimension join inside a
larger pipeline, or engines/stages where AQE can't split). Pattern:
replicate the small side once per salt, scatter the big side uniformly,
join on (key, salt) — the hot key's rows spread over ``n_salts``
reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated ``n_salts``× and the big
    side salted uniformly. Exact for inner/left-shaped joins (each big
    row joins exactly the one replica matching its salt); right/full
    would keep every unmatched replica — n_salts duplicates — so they
    are rejected."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: an outer "
            "small side would emit each unmatched row once per salt replica"
        )
    on = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_small = small.select("*", salts).withColumn(
        "_salt", F.col("_salt").cast("bigint")
    )
    return salted_big.join(replicated_small, [*on, "_salt"], how).drop("_salt")
