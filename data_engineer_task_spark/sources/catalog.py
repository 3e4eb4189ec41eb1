"""Testdata catalog helpers: load driver parquet tables, register views.

Every table in TESTDATA.md is one parquet file under
``{sf_dir}/{name}.parquet``. ``register_testdata`` mirrors the DuckDB
oracle's pre-registered views so ``spark.sql`` text matches oracle SQL
table names one-for-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older driver testdata stored events.ts as TIMESTAMP(NANOS),
        # which Spark's reader rejects. Read nanos as long and
        # floor-convert to micros — identical to DuckDB's ns→us
        # truncation, so oracle-safe.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _normalize_ntz(spark, raw)


def _normalize_ntz(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Cast any timestamp_ntz column to timestamp (LTZ).

    The driver parquet stores naive micros (isAdjustedToUTC=false);
    Spark 4 infers those as TIMESTAMP_NTZ, which `unix_micros`,
    `window`, and friends reject. The DuckDB oracle treats the same
    values as UTC instants, so the correct reading is "wall clock IS
    UTC": pin the session timezone to UTC (idempotent, runtime-safe)
    and cast — the stored micros are then preserved bit-for-bit.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz_cols:
        return df
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return df.withColumns(
        {c: F.col(c).cast("timestamp") for c in ntz_cols}
    )


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


_ROW_COUNT_CACHE: dict[tuple, int] = {}

# Conservative per-value estimate for a broadcast row's in-memory cost;
# with the 256 MiB working cap below, a 2-column dim projection stays
# hinted to ~8M rows and a full-width customer to ~2M — past that the
# hint silently vanishes and the join falls back to the planner (SMJ,
# or AQE's own broadcast decision if runtime stats allow it).
_BROADCAST_BYTES_PER_VALUE = 16
_BROADCAST_LIMIT_BYTES = 256 << 20


def parquet_file_identity(
    sf_dir: str, name: str
) -> tuple[list[str], tuple] | None:
    """The part-file list and a (path, size, mtime_ns) identity key
    for ``{sf_dir}/{name}.parquet`` (file or partitioned dir) — the
    shared base of every footer-metadata shortcut (row counts, column
    stats), so the walk/sort/stat pattern exists ONCE (code-review r10
    finding 4). Returns None when the layout is missing or a file
    vanishes between walk and stat (testdata regeneration racing a
    run) — callers fall back to not knowing."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        files: list[str] = []
        if os.path.isdir(path):
            for root, _dirs, names in os.walk(path):
                files += [
                    os.path.join(root, n)
                    for n in names
                    if n.endswith(".parquet")
                ]
        elif os.path.exists(path):
            files = [path]
        if not files:
            return None
        files.sort()
        key = tuple(
            (f, st.st_size, st.st_mtime_ns)
            for f in files
            for st in [os.stat(f)]
        )
        return files, key
    except OSError:
        return None


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — no scan, no Spark
    job; cached on the files' (path, size, mtime) identity. Returns
    None when the layout is unreadable (caller falls back to not
    knowing)."""
    ident = parquet_file_identity(sf_dir, name)
    if ident is None:
        return None
    files, key = ident
    if key in _ROW_COUNT_CACHE:
        return _ROW_COUNT_CACHE[key]
    try:
        import pyarrow.parquet as pq

        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None
    _ROW_COUNT_CACHE[key] = n
    return n


def gated_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """``F.broadcast(df)`` only when the backing table is measured
    small; the frame unchanged otherwise.

    House rule (CLAUDE.md, r10 audit): an explicit broadcast hint
    bypasses Spark's size guard, so it must never be FORCED on a frame
    that grows with the corpus — customer and part are linear in the
    scale factor, and at 100 TB a forced hint OOMs every executor. But
    just dropping the hint was measured 2-3x slower at bench scale
    (the unhinted join stays SortMergeJoin even under AQE), so the
    hint is gated on a measured bound instead — parquet footer row
    counts (scan-free, cached; the ``BROADCAST_GROUP_LIMIT`` /
    footer-stats precedent), priced at a conservative 16 bytes per
    projected value against a 256 MiB working cap. Unknown size =
    no hint (the safe side)."""
    rows = table_row_count(sf_dir, name)
    if (
        rows is not None
        and rows * max(1, len(df.columns)) * _BROADCAST_BYTES_PER_VALUE
        <= _BROADCAST_LIMIT_BYTES
    ):
        return F.broadcast(df)
    return df
