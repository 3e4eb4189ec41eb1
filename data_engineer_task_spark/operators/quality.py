"""Data-quality checks — Spark's answer to the reference's PK/FK/UNIQUE
constraints (``queries.py:3,10,22-23,28``), which Spark doesn't enforce.

Each check is a DataFrame of violations (empty = pass) plus an assert
wrapper; the reference's own "validation" queries (count shows with no
crew / no listings, ``queries.py:40-51``) are the same idea, so this is
parity, not invention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import anti_join


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def assert_unique(df: DataFrame, keys: Sequence[str]) -> None:
    dupes = duplicate_keys(df, keys).limit(1).collect()
    if dupes:
        raise AssertionError(f"duplicate key {list(keys)}: {dupes[0]}")


def dangling_references(child: DataFrame, parent: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Child rows whose FK has no parent (FK-constraint violations)."""
    return anti_join(child, parent, on)


def assert_referential(child: DataFrame, parent: DataFrame, on: str | Sequence[str]) -> None:
    bad = dangling_references(child, parent, on).limit(1).collect()
    if bad:
        raise AssertionError(f"dangling FK {on}: {bad[0]}")


def quality_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 30,
    max_tokens: int = 80,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_stopword_ratio: float = 0.12,
    max_punct_ratio: float = 0.2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pretraining-corpus document gate: the cheap rule-based filters
    (length band, average token length band, stopword density cap,
    punctuation density cap — the Gopher/C4-style first pass) computed
    from ``token_stats`` in one projection, no shuffle. Returns the
    stats plus a ``passed`` flag; filtering or routing on the flag is
    the caller's choice (curation pipelines keep the rejects for
    auditing rather than dropping them inline)."""
    from .text import token_stats

    stats = token_stats(df, id_col, text_col, keep_cols=keep_cols)
    passed = (
        F.col("token_count").between(min_tokens, max_tokens)
        & F.col("avg_token_len").between(min_avg_token_len, max_avg_token_len)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    # NULL text → NULL stats → NULL AND-chain, and a NULL flag
    # vanishes from BOTH where(passed) and where(~passed) routes —
    # the rows the gate most exists to reject would escape the audit
    # sink (code-review r5). Pin to an explicit False.
    return stats.withColumn("passed", F.coalesce(passed, F.lit(False)))


def null_counts(df: DataFrame) -> dict[str, int]:
    """Per-column null counts in one pass (for nullability audits)."""
    row = df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns]
    ).collect()[0]
    return row.asDict()


def observe_profile(
    df: DataFrame, name: str, *metric_cols: tuple[str, F.Column]
):
    """Attach zero-cost in-flight quality metrics to a frame via
    Spark's Observation API: the aggregates piggyback on whatever
    action executes the frame — no second scan, unlike a separate
    profiling query (which at 100 TB doubles the read). Returns
    (observed_df, observation); read ``observation.get`` AFTER an
    action ran. Default metrics: row count plus per-column null counts
    when no explicit metrics are passed."""
    from pyspark.sql import Observation

    obs = Observation(name)
    if metric_cols:
        exprs = [col.alias(alias) for alias, col in metric_cols]
    else:
        exprs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in df.columns
        ]
    return df.observe(obs, *exprs), obs


def ranking_auc(
    df: DataFrame, score_col: str, label_col: str, *, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Tie-corrected ranking AUC (Mann-Whitney U) of an integer score
    against a 0/1 label, optionally per group — the threshold-free
    "does this score rank positives above negatives?" metric for
    curation-filter evaluation. Exact-integer construction: per
    score VALUE counts (c_pos, c_neg), then
    U2 = Σ_s c_pos(s)·(2·cum_neg_below(s) + c_neg(s)) — the ×2
    scaling keeps the half-credit tie term integral — and
    AUC = U2 / (2·n_pos·n_neg) under a 1e-6 display round (two
    correctly-rounded IEEE ops on exact integers, cross-engine
    deterministic). Overflow headroom (ADVICE r4): U2 ≤ 2·n_pos·n_neg
    exceeds BIGINT (ANSI throw) once n_pos·n_neg > ~4.6e18 (~3e9
    balanced rows per group), so U2 accumulates in DECIMAL(38,0) —
    headroom to ~10^19 rows per group, same escape hatch as
    embedding_pca_top_component. Past ~2^53 (≈9e15, i.e. n_pos·n_neg
    > ~4.5e15) the final decimal→double conversion is still correctly
    rounded but the quotient's 1e-6 display round can sit at a
    half-way boundary — display-only, never membership. Scale shape:
    one groupBy on (group, score) whose
    output is score-cardinality-bounded (≪ corpus) and a window over
    that small frame — the corpus never sorts globally. Output:
    (*group_cols, n_pos, n_neg, auc); groups with an empty class get
    auc NULL rather than a division error."""
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    y = F.col(label_col)
    g = df.groupBy(*gcols, F.col(score_col).alias("_s")).agg(
        F.sum(y).cast("long").alias("_cp"),
        F.sum(1 - y).cast("long").alias("_cn"),
    )
    wl = (
        W.partitionBy(*gcols)
        .orderBy(F.asc("_s"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = g.select(
        *gcols,
        "_cp",
        "_cn",
        F.coalesce(F.sum("_cn").over(wl), F.lit(0)).alias("_cl"),
    )
    t = c.groupBy(*gcols).agg(
        F.sum("_cp").cast("long").alias("n_pos"),
        F.sum("_cn").cast("long").alias("n_neg"),
        # cast BEFORE the ×2: `2 * _cl` in LONG would ANSI-throw at
        # n_neg ≈ 4.6e18, short of the decimal headroom promised
        # above (code-review r5)
        F.sum(
            F.col("_cp").cast("decimal(38,0)")
            * (
                2 * F.col("_cl").cast("decimal(38,0)")
                + F.col("_cn").cast("decimal(38,0)")
            )
        )
        .cast("decimal(38,0)")
        .alias("_u2"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("_u2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg"))
            * 1000000.0
        )
        / 1000000.0,
    )
    return t.select(*gcols, "n_pos", "n_neg", auc.alias("auc"))
