"""ordered_prefix / ntile_of_rank — the two-level global-order
primitives must agree exactly with the single-window spellings they
replace, for any bucket count, and must not contain an unpartitioned
window themselves."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_engineer_task_spark.operators.ranking import (
    ntile_of_rank,
    ordered_prefix,
)
from data_engineer_task_spark.plans.audit import (
    analyzed_plan,
    unpartitioned_specs,
)


@pytest.fixture(scope="module")
def frame(spark):
    # skewed integral values with heavy ties + a unique tiebreak
    rows = [(i, (i * i * 7919) % 23, (i * 31) % 1000) for i in range(500)]
    return spark.createDataFrame(rows, "id LONG, v LONG, cents LONG")


@pytest.mark.parametrize("buckets", [2, 7, 64])
def test_rank_matches_global_window(frame, buckets):
    got = ordered_prefix(
        frame, "v", ["id"], rank_col="r", buckets=buckets
    ).select("id", "r")
    want = frame.select(
        "id",
        F.row_number().over(W.orderBy(F.asc("v"), F.asc("id"))).alias("r"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_exclusive_prefix_sum_matches_window(frame):
    got = ordered_prefix(
        frame,
        "v",
        ["id"],
        rank_col=None,
        sums={"cum_before": "cents"},
        buckets=7,
    ).select("id", "cum_before")
    w = W.orderBy(F.asc("v"), F.asc("id")).rowsBetween(
        W.unboundedPreceding, -1
    )
    want = frame.select(
        "id", F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("cum_before")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_descending_via_negated_key(frame):
    got = ordered_prefix(
        frame.withColumn("negv", -F.col("v")),
        "negv",
        ["id"],
        rank_col="r",
        buckets=5,
    ).select("id", "r")
    want = frame.select(
        "id",
        F.row_number().over(W.orderBy(F.desc("v"), F.asc("id"))).alias("r"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("n_tiles", [2, 5, 10])
@pytest.mark.parametrize("n_rows", [3, 499, 500])
def test_ntile_of_rank_matches_ntile(spark, n_tiles, n_rows):
    rows = [(i, (i * 13) % 97) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id LONG, v LONG")
    want = df.select(
        "id",
        F.ntile(n_tiles)
        .over(W.orderBy(F.asc("v"), F.asc("id")))
        .cast("long")
        .alias("b"),
    )
    ranked = df.select(
        "id",
        F.row_number().over(W.orderBy(F.asc("v"), F.asc("id"))).alias("r"),
    ).crossJoin(F.broadcast(df.agg(F.count(F.lit(1)).alias("n"))))
    got = ranked.select(
        "id", ntile_of_rank(F.col("r"), F.col("n"), n_tiles).alias("b")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_ordered_prefix_plan_has_no_unpartitioned_window(frame):
    out = ordered_prefix(
        frame, "v", ["id"], rank_col="r", sums={"cb": "cents"}, buckets=8
    )
    assert unpartitioned_specs(analyzed_plan(out)) == []


def test_empty_frame(spark):
    df = spark.createDataFrame([], "id LONG, v LONG, cents LONG")
    out = ordered_prefix(df, "v", ["id"], rank_col="r", sums={"cb": "cents"})
    assert out.count() == 0
