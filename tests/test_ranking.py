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


def test_multi_spec_matches_windows(frame):
    from data_engineer_task_spark.operators.ranking import (
        RankSpec,
        ordered_prefix_multi,
    )

    got = ordered_prefix_multi(
        frame,
        [
            RankSpec("v", ["id"], "rv"),
            RankSpec("cents", ["id"], "rc", {"cb": "v"}),
        ],
        buckets=7,
    ).select("id", "rv", "rc", "cb")
    wv = W.orderBy(F.asc("v"), F.asc("id"))
    wc = W.orderBy(F.asc("cents"), F.asc("id"))
    want = frame.select(
        "id",
        F.row_number().over(wv).alias("rv"),
        F.row_number().over(wc).alias("rc"),
        F.coalesce(
            F.sum("v").over(wc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("cb"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("null_share", ["some", "all"])
def test_null_key_raises(spark, null_share):
    """ADVICE r5: ALL-null keys used to slip past the guard (empty
    cuts -> constant bucket 0 -> silent NULLS-FIRST ranks); both mixed
    and all-NULL inputs must now fail loudly from the same cuts-job
    null count."""
    rows = [
        (i, None if (null_share == "all" or i % 3 == 0) else i * 7)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id LONG, v LONG")
    with pytest.raises(ValueError, match="non-null key"):
        ordered_prefix(df, "v", ["id"], rank_col="r")


@pytest.mark.parametrize("n_parts", [1, 5, 32])
@pytest.mark.parametrize(
    "keys",
    [
        "dups",       # heavy duplicate keys
        "constant",   # every key equal (single bucket, ties everywhere)
        "skew",       # 90% of rows share one key, rest unique
    ],
)
def test_validate_passes_adversarial_deterministic(spark, n_parts, keys):
    """validate=True asserts ranks are a permutation of 1..n; for any
    DETERMINISTIC input — whatever the partitioning, duplication, or
    skew — the contract holds and the check must pass silently."""
    if keys == "dups":
        rows = [(i, (i * 7919) % 11) for i in range(400)]
    elif keys == "constant":
        rows = [(i, 42) for i in range(400)]
    else:
        rows = [(i, 5 if i % 10 else i * 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "id LONG, v LONG").repartition(n_parts)
    out = ordered_prefix(
        df, "v", ["id"], rank_col="r", buckets=8, validate=True
    )
    got = sorted(r["r"] for r in out.select("r").collect())
    assert got == list(range(1, 401))


def test_validate_catches_nondeterministic_input(spark):
    """VERDICT r5 item 4: a nondeterministic input violates the
    documented contract — bucket offsets from one execution disagree
    with rows ranked in another, yielding gapped/duplicate ranks.
    validate=True must RAISE instead of silently corrupting.
    (Random keys re-drawn per execution: the checks pass only if every
    bucket count coincides across executions — probability ~0.)"""
    import random

    from pyspark.sql.types import DoubleType

    @F.udf(DoubleType())
    def flaky_key(i):
        return random.random() * 1e6

    flaky = flaky_key.asNondeterministic()
    df = spark.range(2000).select(
        F.col("id"), flaky(F.col("id")).alias("v")
    )
    with pytest.raises(ValueError, match="determinism contract"):
        ordered_prefix(df, "v", ["id"], rank_col="r", buckets=16, validate=True)


def test_float_sum_source_raises(spark):
    """Prefix sums are only offered over integral columns (the
    determinism contract) — a float source must fail loudly, not
    silently re-associate across bucket boundaries."""
    df = spark.createDataFrame(
        [(i, i * 3, i * 0.5) for i in range(20)],
        "id LONG, v LONG, amount DOUBLE",
    )
    with pytest.raises(ValueError, match="integral"):
        ordered_prefix(df, "v", ["id"], rank_col=None, sums={"cb": "amount"})


def test_partitioned_spec_matches_per_group_windows(spark):
    """RankSpec.partition_by: per-group two-level ranks/prefix sums
    must equal the plain per-group window spelling — including a NULL
    group value (the offsets join is null-safe) and skewed group
    sizes."""
    from data_engineer_task_spark.operators.ranking import (
        RankSpec,
        ordered_prefix_multi,
    )

    rows = [
        (i, ["en", "de", None, "fr"][i % 4 if i < 300 else 0], (i * 7919) % 50, (i * 13) % 100)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id LONG, lang STRING, v LONG, cents LONG")
    got = ordered_prefix_multi(
        df,
        [RankSpec("v", ["id"], "r", {"cb": "cents"}, partition_by=["lang"])],
        buckets=8,
        validate=True,
    ).select("id", "r", "cb")
    w = W.partitionBy("lang").orderBy(F.asc("v"), F.asc("id"))
    want = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("r"),
        F.coalesce(
            F.sum("cents").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("cb"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_partitioned_and_flat_specs_compose(spark):
    """A partitioned spec and a flat spec in one call: the flat spec
    still gets its global rank, the partitioned one restarts per
    group, and neither window is unpartitioned."""
    from data_engineer_task_spark.operators.ranking import (
        RankSpec,
        ordered_prefix_multi,
    )
    from data_engineer_task_spark.plans.audit import (
        analyzed_plan,
        unpartitioned_specs,
    )

    rows = [(i, "g" + str(i % 3), (i * 31) % 17) for i in range(150)]
    df = spark.createDataFrame(rows, "id LONG, g STRING, v LONG")
    out = ordered_prefix_multi(
        df,
        [
            RankSpec("v", ["id"], "r_global"),
            RankSpec("v", ["id"], "r_group", partition_by=["g"]),
        ],
        buckets=4,
        validate=True,
    )
    assert unpartitioned_specs(analyzed_plan(out)) == []
    wg = W.orderBy(F.asc("v"), F.asc("id"))
    wp = W.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.select(
        "id",
        F.row_number().over(wg).cast("long").alias("r_global"),
        F.row_number().over(wp).cast("long").alias("r_group"),
    )
    got = out.select("id", "r_global", "r_group")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_output_name_collisions_raise(frame):
    """ADVICE r6: duplicate rank_col/sums outputs across specs, or an
    output shadowing an input column, must fail loudly instead of the
    later withColumn silently overwriting the earlier ranks."""
    from data_engineer_task_spark.operators.ranking import (
        RankSpec,
        ordered_prefix_multi,
    )

    # two specs left on the default rank_col="rank"
    with pytest.raises(ValueError, match="collision"):
        ordered_prefix_multi(
            frame, [RankSpec("v", ["id"]), RankSpec("cents", ["id"])]
        )
    # sums output colliding with another spec's rank_col
    with pytest.raises(ValueError, match="collision"):
        ordered_prefix_multi(
            frame,
            [
                RankSpec("v", ["id"], "r1", {"r2": "cents"}),
                RankSpec("cents", ["id"], "r2"),
            ],
        )
    # output shadowing an input column
    with pytest.raises(ValueError, match="collision"):
        ordered_prefix_multi(frame, [RankSpec("v", ["id"], "cents")])


def test_large_integral_keys_keep_exact_order(spark):
    """ADVICE r6 (the medium): integral keys above 2^53 collapse to
    equal DOUBLES — the rank windows must order by the RAW key, so
    epoch-nano-grade keys keep their exact total order even when the
    bucket cast can no longer distinguish them."""
    base = 1 << 53
    # consecutive keys straddling 2^53: as doubles, base and base+1
    # are EQUAL (ulp = 2), so a double-ordered window would fall to
    # the id tiebreak and invert pairs
    rows = [(i, base + i) for i in range(64)]
    # ids deliberately DESCEND as keys ascend, so a tiebreak-ordered
    # (i.e. double-collapsed) window produces the REVERSED ranking
    rows = [(63 - i, k) for i, (_, k) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id LONG, k LONG")
    got = {
        r["id"]: r["r"]
        for r in ordered_prefix(df, "k", ["id"], rank_col="r", buckets=4)
        .select("id", "r")
        .collect()
    }
    # key ascends as id descends: id 63 (smallest key) must rank 1
    assert got[63] == 1 and got[0] == 64
    want = {63 - i: i + 1 for i in range(64)}
    assert got == want
