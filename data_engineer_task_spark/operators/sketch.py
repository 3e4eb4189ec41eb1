"""Count-min sketch — mergeable frequency estimation for token streams.

At corpus scale the exact token-frequency table is itself big (every
distinct token shuffles), but most consumers only need *estimates* for
a bounded probe set (heavy-hitter monitoring, stopword discovery,
vocabulary pruning). A count-min sketch compresses the whole frequency
distribution into a fixed ``depth × width`` counter grid:

  counter[j][h_j(token)] += count(token)        (build)
  est(token) = min_j counter[j][h_j(token)]     (probe; est >= truth)

The grid is tiny (KBs), mergeable by cell-wise addition — per-partition
or per-day sketches sum into a global one, the same partial-merge
contract as Spark's HLL sketches — and the one-sided error bound is
the textbook guarantee: overestimate only, by at most ``e/width``
of the total count with probability ``1 - e^-depth``.

Hashing is the engine-portable md5-byte trick shared with
``operators/sampling.py``: ``h_j(token) = byte0(md5('cms:' || j || ':' || token))``
so a SQL oracle (DuckDB) reproduces the exact same grid and estimates.

Reference scope note: the reference (``coded4alex/data_engineer_task``)
has no approximate operators at all (SURVEY §2.5) — this extends the
engine for the 100 TB curation workload alongside HLL and
``percentile_approx``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _md5_byte0


def _bucket(j: Column | int, token: Column) -> Column:
    jcol = F.lit(j) if isinstance(j, int) else j
    # shared engine-portable md5-byte helper (one copy to keep the
    # Spark and SQL-oracle spellings in lockstep). 'cms:' salt per the
    # house per-operator-salt rule (code-review r5): unsalted
    # 'j:value' was byte-identical to dedup.py's minhash seeding
    # md5('i:' || shingle), so a CMS built over minhash-selected
    # shingles would concentrate those keys in the low buckets of the
    # matching row and break the depth rows' independence.
    return _md5_byte0(
        F.concat(jcol.cast("string"), F.lit(":"), token.cast("string")),
        salt="cms:",
    )


def cms_build(
    tokens: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(j, bucket, c)`` with ``depth × 256`` cells.

    Two-stage aggregation keeps the expensive shuffle cheap: the first
    groupBy collapses duplicate tokens with map-side partial combine
    (the only shuffle that scales with the corpus, and it carries one
    row per distinct token); the depth-way fan-out then happens on the
    collapsed vocabulary, and the second shuffle is bounded by
    ``depth × 256`` cells regardless of input size.

    ``weight_col`` lets callers feed pre-aggregated (token, count)
    frames — sketches built from partial counts merge exactly
    (cell-wise sum ≡ one-shot build; see the partial-merge test).
    """
    if weight_col is None:
        vocab = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("_w"))
    else:
        vocab = tokens.groupBy(token_col).agg(F.sum(weight_col).alias("_w"))
    fanout = vocab.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        F.col(token_col),
        "_w",
    )
    return (
        fanout.select("j", _bucket(F.col("j"), F.col(token_col)).alias("bucket"), "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches by cell-wise addition (exact, order-free).

    Depth-safety (ADVICE r8): a naive cell-sum of MIXED-depth shards
    leaves partial-mass rows at ``j >= min shard depth`` (only the
    deeper shards contributed there), and a later ``min_j`` estimate
    over those rows can UNDERESTIMATE — breaking the sketch's
    one-sided contract. Depths aren't knowable without an action (the
    inputs are lazy), so instead of validating, the merge keeps only
    the j rows covered by EVERY non-empty input (``cms_build`` writes
    all ``j in [0, depth)`` whenever its input is non-empty, so
    coverage == depth reach): the result is a clean
    ``min(non-empty depths)``-deep sketch in which every row carries
    full mass. Equal-depth merges — the only intended use — are
    byte-identical to the plain cell-sum; empty shards (no rows at
    any j) add zero mass and don't shrink the domain. All the extra
    bookkeeping runs on the post-shuffle cell frame (<= depth x 256
    rows per input), and the doubly-referenced ``cells`` subtree sits
    above the one shuffle, so inputs are still scanned once.

    Inputs must be ``cms_build``/``cms_merge`` outputs: those cover a
    contiguous ``[0, depth)`` j domain whenever non-empty, which is
    what makes "per-j coverage == number of non-empty inputs" hold on
    the kept rows. A hand-built or filtered sketch with a DISJOINT j
    domain (e.g. A wrote only j=0, B only j=1) breaks that equation —
    every kept row would carry partial mass and a later ``min_j``
    estimate could underestimate — so the merge fails loudly
    (``raise_error`` at execution) instead of degrading the one-sided
    contract (ADVICE r9): it compares the kept rows' coverage against
    the distinct non-empty inputs across ALL rows."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    if len(sketches) == 1:
        return sketches[0]
    tagged = None
    for i, s in enumerate(sketches):
        t = s.select("j", "bucket", "c", F.lit(i).alias("_si"))
        tagged = t if tagged is None else tagged.unionByName(t)
    cells = tagged.groupBy("j", "bucket").agg(
        F.sum("c").cast("long").alias("c"),
        F.collect_set("_si").alias("_sis"),
    )
    # per-depth-row coverage: how many inputs wrote ANY cell at this j
    ex = cells.select("j", F.explode("_sis").alias("_si"))
    perj = ex.groupBy("j").agg(F.countDistinct("_si").alias("_nc"))
    # 1-row guard frame: max per-j coverage AND the count of distinct
    # non-empty inputs overall. Well-formed inputs (contiguous
    # [0, depth) domains) always reach _mx == _nin on their min-depth
    # rows; a disjoint-domain input leaves _mx < _nin and every "kept"
    # row partial — raise instead of serving underestimates.
    full = perj.agg(F.max("_nc").alias("_mx")).crossJoin(
        ex.agg(F.countDistinct("_si").alias("_nin"))
    )
    keep = (
        perj.crossJoin(F.broadcast(full))
        .where(F.col("_nc") == F.col("_mx"))
        .select(
            F.when(F.col("_mx") == F.col("_nin"), F.col("j"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "cms_merge: disjoint depth-row domains — "
                            "inputs must be cms_build/cms_merge outputs "
                            "(max per-j coverage "
                        ),
                        F.col("_mx").cast("string"),
                        F.lit(" < non-empty inputs "),
                        F.col("_nin").cast("string"),
                        F.lit(")"),
                    )
                )
            )
            .alias("j")
        )
    )
    return cells.join(F.broadcast(keep), "j").select("j", "bucket", "c")


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    *,
    depth: int | None = 4,
) -> DataFrame:
    """Estimate counts for a probe-token set: probes + ``cms_est``.

    The sketch is at most ``depth × 256`` rows → broadcast; the probe
    fan-out (probes × depth) joins it map-only, then one tiny groupBy
    takes the min across rows. Absent cells count as 0 (a token whose
    cell was never touched has true count 0).

    ``depth=None`` follows the SKETCH's own depth-row domain (its
    distinct j values, a <= depth-row broadcast) instead of assuming
    ``[0, depth)`` — required after a mixed-depth ``cms_merge``, whose
    trimmed domain a caller-supplied depth can only under-probe
    (missing rows read as absent-cell zeros → underestimates) or
    mis-probe. For an empty sketch the domain is empty, the fan-out
    produces no rows, and the probe frame comes back empty — the same
    "nothing to estimate against" a zero-row sketch means everywhere.
    """
    if depth is None:
        js = F.broadcast(sketch.select("j").distinct())
        fanout = probes.crossJoin(js).withColumn(
            "bucket", _bucket(F.col("j"), F.col(token_col))
        )
    else:
        fanout = probes.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
        ).withColumn("bucket", _bucket(F.col("j"), F.col(token_col)))
    probe_cols = [c for c in probes.columns]
    return (
        fanout.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(*probe_cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Join-size estimation from two CMS sketches (Cormode &
    Muthukrishnan 2005 §4.2 / the AMS F₂ estimator when a = b):

        |A ⋈_key B| = Σ_k f_A(k)·f_B(k)  ≈  min_j Σ_b cA[j][b]·cB[j][b]

    — the pre-join cardinality probe a planner runs over persisted
    per-shard sketches BEFORE committing to a shuffle strategy, at
    O(depth × 256) cost instead of executing the join. One-sided like
    the point estimate: colliding keys only ADD mass, so est ≥ truth
    (property-tested), within e/width · N_A·N_B with prob 1−e^−depth.

    Returns one row ``(cms_est)``. Arithmetic is exact BIGINT — cells
    are exact counts and the per-row fold is an integer sum, so the
    estimate is cross-engine reproducible; cell counts past ~2^31
    would overflow the LONG product LOUDLY under ANSI (switch the
    accumulator to DECIMAL(38,0) at that scale, the AUC precedent)."""
    a = sketch_a.select("j", "bucket", F.col("c").alias("ca"))
    b = sketch_b.select("j", "bucket", F.col("c").alias("cb"))
    overlap = (
        # inner join: a cell missing from either sketch contributes 0
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ip"))
    )
    # a depth row with NO overlapping cells has ip = 0 and must stay in
    # the min (near-disjoint sketches: dropping it would overestimate),
    # so fold from a spine of FULL depth rows — derived from the
    # sketches themselves (cms_build writes every j ∈ [0, depth) when
    # its input is non-empty), never from a caller-supplied depth: a
    # depth parameter LARGER than the build depth would mint
    # zero-overlap spine rows and silently return 0, breaking the
    # one-sided contract (ADVICE r7). Intersecting the two ARGUMENTS'
    # j domains also keeps a mismatched-depth pair one-sided (each
    # common row carries both sketches' full mass, so min over them is
    # a min over valid per-row overestimates) — that claim is scoped
    # to the two arguments as built: it needs every row of each input
    # to carry that input's FULL mass, which cms_build guarantees and
    # cms_merge now preserves by trimming mixed-depth merges to the
    # covered-by-all j domain (ADVICE r8).
    spine = (
        sketch_a.select("j")
        .distinct()
        .join(sketch_b.select("j").distinct(), "j")
    )
    return (
        spine.join(overlap, "j", "left")
        # empty spine = at least one EMPTY sketch (no rows summarized)
        # → true join size 0; min over no rows is NULL, so coalesce
        .agg(
            F.coalesce(
                F.min(F.coalesce(F.col("ip"), F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias("cms_est")
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — mergeable cardinality
# estimation. The 100 TB counterpart of COUNT(DISTINCT …): the exact
# count shuffles every distinct value; a KMV sketch keeps only the k
# smallest 48-bit hashes per group (O(k) state, mergeable by
# union-then-re-min, the theta-sketch building block), and estimates
#   n̂ = (k-1) · 2^48 / h_(k)        (|sketch| < k → exact |sketch|)
# with relative error ~1/sqrt(k-2). Hashing is the engine-portable
# salted-md5 spelling shared with operators/sampling.py, so a DuckDB
# oracle reproduces the exact same sketch, estimate, and (for the
# theta-style overlap) the exact same intersection membership —
# every decision this family makes rides exact integers; the only
# floats are single correctly-rounded IEEE divisions of exactly-
# representable doubles (h < 2^48 < 2^53; (k-1)·2^48 has ≤10
# significant bits), bitwise identical cross-engine.
# ---------------------------------------------------------------------------

_KMV_BITS = 48


def kmv_hash(col: Column, salt: str = "kmv:") -> Column:
    """First 12 md5 nibbles (0 … 2^48-1) of salt + stringified value —
    the sketch's portable uniform. 48 bits keeps h exactly
    representable as a DOUBLE for the final division while making
    full-prefix collisions negligible (~n²/2^49)."""
    from .sampling import _HEX

    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    hv = lambda p: F.instr(F.lit(_HEX), F.substring(h, p, 1)) - 1  # noqa: E731
    # LONG accumulator from the start: 12 nibbles overflow INT, and
    # ANSI mode throws on overflow instead of wrapping.
    acc: Column = hv(1).cast("long")
    for p in range(2, 13):
        acc = acc * 16 + hv(p)
    return acc


def k_smallest(
    df: DataFrame,
    k: int,
    group_cols: tuple[str, ...],
    *,
    salt_buckets: int = 64,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """The k smallest ``h`` per group via a SALTED two-level rank —
    never a single-task global sort (ADVICE r4). Level 1 partitions by
    (group, h % salt_buckets): h is md5-uniform so the salt spreads a
    hot group evenly, and the rank-k filter cuts each salt bucket to
    ≤ k rows. Level 2 re-ranks the ≤ salt_buckets·k survivors per
    group — a bounded frame. Exact: every global k-smallest hash is
    among its own salt bucket's k smallest, so level 1 never drops a
    winner; the salt is derived from h itself, so the result is
    deterministic regardless of physical partitioning.

    ``tiebreak``: extra ascending order columns after ``h`` for
    callers whose h values can collide (KMV frames are DISTINCT
    hashes, so they pass none).

    BOUND (self-review r6): level 2 funnels ≤ salt_buckets·k rows per
    group through ONE task — sketch-sized k (64–1024, every house
    caller) keeps that ≤ 64k rows; for k ≳ 10⁵ this operator is the
    wrong tool (the "sketch" is corpus-sized) — rank with
    ``operators/ranking.py::ordered_prefix`` per group instead, or
    raise ``salt_buckets`` toward k so level 1 does the cutting."""
    from pyspark.sql import Window as W

    order = [F.asc("h"), *(F.asc(t) for t in tiebreak)]
    w1 = W.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(salt_buckets))
    ).orderBy(*order)
    pre = (
        df.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    if not group_cols:
        # global sketch: TakeOrderedAndProject (per-partition top-k +
        # driver merge of ≤ salt_buckets·k rows) — no window at all
        return pre.orderBy(*order).limit(k)
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        pre.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


_k_smallest = k_smallest  # private alias kept for callers predating the public name


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 64,
    group_cols: tuple[str, ...] = (),
    salt: str = "kmv:",
) -> DataFrame:
    """Build the sketch: the k smallest DISTINCT hashes per group,
    ``group_cols + (h,)``.

    The one corpus-sized shuffle carries a single row per distinct
    (group, hash) — map-side partial distinct collapses duplicates
    before the exchange — and the salted two-level rank-k filter
    (``k_smallest``) drops everything else without ever funneling a
    group's full distinct-hash set through one task. At production
    scale you never rebuild from raw data: per-shard / per-day
    sketches persist and ``kmv_merge`` folds them (union → re-min,
    exactly one-shot-equivalent — property-tested)."""
    hashed = (
        df.select(*group_cols, kmv_hash(F.col(value_col), salt).alias("h"))
        # NULL values hash to NULL (concat propagates), and Spark's
        # ASC NULLS FIRST would seat the NULL at rank 1, wasting a
        # sketch slot and skewing the estimate by ~k/(k-1)
        # (code-review r5). COUNT(DISTINCT) semantics ignore NULL —
        # so does the sketch.
        .where(F.col("h").isNotNull())
        .distinct()
    )
    return k_smallest(hashed, k, tuple(group_cols))


def kmv_merge(
    *sketches: DataFrame, k: int = 64, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge sketches: union the retained hashes, dedupe, re-take the
    k smallest per group. Exact (≡ one-shot build over the combined
    input) because the k smallest of A ∪ B all lie within
    k-min(A) ∪ k-min(B). Merging many shard sketches re-uses the
    salted two-level rank, so even a million-shard union never sorts
    in one task."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return k_smallest(out.distinct(), k, tuple(group_cols))


def kmv_estimate(
    sketch: DataFrame, *, k: int = 64, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Collapse a sketch to per-group ``(n_sketch, kmv_raw)``.

    ``kmv_raw`` is the UNROUNDED estimate — a single IEEE division of
    exactly-representable doubles, bitwise identical cross-engine;
    display rounding is the caller's (scale-then-divide, per the
    authoring rules)."""
    scale = float((k - 1) << _KMV_BITS)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").alias("_hk"),
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(
            F.col("n_sketch") < k, F.col("n_sketch").cast("double")
        )
        .otherwise(F.lit(scale) / F.col("_hk").cast("double"))
        .alias("kmv_raw"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog — CONSTANT-memory mergeable distinct estimation, the
# engine-portable twin of Spark's built-in hll_sketch_agg (which a SQL
# oracle cannot reproduce: Apache DataSketches' binary format is
# opaque to DuckDB). Classic Flajolet et al. 2007 with the small-range
# linear-counting correction; no HLL++ bias table (documented — the
# raw estimator's ±1.04/√m error is the contract the tests pin).
#
# Portability discipline (same as the KMV block above): the register
# index is the first md5 byte, the rank (rho) of the remaining 48
# hash bits is derived from the HEX STRING (leading-zero nibbles +
# a 4-case nibble table — pure integer/string ops, no log2/libm), and
# the register fold is an INTEGER sum of powers of two
# Σ 2^(RHO_MAX − M[j]) ≤ m·2^49 < 2^63, exactly associative — so the
# pre-round estimate is ONE IEEE division of bitwise-identical
# doubles on both engines. The only transcendental is the
# small-range ln(m/V), whose true value is irrational for every
# reachable V (0 < V < m ⇒ m/V is a rational > 1, never a power of
# e), i.e. display-round boundary landing is measure-zero (house
# policy, COVERAGE.md transcendental audit).
# ---------------------------------------------------------------------------

_HLL_P = 8                       # register-index bits (first md5 byte)
_HLL_M = 1 << _HLL_P             # 256 registers
_HLL_W_NIBBLES = 12              # rank window: 48 bits after the index byte
_HLL_RHO_MAX = 4 * _HLL_W_NIBBLES + 1      # 49: all-zero window
# alpha_m * m^2 * 2^(RHO_MAX) — the estimator numerator, ONE double
# literal shared verbatim with the SQL oracle spelling below.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_RHO_MAX)
_HLL_SMALL = 2.5 * _HLL_M        # linear-counting switch threshold


def hll_cols(col: Column, salt: str = "hll:") -> tuple[Column, Column]:
    """(register, rho) for one value: register = first md5 byte of
    salt + stringified value; rho = 1 + number of leading zero BITS in
    the next 48 hash bits (49 if all zero). The bit rank comes from
    the hex string — leading-zero nibbles via an anchored
    regexp_replace (both engines replace the single possible match)
    plus a 4-way CASE on the first surviving nibble — so no libm is
    involved and the DuckDB oracle reproduces it exactly."""
    from .sampling import _HEX

    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    nib = lambda p: F.instr(F.lit(_HEX), F.substring(h, p, 1)) - 1  # noqa: E731
    reg = (nib(1) * 16 + nib(2)).cast("int")
    w = F.substring(h, 3, _HLL_W_NIBBLES)
    t = F.regexp_replace(w, "^0+", "")
    d = F.instr(F.lit(_HEX), F.substring(t, 1, 1)) - 1
    inner = (
        F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    )
    rho = F.when(F.length(t) == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        (F.lit(_HLL_W_NIBBLES) - F.length(t)) * 4 + inner + 1
    )
    return reg, rho.cast("int")


def hll_sketch(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: tuple[str, ...] = (),
    salt: str = "hll:",
) -> DataFrame:
    """Build the register table ``group_cols + (reg, mr)``: the max
    rho per (group, register). ONE corpus-sized shuffle on
    (group, reg) with map-side partial max — the sketch is ≤ m rows
    per group regardless of input size, the materializable
    intermediate a 100 TB incremental distinct-rollup persists
    per-shard and folds with ``hll_merge``. NULL values are skipped
    (COUNT(DISTINCT) semantics — md5 of NULL propagates NULL and
    would otherwise mint a NULL register group)."""
    reg, rho = hll_cols(F.col(value_col), salt)
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .where(F.col("reg").isNotNull())
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mr"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge register tables: union → re-max per (group, reg).
    Exactly one-shot-equivalent (max is associative/commutative/
    idempotent over the per-value rho set — property-tested), so
    per-day / per-shard sketches fold in any order, the same
    partial-merge contract as ``kmv_merge``/``cms_merge``."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("mr").alias("mr"))


def hll_estimate(
    sketch: DataFrame, *, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Collapse a register table to ``group_cols + (n_registers,
    hll_raw)``. ``hll_raw`` is the UNROUNDED estimate: the harmonic
    fold rides Σ 2^(RHO_MAX − mr) as an exact BIGINT (absent
    registers contribute 2^RHO_MAX each), so the raw estimator is a
    single division of cross-engine-identical doubles; the
    small-range branch (raw ≤ 2.5m and zero registers exist) is the
    textbook linear counting m·ln(m/V). Display rounding is the
    caller's, per the authoring rules."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - mr)")
        ).alias("_s"),
    )
    v = F.lit(_HLL_M).cast("long") - F.col("n_registers")
    sum_int = F.col("_s") + v * F.lit(1 << _HLL_RHO_MAX).cast("long")
    raw = F.lit(_HLL_NUM) / sum_int.cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_SMALL)) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, "n_registers", est.alias("hll_raw"))
