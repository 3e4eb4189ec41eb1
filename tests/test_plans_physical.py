"""Physical-plan regression tests — the scale contract.

Correctness tests prove the answers; these prove the PLANS stay the
ones that survive 100 TB: filters pushed into the parquet scan, pruned
read schemas, broadcast joins for dims, no Python row UDFs in hot
paths. A regression here is a performance bug even when answers stay
right.
"""

from __future__ import annotations

import re

from data_engineer_task_spark.plans.analytics import QUERIES
from data_engineer_task_spark.plans.audit import unpartitioned_specs

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the scan must not read unused columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region at minimum
    assert "CartesianProduct" not in plan


def test_anti_join_is_native(spark):
    plan = _plan(spark, "orders_without_lineitems")
    assert "LeftAnti" in plan


def test_semi_join_is_native(spark):
    plan = _plan(spark, "big_spender_segments")
    assert "LeftSemi" in plan


def test_no_python_row_udfs_in_relational_queries(spark):
    # BatchEvalPython = row-at-a-time Python UDF — banned in hot paths.
    for name in (
        "pricing_summary",
        "revenue_by_nation",
        "doc_token_stats",
        "doc_simhash",
        "embedding_cosine_topk",
    ):
        assert "BatchEvalPython" not in _plan(spark, name), name


def test_whole_stage_codegen_active(spark):
    # AQE's pre-execution formatted plan hides codegen spans; the
    # codegen explain mode reports the generated subtrees directly.
    df = QUERIES["pricing_summary"](spark, SF_SMOKE)
    codegen = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    assert "Found" in codegen and "WholeStageCodegen" in codegen


def test_vectorized_parquet_scan(spark):
    assert "Batched: true" in _plan(spark, "pricing_summary")


def test_tfidf_broadcasts_vocab_df_table(spark):
    # The doc-frequency (vocabulary) table must broadcast back onto the
    # (doc, token) frame: a shuffled token join would skew on stopwords.
    plan = _plan(spark, "doc_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hash_split_is_map_only(spark):
    # Split assignment must stay joinless and rand()-free: one scan,
    # one aggregation, nothing else.
    plan = _plan(spark, "doc_split_counts")
    assert "Join" not in plan
    assert "rand" not in plan.lower()


def test_curation_entries_free_of_row_udfs(spark):
    for name in ("doc_split_counts", "doc_tfidf_top_terms", "doc_pack_chunks"):
        assert "BatchEvalPython" not in _plan(spark, name), name


def _tree(plan: str) -> str:
    """The plan-tree section only (detail sections repeat node names)."""
    return plan.split("(1) Scan")[0]


def test_grouping_sets_single_expand(spark):
    # GROUPING SETS must compile to one Expand + aggregate, not a
    # union of per-set aggregations re-scanning the table.
    tree = _tree(_plan(spark, "order_status_grouping_sets"))
    assert "Expand" in tree
    assert "Union" not in tree
    assert tree.count("Scan parquet") == 1


def test_sliding_window_native_expand_no_python(spark):
    # The 2x window fan-out happens JVM-side (Expand), never in Python.
    plan = _plan(spark, "sliding_event_counts")
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan


def test_scd2_single_join_single_pass(spark):
    # The merge must be ONE key join + a Generate (branch explode) —
    # not Catalyst's rewrite of a branch union into three separate
    # joins that re-scan and re-shuffle both inputs per branch.
    tree = _tree(_plan(spark, "customer_scd2_segments"))
    assert tree.count("Join") == 1
    assert "Generate" in tree
    assert tree.count("Scan parquet") == 2  # dim + update batch


def test_quality_gate_is_map_only(spark):
    # The gate itself adds no shuffle: scan -> project -> aggregate.
    plan = _plan(spark, "doc_quality_gate")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_notin_compiles_to_broadcast_anti_join(spark):
    # NOT IN rewrites to an anti join. The testdata parquet declares the
    # keys required (non-nullable), so Catalyst drops the null-aware OR
    # isnull(...) branch and degenerates to a plain broadcast LeftAnti —
    # the optimal plan. Regression guard: it must stay a broadcast anti
    # join with no null-aware fallback to a per-row subquery.
    plan = _plan(spark, "customers_no_urgent_notin")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_correlated_avg_rewritten_to_single_window_pass(spark):
    # The customer-average comparison must run as a window over the
    # per-order aggregate — one shuffle — never as a re-aggregating
    # self-join of the subquery per probe side.
    tree = _tree(_plan(spark, "bulky_orders_vs_customer_avg"))
    assert "Window" in tree
    assert tree.count("Scan parquet") == 2  # orders + lineitem, once each


def test_unpivot_is_map_only_expand(spark):
    # unpivot = Expand over the aggregated frame; no extra shuffle or
    # union-of-projections re-reading the input.
    tree = _tree(_plan(spark, "brand_metric_unpivot"))
    assert "Expand" in tree
    assert "Union" not in tree
    assert tree.count("Scan parquet") == 1


def test_rank_family_windows_never_partition_by_segment_alone(spark):
    # r6 migration pin: the analytic ranks derive from the per-VALUE
    # rollup and candidate staging, so every remaining Window
    # partitions by (segment, bucket) or (segment, value) — never by
    # the five-value segment alone over corpus rows (the 100 TB
    # funnel this entry used to be). Group counts and candidate
    # values arrive by broadcast.
    import re

    tree = _tree(_plan(spark, "segment_acctbal_ranks"))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", tree):
        parts = spec.split(",")
        assert not (
            parts[0].strip().startswith("c_mktsegment")
            and parts[1].strip().split()[-1] in ("ASC", "DESC")
        ), f"segment-only window crept back: {spec}"
    assert "BroadcastExchange" in tree


def test_higher_order_folds_stay_jvm_side(spark):
    plan = _plan(spark, "embedding_norm_profile")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_locf_single_window_single_shuffle(spark):
    # Forward fill = one Window over one partitioning Exchange; no
    # self-join or second pass.
    tree = _tree(_plan(spark, "user_event_locf_fill"))
    assert "Join" not in tree
    import re

    assert len(re.findall(r"\bWindow \(", tree)) == 1


def test_variant_extraction_stays_jvm_side(spark):
    plan = _plan(spark, "event_props_variant_hist")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_spine_fill_is_one_scan_plus_small_join(spark):
    # The spine derives from a 2-row aggregate of the same scan; the
    # gap-fill join must not multiply fact scans beyond bounds/actual.
    tree = _tree(_plan(spark, "hourly_event_spine_filled"))
    assert tree.count("Scan parquet") == 2  # bounds agg + hourly agg
    assert "CartesianProduct" not in tree


def test_lateral_decorrelates_to_join_not_per_row_subquery(spark):
    """Spark must decorrelate the LATERAL subquery: the plan is a join
    against ONE windowed/limited supplier subplan, never a re-executed
    per-outer-row subquery (no CartesianProduct, exactly one supplier
    scan)."""
    plan = _plan(spark, "lateral_top_suppliers")
    assert "CartesianProduct" not in plan
    # decorrelated: the per-nation LIMIT becomes one windowed row_number
    # pass over a SINGLE supplier scan, joined (broadcast) to nation —
    # formatted explain lists each scan twice (tree + details)
    assert "row_number()" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Scan parquet ") <= 4  # 2 scans × 2 listings


def test_anomaly_entry_broadcasts_stats_and_stays_jvm(spark):
    """The per-type median/MAD tables are tiny — they must broadcast
    back onto the fact scan, and the whole plan stays codegen (no
    Python workers)."""
    plan = _plan(spark, "event_value_anomalies")
    assert plan.count("BroadcastHashJoin") >= 2  # med and mad joins
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_cms_probe_join_broadcasts_sketch(spark):
    """cms_estimate joins the fixed-size counter grid — it must arrive
    broadcast, never shuffle the probe fan-out."""
    plan = _plan(spark, "doc_token_cms_topk")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_funnel_stages_are_aggregate_joins_no_cartesian(spark):
    plan = _plan(spark, "user_funnel_counts")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_sample_is_map_only_after_totals(spark):
    """One tiny agg broadcast back + a filter: no Python, no extra
    shuffle of the row side."""
    plan = _plan(spark, "doc_weighted_sample")
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_contamination_broadcasts_benchmark_grams(spark):
    # The held-out gram set must broadcast into the corpus probe — the
    # corpus side never shuffles on gram text at any scale.
    plan = _plan(spark, "doc_contamination_overlap")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_profile_is_in_row_map_only(spark):
    # Bigram assembly + distinct-fraction are in-row array math; the
    # only exchange is the final per-source aggregate.
    plan = _plan(spark, "doc_repetition_profile")
    assert "BatchEvalPython" not in plan
    # RoundRobin is _t_wide's local fan-out of single-row-group files —
    # a no-op at real scale. Beyond it: agg shuffle + bounded sort only.
    headers = re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M)
    n_roundrobin = plan.count("RoundRobinPartitioning")
    assert len(headers) - n_roundrobin <= 2, plan


def test_ohlc_windows_share_one_partitioning(spark):
    # Both row_number directions partition on (type, hour): one shuffle,
    # two in-partition sorts — never one shuffle per window.
    plan = _plan(spark, "event_hourly_ohlc")
    headers = re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M)
    n_roundrobin = plan.count("RoundRobinPartitioning")
    # one hash shuffle for both windows + the bounded output sort
    assert len(headers) - n_roundrobin <= 2, plan
    assert "BatchEvalPython" not in plan


def test_quantization_error_stays_jvm_side(spark):
    # int8 round-trip error = higher-order transforms/folds in codegen;
    # no Python, no shuffle of vector payloads beyond the label agg.
    plan = _plan(spark, "embedding_quantization_error")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_null_profile_is_single_scan(spark):
    # One pass computes every column's stats; the stack unpivot must not
    # re-scan the fact table per column (the oracle's four scans).
    plan = _plan(spark, "events_null_profile")
    # Formatted explain lists each operator once in the tree and once in
    # the details section — count the numbered detail headers.
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, scans


def test_exists_decorrelates_to_semi_join(spark):
    plan = _plan(spark, "suppliers_with_orders_exists")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_uncorrelated_scalar_subquery_computes_once(spark):
    # the global-avg subquery must appear as a Subquery node feeding the
    # filter, not a per-row re-aggregation join
    plan = _plan(spark, "orders_vs_global_avg")
    assert "Subquery" in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) <= 2, scans  # main scan + subquery scan


def test_regr_trend_is_single_partial_agg(spark):
    # regr_* must decompose into one hash aggregate with map-side
    # partial combine (two HashAggregate levels, one exchange), and the
    # scan must prune to the two referenced columns.
    plan = _plan(spark, "priority_price_trend")
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "BatchEvalPython" not in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_totalprice" in read_schema and "o_orderdate" in read_schema
    assert "o_custkey" not in read_schema


def test_bitmap_distinct_merges_partial_bitmaps(spark):
    # both aggregate levels (per-bucket OR, per-type popcount-sum) must
    # partial-combine: 4 HashAggregate nodes, no Python anywhere.
    plan = _plan(spark, "event_user_bitmap_distinct")
    assert len(re.findall(r"HashAggregate", plan)) >= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geomean_udaf_is_arrow_batched_not_row_python(spark):
    # the custom UDAF must plan as the Arrow-batched aggregate node —
    # never the banned row-at-a-time Python eval — with scan pruning
    # and the positive-price filter pushed down.
    plan = _plan(spark, "priority_geomean_price")
    assert "ArrowAggregatePython" in plan
    assert "BatchEvalPython" not in plan
    assert "GreaterThan(o_totalprice,0.0)" in plan.replace(" ", "")


def test_denylist_scrub_is_map_only_until_rollup(spark):
    # literal-replace scrub = pure codegen string ops; exactly one
    # shuffle (the per-source rollup), no regex/Python nodes.
    plan = _plan(spark, "doc_denylist_scrub")
    assert "BatchEvalPython" not in plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) <= 2, exchanges  # group rollup + final sort


def test_islands_fold_is_single_shuffle_in_row(spark):
    # gaps-and-islands must run as ONE data shuffle (the per-user
    # collect_set) + the bounded final sort — never the textbook
    # three-exchange window cascade — with the run-length fold in
    # codegen, not Python.
    plan = _plan(spark, "user_activity_islands")
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) <= 2, exchanges
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ewma_scan_prunes_and_stays_jvm(spark):
    plan = _plan(spark, "user_value_ewma")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "value" in read_schema and "props" not in read_schema
    assert "BatchEvalPython" not in plan


def test_tfidf_cosine_pairs_broadcasts_df_and_stays_jvm(spark):
    # posting-list build must broadcast the vocab-sized df table (the
    # token key is the skewed one), and the whole pair pipeline stays
    # codegen — no Python, no doc×doc product anywhere.
    plan = _plan(spark, "doc_tfidf_cosine_pairs")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jaccard_exact_candidates_never_cartesian(spark):
    # prefix filtering must express as equi-joins with pushed pruning
    # predicates — an all-pairs product here would be the quadratic
    # blowup the operator exists to avoid.
    plan = _plan(spark, "doc_jaccard_join_exact")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # r11: the verify stage's shingle-array build is semi-join-pruned
    # to candidate ids before its collect_set shuffle (guide §3.2) —
    # at a fixed dup rate that bounds the verify input by the
    # candidate set instead of the corpus.
    assert "LeftSemi" in plan, plan


def test_skyline_frontier_broadcasts_and_bounds_the_window(spark):
    # the global window runs over the per-size frame only; the fact
    # side joins the (tiny) frontier via broadcast.
    plan = _plan(spark, "part_skyline_frontier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_benford_prunes_scan_to_price_column(spark):
    plan = _plan(spark, "order_price_benford")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_totalprice" in read_schema and "o_orderdate" not in read_schema
    assert "BatchEvalPython" not in plan


def test_overlap_chunks_fan_out_is_in_row(spark):
    # chunk fan-out must be generate/explode over the row-local token
    # array — the only Exchange allowed is the final output sort.
    plan = _plan(spark, "doc_overlap_chunks")
    assert "Generate" in plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) <= 1, exchanges
    assert "BatchEvalPython" not in plan


def test_twap_is_one_window_one_aggregate(spark):
    plan = _plan(spark, "user_value_twap")
    assert len(re.findall(r"^\(\d+\) Window", plan, flags=re.M)) == 1
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "value" in read_schema and "props" not in read_schema


def test_pit_join_is_keyed_equi_join_not_range_only(spark):
    # the validity window must ride as a residual filter on the KEY
    # equi-join — a range-only plan (BroadcastNestedLoopJoin /
    # CartesianProduct) would go quadratic at scale.
    plan = _plan(spark, "event_segment_pit_join")
    assert "CartesianProduct" not in plan
    joins = re.findall(r"^\(\d+\) (\w*HashJoin|SortMergeJoin\w*)", plan, flags=re.M)
    assert joins, plan  # the PIT join itself must be a hash/sort-merge equi-join


def test_perplexity_joins_stay_equi_and_jvm(spark):
    # bigram instances re-join their corpus counts via key equi-joins
    # (at scale the vocab is too big to broadcast — but it must NEVER
    # be a product), and the whole LM scoring stays in codegen.
    plan = _plan(spark, "doc_bigram_perplexity")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_basket_rules_broadcast_marginals_no_product(spark):
    # the part dim and the brand marginal tables must broadcast onto
    # the pair aggregate; the order-key self-join is the only big join.
    plan = _plan(spark, "brand_basket_rules")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_grid_join_is_cell_equi_join(spark):
    # the distance predicate must ride as a residual filter on the
    # grid-cell equi-join — a pure-theta plan would be quadratic.
    plan = _plan(spark, "customer_supplier_grid_join")
    assert "CartesianProduct" not in plan
    joins = re.findall(r"^\(\d+\) (\w*HashJoin|SortMergeJoin\w*)", plan, flags=re.M)
    assert joins, plan
    assert "BatchEvalPython" not in plan


def test_pagerank_iterations_broadcast_rank_vector(spark):
    # each unrolled power iteration joins the |brands|-sized rank
    # vector onto the edge list — those must all be broadcast joins.
    plan = _plan(spark, "brand_copurchase_pagerank")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_attribution_single_user_window_shuffle(spark):
    # last-touch carry-forward = ONE user-key window partitioning; the
    # only other exchanges are the tiny channel rollup + output sort.
    plan = _plan(spark, "purchase_attribution_last_touch")
    assert len(re.findall(r"^\(\d+\) Window", plan, flags=re.M)) == 1
    user_shuffles = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(user_shuffles) >= 1
    assert "BatchEvalPython" not in plan


def test_bm25_probes_postings_via_broadcast_query(spark):
    # the 3-term query set must broadcast onto the (doc, token) tf
    # table — an inverted-index probe, never a corpus-wide join.
    plan = _plan(spark, "doc_bm25_search")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_triangle_join_never_product(spark):
    plan = _plan(spark, "brand_copurchase_triangles")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_interpolation_windows_share_one_type_shuffle(spark):
    # prev/next neighbor lookups must ride windows over ONE
    # event_type partitioning — no extra exchanges per direction.
    plan = _plan(spark, "event_hourly_interpolation")
    type_shuffles = re.findall(r"hashpartitioning\(event_type", plan)
    assert len(type_shuffles) >= 1
    assert "BatchEvalPython" not in plan


def test_allocation_windows_over_nation_frame_only(spark):
    # all allocation windows run over the |nation|-bounded frame after
    # one fact aggregate; dims broadcast onto the fact scan.
    plan = _plan(spark, "region_budget_allocation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_golden_record_is_single_aggregate(spark):
    # survivorship must be ONE hash aggregate over the master key —
    # no window cascade, no per-field self-joins.
    plan = _plan(spark, "customer_golden_record")
    assert "Window" not in plan
    assert "max_by" in plan
    assert "BatchEvalPython" not in plan


def test_waterfall_aligns_months_via_single_outer_join(spark):
    # the month-pair alignment must be ONE outer join of the monthly
    # aggregate with its shifted self — never an orders×orders join.
    plan = _plan(spark, "customer_revenue_waterfall")
    outers = re.findall(r"FullOuter", plan)
    assert outers, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_feature_hashing_is_one_aggregate_no_vocab_join(spark):
    # the hashing trick's whole point: no vocabulary table is built or
    # joined — bucketing is a map stage into one grouped aggregate.
    plan = _plan(spark, "doc_feature_hashing")
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    # r11: the corpus total rides a window over the 256-row grouped
    # frame, so the expensive scan+explode+md5 subtree appears exactly
    # ONCE (the r10 agg+crossJoin form kept two — pruning made the two
    # groupBy exchanges non-identical and ReuseExchange never fired).
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_ann_recall_probes_buckets_and_broadcasts_queries(spark):
    # both rankings join the broadcast query set; no doc×doc product
    # beyond the deliberate query×corpus ground truth.
    plan = _plan(spark, "embedding_ann_recall")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # r11: exact and ANN ranks both read off ONE scored join and ONE
    # window; the recall readout is a conditional groupBy, not a
    # self-join of the ranked frame (the r10 form kept two full
    # scored-join+window subtrees — pruning defeated ReuseExchange).
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) \w*Join", plan)) == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_linkage_candidates_from_window_not_join(spark):
    # sorted-neighborhood candidate generation: ONE window sort over
    # (nation, bal_block) with lead() neighbors — no pair join at all,
    # so candidate work is O(n·W) by construction (VERDICT r1 wrong-2).
    plan = _plan(spark, "customer_linkage_scores")
    assert "Window" in plan, plan
    assert re.search(r"HashJoin|SortMergeJoin|CartesianProduct", plan) is None, plan
    assert "BatchEvalPython" not in plan


def test_density_clusters_propagate_on_cell_frame_only(spark):
    # the point table collapses to the cell grid once; propagation
    # joins run on the dense-cell frame with no product joins.
    plan = _plan(spark, "customer_grid_density_clusters")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_position_attribution_join_is_user_keyed(spark):
    # the purchase×touch join must key on user_id (residual time
    # predicate), never a global product.
    plan = _plan(spark, "purchase_attribution_position")
    assert "CartesianProduct" not in plan
    joins = re.findall(r"^\(\d+\) (\w*HashJoin|SortMergeJoin\w*)", plan, flags=re.M)
    assert joins, plan


def test_cusum_argmax_is_integer_windows_on_daily_frame(spark):
    # change-point selection must run on the tiny daily frame with
    # integer windows — no float accumulation deciding the argmax.
    plan = _plan(spark, "event_value_cusum_changepoint")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_mode_imputation_broadcasts_mode_table(spark):
    plan = _plan(spark, "customer_segment_mode_imputation")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_rake_phrase_assembly_is_in_row_with_broadcast_stats(spark):
    # phrase runs assemble in-row; stopword and word-stat tables are
    # dimension-sized and must broadcast onto the token stream.
    plan = _plan(spark, "doc_rake_keyphrases")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_rolling_median_fan_out_is_in_row(spark):
    # the window fan-out must be an in-row sequence/explode, then ONE
    # grouped percentile — no per-window fact re-scan.
    plan = _plan(spark, "event_rolling_median")
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan


def test_journey_edit_distance_blocked_never_product(spark):
    # pair generation must equi-join on the 4-char journey-prefix
    # block key (cardinality grows with n) — never users².
    plan = _plan(spark, "user_journey_edit_distance")
    assert "CartesianProduct" not in plan
    joins = re.findall(r"^\(\d+\) (\w*HashJoin|SortMergeJoin\w*)", plan, flags=re.M)
    assert joins, plan
    assert "BatchEvalPython" not in plan


def test_modern_sql_surface_is_single_aggregate(spark):
    plan = _plan(spark, "order_modern_sql_surface")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ks_and_acf_run_on_collapsed_frames(spark):
    # both diagnostics collapse the fact table once; windows/joins
    # run on the per-value / per-day frames only.
    for name in ("event_value_ks_test", "event_daily_acf"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_ties_topk_single_window_with_group_limit_pushdown(spark):
    plan = _plan(spark, "brand_top_parts_with_ties")
    assert len(re.findall(r"^\(\d+\) Window$", plan, flags=re.M)) == 1
    # rank()<=k must push down as WindowGroupLimit (partial + final)
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


def test_incremental_near_dup_banded_join_no_product(spark):
    # batch-vs-corpus candidates must equi-join on (band, band_val)
    # buckets — never batch×corpus.
    plan = _plan(spark, "incremental_near_dup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_mixture_and_srm_entries_are_single_aggregates(spark):
    # mixture weights / SRM collapse to tiny frames before any window;
    # no joins, no Python row UDFs.
    for name in ("corpus_mixture_weights", "ab_srm_check"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_matryoshka_folds_stay_jvm_side(spark):
    plan = _plan(spark, "embedding_matryoshka_truncation")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_ngram_novelty_window_no_vocab_join(spark):
    # novelty must come from ONE min-window over the shingle partition,
    # never a join against a materialized vocabulary table.
    tree = _tree(_plan(spark, "doc_ngram_novelty"))
    assert "Window" in tree
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree


def test_threshold_sweep_single_candidate_pass(spark):
    # the 5-threshold sweep must reuse one candidate/verify pipeline —
    # the threshold frame is a literal explode, not another scan.
    plan = _plan(spark, "near_dup_threshold_sweep")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hhi_folds_in_row_after_broadcast_star(spark):
    plan = _plan(spark, "nation_revenue_hhi")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_segment_audit_window_only_no_join(spark):
    # shared-ness comes from ONE min/max window over seg_hash —
    # never a count-distinct join-back (double shuffle volume).
    tree = _tree(_plan(spark, "corpus_dup_segment_audit"))
    assert "Window" in tree
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree


def test_segment_rewrite_single_hash_shuffle(spark):
    # keep-first rank + per-doc reassembly: one window on seg_hash,
    # one doc aggregate — no join, no cartesian anywhere.
    tree = _tree(_plan(spark, "doc_segment_dedup_rewrite"))
    assert "Window" in tree
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree


def test_keep_best_argmax_is_windowed_join(spark):
    # labels ⋈ quality on the id key, then ONE cluster window —
    # no all-pairs anything.
    plan = _plan(spark, "near_dup_keep_best")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_token_entropy_is_map_only(spark):
    # the entropy fold is entirely in-row: no join, no window, no
    # shuffle except the output sort.
    tree = _tree(_plan(spark, "doc_token_entropy"))
    assert "Join" not in tree
    assert "Window" not in tree
    assert "BatchEvalPython" not in tree
    assert "ArrowEvalPython" not in tree


def test_bootstrap_partial_aggregates_before_shuffle(spark):
    # the B-way fan-out must collapse map-side: partial HashAggregate
    # under the exchange, and the point-estimate piggyback must ride a
    # broadcast, not a cartesian.
    plan = _plan(spark, "order_price_bootstrap_ci")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    tree = _tree(plan)
    assert "HashAggregate" in tree


def test_holt_fold_stays_jvm_side(spark):
    plan = _plan(spark, "user_value_holt_forecast")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_zorder_interleave_pure_codegen_no_join(spark):
    # the Morton key is an unrolled integer expression: single
    # aggregate over a project, nothing else.
    tree = _tree(_plan(spark, "orders_zorder_locality"))
    assert "Join" not in tree
    assert "Window" not in tree
    assert "BatchEvalPython" not in tree


def test_ols_trend_broadcasts_dims_single_fact_shuffle(spark):
    # the nation dim is force-broadcast; the customer join is
    # deliberately UNHINTED (corpus-scale side — AQE decides), so
    # only >= 1 broadcast is pinned.
    plan = _plan(spark, "nation_revenue_trend_ols")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lsh_recall_eval_no_product(spark):
    # both pair sets come from bucketed operators; the eval join is
    # keyed on the pair id — never a cartesian.
    plan = _plan(spark, "lsh_recall_vs_exact")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_dimension_profile_single_aggregate(spark):
    # posexplode fan-out then ONE map-side-combinable aggregate —
    # no join, no window before the |dims|-row frame.
    tree = _tree(_plan(spark, "embedding_dimension_profile"))
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree


def test_lang_confusion_no_join_back(spark):
    # the true label rides the scoring projection — no join onto
    # the corpus; the only window runs on the cell frame.
    tree = _tree(_plan(spark, "lang_id_confusion"))
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree


def test_no_cartesian_or_row_udfs_in_any_declared_entry(spark):
    """Blanket plan audit over the ENTIRE declared inventory: no
    unintended cartesian products (broadcast-scalar piggybacks
    compile to BroadcastNestedLoopJoin, so a CartesianProduct node
    always means a missing join key) and no row-at-a-time Python
    UDFs anywhere. Arrow stages (mapInPandas/cogroup kernels) are
    allowed — they're the sanctioned Python escape hatch — but only
    in the entries documented to use them. Plans are built, not
    executed, so the sweep stays cheap."""
    arrow_ok = {
        # documented Arrow-kernel entries (dense vector math /
        # merge_asof cogroup / multimodal decode)
        "embedding_kmeans_clusters",
        "embedding_ivf_topk",
        "embedding_ivf_assign",
        "embedding_cosine_topk",
        "hybrid_rrf_search",
        "purchase_asof_click",
        "multimodal_decode",
        "multimodal_feature_topk",
        "multimodal_frame_sample",
        "multimodal_resize",
        "multimodal_header_decode",
        "purchase_click_cogroup_stats",
        "embedding_ann_recall",
        "embedding_semantic_dup_pairs",
        "embedding_semantic_dedup_survivors",
        "embedding_pq_adc_topk",
        "embedding_ivfpq_topk",
    }
    # the Python UDTF API-surface demo is the ONE sanctioned
    # BatchEvalPython site (its codegen twin doc_overlap_chunks is
    # the production path)
    udtf_ok = {"doc_fixed_chunks_udtf"}
    offenders = []
    window_flags: dict[str, int] = {}
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - diagnostic
            offenders.append((name, f"plan build failed: {ex}"))
            continue
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if name not in udtf_ok and "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        if name not in arrow_ok and (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "MapInArrow" in plan
            or "FlatMapCoGroupsInPandas" in plan
        ):
            offenders.append((name, "undocumented Arrow stage"))
        n_unpart = len(unpartitioned_specs(plan))
        if n_unpart:
            window_flags[name] = n_unpart
    assert not offenders, offenders

    # Unpartitioned-window gate (VERDICT r4 item 5): a window with no
    # partition spec moves ALL its input to one task. Allowed ONLY
    # over frames bounded by something other than the corpus — shrink
    # this allowlist, never grow it without a bound argument.
    allow = {
        # dimension/domain-bounded frames (the window input is an
        # aggregate over a small or fixed domain)
        "brand_surrogate_keys": "distinct-brand dimension build (ref T13)",
        "corpus_zipf_curve": "vocabulary-frequency frame",
        "daily_new_returning_users": "calendar-day frame",
        "rolling_weekly_revenue": "calendar-week frame",
        "order_growth_by_year": "order-year frame",
        "part_skyline_frontier": "per-size frontier frame",
        "price_histogram_quantiles": "fixed $1000-bucket grid",
        # constant-k shortlist ranks (the window input is limit(k)-
        # or probe-bounded)
        "embedding_pq_adc_topk": "ADC shortlist rank",
        "embedding_ivfpq_topk": "IVF-PQ shortlist rank",
        "hybrid_rrf_search": "two top-K=300 retriever shortlist ranks",
        # (r5) the six former scale-weak global ranks/ntiles/cumsums —
        # gini, rfm, negative_pairs, spearman, woe_bins, abc — now ride
        # operators/ranking.py::ordered_prefix and left this list.
    }
    unexpected = {n: c for n, c in window_flags.items() if n not in allow}
    assert not unexpected, (
        f"unpartitioned windows outside the allowlist: {unexpected} — "
        "partition the window, bound its input, or justify it above"
    )
    stale = sorted(set(allow) - set(window_flags))
    assert not stale, (
        f"allowlist entries no longer flagged (shrink the list): {stale}"
    )


def test_low_card_domain_assumptions_hold(spark):
    """Runtime half of the census gate below (VERDICT r6 item 8): the
    allowlist justifies each low-cardinality window by a bound that
    assumes the partition key's DOMAIN is small (lang x source
    contingency rollups, per-status counts, nation x segment modes...).
    Pin those domain cardinalities against the actual testdata, so a
    driver testdata regeneration that silently ships a high-cardinality
    "lang" (or similar) fails HERE instead of quietly re-opening the
    per-tiny-key corpus-funnel class the r6 migrations closed."""
    from data_engineer_task_spark.sources.catalog import load_table

    # caps = current domain size (5/20/5/3/5/25 across all three
    # driver scales) with ~2x headroom for benign regenerations
    caps = {
        ("documents", "lang"): 10,
        ("documents", "source"): 40,
        ("events", "event_type"): 10,
        ("orders", "o_orderstatus"): 6,
        ("customer", "c_mktsegment"): 10,
        ("customer", "c_nationkey"): 50,
    }
    actual = {}
    for (t, c), cap in caps.items():
        n = load_table(spark, SF_SMOKE, t).select(c).distinct().count()
        actual[(t, c)] = n
        assert n <= cap, (
            f"{t}.{c} has {n} distinct values (cap {cap}) - the "
            "low-cardinality window allowlist bounds assume a small "
            "domain; re-audit the sites partitioning by this key"
        )


def test_low_cardinality_window_sites_are_bounded():
    """r6 audit gate, the blind spot of the unpartitioned-window test:
    a window PARTITIONED by a handful-of-values key (lang, source,
    event_type, ...) still funnels a corpus-sized slice through one
    task per value at 100 TB unless its INPUT frame is bounded by
    something other than the corpus (a domain rollup, a k-limited
    shortlist, a rank-limit pushdown). Every source site whose window
    partitions ONLY by literal low-cardinality keys must be registered
    here with its bound; new sites fail until justified, fixed sites
    must be removed (shrink-only, like the window gate). The five
    corpus-sized offenders this audit found (LOO encoding, KS
    cumulative/argmax, balanced-lang sample, segment deciles, segment
    analytic ranks) were migrated to groupBy+broadcast /
    ordered_prefix(partition_by=...) spellings and are deliberately
    NOT in this list."""
    import glob
    import os
    import re

    LOW = {
        "lang", "source", "event_type", "region", "c_mktsegment",
        "o_orderstatus", "passed", "split", "from_type", "actual_lang",
        "seg", "is_near_dup", "reject_stage", "c_nationkey",
    }
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_engineer_task_spark",
    )
    found: dict[tuple[str, tuple[str, ...]], int] = {}
    for f in sorted(glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True)):
        src = open(f).read()
        for m in re.finditer(r"W\.partitionBy\(([^)]*)\)", src):
            args = [a.strip() for a in m.group(1).split(",") if a.strip()]
            quoted = [
                a[1:-1] for a in args if re.fullmatch(r'"[A-Za-z_0-9]+"', a)
            ]
            # composites with any non-literal or high-cardinality
            # member multiply the partition count out of the funnel
            # regime — only all-literal, all-low-card specs flag
            if args and len(quoted) == len(args) and set(quoted) <= LOW:
                key = (os.path.basename(f), tuple(quoted))
                found[key] = found.get(key, 0) + 1

    # (file, partition keys) -> (site count, why the window input is
    # bounded). Shrink-only.
    allow: dict[tuple[str, tuple[str, ...]], tuple[int, str]] = {
        ("analytics_ext.py", ("source",)): (
            1, "literal rn<=50 cap: WindowGroupLimit pushes the limit below the sort"),
        ("analytics_ext10.py", ("region",)): (
            1, "region x nation rollup (<=25 rows)"),
        ("analytics_ext10.py", ("event_type",)): (
            2, "per-(type, hour) spine rollup (calendar-bounded)"),
        ("analytics_ext14.py", ("event_type",)): (
            1, "per-(type, day) rollup (calendar-bounded)"),
        ("analytics_ext14.py", ("c_nationkey",)): (
            1, "nation x segment mode rollup (<=125 rows)"),
        ("analytics_ext2.py", ("from_type",)): (
            1, "type x type transition rollup (<=25 rows)"),
        ("analytics_ext2.py", ("lang",)): (
            1, "lang x source contingency rollup"),
        ("analytics_ext2.py", ("source",)): (
            1, "lang x source contingency rollup"),
        ("analytics_ext2.py", ("o_orderstatus",)): (
            1, "per-status count rollup (<=3 rows)"),
        ("analytics_ext23.py", ("actual_lang",)): (
            1, "lang x lang confusion rollup"),
        ("analytics_ext23.py", ("passed",)): (
            1, "2x2 contingency cells"),
        ("analytics_ext31.py", ("seg",)): (
            2, "t-closeness segment x 11-bin grid"),
        ("analytics_ext31.py", ("event_type",)): (
            1, "k_smallest output (<= salt_buckets*k rows/group)"),
        ("analytics_ext6.py", ("lang",)): (
            1, "lang x source MI cell rollup"),
        ("analytics_ext6.py", ("source",)): (
            1, "lang x source MI cell rollup"),
        ("analytics_ext7.py", ("event_type",)): (
            1, "per-(type, bin) chi-square cells (fixed bins)"),
        ("analytics_ext9.py", ("region",)): (
            1, "region x nation rollup (<=25 rows)"),
    }
    unexpected = {
        k: c for k, c in found.items()
        if k not in allow or c != allow[k][0]
    }
    assert not unexpected, (
        f"low-cardinality window sites outside the allowlist (or count "
        f"drift): {unexpected} — bound the window's input, migrate to "
        "ordered_prefix(partition_by=...), or justify it above"
    )
    stale = sorted(k for k in allow if k not in found)
    assert not stale, (
        f"allowlist entries no longer present (shrink the list): {stale}"
    )
