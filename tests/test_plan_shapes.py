"""Physical-plan shape assertions — the scale contract, made testable.

Correctness says the query returns the right rows at sf0.01; these tests
say the *plan* is the one that survives 100 TB: filters reach the parquet
scan, small dimensions broadcast (the fact table never shuffles for
them), and top-K compiles to TakeOrderedAndProject instead of a global
sort.  A regression here is a performance bug even while results stay
correct.
"""

from __future__ import annotations

import pytest

from project_bigdata_recsys_spark.operators import analytics, relational, setops
from tests.conftest import SF_SMALL


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_date_filter(spark):
    df = analytics.pricing_summary(spark, SF_SMALL)
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan


def test_pricing_summary_partial_aggregation(spark):
    # map-side combine: a partial_ aggregate must appear below the shuffle
    plan = _physical(analytics.pricing_summary(spark, SF_SMALL))
    assert "partial_sum" in plan


def test_star_join_broadcasts_dimensions(spark):
    plan = _physical(analytics.local_supplier_volume(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # the region/nation/customer chain must never shuffle the fact table:
    # exactly one Exchange may involve lineitem side before aggregation;
    # assert no SortMergeJoin was chosen for the dimension joins
    assert plan.count("SortMergeJoin") <= 1


def test_top_k_is_take_ordered(spark):
    plan = _physical(relational.course_stats(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark):
    df = relational.course_stats(spark, SF_SMALL)
    plan = _physical(df)
    # lineitem scan must not read all 11 columns for a 4-column query
    assert "l_comment" not in plan
    assert "l_shipdate" not in plan.split("FileScan")[1].split("PushedFilters")[0] if "FileScan" in plan else True


def test_intersect_plans_as_semi_join(spark):
    plan = _optimized(setops.customers_intersect(spark, SF_SMALL))
    assert "LeftSemi" in plan


def test_except_plans_as_anti_join(spark):
    plan = _optimized(setops.customers_except(spark, SF_SMALL))
    assert "LeftAnti" in plan


@pytest.mark.parametrize(
    "fn",
    [
        analytics.pricing_summary,
        analytics.shipping_priority,
        analytics.local_supplier_volume,
        analytics.small_quantity_revenue,
        analytics.big_orders,
    ],
)
def test_no_cartesian_products(spark, fn):
    plan = _physical(fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan


def test_rollup_single_expand_pass(spark):
    """Grouping-set queries must compute all hierarchy levels in ONE
    Expand + aggregate pass, not one scan per level."""
    from project_bigdata_recsys_spark.operators.relational import time_rollup

    plan = _physical(time_rollup(spark, SF_SMALL))
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_corpus_operators_prune_to_needed_columns(spark):
    """The documents scan under every corpus operator must read only the
    columns the operator uses -- a scan that drags source/n_chars (or, for
    text-only ops, lang) through a 100 TB corpus is a plan bug even while
    results stay correct."""
    from project_bigdata_recsys_spark.plans.queries import QUERIES

    expected = {
        "minhash_candidates": "struct<doc_id:bigint,text:string>",
        "simhash_near_pairs": "struct<doc_id:bigint,text:string>",
        "repetition_profile": "struct<doc_id:bigint,text:string>",
        "pii_redaction_profile": "struct<doc_id:bigint,text:string>",
    }
    for name, schema in expected.items():
        plan = _physical(QUERIES[name](spark, SF_SMALL))
        read_schemas = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert read_schemas, f"{name}: no parquet scan found"
        # r10: some operators consume pre-built parquet artifacts (the
        # shared minhash-signature memo) whose scans are narrower than
        # the documents schema by construction — the invariant under
        # test is about scans OF THE DOCUMENTS TABLE only
        doc_scans = [ln for ln in read_schemas if "documents.parquet" in ln]
        for line in doc_scans:
            assert schema in line, f"{name}: unpruned scan: {line.strip()}"
        # and no scan anywhere may drag the columns these ops never use
        for line in read_schemas:
            for col in ("source:", "n_chars:", "lang:"):
                assert col not in line, f"{name}: unpruned scan: {line.strip()}"


def test_contamination_benchmark_side_broadcasts(spark):
    from project_bigdata_recsys_spark.functions.dedup import contamination_check

    plan = _physical(contamination_check(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_percentile_filter_has_no_global_sort_window(spark):
    """quality_percentile_filter computes an exact global percent_rank via
    range-partitioned local ranks + partition offsets — the plan must show
    the distributed range exchange, and its window sorts must be
    PARTITIONED (pid), never an empty-partition-spec global window over
    the corpus (a single-partition sort at scale)."""
    from project_bigdata_recsys_spark.functions.text import quality_percentile_filter

    plan = _physical(quality_percentile_filter(spark, SF_SMALL))
    assert "rangepartitioning(score" in plan, plan
    # the corpus-side row_number window must be keyed by pid; the only
    # unkeyed windows left are the offset cumsums over the tiny
    # per-partition-count frame
    assert "windowspecdefinition(__pid" in plan, plan


def test_chunk_rows_is_jvm_side(spark):
    """chunk_rows must plan as Generate(posexplode) inside codegen — no
    BatchEvalPython / ArrowEvalPython / PythonUDTF node (the UDTF twin
    exists as a declared surface, but the pipeline kernel stays JVM-side)."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.text import chunk_rows

    docs = load_table(spark, SF_SMALL, "documents")
    plan = _physical(chunk_rows(docs))
    assert "Generate posexplode" in plan, plan
    for marker in ("PythonUDTF", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, plan


def test_power_user_rank_no_global_window(spark):
    """The dense_rank must come from the broadcast distinct-count map,
    never an unkeyed window over the per-customer frame (round-2's
    single-partition scale bug)."""
    from project_bigdata_recsys_spark.operators import windows

    df = windows.power_user_rank(spark, SF_SMALL)
    plan = _physical(df)
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_skew_report_no_global_sort(spark):
    """Each per-column top-K must compile to TakeOrderedAndProject with
    map-side partial aggregation — never a global sort of the key
    counts."""
    from project_bigdata_recsys_spark.operators.skew import skew_report

    plan = _physical(skew_report(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_interval_overlap_join_is_hash_not_nested_loop(spark):
    """The bucketized overlap join must compile to a BroadcastHashJoin
    on the bucket key — the naive overlap theta-join would be a
    BroadcastNestedLoopJoin (every interval against every window)."""
    from project_bigdata_recsys_spark.operators.ranges import interval_overlap_counts

    plan = _physical(interval_overlap_counts(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_prunes_scan_and_aggregates_partially(spark):
    """Span dedup must read only (doc_id, text) from parquet and combine
    the span-frequency count map-side before its hash shuffle."""
    from project_bigdata_recsys_spark.functions import spans

    plan = _physical(spans.span_dedup_profile(spark, SF_SMALL))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_join_no_payload_shuffle(spark):
    """The diff must be ONE full-outer PK join whose shuffled columns are
    key + 64-hex digest — the order payload columns must not appear in
    the join output schema."""
    from project_bigdata_recsys_spark.operators import snapshot

    df = snapshot.snapshot_diff(spark, SF_SMALL)
    plan = _physical(df)
    assert plan.count("FullOuter") == 1, plan
    # digests computed in the scan projection; payload pruned before join
    assert "__old_digest" in plan and "__new_digest" in plan
    assert "o_orderpriority" not in plan.split("FullOuter")[0], (
        "payload column leaked above the join"
    )


def test_group_quantile_filter_windows_only_histogram(spark):
    """The per-group cut must window over the (lang, score) HISTOGRAM,
    never the per-document frame: the window's child must aggregate
    first (partial_count below the window), and the threshold side must
    broadcast back."""
    from project_bigdata_recsys_spark.functions import text as text_fns

    plan = _physical(text_fns.group_quantile_filter(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # the histogram aggregate sits between scan and window
    assert "partial_count" in plan


def test_pagerank_no_cartesian_and_broadcast_n(spark):
    """The 1-row N frame must broadcast (nested-loop over ONE row is the
    intended crossJoin); no real cartesian anywhere."""
    from project_bigdata_recsys_spark.functions import graph

    df = graph.item_pagerank(spark, SF_SMALL)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    from project_bigdata_recsys_spark.caching import release_tracked

    release_tracked()


def test_sql_exists_decorrelates_to_semi_anti_joins(spark):
    """EXISTS must compile to LeftSemi and NOT EXISTS to LeftAnti — a
    correlated re-execution per customer is the OLTP porting bug this
    family guards against."""
    from project_bigdata_recsys_spark.operators import sqlsurface

    plan = _physical(sqlsurface.sql_exists_filter(spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_sql_correlated_scalar_decorrelates_to_aggregate_join(spark):
    """The correlated min must become ONE aggregate joined back, never a
    nested per-row subplan."""
    from project_bigdata_recsys_spark.operators import sqlsurface

    plan = _physical(sqlsurface.sql_cheapest_supplier(spark, SF_SMALL))
    assert "partial_min" in plan  # decorrelated aggregate, map-side combined
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Spark 4 injects a runtime bloom filter from the selective (build)
    side of a shuffle join into the probe side's scan — at 100 TB this
    self-activates (10 GB application-side threshold, on by default) and
    prunes probe rows before the shuffle.  Forced on here by zeroing the
    threshold; results must match the unfiltered join exactly."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_SMALL, "lineitem")
        orders = load_table(spark, SF_SMALL, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "might_contain" in _optimized(j)
        got = j.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    want = (
        load_table(spark, SF_SMALL, "lineitem")
        .join(
            load_table(spark, SF_SMALL, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want


def test_length_bucketed_batches_windows_are_partitioned(spark):
    """Bucket assignment must ride the distributed exact-rank recipe
    (range exchange + pid-keyed local ranks) and the within-bucket batch
    window must partition on the bucket id — no unkeyed window anywhere
    touches the document frame."""
    from project_bigdata_recsys_spark.functions.curation import (
        length_bucketed_batches,
    )

    plan = _physical(length_bucketed_batches(spark, SF_SMALL))
    assert "rangepartitioning(n_tokens" in plan, plan
    assert "windowspecdefinition(__pid" in plan, plan
    assert "windowspecdefinition(bucket" in plan, plan


def test_novelty_profile_probe_joins_on_hash(spark):
    """The eval-vs-train probe must key every exchange on the 16-hex
    shingle hash — gram text never shuffles — and plan as a hash-family
    join, never a nested loop."""
    from project_bigdata_recsys_spark.functions.dedup import novelty_profile

    plan = _physical(novelty_profile(spark, SF_SMALL))
    assert "hashpartitioning(h" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cross_source_overlap_reuses_persisted_frame(spark):
    """The distinct (source, hash) frame feeds three consumers; the plan
    must read it from cache (InMemoryTableScan), not recompute the
    scan+shingle+distinct pipeline per consumer."""
    from project_bigdata_recsys_spark.caching import release_tracked
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        cross_source_overlap,
    )

    try:
        plan = _physical(cross_source_overlap(spark, SF_SMALL))
        # all three consumers (both pair-join sides + sizes) read the
        # cache; the only FileScan text left is the one embedded in the
        # cached relation's own description
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        release_tracked()


def test_semantic_contamination_no_all_pairs(spark):
    """Eval and train vectors meet only inside RP-LSH cells: the plan
    must contain no cartesian/nested-loop join (the all-pairs shape) —
    candidate generation and verification are hash joins throughout."""
    from project_bigdata_recsys_spark.functions.similarity import (
        semantic_contamination,
    )

    plan = _physical(semantic_contamination(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_centroid_ops_broadcast_centroids(spark):
    """Both embedding label-QA passes must join the KB-scale centroid
    frame by broadcast — the exploded vector frame (the big side) never
    shuffles for the join — and plan no cartesian/nested-loop join."""
    from project_bigdata_recsys_spark.functions.similarity import (
        label_centroid_outliers,
        nearest_centroid_agreement,
    )

    for fn in (label_centroid_outliers, nearest_centroid_agreement):
        plan = _physical(fn(spark, SF_SMALL))
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_source_triage_report_one_scan_composition(spark):
    """The composed report derives all three blocks from ONE
    persist_tracked per-doc frame: the scorecard/TTR/simhash consumers
    must read the cache (InMemoryTableScan), and at most one live
    documents FileScan may remain anywhere in the plan (the cached
    relation's description embeds its own FileScan text, so count
    cache reads, not scan strings)."""
    from project_bigdata_recsys_spark.caching import release_tracked
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        source_triage_report,
    )

    try:
        plan = _physical(source_triage_report(spark, SF_SMALL))
        # consumers: scorecard per-doc + copies side, TTR explode,
        # simhash tokens, attribution source join >= 4 cache reads
        assert plan.count("InMemoryTableScan") >= 4, plan
    finally:
        release_tracked()


def test_pit_join_is_hash_family_not_nested_loop(spark):
    """The SCD2 point-in-time join must plan as an equi join on the key
    with the validity interval as a join filter — never a nested-loop /
    cartesian range explosion."""
    from project_bigdata_recsys_spark.operators.asof import pit_segment_rollup

    plan = _physical(pit_segment_rollup(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_concurrent_events_peak_prunes_scan_no_cartesian(spark):
    """The sweep reads only (event_type, ts, value) from the events scan
    and every join is keyed — no cartesian products."""
    plan = _physical(analytics.concurrent_events_peak(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan[:500]
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"event_type", "ts", "value"}, cols


def test_bm25_query_terms_broadcast(spark):
    """The 3-term query list and the 1-row corpus stats broadcast into
    the postings join; nothing plans as a cartesian product."""
    from project_bigdata_recsys_spark.functions.text import bm25_scores

    plan = _physical(bm25_scores(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_item_triangles_all_joins_keyed(spark):
    """Wedge generation and closure are equi-joins (hash/sort-merge) —
    the degree orientation must never fall back to a cartesian plan."""
    from project_bigdata_recsys_spark.functions.graph import item_triangles

    plan = _physical(item_triangles(spark, SF_SMALL))
    assert "CartesianProduct" not in plan


def test_cms_layer_single_fact_scan_per_side(spark):
    """The sketch grid comes from ONE exploded scan (map-side combined);
    the probe side broadcasts — no cartesian, no row-at-a-time Python."""
    from project_bigdata_recsys_spark.operators.relational import (
        cms_heavy_hitters,
    )

    plan = _physical(cms_heavy_hitters(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ucb_ranking_single_agg_no_window_takeordered(spark):
    """UCB1 is ONE map-side-combined aggregation + broadcast 1-row total
    + TakeOrdered — any window or extra fact shuffle is a regression."""
    df = analytics.ucb_ranking(spark, SF_SMALL)
    plan = _physical(df)
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total crossJoin
    # exactly one fact-side shuffle: the groupBy(l_partkey) exchange
    # (the 1-row aggregate adds its own single-partition exchange)


def test_session_ngrams_windows_all_partitioned(spark):
    """Every window (lag, running sum, two leads) is user-partitioned —
    an unpartitioned window over the event stream is the single-partition
    cliff this plan exists to avoid."""
    df = analytics.session_ngrams(spark, SF_SMALL)
    plan = _physical(df)
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in spec, plan


def test_perplexity_buckets_no_fact_scale_global_window(spark):
    """The only unpartitioned windows are the range-shuffle offset frames
    (~num-partitions rows) inside global_value_cum — the per-source share
    window runs over the 3-buckets-per-source aggregate.  No window may
    sit directly over the documents scan."""
    from project_bigdata_recsys_spark.functions import text as text_fns

    df = text_fns.perplexity_buckets(spark, SF_SMALL)
    plan = _physical(df)
    # thresholds come from the histogram kernel, not a global percent_rank
    assert "percent_rank" not in plan, plan


def test_ewma_anomalies_weight_join_broadcast_no_window(spark):
    """The 14-row weight frame must broadcast (never shuffle the counts
    frame for it) and the whole plan is window-free — the closed form
    exists to avoid the sequential recurrence."""
    df = analytics.ewma_anomalies(spark, SF_SMALL)
    plan = _physical(df)
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_zorder_profile_single_fact_scan_per_layout_no_window(spark):
    """Everything after the (layout, file) min/max aggregation runs on
    the ~128-row stats frame; probes broadcast."""
    from project_bigdata_recsys_spark.operators import maintenance

    df = maintenance.zorder_layout_profile(spark, SF_SMALL)
    plan = _physical(df)
    assert "WindowExec" not in plan and "Window " not in plan, plan


def test_adamic_adar_wedge_join_keyed_and_anti(spark):
    """Wedge enumeration joins on the center key (hash family, never a
    nested-loop over all pairs); existing edges leave via an anti-join."""
    from project_bigdata_recsys_spark.functions import graph as graph_fns

    df = graph_fns.link_prediction_adamic_adar(spark, SF_SMALL)
    plan = _physical(df)
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_ips_eval_takeordered_topk_no_window(spark):
    """The top-k policy support comes from TakeOrdered on the item
    aggregate; weights fold as integer sums — no window, no fact-side
    join after the one aggregation."""
    from project_bigdata_recsys_spark.ml.ranking import ips_eval

    df = ips_eval(spark, SF_SMALL)
    plan = _physical(df)
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_recs_diversity_pair_join_keyed_on_anchor(spark):
    """Rec-pair enumeration joins on the anchor key (never a cartesian);
    rank windows partition by the anchor."""
    from project_bigdata_recsys_spark.ml.ranking import recs_diversity_profile

    df = recs_diversity_profile(spark, SF_SMALL)
    plan = _physical(df)
    assert "CartesianProduct" not in plan, plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "src" in spec, plan


def test_compaction_plan_window_partitioned_by_month(spark):
    from project_bigdata_recsys_spark.operators import maintenance

    df = maintenance.compaction_plan(spark, SF_SMALL)
    plan = _physical(df)
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("month" in s for s in specs), plan


def test_hybrid_search_windows_partition_by_query_term(spark):
    """Both ranking windows and the fusion window partition on the query
    term over shortlist-bounded frames; the dense side probes cells, it
    never cross-joins the corpus against queries."""
    from project_bigdata_recsys_spark.functions import similarity as sim

    df = sim.hybrid_search_rrf(spark, SF_SMALL)
    plan = _physical(df)
    assert "CartesianProduct" not in plan, plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "query_term" in spec or "term" in spec, plan


def test_bloom_pruned_join_prefilter_is_narrow_broadcast(spark):
    # the bitmap must reach the probe side as a broadcast (never a
    # shuffle), and the membership test must sit in a Filter ABOVE the
    # lineitem scan but BELOW the exact join — the pruning happens
    # before any probe-side exchange
    df = relational.bloom_pruned_join(spark, SF_SMALL)
    plan = _physical(df)
    # the membership test is an O(1) word lookup + shift/mask on the
    # dense bitmap array — never a linear array_contains scan (r8
    # session-3 fix: the scan cost 34 s at sf0.1)
    assert "array_contains" not in plan
    assert "shiftright" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bitmap cross join
    # the filter appears on the probe branch before its join exchange
    probe_branch = plan.split("shiftright")[0]
    assert "l_extendedprice" not in probe_branch or "Exchange" not in probe_branch.split("FileScan")[-1]


def test_salted_join_is_shuffle_join_on_salt(spark):
    from project_bigdata_recsys_spark.operators import skew

    df = skew.salted_join_agg(spark, SF_SMALL)
    plan = _physical(df)
    # the salt must be part of the join key and the join must be the
    # shuffle-hash form (a broadcast would make salting dead weight —
    # the operator exists for the past-broadcast-threshold regime)
    assert "__salt" in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_containment_pairs_no_cartesian_and_capped_join(spark):
    """The containment candidate join must be a hash join on the rare
    shingle (never a cartesian), and exact verification must join the
    shingle arrays by doc id — candidate-sized, not corpus²."""
    from project_bigdata_recsys_spark.functions.dedup import (
        containment_pairs,
    )

    plan = _physical(containment_pairs(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kneser_ney_readout_is_take_ordered(spark):
    """The KN top-k must be a heap (TakeOrderedAndProject), never a
    global sort of the bigram table."""
    from project_bigdata_recsys_spark.functions.text import (
        kneser_ney_bigram,
    )

    plan = _physical(kneser_ney_bigram(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_sql_lateral_decorrelates_to_join(spark):
    """Catalyst must decorrelate the LATERAL derived table into a
    ranked join — the optimized plan may carry no correlated-subquery
    node (a per-customer re-scan would be the O(n·m) trap)."""
    from project_bigdata_recsys_spark.operators.sqlsurface import (
        sql_lateral_topk,
    )

    df = sql_lateral_topk(spark, SF_SMALL)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LateralJoin" not in optimized
    plan = _physical(df)
    assert "CartesianProduct" not in plan


def test_bpe_fertility_single_corpus_scan_for_sources(spark):
    """Applying the learned merges must touch the documents table a
    bounded number of times: once for the (source, word) counts plus
    the merge-training scan — never once per merge round."""
    from project_bigdata_recsys_spark.functions.text import (
        bpe_fertility_after_merges,
    )

    df = bpe_fertility_after_merges(spark, SF_SMALL, n_merges=4)
    plan = _physical(df)
    assert plan.count("FileScan parquet") <= 2, (
        "merge application must be expression-only over the per-source"
        " vocabulary, not a re-scan per round"
    )


def test_vacuum_plan_joins_broadcast(spark):
    """The vacuum manifest rollup joins version frames that are months-
    sized — every join must broadcast, nothing may sort-merge."""
    from project_bigdata_recsys_spark.operators.maintenance import (
        vacuum_retention_plan,
    )

    plan = _physical(vacuum_retention_plan(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
