"""The engine's declared query surface (driver contract).

``QUERIES`` maps every implemented operator from SURVEY.md §2 to a builder
``(spark, sf_dir) -> DataFrame``; ``ORACLES`` holds the equivalent ANSI SQL
for DuckDB.  EVERY query has an oracle (round 3): deterministic operators
are value-matched outright (including minhash/simhash/RP-LSH — all hashes
are md5/data-derived, never an engine RNG), while engine-seeded iterative
models (ALS, GBT, pyspark.ml LSH) are declared as INVARIANT PROFILES —
exact data anchors the oracle recomputes plus structural booleans it
asserts as literal TRUE; their raw outputs stay library functions under
seeded tests (SURVEY.md §5.2).

Oracle-parity rules (see operators/relational.py header): identical
aliases, rounded floats, total orderings under every LIMIT, BIGINT casts
where DuckDB would widen to HUGEINT, INTEGER casts where DuckDB widens
rank/size functions to BIGINT.

Fixed-point sums (round 6): any compared sum/avg over a money/value
double is computed as a per-row-scaled BIGINT sum on BOTH sides
(``sum(CAST(round(x * 10^k) AS BIGint))/10^k`` with k matching the
expression's decimal width) — double summation is partition-order-
dependent and can flip the printed rounding between runs; integer sums
cannot.  Exceptions, deliberate: streaming per-session value sums (tiny
per-key groups; stateful kernels own their accumulation), per-array HOF
reductions (index-ordered on both engines), and window running sums
over already-exact integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_bigdata_recsys_spark.functions import (
    curation,
    dedup,
    graph,
    similarity,
    sourcetriage,
    spans,
    text,
)
from project_bigdata_recsys_spark.operators import (
    analytics,
    asof,
    maintenance,
    quality,
    ranges,
    relational,
    setops,
    skew,
    snapshot,
    sqlsurface,
    windows,
)
from project_bigdata_recsys_spark.sources import multimodal
from project_bigdata_recsys_spark.streaming import replay

QueryFn = Callable[[SparkSession, str], DataFrame]


def _als_user_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS factor-export surface (M1–M5, F11/F12) as an invariant profile —
    ALS is engine-seeded, so the oracle checks exact data anchors plus
    literal-TRUE structural booleans (see ml.recsys.als_factor_profile;
    raw factor export = ml.recsys.factors_as_json, tested in test_ml.py)."""
    from project_bigdata_recsys_spark.ml.recsys import als_factor_profile

    return als_factor_profile(spark, sf_dir, rank=8)


def _als_top_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS top-5 per user (M8/M10) as an invariant profile — anchors +
    literal-TRUE booleans (see ml.recsys.als_recommendation_profile; raw
    rec rows = ml.recsys.als_top_recommendations, tested in test_ml.py)."""
    from project_bigdata_recsys_spark.ml.recsys import als_recommendation_profile

    return als_recommendation_profile(spark, sf_dir, k=5)


def _classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/M7 GBT train+eval as an invariant profile — md5-rank split
    counts (oracle recomputes exactly) + metric-range booleans (see
    ml.classifier.classifier_metrics_profile; raw metric values =
    classifier_metrics_query, tested in test_ml.py)."""
    from project_bigdata_recsys_spark.ml.classifier import classifier_metrics_profile

    return classifier_metrics_profile(spark, sf_dir)


def _stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 deterministic stratified split (md5-rank membership) — oracle-checked."""
    from project_bigdata_recsys_spark.ml.classifier import stratified_sample_query

    return stratified_sample_query(spark, sf_dir)


def _synthetic_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 seeded synthetic generator — md5-uniform draws, oracle-checked."""
    from project_bigdata_recsys_spark.sources.ingest import synthetic_interactions

    return synthetic_interactions(spark, n=2000, seed=42).orderBy(
        "user_id", "course_id", "event_ts"
    )


def _mutated_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19 drift simulator (noise + label flips) — md5-uniform draws, oracle-checked."""
    from project_bigdata_recsys_spark.sources.ingest import (
        mutate_with_noise,
        synthetic_interactions,
    )

    base = synthetic_interactions(spark, n=2000, seed=42)
    return mutate_with_noise(
        base, ["action_play_video", "action_problem_check"], seed=7
    ).orderBy("user_id", "course_id", "event_ts")


def _csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S3 tolerant CSV scan + S8 CSV snapshot sink, gate-checkable:
    orders → CSV (+injected malformed shard) → tolerant re-scan →
    aggregate must equal the oracle's aggregate over the parquet."""
    from project_bigdata_recsys_spark.sources.ingest import csv_roundtrip_query

    return csv_roundtrip_query(spark, sf_dir)


def _kb_popular(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.recsys import kb_popular_items

    return kb_popular_items(spark, sf_dir)


def _kb_success_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.recsys import kb_success_profile

    return kb_success_profile(spark, sf_dir)


def _pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-scale packing: n_shards=4 splits each lang window into
    md5 sub-streams (curation.shard_key) so parallelism is #langs ×
    n_shards, not #langs.  The oracle replicates the md5 shard id with
    DuckDB's identical hex arithmetic."""
    return curation.pack_sequences(spark, sf_dir, n_shards=4)


def _embedding_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n²-free end-to-end embedding dedup path: RP-LSH banded
    candidate pairs (exact-verified) → connected components → cluster
    summary.  Same output contract as embedding_dup_clusters; the
    oracle recomputes the LSH bucket arithmetic + recursive CC."""
    return similarity.embedding_dup_clusters(spark, sf_dir, use_lsh=True)


def _curation_funnel_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline with its pack stage sharded 4 ways
    (window keys (lang, shard)): every stage count except n_sequences is
    shard-invariant, and the oracle recomputes the sharded packing."""
    return curation.curation_funnel(spark, sf_dir, n_shards=4)


def _source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture keyed by SOURCE (crawl/feed mixing)
    — the same kernel as corpus_mixture, domain column swapped."""
    return curation.corpus_mixture(spark, sf_dir, by="source")


def _corpus_mixture_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-scale mixture draw: each lang quota splits across 4 md5
    shards (floor share + remainder to low shard ids — quota-conserving);
    the oracle replicates the shard arithmetic in DuckDB."""
    return curation.corpus_mixture(spark, sf_dir, n_shards=4)


def _incremental_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(batch)-per-day dedup shape under driver evidence: build the
    persisted corpus index (fingerprints + signatures + (band_no, kb)-
    partitioned bands) into a temp dir, then probe it with the planted
    batch.  Row-identical to the inline form by construction, so it
    shares the SAME DuckDB oracle as `incremental_dedup` — a red row
    here means the index path diverged from the one-shot path."""
    from project_bigdata_recsys_spark.caching import scratch_dir

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import (
        build_dedup_index,
        planted_ingest_batch,
        probe_dedup_index,
    )

    index_dir = scratch_dir(prefix="spark_dedup_index_") + "/idx"
    build_dedup_index(spark, sf_dir, index_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return probe_dedup_index(spark, index_dir, planted_ingest_batch(docs))


def _span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span dedup under driver evidence: persist the corpus
    span index into a temp dir, then probe it with the planted ingest
    batch (same batch as the incremental minhash path) — every batch
    span classified dup-vs-corpus / dup-intra-batch / new, per lang."""
    from project_bigdata_recsys_spark.caching import scratch_dir

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import planted_ingest_batch

    index_dir = scratch_dir(prefix="spark_span_index_") + "/idx"
    spans.build_span_index(spark, sf_dir, index_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return spans.probe_span_index(spark, index_dir, planted_ingest_batch(docs))


def _jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSONL ingest under driver evidence: documents → JSONL
    sink (+injected corrupt shard) → tolerant re-scan → per-lang profile
    must equal the oracle's profile over the original parquet."""
    from project_bigdata_recsys_spark.sources.ingest import jsonl_roundtrip_query

    return jsonl_roundtrip_query(spark, sf_dir)


def _corpus_mixture_tokens_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing in its production form: each lang's token
    quota split across 4 md5 shards (floor + remainder to low shard ids,
    conserved exactly), each (lang, shard) filling by local cumsum."""
    return curation.corpus_mixture_tokens(spark, sf_dir, n_shards=4)


# Registration order matters: the driver's correctness gate executes the
# FIRST 50 entries.  Since round 6 the authoritative window is the
# explicit ``_GATE_WINDOW`` rebuild at the END of this module — it runs
# after every registration (dict-literal AND assignment-style), so
# late-registered queries can no longer silently land below the window
# (the round-5 late-wave mistake).  The literal order below is historical
# grouping only; everything outside the window is regression-protected by
# tests/test_oracle_parity.py (same oracles, sf0.001) every test run.
QUERIES: dict[str, QueryFn] = {
    # --- new in round 5 (second session): span-level dedup ---------------
    "span_dedup_profile": spans.span_dedup_profile,
    "duplicated_spans": spans.duplicated_spans,
    "normalized_duplicates": text.normalized_duplicates,
    "weighted_sample": curation.weighted_sample,
    "snapshot_diff": snapshot.snapshot_diff,
    "cluster_aware_split": curation.cluster_aware_split,
    "item_pagerank": graph.item_pagerank,
    "group_quantile_filter": text.group_quantile_filter,
    "span_dedup_incremental": _span_dedup_incremental,
    "stream_trending_items": replay.stream_trending_items,
    "knn_pq": similarity.pq_knn,
    "sql_cheapest_supplier": sqlsurface.sql_cheapest_supplier,
    "sql_exists_filter": sqlsurface.sql_exists_filter,
    "sql_in_subquery": sqlsurface.sql_in_subquery,
    "entropy_profile": text.entropy_profile,
    "item_pmi": graph.item_pmi,
    "corpus_mixture_tokens": curation.corpus_mixture_tokens,
    "stream_span_dedup": replay.stream_span_dedup,
    "augment_token_dropout": curation.augment_token_dropout,
    "corpus_mixture_tokens_sharded": _corpus_mixture_tokens_sharded,
    "jsonl_roundtrip_ingest": _jsonl_roundtrip,
    "variant_extraction": relational.variant_extraction,
    "cdc_current_view": snapshot.cdc_orders_profile,
    "equi_depth_histogram": text.equi_depth_histogram,
    "span_contamination": spans.span_contamination,
    "knn_pq_multi": similarity.pq_multi_query,
    "analyze_table": quality.analyze_table,
    "cohort_retention": analytics.cohort_retention,
    "event_funnel": analytics.event_funnel,
    "rfm_segments": analytics.rfm_segments,
    "association_rules": graph.association_rules,
    "robust_outliers": quality.robust_outliers,
    "dau_wau_stickiness": relational.dau_wau_stickiness,
    "item_communities": graph.item_communities,
    "scd2_history": snapshot.scd2_orders_profile,
    "span_curation_funnel": spans.span_curation_funnel,
    # --- new in round 5: sharded curation + LSH cluster + Lloyd IVF ------
    "pack_sequences_sharded": _pack_sequences_sharded,
    "embedding_dup_clusters_lsh": _embedding_dup_clusters_lsh,
    "knn_ivf_lloyd": similarity.ivf_lloyd_knn,
    "knn_graph": similarity.knn_graph_lsh,
    "cluster_capped_sample": curation.cluster_capped_sample,
    "stream_ingest_dedup": replay.stream_ingest_dedup,
    "skew_report": skew.skew_report,
    "media_dedup": multimodal.media_dedup,
    "interval_overlap_counts": ranges.interval_overlap_counts,
    "corpus_mixture_sharded": _corpus_mixture_sharded,
    "curation_funnel_sharded": _curation_funnel_sharded,
    "incremental_dedup_indexed": _incremental_dedup_indexed,
    # de-globalized this round — needs fresh driver evidence
    "power_user_rank": windows.power_user_rank,
    # --- round-5 window: last driver evidence r1/r2 — re-verify now -----
    "purchase_asof_click": asof.purchase_asof_click,
    # --- round-5 source-triage wave (past the 50-query window this
    #     round; sweep + parity-test green, rotate into the r6 gate) ----
    "source_scorecard": sourcetriage.source_scorecard,
    "cross_source_overlap": sourcetriage.cross_source_overlap,
    "boilerplate_prefix_profile": sourcetriage.boilerplate_prefix_profile,
    "source_mixture": _source_mixture,
    "sessionize": windows.sessionize,
    "approx_profile": relational.approx_profile,  # sketches checked vs exact
    # --- §2.1 S1–S3 + S8: tolerant CSV scan round-trip ---------------------
    "csv_roundtrip_ingest": _csv_roundtrip,
    # --- rotated out of the gate window in round 3 (r2-green; still
    #     regression-guarded every test run by test_oracle_parity) ---------
    "doc_quality_profile": text.doc_quality_profile,
    "lang_profile": text.lang_profile,
    "doc_fingerprints": text.doc_fingerprints,
    "token_stats": text.token_stats,
    "lang_id_confusion": text.lang_id_confusion,
    "pii_redaction_profile": text.pii_redaction_profile,
    # --- §2.2–§2.4, §2.6–§2.8: relational core (round-1 gate: all green) --
    "course_stats": relational.course_stats,
    "label_histogram": relational.label_histogram,
    "user_activity": relational.user_activity,
    "distinct_counts": relational.distinct_counts,
    "conditional_pivot": relational.conditional_pivot,
    "time_range_filter": relational.time_range_filter,
    "derived_projection": relational.derived_projection,
    "top_k_orders": relational.top_k_orders,
    "null_handling": relational.null_handling,
    "multiway_join": relational.multiway_join,
    "rollup_totals": relational.rollup_totals,
    "scalar_functions": relational.scalar_functions,
    "union_dedup": relational.union_dedup,
    "anti_join_new_keys": relational.anti_join_new_keys,
    "semi_join_filter": relational.semi_join_filter,
    "cooccurrence_pairs": relational.cooccurrence_pairs,
    "sample_deterministic": relational.sample_deterministic,
    "data_quality_report": quality.data_quality_report,
    "cube_totals": relational.cube_totals,
    "percentile_stats": relational.percentile_stats,
    "pivot_status_by_priority": relational.pivot_status_by_priority,
    "cheapest_order_per_customer": relational.cheapest_order_per_customer,
    "time_rollup": relational.time_rollup,
    "paginated_orders": relational.paginated_orders,
    # --- TPC-H-shaped analytics (multi-join / agg at warehouse scale) ----
    "pricing_summary": analytics.pricing_summary,
    "shipping_priority": analytics.shipping_priority,
    "local_supplier_volume": analytics.local_supplier_volume,
    "small_quantity_revenue": analytics.small_quantity_revenue,
    "big_orders": analytics.big_orders,
    # --- range / banded joins + grouping sets ---------------------------
    "quantity_band_stats": ranges.quantity_band_stats,
    "price_tier_join": ranges.price_tier_join,
    "grouping_sets_stats": ranges.grouping_sets_stats,
    # --- §2.7: set operations -------------------------------------------
    "customers_intersect": setops.customers_intersect,
    "customers_except": setops.customers_except,
    "priority_union_all": setops.priority_union_all,
    # --- §2.5: window functions ----------------------------------------
    "latest_order_per_customer": windows.latest_order_per_customer,
    "drift_lag": windows.drift_lag,
    "top_n_per_group": windows.top_n_per_group,
    "running_total": windows.running_total,
    "moving_avg_range": windows.moving_avg_range,
    "ntile_quartiles": windows.ntile_quartiles,
    "order_gaps": windows.order_gaps,
    # --- below the ~50-entry gate window: r3/r4 driver-green ------------
    # --- §2.12 curation: corpus→trainer batch-prep (new in round 3) -------
    "pack_sequences": curation.pack_sequences,
    "corpus_mixture": curation.corpus_mixture,
    "tfidf_top_terms": curation.tfidf_top_terms,
    "curation_funnel": curation.curation_funnel,
    "incremental_dedup": dedup.incremental_dedup_stats,
    "embedding_near_dup_lsh": similarity.embedding_near_dup_pairs_lsh,
    # --- new similarity surfaces (round 3) --------------------------------
    "knn_ivf_centroid": similarity.ivf_centroid_knn,
    "embedding_dup_clusters": similarity.embedding_dup_clusters,
    # --- §2.12: text analysis ------------------------------------------
    "chunk_documents": text.chunk_documents,  # re-kerneled round 3 (HOF)
    "quality_percentile_filter": text.quality_percentile_filter,  # re-planned round 3
    "token_frequencies": text.token_frequencies,
    "repetition_profile": text.repetition_profile,
    # --- §2.12: dedup ----------------------------------------------------
    "exact_duplicates": dedup.exact_duplicates,
    "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
    "minhash_candidates": dedup.minhash_candidates,
    "simhash_near_pairs": dedup.simhash_near_pairs,
    "near_dup_clusters": dedup.near_dup_clusters,
    "contamination_check": dedup.contamination_check,
    "dedup_corpus_stats": dedup.dedup_corpus_stats,
    "minhash_verified_pairs": dedup.minhash_verified_pairs,
    # --- §2.12: similarity search ----------------------------------------
    "knn_brute_force": similarity.knn_brute_force,
    "knn_multi_query": similarity.knn_multi_query,
    "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
    "knn_ivf_bucketed": similarity.ivf_bucketed_knn,
    "knn_rp_lsh": similarity.knn_rp_lsh,
    # BucketedRandomProjectionLSH surface as an oracle-checkable profile
    # (engine-private RNG => anchors + literal-TRUE quality booleans)
    "knn_lsh": similarity.knn_lsh_profile,
    "embedding_stats": similarity.embedding_stats,
    # --- §2.12: multimodal ------------------------------------------------
    "media_profile": multimodal.media_profile,
    "video_frame_profile": multimodal.video_frame_profile,
    # --- §2.1 S18/S19: generator sources (md5-uniform, oracle-checked) ----
    "synthetic_interactions": _synthetic_interactions,
    "mutated_interactions": _mutated_interactions,
    "stratified_sample": _stratified_sample,
    # --- §2.9: ML pipeline (iterative models as invariant profiles) -------
    "als_top_recommendations": _als_top_recs,
    "als_user_factors": _als_user_factors,
    "classifier_metrics": _classifier_metrics,
    "kb_popular_items": _kb_popular,
    "kb_success_profile": _kb_success_profile,
    # --- §2.10: streaming (real bounded streams, batch-checked) -----------
    "stream_stateful_features": replay.stream_stateful_features,
    "stream_bootstrapped_features": replay.stream_bootstrapped_features,
    "stream_tumbling_counts": replay.stream_tumbling_counts,
    "stream_sliding_counts": replay.stream_sliding_counts,
    "stream_dedup_events": replay.stream_dedup_events,
    "stream_stream_attribution": replay.stream_stream_attribution,
    "stream_session_windows": replay.stream_session_windows,
    # --- window variants past the round-1 gate window ---------------------
    "rolling_median": windows.rolling_median,
    "deterministic_group_sample": windows.deterministic_group_sample,
    # --- events-backed queries fixed this round (nanosAsLong in catalog) --
    "json_extraction": relational.json_extraction,
    "events_per_day": relational.events_per_day,
    "event_rate": relational.event_rate,
    "user_topk_recommendations": relational.user_topk_recommendations,
}


ORACLES: dict[str, str] = {
    "course_stats": """
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS attempts,
               CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS passed,
               CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
               round(avg(l_quantity), 4) AS avg_quantity,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_price,
               round(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) * 100.0 / count(*), 4) AS pass_rate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey
        ORDER BY attempts DESC, l_partkey
        LIMIT 50
    """,
    "label_histogram": """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "user_activity": """
        SELECT c_custkey, c_name,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               round(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 0.0), 2) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY n_orders DESC, c_custkey
        LIMIT 100
    """,
    "distinct_counts": """
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
    """,
    "conditional_pivot": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN l_linestatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
               round(sum(CAST(round(l_discount * 100) AS BIGINT)) / count(*) / 100.0, 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "time_range_filter": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "derived_projection": """
        SELECT o_orderkey, o_custkey,
               round(o_totalprice * 0.3, 4) AS blended_low,
               round(o_totalprice * 0.7, 4) AS blended_high,
               CAST(o_orderkey % 7 AS BIGINT) AS bucket,
               CASE WHEN o_totalprice > 100000.0 THEN 'high'
                    WHEN o_totalprice > 50000.0 THEN 'mid'
                    ELSE 'low' END AS tier
        FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    "top_k_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "null_handling": """
        SELECT c_custkey,
               CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
               round(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 0.0), 2) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        GROUP BY c_custkey
        ORDER BY c_custkey LIMIT 500
    """,
    "multiway_join": """
        SELECT r_name, n_name,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "rollup_totals": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag)
        ORDER BY l_returnflag NULLS LAST
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               substr(o_orderpriority, 1, 1) AS prio_code,
               'ORD-' || CAST(o_orderkey AS VARCHAR) AS order_tag,
               round(o_totalprice / 1000.0, 3) AS price_k,
               greatest(0.0, round(o_totalprice - 200000.0, 2)) AS over_200k,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    "json_extraction": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "union_dedup": """
        SELECT DISTINCT o_custkey FROM (
            SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
            UNION ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ) ORDER BY o_custkey
    """,
    "anti_join_new_keys": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND NOT EXISTS (
              SELECT 1 FROM orders e
              WHERE e.o_orderdate < TIMESTAMP '2000-01-01'
                AND e.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
    """,
    "semi_join_filter": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "cooccurrence_pairs": """
        WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_cooccur
        FROM basket a
        JOIN basket b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_cooccur DESC, part_a, part_b
        LIMIT 50
    """,
    "sample_deterministic": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 3 ORDER BY o_orderkey
    """,
    "cube_totals": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    "percentile_stats": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "approx_profile": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               TRUE AS approx_customers_ok,
               TRUE AS approx_p50_ok,
               TRUE AS approx_p95_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "csv_roundtrip_ingest": """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "paginated_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY totalprice DESC, o_orderkey
        LIMIT 100 OFFSET 300
    """,
    "time_rollup": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_year, o_month)
        ORDER BY o_year NULLS LAST, o_month NULLS LAST
    """,
    "cheapest_order_per_customer": """
        SELECT o_custkey,
               arg_min(o_orderkey, o_totalprice) AS cheapest_orderkey,
               round(min(o_totalprice), 2) AS cheapest_price,
               arg_max(o_orderkey, o_totalprice) AS priciest_orderkey,
               round(max(o_totalprice), 2) AS priciest_price,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    "event_rate": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
               round(count(*) / ((epoch(max(ts)) - epoch(min(ts))) / 60.0), 6)
                   AS events_per_min
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_per_day": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4) AS total_value
        FROM events GROUP BY 1 ORDER BY day
    """,
    "user_topk_recommendations": """
        WITH popularity AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_partkey
            ORDER BY n DESC, l_partkey LIMIT 15),
        scored AS (
            SELECT u.user_id, p.l_partkey, p.n,
                   round(0.3 * (u.user_id % 10) + 0.7 * p.n, 4) AS score
            FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN popularity p),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY score DESC, l_partkey) AS rn
            FROM scored)
        SELECT user_id, l_partkey AS item_id, score, CAST(rn AS INTEGER) AS rank
        FROM ranked WHERE rn <= 5 ORDER BY user_id, rank
    """,
    "purchase_asof_click": """
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    # --- TPC-H-shaped analytics ------------------------------------------
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
                   AS sum_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                   AS sum_base_price,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                              AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * (1 + l_tax) * 1000000)
                              AS BIGINT)) / 1000000.0, 2) AS sum_charge,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_price,
               round(sum(CAST(round(l_discount * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "local_supplier_volume": """
        SELECT n_name,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
        FROM region JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "small_quantity_revenue": """
        WITH avg_qty AS (
            SELECT l_partkey AS a_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
            FROM lineitem GROUP BY l_partkey)
        SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
        JOIN avg_qty ON a_partkey = l_partkey
        WHERE l_quantity < half_avg_qty
    """,
    "big_orders": """
        WITH big AS (
            SELECT l_orderkey AS k, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(total_qty, 2) AS total_qty
        FROM orders JOIN big ON o_orderkey = k
        JOIN customer ON c_custkey = o_custkey
        ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
    "data_quality_report": """
        WITH c AS (
          SELECT 'lineitem_orphan_orderkey' AS check,
                 (SELECT count(*) FROM lineitem l LEFT JOIN orders o
                  ON l.l_orderkey=o.o_orderkey WHERE o.o_orderkey IS NULL) AS violations
          UNION ALL SELECT 'lineitem_orphan_partkey',
                 (SELECT count(*) FROM lineitem l LEFT JOIN part p
                  ON l.l_partkey=p.p_partkey WHERE p.p_partkey IS NULL)
          UNION ALL SELECT 'lineitem_orphan_suppkey',
                 (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
                  ON l.l_suppkey=s.s_suppkey WHERE s.s_suppkey IS NULL)
          UNION ALL SELECT 'orders_orphan_custkey',
                 (SELECT count(*) FROM orders o LEFT JOIN customer cu
                  ON o.o_custkey=cu.c_custkey WHERE cu.c_custkey IS NULL)
          UNION ALL SELECT 'orders_pk_duplicates',
                 (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                  GROUP BY o_orderkey HAVING count(*)>1))
          UNION ALL SELECT 'lineitem_pk_duplicates',
                 (SELECT count(*) FROM (SELECT l_orderkey, l_linenumber
                  FROM lineitem GROUP BY 1,2 HAVING count(*)>1))
          UNION ALL SELECT 'lineitem_negative_quantity',
                 (SELECT coalesce(sum(CASE WHEN l_quantity<=0 THEN 1 ELSE 0 END),0)
                  FROM lineitem)
          UNION ALL SELECT 'lineitem_discount_out_of_range',
                 (SELECT coalesce(sum(CASE WHEN l_discount<0 OR l_discount>1
                  THEN 1 ELSE 0 END),0) FROM lineitem)
          UNION ALL SELECT 'orders_null_orderdate',
                 (SELECT coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),0)
                  FROM orders)
        )
        SELECT "check", CAST(violations AS BIGINT) AS violations
        FROM c ORDER BY "check"
    """,
    # --- range / banded joins + grouping sets -----------------------------
    "quantity_band_stats": """
        SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS band,
               floor(l_quantity / 10.0) * 10.0 AS band_lo,
               (floor(l_quantity / 10.0) + 1) * 10.0 AS band_hi,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem GROUP BY 1, 2, 3 ORDER BY band
    """,
    "price_tier_join": """
        WITH tiers AS (SELECT * FROM (VALUES
            ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
            ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 1e12))
            t(tier, lo, hi))
        SELECT tier, CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_price,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier ORDER BY tier
    """,
    "grouping_sets_stats": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / 100.0, 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    # --- set operations ---------------------------------------------------
    "customers_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
    """,
    "customers_except": """
        SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
    """,
    "priority_union_all": """
        WITH u AS (
            SELECT o_custkey, 'urgent' AS src, o_totalprice FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_custkey, 'big' AS src, o_totalprice FROM orders
            WHERE o_totalprice > 300000)
        SELECT src, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM u GROUP BY src ORDER BY src
    """,
    # --- window variants --------------------------------------------------
    "moving_avg_range": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w * 1.0 / count(*) OVER w / 100.0, 4) AS avg_30d,
               CAST(count(*) OVER w AS BIGINT) AS n_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY datediff('day', TIMESTAMP '1995-01-01', o_orderdate)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "ntile_quartiles": """
        SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_nationkey, c_custkey LIMIT 2000
    """,
    "order_gaps": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(datediff('day', o_orderdate,
                    lead(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)) AS INTEGER) AS days_to_next
        FROM orders
        ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "rolling_median": """
        SELECT o_custkey, o_orderkey,
               round(quantile_cont(o_totalprice, 0.5) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS rolling_median
        FROM orders ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "deterministic_group_sample": """
        WITH r AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                       AS INTEGER) AS rn
            FROM orders)
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
        FROM r WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    # --- streaming (bounded replay; oracle = batch equivalent) -----------
    "stream_stateful_features": """
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "stream_bootstrapped_features": """
        WITH seed AS (
            SELECT * FROM (VALUES
                (5, 'click', 40, 123.5),
                (10, 'purchase', 7, 900.25),
                (999999, 'view', 3, 1.5)
            ) s(user_id, event_type, n_events, total_value)),
        merged AS (
            SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(total_value AS DOUBLE) AS total_value
            FROM seed
            UNION ALL
            SELECT user_id, event_type, count(*), sum(value)
            FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(sum(total_value), 4) AS total_value
        FROM merged GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "stream_tumbling_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    "stream_sliding_counts": """
        WITH starts AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
            FROM events)
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM starts GROUP BY 1 ORDER BY window_start
    """,
    "stream_stream_attribution": """
        SELECT p.event_id AS purchase_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        JOIN (SELECT * FROM events WHERE event_type='click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        ORDER BY purchase_id, click_ts
    """,
    "stream_dedup_events": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "stream_session_windows": """
        WITH lagged AS (
            SELECT user_id, event_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events),
        flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts >= prev_ts + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged)
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS session_value
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    # --- windows ---------------------------------------------------------
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS latest_order_date,
               o_totalprice
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1 ORDER BY o_custkey
    """,
    "drift_lag": """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice - prev_price, 2) AS delta,
               round((o_totalprice - prev_price) * 100.0 / prev_price, 4) AS delta_pct
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     lag(o_totalprice) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev_price
              FROM orders)
        WHERE prev_price IS NOT NULL
        ORDER BY o_custkey, o_orderkey
        LIMIT 2000
    """,
    "power_user_rank": """
        SELECT o_custkey, n_orders, total_spend,
               CAST(activity_rank AS INTEGER) AS activity_rank
        FROM (SELECT o_custkey,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           / 100.0, 2) AS total_spend,
                     dense_rank() OVER (ORDER BY count(*) DESC) AS activity_rank
              FROM orders GROUP BY o_custkey)
        WHERE n_orders > 5
        ORDER BY activity_rank, o_custkey
    """,
    "top_n_per_group": """
        SELECT l_suppkey, CAST(rn AS INTEGER) AS rn,
               l_orderkey, l_partkey, l_extendedprice
        FROM (SELECT l_suppkey, l_orderkey, l_partkey, l_extendedprice,
                     row_number() OVER (
                         PARTITION BY l_suppkey
                         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
        WHERE rn <= 5 ORDER BY l_suppkey, rn
    """,
    "sessionize": """
        WITH lagged AS (
            SELECT user_id, event_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events),
        flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts >= prev_ts + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id, value,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged)
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
                   AS session_value
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "running_total": """
        SELECT o_custkey, o_orderkey,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    # --- text ------------------------------------------------------------
    "doc_quality_profile": """
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / len(string_split(text, ' ')), 4) AS avg_token_len,
               round(len(list_filter(string_split(text, ' '),
                                     t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                     / len(string_split(text, ' ')), 4) AS stopword_ratio,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4) AS alpha_ratio
        FROM documents ORDER BY doc_id
    """,
    "lang_profile": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               sha256(text) AS fingerprint,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                           t -> CAST(ascii(t) * 256 + length(t) AS BIGINT))),
                   (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS rolling_fp
        FROM documents ORDER BY doc_id
    """,
    "token_frequencies": """
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token ORDER BY freq DESC, token LIMIT 100
    """,
    "lang_id_confusion": """
        WITH aug AS (
            SELECT lang,
                   text || CASE WHEN doc_id % 2 = 0 THEN
                       CASE lang
                           WHEN 'es' THEN repeat(' el la que', 25)
                           WHEN 'de' THEN repeat(' der die und', 25)
                           WHEN 'fr' THEN repeat(' le les des', 25)
                           WHEN 'zh' THEN repeat(' de shi bu', 25)
                           ELSE '' END
                   ELSE '' END AS t
            FROM documents),
        scored AS (
            SELECT lang,
                   len(list_filter(string_split(t, ' '), x -> x IN ('the','and','fast'))) AS s_en,
                   len(list_filter(string_split(t, ' '), x -> x IN ('el','la','que'))) AS s_es,
                   len(list_filter(string_split(t, ' '), x -> x IN ('der','die','und'))) AS s_de,
                   len(list_filter(string_split(t, ' '), x -> x IN ('le','les','des'))) AS s_fr,
                   len(list_filter(string_split(t, ' '), x -> x IN ('de','shi','bu'))) AS s_zh
            FROM aug),
        pred AS (
            SELECT lang,
                   CASE
                     WHEN s_zh > greatest(s_en, s_es, s_de, s_fr) THEN 'zh'
                     WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
                     WHEN s_de > greatest(s_en, s_es) THEN 'de'
                     WHEN s_es > s_en THEN 'es'
                     ELSE 'en'
                   END AS lang_pred
            FROM scored)
        SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
    "token_stats": r"""
        WITH per_doc AS (
            SELECT lang,
                   len(string_split(text, ' ')) AS ws_tokens,
                   list_sum(list_transform(
                       regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                       w -> CAST(ceil(length(w)/4.0) AS BIGINT))) AS bpe_tokens,
                   length(text) AS n_chars
            FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
               CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               round(sum(bpe_tokens) * 1.0 / sum(ws_tokens), 6) AS bpe_per_word,
               round(sum(n_chars) * 1.0 / sum(bpe_tokens), 6) AS chars_per_bpe_token
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "chunk_documents": """
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        k AS (
            SELECT doc_id, n,
                   CASE WHEN n <= 50 THEN 1
                        ELSE 1 + CAST(ceil((n - 50) / 40.0) AS BIGINT) END AS n_chunks
            FROM t WHERE n > 0)
        SELECT doc_id,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(list_sum(list_transform(range(0, CAST(n_chunks AS INTEGER)),
                        j -> least(50, n - 40 * j))) AS BIGINT) AS total_chunk_tokens,
               CAST(least(50, n) AS INTEGER) AS max_chunk_tokens
        FROM k ORDER BY doc_id
    """,
    # --- dedup -------------------------------------------------------------
    "exact_duplicates": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        SELECT sha256(text) AS fingerprint,
               CAST(min(doc_id) AS BIGINT) AS canonical_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM corpus GROUP BY sha256(text)
        HAVING count(*) > 1 ORDER BY canonical_id
    """,
    "ngram_jaccard_pairs": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       CASE WHEN len(t) >= 3
                            THEN list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(list_slice(t, i, i + 2), ' '))
                            ELSE [] END)) AS shingle
            FROM toks),
        sh2 AS (SELECT doc_id, shingle FROM sh WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh2 GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh2 a JOIN sh2 b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
               round(n_inter * 1.0 / (sa.n_shingles + sb.n_shingles - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_inter * 1.0 / (sa.n_shingles + sb.n_shingles - n_inter), 6) >= 0.20
        ORDER BY doc_a, doc_b
    """,
    # --- similarity ---------------------------------------------------------
    "knn_brute_force": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                   FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "knn_multi_query": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.q_emb AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                                    CAST(q.q_emb AS DOUBLE[])))), 6)
                       AS cos_sim
            FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER)
                AS rank
            FROM scored)
        SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    "embedding_stats": """
        WITH per_vec AS (
            SELECT label,
                   len(embedding) AS dim,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS norm,
                   list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS max_component
            FROM embeddings)
        SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(min(dim) AS INTEGER) AS min_dim,
               CAST(max(dim) AS INTEGER) AS max_dim,
               round(sum(CAST(round(norm * 1e9) AS BIGINT))
                     / count(*) / 1e9, 6) AS avg_norm,
               round(max(norm), 6) AS max_norm,
               round(sum(CAST(round(max_component * 1e9) AS BIGINT))
                     / count(*) / 1e9, 6) AS avg_max_component
        FROM per_vec GROUP BY label ORDER BY label
    """,
    "embedding_near_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                             CAST(a.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])))), 6) >= 0.40
        ORDER BY id_a, id_b
    """,
    # --- multimodal ----------------------------------------------------------
    "media_profile": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   sha256(text) AS checksum
            FROM documents)
        SELECT media_type,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               round(avg(n_bytes), 4) AS avg_bytes,
               CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct
        FROM media GROUP BY media_type ORDER BY media_type
    """,
    "interval_overlap_counts": """
        WITH iv AS (
            SELECT CAST(l_shipdate AS DATE) AS s,
                   CAST(l_shipdate AS DATE)
                       + (CAST(l_quantity AS INTEGER) % 14 + 1) AS e,
                   l_quantity
            FROM lineitem),
        weeks AS (
            SELECT unnest(generate_series(DATE '1995-01-01',
                                          DATE '2002-01-01',
                                          INTERVAL 7 DAY))::DATE AS w_start)
        SELECT strftime(w.w_start, '%Y-%m-%d') AS week_start,
               CAST(count(*) AS BIGINT) AS n_overlap,
               round(sum(l_quantity), 2) AS total_qty
        FROM weeks w JOIN iv
          ON iv.s <= w.w_start + 6 AND iv.e >= w.w_start
        GROUP BY w.w_start ORDER BY week_start
    """,
    "media_dedup": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   text,
                   CAST(length(text) AS BIGINT) AS n_bytes
            FROM documents),
        corpus AS (
            SELECT media_id, media_type, text, n_bytes FROM media
            UNION ALL
            SELECT media_id + 5000000, media_type, text, n_bytes
            FROM media WHERE media_id % 7 = 0),
        winners AS (SELECT text, min(media_id) AS media_id
                    FROM corpus GROUP BY text),
        kept AS (SELECT c.* FROM corpus c
                 JOIN winners w ON c.text = w.text AND c.media_id = w.media_id),
        totals AS (SELECT media_type,
                          CAST(count(*) AS BIGINT) AS n_total,
                          CAST(sum(n_bytes) AS BIGINT) AS total_bytes
                   FROM corpus GROUP BY media_type),
        uniq AS (SELECT media_type,
                        CAST(count(*) AS BIGINT) AS n_unique,
                        min(media_id) AS first_kept_id
                 FROM kept GROUP BY media_type)
        SELECT t.media_type, t.n_total, u.n_unique,
               t.n_total - u.n_unique AS n_dropped,
               t.total_bytes, u.first_kept_id
        FROM totals t JOIN uniq u USING (media_type)
        ORDER BY t.media_type
    """,
    # --- ML / recsys ---------------------------------------------------------
    # hash_uniform(salt, key) — sources/ingest.py — is md5-based, so the
    # oracle reproduces the "random" draws bit-for-bit:
    "synthetic_interactions": """
        WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
        u AS (
            SELECT row_id,
                   ('0x' || substr(md5('42:tier:'   || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
                   ('0x' || substr(md5('42:plays:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_plays,
                   ('0x' || substr(md5('42:checks:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_checks,
                   ('0x' || substr(md5('42:truth:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
            FROM base),
        t AS (
            SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                           WHEN u_tier < 0.7 THEN 'mid'
                           ELSE 'low' END AS tier
            FROM u)
        SELECT CAST(row_id % 1000 AS BIGINT) AS user_id,
               'course-' || CAST(row_id % 200 AS VARCHAR) AS course_id,
               CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                   WHEN 'mid' THEN 0.60
                                                   ELSE 0.30 END)
                         THEN 0 ELSE 1 END AS INTEGER) AS truth,
               round(CASE tier WHEN 'high' THEN 50 + u_plays * 150
                               WHEN 'mid'  THEN 10 + u_plays * 40
                               ELSE u_plays * 10 END, 2) AS action_play_video,
               round(CASE tier WHEN 'high' THEN 20 + u_checks * 80
                               WHEN 'mid'  THEN 5 + u_checks * 15
                               ELSE u_checks * 5 END, 2) AS action_problem_check,
               CAST(1700000000 + row_id AS BIGINT) AS event_ts
        FROM t ORDER BY user_id, course_id, event_ts
    """,
    "mutated_interactions": """
        WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
        u AS (
            SELECT row_id,
                   ('0x' || substr(md5('42:tier:'   || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
                   ('0x' || substr(md5('42:plays:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_plays,
                   ('0x' || substr(md5('42:checks:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_checks,
                   ('0x' || substr(md5('42:truth:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
            FROM base),
        t AS (
            SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                           WHEN u_tier < 0.7 THEN 'mid'
                           ELSE 'low' END AS tier
            FROM u),
        gen AS (
            SELECT CAST(row_id % 1000 AS BIGINT) AS user_id,
                   'course-' || CAST(row_id % 200 AS VARCHAR) AS course_id,
                   CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                       WHEN 'mid' THEN 0.60
                                                       ELSE 0.30 END)
                             THEN 0 ELSE 1 END AS INTEGER) AS truth,
                   round(CASE tier WHEN 'high' THEN 50 + u_plays * 150
                                   WHEN 'mid'  THEN 10 + u_plays * 40
                                   ELSE u_plays * 10 END, 2) AS action_play_video,
                   round(CASE tier WHEN 'high' THEN 20 + u_checks * 80
                                   WHEN 'mid'  THEN 5 + u_checks * 15
                                   ELSE u_checks * 5 END, 2) AS action_problem_check,
                   CAST(1700000000 + row_id AS BIGINT) AS event_ts
            FROM t),
        m AS (
            SELECT *,
                   ('0x' || substr(md5('7:sample:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.10 AS in_sample,
                   ('0x' || substr(md5('7:noise0:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_n0,
                   ('0x' || substr(md5('7:noise1:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_n1,
                   ('0x' || substr(md5('7:flip:'   || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_flip
            FROM gen)
        SELECT user_id, course_id,
               CAST(CASE WHEN in_sample AND u_flip < 0.05
                         THEN 1 - truth ELSE truth END AS INTEGER) AS truth,
               CASE WHEN in_sample
                    THEN greatest(0.0, round(action_play_video * (0.8 + u_n0 * 0.4), 2))
                    ELSE action_play_video END AS action_play_video,
               CASE WHEN in_sample
                    THEN greatest(0.0, round(action_problem_check * (0.8 + u_n1 * 0.4), 2))
                    ELSE action_problem_check END AS action_problem_check,
               event_ts
        FROM m ORDER BY user_id, course_id, event_ts
    """,
    "stratified_sample": """
        WITH frame AS (
            SELECT o.o_orderkey,
                   CASE WHEN coalesce(sum(l.l_quantity), 0) > 100.0
                        THEN 1.0 ELSE 0.0 END AS label
            FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus IN ('F', 'O', 'P')
            GROUP BY o.o_orderkey),
        r AS (
            SELECT label,
                   row_number() OVER (PARTITION BY label
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY label) AS n
            FROM frame)
        SELECT label,
               CAST(sum(CASE WHEN rn <= ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN rn > ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test
        FROM r GROUP BY label ORDER BY label
    """,
    # --- iterative-model invariant profiles: the oracle recomputes the
    # exact data anchors and asserts the structural booleans as literal
    # TRUE (the approx_profile pattern — engine-seeded models can't be
    # value-matched, their invariants can).
    "als_top_recommendations": """
        SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_users,
               CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_items,
               TRUE AS k_per_user_ok, TRUE AS ranks_ok,
               TRUE AS scores_monotone_ok, TRUE AS scores_nonneg_ok,
               TRUE AS items_known_ok, TRUE AS coverage_ok
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "als_user_factors": """
        SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_users,
               TRUE AS dims_ok, TRUE AS finite_ok, TRUE AS nonneg_ok,
               TRUE AS json_export_ok, TRUE AS coverage_ok
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "classifier_metrics": """
        WITH frame AS (
            SELECT o.o_orderkey,
                   CASE WHEN coalesce(sum(l.l_quantity), 0) > 100.0
                        THEN 1.0 ELSE 0.0 END AS label
            FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus IN ('F', 'O', 'P')
            GROUP BY o.o_orderkey),
        r AS (
            SELECT label,
                   row_number() OVER (PARTITION BY label
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY label) AS n
            FROM frame)
        SELECT CAST(sum(CASE WHEN rn <= ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN rn > ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               TRUE AS auc_ok, TRUE AS logloss_ok, TRUE AS acc_ok,
               TRUE AS acc_above_majority_ok
        FROM r
    """,
    "knn_lsh": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                   FROM embeddings WHERE vec_id = 0),
        sims AS (
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> 0
            ORDER BY cos_sim DESC, vec_id LIMIT 10)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_corpus,
               round(avg(cos_sim), 6) AS exact_topk_avg_sim,
               TRUE AS recall_ok, TRUE AS sims_exact_ok, TRUE AS k_rows_ok
        FROM sims
    """,
    "knn_ivf_centroid": """
        WITH seeds AS (
            SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS c_emb,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        assign AS (
            SELECT e.vec_id, e.label, s.cell,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.c_emb)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(s.c_emb, s.c_emb))), 6) AS cs
            FROM embeddings e CROSS JOIN seeds s),
        ranked AS (
            SELECT vec_id, label, cell,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY cs DESC, cell) AS rn
            FROM assign),
        cells AS (SELECT vec_id, label, cell FROM ranked WHERE rn = 1),
        qc AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
              FROM embeddings WHERE vec_id = 0)
        SELECT c.vec_id, c.label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM cells c
        JOIN qc ON c.cell = qc.cell
        JOIN embeddings e ON e.vec_id = c.vec_id
        CROSS JOIN q
        WHERE c.vec_id <> 0
        ORDER BY cos_sim DESC, c.vec_id LIMIT 10
    """,
    "embedding_dup_clusters": """
        WITH RECURSIVE pr AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(a.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])))),
                        6) >= 0.40),
        edges AS (SELECT id_a AS s, id_b AS d FROM pr
                  UNION SELECT id_b AS s, id_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_vec_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """,
    "curation_funnel": """
        WITH corpus AS (
            SELECT doc_id, lang, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, lang, text FROM documents
            WHERE doc_id % 10 = 0),
        uniq AS (
            SELECT c.doc_id, c.lang, c.text
            FROM corpus c
            JOIN (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text) w
              ON c.doc_id = w.doc_id),
        scored AS (
            SELECT doc_id, lang, text,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                         / length(text), 4)
                   - round(len(list_filter(string_split(text, ' '),
                                           t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                           / len(string_split(text, ' ')), 4) AS score
            FROM uniq),
        ranked AS (
            SELECT *, percent_rank() OVER (ORDER BY score, doc_id) AS pr
            FROM scored),
        kept AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   t -> length(t) > 0)) AS n_tokens
            FROM ranked WHERE pr >= 0.25),
        chunkstats AS (
            SELECT sum(CASE WHEN n_tokens <= 0 THEN 0
                            WHEN n_tokens <= 50 THEN 1
                            ELSE CAST(ceil((n_tokens - 50) / 40.0) AS BIGINT) + 1
                       END) AS n_chunks,
                   sum(CASE WHEN n_tokens <= 0 THEN 0
                            WHEN n_tokens <= 50 THEN n_tokens
                            ELSE n_tokens + 10 *
                                 CAST(ceil((n_tokens - 50) / 40.0) AS BIGINT)
                       END) AS chunk_tokens
            FROM kept),
        packed AS (
            SELECT lang, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM kept),
        packstats AS (
            SELECT (SELECT count(*) FROM (SELECT DISTINCT lang, seq_no
                                          FROM packed)) AS n_sequences,
                   sum(n_tokens) AS kept_tokens, count(*) AS n_kept
            FROM packed)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_raw,
               (SELECT CAST(count(*) AS BIGINT) FROM uniq) AS n_unique,
               CAST(p.n_kept AS BIGINT) AS n_kept,
               CAST(p.kept_tokens AS BIGINT) AS kept_tokens,
               CAST(c.n_chunks AS BIGINT) AS n_chunks,
               CAST(c.chunk_tokens AS BIGINT) AS chunk_tokens,
               CAST(p.n_sequences AS BIGINT) AS n_sequences
        FROM packstats p CROSS JOIN chunkstats c
    """,
    # --- curation: packing / mixing / tf-idf ------------------------------
    "pack_sequences": """
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        p AS (
            SELECT lang, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM t)
        SELECT lang, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(least(1.0, sum(n_tokens) / 256.0), 4) AS fill_ratio
        FROM p GROUP BY lang, seq_no ORDER BY lang, seq_no
    """,
    "pack_sequences_sharded": """
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 4 AS INT) AS shard,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        p AS (
            SELECT lang, shard, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang, shard
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM t)
        SELECT lang, shard, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(least(1.0, sum(n_tokens) / 256.0), 4) AS fill_ratio
        FROM p GROUP BY lang, shard, seq_no ORDER BY lang, shard, seq_no
    """,
    "corpus_mixture_sharded": """
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 4 AS INT) AS shard,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        sizes AS (SELECT lang, count(*) AS n_docs FROM t GROUP BY lang),
        wts AS (SELECT lang, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
        tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
        quotas AS (
            SELECT lang, n_docs,
                   round(w_raw / w_sum, 6) AS mix_weight,
                   CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
            FROM wts CROSS JOIN tot),
        ranked AS (
            SELECT lang, shard, n_tokens,
                   row_number() OVER (PARTITION BY lang, shard
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM t),
        sampled AS (
            SELECT r.lang, count(*) AS n_sampled,
                   sum(n_tokens) AS sampled_tokens
            FROM ranked r JOIN quotas q ON r.lang = q.lang
            WHERE r.rk <= q.quota // 4
                          + (CASE WHEN r.shard < q.quota % 4 THEN 1 ELSE 0 END)
            GROUP BY r.lang)
        SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
               CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
               CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
        FROM quotas q LEFT JOIN sampled s ON q.lang = s.lang
        ORDER BY q.lang
    """,
    "corpus_mixture": """
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        sizes AS (SELECT lang, count(*) AS n_docs FROM t GROUP BY lang),
        wts AS (SELECT lang, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
        tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
        quotas AS (
            SELECT lang, n_docs,
                   round(w_raw / w_sum, 6) AS mix_weight,
                   CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
            FROM wts CROSS JOIN tot),
        ranked AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM t),
        sampled AS (
            SELECT r.lang, count(*) AS n_sampled,
                   sum(n_tokens) AS sampled_tokens
            FROM ranked r JOIN quotas q ON r.lang = q.lang
            WHERE r.rk <= q.quota GROUP BY r.lang)
        SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
               CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
               CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
        FROM quotas q LEFT JOIN sampled s ON q.lang = s.lang
        ORDER BY q.lang
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok
            WHERE length(term) > 0 GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1.0)) + 1.0),
                         4) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term) AS rank
            FROM scored)
        SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    "kb_popular_items": """
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
        ORDER BY n DESC, l_partkey LIMIT 50
    """,
    "kb_success_profile": """
        SELECT round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_totalprice,
               CAST(count(*) AS BIGINT) AS n_success
        FROM orders WHERE o_orderstatus = 'F'
    """,
}


# ---------------------------------------------------------------------------
# Generated oracles for the hash-sketch dedup family.  minhash and simhash
# derive every bit from md5 of the data (functions/dedup.py::hash32), so the
# oracle reproduces the sketches exactly; the SQL is assembled here because
# writing 64 bit-vote sums by hand is noise, not information.
# ---------------------------------------------------------------------------
def _dd_hash32(expr: str, salt: str) -> str:
    """DuckDB replica of functions.dedup.hash32: first 8 md5 hex chars of
    (salt || value) as a BIGINT in [0, 2^32)."""
    return f"('0x' || substr(md5('{salt}' || {expr}), 1, 8))::BIGINT"


#: Shared shingle CTEs (3-gram, distinct, empties dropped) — the SQL twin of
#: functions.dedup.shingles.
_DD_SHINGLES = """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        shl AS (SELECT doc_id,
                 list_filter(list_distinct(
                   CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
                        ELSE [] END), s -> length(s) > 0) AS gs
               FROM toks),
        sh2 AS (SELECT doc_id, gs FROM shl WHERE len(gs) > 0)"""


def _minhash_oracle(n_hashes: int = 16, threshold: float = 0.5) -> str:
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
        WHERE round(({matches}) / {float(n_hashes)}, 6) >= {threshold}
        ORDER BY doc_a, doc_b
    """


def _incremental_oracle(n_hashes: int = 16, threshold: float = 0.5) -> str:
    """SQL twin of functions.dedup.incremental_dedup_stats: planted batch
    → exact drop on text equality (= sha2 fingerprint equality) → ONE-SIDED
    minhash band probe (new × old only) → per-lang funnel counts."""
    from project_bigdata_recsys_spark.functions.dedup import (
        _DRIFT_SUFFIX,
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, is_new, {b} AS band_no, m{2 * b} AS k1, "
        f"m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_texts AS (SELECT DISTINCT text FROM documents),
        exact_dropped AS (
            SELECT b.* FROM batch b JOIN corpus_texts c ON b.text = c.text),
        survivors AS (
            SELECT b.* FROM batch b LEFT JOIN corpus_texts c ON b.text = c.text
            WHERE c.text IS NULL),
        alldocs AS (
            SELECT doc_id, text, FALSE AS is_new FROM documents
            UNION ALL
            SELECT doc_id, text, TRUE AS is_new FROM survivors),
        toks AS (SELECT doc_id, is_new, string_split(text, ' ') AS t FROM alldocs),
        shl AS (SELECT doc_id, is_new,
                 list_filter(list_distinct(
                   CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
                        ELSE [] END), s -> length(s) > 0) AS gs
               FROM toks),
        sh2 AS (SELECT doc_id, is_new, gs FROM shl WHERE len(gs) > 0),
        basesq AS (SELECT doc_id, is_new,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id, is_new,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                 WHERE a.is_new AND NOT b.is_new),
        near AS (SELECT DISTINCT cand.new_id AS doc_id FROM cand
                 JOIN sig sa ON sa.doc_id = cand.new_id
                 JOIN sig sb ON sb.doc_id = cand.old_id
                 WHERE ({matches}) / {float(n_hashes)} >= {threshold}),
        near_dropped AS (
            SELECT s.* FROM survivors s JOIN near USING (doc_id)),
        admitted AS (
            SELECT s.* FROM survivors s
            WHERE s.doc_id NOT IN (SELECT doc_id FROM near)),
        bstats AS (SELECT lang, count(*) AS n_batch FROM batch GROUP BY lang),
        estats AS (SELECT lang, count(*) AS n_exact_dropped
                   FROM exact_dropped GROUP BY lang),
        nstats AS (SELECT lang, count(*) AS n_near_dropped
                   FROM near_dropped GROUP BY lang),
        astats AS (SELECT lang, count(*) AS n_admitted
                   FROM admitted GROUP BY lang)
        SELECT b.lang, CAST(b.n_batch AS BIGINT) AS n_batch,
               CAST(coalesce(e.n_exact_dropped, 0) AS BIGINT) AS n_exact_dropped,
               CAST(coalesce(n.n_near_dropped, 0) AS BIGINT) AS n_near_dropped,
               CAST(coalesce(a.n_admitted, 0) AS BIGINT) AS n_admitted
        FROM bstats b
        LEFT JOIN estats e USING (lang)
        LEFT JOIN nstats n USING (lang)
        LEFT JOIN astats a USING (lang)
        ORDER BY b.lang
    """


def _rp_lsh_pairs_oracle(
    threshold: float = 0.40, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of functions.similarity.embedding_near_dup_pairs_lsh: the
    Rademacher plane weight is ((i*31 + p*17 + t*101) * 2654435761) mod
    2^32 compared to 2^31 — pure integer arithmetic both engines compute
    identically, so bucket membership (and therefore the candidate pair
    set) reproduces exactly."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id < y.vec_id)
        SELECT cand.id_a, cand.id_b,
               round(list_dot_product(ea.emb, eb.emb)
                     / (sqrt(list_dot_product(ea.emb, ea.emb))
                        * sqrt(list_dot_product(eb.emb, eb.emb))), 6) AS cos_sim
        FROM cand
        JOIN b ea ON ea.vec_id = cand.id_a
        JOIN b eb ON eb.vec_id = cand.id_b
        WHERE round(list_dot_product(ea.emb, eb.emb)
                    / (sqrt(list_dot_product(ea.emb, ea.emb))
                       * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
              >= {threshold}
        ORDER BY id_a, id_b
    """


def _minhash_verified_oracle(
    n_hashes: int = 16, threshold: float = 0.5, verify_threshold: float = 0.5
) -> str:
    """minhash candidates + exact-Jaccard verification over them — the
    SQL twin of functions.dedup.minhash_verified_pairs."""
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    jac = (
        "len(list_intersect(ga.gs, gb.gs)) * 1.0"
        " / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))"
    )
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id),
        est AS (SELECT doc_a, doc_b,
                       round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
                FROM cand
                JOIN sig sa ON sa.doc_id = doc_a
                JOIN sig sb ON sb.doc_id = doc_b
                WHERE round(({matches}) / {float(n_hashes)}, 6) >= {threshold})
        SELECT e.doc_a, e.doc_b, e.est_jaccard,
               round({jac}, 6) AS jaccard
        FROM est e
        JOIN sh2 ga ON ga.doc_id = e.doc_a
        JOIN sh2 gb ON gb.doc_id = e.doc_b
        WHERE round({jac}, 6) >= {verify_threshold}
        ORDER BY e.doc_a, e.doc_b
    """


def _simhash_ctes() -> str:
    """CTE chain ending in ``ham(doc_a, doc_b, hamming)`` — the SQL twin of
    functions.dedup.simhash_features + simhash_near_pairs (64 md5-derived
    bit votes, 4x16-bit bands, XOR popcount)."""
    votes = ",\n               ".join(
        f"sum((({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) * 2 - 1) AS v{b}"
        for b in range(64)
    )
    fp = (
        " + ".join(
            f"(CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
            for b in range(63)
        )
        + " + (CASE WHEN v63 > 0 THEN (-9223372036854775808)::BIGINT"
        " ELSE 0::BIGINT END)"
    )
    band_cols = ",\n               ".join(
        " + ".join(
            f"(CASE WHEN v{16 * k + j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
            for j in range(16)
        )
        + f" AS band{k}"
        for k in range(4)
    )
    return f"""tok AS (SELECT doc_id,
                   unnest(list_filter(list_distinct(string_split(text, ' ')),
                                      t -> length(t) > 0)) AS tok
                FROM documents),
        h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                 ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
              FROM tok),
        votes AS (SELECT doc_id,
               {votes}
              FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id, {fp} AS simhash,
               {band_cols}
              FROM votes),
        bands AS (SELECT doc_id, simhash, 0 AS band_no, band0 AS k FROM fp
                  UNION ALL SELECT doc_id, simhash, 1, band1 FROM fp
                  UNION ALL SELECT doc_id, simhash, 2, band2 FROM fp
                  UNION ALL SELECT doc_id, simhash, 3, band3 FROM fp),
        spairs AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                          b.doc_id AS doc_b, b.simhash AS sim_b
                   FROM bands a JOIN bands b
                     ON a.band_no = b.band_no AND a.k = b.k
                        AND a.doc_id < b.doc_id),
        ham AS (SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
                FROM spairs)"""


def _simhash_oracle(max_hamming: int = 3) -> str:
    return f"""
        WITH {_simhash_ctes()}
        SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
        FROM ham WHERE hamming <= {max_hamming}
        ORDER BY doc_a, doc_b
    """


def _clusters_oracle(max_hamming: int = 3) -> str:
    """Connected components over the simhash pairs as a recursive CTE:
    every vertex reaches every label in its component (edges are
    symmetrized), so min(label) per vertex is the component id — the same
    min-label fixpoint the Spark propagation loop converges to."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_doc_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """


def _ivf_oracle(n_planes: int = 4, k: int = 10) -> str:
    """SQL twin of functions.similarity.ivf_bucketed_knn: the hyperplane
    sign pattern is parity of (dim*31 + p*17) — i.e. parity of (dim + p) —
    fixed and engine-agnostic, so the bucket assignment reproduces
    exactly."""
    bucket = " + ".join(
        f"""(CASE WHEN list_sum(list_transform(range(0, len(embedding)),
                 i -> embedding[i + 1]::DOUBLE *
                      (CASE WHEN (i + {p}) % 2 = 0 THEN 1.0 ELSE -1.0 END)))
                 > 0 THEN {1 << p} ELSE 0 END)"""
        for p in range(n_planes)
    )
    return f"""
        WITH b AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
                   {bucket} AS bucket
            FROM embeddings),
        q AS (SELECT emb AS q_emb, bucket AS q_bucket FROM b WHERE vec_id = 0)
        SELECT b.vec_id, b.label,
               round(list_dot_product(b.emb, q.q_emb)
                     / (sqrt(list_dot_product(b.emb, b.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM b JOIN q ON b.bucket = q.q_bucket
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id LIMIT {k}
    """


def _rp_lsh_oracle(n_tables: int = 4, n_planes: int = 6, k: int = 10) -> str:
    """SQL twin of functions.similarity.knn_rp_lsh: Rademacher plane
    weights from the same Knuth-multiplier scramble, multi-table probe
    union, exact cosine rerank."""

    def bucket(t: int) -> str:
        return " + ".join(
            f"""(CASE WHEN list_sum(list_transform(range(0, len(emb)),
                 i -> emb[i + 1] *
                      (CASE WHEN ((i * 31 + {p} * 17 + {t} * 101) * 2654435761)
                                 % 4294967296 < 2147483648
                            THEN 1.0 ELSE -1.0 END))) > 0
                 THEN {1 << p} ELSE 0 END)"""
            for p in range(n_planes)
        )

    tables = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({tables}),
        qb AS (SELECT t, bucket FROM buck WHERE vec_id = 0),
        cand AS (SELECT DISTINCT buck.vec_id
                 FROM buck JOIN qb ON buck.t = qb.t AND buck.bucket = qb.bucket
                 WHERE buck.vec_id <> 0),
        q AS (SELECT emb AS q_emb FROM b WHERE vec_id = 0)
        SELECT b.vec_id, b.label,
               round(list_dot_product(b.emb, q.q_emb)
                     / (sqrt(list_dot_product(b.emb, b.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM b JOIN cand ON b.vec_id = cand.vec_id CROSS JOIN q
        ORDER BY cos_sim DESC, b.vec_id LIMIT {k}
    """


#: SQL twin of sources.multimodal.video_frame_profile.  The synthetic media
#: payload is the document text's UTF-8 bytes; driver corpora are ASCII-only
#: (asserted at oracle-build time in tests), so VARCHAR substring windows
#: equal the Python byte windows.  Texts are >= 4 bytes, so the
#: empty-frame fallback branch never fires at driver SFs.
_VIDEO_FRAME_ORACLE = """
    WITH media AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents WHERE doc_id % 3 = 2),
    f AS (
        SELECT media_id,
               substring(text, i * greatest(1, n // 4) + 1,
                         greatest(1, n // 4)) AS frame
        FROM media, range(0, 4) t(i))
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(length(frame)) AS BIGINT) AS total_frame_bytes,
           CAST(count(DISTINCT frame) AS BIGINT) AS distinct_frames
    FROM f GROUP BY media_id ORDER BY media_id
"""


_REPETITION_ORACLE = """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS t
        FROM documents),
    uni AS (SELECT doc_id, unnest(t) AS term FROM toks),
    uc AS (SELECT doc_id, term, count(*) AS c FROM uni GROUP BY 1, 2),
    us AS (SELECT doc_id, sum(c) AS total, max(c) AS top, count(*) AS dist
           FROM uc GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i + 1])) AS term
           FROM toks WHERE len(t) >= 2),
    bc AS (SELECT doc_id, term, count(*) AS c FROM bg GROUP BY 1, 2),
    bs AS (SELECT doc_id, sum(c) AS total, max(c) AS top FROM bc GROUP BY doc_id)
    SELECT us.doc_id,
           CAST(us.total AS BIGINT) AS n_tokens,
           round(us.dist * 1.0 / us.total, 4) AS distinct_ratio,
           round(us.top * 1.0 / us.total, 4) AS top_token_frac,
           round(coalesce(bs.top * 1.0 / bs.total, 0.0), 4) AS top_bigram_frac
    FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
    ORDER BY us.doc_id
"""

#: Planted-PII CTE shared shape: phone prefix, then text, then email, then
#: URL suffix — the exact concatenation order of functions.text.plant_pii.
_PII_ORACLE = r"""
    WITH planted AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 13 = 0
                     THEN 'call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' '
                     ELSE '' END)
               || text
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' see https://docs.example/' || CAST(doc_id AS VARCHAR)
                        ELSE '' END) AS text
        FROM documents),
    scrubbed AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_email,
               CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER) AS n_url,
               CAST(len(regexp_extract_all(text, '\d{3}-\d{3}-\d{4}')) AS INTEGER) AS n_phone,
               CAST(length(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                           'https?://[^ ]+', '[URL]', 'g'),
                       '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g')
               ) AS INTEGER) AS redacted_len
        FROM planted)
    SELECT doc_id, n_email, n_url, n_phone, redacted_len
    FROM scrubbed WHERE n_email + n_url + n_phone > 0
    ORDER BY doc_id
"""


ORACLES["minhash_candidates"] = _minhash_oracle()
ORACLES["incremental_dedup"] = _incremental_oracle()
# the index-probe path must produce the IDENTICAL funnel — same oracle
ORACLES["incremental_dedup_indexed"] = _incremental_oracle()


def _sharded_funnel_oracle(n_shards: int = 4) -> str:
    """curation_funnel's oracle with its pack stage sharded: derived from
    the unsharded SQL by exactly four surgical rewrites (kept gains the
    md5 shard id; the pack window and the distinct-sequence count key by
    (lang, shard)).  Each rewrite asserts it matched exactly once, so any
    drift in the base oracle breaks loudly here instead of silently
    diverging."""
    sql = ORACLES["curation_funnel"]
    rewrites = [
        (
            "AS n_tokens\n            FROM ranked WHERE pr >= 0.25",
            "AS n_tokens,\n"
            "                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),"
            f" 1, 8))::BIGINT % {n_shards} AS INT) AS shard\n"
            "            FROM ranked WHERE pr >= 0.25",
        ),
        ("SELECT lang, n_tokens,", "SELECT lang, shard, n_tokens,"),
        ("PARTITION BY lang\n", "PARTITION BY lang, shard\n"),
        ("SELECT DISTINCT lang, seq_no", "SELECT DISTINCT lang, shard, seq_no"),
    ]
    for old, new in rewrites:
        assert sql.count(old) == 1, f"funnel oracle drifted: {old!r}"
        sql = sql.replace(old, new)
    return sql


ORACLES["curation_funnel_sharded"] = _sharded_funnel_oracle()
ORACLES["embedding_near_dup_lsh"] = _rp_lsh_pairs_oracle()


def _rp_lsh_clusters_oracle(
    threshold: float = 0.40, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of similarity.embedding_dup_clusters(use_lsh=True): the
    RP-LSH banded candidate pairs (same deterministic bucket arithmetic
    as _rp_lsh_pairs_oracle) feed a recursive-CTE connected-components
    pass and the cluster rollup."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH RECURSIVE b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id < y.vec_id),
        pr AS (SELECT cand.id_a, cand.id_b
               FROM cand
               JOIN b ea ON ea.vec_id = cand.id_a
               JOIN b eb ON eb.vec_id = cand.id_b
               WHERE round(list_dot_product(ea.emb, eb.emb)
                           / (sqrt(list_dot_product(ea.emb, ea.emb))
                              * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
                     >= {threshold}),
        edges AS (SELECT id_a AS s, id_b AS d FROM pr
                  UNION SELECT id_b AS s, id_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_vec_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """


ORACLES["embedding_dup_clusters_lsh"] = _rp_lsh_clusters_oracle()


def _lloyd_prefix_sql(
    n_cells: int, n_iters: int, scale: int = 1_000_000
) -> str:
    """Shared CTE prefix replaying functions.similarity.lloyd_assignments
    in SQL: md5-ranked seeds, ``n_iters`` Lloyd rounds as (asg_i, sums_i,
    cents_i) CTE triples, and the final ``cells`` assignment.  Means
    reproduce exactly because the per-dimension sums run over
    round(x*1e6) BIGINTs — order-independent integer arithmetic — with
    one double division at the end; empty cells COALESCE to the previous
    centroid.  Used by the ivf_lloyd and semdedup oracles."""
    cos = (
        "round(list_dot_product(e.emb, c.c_emb)"
        " / (sqrt(list_dot_product(e.emb, e.emb))"
        " * sqrt(list_dot_product(c.c_emb, c.c_emb))), 6)"
    )
    rounds = []
    prev = "cents0"
    for i in range(1, n_iters + 1):
        rounds.append(
            f"""asg{i} AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {cos} DESC, c.cell) AS rn
                FROM e CROSS JOIN {prev} c) WHERE rn = 1),
        sums{i} AS (
            SELECT cell, pos,
                   sum(CAST(round(x * {scale}) AS BIGINT)) AS s,
                   count(*) AS n
            FROM (SELECT a.cell, unnest(e.emb) AS x,
                         generate_subscripts(e.emb, 1) AS pos
                  FROM asg{i} a JOIN e ON e.vec_id = a.vec_id)
            GROUP BY cell, pos),
        cents{i} AS (
            SELECT p.cell, COALESCE(m.c_new, p.c_emb) AS c_emb
            FROM {prev} p LEFT JOIN (
                SELECT cell, list(s / (n * {scale}.0) ORDER BY pos) AS c_new
                FROM sums{i} GROUP BY cell) m ON m.cell = p.cell)"""
        )
        prev = f"cents{i}"
    rounds_sql = ",\n        ".join(rounds)
    return f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cents0 AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell,
                   emb AS c_emb
            FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells}),
        {rounds_sql},
        final_ranked AS (
            SELECT e.vec_id, e.label, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos} DESC, c.cell) AS rn
            FROM e CROSS JOIN {prev} c),
        cells AS (SELECT vec_id, label, cell FROM final_ranked WHERE rn = 1)"""


def _ivf_lloyd_oracle(
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    k: int = 10,
    query_vec_id: int = 0,
    scale: int = 1_000_000,
) -> str:
    """SQL twin of functions.similarity.ivf_lloyd_knn — the Lloyd prefix
    (_lloyd_prefix_sql) plus the probe + exact-rerank tail."""
    return f"""
        {_lloyd_prefix_sql(n_cells, n_iters, scale)},
        qc AS (SELECT cell FROM final_ranked
               WHERE vec_id = {query_vec_id} AND rn <= {n_probe}),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {query_vec_id})
        SELECT c.vec_id, c.label,
               round(list_dot_product(e.emb, q.q_emb)
                     / (sqrt(list_dot_product(e.emb, e.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM cells c
        JOIN qc ON c.cell = qc.cell
        JOIN e ON e.vec_id = c.vec_id
        CROSS JOIN q
        WHERE c.vec_id <> {query_vec_id}
        ORDER BY cos_sim DESC, c.vec_id LIMIT {k}
    """


ORACLES["knn_ivf_lloyd"] = _ivf_lloyd_oracle()


def _knn_graph_oracle(
    k: int = 3, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of functions.similarity.knn_graph_lsh: the same bucket
    arithmetic as _rp_lsh_pairs_oracle, but DIRECTED candidate edges and
    a per-source top-k window instead of a threshold filter."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS nbr_id
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id <> y.vec_id),
        scored AS (
            SELECT cand.src_id, cand.nbr_id,
                   round(list_dot_product(ea.emb, eb.emb)
                         / (sqrt(list_dot_product(ea.emb, ea.emb))
                            * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
                       AS cos_sim
            FROM cand
            JOIN b ea ON ea.vec_id = cand.src_id
            JOIN b eb ON eb.vec_id = cand.nbr_id),
        ranked AS (
            SELECT src_id, nbr_id, cos_sim,
                   row_number() OVER (PARTITION BY src_id
                       ORDER BY cos_sim DESC, nbr_id) AS rank
            FROM scored)
        SELECT src_id, CAST(rank AS INT) AS rank, nbr_id, cos_sim
        FROM ranked WHERE rank <= {k}
        ORDER BY src_id, rank
    """


ORACLES["knn_graph"] = _knn_graph_oracle()
ORACLES["simhash_near_pairs"] = _simhash_oracle()
ORACLES["near_dup_clusters"] = _clusters_oracle()


def _cluster_capped_sample_oracle(
    max_per_cluster: int = 2, max_hamming: int = 3
) -> str:
    """SQL twin of curation.cluster_capped_sample: the simhash CC from
    _clusters_oracle, every document labeled (singletons self-labeled),
    per-cluster md5-rank cap, per-lang kept/dropped rollup."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        labeled AS (
            SELECT d.doc_id, d.lang, COALESCE(cc.label, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        ranked AS (
            SELECT lang,
                   row_number() OVER (PARTITION BY cluster_id
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM labeled)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rk <= {max_per_cluster} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rk > {max_per_cluster} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped
        FROM ranked GROUP BY lang ORDER BY lang
    """


ORACLES["cluster_capped_sample"] = _cluster_capped_sample_oracle()


def _stream_ingest_dedup_oracle() -> str:
    """SQL twin of streaming.replay.stream_ingest_dedup: the streaming
    exact pass must equal the batch exact pass — the planted batch
    classified against the distinct corpus texts (sha2 equality is text
    equality), rolled up per lang."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_texts AS (SELECT DISTINCT text FROM documents)
        SELECT b.lang,
               CAST(count(*) AS BIGINT) AS n_batch,
               CAST(sum(CASE WHEN c.text IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_dropped,
               CAST(sum(CASE WHEN c.text IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_admitted
        FROM batch b LEFT JOIN corpus_texts c ON b.text = c.text
        GROUP BY b.lang ORDER BY b.lang
    """


ORACLES["stream_ingest_dedup"] = _stream_ingest_dedup_oracle()


def _skew_report_oracle(top_k: int = 5) -> str:
    """SQL twin of operators.skew.skew_report: per candidate join key,
    top-K heaviest keys + table share + max/mean skew factor."""
    blocks = []
    for alias, col in (
        ("per_o", "l_orderkey"),
        ("per_p", "l_partkey"),
        ("per_s", "l_suppkey"),
    ):
        blocks.append(
            f"""(SELECT '{col}' AS join_key, key, n,
                   round(n * 100.0 / total, 4) AS pct_of_table,
                   round((SELECT max(n) FROM {alias}) * 1.0
                         / (SELECT avg(n) FROM {alias}), 4) AS skew_factor
            FROM {alias} CROSS JOIN tot
            ORDER BY n DESC, key LIMIT {top_k})"""
        )
    union = "\n            UNION ALL\n            ".join(blocks)
    return f"""
        WITH per_o AS (SELECT CAST(l_orderkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             per_p AS (SELECT CAST(l_partkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             per_s AS (SELECT CAST(l_suppkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             tot AS (SELECT count(*) AS total FROM lineitem)
        SELECT * FROM (
            {union}
        ) ORDER BY join_key, n DESC, key
    """


ORACLES["skew_report"] = _skew_report_oracle()
ORACLES["knn_ivf_bucketed"] = _ivf_oracle()
ORACLES["knn_rp_lsh"] = _rp_lsh_oracle()
ORACLES["video_frame_profile"] = _VIDEO_FRAME_ORACLE
ORACLES["minhash_verified_pairs"] = _minhash_verified_oracle()
ORACLES["repetition_profile"] = _REPETITION_ORACLE
ORACLES["pii_redaction_profile"] = _PII_ORACLE

ORACLES["dedup_corpus_stats"] = """
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 10 = 0),
    w AS (SELECT doc_id, lang,
                 min(doc_id) OVER (PARTITION BY sha256(text)) AS keep
          FROM corpus)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(count(*) - sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dropped
    FROM w GROUP BY lang ORDER BY lang
"""

ORACLES["quality_percentile_filter"] = """
    WITH scored AS (
        SELECT doc_id, lang,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    ranked AS (
        SELECT lang, score,
               percent_rank() OVER (ORDER BY score, doc_id) AS pr
        FROM scored)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(score), 6) AS avg_score,
           round(min(score), 6) AS min_score
    FROM ranked WHERE pr >= 0.25
    GROUP BY lang ORDER BY lang
"""

ORACLES["contamination_check"] = """
    WITH train AS (SELECT doc_id, lang, sha256(text) AS fp FROM documents),
    bench AS (SELECT doc_id + 2000000 AS eval_id, sha256(text) AS fp
              FROM documents WHERE doc_id % 17 = 0)
    SELECT lang,
           CAST(count(DISTINCT eval_id) AS BIGINT) AS n_contaminated_eval,
           CAST(count(*) AS BIGINT) AS n_train_matches,
           min(doc_id) AS first_train_doc
    FROM train JOIN bench USING (fp)
    GROUP BY lang ORDER BY lang
"""

# --- round 5 (second session): exact duplicated-span dedup ----------------
# Same segmentation arithmetic as functions/spans.py: non-overlapping
# 8-token windows (trailing partial kept), 16-hex md5 prefix as the span
# key, first occurrence = min(doc_id*1e6 + seg_no) across the corpus.
_SPAN_SEGS_CTE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    nums AS (
        SELECT doc_id, ts,
               unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
        FROM toks
    ),
    hashed AS (
        SELECT doc_id, seg_no,
               array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ') AS span,
               substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h,
               doc_id * 1000000 + seg_no AS occ
        FROM nums
    )
"""

ORACLES["span_dedup_profile"] = _SPAN_SEGS_CTE + """,
    verdict AS (
        SELECT h, count(*) AS n_occ, min(occ) AS first_occ
        FROM hashed GROUP BY h
    ),
    kept AS (
        SELECT s.doc_id, s.seg_no, s.span,
               (v.n_occ = 1 OR s.occ = v.first_occ) AS keep
        FROM hashed s JOIN verdict v USING (h)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_spans_dropped,
           sha256(coalesce(string_agg(span, ' ' ORDER BY seg_no)
                           FILTER (WHERE keep), '')) AS kept_sha
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
    LIMIT 50
"""

ORACLES["duplicated_spans"] = _SPAN_SEGS_CTE + """
    SELECT span,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hashed
    GROUP BY span
    HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, span
    LIMIT 20
"""

ORACLES["normalized_duplicates"] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, upper(text) FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' !!!' FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 3000000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        FROM documents WHERE doc_id % 10 = 0
    ),
    fp AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_fp,
               sha256(text) AS raw_fp
        FROM corpus
    )
    SELECT norm_fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS canonical_id,
           CAST(count(DISTINCT raw_fp) AS BIGINT) AS raw_variants
    FROM fp
    GROUP BY norm_fp
    HAVING count(*) >= 2
    ORDER BY n_docs DESC, canonical_id
    LIMIT 100
"""

ORACLES["weighted_sample"] = """
    WITH scored AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS weight,
               pow((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                       / 4294967296.0,
                   1.0 / len(string_split(text, ' '))) AS ares_key
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY ares_key DESC, doc_id) AS rn
        FROM scored
    )
    SELECT lang,
           CAST(rn AS INTEGER) AS rn,
           doc_id,
           CAST(weight AS INTEGER) AS weight,
           round(ares_key, 6) AS ares_key
    FROM ranked
    WHERE rn <= 10
    ORDER BY lang, rn
"""

# snapshot_diff oracle — replicates operators/snapshot.py::_mutated_orders
# (md5-uniform drop/bump/append on the PK) then classifies via a PK
# full-outer join.  The engine compares 32-byte digests; the oracle
# compares the columns directly (IS DISTINCT FROM) — equivalent up to
# sha256 collisions.
ORACLES["snapshot_diff"] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders
    ),
    newsnap AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
               o_orderpriority, o_totalprice
        FROM u WHERE u_new < 0.01
    ),
    diff AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
                      OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                      OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                      OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                    THEN 'changed' ELSE 'unchanged' END AS change_type
        FROM orders o FULL OUTER JOIN newsnap n USING (o_orderkey)
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM diff
    GROUP BY change_type
    ORDER BY change_type
"""

def _cluster_aware_split_oracle(
    train_frac: float = 0.8, valid_frac: float = 0.1, max_hamming: int = 3
) -> str:
    """SQL twin of curation.cluster_aware_split: simhash CC from
    _simhash_ctes, split drawn from md5(cluster_id), leak audit counted
    (not assumed)."""
    hi = train_frac + valid_frac
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        assigned AS (
            SELECT d.doc_id,
                   COALESCE(cc.label, d.doc_id) AS cluster_id,
                   CASE WHEN ('0x' || substr(md5('split:' ||
                            CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0 < {train_frac} THEN 'train'
                        WHEN ('0x' || substr(md5('split:' ||
                            CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0 < {hi} THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        leaky AS (
            SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_leaky_clusters
            FROM (SELECT cluster_id, count(DISTINCT split) AS n_splits
                  FROM assigned GROUP BY cluster_id))
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               leaky.n_leaky_clusters
        FROM assigned, leaky
        GROUP BY split, leaky.n_leaky_clusters
        ORDER BY split
    """


ORACLES["cluster_aware_split"] = _cluster_aware_split_oracle()

def _pagerank_oracle(
    damping: float = 0.85, k: int = 25, personalized: bool = False
) -> str:
    """SQL twin of functions.graph.item_pagerank(_personalized): the
    symmetric weighted co-occurrence graph with 3 unrolled PageRank
    iterations; ``personalized`` restricts the teleport vector (and the
    initial ranks) to the partkey % 10 == 0 seed set."""
    d, t = damping, 1.0 - damping
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
        c{i} AS (
            SELECT m.dst, sum(r.rank * m.p) AS inflow
            FROM norm m JOIN {prev} r ON r.node = m.src
            GROUP BY m.dst),
        r{i} AS (
            SELECT n.node, {t} * b.tele + {d} * coalesce(c{i}.inflow, 0.0)
                       AS rank
            FROM nodes n JOIN base b ON b.node = n.node
            LEFT JOIN c{i} ON c{i}.dst = n.node)""")
        prev = f"r{i}"
    if personalized:
        base = """base AS (
            SELECT n.node,
                   CASE WHEN n.node % 10 = 0 THEN 1.0 / nn.n ELSE 0.0 END
                       AS tele
            FROM nodes n CROSS JOIN
                 (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
                  WHERE node % 10 = 0) nn)"""
    else:
        base = """base AS (
            SELECT node, 1.0 / nn.n AS tele FROM nodes
            CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes) nn)"""
    return f"""
        WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        half AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
                   CAST(count(*) AS DOUBLE) AS w
            FROM basket a JOIN basket b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
        edges AS (SELECT src, dst, w FROM half
                  UNION ALL SELECT dst, src, w FROM half),
        outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY src),
        norm AS (SELECT e.src, e.dst, e.w / o.w_out AS p
                 FROM edges e JOIN outw o USING (src)),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        {base},
        r0 AS (SELECT node, tele AS rank FROM base),
        {",".join(iters)}
        SELECT node AS part, round(rank, 6) AS rank
        FROM {prev}
        ORDER BY rank DESC, part
        LIMIT {k}
    """


ORACLES["item_pagerank"] = _pagerank_oracle()

# group_quantile_filter oracle — per-lang p25 threshold from the
# (lang, score) histogram cumsum (SQL twin of text.group_quantile_threshold)
ORACLES["group_quantile_filter"] = """
    WITH scored AS (
        SELECT doc_id, lang,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    hist AS (
        SELECT lang, score, count(*) AS n FROM scored GROUP BY lang, score),
    cum AS (
        SELECT lang, score,
               sum(n) OVER (PARTITION BY lang ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(n) OVER (PARTITION BY lang) AS n_total
        FROM hist),
    thr AS (
        SELECT lang, min(score) AS threshold, min(n_total) AS n_total
        FROM cum WHERE cum_n >= 0.25 * n_total GROUP BY lang)
    SELECT s.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(t.n_total) AS BIGINT) AS n_total,
           round(min(t.threshold), 6) AS threshold,
           round(avg(s.score), 6) AS avg_kept_score
    FROM scored s JOIN thr t USING (lang)
    WHERE s.score > t.threshold
    GROUP BY s.lang
    ORDER BY s.lang
"""

def _span_dedup_incremental_oracle() -> str:
    """SQL twin of spans.build_span_index + probe_span_index over the
    planted ingest batch: corpus span-key set, batch segmentation with
    the identical md5 arithmetic, dup_corpus > dup_intra > new
    precedence."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    def segs(src: str, cols: str) -> str:
        return f"""(
            SELECT doc_id, seg_no,
                   substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
                   {cols}
            FROM (
                SELECT doc_id, ts,
                       unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                       {cols}
                FROM (SELECT doc_id, string_split(text, ' ') AS ts {cols}
                      FROM {src})))"""

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_h AS (SELECT DISTINCT h FROM {segs('documents', '')} s),
        bsegs AS (
            SELECT doc_id, seg_no, h, lang,
                   doc_id * 1000000 + seg_no AS occ
            FROM {segs('batch', ', lang')} s),
        intra AS (
            SELECT h, count(*) AS b_occ, min(occ) AS b_first
            FROM bsegs GROUP BY h),
        joined AS (
            SELECT b.lang, b.doc_id,
                   CASE WHEN c.h IS NOT NULL THEN 'dup_corpus'
                        WHEN i.b_occ > 1 AND b.occ <> i.b_first THEN 'dup_intra'
                        ELSE 'new' END AS cls
            FROM bsegs b
            JOIN intra i USING (h)
            LEFT JOIN corpus_h c ON c.h = b.h)
        SELECT lang,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN cls = 'dup_corpus' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_corpus,
               CAST(sum(CASE WHEN cls = 'dup_intra' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_intra,
               CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        FROM joined
        GROUP BY lang
        ORDER BY lang
    """


ORACLES["span_dedup_incremental"] = _span_dedup_incremental_oracle()

ORACLES["stream_trending_items"] = """
    WITH counts AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT *,
               CAST(row_number() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type) AS INTEGER) AS rnk
        FROM counts)
    SELECT window_start, event_type, n, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY window_start, rnk
"""

def _pq_knn_oracle(
    query_vec_id: int = 0,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.pq_knn: md5-rank codebook, per-subspace
    argmin encoding, ADC shortlist, exact cosine rerank."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        WITH emb AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        seeds AS (
            SELECT vec_id AS seed_id, e AS s_emb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        coded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id) AS INTEGER)
                       AS code
            FROM seeds),
        book AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm FROM coded)),
        vec_subs AS (
            SELECT vec_id, CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm FROM emb)),
        dists AS (
            SELECT vec_id, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM vec_subs JOIN book USING (m)),
        codes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM dists)
            WHERE rn = 1),
        qsub AS (
            SELECT CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS q_sub
            FROM (SELECT e, unnest(range(0, {m_sub})) AS mm
                  FROM emb WHERE vec_id = {query_vec_id})),
        adc AS (
            SELECT m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN book USING (m)),
        short AS (
            SELECT c.vec_id, round(sum(a.d2), 6) AS approx_d2
            FROM codes c JOIN adc a USING (m, code)
            WHERE c.vec_id <> {query_vec_id}
            GROUP BY c.vec_id
            ORDER BY approx_d2, c.vec_id
            LIMIT {rerank_factor * k}),
        q AS (SELECT e AS q_emb FROM emb WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               round(list_dot_product(e.e, q.q_emb)
                     / (sqrt(list_dot_product(e.e, e.e))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM emb e JOIN short s ON s.vec_id = e.vec_id CROSS JOIN q
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {k}
    """


ORACLES["knn_pq"] = _pq_knn_oracle()

# Raw-SQL surface twins — DuckDB runs the IDENTICAL correlated SQL text
# (modulo dialect-free constructs), which is exactly the migration
# contract the family demonstrates.
ORACLES["sql_cheapest_supplier"] = """
    SELECT l.l_partkey,
           CAST(min(l.l_suppkey) AS BIGINT) AS cheapest_supp,
           CAST(min(round(l.l_extendedprice * 100)) AS BIGINT)
               AS min_price_cents
    FROM lineitem l
    WHERE l.l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    LIMIT 200
"""

ORACLES["sql_exists_filter"] = """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F')
    ORDER BY c.c_custkey
    LIMIT 500
"""

ORACLES["sql_in_subquery"] = """
    SELECT l.l_partkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING count(*) > 30)
    GROUP BY l.l_partkey
    ORDER BY n_lines DESC, l.l_partkey
    LIMIT 100
"""

ORACLES["entropy_profile"] = """
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    counts AS (
        SELECT doc_id, lang, tok, count(*) AS n
        FROM toks GROUP BY doc_id, lang, tok),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS entropy
        FROM counts GROUP BY doc_id, lang)
    SELECT doc_id, lang, n_tokens, n_distinct, entropy
    FROM per_doc
    ORDER BY entropy, doc_id
    LIMIT 30
"""

ORACLES["item_pmi"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair_counts AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS c_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    margins AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY 1),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets
           FROM basket)
    SELECT p.part_a, p.part_b,
           CAST(p.c_ab AS BIGINT) AS c_ab,
           round(log2(nb.n_baskets * p.c_ab / (ma.c * mb.c)), 6) AS pmi
    FROM pair_counts p
    JOIN margins ma ON ma.l_partkey = p.part_a
    JOIN margins mb ON mb.l_partkey = p.part_b
    CROSS JOIN nb
    ORDER BY pmi DESC, p.part_a, p.part_b
    LIMIT 25
"""

ORACLES["corpus_mixture_tokens"] = """
    WITH t AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT lang, sum(n_tokens) AS lang_tokens, count(*) AS n_docs
        FROM t GROUP BY lang),
    wts AS (SELECT lang, n_docs, lang_tokens,
                   pow(lang_tokens, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT lang, n_docs,
               CAST(lang_tokens AS BIGINT) AS lang_tokens,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(20000 * w_raw / w_sum, 0) AS BIGINT) AS token_quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT lang, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t),
    admitted AS (
        SELECT r.lang, count(*) AS n_sampled, sum(r.n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.lang = q.lang
        WHERE r.cum_before < q.token_quota
        GROUP BY r.lang)
    SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.lang_tokens,
           q.mix_weight, q.token_quota,
           CAST(coalesce(a.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(a.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN admitted a ON q.lang = a.lang
    ORDER BY q.lang
"""

def _stream_span_dedup_oracle() -> str:
    """SQL twin of streaming.replay.stream_span_dedup: the planted batch
    segmented with the span arithmetic, classified per span against the
    corpus span-key set (stream ≡ batch for a full bounded replay)."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_h AS (
            SELECT DISTINCT substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
            FROM (SELECT ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                  FROM (SELECT string_split(text, ' ') AS ts FROM documents))),
        bsegs AS (
            SELECT lang,
                   substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
            FROM (SELECT lang, ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                  FROM (SELECT lang, string_split(text, ' ') AS ts FROM batch)))
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_corpus,
               CAST(sum(CASE WHEN c.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_not_in_corpus
        FROM bsegs b LEFT JOIN corpus_h c ON c.h = b.h
        GROUP BY lang
        ORDER BY lang
    """


ORACLES["stream_span_dedup"] = _stream_span_dedup_oracle()

ORACLES["augment_token_dropout"] = """
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS ts, text
        FROM documents),
    pos AS (
        SELECT doc_id, lang, ts, text,
               unnest(range(1, len(ts) + 1)) AS p
        FROM toks),
    scored AS (
        SELECT doc_id, lang, text, len(ts) AS n_tokens, p, ts[p] AS tok,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                   CAST(p - 1 AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM pos)
    SELECT doc_id, lang,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN u >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           sha256(min(text)) AS orig_sha,
           sha256(coalesce(string_agg(tok, ' ' ORDER BY p)
                           FILTER (WHERE u >= 0.15), '')) AS aug_sha
    FROM scored
    GROUP BY doc_id, lang
    ORDER BY doc_id
    LIMIT 200
"""

ORACLES["corpus_mixture_tokens_sharded"] = """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 4 AS INT) AS shard,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT lang, sum(n_tokens) AS lang_tokens, count(*) AS n_docs
        FROM t GROUP BY lang),
    wts AS (SELECT lang, n_docs, lang_tokens,
                   pow(lang_tokens, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT lang, n_docs,
               CAST(lang_tokens AS BIGINT) AS lang_tokens,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(20000 * w_raw / w_sum, 0) AS BIGINT) AS token_quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT lang, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t),
    admitted AS (
        SELECT r.lang, count(*) AS n_sampled, sum(r.n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.lang = q.lang
        WHERE r.cum_before < q.token_quota // 4
                             + (CASE WHEN r.shard < q.token_quota % 4
                                THEN 1 ELSE 0 END)
        GROUP BY r.lang)
    SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.lang_tokens,
           q.mix_weight, q.token_quota,
           CAST(coalesce(a.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(a.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN admitted a ON q.lang = a.lang
    ORDER BY q.lang
"""

ORACLES["jsonl_roundtrip_ingest"] = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""

ORACLES["variant_extraction"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CAST(props::JSON ->> 'k' AS INTEGER)) AS BIGINT) AS n_with_k,
           round(avg(CAST(props::JSON ->> 'k' AS INTEGER)), 4) AS avg_k,
           CAST(min(CAST(props::JSON ->> 'k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(max(CAST(props::JSON ->> 'k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

ORACLES["cdc_current_view"] = """
    WITH u AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               ('0x' || substr(md5('cdc-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_upd,
               ('0x' || substr(md5('cdc-del:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_del
        FROM orders),
    current_state AS (
        -- deletes win (seq 2), then updates (seq 1), else base (seq 0)
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN u_upd < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_del >= 0.02)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_price
    FROM current_state
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

ORACLES["equi_depth_histogram"] = """
    WITH ranked AS (
        SELECT o_totalprice AS v,
               percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        FROM orders),
    bucketed AS (
        SELECT v, CAST(least(floor(pr * 10), 9) AS INTEGER) AS bucket
        FROM ranked)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(v), 2) AS lo,
           round(max(v), 2) AS hi,
           round(avg(v), 4) AS mean
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""

ORACLES["span_contamination"] = """
    WITH train_h AS (
        SELECT DISTINCT
               substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
        FROM (SELECT ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
              FROM (SELECT string_split(text, ' ') AS ts FROM documents))),
    eval_set AS (
        SELECT doc_id + 5000000 AS doc_id, text, lang
        FROM documents WHERE doc_id % 17 = 0
        UNION ALL
        SELECT doc_id + 6000000, 'unseen eval item ' || CAST(doc_id AS VARCHAR), lang
        FROM documents WHERE doc_id % 17 = 1),
    esegs AS (
        SELECT doc_id, lang,
               substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
        FROM (SELECT doc_id, lang, ts,
                     unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
              FROM (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM eval_set))),
    per_doc AS (
        SELECT e.doc_id, e.lang,
               count(*) AS n_spans,
               sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM esegs e LEFT JOIN train_h t ON t.h = e.h
        GROUP BY e.doc_id, e.lang),
    scored AS (
        SELECT lang, round(n_hit * 1.0 / n_spans, 4) AS overlap FROM per_doc)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_eval_docs,
           CAST(sum(CASE WHEN overlap >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           round(avg(overlap), 6) AS avg_overlap
    FROM scored
    GROUP BY lang
    ORDER BY lang
"""

def _pq_multi_oracle(
    n_queries: int = 5,
    k: int = 5,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.pq_multi_query: shared codes, per-query ADC
    tables, windowed shortlists, exact rerank."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        WITH emb AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        seeds AS (
            SELECT vec_id AS seed_id, e AS s_emb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        coded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id) AS INTEGER)
                       AS code
            FROM seeds),
        book AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm FROM coded)),
        vec_subs AS (
            SELECT vec_id, CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm FROM emb)),
        dists AS (
            SELECT vec_id, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM vec_subs JOIN book USING (m)),
        codes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM dists)
            WHERE rn = 1),
        qsub AS (
            SELECT vec_id AS query_id, CAST(mm AS INTEGER) AS m,
                   e[{lo} : {w}] AS q_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm
                  FROM emb WHERE vec_id < {n_queries})),
        adc AS (
            SELECT query_id, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN book USING (m)),
        approx AS (
            SELECT a.query_id, c.vec_id, round(sum(a.d2), 6) AS approx_d2
            FROM codes c JOIN adc a USING (m, code)
            WHERE c.vec_id <> a.query_id
            GROUP BY a.query_id, c.vec_id),
        short AS (
            SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx_d2, vec_id) AS srn
                FROM approx)
            WHERE srn <= {rerank_factor * k}),
        qe AS (SELECT vec_id AS query_id, e AS q_emb FROM emb
               WHERE vec_id < {n_queries}),
        rer AS (
            SELECT s.query_id, e.vec_id, e.label,
                   round(list_dot_product(e.e, qe.q_emb)
                         / (sqrt(list_dot_product(e.e, e.e))
                            * sqrt(list_dot_product(qe.q_emb, qe.q_emb))), 6)
                       AS cos_sim
            FROM short s
            JOIN emb e ON e.vec_id = s.vec_id
            JOIN qe ON qe.query_id = s.query_id)
        SELECT query_id, vec_id, label, cos_sim,
               CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id) AS rank
            FROM rer)
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """


ORACLES["knn_pq_multi"] = _pq_multi_oracle()

def _analyze_table_oracle() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    parts = [
        f"""
        SELECT '{c}' AS "column",
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
               round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS null_frac,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


ORACLES["analyze_table"] = _analyze_table_oracle()

ORACLES["cohort_retention"] = """
    WITH cohort AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey),
    activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', o_orderdate) AS active_month
        FROM orders)
    SELECT strftime(c.cohort_month, '%Y-%m') AS cohort,
           CAST(date_diff('month', c.cohort_month, a.active_month) AS INTEGER)
               AS month_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity a JOIN cohort c USING (o_custkey)
    WHERE date_diff('month', c.cohort_month, a.active_month) <= 6
    GROUP BY 1, 2
    ORDER BY cohort, month_offset
    LIMIT 500
"""

ORACLES["event_funnel"] = """
    WITH t1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id),
    t2 AS (
        SELECT e.user_id, min(t1.t_view) AS t_view,
               min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t_view
                        THEN e.ts END) AS t_click
        FROM events e JOIN t1 USING (user_id) GROUP BY e.user_id),
    t3 AS (
        SELECT e.user_id, min(t2.t_view) AS t_view, min(t2.t_click) AS t_click,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t_click
                        THEN e.ts END) AS t_purchase
        FROM events e JOIN t2 USING (user_id) GROUP BY e.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_viewed,
           CAST(count(t_click) AS BIGINT) AS n_view_click,
           CAST(count(t_purchase) AS BIGINT) AS n_view_click_purchase
    FROM t3
"""

ORACLES["rfm_segments"] = """
    WITH per_cust AS (
        SELECT o_custkey, max(o_orderdate) AS last_order,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT spend_cents,
               percent_rank() OVER (ORDER BY last_order, o_custkey) AS pr_r,
               percent_rank() OVER (ORDER BY n_orders, o_custkey) AS pr_f,
               percent_rank() OVER (ORDER BY spend_cents, o_custkey) AS pr_m
        FROM per_cust)
    SELECT CAST(least(floor(pr_r * 4), 3) AS INTEGER) AS r_quartile,
           CAST(least(floor(pr_f * 4), 3) AS INTEGER) AS f_quartile,
           CAST(least(floor(pr_m * 4), 3) AS INTEGER) AS m_quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(spend_cents) / count(*) / 100.0, 4) AS avg_spend
    FROM ranked
    GROUP BY 1, 2, 3
    ORDER BY r_quartile, f_quartile, m_quartile
"""

ORACLES["association_rules"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS c_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    rules AS (
        SELECT x AS antecedent, y AS consequent, c_ab FROM half
        UNION ALL
        SELECT y AS antecedent, x AS consequent, c_ab FROM half),
    margins AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY 1),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets
           FROM basket)
    SELECT r.antecedent, r.consequent,
           CAST(r.c_ab AS BIGINT) AS c_ab,
           round(r.c_ab / nb.n_baskets, 6) AS support,
           round(r.c_ab * 1.0 / ma.c, 6) AS confidence,
           round(nb.n_baskets * r.c_ab / (ma.c * mb.c), 6) AS lift
    FROM rules r
    JOIN margins ma ON ma.l_partkey = r.antecedent
    JOIN margins mb ON mb.l_partkey = r.consequent
    CROSS JOIN nb
    ORDER BY confidence DESC, lift DESC, r.antecedent, r.consequent
    LIMIT 25
"""

ORACLES["robust_outliers"] = """
    WITH vals AS (SELECT o_totalprice AS v FROM orders),
    h1 AS (SELECT v, count(*) AS n FROM vals GROUP BY v),
    c1 AS (SELECT v, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(n) OVER () AS nt FROM h1),
    med AS (SELECT min(v) AS median FROM c1 WHERE cum >= 0.5 * nt),
    dev AS (SELECT v, med.median, round(abs(v - med.median), 2) AS d
            FROM vals CROSS JOIN med),
    h2 AS (SELECT d, count(*) AS n FROM dev GROUP BY d),
    c2 AS (SELECT d, sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(n) OVER () AS nt FROM h2),
    mad AS (SELECT min(d) AS mad FROM c2 WHERE cum >= 0.5 * nt)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(min(dev.median), 2) AS median,
           round(min(mad.mad), 2) AS mad,
           CAST(sum(CASE WHEN dev.d > 3.0 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(CASE WHEN dev.d > 3.0 * 1.4826 * mad.mad
                     THEN dev.v END), 2) AS max_outlier
    FROM dev CROSS JOIN mad
"""

ORACLES["dau_wau_stickiness"] = """
    WITH active AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
    dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM active GROUP BY d),
    offs AS (SELECT unnest(range(0, 7)) AS off),
    supported AS (
        SELECT a.d + (o.off * INTERVAL 1 DAY) AS w_day, a.user_id
        FROM active a CROSS JOIN offs o),
    wau AS (SELECT w_day, count(DISTINCT user_id) AS wau
            FROM supported GROUP BY w_day)
    SELECT strftime(d.d, '%Y-%m-%d') AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.w_day = d.d
    ORDER BY day
    LIMIT 60
"""

ORACLES["item_communities"] = """
    WITH RECURSIVE basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pr AS (
        SELECT a.l_partkey AS doc_a, b.l_partkey AS doc_b
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
              UNION SELECT doc_b AS s, doc_a AS d FROM pr),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
    cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
    SELECT label AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_parts,
           min(id) AS min_part,
           max(id) AS max_part
    FROM cc
    GROUP BY label
    HAVING count(*) >= 2
    ORDER BY n_parts DESC, cluster_id
    LIMIT 25
"""

# scd2_history oracle — the changelog is the cdc_current_view one; the
# version algebra per key follows from which md5 draws fire: base always,
# +1 version if updated; current unless deleted.
ORACLES["scd2_history"] = """
    WITH per_key AS (
        SELECT o_orderstatus,
               (('0x' || substr(md5('cdc-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.05) AS has_u,
               (('0x' || substr(md5('cdc-del:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.02) AS has_d
        FROM orders)
    SELECT o_orderstatus,
           CAST(sum(1 + has_u::INT) AS BIGINT) AS n_versions,
           CAST(sum(CASE WHEN has_d THEN 0 ELSE 1 END) AS BIGINT) AS n_current,
           CAST(sum(has_u::INT + CASE WHEN has_d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_closed
    FROM per_key
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

ORACLES["span_curation_funnel"] = _SPAN_SEGS_CTE + """,
    verdict AS (
        SELECT h, count(*) AS n_occ, min(occ) AS first_occ
        FROM hashed GROUP BY h),
    kept AS (
        SELECT s.doc_id, s.seg_no, s.span,
               (v.n_occ = 1 OR s.occ = v.first_occ) AS keep
        FROM hashed s JOIN verdict v USING (h)),
    per_doc AS (
        SELECT doc_id,
               count(*) AS n_spans,
               sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_spans_dropped,
               coalesce(string_agg(span, ' ' ORDER BY seg_no)
                        FILTER (WHERE keep), '') AS text_kept
        FROM kept GROUP BY doc_id),
    staged AS (
        SELECT d.lang, p.n_spans, p.n_spans_dropped, p.text_kept,
               (p.n_spans_dropped * 1.0 / p.n_spans <= 0.5
                AND length(p.text_kept) > 0) AS pass_span,
               round(length(regexp_replace(p.text_kept, '[^a-zA-Z]', '', 'g'))
                     * 1.0 / nullif(length(p.text_kept), 0), 4) AS alpha
        FROM per_doc p JOIN documents d USING (doc_id))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pass_span THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after_span,
           CAST(sum(CASE WHEN pass_span AND alpha >= 0.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_after_quality,
           CAST(sum(CASE WHEN pass_span AND alpha >= 0.5
                    THEN len(list_filter(string_split(text_kept, ' '),
                                         x -> length(x) > 0))
                    ELSE 0 END) AS BIGINT) AS tokens_retained
    FROM staged
    GROUP BY lang
    ORDER BY lang
"""

# --- round-5 source-triage wave -------------------------------------------
def _scorecard_sql(planted: bool) -> str:
    """Scorecard SQL twin; ``planted`` mirrors the standalone gate's
    synthetic duplicate set, the composed report uses the real corpus
    (consistent denominators across its blocks)."""
    corpus = (
        """SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang, source FROM documents
        WHERE doc_id % 10 = 0"""
        if planted
        else "SELECT doc_id, text, lang, source FROM documents"
    )
    return f"""
    WITH corpus AS (
        {corpus}),
    per_doc AS (
        SELECT doc_id, source, lang, sha256(text) AS fp,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and')))
                       * 1.0 / len(string_split(text, ' ')), 4) AS quality
        FROM corpus),
    copies AS (SELECT fp, count(*) AS n_copies FROM per_doc GROUP BY fp),
    flagged AS (
        SELECT p.*, CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END AS is_dup
        FROM per_doc p JOIN copies c USING (fp))
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(avg(n_tokens), 2) AS avg_tokens,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
           round(sum(is_dup) * 1.0 / count(*), 4) AS dup_rate
    FROM flagged GROUP BY source ORDER BY source
"""


ORACLES["source_scorecard"] = _scorecard_sql(planted=True)

ORACLES["cross_source_overlap"] = """
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    sh0 AS (
        SELECT source,
               unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
                        ELSE [] END)) AS shingle
        FROM toks),
    sh AS (SELECT DISTINCT source, substr(md5(shingle), 1, 16) AS h
           FROM sh0 WHERE length(shingle) > 0),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
    SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY n_shared DESC, src_a, src_b LIMIT 25
"""

ORACLES["boilerplate_prefix_profile"] = """
    WITH p AS (
        SELECT source,
               array_to_string(list_slice(
                   list_filter(string_split(text, ' '),
                               x -> length(x) > 0), 1, 8), ' ') AS prefix
        FROM documents)
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM p GROUP BY prefix HAVING count(*) >= 2
    ORDER BY n_docs DESC, prefix
"""

ORACLES["source_mixture"] = """
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (SELECT source, count(*) AS n_docs FROM t GROUP BY source),
    wts AS (SELECT source, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT source, n_docs,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT source, n_tokens,
               row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM t),
    sampled AS (
        SELECT r.source, count(*) AS n_sampled,
               sum(n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.source = q.source
        WHERE r.rk <= q.quota GROUP BY r.source)
    SELECT q.source, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
           CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN sampled s ON q.source = s.source
    ORDER BY q.source
"""


def _semantic_contamination_oracle(
    threshold: float = 0.40,
    split_at: int = 250,
    n_tables: int = 4,
    n_planes: int = 6,
) -> str:
    """SQL twin of functions.similarity.semantic_contamination: the same
    deterministic Rademacher buckets as _rp_lsh_pairs_oracle, restricted
    to eval x train cells, exact-cosine verified, rolled up per label."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS eval_id, y.vec_id AS train_id
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                 WHERE x.vec_id >= {split_at} AND y.vec_id < {split_at}),
        hits AS (
            SELECT DISTINCT cand.eval_id
            FROM cand
            JOIN b ea ON ea.vec_id = cand.eval_id
            JOIN b et ON et.vec_id = cand.train_id
            WHERE round(list_dot_product(ea.emb, et.emb)
                        / (sqrt(list_dot_product(ea.emb, ea.emb))
                           * sqrt(list_dot_product(et.emb, et.emb))), 6)
                  >= {threshold}),
        ev AS (SELECT vec_id AS eval_id, label FROM embeddings
               WHERE vec_id >= {split_at})
        SELECT ev.label,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN h.eval_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated,
               round(sum(CASE WHEN h.eval_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS contamination_rate
        FROM ev LEFT JOIN hits h ON ev.eval_id = h.eval_id
        GROUP BY ev.label ORDER BY ev.label
    """


QUERIES["semantic_contamination"] = similarity.semantic_contamination
ORACLES["semantic_contamination"] = _semantic_contamination_oracle()

QUERIES["unigram_logloss"] = text.unigram_logloss_profile
ORACLES["unigram_logloss"] = """
    WITH t2 AS (
        SELECT doc_id, lang, term FROM (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab)
    SELECT doc_id, lang, CAST(count(*) AS INTEGER) AS n_tokens,
           round(avg(-ln(n_term * 1.0 / n_total)), 4) AS avg_logloss
    FROM t2 JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id, lang ORDER BY doc_id LIMIT 500
"""


QUERIES["length_bucketed_batches"] = curation.length_bucketed_batches
ORACLES["length_bucketed_batches"] = """
    WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    ranked AS (
        SELECT doc_id, n_tokens,
               percent_rank() OVER (ORDER BY n_tokens, doc_id) AS pr
        FROM t),
    placed AS (
        SELECT n_tokens,
               least(CAST(floor(pr * 8) AS INT), 7) AS bucket,
               row_number() OVER (
                   PARTITION BY least(CAST(floor(pr * 8) AS INT), 7)
                   ORDER BY n_tokens, doc_id) AS rk
        FROM ranked),
    b AS (
        SELECT bucket, CAST(floor((rk - 1) / 16) AS BIGINT) AS batch_no,
               count(*) AS n_in_batch, max(n_tokens) AS batch_max,
               sum(n_tokens) AS batch_mass
        FROM placed GROUP BY 1, 2)
    SELECT bucket,
           CAST(sum(n_in_batch) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(batch_mass) AS BIGINT) AS token_mass,
           CAST(sum(n_in_batch * batch_max - batch_mass) AS BIGINT)
               AS padded_tokens,
           round(sum(n_in_batch * batch_max - batch_mass) * 1.0
                 / (sum(batch_mass)
                    + sum(n_in_batch * batch_max - batch_mass)), 4)
               AS pad_ratio
    FROM b GROUP BY bucket ORDER BY bucket
"""

QUERIES["novelty_profile"] = dedup.novelty_profile
ORACLES["novelty_profile"] = """
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
        SELECT doc_id, lang,
               unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
                        ELSE [] END)) AS g
        FROM toks),
    g2 AS (SELECT doc_id, lang, substr(md5(g), 1, 16) AS h
           FROM grams WHERE length(g) > 0),
    train AS (SELECT DISTINCT h FROM g2 WHERE doc_id % 5 != 0),
    per_doc AS (
        SELECT g2.doc_id, g2.lang, count(*) AS n_grams,
               sum(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS n_novel
        FROM g2 LEFT JOIN train tr ON g2.h = tr.h
        WHERE g2.doc_id % 5 = 0
        GROUP BY g2.doc_id, g2.lang)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_novel) AS BIGINT) AS total_novel,
           round(avg(n_novel * 1.0 / n_grams), 4) AS avg_novelty
    FROM per_doc GROUP BY lang ORDER BY lang
"""


def _source_dup_attribution_oracle(max_hamming: int = 3) -> str:
    """SQL twin of sourcetriage.source_dup_attribution: the simhash CC
    from _clusters_oracle, cluster members joined to their source, and a
    per-source rollup of cross-source cluster membership."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        members AS (
            SELECT cc.id AS doc_id, cc.label AS cluster_id, d.source
            FROM cc JOIN documents d ON d.doc_id = cc.id),
        cstats AS (SELECT cluster_id, count(DISTINCT source) AS n_sources
                   FROM members GROUP BY cluster_id)
        SELECT m.source,
               CAST(count(*) AS BIGINT) AS n_dup_docs,
               CAST(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cross_docs,
               round(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS cross_rate
        FROM members m JOIN cstats c ON m.cluster_id = c.cluster_id
        GROUP BY m.source ORDER BY m.source
    """


QUERIES["source_dup_attribution"] = sourcetriage.source_dup_attribution
ORACLES["source_dup_attribution"] = _source_dup_attribution_oracle()


QUERIES["boilerplate_suffix_profile"] = sourcetriage.boilerplate_suffix_profile
ORACLES["boilerplate_suffix_profile"] = """
    WITH corpus AS (
        SELECT text, source FROM documents
        UNION ALL
        SELECT text, source FROM documents WHERE doc_id % 10 = 0),
    p AS (
        SELECT source, toks,
               array_to_string(list_slice(
                   toks, greatest(len(toks) - 7, 1), len(toks)), ' ') AS suffix
        FROM (SELECT source,
                     list_filter(string_split(text, ' '),
                                 x -> length(x) > 0) AS toks
              FROM corpus))
    SELECT suffix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM p GROUP BY suffix HAVING count(*) >= 2
    ORDER BY n_docs DESC, suffix
"""


QUERIES["source_vocabulary_profile"] = sourcetriage.source_vocabulary_profile
ORACLES["source_vocabulary_profile"] = """
    WITH t AS (
        SELECT source, substr(md5(term), 1, 16) AS h FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT h) AS BIGINT) AS n_terms,
           round(count(DISTINCT h) * 1.0 / count(*), 4) AS ttr
    FROM t GROUP BY source ORDER BY source
"""


QUERIES["source_triage_report"] = sourcetriage.source_triage_report
# report oracle: UNPLANTED scorecard block — the composed decision table
# keeps one corpus denominator across all three blocks (r5 advisory).
ORACLES["source_triage_report"] = f"""
    WITH sc AS ({_scorecard_sql(planted=False)}),
    vp AS ({ORACLES["source_vocabulary_profile"]}),
    att AS ({_source_dup_attribution_oracle()})
    SELECT sc.source, sc.n_docs, sc.n_langs, sc.n_tokens, sc.avg_quality,
           sc.dup_rate, vp.ttr,
           coalesce(att.cross_rate, 0.0) AS cross_rate
    FROM sc JOIN vp ON sc.source = vp.source
    LEFT JOIN att ON sc.source = att.source
    ORDER BY sc.source
"""


QUERIES["label_centroid_outliers"] = similarity.label_centroid_outliers
ORACLES["label_centroid_outliers"] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT vec_id, label,
               unnest(range(0, len(emb))) AS pos,
               unnest(emb) AS v
        FROM b),
    cent AS (SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label),
    per_vec AS (
        SELECT vals.vec_id, vals.label,
               sum(vals.v * cent.c) AS dot,
               sqrt(sum(vals.v * vals.v)) AS vn
        FROM vals JOIN cent ON vals.label = cent.label AND vals.pos = cent.pos
        GROUP BY vals.vec_id, vals.label),
    scored AS (
        SELECT p.label, p.vec_id,
               round(p.dot / (p.vn * n.cn), 6) AS cos_sim
        FROM per_vec p JOIN cnorm n ON p.label = n.label),
    ranked AS (
        SELECT label, vec_id, cos_sim,
               row_number() OVER (PARTITION BY label
                   ORDER BY cos_sim ASC, vec_id ASC) AS rank
        FROM scored)
    SELECT label, CAST(rank AS INT) AS rank, vec_id, cos_sim
    FROM ranked WHERE rank <= 5 ORDER BY label, rank
"""


QUERIES["nearest_centroid_agreement"] = similarity.nearest_centroid_agreement
ORACLES["nearest_centroid_agreement"] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT vec_id, label,
               unnest(range(0, len(emb))) AS pos,
               unnest(emb) AS v
        FROM b),
    cent AS (SELECT label AS label_c, pos, avg(v) AS c
             FROM vals GROUP BY label, pos),
    cnorm AS (SELECT label_c, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label_c),
    scores AS (
        SELECT vals.vec_id, vals.label, cent.label_c,
               round(sum(vals.v * cent.c)
                     / (sqrt(sum(vals.v * vals.v)) * any_value(n.cn)), 6)
                   AS cos_sim
        FROM vals
        JOIN cent ON vals.pos = cent.pos
        JOIN cnorm n ON cent.label_c = n.label_c
        GROUP BY vals.vec_id, vals.label, cent.label_c),
    nearest AS (
        SELECT vec_id, label,
               CASE WHEN first(label_c ORDER BY cos_sim DESC, label_c ASC)
                         = label
                    THEN 1 ELSE 0 END AS agree
        FROM scores GROUP BY vec_id, label)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(agree) AS BIGINT) AS n_agree,
           round(sum(agree) * 1.0 / count(*), 4) AS agree_rate
    FROM nearest GROUP BY label ORDER BY label
"""


QUERIES["source_quantile_filter"] = text.source_quantile_filter
ORACLES["source_quantile_filter"] = """
    WITH scored AS (
        SELECT doc_id, source,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    hist AS (
        SELECT source, score, count(*) AS n FROM scored GROUP BY source, score),
    cum AS (
        SELECT source, score,
               sum(n) OVER (PARTITION BY source ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(n) OVER (PARTITION BY source) AS n_total
        FROM hist),
    thr AS (
        SELECT source, min(score) AS threshold, min(n_total) AS n_total
        FROM cum WHERE cum_n >= 0.25 * n_total GROUP BY source)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(t.n_total) AS BIGINT) AS n_total,
           round(min(t.threshold), 6) AS threshold,
           round(avg(s.score), 6) AS avg_kept_score
    FROM scored s JOIN thr t USING (source)
    WHERE s.score > t.threshold
    GROUP BY s.source
    ORDER BY s.source
"""


def _negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic implicit-feedback negative sampling (ml.recsys)."""
    from project_bigdata_recsys_spark.ml.recsys import negative_samples

    return negative_samples(spark, sf_dir)


# --- round 6: driver evidence for the fold + export-order contracts -------
QUERIES["incremental_components"] = dedup.incremental_components_profile
ORACLES["incremental_components"] = f"""
    WITH RECURSIVE {_simhash_ctes()},
    pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
              UNION SELECT doc_b AS s, doc_a AS d FROM pr),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
    cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
    sizes AS (SELECT label, count(*) AS n FROM cc GROUP BY label
              HAVING count(*) >= 2)
    SELECT CAST(n AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           min(label) AS min_cluster_id
    FROM sizes GROUP BY n ORDER BY cluster_size
"""

QUERIES["shuffled_export_manifest"] = maintenance.shuffled_export_manifest
ORACLES["shuffled_export_manifest"] = """
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents),
    ranked AS (
        SELECT doc_id, shuffle_key,
               row_number() OVER (ORDER BY shuffle_key, doc_id) AS rank
        FROM keyed)
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, shuffle_key
    FROM ranked WHERE rank % 25 = 1 ORDER BY rank
"""


def _pack_sequences_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: tokenizer-aware packing with BOS+EOS document
    boundaries charged to the budget (boundary_tokens=2), sharded form."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt

    return curation.pack_sequences_for(
        _lt(spark, sf_dir, "documents"), n_shards=4, boundary_tokens=2
    )


QUERIES["pack_sequences_boundaries"] = _pack_sequences_boundaries
ORACLES["pack_sequences_boundaries"] = """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 4 AS INT) AS shard,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    p AS (
        SELECT lang, shard, n_tokens,
               CAST(floor((sum(n_tokens + 2) OVER (PARTITION BY lang, shard
                    ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                    - (n_tokens + 2)) / 256.0) AS BIGINT) AS seq_no
        FROM t)
    SELECT lang, shard, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(least(1.0, (sum(n_tokens) + count(*) * 2) / 256.0), 4)
               AS fill_ratio
    FROM p GROUP BY lang, shard, seq_no ORDER BY lang, shard, seq_no
"""

QUERIES["int8_quantization_profile"] = similarity.int8_quantization_profile
ORACLES["int8_quantization_profile"] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    s AS (SELECT vec_id, label, emb,
                 list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
          FROM b),
    r AS (SELECT vec_id, label, scale, emb,
                 list_transform(emb,
                     x -> least(greatest(round(x / scale), -127.0), 127.0)
                          * scale) AS recon
          FROM s WHERE scale > 0),
    e AS (SELECT label, scale,
                 list_sum(list_transform(range(0, len(emb)),
                     i -> pow(emb[i + 1] - recon[i + 1], 2))) / len(emb)
                     AS mse,
                 list_dot_product(emb, recon)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(recon, recon))) AS cos_sim
          FROM r)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(mse), 8) AS avg_mse,
           round(avg(cos_sim), 6) AS avg_cos,
           round(min(cos_sim), 6) AS min_cos,
           round(avg(scale), 6) AS avg_scale
    FROM e GROUP BY label ORDER BY label
"""

QUERIES["split_source_audit"] = curation.split_source_audit
ORACLES["split_source_audit"] = f"""
    WITH RECURSIVE {_simhash_ctes()},
    pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
              UNION SELECT doc_b AS s, doc_a AS d FROM pr),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
    cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
    assigned AS (
        SELECT d.doc_id, d.source,
               COALESCE(cc.label, d.doc_id) AS cluster_id,
               CASE WHEN ('0x' || substr(md5('split:' ||
                        CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0 < 0.8 THEN 'train'
                    WHEN ('0x' || substr(md5('split:' ||
                        CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0 < 0.9 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
    csrc AS (SELECT cluster_id, count(*) AS cluster_size,
                    count(DISTINCT source) AS n_sources
             FROM assigned GROUP BY cluster_id)
    SELECT a.source, a.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c.cluster_size > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clustered,
           CAST(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_docs,
           CASE WHEN sum(CASE WHEN c.cluster_size > 1 THEN 1 ELSE 0 END) > 0
                THEN round(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END)
                           * 1.0
                           / sum(CASE WHEN c.cluster_size > 1 THEN 1 ELSE 0 END),
                           4)
                ELSE 0.0 END AS cross_rate
    FROM assigned a JOIN csrc c USING (cluster_id)
    GROUP BY a.source, a.split ORDER BY a.source, a.split
"""


# --------------------------------------------------------------------------
# Gate-window rotation (round 7).  The driver's correctness gate executes
# the FIRST 50 keys of QUERIES, so ordering is the rotation mechanism and
# this block — which must stay the LAST statement touching QUERIES, since
# later registrations would append BELOW the window and never be gated
# (the round-5 late-wave mistake) — pins the window explicitly.
# Round-9 rotation (VERDICT r8 task #1): all 50 slots go to queries
# with ZERO prior driver evidence — the r8 session-2 wave (ips_eval,
# ucb_ranking, ewma_anomalies + stream twin, quality_lr_score, ...) then
# the session-3 statistics/retrieval waves, taken oldest-first in
# registration order.  After this round the never-driver-checked count
# drops 98 -> 48.
#
# Round-10 rotation (EXECUTED below, per VERDICT r9 task #1): slots 1-46 =
# the 46-query never-driver-checked tail in registration order
# (pinball_quantile_eval ... theil_inequality_index), slots 47-48 = the two
# _reused aliases, slots 49-50 = the two round-10 stretch operators
# (dedup_manifest_diff, hard_negative_mining — new entries enter VIA the
# window per the r9 verdict task #7, so they get driver evidence
# immediately and the never-driver-checked count is 0 after this round).
# One correction vs the r9 write-ahead comment: it named pricing_summary
# for a tail slot, but pricing_summary's latest driver evidence is r6 (it
# re-ran in the r6 window); the oldest evidence is the 50-query r4 block,
# which is exactly the r11 rotation below.
#
# Round-11 rotation (EXECUTED in round 11, per VERDICT r10 task #1): 39
# r4-latest-evidence queries plus ELEVEN round-11 entrants with no prior
# driver evidence (jdbc_roundtrip_ingest, training_data_card,
# python_datasource_interactions, stream_python_datasource at slots
# 26-29 displacing knn_lsh/embedding_stats/media_profile/
# video_frame_profile, and mixture_temperature_sweep,
# token_budget_planner, secret_scan_profile, stream_secret_scan,
# orc_roundtrip_ingest, minhash_calibration_profile,
# stream_update_ann_index at slots 44-50 displacing
# stream_session_windows/rolling_median/deterministic_group_sample/
# json_extraction/events_per_day/event_rate/user_topk_recommendations —
# every displaced name moved to the r13 schedule, nothing dropped).
# Final window as driven (CORRECTNESS_r11.json 50/50):
#     pack_sequences, corpus_mixture, tfidf_top_terms, curation_funnel, incremental_dedup,
#     embedding_near_dup_lsh, knn_ivf_centroid, embedding_dup_clusters,
#     chunk_documents, quality_percentile_filter, token_frequencies,
#     repetition_profile, exact_duplicates, ngram_jaccard_pairs,
#     minhash_candidates, simhash_near_pairs, near_dup_clusters,
#     contamination_check, dedup_corpus_stats, minhash_verified_pairs,
#     knn_brute_force, knn_multi_query, embedding_near_dup_pairs,
#     knn_ivf_bucketed, knn_rp_lsh, jdbc_roundtrip_ingest,
#     training_data_card, python_datasource_interactions, stream_python_datasource,
#     synthetic_interactions, mutated_interactions, stratified_sample,
#     als_top_recommendations, als_user_factors, classifier_metrics,
#     kb_popular_items, kb_success_profile, stream_stateful_features,
#     stream_bootstrapped_features, stream_tumbling_counts, stream_sliding_counts,
#     stream_dedup_events, stream_stream_attribution, mixture_temperature_sweep,
#     token_budget_planner, secret_scan_profile, stream_secret_scan,
#     orc_roundtrip_ingest, minhash_calibration_profile, stream_update_ann_index
# (39 names from the CORRECTNESS_r01..r10 oldest-evidence union; 11 new.)
#
# Round-12 rotation schedule (EXECUTED below in round 12; local
# sf0.01 gate-window sweep output committed as PRECHECK_r12_gate.json —
# the rotation counts only once CORRECTNESS_r12.json is green): the 44
# r5-latest-evidence queries in registration order, then the first six
# of the r6 block:
#       span_dedup_profile, duplicated_spans, weighted_sample,
#       cluster_aware_split, group_quantile_filter, span_dedup_incremental,
#       stream_trending_items, knn_pq, sql_cheapest_supplier,
#       sql_exists_filter, sql_in_subquery, entropy_profile,
#       item_pmi, corpus_mixture_tokens, stream_span_dedup,
#       augment_token_dropout, corpus_mixture_tokens_sharded, jsonl_roundtrip_ingest,
#       variant_extraction, equi_depth_histogram, span_contamination,
#       knn_pq_multi, analyze_table, cohort_retention,
#       event_funnel, association_rules, robust_outliers,
#       dau_wau_stickiness, item_communities, scd2_history,
#       span_curation_funnel, pack_sequences_sharded, embedding_dup_clusters_lsh,
#       knn_ivf_lloyd, knn_graph, cluster_capped_sample,
#       stream_ingest_dedup, skew_report, media_dedup,
#       interval_overlap_counts, corpus_mixture_sharded, curation_funnel_sharded,
#       incremental_dedup_indexed, purchase_asof_click, normalized_duplicates,
#       rfm_segments, power_user_rank, source_scorecard,
#       cross_source_overlap, boilerplate_prefix_profile
# (r13 continues below; r14 onward = the remaining 36 r7-evidence queries
# then the r8 block.)
#
# Round-13 rotation schedule (write-ahead, same discipline): the 36
# remaining r6-latest-evidence queries in registration order, then the
# 14 oldest r7-evidence queries in registration order:
#     source_mixture, sessionize, approx_profile,
#     csv_roundtrip_ingest, pricing_summary, unigram_logloss,
#     length_bucketed_batches, novelty_profile, source_dup_attribution,
#     boilerplate_suffix_profile, source_vocabulary_profile, source_triage_report,
#     label_centroid_outliers, nearest_centroid_agreement, source_quantile_filter,
#     incremental_components, shuffled_export_manifest, pack_sequences_boundaries,
#     int8_quantization_profile, split_source_audit, ann_recall_profile,
#     centroid_confusion, conversion_lag, gap_filled_daily,
#     ab_test_lift, pareto_curve, forget_users_plan,
#     event_transitions, multi_touch_attribution, decayed_popularity,
#     kfold_assignment, negative_samples, pit_segment_rollup,
#     incremental_agg_merge, hll_daily_rollup, dedup_keep_best,
#     snapshot_diff, item_pagerank, video_frame_profile,
#     media_profile, label_histogram,
#     json_extraction, events_per_day, event_rate,
#     stream_session_windows, rolling_median, deterministic_group_sample,
#     knn_lsh, embedding_stats,
#     user_topk_recommendations
# (recomputed from the CORRECTNESS_r01..r10 union after the r11/r12
# rotations land.  Schedule only — it counts once CORRECTNESS_r13.json
# is green; re-verify locally at rotation time.)
#
# Round-14 rotation schedule (write-ahead, same discipline;
# schedule only — counts once CORRECTNESS_r14.json is green): the 47
# remaining r7-evidence queries in registration order, then the first
# three of the r8 block:
#     cdc_current_view, course_stats, user_activity,
#     distinct_counts, conditional_pivot, time_range_filter,
#     derived_projection, top_k_orders, null_handling,
#     multiway_join, rollup_totals, scalar_functions,
#     union_dedup, anti_join_new_keys, semantic_contamination,
#     stream_semantic_dedup, item_pagerank_personalized, prefix_cache_savings,
#     packing_efficiency_sweep, monthly_growth, embedding_dim_profile,
#     rolling_distinct_users, fuzzy_name_matches, psi_drift,
#     backfill_plan, schema_drift_report, source_dup_attribution_reused,
#     cluster_aware_split_reused, incremental_components_fold, stream_semantic_dedup_probe,
#     stream_cdc_current, ann_rerank, ddsketch_quantile_rollup,
#     stream_value_quantiles, merge_upsert_profile, bpe_pair_counts,
#     rerank_uplift_profile, stream_late_data_audit, stream_merge_apply,
#     concurrent_events_peak, label_agreement_kappa, bm25_scores,
#     vocab_coverage_curve, item_triangles, cms_heavy_hitters,
#     item_similar_neighbors, lang_source_chi2, doc_quality_profile,
#     lang_profile, doc_fingerprints
# (r15 onward continues the r8 block.)
_GATE_WINDOW = [
    "span_dedup_profile",
    "duplicated_spans",
    "weighted_sample",
    "cluster_aware_split",
    "group_quantile_filter",
    "span_dedup_incremental",
    "stream_trending_items",
    "knn_pq",
    "sql_cheapest_supplier",
    "sql_exists_filter",
    "sql_in_subquery",
    "entropy_profile",
    "item_pmi",
    "corpus_mixture_tokens",
    "stream_span_dedup",
    "augment_token_dropout",
    "corpus_mixture_tokens_sharded",
    "jsonl_roundtrip_ingest",
    "variant_extraction",
    "equi_depth_histogram",
    "span_contamination",
    "knn_pq_multi",
    "analyze_table",
    "cohort_retention",
    "event_funnel",
    "association_rules",
    "robust_outliers",
    "dau_wau_stickiness",
    "item_communities",
    "scd2_history",
    "span_curation_funnel",
    "pack_sequences_sharded",
    "embedding_dup_clusters_lsh",
    "knn_ivf_lloyd",
    "knn_graph",
    "cluster_capped_sample",
    "stream_ingest_dedup",
    "skew_report",
    "media_dedup",
    "interval_overlap_counts",
    "corpus_mixture_sharded",
    "curation_funnel_sharded",
    "incremental_dedup_indexed",
    "purchase_asof_click",
    "normalized_duplicates",
    "rfm_segments",
    "power_user_rank",
    "source_scorecard",
    "cross_source_overlap",
    "boilerplate_prefix_profile",
]
# (the window is applied ONCE, by the rebuild block at the very end of
# this module — after every registration, including the ones below)


# streaming twin of semantic_contamination — bounded replay must equal
# the batch oracle exactly, so the SQL twin is shared verbatim
QUERIES["stream_semantic_dedup"] = replay.stream_semantic_dedup
ORACLES["stream_semantic_dedup"] = _semantic_contamination_oracle()

def _ann_recall_oracle(
    n_queries: int = 10, k: int = 10, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of similarity.ann_recall_profile: exact brute top-k per
    probe query vs the deterministic Rademacher bucket candidates."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, emb AS q_emb FROM b
              WHERE vec_id < {n_queries}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_dot_product(e.emb, q.q_emb)
                   / (sqrt(list_dot_product(e.emb, e.emb))
                      * sqrt(list_dot_product(q.q_emb, q.q_emb))) AS cos
            FROM b e CROSS JOIN q WHERE e.vec_id != q.query_id),
        truth AS (
            SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
                FROM scored)
            WHERE rank <= {k}),
        buck AS ({buck}),
        cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
            FROM buck qb JOIN buck cb
              ON qb.t = cb.t AND qb.bucket = cb.bucket
            WHERE qb.vec_id < {n_queries} AND cb.vec_id != qb.vec_id)
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_found,
               round(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS recall
        FROM truth t
        LEFT JOIN cand c
          ON t.query_id = c.query_id AND t.vec_id = c.vec_id
        GROUP BY t.query_id ORDER BY t.query_id
    """


QUERIES["item_pagerank_personalized"] = graph.item_pagerank_personalized
ORACLES["item_pagerank_personalized"] = _pagerank_oracle(personalized=True)

QUERIES["prefix_cache_savings"] = sourcetriage.prefix_cache_savings
ORACLES["prefix_cache_savings"] = """
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM documents
        WHERE doc_id % 10 = 0),
    pref AS (
        SELECT lang,
               md5(array_to_string(list_slice(toks, 1, 8), ' ')) AS prefix_fp,
               least(len(toks), 8) AS prefix_tokens,
               len(toks) AS n_tokens
        FROM (SELECT lang,
                     list_filter(string_split(text, ' '),
                                 x -> length(x) > 0) AS toks
              FROM corpus)),
    groups AS (
        SELECT lang, prefix_fp, count(*) AS n_docs,
               min(prefix_tokens) AS prefix_tokens,
               sum(n_tokens) AS group_tokens
        FROM pref GROUP BY lang, prefix_fp)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_prefix_groups,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_groups,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum((n_docs - 1) * prefix_tokens) AS BIGINT) AS saved_tokens,
           round(sum((n_docs - 1) * prefix_tokens) * 1.0
                 / sum(group_tokens), 6) AS saved_frac
    FROM groups GROUP BY lang ORDER BY lang
"""

QUERIES["packing_efficiency_sweep"] = curation.packing_efficiency_sweep
ORACLES["packing_efficiency_sweep"] = """
    SELECT * FROM (
        SELECT 128 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 128), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 128.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
        UNION ALL
        SELECT 256 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 256), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 256.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
        UNION ALL
        SELECT 512 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 512), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 512.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
    ) ORDER BY budget
"""

QUERIES["monthly_growth"] = analytics.monthly_growth
ORACLES["monthly_growth"] = """
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
    lagged AS (
        SELECT month, n_orders, cents,
               lag(cents) OVER (ORDER BY month) AS prev
        FROM monthly)
    SELECT month, n_orders,
           round(cents / 100.0, 2) AS revenue,
           round((cents - prev) / 100.0, 2) AS mom_delta,
           CASE WHEN prev IS NOT NULL
                THEN round((cents - prev) * 1.0 / prev, 6) END AS mom_growth
    FROM lagged ORDER BY month
"""

QUERIES["embedding_dim_profile"] = similarity.embedding_dim_profile
ORACLES["embedding_dim_profile"] = """
    WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    vals AS (
        SELECT unnest(range(0, len(emb))) AS pos, unnest(emb) AS v FROM b),
    per_dim AS (
        SELECT pos, count(*) AS n,
               sum(CAST(round(v * 1e9) AS BIGINT)) AS s1,
               sum(CAST(round(v * v * 1e12) AS BIGINT)) AS s2,
               sum(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS n_zero,
               min(v) AS mn, max(v) AS mx
        FROM vals GROUP BY pos)
    SELECT CAST(pos AS INT) AS dim,
           CAST(n AS BIGINT) AS n,
           round(s1 * 1.0 / n / 1e9, 6) AS mean,
           round(sqrt(greatest(
               s2 * 1.0 / n / 1e12
               - (s1 * 1.0 / n / 1e9) * (s1 * 1.0 / n / 1e9), 0.0)), 6)
               AS std,
           round(n_zero * 1.0 / n, 4) AS zero_frac,
           round(mn, 6) AS min_v,
           round(mx, 6) AS max_v
    FROM per_dim ORDER BY dim
"""

QUERIES["ann_recall_profile"] = similarity.ann_recall_profile
ORACLES["ann_recall_profile"] = _ann_recall_oracle()

QUERIES["centroid_confusion"] = similarity.centroid_confusion_matrix
ORACLES["centroid_confusion"] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT label, unnest(range(0, len(emb))) AS pos, unnest(emb) AS v
        FROM b),
    cent AS (SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos),
    packed AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM cent GROUP BY label),
    pairs AS (
        SELECT a.label AS label_a, b2.label AS label_b,
               round(list_dot_product(a.centroid, b2.centroid)
                     / (sqrt(list_dot_product(a.centroid, a.centroid))
                        * sqrt(list_dot_product(b2.centroid, b2.centroid))),
                     6) AS cos_sim
        FROM packed a JOIN packed b2 ON a.label < b2.label)
    SELECT label_a, label_b, cos_sim, cos_sim >= 0.90 AS confusable
    FROM pairs ORDER BY cos_sim DESC, label_a, label_b
"""

QUERIES["conversion_lag"] = analytics.conversion_lag
ORACLES["conversion_lag"] = """
    WITH fc AS (
        SELECT user_id, min(ts) AS first_click FROM events
        WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
        SELECT e.user_id,
               min(e.ts) AS first_purchase, min(fc.first_click) AS first_click
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
        GROUP BY e.user_id),
    lagged AS (
        SELECT CASE
                 WHEN epoch(first_purchase) - epoch(first_click) < 600
                     THEN 'a_lt_10m'
                 WHEN epoch(first_purchase) - epoch(first_click) < 3600
                     THEN 'b_lt_1h'
                 WHEN epoch(first_purchase) - epoch(first_click) < 21600
                     THEN 'c_lt_6h'
                 WHEN epoch(first_purchase) - epoch(first_click) < 86400
                     THEN 'd_lt_1d'
                 WHEN epoch(first_purchase) - epoch(first_click) < 604800
                     THEN 'e_lt_7d'
                 ELSE 'f_ge_7d' END AS lag_bucket
        FROM conv),
    counts AS (SELECT lag_bucket, CAST(count(*) AS BIGINT) AS n_users
               FROM lagged GROUP BY lag_bucket),
    t AS (SELECT sum(n_users) AS total FROM counts)
    SELECT lag_bucket, n_users,
           round(n_users * 1.0 / total, 6) AS share
    FROM counts CROSS JOIN t ORDER BY lag_bucket
"""

QUERIES["rolling_distinct_users"] = relational.rolling_distinct_users
ORACLES["rolling_distinct_users"] = """
    WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT day, count(*) AS n_events FROM ev GROUP BY day),
    spine AS (
        SELECT d.day,
               CAST((SELECT sum(n_events) FROM days d2
                     WHERE d2.day <= d.day
                       AND d2.day > d.day - 7) AS BIGINT) AS n_events_7d,
               CAST((SELECT count(DISTINCT e.user_id) FROM ev e
                     WHERE e.day <= d.day
                       AND e.day > d.day - 7) AS BIGINT) AS n_users_7d
        FROM days d)
    SELECT strftime(day, '%Y-%m-%d') AS day, n_events_7d, n_users_7d,
           TRUE AS approx_users_ok
    FROM spine ORDER BY day
"""

QUERIES["fuzzy_name_matches"] = dedup.fuzzy_name_matches
ORACLES["fuzzy_name_matches"] = """
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    banded AS (
        SELECT DISTINCT p_name, n_parts, band FROM (
            SELECT p_name, n_parts,
                   unnest([CAST(floor(length(p_name) / 3) AS BIGINT),
                           CAST(floor(length(p_name) / 3) AS BIGINT) + 1])
                       AS band
            FROM names)),
    cand AS (
        SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
               a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist,
           n_parts_a, n_parts_b
    FROM cand WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY dist, name_a, name_b LIMIT 50
"""

QUERIES["gap_filled_daily"] = relational.gap_filled_daily
ORACLES["gap_filled_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(round(value * 1000000) AS BIGINT)) AS micros
        FROM events GROUP BY 1, 2),
    bounds AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
               FROM events),
    spine AS (
        SELECT t.event_type, CAST(gs.day AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN bounds
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(bounds.d0, bounds.d1,
                                          INTERVAL 1 DAY)) AS day) gs)
    SELECT s.event_type,
           strftime(s.day, '%Y-%m-%d') AS day,
           CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
           round(coalesce(d.micros, 0) / 1000000.0, 4) AS total_value,
           d.n_events IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    ORDER BY s.event_type, s.day
"""

QUERIES["ab_test_lift"] = analytics.ab_test_lift
ORACLES["ab_test_lift"] = """
    WITH per_user AS (
        SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                         % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS micros
        FROM events GROUP BY 1, 2)
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(sum(converted) * 1.0 / count(*), 6) AS conversion_rate,
           round(sum(micros) * 1.0 / count(*) / 1000000.0, 4)
               AS value_per_user
    FROM per_user GROUP BY arm ORDER BY arm
"""

QUERIES["pareto_curve"] = analytics.pareto_curve
ORACLES["pareto_curve"] = """
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_partkey),
    ranked AS (
        SELECT cents,
               percent_rank() OVER (ORDER BY cents, l_partkey) AS pr
        FROM per_part),
    bands AS (
        SELECT CAST(least(floor((1.0 - pr) * 10), 9) AS INT) AS band,
               count(*) AS n_items, sum(cents) AS band_cents
        FROM ranked GROUP BY 1),
    t AS (SELECT sum(band_cents) AS total FROM bands)
    SELECT band,
           CAST(n_items AS BIGINT) AS n_items,
           round(band_cents / 100.0, 2) AS band_revenue,
           round(band_cents * 1.0 / total, 6) AS revenue_share,
           round(sum(band_cents) OVER (ORDER BY band
                     ROWS UNBOUNDED PRECEDING) * 1.0 / total, 6)
               AS cumulative_share
    FROM bands CROSS JOIN t ORDER BY band
"""

QUERIES["psi_drift"] = quality.psi_drift
ORACLES["psi_drift"] = """
    WITH u AS (
        SELECT o_orderkey, o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    newsnap AS (
        SELECT CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_totalprice FROM u WHERE u_new < 0.01),
    ranked AS (
        SELECT o_totalprice,
               percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        FROM orders),
    eb AS (SELECT least(floor(pr * 10), 9) AS b, max(o_totalprice) AS e
           FROM ranked GROUP BY 1 HAVING least(floor(pr * 10), 9) < 9),
    edges AS (SELECT list(e ORDER BY e) AS arr FROM eb),
    oc AS (SELECT len(list_filter(edges.arr, x -> x < o_totalprice)) AS bucket,
                  count(*) AS n_old
           FROM orders CROSS JOIN edges
           GROUP BY 1),
    nc AS (SELECT len(list_filter(edges.arr, x -> x < o_totalprice)) AS bucket,
                  count(*) AS n_new
           FROM newsnap CROSS JOIN edges
           GROUP BY 1),
    j AS (SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
                 coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
          FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket),
    t AS (SELECT sum(n_old) AS so, sum(n_new) AS sn FROM j)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           round(greatest(n_old * 1.0 / so, 1e-9), 6) AS p_old,
           round(greatest(n_new * 1.0 / sn, 1e-9), 6) AS p_new,
           round((greatest(n_old * 1.0 / so, 1e-9)
                  - greatest(n_new * 1.0 / sn, 1e-9))
                 * ln(greatest(n_old * 1.0 / so, 1e-9)
                      / greatest(n_new * 1.0 / sn, 1e-9)), 8) AS psi_term
    FROM j CROSS JOIN t ORDER BY bucket
"""

QUERIES["forget_users_plan"] = maintenance.forget_users_plan
ORACLES["forget_users_plan"] = """
    WITH cohort AS (
        SELECT c_custkey FROM customer
        WHERE ('0x' || substr(md5('forget:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                  / 4294967296.0 < 0.02),
    doomed_orders AS (
        SELECT o.o_orderkey FROM orders o
        JOIN cohort ON o.o_custkey = cohort.c_custkey)
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM cohort) AS BIGINT) AS n_to_delete
        UNION ALL
        SELECT 'events',
               CAST((SELECT count(*) FROM events) AS BIGINT),
               CAST((SELECT count(*) FROM events e
                     JOIN cohort ON e.user_id = cohort.c_custkey) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     JOIN doomed_orders d ON l.l_orderkey = d.o_orderkey)
                    AS BIGINT)
        UNION ALL
        SELECT 'orders',
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               CAST((SELECT count(*) FROM doomed_orders) AS BIGINT)) t(table_name, n_rows, n_to_delete)
"""
ORACLES["forget_users_plan"] = (
    "SELECT table_name, n_rows, n_to_delete, "
    "CAST(n_rows - n_to_delete AS BIGINT) AS n_after FROM ("
    + ORACLES["forget_users_plan"]
    + ") ORDER BY table_name"
)

QUERIES["event_transitions"] = analytics.event_transitions
ORACLES["event_transitions"] = """
    WITH steps AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM steps WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type),
    tot AS (SELECT sum(n_transitions) AS total FROM counts)
    SELECT from_type, to_type, n_transitions,
           round(n_transitions * 1.0 / total, 6) AS transition_share
    FROM counts CROSS JOIN tot
    ORDER BY n_transitions DESC, from_type, to_type
    LIMIT 25
"""

QUERIES["backfill_plan"] = snapshot.backfill_plan
ORACLES["backfill_plan"] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS part,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    oldsnap AS (
        SELECT part, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM u),
    newsnap AS (
        SELECT part, o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT part, o_orderkey + 1000000000, o_custkey, o_orderstatus,
               o_totalprice
        FROM u WHERE u_new < 0.01),
    od AS (
        SELECT part, count(*) AS n_rows,
               bit_xor(('0x' || substr(sha256(
                   concat_ws(chr(31),
                       coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_custkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_orderstatus AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_totalprice AS VARCHAR), chr(1) || '<null>'))),
                   1, 15))::BIGINT) AS digest
        FROM oldsnap GROUP BY part),
    nd AS (
        SELECT part, count(*) AS n_rows,
               bit_xor(('0x' || substr(sha256(
                   concat_ws(chr(31),
                       coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_custkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_orderstatus AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_totalprice AS VARCHAR), chr(1) || '<null>'))),
                   1, 15))::BIGINT) AS digest
        FROM newsnap GROUP BY part)
    SELECT coalesce(od.part, nd.part) AS part,
           CAST(coalesce(od.n_rows, 0) AS BIGINT) AS n_rows_old,
           CAST(coalesce(nd.n_rows, 0) AS BIGINT) AS n_rows_new,
           CASE WHEN od.part IS NULL THEN 'added'
                WHEN nd.part IS NULL THEN 'removed'
                WHEN od.digest != nd.digest
                     OR od.n_rows != nd.n_rows THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM od FULL OUTER JOIN nd ON od.part = nd.part
    ORDER BY part
"""

QUERIES["multi_touch_attribution"] = analytics.multi_touch_attribution
ORACLES["multi_touch_attribution"] = """
    WITH purch AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts,
               CAST(round(value * 1000000) AS BIGINT) AS p_micros
        FROM events WHERE event_type = 'purchase'),
    clicks AS (
        SELECT user_id, ts AS c_ts, strftime(ts, '%Y-%m-%d') AS click_day
        FROM events WHERE event_type = 'click'),
    touched AS (
        SELECT p.purchase_id, p.p_micros, c.click_day
        FROM purch p JOIN clicks c ON p.user_id = c.user_id
        WHERE c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 7 DAY),
    credited AS (
        SELECT click_day, purchase_id,
               CAST(round(p_micros * 1.0 / count(*) OVER (PARTITION BY purchase_id))
                    AS BIGINT) AS credit_micros
        FROM touched)
    SELECT click_day,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           round(sum(credit_micros) / 1000000.0, 4) AS credited_value
    FROM credited GROUP BY click_day ORDER BY click_day
"""

QUERIES["decayed_popularity"] = analytics.decayed_popularity
ORACLES["decayed_popularity"] = """
    WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(pow(0.5,
                 ((epoch(now_ts) - epoch(ts)) / 86400.0) / 7.0) * 1e9)
                 AS BIGINT)) / 1e9, 4) AS decayed_score
    FROM events CROSS JOIN now_t
    GROUP BY event_type ORDER BY event_type
"""

QUERIES["kfold_assignment"] = analytics.kfold_assignment
ORACLES["kfold_assignment"] = """
    SELECT CAST(('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                % 5 AS INT) AS fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
               AS total_value
    FROM events GROUP BY fold ORDER BY fold
"""

QUERIES["schema_drift_report"] = quality.schema_drift_report
ORACLES["schema_drift_report"] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    newsnap AS (
        SELECT o_custkey, o_orderstatus, o_orderpriority,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM u WHERE u_new < 0.01),
    old_p AS (
        SELECT * FROM (
            SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
                   count(o_custkey) AS nn, count(DISTINCT o_custkey) AS nd
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*), count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM orders)),
    new_p AS (
        SELECT * FROM (
            SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
                   count(o_custkey) AS nn, count(DISTINCT o_custkey) AS nd
            FROM newsnap
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM newsnap
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM newsnap
            UNION ALL
            SELECT 'o_totalprice', count(*), count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM newsnap))
    SELECT o.col_name,
           CAST(o.n_rows AS BIGINT) AS n_rows_old,
           CAST(n.n_rows AS BIGINT) AS n_rows_new,
           CAST(o.nn AS BIGINT) AS n_nonnull_old,
           CAST(n.nn AS BIGINT) AS n_nonnull_new,
           CAST(o.nd AS BIGINT) AS n_distinct_old,
           CAST(n.nd AS BIGINT) AS n_distinct_new,
           CAST(n.nd - o.nd AS BIGINT) AS distinct_delta
    FROM old_p o JOIN new_p n USING (col_name)
    ORDER BY o.col_name
"""

QUERIES["negative_samples"] = _negative_samples
ORACLES["negative_samples"] = """
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    n AS (SELECT max(l_partkey) AS n_items FROM lineitem),
    slots AS (
        SELECT u.user_id, s.slot, n.n_items
        FROM (SELECT DISTINCT user_id FROM pos) u
        CROSS JOIN n
        CROSS JOIN (SELECT unnest(range(0, 6)) AS slot) s),
    cand AS (
        SELECT user_id, slot,
               ('0x' || substr(md5('neg:' || CAST(user_id AS VARCHAR)
                    || ':' || CAST(slot AS VARCHAR)), 1, 8))::BIGINT
                   % n_items + 1 AS item_id
        FROM slots),
    neg AS (
        SELECT c.user_id, c.slot, c.item_id
        FROM cand c LEFT JOIN pos p USING (user_id, item_id)
        WHERE p.user_id IS NULL),
    ranked AS (
        SELECT user_id, slot, item_id,
               row_number() OVER (PARTITION BY user_id ORDER BY slot) AS rn
        FROM neg)
    SELECT user_id, CAST(slot AS INT) AS slot, item_id
    FROM ranked WHERE rn <= 3 ORDER BY user_id, slot LIMIT 500
"""

QUERIES["pit_segment_rollup"] = asof.pit_segment_rollup
ORACLES["pit_segment_rollup"] = """
    WITH c AS (
        SELECT c_custkey, c_mktsegment,
               ('0x' || substr(md5('scd:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 < 0.3 AS changed
        FROM customer),
    o AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
    j AS (SELECT CASE WHEN c.changed AND o.order_day >= '1996-01-01'
                      THEN c.c_mktsegment || '_V2'
                      ELSE c.c_mktsegment END AS segment,
                 o.o_custkey, o.cents
          FROM o JOIN c ON o.o_custkey = c.c_custkey)
    SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(sum(cents) / 100.0, 2) AS total_spend
    FROM j GROUP BY segment ORDER BY segment
"""

QUERIES["incremental_agg_merge"] = snapshot.incremental_agg_profile
ORACLES["incremental_agg_merge"] = """
    SELECT event_type,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
               AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["hll_daily_rollup"] = relational.hll_daily_rollup
ORACLES["hll_daily_rollup"] = """
    SELECT event_type,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS approx_users_ok
    FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["dedup_keep_best"] = text.dedup_keep_best
ORACLES["dedup_keep_best"] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, upper(text) FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' !!!' FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 3000000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        FROM documents WHERE doc_id % 10 = 0
    ),
    scored AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_fp,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and')))
                       * 1.0 / len(string_split(text, ' ')), 4) AS quality
        FROM corpus),
    ranked AS (
        SELECT norm_fp, doc_id, quality,
               row_number() OVER (PARTITION BY norm_fp
                                  ORDER BY quality DESC, doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY norm_fp) AS n_docs
        FROM scored)
    SELECT norm_fp, CAST(n_docs AS BIGINT) AS n_docs, doc_id AS winner_id,
           round(quality, 4) AS winner_quality
    FROM ranked WHERE rn = 1 AND n_docs >= 2
    ORDER BY n_docs DESC, norm_fp
    LIMIT 100
"""

# --------------------------------------------------------------------------
# Production-form twins of the gate-only heavyweights (round 7): same
# output and SAME ORACLE as their gate forms, but reading shared
# persisted state (the persist_shared CC labeling / the prepared ANN
# index) instead of reconstructing it per query — so the bench artifact
# finally records the marginal cost production pays, not the gate-form
# state reconstruction BENCH_NOTES kept having to explain away.
QUERIES["source_dup_attribution_reused"] = (
    sourcetriage.source_dup_attribution_reused
)
ORACLES["source_dup_attribution_reused"] = ORACLES["source_dup_attribution"]
QUERIES["cluster_aware_split_reused"] = curation.cluster_aware_split_reused
ORACLES["cluster_aware_split_reused"] = ORACLES["cluster_aware_split"]
QUERIES["incremental_components_fold"] = dedup.incremental_components_fold
ORACLES["incremental_components_fold"] = ORACLES["incremental_components"]
# round 8: the remaining two CC-family consumers get the same reuse
# contract, so the bench headline stops re-measuring the identical
# labeling build four times (VERDICT r7 task #2)
QUERIES["near_dup_clusters_reused"] = dedup.near_dup_clusters_reused
ORACLES["near_dup_clusters_reused"] = ORACLES["near_dup_clusters"]
QUERIES["split_source_audit_reused"] = curation.split_source_audit_reused
ORACLES["split_source_audit_reused"] = ORACLES["split_source_audit"]


def _semdedup_oracle(
    n_cells: int = 8,
    n_iters: int = 2,
    threshold: float = 0.40,
    max_cell: int = 4096,
) -> str:
    """SQL twin of functions.similarity.semdedup_profile: the shared
    Lloyd prefix, then within-cell pairwise cosine at 6 dp and the
    keep-min-id drop rule.  The pair join never crosses cells and skips
    cells larger than ``max_cell`` (kept whole) — identical to the
    Spark plan's degenerate-cell cap."""
    cos_ab = (
        "round(list_dot_product(ea.emb, eb.emb)"
        " / (sqrt(list_dot_product(ea.emb, ea.emb))"
        " * sqrt(list_dot_product(eb.emb, eb.emb))), 6)"
    )
    return f"""
        {_lloyd_prefix_sql(n_cells, n_iters)},
        sizes AS (
            SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
            FROM cells GROUP BY cell),
        eligible AS (
            SELECT c.cell, c.vec_id, e.emb
            FROM cells c
            JOIN e ON e.vec_id = c.vec_id
            JOIN sizes s ON s.cell = c.cell
            WHERE s.n_vecs <= {max_cell}),
        dropped AS (
            SELECT DISTINCT ea.cell, eb.vec_id
            FROM eligible ea
            JOIN eligible eb
              ON ea.cell = eb.cell AND ea.vec_id < eb.vec_id
            WHERE {cos_ab} >= {threshold}),
        drops AS (
            SELECT cell, CAST(count(*) AS BIGINT) AS n_dropped
            FROM dropped GROUP BY cell)
        SELECT s.cell,
               s.n_vecs,
               COALESCE(d.n_dropped, 0) AS n_dropped,
               s.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept,
               round((s.n_vecs - COALESCE(d.n_dropped, 0))
                     / CAST(s.n_vecs AS DOUBLE), 6) AS kept_frac
        FROM sizes s LEFT JOIN drops d ON d.cell = s.cell
        ORDER BY s.cell
    """


# SemDeDup-style embedding-cluster dedup (round 8): k-means via the
# oracle-pinned fixed-point Lloyd kernel, pairwise cosine ONLY within a
# cell (Σc² never n²), keep-min-id drop rule — the semantic tier of the
# dedup family beside exact (sha2), lexical (minhash/simhash), and span
# dedup.
QUERIES["semdedup_profile"] = similarity.semdedup_profile
ORACLES["semdedup_profile"] = _semdedup_oracle()

# URL/domain-level quota dedup (round 8): deterministic synthetic
# registrable domains (md5-uniform² of the PK — Zipf-ish heavy head),
# per-domain md5-rank cap where the Spark plan windows ONLY the
# over-quota domains; the oracle's flat QUALIFY form is equivalent
# because under-quota ranks never exceed the cap.
QUERIES["domain_quota_sample"] = curation.domain_quota_sample
ORACLES["domain_quota_sample"] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    ranked AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT domain_idx) AS BIGINT) AS n_domains,
           CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rk > 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM ranked
    GROUP BY source
    ORDER BY source
"""

# k-anonymity audit (round 8): quasi-identifier group sizes over the
# release-metadata columns — two aggregations, no windows/joins.
QUERIES["k_anonymity_profile"] = quality.k_anonymity_profile
ORACLES["k_anonymity_profile"] = """
    WITH g AS (
        SELECT lang, source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
               CAST(count(*) AS BIGINT) AS group_size
        FROM documents
        GROUP BY lang, source, floor(n_chars / 100))
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_at_risk,
           round(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                 / CAST(sum(group_size) AS DOUBLE), 6) AS risk_frac,
           CAST(min(group_size) AS BIGINT) AS min_group
    FROM g
    GROUP BY source
    ORDER BY source
"""

# Streaming per-domain quota (round 8): keyed per-domain state admits
# FCFS across a deterministic micro-batch SEQUENCE (n_waves files,
# maxFilesPerTrigger=1) — admission order is (wave, md5, doc_id), which
# one ranked window replays in SQL.
QUERIES["stream_domain_quota"] = replay.stream_domain_quota
ORACLES["stream_domain_quota"] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    ranked AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY doc_id % 3,
                            md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_admitted,
           CAST(sum(CASE WHEN rk > 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rejected
    FROM ranked
    GROUP BY source
    ORDER BY source
"""

# Incremental per-domain quota (round 8): today's batch admitted FCFS
# against yesterday's persisted per-domain counts — O(batch) + one
# broadcast state join, never a corpus rescan.
QUERIES["incremental_domain_quota"] = curation.incremental_domain_quota
ORACLES["incremental_domain_quota"] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    state AS (
        SELECT domain_idx,
               CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
                   AS prior_admitted
        FROM (
            SELECT domain_idx,
                   row_number() OVER (
                       PARTITION BY domain_idx
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM dom WHERE doc_id % 7 <> 0)
        GROUP BY domain_idx),
    batch AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom WHERE doc_id % 7 = 0),
    j AS (
        SELECT b.source, b.domain_idx,
               COALESCE(s.prior_admitted, 0) AS prior_admitted,
               CASE WHEN COALESCE(s.prior_admitted, 0) + b.rk <= 20
                    THEN 1 ELSE 0 END AS admit
        FROM batch b LEFT JOIN state s ON s.domain_idx = b.domain_idx)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(admit) AS BIGINT) AS n_admitted,
           CAST(sum(1 - admit) AS BIGINT) AS n_rejected,
           CAST(count(DISTINCT CASE WHEN prior_admitted >= 20
                                    THEN domain_idx END) AS BIGINT)
               AS n_saturated_domains
    FROM j
    GROUP BY source
    ORDER BY source
"""
QUERIES["stream_semantic_dedup_probe"] = replay.stream_semantic_dedup_probe
ORACLES["stream_semantic_dedup_probe"] = ORACLES["stream_semantic_dedup"]

# Streaming CDC apply (round 7): the changelog collapsed to the current
# view INSIDE the stream (keyed max_by aggregation, complete-mode
# replay) — must land on the identical current state, so the batch
# oracle is shared verbatim.
QUERIES["stream_cdc_current"] = replay.stream_cdc_current
ORACLES["stream_cdc_current"] = ORACLES["cdc_current_view"]

# Two-stage retrieval with cross-encoder-style rerank (round 7): exact
# cosine shortlist (top-25/query), then a richer deterministic pairwise
# scorer over the bounded candidate set — 0.7·cos + 0.2·sign-agreement
# + 0.1/(1+L2), every term an index-ordered HOF reduction both engines
# replay identically (the knn_multi_query FP discipline).
QUERIES["ann_rerank"] = similarity.ann_rerank
ORACLES["ann_rerank"] = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < 5),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT query_id, vec_id, emb, q_emb,
               round(list_dot_product(emb, q_emb)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(q_emb, q_emb))), 6) AS cos_sim
        FROM e CROSS JOIN q WHERE vec_id != query_id),
    short AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored),
    rr AS (
        SELECT query_id, vec_id, cos_sim,
               round(0.7 * cos_sim
                     + 0.2 * (list_sum(list_transform(range(0, len(emb)),
                           i -> CASE WHEN emb[i + 1] * q_emb[i + 1] > 0
                                     THEN 1.0 ELSE 0.0 END)) / len(emb))
                     + 0.1 / (1 + sqrt(list_sum(list_transform(range(0, len(emb)),
                           i -> (emb[i + 1] - q_emb[i + 1])
                                * (emb[i + 1] - q_emb[i + 1]))))), 6)
                   AS rerank_score
        FROM short WHERE rnk <= 25)
    SELECT query_id, vec_id, cos_sim, rerank_score,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY rerank_score DESC, vec_id) AS INTEGER) AS final_rank
    FROM rr
    QUALIFY final_rank <= 5
    ORDER BY query_id, final_rank
"""

# Mergeable quantile-sketch layer (round 7): DDSketch-style log-spaced
# buckets (γ=1.02), per-day counts merged by keyed sum, p50/p90/p99
# estimates next to exact order statistics + within-budget booleans —
# the approx_profile invariant recipe; the oracle replays the sketch
# arithmetic (same 6-dp-rounded ln ratio) and emits literal TRUEs.
QUERIES["ddsketch_quantile_rollup"] = relational.ddsketch_quantile_rollup
ORACLES["ddsketch_quantile_rollup"] = """
    WITH ev AS (
        SELECT event_type, value, event_id FROM events WHERE value > 0),
    bk AS (
        SELECT event_type,
               CAST(ceil(round(ln(value) / ln(1.02), 6)) AS BIGINT) AS b
        FROM ev),
    merged AS (
        SELECT event_type, b, count(*) AS n FROM bk GROUP BY 1, 2),
    cum AS (
        SELECT event_type, b,
               sum(n) OVER (PARTITION BY event_type ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM merged),
    sk AS (
        SELECT event_type,
               CAST(max(total) AS BIGINT) AS n_events,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.5 * total)
                                              THEN b END)) / 2.02, 6) AS p50_est,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.9 * total)
                                              THEN b END)) / 2.02, 6) AS p90_est,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.99 * total)
                                              THEN b END)) / 2.02, 6) AS p99_est
        FROM cum GROUP BY event_type),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
    exact AS (
        SELECT event_type,
               min(CASE WHEN rn = ceil(0.5 * n) THEN value END) AS p50_exact,
               min(CASE WHEN rn = ceil(0.9 * n) THEN value END) AS p90_exact,
               min(CASE WHEN rn = ceil(0.99 * n) THEN value END) AS p99_exact
        FROM ranked GROUP BY event_type)
    SELECT sk.event_type, n_events, p50_est, p90_est, p99_est,
           p50_exact, p90_exact, p99_exact,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM sk JOIN exact USING (event_type)
    ORDER BY sk.event_type
"""

# Streaming twin of the quantile-sketch layer (round 7): per (1-day
# event-time window, type) bucket counts maintained by the stream,
# quantiles walked post-sink; the oracle replays the identical bucket
# arithmetic per calendar day (tumbling 1-day windows align to UTC
# midnight, so strftime grouping matches exactly).
QUERIES["stream_value_quantiles"] = replay.stream_value_quantiles
ORACLES["stream_value_quantiles"] = """
    WITH ev AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value
        FROM events WHERE value > 0),
    bk AS (
        SELECT day, event_type,
               CAST(ceil(round(ln(value) / ln(1.02), 6)) AS BIGINT) AS b
        FROM ev),
    merged AS (
        SELECT day, event_type, b, count(*) AS n FROM bk GROUP BY 1, 2, 3),
    cum AS (
        SELECT day, event_type, b,
               sum(n) OVER (PARTITION BY day, event_type ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY day, event_type) AS total
        FROM merged)
    SELECT day, event_type,
           CAST(max(total) AS BIGINT) AS n_events,
           round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.5 * total)
                                          THEN b END)) / 2.02, 6) AS p50_est,
           round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.95 * total)
                                          THEN b END)) / 2.02, 6) AS p95_est
    FROM cum GROUP BY day, event_type
    ORDER BY day, event_type
"""

# Partition-scoped copy-on-write MERGE (round 7): the SURVEY §7.4.2 gap
# without a table format — the oracle replays the upsert (latest-wins ∪
# untouched) in SQL, so the hash match proves the write path rewrote
# exactly the touched partitions' content.
QUERIES["merge_upsert_profile"] = maintenance.merge_upsert_profile
ORACLES["merge_upsert_profile"] = """
    WITH o AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS part,
               ('0x' || substr(md5('merge-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_upd,
               ('0x' || substr(md5('merge-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    final AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN u_upd < 0.05
                    THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice,
               part
        FROM o
        UNION ALL
        SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice, part
        FROM o WHERE u_new < 0.01)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT part) AS BIGINT) AS n_parts,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_price
    FROM final
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

# Distributed BPE vocabulary induction (round 7): the first-merge pair
# counting kernel of tokenizer training — the part that needs a cluster;
# the oracle replays the word-frequency pass and the per-word adjacent
# pair explosion with the identical weighting.
QUERIES["bpe_pair_counts"] = text.bpe_pair_counts
ORACLES["bpe_pair_counts"] = """
    WITH words AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2
        GROUP BY w),
    pairs AS (
        SELECT w, freq,
               substring(w, i, 1) AS sym_a,
               substring(w, i + 1, 1) AS sym_b
        FROM words, unnest(range(1, length(w))) AS t(i))
    SELECT sym_a, sym_b,
           CAST(sum(freq) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words
    FROM pairs
    GROUP BY sym_a, sym_b
    ORDER BY n_pairs DESC, sym_a, sym_b
    LIMIT 50
"""

# Rerank-uplift evaluation (round 7): overlap@k / top-1 stability /
# mean rank shift between the bi-encoder and reranked top-k, replayed
# from the same two deterministic rankings.
QUERIES["rerank_uplift_profile"] = similarity.rerank_uplift_profile
ORACLES["rerank_uplift_profile"] = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < 5),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT query_id, vec_id, emb, q_emb,
               round(list_dot_product(emb, q_emb)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(q_emb, q_emb))), 6) AS cos_sim
        FROM e CROSS JOIN q WHERE vec_id != query_id),
    short AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS cos_rank
        FROM scored
        QUALIFY cos_rank <= 25),
    rr AS (
        SELECT query_id, vec_id, cos_rank,
               round(0.7 * cos_sim
                     + 0.2 * (list_sum(list_transform(range(0, len(emb)),
                           i -> CASE WHEN emb[i + 1] * q_emb[i + 1] > 0
                                     THEN 1.0 ELSE 0.0 END)) / len(emb))
                     + 0.1 / (1 + sqrt(list_sum(list_transform(range(0, len(emb)),
                           i -> (emb[i + 1] - q_emb[i + 1])
                                * (emb[i + 1] - q_emb[i + 1]))))), 6)
                   AS rerank_score
        FROM short),
    ranked AS (
        SELECT query_id, vec_id, cos_rank,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rerank_score DESC, vec_id) AS final_rank
        FROM rr)
    SELECT query_id,
           CAST(sum(CASE WHEN cos_rank <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS overlap_at_k,
           max(CASE WHEN final_rank = 1 THEN cos_rank = 1 END) AS top1_same,
           round(avg(abs(cos_rank - final_rank)), 4) AS mean_rank_shift
    FROM ranked WHERE final_rank <= 5
    GROUP BY query_id ORDER BY query_id
"""

# Watermark late-data drop audit (round 7): the oracle replays the
# watermark arithmetic — final watermark = max on-time ts − 3 days,
# append emits exactly the windows that closed, the 40-day-late copy is
# dropped in full (its windows closed ~37 days before arrival).
QUERIES["stream_late_data_audit"] = replay.stream_late_data_audit
ORACLES["stream_late_data_audit"] = """
    WITH mx AS (SELECT max(ts) AS max_ts FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_on_time,
           CAST(sum(CASE WHEN date_trunc('day', ts) + INTERVAL 1 DAY
                              <= max_ts - INTERVAL 3 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted,
           CAST(sum(CASE WHEN date_trunc('day', ts) + INTERVAL 1 DAY
                              > max_ts - INTERVAL 3 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_withheld,
           CAST(count(*) AS BIGINT) AS n_dropped_late
    FROM events CROSS JOIN mx
    GROUP BY event_type ORDER BY event_type
"""

# Streaming CDC merge sink (round 7): the changelog replays as a stream
# and lands through foreachBatch → merge_apply_changelog (copy-on-write
# upsert+delete into the partitioned table); the post-replay table must
# equal the batch current-view collapse — oracle shared verbatim.
QUERIES["stream_merge_apply"] = maintenance.stream_merge_apply_profile
ORACLES["stream_merge_apply"] = ORACLES["cdc_current_view"]

# Peak concurrency per event type (round 7): interval sweep-line made
# scale-out by day-splitting — each interval explodes to the (≤2) days it
# touches, clipped, and the +1/−1 sweep runs per (event_type, day), so no
# single-reducer global sort; integer-microsecond arithmetic on both
# engines, −1-before-+1 ties so touching intervals never count together.
QUERIES["concurrent_events_peak"] = analytics.concurrent_events_peak
ORACLES["concurrent_events_peak"] = """
    WITH ev AS (
        SELECT event_type,
               epoch_us(ts) AS start_us,
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS end_us
        FROM events
        WHERE CAST(round(value * 1000000) AS BIGINT) > 0),
    pieces AS (
        SELECT event_type, day,
               greatest(start_us, day * 86400000000) AS lo,
               least(end_us, (day + 1) * 86400000000) AS hi
        FROM ev,
             unnest(range(CAST(floor(start_us / 86400000000.0) AS BIGINT),
                          CAST(floor((end_us - 1) / 86400000000.0) AS BIGINT)
                          + 1)) AS t(day)),
    edges AS (
        SELECT event_type, day, lo AS t, 1 AS delta FROM pieces
        UNION ALL
        SELECT event_type, day, hi AS t, -1 AS delta FROM pieces),
    sweep AS (
        SELECT event_type, day,
               sum(delta) OVER (PARTITION BY event_type, day
                                ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM edges),
    day_peaks AS (
        SELECT event_type, day, max(running) AS day_peak
        FROM sweep GROUP BY event_type, day),
    best AS (
        SELECT event_type,
               CAST(day_peak AS BIGINT) AS peak_concurrent,
               CAST(day AS BIGINT) AS peak_epoch_day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day_peak DESC, day) AS rn
        FROM day_peaks),
    totals AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals
        FROM events GROUP BY event_type)
    SELECT b.event_type, t.n_intervals, b.peak_concurrent, b.peak_epoch_day
    FROM best b JOIN totals t ON b.event_type = t.event_type
    WHERE rn = 1
    ORDER BY b.event_type
"""

# Inter-annotator agreement (round 7): Cohen's kappa between the seeded
# labels and their noise-mutated copy — one equi-join on the row key, four
# map-side-combined BIGINT confusion cells, ratios derived from identical
# integers on both engines.
QUERIES["label_agreement_kappa"] = quality.label_agreement_kappa
ORACLES["label_agreement_kappa"] = """
    WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
    u AS (
        SELECT row_id,
               ('0x' || substr(md5('42:tier:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
               ('0x' || substr(md5('42:truth:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
        FROM base),
    t AS (
        SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                       WHEN u_tier < 0.7 THEN 'mid'
                       ELSE 'low' END AS tier
        FROM u),
    gen AS (
        SELECT CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                   WHEN 'mid' THEN 0.60
                                                   ELSE 0.30 END)
                    THEN 0 ELSE 1 END AS INTEGER) AS truth,
               CAST(1700000000 + row_id AS BIGINT) AS event_ts
        FROM t),
    m AS (
        SELECT truth AS label_a,
               CASE WHEN ('0x' || substr(md5('7:sample:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.10
                         AND ('0x' || substr(md5('7:flip:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.05
                    THEN 1 - truth ELSE truth END AS label_b
        FROM gen),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN label_a = 0 AND label_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
               CAST(sum(CASE WHEN label_a = 0 AND label_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(sum(CASE WHEN label_a = 1 AND label_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(sum(CASE WHEN label_a = 1 AND label_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        FROM m)
    SELECT n, n00, n01, n10, n11,
           round((n00 + n11) * 1.0 / n, 6) AS p_observed,
           round(((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                 * 1.0 / (n * n), 6) AS p_expected,
           round(((n00 + n11) * 1.0 / n
                  - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                    * 1.0 / (n * n))
                 / (1.0 - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                          * 1.0 / (n * n)), 6) AS kappa
    FROM agg
"""

# BM25 lexical retrieval baseline (round 7): the top-3 corpus terms each
# rank the corpus; postings-join shape, exact-integer length norm, the
# one libm call (ln) protected by ranking on the 6-dp-rounded score.
QUERIES["bm25_scores"] = text.bm25_scores
ORACLES["bm25_scores"] = """
    WITH toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY term),
    q AS (SELECT term, doc_freq FROM dft
          ORDER BY total_tf DESC, term LIMIT 3),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
    scored AS (
        SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    ranked AS (
        SELECT term AS query_term, doc_id, tf, dl, bm25,
               row_number() OVER (PARTITION BY term
                                  ORDER BY bm25 DESC, doc_id) AS rk
        FROM scored)
    SELECT query_term, CAST(rk AS INT) AS rk, doc_id, tf, dl, bm25
    FROM ranked WHERE rk <= 10
    ORDER BY query_term, rk
"""

# Vocabulary coverage curve (round 7): token mass covered by a top-k
# vocabulary for doubling k — tokenizer capacity planning; exact global
# frequency rank via the range-shuffle recipe, never a vocab-wide sort.
QUERIES["vocab_coverage_curve"] = text.vocab_coverage_curve
ORACLES["vocab_coverage_curve"] = """
    WITH vocab AS (
        SELECT w AS term, CAST(count(*) AS BIGINT) AS mass
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY w),
    ranked AS (
        SELECT term, mass,
               row_number() OVER (ORDER BY mass DESC, term) AS rk
        FROM vocab),
    t AS (SELECT CAST(sum(mass) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS vocab_size
          FROM vocab),
    ks AS (SELECT CAST(power(2, i) AS BIGINT) AS k
           FROM range(0, 6) AS u(i)),
    cov AS (
        SELECT ks.k, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(mass) AS BIGINT) AS covered_tokens
        FROM ranked JOIN ks ON ranked.rk <= ks.k
        GROUP BY ks.k)
    SELECT k, n_terms, covered_tokens, total_tokens, vocab_size,
           round(covered_tokens / total_tokens, 6) AS coverage
    FROM cov CROSS JOIN t ORDER BY k
"""

# Triangle counting (round 7): degree-ordered orientation — each
# triangle generated exactly once as an oriented wedge closed by the
# oriented third edge (O(m^1.5) bound); oracle uses the equivalent
# id-ordered enumeration over the a<b edge set (same triangle set).
QUERIES["item_triangles"] = graph.item_triangles
ORACLES["item_triangles"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM und e1
        JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN und e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
    corners AS (
        SELECT x AS l_partkey FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri),
    per_node AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY l_partkey),
    t AS (SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri)
    SELECT l_partkey, n_triangles, total_triangles
    FROM per_node CROSS JOIN t
    ORDER BY n_triangles DESC, l_partkey
    LIMIT 20
"""

# Count-min heavy hitters (round 7): the frequency member of the
# mergeable-sketch family — daily depth×width counter grid, rollups by
# cell sums, min-over-rows point estimates; md5-derived buckets so the
# whole sketch replays bit-for-bit in SQL.
QUERIES["cms_heavy_hitters"] = relational.cms_heavy_hitters
ORACLES["cms_heavy_hitters"] = """
    WITH li AS (SELECT l_partkey FROM lineitem),
    cells AS (
        SELECT j,
               ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':'
                                   || CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % 256 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM li, range(0, 4) AS r(j)
        GROUP BY 1, 2),
    exact AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n
        FROM li GROUP BY 1),
    topk AS (
        SELECT l_partkey, exact_n FROM exact
        ORDER BY exact_n DESC, l_partkey LIMIT 15),
    probes AS (
        SELECT t.l_partkey, t.exact_n, r.j,
               ('0x' || substr(md5('cms' || CAST(r.j AS VARCHAR) || ':'
                                   || CAST(t.l_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % 256 AS bucket
        FROM topk t, range(0, 4) AS r(j)),
    est AS (
        SELECT p.l_partkey, p.exact_n,
               CAST(min(c.n) AS BIGINT) AS cms_est
        FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
        GROUP BY 1, 2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS N FROM li)
    SELECT l_partkey, exact_n, cms_est,
           cms_est >= exact_n AS overestimates,
           (cms_est - exact_n)
               <= CAST(ceil(2.718281828 * N / 256) AS BIGINT) AS within_budget
    FROM est CROSS JOIN tot
    ORDER BY exact_n DESC, l_partkey
"""

# Item-to-item serving table (round 7): Salton cosine over the shared
# co-occurrence edges — degree-normalized i2i similarity, per-anchor
# top-k; fourth consumer of the persist_shared edge frame.
QUERIES["item_similar_neighbors"] = graph.item_similar_neighbors
ORACLES["item_similar_neighbors"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (
        SELECT src, dst, w FROM half
        UNION ALL SELECT dst, src, w FROM half),
    margins AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
                FROM basket GROUP BY 1),
    anchors AS (
        SELECT l_partkey AS src, c AS c_src FROM margins
        ORDER BY c DESC, l_partkey LIMIT 50),
    scored AS (
        SELECT e.src, e.dst, e.w AS c_ab,
               round(e.w / sqrt(a.c_src * m.c), 6) AS salton
        FROM edges e
        JOIN anchors a ON e.src = a.src
        JOIN margins m ON e.dst = m.l_partkey),
    ranked AS (
        SELECT src, dst, c_ab, salton,
               row_number() OVER (PARTITION BY src
                                  ORDER BY salton DESC, dst) AS rk
        FROM scored)
    SELECT src, CAST(rk AS INT) AS rk, dst, c_ab, salton
    FROM ranked WHERE rk <= 5
    ORDER BY src, rk
"""

# Language × source independence (round 7): chi-square contingency QA —
# exact BIGINT cells/margins, micro-quantized contributions summed as
# integers so partition order can't wiggle the statistic.
QUERIES["lang_source_chi2"] = quality.lang_source_chi2
ORACLES["lang_source_chi2"] = """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
        FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, CAST(sum(observed) AS BIGINT) AS lang_n
           FROM cells GROUP BY lang),
    ct AS (SELECT source, CAST(sum(observed) AS BIGINT) AS source_n
           FROM cells GROUP BY source),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
           FROM documents),
    scored AS (
        SELECT c.lang, c.source, c.observed,
               round(rt.lang_n * ct.source_n / nn.n, 6) AS expected,
               round((c.observed - rt.lang_n * ct.source_n / nn.n)
                     * (c.observed - rt.lang_n * ct.source_n / nn.n)
                     / (rt.lang_n * ct.source_n / nn.n), 6) AS contrib,
               CAST(round(round((c.observed - rt.lang_n * ct.source_n / nn.n)
                     * (c.observed - rt.lang_n * ct.source_n / nn.n)
                     / (rt.lang_n * ct.source_n / nn.n), 6) * 1e6) AS BIGINT)
                   AS contrib_micro,
               nn.n_langs, nn.n_sources
        FROM cells c
        JOIN rt ON c.lang = rt.lang
        JOIN ct ON c.source = ct.source
        CROSS JOIN nn),
    t AS (SELECT round(sum(contrib_micro) / 1e6, 6) AS chi2_stat,
                 CAST(max((n_langs - 1) * (n_sources - 1)) AS BIGINT) AS dof
          FROM scored)
    SELECT lang, source, observed, expected, contrib, chi2_stat, dof
    FROM scored CROSS JOIN t
    ORDER BY contrib DESC, lang, source
    LIMIT 15
"""

def _ranking_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import ranking_metrics

    return ranking_metrics(spark, sf_dir)


def _ranking_metrics_oracle() -> str:
    """SQL twin of ml.ranking.ranking_metrics: leave-one-out by md5
    rank, popularity candidates capped at K + max-degree (the flat
    pr <= C form equals the Spark TakeOrdered-then-rank because the
    (count DESC, item) ordering is total), filtered rank by counting
    the user's own higher-ranked train items, and the shared
    integer-micro contribution tables indexed by rank."""
    from project_bigdata_recsys_spark.ml.ranking import (
        DCG_MICRO,
        EVAL_KS,
        RR_MICRO,
    )

    rr = ", ".join(map(str, RR_MICRO))
    dcg = ", ".join(map(str, DCG_MICRO))
    ks = ", ".join(map(str, EVAL_KS))
    k_max = max(EVAL_KS)
    return f"""
    WITH inter AS (
        SELECT o_custkey AS u, l_partkey AS i
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_partkey),
    ranked AS (
        SELECT u, i,
               row_number() OVER (
                   PARTITION BY u
                   ORDER BY md5('loo:' || CAST(u AS VARCHAR) || ':'
                                || CAST(i AS VARCHAR)) DESC, i) AS rn
        FROM inter),
    test AS (SELECT u, i FROM ranked WHERE rn = 1),
    train AS (SELECT u, i FROM ranked WHERE rn > 1),
    c_lim AS (SELECT {k_max} + COALESCE(max(cnt), 0) AS c FROM
              (SELECT count(*) AS cnt FROM train GROUP BY u)),
    pop AS (SELECT i, count(*) AS cnt,
                   row_number() OVER (ORDER BY count(*) DESC, i) AS pr
            FROM train GROUP BY i),
    cands AS (SELECT i, pr FROM pop WHERE pr <= (SELECT c FROM c_lim)),
    test_r AS (SELECT t.u, c.pr AS pr_test
               FROM test t LEFT JOIN cands c ON c.i = t.i),
    above AS (SELECT tr.u, count(*) AS n_above
              FROM train tr
              JOIN cands c ON c.i = tr.i
              JOIN test_r x ON x.u = tr.u
              WHERE c.pr < x.pr_test
              GROUP BY tr.u),
    fr AS (SELECT t.u, t.pr_test - COALESCE(a.n_above, 0) AS fr
           FROM test_r t LEFT JOIN above a ON a.u = t.u),
    per_k AS (
        SELECT k.k,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN 1 ELSE 0 END AS hit,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN ([{rr}])[fr.fr] ELSE 0 END AS rr_micro,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN ([{dcg}])[fr.fr] ELSE 0 END AS dcg_micro
        FROM fr CROSS JOIN (SELECT unnest([{ks}]) AS k) k)
    SELECT k,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           round(sum(hit) / count(*), 6) AS hit_rate,
           round(sum(rr_micro) / 1000000.0 / count(*), 6) AS mrr,
           round(sum(dcg_micro) / 1000000.0 / count(*), 6) AS ndcg
    FROM per_k GROUP BY k ORDER BY k
    """


# Top-K ranking eval (round 8): HitRate/MRR/NDCG of the deterministic
# popularity baseline under md5-rank leave-one-out — the list-quality
# floor the reference's pointwise RMSE/MAE eval (batch_als_train.py:
# 154-166) never measures.
QUERIES["ranking_metrics"] = _ranking_metrics_query
ORACLES["ranking_metrics"] = _ranking_metrics_oracle()

# Bloom membership sketch (round 8): md5-positional bitmap as a
# relational DISTINCT-position set — the membership member of the
# mergeable-sketch quartet; positions replay exactly in SQL so the
# whole audit (including the measured FP rate) hash-compares.
QUERIES["bloom_membership_profile"] = relational.bloom_membership_profile
ORACLES["bloom_membership_profile"] = """
    WITH bk AS (SELECT DISTINCT o_custkey AS key FROM orders),
    bpos AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(key AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM bk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    cust AS (
        SELECT c_custkey FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 FROM customer),
    probe AS (
        SELECT c_custkey AS key,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(c_custkey AS VARCHAR)),
                               1, 8))::BIGINT % 8192 AS pos
        FROM cust CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    hits AS (
        SELECT p.key, count(*) AS n_hit
        FROM probe p JOIN bpos b ON b.pos = p.pos
        GROUP BY p.key),
    verdict AS (
        SELECT c.c_custkey,
               CASE WHEN COALESCE(h.n_hit, 0) = 4 THEN 1 ELSE 0 END
                   AS maybe,
               CASE WHEN bk.key IS NOT NULL THEN 1 ELSE 0 END AS present
        FROM cust c
        LEFT JOIN hits h ON h.key = c.c_custkey
        LEFT JOIN bk ON bk.key = c.c_custkey),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_built FROM bk),
    nbits AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bpos)
    SELECT nb.n_keys_built, nbits.n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(present) AS BIGINT) AS n_present,
           CAST(sum(maybe) AS BIGINT) AS n_maybe,
           CAST(sum(maybe * (1 - present)) AS BIGINT) AS n_false_pos,
           round(sum(maybe * (1 - present)) / sum(1 - present), 6)
               AS fp_rate,
           (min(CASE WHEN present = 1 THEN maybe ELSE 1 END) = 1)
               AS no_false_negatives
    FROM verdict CROSS JOIN nb CROSS JOIN nbits
    GROUP BY nb.n_keys_built, nbits.n_bits_set
"""

_DRIFT_CUM_SQL = """
    ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               round(value, 6) AS v
        FROM events),
    anchor AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT)
                   AS mid FROM ev),
    hist AS (
        SELECT v,
               CAST(sum(CASE WHEN day <= (SELECT mid FROM anchor)
                             THEN 1 ELSE 0 END) AS BIGINT) AS t_a,
               CAST(sum(CASE WHEN day <= (SELECT mid FROM anchor)
                             THEN 0 ELSE 1 END) AS BIGINT) AS t_b
        FROM ev GROUP BY v),
    cum AS (
        SELECT v, t_a, t_b,
               sum(t_a) OVER (ORDER BY v) AS cum_a,
               sum(t_b) OVER (ORDER BY v) AS cum_b
        FROM hist),
    tot AS (SELECT CAST(sum(t_a) AS BIGINT) AS n_a,
                   CAST(sum(t_b) AS BIGINT) AS n_b FROM hist)
"""

# Two-sample drift tests (round 8): the early-vs-late split at the
# midpoint epoch day, a 6-dp value histogram, and exact cumulative
# counts — KS compares micro-unit cdfs, Mann-Whitney folds tie-averaged
# rank sums in doubled-integer units.  The drift trio beside psi_drift.
QUERIES["ks_value_drift"] = quality.ks_value_drift
ORACLES["ks_value_drift"] = f"""
    WITH {_DRIFT_CUM_SQL},
    d AS (SELECT max(abs(CAST(round(1000000.0 * cum_a / n_a) AS BIGINT)
                       - CAST(round(1000000.0 * cum_b / n_b) AS BIGINT)))
                     AS dm
          FROM cum CROSS JOIN tot)
    SELECT t.n_a, t.n_b,
           round(dm / 1000000.0, 6) AS ks_stat,
           round(1.358 * sqrt((t.n_a + t.n_b)
                 / (CAST(t.n_a AS DOUBLE) * t.n_b)), 6) AS ks_crit,
           (round(dm / 1000000.0, 6)
            > round(1.358 * sqrt((t.n_a + t.n_b)
                    / (CAST(t.n_a AS DOUBLE) * t.n_b)), 6))
               AS drift_detected
    FROM d CROSS JOIN tot t
"""

QUERIES["mann_whitney_drift"] = quality.mann_whitney_drift
ORACLES["mann_whitney_drift"] = f"""
    WITH {_DRIFT_CUM_SQL},
    agg AS (
        SELECT CAST(sum(t_a * (2 * (cum_a + cum_b - (t_a + t_b))
                               + (t_a + t_b) + 1)) AS BIGINT) AS r2,
               CAST(sum((t_a + t_b) * (t_a + t_b) * (t_a + t_b)
                        - (t_a + t_b)) AS BIGINT) AS ties
        FROM cum)
    SELECT n_a, n_b,
           round((2 * n_a * n_b + n_a * (n_a + 1) - r2) / 2.0, 1)
               AS u_stat,
           round(((2 * n_a * n_b + n_a * (n_a + 1) - r2) / 2.0
                  - nad * nbd / 2.0)
                 / sqrt(nad * nbd / 12.0
                        * (((nad + nbd) + 1.0)
                           - ties / ((nad + nbd)
                                     * ((nad + nbd) - 1.0)))), 6)
               AS z_score,
           (abs(round(((2 * n_a * n_b + n_a * (n_a + 1) - r2) / 2.0
                  - nad * nbd / 2.0)
                 / sqrt(nad * nbd / 12.0
                        * (((nad + nbd) + 1.0)
                           - ties / ((nad + nbd)
                                     * ((nad + nbd) - 1.0)))), 6))
            > 1.96) AS shift_detected
    FROM (SELECT t.n_a, t.n_b, a.r2, a.ties,
                 CAST(t.n_a AS DOUBLE) AS nad,
                 CAST(t.n_b AS DOUBLE) AS nbd
          FROM agg a CROSS JOIN tot t)
"""


def _als_ranking_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import als_ranking_eval

    return als_ranking_eval(spark, sf_dir)


# ALS ranking eval (round 8): the model-vs-popularity-floor readout —
# ALS metric values are engine-seeded, so the oracle checks the exact
# test-user anchor plus literal-TRUE structural invariants (the
# als_recommendation_profile recipe).
QUERIES["als_ranking_eval"] = _als_ranking_eval_query
ORACLES["als_ranking_eval"] = """
    WITH u AS (
        SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_users
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT k, u.n_users,
           TRUE AS coverage_ok,
           TRUE AS range_ok,
           TRUE AS sandwich_ok
    FROM (SELECT unnest([5, 10, 20]) AS k) ks CROSS JOIN u
    ORDER BY k
"""

# Streaming KMV twin (round 8): keyed per-week state holds the k
# smallest hashes; the order-independent merge makes the final sketch
# bit-identical to the batch cut, so the oracle is one flat ranking.
QUERIES["stream_kmv_distinct"] = replay.stream_kmv_distinct
ORACLES["stream_kmv_distinct"] = """
    WITH ev AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               user_id
        FROM events),
    du AS (SELECT DISTINCT week, user_id FROM ev),
    hashed AS (
        SELECT DISTINCT week,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    weekly AS (
        SELECT week, u, rk FROM (
            SELECT week, u,
                   row_number() OVER (PARTITION BY week ORDER BY u) AS rk
            FROM hashed)
        WHERE rk <= 256),
    sketch AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n_sketch,
               max(CASE WHEN rk = 256 THEN u END) AS u_k
        FROM weekly GROUP BY week),
    ex AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM ev GROUP BY week)
    SELECT s.week, ex.n_exact, s.n_sketch,
           round(CASE WHEN s.n_sketch < 256 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 255.0 / s.u_k END, 4) AS kmv_estimate,
           round(abs(CASE WHEN s.n_sketch < 256
                          THEN CAST(s.n_sketch AS DOUBLE)
                          ELSE 255.0 / s.u_k END - ex.n_exact)
                 / ex.n_exact, 6) AS rel_err
    FROM sketch s JOIN ex ON ex.week = s.week
    ORDER BY s.week
"""

# Time-decayed trending items (round 8): recency-weighted popularity
# with a RATIONAL decay of integer day ages — exact micro-unit weights,
# no libm pow/exp — cut on the (score, item) total order.
QUERIES["trending_items"] = analytics.trending_items
ORACLES["trending_items"] = """
    WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
    aged AS (
        SELECT l_partkey,
               date_diff('day', o_orderdate, (SELECT a FROM anchor)) AS age
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    scored AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(1000000.0 * 30.0 / (30.0 + age))
                             AS BIGINT)) AS BIGINT) AS sm
        FROM aged GROUP BY l_partkey)
    SELECT l_partkey, n_orders,
           round(sm / 1000000.0, 6) AS trend_score
    FROM scored ORDER BY sm DESC, l_partkey LIMIT 15
"""

# Repetition/boilerplate QA (round 8): Gopher-style repetitious-text
# rules (duplicate-bigram/trigram fraction, top-bigram share) — grams
# built array-side, one scan, fixed-point micro averages.
QUERIES["doc_repetition_profile"] = text.doc_repetition_profile
ORACLES["doc_repetition_profile"] = """
    WITH base AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
    g2 AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM base),
    g3 AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM base),
    c2 AS (SELECT doc_id, source, g, count(*) AS c
           FROM g2 GROUP BY doc_id, source, g),
    c3 AS (SELECT doc_id, g, count(*) AS c
           FROM g3 GROUP BY doc_id, g),
    d2 AS (SELECT doc_id, source,
                  CAST(round(round(1.0 - count(*) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g2_dup_micro,
                  CAST(round(round(max(c) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g2_top_micro
           FROM c2 GROUP BY doc_id, source),
    d3 AS (SELECT doc_id,
                  CAST(round(round(1.0 - count(*) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g3_dup_micro
           FROM c3 GROUP BY doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(g2_dup_micro) / 1000000.0 / count(*), 6)
               AS avg_dup_bigram,
           round(sum(g2_top_micro) / 1000000.0 / count(*), 6)
               AS avg_top_bigram_share,
           round(sum(g3_dup_micro) / 1000000.0 / count(*), 6)
               AS avg_dup_trigram,
           CAST(sum(CASE WHEN g2_dup_micro > 120000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repetitive
    FROM d2 JOIN d3 USING (doc_id)
    GROUP BY source
    ORDER BY source
"""

# KMV distinct sketch (round 8): the mergeable-sketch family member
# whose ESTIMATE is engine-reproducible md5 math — hash-compared
# outright, not a within-budget boolean like the HLL layer.
QUERIES["kmv_distinct_rollup"] = relational.kmv_distinct_rollup
ORACLES["kmv_distinct_rollup"] = """
    WITH ev AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               strftime(ts, '%Y-%m-%d') AS day,
               user_id
        FROM events),
    du AS (SELECT DISTINCT week, day, user_id FROM ev),
    hashed AS (
        SELECT week, day,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    daily AS (
        SELECT week, day, u
        FROM (SELECT week, day, u,
                     row_number() OVER (PARTITION BY day ORDER BY u) AS rk
              FROM hashed)
        WHERE rk <= 256),
    weekly AS (
        SELECT week, u, rk FROM (
            SELECT week, u,
                   row_number() OVER (PARTITION BY week ORDER BY u) AS rk
            FROM (SELECT DISTINCT week, u FROM daily))
        WHERE rk <= 256),
    sketch AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n_sketch,
               max(CASE WHEN rk = 256 THEN u END) AS u_k
        FROM weekly GROUP BY week),
    nd AS (SELECT week, CAST(count(DISTINCT day) AS BIGINT) AS n_days
           FROM daily GROUP BY week),
    ex AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM ev GROUP BY week)
    SELECT s.week, nd.n_days, ex.n_exact, s.n_sketch,
           round(CASE WHEN s.n_sketch < 256 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 255.0 / s.u_k END, 4) AS kmv_estimate,
           round(abs(CASE WHEN s.n_sketch < 256
                          THEN CAST(s.n_sketch AS DOUBLE)
                          ELSE 255.0 / s.u_k END - ex.n_exact)
                 / ex.n_exact, 6) AS rel_err
    FROM sketch s
    JOIN nd ON nd.week = s.week
    JOIN ex ON ex.week = s.week
    ORDER BY s.week
"""


# l-diversity privacy audit (round 8): the homogeneity-attack complement
# of k_anonymity_profile — same QI banding, sensitive attribute = lang.
QUERIES["l_diversity_profile"] = quality.l_diversity_profile
ORACLES["l_diversity_profile"] = """
    WITH g AS (
        SELECT source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(count(DISTINCT lang) AS BIGINT) AS l
        FROM documents
        GROUP BY source, floor(n_chars / 100))
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l = 1 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_exposed,
           round(sum(CASE WHEN l >= 3 THEN group_size ELSE 0 END)
                 / CAST(sum(group_size) AS DOUBLE), 6) AS diverse_frac
    FROM g
    GROUP BY source
    ORDER BY source
"""

# UCB1 bandit ranking (round 8): explore/exploit scoring between batch
# model refreshes — IEEE double expressions of integer aggregates (the
# bm25_scores ln() precedent), cut on the (score, item) total order.
QUERIES["ucb_ranking"] = analytics.ucb_ranking
ORACLES["ucb_ranking"] = """
    WITH arms AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_pulls,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS N FROM arms)
    SELECT l_partkey, n_pulls,
           round(s / CAST(n_pulls AS DOUBLE), 6) AS mean_reward,
           round(s / CAST(n_pulls AS DOUBLE)
                 + sqrt(2.0 * ln(CAST(N AS DOUBLE)) / n_pulls), 6)
               AS ucb_score
    FROM arms CROSS JOIN tot
    WHERE n_pulls >= 25
    ORDER BY ucb_score DESC, l_partkey
    LIMIT 20
"""

# In-session event-path mining (round 8): sessionize (same >= gap
# boundary as the sessionize op), trigram the per-session event-type
# sequence, count the top paths — all windows user-partitioned.
QUERIES["session_ngrams"] = analytics.session_ngrams
ORACLES["session_ngrams"] = """
    WITH lagged AS (
        SELECT user_id, event_id, ts, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_sess
        FROM lagged),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged),
    tri AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM sess
        WINDOW w AS (PARTITION BY user_id, session_id
                     ORDER BY ts, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tri
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1 || '>' || e2 || '>' || e3
    ORDER BY n_occurrences DESC, trigram
    LIMIT 15
"""

# CCNet head/middle/tail terciles (round 8): corpus split by unigram LM
# score with EXACT integer-arithmetic tercile thresholds (3*cum >= n) —
# no float quantile, no engine interpolation.
QUERIES["perplexity_buckets"] = text.perplexity_buckets
ORACLES["perplexity_buckets"] = """
    WITH t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    hist AS (SELECT score, count(*) AS c FROM scored GROUP BY score),
    cum AS (
        SELECT score,
               sum(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                   AS cm,
               (SELECT sum(c) FROM hist) AS n
        FROM hist),
    thr AS (
        SELECT min(CASE WHEN cm * 3 >= n THEN score END) AS t1,
               min(CASE WHEN cm * 3 >= n * 2 THEN score END) AS t2
        FROM cum),
    bucketed AS (
        SELECT source,
               CASE WHEN score <= t1 THEN 'head'
                    WHEN score <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               score
        FROM scored CROSS JOIN thr),
    agged AS (
        SELECT source, bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(round(score * 10000) AS BIGINT)) AS BIGINT)
                   AS s4
        FROM bucketed GROUP BY source, bucket)
    SELECT source, bucket, n_docs,
           round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY source)
                               AS DOUBLE), 6) AS source_share,
           round(s4 / 10000.0 / n_docs, 6) AS avg_logloss
    FROM agged
    ORDER BY source, bucket
"""


# Hashed-feature quality classifier (round 8): fasttext/CCNet quality-
# filter shape — naive-Bayes log-odds over md5-hashed token buckets,
# trained and applied in two aggregation passes, weights micro-frozen.
QUERIES["quality_lr_score"] = text.quality_lr_score
ORACLES["quality_lr_score"] = """
    WITH t AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 1 ELSE 0 END AS pos,
               term
        FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE length(term) > 0),
    h AS (
        SELECT doc_id, source, pos,
               ('0x' || substr(md5('qlr:' || term), 1, 8))::BIGINT % 1024
                   AS bucket
        FROM t),
    counts AS (
        SELECT bucket, CAST(sum(pos) AS BIGINT) AS cp,
               CAST(sum(1 - pos) AS BIGINT) AS cn
        FROM h GROUP BY bucket),
    tot AS (SELECT CAST(sum(cp) AS BIGINT) AS P,
                   CAST(sum(cn) AS BIGINT) AS N FROM counts),
    wts AS (
        SELECT bucket,
               CAST(round(1000000.0 * (ln((cp + 1) / (P + 1024.0))
                                       - ln((cn + 1) / (N + 1024.0))))
                    AS BIGINT) AS w
        FROM counts CROSS JOIN tot),
    docsc AS (
        SELECT doc_id, source, pos,
               CAST(round(sum(w) * 1.0 / count(*)) AS BIGINT) AS sc
        FROM h JOIN wts USING (bucket)
        GROUP BY doc_id, source, pos)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(sc) / 1000000.0 / count(*), 6) AS avg_score,
           CAST(sum(CASE WHEN sc > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred_curated,
           round(sum(CASE WHEN (CASE WHEN sc > 0 THEN 1 ELSE 0 END) = pos
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS accuracy
    FROM docsc GROUP BY source ORDER BY source
"""

# EWMA volume anomalies (round 8): closed-form 14-day exponential
# baseline with integer-literal micro weights — no pow(), no
# sequential recurrence; flags test the rounded ratio.
QUERIES["ewma_anomalies"] = analytics.ewma_anomalies
ORACLES["ewma_anomalies"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events),
    c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
          FROM ev GROUP BY event_type, day),
    w(age, wt) AS (VALUES
        (1, 700000), (2, 490000), (3, 343000), (4, 240100),
        (5, 168070), (6, 117649), (7, 82354), (8, 57648),
        (9, 40354), (10, 28248), (11, 19773), (12, 13841),
        (13, 9689), (14, 6782)),
    b AS (
        SELECT event_type, day + age AS day,
               CAST(sum(wt * n) AS BIGINT) AS ws,
               CAST(sum(wt) AS BIGINT) AS sw,
               count(*) AS nh
        FROM c CROSS JOIN w
        GROUP BY event_type, day + age
        HAVING count(*) = 14),
    j AS (
        SELECT c.event_type, c.day, c.n, b.ws, b.sw,
               round(c.n * b.sw / b.ws, 6) AS ratio
        FROM c JOIN b ON b.event_type = c.event_type AND b.day = c.day)
    SELECT event_type, day, n,
           round(ws * 1.0 / sw, 4) AS baseline,
           ratio,
           CAST(CASE WHEN ratio >= 1.5 OR ratio <= 0.5 THEN 1 ELSE 0 END
                AS INTEGER) AS is_anomaly
    FROM j ORDER BY event_type, day
"""

# Z-order vs linear layout (round 8): bit-interleaved clustering
# measured through per-file min/max pruning — pure integer arithmetic.
QUERIES["zorder_layout_profile"] = maintenance.zorder_layout_profile
ORACLES["zorder_layout_profile"] = """
    WITH coded AS (
        SELECT o_custkey % 16 AS x,
               CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 16
                   AS y
        FROM orders),
    z AS (
        SELECT x, y,
               (x % 2) * 1 + (y % 2) * 2
             + (CAST(floor(x / 2) AS BIGINT) % 2) * 4
             + (CAST(floor(y / 2) AS BIGINT) % 2) * 8
             + (CAST(floor(x / 4) AS BIGINT) % 2) * 16
             + (CAST(floor(y / 4) AS BIGINT) % 2) * 32
             + (CAST(floor(x / 8) AS BIGINT) % 2) * 64
             + (CAST(floor(y / 8) AS BIGINT) % 2) * 128 AS zv
        FROM coded),
    files AS (
        SELECT 'zorder' AS layout, CAST(floor(zv / 4) AS BIGINT)
                   AS file_id, x, y
        FROM z
        UNION ALL
        SELECT 'linear', CAST(floor((x * 16 + y) / 4) AS BIGINT), x, y
        FROM z),
    stats AS (
        SELECT layout, file_id, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM files GROUP BY layout, file_id),
    probes AS (SELECT CAST(range AS BIGINT) AS c FROM range(0, 16)),
    xs AS (
        SELECT layout, 'x' AS probe_dim, count(*) / 16.0 AS avg_files
        FROM stats CROSS JOIN probes
        WHERE min_x <= c AND c <= max_x GROUP BY layout),
    ys AS (
        SELECT layout, 'y' AS probe_dim, count(*) / 16.0 AS avg_files
        FROM stats CROSS JOIN probes
        WHERE min_y <= c AND c <= max_y GROUP BY layout),
    nf AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_files
           FROM stats GROUP BY layout),
    u AS (SELECT * FROM xs UNION ALL SELECT * FROM ys)
    SELECT u.layout, u.probe_dim, nf.n_files,
           round(u.avg_files, 4) AS avg_files_scanned
    FROM u JOIN nf ON nf.layout = u.layout
    ORDER BY u.layout, u.probe_dim
"""

# Adamic-Adar link prediction (round 8): wedge enumeration at capped
# centers over the shared co-occurrence graph, existing edges
# anti-joined away, micro fixed-point 1/ln(deg) weights.
QUERIES["link_prediction_adamic_adar"] = graph.link_prediction_adamic_adar
ORACLES["link_prediction_adamic_adar"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (
        SELECT src AS z, dst AS nb FROM und
        UNION ALL SELECT dst, src FROM und),
    deg AS (SELECT z, CAST(count(*) AS BIGINT) AS dg
            FROM adj GROUP BY z),
    centers AS (
        SELECT z, CAST(round(1000000.0 / ln(dg)) AS BIGINT) AS w
        FROM deg WHERE dg >= 2 AND dg <= 64),
    wedges AS (
        SELECT a.nb AS u, b.nb AS v, c.w
        FROM adj a
        JOIN centers c ON a.z = c.z
        JOIN adj b ON b.z = a.z AND a.nb < b.nb),
    scored AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(w) AS BIGINT) AS aa
        FROM wedges GROUP BY u, v),
    ne AS (
        SELECT s.* FROM scored s
        WHERE NOT EXISTS (SELECT 1 FROM und e
                          WHERE e.src = s.u AND e.dst = s.v))
    SELECT u, v, n_common, round(aa / 1000000.0, 6) AS aa_score
    FROM ne ORDER BY aa DESC, u, v LIMIT 20
"""


# DoReMi-lite domain reweighting (round 8): tilt the mixture toward
# high-excess-loss sources; shared doc_unigram_scores kernel, exp() of
# the 4-dp excess micro-frozen before the normalizing sum.
QUERIES["domain_reweight"] = curation.domain_reweight
ORACLES["domain_reweight"] = """
    WITH t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    per_source AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(round(score * 10000) AS BIGINT)) AS BIGINT)
                   AS s4
        FROM scored GROUP BY source),
    corpus AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
                      CAST(sum(s4) AS BIGINT) AS s4_all
               FROM per_source),
    wt AS (
        SELECT source, n_docs,
               round(n_docs * 1.0 / n_all, 6) AS base_share,
               round(s4 / 10000.0 / n_docs, 4) AS avg_logloss,
               round(round(s4 / 10000.0 / n_docs, 4)
                     - round(s4_all / 10000.0 / n_all, 4), 4) AS excess,
               CAST(round(1000000.0 * (n_docs * 1.0 / n_all)
                          * exp(round(round(s4 / 10000.0 / n_docs, 4)
                                      - round(s4_all / 10000.0 / n_all,
                                              4), 4)))
                    AS BIGINT) AS wm
        FROM per_source CROSS JOIN corpus),
    den AS (SELECT CAST(sum(wm) AS BIGINT) AS wsum FROM wt)
    SELECT source, n_docs, base_share, avg_logloss, excess,
           round(wm * 1.0 / wsum, 6) AS new_share
    FROM wt CROSS JOIN den ORDER BY source
"""

# IPS offline policy eval (round 8): counterfactual reward of a
# uniform-over-top-k policy on logged traffic; item-level micro-frozen
# weights folded with integer sums, ESS health metric.
def _ips_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import ips_eval

    return ips_eval(spark, sf_dir)


QUERIES["ips_eval"] = _ips_eval_query
ORACLES["ips_eval"] = """
    WITH arms AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS rs
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(rs) AS BIGINT) AS rt FROM arms),
    topk AS (SELECT l_partkey FROM arms
             ORDER BY n DESC, l_partkey LIMIT 100),
    fl AS (
        SELECT a.n, a.rs,
               CAST(round(1000000.0 * t.nt / (100 * a.n)) AS BIGINT) AS w,
               t.nt, t.rt
        FROM arms a JOIN topk USING (l_partkey) CROSS JOIN tot t),
    agg AS (
        SELECT max(nt) AS nt, max(rt) AS rt,
               CAST(sum(rs * w) AS BIGINT) AS rw,
               CAST(sum(n * w) AS BIGINT) AS sw,
               CAST(sum(n * w * w) AS BIGINT) AS sw2
        FROM fl)
    SELECT nt AS n_logged, CAST(100 AS BIGINT) AS k,
           round(rt * 1.0 / nt, 6) AS logged_reward,
           round(rw / 1000000.0 / nt, 6) AS ips_reward,
           round((sw / 1000000.0) * (sw / 1000000.0)
                 / (sw2 / 1000000000000.0), 4) AS effective_sample_size
    FROM agg
"""

# Beyond-accuracy rec eval (round 8): intra-list embedding diversity +
# catalog coverage of the deterministic i2i top-k lists.
def _recs_diversity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import recs_diversity_profile

    return recs_diversity_profile(spark, sf_dir)


QUERIES["recs_diversity_profile"] = _recs_diversity_query
ORACLES["recs_diversity_profile"] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (SELECT src, dst, w FROM half
              UNION ALL SELECT dst, src, w FROM half),
    anchors AS (
        SELECT src FROM (
            SELECT src, sum(w) AS s FROM edges GROUP BY src
            ORDER BY s DESC, src LIMIT 20)),
    recs AS (
        SELECT src, dst FROM (
            SELECT e.src, e.dst,
                   row_number() OVER (
                       PARTITION BY e.src ORDER BY e.w DESC, e.dst) AS rk
            FROM edges e JOIN anchors a USING (src))
        WHERE rk <= 5),
    pairs AS (
        SELECT r1.src AS anchor, r1.dst % 500 AS v1, r2.dst % 500 AS v2
        FROM recs r1 JOIN recs r2
          ON r1.src = r2.src AND r1.dst < r2.dst),
    vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    scored AS (
        SELECT anchor,
               CAST(round(1000000.0 * (1 - list_dot_product(e1.v, e2.v)
                    / (sqrt(list_dot_product(e1.v, e1.v))
                       * sqrt(list_dot_product(e2.v, e2.v)))))
                    AS BIGINT) AS d
        FROM pairs p
        JOIN vec e1 ON e1.vec_id = p.v1
        JOIN vec e2 ON e2.vec_id = p.v2),
    cov AS (SELECT round(count(DISTINCT dst) * 1.0
                         / (SELECT count(*) FROM part), 6) AS c
            FROM recs)
    SELECT anchor, CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(d) / 1000000.0 / count(*), 6)
               AS intra_list_diversity,
           (SELECT c FROM cov) AS catalog_coverage
    FROM scored GROUP BY anchor ORDER BY anchor
"""

# Compaction planner (round 8): deterministic sorted-cumulative merge
# bins over per-(month, day) row groups — the OPTIMIZE manifest.
QUERIES["compaction_plan"] = maintenance.compaction_plan
ORACLES["compaction_plan"] = """
    WITH files AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS f_rows
        FROM orders GROUP BY 1, 2),
    binned AS (
        SELECT month, day, f_rows,
               CAST(floor(coalesce(sum(f_rows) OVER (
                   PARTITION BY month ORDER BY f_rows DESC, day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) / 64) AS BIGINT) AS bin_id
        FROM files)
    SELECT month, bin_id, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(f_rows) AS BIGINT) AS bin_rows
    FROM binned GROUP BY month, bin_id
    HAVING count(*) >= 2
    ORDER BY month, bin_id
"""


# Streaming EWMA monitor (round 8): per-(1-day window, type) counts as
# streaming state, the shared closed-form baseline kernel post-sink —
# bit-identical to the batch monitor, same oracle arithmetic.
QUERIES["stream_ewma_anomalies"] = replay.stream_ewma_anomalies
ORACLES["stream_ewma_anomalies"] = ORACLES["ewma_anomalies"]

# Hybrid retrieval with RRF (round 8): BM25 top-depth + IVF-shortlist
# dense top-depth fused by reciprocal-rank — integer-derived
# round(1e9/(60+rank)) contributions, exact BIGINT rrf_micro output.
QUERIES["hybrid_search"] = similarity.hybrid_search_rrf
ORACLES["hybrid_search"] = """
    WITH toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY term),
    q AS (SELECT term, doc_freq FROM dft
          ORDER BY total_tf DESC, term LIMIT 3),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
    bscored AS (
        SELECT tf.term, tf.doc_id,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    sparse AS (
        SELECT term, doc_id, rk_s FROM (
            SELECT term, doc_id,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY bm25 DESC, doc_id) AS rk_s
            FROM bscored)
        WHERE rk_s <= 50),
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    qe AS (
        SELECT qv.term, e.v AS qvec
        FROM (SELECT term,
                     ('0x' || substr(md5('qvec:' || term), 1, 8))::BIGINT
                         % 500 AS qvid
              FROM q) qv
        JOIN emb e ON e.vec_id = qv.qvid),
    cells AS (
        SELECT qe.term, e.vec_id,
               round(list_dot_product(e.v, qe.qvec)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(qe.qvec, qe.qvec))), 6)
                   AS cs
        FROM emb e CROSS JOIN qe),
    probed AS (
        SELECT term, vec_id, cs FROM (
            SELECT term, vec_id, cs,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY cs DESC, vec_id) AS crk
            FROM cells)
        WHERE crk <= 5),
    docs AS (SELECT doc_id, doc_id % 500 AS vec_id FROM documents),
    dense AS (
        SELECT term, doc_id, rk_d FROM (
            SELECT p.term, d.doc_id,
                   row_number() OVER (PARTITION BY p.term
                                      ORDER BY p.cs DESC, d.doc_id)
                       AS rk_d
            FROM docs d JOIN probed p USING (vec_id))
        WHERE rk_d <= 50),
    fused AS (
        SELECT coalesce(s.term, de.term) AS query_term,
               coalesce(s.doc_id, de.doc_id) AS doc_id,
               CAST(coalesce(s.rk_s, 0) AS INTEGER) AS bm25_rank,
               CAST(coalesce(de.rk_d, 0) AS INTEGER) AS cos_rank,
               CAST(coalesce(CAST(round(1000000000.0 / (60 + s.rk_s))
                                  AS BIGINT), 0)
                    + coalesce(CAST(round(1000000000.0 / (60 + de.rk_d))
                                    AS BIGINT), 0) AS BIGINT) AS rrf_micro
        FROM sparse s
        FULL OUTER JOIN dense de
          ON s.term = de.term AND s.doc_id = de.doc_id)
    SELECT query_term, doc_id, bm25_rank, cos_rank, rrf_micro
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_term
              ORDER BY rrf_micro DESC, doc_id) AS frk
          FROM fused)
    WHERE frk <= 10
    ORDER BY query_term, rrf_micro DESC, doc_id
"""


# Streaming SCD2 PIT enrichment (round 8): stream-static equi-join with
# the validity-interval predicate as join filter; state bounded by
# (segment, user) partials; oracle replays the draw + interval math.
QUERIES["stream_pit_enrichment"] = replay.stream_pit_enrichment
ORACLES["stream_pit_enrichment"] = """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    drawn AS (
        SELECT user_id,
               ('0x' || substr(md5('scdstream:'
                                   || CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT / 4294967296.0 AS uu,
               'seg' || CAST(user_id % 4 AS VARCHAR) AS base
        FROM u),
    dim AS (
        SELECT user_id, base AS segment, '2023-01-01' AS vf,
               CASE WHEN uu < 0.3 THEN '2024-01-16'
                    ELSE '9999-12-31' END AS vt
        FROM drawn
        UNION ALL
        SELECT user_id, base || '_V2', '2024-01-16', '9999-12-31'
        FROM drawn WHERE uu < 0.3),
    ev AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
               CAST(round(value * 1000000) AS BIGINT) AS vm
        FROM events),
    j AS (
        SELECT d.segment, e.user_id, e.vm
        FROM ev e JOIN dim d
          ON d.user_id = e.user_id AND e.day >= d.vf AND e.day < d.vt)
    SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(vm) / 1000000.0, 4) AS total_value
    FROM j GROUP BY segment ORDER BY segment
"""


# Welch's unequal-variance t-test (round 8): parametric mean-shift
# member completing the drift quartet — BIGINT cent moments, identical
# float expression shape downstream (sqrt/ln precedent).
QUERIES["welch_ttest_drift"] = quality.welch_ttest_drift
ORACLES["welch_ttest_drift"] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    sided AS (
        SELECT vc, CASE WHEN day <= m THEN 1 ELSE 0 END AS a
        FROM ev CROSS JOIN mid),
    agg AS (
        SELECT CAST(sum(a) AS BIGINT) AS n_a,
               CAST(sum(1 - a) AS BIGINT) AS n_b,
               CAST(sum(a * vc) AS BIGINT) AS sa,
               CAST(sum((1 - a) * vc) AS BIGINT) AS sb,
               CAST(sum(a * vc * vc) AS BIGINT) AS ssa,
               CAST(sum((1 - a) * vc * vc) AS BIGINT) AS ssb
        FROM sided),
    m2 AS (
        SELECT n_a, n_b,
               sa / CAST(n_a AS DOUBLE) AS ma,
               sb / CAST(n_b AS DOUBLE) AS mb,
               (ssa - sa * (sa / CAST(n_a AS DOUBLE)))
                   / (CAST(n_a AS DOUBLE) - 1.0) AS va,
               (ssb - sb * (sb / CAST(n_b AS DOUBLE)))
                   / (CAST(n_b AS DOUBLE) - 1.0) AS vb
        FROM agg),
    m3 AS (
        SELECT *, va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)
                      AS se2
        FROM m2)
    SELECT n_a, n_b,
           round(ma / 100.0, 6) AS mean_early,
           round(mb / 100.0, 6) AS mean_late,
           round((ma - mb) / sqrt(se2), 6) AS t_stat,
           round(se2 * se2
                 / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) - 1.0)
                    + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1.0)), 4) AS welch_df,
           abs(round((ma - mb) / sqrt(se2), 6)) > 1.96
               AS mean_shift_detected
    FROM m3
"""

# t-closeness audit (round 8): third member of the privacy trio —
# variational distance of each QI group's sensitive-lang distribution
# from the global one, folded in integer 1e-9 units (absent langs via
# the complement of the present-q mass, never densified).
QUERIES["t_closeness_profile"] = quality.t_closeness_profile
ORACLES["t_closeness_profile"] = """
    WITH docs AS (
        SELECT lang, source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band
        FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
    gdist AS (
        SELECT lang,
               CAST(round(1000000000.0 * count(*)
                          / CAST((SELECT n FROM tot) AS DOUBLE))
                    AS BIGINT) AS q_micro
        FROM docs GROUP BY lang),
    cells AS (
        SELECT source, len_band, lang,
               CAST(count(*) AS BIGINT) AS cnt
        FROM docs GROUP BY source, len_band, lang),
    sizes AS (
        SELECT source, len_band, CAST(sum(cnt) AS BIGINT) AS group_size
        FROM cells GROUP BY source, len_band),
    joined AS (
        SELECT c.source, c.len_band, s.group_size,
               CAST(round(1000000000.0 * c.cnt
                          / CAST(s.group_size AS DOUBLE)) AS BIGINT)
                   AS p_micro,
               g.q_micro
        FROM cells c
        JOIN gdist g USING (lang)
        JOIN sizes s ON c.source = s.source AND c.len_band = s.len_band),
    per_group AS (
        SELECT source, len_band, group_size,
               CAST((sum(abs(p_micro - q_micro))
                     + (1000000000 - sum(q_micro))) // 2 AS BIGINT)
                   AS t_micro
        FROM joined GROUP BY source, len_band, group_size)
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           round(max(t_micro) / 1000000000.0, 6) AS max_t,
           round(sum(t_micro) / CAST(count(*) AS DOUBLE)
                 / 1000000000.0, 6) AS avg_t,
           CAST(sum(CASE WHEN t_micro > 500000000 THEN group_size
                         ELSE 0 END) AS BIGINT) AS n_skewed_docs
    FROM per_group
    GROUP BY source
    ORDER BY source
"""

# Kaplan-Meier time-to-first-purchase (round 8): right-censoring-aware
# conversion curve; integer risk-set folds, ln/exp product behind
# round(,6), the all-remaining-die edge guarded by a prefix-max flag.
QUERIES["survival_km_curve"] = analytics.survival_km_curve
ORACLES["survival_km_curve"] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS h,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    horizon AS (SELECT max(h) AS max_h FROM ev),
    per_user AS (
        SELECT user_id, min(h) AS first_h,
               min(CASE WHEN is_p = 1 THEN h END) AS first_p
        FROM ev GROUP BY user_id),
    durations AS (
        SELECT CAST(CASE WHEN first_p IS NOT NULL THEN first_p - first_h
                         ELSE max_h - first_h END AS BIGINT) AS t_hours,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS d
        FROM per_user CROSS JOIN horizon),
    level AS (
        SELECT t_hours, CAST(sum(d) AS BIGINT) AS n_deaths,
               CAST(sum(1 - d) AS BIGINT) AS n_censored
        FROM durations GROUP BY t_hours),
    at_risk AS (
        SELECT *, CAST(sum(n_deaths + n_censored) OVER (
                   ORDER BY t_hours DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        FROM level),
    deaths AS (SELECT * FROM at_risk WHERE n_deaths > 0),
    curve AS (
        SELECT *,
               max(CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END) OVER w
                   AS zero_f,
               sum(CASE WHEN n_deaths < n_risk
                        THEN ln((n_risk - n_deaths)
                                / CAST(n_risk AS DOUBLE))
                        ELSE 0.0 END) OVER w AS lnsum
        FROM deaths
        WINDOW w AS (ORDER BY t_hours ROWS UNBOUNDED PRECEDING))
    SELECT t_hours, n_risk, n_deaths, n_censored,
           CASE WHEN zero_f = 1 THEN 0.0
                ELSE round(exp(lnsum), 6) END AS survival
    FROM curve ORDER BY t_hours
"""

# Per-group OLS trend (round 8): closed-form regression from BIGINT
# sufficient statistics; doubles only in the final identical-shape
# slope/intercept/R² expressions.
QUERIES["ols_trend_per_group"] = analytics.ols_trend_per_group
ORACLES["ols_trend_per_group"] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               event_type
        FROM events),
    anchor AS (SELECT min(day) AS day0 FROM ev),
    daily AS (
        SELECT event_type,
               CAST(day - day0 AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM ev CROSS JOIN anchor
        GROUP BY event_type, day - day0),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM daily GROUP BY event_type),
    m AS (
        SELECT *,
               CAST(n_days AS DOUBLE) * sxy
                   - CAST(sx AS DOUBLE) * sy AS cov_n,
               CAST(n_days AS DOUBLE) * sxx
                   - CAST(sx AS DOUBLE) * sx AS var_x_n,
               CAST(n_days AS DOUBLE) * syy
                   - CAST(sy AS DOUBLE) * sy AS var_y_n
        FROM stats)
    SELECT event_type, n_days, sy AS n_events,
           round(cov_n / var_x_n, 6) AS slope_per_day,
           round((sy - (cov_n / var_x_n) * sx)
                 / CAST(n_days AS DOUBLE), 6) AS intercept,
           round(cov_n * cov_n / (var_x_n * var_y_n), 6) AS r2
    FROM m ORDER BY event_type
"""

# Leave-one-out target encoding (round 8): leakage-safe categorical
# feature — per-row (S − x)/(n − 1) in integer cents, read out as a
# banded histogram so the per-row path is what gets hash-checked.
def _target_encoding_oof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import target_encoding_oof

    return target_encoding_oof(spark, sf_dir)


QUERIES["target_encoding_oof"] = _target_encoding_oof_query
ORACLES["target_encoding_oof"] = """
    WITH o AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    g AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY o_orderpriority, o_orderstatus),
    enc AS (
        SELECT o.o_orderpriority, o.o_orderstatus,
               CASE WHEN g.n > 1
                    THEN CAST(floor((g.s - o.cents)
                                    / CAST(g.n - 1 AS DOUBLE)
                                    / 5000.0) AS BIGINT)
               END AS loo_band
        FROM o JOIN g USING (o_orderpriority, o_orderstatus))
    SELECT o_orderpriority, o_orderstatus, loo_band,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM enc
    GROUP BY o_orderpriority, o_orderstatus, loo_band
    ORDER BY o_orderpriority, o_orderstatus, loo_band
"""


# Reliability diagram (round 8): calibration of a Laplace-smoothed
# purchase propensity — per-bin predicted/observed/Brier from integer
# 1e-6 folds only.
def _calibration_bins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import calibration_bins

    return calibration_bins(spark, sf_dir)


QUERIES["calibration_bins"] = _calibration_bins_query
ORACLES["calibration_bins"] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN day <= m THEN 1 ELSE 0 END) AS BIGINT)
                   AS ne,
               CAST(sum(CASE WHEN day <= m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pe,
               CAST(max(CASE WHEN day > m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev CROSS JOIN mid GROUP BY user_id),
    scored AS (
        SELECT y,
               CAST(round(1000000.0 * (pe + 1) / (ne + 2)) AS BIGINT)
                   AS p_micro
        FROM per_user),
    binned AS (
        SELECT CAST(floor(p_micro / 100000) AS BIGINT) AS bin, y, p_micro
        FROM scored),
    folds AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(p_micro) AS BIGINT) AS sp,
               CAST(sum(p_micro * p_micro) AS BIGINT) AS spp,
               CAST(sum(p_micro * y) AS BIGINT) AS spy,
               CAST(sum(y) AS BIGINT) AS sy
        FROM binned GROUP BY bin)
    SELECT bin, n_users,
           round(sp / CAST(n_users AS DOUBLE) / 1000000.0, 6)
               AS avg_predicted,
           round(sy / CAST(n_users AS DOUBLE), 6) AS observed_rate,
           round((CAST(spp AS DOUBLE) - 2000000.0 * spy
                  + 1000000000000.0 * sy)
                 / CAST(n_users AS DOUBLE) / 1000000000000.0, 6) AS brier
    FROM folds ORDER BY bin
"""

# Bloom-pruned join (round 8): broadcast-bitmap runtime prefilter on
# the probe side of a selective join — md5 positions replayed
# bit-for-bit by the oracle, false positives absorbed by the exact
# join behind the filter.
QUERIES["bloom_pruned_join"] = relational.bloom_pruned_join
ORACLES["bloom_pruned_join"] = """
    WITH build AS (
        SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'),
    bpos AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM build CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    kp AS (
        SELECT l_orderkey,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM keys CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    hits AS (
        SELECT l_orderkey
        FROM kp JOIN bpos USING (pos)
        GROUP BY l_orderkey HAVING count(*) = 4),
    li AS (
        SELECT l_orderkey, l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
    passed AS (SELECT li.* FROM li JOIN hits USING (l_orderkey)),
    stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM li) AS n_probe,
               (SELECT CAST(count(*) AS BIGINT) FROM passed)
                   AS n_bloom_pass)
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(cents) / 100.0, 2) AS revenue,
           n_probe, n_bloom_pass
    FROM passed JOIN build ON passed.l_orderkey = build.o_orderkey
    CROSS JOIN stats
    GROUP BY l_returnflag, n_probe, n_bloom_pass
    ORDER BY l_returnflag
"""

# Salted skew join (round 8): the gate form of skew.salted_join —
# row-identical to the plain join (the salt is an equi-key refinement,
# then dropped), so the oracle is the plain SQL join.
QUERIES["salted_join_agg"] = skew.salted_join_agg
ORACLES["salted_join_agg"] = """
    WITH ev AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(vc) / 100.0, 2) AS total_value
    FROM ev JOIN customer ON ev.user_id = customer.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""

# KMV set operations (round 8): union/Jaccard/intersection estimated
# from the per-day sketches alone (top-k of merged values IS the union
# merge; membership via keyed joins) — exact counts as the readout.
QUERIES["kmv_set_ops"] = relational.kmv_set_ops
ORACLES["kmv_set_ops"] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day, user_id
        FROM events),
    du AS (SELECT DISTINCT day, user_id FROM ev),
    hashed AS (
        SELECT day,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    sketch AS (
        SELECT day, u FROM (
            SELECT day, u,
                   row_number() OVER (PARTITION BY day ORDER BY u) AS rk
            FROM hashed)
        WHERE rk <= 64),
    nxt AS (SELECT day - 1 AS day, u FROM sketch),
    merged AS (
        SELECT DISTINCT day, u FROM (
            SELECT day, u FROM sketch
            UNION ALL SELECT day, u FROM nxt)),
    union_sk AS (
        SELECT day, u, rk FROM (
            SELECT day, u,
                   row_number() OVER (PARTITION BY day ORDER BY u) AS rk
            FROM merged)
        WHERE rk <= 64),
    marked AS (
        SELECT us.day, us.u, us.rk,
               CASE WHEN a.u IS NOT NULL THEN 1 ELSE 0 END AS in_a,
               CASE WHEN b.u IS NOT NULL THEN 1 ELSE 0 END AS in_b
        FROM union_sk us
        LEFT JOIN sketch a ON a.day = us.day AND a.u = us.u
        LEFT JOIN nxt b ON b.day = us.day AND b.u = us.u),
    pair_est AS (
        SELECT day,
               CAST(count(*) AS BIGINT) AS n_union_sketch,
               max(CASE WHEN rk = 64 THEN u END) AS uk,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        FROM marked GROUP BY day),
    a_cnt AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n_a_exact
        FROM du GROUP BY day),
    b_cnt AS (
        SELECT day - 1 AS day, CAST(count(*) AS BIGINT) AS n_b_exact
        FROM du GROUP BY day - 1),
    inter AS (
        SELECT x.day, CAST(count(*) AS BIGINT) AS inter_exact
        FROM du x JOIN du y
          ON y.day = x.day + 1 AND y.user_id = x.user_id
        GROUP BY x.day),
    est AS (
        SELECT p.day, a.n_a_exact, b.n_b_exact,
               CAST(coalesce(i.inter_exact, 0) AS BIGINT) AS inter_exact,
               CAST(a.n_a_exact + b.n_b_exact
                    - coalesce(i.inter_exact, 0) AS BIGINT) AS union_exact,
               CASE WHEN p.n_union_sketch < 64
                    THEN CAST(p.n_union_sketch AS DOUBLE)
                    ELSE 63.0 / p.uk END AS eu,
               p.n_both / CAST(p.n_union_sketch AS DOUBLE) AS jac
        FROM pair_est p
        JOIN a_cnt a ON a.day = p.day
        JOIN b_cnt b ON b.day = p.day
        LEFT JOIN inter i ON i.day = p.day)
    SELECT day, n_a_exact, n_b_exact, inter_exact, union_exact,
           round(eu, 4) AS union_est,
           round(jac, 6) AS jaccard_est,
           CAST(round(jac * eu) AS BIGINT) AS inter_est
    FROM est ORDER BY day
"""

# Streaming Welch twin (round 8): the mean-shift monitor maintained
# by the stream — state is the 2-row exact integer moment frame, the
# readout is the shared kernel, the oracle is the batch test's SQL.
QUERIES["stream_welch_drift"] = replay.stream_welch_drift
ORACLES["stream_welch_drift"] = ORACLES["welch_ttest_drift"]

# Embedding dimension correlation (round 8): cross-moment redundancy
# QA — exact 1e-6 integer folds widened to DECIMAL(38,0), Pearson r in
# identical double shape, ordered by the |r| integer micro.
QUERIES["embedding_correlation_pairs"] = (
    similarity.embedding_correlation_pairs
)
ORACLES["embedding_correlation_pairs"] = """
    WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings),
    vals AS (
        SELECT vec_id,
               unnest(range(0, len(emb))) AS pos,
               CAST(round(unnest(emb) * 1e6) AS BIGINT) AS vm
        FROM b),
    per_dim AS (
        SELECT pos, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vm) AS BIGINT) AS s1,
               sum(CAST(vm AS HUGEINT) * vm) AS s2
        FROM vals GROUP BY pos),
    pair_sums AS (
        SELECT a.pos AS i, bb.pos AS j,
               sum(CAST(a.vm AS HUGEINT) * bb.vm) AS sij
        FROM vals a JOIN vals bb
          ON a.vec_id = bb.vec_id AND a.pos < bb.pos
        GROUP BY a.pos, bb.pos),
    m AS (
        SELECT p.i, p.j, di.n AS n_vecs,
               CAST(di.n AS DOUBLE) * CAST(p.sij AS DOUBLE)
                   - CAST(di.s1 AS DOUBLE) * dj.s1 AS num,
               CAST(di.n AS DOUBLE) * CAST(di.s2 AS DOUBLE)
                   - CAST(di.s1 AS DOUBLE) * di.s1 AS var_i,
               CAST(di.n AS DOUBLE) * CAST(dj.s2 AS DOUBLE)
                   - CAST(dj.s1 AS DOUBLE) * dj.s1 AS var_j
        FROM pair_sums p
        JOIN per_dim di ON di.pos = p.i
        JOIN per_dim dj ON dj.pos = p.j)
    SELECT CAST(i AS INTEGER) AS dim_i,
           CAST(j AS INTEGER) AS dim_j,
           n_vecs,
           round(num / sqrt(var_i * var_j), 6) AS r
    FROM m
    WHERE var_i > 0 AND var_j > 0
    ORDER BY CAST(round(abs(num / sqrt(var_i * var_j)) * 1e6) AS BIGINT)
                 DESC,
             dim_i, dim_j
    LIMIT 20
"""

# URL canonicalization dedup (round 8): C4-style collapse of
# syntactic URL variants — synthesized messy URLs (planted-data
# discipline), anchored-regexp canonicalizer replayed by the oracle.
QUERIES["url_canonical_dedup"] = dedup.url_canonical_dedup
ORACLES["url_canonical_dedup"] = r"""
    WITH d AS (SELECT doc_id, source FROM documents),
    drawn AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('url:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uu,
               ('0x' || substr(md5('case:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uc,
               ('0x' || substr(md5('www:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uw,
               ('0x' || substr(md5('scheme:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS us,
               ('0x' || substr(md5('slash:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS ul,
               ('0x' || substr(md5('utm:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS ut
        FROM d),
    built AS (
        SELECT source,
               (CASE WHEN us < 0.5 THEN 'http://' ELSE 'https://' END)
               || (CASE WHEN uw < 0.3 THEN 'www.' ELSE '' END)
               || (CASE WHEN uc < 0.2
                        THEN upper('site' || CAST(CAST(floor(uu * uu * 40)
                                       AS BIGINT) AS VARCHAR)
                                   || '.example.com')
                        ELSE 'site' || CAST(CAST(floor(uu * uu * 40)
                                       AS BIGINT) AS VARCHAR)
                             || '.example.com' END)
               || '/page/' || CAST(doc_id % 20 AS VARCHAR)
               || (CASE WHEN ul < 0.3 THEN '/' ELSE '' END)
               || (CASE WHEN ut < 0.4
                        THEN '?utm_source=feed&utm_campaign=x'
                        ELSE '' END) AS raw_url
        FROM drawn),
    canon AS (
        SELECT source, raw_url,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(raw_url), '^https?://', ''),
                     '^www\.', ''),
                   '\?utm_[a-z_=&]*$', ''),
                 '/+$', '') AS c_url
        FROM built)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_urls,
           CAST(count(DISTINCT c_url) AS BIGINT) AS n_canonical_urls,
           CAST(count(DISTINCT raw_url) - count(DISTINCT c_url)
                AS BIGINT) AS n_collapsed,
           round((count(DISTINCT raw_url) - count(DISTINCT c_url))
                 / CAST(count(DISTINCT raw_url) AS DOUBLE), 6)
               AS collapse_frac
    FROM canon GROUP BY source ORDER BY source
"""

# Differentially-private count release (round 8): Laplace(1/eps) via
# the md5-uniform inverse CDF — data-derived draw, oracle-replayable;
# production swaps in a secure RNG, release shape unchanged.
QUERIES["dp_noisy_counts"] = quality.dp_noisy_counts
ORACLES["dp_noisy_counts"] = """
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_true
        FROM documents GROUP BY lang),
    drawn AS (
        SELECT lang, n_true,
               ('0x' || substr(md5('dp:' || lang), 1, 8))::BIGINT
                   / 4294967296.0 - 0.5 AS c
        FROM counts)
    SELECT lang, n_true,
           round(n_true + (-1.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 4)
               AS n_noisy,
           round(abs((-1.0) * sign(c) * ln(1.0 - 2.0 * abs(c))), 4)
               AS abs_err,
           CAST(1.0 AS DOUBLE) AS eps
    FROM drawn ORDER BY lang
"""


# Exact per-segment ROC-AUC (round 8): midrank rank-sum identity over
# the value histogram — BIGINT folds, one division at the end.
def _exact_auc_by_group_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import exact_auc_by_group

    return exact_auc_by_group(spark, sf_dir)


QUERIES["exact_auc_by_group"] = _exact_auc_by_group_query
ORACLES["exact_auc_by_group"] = """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders),
    hist AS (
        SELECT grp, cents,
               CAST(count(*) AS BIGINT) AS t,
               CAST(sum(pos) AS BIGINT) AS tp
        FROM o GROUP BY grp, cents),
    cum AS (
        SELECT *, CAST(sum(t) OVER (PARTITION BY grp ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM hist),
    folds AS (
        SELECT grp,
               CAST(sum(tp * (2 * (c - t) + t + 1)) AS BIGINT) AS r2,
               CAST(sum(tp) AS BIGINT) AS n_pos,
               CAST(sum(t - tp) AS BIGINT) AS n_neg
        FROM cum GROUP BY grp)
    SELECT grp, n_pos, n_neg,
           round((r2 - n_pos * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * ((r2 - n_pos * (n_pos + 1))
                        / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM folds ORDER BY grp
"""

# Poisson bootstrap CI (round 8): all B replicas in ONE pass via
# per-(row, replica) Poisson(1) weights — md5-uniform draws through
# the frozen 12-dp inverse-CDF table (analytics.POISSON1_CDF).
QUERIES["bootstrap_ci_mean"] = analytics.bootstrap_ci_mean
ORACLES["bootstrap_ci_mean"] = f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    reps AS (
        SELECT event_type, vc, b, event_id,
               ('0x' || substr(md5('boot:' || CAST(event_id AS VARCHAR)
                               || '_' || CAST(b AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM ev CROSS JOIN (SELECT unnest(range(0, 200)) AS b) bs),
    weighted AS (
        SELECT event_type, b,
               {analytics.POISSON1_CASE_SQL} AS w,
               ({analytics.POISSON1_CASE_SQL}) * vc AS wv
        FROM reps),
    replica_means AS (
        SELECT event_type, b,
               CAST(sum(wv) AS BIGINT)
                   / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS m_b
        FROM weighted GROUP BY event_type, b),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY m_b, b) AS rk
        FROM replica_means),
    bounds AS (
        SELECT event_type,
               round(max(CASE WHEN rk = 5 THEN m_b END) / 100.0, 6)
                   AS ci_lo,
               round(max(CASE WHEN rk = 195 THEN m_b END) / 100.0, 6)
                   AS ci_hi
        FROM ranked GROUP BY event_type),
    point AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(vc) AS BIGINT)
                     / CAST(count(*) AS DOUBLE) / 100.0, 6) AS mean
        FROM ev GROUP BY event_type)
    SELECT p.event_type, p.n, p.mean, b.ci_lo, b.ci_hi,
           round(b.ci_hi - b.ci_lo, 6) AS ci_width
    FROM point p JOIN bounds b USING (event_type)
    ORDER BY p.event_type
"""

# LSH band-config sweep (round 8): the S-curve tuning audit — every
# (bands × rows) config's candidate volume from ONE signature frame.
def _lsh_band_sweep_oracle() -> str:
    from project_bigdata_recsys_spark.functions.dedup import (
        LSH_SWEEP_CONFIGS,
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b})"
        f" % {MINHASH_PRIME})) AS m{i}"
        for i, (a, b) in enumerate(minhash_params(16))
    )
    blocks = []
    for b_cnt, r in LSH_SWEEP_CONFIGS:
        thresh = round((1.0 / b_cnt) ** (1.0 / r), 6)
        keys = lambda i: ", ".join(  # noqa: E731
            f"m{i * r + j} AS k{j}" for j in range(r)
        )
        bands = "\n                UNION ALL ".join(
            f"SELECT doc_id, {i} AS band_no, {keys(i)} FROM sig"
            for i in range(b_cnt)
        )
        on = " AND ".join(f"x.k{j} = y.k{j}" for j in range(r))
        grp = ", ".join(f"k{j}" for j in range(r))
        matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(16))
        blocks.append(f"""
        SELECT CAST({b_cnt} AS BIGINT) AS n_bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               {thresh!r} AS threshold_50,
               (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT band_no, {grp} FROM ({bands}) t
                    GROUP BY band_no, {grp} HAVING count(*) >= 2))
                   AS n_hot_buckets,
               (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                    FROM ({bands}) x JOIN ({bands}) y
                      ON x.band_no = y.band_no AND {on}
                         AND x.doc_id < y.doc_id))
                   AS n_candidate_pairs,
               (SELECT CASE WHEN count(*) > 0
                            THEN round(sum({matches})
                                       / (16.0 * count(*)), 6) END
                FROM (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                      FROM ({bands}) x JOIN ({bands}) y
                        ON x.band_no = y.band_no AND {on}
                           AND x.doc_id < y.doc_id) c
                JOIN sig sa ON sa.doc_id = c.a
                JOIN sig sb ON sb.doc_id = c.b)
                   AS avg_est_jaccard""")
    union = "\n        UNION ALL".join(blocks)
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq)
        {union}
        ORDER BY n_bands DESC
    """


QUERIES["lsh_band_sweep"] = dedup.lsh_band_sweep
ORACLES["lsh_band_sweep"] = _lsh_band_sweep_oracle()

# RM3 pseudo-relevance feedback (round 8): expansion terms from the
# BM25 feedback set — relevance-model weights in integer 1e-9 units,
# integer total order with term tiebreak.
QUERIES["rm3_query_expansion"] = text.rm3_query_expansion
ORACLES["rm3_query_expansion"] = """
    WITH toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY term),
    q AS (SELECT term, doc_freq FROM dft
          ORDER BY total_tf DESC, term LIMIT 3),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
    scored AS (
        SELECT tf.term, tf.doc_id,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    fb AS (
        SELECT term AS query_term, doc_id
        FROM (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY bm25 DESC, doc_id) AS rk
              FROM scored)
        WHERE rk <= 10),
    cand AS (
        SELECT fb.query_term, tf.term,
               CAST(round(1e9 * tf.tf / dl.dl) AS BIGINT) AS w_micro,
               tf.doc_id
        FROM tf
        JOIN fb ON fb.doc_id = tf.doc_id
        JOIN dl ON dl.doc_id = tf.doc_id
        WHERE tf.term <> fb.query_term),
    rm AS (
        SELECT query_term, term,
               CAST(sum(w_micro) AS BIGINT) AS rm_micro,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_support
        FROM cand GROUP BY query_term, term),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_term
                                     ORDER BY rm_micro DESC, term) AS rnk
        FROM rm)
    SELECT query_term, term AS expansion_term,
           CAST(rnk AS INT) AS rank,
           round(rm_micro / 10.0 / 1e9, 6) AS rm_weight,
           doc_support
    FROM ranked WHERE rnk <= 5
    ORDER BY query_term, rnk
"""

# CUSUM changepoint (round 8): localizes the level shift the drift
# quartet detects — integer deviation path n·yᵢ − T, BIGINT cumsum,
# integer argmax.
QUERIES["cusum_changepoint"] = analytics.cusum_changepoint
ORACLES["cusum_changepoint"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events),
    daily AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
        FROM ev GROUP BY event_type, day),
    totals AS (
        SELECT event_type, CAST(sum(y) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type),
    dev AS (
        SELECT d.event_type, d.day, t.total, t.n_days,
               CAST(t.n_days * d.y - t.total AS BIGINT) AS dd
        FROM daily d JOIN totals t USING (event_type)),
    path AS (
        SELECT *, CAST(sum(dd) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
        FROM dev),
    picked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs(s) DESC, day) AS rk
        FROM path)
    SELECT event_type, n_days, total, day AS peak_day,
           round(abs(s) / CAST(n_days AS DOUBLE), 4) AS cusum_max,
           CAST(sign(s) AS INT) AS shift_sign
    FROM picked WHERE rk = 1
    ORDER BY event_type
"""

# Streaming bootstrap twin (round 8): per-(segment, replica) integer
# (Σw, Σw·v) state, point estimate as the identity replica b = −1,
# shared readout — same oracle as the batch operator.
QUERIES["stream_bootstrap_ci"] = replay.stream_bootstrap_ci
ORACLES["stream_bootstrap_ci"] = ORACLES["bootstrap_ci_mean"]

# CMS join-size estimation (round 8): sketch inner product bounds the
# equi-join cardinality — integer counters, estimate hash-checked
# outright, exact Σc² as the gate readout.
QUERIES["cms_join_size_estimate"] = relational.cms_join_size_estimate
ORACLES["cms_join_size_estimate"] = """
    WITH li AS (
        SELECT l_partkey AS key FROM lineitem),
    ev AS (SELECT user_id AS key FROM events),
    both_t AS (
        SELECT 'lineitem.l_partkey' AS table_key, key FROM li
        UNION ALL
        SELECT 'events.user_id' AS table_key, key FROM ev),
    counts AS (
        SELECT table_key, key, CAST(count(*) AS BIGINT) AS c
        FROM both_t GROUP BY table_key, key),
    positions AS (
        SELECT table_key, j, c,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(key AS VARCHAR)), 1, 8))::BIGINT
                   % 512 AS pos
        FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    cms AS (
        SELECT table_key, j, pos, CAST(sum(c) AS BIGINT) AS cnt
        FROM positions GROUP BY table_key, j, pos),
    est AS (
        SELECT table_key, CAST(min(ip) AS BIGINT) AS cms_estimate
        FROM (SELECT table_key, j,
                     CAST(sum(cnt * cnt) AS BIGINT) AS ip
              FROM cms GROUP BY table_key, j)
        GROUP BY table_key),
    exact AS (
        SELECT table_key,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(c * c) AS BIGINT) AS exact_self_join
        FROM counts GROUP BY table_key)
    SELECT e.table_key, e.n_rows, e.n_keys, e.exact_self_join,
           s.cms_estimate,
           round((s.cms_estimate - e.exact_self_join)
                 / CAST(e.exact_self_join AS DOUBLE), 6) AS overest_frac
    FROM exact e JOIN est s USING (table_key)
    ORDER BY e.table_key
"""

# Seasonal-naive backtest (round 8): the baseline every forecast must
# beat — BIGINT |y−ŷ| folds, MAPE in integer 1e-6 units.
QUERIES["seasonal_naive_eval"] = analytics.seasonal_naive_eval
ORACLES["seasonal_naive_eval"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events),
    daily AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
        FROM ev GROUP BY event_type, day),
    joined AS (
        SELECT a.event_type, a.y, b.y AS yhat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day = b.day + 7),
    folds AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(abs(y - yhat)) AS BIGINT) AS sae,
               CAST(sum(y - yhat) AS BIGINT) AS sbias,
               CAST(sum(CAST(round(1000000.0 * abs(y - yhat) / y)
                             AS BIGINT)) AS BIGINT) AS sape_micro
        FROM joined GROUP BY event_type)
    SELECT event_type, n_eval,
           round(sae / CAST(n_eval AS DOUBLE), 4) AS mae,
           round(sape_micro / CAST(n_eval AS DOUBLE) / 1000000.0, 6)
               AS mape,
           round(sbias / CAST(n_eval AS DOUBLE), 4) AS bias
    FROM folds ORDER BY event_type
"""

# Recursive CTE through the SQL surface (round 8): the calendar
# scaffold gap fill as WITH RECURSIVE — the shared template runs on
# both engines, only the epoch-seconds token differs.
QUERIES["sql_recursive_cte"] = sqlsurface.sql_recursive_cte
ORACLES["sql_recursive_cte"] = sqlsurface.SQL_RECURSIVE_CTE_TEXT.format(
    EPOCH="epoch(ts)"
)

# Streaming CUSUM twin (round 8): day-window count state kept by the
# stream, exact integer argmax through the shared kernel — same oracle
# as the batch localizer.
QUERIES["stream_cusum_changepoint"] = replay.stream_cusum_changepoint
ORACLES["stream_cusum_changepoint"] = ORACLES["cusum_changepoint"]

# Winsorized robust means (round 8): clip at the EXACT global 1%/99%
# thresholds (range-shuffle kernel) — BIGINT folds throughout.
QUERIES["winsorized_stats"] = analytics.winsorized_stats
ORACLES["winsorized_stats"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
    hist AS (SELECT vc, CAST(count(*) AS BIGINT) AS c
             FROM ev GROUP BY vc),
    cum AS (
        SELECT vc, CAST(sum(c) OVER (ORDER BY vc
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        FROM hist),
    lo AS (SELECT min(vc) AS lo_t FROM cum CROSS JOIN n_t
           WHERE cm >= 0.01 * n),
    hi AS (SELECT min(vc) AS hi_t FROM cum CROSS JOIN n_t
           WHERE cm >= 0.99 * n),
    clipped AS (
        SELECT event_type, vc,
               greatest(lo_t, least(hi_t, vc)) AS wc,
               CASE WHEN vc < lo_t THEN 1 ELSE 0 END AS clo,
               CASE WHEN vc > hi_t THEN 1 ELSE 0 END AS chi
        FROM ev CROSS JOIN lo CROSS JOIN hi)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(vc) AS BIGINT)
                 / CAST(count(*) AS DOUBLE) / 100.0, 6) AS raw_mean,
           round(CAST(sum(wc) AS BIGINT)
                 / CAST(count(*) AS DOUBLE) / 100.0, 6)
               AS winsorized_mean,
           CAST(sum(clo) AS BIGINT) AS n_clipped_lo,
           CAST(sum(chi) AS BIGINT) AS n_clipped_hi
    FROM clipped GROUP BY event_type ORDER BY event_type
"""

# Degree distribution + Hill tail exponent (round 8): integer log2
# buckets via length(bin(d))−1, per-key ln frozen to 1e-6 units, the
# d_min−½ correction as a frozen 12-dp literal.
QUERIES["degree_distribution_profile"] = (
    analytics.degree_distribution_profile
)
ORACLES["degree_distribution_profile"] = f"""
    WITH deg AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS d
        FROM lineitem GROUP BY l_partkey),
    buckets AS (
        SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(min(d) AS BIGINT) AS min_degree,
               CAST(max(d) AS BIGINT) AS max_degree
        FROM deg GROUP BY length(bin(d)) - 1),
    tail AS (
        SELECT CAST(count(*) AS BIGINT) AS n_tail,
               CAST(sum(CAST(round(ln(d) * 1000000.0) AS BIGINT))
                    AS BIGINT) AS sln_micro
        FROM deg WHERE d >= 2),
    alpha AS (
        SELECT n_tail,
               round(1.0 + n_tail / (sln_micro / 1000000.0
                     - n_tail * {analytics.math_log_half(2)!r}), 6)
                   AS hill_alpha
        FROM tail)
    SELECT bucket, n_keys, min_degree, max_degree, n_tail, hill_alpha
    FROM buckets CROSS JOIN alpha
    ORDER BY bucket
"""

# CUPED variance-reduced A/B readout (round 8): θ = cov/var from
# pooled integer-cent moments; adjusted means collapse algebraically —
# no per-row adjusted value, identical double shapes.
QUERIES["cuped_adjusted_lift"] = analytics.cuped_adjusted_lift
ORACLES["cuped_adjusted_lift"] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT CASE WHEN ('0x' || substr(md5('ab:'
                        || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               user_id,
               CAST(sum(CASE WHEN day <= m THEN vc ELSE 0 END) AS BIGINT)
                   AS x,
               CAST(sum(CASE WHEN day > m THEN vc ELSE 0 END) AS BIGINT)
                   AS y
        FROM ev CROSS JOIN mid GROUP BY 1, 2),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM per_user),
    arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS ax,
               CAST(sum(y) AS BIGINT) AS ay
        FROM per_user GROUP BY arm),
    m2 AS (
        SELECT a.*, p.n, p.sx,
               CAST(p.n AS DOUBLE) * p.sxy
                   - CAST(p.sx AS DOUBLE) * p.sy AS cov_n,
               CAST(p.n AS DOUBLE) * p.sxx
                   - CAST(p.sx AS DOUBLE) * p.sx AS var_x_n,
               CAST(p.n AS DOUBLE) * p.syy
                   - CAST(p.sy AS DOUBLE) * p.sy AS var_y_n
        FROM arms a CROSS JOIN pooled p)
    SELECT arm, n_users,
           round(ay / CAST(n_users AS DOUBLE) / 100.0, 6) AS mean_y,
           round((ay / CAST(n_users AS DOUBLE)
                  - (cov_n / var_x_n)
                    * (ax / CAST(n_users AS DOUBLE)
                       - sx / CAST(n AS DOUBLE))) / 100.0, 6)
               AS mean_y_cuped,
           round(cov_n / var_x_n, 6) AS theta,
           round(1.0 - (var_y_n - 2.0 * (cov_n / var_x_n) * cov_n
                        + (cov_n / var_x_n) * (cov_n / var_x_n) * var_x_n)
                       / var_y_n, 6) AS var_reduction
    FROM m2 ORDER BY arm
"""

# Neyman-optimal allocation (round 8): n_h ∝ N_h·S_h with per-stratum
# weights frozen to integers before the total fold.
QUERIES["neyman_allocation_plan"] = analytics.neyman_allocation_plan
ORACLES["neyman_allocation_plan"] = """
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    moments AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(vc) AS BIGINT) AS s,
               CAST(sum(vc * vc) AS BIGINT) AS ss
        FROM ev GROUP BY event_type),
    weighted AS (
        SELECT event_type, n_rows,
               round(sqrt((ss - s * (s / CAST(n_rows AS DOUBLE)))
                          / (CAST(n_rows AS DOUBLE) - 1.0)) / 100.0, 4)
                   AS std,
               CAST(round(n_rows
                          * sqrt((ss - s * (s / CAST(n_rows AS DOUBLE)))
                                 / (CAST(n_rows AS DOUBLE) - 1.0))
                          * 10000.0) AS BIGINT) AS weight_micro
        FROM moments),
    total AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS tw
              FROM weighted)
    SELECT event_type, n_rows, std, weight_micro,
           CAST(round(1000.0 * weight_micro / tw) AS BIGINT) AS alloc_n
    FROM weighted CROSS JOIN total
    ORDER BY event_type
"""

# Rendezvous sharding plan (round 8): highest-random-weight placement;
# the W → W+1 expansion audit — md5-integer argmax per key.
QUERIES["rendezvous_shard_plan"] = skew.rendezvous_shard_plan
ORACLES["rendezvous_shard_plan"] = """
    WITH keys AS (SELECT DISTINCT user_id AS key FROM events),
    hw AS (
        SELECT key, w,
               ('0x' || substr(md5(CAST(key AS VARCHAR) || '@'
                               || CAST(w AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM keys CROSS JOIN (SELECT unnest(range(0, 9)) AS w) ws),
    after_a AS (
        SELECT key, w AS shard_after FROM (
            SELECT key, w, row_number() OVER (PARTITION BY key
                           ORDER BY h DESC, w DESC) AS rn
            FROM hw) WHERE rn = 1),
    before_a AS (
        SELECT key, w AS shard_before FROM (
            SELECT key, w, row_number() OVER (PARTITION BY key
                           ORDER BY h DESC, w DESC) AS rn
            FROM hw WHERE w < 8) WHERE rn = 1),
    assigned AS (
        SELECT a.key, a.shard_after, b.shard_before
        FROM after_a a JOIN before_a b USING (key)),
    audit AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys_total,
               round(sum(CASE WHEN shard_after <> shard_before
                              THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS moved_frac,
               round(1.0 / 9, 6) AS expected_moved_frac
        FROM assigned),
    ca AS (SELECT shard_after AS shard,
                  CAST(count(*) AS BIGINT) AS n_keys_after
           FROM assigned GROUP BY shard_after),
    cb AS (SELECT shard_before AS shard,
                  CAST(count(*) AS BIGINT) AS n_keys_before
           FROM assigned GROUP BY shard_before)
    SELECT ca.shard, cb.n_keys_before, ca.n_keys_after,
           n_keys_total, moved_frac, expected_moved_frac
    FROM ca LEFT JOIN cb USING (shard)
    CROSS JOIN audit
    ORDER BY ca.shard
"""

# DSIR importance resampling (round 8, session 3): hashed
# unigram+bigram log importance ratios, target = lang='en'; micro
# fixed-point freeze before the per-doc sum keeps every weight exact.
QUERIES["dsir_importance_sample"] = curation.dsir_importance_sample
ORACLES["dsir_importance_sample"] = """
    WITH d AS (
        SELECT doc_id, source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    f AS (
        SELECT doc_id, tgt,
               unnest(list_concat(toks,
                   CASE WHEN len(toks) >= 2
                        THEN list_transform(range(1, len(toks)),
                                            i -> toks[i] || '_' || toks[i + 1])
                        ELSE [] END)) AS term
        FROM d),
    h AS (
        SELECT doc_id, tgt,
               ('0x' || substr(md5('dsir:' || term), 1, 8))::BIGINT % 512
                   AS bucket
        FROM f),
    counts AS (
        SELECT bucket, CAST(sum(tgt) AS BIGINT) AS ct,
               CAST(sum(1 - tgt) AS BIGINT) AS cr
        FROM h GROUP BY bucket),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS T,
                   CAST(sum(cr) AS BIGINT) AS R FROM counts),
    wts AS (
        SELECT bucket,
               CAST(round(1000000.0 * (ln((ct + 1) / (T + 512.0))
                                       - ln((cr + 1) / (R + 512.0))))
                    AS BIGINT) AS w
        FROM counts CROSS JOIN tot),
    docw AS (
        SELECT doc_id, CAST(sum(w) AS BIGINT) AS lw
        FROM h JOIN wts USING (bucket) GROUP BY doc_id),
    scored AS (
        SELECT d.doc_id, d.source, d.tgt, coalesce(docw.lw, 0) AS lw
        FROM d LEFT JOIN docw USING (doc_id))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - tgt) AS BIGINT) AS n_raw,
           round(sum(lw) / 1000000.0 / count(*), 6) AS avg_logw,
           CAST(sum(CASE WHEN tgt = 0 AND lw > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           round(CASE WHEN sum(1 - tgt) > 0
                      THEN sum(CASE WHEN tgt = 0 AND lw > 0
                                    THEN 1 ELSE 0 END)
                           * 1.0 / sum(1 - tgt)
                      ELSE 0.0 END, 4) AS sel_frac
    FROM scored GROUP BY source ORDER BY source
"""

# ACF + Ljung-Box (round 8, session 3): demeaned autocorrelation as
# pure BIGINT cross-moments (one exact division per lag); Q from the
# ROUNDED r_k so both engines fold identical doubles.
QUERIES["acf_ljung_box"] = analytics.acf_ljung_box
ORACLES["acf_ljung_box"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1,
               CAST(max(day) - min(day) + 1 AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ss
        FROM c GROUP BY event_type),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    ck AS (
        SELECT t.event_type, l.lag,
               CAST(sum(t.x * p.x) AS BIGINT) AS c_k
        FROM c t CROSS JOIN lags l
        JOIN c p ON p.event_type = t.event_type
                AND t.day = p.day + l.lag
        GROUP BY 1, 2),
    clip AS (
        SELECT c.event_type, l.lag,
               CAST(sum(CASE WHEN c.day >= b.d0 + l.lag THEN c.x
                             ELSE 0 END) AS BIGINT) AS a_k,
               CAST(sum(CASE WHEN c.day <= b.d1 - l.lag THEN c.x
                             ELSE 0 END) AS BIGINT) AS b_k
        FROM c JOIN b USING (event_type) CROSS JOIN lags l
        GROUP BY 1, 2),
    r AS (
        SELECT clip.event_type, clip.lag, b.n AS n_days,
               round((b.n * b.n * coalesce(ck.c_k, 0)
                      - b.n * b.s * (clip.a_k + clip.b_k)
                      + (b.n - clip.lag) * b.s * b.s) * 1.0
                     / (b.n * b.n * b.ss - b.n * b.s * b.s), 6) AS acf
        FROM clip
        LEFT JOIN ck ON ck.event_type = clip.event_type
                    AND ck.lag = clip.lag
        JOIN b ON b.event_type = clip.event_type
        WHERE clip.lag < b.n)
    SELECT event_type, lag, n_days, acf,
           round(n_days * (n_days + 2)
                 * sum(acf * acf / (n_days - lag))
                       OVER (PARTITION BY event_type ORDER BY lag),
                 4) AS q_stat
    FROM r
    ORDER BY event_type, lag
"""

# Benford first-digit audit (round 8, session 3): digit from the
# integer-cents STRING (never float formatting / log10); expected
# fractions rounded to 6 dp and chi-square terms frozen to micro
# fixed point before the fold.
QUERIES["benford_audit"] = quality.benford_audit
ORACLES["benford_audit"] = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS observed
        FROM orders
        GROUP BY 1 HAVING digit >= 1),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM digits),
    scored AS (
        SELECT digit, observed,
               round(observed * 1.0 / n, 6) AS obs_frac,
               round((ln(digit + 1) - ln(digit)) / ln(10.0), 6) AS exp_frac,
               CAST(round(1000000.0
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          / (round((ln(digit + 1) - ln(digit))
                                   / ln(10.0), 6) * n)) AS BIGINT) AS chi
        FROM digits CROSS JOIN tot),
    total_chi AS (
        SELECT round(sum(chi) / 1000000.0, 4) AS chi_square FROM scored)
    SELECT digit, observed, obs_frac, exp_frac, chi_square
    FROM scored CROSS JOIN total_chi
    ORDER BY digit
"""

# Split-conformal intervals (round 8, session 3): exact integer-cent
# order statistic at the finite-sample conformal rank; coverage on a
# held-out md5 split.
def _conformal_interval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import conformal_interval_eval

    return conformal_interval_eval(spark, sf_dir)


QUERIES["conformal_interval_eval"] = _conformal_interval_eval
ORACLES["conformal_interval_eval"] = """
    WITH o AS (
        SELECT o_orderpriority AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5('conf:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT % 4 AS b
        FROM orders),
    model AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n_train,
               CAST(round(sum(cents) * 1.0 / count(*)) AS BIGINT)
                   AS pred_cents
        FROM o WHERE b <= 1 GROUP BY prio),
    cal AS (
        SELECT o.prio, abs(cents - pred_cents) AS score,
               CAST(count(*) AS BIGINT) AS n
        FROM o JOIN model USING (prio) WHERE b = 2
        GROUP BY 1, 2),
    ranked AS (
        SELECT prio, score,
               sum(n) OVER (PARTITION BY prio ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               CAST(sum(n) OVER (PARTITION BY prio) AS BIGINT) AS n_calib
        FROM cal),
    q AS (
        SELECT prio, n_calib, CAST(min(score) AS BIGINT) AS q_hat_cents
        FROM ranked
        WHERE cum_n >= CAST(ceil((n_calib + 1) * 9.0 / 10) AS BIGINT)
        GROUP BY prio, n_calib),
    cov AS (
        SELECT o.prio, n_train, n_calib, pred_cents, q_hat_cents,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN abs(cents - pred_cents) <= q_hat_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM o JOIN model USING (prio) JOIN q USING (prio)
        WHERE b = 3
        GROUP BY 1, 2, 3, 4, 5)
    SELECT prio, n_train, n_calib, n_test,
           round(pred_cents / 100.0, 2) AS pred_price,
           round(q_hat_cents / 100.0, 2) AS q_hat_price,
           round(n_covered * 1.0 / n_test, 4) AS coverage,
           0.9 AS target_coverage
    FROM cov ORDER BY prio
"""

# Bradley-Terry preference ratings (round 8, session 3): MM updates
# unrolled like _pagerank_oracle, each iterate frozen to 6 dp.
def _bradley_terry_oracle(iters: int = 8) -> str:
    its = []
    prev = "r0"
    for t in range(1, iters + 1):
        its.append(f"""
        d{t} AS (
            SELECT wt.i, wt.W, sum(wt.g / (pi.r + pj.r)) AS den
            FROM wt JOIN {prev} pi ON pi.item = wt.i
                    JOIN {prev} pj ON pj.item = wt.j
            GROUP BY wt.i, wt.W),
        u{t} AS MATERIALIZED (SELECT i AS item, W / den AS u FROM d{t}),
        s{t} AS (SELECT sum(u) AS s FROM u{t}),
        r{t} AS MATERIALIZED (SELECT item, round(u / s, 6) AS r
                 FROM u{t} CROSS JOIN s{t})""")
        prev = f"r{t}"
    return f"""
    WITH cnt AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    duels AS (
        SELECT a.event_type AS ti, b.event_type AS tj, a.n AS ni, b.n AS nj
        FROM cnt a JOIN cnt b ON a.user_id = b.user_id
                            AND a.event_type < b.event_type
        WHERE a.n <> b.n),
    wins AS MATERIALIZED (
        SELECT CASE WHEN ni > nj THEN ti ELSE tj END AS winner,
               CASE WHEN ni > nj THEN tj ELSE ti END AS loser,
               CAST(count(*) AS BIGINT) AS w
        FROM duels GROUP BY 1, 2),
    games AS MATERIALIZED (
        SELECT i, j, CAST(sum(w) AS BIGINT) AS g FROM (
            SELECT winner AS i, loser AS j, w FROM wins
            UNION ALL SELECT loser, winner, w FROM wins)
        GROUP BY i, j),
    wtot AS (SELECT winner AS i, CAST(sum(w) AS BIGINT) AS W
             FROM wins GROUP BY winner),
    wt AS MATERIALIZED (SELECT g.i, g.j, g.g, coalesce(wtot.W, 0) AS W
           FROM games g LEFT JOIN wtot ON wtot.i = g.i),
    r0 AS MATERIALIZED (SELECT DISTINCT i AS item, 1.0 AS r FROM games),
    {",".join(its)},
    per AS (SELECT winner AS item, CAST(sum(w) AS BIGINT) AS n_wins
            FROM wins GROUP BY winner),
    ng AS (SELECT i AS item, CAST(sum(g) AS BIGINT) AS n_games
           FROM games GROUP BY i)
    SELECT r.item, coalesce(per.n_wins, 0) AS n_wins,
           coalesce(ng.n_games, 0) AS n_games, r.r AS rating
    FROM {prev} r LEFT JOIN per USING (item) LEFT JOIN ng USING (item)
    ORDER BY rating DESC, item
    """


QUERIES["bradley_terry_ratings"] = analytics.bradley_terry_ratings
ORACLES["bradley_terry_ratings"] = _bradley_terry_oracle()

# HITS authorities (round 8, session 3): mean-1 normalization per
# half-step, each iterate frozen to 6 dp; unrolled like pagerank.
def _hits_oracle(iters: int = 3, k: int = 25) -> str:
    parts = []
    prev_h = "h0"
    prev_a = None
    for t in range(1, iters + 1):
        parts.append(f"""
        a{t}r AS (SELECT auth, sum(h) AS a
                  FROM e JOIN {prev_h} USING (hub) GROUP BY auth),
        a{t} AS (SELECT auth,
                        round(a / (SELECT sum(a) / count(*) FROM a{t}r), 6)
                            AS a
                 FROM a{t}r),
        h{t}r AS (SELECT hub, sum(a) AS h
                  FROM e JOIN a{t} USING (auth) GROUP BY hub),
        h{t} AS (SELECT hub,
                        round(h / (SELECT sum(h) / count(*) FROM h{t}r), 6)
                            AS h
                 FROM h{t}r)""")
        prev_h = f"h{t}"
        prev_a = f"a{t}"
    return f"""
    WITH e AS (SELECT DISTINCT l_orderkey AS hub, l_partkey AS auth
               FROM lineitem),
    h0 AS (SELECT DISTINCT hub, 1.0 AS h FROM e),
    {",".join(parts)}
    SELECT auth AS part, a AS authority
    FROM {prev_a}
    ORDER BY authority DESC, part
    LIMIT {k}
    """


QUERIES["order_part_hits"] = graph.order_part_hits
ORACLES["order_part_hits"] = _hits_oracle()


# TextRank keywords (round 8, session 3): the pagerank kernel over the
# word-adjacency graph; same unrolled-iteration oracle shape.
def _textrank_oracle(damping: float = 0.85, k: int = 25) -> str:
    d, t = damping, 1.0 - damping
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
        c{i} AS (
            SELECT m.dst, sum(r.rank * m.p) AS inflow
            FROM norm m JOIN {prev} r ON r.node = m.src
            GROUP BY m.dst),
        r{i} AS (
            SELECT n.node, {t} * b.tele + {d} * coalesce(c{i}.inflow, 0.0)
                       AS rank
            FROM nodes n JOIN base b ON b.node = n.node
            LEFT JOIN c{i} ON c{i}.dst = n.node)""")
        prev = f"r{i}"
    return f"""
    WITH tk AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) >= 4)
                   AS toks
        FROM documents),
    pr AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM tk WHERE len(toks) >= 2)),
    half AS (
        SELECT w1, w2, CAST(count(*) AS DOUBLE) AS w
        FROM pr WHERE w1 <> w2 GROUP BY 1, 2),
    edges AS (
        SELECT src, dst, sum(w) AS w FROM (
            SELECT w1 AS src, w2 AS dst, w FROM half
            UNION ALL SELECT w2, w1, w FROM half)
        GROUP BY 1, 2),
    outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY src),
    norm AS (SELECT e.src, e.dst, e.w / o.w_out AS p
             FROM edges e JOIN outw o USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    base AS (SELECT node, 1.0 / nn.n AS tele FROM nodes
             CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n
                         FROM nodes) nn),
    r0 AS (SELECT node, tele AS rank FROM base),
    {",".join(iters)}
    SELECT node AS word, round(rank, 6) AS rank
    FROM {prev}
    ORDER BY rank DESC, word
    LIMIT {k}
    """


QUERIES["textrank_keywords"] = graph.textrank_keywords
ORACLES["textrank_keywords"] = _textrank_oracle()


# k-core peeling profile (round 8, session 3): 6 chained peel rounds
# over the co-occurrence graph; per-round node/edge survival counts.
def _kcore_oracle(deg_frac: float = 0.25, n_rounds: int = 6) -> str:
    parts = []
    prev = "g0"
    selects = []
    for r in range(1, n_rounds + 1):
        parts.append(f"""
        d{r} AS MATERIALIZED (
            SELECT g.src FROM {prev} g GROUP BY g.src
            HAVING count(*) >= (SELECT k FROM kv)),
        g{r} AS MATERIALIZED (SELECT g.src, g.dst FROM {prev} g
                 JOIN d{r} ON d{r}.src = g.src
                 JOIN d{r} d{r}b ON d{r}b.src = g.dst),
        s{r} AS (SELECT {r} AS round,
                        (SELECT k FROM kv) AS k,
                        CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
                        CAST(count(*) AS BIGINT) AS n_edges_directed
                 FROM g{r})""")
        selects.append(f"SELECT * FROM s{r}")
        prev = f"g{r}"
    return f"""
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    g0 AS MATERIALIZED (SELECT src, dst FROM half
           UNION ALL SELECT dst, src FROM half),
    deg0 AS (SELECT src, count(*) AS d FROM g0 GROUP BY src),
    hist AS (SELECT d, count(*) AS n FROM deg0 GROUP BY d),
    cum AS (SELECT d,
                   sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS c,
                   sum(n) OVER () AS nt
            FROM hist),
    kv AS MATERIALIZED (
        SELECT CAST(min(d) AS BIGINT) AS k FROM cum
        WHERE c >= {deg_frac} * nt),
    {",".join(parts)}
    SELECT * FROM ({" UNION ALL ".join(selects)})
    ORDER BY round
    """


QUERIES["kcore_profile"] = graph.kcore_profile
ORACLES["kcore_profile"] = _kcore_oracle()

# Dunning G-squared collocations (round 8, session 3): exact 2x2 cell
# counts, one fixed-order 4-term ln fold, rounded once.
QUERIES["collocation_llr"] = text.collocation_llr
ORACLES["collocation_llr"] = """
    WITH d AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    pr AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM d WHERE len(toks) >= 2)),
    bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM pr GROUP BY 1, 2),
    l AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left
          FROM bi GROUP BY w1),
    r AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right
          FROM bi GROUP BY w2),
    t AS (SELECT CAST(sum(n_pair) AS BIGINT) AS N FROM bi),
    s AS (
        SELECT bi.w1, bi.w2, n_pair, n_left, n_right,
               CAST(n_pair AS DOUBLE) AS k11,
               CAST(n_left - n_pair AS DOUBLE) AS k12,
               CAST(n_right - n_pair AS DOUBLE) AS k21,
               CAST(N - n_left - n_right + n_pair AS DOUBLE) AS k22,
               CAST(N AS DOUBLE) AS n
        FROM bi JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
        WHERE n_pair >= 10)
    SELECT w1, w2, n_pair, n_left, n_right,
           round(2.0 * (
               CASE WHEN k11 > 0
                    THEN k11 * ln(k11 / ((k11 + k12) * (k11 + k21) / n))
                    ELSE 0.0 END
             + CASE WHEN k12 > 0
                    THEN k12 * ln(k12 / ((k11 + k12) * (k12 + k22) / n))
                    ELSE 0.0 END
             + CASE WHEN k21 > 0
                    THEN k21 * ln(k21 / ((k21 + k22) * (k11 + k21) / n))
                    ELSE 0.0 END
             + CASE WHEN k22 > 0
                    THEN k22 * ln(k22 / ((k21 + k22) * (k12 + k22) / n))
                    ELSE 0.0 END), 4) AS llr
    FROM s ORDER BY llr DESC, w1, w2 LIMIT 20
"""

# Positional-index phrase search (round 8, session 3): the oracle
# counts adjacency matches with a per-list lambda; the engine builds
# the distributed positional index + co-located adjacency join.
QUERIES["phrase_search"] = text.phrase_search
ORACLES["phrase_search"] = """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    ph(phrase, w1, w2) AS (VALUES
        ('table scan', 'table', 'scan'),
        ('hash join', 'hash', 'join'),
        ('merge sort', 'merge', 'sort')),
    occ AS (
        SELECT ph.phrase, d.doc_id,
               CAST(len(list_filter(range(1, len(toks)),
                        i -> toks[i] = ph.w1 AND toks[i + 1] = ph.w2))
                    AS BIGINT) AS n_occurrences
        FROM d CROSS JOIN ph),
    rk AS (
        SELECT phrase, doc_id, n_occurrences,
               CAST(row_number() OVER (PARTITION BY phrase
                    ORDER BY n_occurrences DESC, doc_id) AS INT) AS rn
        FROM occ WHERE n_occurrences > 0)
    SELECT phrase, rn, doc_id, n_occurrences
    FROM rk WHERE rn <= 5 ORDER BY phrase, rn
"""

# Pinball quantile backtest (round 8, session 3): exact train-half
# order-statistic predictors, integer-hundredth pinball loss.
QUERIES["pinball_quantile_eval"] = analytics.pinball_quantile_eval
ORACLES["pinball_quantile_eval"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1,
               CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS mid
        FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day, mid
             FROM b),
    series AS (
        SELECT g.event_type, g.day, g.mid,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    hist AS (
        SELECT event_type, y, CAST(count(*) AS BIGINT) AS n
        FROM series WHERE day <= mid GROUP BY 1, 2),
    cum AS (
        SELECT event_type, y,
               sum(n) OVER (PARTITION BY event_type ORDER BY y
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_train_days
        FROM hist),
    qs(q) AS (VALUES (10), (50), (90)),
    preds AS (
        SELECT event_type, CAST(q AS INT) AS q, n_train_days,
               CAST(min(y) AS BIGINT) AS pred
        FROM cum CROSS JOIN qs
        WHERE cum_n >= CAST(ceil(q * n_train_days / 100.0) AS BIGINT)
        GROUP BY 1, 2, 3)
    SELECT s.event_type, p.q, p.pred, p.n_train_days,
           CAST(count(*) AS BIGINT) AS n_test_days,
           round(sum(CASE WHEN s.y >= p.pred
                          THEN p.q * (s.y - p.pred)
                          ELSE (100 - p.q) * (p.pred - s.y) END)
                 / 100.0 / count(*), 4) AS avg_pinball
    FROM series s JOIN preds p ON p.event_type = s.event_type
    WHERE s.day > s.mid
    GROUP BY 1, 2, 3, 4
    ORDER BY s.event_type, p.q
"""

# 1-Wasserstein value drift (round 8, session 3): completes the drift
# dashboard; every |cdf-gap| x value-gap term is a BIGINT micro product
# on the shared cum kernel, one division at the end.
QUERIES["wasserstein_value_drift"] = quality.wasserstein_value_drift
ORACLES["wasserstein_value_drift"] = f"""
    WITH {_DRIFT_CUM_SQL},
    led AS (
        SELECT v, cum_a, cum_b,
               lead(v) OVER (ORDER BY v) AS v_next
        FROM cum),
    terms AS (
        SELECT v,
               abs(CAST(round(1000000.0 * cum_a / n_a) AS BIGINT)
                   - CAST(round(1000000.0 * cum_b / n_b) AS BIGINT))
               * coalesce(CAST(round((v_next - v) * 1000000.0) AS BIGINT),
                          0) AS t
        FROM led CROSS JOIN tot),
    agg AS (
        SELECT CAST(sum(t) AS BIGINT) AS ts,
               CAST(count(*) AS BIGINT) AS n_values,
               min(v) AS v_min, max(v) AS v_max
        FROM terms)
    SELECT n_a, n_b, n_values, v_min, v_max,
           round(ts / 1e12, 6) AS w1,
           round(ts / 1e12 / (v_max - v_min), 6) AS w1_norm
    FROM agg CROSS JOIN tot
"""

# Top principal component (round 8, session 3): BIGINT covariance
# cross-moments at 1e-4 fixed point, unrolled power iteration with
# 6-dp frozen iterates, Rayleigh eigenvalue at 4 dp.
def _top_pc_oracle(iters: int = 4) -> str:
    parts = []
    prev = "v0"
    for t in range(1, iters + 1):
        parts.append(f"""
        u{t} AS MATERIALIZED (
            SELECT c.i, sum(c.c * p.v) AS u
            FROM cov c JOIN {prev} p ON p.dim = c.j
            GROUP BY c.i),
        m{t} AS (SELECT max(abs(u)) AS m FROM u{t}),
        v{t} AS MATERIALIZED (
            SELECT CAST(i AS INT) AS dim, round(u / m, 6) AS v
            FROM u{t} CROSS JOIN m{t})""")
        prev = f"v{t}"
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xm
        FROM embeddings),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    sx AS (SELECT i, CAST(sum(xm) AS BIGINT) AS sx FROM cells GROUP BY i),
    sxy AS (
        SELECT a.i, b.i AS j, CAST(sum(a.xm * b.xm) AS BIGINT) AS sxy
        FROM cells a JOIN cells b ON a.vec_id = b.vec_id
        GROUP BY 1, 2),
    cov AS MATERIALIZED (
        SELECT s.i, s.j,
               round((n * sxy - x.sx * y.sx) / (n * (n - 1.0)) / 1e8, 9)
                   AS c
        FROM sxy s JOIN sx x ON x.i = s.i JOIN sx y ON y.i = s.j
        CROSS JOIN n_t),
    v0 AS (SELECT DISTINCT CAST(i AS INT) AS dim, 1.0 AS v FROM cov),
    {",".join(parts)},
    uf AS MATERIALIZED (
        SELECT c.i, sum(c.c * p.v) AS u
        FROM cov c JOIN {prev} p ON p.dim = c.j
        GROUP BY c.i),
    ray AS (
        SELECT round(sum(p.v * uf.u) / sum(p.v * p.v), 4) AS eigenvalue
        FROM uf JOIN {prev} p ON p.dim = uf.i)
    SELECT dim, v AS loading, eigenvalue
    FROM {prev} CROSS JOIN ray
    ORDER BY dim
    """


QUERIES["embedding_top_pc"] = similarity.embedding_top_pc
ORACLES["embedding_top_pc"] = _top_pc_oracle()

# Feature-hashing collision audit (round 8, session 3): the bucket-
# width sizing study over the same md5 hash the hashed-feature models
# use; vocabulary-scale aggregations only.
QUERIES["hashing_collision_audit"] = text.hashing_collision_audit
ORACLES["hashing_collision_audit"] = """
    WITH d AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_concat(toks,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(1, len(toks)),
                                           i -> toks[i] || '_' || toks[i + 1])
                       ELSE [] END)) AS term
              FROM d)
        GROUP BY term),
    widths(n_buckets) AS (VALUES (256), (1024), (4096)),
    bucketed AS (
        SELECT n_buckets, cnt,
               ('0x' || substr(md5('fh:' || term), 1, 8))::BIGINT
                   % n_buckets AS bucket
        FROM vocab CROSS JOIN widths),
    per_bucket AS (
        SELECT n_buckets, bucket,
               CAST(count(*) AS BIGINT) AS bt,
               CAST(sum(cnt) AS BIGINT) AS bm
        FROM bucketed GROUP BY 1, 2)
    SELECT n_buckets,
           CAST(sum(bt) AS BIGINT) AS n_terms,
           CAST(count(*) AS BIGINT) AS n_occupied,
           CAST(max(bt) AS BIGINT) AS max_bucket_terms,
           round(sum(CASE WHEN bt > 1 THEN bt ELSE 0 END) * 1.0
                 / sum(bt), 6) AS term_collision_frac,
           round(sum(CASE WHEN bt > 1 THEN bm ELSE 0 END) * 1.0
                 / sum(bm), 6) AS mass_collision_frac
    FROM per_bucket GROUP BY n_buckets ORDER BY n_buckets
"""

# Markov absorption funnel (round 8, session 3): P(hit purchase within
# k steps) from every state; unrolled fixed-point chain, 6-dp iterates.
def _absorption_oracle(target: str = "purchase", steps: int = 6) -> str:
    parts = []
    prev = "p0"
    for k in range(1, steps + 1):
        parts.append(f"""
        n{k} AS (
            SELECT pr.from_type, round(sum(pr.p * pk.ph), 6) AS ph_new
            FROM probs pr JOIN {prev} pk ON pk.state = pr.to_type
            GROUP BY 1),
        p{k} AS MATERIALIZED (
            SELECT s.state,
                   CASE WHEN s.state = '{target}' THEN 1.0
                        ELSE coalesce(n{k}.ph_new, 0.0) END AS ph
            FROM states s LEFT JOIN n{k} ON n{k}.from_type = s.state)""")
        prev = f"p{k}"
    return f"""
    WITH stp AS MATERIALIZED (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM stp GROUP BY 1, 2),
    outs AS MATERIALIZED (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
        FROM counts GROUP BY 1),
    probs AS MATERIALIZED (
        SELECT c.from_type, c.to_type, c.n * 1.0 / o.n_out AS p
        FROM counts c JOIN outs o USING (from_type)),
    states AS (SELECT from_type AS state, n_out FROM outs),
    p0 AS (SELECT state,
                  CASE WHEN state = '{target}' THEN 1.0 ELSE 0.0 END AS ph
           FROM states),
    {",".join(parts)}
    SELECT s.state, s.n_out,
           p1.ph AS p_hit_1, p3.ph AS p_hit_3, p{steps}.ph AS p_hit_{steps}
    FROM states s
    JOIN p1 ON p1.state = s.state
    JOIN p3 ON p3.state = s.state
    JOIN p{steps} ON p{steps}.state = s.state
    ORDER BY s.state
    """


QUERIES["absorption_funnel_prob"] = analytics.absorption_funnel_prob
ORACLES["absorption_funnel_prob"] = _absorption_oracle()

# Streaming Benford twin (round 8, session 3): 9 counters of streaming
# state, shared chi-square readout kernel, same oracle recipe over the
# event value column.
QUERIES["stream_benford_values"] = replay.stream_benford_values
ORACLES["stream_benford_values"] = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS observed
        FROM events WHERE value > 0
        GROUP BY 1 HAVING digit >= 1),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM digits),
    scored AS (
        SELECT digit, observed,
               round(observed * 1.0 / n, 6) AS obs_frac,
               round((ln(digit + 1) - ln(digit)) / ln(10.0), 6) AS exp_frac,
               CAST(round(1000000.0
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          / (round((ln(digit + 1) - ln(digit))
                                   / ln(10.0), 6) * n)) AS BIGINT) AS chi
        FROM digits CROSS JOIN tot),
    total_chi AS (
        SELECT round(sum(chi) / 1000000.0, 4) AS chi_square FROM scored)
    SELECT digit, observed, obs_frac, exp_frac, chi_square
    FROM scored CROSS JOIN total_chi
    ORDER BY digit
"""

# Difference-in-differences lift (round 8, session 3): four BIGINT
# cent-moment groups, means rounded before the DiD fold, micro-frozen
# variance terms.
QUERIES["did_lift_estimate"] = analytics.did_lift_estimate
ORACLES["did_lift_estimate"] = """
    WITH base AS (
        SELECT ('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS arm,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    anchor AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT)
                   AS mid FROM base),
    groups AS (
        SELECT arm,
               CASE WHEN day <= (SELECT mid FROM anchor)
                    THEN 'pre' ELSE 'post' END AS period,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM base GROUP BY 1, 2),
    wide AS (
        SELECT (CASE WHEN arm = 1 THEN 't' ELSE 'c' END
                || '_' || period) AS g,
               round(s / 100.0 / n, 4) AS m,
               CAST(round(1000000.0
                          * (ss - s * (s / CAST(n AS DOUBLE)))
                          / (n - 1.0) / 10000.0 / n) AS BIGINT) AS vt,
               n
        FROM groups),
    p AS (
        SELECT
            max(CASE WHEN g = 't_pre' THEN n END) AS n_t_pre,
            max(CASE WHEN g = 't_post' THEN n END) AS n_t_post,
            max(CASE WHEN g = 'c_pre' THEN n END) AS n_c_pre,
            max(CASE WHEN g = 'c_post' THEN n END) AS n_c_post,
            max(CASE WHEN g = 't_pre' THEN m END) AS mean_t_pre,
            max(CASE WHEN g = 't_post' THEN m END) AS mean_t_post,
            max(CASE WHEN g = 'c_pre' THEN m END) AS mean_c_pre,
            max(CASE WHEN g = 'c_post' THEN m END) AS mean_c_post,
            max(CASE WHEN g = 't_post' THEN vt END)
              + max(CASE WHEN g = 't_pre' THEN vt END)
              + max(CASE WHEN g = 'c_post' THEN vt END)
              + max(CASE WHEN g = 'c_pre' THEN vt END) AS vsum
        FROM wide)
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           mean_t_pre, mean_t_post, mean_c_pre, mean_c_post,
           round((mean_t_post - mean_t_pre)
                 - (mean_c_post - mean_c_pre), 4) AS did_estimate,
           round(sqrt(vsum / 1e6), 4) AS se,
           round(round((mean_t_post - mean_t_pre)
                       - (mean_c_post - mean_c_pre), 4)
                 / round(sqrt(vsum / 1e6), 4), 4) AS z_score
    FROM p
"""

# Wald SPRT monitor (round 8, session 3): integer micro literal
# log-likelihood steps, BIGINT path cumsum, integer decisions.
QUERIES["sprt_ab_monitor"] = analytics.sprt_ab_monitor
ORACLES["sprt_ab_monitor"] = f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1),
    path AS (
        SELECT day, n, k,
               CAST(sum(k * ({analytics.SPRT_LA_MICRO})
                        + (n - k) * ({analytics.SPRT_LB_MICRO}))
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS llr_micro
        FROM daily)
    SELECT day, n, k,
           round(llr_micro / 1e6, 6) AS llr,
           CASE WHEN llr_micro >= {analytics.SPRT_THRESH_MICRO}
                THEN 'accept_h1'
                WHEN llr_micro <= -{analytics.SPRT_THRESH_MICRO}
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM path ORDER BY day
"""

# JL projection distortion audit (round 8, session 3): BIGINT
# projections and distances; one double division per pair.
QUERIES["jl_distortion_audit"] = similarity.jl_distortion_audit
ORACLES["jl_distortion_audit"] = """
    WITH samp AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        ORDER BY ('0x' || substr(md5('jl:' || CAST(vec_id AS VARCHAR)),
                                 1, 8))::BIGINT / 4294967296.0, vec_id
        LIMIT 32),
    cells AS MATERIALIZED (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xm
        FROM samp),
    ks AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS kk),
    proj AS MATERIALIZED (
        SELECT vec_id, kk,
               CAST(sum((1 - 2 * (('0x' || substr(md5('jls:'
                             || CAST(i AS VARCHAR) || ':'
                             || CAST(kk AS VARCHAR)), 1, 8))::BIGINT % 2))
                        * xm) AS BIGINT) AS p
        FROM cells CROSS JOIN ks GROUP BY 1, 2),
    po AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS proj2
        FROM proj a JOIN proj b ON a.kk = b.kk AND a.vec_id < b.vec_id
        GROUP BY 1, 2),
    od AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(sum((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS orig2
        FROM cells a JOIN cells b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT round(proj2 * 1.0 / (8.0 * orig2), 6) AS ratio
        FROM po JOIN od USING (va, vb))
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(CAST(round(ratio * 1e6) AS BIGINT)) / 1e6
                 / count(*), 6) AS mean_ratio,
           min(ratio) AS min_ratio,
           max(ratio) AS max_ratio,
           round(sum(CASE WHEN abs(ratio - 1.0) <= 0.2
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS frac_within_20pct
    FROM pairs
"""

# Mann-Kendall trend (round 8, session 3): BIGINT sign fold over the
# bounded day grid, tie-corrected variance, continuity-corrected z.
QUERIES["mann_kendall_trend"] = analytics.mann_kendall_trend
ORACLES["mann_kendall_trend"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS MATERIALIZED (
        SELECT g.event_type, g.day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b2.y > a.y THEN 1
                             WHEN b2.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM series a JOIN series b2
          ON b2.event_type = a.event_type AND a.day < b2.day
        GROUP BY 1),
    nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM series GROUP BY 1),
    ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
              FROM series GROUP BY 1, 2)
        GROUP BY 1),
    j AS (
        SELECT nd.event_type, n_days, s_stat,
               (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)
                   / 18.0 AS var_s
        FROM nd JOIN s USING (event_type) JOIN ties USING (event_type)),
    zed AS (
        SELECT event_type, n_days, s_stat, round(var_s, 4) AS var_s,
               round(CASE WHEN s_stat > 0
                          THEN (s_stat - 1) / sqrt(var_s)
                          WHEN s_stat < 0
                          THEN (s_stat + 1) / sqrt(var_s)
                          ELSE 0.0 END, 4) AS z_score
        FROM j)
    SELECT event_type, n_days, s_stat, var_s, z_score,
           CASE WHEN z_score > 1.96 THEN 'increasing'
                WHEN z_score < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM zed ORDER BY event_type
"""

# WoE / IV feature screen (round 8, session 3): exact decile bins off
# the cumulative-histogram kernel, smoothed ln shares, micro-frozen IV.
QUERIES["woe_iv_profile"] = analytics.woe_iv_profile
ORACLES["woe_iv_profile"] = """
    WITH ev AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
        FROM events),
    hist AS (SELECT v, count(*) AS n FROM ev GROUP BY v),
    cum AS (
        SELECT v,
               sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER () AS nt
        FROM hist),
    binmap AS (
        SELECT v, CAST((10 * c + nt - 1) // nt AS INT) AS bin FROM cum),
    binned AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(good) AS BIGINT) AS n_good,
               CAST(sum(1 - good) AS BIGINT) AS n_bad
        FROM ev JOIN binmap USING (v)
        GROUP BY bin),
    tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS G,
                   CAST(sum(n_bad) AS BIGINT) AS B FROM binned),
    scored AS (
        SELECT bin, n, n_good, n_bad,
               round(n_good * 1.0 / n, 4) AS good_rate,
               round(ln(((n_good + 0.5) / (G + 5.0))
                        / ((n_bad + 0.5) / (B + 5.0))), 6) AS woe,
               CAST(round(1000000.0
                          * ((n_good + 0.5) / (G + 5.0)
                             - (n_bad + 0.5) / (B + 5.0))
                          * round(ln(((n_good + 0.5) / (G + 5.0))
                                     / ((n_bad + 0.5) / (B + 5.0))), 6))
                    AS BIGINT) AS ivt
        FROM binned CROSS JOIN tot),
    iv AS (SELECT round(sum(ivt) / 1e6, 6) AS iv_total FROM scored)
    SELECT bin, n, n_good, n_bad, good_rate, woe, iv_total
    FROM scored CROSS JOIN iv
    ORDER BY bin
"""

# Theil-Sen robust slope (round 8, session 3): exact lower-median
# order statistic over the bounded pairwise-slope frame.
QUERIES["theil_sen_trend"] = analytics.theil_sen_trend
ORACLES["theil_sen_trend"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS MATERIALIZED (
        SELECT g.event_type, g.day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    slopes AS (
        SELECT a.event_type, a.day, b2.day AS day2,
               round((b2.y - a.y) * 1.0 / (b2.day - a.day), 9) AS slope
        FROM series a JOIN series b2
          ON b2.event_type = a.event_type AND a.day < b2.day),
    ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope, day, day2) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes)
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           slope AS slope_per_day
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
"""

# Holt linear-trend backtest (round 8, session 3): offline-unrolled
# closed-form weights as micro literals; pure BIGINT folds end-to-end.
QUERIES["holt_forecast_eval"] = analytics.holt_forecast_eval
ORACLES["holt_forecast_eval"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, max(day) AS d1 FROM c GROUP BY 1),
    grid AS (SELECT event_type, d1,
                    unnest(range(d1 - 34, d1 + 1)) AS day
             FROM b),
    series AS (
        SELECT g.event_type, g.d1, g.day,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    w(idx, wl, wb) AS (VALUES (1, -21652, -4577), (2, -3774, -928), (3, -4302, -1090), (4, -4871, -1274), (5, -5476, -1483), (6, -6106, -1717), (7, -6743, -1979), (8, -7365, -2268), (9, -7937, -2584), (10, -8415, -2924), (11, -8737, -3285), (12, -8823, -3659), (13, -8567, -4037), (14, -7834, -4404), (15, -6451, -4740), (16, -4199, -5017), (17, -802, -5196), (18, 4085, -5231), (19, 10891, -5056), (20, 20148, -4589), (21, 32508, -3726), (22, 48772, -2332), (23, 69917, -242), (24, 97127, 2754), (25, 131836, 6917), (26, 175770, 12567), (27, 231000, 20100), (28, 300000, 30000)),
    fit AS (
        SELECT event_type,
               CAST(sum(wl * y) AS BIGINT) AS l_micro,
               CAST(sum(wb * y) AS BIGINT) AS b_micro
        FROM series JOIN w ON w.idx = series.day - (d1 - 34) + 1
        WHERE day <= d1 - 7
        GROUP BY event_type),
    scored AS (
        SELECT s.event_type, f.l_micro, f.b_micro,
               abs(s.y * 1000000
                   - (f.l_micro + (s.day - (s.d1 - 7)) * f.b_micro))
                   AS abs_err_micro
        FROM series s JOIN fit f USING (event_type)
        WHERE s.day > s.d1 - 7)
    SELECT event_type,
           round(l_micro / 1e6, 4) AS level,
           round(b_micro / 1e6, 4) AS trend_per_day,
           CAST(count(*) AS BIGINT) AS n_test_days,
           round(sum(abs_err_micro) / 1e6 / count(*), 4) AS mae
    FROM scored
    GROUP BY event_type, l_micro, b_micro
    ORDER BY event_type
"""

# Streaming SPRT twin (round 8, session 3): per-day count state,
# shared path kernel, same oracle as the batch monitor.
QUERIES["stream_sprt_monitor"] = replay.stream_sprt_monitor
ORACLES["stream_sprt_monitor"] = ORACLES["sprt_ab_monitor"]

# Overdispersion check (round 8, session 3): BIGINT count moments over
# the zero-filled day grid; Poisson-null chi-square.
QUERIES["overdispersion_profile"] = analytics.overdispersion_profile
ORACLES["overdispersion_profile"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM series GROUP BY 1)
    SELECT event_type, n_days,
           round(s * 1.0 / n_days, 4) AS mean_daily,
           round((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0), 4)
               AS var_daily,
           round(((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0))
                 / (s * 1.0 / n_days), 4) AS dispersion_index,
           round((n_days - 1) * ((ss - s * (s * 1.0 / n_days))
                                 / (n_days - 1.0))
                 / (s * 1.0 / n_days), 4) AS chi_square,
           CASE WHEN round(((ss - s * (s * 1.0 / n_days))
                            / (n_days - 1.0))
                          / (s * 1.0 / n_days), 4) > 1.5
                THEN 'overdispersed'
                WHEN round(((ss - s * (s * 1.0 / n_days))
                            / (n_days - 1.0))
                          / (s * 1.0 / n_days), 4) < 0.67
                THEN 'underdispersed'
                ELSE 'poisson_like' END AS verdict
    FROM m ORDER BY event_type
"""

# Lincoln-Petersen capture-recapture (round 8, session 3): Chapman
# bias-corrected population estimate from two observation windows.
QUERIES["capture_recapture_estimate"] = analytics.capture_recapture_estimate
ORACLES["capture_recapture_estimate"] = """
    WITH users AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('crA:'
                          || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0 < 0.3 THEN 1 ELSE 0 END AS in_a,
               CASE WHEN ('0x' || substr(md5('crB:'
                          || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0 < 0.3 THEN 1 ELSE 0 END AS in_b
        FROM (SELECT DISTINCT user_id FROM events)),
    agg AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n1,
               CAST(sum(in_b) AS BIGINT) AS n2,
               CAST(sum(in_a * in_b) AS BIGINT) AS m,
               CAST(sum(greatest(in_a, in_b)) AS BIGINT) AS n_observed,
               CAST(count(*) AS BIGINT) AS n_true
        FROM users)
    SELECT n1, n2, m, n_observed,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2) AS n_hat,
           n_true,
           round(round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2)
                 / n_true, 4) AS recovery_ratio
    FROM agg
"""

# Empirical-Bayes beta-binomial shrinkage (round 8, session 3): MoM
# prior from micro-frozen per-user rates; 6-dp shrunken rates.
QUERIES["eb_shrunk_rates"] = analytics.eb_shrunk_rates
ORACLES["eb_shrunk_rates"] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id),
    rm AS (
        SELECT user_id, n, conv,
               CAST(round(1000000.0 * conv / n) AS BIGINT) AS rm
        FROM per_user),
    moments AS (
        SELECT CAST(count(*) AS BIGINT) AS nu,
               CAST(sum(rm) AS BIGINT) AS s1,
               CAST(sum(rm * rm) AS BIGINT) AS s2
        FROM rm),
    prior AS (
        SELECT round(round(s1 / 1e6 / nu, 6)
                     * (round(s1 / 1e6 / nu, 6)
                        * (1 - round(s1 / 1e6 / nu, 6))
                        / round((s2 / 1e12
                                 - nu * round(s1 / 1e6 / nu, 6)
                                      * round(s1 / 1e6 / nu, 6))
                                / (nu - 1.0), 6)
                        - 1), 4) AS alpha,
               round((1 - round(s1 / 1e6 / nu, 6))
                     * (round(s1 / 1e6 / nu, 6)
                        * (1 - round(s1 / 1e6 / nu, 6))
                        / round((s2 / 1e12
                                 - nu * round(s1 / 1e6 / nu, 6)
                                      * round(s1 / 1e6 / nu, 6))
                                / (nu - 1.0), 6)
                        - 1), 4) AS beta
        FROM moments)
    SELECT user_id, n, conv,
           round(conv * 1.0 / n, 4) AS raw_rate,
           alpha, beta,
           round((conv + alpha) / (n + alpha + beta), 6) AS eb_rate
    FROM rm CROSS JOIN prior
    ORDER BY eb_rate DESC, user_id
    LIMIT 15
"""

# Sorted-neighborhood linkage (round 8, session 3): the merge/purge
# blocking strategy — per-block sliding window over the sort order,
# planted plural-typo variants, integer Levenshtein verify.
QUERIES["sorted_neighborhood_pairs"] = dedup.sorted_neighborhood_pairs
ORACLES["sorted_neighborhood_pairs"] = """
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    planted AS (
        SELECT p_name || 's' AS p_name, CAST(0 AS BIGINT) AS n_parts
        FROM names
        WHERE ('0x' || substr(md5('sn:' || p_name), 1, 8))::BIGINT % 3 = 0),
    recs AS (SELECT * FROM names UNION ALL SELECT * FROM planted),
    seq AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM recs),
    leads AS (
        SELECT p_name, blk,
               lead(p_name, 1) OVER (PARTITION BY blk ORDER BY p_name)
                   AS n1,
               lead(p_name, 2) OVER (PARTITION BY blk ORDER BY p_name)
                   AS n2
        FROM seq),
    cand AS (
        SELECT p_name AS name_a, n1 AS name_b FROM leads
        WHERE n1 IS NOT NULL
        UNION ALL
        SELECT p_name, n2 FROM leads WHERE n2 IS NOT NULL)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY dist, name_a, name_b
    LIMIT 50
"""

# Exact Shapley channel attribution (round 8, session 3): 2^4 coalition
# lattice, observed-coalition game values at 6 dp, integer /24 weights.
QUERIES["shapley_channel_attribution"] = analytics.shapley_channel_attribution
ORACLES["shapley_channel_attribution"] = """
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1
             + max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 2
             + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
             + max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 8
                   AS mask,
               max(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id),
    game AS (
        SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
               round(sum(conv) * 1.0 / count(*), 6) AS v
        FROM per_user GROUP BY mask),
    grid AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS m),
    vfull AS (
        SELECT m, coalesce(game.v, 0.0) AS v
        FROM grid LEFT JOIN game ON game.mask = grid.m),
    channels(channel, bit) AS (VALUES
        ('click', 1), ('view', 2), ('signup', 4), ('error', 8)),
    terms AS (
        SELECT c.channel,
               (CASE bit_count(s.m)
                     WHEN 0 THEN 6 WHEN 1 THEN 2
                     WHEN 2 THEN 2 ELSE 6 END)
               * CAST(round(1000000.0 * (w.v - s.v)) AS BIGINT) AS t24
        FROM channels c
        JOIN vfull s ON (s.m & c.bit) = 0
        JOIN vfull w ON w.m = (s.m | c.bit)),
    phi AS (
        SELECT channel, round(sum(t24) / 24.0 / 1e6, 6) AS shapley_value
        FROM terms GROUP BY channel),
    wc AS (
        SELECT channel, CAST(count(*) AS BIGINT) AS n_users_with_channel
        FROM per_user CROSS JOIN channels
        WHERE (mask & bit) != 0
        GROUP BY channel)
    SELECT p.channel,
           coalesce(wc.n_users_with_channel, 0) AS n_users_with_channel,
           p.shapley_value
    FROM phi p LEFT JOIN wc USING (channel)
    ORDER BY shapley_value DESC, channel
"""

# Sequence entropy (round 8, session 3): conditional H(next|current)
# from the transition matrix, micro-frozen -p ln p terms.
QUERIES["sequence_entropy_profile"] = analytics.sequence_entropy_profile
ORACLES["sequence_entropy_profile"] = """
    WITH stp AS (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM stp GROUP BY 1, 2),
    outs AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out,
               CAST(count(*) AS BIGINT) AS n_succ
        FROM counts GROUP BY 1),
    ent AS (
        SELECT c.from_type, o.n_out, o.n_succ,
               CAST(sum(CAST(round(-1000000.0 * (c.n * 1.0 / o.n_out)
                                   * ln(c.n * 1.0 / o.n_out)) AS BIGINT))
                    AS BIGINT) AS h_micro
        FROM counts c JOIN outs o USING (from_type)
        GROUP BY 1, 2, 3),
    modal AS (
        SELECT from_type, min(to_type) AS modal_next
        FROM counts c
        WHERE n = (SELECT max(n) FROM counts c2
                   WHERE c2.from_type = c.from_type)
        GROUP BY from_type)
    SELECT e.from_type, e.n_out, e.n_succ,
           round(e.h_micro / 1e6, 6) AS entropy_nats,
           CASE WHEN e.n_succ > 1
                THEN round(e.h_micro / 1e6 / ln(CAST(e.n_succ AS DOUBLE)),
                           6)
                ELSE 0.0 END AS entropy_normalized,
           m.modal_next
    FROM ent e JOIN modal m USING (from_type)
    ORDER BY e.from_type
"""

# Join-order advisor (round 8, session 3): containment-formula
# estimates vs true intermediates, lazy 1-row stat cross-joins.
QUERIES["join_order_advisor"] = relational.join_order_advisor
ORACLES["join_order_advisor"] = """
    WITH sc AS (SELECT CAST(count(*) AS BIGINT) AS rows_c,
                       CAST(count(DISTINCT c_custkey) AS BIGINT)
                           AS ndv_c_cust
                FROM customer),
    so AS (SELECT CAST(count(*) AS BIGINT) AS rows_o,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_o_cust,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT)
                      AS ndv_o_order
           FROM orders),
    sl AS (SELECT CAST(count(*) AS BIGINT) AS rows_l,
                  CAST(count(DISTINCT l_orderkey) AS BIGINT)
                      AS ndv_l_order
           FROM lineitem),
    tc AS (SELECT CAST(count(*) AS BIGINT) AS true_co
           FROM customer JOIN orders ON c_custkey = o_custkey),
    tl AS (SELECT CAST(count(*) AS BIGINT) AS true_ol
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    one AS (SELECT * FROM sc CROSS JOIN so CROSS JOIN sl
            CROSS JOIN tc CROSS JOIN tl),
    est AS (
        SELECT *,
               round(rows_c * rows_o * 1.0
                     / greatest(ndv_c_cust, ndv_o_cust), 2) AS est_co,
               round(rows_o * rows_l * 1.0
                     / greatest(ndv_o_order, ndv_l_order), 2) AS est_ol
        FROM one)
    SELECT step, rows_left, rows_right, est_rows, true_rows,
           est_over_true, recommended
    FROM (
        SELECT 'customer*orders' AS step, rows_c AS rows_left,
               rows_o AS rows_right, est_co AS est_rows,
               true_co AS true_rows,
               round(est_co / true_co, 4) AS est_over_true,
               CASE WHEN est_co <= est_ol THEN 'customer_first'
                    ELSE 'lineitem_first' END AS recommended
        FROM est
        UNION ALL
        SELECT 'orders*lineitem', rows_o, rows_l, est_ol, true_ol,
               round(est_ol / true_ol, 4),
               CASE WHEN est_co <= est_ol THEN 'customer_first'
                    ELSE 'lineitem_first' END
        FROM est)
    ORDER BY step
"""

# Source KL divergence (round 8, session 3): smoothed unigram
# distributions, micro-frozen p ln(p/q) cells over the vocab grid.
QUERIES["source_kl_divergence"] = text.source_kl_divergence
ORACLES["source_kl_divergence"] = """
    WITH toks AS (
        SELECT source, term FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
           FROM toks GROUP BY 1, 2),
    vocab AS (SELECT term, CAST(sum(n) AS BIGINT) AS nt
              FROM st GROUP BY term),
    vs AS (SELECT CAST(count(*) AS BIGINT) AS vsz,
                  CAST(sum(nt) AS BIGINT) AS ncorp FROM vocab),
    src AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
            FROM st GROUP BY source),
    grid AS (
        SELECT src.source, src.ns, vocab.term, vocab.nt,
               coalesce(st.n, 0) AS n
        FROM src CROSS JOIN vocab
        LEFT JOIN st ON st.source = src.source AND st.term = vocab.term),
    cell AS (
        SELECT source, ns,
               CAST(round(1000000.0
                          * ((n + 1) * 1.0 / (ns + vsz))
                          * ln(((n + 1) * 1.0 / (ns + vsz))
                               / ((nt + 1) * 1.0 / (ncorp + vsz))))
                    AS BIGINT) AS t
        FROM grid CROSS JOIN vs)
    SELECT source, ns AS n_tokens,
           round(sum(t) / 1e6, 6) AS kl_nats
    FROM cell GROUP BY source, ns
    ORDER BY kl_nats DESC, source
"""

# RAKE keyphrases (round 8, session 3): gaps-and-islands candidate
# runs, deg/freq word scores micro-frozen, per-phrase fold.
QUERIES["rake_keyphrases"] = text.rake_keyphrases
ORACLES["rake_keyphrases"] = """
    WITH pos AS (
        SELECT doc_id, i - 1 AS pos, toks[i] AS term,
               CASE WHEN toks[i] IN ('the', 'a', 'of', 'and')
                    THEN 1 ELSE 0 END AS stop
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 t -> length(t) > 0) AS toks
              FROM documents),
             unnest(range(1, len(toks) + 1)) AS u(i)),
    runs AS (
        SELECT doc_id, pos, term,
               pos - sum(1 - stop) OVER (PARTITION BY doc_id ORDER BY pos
                                         ROWS UNBOUNDED PRECEDING)
                   AS island
        FROM pos
        QUALIFY stop = 0),
    phrases AS (
        SELECT doc_id, island,
               string_agg(term, ' ' ORDER BY pos) AS phrase
        FROM runs GROUP BY 1, 2),
    stats AS (
        SELECT term, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(plen) AS BIGINT) AS deg
        FROM (SELECT r.term,
                     count(*) OVER (PARTITION BY r.doc_id, r.island)
                         AS plen
              FROM runs r)
        GROUP BY term),
    wscore AS (
        SELECT term,
               CAST(round(1000000.0 * deg / freq) AS BIGINT) AS wscore
        FROM stats),
    pscore AS (
        SELECT r.doc_id, r.island,
               CAST(sum(w.wscore) AS BIGINT) AS score_micro
        FROM runs r JOIN wscore w USING (term)
        GROUP BY 1, 2)
    SELECT p.phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           round(max(s.score_micro) / 1e6, 4) AS rake_score
    FROM phrases p JOIN pscore s USING (doc_id, island)
    GROUP BY p.phrase
    ORDER BY rake_score DESC, n_occurrences DESC, phrase
    LIMIT 15
"""

# CV paired t-test (round 8, session 3): grouped folds, leakage-free
# complement predictors, integer-exact difference fold.
def _cv_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import cv_paired_ttest

    return cv_paired_ttest(spark, sf_dir)


QUERIES["cv_paired_ttest"] = _cv_paired_ttest
ORACLES["cv_paired_ttest"] = """
    WITH o AS (
        SELECT o_orderpriority AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5('cv:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT % 5 AS fold
        FROM orders),
    cells AS (
        SELECT fold, prio, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM o GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nall,
                   CAST(sum(s) AS BIGINT) AS sall FROM cells),
    pr AS (SELECT prio, CAST(sum(n) AS BIGINT) AS np,
                  CAST(sum(s) AS BIGINT) AS sp
           FROM cells GROUP BY prio),
    train AS (
        SELECT c.fold, c.prio,
               CAST(round((pr.sp - c.s) * 1.0 / (pr.np - c.n)) AS BIGINT)
                   AS pred_grp
        FROM cells c JOIN pr USING (prio)),
    ft AS (SELECT fold, CAST(sum(n) AS BIGINT) AS nf,
                  CAST(sum(s) AS BIGINT) AS sf
           FROM cells GROUP BY fold),
    gm AS (
        SELECT fold,
               CAST(round((sall - sf) * 1.0 / (nall - nf)) AS BIGINT)
                   AS pred_glob
        FROM ft CROSS JOIN tot),
    scored AS (
        SELECT o.fold, CAST(count(*) AS BIGINT) AS n_test,
               round(sum(abs(cents - t.pred_grp)) / 100.0 / count(*), 4)
                   AS mae_group_model,
               round(sum(abs(cents - g.pred_glob)) / 100.0 / count(*), 4)
                   AS mae_global_model
        FROM o JOIN train t ON t.fold = o.fold AND t.prio = o.prio
        JOIN gm g ON g.fold = o.fold
        GROUP BY o.fold),
    diffs AS (
        SELECT fold, n_test, mae_group_model, mae_global_model,
               round(mae_group_model - mae_global_model, 4) AS d
        FROM scored),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS kf,
               CAST(sum(CAST(round(d * 10000) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(d * 10000) AS BIGINT)
                        * CAST(round(d * 10000) AS BIGINT)) AS BIGINT)
                   AS s2
        FROM diffs),
    verdict AS (
        SELECT round((s1 / 1e4 / kf)
                     / sqrt((s2 / 1e8 - kf * (s1 / 1e4 / kf)
                                           * (s1 / 1e4 / kf))
                            / (kf - 1.0) / kf), 4) AS t_stat
        FROM stats)
    SELECT fold, n_test, mae_group_model, mae_global_model,
           d AS mae_diff, t_stat,
           CASE WHEN abs(t_stat) > 2.776 THEN 'group_model_differs'
                ELSE 'no_significant_difference' END AS verdict
    FROM diffs CROSS JOIN verdict
    ORDER BY fold
"""

# Greedy vocabulary set cover (round 8, session 3): unrolled greedy
# steps with MATERIALIZED covered sets.
def _vocab_cover_oracle(steps: int = 5) -> str:
    parts = []
    prev_cov = "cov0"
    for t in range(1, steps + 1):
        parts.append(f"""
        g{t} AS (
            SELECT st.source, CAST(count(*) AS BIGINT) AS new_terms
            FROM st LEFT JOIN {prev_cov} c ON c.term = st.term
            WHERE c.term IS NULL
            GROUP BY st.source),
        p{t} AS MATERIALIZED (
            SELECT source, new_terms FROM g{t}
            ORDER BY new_terms DESC, source LIMIT 1),
        cov{t} AS MATERIALIZED (
            SELECT term FROM {prev_cov}
            UNION
            SELECT st.term FROM st JOIN p{t} USING (source)),
        s{t} AS (
            SELECT {t} AS step, p{t}.source, p{t}.new_terms,
                   (SELECT CAST(count(*) AS BIGINT) FROM cov{t})
                       AS covered_terms
            FROM p{t})""")
        prev_cov = f"cov{t}"
    selects = " UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(1, steps + 1)
    )
    return f"""
    WITH d AS (
        SELECT source,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    st AS MATERIALIZED (
        SELECT DISTINCT source, term FROM (
            SELECT source,
                   unnest(list_concat(toks,
                       CASE WHEN len(toks) >= 2
                            THEN list_transform(range(1, len(toks)),
                                                i -> toks[i] || '_'
                                                     || toks[i + 1])
                            ELSE [] END)) AS term
            FROM d)),
    vt AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_total
           FROM st),
    cov0 AS (SELECT term FROM st WHERE 1 = 0),
    {",".join(parts)}
    SELECT CAST(step AS INT) AS step, source, new_terms, covered_terms,
           round(covered_terms * 1.0 / v_total, 4) AS coverage_frac
    FROM ({selects}) CROSS JOIN vt
    ORDER BY step
    """


QUERIES["vocab_cover_sources"] = curation.vocab_cover_sources
ORACLES["vocab_cover_sources"] = _vocab_cover_oracle()

# Largest-remainder apportionment (round 8, session 3): pure integer
# base seats + exact residue ranking; seat totals pin to the budget.
QUERIES["largest_remainder_allocation"] = curation.largest_remainder_allocation
ORACLES["largest_remainder_allocation"] = """
    WITH counts AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        t -> length(t) > 0))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS w_all FROM counts),
    quotas AS (
        SELECT source, n_tokens,
               CAST((1000 * n_tokens) // w_all AS BIGINT) AS base,
               CAST(1000 * n_tokens
                    - ((1000 * n_tokens) // w_all) * w_all AS BIGINT)
                   AS rem,
               round(1000.0 * n_tokens / w_all, 4) AS quota,
               w_all
        FROM counts CROSS JOIN tot),
    leftover AS (
        SELECT CAST(1000 - sum(base) AS BIGINT) AS extra_seats
        FROM quotas),
    ranked AS (
        SELECT q.*, l.extra_seats,
               CAST(row_number() OVER (ORDER BY rem DESC, source)
                    AS BIGINT) AS rnk
        FROM quotas q CROSS JOIN leftover l)
    SELECT source, n_tokens, quota,
           base AS base_seats,
           CAST(CASE WHEN rnk <= extra_seats THEN 1 ELSE 0 END AS INT)
               AS extra,
           CAST(base + CASE WHEN rnk <= extra_seats THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM ranked
    ORDER BY source
"""

# Markov removal-effect attribution (round 8, session 3): base + four
# channel-removed absorption chains, unrolled and materialized.
def _removal_oracle(target: str = "purchase", steps: int = 6) -> str:
    chans = ["click", "view", "signup", "error"]
    parts = []
    for tag, excl in [("v0", None)] + [
        (f"v{i + 1}", c) for i, c in enumerate(chans)
    ]:
        if excl is None:
            parts.append(f"""
        pr_{tag} AS (SELECT * FROM probs),
        st_{tag} AS (SELECT * FROM states)""")
        else:
            parts.append(f"""
        pr_{tag} AS (SELECT * FROM probs
                     WHERE from_type <> '{excl}'
                       AND to_type <> '{excl}'),
        st_{tag} AS (SELECT * FROM states WHERE state <> '{excl}')""")
        prev = f"p0_{tag}"
        parts.append(f"""
        p0_{tag} AS (SELECT state,
                            CASE WHEN state = '{target}' THEN 1.0
                                 ELSE 0.0 END AS ph
                     FROM st_{tag})""")
        for k in range(1, steps + 1):
            parts.append(f"""
        n{k}_{tag} AS (
            SELECT pr.from_type, round(sum(pr.p * pk.ph), 6) AS ph_new
            FROM pr_{tag} pr JOIN {prev} pk ON pk.state = pr.to_type
            GROUP BY 1),
        p{k}_{tag} AS MATERIALIZED (
            SELECT s.state,
                   CASE WHEN s.state = '{target}' THEN 1.0
                        ELSE coalesce(n.ph_new, 0.0) END AS ph
            FROM st_{tag} s
            LEFT JOIN n{k}_{tag} n ON n.from_type = s.state)""")
            prev = f"p{k}_{tag}"
        parts.append(f"""
        b_{tag} AS MATERIALIZED (
            SELECT round(sum(CAST(round(pi.n_first * p.ph * 1e6)
                                  AS BIGINT)) / 1e6
                         / (SELECT nu FROM n_users), 6) AS b
            FROM pi JOIN {prev} p USING (state))""")
    rows = " UNION ALL ".join(
        f"""SELECT '{c}' AS channel,
                   (SELECT b FROM b_v0) AS base_conv_prob,
                   (SELECT b FROM b_v{i + 1}) AS conv_prob_without"""
        for i, c in enumerate(chans)
    )
    return f"""
    WITH stp AS MATERIALIZED (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM stp GROUP BY 1, 2),
    outs AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
             FROM counts GROUP BY 1),
    probs AS MATERIALIZED (
        SELECT c.from_type, c.to_type, c.n * 1.0 / o.n_out AS p
        FROM counts c JOIN outs o USING (from_type)),
    states AS MATERIALIZED (SELECT from_type AS state FROM outs),
    firsts AS (
        SELECT event_type AS state, CAST(count(*) AS BIGINT) AS n_first
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1 GROUP BY 1),
    pi AS MATERIALIZED (SELECT * FROM firsts),
    n_users AS (SELECT CAST(sum(n_first) AS BIGINT) AS nu FROM firsts),
    {",".join(parts)},
    re AS (
        SELECT channel, base_conv_prob, conv_prob_without,
               round(1.0 - conv_prob_without / base_conv_prob, 6)
                   AS removal_effect
        FROM ({rows})),
    tot AS (SELECT CAST(sum(CAST(round(removal_effect * 1e6) AS BIGINT))
                        AS BIGINT) AS sre FROM re)
    SELECT channel, base_conv_prob, conv_prob_without, removal_effect,
           round(CAST(round(removal_effect * 1e6) AS BIGINT) * 1.0 / sre,
                 4) AS attribution_share
    FROM re CROSS JOIN tot
    ORDER BY removal_effect DESC, channel
    """


QUERIES["markov_removal_attribution"] = analytics.markov_removal_attribution
ORACLES["markov_removal_attribution"] = _removal_oracle()

# Segmented slopes at the CUSUM changepoint (round 8, session 3):
# BIGINT OLS sufficient statistics on each side of the shared peak.
QUERIES["changepoint_slopes"] = analytics.changepoint_slopes
ORACLES["changepoint_slopes"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    daily AS MATERIALIZED (
        SELECT g.event_type, g.day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    totals AS (
        SELECT event_type, CAST(sum(y) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1),
    path AS (
        SELECT d.event_type, d.day, t.n_days,
               sum(t.n_days * d.y - t.total)
                   OVER (PARTITION BY d.event_type ORDER BY d.day
                         ROWS UNBOUNDED PRECEDING) AS s
        FROM daily d JOIN totals t USING (event_type)),
    peak AS MATERIALIZED (
        SELECT event_type, day AS peak_day,
               round(abs(s) / CAST(n_days AS DOUBLE), 4) AS cusum_max
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(s) DESC, day) AS rk
              FROM path)
        WHERE rk = 1),
    seg AS (
        SELECT d.event_type, p.peak_day, p.cusum_max,
               CASE WHEN d.day <= p.peak_day THEN 1 ELSE 0 END AS before,
               CAST(d.day - p.peak_day AS BIGINT) AS x, d.y
        FROM daily d JOIN peak p USING (event_type)),
    stats AS (
        SELECT event_type, peak_day, cusum_max, before,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM seg GROUP BY 1, 2, 3, 4),
    sided AS (
        SELECT event_type, peak_day, cusum_max, before,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN round((n * sxy - sx * sy) * 1.0
                               / (n * sxx - sx * sx), 6)
                    ELSE 0.0 END AS slope,
               round(sy * 1.0 / n, 4) AS mean_y,
               n AS n_days
        FROM stats)
    SELECT bf.event_type, bf.peak_day, bf.cusum_max,
           bf.n_days AS n_days_before,
           coalesce(af.n_days, 0) AS n_days_after,
           bf.mean_y AS mean_before,
           coalesce(af.mean_y, 0.0) AS mean_after,
           bf.slope AS slope_before,
           coalesce(af.slope, 0.0) AS slope_after,
           round(coalesce(af.slope, 0.0) - bf.slope, 6) AS slope_change
    FROM (SELECT * FROM sided WHERE before = 1) bf
    LEFT JOIN (SELECT * FROM sided WHERE before = 0) af
           ON af.event_type = bf.event_type
    ORDER BY bf.event_type
"""

# A/A-test calibration (round 8, session 3): 20 md5 null experiments,
# exact Welch z per split, micro-frozen summary moments.
QUERIES["aa_test_calibration"] = analytics.aa_test_calibration
ORACLES["aa_test_calibration"] = """
    WITH reps AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               unnest(range(0, 20)) AS split_id
        FROM events),
    cells AS (
        SELECT split_id,
               ('0x' || substr(md5('aa:' || CAST(user_id AS VARCHAR)
                               || ':' || CAST(split_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM reps GROUP BY 1, 2),
    sides AS (
        SELECT split_id, arm, n,
               s / CAST(n AS DOUBLE) AS m,
               (ss - s * (s / CAST(n AS DOUBLE))) / (n - 1.0) AS v
        FROM cells),
    per_split AS MATERIALIZED (
        SELECT t.split_id, t.n AS nt, c.n AS nc,
               round((t.m - c.m) / sqrt(t.v / t.n + c.v / c.n), 4)
                   AS z_score,
               CAST(CASE WHEN abs(round((t.m - c.m)
                          / sqrt(t.v / t.n + c.v / c.n), 4)) > 1.96
                         THEN 1 ELSE 0 END AS INT) AS false_positive
        FROM (SELECT * FROM sides WHERE arm = 1) t
        JOIN (SELECT * FROM sides WHERE arm = 0) c USING (split_id)),
    summary AS (
        SELECT round(sum(false_positive) * 1.0 / count(*), 4) AS fp_rate,
               round(sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                     / count(*), 4) AS mean_z,
               round((sum(CAST(round(z_score * 1e4) AS BIGINT)
                          * CAST(round(z_score * 1e4) AS BIGINT)) / 1e8
                      - count(*)
                        * (sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                           / count(*))
                        * (sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                           / count(*)))
                     / (count(*) - 1.0), 4) AS var_z
        FROM per_split)
    SELECT split_id, nt, nc, z_score, false_positive,
           fp_rate, mean_z, var_z
    FROM per_split CROSS JOIN summary
    ORDER BY split_id
"""

# Quantile normalization (round 8, session 3): per-mille grid mapping
# to pooled order statistics; integer grid index, integer value folds.
QUERIES["quantile_normalize_profile"] = curation.quantile_normalize_profile
ORACLES["quantile_normalize_profile"] = """
    WITH docs AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
        FROM documents),
    ranked AS (
        SELECT source, v,
               row_number() OVER (PARTITION BY source
                                  ORDER BY v, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS ns
        FROM docs),
    withg AS (
        SELECT source, v,
               CAST((1000 * r + ns - 1) // ns AS BIGINT) AS g
        FROM ranked),
    hist AS (SELECT v, count(*) AS n FROM docs GROUP BY v),
    cum AS (
        SELECT v,
               sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER () AS nt
        FROM hist),
    pooled AS MATERIALIZED (
        SELECT g.g, CAST(min(cum.v) AS BIGINT) AS v_mapped
        FROM (SELECT unnest(range(1, 1001)) AS g) g
        JOIN cum ON cum.c >= CAST(ceil(g.g * cum.nt / 1000.0) AS BIGINT)
        GROUP BY g.g),
    mapped AS (
        SELECT w.source, w.v, p.v_mapped
        FROM withg w JOIN pooled p USING (g)),
    per_source AS MATERIALIZED (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(v) * 1.0 / count(*), 4) AS mean_pre,
               round(sum(v_mapped) * 1.0 / count(*), 4) AS mean_post
        FROM mapped GROUP BY source),
    spread AS (
        SELECT round(max(CAST(round(mean_pre * 1e4) AS BIGINT)) / 1e4
                     - min(CAST(round(mean_pre * 1e4) AS BIGINT)) / 1e4,
                     4) AS pre_spread,
               round(max(CAST(round(mean_post * 1e4) AS BIGINT)) / 1e4
                     - min(CAST(round(mean_post * 1e4) AS BIGINT)) / 1e4,
                     4) AS post_spread
        FROM per_source)
    SELECT source, n_docs, mean_pre, mean_post, pre_spread, post_spread
    FROM per_source CROSS JOIN spread
    ORDER BY source
"""

# Spearman rank correlation (round 8, session 3): integer double-rank
# midranks off the cumulative histogram; one sqrt of double-cast
# moments (BIGINT products would overflow).
QUERIES["spearman_user_metrics"] = analytics.spearman_user_metrics
ORACLES["spearman_user_metrics"] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS a,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS b
        FROM events GROUP BY user_id),
    ha AS (SELECT a, CAST(count(*) AS BIGINT) AS nv FROM per_user
           GROUP BY a),
    ca AS (SELECT a, nv,
                  sum(nv) OVER (ORDER BY a ROWS UNBOUNDED PRECEDING)
                      AS c
           FROM ha),
    dra AS (SELECT a, CAST(2 * c - nv + 1 AS BIGINT) AS dr_a FROM ca),
    hb AS (SELECT b, CAST(count(*) AS BIGINT) AS nv FROM per_user
           GROUP BY b),
    cb AS (SELECT b, nv,
                  sum(nv) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                      AS c
           FROM hb),
    drb AS (SELECT b, CAST(2 * c - nv + 1 AS BIGINT) AS dr_b FROM cb),
    ranked AS (
        SELECT dr_a, dr_b
        FROM per_user JOIN dra USING (a) JOIN drb USING (b)),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dr_a) AS BIGINT) AS sx,
               CAST(sum(dr_b) AS BIGINT) AS sy,
               CAST(sum(dr_a * dr_a) AS BIGINT) AS sxx,
               CAST(sum(dr_b * dr_b) AS BIGINT) AS syy,
               CAST(sum(dr_a * dr_b) AS BIGINT) AS sxy
        FROM ranked)
    SELECT n AS n_users,
           round((n * sxy - sx * sy) * 1.0
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS spearman_rho
    FROM m
"""

# Price elasticity (round 8, session 3): ln-ln OLS across parts per
# type, 1e-4 frozen logs, BIGINT sufficient statistics.
QUERIES["price_elasticity"] = analytics.price_elasticity
ORACLES["price_elasticity"] = """
    WITH qty AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY l_partkey),
    base AS (
        SELECT p.p_type,
               CAST(round(ln(CAST(round(p.p_retailprice * 100) AS BIGINT)
                             / 100.0) * 10000) AS BIGINT) AS xm,
               CAST(round(ln(CAST(q AS DOUBLE)) * 10000) AS BIGINT) AS ym
        FROM qty JOIN part p ON p.p_partkey = qty.l_partkey),
    m AS (
        SELECT p_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xm) AS BIGINT) AS sx,
               CAST(sum(ym) AS BIGINT) AS sy,
               CAST(sum(xm * xm) AS BIGINT) AS sxx,
               CAST(sum(ym * ym) AS BIGINT) AS syy,
               CAST(sum(xm * ym) AS BIGINT) AS sxy
        FROM base GROUP BY p_type)
    SELECT p_type, n AS n_parts,
           round(sx / 1e4 / n, 4) AS avg_ln_price,
           round(sy / 1e4 / n, 4) AS avg_ln_qty,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 4)
               AS elasticity,
           round((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 4)
               AS r_squared
    FROM m ORDER BY p_type
"""

# Doubly-robust ATE (round 8, session 3): per-stratum 6-dp models,
# micro-frozen AIPW terms, exact integer folds.
QUERIES["doubly_robust_ate"] = analytics.doubly_robust_ate
ORACLES["doubly_robust_ate"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS y,
               ('0x' || substr(md5('dr:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS t
        FROM events),
    strata AS (
        SELECT event_type,
               round(sum(t) / CAST(count(*) AS DOUBLE), 6) AS e,
               round(sum(t * y) / CAST(sum(t) AS DOUBLE), 6) AS m1,
               round(sum((1 - t) * y)
                     / CAST(count(*) - sum(t) AS DOUBLE), 6) AS m0
        FROM ev GROUP BY event_type),
    scored AS (
        SELECT ev.t, ev.y, s.e, s.m1, s.m0,
               CAST(round(1000000.0 * (s.m1 + ev.t * (ev.y - s.m1) / s.e))
                    AS BIGINT) AS t1,
               CAST(round(1000000.0 * (s.m0 + (1 - ev.t) * (ev.y - s.m0)
                                       / (1 - s.e))) AS BIGINT) AS t0
        FROM ev JOIN strata s USING (event_type)),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS n_treat,
               CAST(sum(t1) AS BIGINT) AS s1,
               CAST(sum(t0) AS BIGINT) AS s0,
               CAST(sum(t * y) AS BIGINT) AS syt,
               CAST(sum((1 - t) * y) AS BIGINT) AS syc
        FROM scored)
    SELECT n, n_treat,
           round((syt / CAST(n_treat AS DOUBLE)
                  - syc / CAST(n - n_treat AS DOUBLE)) / 100.0, 4)
               AS ate_naive,
           round(s1 / 1e6 / n / 100.0, 4) AS mu1_dr,
           round(s0 / 1e6 / n / 100.0, 4) AS mu0_dr,
           round(s1 / 1e6 / n / 100.0 - s0 / 1e6 / n / 100.0, 4)
               AS ate_dr
    FROM agg
"""

# PPS + Horvitz-Thompson (round 8, session 3): md5-uniform inclusion
# draws at pi ∝ size; frozen per-row contributions; shipped with its
# own exact-total validation.
QUERIES["pps_horvitz_thompson"] = analytics.pps_horvitz_thompson
ORACLES["pps_horvitz_thompson"] = """
    WITH orders_c AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pop,
                   CAST(sum(cents) AS BIGINT) AS s_all FROM orders_c),
    base AS (
        SELECT o_orderkey, cents, n_pop, s_all,
               least(1.0, CAST(round(n_pop * 0.05) AS BIGINT) * cents
                          / CAST(s_all AS DOUBLE)) AS pi,
               ('0x' || substr(md5('pps:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM orders_c CROSS JOIN tot),
    est AS (
        SELECT CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(CAST(round(cents / pi) AS BIGINT)) AS BIGINT)
                   AS ht_cents
        FROM base WHERE u < pi)
    SELECT n_pop, n_sampled,
           round(s_all / 100.0, 2) AS true_total,
           round(ht_cents / 100.0, 2) AS ht_estimate,
           round(ht_cents / CAST(s_all AS DOUBLE) - 1.0, 6) AS rel_err
    FROM est CROSS JOIN tot
"""

# Day-of-week seasonal indices (round 8, session 3): integer weekday
# arithmetic over the zero-filled grid.
QUERIES["seasonal_indices"] = analytics.seasonal_indices
ORACLES["seasonal_indices"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type,
               CAST((g.day + 4) % 7 AS INT) AS weekday,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    per_wd AS (
        SELECT event_type, weekday,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s
        FROM series GROUP BY 1, 2),
    tot AS (
        SELECT event_type, CAST(sum(n_days) AS BIGINT) AS nt,
               CAST(sum(s) AS BIGINT) AS st
        FROM per_wd GROUP BY 1)
    SELECT p.event_type, p.weekday, p.n_days,
           round(p.s * 1.0 / p.n_days, 4) AS mean_count,
           round((p.s * 1.0 / p.n_days)
                 / (t.st * 1.0 / t.nt), 4) AS seasonal_index
    FROM per_wd p JOIN tot t USING (event_type)
    ORDER BY p.event_type, p.weekday
"""

# Church-Gale burstiness (round 8, session 3): df vs the Poisson
# expectation from one exp() of exact integer ratios.
QUERIES["term_burstiness"] = text.term_burstiness
ORACLES["term_burstiness"] = """
    WITH td AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE length(term) > 0
        GROUP BY term, doc_id),
    stats AS (
        SELECT term, CAST(sum(n) AS BIGINT) AS tf,
               CAST(count(*) AS BIGINT) AS df
        FROM td GROUP BY term),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents)
    SELECT term, tf, df,
           round(n_corpus * (1 - exp(-tf / CAST(n_corpus AS DOUBLE))), 4)
               AS expected_df,
           round(df / round(n_corpus
                            * (1 - exp(-tf / CAST(n_corpus AS DOUBLE))),
                            4), 4) AS df_ratio,
           round(tf * 1.0 / df, 4) AS occurrences_per_doc
    FROM stats CROSS JOIN nd
    ORDER BY tf DESC, term
    LIMIT 20
"""

# Streaming Holt twin (round 8, session 3): daily count state, shared
# weight-literal kernel, same oracle as the batch backtest.
QUERIES["stream_holt_forecast"] = replay.stream_holt_forecast
ORACLES["stream_holt_forecast"] = ORACLES["holt_forecast_eval"]

# Benjamini-Hochberg FDR correction (round 8, session 3): per-type
# Welch drift z vs offline normal-quantile micro literals; step-up k*.
QUERIES["bh_fdr_correction"] = quality.bh_fdr_correction
ORACLES["bh_fdr_correction"] = """
    WITH base AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    anchor AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT)
                   AS mid FROM base),
    m AS (
        SELECT event_type,
               CASE WHEN day <= (SELECT mid FROM anchor)
                    THEN 1 ELSE 0 END AS a,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM base GROUP BY 1, 2),
    sides AS (
        SELECT event_type, a, n,
               s / CAST(n AS DOUBLE) AS mu,
               (ss - s * (s / CAST(n AS DOUBLE))) / (n - 1.0) AS v
        FROM m),
    scored AS (
        SELECT ea.event_type,
               round((ea.mu - eb.mu)
                     / sqrt(ea.v / ea.n + eb.v / eb.n), 4) AS z_score
        FROM (SELECT * FROM sides WHERE a = 1) ea
        JOIN (SELECT * FROM sides WHERE a = 0) eb USING (event_type)),
    ranked AS (
        SELECT event_type, z_score,
               CAST(row_number() OVER (ORDER BY abs(z_score) DESC,
                                       event_type) AS INT) AS rank
        FROM scored),
    th(rank, z_star_micro) AS (VALUES
        (1, 2326348), (2, 2053749), (3, 1880794),
        (4, 1750686), (5, 1644854)),
    passed AS MATERIALIZED (
        SELECT r.event_type, r.rank, r.z_score, t.z_star_micro,
               CASE WHEN CAST(round(abs(r.z_score) * 1e6) AS BIGINT)
                         >= t.z_star_micro
                    THEN 1 ELSE 0 END AS passes
        FROM ranked r JOIN th t USING (rank)),
    kstar AS (
        SELECT CAST(coalesce(max(CASE WHEN passes = 1 THEN rank END), 0)
                    AS INT) AS k_star
        FROM passed)
    SELECT event_type, rank, z_score,
           round(z_star_micro / 1e6, 6) AS bh_boundary,
           CAST(CASE WHEN rank <= k_star THEN 1 ELSE 0 END AS INT)
               AS drift_rejected
    FROM passed CROSS JOIN kstar
    ORDER BY rank
"""

# ICC / design effect (round 8, session 3): one-way ANOVA identities
# from BIGINT moments; micro-frozen per-user s^2/n terms.
QUERIES["icc_profile"] = analytics.icc_profile
ORACLES["icc_profile"] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM events GROUP BY user_id),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s) AS BIGINT) AS sy,
               CAST(sum(ss) AS BIGINT) AS syy,
               CAST(sum(CAST(round(1000000.0 * s * s
                                   / CAST(n AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS sb_micro,
               CAST(sum(n * n) AS BIGINT) AS sn2
        FROM per_user),
    d AS (
        SELECT k, nn,
               nn * 1.0 / k AS mbar,
               (sb_micro / 1e6 - sy * (sy / CAST(nn AS DOUBLE)))
                   / (k - 1.0) AS msb,
               (syy - sb_micro / 1e6) / CAST(nn - k AS DOUBLE) AS msw,
               (nn - sn2 / CAST(nn AS DOUBLE)) / (k - 1.0) AS m0
        FROM agg)
    SELECT k AS n_users, nn AS n_events,
           round(mbar, 4) AS avg_cluster_size,
           round(msw / 10000.0, 4) AS within_var,
           round(greatest(0.0, (msb - msw) / m0) / 10000.0, 4)
               AS between_var,
           round(greatest(0.0, (msb - msw) / m0)
                 / (greatest(0.0, (msb - msw) / m0) + msw), 6) AS icc,
           round(1.0 + (mbar - 1.0)
                       * (greatest(0.0, (msb - msw) / m0)
                          / (greatest(0.0, (msb - msw) / m0) + msw)), 4)
               AS design_effect
    FROM d
"""

# MDE power table (round 8, session 3): offline z literals, pooled
# cent variance, one sqrt per plan row.
QUERIES["mde_power_analysis"] = analytics.mde_power_analysis
ORACLES["mde_power_analysis"] = """
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_obs,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM events),
    grid(n0) AS (VALUES (1000), (10000), (100000), (-1)),
    base AS (
        SELECT CASE WHEN n0 = -1 THEN n_obs // 2
                    ELSE CAST(n0 AS BIGINT) END AS n_per_arm,
               CAST(CASE WHEN n0 = -1 THEN 1 ELSE 0 END AS INT)
                   AS is_observed_n,
               s / CAST(n_obs AS DOUBLE) AS mu_c,
               (ss - s * (s / CAST(n_obs AS DOUBLE))) / (n_obs - 1.0)
                   AS var_c
        FROM m CROSS JOIN grid)
    SELECT n_per_arm, is_observed_n,
           round(mu_c / 100.0, 4) AS baseline_mean,
           round(2.801585 * sqrt(2.0 * var_c / n_per_arm) / 100.0, 4)
               AS mde_abs,
           round(2.801585 * sqrt(2.0 * var_c / n_per_arm) / mu_c, 6)
               AS mde_rel
    FROM base ORDER BY n_per_arm
"""

# Sessionization gap sweep (round 8, session 3): one delta pass,
# three integer break counts.
QUERIES["session_gap_sweep"] = windows.session_gap_sweep
ORACLES["session_gap_sweep"] = """
    WITH deltas AS (
        SELECT user_id,
               epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                   AS dt
        FROM events),
    totals AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN dt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_users
        FROM deltas),
    gaps(gap_minutes) AS (VALUES (10), (30), (60)),
    sweep AS (
        SELECT g.gap_minutes,
               CAST(sum(CASE WHEN d.dt > g.gap_minutes * 60
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
        FROM deltas d CROSS JOIN gaps g
        GROUP BY g.gap_minutes)
    SELECT CAST(s.gap_minutes AS INT) AS gap_minutes,
           CAST(t.n_users + s.n_breaks AS BIGINT) AS n_sessions,
           round(t.n_events * 1.0 / (t.n_users + s.n_breaks), 4)
               AS avg_events_per_session
    FROM sweep s CROSS JOIN totals t
    ORDER BY gap_minutes
"""

# Freshness audit (round 8, session 3): per-type high-water lag,
# anchored to the corpus max (pure function of the data).
QUERIES["freshness_audit"] = quality.freshness_audit
ORACLES["freshness_audit"] = """
    WITH per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(floor(epoch(ts))) AS BIGINT) AS last_epoch
        FROM events GROUP BY event_type),
    anchor AS (SELECT max(last_epoch) AS hwm FROM per_type)
    SELECT event_type, n_events, last_epoch,
           round((hwm - last_epoch) / 3600.0, 4) AS lag_hours,
           CAST(CASE WHEN round((hwm - last_epoch) / 3600.0, 4) > 48.0
                     THEN 1 ELSE 0 END AS INT) AS stale
    FROM per_type CROSS JOIN anchor
    ORDER BY event_type
"""

# Streaming Mann-Kendall twin (round 8, session 3): daily count state,
# shared kernel, same oracle.
QUERIES["stream_mann_kendall"] = replay.stream_mann_kendall
ORACLES["stream_mann_kendall"] = ORACLES["mann_kendall_trend"]

# Negative-binomial MoM fit (round 8, session 3): NB2 parameters from
# 6-dp moments with the fitted-vs-observed zero-fraction check.
QUERIES["negbin_fit_profile"] = analytics.negbin_fit_profile
ORACLES["negbin_fit_profile"] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss,
               CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM series GROUP BY 1),
    d AS (
        SELECT event_type, n_days, n_zero,
               round(s * 1.0 / n_days, 6) AS mean,
               round((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0), 6)
                   AS var
        FROM m)
    SELECT event_type, n_days,
           mean AS mean_daily, var AS var_daily,
           CASE WHEN var > mean
                THEN round(mean * mean / (var - mean), 4)
                ELSE 0.0 END AS nb_r,
           CASE WHEN var > mean THEN round(mean / var, 4)
                ELSE 1.0 END AS nb_p,
           CASE WHEN var > mean
                THEN round(pow(round(mean * mean / (var - mean), 4)
                               / (round(mean * mean / (var - mean), 4)
                                  + mean),
                               round(mean * mean / (var - mean), 4)), 4)
                ELSE round(exp(-mean), 4) END AS p0_fitted,
           round(n_zero * 1.0 / n_days, 4) AS p0_observed
    FROM d ORDER BY event_type
"""

# V-measure (round 8, session 3): entropy agreement between the lang
# and source partitions; micro-frozen p ln p folds.
QUERIES["lang_source_vmeasure"] = quality.lang_source_vmeasure
ORACLES["lang_source_vmeasure"] = """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM cells),
    hl AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (m * 1.0 / ntot)
                                   * ln(m * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_lang
        FROM (SELECT lang, CAST(sum(n) AS BIGINT) AS m
              FROM cells GROUP BY lang) CROSS JOIN tot),
    hs AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (m * 1.0 / ntot)
                                   * ln(m * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_src
        FROM (SELECT source, CAST(sum(n) AS BIGINT) AS m
              FROM cells GROUP BY source) CROSS JOIN tot),
    hj AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (n * 1.0 / ntot)
                                   * ln(n * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_joint
        FROM cells CROSS JOIN tot),
    j AS (SELECT * FROM hl CROSS JOIN hs CROSS JOIN hj)
    SELECT round(h_lang / 1e6, 6) AS h_lang,
           round(h_src / 1e6, 6) AS h_source,
           round(h_joint / 1e6, 6) AS h_joint,
           round(1.0 - (h_joint - h_src) * 1.0 / h_lang, 6)
               AS homogeneity,
           round(1.0 - (h_joint - h_lang) * 1.0 / h_src, 6)
               AS completeness,
           round(2.0 * (1.0 - (h_joint - h_src) * 1.0 / h_lang)
                     * (1.0 - (h_joint - h_lang) * 1.0 / h_src)
                 / ((1.0 - (h_joint - h_src) * 1.0 / h_lang)
                    + (1.0 - (h_joint - h_lang) * 1.0 / h_src)), 6)
               AS v_measure
    FROM j
"""

# Theil-T inequality (round 8, session 3): sort-free decomposable
# concentration index; micro-frozen share*ln terms.
QUERIES["theil_inequality_index"] = analytics.theil_inequality_index
ORACLES["theil_inequality_index"] = """
    WITH per AS (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events GROUP BY 1, 2),
    both_g AS (
        SELECT event_type AS segment, user_id, x FROM per
        UNION ALL
        SELECT '__all__', user_id, CAST(sum(x) AS BIGINT)
        FROM per GROUP BY user_id),
    tot AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS xt
        FROM both_g GROUP BY segment),
    terms AS (
        SELECT g.segment, t.n_users,
               CASE WHEN g.x > 0
                    THEN CAST(round(1000000.0
                              * (g.x / CAST(t.xt AS DOUBLE))
                              * ln(g.x / (t.xt
                                          / CAST(t.n_users AS DOUBLE))))
                         AS BIGINT)
                    ELSE 0 END AS tm
        FROM both_g g JOIN tot t USING (segment))
    SELECT segment, n_users,
           round(sum(tm) / 1e6, 6) AS theil_t
    FROM terms GROUP BY segment, n_users
    ORDER BY segment
"""

# Cross-run dedup manifest diff (round 10 stretch, VERDICT r9 task #7):
# current-vs-previous snapshot keeper diff under the exact-dedup rule —
# enters the gate via the r11+ window per the write-ahead discipline;
# until then test_oracle_parity regression-guards it every run.
QUERIES["dedup_manifest_diff"] = dedup.dedup_manifest_diff
ORACLES["dedup_manifest_diff"] = """
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, source, text FROM documents
        WHERE doc_id % 10 = 0),
    tagged AS MATERIALIZED (
        SELECT doc_id, source,
               ('0x' || substr(md5('manifest:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 >= 0.8 AS is_new,
               sha256(text) AS fp
        FROM corpus),
    prev_k AS (SELECT fp, min(doc_id) AS prev_keeper FROM tagged
               WHERE NOT is_new GROUP BY fp),
    curr_k AS MATERIALIZED (
        SELECT fp, min(doc_id) AS curr_keeper FROM tagged GROUP BY fp),
    keep AS (
        SELECT t.source,
               CASE WHEN p.prev_keeper IS NULL THEN 'new_content'
                    WHEN p.prev_keeper = c.curr_keeper THEN 'retained'
                    ELSE 'displaced' END AS status
        FROM curr_k c
        LEFT JOIN prev_k p USING (fp)
        JOIN tagged t ON t.doc_id = c.curr_keeper),
    ks AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_keepers,
               CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN status = 'displaced' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_displaced,
               CAST(sum(CASE WHEN status = 'new_content' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new_content
        FROM keep GROUP BY source),
    arr AS (
        SELECT t.source,
               CAST(count(*) AS BIGINT) AS n_arrivals,
               CAST(sum(CASE WHEN c.curr_keeper IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_arrivals_kept
        FROM tagged t
        LEFT JOIN curr_k c ON c.curr_keeper = t.doc_id
        WHERE t.is_new GROUP BY t.source)
    SELECT source,
           CAST(coalesce(n_keepers, 0) AS BIGINT) AS n_keepers,
           CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
           CAST(coalesce(n_displaced, 0) AS BIGINT) AS n_displaced,
           CAST(coalesce(n_new_content, 0) AS BIGINT) AS n_new_content,
           CAST(coalesce(n_arrivals, 0) AS BIGINT) AS n_arrivals,
           CAST(coalesce(n_arrivals_kept, 0) AS BIGINT) AS n_arrivals_kept,
           CAST(coalesce(n_arrivals, 0) - coalesce(n_arrivals_kept, 0)
                AS BIGINT) AS n_arrivals_deduped
    FROM ks FULL OUTER JOIN arr USING (source)
    ORDER BY source
"""


# Hard-negative mining (round 10 stretch #2): per-anchor top-k
# most-similar DIFFERENT-label vectors — the contrastive-training
# curation step; exact form is the gate/oracle variant, ANN probes are
# the corpus-scale candidate stage (knn family composition).
QUERIES["hard_negative_mining"] = similarity.hard_negative_mining
ORACLES["hard_negative_mining"] = """
    WITH q AS (SELECT vec_id AS query_id, label AS anchor_label,
                      embedding AS q_emb
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, q.anchor_label,
               e.vec_id AS neg_vec_id, e.label AS neg_label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.q_emb AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                                CAST(q.q_emb AS DOUBLE[])))),
                     6) AS cos_sim
        FROM embeddings e CROSS JOIN q WHERE e.label != q.anchor_label),
    ranked AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_sim DESC, neg_vec_id) AS INTEGER) AS rank
        FROM scored)
    SELECT query_id, anchor_label, rank, neg_vec_id, neg_label, cos_sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
"""


def _stream_update_ann_index_oracle(
    n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of replay.stream_update_ann_index: the stream-maintained
    index (nightly base ⊕ every arrival micro-batch) must equal a
    from-scratch RP-LSH hash of the FULL corpus — same deterministic
    Rademacher bucket expressions as _ann_recall_oracle, rolled up to
    the per-table profile with an integer membership checksum."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck})
        SELECT CAST(t AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
               CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
               CAST(sum(bucket * 100003 + vec_id) AS BIGINT) AS checksum
        FROM buck GROUP BY t ORDER BY t
    """


# Streaming maintenance of the persisted ANN index (round 11 stretch,
# r10 verdict task #7): foreachBatch folds each embedding-ingest
# micro-batch into the nightly RP-LSH index via update_ann_index;
# fold ≡ rebuild makes the full profile oracle-checkable.
QUERIES["stream_update_ann_index"] = replay.stream_update_ann_index
ORACLES["stream_update_ann_index"] = _stream_update_ann_index_oracle()

# Round-13 (r11 verdict task #4 carried): the same bounded fold followed
# by compact_ann_index — the oracle is shared VERBATIM because
# compaction must change the file layout without changing one row of
# index content; the file-count drop and probe identity are test-pinned.
QUERIES["stream_ann_compaction"] = replay.stream_ann_compaction
ORACLES["stream_ann_compaction"] = _stream_update_ann_index_oracle()


# Round-11 wave: training-mix planning + secret scanning -------------------

# Temperature-sampling sweep (mT5/XLM-R temperature knob): per-alpha
# source shares, boost vs natural sampling, and mixture entropy — the
# table that justifies corpus_mixture's fixed alpha.
QUERIES["mixture_temperature_sweep"] = curation.mixture_temperature_sweep
ORACLES["mixture_temperature_sweep"] = """
    WITH t AS (
        SELECT source,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM t GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM sizes),
    alphas AS (SELECT unnest([0.2, 0.3, 0.5, 0.7, 1.0]) AS alpha),
    fanned AS (
        SELECT alpha, source, n_docs, src_tokens,
               src_tokens * 1.0 / total AS p,
               CAST(round(pow(src_tokens * 1.0 / total, alpha) * 1e6, 0)
                    AS BIGINT) AS w_micro
        FROM sizes CROSS JOIN tot CROSS JOIN alphas),
    norms AS (SELECT alpha, CAST(sum(w_micro) AS BIGINT) AS w_sum
              FROM fanned GROUP BY alpha),
    shared AS (
        SELECT f.*, w_micro * 1.0 / w_sum AS share
        FROM fanned f JOIN norms USING (alpha)),
    ent AS (
        SELECT alpha,
               round(sum(CAST(round(-share * ln(share) * 1e9, 0) AS BIGINT))
                     / 1e9, 6) AS mix_entropy
        FROM shared GROUP BY alpha)
    SELECT alpha, source, n_docs, src_tokens,
           round(p, 6) AS base_share,
           round(share, 6) AS sampling_share,
           round(share / p, 4) AS boost,
           mix_entropy
    FROM shared JOIN ent USING (alpha)
    ORDER BY alpha, source
"""

# Token-budget allocation under a repetition cap (data-constrained
# scaling, Muennighoff et al. 2023): greedy quality-ordered fill,
# max_epochs passes per source; pure BIGINT window arithmetic.
QUERIES["token_budget_planner"] = curation.token_budget_planner
ORACLES["token_budget_planner"] = """
    WITH t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    quality AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(CAST(round(score * 10000) AS BIGINT))
                     / 10000.0 / count(*), 4) AS mean_score
        FROM scored GROUP BY source),
    tok AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        x -> length(x) > 0)))
                    AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
    tt AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM tok),
    base AS (
        SELECT q.source, q.mean_score, q.n_docs, k.src_tokens,
               CAST(floor(total * 1.5) AS BIGINT) AS budget,
               CAST(4 * k.src_tokens AS BIGINT) AS cap_tokens
        FROM quality q JOIN tok k USING (source) CROSS JOIN tt),
    alloc AS (
        SELECT *, coalesce(sum(cap_tokens) OVER (
                   ORDER BY mean_score, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM base)
    SELECT source, mean_score, n_docs, src_tokens AS n_tokens, cap_tokens,
           CAST(greatest(0, least(cap_tokens, budget - cum_before))
                AS BIGINT) AS alloc_tokens,
           round(greatest(0, least(cap_tokens, budget - cum_before))
                 * 1.0 / src_tokens, 4) AS epochs
    FROM alloc ORDER BY mean_score, source
"""

# Credential/secret scanning (Dolma/StarCoder pre-training governance
# step): planted md5-derived secrets, per-source exposure profile.
QUERIES["secret_scan_profile"] = text.secret_scan_profile
ORACLES["secret_scan_profile"] = r"""
    WITH planted AS (
        SELECT doc_id, source,
               text
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' key AKIA' || upper(substr(
                             md5('aws:' || CAST(doc_id AS VARCHAR)), 1, 16))
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' token ' || md5('hex:' || CAST(doc_id AS VARCHAR))
                        ELSE '' END)
               || (CASE WHEN doc_id % 13 = 0
                        THEN ' Bearer sk-' || substr(
                             md5('sk:' || CAST(doc_id AS VARCHAR)), 1, 20)
                        ELSE '' END) AS text
        FROM documents),
    counted AS (
        SELECT source,
               len(regexp_extract_all(text, 'AKIA[0-9A-F]{16}')) AS n_aws_key,
               len(regexp_extract_all(text, '\b[0-9a-f]{32}\b')) AS n_hex32,
               len(regexp_extract_all(text, 'sk-[0-9a-f]{20}')) AS n_bearer
        FROM planted)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_aws_key + n_hex32 + n_bearer > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
           CAST(sum(n_aws_key) AS BIGINT) AS n_aws_key,
           CAST(sum(n_hex32) AS BIGINT) AS n_hex32,
           CAST(sum(n_bearer) AS BIGINT) AS n_bearer,
           round(sum(CASE WHEN n_aws_key + n_hex32 + n_bearer > 0
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS flag_rate
    FROM counted GROUP BY source ORDER BY source
"""


# Round-11 second wave: streaming governance twin, ORC format breadth,
# MinHash estimator calibration --------------------------------------------

def _orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.sources.ingest import orc_roundtrip_query

    return orc_roundtrip_query(spark, sf_dir)


# ORC is lossless for the orders schema, so the roundtrip aggregate
# shares the CSV roundtrip's oracle (both must equal the parquet truth).
QUERIES["orc_roundtrip_ingest"] = _orc_roundtrip
ORACLES["orc_roundtrip_ingest"] = ORACLES["csv_roundtrip_ingest"]

# streaming twin of secret_scan_profile — bounded replay must equal the
# batch exposure profile exactly, so the SQL twin is shared verbatim
QUERIES["stream_secret_scan"] = replay.stream_secret_scan
ORACLES["stream_secret_scan"] = ORACLES["secret_scan_profile"]


def _minhash_calibration_oracle(n_hashes: int = 16) -> str:
    """SQL twin of dedup.minhash_calibration_profile: band-collision
    candidates at threshold 0, exact shingle Jaccard, rolled up to the
    per-agreement-level calibration table."""
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    jac = (
        "len(list_intersect(ga.gs, gb.gs)) * 1.0"
        " / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))"
    )
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id),
        est AS (SELECT doc_a, doc_b,
                       round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
                FROM cand
                JOIN sig sa ON sa.doc_id = doc_a
                JOIN sig sb ON sb.doc_id = doc_b),
        scored AS (
            SELECT est_jaccard, round({jac}, 6) AS jaccard
            FROM est e
            JOIN sh2 ga ON ga.doc_id = e.doc_a
            JOIN sh2 gb ON gb.doc_id = e.doc_b)
        SELECT est_jaccard,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum(CAST(round(jaccard * 1e6) AS BIGINT))
                     / 1e6 / count(*), 6) AS mean_exact,
               round(sum(CAST(round(abs(est_jaccard - jaccard) * 1e6) AS BIGINT))
                     / 1e6 / count(*), 6) AS mean_abs_err,
               CAST(sum(CASE WHEN jaccard < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below_half,
               round(sum(CASE WHEN jaccard < 0.5 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS fp_rate_at_half
        FROM scored GROUP BY est_jaccard ORDER BY est_jaccard
    """


QUERIES["minhash_calibration_profile"] = dedup.minhash_calibration_profile
ORACLES["minhash_calibration_profile"] = _minhash_calibration_oracle()


def _jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.sources.jdbc import jdbc_roundtrip_query

    return jdbc_roundtrip_query(spark, sf_dir)


# S5+S6 live: orders -> embedded-Derby JDBC sink -> parallel partitioned
# re-scan (auto-probed bounds) -> aggregate; lossless round-trip, so the
# CSV roundtrip's parquet-truth oracle is shared.
QUERIES["jdbc_roundtrip_ingest"] = _jdbc_roundtrip
ORACLES["jdbc_roundtrip_ingest"] = ORACLES["csv_roundtrip_ingest"]


# Training-data card (round 11 capstone): six oracle-green kernels
# composed into the per-source release artifact.
QUERIES["training_data_card"] = curation.training_data_card
ORACLES["training_data_card"] = r"""
    WITH corpus AS (
        SELECT doc_id, source, lang, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, source, lang, text FROM documents
        WHERE ('0x' || substr(md5('card:' || CAST(doc_id AS VARCHAR)),
                              1, 8))::BIGINT / 4294967296.0 < 0.1),
    tok AS (
        SELECT source, lang,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM corpus),
    lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_tokens) AS BIGINT) AS toks
           FROM tok GROUP BY source, lang),
    st AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                  CAST(sum(toks) AS BIGINT) AS n_tokens
           FROM lc GROUP BY source),
    ent AS (
        SELECT source,
               round(sum(CAST(round(-(n * 1.0 / n_docs)
                                    * ln(n * 1.0 / n_docs) * 1e9)
                              AS BIGINT)) / 1e9, 6) AS lang_entropy
        FROM lc JOIN st USING (source) GROUP BY source),
    fps AS (SELECT source, sha256(text) AS fp FROM corpus),
    fpc AS (SELECT fp, count(*) AS cnt FROM fps GROUP BY fp),
    dups AS (
        SELECT source,
               CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_docs
        FROM fps JOIN fpc USING (fp) GROUP BY source),
    exposed AS (
        SELECT source,
               (CASE WHEN doc_id % 13 = 0
                     THEN 'call 555-'
                          || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          || ' '
                     ELSE '' END)
               || text
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' key AKIA' || upper(substr(
                             md5('aws:' || CAST(doc_id AS VARCHAR)), 1, 16))
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' token ' || md5('hex:' || CAST(doc_id AS VARCHAR))
                        ELSE '' END)
               || (CASE WHEN doc_id % 13 = 0
                        THEN ' Bearer sk-' || substr(
                             md5('sk:' || CAST(doc_id AS VARCHAR)), 1, 20)
                        ELSE '' END)
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com'
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' see https://docs.example/'
                             || CAST(doc_id AS VARCHAR)
                        ELSE '' END) AS text
        FROM corpus),
    exp2 AS (
        SELECT source,
               CASE WHEN len(regexp_extract_all(text,
                        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
                       + len(regexp_extract_all(text, 'https?://[^ ]+'))
                       + len(regexp_extract_all(text, '\d{3}-\d{3}-\d{4}'))
                       > 0 THEN 1 ELSE 0 END AS has_pii,
               CASE WHEN len(regexp_extract_all(text, 'AKIA[0-9A-F]{16}'))
                       + len(regexp_extract_all(text, '\b[0-9a-f]{32}\b'))
                       + len(regexp_extract_all(text, 'sk-[0-9a-f]{20}'))
                       > 0 THEN 1 ELSE 0 END AS has_secret
        FROM exposed),
    expo AS (
        SELECT source, CAST(sum(has_pii) AS BIGINT) AS pii_docs,
               CAST(sum(has_secret) AS BIGINT) AS secret_docs
        FROM exp2 GROUP BY source),
    t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    quality AS (
        SELECT source,
               round(sum(CAST(round(score * 10000) AS BIGINT))
                     / 10000.0 / count(*), 4) AS mean_lm_score
        FROM scored GROUP BY source)
    SELECT s.source, n_docs, n_tokens, dup_docs,
           round(dup_docs * 1.0 / n_docs, 6) AS dup_rate,
           mean_lm_score,
           pii_docs, round(pii_docs * 1.0 / n_docs, 6) AS pii_rate,
           secret_docs, round(secret_docs * 1.0 / n_docs, 6) AS secret_rate,
           lang_entropy
    FROM st s
    JOIN ent USING (source) JOIN dups USING (source)
    JOIN expo USING (source) JOIN quality USING (source)
    ORDER BY source
"""


def _python_datasource_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 through the Spark-4 Python DataSource API: the pure-Python
    partitioned reader must yield BIT-IDENTICAL rows to the Catalyst
    expression generator, so the oracle is shared verbatim."""
    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )

    spark.dataSource.register(SyntheticInteractionsDataSource)
    return (
        spark.read.format("synthetic_interactions")
        .option("n", 2000)
        .option("seed", 42)
        .option("numPartitions", 8)
        .load()
        .orderBy("user_id", "course_id", "event_ts")
    )


QUERIES["python_datasource_interactions"] = _python_datasource_interactions
ORACLES["python_datasource_interactions"] = ORACLES["synthetic_interactions"]


def _stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 as a Python STREAMING DataSource: the custom-source offset/
    partition/read protocol end to end, bounded replay row-identical to
    the batch generator (shared oracle).  availableNow snapshots one
    offset poll, so the bounded form admits the full range in one
    micro-batch; incremental multi-batch consumption is pinned in
    tests/test_round11.py under a processing-time trigger."""
    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )
    from project_bigdata_recsys_spark.streaming.replay import _run_replay

    spark.dataSource.register(SyntheticInteractionsDataSource)
    stream = (
        spark.readStream.format("synthetic_interactions")
        .option("n", 2000)
        .option("seed", 42)
        .option("batchSize", 2000)
        .option("numPartitions", 8)
        .load()
    )
    table = _run_replay(stream, spark, "append")
    return table.orderBy("user_id", "course_id", "event_ts")


QUERIES["stream_python_datasource"] = _stream_python_datasource
ORACLES["stream_python_datasource"] = ORACLES["synthetic_interactions"]


def _stream_python_datasource_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streaming Python DataSource consumed INCREMENTALLY (r11
    verdict task #5, carried to r13): batchSize 700 over n=2000 forces
    ≥3 latestOffset polls / partition plans under a processing-time
    trigger (`_run_replay_incremental` raises below 3 non-empty
    micro-batches), and the union of all increments must still be
    row-identical to the batch generator — the shared
    synthetic_interactions oracle, now gating the production
    consumption shape instead of the one-snapshot availableNow form."""
    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        _run_replay_incremental,
    )

    spark.dataSource.register(SyntheticInteractionsDataSource)
    n = 2000
    stream = (
        spark.readStream.format("synthetic_interactions")
        .option("n", n)
        .option("seed", 42)
        .option("batchSize", 700)
        .option("numPartitions", 4)
        .load()
    )
    table = _run_replay_incremental(
        stream, spark, expected_rows=n, min_batches=3
    )
    return table.orderBy("user_id", "course_id", "event_ts")


QUERIES["stream_python_datasource_incremental"] = (
    _stream_python_datasource_incremental
)
ORACLES["stream_python_datasource_incremental"] = ORACLES[
    "synthetic_interactions"
]


# Apply the rotation: this must remain the LAST statement touching
# QUERIES — anything registered after it would land below the gate
# window unseen (the round-5 late-wave mistake this block exists to
# prevent).
assert len(_GATE_WINDOW) == 50 and len(set(_GATE_WINDOW)) == 50
assert all(k in QUERIES for k in _GATE_WINDOW)
QUERIES = {
    k: QUERIES[k]
    for k in (*_GATE_WINDOW, *(k for k in QUERIES if k not in set(_GATE_WINDOW)))
}
