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
    bucketing,
    maintenance,
    quality,
    ranges,
    relational,
    setops,
    skew,
    snapshot,
    sqlsurface,
    viewmaint,
    windows,
)
from project_bigdata_recsys_spark.operators import experiments
from project_bigdata_recsys_spark.ml import classifier
from project_bigdata_recsys_spark.sources import multimodal
from project_bigdata_recsys_spark.plans.oracle_builders import (  # noqa: F401
    _DD_SHINGLES,
    _absorption_oracle,
    _bpe_fertility_oracle,
    _mmr_oracle,
    _bpe_train_oracle,
    _containment_oracle,
    _analyze_table_oracle,
    _ann_index_diff_oracle,
    _ann_recall_oracle,
    _bradley_terry_oracle,
    _cluster_aware_split_oracle,
    _cluster_capped_sample_oracle,
    _clusters_oracle,
    _dd_hash32,
    _hits_oracle,
    _incremental_oracle,
    _ivf_lloyd_oracle,
    _ivf_oracle,
    _ivf_pq_nprobe_sweep_oracle,
    _ivf_pq_oracle,
    _ivf_pq_recall_oracle,
    _kcore_oracle,
    _knn_graph_oracle,
    _lloyd_prefix_sql,
    _lsh_band_sweep_oracle,
    _minhash_calibration_oracle,
    _minhash_oracle,
    _minhash_verified_oracle,
    _pagerank_oracle,
    _pq_knn_oracle,
    _pq_multi_oracle,
    _ranking_metrics_oracle,
    _removal_oracle,
    _rp_lsh_clusters_oracle,
    _rp_lsh_oracle,
    _rp_lsh_pairs_oracle,
    _semantic_contamination_oracle,
    _semdedup_oracle,
    _simhash_ctes,
    _simhash_oracle,
    _skew_report_oracle,
    _source_dup_attribution_oracle,
    _span_dedup_incremental_oracle,
    _stream_ingest_dedup_oracle,
    _stream_span_dedup_oracle,
    _stream_update_ann_index_oracle,
    _textrank_oracle,
    _top_pc_oracle,
    _vocab_cover_oracle,
)
from project_bigdata_recsys_spark.plans.oracle_builders import (  # noqa: F401
    _kcenter_oracle,
    _tokenizer_fertility_oracle,
)
from project_bigdata_recsys_spark.plans.oracles import TEXTS as _TEXTS
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


from project_bigdata_recsys_spark.plans.oracles.base import (
    TEXTS as _BASE_TEXTS,
)

# the founding oracle texts (moved verbatim to plans/oracles/base.py,
# round 14); later registrations layer per-domain texts on top
ORACLES: dict[str, str] = dict(_BASE_TEXTS)


# ---------------------------------------------------------------------------
# Generated oracles (hash-sketch dedup, Lloyd IVF, simhash bit votes, ...)
# are built by the parametric helpers in plans/oracle_builders.py (moved
# there in the r13 registry split); the static SQL texts live in
# plans/oracles/<domain>.py and bind back into ORACLES below via _TEXTS.
# ---------------------------------------------------------------------------


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


ORACLES["embedding_dup_clusters_lsh"] = _rp_lsh_clusters_oracle()


ORACLES["knn_ivf_lloyd"] = _ivf_lloyd_oracle()


ORACLES["knn_graph"] = _knn_graph_oracle()
ORACLES["simhash_near_pairs"] = _simhash_oracle()
ORACLES["near_dup_clusters"] = _clusters_oracle()


ORACLES["cluster_capped_sample"] = _cluster_capped_sample_oracle()


ORACLES["stream_ingest_dedup"] = _stream_ingest_dedup_oracle()


ORACLES["skew_report"] = _skew_report_oracle()
ORACLES["knn_ivf_bucketed"] = _ivf_oracle()
ORACLES["knn_rp_lsh"] = _rp_lsh_oracle()
ORACLES["video_frame_profile"] = _VIDEO_FRAME_ORACLE
ORACLES["minhash_verified_pairs"] = _minhash_verified_oracle()
ORACLES["repetition_profile"] = _REPETITION_ORACLE
ORACLES["pii_redaction_profile"] = _PII_ORACLE

ORACLES['dedup_corpus_stats'] = _TEXTS['dedup_corpus_stats']

ORACLES['quality_percentile_filter'] = _TEXTS['quality_percentile_filter']

ORACLES['contamination_check'] = _TEXTS['contamination_check']

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

ORACLES['normalized_duplicates'] = _TEXTS['normalized_duplicates']

ORACLES['weighted_sample'] = _TEXTS['weighted_sample']

# snapshot_diff oracle — replicates operators/snapshot.py::_mutated_orders
# (md5-uniform drop/bump/append on the PK) then classifies via a PK
# full-outer join.  The engine compares 32-byte digests; the oracle
# compares the columns directly (IS DISTINCT FROM) — equivalent up to
# sha256 collisions.
ORACLES['snapshot_diff'] = _TEXTS['snapshot_diff']


ORACLES["cluster_aware_split"] = _cluster_aware_split_oracle()


ORACLES["item_pagerank"] = _pagerank_oracle()

# group_quantile_filter oracle — per-lang p25 threshold from the
# (lang, score) histogram cumsum (SQL twin of text.group_quantile_threshold)
ORACLES['group_quantile_filter'] = _TEXTS['group_quantile_filter']


ORACLES["span_dedup_incremental"] = _span_dedup_incremental_oracle()

ORACLES['stream_trending_items'] = _TEXTS['stream_trending_items']


ORACLES["knn_pq"] = _pq_knn_oracle()

# Raw-SQL surface twins — DuckDB runs the IDENTICAL correlated SQL text
# (modulo dialect-free constructs), which is exactly the migration
# contract the family demonstrates.
ORACLES['sql_cheapest_supplier'] = _TEXTS['sql_cheapest_supplier']

ORACLES['sql_exists_filter'] = _TEXTS['sql_exists_filter']

ORACLES['sql_in_subquery'] = _TEXTS['sql_in_subquery']

ORACLES['entropy_profile'] = _TEXTS['entropy_profile']

ORACLES['item_pmi'] = _TEXTS['item_pmi']

ORACLES['corpus_mixture_tokens'] = _TEXTS['corpus_mixture_tokens']


ORACLES["stream_span_dedup"] = _stream_span_dedup_oracle()

ORACLES['augment_token_dropout'] = _TEXTS['augment_token_dropout']

ORACLES['corpus_mixture_tokens_sharded'] = _TEXTS['corpus_mixture_tokens_sharded']

ORACLES['jsonl_roundtrip_ingest'] = _TEXTS['jsonl_roundtrip_ingest']

ORACLES['variant_extraction'] = _TEXTS['variant_extraction']

ORACLES['cdc_current_view'] = _TEXTS['cdc_current_view']

ORACLES['equi_depth_histogram'] = _TEXTS['equi_depth_histogram']

ORACLES['span_contamination'] = _TEXTS['span_contamination']


ORACLES["knn_pq_multi"] = _pq_multi_oracle()


ORACLES["analyze_table"] = _analyze_table_oracle()

ORACLES['cohort_retention'] = _TEXTS['cohort_retention']

ORACLES['event_funnel'] = _TEXTS['event_funnel']

ORACLES['rfm_segments'] = _TEXTS['rfm_segments']

ORACLES['association_rules'] = _TEXTS['association_rules']

ORACLES['robust_outliers'] = _TEXTS['robust_outliers']

ORACLES['dau_wau_stickiness'] = _TEXTS['dau_wau_stickiness']

ORACLES['item_communities'] = _TEXTS['item_communities']

# scd2_history oracle — the changelog is the cdc_current_view one; the
# version algebra per key follows from which md5 draws fire: base always,
# +1 version if updated; current unless deleted.
ORACLES['scd2_history'] = _TEXTS['scd2_history']

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

ORACLES['cross_source_overlap'] = _TEXTS['cross_source_overlap']

ORACLES['boilerplate_prefix_profile'] = _TEXTS['boilerplate_prefix_profile']

ORACLES['source_mixture'] = _TEXTS['source_mixture']


QUERIES["semantic_contamination"] = similarity.semantic_contamination
ORACLES["semantic_contamination"] = _semantic_contamination_oracle()

QUERIES["unigram_logloss"] = text.unigram_logloss_profile
ORACLES['unigram_logloss'] = _TEXTS['unigram_logloss']


QUERIES["length_bucketed_batches"] = curation.length_bucketed_batches
ORACLES['length_bucketed_batches'] = _TEXTS['length_bucketed_batches']

QUERIES["novelty_profile"] = dedup.novelty_profile
ORACLES['novelty_profile'] = _TEXTS['novelty_profile']


QUERIES["source_dup_attribution"] = sourcetriage.source_dup_attribution
ORACLES["source_dup_attribution"] = _source_dup_attribution_oracle()


QUERIES["boilerplate_suffix_profile"] = sourcetriage.boilerplate_suffix_profile
ORACLES['boilerplate_suffix_profile'] = _TEXTS['boilerplate_suffix_profile']


QUERIES["source_vocabulary_profile"] = sourcetriage.source_vocabulary_profile
ORACLES['source_vocabulary_profile'] = _TEXTS['source_vocabulary_profile']


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
ORACLES['label_centroid_outliers'] = _TEXTS['label_centroid_outliers']


QUERIES["nearest_centroid_agreement"] = similarity.nearest_centroid_agreement
ORACLES['nearest_centroid_agreement'] = _TEXTS['nearest_centroid_agreement']


QUERIES["source_quantile_filter"] = text.source_quantile_filter
ORACLES['source_quantile_filter'] = _TEXTS['source_quantile_filter']


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
ORACLES['shuffled_export_manifest'] = _TEXTS['shuffled_export_manifest']


def _pack_sequences_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: tokenizer-aware packing with BOS+EOS document
    boundaries charged to the budget (boundary_tokens=2), sharded form."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt

    return curation.pack_sequences_for(
        _lt(spark, sf_dir, "documents"), n_shards=4, boundary_tokens=2
    )


QUERIES["pack_sequences_boundaries"] = _pack_sequences_boundaries
ORACLES['pack_sequences_boundaries'] = _TEXTS['pack_sequences_boundaries']

QUERIES["int8_quantization_profile"] = similarity.int8_quantization_profile
ORACLES['int8_quantization_profile'] = _TEXTS['int8_quantization_profile']

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
# Rotation history and the write-ahead r15-r17 schedules live in
# plans/schedule.py (documentation-only module; VERDICT r13 task 3).
# The window below is the executed round-16 block from that schedule:
# the nineteen names the r13 ripple waves displaced past r15, the
# remaining r8-evidence queries, then the oldest r9-evidence queries
# in registration order (VERDICT r15 task 8).
_GATE_WINDOW = [
    "als_ranking_eval",
    "stream_kmv_distinct",
    "ks_value_drift",
    "mann_whitney_drift",
    "ranking_metrics",
    "bloom_membership_profile",
    "stream_domain_quota",
    "incremental_domain_quota",
    "semdedup_profile",
    "domain_quota_sample",
    "k_anonymity_profile",
    "ntile_quartiles",
    "order_gaps",
    "running_total",
    "moving_avg_range",
    "top_n_per_group",
    "drift_lag",
    "priority_union_all",
    "latest_order_per_customer",
    "trending_items",
    "doc_repetition_profile",
    "kmv_distinct_rollup",
    "perplexity_buckets",
    "domain_reweight",
    "hybrid_search",
    "l_diversity_profile",
    "ucb_ranking",
    "session_ngrams",
    "quality_lr_score",
    "ewma_anomalies",
    "zorder_layout_profile",
    "link_prediction_adamic_adar",
    "ips_eval",
    "recs_diversity_profile",
    "compaction_plan",
    "stream_ewma_anomalies",
    "stream_pit_enrichment",
    "welch_ttest_drift",
    "t_closeness_profile",
    "survival_km_curve",
    "ols_trend_per_group",
    "target_encoding_oof",
    "calibration_bins",
    "bloom_pruned_join",
    "salted_join_agg",
    "kmv_set_ops",
    "stream_welch_drift",
    "embedding_correlation_pairs",
    "url_canonical_dedup",
    "dp_noisy_counts",
]
# (the window is applied ONCE, by the rebuild block at the very end of
# this module — after every registration, including the ones below)


# streaming twin of semantic_contamination — bounded replay must equal
# the batch oracle exactly, so the SQL twin is shared verbatim
QUERIES["stream_semantic_dedup"] = replay.stream_semantic_dedup
ORACLES["stream_semantic_dedup"] = _semantic_contamination_oracle()


QUERIES["item_pagerank_personalized"] = graph.item_pagerank_personalized
ORACLES["item_pagerank_personalized"] = _pagerank_oracle(personalized=True)

QUERIES["prefix_cache_savings"] = sourcetriage.prefix_cache_savings
ORACLES['prefix_cache_savings'] = _TEXTS['prefix_cache_savings']

QUERIES["packing_efficiency_sweep"] = curation.packing_efficiency_sweep
ORACLES['packing_efficiency_sweep'] = _TEXTS['packing_efficiency_sweep']

QUERIES["monthly_growth"] = analytics.monthly_growth
ORACLES['monthly_growth'] = _TEXTS['monthly_growth']

QUERIES["embedding_dim_profile"] = similarity.embedding_dim_profile
ORACLES['embedding_dim_profile'] = _TEXTS['embedding_dim_profile']

QUERIES["ann_recall_profile"] = similarity.ann_recall_profile
ORACLES["ann_recall_profile"] = _ann_recall_oracle()

QUERIES["centroid_confusion"] = similarity.centroid_confusion_matrix
ORACLES['centroid_confusion'] = _TEXTS['centroid_confusion']

QUERIES["conversion_lag"] = analytics.conversion_lag
ORACLES['conversion_lag'] = _TEXTS['conversion_lag']

QUERIES["rolling_distinct_users"] = relational.rolling_distinct_users
ORACLES['rolling_distinct_users'] = _TEXTS['rolling_distinct_users']

QUERIES["fuzzy_name_matches"] = dedup.fuzzy_name_matches
ORACLES['fuzzy_name_matches'] = _TEXTS['fuzzy_name_matches']

QUERIES["gap_filled_daily"] = relational.gap_filled_daily
ORACLES['gap_filled_daily'] = _TEXTS['gap_filled_daily']

QUERIES["ab_test_lift"] = experiments.ab_test_lift
ORACLES['ab_test_lift'] = _TEXTS['ab_test_lift']

QUERIES["pareto_curve"] = analytics.pareto_curve
ORACLES['pareto_curve'] = _TEXTS['pareto_curve']

QUERIES["psi_drift"] = quality.psi_drift
ORACLES['psi_drift'] = _TEXTS['psi_drift']

QUERIES["forget_users_plan"] = maintenance.forget_users_plan
ORACLES['forget_users_plan'] = _TEXTS['forget_users_plan']
ORACLES["forget_users_plan"] = (
    "SELECT table_name, n_rows, n_to_delete, "
    "CAST(n_rows - n_to_delete AS BIGINT) AS n_after FROM ("
    + ORACLES["forget_users_plan"]
    + ") ORDER BY table_name"
)

QUERIES["event_transitions"] = analytics.event_transitions
ORACLES['event_transitions'] = _TEXTS['event_transitions']

QUERIES["backfill_plan"] = snapshot.backfill_plan
ORACLES['backfill_plan'] = _TEXTS['backfill_plan']

QUERIES["multi_touch_attribution"] = analytics.multi_touch_attribution
ORACLES['multi_touch_attribution'] = _TEXTS['multi_touch_attribution']

QUERIES["decayed_popularity"] = analytics.decayed_popularity
ORACLES['decayed_popularity'] = _TEXTS['decayed_popularity']

QUERIES["kfold_assignment"] = analytics.kfold_assignment
ORACLES['kfold_assignment'] = _TEXTS['kfold_assignment']

QUERIES["schema_drift_report"] = quality.schema_drift_report
ORACLES['schema_drift_report'] = _TEXTS['schema_drift_report']

QUERIES["negative_samples"] = _negative_samples
ORACLES['negative_samples'] = _TEXTS['negative_samples']

QUERIES["pit_segment_rollup"] = asof.pit_segment_rollup
ORACLES['pit_segment_rollup'] = _TEXTS['pit_segment_rollup']

QUERIES["incremental_agg_merge"] = snapshot.incremental_agg_profile
ORACLES['incremental_agg_merge'] = _TEXTS['incremental_agg_merge']

QUERIES["hll_daily_rollup"] = relational.hll_daily_rollup
ORACLES['hll_daily_rollup'] = _TEXTS['hll_daily_rollup']

QUERIES["dedup_keep_best"] = text.dedup_keep_best
ORACLES['dedup_keep_best'] = _TEXTS['dedup_keep_best']

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
ORACLES['domain_quota_sample'] = _TEXTS['domain_quota_sample']

# k-anonymity audit (round 8): quasi-identifier group sizes over the
# release-metadata columns — two aggregations, no windows/joins.
QUERIES["k_anonymity_profile"] = quality.k_anonymity_profile
ORACLES['k_anonymity_profile'] = _TEXTS['k_anonymity_profile']

# Streaming per-domain quota (round 8): keyed per-domain state admits
# FCFS across a deterministic micro-batch SEQUENCE (n_waves files,
# maxFilesPerTrigger=1) — admission order is (wave, md5, doc_id), which
# one ranked window replays in SQL.
QUERIES["stream_domain_quota"] = replay.stream_domain_quota
ORACLES['stream_domain_quota'] = _TEXTS['stream_domain_quota']

# Incremental per-domain quota (round 8): today's batch admitted FCFS
# against yesterday's persisted per-domain counts — O(batch) + one
# broadcast state join, never a corpus rescan.
QUERIES["incremental_domain_quota"] = curation.incremental_domain_quota
ORACLES['incremental_domain_quota'] = _TEXTS['incremental_domain_quota']
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
ORACLES['ann_rerank'] = _TEXTS['ann_rerank']

# Mergeable quantile-sketch layer (round 7): DDSketch-style log-spaced
# buckets (γ=1.02), per-day counts merged by keyed sum, p50/p90/p99
# estimates next to exact order statistics + within-budget booleans —
# the approx_profile invariant recipe; the oracle replays the sketch
# arithmetic (same 6-dp-rounded ln ratio) and emits literal TRUEs.
QUERIES["ddsketch_quantile_rollup"] = relational.ddsketch_quantile_rollup
ORACLES['ddsketch_quantile_rollup'] = _TEXTS['ddsketch_quantile_rollup']

# Streaming twin of the quantile-sketch layer (round 7): per (1-day
# event-time window, type) bucket counts maintained by the stream,
# quantiles walked post-sink; the oracle replays the identical bucket
# arithmetic per calendar day (tumbling 1-day windows align to UTC
# midnight, so strftime grouping matches exactly).
QUERIES["stream_value_quantiles"] = replay.stream_value_quantiles
ORACLES['stream_value_quantiles'] = _TEXTS['stream_value_quantiles']

# Partition-scoped copy-on-write MERGE (round 7): the SURVEY §7.4.2 gap
# without a table format — the oracle replays the upsert (latest-wins ∪
# untouched) in SQL, so the hash match proves the write path rewrote
# exactly the touched partitions' content.
QUERIES["merge_upsert_profile"] = maintenance.merge_upsert_profile
ORACLES['merge_upsert_profile'] = _TEXTS['merge_upsert_profile']

# Distributed BPE vocabulary induction (round 7): the first-merge pair
# counting kernel of tokenizer training — the part that needs a cluster;
# the oracle replays the word-frequency pass and the per-word adjacent
# pair explosion with the identical weighting.
QUERIES["bpe_pair_counts"] = text.bpe_pair_counts
ORACLES['bpe_pair_counts'] = _TEXTS['bpe_pair_counts']

# Rerank-uplift evaluation (round 7): overlap@k / top-1 stability /
# mean rank shift between the bi-encoder and reranked top-k, replayed
# from the same two deterministic rankings.
QUERIES["rerank_uplift_profile"] = similarity.rerank_uplift_profile
ORACLES['rerank_uplift_profile'] = _TEXTS['rerank_uplift_profile']

# Watermark late-data drop audit (round 7): the oracle replays the
# watermark arithmetic — final watermark = max on-time ts − 3 days,
# append emits exactly the windows that closed, the 40-day-late copy is
# dropped in full (its windows closed ~37 days before arrival).
QUERIES["stream_late_data_audit"] = replay.stream_late_data_audit
ORACLES['stream_late_data_audit'] = _TEXTS['stream_late_data_audit']

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
ORACLES['concurrent_events_peak'] = _TEXTS['concurrent_events_peak']

# Inter-annotator agreement (round 7): Cohen's kappa between the seeded
# labels and their noise-mutated copy — one equi-join on the row key, four
# map-side-combined BIGINT confusion cells, ratios derived from identical
# integers on both engines.
QUERIES["label_agreement_kappa"] = quality.label_agreement_kappa
ORACLES['label_agreement_kappa'] = _TEXTS['label_agreement_kappa']

# BM25 lexical retrieval baseline (round 7): the top-3 corpus terms each
# rank the corpus; postings-join shape, exact-integer length norm, the
# one libm call (ln) protected by ranking on the 6-dp-rounded score.
QUERIES["bm25_scores"] = text.bm25_scores
ORACLES['bm25_scores'] = _TEXTS['bm25_scores']

# Vocabulary coverage curve (round 7): token mass covered by a top-k
# vocabulary for doubling k — tokenizer capacity planning; exact global
# frequency rank via the range-shuffle recipe, never a vocab-wide sort.
QUERIES["vocab_coverage_curve"] = text.vocab_coverage_curve
ORACLES['vocab_coverage_curve'] = _TEXTS['vocab_coverage_curve']

# Triangle counting (round 7): degree-ordered orientation — each
# triangle generated exactly once as an oriented wedge closed by the
# oriented third edge (O(m^1.5) bound); oracle uses the equivalent
# id-ordered enumeration over the a<b edge set (same triangle set).
QUERIES["item_triangles"] = graph.item_triangles
ORACLES['item_triangles'] = _TEXTS['item_triangles']

# Count-min heavy hitters (round 7): the frequency member of the
# mergeable-sketch family — daily depth×width counter grid, rollups by
# cell sums, min-over-rows point estimates; md5-derived buckets so the
# whole sketch replays bit-for-bit in SQL.
QUERIES["cms_heavy_hitters"] = relational.cms_heavy_hitters
ORACLES['cms_heavy_hitters'] = _TEXTS['cms_heavy_hitters']

# Item-to-item serving table (round 7): Salton cosine over the shared
# co-occurrence edges — degree-normalized i2i similarity, per-anchor
# top-k; fourth consumer of the persist_shared edge frame.
QUERIES["item_similar_neighbors"] = graph.item_similar_neighbors
ORACLES['item_similar_neighbors'] = _TEXTS['item_similar_neighbors']

# Language × source independence (round 7): chi-square contingency QA —
# exact BIGINT cells/margins, micro-quantized contributions summed as
# integers so partition order can't wiggle the statistic.
QUERIES["lang_source_chi2"] = quality.lang_source_chi2
ORACLES['lang_source_chi2'] = _TEXTS['lang_source_chi2']

def _ranking_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import ranking_metrics

    return ranking_metrics(spark, sf_dir)


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
ORACLES['bloom_membership_profile'] = _TEXTS['bloom_membership_profile']

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
ORACLES['als_ranking_eval'] = _TEXTS['als_ranking_eval']

# Streaming KMV twin (round 8): keyed per-week state holds the k
# smallest hashes; the order-independent merge makes the final sketch
# bit-identical to the batch cut, so the oracle is one flat ranking.
QUERIES["stream_kmv_distinct"] = replay.stream_kmv_distinct
ORACLES['stream_kmv_distinct'] = _TEXTS['stream_kmv_distinct']

# Time-decayed trending items (round 8): recency-weighted popularity
# with a RATIONAL decay of integer day ages — exact micro-unit weights,
# no libm pow/exp — cut on the (score, item) total order.
QUERIES["trending_items"] = analytics.trending_items
ORACLES['trending_items'] = _TEXTS['trending_items']

# Repetition/boilerplate QA (round 8): Gopher-style repetitious-text
# rules (duplicate-bigram/trigram fraction, top-bigram share) — grams
# built array-side, one scan, fixed-point micro averages.
QUERIES["doc_repetition_profile"] = text.doc_repetition_profile
ORACLES['doc_repetition_profile'] = _TEXTS['doc_repetition_profile']

# KMV distinct sketch (round 8): the mergeable-sketch family member
# whose ESTIMATE is engine-reproducible md5 math — hash-compared
# outright, not a within-budget boolean like the HLL layer.
QUERIES["kmv_distinct_rollup"] = relational.kmv_distinct_rollup
ORACLES['kmv_distinct_rollup'] = _TEXTS['kmv_distinct_rollup']


# l-diversity privacy audit (round 8): the homogeneity-attack complement
# of k_anonymity_profile — same QI banding, sensitive attribute = lang.
QUERIES["l_diversity_profile"] = quality.l_diversity_profile
ORACLES['l_diversity_profile'] = _TEXTS['l_diversity_profile']

# UCB1 bandit ranking (round 8): explore/exploit scoring between batch
# model refreshes — IEEE double expressions of integer aggregates (the
# bm25_scores ln() precedent), cut on the (score, item) total order.
QUERIES["ucb_ranking"] = analytics.ucb_ranking
ORACLES['ucb_ranking'] = _TEXTS['ucb_ranking']

# In-session event-path mining (round 8): sessionize (same >= gap
# boundary as the sessionize op), trigram the per-session event-type
# sequence, count the top paths — all windows user-partitioned.
QUERIES["session_ngrams"] = analytics.session_ngrams
ORACLES['session_ngrams'] = _TEXTS['session_ngrams']

# CCNet head/middle/tail terciles (round 8): corpus split by unigram LM
# score with EXACT integer-arithmetic tercile thresholds (3*cum >= n) —
# no float quantile, no engine interpolation.
QUERIES["perplexity_buckets"] = text.perplexity_buckets
ORACLES['perplexity_buckets'] = _TEXTS['perplexity_buckets']


# Hashed-feature quality classifier (round 8): fasttext/CCNet quality-
# filter shape — naive-Bayes log-odds over md5-hashed token buckets,
# trained and applied in two aggregation passes, weights micro-frozen.
QUERIES["quality_lr_score"] = text.quality_lr_score
ORACLES['quality_lr_score'] = _TEXTS['quality_lr_score']

# EWMA volume anomalies (round 8): closed-form 14-day exponential
# baseline with integer-literal micro weights — no pow(), no
# sequential recurrence; flags test the rounded ratio.
QUERIES["ewma_anomalies"] = analytics.ewma_anomalies
ORACLES['ewma_anomalies'] = _TEXTS['ewma_anomalies']

# Z-order vs linear layout (round 8): bit-interleaved clustering
# measured through per-file min/max pruning — pure integer arithmetic.
QUERIES["zorder_layout_profile"] = maintenance.zorder_layout_profile
ORACLES['zorder_layout_profile'] = _TEXTS['zorder_layout_profile']

# Adamic-Adar link prediction (round 8): wedge enumeration at capped
# centers over the shared co-occurrence graph, existing edges
# anti-joined away, micro fixed-point 1/ln(deg) weights.
QUERIES["link_prediction_adamic_adar"] = graph.link_prediction_adamic_adar
ORACLES['link_prediction_adamic_adar'] = _TEXTS['link_prediction_adamic_adar']


# DoReMi-lite domain reweighting (round 8): tilt the mixture toward
# high-excess-loss sources; shared doc_unigram_scores kernel, exp() of
# the 4-dp excess micro-frozen before the normalizing sum.
QUERIES["domain_reweight"] = curation.domain_reweight
ORACLES['domain_reweight'] = _TEXTS['domain_reweight']

# IPS offline policy eval (round 8): counterfactual reward of a
# uniform-over-top-k policy on logged traffic; item-level micro-frozen
# weights folded with integer sums, ESS health metric.
def _ips_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import ips_eval

    return ips_eval(spark, sf_dir)


QUERIES["ips_eval"] = _ips_eval_query
ORACLES['ips_eval'] = _TEXTS['ips_eval']

# Beyond-accuracy rec eval (round 8): intra-list embedding diversity +
# catalog coverage of the deterministic i2i top-k lists.
def _recs_diversity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.ranking import recs_diversity_profile

    return recs_diversity_profile(spark, sf_dir)


QUERIES["recs_diversity_profile"] = _recs_diversity_query
ORACLES['recs_diversity_profile'] = _TEXTS['recs_diversity_profile']

# Compaction planner (round 8): deterministic sorted-cumulative merge
# bins over per-(month, day) row groups — the OPTIMIZE manifest.
QUERIES["compaction_plan"] = maintenance.compaction_plan
ORACLES['compaction_plan'] = _TEXTS['compaction_plan']


# Streaming EWMA monitor (round 8): per-(1-day window, type) counts as
# streaming state, the shared closed-form baseline kernel post-sink —
# bit-identical to the batch monitor, same oracle arithmetic.
QUERIES["stream_ewma_anomalies"] = replay.stream_ewma_anomalies
ORACLES["stream_ewma_anomalies"] = ORACLES["ewma_anomalies"]

# Hybrid retrieval with RRF (round 8): BM25 top-depth + IVF-shortlist
# dense top-depth fused by reciprocal-rank — integer-derived
# round(1e9/(60+rank)) contributions, exact BIGINT rrf_micro output.
QUERIES["hybrid_search"] = similarity.hybrid_search_rrf
ORACLES['hybrid_search'] = _TEXTS['hybrid_search']


# Streaming SCD2 PIT enrichment (round 8): stream-static equi-join with
# the validity-interval predicate as join filter; state bounded by
# (segment, user) partials; oracle replays the draw + interval math.
QUERIES["stream_pit_enrichment"] = replay.stream_pit_enrichment
ORACLES['stream_pit_enrichment'] = _TEXTS['stream_pit_enrichment']


# Welch's unequal-variance t-test (round 8): parametric mean-shift
# member completing the drift quartet — BIGINT cent moments, identical
# float expression shape downstream (sqrt/ln precedent).
QUERIES["welch_ttest_drift"] = quality.welch_ttest_drift
ORACLES['welch_ttest_drift'] = _TEXTS['welch_ttest_drift']

# t-closeness audit (round 8): third member of the privacy trio —
# variational distance of each QI group's sensitive-lang distribution
# from the global one, folded in integer 1e-9 units (absent langs via
# the complement of the present-q mass, never densified).
QUERIES["t_closeness_profile"] = quality.t_closeness_profile
ORACLES['t_closeness_profile'] = _TEXTS['t_closeness_profile']

# Kaplan-Meier time-to-first-purchase (round 8): right-censoring-aware
# conversion curve; integer risk-set folds, ln/exp product behind
# round(,6), the all-remaining-die edge guarded by a prefix-max flag.
QUERIES["survival_km_curve"] = analytics.survival_km_curve
ORACLES['survival_km_curve'] = _TEXTS['survival_km_curve']

# Per-group OLS trend (round 8): closed-form regression from BIGINT
# sufficient statistics; doubles only in the final identical-shape
# slope/intercept/R² expressions.
QUERIES["ols_trend_per_group"] = analytics.ols_trend_per_group
ORACLES['ols_trend_per_group'] = _TEXTS['ols_trend_per_group']

# Leave-one-out target encoding (round 8): leakage-safe categorical
# feature — per-row (S − x)/(n − 1) in integer cents, read out as a
# banded histogram so the per-row path is what gets hash-checked.
def _target_encoding_oof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import target_encoding_oof

    return target_encoding_oof(spark, sf_dir)


QUERIES["target_encoding_oof"] = _target_encoding_oof_query
ORACLES['target_encoding_oof'] = _TEXTS['target_encoding_oof']


# Reliability diagram (round 8): calibration of a Laplace-smoothed
# purchase propensity — per-bin predicted/observed/Brier from integer
# 1e-6 folds only.
def _calibration_bins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import calibration_bins

    return calibration_bins(spark, sf_dir)


QUERIES["calibration_bins"] = _calibration_bins_query
ORACLES['calibration_bins'] = _TEXTS['calibration_bins']

# Bloom-pruned join (round 8): broadcast-bitmap runtime prefilter on
# the probe side of a selective join — md5 positions replayed
# bit-for-bit by the oracle, false positives absorbed by the exact
# join behind the filter.
QUERIES["bloom_pruned_join"] = relational.bloom_pruned_join
ORACLES['bloom_pruned_join'] = _TEXTS['bloom_pruned_join']

# Salted skew join (round 8): the gate form of skew.salted_join —
# row-identical to the plain join (the salt is an equi-key refinement,
# then dropped), so the oracle is the plain SQL join.
QUERIES["salted_join_agg"] = skew.salted_join_agg
ORACLES['salted_join_agg'] = _TEXTS['salted_join_agg']

# KMV set operations (round 8): union/Jaccard/intersection estimated
# from the per-day sketches alone (top-k of merged values IS the union
# merge; membership via keyed joins) — exact counts as the readout.
QUERIES["kmv_set_ops"] = relational.kmv_set_ops
ORACLES['kmv_set_ops'] = _TEXTS['kmv_set_ops']

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
ORACLES['embedding_correlation_pairs'] = _TEXTS['embedding_correlation_pairs']

# URL canonicalization dedup (round 8): C4-style collapse of
# syntactic URL variants — synthesized messy URLs (planted-data
# discipline), anchored-regexp canonicalizer replayed by the oracle.
QUERIES["url_canonical_dedup"] = dedup.url_canonical_dedup
ORACLES['url_canonical_dedup'] = _TEXTS['url_canonical_dedup']

# Differentially-private count release (round 8): Laplace(1/eps) via
# the md5-uniform inverse CDF — data-derived draw, oracle-replayable;
# production swaps in a secure RNG, release shape unchanged.
QUERIES["dp_noisy_counts"] = quality.dp_noisy_counts
ORACLES['dp_noisy_counts'] = _TEXTS['dp_noisy_counts']


# Exact per-segment ROC-AUC (round 8): midrank rank-sum identity over
# the value histogram — BIGINT folds, one division at the end.
def _exact_auc_by_group_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import exact_auc_by_group

    return exact_auc_by_group(spark, sf_dir)


QUERIES["exact_auc_by_group"] = _exact_auc_by_group_query
ORACLES['exact_auc_by_group'] = _TEXTS['exact_auc_by_group']

# Poisson bootstrap CI (round 8): all B replicas in ONE pass via
# per-(row, replica) Poisson(1) weights — md5-uniform draws through
# the frozen 12-dp inverse-CDF table (analytics.POISSON1_CDF).
QUERIES["bootstrap_ci_mean"] = experiments.bootstrap_ci_mean
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


QUERIES["lsh_band_sweep"] = dedup.lsh_band_sweep
ORACLES["lsh_band_sweep"] = _lsh_band_sweep_oracle()

# RM3 pseudo-relevance feedback (round 8): expansion terms from the
# BM25 feedback set — relevance-model weights in integer 1e-9 units,
# integer total order with term tiebreak.
QUERIES["rm3_query_expansion"] = text.rm3_query_expansion
ORACLES['rm3_query_expansion'] = _TEXTS['rm3_query_expansion']

# CUSUM changepoint (round 8): localizes the level shift the drift
# quartet detects — integer deviation path n·yᵢ − T, BIGINT cumsum,
# integer argmax.
QUERIES["cusum_changepoint"] = analytics.cusum_changepoint
ORACLES['cusum_changepoint'] = _TEXTS['cusum_changepoint']

# Streaming bootstrap twin (round 8): per-(segment, replica) integer
# (Σw, Σw·v) state, point estimate as the identity replica b = −1,
# shared readout — same oracle as the batch operator.
QUERIES["stream_bootstrap_ci"] = replay.stream_bootstrap_ci
ORACLES["stream_bootstrap_ci"] = ORACLES["bootstrap_ci_mean"]

# CMS join-size estimation (round 8): sketch inner product bounds the
# equi-join cardinality — integer counters, estimate hash-checked
# outright, exact Σc² as the gate readout.
QUERIES["cms_join_size_estimate"] = relational.cms_join_size_estimate
ORACLES['cms_join_size_estimate'] = _TEXTS['cms_join_size_estimate']

# Seasonal-naive backtest (round 8): the baseline every forecast must
# beat — BIGINT |y−ŷ| folds, MAPE in integer 1e-6 units.
QUERIES["seasonal_naive_eval"] = analytics.seasonal_naive_eval
ORACLES['seasonal_naive_eval'] = _TEXTS['seasonal_naive_eval']

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
ORACLES['winsorized_stats'] = _TEXTS['winsorized_stats']

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
QUERIES["cuped_adjusted_lift"] = experiments.cuped_adjusted_lift
ORACLES['cuped_adjusted_lift'] = _TEXTS['cuped_adjusted_lift']

# Neyman-optimal allocation (round 8): n_h ∝ N_h·S_h with per-stratum
# weights frozen to integers before the total fold.
QUERIES["neyman_allocation_plan"] = experiments.neyman_allocation_plan
ORACLES['neyman_allocation_plan'] = _TEXTS['neyman_allocation_plan']

# Rendezvous sharding plan (round 8): highest-random-weight placement;
# the W → W+1 expansion audit — md5-integer argmax per key.
QUERIES["rendezvous_shard_plan"] = skew.rendezvous_shard_plan
ORACLES['rendezvous_shard_plan'] = _TEXTS['rendezvous_shard_plan']

# DSIR importance resampling (round 8, session 3): hashed
# unigram+bigram log importance ratios, target = lang='en'; micro
# fixed-point freeze before the per-doc sum keeps every weight exact.
QUERIES["dsir_importance_sample"] = curation.dsir_importance_sample
ORACLES['dsir_importance_sample'] = _TEXTS['dsir_importance_sample']

# ACF + Ljung-Box (round 8, session 3): demeaned autocorrelation as
# pure BIGINT cross-moments (one exact division per lag); Q from the
# ROUNDED r_k so both engines fold identical doubles.
QUERIES["acf_ljung_box"] = analytics.acf_ljung_box
ORACLES['acf_ljung_box'] = _TEXTS['acf_ljung_box']

# Benford first-digit audit (round 8, session 3): digit from the
# integer-cents STRING (never float formatting / log10); expected
# fractions rounded to 6 dp and chi-square terms frozen to micro
# fixed point before the fold.
QUERIES["benford_audit"] = quality.benford_audit
ORACLES['benford_audit'] = _TEXTS['benford_audit']

# Split-conformal intervals (round 8, session 3): exact integer-cent
# order statistic at the finite-sample conformal rank; coverage on a
# held-out md5 split.
def _conformal_interval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import conformal_interval_eval

    return conformal_interval_eval(spark, sf_dir)


QUERIES["conformal_interval_eval"] = _conformal_interval_eval
ORACLES['conformal_interval_eval'] = _TEXTS['conformal_interval_eval']

# Bradley-Terry preference ratings (round 8, session 3): MM updates
# unrolled like _pagerank_oracle, each iterate frozen to 6 dp.


QUERIES["bradley_terry_ratings"] = analytics.bradley_terry_ratings
ORACLES["bradley_terry_ratings"] = _bradley_terry_oracle()

# HITS authorities (round 8, session 3): mean-1 normalization per
# half-step, each iterate frozen to 6 dp; unrolled like pagerank.


QUERIES["order_part_hits"] = graph.order_part_hits
ORACLES["order_part_hits"] = _hits_oracle()


# TextRank keywords (round 8, session 3): the pagerank kernel over the
# word-adjacency graph; same unrolled-iteration oracle shape.


QUERIES["textrank_keywords"] = graph.textrank_keywords
ORACLES["textrank_keywords"] = _textrank_oracle()


# k-core peeling profile (round 8, session 3): 6 chained peel rounds
# over the co-occurrence graph; per-round node/edge survival counts.


QUERIES["kcore_profile"] = graph.kcore_profile
ORACLES["kcore_profile"] = _kcore_oracle()

# Dunning G-squared collocations (round 8, session 3): exact 2x2 cell
# counts, one fixed-order 4-term ln fold, rounded once.
QUERIES["collocation_llr"] = text.collocation_llr
ORACLES['collocation_llr'] = _TEXTS['collocation_llr']

# Positional-index phrase search (round 8, session 3): the oracle
# counts adjacency matches with a per-list lambda; the engine builds
# the distributed positional index + co-located adjacency join.
QUERIES["phrase_search"] = text.phrase_search
ORACLES['phrase_search'] = _TEXTS['phrase_search']

# Pinball quantile backtest (round 8, session 3): exact train-half
# order-statistic predictors, integer-hundredth pinball loss.
QUERIES["pinball_quantile_eval"] = analytics.pinball_quantile_eval
ORACLES['pinball_quantile_eval'] = _TEXTS['pinball_quantile_eval']

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


QUERIES["embedding_top_pc"] = similarity.embedding_top_pc
ORACLES["embedding_top_pc"] = _top_pc_oracle()

# Feature-hashing collision audit (round 8, session 3): the bucket-
# width sizing study over the same md5 hash the hashed-feature models
# use; vocabulary-scale aggregations only.
QUERIES["hashing_collision_audit"] = text.hashing_collision_audit
ORACLES['hashing_collision_audit'] = _TEXTS['hashing_collision_audit']

# Markov absorption funnel (round 8, session 3): P(hit purchase within
# k steps) from every state; unrolled fixed-point chain, 6-dp iterates.


QUERIES["absorption_funnel_prob"] = analytics.absorption_funnel_prob
ORACLES["absorption_funnel_prob"] = _absorption_oracle()

# Streaming Benford twin (round 8, session 3): 9 counters of streaming
# state, shared chi-square readout kernel, same oracle recipe over the
# event value column.
QUERIES["stream_benford_values"] = replay.stream_benford_values
ORACLES['stream_benford_values'] = _TEXTS['stream_benford_values']

# Difference-in-differences lift (round 8, session 3): four BIGINT
# cent-moment groups, means rounded before the DiD fold, micro-frozen
# variance terms.
QUERIES["did_lift_estimate"] = experiments.did_lift_estimate
ORACLES['did_lift_estimate'] = _TEXTS['did_lift_estimate']

# Wald SPRT monitor (round 8, session 3): integer micro literal
# log-likelihood steps, BIGINT path cumsum, integer decisions.
QUERIES["sprt_ab_monitor"] = experiments.sprt_ab_monitor
ORACLES["sprt_ab_monitor"] = f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1),
    path AS (
        SELECT day, n, k,
               CAST(sum(k * ({experiments.SPRT_LA_MICRO})
                        + (n - k) * ({experiments.SPRT_LB_MICRO}))
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS llr_micro
        FROM daily)
    SELECT day, n, k,
           round(llr_micro / 1e6, 6) AS llr,
           CASE WHEN llr_micro >= {experiments.SPRT_THRESH_MICRO}
                THEN 'accept_h1'
                WHEN llr_micro <= -{experiments.SPRT_THRESH_MICRO}
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM path ORDER BY day
"""

# JL projection distortion audit (round 8, session 3): BIGINT
# projections and distances; one double division per pair.
QUERIES["jl_distortion_audit"] = similarity.jl_distortion_audit
ORACLES['jl_distortion_audit'] = _TEXTS['jl_distortion_audit']

# Mann-Kendall trend (round 8, session 3): BIGINT sign fold over the
# bounded day grid, tie-corrected variance, continuity-corrected z.
QUERIES["mann_kendall_trend"] = analytics.mann_kendall_trend
ORACLES['mann_kendall_trend'] = _TEXTS['mann_kendall_trend']

# WoE / IV feature screen (round 8, session 3): exact decile bins off
# the cumulative-histogram kernel, smoothed ln shares, micro-frozen IV.
QUERIES["woe_iv_profile"] = analytics.woe_iv_profile
ORACLES['woe_iv_profile'] = _TEXTS['woe_iv_profile']

# Theil-Sen robust slope (round 8, session 3): exact lower-median
# order statistic over the bounded pairwise-slope frame.
QUERIES["theil_sen_trend"] = analytics.theil_sen_trend
ORACLES['theil_sen_trend'] = _TEXTS['theil_sen_trend']

# Holt linear-trend backtest (round 8, session 3): offline-unrolled
# closed-form weights as micro literals; pure BIGINT folds end-to-end.
QUERIES["holt_forecast_eval"] = analytics.holt_forecast_eval
ORACLES['holt_forecast_eval'] = _TEXTS['holt_forecast_eval']

# Streaming SPRT twin (round 8, session 3): per-day count state,
# shared path kernel, same oracle as the batch monitor.
QUERIES["stream_sprt_monitor"] = replay.stream_sprt_monitor
ORACLES["stream_sprt_monitor"] = ORACLES["sprt_ab_monitor"]

# Overdispersion check (round 8, session 3): BIGINT count moments over
# the zero-filled day grid; Poisson-null chi-square.
QUERIES["overdispersion_profile"] = analytics.overdispersion_profile
ORACLES['overdispersion_profile'] = _TEXTS['overdispersion_profile']

# Lincoln-Petersen capture-recapture (round 8, session 3): Chapman
# bias-corrected population estimate from two observation windows.
QUERIES["capture_recapture_estimate"] = analytics.capture_recapture_estimate
ORACLES['capture_recapture_estimate'] = _TEXTS['capture_recapture_estimate']

# Empirical-Bayes beta-binomial shrinkage (round 8, session 3): MoM
# prior from micro-frozen per-user rates; 6-dp shrunken rates.
QUERIES["eb_shrunk_rates"] = experiments.eb_shrunk_rates
ORACLES['eb_shrunk_rates'] = _TEXTS['eb_shrunk_rates']

# Sorted-neighborhood linkage (round 8, session 3): the merge/purge
# blocking strategy — per-block sliding window over the sort order,
# planted plural-typo variants, integer Levenshtein verify.
QUERIES["sorted_neighborhood_pairs"] = dedup.sorted_neighborhood_pairs
ORACLES['sorted_neighborhood_pairs'] = _TEXTS['sorted_neighborhood_pairs']

# Exact Shapley channel attribution (round 8, session 3): 2^4 coalition
# lattice, observed-coalition game values at 6 dp, integer /24 weights.
QUERIES["shapley_channel_attribution"] = analytics.shapley_channel_attribution
ORACLES['shapley_channel_attribution'] = _TEXTS['shapley_channel_attribution']

# Sequence entropy (round 8, session 3): conditional H(next|current)
# from the transition matrix, micro-frozen -p ln p terms.
QUERIES["sequence_entropy_profile"] = analytics.sequence_entropy_profile
ORACLES['sequence_entropy_profile'] = _TEXTS['sequence_entropy_profile']

# Join-order advisor (round 8, session 3): containment-formula
# estimates vs true intermediates, lazy 1-row stat cross-joins.
QUERIES["join_order_advisor"] = relational.join_order_advisor
ORACLES['join_order_advisor'] = _TEXTS['join_order_advisor']

# Source KL divergence (round 8, session 3): smoothed unigram
# distributions, micro-frozen p ln(p/q) cells over the vocab grid.
QUERIES["source_kl_divergence"] = text.source_kl_divergence
ORACLES['source_kl_divergence'] = _TEXTS['source_kl_divergence']

# RAKE keyphrases (round 8, session 3): gaps-and-islands candidate
# runs, deg/freq word scores micro-frozen, per-phrase fold.
QUERIES["rake_keyphrases"] = text.rake_keyphrases
ORACLES['rake_keyphrases'] = _TEXTS['rake_keyphrases']

# CV paired t-test (round 8, session 3): grouped folds, leakage-free
# complement predictors, integer-exact difference fold.
def _cv_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_recsys_spark.ml.classifier import cv_paired_ttest

    return cv_paired_ttest(spark, sf_dir)


QUERIES["cv_paired_ttest"] = _cv_paired_ttest
ORACLES['cv_paired_ttest'] = _TEXTS['cv_paired_ttest']

# Greedy vocabulary set cover (round 8, session 3): unrolled greedy
# steps with MATERIALIZED covered sets.


QUERIES["vocab_cover_sources"] = curation.vocab_cover_sources
ORACLES["vocab_cover_sources"] = _vocab_cover_oracle()

# Largest-remainder apportionment (round 8, session 3): pure integer
# base seats + exact residue ranking; seat totals pin to the budget.
QUERIES["largest_remainder_allocation"] = curation.largest_remainder_allocation
ORACLES['largest_remainder_allocation'] = _TEXTS['largest_remainder_allocation']

# Markov removal-effect attribution (round 8, session 3): base + four
# channel-removed absorption chains, unrolled and materialized.


QUERIES["markov_removal_attribution"] = analytics.markov_removal_attribution
ORACLES["markov_removal_attribution"] = _removal_oracle()

# Segmented slopes at the CUSUM changepoint (round 8, session 3):
# BIGINT OLS sufficient statistics on each side of the shared peak.
QUERIES["changepoint_slopes"] = analytics.changepoint_slopes
ORACLES['changepoint_slopes'] = _TEXTS['changepoint_slopes']

# A/A-test calibration (round 8, session 3): 20 md5 null experiments,
# exact Welch z per split, micro-frozen summary moments.
QUERIES["aa_test_calibration"] = experiments.aa_test_calibration
ORACLES['aa_test_calibration'] = _TEXTS['aa_test_calibration']

# Quantile normalization (round 8, session 3): per-mille grid mapping
# to pooled order statistics; integer grid index, integer value folds.
QUERIES["quantile_normalize_profile"] = curation.quantile_normalize_profile
ORACLES['quantile_normalize_profile'] = _TEXTS['quantile_normalize_profile']

# Spearman rank correlation (round 8, session 3): integer double-rank
# midranks off the cumulative histogram; one sqrt of double-cast
# moments (BIGINT products would overflow).
QUERIES["spearman_user_metrics"] = analytics.spearman_user_metrics
ORACLES['spearman_user_metrics'] = _TEXTS['spearman_user_metrics']

# Price elasticity (round 8, session 3): ln-ln OLS across parts per
# type, 1e-4 frozen logs, BIGINT sufficient statistics.
QUERIES["price_elasticity"] = analytics.price_elasticity
ORACLES['price_elasticity'] = _TEXTS['price_elasticity']

# Doubly-robust ATE (round 8, session 3): per-stratum 6-dp models,
# micro-frozen AIPW terms, exact integer folds.
QUERIES["doubly_robust_ate"] = experiments.doubly_robust_ate
ORACLES['doubly_robust_ate'] = _TEXTS['doubly_robust_ate']

# PPS + Horvitz-Thompson (round 8, session 3): md5-uniform inclusion
# draws at pi ∝ size; frozen per-row contributions; shipped with its
# own exact-total validation.
QUERIES["pps_horvitz_thompson"] = experiments.pps_horvitz_thompson
ORACLES['pps_horvitz_thompson'] = _TEXTS['pps_horvitz_thompson']

# Day-of-week seasonal indices (round 8, session 3): integer weekday
# arithmetic over the zero-filled grid.
QUERIES["seasonal_indices"] = analytics.seasonal_indices
ORACLES['seasonal_indices'] = _TEXTS['seasonal_indices']

# Church-Gale burstiness (round 8, session 3): df vs the Poisson
# expectation from one exp() of exact integer ratios.
QUERIES["term_burstiness"] = text.term_burstiness
ORACLES['term_burstiness'] = _TEXTS['term_burstiness']

# Streaming Holt twin (round 8, session 3): daily count state, shared
# weight-literal kernel, same oracle as the batch backtest.
QUERIES["stream_holt_forecast"] = replay.stream_holt_forecast
ORACLES["stream_holt_forecast"] = ORACLES["holt_forecast_eval"]

# Benjamini-Hochberg FDR correction (round 8, session 3): per-type
# Welch drift z vs offline normal-quantile micro literals; step-up k*.
QUERIES["bh_fdr_correction"] = quality.bh_fdr_correction
ORACLES['bh_fdr_correction'] = _TEXTS['bh_fdr_correction']

# ICC / design effect (round 8, session 3): one-way ANOVA identities
# from BIGINT moments; micro-frozen per-user s^2/n terms.
QUERIES["icc_profile"] = experiments.icc_profile
ORACLES['icc_profile'] = _TEXTS['icc_profile']

# MDE power table (round 8, session 3): offline z literals, pooled
# cent variance, one sqrt per plan row.
QUERIES["mde_power_analysis"] = experiments.mde_power_analysis
ORACLES['mde_power_analysis'] = _TEXTS['mde_power_analysis']

# Sessionization gap sweep (round 8, session 3): one delta pass,
# three integer break counts.
QUERIES["session_gap_sweep"] = windows.session_gap_sweep
ORACLES['session_gap_sweep'] = _TEXTS['session_gap_sweep']

# Freshness audit (round 8, session 3): per-type high-water lag,
# anchored to the corpus max (pure function of the data).
QUERIES["freshness_audit"] = quality.freshness_audit
ORACLES['freshness_audit'] = _TEXTS['freshness_audit']

# Streaming Mann-Kendall twin (round 8, session 3): daily count state,
# shared kernel, same oracle.
QUERIES["stream_mann_kendall"] = replay.stream_mann_kendall
ORACLES["stream_mann_kendall"] = ORACLES["mann_kendall_trend"]

# Negative-binomial MoM fit (round 8, session 3): NB2 parameters from
# 6-dp moments with the fitted-vs-observed zero-fraction check.
QUERIES["negbin_fit_profile"] = analytics.negbin_fit_profile
ORACLES['negbin_fit_profile'] = _TEXTS['negbin_fit_profile']

# V-measure (round 8, session 3): entropy agreement between the lang
# and source partitions; micro-frozen p ln p folds.
QUERIES["lang_source_vmeasure"] = quality.lang_source_vmeasure
ORACLES['lang_source_vmeasure'] = _TEXTS['lang_source_vmeasure']

# Theil-T inequality (round 8, session 3): sort-free decomposable
# concentration index; micro-frozen share*ln terms.
QUERIES["theil_inequality_index"] = analytics.theil_inequality_index
ORACLES['theil_inequality_index'] = _TEXTS['theil_inequality_index']

# Cross-run dedup manifest diff (round 10 stretch, VERDICT r9 task #7):
# current-vs-previous snapshot keeper diff under the exact-dedup rule —
# enters the gate via the r11+ window per the write-ahead discipline;
# until then test_oracle_parity regression-guards it every run.
QUERIES["dedup_manifest_diff"] = dedup.dedup_manifest_diff
ORACLES['dedup_manifest_diff'] = _TEXTS['dedup_manifest_diff']


# Hard-negative mining (round 10 stretch #2): per-anchor top-k
# most-similar DIFFERENT-label vectors — the contrastive-training
# curation step; exact form is the gate/oracle variant, ANN probes are
# the corpus-scale candidate stage (knn family composition).
QUERIES["hard_negative_mining"] = similarity.hard_negative_mining
ORACLES['hard_negative_mining'] = _TEXTS['hard_negative_mining']


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


def _ann_index_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ANN-index diff (r12 verdict task 7): persisted
    (vec_id, t, bucket) snapshots T0/T1 — md5-retired base cohort +
    arrival tail — diffed with co-partitioned anti-joins; see
    functions.similarity.ann_index_diff."""
    from project_bigdata_recsys_spark.functions.similarity import (
        ann_index_diff,
    )

    return ann_index_diff(spark, sf_dir)


QUERIES["ann_index_diff"] = _ann_index_diff
ORACLES["ann_index_diff"] = _ann_index_diff_oracle()


def _tokenizer_fertility_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per (lang, source): bytes/token, tokens/word,
    multibyte overhead — see functions.text.tokenizer_fertility_audit
    (r12 verdict task 7, the bpe_pair_counts sibling)."""
    from project_bigdata_recsys_spark.functions.text import (
        tokenizer_fertility_audit,
    )

    return tokenizer_fertility_audit(spark, sf_dir)


QUERIES["tokenizer_fertility_audit"] = _tokenizer_fertility_audit
ORACLES["tokenizer_fertility_audit"] = _tokenizer_fertility_oracle()


# Round-11 wave: training-mix planning + secret scanning -------------------

# Temperature-sampling sweep (mT5/XLM-R temperature knob): per-alpha
# source shares, boost vs natural sampling, and mixture entropy — the
# table that justifies corpus_mixture's fixed alpha.
QUERIES["mixture_temperature_sweep"] = curation.mixture_temperature_sweep
ORACLES['mixture_temperature_sweep'] = _TEXTS['mixture_temperature_sweep']

# Token-budget allocation under a repetition cap (data-constrained
# scaling, Muennighoff et al. 2023): greedy quality-ordered fill,
# max_epochs passes per source; pure BIGINT window arithmetic.
QUERIES["token_budget_planner"] = curation.token_budget_planner
ORACLES['token_budget_planner'] = _TEXTS['token_budget_planner']

# Credential/secret scanning (Dolma/StarCoder pre-training governance
# step): planted md5-derived secrets, per-source exposure profile.
QUERIES["secret_scan_profile"] = text.secret_scan_profile
ORACLES['secret_scan_profile'] = _TEXTS['secret_scan_profile']


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
ORACLES['training_data_card'] = _TEXTS['training_data_card']


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


# Round-13 third wave: merge-on-read join-view maintenance ------------------
# The lakehouse trade-off the CoW merge family doesn't cover: a
# materialized fact⋈dim view under fact AND dim deltas, deltas landing
# as O(batch) ledger appends, reads resolving base ∪ ledgers with
# broadcast joins only, reconcile folding the ledgers back through the
# partition-pruned CoW merge.  One oracle text (full recompute of
# orders′ ⋈ dim′) shared by all three paths — MOR resolution, fold-then-
# scan, and three-micro-batch streaming appends — proves they reach the
# identical fully-applied join.
QUERIES["join_view_mor"] = viewmaint.join_view_mor
ORACLES["join_view_mor"] = _TEXTS["join_view_mor"]

QUERIES["join_view_reconcile"] = viewmaint.join_view_reconcile
ORACLES["join_view_reconcile"] = _TEXTS["join_view_mor"]

QUERIES["stream_join_view_mor"] = viewmaint.stream_join_view_mor
ORACLES["stream_join_view_mor"] = _TEXTS["join_view_mor"]


# Round-13 fourth wave ------------------------------------------------------
# zipf_fit_profile: the corpus-health power-law exponent per language —
# closed-form log-log OLS over the per-lang top-100 token ranks, one
# |lang|×|vocab|-bounded corpus pass (functions/text.py).
# bucketed_join_agg: the bucketed co-located fact⋈fact join as DRIVER
# evidence, not just a plan test — orders⋈lineitem through same-bucket
# layouts with zero exchange below the join (operators/bucketing.py;
# plan pinned in tests/test_round13b.py).
QUERIES["zipf_fit_profile"] = text.zipf_fit_profile
ORACLES["zipf_fit_profile"] = _TEXTS["zipf_fit_profile"]

QUERIES["bucketed_join_agg"] = bucketing.bucketed_join_agg
ORACLES["bucketed_join_agg"] = _TEXTS["bucketed_join_agg"]


# Round-13 fifth wave -------------------------------------------------------
# heaps_fit_profile: vocabulary-growth exponent per language (Heaps'
# law V ≈ K·N^β) — first-occurrence bucketing by pure doc_id arithmetic
# against a broadcast per-lang anchor, NO corpus-sized window; the
# companion readout to zipf_fit_profile (functions/text.py).
# two_hop_reach: exact 2-hop neighborhood size for the top-degree
# co-occurrence nodes — seed-bounded broadcast expansion over the
# shared edge memo, the deg² knob capped by k_seeds
# (functions/graph.py).
QUERIES["heaps_fit_profile"] = text.heaps_fit_profile
ORACLES["heaps_fit_profile"] = _TEXTS["heaps_fit_profile"]

QUERIES["two_hop_reach"] = graph.two_hop_reach
ORACLES["two_hop_reach"] = _TEXTS["two_hop_reach"]


# Round-13 sixth wave -------------------------------------------------------
# cooccurrence_drift: month-over-month edge churn of the co-occurrence
# graph (survived/new/dropped edges + edge-set Jaccard per consecutive
# month pair) — the temporal graph-evolution audit; per-month edges are
# the same basket-bounded self-join, the intersection is one
# co-partitioned equi-join (functions/graph.py).
# stream_zipf_fit: the Zipf fit maintained BY THE STREAM — per-batch
# partial (lang, token, cnt) ledger appends merged exactly after a
# >=3-micro-batch enforced replay, shared fit kernel AND shared oracle
# text with the batch form (streaming/replay.py).
QUERIES["cooccurrence_drift"] = graph.cooccurrence_drift
ORACLES["cooccurrence_drift"] = _TEXTS["cooccurrence_drift"]

QUERIES["stream_zipf_fit"] = replay.stream_zipf_fit
ORACLES["stream_zipf_fit"] = _TEXTS["zipf_fit_profile"]


# Round-13 seventh wave -----------------------------------------------------
# lm_dirichlet_scores: query-likelihood retrieval with Dirichlet
# smoothing — the third classic lexical ranker beside BM25/RM3, exact
# BIGINT inputs, ranked on the 6-dp-rounded log-probability
# (functions/text.py).
# label_prop_communities: deterministic synchronous label propagation
# (3 unrolled rounds, max-count/min-label votes) over the thresholded
# co-occurrence graph — the finer companion to item_communities' CC
# (functions/graph.py; oracle unrolls the identical rounds).
QUERIES["lm_dirichlet_scores"] = text.lm_dirichlet_scores
ORACLES["lm_dirichlet_scores"] = _TEXTS["lm_dirichlet_scores"]

QUERIES["label_prop_communities"] = graph.label_prop_communities
ORACLES["label_prop_communities"] = _TEXTS["label_prop_communities"]


# Round-13 eighth wave ------------------------------------------------------
# fellegi_sunter_linkage: probabilistic record linkage — blocked pairs
# scored by exact BIGINT sums of per-FIELD frozen ln(m/u) weights (six
# ln calls total, the lm_dirichlet freezing discipline); the fourth
# entity-resolution strategy beside rare-gram blocks, minhash bands
# and the sorted neighborhood (functions/dedup.py).
# ipf_weight_calibration: all-integer iterative proportional fitting
# (raking) of (lang, source) cell weights to largest-remainder uniform
# axis targets — every scaling step an exact DECIMAL(38,0) div /
# HUGEINT // floor division, unrolled identically in the oracle
# (functions/curation.py).
# skyline_orders: per-segment 2-D Pareto frontier via two range
# running-max windows over cent-exact prices — the sort-filter
# skyline, never the O(n²) NOT EXISTS (operators/analytics.py; the n²
# form is pinned equal in tests).
QUERIES["fellegi_sunter_linkage"] = dedup.fellegi_sunter_linkage
ORACLES["fellegi_sunter_linkage"] = _TEXTS["fellegi_sunter_linkage"]

QUERIES["ipf_weight_calibration"] = curation.ipf_weight_calibration
ORACLES["ipf_weight_calibration"] = _TEXTS["ipf_weight_calibration"]

QUERIES["skyline_orders"] = analytics.skyline_orders
ORACLES["skyline_orders"] = _TEXTS["skyline_orders"]


# Round-13 ninth wave -------------------------------------------------------
# winnowing_overlap: MOSS positional fingerprinting — per-doc window
# minima over k-gram hash arrays (any shared run of >= w+k-1 tokens
# leaves a common fingerprint), pair overlap via a df-capped
# fingerprint join, containment as exact floor-division ppm
# (functions/text.py).
# kcenter_coreset: Gonzalez greedy farthest-point selection over the
# embedding corpus — k-1 one-scan rounds with broadcast-literal
# centers, ranked on 6-dp-rounded cosine with vec_id tie-breaks; the
# oracle unrolls the identical rounds (functions/similarity.py;
# plans/oracle_builders.py::_kcenter_oracle).
QUERIES["winnowing_overlap"] = text.winnowing_overlap
ORACLES["winnowing_overlap"] = _TEXTS["winnowing_overlap"]

QUERIES["kcenter_coreset"] = similarity.kcenter_coreset
ORACLES["kcenter_coreset"] = _kcenter_oracle(k=5)


# Round-13 tenth wave -------------------------------------------------------
# Ledger-fold streaming twins sharing their batch forms' oracle texts
# VERBATIM, so the gate hash proves stream ≡ batch end to end:
# stream_winnowing — the winnowing fingerprint index maintained by the
# stream (per-doc fingerprints are batch-local, appends never
# duplicate a doc; streaming/replay.py);
# stream_skyline — per-batch LOCAL skylines folded by the idempotent
# skyline merge algebra (skyline(A∪B) = skyline(skyline(A) ∪
# skyline(B)); strict dominance is transitive).
QUERIES["stream_winnowing"] = replay.stream_winnowing
ORACLES["stream_winnowing"] = _TEXTS["winnowing_overlap"]

QUERIES["stream_skyline"] = replay.stream_skyline
ORACLES["stream_skyline"] = _TEXTS["skyline_orders"]


# Round-13 eleventh wave -----------------------------------------------------
# exact_matched_cohort: stratified exact matching (coarsened exact
# matching with integer activity bands) — equal-arm matched cohorts
# per pre-activity band, md5-ranked selection, exact BIGINT outcome
# sums (no division), band = -1 grand total; the observational-causal
# companion to did/cuped/doubly-robust (operators/analytics.py).
QUERIES["exact_matched_cohort"] = experiments.exact_matched_cohort
ORACLES["exact_matched_cohort"] = _TEXTS["exact_matched_cohort"]


# Round-13 twelfth wave ------------------------------------------------------
# golden_record_fusion: entity-resolution survivorship — sorted-
# neighborhood link edges (Levenshtein <= 1 over the planted-variant
# record set) grouped by the dedup family's min-label CC kernel
# (string labels), then per-component deterministic attribute fusion
# (shortest-name canonical, min real part key survivor, exact count
# and cent maxima); the oracle replays CC as a recursive reach
# fixpoint (functions/dedup.py).
QUERIES["golden_record_fusion"] = dedup.golden_record_fusion
ORACLES["golden_record_fusion"] = _TEXTS["golden_record_fusion"]


# Round-13 thirteenth wave ---------------------------------------------------
# stream_ipf: the raking cell table maintained BY THE STREAM — partial
# (lang, source, cnt) ledger appends merged exactly, feeding the
# SHARED IPF kernel (curation.ipf_from_cells) and the SHARED oracle
# text, so the gate hash proves stream ≡ batch for count→calibrate
# (streaming/replay.py).
# burrows_delta: Burrows' Delta stylometric distance between sources —
# the "same feed in disguise" detector the dedup family cannot see;
# exact integer rates/means/deviations, one frozen sqrt-division per
# (source, term), exact integer pair Deltas (functions/text.py).
QUERIES["stream_ipf"] = replay.stream_ipf
ORACLES["stream_ipf"] = _TEXTS["ipf_weight_calibration"]

QUERIES["burrows_delta"] = text.burrows_delta
ORACLES["burrows_delta"] = _TEXTS["burrows_delta"]



# Round-14 first wave ---------------------------------------------------------
# bpe_train_merges: iterated BPE tokenizer training (r13 verdict task 5)
# — the fixed-iteration merge loop bpe_pair_counts stops short of; one
# corpus scan builds the persisted word-frequency vocabulary, then each
# of the 8 rounds is a vocab-sized pair count, a 1-row winner collect,
# and a plain-replace re-segmentation whose left-to-right semantics are
# greedy BPE on both engines (functions/text.py).
QUERIES["bpe_train_merges"] = text.bpe_train_merges
ORACLES["bpe_train_merges"] = _bpe_train_oracle(8)


# stream_golden_record: incremental ER linkage fold (r13 verdict task
# 6) — block-partitioned record ledger + touched-block adjacency
# replacement (dynamic partition overwrite), O(affected) per batch;
# converges to the batch adjacency exactly, so the batch survivorship
# oracle is shared verbatim (streaming/replay.py).
QUERIES["stream_golden_record"] = replay.stream_golden_record
ORACLES["stream_golden_record"] = _TEXTS["golden_record_fusion"]


# join_view_time_travel: sequence-bounded snapshot read of the MOR join
# view (r13 verdict stretch) — two delta generations live in the
# ledgers; resolution at as_of_seq=1 must equal join_view_mor's
# full-recompute oracle verbatim, proving epoch-2 rows are excluded
# exactly (operators/viewmaint.py).
QUERIES["join_view_time_travel"] = viewmaint.join_view_time_travel
ORACLES["join_view_time_travel"] = _TEXTS["join_view_mor"]


# Round-14 second wave --------------------------------------------------------
# stream_bpe_vocab: BPE training from a stream-maintained word-count
# ledger (the stream_ipf cell pattern) feeding the shared merge kernel
# — gate hash proves stream-fed ≡ scan-fed tokenizer training
# (streaming/replay.py).
# containment_pairs: Broder containment near-dup — asymmetric subset
# detection the Jaccard family misses; df-capped rare-shingle
# candidates (Σ df², never n²), planted half-doc truncations
# (functions/dedup.py).
QUERIES["stream_bpe_vocab"] = replay.stream_bpe_vocab
ORACLES["stream_bpe_vocab"] = ORACLES["bpe_train_merges"]

QUERIES["containment_pairs"] = dedup.containment_pairs
ORACLES["containment_pairs"] = _containment_oracle()

# kneser_ney_bigram: KN-smoothed bigram LM with exact-integer
# continuation counts — one corpus scan, vocabulary-bounded smoothing
# aggregates, single frozen DECIMAL(38) micro division
# (functions/text.py).
QUERIES["kneser_ney_bigram"] = text.kneser_ney_bigram
ORACLES["kneser_ney_bigram"] = _TEXTS["kneser_ney_bigram"]


# Round-14 third wave ---------------------------------------------------------
# pr_auc_by_group: exact trapezoidal PR-AUC per segment from the same
# value histogram as the ROC twin — one frozen micro division per score
# level, one final DECIMAL(38) fold (ml/classifier.py).
# brier_decomposition: Murphy reliability/resolution/uncertainty over
# the shared propensity fixture, all-integer numerators, HUGEINT/
# DECIMAL(38) floor-divisions (ml/classifier.py).
# isotonic_calibration_pav: PAV recalibration via the minimax range-
# average characterization — bin-domain-bounded (j,i,k) enumeration,
# never per-user state (ml/classifier.py).
QUERIES["pr_auc_by_group"] = classifier.pr_auc_by_group
ORACLES["pr_auc_by_group"] = _TEXTS["pr_auc_by_group"]

QUERIES["brier_decomposition"] = classifier.brier_decomposition
ORACLES["brier_decomposition"] = _TEXTS["brier_decomposition"]

QUERIES["isotonic_calibration_pav"] = classifier.isotonic_calibration_pav
ORACLES["isotonic_calibration_pav"] = _TEXTS["isotonic_calibration_pav"]


# Round-14 fourth wave --------------------------------------------------------
# vacuum_retention_plan: snapshot VACUUM planning under keep-last-N —
# the expire_snapshots review artifact; deterministic md5 file
# lifecycle over the (month, day) manifest (operators/maintenance.py).
# sql_lateral_topk: correlated LATERAL derived-table parity — the
# migrating-SQL-user surface; Catalyst decorrelates to a ranked join,
# identical text on both engines (operators/sqlsurface.py).
# local_clustering_profile: per-node clustering coefficient from the
# degree-ordered-orientation triangle kernel + shared oriented edges;
# one exact micro floor-div per node (functions/graph.py).
QUERIES["vacuum_retention_plan"] = maintenance.vacuum_retention_plan
ORACLES["vacuum_retention_plan"] = _TEXTS["vacuum_retention_plan"]

QUERIES["sql_lateral_topk"] = sqlsurface.sql_lateral_topk
ORACLES["sql_lateral_topk"] = _TEXTS["sql_lateral_topk"]

QUERIES["local_clustering_profile"] = graph.local_clustering_profile
ORACLES["local_clustering_profile"] = _TEXTS["local_clustering_profile"]


# Round-14 fifth wave ---------------------------------------------------------
# bpe_fertility_after_merges: apply the LEARNED merge table to every
# source's vocabulary and report post-merge fertility — closes the
# tokenizer train→apply loop (functions/text.py).
# skew_salt_advisor: per-hot-key salt-factor planning over planted
# pathological skew — exact lower-median via histogram cumsum, the
# salted_join review artifact (operators/skew.py).
# stream_pr_auc: the (grp, cents) value histogram folded from
# micro-batches; shared kernel, shared pr_auc_by_group oracle
# (streaming/replay.py).
QUERIES["bpe_fertility_after_merges"] = text.bpe_fertility_after_merges
ORACLES["bpe_fertility_after_merges"] = _bpe_fertility_oracle(8)

QUERIES["skew_salt_advisor"] = skew.skew_salt_advisor
ORACLES["skew_salt_advisor"] = _TEXTS["skew_salt_advisor"]

QUERIES["stream_pr_auc"] = replay.stream_pr_auc
ORACLES["stream_pr_auc"] = _TEXTS["pr_auc_by_group"]


# Round-14 sixth wave ---------------------------------------------------------
# mmr_diversified_rerank: Maximal Marginal Relevance over the ANN
# shortlist — k−1 greedy rounds on the broadcast-sized top-depth frame
# with micro-frozen integer scores; the oracle unrolls the identical
# rounds (functions/similarity.py).
QUERIES["mmr_diversified_rerank"] = similarity.mmr_diversified_rerank
ORACLES["mmr_diversified_rerank"] = _mmr_oracle()

# srm_check: sample-ratio-mismatch chi-square gate with a planted 52/48
# drift — exact (2o−n)²/n integers, frozen critical value
# (operators/experiments.py).
# stream_containment: per-batch shingle rows appended to a postings
# ledger; the df-capped kernel runs at readout where rarity is knowable
# — shared containment_pairs oracle (streaming/replay.py).
QUERIES["srm_check"] = experiments.srm_check
ORACLES["srm_check"] = _TEXTS["srm_check"]

QUERIES["stream_containment"] = replay.stream_containment
ORACLES["stream_containment"] = ORACLES["containment_pairs"]


# Round-14 seventh wave -------------------------------------------------------
# blocking_quality_audit: pairs-completeness vs reduction-ratio audit
# of two ER blocking strategies against the planted ground truth —
# exact recall, no sampling (functions/dedup.py).
# stream_skew_monitor: per-batch key-count partials folded into a
# ledger feeding the shared salt-plan kernel; shares
# skew_salt_advisor's oracle verbatim (streaming/replay.py).
QUERIES["blocking_quality_audit"] = dedup.blocking_quality_audit
ORACLES["blocking_quality_audit"] = _TEXTS["blocking_quality_audit"]

QUERIES["stream_skew_monitor"] = replay.stream_skew_monitor
ORACLES["stream_skew_monitor"] = _TEXTS["skew_salt_advisor"]


# Round-14 eighth wave --------------------------------------------------------
# qini_uplift_curve: cumulative-decile uplift evaluation (Radcliffe
# Qini) over the shared propensity fixture with an independent md5
# treatment coin — exact integers, one frozen micro division per
# decile (operators/experiments.py).
# shuffle_partition_advisor: partition-sizing pre-flight from exact
# uncompressed payload bytes — the sizing rule the session config
# states in prose, made computable (operators/maintenance.py).
QUERIES["qini_uplift_curve"] = experiments.qini_uplift_curve
ORACLES["qini_uplift_curve"] = _TEXTS["qini_uplift_curve"]

QUERIES["shuffle_partition_advisor"] = maintenance.shuffle_partition_advisor
ORACLES["shuffle_partition_advisor"] = _TEXTS["shuffle_partition_advisor"]


# Round-15 first wave ---------------------------------------------------------
# knn_ivf_pq: the faiss IVF-PQ composition — coarse md5-sampled cells
# + product quantization of RESIDUALS, per-probed-cell ADC tables,
# exact rerank (functions/similarity.py; VERDICT r14 task 4).
# ivf_pq_recall_profile: candidate recall of flat PQ vs IVF-PQ at the
# same shortlist budget, with the probed-cell exact-search ceiling
# that separates pruning loss from coding quality.
QUERIES["knn_ivf_pq"] = similarity.ivf_pq_knn
ORACLES["knn_ivf_pq"] = _ivf_pq_oracle()

QUERIES["ivf_pq_recall_profile"] = similarity.ivf_pq_recall_profile
ORACLES["ivf_pq_recall_profile"] = _ivf_pq_recall_oracle()


# Round-15 second wave --------------------------------------------------------
# schema_evolution_read: the lakehouse family's missing read-side piece
# (VERDICT r14 task 5) — two physically-written parquet snapshots with
# drifted schemas (rename, int32->int64 widening, added column) resolved
# to one logical schema by a column-mapping manifest at read time, no
# rewrite; gated on the per-(version, status) profile of the unified
# table.  udtf_token_rows: SURVEY §2.11's optional UDTF checkbox — a
# Spark-4 Arrow-optimized Python UDTF fanned out via LATERAL, gated
# against the built-in split-equivalent (DuckDB unnest) it must agree
# with (plan test pins ArrowEvalPythonUDTF + pruned scan).
QUERIES["schema_evolution_read"] = maintenance.schema_evolution_read
ORACLES["schema_evolution_read"] = _TEXTS["schema_evolution_read"]

QUERIES["udtf_token_rows"] = sqlsurface.udtf_token_rows
ORACLES["udtf_token_rows"] = _TEXTS["udtf_token_rows"]

# containment_index_pairs: the persisted incremental containment index
# (update = O(batch) postings + df-delta appends; probe = pair
# materialization against the CURRENT df-ledger fold, so a shingle
# crossing the df cap retracts its pairs implicitly — the honest
# incremental contract stream_containment's docstring called out).
# Probe ≡ inline, so the containment_pairs oracle is shared verbatim.
QUERIES["containment_index_pairs"] = dedup.containment_index_pairs
ORACLES["containment_index_pairs"] = ORACLES["containment_pairs"]


# Round-15 fourth wave --------------------------------------------------------
# mann_whitney_test: tie-corrected Mann-Whitney U per segment — exact
# integer midrank arithmetic (doubled ranks) over the per-(segment,
# value) histogram, z from the tie-corrected normal approximation
# (operators/experiments.py).  stream_containment_index: the persisted
# containment index maintained by the stream — per-micro-batch O(batch)
# admission through update_containment_index, probe-time cap-crossing
# retraction; shares the containment_pairs oracle verbatim.
QUERIES["mann_whitney_test"] = experiments.mann_whitney_test
ORACLES["mann_whitney_test"] = _TEXTS["mann_whitney_test"]

QUERIES["stream_containment_index"] = replay.stream_containment_index
ORACLES["stream_containment_index"] = ORACLES["containment_pairs"]


# Round-15 fifth wave ---------------------------------------------------------
# stream_mann_whitney: the U test maintained by the stream — per-batch
# (segment, value) histogram partials into a ledger, exact BIGINT merge
# at readout, shared midrank kernel; batch oracle inherited verbatim.
# partition_evolution_read: Iceberg-style partition-spec evolution —
# early events written partitioned by month, later by (month,
# event_type); one predicate read across both layouts (directory prune
# on the new spec, row filter on the old), gated on the per-(spec,
# month) purchase profile.
QUERIES["stream_mann_whitney"] = replay.stream_mann_whitney
ORACLES["stream_mann_whitney"] = _TEXTS["mann_whitney_test"]

QUERIES["partition_evolution_read"] = maintenance.partition_evolution_read
ORACLES["partition_evolution_read"] = _TEXTS["partition_evolution_read"]


# Round-15 sixth wave ---------------------------------------------------------
# ivf_pq_incremental_knn: the faiss add() contract for the IVF-PQ index
# — quantizers train on the first deterministic wave only, later waves
# are admitted by update_ivf_pq_index with centroids+codebook frozen
# (O(batch) broadcast assignment/encoding, cell-partitioned appends),
# then the standard probe.  The oracle mirrors the whole pipeline by
# restricting both seed samples to the wave-0 subset.
QUERIES["ivf_pq_incremental_knn"] = similarity.ivf_pq_incremental_knn
ORACLES["ivf_pq_incremental_knn"] = _ivf_pq_oracle(
    seed_where="WHERE vec_id % 3 = 0"
)


# Round-15 seventh wave -------------------------------------------------------
# ivf_pq_nprobe_sweep: the probe-budget tuning curve — ONE corpus
# encode (scores are probe-independent; the budget only gates which
# home cells are admitted), then a filtered shortlist + recall readout
# per sweep point (the lsh_band_sweep idiom).  udaf_trimmed_mean: the
# UDAF corner of the §2.11 UDx surface — Arrow grouped-agg pandas UDF
# (AggregateInPandas, plan-pinned), value-order trimming so the result
# is arrival-order independent and exactly oracle-checkable.
QUERIES["ivf_pq_nprobe_sweep"] = similarity.ivf_pq_nprobe_sweep
ORACLES["ivf_pq_nprobe_sweep"] = _ivf_pq_nprobe_sweep_oracle()

QUERIES["udaf_trimmed_mean"] = sqlsurface.udaf_trimmed_mean
ORACLES["udaf_trimmed_mean"] = _TEXTS["udaf_trimmed_mean"]

# containment_batch_probe: the daily-probe shape of the persisted
# containment index — the planted half-docs as the batch, gb-partition
# pruning on the postings (bounded ≤64-key collect), O(batch) pair
# join.  Oracle = the shared containment oracle filtered to pairs
# touching a planted (+1e6) id, because an admitted-batch probe must
# equal the full readout restricted to the batch.
QUERIES["containment_batch_probe"] = dedup.containment_batch_probe_pairs
ORACLES["containment_batch_probe"] = (
    "SELECT * FROM (" + ORACLES["containment_pairs"] + ") "
    "WHERE doc_a >= 1000000 OR doc_b >= 1000000 ORDER BY doc_a, doc_b"
)


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
