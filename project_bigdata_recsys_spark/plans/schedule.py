"""Gate-window rotation history and write-ahead schedules.

The driver's correctness gate executes the FIRST 50 keys of
``plans.queries.QUERIES``; ordering is the rotation mechanism and the
``_GATE_WINDOW`` list at the end of that module pins the window
explicitly.  This module is documentation only — the executed rotations
(rounds 9-14) and the write-ahead schedules (rounds 15-17+) that used
to live as a ~300-line comment above ``_GATE_WINDOW`` (VERDICT r13
task 3: move the schedule out of the registry module).  Nothing here
is imported; edits here never change gate behavior.

ROUND-16 EXECUTION NOTE (this round): the window now holds the 50-name
r16 write-ahead block verbatim (the nineteen names the r13 ripple waves
displaced past r15, the remaining r8-evidence queries, then the oldest
r9-evidence queries in registration order — exactly the "Round-16
rotation schedule" list below); local sf0.01 gate-window sweep output
committed as PRECHECK_r16_gate.json — the rotation counts once
CORRECTNESS_r16.json is green.  No tail insertions this round
(optimization round — no new operators).

ROUND-15 EXECUTION NOTE: the window held the 50-name
r15 block verbatim — the twenty-two r14-displaced names in wave order
followed by the round-15 schedule's first 28 names, exactly the
"R15 BLOCK AS RECOMPUTED AFTER THE R14 WAVES" list below; local
sf0.01 gate-window sweep output committed as PRECHECK_r15_gate.json —
the rotation counts once CORRECTNESS_r15.json is green.  This block
retires the entire r7-evidence bucket (VERDICT r14 task 2): every
remaining window name's prior driver evidence is r7 or r8.  Tail
insertions for round-15 entrants displace names from this block's
tail to the r16 head, recorded here per wave.

R15 FIRST WAVE: two slots displaced to the r16 head (lang_profile,
doc_fingerprints — r7-evidenced, bench-exercised) for the first-wave
pair (knn_ivf_pq — the faiss IVF-PQ composition, coarse md5-sampled
cells + residual product quantization + per-probed-cell ADC, verdict
task 4; ivf_pq_recall_profile — flat-PQ vs IVF-PQ candidate recall at
the same shortlist budget with the probed-cell exact-search ceiling);
window replica re-run and PRECHECK_r15_gate.json refreshed at the
insertion.

R15 SECOND WAVE: two slots displaced to the r16 head (lang_source_chi2,
doc_quality_profile — doc_quality_profile is additionally in the frozen
bench subset, so it stays exercised every bench run) for the
second-wave pair (schema_evolution_read — manifest-driven column-mapping
resolution of two drifted parquet snapshots, the lakehouse read-side
piece, verdict task 5; udtf_token_rows — Spark-4 Arrow Python UDTF via
LATERAL gated against the built-in split equivalent, closing SURVEY
§2.11's optional UDTF checkbox, verdict task 6); window replica re-run
and PRECHECK_r15_gate.json refreshed at the insertion.

R15 THIRD WAVE: one slot displaced to the r16 head
(item_similar_neighbors — r8-evidenced, bench-exercised) for
containment_index_pairs (the persisted incremental containment index:
O(batch) postings + df-delta ledger admission, probe-time exclusion of
cap-crossed shingles = implicit pair retraction, verdict task 7;
probe ≡ inline so the containment_pairs oracle is shared verbatim);
window replica re-run and PRECHECK_r15_gate.json refreshed at the
insertion.

R15 FOURTH WAVE: two slots displaced to the r16 head
(merge_upsert_profile, cms_heavy_hitters — r8-evidenced,
bench-exercised) for the fourth-wave pair (mann_whitney_test —
tie-corrected Mann-Whitney U per segment, integer doubled-midrank
arithmetic over the per-(segment, value) histogram;
stream_containment_index — the persisted containment index maintained
per micro-batch, probe-time cap-crossing retraction, containment_pairs
oracle shared verbatim); window replica re-run and
PRECHECK_r15_gate.json refreshed at the insertion.

R15 FIFTH WAVE: two slots displaced to the r16 head
(rerank_uplift_profile, stream_value_quantiles — r8-evidenced,
bench-exercised) for the fifth-wave pair (stream_mann_whitney — the U
test as a per-batch histogram-partial ledger fold sharing the midrank
kernel and the batch oracle verbatim; partition_evolution_read —
Iceberg-style partition-spec evolution, one predicate read across an
old month-partitioned layout and a new (month, event_type) layout,
directory prune vs row filter, gated on the per-(spec, month)
profile); window replica re-run and PRECHECK_r15_gate.json refreshed
at the insertion.

R15 SIXTH WAVE: one slot displaced to the r16 head (bpe_pair_counts —
r13-evidenced, bench-exercised) for ivf_pq_incremental_knn (the faiss
add() contract: quantizers trained on the deterministic wave-0 subset,
later waves admitted through update_ivf_pq_index with centroids and
codebook frozen, O(batch) broadcast assignment/encoding and
cell-partitioned code appends; oracle = _ivf_pq_oracle with both seed
samples restricted to the wave-0 subset); window replica re-run and
PRECHECK_r15_gate.json refreshed at the insertion.

R15 SEVENTH WAVE: two slots displaced to the r16 head
(stream_late_data_audit, stream_merge_apply — r13-evidenced,
bench-exercised) for the seventh-wave pair (ivf_pq_nprobe_sweep — the
probe-budget tuning curve from ONE corpus encode, per-point filtered
shortlists over a probe-independent scored frame;
udaf_trimmed_mean — the Arrow grouped-agg pandas UDAF corner of the
§2.11 UDx surface, ArrowAggregatePython plan-pinned, value-order
trimming so the statistic is arrival-order independent); window
replica re-run and PRECHECK_r15_gate.json refreshed at the insertion.

R15 EIGHTH WAVE: one slot displaced to the r16 head
(concurrent_events_peak — r13-evidenced, bench-exercised) for
containment_batch_probe (the daily-probe shape of the persisted
containment index: planted half-docs as the batch, gb-partition
pruning via a bounded ≤64-key collect, O(batch) pair join; oracle =
the shared containment oracle filtered to pairs touching a planted
id); window replica re-run and PRECHECK_r15_gate.json refreshed at
the insertion.

ROUND-14 EXECUTION NOTE: the window held the 50-name
r14 write-ahead block verbatim (the twenty-eight names displaced from
r13 plus the remaining r7-evidence queries in registration order, as
scheduled below); local sf0.01 gate-window sweep output committed as
PRECHECK_r14_gate.json — the rotation counts once CORRECTNESS_r14.json
is green.  Tail insertions for round-14 entrants displace names from
this block's tail to the r15 head, recorded here per wave.

R14 FIRST WAVE: three slots displaced to the r15 head (monthly_growth,
embedding_dim_profile, rolling_distinct_users — r7-evidenced,
bench-exercised) for the first-wave trio (bpe_train_merges — iterated
BPE tokenizer training, verdict task 5; stream_golden_record — the
incremental ER linkage fold, verdict task 6; join_view_time_travel —
sequence-bounded MOR snapshot reads, verdict task 7 stretch); window
replica re-run and PRECHECK_r14_gate.json refreshed at the insertion.

R14 SECOND WAVE: three slots displaced to the r15 head
(item_pagerank_personalized, prefix_cache_savings,
packing_efficiency_sweep — r7-evidenced, bench-exercised) for the
second-wave trio (stream_bpe_vocab — BPE training from a folded
word-count ledger, shared bpe_train_merges oracle; containment_pairs —
Broder containment near-dup over df-capped rare-shingle candidates;
kneser_ney_bigram — exact-integer KN-smoothed bigram LM); window
replica re-run and PRECHECK_r14_gate.json refreshed at the insertion.

R14 THIRD WAVE: three slots displaced to the r15 head
(semantic_contamination, anti_join_new_keys, union_dedup —
r7-evidenced, bench-exercised) for the third-wave trio
(pr_auc_by_group — exact trapezoidal PR-AUC per segment;
brier_decomposition — Murphy reliability/resolution/uncertainty over
the shared propensity fixture; isotonic_calibration_pav — minimax PAV
recalibration, bin-domain bounded); window replica re-run and
PRECHECK_r14_gate.json refreshed at the insertion.

R14 FOURTH WAVE: three slots displaced to the r15 head
(scalar_functions, rollup_totals, multiway_join — r7-evidenced,
bench-exercised) for the fourth-wave trio (vacuum_retention_plan —
keep-last-N snapshot expiry planning; sql_lateral_topk — correlated
LATERAL derived-table parity; local_clustering_profile — per-node
clustering coefficient over the oriented triangle kernel); window
replica re-run and PRECHECK_r14_gate.json refreshed at the insertion.

R14 FIFTH WAVE: three slots displaced to the r15 head (null_handling,
top_k_orders, derived_projection — r7-evidenced, bench-exercised) for
the fifth-wave trio (bpe_fertility_after_merges — the learned merge
table applied per source, closing the tokenizer train→apply loop;
skew_salt_advisor — per-hot-key salt planning over planted skew;
stream_pr_auc — the value-histogram ledger fold sharing
pr_auc_by_group's oracle); window replica re-run and
PRECHECK_r14_gate.json refreshed at the insertion.

R14 SIXTH WAVE: three slots displaced to the r15 head
(time_range_filter, conditional_pivot, distinct_counts —
r7-evidenced, bench-exercised) for the sixth-wave trio
(mmr_diversified_rerank — greedy MMR over the ANN shortlist, unrolled
oracle; srm_check — the sample-ratio-mismatch chi-square gate;
stream_containment — postings-ledger fold sharing the containment
oracle); window replica re-run and PRECHECK_r14_gate.json refreshed
at the insertion.

R14 SEVENTH WAVE: two slots displaced to the r15 head
(cdc_current_view, user_activity — r7-evidenced, bench-exercised) for
the seventh-wave pair (blocking_quality_audit — exact pairs-
completeness vs reduction-ratio audit of two ER blocking strategies;
stream_skew_monitor — the folded key-histogram salt plan, shared
advisor oracle); window replica re-run and PRECHECK_r14_gate.json
refreshed at the insertion.

R14 EIGHTH WAVE (final — the r7-evidence displacement budget is now
exhausted; every remaining window name is r6-evidenced and stays):
two slots displaced to the r15 head (course_stats,
stream_semantic_dedup — r7-evidenced, bench-exercised) for the
eighth-wave pair (qini_uplift_curve — cumulative-decile uplift
evaluation; shuffle_partition_advisor — exact-payload partition
sizing pre-flight); window replica re-run and PRECHECK_r14_gate.json
refreshed at the insertion.

R15 BLOCK AS RECOMPUTED AFTER THE R14 WAVES (supersedes the head of
the round-15 schedule below; the original block's last 22 names slide
to the r16 head): the twenty-two r14-displaced names in wave order —
    monthly_growth, embedding_dim_profile, rolling_distinct_users,
    item_pagerank_personalized, prefix_cache_savings,
    packing_efficiency_sweep, semantic_contamination,
    anti_join_new_keys, union_dedup, scalar_functions, rollup_totals,
    multiway_join, null_handling, top_k_orders, derived_projection,
    time_range_filter, conditional_pivot, distinct_counts,
    cdc_current_view, user_activity, course_stats,
    stream_semantic_dedup
— then the round-15 schedule's first 28 names (fuzzy_name_matches
through doc_fingerprints in its listed order).  The EXPLICIT 50-name
block, validated against the registry (50 unique, all registered):
    monthly_growth, embedding_dim_profile, rolling_distinct_users,
    item_pagerank_personalized, prefix_cache_savings,
    packing_efficiency_sweep, semantic_contamination,
    anti_join_new_keys, union_dedup, scalar_functions,
    rollup_totals, multiway_join, null_handling, top_k_orders,
    derived_projection, time_range_filter, conditional_pivot,
    distinct_counts, cdc_current_view, user_activity,
    course_stats, stream_semantic_dedup, fuzzy_name_matches,
    psi_drift, backfill_plan, schema_drift_report,
    source_dup_attribution_reused, cluster_aware_split_reused,
    incremental_components_fold, stream_semantic_dedup_probe,
    stream_cdc_current, ann_rerank, ddsketch_quantile_rollup,
    bm25_scores, vocab_coverage_curve, item_triangles,
    concurrent_events_peak, label_agreement_kappa,
    stream_late_data_audit, stream_merge_apply, bpe_pair_counts,
    rerank_uplift_profile, stream_value_quantiles,
    merge_upsert_profile, cms_heavy_hitters,
    item_similar_neighbors, lang_source_chi2, doc_quality_profile,
    lang_profile, doc_fingerprints
(The 22 r14 displacements also push the original r15 block's last 22
names — token_stats, lang_id_confusion, pii_redaction_profile,
semi_join_filter, cooccurrence_pairs, sample_deterministic,
data_quality_report, cube_totals, percentile_stats,
pivot_status_by_priority, cheapest_order_per_customer, time_rollup,
paginated_orders, shipping_priority, local_supplier_volume,
small_quantity_revenue, big_orders, quantity_band_stats,
price_tier_join, grouping_sets_stats, customers_intersect,
customers_except — to the r16 head.)

Round-9 rotation (VERDICT r8 task #1): all 50 slots go to queries
with ZERO prior driver evidence — the r8 session-2 wave (ips_eval,
ucb_ranking, ewma_anomalies + stream twin, quality_lr_score, ...) then
the session-3 statistics/retrieval waves, taken oldest-first in
registration order.  After this round the never-driver-checked count
drops 98 -> 48.

Round-10 rotation (EXECUTED below, per VERDICT r9 task #1): slots 1-46 =
the 46-query never-driver-checked tail in registration order
(pinball_quantile_eval ... theil_inequality_index), slots 47-48 = the two
_reused aliases, slots 49-50 = the two round-10 stretch operators
(dedup_manifest_diff, hard_negative_mining — new entries enter VIA the
window per the r9 verdict task #7, so they get driver evidence
immediately and the never-driver-checked count is 0 after this round).
One correction vs the r9 write-ahead comment: it named pricing_summary
for a tail slot, but pricing_summary's latest driver evidence is r6 (it
re-ran in the r6 window); the oldest evidence is the 50-query r4 block,
which is exactly the r11 rotation below.

Round-11 rotation (EXECUTED in round 11, per VERDICT r10 task #1): 39
r4-latest-evidence queries plus ELEVEN round-11 entrants with no prior
driver evidence (jdbc_roundtrip_ingest, training_data_card,
python_datasource_interactions, stream_python_datasource at slots
26-29 displacing knn_lsh/embedding_stats/media_profile/
video_frame_profile, and mixture_temperature_sweep,
token_budget_planner, secret_scan_profile, stream_secret_scan,
orc_roundtrip_ingest, minhash_calibration_profile,
stream_update_ann_index at slots 44-50 displacing
stream_session_windows/rolling_median/deterministic_group_sample/
json_extraction/events_per_day/event_rate/user_topk_recommendations —
every displaced name moved to the r13 schedule, nothing dropped).
Final window as driven (CORRECTNESS_r11.json 50/50):
    pack_sequences, corpus_mixture, tfidf_top_terms, curation_funnel, incremental_dedup,
    embedding_near_dup_lsh, knn_ivf_centroid, embedding_dup_clusters,
    chunk_documents, quality_percentile_filter, token_frequencies,
    repetition_profile, exact_duplicates, ngram_jaccard_pairs,
    minhash_candidates, simhash_near_pairs, near_dup_clusters,
    contamination_check, dedup_corpus_stats, minhash_verified_pairs,
    knn_brute_force, knn_multi_query, embedding_near_dup_pairs,
    knn_ivf_bucketed, knn_rp_lsh, jdbc_roundtrip_ingest,
    training_data_card, python_datasource_interactions, stream_python_datasource,
    synthetic_interactions, mutated_interactions, stratified_sample,
    als_top_recommendations, als_user_factors, classifier_metrics,
    kb_popular_items, kb_success_profile, stream_stateful_features,
    stream_bootstrapped_features, stream_tumbling_counts, stream_sliding_counts,
    stream_dedup_events, stream_stream_attribution, mixture_temperature_sweep,
    token_budget_planner, secret_scan_profile, stream_secret_scan,
    orc_roundtrip_ingest, minhash_calibration_profile, stream_update_ann_index
(39 names from the CORRECTNESS_r01..r10 oldest-evidence union; 11 new.)

Round-12 rotation schedule (EXECUTED below in round 12; local
sf0.01 gate-window sweep output committed as PRECHECK_r12_gate.json —
the rotation counts only once CORRECTNESS_r12.json is green): the 44
r5-latest-evidence queries in registration order, then the first six
of the r6 block:
      span_dedup_profile, duplicated_spans, weighted_sample,
      cluster_aware_split, group_quantile_filter, span_dedup_incremental,
      stream_trending_items, knn_pq, sql_cheapest_supplier,
      sql_exists_filter, sql_in_subquery, entropy_profile,
      item_pmi, corpus_mixture_tokens, stream_span_dedup,
      augment_token_dropout, corpus_mixture_tokens_sharded, jsonl_roundtrip_ingest,
      variant_extraction, equi_depth_histogram, span_contamination,
      knn_pq_multi, analyze_table, cohort_retention,
      event_funnel, association_rules, robust_outliers,
      dau_wau_stickiness, item_communities, scd2_history,
      span_curation_funnel, pack_sequences_sharded, embedding_dup_clusters_lsh,
      knn_ivf_lloyd, knn_graph, cluster_capped_sample,
      stream_ingest_dedup, skew_report, media_dedup,
      interval_overlap_counts, corpus_mixture_sharded, curation_funnel_sharded,
      incremental_dedup_indexed, purchase_asof_click, normalized_duplicates,
      rfm_segments, power_user_rank, source_scorecard,
      cross_source_overlap, boilerplate_prefix_profile
(r13 continues below; r14 onward = the remaining 36 r7-evidence queries
then the r8 block.)

Round-13 rotation schedule (EXECUTED below in round 13; local sf0.01
gate-window sweep output committed as PRECHECK_r13_gate.json — the
rotation counts only once CORRECTNESS_r13.json is green): the r6- and
oldest-r7/r4-evidence backlog from the write-ahead plan, with six
slots displaced to the r14 head (sessionize, approx_profile,
csv_roundtrip_ingest, pricing_summary, source_mixture,
unigram_logloss — all r6-evidenced and bench-/judge-exercised) for
the two repaired SQL-surface queries (integer-cents fix, VERDICT r12
#1) and the four new r13 ops entering with immediate driver evidence
per the standing discipline; three MORE slots displaced to the r14
head in the round's third wave (incremental_agg_merge,
hll_daily_rollup, dedup_keep_best — r7-evidenced, bench-exercised)
for the merge-on-read join-view trio (join_view_mor,
join_view_reconcile, stream_join_view_mor), window replica re-run and
PRECHECK_r13_gate.json refreshed at that swap; two FURTHER slots
displaced to the r14 head in the fourth wave (length_bucketed_batches,
novelty_profile — r5-evidenced, bench-exercised every round) for the
fourth-wave pair (zipf_fit_profile, bucketed_join_agg), window
replica re-run and PRECHECK_r13_gate.json refreshed again at that
swap; two MORE slots displaced to the r14 head in the fifth wave
(source_dup_attribution, boilerplate_suffix_profile — r5-evidenced,
bench-exercised) for the fifth-wave pair (heaps_fit_profile,
two_hop_reach), window replica re-run and PRECHECK_r13_gate.json
refreshed again; two LAST slots displaced to the r14 head in the
sixth wave (source_vocabulary_profile, source_triage_report —
r5-evidenced, bench-exercised every round) for the sixth-wave pair
(cooccurrence_drift, stream_zipf_fit), window replica re-run and
PRECHECK_r13_gate.json refreshed once more; two slots displaced to
the r14 head in the seventh wave (label_centroid_outliers,
nearest_centroid_agreement — r5-evidenced, bench-exercised) for the
seventh-wave pair (lm_dirichlet_scores, label_prop_communities),
window replica re-run and PRECHECK_r13_gate.json refreshed once
more; three slots displaced to the r14 head in the eighth wave
(source_quantile_filter, incremental_components,
shuffled_export_manifest — r5-evidenced, bench-exercised) for the
eighth-wave trio (fellegi_sunter_linkage, ipf_weight_calibration,
skyline_orders), window replica re-run and PRECHECK_r13_gate.json
refreshed once more; two slots displaced to the r14 head in the
ninth wave (pack_sequences_boundaries, int8_quantization_profile —
r5-evidenced, bench-exercised) for the ninth-wave pair
(winnowing_overlap, kcenter_coreset), window replica re-run and
PRECHECK_r13_gate.json refreshed once more; two slots displaced to
the r14 head in the tenth wave (split_source_audit,
ann_recall_profile — r5-evidenced, bench-exercised) for the
tenth-wave pair (stream_winnowing, stream_skyline — ledger-fold
streaming twins sharing their batch forms' oracle texts verbatim),
window replica re-run and PRECHECK_r13_gate.json refreshed once
more; one slot displaced to the r14 head in the eleventh wave
(centroid_confusion — r5-evidenced, bench-exercised) for the
eleventh-wave op (exact_matched_cohort), window replica re-run and
PRECHECK_r13_gate.json refreshed once more; one slot displaced to
the r14 head in the twelfth wave (conversion_lag — r5-evidenced,
bench-exercised) for the twelfth-wave op (golden_record_fusion),
window replica re-run and PRECHECK_r13_gate.json refreshed once
more; two slots displaced to the r14 head in the thirteenth wave
(gap_filled_daily, ab_test_lift — r5-evidenced, bench-exercised) for
the thirteenth-wave pair (stream_ipf — the raking cell ledger fold,
shared oracle; burrows_delta — stylometric source distance), window
replica re-run and PRECHECK_r13_gate.json refreshed once more:
    pareto_curve, forget_users_plan,
    event_transitions, multi_touch_attribution, decayed_popularity,
    kfold_assignment, negative_samples, pit_segment_rollup,
    snapshot_diff, item_pagerank, video_frame_profile,
    media_profile, label_histogram, json_extraction,
    events_per_day, event_rate, stream_session_windows,
    rolling_median, deterministic_group_sample, knn_lsh,
    embedding_stats, user_topk_recommendations, sql_cheapest_supplier,
    sql_in_subquery, stream_ann_compaction, stream_python_datasource_incremental,
    ann_index_diff, tokenizer_fertility_audit, join_view_mor,
    join_view_reconcile, stream_join_view_mor, zipf_fit_profile,
    bucketed_join_agg, heaps_fit_profile, two_hop_reach,
    cooccurrence_drift, stream_zipf_fit, lm_dirichlet_scores,
    label_prop_communities, fellegi_sunter_linkage,
    ipf_weight_calibration, skyline_orders, winnowing_overlap,
    kcenter_coreset, stream_winnowing, stream_skyline,
    exact_matched_cohort, golden_record_fusion, stream_ipf,
    burrows_delta
(recomputed at rotation time from the r01..r12 union; the 11
r4-evidence queries named by VERDICT r12 task 2 are all retained.)

Round-14 rotation schedule (write-ahead, same discipline;
schedule only — counts once CORRECTNESS_r14.json is green): the
twenty-eight names displaced from r13 (six at the rotation swap,
three at the third-wave tail insertion, two each at the fourth-
through seventh-, ninth-, tenth- and thirteenth-wave tail
insertions, three at the eighth, one each at the eleventh and
twelfth), then the remaining r7-evidence queries in registration
order:
    gap_filled_daily, ab_test_lift,
    conversion_lag, centroid_confusion,
    split_source_audit, ann_recall_profile,
    pack_sequences_boundaries, int8_quantization_profile,
    source_quantile_filter, incremental_components,
    shuffled_export_manifest,
    label_centroid_outliers, nearest_centroid_agreement,
    source_vocabulary_profile, source_triage_report,
    source_dup_attribution, boilerplate_suffix_profile,
    length_bucketed_batches, novelty_profile,
    source_mixture, unigram_logloss, sessionize,
    approx_profile, csv_roundtrip_ingest, pricing_summary,
    incremental_agg_merge, hll_daily_rollup, dedup_keep_best,
    cdc_current_view, course_stats, user_activity,
    distinct_counts, conditional_pivot, time_range_filter,
    derived_projection, top_k_orders, null_handling,
    multiway_join, rollup_totals, scalar_functions,
    union_dedup, anti_join_new_keys, semantic_contamination,
    stream_semantic_dedup, item_pagerank_personalized, prefix_cache_savings,
    packing_efficiency_sweep, monthly_growth, embedding_dim_profile,
    rolling_distinct_users
(r15 onward continues with bm25_scores, vocab_coverage_curve,
 item_triangles — displaced by the r13 third wave — plus
 cms_heavy_hitters, item_similar_neighbors, lang_source_chi2,
 doc_quality_profile, lang_profile, doc_fingerprints — displaced from
 this block's tail — plus concurrent_events_peak,
 label_agreement_kappa — displaced by the r13 fourth wave — plus
 stream_late_data_audit, stream_merge_apply — displaced by its fifth
 wave — plus bpe_pair_counts, rerank_uplift_profile — displaced by
 its sixth — plus stream_value_quantiles, merge_upsert_profile —
 displaced by its seventh — plus stream_cdc_current, ann_rerank,
 ddsketch_quantile_rollup — displaced by its eighth — plus
 incremental_components_fold, stream_semantic_dedup_probe —
 displaced by its ninth — plus source_dup_attribution_reused,
 cluster_aware_split_reused — displaced by its tenth — plus
 schema_drift_report — displaced by its eleventh — plus
 backfill_plan — displaced by its twelfth — plus fuzzy_name_matches,
 psi_drift — displaced by its thirteenth — then the r8 block.)

Round-15 rotation schedule (write-ahead, same discipline;
schedule only — counts once CORRECTNESS_r15.json is green): the
twenty-eight names displaced past r14, then the oldest-evidence (r8)
queries in registration order:
    fuzzy_name_matches, psi_drift,
    backfill_plan, schema_drift_report,
    source_dup_attribution_reused, cluster_aware_split_reused,
    incremental_components_fold, stream_semantic_dedup_probe,
    stream_cdc_current, ann_rerank, ddsketch_quantile_rollup,
    bm25_scores, vocab_coverage_curve, item_triangles,
    concurrent_events_peak, label_agreement_kappa,
    stream_late_data_audit, stream_merge_apply,
    bpe_pair_counts, rerank_uplift_profile,
    stream_value_quantiles, merge_upsert_profile,
    cms_heavy_hitters, item_similar_neighbors, lang_source_chi2,
    doc_quality_profile, lang_profile, doc_fingerprints,
    token_stats, lang_id_confusion, pii_redaction_profile,
    semi_join_filter, cooccurrence_pairs, sample_deterministic,
    data_quality_report, cube_totals, percentile_stats,
    pivot_status_by_priority, cheapest_order_per_customer, time_rollup,
    paginated_orders, shipping_priority, local_supplier_volume,
    small_quantity_revenue, big_orders, quantity_band_stats,
    price_tier_join, grouping_sets_stats, customers_intersect,
    customers_except
(r16 block below; als_ranking_eval, stream_kmv_distinct displaced to
 its head by the r13 fourth-wave ripple, ks_value_drift,
 mann_whitney_drift by its fifth, ranking_metrics,
 bloom_membership_profile by its sixth, stream_domain_quota,
 incremental_domain_quota by its seventh, semdedup_profile,
 domain_quota_sample, k_anonymity_profile by its eighth,
 ntile_quartiles, order_gaps by its ninth, running_total,
 moving_avg_range by its tenth, top_n_per_group by its eleventh,
 drift_lag by its twelfth, priority_union_all,
 latest_order_per_customer by its thirteenth.)

Round-16 rotation schedule (write-ahead, same discipline;
schedule only — counts once CORRECTNESS_r16.json is green): the
names displaced past r15 (three by the r13 third wave, two each by
its fourth through seventh waves, three by its eighth), the
remaining r8-evidence queries, then the oldest r9-evidence queries
in registration order:
    als_ranking_eval, stream_kmv_distinct,
    ks_value_drift, mann_whitney_drift,
    ranking_metrics, bloom_membership_profile,
    stream_domain_quota, incremental_domain_quota,
    semdedup_profile, domain_quota_sample, k_anonymity_profile,
    ntile_quartiles, order_gaps, running_total, moving_avg_range,
    top_n_per_group, drift_lag, priority_union_all,
    latest_order_per_customer,
    trending_items, doc_repetition_profile, kmv_distinct_rollup,
    perplexity_buckets, domain_reweight, hybrid_search,
    l_diversity_profile, ucb_ranking, session_ngrams,
    quality_lr_score, ewma_anomalies, zorder_layout_profile,
    link_prediction_adamic_adar, ips_eval, recs_diversity_profile,
    compaction_plan, stream_ewma_anomalies, stream_pit_enrichment,
    welch_ttest_drift, t_closeness_profile, survival_km_curve,
    ols_trend_per_group, target_encoding_oof, calibration_bins,
    bloom_pruned_join, salted_join_agg, kmv_set_ops,
    stream_welch_drift, embedding_correlation_pairs, url_canonical_dedup,
    dp_noisy_counts
(r17 block below; neyman_allocation_plan, rendezvous_shard_plan
 displaced to its head by the r13 sixth-wave ripple,
 degree_distribution_profile, cuped_adjusted_lift by its seventh,
 sql_recursive_cte, stream_cusum_changepoint, winsorized_stats by
 its eighth, cms_join_size_estimate, seasonal_naive_eval by its
 ninth, cusum_changepoint, stream_bootstrap_ci by its tenth,
 rm3_query_expansion by its eleventh, lsh_band_sweep by its
 twelfth, exact_auc_by_group, bootstrap_ci_mean by its thirteenth.)

Round-17 rotation schedule (write-ahead, same discipline;
schedule only — counts once CORRECTNESS_r17.json is green): the
fifteen names displaced past r16 by the r13 sixth- through
thirteenth-wave ripples, the remaining r9-evidence queries, then the
oldest r10-evidence queries in registration order:
    neyman_allocation_plan, rendezvous_shard_plan,
    degree_distribution_profile, cuped_adjusted_lift,
    sql_recursive_cte, stream_cusum_changepoint, winsorized_stats,
    cms_join_size_estimate, seasonal_naive_eval,
    cusum_changepoint, stream_bootstrap_ci,
    rm3_query_expansion, lsh_band_sweep,
    exact_auc_by_group, bootstrap_ci_mean,
    benford_audit, conformal_interval_eval, dsir_importance_sample,
    acf_ljung_box, bradley_terry_ratings, order_part_hits,
    textrank_keywords, kcore_profile, collocation_llr,
    phrase_search, near_dup_clusters_reused, split_source_audit_reused,
    pinball_quantile_eval, wasserstein_value_drift, embedding_top_pc,
    hashing_collision_audit, absorption_funnel_prob, stream_benford_values,
    did_lift_estimate, sprt_ab_monitor, jl_distortion_audit,
    mann_kendall_trend, woe_iv_profile, theil_sen_trend,
    holt_forecast_eval, stream_sprt_monitor, overdispersion_profile,
    capture_recapture_estimate, eb_shrunk_rates, sorted_neighborhood_pairs,
    shapley_channel_attribution, sequence_entropy_profile, join_order_advisor,
    source_kl_divergence, rake_keyphrases
(r18 onward continues with stream_holt_forecast, bh_fdr_correction —
 displaced from this block's tail by the r13 sixth-wave ripple —
 plus seasonal_indices, term_burstiness — displaced by its seventh —
 plus price_elasticity, doubly_robust_ate, pps_horvitz_thompson —
 displaced by its eighth — plus quantile_normalize_profile,
 spearman_user_metrics — displaced by its ninth — plus
 changepoint_slopes, aa_test_calibration — displaced by its tenth —
 plus markov_removal_attribution — displaced by its eleventh — plus
 largest_remainder_allocation — displaced by its twelfth — plus
 cv_paired_ttest, vocab_cover_sources — displaced by its thirteenth
 — then the remaining 10 r10-evidence queries and the r11/r12
 blocks in evidence-age order.)
"""
