"""Round-8 regression pins: fixedpoint session-scope semantics, the
scratch-dir lifecycle, the CC-labeling reuse twins, and the
concurrent_events_peak non-positive-duration guard (ADVICE r7)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# fixedpoint: wide_sums must key on ALL dirs seen, not the last one
# ---------------------------------------------------------------------------


def test_wide_sums_widens_if_any_seen_dir_is_ambiguous(monkeypatch):
    """A session that touches sf0.01 then a hint-less dir must widen —
    the r7 advisory's silent-narrow hazard: last-writer state would
    flip back narrow if small data were loaded after big."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp

    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")
    fp.reset_sf_hints()
    try:
        fp.note_sf_dir("/data/sf0.01")
        assert fp.wide_sums() is False
        fp.note_sf_dir("/data/prod_corpus")  # no sf hint -> ambiguous
        assert fp.wide_sums() is True
        # and the decision does NOT revert when small data loads later
        fp.note_sf_dir("/data/sf0.001")
        assert fp.wide_sums() is True
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)  # restore the shared session's hint


def test_wide_sums_no_dirs_yet_defaults_wide(monkeypatch):
    """sum_fixed built before any load_table (raw readStream parquet)
    must pick the overflow-safe accumulator."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp

    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")
    fp.reset_sf_hints()
    try:
        assert fp.wide_sums() is True
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)  # restore the shared session's hint


def test_wide_sums_explicit_sf_dir_beats_session_state(monkeypatch):
    """The sf_dir parameter scopes the decision to that dir alone."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp

    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")
    fp.reset_sf_hints()
    try:
        fp.note_sf_dir("/data/unhinted")  # session says widen
        assert fp.wide_sums("/data/sf0.1") is False
        assert fp.wide_sums("/data/sf8") is True
        assert fp.wide_sums("/data/nohint") is True
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)  # restore the shared session's hint


def test_wide_sums_env_override_still_wins(monkeypatch):
    from project_bigdata_recsys_spark.functions import fixedpoint as fp

    fp.reset_sf_hints()
    try:
        fp.note_sf_dir("/data/sf0.01")
        monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "decimal")
        assert fp.wide_sums() is True
        assert fp.wide_sums("/data/sf0.01") is True
        monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "long")
        assert fp.wide_sums() is False
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)  # restore the shared session's hint


# ---------------------------------------------------------------------------
# scratch_dir: every engine temp dir is registered and purged at exit
# ---------------------------------------------------------------------------


def test_scratch_dir_registers_and_purges():
    from project_bigdata_recsys_spark import caching

    d = caching.scratch_dir(prefix="spark_test_scratch_")
    assert os.path.isdir(d)
    assert d in caching._SCRATCH
    with open(os.path.join(d, "f.txt"), "w") as fh:
        fh.write("x")
    # purge ONLY this test's dir: the scratch registry is process-shared
    # state backing the session's parquet memos (CC labeling, band
    # index) — sweeping it mid-suite forces every later consumer to
    # rebuild (they revalidate and survive, but pay the build again)
    others = [x for x in caching._SCRATCH if x != d]
    caching._SCRATCH[:] = [d]
    try:
        caching._purge_scratch()
        assert not os.path.exists(d)
        assert d not in caching._SCRATCH
    finally:
        caching._SCRATCH[:] = others


def test_no_raw_mkdtemp_left_in_package():
    """Every temp dir must route through the registered scratch tier —
    a raw mkdtemp reintroduces the unbounded-/tmp leak (ADVICE r7)."""
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "project_bigdata_recsys_spark"
    offenders = [
        str(p)
        for p in pkg.rglob("*.py")
        if p.name != "caching.py" and "tempfile.mkdtemp" in p.read_text()
    ]
    assert offenders == []


# ---------------------------------------------------------------------------
# CC-labeling reuse twins: identical output to the self-contained forms
# ---------------------------------------------------------------------------


def test_near_dup_clusters_reused_matches_self_contained(spark):
    from project_bigdata_recsys_spark.functions.dedup import (
        near_dup_clusters,
        near_dup_clusters_reused,
    )

    a = sorted(map(tuple, near_dup_clusters(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, near_dup_clusters_reused(spark, SF_SMALL).collect()))
    assert a == b and len(a) > 0


def test_split_source_audit_reused_matches_self_contained(spark):
    from project_bigdata_recsys_spark.functions.curation import (
        split_source_audit,
        split_source_audit_reused,
    )

    a = sorted(map(tuple, split_source_audit(spark, SF_SMALL).collect()))
    b = sorted(
        map(tuple, split_source_audit_reused(spark, SF_SMALL).collect())
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# concurrent_events_peak: non-positive durations must not enter the sweep
# ---------------------------------------------------------------------------


def test_concurrent_peak_ignores_zero_duration_events(spark, tmp_path):
    """A value clamped to exactly 0.0 (mutate_with_noise does this) must
    contribute to n_intervals but never to the sweep: F.sequence with
    hi < lo would DESCEND and fabricate edge rows (ADVICE r7)."""
    import datetime

    from project_bigdata_recsys_spark.operators.analytics import (
        concurrent_events_peak,
    )

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("click", ts, 10.0, 1, 1),
        ("click", ts, 0.0, 2, 1),  # zero duration: counted, not swept
        ("click", ts + datetime.timedelta(seconds=5), 10.0, 3, 1),
        ("view", ts, 0.0, 4, 1),  # a type with ONLY zero durations
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, "
        "user_id long, item_id long"
    )
    # dir name carries a small sf hint so note_sf_dir keeps the session
    # in narrow long-sum mode for later tests (process-global state)
    d = str(tmp_path / "sf0.001-peak")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r.event_type: r for r in concurrent_events_peak(spark, d).collect()
    }
    assert out["click"].peak_concurrent == 2  # the two 10s intervals only
    assert out["click"].n_intervals == 3  # zero-duration row still counted
    assert "view" not in out  # nothing sweepable -> no peak row


# ---------------------------------------------------------------------------
# RocksDB state store: both providers must produce identical final state
# ---------------------------------------------------------------------------


def test_stateful_stream_parity_hdfs_vs_rocksdb_store(spark):
    """The default HDFS-backed provider holds keyed state on-heap — the
    known cliff at 100x key cardinality; production flips to RocksDB via
    SPARK_GRAFT_STATE_STORE=rocksdb (session.py).  providerClass is read
    at stream START, so one session can run the same bounded replay
    under both providers; final state must be identical."""
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_stateful_features,
    )

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prefix = "org.apache.spark.sql.execution.streaming.state."
    prev = spark.conf.get(conf_key)
    try:
        spark.conf.set(conf_key, prefix + "HDFSBackedStateStoreProvider")
        a = sorted(
            map(tuple, stream_stateful_features(spark, SF_SMALL).collect())
        )
        spark.conf.set(conf_key, prefix + "RocksDBStateStoreProvider")
        b = sorted(
            map(tuple, stream_stateful_features(spark, SF_SMALL).collect())
        )
    finally:
        spark.conf.set(conf_key, prev)
    assert len(a) > 0 and a == b


def test_session_factory_state_store_toggle(monkeypatch, spark):
    """SPARK_GRAFT_STATE_STORE=rocksdb must select the RocksDB provider
    class — getOrCreate applies builder configs to an existing session,
    so the toggle is assertable (and restorable) on the live one."""
    from project_bigdata_recsys_spark.session import get_spark

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key)
    try:
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
        s = get_spark("toggle-check")
        assert s.conf.get(conf_key).endswith("RocksDBStateStoreProvider")
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "hdfs")
        s = get_spark("toggle-check")
        assert s.conf.get(conf_key).endswith("HDFSBackedStateStoreProvider")
    finally:
        spark.conf.set(conf_key, prev)


# ---------------------------------------------------------------------------
# DECIMAL(38,0) wide-sum mode: oracle parity on the fixed-point subset
# ---------------------------------------------------------------------------


def test_wide_mode_oracle_parity_on_fixed_point_subset(spark, duck, monkeypatch):
    """The wide accumulator is what ships past sf1; r8 proved the FULL
    sweep green in decimal mode at sf0.01 (221/221, docs/BENCH_NOTES.md)
    — this pins a representative fixed-point subset so the proof can't
    silently rot between full-sweep runs."""
    import pandas as pd

    from project_bigdata_recsys_spark.plans.queries import ORACLES, QUERIES

    subset = [
        "pricing_summary",  # the 4-scale TPC-H Q1 shape
        "course_stats",  # joined agg + TakeOrdered
        "monthly_growth",  # lag window over cents
        "rollup_totals",  # hierarchical totals
        "time_rollup",
        "merge_upsert_profile",  # CoW merge post-profile
        "user_activity",
    ]
    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "decimal")
    for name in subset:
        spark_pdf = QUERIES[name](spark, SF_SMALL).toPandas()
        oracle_pdf = duck.execute(ORACLES[name]).fetchdf()
        assert len(spark_pdf) == len(oracle_pdf), name
        assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), name
        a = spark_pdf.reindex(sorted(spark_pdf.columns), axis=1)
        b = oracle_pdf.reindex(sorted(oracle_pdf.columns), axis=1)
        if len(a):
            a = a.sort_values(by=list(a.columns), ignore_index=True)
            b = b.sort_values(by=list(b.columns), ignore_index=True)
        for col in a.columns:
            for i, (x, y) in enumerate(zip(a[col], b[col])):
                if x is None and y is None:
                    continue
                if isinstance(x, float) or isinstance(y, float):
                    import math

                    fx, fy = float(x), float(y)
                    assert (
                        (math.isnan(fx) and math.isnan(fy)) or fx == fy
                    ), (name, col, i, x, y)
                else:
                    assert x == y, (name, col, i, x, y)


# ---------------------------------------------------------------------------
# Round-8 wave plan shapes: the scale contracts of the new operators
# ---------------------------------------------------------------------------


def test_semdedup_pair_join_is_keyed_on_cell(spark):
    """The SemDeDup pair stage must be a hash join keyed on the cell id
    — Σc², never the global n².  The only nested-loop joins allowed in
    the whole plan are the deliberate broadcast crosses of model-sized
    frames (the n_cells-row centroid frame; 1-row aggregates)."""
    from project_bigdata_recsys_spark.functions.similarity import (
        semdedup_profile,
    )

    df = semdedup_profile(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the pair self-join on cell must hash, not loop
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_domain_quota_windows_only_over_quota_domains(spark):
    """The per-domain pick window must see ONLY docs of over-quota
    domains: a Filter on the domain count sits below the Window, so an
    at-quota long tail (the overwhelming majority of real registrable
    domains) never enters the rank shuffle."""
    from project_bigdata_recsys_spark.functions.curation import (
        domain_quota_sample,
    )

    df = domain_quota_sample(spark, SF_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.split("\n")
    win_idx = [
        i
        for i, l in enumerate(lines)
        if l.lstrip(" :+-").startswith("Window ")
    ]
    assert win_idx, "expected a rank window in the plan"
    # below every window, a filter on the over-quota count must appear
    # before the scan
    for i in win_idx:
        below = "\n".join(lines[i:])
        assert "__n_dom" in below and "> 20" in below, below[:500]


def test_semdedup_drop_rule_keep_min_id(spark):
    """Keep-min canonical: a dropped vector must have a LOWER-id
    near-dup in the SAME cell, and cell counts must reconcile."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.functions.similarity import (
        semdedup_profile,
    )

    out = semdedup_profile(spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_vecs
        assert r.n_kept >= 1  # the min-id member of any cell survives


# ---------------------------------------------------------------------------
# Domain-quota family: incremental state must reconcile with the full run
# ---------------------------------------------------------------------------


def test_incremental_domain_quota_reconciles_with_full_run(spark):
    """FCFS conservation: per domain, prior-admitted + batch-admitted =
    min(quota, domain_total) — i.e. the incremental fold lands on
    exactly the same per-domain kept counts as the one-shot
    domain_quota_sample, so totals must reconcile:
    full n_kept == prior-state mass + incremental n_admitted."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.functions.curation import (
        domain_quota_sample,
        incremental_domain_quota,
    )
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    full_kept = (
        domain_quota_sample(spark, SF_SMALL)
        .agg(F.sum("n_kept"))
        .collect()[0][0]
    )
    inc_admitted = (
        incremental_domain_quota(spark, SF_SMALL)
        .agg(F.sum("n_admitted"))
        .collect()[0][0]
    )
    # prior-state mass: per-domain min(quota, prior count)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    u = hash_uniform(F.col("doc_id"), "domain:")
    prior_mass = (
        docs.withColumn(
            "domain_idx", F.floor(u * u * F.lit(150.0)).cast("long")
        )
        .filter(F.col("doc_id") % 7 != 0)
        .groupBy("domain_idx")
        .agg(F.least(F.count(F.lit(1)), F.lit(20)).alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert full_kept == prior_mass + inc_admitted


# ---------------------------------------------------------------------------
# Round-8 second wave: ranking eval, KMV sketch, repetition rules
# ---------------------------------------------------------------------------


def test_ranking_metrics_invariants_and_plan(spark):
    """Metric sandwich for single-relevant-item eval (1/r <= 1/log2(r+1)
    <= 1 gives mrr <= ndcg <= hit_rate per K), monotone in K, and the
    plan must never materialize the |users| x C candidate frame: no
    cartesian product, and the candidate joins broadcast."""
    from project_bigdata_recsys_spark.ml.ranking import ranking_metrics

    df = ranking_metrics(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = {r.k: r for r in df.collect()}
    assert sorted(rows) == [5, 10, 20]
    n_users = {r.n_users for r in rows.values()}
    assert len(n_users) == 1  # every test user evaluated at every K
    prev_hits = -1
    for k in (5, 10, 20):
        r = rows[k]
        assert r.n_hits >= prev_hits  # monotone in K
        prev_hits = r.n_hits
        assert 0.0 <= r.mrr <= r.ndcg <= r.hit_rate <= 1.0


def test_kmv_estimate_modes(spark):
    """Exact below k (the sketch IS the set), estimator above it — and
    the estimate must land within a generous KMV error envelope
    (sigma ~ 1/sqrt(k-2) ~ 6.3% at k=256; 5 sigma budget)."""
    from project_bigdata_recsys_spark.operators.relational import (
        kmv_distinct_rollup,
    )

    out = kmv_distinct_rollup(spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert r.n_sketch <= 256
        if r.n_sketch < 256:
            assert r.kmv_estimate == float(r.n_sketch)
        assert r.rel_err <= 0.32, r


def test_doc_repetition_ranges(spark):
    """Ratios are proper fractions; every >=3-token doc is profiled."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.text import (
        doc_repetition_profile,
        tokens,
    )

    out = doc_repetition_profile(spark, SF_SMALL)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.avg_dup_bigram <= 1.0
        assert 0.0 <= r.avg_top_bigram_share <= 1.0
        assert 0.0 <= r.avg_dup_trigram <= 1.0
        assert 0 <= r.n_repetitive <= r.n_docs
    total = sum(r.n_docs for r in rows)
    expect = (
        load_table(spark, SF_SMALL, "documents")
        .filter(F.size(tokens(F.col("text"))) >= 3)
        .count()
    )
    assert total == expect


def test_trending_items_plan_and_order(spark):
    """Top-K must be a TakeOrdered, never a global sort; scores must be
    non-increasing and every score positive (weights are positive)."""
    from project_bigdata_recsys_spark.operators.analytics import (
        trending_items,
    )

    df = trending_items(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 15
    scores = [r.trend_score for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_stream_kmv_matches_batch_weekly_sketch(spark):
    """The KMV merge is order-independent: the streamed per-week sketch
    must agree with the batch rollup's weekly numbers exactly."""
    from project_bigdata_recsys_spark.operators.relational import (
        kmv_distinct_rollup,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_kmv_distinct,
    )

    batch = {
        r.week: (r.n_sketch, r.kmv_estimate, r.n_exact)
        for r in kmv_distinct_rollup(spark, SF_SMALL).collect()
    }
    stream = {
        r.week: (r.n_sketch, r.kmv_estimate, r.n_exact)
        for r in stream_kmv_distinct(spark, SF_SMALL).collect()
    }
    assert batch == stream


def test_drift_tests_statistics_well_formed(spark):
    """KS statistic is a proper fraction with a positive threshold; the
    U statistic sits in [0, n_a*n_b]; both tests see every event row and
    agree on the split sizes."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.quality import (
        ks_value_drift,
        mann_whitney_drift,
    )

    ks = ks_value_drift(spark, SF_SMALL).collect()[0]
    mw = mann_whitney_drift(spark, SF_SMALL).collect()[0]
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert ks.n_a + ks.n_b == n_events
    assert (mw.n_a, mw.n_b) == (ks.n_a, ks.n_b)
    assert 0.0 <= ks.ks_stat <= 1.0 and ks.ks_crit > 0
    assert 0.0 <= mw.u_stat <= mw.n_a * mw.n_b


def test_bloom_membership_no_false_negatives_and_probe_shape(spark):
    """Members always hit all positions (no false negatives — the Bloom
    contract); plants are definitely absent so the FP denominator is
    populated; the probe joins against a broadcast of the KB-scale
    position set, never a shuffled fact."""
    from project_bigdata_recsys_spark.operators.relational import (
        bloom_membership_profile,
    )

    df = bloom_membership_profile(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    r = df.collect()[0]
    assert r.no_false_negatives is True
    assert r.n_probed == 2 * r.n_present  # customer + planted twin each
    assert r.n_maybe >= r.n_present
    assert r.n_false_pos == r.n_maybe - r.n_present
    assert r.n_bits_set <= 8192
