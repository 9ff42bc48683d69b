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
    caching._purge_scratch()
    assert not os.path.exists(d)
    assert d not in caching._SCRATCH


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
