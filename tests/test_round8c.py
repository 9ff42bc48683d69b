"""Round-8 third-session semantic pins: invariants of the DSIR /
diagnostics / preference-ranking / graph wave that value-parity with the
oracle can't catch regressing on both engines at once."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_dsir_selects_target_like_raw_docs(spark):
    """DSIR semantics: selection only ever draws from the raw (non-en)
    pool, and the selected fraction is a real filter (neither 0 nor 1
    corpus-wide)."""
    from project_bigdata_recsys_spark.functions import curation

    rows = curation.dsir_importance_sample(spark, SF_SMALL).collect()
    assert all(r["n_selected"] <= r["n_raw"] for r in rows)
    total_sel = sum(r["n_selected"] for r in rows)
    total_raw = sum(r["n_raw"] for r in rows)
    assert 0 < total_sel < total_raw


def test_acf_lag_zero_normalization(spark):
    """ACF values are correlations: |r_k| <= 1, and the Ljung-Box Q is
    nonnegative and nondecreasing in the lag within each series."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.acf_ljung_box(spark, SF_SMALL).collect()
    assert rows, "events must span multiple days"
    assert all(abs(r["acf"]) <= 1.0 + 1e-9 for r in rows)
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["lag"])):
        by_type.setdefault(r["event_type"], []).append(r["q_stat"])
    for qs in by_type.values():
        assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))
        assert qs[0] >= 0


def test_benford_fractions_form_distribution(spark):
    """All nine digits present; observed fractions sum to ~1; expected
    fractions are exactly Benford's (monotone decreasing from d=1)."""
    from project_bigdata_recsys_spark.operators import quality

    rows = quality.benford_audit(spark, SF_SMALL).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-3
    exp = [r["exp_frac"] for r in rows]
    assert all(a > b for a, b in zip(exp, exp[1:]))
    assert abs(exp[0] - 0.30103) < 1e-4


def test_conformal_interval_is_calibrated(spark):
    """Split-conformal guarantee, finite-sample form: per-group test
    coverage sits near the 0.9 target (generous band — small calib
    splits at sf0.001), and q_hat is a positive width."""
    from project_bigdata_recsys_spark.ml.classifier import conformal_interval_eval

    rows = conformal_interval_eval(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["q_hat_price"] > 0
        assert 0.7 <= r["coverage"] <= 1.0


def test_bradley_terry_ranks_by_strength(spark):
    """MM fixpoint sanity: ratings are sum-normalized to 1 at every
    iteration, every item has games, and the top-rated item is not
    winless."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.bradley_terry_ratings(spark, SF_SMALL).collect()
    assert len(rows) >= 2
    assert abs(sum(r["rating"] for r in rows) - 1.0) < 1e-3
    assert all(r["n_games"] > 0 for r in rows)
    assert rows[0]["n_wins"] > 0


def test_hits_authority_positive_and_ordered(spark):
    """Authorities are positive, mean-normalized (avg over FULL node
    set is 1, so top-k all sit above epsilon) and emitted in total
    order."""
    from project_bigdata_recsys_spark.functions import graph

    rows = graph.order_part_hits(spark, SF_SMALL).collect()
    assert rows and all(r["authority"] > 0 for r in rows)
    scores = [r["authority"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_kcore_peeling_is_monotone(spark):
    """Peeling can only shrink the graph, k is the p25 initial degree
    (positive), and round 1 strictly peels on this corpus."""
    from project_bigdata_recsys_spark.functions import graph

    rows = graph.kcore_profile(spark, SF_SMALL).collect()
    assert len(rows) == 6
    nodes = [r["n_nodes"] for r in rows]
    assert all(a >= b for a, b in zip(nodes, nodes[1:]))
    assert rows[0]["k"] > 0


def test_textrank_differs_from_raw_frequency(spark):
    """TextRank is a graph signal, not a count: ranks are positive and
    the result is capped at k with a total order."""
    from project_bigdata_recsys_spark.functions import graph

    rows = graph.textrank_keywords(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    assert all(r["rank"] > 0 for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_collocation_llr_nonnegative_and_capped(spark):
    """G² is a deviance: nonnegative, top-k under total order, and the
    margins always dominate the pair count."""
    from project_bigdata_recsys_spark.functions import text

    rows = text.collocation_llr(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["llr"] >= 0
        assert r["n_left"] >= r["n_pair"] and r["n_right"] >= r["n_pair"]


def test_phrase_search_counts_match_text(spark):
    """The positional-index join must agree with a direct recount of
    adjacent pairs in the winning document's raw text."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions import text

    rows = text.phrase_search(spark, SF_SMALL).collect()
    assert rows
    top = rows[0]
    w1, w2 = top["phrase"].split(" ")
    doc = (
        load_table(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id") == top["doc_id"])
        .collect()[0]["text"]
    )
    toks = [t for t in doc.split(" ") if t]
    direct = sum(
        1 for a, b in zip(toks, toks[1:]) if a == w1 and b == w2
    )
    assert direct == top["n_occurrences"]


def test_pinball_quantile_ordering(spark):
    """Order statistics are monotone in q, and the q50 predictor's
    pinball loss is the scaled MAE of the train median — never worse
    than the q10/q90 losses evaluated at their own asymmetry."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.pinball_quantile_eval(spark, SF_SMALL).collect()
    assert rows
    by_type: dict[str, dict] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q"]] = r
    for qs in by_type.values():
        assert set(qs) == {10, 50, 90}
        assert qs[10]["pred"] <= qs[50]["pred"] <= qs[90]["pred"]
        assert all(r["avg_pinball"] >= 0 for r in qs.values())


def test_wasserstein_bounded_by_range(spark):
    """W1 between distributions on [v_min, v_max] can never exceed the
    range; normalized form sits in [0, 1]."""
    from project_bigdata_recsys_spark.operators import quality

    r = quality.wasserstein_value_drift(spark, SF_SMALL).collect()[0]
    assert 0 <= r["w1"] <= (r["v_max"] - r["v_min"]) + 1e-9
    assert 0 <= r["w1_norm"] <= 1.0


def test_top_pc_is_dominant_direction(spark):
    """Power iteration lands on a positive eigenvalue, loadings are
    max-normalized (|max| == 1 component present), one row per dim."""
    from project_bigdata_recsys_spark.functions import similarity

    rows = similarity.embedding_top_pc(spark, SF_SMALL).collect()
    assert len(rows) == 64
    assert rows[0]["eigenvalue"] > 0
    assert max(abs(r["loading"]) for r in rows) == 1.0


def test_hashing_collisions_shrink_with_width(spark):
    """More buckets, fewer collisions — strictly decreasing on this
    corpus; term totals identical across widths."""
    from project_bigdata_recsys_spark.functions import text

    rows = text.hashing_collision_audit(spark, SF_SMALL).collect()
    assert [r["n_buckets"] for r in rows] == [256, 1024, 4096]
    assert len({r["n_terms"] for r in rows}) == 1
    fr = [r["term_collision_frac"] for r in rows]
    assert fr[0] > fr[1] > fr[2]


def test_absorption_monotone_in_steps(spark):
    """Hitting probabilities are monotone in the horizon, the target
    state is pinned at 1 throughout, and every state eventually has a
    path to purchase on this corpus."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.absorption_funnel_prob(spark, SF_SMALL).collect()
    by = {r["state"]: r for r in rows}
    assert by["purchase"]["p_hit_1"] == 1.0 == by["purchase"]["p_hit_6"]
    for r in rows:
        assert r["p_hit_1"] <= r["p_hit_3"] + 1e-9 <= r["p_hit_6"] + 2e-9
        assert r["p_hit_6"] > 0


def test_stream_benford_matches_batch_of_same_column(spark):
    """The streamed digit counts must equal a direct batch recount of
    the same value column — streaming adds no drift."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.streaming import replay

    streamed = {
        r["digit"]: r["observed"]
        for r in replay.stream_benford_values(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").filter(F.col("value") > 0)
    batch = {
        r["digit"]: r["n"]
        for r in ev.select(
            F.substring(
                F.round(F.col("value") * 100).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
        if r["digit"] >= 1
    }
    assert streamed == batch


def test_did_components_reconcile(spark):
    """The DiD estimate must equal the fold of its own reported group
    means, and the SE must be positive."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = experiments.did_lift_estimate(spark, SF_SMALL).collect()[0]
    manual = round(
        (r["mean_t_post"] - r["mean_t_pre"])
        - (r["mean_c_post"] - r["mean_c_pre"]),
        4,
    )
    assert abs(manual - r["did_estimate"]) < 1e-9
    assert r["se"] > 0


def test_sprt_path_is_cumulative(spark):
    """The LLR path is the running fold of per-day steps: recompute
    each day's increment from (n, k) and the embedded micro literals."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = experiments.sprt_ab_monitor(spark, SF_SMALL).collect()
    assert rows
    acc = 0
    for r in rows:
        acc += (
            r["k"] * experiments.SPRT_LA_MICRO
            + (r["n"] - r["k"]) * experiments.SPRT_LB_MICRO
        )
        assert abs(r["llr"] - round(acc / 1e6, 6)) < 1e-9
        expected = (
            "accept_h1"
            if acc >= experiments.SPRT_THRESH_MICRO
            else "accept_h0"
            if acc <= -experiments.SPRT_THRESH_MICRO
            else "continue"
        )
        assert r["decision"] == expected


def test_jl_audit_pair_count_and_mean(spark):
    """32 sampled vectors give exactly C(32,2)=496 pairs; the mean
    ratio sits in a sane band around the E[ratio]=1 JL guarantee for
    d_out=8 (wide tolerance — 8 dims is intentionally coarse)."""
    from project_bigdata_recsys_spark.functions import similarity

    r = similarity.jl_distortion_audit(spark, SF_SMALL).collect()[0]
    assert r["n_pairs"] == 496
    assert 0.5 <= r["mean_ratio"] <= 1.5
    assert r["min_ratio"] >= 0
    assert 0 < r["frac_within_20pct"] < 1


def test_mann_kendall_agrees_with_theil_sen_sign(spark):
    """When MK declares a trend at 5%, the Theil-Sen median slope must
    carry the same sign — the two robust-trend views cannot disagree
    on direction."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    mk = {
        r["event_type"]: r
        for r in analytics.mann_kendall_trend(spark, SF_SMALL).collect()
    }
    ts = {
        r["event_type"]: r["slope_per_day"]
        for r in analytics.theil_sen_trend(spark, SF_SMALL).collect()
    }
    assert set(mk) == set(ts)
    for et, r in mk.items():
        if r["trend"] == "increasing":
            assert ts[et] > 0
        elif r["trend"] == "decreasing":
            assert ts[et] < 0


def test_woe_iv_bins_partition_events(spark):
    """Ten equal-count-ish bins covering every event exactly once, and
    the IV total reconciles with the per-bin WoE fold."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.woe_iv_profile(spark, SF_SMALL).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    g = sum(r["n_good"] for r in rows)
    b = sum(r["n_bad"] for r in rows)
    manual = sum(
        ((r["n_good"] + 0.5) / (g + 5.0) - (r["n_bad"] + 0.5) / (b + 5.0))
        * r["woe"]
        for r in rows
    )
    assert abs(manual - rows[0]["iv_total"]) < 1e-4


def test_holt_weights_match_recursion(spark):
    """The embedded micro literals must equal a fresh run of the Holt
    recursion on unit-impulse series — the offline unrolling is
    re-derivable, not hand-tuned."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    W, alpha, beta = 28, 0.3, 0.1
    l = [0.0] * W
    b = [0.0] * W
    l[0] = 1.0
    for t in range(1, W):
        e = [0.0] * W
        e[t] = 1.0
        l_prev, b_prev = l[:], b[:]
        l = [
            alpha * e[i] + (1 - alpha) * (l_prev[i] + b_prev[i])
            for i in range(W)
        ]
        b = [
            beta * (l[i] - l_prev[i]) + (1 - beta) * b_prev[i]
            for i in range(W)
        ]
    assert [round(1e6 * x) for x in l] == analytics.HOLT_LEVEL_MICRO
    assert [round(1e6 * x) for x in b] == analytics.HOLT_TREND_MICRO
    assert sum(analytics.HOLT_LEVEL_MICRO) == 1_000_000
    assert sum(analytics.HOLT_TREND_MICRO) == 0


def test_stream_sprt_matches_batch(spark):
    """The streamed SPRT path must be row-identical to the batch
    monitor — same days, same llr, same decisions."""
    from project_bigdata_recsys_spark.operators import analytics, experiments
    from project_bigdata_recsys_spark.streaming import replay

    batch = [
        tuple(r) for r in experiments.sprt_ab_monitor(spark, SF_SMALL).collect()
    ]
    streamed = [
        tuple(r) for r in replay.stream_sprt_monitor(spark, SF_SMALL).collect()
    ]
    assert batch == streamed


def test_overdispersion_moments_exact(spark):
    """Dispersion index = var/mean of the zero-filled daily series —
    recomputed directly from the events table."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.overdispersion_profile(spark, SF_SMALL).collect()
    assert rows
    ev = load_table(spark, SF_SMALL, "events").collect()
    import collections

    days = collections.defaultdict(set)
    counts = collections.Counter()
    for e in ev:
        d = int(e["ts"].timestamp() // 86400)
        counts[(e["event_type"], d)] += 1
        days[e["event_type"]].add(d)
    for r in rows:
        et = r["event_type"]
        d0, d1 = min(days[et]), max(days[et])
        ys = [counts.get((et, d), 0) for d in range(d0, d1 + 1)]
        n = len(ys)
        mean = sum(ys) / n
        var = sum((y - mean) ** 2 for y in ys) / (n - 1)
        assert r["n_days"] == n
        assert abs(r["dispersion_index"] - var / mean) < 1e-3


def test_capture_recapture_recovers_population(spark):
    """Chapman's estimator from two independent 30% md5 captures must
    land within sampling error of the true distinct count (wide band —
    LP variance is large at this population size)."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = analytics.capture_recapture_estimate(spark, SF_SMALL).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    assert r["n_observed"] <= r["n_true"]
    assert 0.2 <= r["recovery_ratio"] <= 3.0


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    """Every shrunken rate sits strictly between its raw rate and the
    prior mean alpha/(alpha+beta) — the defining property of the
    beta-binomial posterior mean."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = experiments.eb_shrunk_rates(spark, SF_SMALL).collect()
    assert rows
    a, b = rows[0]["alpha"], rows[0]["beta"]
    pm = a / (a + b)
    for r in rows:
        lo, hi = sorted((r["raw_rate"], pm))
        assert lo - 1e-6 <= r["eb_rate"] <= hi + 1e-6


def test_sorted_neighborhood_finds_planted_variants(spark):
    """Every emitted pair verifies at Levenshtein <= 2, and the planted
    plural variants ARE found (each planted name differs from its
    original by exactly one trailing char and sorts adjacent)."""
    from project_bigdata_recsys_spark.functions import dedup

    rows = dedup.sorted_neighborhood_pairs(spark, SF_SMALL).collect()
    assert rows
    assert all(r["dist"] <= 2 for r in rows)
    assert any(
        r["name_b"] == r["name_a"] + "s" or r["name_a"] == r["name_b"] + "s"
        for r in rows
    )


def test_shapley_efficiency_axiom(spark):
    """Shapley values are efficient: they sum to v(grand coalition)
    minus v(empty set) — recomputed directly from per-user masks."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.shapley_channel_attribution(spark, SF_SMALL).collect()
    assert len(rows) == 4
    total = sum(r["shapley_value"] for r in rows)
    ev = load_table(spark, SF_SMALL, "events").collect()
    users: dict = {}
    for e in ev:
        m, c = users.get(e["user_id"], (0, 0))
        bit = {"click": 1, "view": 2, "signup": 4, "error": 8}.get(
            e["event_type"], 0
        )
        users[e["user_id"]] = (
            m | bit,
            max(c, 1 if e["event_type"] == "purchase" else 0),
        )
    import collections

    g = collections.defaultdict(list)
    for m, c in users.values():
        g[m].append(c)
    v15 = round(sum(g[15]) / len(g[15]), 6) if g.get(15) else 0.0
    v0 = round(sum(g[0]) / len(g[0]), 6) if g.get(0) else 0.0
    assert abs(total - (v15 - v0)) < 1e-3


def test_sequence_entropy_bounded(spark):
    """Conditional entropy sits in [0, ln(n_succ)], normalized form in
    [0, 1]; the modal next step is a real successor."""
    import math

    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.sequence_entropy_profile(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["entropy_nats"] <= math.log(r["n_succ"]) + 1e-6
        assert 0 <= r["entropy_normalized"] <= 1.0 + 1e-9
        assert r["modal_next"]


def test_join_order_advisor_estimates_exact_on_fks(spark):
    """On clean FK joins the containment estimate is EXACT for
    orders*lineitem (every lineitem has an order), so est_over_true
    must be 1.0 there; the recommendation matches the smaller
    estimate."""
    from project_bigdata_recsys_spark.operators import relational

    rows = {
        r["step"]: r
        for r in relational.join_order_advisor(spark, SF_SMALL).collect()
    }
    ol = rows["orders*lineitem"]
    assert abs(ol["est_over_true"] - 1.0) < 0.01
    co = rows["customer*orders"]
    expect = (
        "customer_first"
        if co["est_rows"] <= ol["est_rows"]
        else "lineitem_first"
    )
    assert co["recommended"] == expect == ol["recommended"]


def test_source_kl_nonnegative(spark):
    """KL(source || corpus) >= 0 by Gibbs' inequality (up to the 1e-6
    freeze), one row per source."""
    from project_bigdata_recsys_spark.functions import text

    rows = text.source_kl_divergence(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert all(r["kl_nats"] >= -1e-4 for r in rows)


def test_rake_phrases_contain_no_stopwords(spark):
    """Candidate phrases are stopword-free by construction, and every
    multi-word phrase outscores any of its single words' deg/freq
    lower bound of 1."""
    from project_bigdata_recsys_spark.functions import text

    rows = text.rake_keyphrases(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        ws = r["phrase"].split(" ")
        assert not set(ws) & {"the", "a", "of", "and"}
        assert r["rake_score"] >= len(ws)


def test_cv_ttest_folds_cover_all_orders(spark):
    """Five folds, every order scored exactly once, shared verdict."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.ml.classifier import cv_paired_ttest

    rows = cv_paired_ttest(spark, SF_SMALL).collect()
    assert len(rows) == 5
    total = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_test"] for r in rows) == total
    assert len({r["verdict"] for r in rows}) == 1


def test_vocab_cover_greedy_properties(spark):
    """Greedy gains are nonincreasing, coverage is nondecreasing, and
    no source is picked twice."""
    from project_bigdata_recsys_spark.functions import curation

    rows = curation.vocab_cover_sources(spark, SF_SMALL).collect()
    assert len(rows) == 5
    gains = [r["new_terms"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    cov = [r["covered_terms"] for r in rows]
    assert cov == sorted(cov)
    assert len({r["source"] for r in rows}) == 5


def test_largest_remainder_sums_to_budget(spark):
    """Hamilton apportionment: seats sum EXACTLY to the budget, every
    source gets floor(quota) or floor(quota)+1 (quota-rule)."""
    import math

    from project_bigdata_recsys_spark.functions import curation

    rows = curation.largest_remainder_allocation(spark, SF_SMALL).collect()
    assert sum(r["seats"] for r in rows) == 1000
    for r in rows:
        assert r["seats"] in (
            math.floor(r["quota"]),
            math.floor(r["quota"]) + 1,
        )


def test_markov_removal_effects_valid(spark):
    """Removing any channel can only hurt conversion (effects in
    (0, 1]), base probability is shared, and attribution shares sum
    to 1."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.markov_removal_attribution(spark, SF_SMALL).collect()
    assert len(rows) == 4
    assert len({r["base_conv_prob"] for r in rows}) == 1
    for r in rows:
        assert 0 < r["removal_effect"] <= 1
        assert r["conv_prob_without"] < r["base_conv_prob"]
    assert abs(sum(r["attribution_share"] for r in rows) - 1.0) < 2e-3


def test_changepoint_slopes_reconcile_with_cusum(spark):
    """The segmented readout localizes at the SAME peak the shared
    CUSUM kernel reports on the zero-filled grid, and segment day
    counts tile the full range."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.changepoint_slopes(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_days_before"] >= 1
        assert r["n_days_before"] + r["n_days_after"] >= 2
        assert abs(
            r["slope_change"] - round(r["slope_after"] - r["slope_before"], 6)
        ) < 1e-9


def test_aa_calibration_null_experiments(spark):
    """Twenty null splits: every z is finite, the false-positive rate
    stays within a generous binomial band of 5%, and summary columns
    are shared."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = experiments.aa_test_calibration(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert len({(r["fp_rate"], r["mean_z"], r["var_z"]) for r in rows}) == 1
    assert rows[0]["fp_rate"] <= 0.3
    manual_fp = sum(r["false_positive"] for r in rows) / 20
    assert abs(manual_fp - rows[0]["fp_rate"]) < 1e-9


def test_quantile_normalization_collapses_spread(spark):
    """After mapping to pooled order statistics the cross-source mean
    spread must shrink (that is the point of the correction)."""
    from project_bigdata_recsys_spark.functions import curation

    rows = curation.quantile_normalize_profile(spark, SF_SMALL).collect()
    assert rows
    assert rows[0]["post_spread"] <= rows[0]["pre_spread"]


def test_spearman_matches_scipy_free_reference(spark):
    """Recompute Spearman with pure-Python midranks from raw events —
    the engine's integer double-rank fold must agree to 1e-6."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = analytics.spearman_user_metrics(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").collect()
    agg: dict = {}
    for e in ev:
        a, b = agg.get(e["user_id"], (0, 0))
        agg[e["user_id"]] = (a + 1, b + round(e["value"] * 100))
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2 + 1
            for k in range(i, j + 1):
                out[order[k]] = mr
            i = j + 1
        return out

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert abs(r["spearman_rho"] - num / den) < 1e-6
    assert r["n_users"] == n


def test_price_elasticity_r2_bounded(spark):
    """R-squared sits in [0, 1] and every type has enough parts for a
    slope."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.price_elasticity(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_parts"] >= 2
        assert 0 <= r["r_squared"] <= 1.0 + 1e-9


def test_doubly_robust_near_naive_under_randomization(spark):
    """With a true md5 coin, DR and naive diff-in-means estimate the
    same (null) effect — they must agree within a small band, and both
    mu estimates stay near the population mean."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = experiments.doubly_robust_ate(spark, SF_SMALL).collect()[0]
    assert abs(r["ate_dr"] - r["ate_naive"]) <= max(
        0.25 * abs(r["ate_naive"]), 1.0
    )
    assert r["mu1_dr"] > 0 and r["mu0_dr"] > 0


def test_pps_ht_estimator_close_to_truth(spark):
    """Horvitz-Thompson from a ~5% PPS sample must land within 25% of
    the exact total (HT variance on this size-skew is small because
    big orders enter with high probability)."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = experiments.pps_horvitz_thompson(spark, SF_SMALL).collect()[0]
    assert 0 < r["n_sampled"] < r["n_pop"]
    assert abs(r["rel_err"]) < 0.25


def test_seasonal_indices_average_to_one(spark):
    """Weighted by day counts, the seasonal indices of each type must
    average to exactly 1 (the multiplicative-decomposition identity),
    and all seven weekdays are present."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.seasonal_indices(spark, SF_SMALL).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(r)
    for et, rs in by.items():
        assert len(rs) == 7
        nt = sum(r["n_days"] for r in rs)
        wavg = sum(r["seasonal_index"] * r["n_days"] for r in rs) / nt
        assert abs(wavg - 1.0) < 1e-2


def test_burstiness_content_words_under_poisson(spark):
    """Every term's df can never exceed min(tf, D); expected_df is
    positive; at least one high-frequency term shows sub-Poisson df
    (burstiness exists in any natural-ish corpus)."""
    from project_bigdata_recsys_spark.functions import text

    rows = text.term_burstiness(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["df"] <= r["tf"]
        assert r["expected_df"] > 0
    assert any(r["df_ratio"] < 1.0 for r in rows)


def test_stream_holt_matches_batch(spark):
    """The streamed Holt backtest must be row-identical to the batch
    operator — same kernel, same literals, same numbers."""
    from project_bigdata_recsys_spark.operators import analytics, experiments
    from project_bigdata_recsys_spark.streaming import replay

    batch = [
        tuple(r)
        for r in analytics.holt_forecast_eval(spark, SF_SMALL).collect()
    ]
    streamed = [
        tuple(r)
        for r in replay.stream_holt_forecast(spark, SF_SMALL).collect()
    ]
    assert batch == streamed


def test_bh_stepup_is_contiguous_and_thresholds_rederive(spark):
    """Rejections are exactly ranks 1..k* (never a gap), and the
    embedded boundaries re-derive from the inverse normal CDF."""
    from statistics import NormalDist

    from project_bigdata_recsys_spark.operators import quality

    nd = NormalDist()
    for k, zmicro in quality.BH_Z_MICRO:
        assert round(1e6 * nd.inv_cdf(1 - (0.1 * k / 5) / 2)) == zmicro
    rows = quality.bh_fdr_correction(spark, SF_SMALL).collect()
    assert len(rows) == 5
    flags = [r["drift_rejected"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert flags == sorted(flags, reverse=True)


def test_icc_explains_aa_clustering(spark):
    """ICC sits in [0, 1); design effect >= 1 and reconciles with its
    own formula from the reported columns."""
    from project_bigdata_recsys_spark.operators import analytics, experiments

    r = experiments.icc_profile(spark, SF_SMALL).collect()[0]
    assert 0 <= r["icc"] < 1
    assert r["design_effect"] >= 1
    manual = round(1.0 + (r["avg_cluster_size"] - 1.0) * r["icc"], 2)
    assert abs(manual - round(r["design_effect"], 2)) < 0.02


def test_mde_shrinks_with_sample_size(spark):
    """MDE scales as 1/sqrt(n): doubling logs are monotone, and the z
    literals re-derive from the inverse normal CDF."""
    from statistics import NormalDist

    from project_bigdata_recsys_spark.operators import analytics, experiments

    nd = NormalDist()
    assert round(1e6 * nd.inv_cdf(0.975)) == experiments.MDE_Z_ALPHA_MICRO
    assert round(1e6 * nd.inv_cdf(0.8)) == experiments.MDE_Z_BETA_MICRO
    rows = experiments.mde_power_analysis(spark, SF_SMALL).collect()
    ordered = sorted(rows, key=lambda r: r["n_per_arm"])
    mdes = [r["mde_abs"] for r in ordered]
    assert mdes == sorted(mdes, reverse=True)
    assert sum(r["is_observed_n"] for r in rows) == 1


def test_session_sweep_monotone_in_gap(spark):
    """A larger inactivity gap can only merge sessions: session counts
    are nonincreasing and events-per-session nondecreasing in the
    gap."""
    from project_bigdata_recsys_spark.operators import windows

    rows = windows.session_gap_sweep(spark, SF_SMALL).collect()
    assert [r["gap_minutes"] for r in rows] == [10, 30, 60]
    ns = [r["n_sessions"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    ev = [r["avg_events_per_session"] for r in rows]
    assert ev == sorted(ev)


def test_freshness_anchor_is_corpus_max(spark):
    """Exactly one segment sits at lag 0 (the high-water mark) and
    every lag is nonnegative."""
    from project_bigdata_recsys_spark.operators import quality

    rows = quality.freshness_audit(spark, SF_SMALL).collect()
    assert rows
    assert min(r["lag_hours"] for r in rows) == 0.0
    assert all(r["lag_hours"] >= 0 for r in rows)


def test_stream_mann_kendall_matches_batch(spark):
    """Streamed MK verdict row-identical to the batch test."""
    from project_bigdata_recsys_spark.operators import analytics, experiments
    from project_bigdata_recsys_spark.streaming import replay

    batch = [
        tuple(r)
        for r in analytics.mann_kendall_trend(spark, SF_SMALL).collect()
    ]
    streamed = [
        tuple(r)
        for r in replay.stream_mann_kendall(spark, SF_SMALL).collect()
    ]
    assert batch == streamed


def test_negbin_reduces_to_poisson_when_underdispersed(spark):
    """Where var <= mean the profile reports the Poisson limit (r=0,
    p=1, p0=e^-mean); where overdispersed, the NB zero fraction must
    exceed the Poisson one (the defining clumping signature)."""
    import math

    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.negbin_fit_profile(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r["var_daily"] <= r["mean_daily"]:
            assert r["nb_r"] == 0.0 and r["nb_p"] == 1.0
            assert abs(
                r["p0_fitted"] - round(math.exp(-r["mean_daily"]), 4)
            ) < 1e-9
        else:
            assert r["p0_fitted"] >= round(
                math.exp(-r["mean_daily"]), 4
            ) - 1e-9


def test_vmeasure_bounds_and_identity(spark):
    """Entropies satisfy H(joint) <= H(lang) + H(source) with equality
    iff independent; homogeneity/completeness/V all in [0, 1]."""
    from project_bigdata_recsys_spark.operators import quality

    r = quality.lang_source_vmeasure(spark, SF_SMALL).collect()[0]
    assert r["h_joint"] <= r["h_lang"] + r["h_source"] + 1e-6
    for c in ("homogeneity", "completeness", "v_measure"):
        assert -1e-6 <= r[c] <= 1.0 + 1e-6


def test_theil_zero_iff_equal_and_bounded(spark):
    """Theil-T is nonnegative and bounded by ln(n_users); the overall
    row aggregates every user once."""
    import math

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import analytics, experiments

    rows = analytics.theil_inequality_index(spark, SF_SMALL).collect()
    by = {r["segment"]: r for r in rows}
    assert "__all__" in by
    n_users = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert by["__all__"]["n_users"] == n_users
    for r in rows:
        assert -1e-6 <= r["theil_t"] <= math.log(r["n_users"]) + 1e-6
