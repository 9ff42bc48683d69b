"""Experimentation & causal-inference operators.

Moved verbatim out of operators/analytics.py (r13 verdict task 3 —
the module had grown past the 4,000-line target); this is the
causal/experimentation seam: A/B lift and its variance-reduction
(CUPED), anytime-valid monitoring (SPRT), calibration (A/A),
allocation and power planning (Neyman, MDE, ICC), observational
estimators (difference-in-differences, doubly-robust ATE, exact
matching), design-based estimation (PPS Horvitz-Thompson,
capture-recapture lives with its profile family), empirical-Bayes
shrinkage, and the bootstrap CI kernel its streaming twin folds into.
Registration sites in plans/queries.py reference this module directly
— no re-export shim in analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed
from project_bigdata_recsys_spark.operators.analytics import POISSON1_CDF  # noqa: F401

# SPRT log-likelihood micro literals for H0 p=0.18 vs H1 p=0.22 —
# computed once from exact rationals and embedded in BOTH engines
# (the EWMA_WEIGHTS_MICRO discipline):
#   la = round(1e6 * ln(0.22/0.18)), lb = round(1e6 * ln(0.78/0.82))
SPRT_LA_MICRO = 200671
SPRT_LB_MICRO = -50010
SPRT_THRESH_MICRO = 2944439  # round(1e6 * ln(0.95/0.05))

# two-sided alpha=0.05 and power=0.80 normal quantiles, offline
# (SQL has no inverse CDF — the BH_Z_MICRO discipline)
MDE_Z_ALPHA_MICRO = 1959964
MDE_Z_BETA_MICRO = 841621


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users assigned to control/treatment by a
    deterministic md5 coin (the hash_uniform discipline — assignment is
    a pure function of the user id, the property a real experiment
    framework needs for idempotent re-reads), then per-arm conversion
    (any purchase) and value-per-user with absolute and relative lift.
    Counts and cent-exact value sums only — every number reproduces in
    the oracle."""
    events = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    per_user = (
        events.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 1000000).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("micros"),
        )
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias(
                "conversion_rate"
            ),
            F.round(
                sum_fixed("micros", sf_dir=sf_dir) / F.count(F.lit(1)) / 1000000.0, 4
            ).alias("value_per_user"),
        )
        .orderBy("arm")
    )


def bootstrap_ci_mean(
    spark: SparkSession, sf_dir: str, n_replicas: int = 200
) -> DataFrame:
    """Distributed bootstrap confidence interval for the per-segment
    mean — via the POISSON bootstrap (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams"): instead of resampling the
    corpus B times (B shuffles, undistributable), every row draws an
    independent Poisson(1) replica weight per replica, so ALL B
    replicas fold in ONE aggregation pass — the only bootstrap that
    survives 100 TB.

    Reproducibility: the per-(row, replica) draw is the md5-uniform
    recipe on (event_id, b) pushed through the frozen 12-dp Poisson(1)
    inverse-CDF table (POISSON1_CDF — the integer-literal discipline),
    values lift to integer cents, and each replica mean is the same
    int/int double division in both engines; the percentile pick is a
    rank over the B replica means per segment (windows partition by
    segment; B is a constant).

    Output per event_type: n, mean (point estimate), ci_lo, ci_hi
    (2.5th/97.5th replica-mean percentiles), ci_width."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    reps = ev.select(
        "event_type",
        "vc",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1))).alias("b"),
        F.col("event_id"),
    )
    u = hash_uniform(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit("_"),
            F.col("b").cast("string"),
        ),
        "boot:",
    )
    w = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    weighted = reps.select(
        "event_type", "b", w.alias("w"), (w * F.col("vc")).alias("wv")
    )
    replica_sums = weighted.groupBy("event_type", "b").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum("wv").cast("long").alias("swv"),
    )
    point = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("vc").cast("long") / F.count(F.lit(1)) / 100.0, 6
        ).alias("mean"),
    )
    return bootstrap_ci_readout(replica_sums, point, n_replicas)


def bootstrap_ci_readout(
    replica_sums: DataFrame, point: DataFrame, n_replicas: int = 200
) -> DataFrame:
    """Shared readout of the Poisson bootstrap — takes the per-(segment,
    replica) EXACT integer weight/weighted-value sums (the state a
    streaming twin keeps: integer partials merge order-independently)
    plus the per-segment point-estimate frame, and emits the CI.
    Shared by :func:`bootstrap_ci_mean` and replay.stream_bootstrap_ci,
    so the streamed interval is bit-identical to the batch one."""
    from pyspark.sql import Window

    replica_means = replica_sums.select(
        "event_type",
        "b",
        (F.col("swv") / F.col("sw").cast("double")).alias("m_b"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("m_b", "b")
    ranked = replica_means.withColumn(
        "rk", F.row_number().over(w_rank)
    )
    lo_rk = max(1, int(round(n_replicas * 0.025)))
    hi_rk = int(round(n_replicas * 0.975))
    bounds = ranked.groupBy("event_type").agg(
        F.round(
            F.max(F.when(F.col("rk") == lo_rk, F.col("m_b"))) / 100.0, 6
        ).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("rk") == hi_rk, F.col("m_b"))) / 100.0, 6
        ).alias("ci_hi"),
    )
    return (
        point.join(bounds, "event_type")
        .select(
            "event_type",
            "n",
            "mean",
            "ci_lo",
            "ci_hi",
            F.round(F.col("ci_hi") - F.col("ci_lo"), 6).alias("ci_width"),
        )
        .orderBy("event_type")
    )


def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout — the modern experimentation
    standard beside :func:`ab_test_lift`'s raw comparison: each user's
    PRE-period value (the early half) is a covariate X that explains
    away noise in the outcome Y (late-half value); the adjusted metric
    Y − θ(X − X̄) with θ = cov(X,Y)/var(X) has the same expectation and
    strictly less variance (Deng et al. 2013), so the same corpus
    detects smaller effects.

    Everything derives from integer-cent moment folds (n, ΣX, ΣY, ΣXX,
    ΣXY, ΣYY pooled + per arm): θ, both arms' raw and adjusted means,
    and the variance-reduction ratio are identical-shape double
    expressions over those exact integers — no per-row adjusted value
    is ever materialized (the algebra collapses mean(Y−θ(X−X̄)) to
    Ȳ_arm − θ(X̄_arm − X̄)).

    Scale: one per-user aggregation, one 2-row arm fold, one broadcast
    1-row pooled-moment frame.

    Output per arm: n_users, mean_y, mean_y_cuped, theta,
    var_reduction."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    anchor = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0)
        .cast("long")
        .alias("__mid")
    )
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the per-user (x, y) frame feeds the pooled moments AND
    # the per-arm rollup — unmaterialized, each re-ran the fact scan +
    # per-user aggregation (guide §5).  |users| × 4 narrow columns.
    per_user = persist_tracked(
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.sum(
                F.when(F.col("day") <= F.col("__mid"), F.col("vc")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("day") > F.col("__mid"), F.col("vc")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("y"),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("x").cast("long").alias("__sx"),
        F.sum("y").cast("long").alias("__sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("__sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("__sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("__syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("__ax"),
        F.sum("y").cast("long").alias("__ay"),
    )
    n = F.col("__n").cast("double")
    cov_n = n * F.col("__sxy") - F.col("__sx").cast("double") * F.col("__sy")
    var_x_n = n * F.col("__sxx") - F.col("__sx").cast("double") * F.col(
        "__sx"
    )
    var_y_n = n * F.col("__syy") - F.col("__sy").cast("double") * F.col(
        "__sy"
    )
    theta = cov_n / var_x_n
    mean_x = F.col("__sx") / n
    joined = arms.crossJoin(F.broadcast(pooled))
    mean_y_arm = F.col("__ay") / F.col("n_users").cast("double")
    mean_x_arm = F.col("__ax") / F.col("n_users").cast("double")
    return joined.select(
        "arm",
        "n_users",
        F.round(mean_y_arm / 100.0, 6).alias("mean_y"),
        F.round(
            (mean_y_arm - theta * (mean_x_arm - mean_x)) / 100.0, 6
        ).alias("mean_y_cuped"),
        F.round(theta, 6).alias("theta"),
        F.round(
            1.0
            - (var_y_n - 2.0 * theta * cov_n + theta * theta * var_x_n)
            / var_y_n,
            6,
        ).alias("var_reduction"),
    ).orderBy("arm")


def neyman_allocation_plan(
    spark: SparkSession, sf_dir: str, budget: int = 1000
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — given a sampling
    budget, each stratum gets n_h ∝ N_h·S_h (size × std), the
    allocation minimizing the stratified-mean variance (the design
    step BEFORE :func:`stratified_sample_query` draws anything; equal
    or proportional allocation wastes budget on homogeneous strata).

    The weight N_h·S_h freezes to integer 1e-6 units per STRATUM before
    the total-weight fold (5 doubles summed in arbitrary order would be
    engine-divergent; 5 integers cannot be), so allocations are exact
    integer arithmetic over frozen weights.

    Output per stratum: n_rows, std (4 dp), weight_micro, alloc_n."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("vc").cast("long").alias("__s"),
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("__ss"),
    )
    nn = F.col("n_rows").cast("double")
    std = F.sqrt(
        (F.col("__ss") - F.col("__s") * (F.col("__s") / nn)) / (nn - 1.0)
    )
    weighted = moments.select(
        "event_type",
        "n_rows",
        F.round(std / 100.0, 4).alias("std"),
        F.round(F.col("n_rows") * std * 10000.0).cast("long").alias(
            "weight_micro"
        ),
    )
    total = weighted.agg(
        F.sum("weight_micro").cast("long").alias("__tw")
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n_rows",
            "std",
            "weight_micro",
            F.round(
                F.lit(float(budget))
                * F.col("weight_micro")
                / F.col("__tw")
            )
            .cast("long")
            .alias("alloc_n"),
        )
        .orderBy("event_type")
    )


def did_lift_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences lift estimate — the observational
    complement of ab_test_lift/cuped_adjusted_lift for when treatment
    turns ON at a point in time instead of being randomized per user:
    arms from the deterministic md5 coin, periods split at the integer
    midpoint day, DiD = (T_post − T_pre) − (C_post − C_pre) on mean
    event value, with the large-sample SE from the four group variances
    (parallel-trends caveat documented — this is the estimator, the
    design assumption stays the analyst's).

    Exactness: one aggregation to four (arm, period) groups of BIGINT
    cent moments (n, Σc, Σc²); means rounded to 4 dp before the DiD
    fold; per-group variance terms frozen to micro units before the SE
    sum (4 values, fixed order)."""
    from project_bigdata_recsys_spark.functions.dedup import hash32

    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("double") / 86400).cast(
        "long"
    )
    base = ev.select(
        (hash32(F.col("user_id").cast("string"), "did:") % 2).alias("arm"),
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = base.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0).cast("long").alias("mid")
    )
    groups = (
        base.crossJoin(F.broadcast(anchor))
        .select(
            "arm",
            F.when(F.col("day") <= F.col("mid"), F.lit("pre"))
            .otherwise(F.lit("post"))
            .alias("period"),
            "cents",
        )
        .groupBy("arm", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
        )
    )
    m = F.round(F.col("s") / 100.0 / F.col("n"), 4)
    var_term = F.round(
        F.lit(1_000_000.0)
        * (F.col("ss") - F.col("s") * (F.col("s") / F.col("n").cast("double")))
        / (F.col("n") - 1.0)
        / 10_000.0
        / F.col("n"),
    ).cast("long")
    wide = groups.select(
        F.concat(
            F.when(F.col("arm") == 1, F.lit("t")).otherwise(F.lit("c")),
            F.lit("_"),
            F.col("period"),
        ).alias("g"),
        m.alias("mean_v"),
        var_term.alias("vt"),
        F.col("n"),
    )
    agg = wide.groupBy().pivot(
        "g", ["t_pre", "t_post", "c_pre", "c_post"]
    ).agg(
        F.first("mean_v").alias("m"),
        F.first("vt").alias("vt"),
        F.first("n").alias("n"),
    )
    did = F.round(
        (F.col("t_post_m") - F.col("t_pre_m"))
        - (F.col("c_post_m") - F.col("c_pre_m")),
        4,
    )
    se = F.round(
        F.sqrt(
            (
                F.col("t_post_vt")
                + F.col("t_pre_vt")
                + F.col("c_post_vt")
                + F.col("c_pre_vt")
            )
            / 1e6
        ),
        4,
    )
    return agg.select(
        F.col("t_pre_n").alias("n_t_pre"),
        F.col("t_post_n").alias("n_t_post"),
        F.col("c_pre_n").alias("n_c_pre"),
        F.col("c_post_n").alias("n_c_post"),
        F.col("t_pre_m").alias("mean_t_pre"),
        F.col("t_post_m").alias("mean_t_post"),
        F.col("c_pre_m").alias("mean_c_pre"),
        F.col("c_post_m").alias("mean_c_post"),
        did.alias("did_estimate"),
        se.alias("se"),
        F.round(did / se, 4).alias("z_score"),
    )


def sprt_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT as a daily conversion monitor: the sequential test
    that lets an experiment stop EARLY with controlled error — the
    anytime-valid complement of the fixed-horizon readouts
    (ab_test_lift, welch/cuped): per day, purchases k of events n fold
    k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) into a running
    log-likelihood path; crossing +ln((1−β)/α) accepts H1 (conversion
    ≥ 22%), −ln((1−β)/α) accepts H0 (≤ 18%), else continue.

    Exactness: the two log terms are precomputed micro-integer
    LITERALS embedded identically in both engines, so the entire path
    is a BIGINT cumsum — no float folds anywhere; the decision is an
    integer comparison.

    Scale: the fact table reduces to #days rows; the path cumsum is
    the only unpartitioned window and covers that bounded frame
    (audited in _GLOBAL_WINDOW_AUDITED)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
            (F.col("event_type") == "purchase").cast("int").alias("conv"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("conv").cast("long").alias("k"),
        )
    )
    return sprt_path_from_daily(daily)


def sprt_path_from_daily(daily: DataFrame) -> DataFrame:
    """Shared SPRT readout over a (day, n, k) frame — the kernel behind
    :func:`sprt_ab_monitor` and its streaming twin
    (replay.stream_sprt_monitor): BIGINT cumsum of the micro-literal
    log-likelihood steps, integer threshold decisions."""
    from pyspark.sql import Window

    step = (
        F.col("k") * SPRT_LA_MICRO
        + (F.col("n") - F.col("k")) * SPRT_LB_MICRO
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    path = daily.withColumn(
        "llr_micro", F.sum(step).over(w).cast("long")
    )
    return path.select(
        "day",
        "n",
        "k",
        F.round(F.col("llr_micro") / 1e6, 6).alias("llr"),
        F.when(F.col("llr_micro") >= SPRT_THRESH_MICRO, F.lit("accept_h1"))
        .when(F.col("llr_micro") <= -SPRT_THRESH_MICRO, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("day")


def eb_shrunk_rates(
    spark: SparkSession, sf_dir: str, k: int = 15
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-user conversion
    rates — the estimator that fixes the "3-event user with 1 purchase
    ranks above a 300-event power user" pathology in every top-K rate
    ranking: a method-of-moments Beta(α, β) prior is fit from the
    per-user rate distribution, and each user's rate shrinks to
    (k_u + α)/(n_u + α + β).  Top-k users by shrunken rate, with the
    raw rate alongside to show the shrinkage.

    Exactness: per-user (n, k) are BIGINTs; the MoM moments fold
    micro-frozen per-user rates (exact sums); α/β are computed from
    the 6-dp-rounded moments identically on both engines, rounded to 4
    dp before the per-user shrink, so the final rates hash-check.

    Scale: one scan to per-user counts, one tiny moment aggregation
    broadcast back, TakeOrdered top-k."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("conv"),
    )
    rate_micro = F.round(F.lit(1_000_000.0) * F.col("conv") / F.col("n")).cast(
        "long"
    )
    moments = per_user.select(rate_micro.alias("rm")).agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("rm").cast("long").alias("s1"),
        F.sum(F.col("rm") * F.col("rm")).cast("long").alias("s2"),
    )
    mu = F.round(F.col("s1") / 1e6 / F.col("nu"), 6)
    varr = F.round(
        (F.col("s2") / 1e12 - F.col("nu") * mu * mu)
        / (F.col("nu") - 1.0),
        6,
    )
    common = mu * (1 - mu) / varr - 1
    alpha = F.round(mu * common, 4)
    beta = F.round((1 - mu) * common, 4)
    prior = moments.select(alpha.alias("alpha"), beta.alias("beta"))
    shrunk = per_user.crossJoin(F.broadcast(prior)).select(
        "user_id",
        "n",
        "conv",
        F.round(F.col("conv") / F.col("n"), 4).alias("raw_rate"),
        "alpha",
        "beta",
        F.round(
            (F.col("conv") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("eb_rate"),
    )
    return shrunk.orderBy(
        F.desc("eb_rate"), F.asc("user_id")
    ).limit(k)


def aa_test_calibration(
    spark: SparkSession, sf_dir: str, n_splits: int = 20
) -> DataFrame:
    """A/A-test calibration of the experimentation stack: run
    ``n_splits`` INDEPENDENT md5 null experiments (both "arms" draw
    from the same population, so every detected lift is a false
    positive) and report each split's Welch z plus the calibration
    summary — fraction flagged at 1.96 (should be ≈ 0.05) and the
    mean/variance of z (should be ≈ 0/1).  This is the platform QA
    that catches broken bucketing, clustered users, or variance
    formulas gone wrong BEFORE anyone trusts a real A/B readout
    (ab_test_lift / welch_ttest_drift / cuped_adjusted_lift all lean
    on exactly this machinery).

    Exactness: one fact scan explodes each event into its n_splits
    assignments; per-(split, arm) BIGINT cent moments; each z is one
    closed-form Welch fold rounded to 4 dp; summary moments fold the
    micro-frozen z values.

    Scale: the x n_splits fan-out is a narrow map; the aggregation
    lands on 2·n_splits rows."""
    from project_bigdata_recsys_spark.functions.dedup import hash32

    ev = load_table(spark, sf_dir, "events")
    reps = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_splits - 1))
        ).alias("split_id"),
    )
    arm = (
        hash32(
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.col("split_id")
            ),
            "aa:",
        )
        % 2
    )
    cells = reps.groupBy("split_id", arm.alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    var = (
        F.col("ss") - F.col("s") * (F.col("s") / F.col("n").cast("double"))
    ) / (F.col("n") - 1.0)
    sides = cells.select(
        "split_id",
        "arm",
        F.col("n"),
        mean.alias("m"),
        var.alias("v"),
    )
    t = sides.filter(F.col("arm") == 1).select(
        "split_id",
        F.col("n").alias("nt"),
        F.col("m").alias("mt"),
        F.col("v").alias("vt"),
    )
    c = sides.filter(F.col("arm") == 0).select(
        "split_id",
        F.col("n").alias("nc"),
        F.col("m").alias("mc"),
        F.col("v").alias("vc"),
    )
    z = F.round(
        (F.col("mt") - F.col("mc"))
        / F.sqrt(F.col("vt") / F.col("nt") + F.col("vc") / F.col("nc")),
        4,
    )
    per_split = t.join(c, "split_id").select(
        "split_id",
        "nt",
        "nc",
        z.alias("z_score"),
        (F.abs(z) > 1.96).cast("int").alias("false_positive"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    per_split = persist_tracked(per_split)
    zmicro = F.round(F.col("z_score") * 1e4).cast("long")
    summary = per_split.agg(
        F.round(F.sum("false_positive") / F.count(F.lit(1)), 4).alias(
            "fp_rate"
        ),
        F.round(F.sum(zmicro) / 1e4 / F.count(F.lit(1)), 4).alias("mean_z"),
        F.round(
            (
                F.sum(zmicro * zmicro) / 1e8
                - F.count(F.lit(1))
                * (F.sum(zmicro) / 1e4 / F.count(F.lit(1)))
                * (F.sum(zmicro) / 1e4 / F.count(F.lit(1)))
            )
            / (F.count(F.lit(1)) - 1.0),
            4,
        ).alias("var_z"),
    )
    return (
        per_split.crossJoin(F.broadcast(summary))
        .orderBy("split_id")
    )


def doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust (AIPW) average-treatment-effect estimate — the
    modern default causal estimator that completes the family
    (ab_test_lift: naive diff; cuped: variance reduction; ips_eval:
    pure reweighting; did: time designs): outcome models m₁/m₀ and a
    propensity e are all estimated per event-type stratum, and
    μₜ = mean[ mₜ(x) + 1{T=t}·(y − mₜ(x))/P(T=t|x) ] stays consistent
    if EITHER the outcome model or the propensity is right.

    Exactness: strata models are 6-dp-rounded means of BIGINT cent
    moments (a broadcast #types-row frame); each row's AIPW term is
    micro-frozen from identical doubles on both engines before the
    exact integer sum; one division at the readout.

    Scale: one scan builds the strata table, one scan folds the
    correction terms; no windows."""
    from project_bigdata_recsys_spark.functions.dedup import hash32

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("y"),
        (hash32(F.col("user_id").cast("string"), "dr:") % 2).alias("t"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = persist_tracked(ev)
    strata = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t").cast("long").alias("nt"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("st"),
            F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("sc"),
        )
        .select(
            "event_type",
            F.round(F.col("nt") / F.col("n").cast("double"), 6).alias("e"),
            F.round(F.col("st") / F.col("nt").cast("double"), 6).alias("m1"),
            F.round(
                F.col("sc") / (F.col("n") - F.col("nt")).cast("double"), 6
            ).alias("m0"),
        )
    )
    scored = ev.join(F.broadcast(strata), "event_type")
    term1 = F.round(
        F.lit(1_000_000.0)
        * (
            F.col("m1")
            + F.col("t") * (F.col("y") - F.col("m1")) / F.col("e")
        )
    ).cast("long")
    term0 = F.round(
        F.lit(1_000_000.0)
        * (
            F.col("m0")
            + (1 - F.col("t"))
            * (F.col("y") - F.col("m0"))
            / (1 - F.col("e"))
        )
    ).cast("long")
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("n_treat"),
        F.sum(term1).cast("long").alias("s1"),
        F.sum(term0).cast("long").alias("s0"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("syt"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("syc"),
    )
    mu1 = F.col("s1") / 1e6 / F.col("n") / 100.0
    mu0 = F.col("s0") / 1e6 / F.col("n") / 100.0
    naive = (
        F.col("syt") / F.col("n_treat").cast("double")
        - F.col("syc") / (F.col("n") - F.col("n_treat")).cast("double")
    ) / 100.0
    return agg.select(
        "n",
        "n_treat",
        F.round(naive, 4).alias("ate_naive"),
        F.round(mu1, 4).alias("mu1_dr"),
        F.round(mu0, 4).alias("mu0_dr"),
        F.round(mu1 - mu0, 4).alias("ate_dr"),
    )


def pps_horvitz_thompson(
    spark: SparkSession, sf_dir: str, frac: float = 0.05
) -> DataFrame:
    """Probability-proportional-to-size sampling with the
    Horvitz-Thompson total estimator: orders enter the sample with
    inclusion probability π ∝ their price (md5-uniform draw, so the
    sample is a pure function of the data), and Σ y/π over the sample
    estimates the exact population revenue — the unbiased-by-design
    sampling machinery a pipeline uses to price full-scan questions
    from a 5% read, shipped WITH its own validation column (the exact
    total and the relative error).

    Exactness: π = least(1, target·size/total) from exact integer cent
    sums — identical doubles both engines; each sampled contribution
    is frozen to integer cents before the exact sum.

    Scale: two scans (one total, one sample fold); no windows."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tot = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum("cents").cast("long").alias("s_all"),
    )
    base = orders.crossJoin(F.broadcast(tot)).select(
        "o_orderkey",
        "cents",
        "n_pop",
        "s_all",
        F.least(
            F.lit(1.0),
            F.round(F.col("n_pop") * frac).cast("long")
            * F.col("cents")
            / F.col("s_all").cast("double"),
        ).alias("pi"),
        hash_uniform(F.col("o_orderkey"), "pps:").alias("u"),
    )
    sampled = base.filter(F.col("u") < F.col("pi"))
    est = sampled.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum(
            F.round(F.col("cents") / F.col("pi")).cast("long")
        ).cast("long").alias("ht_cents"),
    )
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "n_pop",
            "n_sampled",
            F.round(F.col("s_all") / 100.0, 2).alias("true_total"),
            F.round(F.col("ht_cents") / 100.0, 2).alias("ht_estimate"),
            F.round(
                F.col("ht_cents") / F.col("s_all").cast("double") - 1.0, 6
            ).alias("rel_err"),
        )
    )


def icc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation + design effect of event value under
    user clustering — the number that explains why event-level
    variance formulas mislead user-randomized experiments (the
    aa_test_calibration readout showed var_z < 1; ICC quantifies the
    clustering behind it): one-way random-effects ANOVA with users as
    groups, σ²_b = (MSB − MSW)/m̄₀, ICC = σ²_b/(σ²_b + MSW), and
    design effect 1 + (m̄ − 1)·ICC — the variance inflation a
    cluster-randomized readout must apply.

    Exactness: per-user Σy and Σy² are BIGINTs; the only rationals
    (s_i²/n_i) are micro-frozen per user before the exact fold; the
    ANOVA identities divide once each, rounded at the readout.

    Scale: one scan to per-user moments, one fold; no windows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.sum(
            F.round(F.col("value") * 100).cast("long")
            * F.round(F.col("value") * 100).cast("long")
        )
        .cast("long")
        .alias("ss"),
    )
    agg = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("sy"),
        F.sum("ss").cast("long").alias("syy"),
        F.sum(
            F.round(
                F.lit(1_000_000.0)
                * F.col("s")
                * F.col("s")
                / F.col("n").cast("double")
            ).cast("long")
        )
        .cast("long")
        .alias("sb_micro"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
    )
    ssb = F.col("sb_micro") / 1e6 - F.col("sy") * (
        F.col("sy") / F.col("nn").cast("double")
    )
    ssw = F.col("syy") - F.col("sb_micro") / 1e6
    msb = ssb / (F.col("k") - 1.0)
    msw = ssw / (F.col("nn") - F.col("k")).cast("double")
    m0 = (
        F.col("nn") - F.col("sn2") / F.col("nn").cast("double")
    ) / (F.col("k") - 1.0)
    # negative variance-component estimates clamp to 0 (the standard
    # ANOVA convention when MSB < MSW — no detectable clustering)
    sigma_b = F.greatest(F.lit(0.0), (msb - msw) / m0)
    icc = sigma_b / (sigma_b + msw)
    mbar = F.col("nn") / F.col("k").cast("double")
    return agg.select(
        F.col("k").alias("n_users"),
        F.col("nn").alias("n_events"),
        F.round(mbar, 4).alias("avg_cluster_size"),
        F.round(msw / 10_000.0, 4).alias("within_var"),
        F.round(sigma_b / 10_000.0, 4).alias("between_var"),
        F.round(icc, 6).alias("icc"),
        F.round(1.0 + (mbar - 1.0) * icc, 4).alias("design_effect"),
    )


def mde_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-detectable-effect power analysis for a two-arm test on
    event value: at alpha = 0.05 (two-sided) and 80% power,
    MDE = (z_{α/2} + z_β)·sqrt(2σ²/n) per arm size n — the planning
    table an experimenter reads BEFORE launching (ab_test_lift and the
    SPRT monitor tell you what happened; this tells you what's even
    detectable), with the corpus's own pooled variance and the
    observed n as the last row.

    Exactness: σ² from BIGINT cent moments; the z sum is an offline
    micro literal; one sqrt per row, rounded 4 dp.

    Scale: one scan to a 1-row moment aggregate crossed with a 4-row
    plan grid."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.sum(
            F.round(F.col("value") * 100).cast("long")
            * F.round(F.col("value") * 100).cast("long")
        )
        .cast("long")
        .alias("ss"),
    )
    grid = spark.createDataFrame(
        [(1_000,), (10_000,), (100_000,), (-1,)], ["n_per_arm"]
    ).select(F.col("n_per_arm").cast("long").alias("n_per_arm"))
    base = m.crossJoin(F.broadcast(grid)).select(
        F.when(F.col("n_per_arm") == -1, F.expr("n_obs div 2"))
        .otherwise(F.col("n_per_arm"))
        .cast("long")
        .alias("n_per_arm"),
        (F.col("n_per_arm") == -1).cast("int").alias("is_observed_n"),
        (F.col("s") / F.col("n_obs").cast("double")).alias("mu_c"),
        (
            (
                F.col("ss")
                - F.col("s") * (F.col("s") / F.col("n_obs").cast("double"))
            )
            / (F.col("n_obs") - 1.0)
        ).alias("var_c"),
    )
    zsum = (MDE_Z_ALPHA_MICRO + MDE_Z_BETA_MICRO) / 1e6
    mde_c = F.lit(zsum) * F.sqrt(2.0 * F.col("var_c") / F.col("n_per_arm"))
    return base.select(
        "n_per_arm",
        "is_observed_n",
        F.round(F.col("mu_c") / 100.0, 4).alias("baseline_mean"),
        F.round(mde_c / 100.0, 4).alias("mde_abs"),
        F.round(mde_c / F.col("mu_c"), 6).alias("mde_rel"),
    ).orderBy("n_per_arm")


def exact_matched_cohort(
    spark: SparkSession, sf_dir: str, band_width: int = 5
) -> DataFrame:
    """Stratified exact matching (coarsened exact matching with integer
    activity bands): estimate the association between a pre-period
    exposure and a post-period outcome by matching EQUAL numbers of
    exposed and unexposed users inside each pre-activity band — the
    observational-causal companion to did_lift_estimate /
    cuped_adjusted_lift / doubly_robust_ate, for when no experiment
    assignment exists and selection-on-activity must be removed by
    construction.

    Setup on the events table: the pre-period is the first half of the
    month, exposure = the user logged at least as many pre-period
    errors as purchases (data-derived, ~half the population at any sf),
    outcome = post-period purchase count.  Bands are exact integer
    buckets of pre-period event count (``n_pre div band_width``);
    within each band the match takes k = min(#exposed, #unexposed)
    users per arm, ranked by md5 hash with a user_id tie-break — the
    deterministic stand-in for random matching that both engines
    replay.  Output: per-band arm sizes, matched k, and matched-arm
    outcome SUMS as exact BIGINTs (no division — a ratio would be the
    consumer's rounding choice, and trunc-vs-floor diverges on
    negatives), plus a band = -1 grand-total row.

    Scale: two groupBys on user_id (pre and post), one groupBy on
    (band, exposed) for arm sizes, one rank window per (band, exposed)
    partition — everything keyed, nothing global; band count is
    bounded by max-activity/band_width."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.dedup import hash32

    events = load_table(spark, sf_dir, "events")
    t0 = F.lit("2024-01-16 00:00:00").cast("timestamp")
    pre = (
        events.filter(F.col("ts") < t0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pre"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("pre_err"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("pre_pur"),
        )
    )
    post = (
        events.filter(F.col("ts") >= t0)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("post_pur")
        )
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: users feeds the arm-size rollup and the matching window,
    # and the band/total readout re-evaluates the chain again — each
    # evaluation re-ran both pre/post event scans (8 events scans
    # unmaterialized; guide §5).  One row per user, 4 narrow columns.
    users = persist_tracked(
        pre.join(post, "user_id", "left")
        .na.fill({"post_pur": 0})
        .select(
            "user_id",
            F.expr(f"n_pre div {band_width}").alias("band"),
            (F.col("pre_err") >= F.col("pre_pur")).alias("exposed"),
            "post_pur",
        )
    )
    arm_sizes = users.groupBy("band", "exposed").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm")
    )
    k_per_band = arm_sizes.groupBy("band").agg(
        F.min("n_arm").alias("k"),
        F.count(F.lit(1)).alias("n_arms"),
    )
    # a band missing one arm entirely has no match (k applies only when
    # both arms exist)
    k_per_band = k_per_band.filter(F.col("n_arms") == 2).select("band", "k")
    w = Window.partitionBy("band", "exposed").orderBy(
        hash32(F.col("user_id").cast("string"), "match:"), "user_id"
    )
    matched = (
        users.join(F.broadcast(k_per_band), "band")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("k"))
    )
    per_band = matched.groupBy("band").agg(
        F.max("k").cast("long").alias("n_matched"),
        F.sum(F.when(F.col("exposed"), F.col("post_pur")).otherwise(0))
        .cast("long")
        .alias("out_exposed"),
        F.sum(F.when(~F.col("exposed"), F.col("post_pur")).otherwise(0))
        .cast("long")
        .alias("out_control"),
    )
    sizes = (
        arm_sizes.groupBy("band")
        .agg(
            F.sum(F.when(F.col("exposed"), F.col("n_arm")).otherwise(0))
            .cast("long")
            .alias("n_exposed"),
            F.sum(F.when(~F.col("exposed"), F.col("n_arm")).otherwise(0))
            .cast("long")
            .alias("n_unexposed"),
        )
    )
    # persist: feeds the grand-total fold and the readout; #bands rows
    bands = persist_tracked(
        sizes.join(per_band, "band", "left").na.fill(
            {"n_matched": 0, "out_exposed": 0, "out_control": 0}
        )
    )
    total = bands.agg(
        F.sum("n_exposed").cast("long").alias("n_exposed"),
        F.sum("n_unexposed").cast("long").alias("n_unexposed"),
        F.sum("n_matched").cast("long").alias("n_matched"),
        F.sum("out_exposed").cast("long").alias("out_exposed"),
        F.sum("out_control").cast("long").alias("out_control"),
    ).select(
        F.lit(-1).cast("long").alias("band"),
        "n_exposed",
        "n_unexposed",
        "n_matched",
        "out_exposed",
        "out_control",
    )
    return (
        bands.select(
            F.col("band").cast("long").alias("band"),
            "n_exposed",
            "n_unexposed",
            "n_matched",
            "out_exposed",
            "out_control",
        )
        .unionByName(total)
        .orderBy("band")
    )



def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch detection — the first gate every
    experimentation platform runs before reading ANY lift number: if
    the 50/50 assignment didn't land 50/50, the randomization is
    broken (redirect bug, bot filter applied to one arm, logging loss)
    and all downstream estimates are invalid.  Chi-square goodness of
    fit against the declared split, per segment and overall.

    A mismatch is PLANTED (the skew-advisor discipline: the md5
    assignment is honest-uniform, so a broken randomizer is simulated):
    treatment assignment uses u < 0.52 instead of 0.50, the ~2% drift
    a real SRM incident shows.  With o = treatment count and n total,
    the 1-df statistic reduces to χ² = (2o − n)²/n — exact integers
    with one micro floor-division; verdict thresholds at the 0.05
    critical value 3.841 (frozen micro literal, the MDE_Z discipline).

    Scale: one customer scan, one #segments-row fold plus a grand-total
    row (band = '__all')."""
    customer = load_table(spark, sf_dir, "customer")
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    assigned = customer.select(
        F.col("c_mktsegment").alias("segment"),
        (hash_uniform(F.col("c_custkey"), "srm:") < 0.52)
        .cast("int")
        .alias("treat"),
    )
    per_seg = assigned.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("treat").cast("long").alias("o"),
    )
    total = assigned.agg(
        F.lit("__all").alias("segment"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("treat").cast("long").alias("o"),
    )
    folded = per_seg.unionByName(total)
    chi2 = F.expr(
        "CAST((2 * o - n) AS DECIMAL(38, 0)) * (2 * o - n) * 1000000"
        " div CAST(n AS DECIMAL(38, 0))"
    ).cast("long")
    return folded.select(
        "segment",
        "n",
        F.col("o").alias("n_treatment"),
        chi2.alias("chi2_micro"),
        F.when(chi2 > 3841000, F.lit("SRM")).otherwise(F.lit("ok")).alias(
            "verdict"
        ),
    ).orderBy("segment")



def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve — the standard evaluation for UPLIFT models (Radcliffe
    2007): rank users by a targeting score, and at each cumulative
    score decile compare treated vs control conversions to measure how
    much incremental conversion the top of the ranking captures.  The
    missing member of the experiment family: ab_test_lift reads ONE
    average effect; the Qini curve reads WHO should be targeted.

    Fixture: the shared propensity score (propensity_scored) is the
    targeting score and its late-half purchase outcome is the
    conversion; treatment is an independent md5 coin (salt ``qini:``),
    so the expected curve is the diagonal — the readout's job is
    exactness, and a real uplift model would be dropped in unchanged.

    Per cumulative decile (descending score): treated/control counts
    and conversions (exact BIGINTs via one ≤11-row cumulative window)
    and the Qini statistic q(k) = Yt_k − Yc_k·Nt_k/Nc_k frozen once to
    micro by integer floor-div.

    Scale: one per-user aggregation (the shared fixture), a ≤11-row
    bin fold and cumulative window (audited bounded), an ≤11-row
    readout."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    # same construction as propensity_scored, with the user id carried
    # through — the treatment coin must key on the user, and the shared
    # fixture drops the id after scoring
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    anchor = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0)
        .cast("long")
        .alias("__mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("__mid"), 1).otherwise(0))
            .cast("long")
            .alias("__ne"),
            F.sum(
                F.when(
                    (F.col("day") <= F.col("__mid")) & (F.col("is_p") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("__pe"),
            F.max(
                F.when(
                    (F.col("day") > F.col("__mid")) & (F.col("is_p") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    p_micro = F.round(
        F.lit(1000000.0) * (F.col("__pe") + 1) / (F.col("__ne") + 2)
    ).cast("long")
    rows = per_user.select(
        "y",
        F.floor(p_micro / 100000).cast("long").alias("bin"),
        (hash_uniform(F.col("user_id"), "qini:") < 0.5)
        .cast("int")
        .alias("treat"),
    )
    bins = rows.groupBy("bin").agg(
        F.sum("treat").cast("long").alias("nt"),
        F.sum(1 - F.col("treat")).cast("long").alias("nc"),
        F.sum(F.col("treat") * F.col("y")).cast("long").alias("yt"),
        F.sum((1 - F.col("treat")) * F.col("y")).cast("long").alias("yc"),
    )
    wcum = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "bin",
        F.sum("nt").over(wcum).alias("nt_k"),
        F.sum("nc").over(wcum).alias("nc_k"),
        F.sum("yt").over(wcum).alias("yt_k"),
        F.sum("yc").over(wcum).alias("yc_k"),
    )
    return cum.select(
        "bin",
        "nt_k",
        "nc_k",
        "yt_k",
        "yc_k",
        F.expr(
            "(CAST(yt_k AS DECIMAL(38, 0)) * greatest(nc_k, 1)"
            " - CAST(yc_k AS DECIMAL(38, 0)) * nt_k) * 1000000"
            " div CAST(greatest(nc_k, 1) AS DECIMAL(38, 0))"
        )
        .cast("long")
        .alias("qini_micro"),
    ).orderBy(F.desc("bin"))


def mann_whitney_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test per segment — the nonparametric
    arm-comparison every experimentation platform offers next to the
    t-test, because revenue-per-user is heavy-tailed and zero-inflated
    and a mean test is dominated by whales.  Exact tie handling via
    midranks (the textbook average-rank correction), tie-corrected
    normal approximation for the z readout.

    All rank arithmetic is INTEGER: with cl = #values strictly below x
    and t = #ties at x, the doubled midrank is rank2 = 2·cl + t + 1, so
    the doubled treatment rank-sum R2, the doubled statistic
    u2 = R2 − n1(n1+1), its doubled mean mu2 = n1·n2, and the tie term
    Σ(t³−t) are exact BIGINTs on both engines; only the final z divides
    into doubles (rounded 6 dp, the cos_sim discipline).

    Scale: one per-user aggregation of the event stream; the midrank
    window runs over the per-(segment, value) HISTOGRAM — bounded by
    distinct per-user outcomes ≤ |users|, never the fact scan (the
    pr_auc_from_hist discipline) — and everything after is a
    per-segment fold to ≤ 6 rows."""
    seg = mwu_user_frame(spark, sf_dir)
    both = seg.unionByName(seg.withColumn("segment", F.lit("__all")))
    hist = both.groupBy("segment", "x").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("treat").cast("long").alias("t1"),
    )
    return mwu_from_hist(hist)


def mwu_user_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The U-test fixture: one (segment, x, treat) row per event-stream
    user — outcome x = exact purchase micros, arm by the md5 coin,
    segment from the customer dim.  Shared by the batch test and the
    streaming ledger fold (a user's row is complete here, so waves
    staged on user_id carry exact per-batch histogram partials)."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    micros = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 1000000).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    per_user = events.groupBy("user_id").agg(
        F.sum(micros).cast("long").alias("x")
    )
    return per_user.join(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "user_id",
    ).select(
        "user_id",
        "segment",
        "x",
        (hash_uniform(F.col("user_id"), "mwu:") < 0.5)
        .cast("int")
        .alias("treat"),
    )


def mwu_from_hist(hist: DataFrame) -> DataFrame:
    """The U-test readout over a (segment, x, t, t1) value histogram —
    shared by mann_whitney_test (histogram from one scan) and
    stream_mann_whitney (histogram folded from a per-batch ledger;
    counts merge exactly, so the statistic is a pure function of the
    histogram and the batch oracle is inherited verbatim — the
    pr_auc_from_hist precedent)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("segment")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.select(
        "segment",
        "t",
        "t1",
        (
            2 * F.coalesce(F.sum("t").over(w), F.lit(0).cast("long"))
            + F.col("t")
            + 1
        ).alias("rank2"),
    )
    per_seg = ranked.groupBy("segment").agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t1") * F.col("rank2")).cast("long").alias("r2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("ties"),
    )
    n, n1 = F.col("n"), F.col("n1")
    n2 = (n - n1).alias("n2")
    u2 = (F.col("r2") - n1 * (n1 + 1)).alias("u2")
    var = (
        (n1.cast("double") * (n - n1))
        * ((n + 1) - F.col("ties") / (n.cast("double") * (n - 1)))
        / 12.0
    )
    z = F.round(
        F.when(
            var > 0,
            (F.col("r2") - n1 * (n1 + 1) - n1 * (n - n1))
            / (2.0 * F.sqrt(var)),
        ).otherwise(0.0),
        6,
    ).alias("z")
    return per_seg.select(
        "segment",
        n1.alias("n_treatment"),
        n2,
        u2,
        z,
        F.when(F.abs(z) > 1.959964, F.lit("significant"))
        .otherwise(F.lit("ns"))
        .alias("verdict"),
    ).orderBy("segment")
