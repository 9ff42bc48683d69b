"""Binary dropout-risk classifier (SURVEY.md §2.9, M3, M6–M8).

Capability-parity port of the reference's LightGBM trainer
(core-logic/train_module.py:208-370): stratified seeded split, gradient-
boosted trees, AUC / logloss / accuracy-at-threshold metrics.  Spark-native
substitution is GBTClassifier (SURVEY.md §7.4.6 — metric-level parity, not
bit parity; LightGBM isn't in the dependency budget and SynapseML is out of
scope).

Scale: GBT training is iterative over the cluster; feature assembly is a
single narrow VectorAssembler pass.  Scoring (M8) is model.transform —
distributed, no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table

FEATURE_COLS = ["n_items", "avg_qty", "avg_discount", "n_parts", "sum_price"]


def training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label + features per order — mirrors the reference's 24-feature
    interactions frame (sql/init.sql:14-37) built by join + fillna
    (core-logic/train_module.py:239-301).

    Label: bulky order (total quantity > 100, ~46/54 class balance).  The
    driver data is synthetic-random across tables (o_orderstatus and
    o_totalprice are independent of line items), so no natural
    cross-column signal exists; a learnable mechanism test needs a label
    derivable from order shape.  sum_qty itself is excluded from the
    features (avg_qty = sum/n replaces it) so the learner must compose
    n_items x avg_qty rather than read the label back.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_discount").alias("avg_discount"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_price"),
    )
    return (
        orders.filter(F.col("o_orderstatus").isin("F", "O", "P"))  # P3: label isin
        .join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .na.fill(0, FEATURE_COLS + ["sum_qty"])  # P4: null-default projection
        .select(
            "o_orderkey",
            F.when(F.col("sum_qty") > 100.0, 1.0).otherwise(0.0).alias("label"),
            *FEATURE_COLS,
        )
    )


def stratified_split(
    df: DataFrame, label_col: str = "label", train_frac: float = 0.8, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Stratified seeded split — reference train_test_split(stratify=y)
    (core-logic/train_module.py:314-315).  sampleBy draws the train
    fraction per label; the remainder (left_anti on PK) is the test set."""
    train = df.sampleBy(label_col, fractions={0.0: train_frac, 1.0: train_frac}, seed=seed)
    test = df.join(train.select("o_orderkey"), "o_orderkey", "left_anti")
    return train, test


def deterministic_stratified_split(
    df: DataFrame,
    label_col: str = "label",
    pk_col: str = "o_orderkey",
    train_frac: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """Exact-fraction stratified split, reproducible across engines (M3).

    Closer to the reference's sklearn ``train_test_split(stratify=y)``
    than Bernoulli sampling: each stratum contributes EXACTLY
    ceil(frac·n) rows, and membership depends only on data (rank by
    md5(pk) within the stratum), not an engine's RNG stream — so a DuckDB
    oracle reproduces it bit-for-bit and a re-run on different
    partitioning returns the same split.

    Scale: one window shuffle keyed by the label (few strata → few heavy
    partitions; for extreme per-stratum cardinality switch the rank to a
    two-pass percentile threshold on the md5 key).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(label_col).orderBy(
        F.md5(F.col(pk_col).cast("string")), F.col(pk_col)
    )
    counts = Window.partitionBy(label_col)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(counts)
    )
    cut = F.ceil(F.lit(train_frac) * F.col("__n"))
    train = ranked.filter(F.col("__rn") <= cut).drop("__rn", "__n")
    test = ranked.filter(F.col("__rn") > cut).drop("__rn", "__n")
    return train, test


@dataclass
class ClassifierResult:
    model: object
    metrics: dict = field(default_factory=dict)


def train_classifier(
    spark: SparkSession,
    sf_dir: str,
    max_iter: int = 20,
    max_depth: int = 5,
    seed: int = 42,
    threshold: float = 0.6,
    deterministic_split: bool = False,
) -> ClassifierResult:
    """Train + evaluate — reference core-logic/train_module.py:317-369.
    Metrics mirror the reference's ledger row: auc, logloss, accuracy at
    the reference's 0.6 threshold (train_module.py:349).

    ``deterministic_split=True`` swaps the engine-RNG sampleBy split for
    the md5-rank :func:`deterministic_stratified_split`, making the split
    counts (and therefore the test population the metrics are computed
    over) reproducible by a SQL oracle."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
    )
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    frame = training_frame(spark, sf_dir)
    if deterministic_split:
        train, test = deterministic_stratified_split(frame)
    else:
        train, test = stratified_split(frame, seed=seed)
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features")
    gbt = GBTClassifier(
        labelCol="label",
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    )
    model = gbt.fit(assembler.transform(train).cache())

    preds = model.transform(assembler.transform(test)).withColumn(
        "p1", vector_to_array("probability")[1]
    ).cache()
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(preds)
    logloss = MulticlassClassificationEvaluator(
        labelCol="label", probabilityCol="probability", metricName="logLoss"
    ).evaluate(preds)
    # accuracy at the reference's custom threshold (not the default 0.5)
    acc_at = preds.select(
        F.avg(
            F.when(
                (F.col("p1") >= threshold).cast("int") == F.col("label").cast("int"), 1.0
            ).otherwise(0.0)
        ).alias("acc")
    ).head()[0]
    preds.unpersist()
    return ClassifierResult(
        model, {"auc": auc, "logloss": logloss, f"accuracy_at_{threshold}": acc_at}
    )


def classifier_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/M7 as a declared query: GBT train + eval, returning the
    reference ledger's metric row (auc / logloss / accuracy@0.6 —
    reference core-logic/train_module.py:317-369).  Iterative tree
    boosting — rows-only to the driver (within-engine deterministic via
    the fixed seed; asserted in test_ml.py), small maxIter so the gate
    pays seconds, not minutes."""
    res = train_classifier(spark, sf_dir, max_iter=5, max_depth=3)
    m = res.metrics
    return spark.createDataFrame(
        [
            (
                round(float(m["auc"]), 4),
                round(float(m["logloss"]), 4),
                round(float(m["accuracy_at_0.6"]), 4),
            )
        ],
        "auc double, logloss double, accuracy_at_06 double",
    )


def classifier_metrics_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable M6/M7 row (the approx_profile pattern,
    operators/relational.py): exact data anchors a SQL oracle recomputes
    — per-stratum train/test counts of the md5-rank deterministic split —
    plus metric-range booleans any correctly trained GBT must satisfy,
    asserted as literal TRUE by the oracle.

    The label (total quantity > 100) is exactly composable from the
    features (n_items * avg_qty = sum_qty), so a working learner clears
    the majority-class rate with margin; ``acc_above_majority_ok`` is the
    learnability check, the range booleans are the metric-sanity checks.
    Raw metric values stay visible via tests/test_ml.py (seeded,
    within-engine deterministic)."""
    frame = training_frame(spark, sf_dir)
    train, test = deterministic_stratified_split(frame)
    n_train = train.count()
    n_test = test.count()
    majority = (
        test.groupBy("label")
        .count()
        .agg((F.max("count") / F.sum("count")).alias("frac"))
        .head()[0]
    )
    res = train_classifier(
        spark, sf_dir, max_iter=5, max_depth=3, deterministic_split=True
    )
    m = res.metrics
    auc, logloss, acc = (
        float(m["auc"]),
        float(m["logloss"]),
        float(m["accuracy_at_0.6"]),
    )
    return spark.createDataFrame(
        [
            (
                n_train,
                n_test,
                0.5 < auc <= 1.0,
                0.0 < logloss < 5.0,
                0.0 <= acc <= 1.0,
                acc > float(majority),
            )
        ],
        "n_train long, n_test long, auc_ok boolean, logloss_ok boolean, "
        "acc_ok boolean, acc_above_majority_ok boolean",
    )


def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 as a declared query: deterministic stratified split per label
    with per-label counts — fully oracle-checkable (md5-rank membership,
    no engine RNG; see :func:`deterministic_stratified_split`)."""
    frame = training_frame(spark, sf_dir)
    train, test = deterministic_stratified_split(frame)
    t = train.groupBy("label").agg(F.count(F.lit(1)).alias("n_train"))
    e = test.groupBy("label").agg(F.count(F.lit(1)).alias("n_test"))
    return t.join(e, "label").orderBy("label")


def target_encoding_oof(
    spark: SparkSession, sf_dir: str, band_cents: int = 5000
) -> DataFrame:
    """Leave-one-out target encoding of a high-cardinality categorical —
    the leakage-safe way to turn a key into a numeric feature: each
    row's encoding is the target mean of its OWN group WITHOUT the row
    itself ((S − x)/(n − 1)), so the feature never memorizes the row's
    own label (plain group-mean encoding leaks the target and inflates
    validation metrics; LOO is the standard correction alongside the
    k-fold variant that :func:`kfold_assignment` would drive).

    Category: (o_orderpriority, o_orderstatus); target: o_totalprice.
    Arithmetic stays exact: prices lift to integer cents, group sums S
    fold as BIGINT, and each row's (S − x)/(n − 1) is the same
    int-division-to-double in both engines.  The readout histograms the
    per-row encodings into ``band_cents`` bands — a shape that can only
    come out right if EVERY row's encoding did (aggregate-only outputs
    like avg(LOO) collapse to S/n and would not exercise the per-row
    path).

    Scale: one scan, a broadcast ≤|categories|-row aggregate join, one
    histogram shuffle.  No windows; singleton groups (n = 1, encoding
    undefined) surface in a NULL band rather than silently dropping."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    groups = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum("cents").cast("long").alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    encoded = orders.join(
        F.broadcast(groups), ["o_orderpriority", "o_orderstatus"]
    ).select(
        "o_orderpriority",
        "o_orderstatus",
        F.when(
            F.col("__n") > 1,
            F.floor(
                (F.col("__s") - F.col("cents"))
                / (F.col("__n") - 1)
                / F.lit(float(band_cents))
            ).cast("long"),
        ).alias("loo_band"),
    )
    return (
        encoded.groupBy("o_orderpriority", "o_orderstatus", "loo_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("o_orderpriority", "o_orderstatus", "loo_band")
    )


def propensity_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared purchase-propensity eval fixture: per user, the
    late-half purchase outcome ``y``, the Laplace-smoothed early-half
    score in 1e-6 units ``p_micro``, and its fixed-width decile ``bin``
    — consumed by calibration_bins (reliability diagram),
    brier_decomposition (Murphy decomposition) and
    isotonic_calibration_pav (monotone recalibration), so the three
    evals are provably over the SAME forecasts."""
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
    sided = ev.crossJoin(F.broadcast(anchor))
    per_user = sided.groupBy("user_id").agg(
        F.sum(F.when(F.col("day") <= F.col("__mid"), 1).otherwise(0))
        .cast("long")
        .alias("__ne"),
        F.sum(
            F.when(
                (F.col("day") <= F.col("__mid")) & (F.col("is_p") == 1), 1
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
    scored = per_user.select(
        "y",
        F.round(
            F.lit(1000000.0) * (F.col("__pe") + 1) / (F.col("__ne") + 2)
        )
        .cast("long")
        .alias("p_micro"),
    ).withColumn(
        "bin", F.floor(F.col("p_micro") / 100000).cast("long")
    )
    return scored


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for a purchase-propensity
    score — the eval that catches a model whose RANKING is fine but
    whose probabilities are off (AUC can't see it; a miscalibrated
    propensity poisons any downstream expected-value decision).  Score:
    Laplace-smoothed early-half purchase rate per user,
    (purchases+1)/(events+2); outcome: did the user purchase in the
    late half.  Users first seen late get the 0.5 prior — present, not
    dropped.

    Per fixed-width decile bin of the predicted score: count, mean
    predicted, observed rate, and the bin's Brier score — all derived
    from integer folds (scores lift to 1e-6 units; Brier's Σ(p−y)²
    expands to Σp² − 2Σpy + Σy over those integers) so both engines
    hash-match.

    Scale: one per-user aggregation, one ≤11-row bin aggregation.  The
    split anchor is the broadcast 1-row midpoint; no windows."""
    scored = propensity_scored(spark, sf_dir)
    folds = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("p_micro").cast("long").alias("__sp"),
        F.sum(F.col("p_micro") * F.col("p_micro"))
        .cast("long")
        .alias("__spp"),
        F.sum(F.col("p_micro") * F.col("y")).cast("long").alias("__spy"),
        F.sum("y").cast("long").alias("__sy"),
    )
    return folds.select(
        "bin",
        "n_users",
        F.round(F.col("__sp") / F.col("n_users") / 1000000.0, 6).alias(
            "avg_predicted"
        ),
        F.round(
            F.col("__sy") / F.col("n_users").cast("double"), 6
        ).alias("observed_rate"),
        F.round(
            (
                F.col("__spp").cast("double")
                - 2000000.0 * F.col("__spy")
                + 1000000000000.0 * F.col("__sy")
            )
            / F.col("n_users")
            / 1000000000000.0,
            6,
        ).alias("brier"),
    ).orderBy("bin")


def exact_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed ROC-AUC per segment — the rank-sum identity
    AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) computed from a value HISTOGRAM
    with midrank tie handling, never a per-row sort: with per-(group,
    value) tie counts t (t₊ positive) at running total c, the DOUBLED
    positive rank sum folds as the integer Σ t₊·(2(c−t)+t+1) (the
    mann_whitney_drift recipe), so per-group AUC is exact BIGINT
    arithmetic with one final division.  pyspark.ml's evaluator gives
    one global number and no tie guarantee; this gives every segment,
    hash-reproducibly.

    Probe task: does order price separate finished from open orders,
    per priority.  Scale: one histogram aggregation (distinct cents ×
    group), per-GROUP ordered cumsums (windows partition by the
    segment — histogram-level rows, bounded by the value domain, not
    the row count).

    Output per group: n_pos, n_neg, auc, gini."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    hist = orders.groupBy("grp", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("pos").cast("long").alias("tp"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("c", F.sum("t").over(w))
    folds = cum.groupBy("grp").agg(
        F.sum(
            F.col("tp") * (2 * (F.col("c") - F.col("t")) + F.col("t") + 1)
        )
        .cast("long")
        .alias("__r2"),
        F.sum("tp").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("tp")).cast("long").alias("n_neg"),
    )
    auc = (
        (F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + 1))
        / (2.0 * F.col("n_pos") * F.col("n_neg"))
    )
    return folds.select(
        "grp",
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    ).orderBy("grp")


def conformal_interval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with group-conditional
    coverage (Vovk et al.; the distribution-free interval recipe modern
    eval stacks attach to any point model): md5-deterministic
    train/calibration/test split of orders, a per-priority train-mean
    point model, nonconformity = absolute residual in INTEGER cents,
    q_hat = the ceil((n_calib + 1) * 0.9)-th smallest calibration score
    (the finite-sample-valid conformal quantile, exact via
    histogram-cumsum order statistic — never an approximate
    percentile), and the achieved coverage of pred +/- q_hat on the
    held-out test split, to compare against the 0.9 target.

    Exactness: splits are hash32 % 4 buckets (2 train / 1 calib / 1
    test); predictions are integer-cent means rounded once; scores and
    q_hat stay BIGINT cents end-to-end; coverage is an integer ratio
    rounded to 4 dp.

    Scale: one scan to split + score (the model is a broadcast #groups
    frame), the order statistic reads a (group, score) histogram —
    cumsum windows partition per group over distinct cent values, the
    group_quantile_threshold recipe — and coverage is one aggregation.
    No fact-scale global sort."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.dedup import hash32

    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the narrow split projection feeds the train model, the
    # calibration histogram, and the test coverage — unmaterialized,
    # each split re-scanned the fact table and re-ran the md5 bucketing
    # (6 orders scans; guide §5).  4 narrow columns.
    orders = persist_tracked(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.col("o_orderpriority").alias("prio"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (hash32(F.col("o_orderkey").cast("string"), "conf:") % 4).alias(
                "__b"
            ),
        )
    )
    train = orders.filter(F.col("__b") <= 1)
    calib = orders.filter(F.col("__b") == 2)
    test = orders.filter(F.col("__b") == 3)
    model = train.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        F.round(F.sum("cents") / F.count(F.lit(1)))
        .cast("long")
        .alias("pred_cents"),
    )
    cal_scores = (
        calib.join(F.broadcast(model), "prio")
        .select("prio", F.abs(F.col("cents") - F.col("pred_cents")).alias("score"))
        .groupBy("prio", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("prio").orderBy("score")
    wn = Window.partitionBy("prio")
    ranked = cal_scores.select(
        "prio",
        "score",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(wn).cast("long").alias("n_calib"),
    )
    q_hat = (
        ranked.filter(
            F.col("cum_n")
            >= F.ceil((F.col("n_calib") + 1) * 9.0 / 10).cast("long")
        )
        .groupBy("prio", "n_calib")
        .agg(F.min("score").cast("long").alias("q_hat_cents"))
    )
    covered = (
        test.join(F.broadcast(model), "prio")
        .join(F.broadcast(q_hat), "prio")
        .groupBy("prio", "n_train", "n_calib", "pred_cents", "q_hat_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("cents") - F.col("pred_cents"))
                    <= F.col("q_hat_cents")
                ).cast("int")
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return covered.select(
        "prio",
        "n_train",
        "n_calib",
        "n_test",
        F.round(F.col("pred_cents") / 100.0, 2).alias("pred_price"),
        F.round(F.col("q_hat_cents") / 100.0, 2).alias("q_hat_price"),
        F.round(F.col("n_covered") / F.col("n_test"), 4).alias("coverage"),
        F.lit(0.9).alias("target_coverage"),
    ).orderBy("prio")


def cv_paired_ttest(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Paired t-test over grouped-CV folds comparing two predictors of
    order price — per-priority train mean vs global train mean — the
    model-comparison protocol (Dietterich): the SAME folds score both
    models, the test runs on per-fold MAE DIFFERENCES, so fold-to-fold
    variance cancels and k−1 degrees of freedom are honest.  Reports
    per-fold MAEs plus the pooled t statistic and verdict at the
    5% two-sided level (|t| > 2.776 for k=5).

    Exactness: folds are md5(o_orderkey) % k; predictions are
    integer-cent means of each fold's TRAINING complement (leakage-
    free); per-fold MAEs are BIGINT cent folds rounded once; t is
    computed from the k rounded differences in a fixed-order fold.

    Scale: one scan to (fold, priority) cent moments; both models and
    all k evaluations come off that one aggregate (broadcast-sized);
    no second pass over the fact table."""
    from project_bigdata_recsys_spark.functions.dedup import hash32

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (hash32(F.col("o_orderkey").cast("string"), "cv:") % k).alias("fold"),
    )
    cells = orders.groupBy("fold", "prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    tot = cells.agg(
        F.sum("n").cast("long").alias("nall"),
        F.sum("s").cast("long").alias("sall"),
    )
    pr_tot = cells.groupBy("prio").agg(
        F.sum("n").cast("long").alias("np"),
        F.sum("s").cast("long").alias("sp"),
    )
    # training complement per (fold, prio): totals minus the fold's own
    train = (
        cells.join(F.broadcast(pr_tot), "prio")
        .select(
            "fold",
            "prio",
            F.round((F.col("sp") - F.col("s")) / (F.col("np") - F.col("n")))
            .cast("long")
            .alias("pred_grp"),
        )
    )
    # global-model prediction per fold: grand totals minus the fold
    fold_tot = cells.groupBy("fold").agg(
        F.sum("n").cast("long").alias("nf"),
        F.sum("s").cast("long").alias("sf"),
    )
    glob = fold_tot.crossJoin(F.broadcast(tot)).select(
        "fold",
        F.round(
            (F.col("sall") - F.col("sf")) / (F.col("nall") - F.col("nf"))
        )
        .cast("long")
        .alias("pred_glob"),
    )
    scored = (
        orders.join(F.broadcast(train), ["fold", "prio"])
        .join(F.broadcast(glob), "fold")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum(F.abs(F.col("cents") - F.col("pred_grp")))
                / 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("mae_group_model"),
            F.round(
                F.sum(F.abs(F.col("cents") - F.col("pred_glob")))
                / 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("mae_global_model"),
        )
    )
    diffs = scored.select(
        "fold",
        "n_test",
        "mae_group_model",
        "mae_global_model",
        F.round(
            F.col("mae_group_model") - F.col("mae_global_model"), 4
        ).alias("d"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked as _pt

    diffs = _pt(diffs)
    d4 = F.round(F.col("d") * 10_000).cast("long")
    stats = diffs.agg(
        F.count(F.lit(1)).cast("long").alias("kf"),
        F.sum(d4).cast("long").alias("s1"),
        F.sum(d4 * d4).cast("long").alias("s2"),
    )
    dbar = F.col("s1") / 1e4 / F.col("kf")
    t_stat = F.round(
        dbar
        / F.sqrt(
            (F.col("s2") / 1e8 - F.col("kf") * dbar * dbar)
            / (F.col("kf") - 1.0)
            / F.col("kf")
        ),
        4,
    )
    verdict = stats.select(
        t_stat.alias("t_stat"),
        F.when(F.abs(t_stat) > 2.776, F.lit("group_model_differs"))
        .otherwise(F.lit("no_significant_difference"))
        .alias("verdict"),
    )
    return (
        diffs.crossJoin(F.broadcast(verdict))
        .select(
            "fold",
            "n_test",
            "mae_group_model",
            "mae_global_model",
            F.col("d").alias("mae_diff"),
            "t_stat",
            "verdict",
        )
        .orderBy("fold")
    )


def pr_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed PR-AUC per segment — the precision-recall
    companion to exact_auc_by_group, and the curve that matters under
    class imbalance (ROC-AUC stays flattering when negatives dominate;
    the PR curve collapses, which is why retrieval and fraud evals
    report it).  Same probe task, so the two areas are directly
    comparable per group: does order price separate finished from open
    orders, per priority.

    Contract: trapezoidal area over the THRESHOLD-SWEEP PR curve — one
    point per distinct score level (descending), precision anchored at
    1.0 before the first level (the sklearn convention).  Computed
    from the same (group, cents) histogram as the ROC twin: per-level
    cumulative TP/total via one ordered window, per-level precision
    frozen to micro by integer floor-div, then the trapezoid sum folds
    as Σ ΔTP·(prec_k + prec_{k−1}) — exact BIGINTs with ONE final
    DECIMAL(38) division by 2·n_pos.

    Scale: histogram aggregation (distinct cents × group), per-group
    ordered cumsum windows over HISTOGRAM-level rows (value-domain
    bounded, never row-count), a #groups-row readout."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    hist = orders.groupBy("grp", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("pos").cast("long").alias("tp"),
    )
    return pr_auc_from_hist(hist)


def pr_auc_from_hist(hist: DataFrame) -> DataFrame:
    """The PR-AUC kernel over a (grp, cents, t, tp) value histogram —
    shared by pr_auc_by_group (histogram from one scan) and
    stream_pr_auc (histogram folded from a per-batch ledger; counts
    merge exactly, so the area is a pure function of the histogram and
    the batch oracle is inherited verbatim)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy(F.desc("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("grp").orderBy(F.desc("cents"))
    cum = hist.select(
        "grp",
        "cents",
        F.sum("t").over(w).alias("c"),
        F.sum("tp").over(w).alias("ctp"),
    ).select(
        "grp",
        "cents",
        "c",
        "ctp",
        F.expr(
            "CAST(ctp AS DECIMAL(38, 0)) * 1000000"
            " div CAST(c AS DECIMAL(38, 0))"
        )
        .cast("long")
        .alias("prec_micro"),
    )
    stepped = cum.select(
        "grp",
        (F.col("ctp") - F.coalesce(F.lag("ctp").over(wl), F.lit(0))).alias(
            "dtp"
        ),
        "prec_micro",
        F.coalesce(F.lag("prec_micro").over(wl), F.lit(1000000)).alias(
            "prev_prec_micro"
        ),
    )
    folds = stepped.groupBy("grp").agg(
        F.sum(
            F.col("dtp") * (F.col("prec_micro") + F.col("prev_prec_micro"))
        )
        .cast("long")
        .alias("__area2"),
        F.sum("dtp").cast("long").alias("n_pos"),
    )
    totals = hist.groupBy("grp").agg(
        F.sum("t").cast("long").alias("n_total")
    )
    return (
        folds.join(totals, "grp")
        .select(
            "grp",
            "n_pos",
            (F.col("n_total") - F.col("n_pos")).alias("n_neg"),
            F.expr(
                "CAST(__area2 AS DECIMAL(38, 0))"
                " div CAST(2 * n_pos AS DECIMAL(38, 0))"
            )
            .cast("long")
            .alias("pr_auc_micro"),
            F.expr(
                "CAST(n_pos AS DECIMAL(38, 0)) * 1000000"
                " div CAST(n_total AS DECIMAL(38, 0))"
            )
            .cast("long")
            .alias("prevalence_micro"),
        )
        .orderBy("grp")
    )


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over binned
    forecasts: BRIER-ish = RELIABILITY − RESOLUTION + UNCERTAINTY —
    the readout that says WHY a probabilistic score is bad
    (miscalibrated? uninformative? or just a hard base rate?), where
    calibration_bins only draws the curve.  Same propensity fixture
    (propensity_scored), so the decomposition explains that exact
    diagram.

    All-integer folding: with per-bin (n_b, Σp_micro, Σy) and global
    (N, SY),
      reliability = Σ_b (Σp_micro,b − 1e6·SYb)²/n_b / (N·1e12)
      resolution  = Σ_b (SYb·N − SY·n_b)²/n_b / N³
      uncertainty = SY·(N − SY)/N²
    every numerator is exact DECIMAL(38) arithmetic; each term takes
    one micro floor-division (per-bin for the two sums, then one final
    fold) — deterministic on both engines.  The raw-score Brier (exact,
    unbinned) is emitted alongside; reliability/resolution are the
    BINNED decomposition (the standard practice), so the identity holds
    up to within-bin forecast variance, which is the binning's price,
    not an engine artifact.

    Scale: one per-user aggregation, one ≤11-row bin fold, a 1-row
    readout."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    scored = propensity_scored(spark, sf_dir)
    # persist: the ≤11-row bin fold feeds the global rollup AND the
    # decomposition fold — unmaterialized, each re-ran the propensity
    # fixture over the fact table (guide §5)
    bins = persist_tracked(
        scored.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("p_micro").cast("long").alias("sp_b"),
            F.sum("y").cast("long").alias("sy_b"),
            F.sum(F.col("p_micro") * F.col("p_micro"))
            .cast("long")
            .alias("spp_b"),
            F.sum(F.col("p_micro") * F.col("y")).cast("long").alias("spy_b"),
        )
    )
    tot = bins.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("sy_b").cast("long").alias("sy"),
        F.sum("spp_b").cast("long").alias("spp"),
        F.sum("spy_b").cast("long").alias("spy"),
    )
    folded = bins.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "(CAST(sp_b AS DECIMAL(38, 0)) - CAST(sy_b AS DECIMAL(38, 0))"
                " * 1000000) * (CAST(sp_b AS DECIMAL(38, 0))"
                " - CAST(sy_b AS DECIMAL(38, 0)) * 1000000)"
                " div CAST(n_b AS DECIMAL(38, 0))"
            )
        ).alias("__rel_num"),
        F.sum(
            F.expr(
                "(CAST(sy_b AS DECIMAL(38, 0)) * n - CAST(sy AS"
                " DECIMAL(38, 0)) * n_b) * (CAST(sy_b AS DECIMAL(38, 0))"
                " * n - CAST(sy AS DECIMAL(38, 0)) * n_b) * 1000000"
                " div CAST(n_b AS DECIMAL(38, 0))"
            )
        ).alias("__res_num"),
        F.first("n").alias("n"),
        F.first("sy").alias("sy"),
        F.first("spp").alias("spp"),
        F.first("spy").alias("spy"),
    )
    return folded.select(
        F.col("n").alias("n_users"),
        F.col("sy").alias("n_pos"),
        F.expr(
            "CAST((spp - 2000000 * spy) AS DECIMAL(38, 0))"
            " + CAST(sy AS DECIMAL(38, 0)) * 1000000000000"
        )
        .cast("decimal(38,0)")
        .alias("__bn"),
        "__rel_num",
        "__res_num",
    ).select(
        "n_users",
        "n_pos",
        F.expr(
            "CAST(__bn div (CAST(n_users AS DECIMAL(38, 0)) * 1000000)"
            " AS BIGINT)"
        ).alias("brier_micro"),
        F.expr(
            "CAST(__rel_num div (CAST(n_users AS DECIMAL(38, 0)) * 1000000)"
            " AS BIGINT)"
        ).alias("reliability_micro"),
        F.expr(
            "CAST(__res_num div (CAST(n_users AS DECIMAL(38, 0))"
            " * n_users * n_users) AS BIGINT)"
        ).alias("resolution_micro"),
        F.expr(
            "CAST(CAST(n_pos AS DECIMAL(38, 0)) * (n_users - n_pos)"
            " * 1000000 div (CAST(n_users AS DECIMAL(38, 0)) * n_users)"
            " AS BIGINT)"
        ).alias("uncertainty_micro"),
    )


def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the binned propensity forecasts —
    the nonparametric monotone fit every calibration stack offers next
    to Platt scaling, distributed here via the MINIMAX characterization
    instead of the sequential pool-adjacent-violators scan:

        fit(i) = max_{j ≤ i} min_{k ≥ i} avg(y over bins j..k)

    which is embarrassingly parallel over (j, k) ranges and needs no
    ordered state.  The domain is the ≤11 calibration BINS (never raw
    users), so the (j, i, k) range enumeration is bin³ ≤ 1331 rows —
    bounded by the bin domain by construction, the same contract as the
    #event-types² transition matrices.  Range averages come from bin
    prefix sums; each avg freezes once to micro by integer floor-div,
    and max-of-min over frozen integers is engine-independent.

    Output per bin: users, raw observed rate, and the isotonic fit —
    monotone non-decreasing by construction (pinned against a pure
    Python PAV in tests)."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    scored = propensity_scored(spark, sf_dir)
    # persist: the ≤11-row bin fold feeds the prefix sums AND the index
    # frame — unmaterialized, each consumer re-ran the propensity
    # fixture over the fact table (6 events scans; guide §5)
    bins = persist_tracked(
        scored.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("y").cast("long").alias("sy_b"),
        )
    )
    wp = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin",
        "n_b",
        "sy_b",
        F.sum("n_b").over(wp).alias("cn"),
        F.sum("sy_b").over(wp).alias("cy"),
    )
    lo = pref.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n_b")).alias("cn_lo"),
        (F.col("cy") - F.col("sy_b")).alias("cy_lo"),
    )
    hi = pref.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cn_hi"),
        F.col("cy").alias("cy_hi"),
    )
    ranges = (
        lo.join(hi, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.expr(
                "CAST((cy_hi - cy_lo) AS DECIMAL(38, 0)) * 1000000"
                " div CAST((cn_hi - cn_lo) AS DECIMAL(38, 0))"
            )
            .cast("long")
            .alias("avg_micro"),
        )
    )
    idx = bins.select(F.col("bin").alias("i"), "n_b", "sy_b")
    inner = (
        idx.join(
            ranges,
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(
            F.first("n_b").alias("n_b"),
            F.first("sy_b").alias("sy_b"),
            F.min("avg_micro").alias("min_avg"),
        )
    )
    fit = inner.groupBy("i").agg(
        F.first("n_b").alias("n_users"),
        F.first("sy_b").alias("n_pos"),
        F.max("min_avg").alias("isotonic_micro"),
    )
    return fit.select(
        F.col("i").alias("bin"),
        "n_users",
        F.round(F.col("n_pos") / F.col("n_users").cast("double"), 6).alias(
            "observed_rate"
        ),
        "isotonic_micro",
    ).orderBy("bin")
