"""Recommendation-model pipeline (SURVEY.md §2.9, M1–M5, M9, M12).

Re-expresses the reference's two training jobs on the star schema:

  - ALS implicit-feedback factorization (reference
    spark_jobs/batch_als_train.py:101-302): StringIndexer -> cast ->
    randomSplit(0.8/0.2, seed 42) -> ALS(implicitPrefs, nonnegative,
    coldStartStrategy="drop") -> RMSE/MAE eval -> factor export.
  - knowledge-base build (reference core-logic/train_module.py:393-424):
    co-occurrence pair counts, popularity top-K, success-profile averages —
    three DataFrames instead of a pickled dict of Python Counters.

Differences from the reference, by design (SURVEY.md §7.4):
  - the repeated-count anti-pattern is fixed with .cache() before the
    multiple actions (reference re-executes the whole scan per count,
    spark_jobs/batch_als_train.py:270-294);
  - factors keep their native array<float> type; to_json only at an
    external-sink boundary (reference stores JSON-in-TEXT,
    sql/init.sql:44-52);
  - the metrics ledger is append-only + a latest-wins window view instead
    of UPDATE ... SET is_active=FALSE (reference core-logic/
    train_module.py:110-148).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def interactions_from_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the reference's (user, item, rating) interaction table
    from the star schema: customer x part with quantity as implicit
    strength.  Mirrors the interactions fact of reference sql/init.sql:10-41
    in shape (user key, item key, numeric signal)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(F.sum("l_quantity").alias("strength"))
    )


@dataclass
class ALSResult:
    model: object
    user_factors: DataFrame
    item_factors: DataFrame
    metrics: dict = field(default_factory=dict)
    user_map: DataFrame | None = None
    item_map: DataFrame | None = None


def train_als(
    spark: SparkSession,
    sf_dir: str,
    rank: int = 10,
    max_iter: int = 5,
    reg_param: float = 0.01,
    seed: int = 42,
    evaluate: bool = True,
) -> ALSResult:
    """ALS training job — reference spark_jobs/batch_als_train.py:101-302.

    Keeps the reference's semantics: implicitPrefs=True, nonnegative=True,
    coldStartStrategy="drop" (eval rows with unseen ids vanish, reference
    :154-166), seed-42 80/20 split (:151).  Rank/iters are parameters; the
    reference's rank-50/iter-10 is the production setting, smaller defaults
    keep the test loop fast.

    Scale: ALS's block factorization shuffles by user/item blocks —
    numUserBlocks/numItemBlocks should track cluster parallelism.  The
    indexed frame is cached once and reused for split + maps (fixes the
    reference's triple re-scan).
    """
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.recommendation import ALS

    raw = interactions_from_star(spark, sf_dir)

    # reference uses StringIndexer on string ids (batch_als_train.py:127-143);
    # our keys are already integral but we keep the same two-stage pipeline so
    # string ids work unchanged.
    user_idx = StringIndexer(
        inputCol="user_id", outputCol="user_idx", handleInvalid="skip"
    ).fit(raw)
    item_idx = StringIndexer(
        inputCol="item_id", outputCol="item_idx", handleInvalid="skip"
    ).fit(raw)
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist_tracked, NOT cache+unpersist-at-return: the returned factor
    # frames and id maps are LAZY views over this frame, so unpersisting
    # before the caller's action made every downstream consumer re-run
    # the star join + both StringIndexer transforms (8 lineitem/orders
    # scans in als_top_recommendations).  The session owner releases it
    # after the action (the caching.py contract).
    indexed = persist_tracked(
        item_idx.transform(user_idx.transform(raw))
        .withColumn("user_idx", F.col("user_idx").cast("int"))
        .withColumn("item_idx", F.col("item_idx").cast("int"))
    )

    train, test = indexed.randomSplit([0.8, 0.2], seed=seed)
    als = ALS(
        userCol="user_idx",
        itemCol="item_idx",
        ratingCol="strength",
        implicitPrefs=True,
        nonnegative=True,
        coldStartStrategy="drop",
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
    )
    model = als.fit(train)

    metrics: dict = {}
    if evaluate:
        for split_name, split_df in (("train", train), ("test", test)):
            preds = model.transform(split_df)
            for metric in ("rmse", "mae"):
                evaluator = RegressionEvaluator(
                    metricName=metric, labelCol="strength", predictionCol="prediction"
                )
                metrics[f"{split_name}_{metric}"] = evaluator.evaluate(preds)

    # factor export joined back to original ids — reference
    # batch_als_train.py:213-234; id maps are small => broadcast joins.
    user_map = indexed.select("user_id", "user_idx").distinct()
    item_map = indexed.select("item_id", "item_idx").distinct()
    user_factors = model.userFactors.join(
        F.broadcast(user_map), model.userFactors.id == user_map.user_idx
    ).select("user_id", "features")
    item_factors = model.itemFactors.join(
        F.broadcast(item_map), model.itemFactors.id == item_map.item_idx
    ).select("item_id", "features")
    return ALSResult(model, user_factors, item_factors, metrics, user_map, item_map)


def als_top_recommendations(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k item recommendations per user from the trained ALS model —
    the engine-native form of the consumer's per-event candidate scoring
    against ALS factors (SURVEY.md M8/M10; the reference exports factors
    and scores in Python, run_consumer.py:261-330).

    Scale: recommendForAllUsers is a blocked factor cross-product with
    per-block top-k pruning inside MLlib — no n_users x n_items
    materialization.  Output maps idx back to real ids via broadcast.
    """
    result = train_als(spark, sf_dir, rank=8, max_iter=5, evaluate=False)
    recs = result.model.recommendForAllUsers(k)
    exploded = recs.select(
        "user_idx", F.posexplode("recommendations").alias("rank0", "rec")
    ).select(
        "user_idx",
        (F.col("rank0") + 1).alias("rank"),
        F.col("rec.item_idx").alias("item_idx"),
        F.round(F.col("rec.rating"), 6).alias("score"),
    )
    return (
        exploded.join(F.broadcast(result.user_map), "user_idx")
        .join(F.broadcast(result.item_map), "item_idx")
        .select("user_id", "item_id", "rank", "score")
        .orderBy("user_id", "rank")
    )


def als_recommendation_profile(
    spark: SparkSession, sf_dir: str, k: int = 5, min_coverage: float = 0.90
) -> DataFrame:
    """Driver-checkable invariant profile of the ALS top-k surface (M8/M10).

    ALS is iterative and seeded inside the engine, so the raw rec rows
    (:func:`als_top_recommendations`, tested in tests/test_ml.py) cannot be
    reproduced by a SQL oracle.  What CAN be checked exactly is (a) data
    anchors the oracle recomputes from the star schema — distinct user /
    item counts of the interactions frame — and (b) structural invariants
    any correct ALS top-k must satisfy, emitted as booleans the oracle
    asserts as literal TRUE (the approx_profile pattern,
    operators/relational.py):

      k_per_user_ok       every covered user has exactly k recs
      ranks_ok            per-user ranks are exactly 1..k
      scores_monotone_ok  score is non-increasing in rank
      scores_nonneg_ok    nonnegative=True factors => nonnegative scores
      items_known_ok      every recommended item exists in interactions
      coverage_ok         >= min_coverage of interaction users got recs
                          (users whose few interactions all fall in the
                          20% eval split have no factors — coverage is
                          high but not guaranteed 100%)
    """
    recs = als_top_recommendations(spark, sf_dir, k=k)
    inter = interactions_from_star(spark, sf_dir)
    anchors = inter.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("item_id").alias("n_items"),
    )

    # monotone: rank is the positional order of recommendForAllUsers'
    # score-sorted array, so scores sorted by rank must be sorted desc
    w = Window.partitionBy("user_id").orderBy("rank")
    with_prev = recs.withColumn("__prev", F.lag("score").over(w))
    per_user = with_prev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_recs"),
        F.max("rank").alias("max_rank"),
        F.count_distinct("rank").alias("n_ranks"),
        F.min(
            F.when(
                F.col("__prev").isNull() | (F.col("score") <= F.col("__prev")), 1
            ).otherwise(0)
        ).alias("mono_ok"),
    )
    unknown_items = recs.join(
        inter.select(F.col("item_id")).distinct(), "item_id", "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_unknown"))

    checks = per_user.agg(
        F.count(F.lit(1)).alias("users_with_recs"),
        (F.min("n_recs") == k).alias("__k_min"),
        (F.max("n_recs") == k).alias("__k_max"),
        ((F.min("max_rank") == k) & (F.min("n_ranks") == k)).alias("ranks_ok"),
        (F.min("mono_ok") == 1).alias("scores_monotone_ok"),
    )
    score_ok = recs.agg((F.min("score") >= 0.0).alias("scores_nonneg_ok"))

    return (
        anchors.crossJoin(checks)
        .crossJoin(score_ok)
        .crossJoin(unknown_items)
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_items").cast("long").alias("n_items"),
            (F.col("__k_min") & F.col("__k_max")).alias("k_per_user_ok"),
            "ranks_ok",
            "scores_monotone_ok",
            "scores_nonneg_ok",
            (F.col("n_unknown") == 0).alias("items_known_ok"),
            (
                F.col("users_with_recs")
                >= F.lit(min_coverage) * F.col("n_users")
            ).alias("coverage_ok"),
        )
    )


def als_factor_profile(
    spark: SparkSession, sf_dir: str, rank: int = 8, min_coverage: float = 0.90
) -> DataFrame:
    """Driver-checkable invariant profile of the factor-export surface
    (F11/F12 + M4): dimensionality, nonnegativity, finiteness and JSON
    export shape of the trained user factors, plus the same interaction
    anchors/coverage as :func:`als_recommendation_profile`.  Raw factor
    values are engine-seeded — booleans + anchors are what a SQL oracle
    can assert."""
    result = train_als(spark, sf_dir, rank=rank, max_iter=5, evaluate=False)
    inter = interactions_from_star(spark, sf_dir)
    anchors = inter.agg(F.count_distinct("user_id").alias("n_users"))

    per_factor = result.user_factors.select(
        F.size("features").alias("dim"),
        F.exists("features", lambda x: F.isnan(x.cast("double"))).alias("has_nan"),
        F.exists("features", lambda x: x.cast("double") < 0.0).alias("has_neg"),
        F.length(F.to_json("features")).alias("json_len"),
    )
    checks = per_factor.agg(
        F.count(F.lit(1)).alias("n_factor_rows"),
        ((F.min("dim") == rank) & (F.max("dim") == rank)).alias("dims_ok"),
        (F.sum(F.col("has_nan").cast("int")) == 0).alias("finite_ok"),
        (F.sum(F.col("has_neg").cast("int")) == 0).alias("nonneg_ok"),
        # a serialized rank-8 float array is at least "[0,0,0,0,0,0,0,0]"
        (F.min("json_len") >= 2 * rank + 1).alias("json_export_ok"),
    )
    return anchors.crossJoin(checks).select(
        F.col("n_users").cast("long").alias("n_users"),
        "dims_ok",
        "finite_ok",
        "nonneg_ok",
        "json_export_ok",
        (F.col("n_factor_rows") >= F.lit(min_coverage) * F.col("n_users")).alias(
            "coverage_ok"
        ),
    )


def factors_as_json(factors: DataFrame, id_col: str) -> DataFrame:
    """JSON-at-the-boundary export — the reference stores factor arrays as
    JSON text (sql/init.sql:44-52 via batch_als_train.py:222,232).  Only
    the sink serializes; internal type stays array<float>."""
    return factors.select(id_col, F.to_json("features").alias("features_json"))


# --------------------------------------------------------------------------
# Knowledge base (M9): three DataFrames replacing the pickled dict
# --------------------------------------------------------------------------
def kb_pair_counts(spark: SparkSession, sf_dir: str, top_n: int = 1000) -> DataFrame:
    """Item co-occurrence counts — reference builds Counter[(c1,c2)] in a
    driver loop (core-logic/train_module.py:396-405); distributed form is
    the J4 self-join (operators/relational.py:cooccurrence_pairs)."""
    from project_bigdata_recsys_spark.operators.relational import cooccurrence_pairs

    return cooccurrence_pairs(spark, sf_dir).limit(top_n)


def kb_popular_items(spark: SparkSession, sf_dir: str, top_n: int = 50) -> DataFrame:
    """Popularity top-K — reference value_counts().head(50)
    (core-logic/train_module.py:411-413)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(top_n)
    )


def kb_success_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global success-cohort feature means — reference
    success_users[ACTION_COLS].mean() (core-logic/train_module.py:407-409).
    Here: mean order stats over fulfilled orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").agg(
        F.round(
            sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir)
            / F.count(F.lit(1))
            / 100.0,
            4,
        ).alias("avg_totalprice"),
        F.count(F.lit(1)).alias("n_success"),
    )


# --------------------------------------------------------------------------
# Artifact versioning & retention (M13)
# --------------------------------------------------------------------------
def save_versioned_artifacts(
    result: ALSResult,
    base_dir: str,
    version: str,
    keep_n: int = 5,
) -> str:
    """Save the training run's artifacts under ``base_dir/version/`` and
    prune old versions, keeping the most recent ``keep_n`` — the
    reference's save_versioned_artifacts + cleanup_old_versions
    (core-logic/train_module.py:160-204; KEEP_N_VERSIONS knob
    airflow/dags/recsys_pipeline.py:168-172).

    Artifacts: the MLlib ALS model (its own save format — distributed
    parquet under the hood, reloadable with ALSModel.load), both factor
    tables as parquet, and a metrics JSON.  ``version`` must sort
    lexicographically by recency (e.g. ``v2026-08-13T0400``) — retention
    sorts names descending exactly like the reference; pass it in rather
    than reading a clock so runs stay deterministic (SURVEY.md §7.4.4).

    Scale: factor tables write distributed (one parquet job each); only
    directory listing and deletes run on the driver, and those are O(name
    count), not data.
    """
    import json
    import os

    version_dir = os.path.join(base_dir, version)
    if result.model is not None:
        result.model.write().overwrite().save(os.path.join(version_dir, "als_model"))
    result.user_factors.write.mode("overwrite").parquet(
        os.path.join(version_dir, "user_factors.parquet")
    )
    result.item_factors.write.mode("overwrite").parquet(
        os.path.join(version_dir, "item_factors.parquet")
    )
    os.makedirs(version_dir, exist_ok=True)
    with open(os.path.join(version_dir, "metrics.json"), "w") as f:
        json.dump(result.metrics, f, sort_keys=True)
    cleanup_old_versions(base_dir, keep_n)
    return version_dir


def cleanup_old_versions(base_dir: str, keep_n: int = 5) -> list[str]:
    """Remove version directories beyond the most recent ``keep_n``
    (name-descending order, as the reference sorts) and return the names
    removed — reference core-logic/train_module.py:187-204."""
    import os
    import shutil

    versions = sorted(
        (
            d
            for d in os.listdir(base_dir)
            if os.path.isdir(os.path.join(base_dir, d))
        ),
        reverse=True,
    )
    removed = versions[keep_n:]
    for name in removed:
        shutil.rmtree(os.path.join(base_dir, name))
    return removed


# --------------------------------------------------------------------------
# Training-history ledger (M12): append-only + latest-wins view
# --------------------------------------------------------------------------
LEDGER_COLUMNS = [
    "model_name",
    "model_version",
    "metrics_json",
    "hyperparameters_json",
    "created_at",
]


def ledger_append(
    spark: SparkSession,
    existing: DataFrame | None,
    model_name: str,
    model_version: str,
    metrics: dict,
    hyperparameters: dict,
    created_at: str,
) -> DataFrame:
    """Append a training-run row — replaces the reference's transactional
    deactivate-then-insert (core-logic/train_module.py:106-157).  The
    'active' model is *derived* (latest_active_view), never mutated, so no
    UPDATE capability is needed.  ``created_at`` is a parameter, not
    wall-clock, to stay deterministic (SURVEY.md §7.4.4)."""
    import json

    row = spark.createDataFrame(
        [
            (
                model_name,
                model_version,
                json.dumps(metrics, sort_keys=True),
                json.dumps(hyperparameters, sort_keys=True),
                created_at,
            )
        ],
        schema="model_name string, model_version string, metrics_json string, "
        "hyperparameters_json string, created_at string",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    if existing is None:
        return row
    return existing.unionByName(row)


def latest_active_view(ledger: DataFrame) -> DataFrame:
    """Latest row per model_name — the reference's partial index on
    is_active (sql/init.sql:80-82) becomes a row_number window."""
    w = Window.partitionBy("model_name").orderBy(
        F.desc("created_at"), F.desc("model_version")
    )
    return ledger.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def metric_drift(ledger: DataFrame, metric_key: str) -> DataFrame:
    """Latest-vs-previous metric drift per model — reference
    dashboard/app.py:2476-2536 (pandas iloc[-1] vs iloc[-2])."""
    w = Window.partitionBy("model_name").orderBy(F.asc("created_at"))
    with_metric = ledger.withColumn(
        "metric_value",
        F.get_json_object("metrics_json", f"$.{metric_key}").cast("double"),
    )
    return (
        with_metric.withColumn("prev_value", F.lag("metric_value").over(w))
        .filter(F.col("prev_value").isNotNull())
        .select(
            "model_name",
            "model_version",
            "metric_value",
            "prev_value",
            F.round(
                (F.col("metric_value") - F.col("prev_value"))
                * 100.0
                / F.col("prev_value"),
                4,
            ).alias("drift_pct"),
        )
    )


def negative_samples(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    oversample: int = 2,
    limit: int = 500,
) -> DataFrame:
    """Deterministic NEGATIVE sampling for implicit-feedback training —
    the missing half of every ALS/classifier training set (positives
    come free from interactions; negatives must be items the user never
    touched, drawn reproducibly or the training set changes under every
    rerun).  Per user: ``k * oversample`` candidate items from md5
    draws over the dense item-id space, positives removed by anti-join,
    first ``k`` survivors kept in slot order.  Every step is
    data-derived (hash_uniform discipline), so the exact sampled pairs
    reproduce in any engine — no F.rand, no seed drift.

    Scale: the candidate frame is |users| x (k*oversample) — NEVER
    users x items; the anti-join co-partitions on (user_id, item_id);
    the keep-first-k window keys per user.  Collisions with positives
    only cost draws when a user has touched a meaningful fraction of
    the catalog, which is precisely when negative sampling stops making
    sense.  Item-id space rides along as a broadcast 1-row max (the
    tfidf N trick) — one job."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    n_items = li.agg(F.max("l_partkey").alias("n_items"))
    slots = (
        pos.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(n_items))
        .select(
            "user_id",
            "n_items",
            F.explode(
                F.sequence(F.lit(0), F.lit(k * oversample - 1))
            ).alias("slot"),
        )
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("neg:"),
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = slots.select(
        "user_id", "slot", (draw % F.col("n_items") + 1).alias("item_id")
    )
    neg = cand.join(pos, ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy("slot")
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("user_id", F.col("slot").cast("int").alias("slot"), "item_id")
        .orderBy("user_id", "slot")
        .limit(limit)
    )
