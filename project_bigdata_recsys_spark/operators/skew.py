"""Skew-mitigation joins — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins after a shuffle materializes.  Salting is the
plan-level alternative when a key's row count is so pathological (a
power-law user, a null-like sentinel) that even a split partition
overwhelms one task: replicate the small side R times and scatter the
big side's hot keys across R salt buckets, so the hot key's rows spread
over R tasks instead of one.

The reference never joins at a scale where this matters; at 100 TB a
handful of hot keys routinely dominate a shuffle, so the engine carries
the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⨝ small on key`` with the big side salted.

    big rows get a random salt in [0, salt_buckets); the small side is
    exploded across all salt values (small × R rows — acceptable because
    the small side is broadcast-sized by contract).  Join on (key, salt)
    then drop the salt.  Result is row-identical to a plain join; only
    the partitioning of the shuffle changes.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(spark, sf_dir: str, top_k: int = 5):
    """Hot-key diagnostic: for each candidate join/shuffle key of the
    fact table, the top-K heaviest keys with their share of the table
    and the key's skew factor (max key count / mean key count) — the
    report that decides between AQE skew-split (moderate skew) and
    :func:`salted_join` (pathological keys).

    One aggregation per key column, unioned; each is a partial-agg
    Tungsten groupBy followed by a TakeOrdered top-K — no global sort.
    Deterministic, so the driver oracle hash-checks it.
    """
    from project_bigdata_recsys_spark.catalog import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    n_rows_frame = lineitem.agg(F.count(F.lit(1)).alias("__n"))
    reports = []
    for key in ("l_orderkey", "l_partkey", "l_suppkey"):
        per_key = lineitem.groupBy(F.col(key).cast("long").alias("key")).agg(
            F.count(F.lit(1)).alias("n")
        )
        stats = per_key.agg(
            F.max("n").alias("__max_n"),
            F.avg("n").alias("__avg_n"),
        )
        top = (
            per_key.crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(n_rows_frame))
            .select(
                F.lit(key).alias("join_key"),
                "key",
                "n",
                F.round(F.col("n") * 100.0 / F.col("__n"), 4).alias("pct_of_table"),
                F.round(F.col("__max_n") / F.col("__avg_n"), 4).alias("skew_factor"),
            )
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(top_k)
        )
        reports.append(top)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("join_key", F.desc("n"), F.asc("key"))


def salted_join_agg(spark, sf_dir: str, salt_buckets: int = 8):
    """Gate form of :func:`salted_join` — per-segment activity rollup
    where the fact-side shuffle is salted: events join the customer dim
    on the salted key pair, so a pathological hot user spreads over
    ``salt_buckets`` tasks instead of stalling one.  The dim side is
    hinted ``shuffle_hash`` because salting only changes anything for a
    SHUFFLE join — under a broadcast the big side never moves and the
    salt is dead weight (the hint is the demo's point, not a general
    recommendation; AQE picks broadcast for a dim this small, and
    production uses salting only past broadcast thresholds).

    Row-identical to the plain join by construction (the salt is an
    equi-key refinement, then dropped), which is exactly what the
    oracle checks; value sums fold in integer cents.

    Scale: shuffle keyed on (user_id, salt) — hot-key rows fan out;
    dim replicates ×salt_buckets (broadcast-sized by contract)."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        ev, dim.hint("shuffle_hash"), "user_id", salt_buckets
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("vc") / 100.0, 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


def rendezvous_shard_plan(spark, sf_dir: str, n_shards: int = 8):
    """Rendezvous (highest-random-weight) sharding plan — the
    consistent-assignment scheme for stateful key placement (stream
    state stores, embedding-index shards, cache ownership): each key
    goes to argmax_w md5(key, w), so adding a worker moves only ~1/(W+1)
    of the keys — versus key % W, which reshuffles almost everything.
    This audit scores the W → W+1 expansion on the real key population:
    per-shard load before and after, plus the measured moved fraction
    against the theoretical 1/(W+1).

    All arithmetic is md5-integer; the argmax is a (hash DESC, w DESC)
    row_number per key — windows partition by key, never global.

    Output per shard of the EXPANDED ring: shard, n_keys_before (NULL
    for the new shard), n_keys_after, plus the constant audit columns
    n_keys_total, moved_frac, expected_moved_frac."""
    from project_bigdata_recsys_spark.catalog import load_table

    from pyspark.sql import Window

    keys = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
    )
    hw = keys.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(n_shards))).alias("w"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("key").cast("string"),
                        F.lit("@"),
                        F.col("w").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: hw feeds BOTH ring assignments (each re-ran the distinct
    # + explode + md5 otherwise), and the joined assignment feeds the
    # audit plus both per-shard rollups (3 consumers re-running both
    # windows; guide §5).  Rows: |keys| × (W+1) narrow / |keys| × 3.
    hw = persist_tracked(hw)
    w_all = Window.partitionBy("key").orderBy(F.desc("h"), F.desc("w"))
    after = (
        hw.withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") == 1)
        .select("key", F.col("w").alias("shard_after"))
    )
    w_old = Window.partitionBy("key").orderBy(F.desc("h"), F.desc("w"))
    before = (
        hw.filter(F.col("w") < n_shards)
        .withColumn("rn", F.row_number().over(w_old))
        .filter(F.col("rn") == 1)
        .select("key", F.col("w").alias("shard_before"))
    )
    assigned = persist_tracked(after.join(before, "key"))
    audit = assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_total"),
        F.round(
            F.sum(
                (F.col("shard_after") != F.col("shard_before")).cast("int")
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("moved_frac"),
        F.round(F.lit(1.0) / (n_shards + 1), 6).alias(
            "expected_moved_frac"
        ),
    )
    cnt_after = assigned.groupBy(
        F.col("shard_after").alias("shard")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_keys_after"))
    cnt_before = assigned.groupBy(
        F.col("shard_before").alias("shard")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_keys_before"))
    return (
        cnt_after.join(cnt_before, "shard", "left")
        .crossJoin(F.broadcast(audit))
        .select(
            "shard",
            "n_keys_before",
            "n_keys_after",
            "n_keys_total",
            "moved_frac",
            "expected_moved_frac",
        )
        .orderBy("shard")
    )


def skew_salt_advisor(
    spark, sf_dir: str, hot_factor: int = 4, max_salts: int = 32, top_k: int = 20
):
    """The PLANNER companion to :func:`salted_join`: given a join-key
    histogram, recommend a per-key salt factor — the artifact an ops
    review reads before turning salting on (skew_report says WHICH keys
    are hot; this says WHAT to do about each).

    Planted skew (the planted-data discipline — the synthetic corpus is
    deliberately uniform, so pathological keys are planted): ~25% of
    lineitem rows remap to sentinel key 1 and ~10% to key 2 (md5 cohort,
    salt ``skew:``), the power-law-user / null-sentinel shape AQE's
    split cannot fully absorb.

    Rule: a key is HOT when its row count >= ``hot_factor`` × the exact
    lower median per-key count (median via histogram-cumsum order
    statistic, never an approximate percentile); its salt factor is
    ceil(count / (hot_factor × median)) capped at ``max_salts`` — i.e.
    spread the key until each salt bucket carries at most a
    hot-threshold's worth of rows.

    Scale: one key aggregation; the median reads a count-of-counts
    histogram (value-domain bounded, audited global window); the
    readout is a top-k heap."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    u = hash_uniform(
        F.col("l_orderkey") * 16 + F.col("l_linenumber"), "skew:"
    )
    keyed = li.select(
        F.when(u < 0.25, F.lit(1))
        .when(u < 0.35, F.lit(2))
        .otherwise(F.col("l_suppkey"))
        .cast("long")
        .alias("key")
    )
    per_key = keyed.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return salt_plan_from_counts(per_key, hot_factor, max_salts, top_k)


def salt_plan_from_counts(
    per_key, hot_factor: int = 4, max_salts: int = 32, top_k: int = 20
):
    """The advisor kernel over a (key, n) count frame — shared by
    skew_salt_advisor (one scan) and stream_skew_monitor (counts folded
    from a per-batch ledger; counts merge exactly, so the plan is a
    pure function of the histogram and the batch oracle is inherited
    verbatim)."""
    from pyspark.sql import Window

    hist = per_key.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("keys_at_n")
    )
    wcum = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_key.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    med = (
        hist.withColumn("cum", F.sum("keys_at_n").over(wcum))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 2 >= F.col("n_keys") + 1)
        .agg(F.min("n").cast("long").alias("median_n"))
    )
    return (
        per_key.crossJoin(F.broadcast(med))
        .filter(F.col("n") >= F.col("median_n") * hot_factor)
        .select(
            "key",
            F.col("n").alias("n_rows"),
            "median_n",
            F.expr(
                "CAST(n AS DECIMAL(38, 0)) * 1000000"
                " div CAST(median_n AS DECIMAL(38, 0))"
            )
            .cast("long")
            .alias("skew_ratio_micro"),
            F.least(
                F.expr(
                    f"CAST((n + {hot_factor} * median_n - 1)"
                    f" div ({hot_factor} * median_n) AS BIGINT)"
                ),
                F.lit(max_salts).cast("long"),
            ).alias("n_salts"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_k)
    )
