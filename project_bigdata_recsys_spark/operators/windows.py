"""Window-function operators (SURVEY.md §2.5).

The reference contains **zero** window functions — every top-N-per-group /
latest-per-key / version-over-version computation is done with flags +
UPDATEs, pandas ``iloc``, or Python sorts.  These builders are the
engine-native replacements, each mapped to the reference computation it
subsumes.

Scale: a window over PARTITION BY k is one shuffle on k; ranking within the
partition is streaming (no materialization of the full frame) for
row_number/rank/lag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key via row_number — replaces the reference's
    mutable ``is_active`` flag + ``UPDATE ... SET is_active=FALSE`` ledger
    dance (core-logic/train_module.py:110-148; sql/init.sql:80-82).
    Append-only + latest-wins view needs no UPDATE support at all."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_order_date"),
            "o_totalprice",
        )
        .orderBy("o_custkey")
    )


def drift_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-vs-previous delta via lag() — replaces the reference's drift
    detection comparing ``iloc[-1]`` vs ``iloc[-2]`` of training history in
    pandas (dashboard/app.py:2476-2536).  Emits per-customer order-price
    drift; >5%-style movement checks become a simple filter on delta_pct."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.withColumn("prev_price", F.lag("o_totalprice").over(w))
        .filter(F.col("prev_price").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") - F.col("prev_price"), 2).alias("delta"),
            F.round(
                (F.col("o_totalprice") - F.col("prev_price"))
                * 100.0
                / F.col("prev_price"),
                4,
            ).alias("delta_pct"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    )


def power_user_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking over aggregates — replaces the reference's "power users"
    pandas filter+sort (dashboard/app.py:1276-1330).  dense_rank over the
    order count; deterministic because ties share a rank and no LIMIT cuts
    inside a tie group.

    Scale: NO global window anywhere (round-2 shipped
    ``Window.orderBy(desc(n_orders))`` — one fat partition at 100 TB).
    dense_rank depends only on the DISTINCT n_orders values, and the
    ``n_orders > 5`` filter commutes with it (every filtered-out row has
    a strictly smaller count than every survivor, so survivor ranks are
    unchanged).  So: filter first, collapse the distinct counts — at
    most max-orders-per-customer values, bounded regardless of corpus
    size — into one desc-sorted array (partial-aggregated collect_set),
    posexplode it into a (rank, value) map, and broadcast the map back.
    The per-customer aggregate stays fully parallel; dense rank of a
    distinct value IS its position in the sorted distinct set."""
    orders = load_table(spark, sf_dir, "orders")
    per_user = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact integer-cent sum (order-independent; see snapshot.py note)
        F.round(
            sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2
        ).alias("total_spend"),
    ).filter(F.col("n_orders") > 5)
    rank_map = (
        per_user.agg(
            F.sort_array(F.collect_set("n_orders"), asc=False).alias("vals")
        )
        .select(F.posexplode("vals").alias("rank0", "n_orders"))
        .select(
            "n_orders", (F.col("rank0") + 1).cast("int").alias("activity_rank")
        )
    )
    return (
        per_user.join(F.broadcast(rank_map), "n_orders")
        .select("o_custkey", "n_orders", "total_spend", "activity_rank")
        .orderBy(F.asc("activity_rank"), F.asc("o_custkey"))
    )


def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per key — the reference sorts candidate scores in Python and
    slices 5 per event (core-logic/run_consumer.py:303,330).  Engine-native:
    row_number over (key ORDER BY metric) <= N.  One shuffle on the key;
    no global sort."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("l_suppkey", "rn", "l_orderkey", "l_partkey", "l_extendedprice")
        .orderBy("l_suppkey", "rn")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (gaps-and-islands) — the reference receives
    session features pre-computed offline (sql/init.sql:36-37, T9) and
    never computes them.  Native form: lag() to flag gaps > threshold,
    running sum to number sessions, then per-session aggregates.

    This is the batch-equivalent of ``session_window`` in
    streaming/windows.py — kept as windows so the DuckDB oracle can express
    the identical computation.  The gap predicate is ``>=`` to match
    Spark's ``session_window`` half-open [start, last+gap) semantics: an
    event landing exactly at prev_ts + gap starts a NEW session, so the
    batch and streaming session operators agree at the boundary.
    """
    events = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    flagged = events.withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") >= F.col("prev_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(sum_fixed(F.round(F.col("value") * 1000000).cast("long"), sf_dir=sf_dir) / 1000000.0, 4).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame aggregate (rowsBetween) — beyond reference parity
    (SURVEY.md §2.5 notes frame specs unused there) but core engine
    capability: running spend per customer over order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0, 2).alias(
                "running_spend"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    )


def moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: 30-day trailing average order value per
    customer, framed on the *value* axis (rangeBetween over epoch days)
    rather than row counts — the frame spec SURVEY.md §2.5 notes the
    reference never uses.  Same single shuffle as any per-customer
    window."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
                / F.count(F.lit(1)).over(w)
                / 100.0,
                4,
            ).alias("avg_30d"),
            F.count(F.lit(1)).over(w).alias("n_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    )


def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customer balances per
    nation — the distribution-analytic family (completes the ranking
    inventory beyond row_number/rank/dense_rank)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_nationkey", "c_custkey")
        .limit(2000)
    )


def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() — days until the customer's next order (lag's forward
    sibling, used by the drift view in reverse; completes the analytic
    pair)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.datediff(
                F.lead("o_orderdate").over(w), F.col("o_orderdate")
            ).alias("days_to_next"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    )


def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median over a trailing 10-row window per customer — an
    aggregate function used as a framed window function (the holistic-
    aggregate-in-window case; approx sketches are the 100 TB variant
    when the frame is huge)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderkey"))
        .rowsBetween(-9, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.expr("percentile(o_totalprice, 0.5)").over(w), 4
            ).alias("rolling_median"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    )


def deterministic_group_sample(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """K rows per group, pseudo-randomly but deterministically chosen:
    rank by md5(key) inside each group (identical across engines, unlike
    rand(seed)) — the oracle-checkable form of per-group sampling (the
    reference samples with ORDER BY RANDOM() LIMIT n,
    scripts/modify_training_data.py:43-51)."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    w = Window.partitionBy("o_custkey").orderBy(h.asc(), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


def session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization parameter-sensitivity sweep: session counts and
    mean lengths at inactivity gaps of 10/30/60 minutes from ONE pass
    over the per-user event deltas — the calibration table that turns
    'we use 30 minutes because everyone does' into a measured choice
    (if 10 and 60 give nearly the same session count, the corpus is
    insensitive and any gap is safe; a steep slope means sessions are
    an artifact of the parameter).

    Exactness: deltas are integer seconds from one user-partitioned
    lag window; per-gap session counts are integer sums (#users +
    #breaks); means divide once, rounded 4 dp.

    Scale: one lag window (user-partitioned), one aggregation per gap
    over the SAME delta frame — the sweep never rescans the fact
    table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        "user_id",
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w)
        ).alias("dt"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    deltas = persist_tracked(deltas)
    totals = deltas.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("dt").isNull().cast("int")).cast("long").alias("n_users"),
    )
    out = None
    for gap_min in (10, 30, 60):
        gap_s = gap_min * 60
        breaks = deltas.agg(
            F.sum((F.col("dt") > gap_s).cast("int")).cast("long").alias(
                "n_breaks"
            )
        )
        row = (
            breaks.crossJoin(F.broadcast(totals))
            .select(
                F.lit(gap_min).cast("int").alias("gap_minutes"),
                (F.col("n_users") + F.col("n_breaks"))
                .cast("long")
                .alias("n_sessions"),
                F.round(
                    F.col("n_events")
                    / (F.col("n_users") + F.col("n_breaks")).cast("double"),
                    4,
                ).alias("avg_events_per_session"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("gap_minutes")
