"""Batch relational operators (SURVEY.md §2.2–§2.4, §2.6–§2.8).

Each function is a query builder ``(spark, sf_dir) -> DataFrame`` that
re-expresses one of the reference's analytic computations (the ~12 dashboard
SQL queries, the ETL predicates, the trainer's pandas aggregations) on the
driver's star schema.  Reference citations are in each docstring.

Design rules applied throughout:
  - Declarative DataFrame API only — Catalyst does pushdown/pruning/join
    selection.  No ``collect()``-and-loop anywhere.
  - Every computed column is aliased so the DuckDB oracle can match it.
  - Floating aggregates are rounded so order-of-summation noise cannot break
    the order-insensitive value hash.
  - Every LIMIT query has a *total* ordering (unique tiebreak column) so the
    selected row set is deterministic across engines.
  - Small dimensions are broadcast explicitly (scale: avoids shuffling the
    fact side; at 100 TB lineitem never moves for a nation/region join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


# --------------------------------------------------------------------------
# §2.4 A4/A5/A11 + §2.6 O1 — the flagship "course stats" shape
# --------------------------------------------------------------------------
def course_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part enrollment/pass/fail stats with derived pass-rate, top-50.

    Re-expresses the reference dashboard's per-course enrollment query
    (reference dashboard/app.py:301-320): scan -> join -> conditional agg
    (SUM(CASE WHEN ...)) -> AVG -> derived ratio -> ORDER BY ... LIMIT 50.

    Scale: join key is l_orderkey/o_orderkey (both fact tables) — a shuffle
    hash/sort-merge join that AQE will size; the per-part aggregation does
    map-side partial aggregation before the shuffle.  Top-50 compiles to
    TakeOrderedAndProject (no global sort).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("attempts"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("passed"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("failed"),
            F.round(F.avg("l_quantity"), 4).alias("avg_quantity"),
            F.round(
                sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir)
                / F.count(F.lit(1))
                / 100.0,
                4,
            ).alias("avg_price"),
        )
        .withColumn(
            "pass_rate",
            F.round(F.col("passed") * 100.0 / F.col("attempts"), 4),
        )
        .orderBy(F.desc("attempts"), F.asc("l_partkey"))
        .limit(50)
    )


def label_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY label + COUNT — reference dashboard/app.py:227-241
    (label distribution over ``interactions.truth``)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


def user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join dim<-fact then per-user aggregates, top-100 by activity.

    Reference dashboard/app.py:337-351 (users LEFT JOIN interactions,
    GROUP BY user, ORDER BY activity DESC LIMIT 100).  customer is the
    smaller side but left-join direction requires customer as build side;
    at scale customer still shuffles — acceptable because the aggregation
    output is bounded by |customer|.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # exact integer-cent sums (order-independent; see snapshot.py)
            F.round(
                F.coalesce(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir), F.lit(0)) / 100.0, 2
            ).alias("total_spend"),
        )
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
        .limit(100)
    )


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) — reference dashboard/app.py:244-246,
    core-logic/train_module.py:267-268 (nunique of users/courses)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation — reference
    dashboard/app.py:301-314 (SUM(CASE WHEN truth=0 ...) AS pass_count).

    Map-side partial aggregation keeps the shuffle tiny regardless of
    input size: |groups| = |returnflag| = 3.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_o"),
            F.round(F.sum(F.col("l_quantity")), 2).alias("sum_qty"),
            # 4dp-exact fixed-point sum / cent-exact avg (order-independent)
            F.round(sum_fixed(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long"), sf_dir=sf_dir) / 10000.0, 2).alias("sum_disc_price"),
            F.round(
                sum_fixed(F.round(F.col("l_discount") * 100).cast("long"), sf_dir=sf_dir)
                / F.count(F.lit(1))
                / 100.0,
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag")
    )


def time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range predicate + aggregate — reference dashboard/app.py:2176-2199
    (``created_at > NOW() - INTERVAL 'x days'``) with a fixed literal so the
    result is deterministic.  The filter is pushed to the parquet scan
    (PushedFilters in .explain) — at 100 TB with date-partitioned data this
    becomes partition pruning.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def derived_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column arithmetic projection — reference
    dashboard/app.py:318-320, 1308-1314 (pass_rate, total_attempts) and
    core-logic/run_consumer.py:278-294 (blended feature arithmetic).
    Pure narrow transformation: no shuffle at all.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 0.3, 4).alias("blended_low"),
            F.round(F.col("o_totalprice") * 0.7, 4).alias("blended_high"),
            (F.col("o_orderkey") % 7).alias("bucket"),
            F.when(F.col("o_totalprice") > 100000.0, "high")
            .when(F.col("o_totalprice") > 50000.0, "mid")
            .otherwise("low")
            .alias("tier"),
        )
        .orderBy(F.asc("o_orderkey"))
        .limit(1000)
    )


def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... DESC LIMIT N — reference dashboard/app.py:281-283,
    313-314 and pandas ``nlargest`` (dashboard/app.py:1183).  Spark plans
    this as TakeOrderedAndProject: each partition keeps a 20-row heap, the
    driver merges — O(n) not O(n log n), no global sort even at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-default projection + NOT-NULL / set-membership filters —
    reference core-logic/train_module.py:251-254,297-301 (fillna(0),
    y.isin([0,1])) and dashboard/app.py:228-233 (WHERE truth IS NOT NULL).

    The star schema has no NULL columns, so the null path is exercised via
    a LEFT join that manufactures them: customers with no orders get
    coalesced defaults.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .groupBy("c_custkey")
        .agg(
            F.sum(
                F.when(F.col("o_orderkey").isNotNull(), 1).otherwise(0)
            ).alias("n_orders"),
            F.round(
                F.coalesce(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir), F.lit(0)) / 100.0, 2
            ).alias("spend"),
        )
        .filter(F.col("n_orders") >= 0)
        .orderBy(F.asc("c_custkey"))
        .limit(500)
    )


def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way equi-join revenue rollup (TPC-H Q5 shape) — the reference has
    only 2-way joins (SURVEY.md §2.3) but its dashboard composes
    users⨝interactions⨝history; this exercises Catalyst join reordering +
    broadcast selection in one plan.

    Scale: nation/region/supplier are broadcast (no shuffle of the fact
    side for dims); lineitem⨝orders⨝customer shuffle on their keys; AQE
    picks the final strategy at runtime.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                sum_fixed(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long"), sf_dir=sf_dir) / 10000.0, 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grand total — reference computes grand totals by
    re-summing group results in pandas (dashboard/app.py:1270-1274, A12);
    the native operator is a single-pass rollup."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_last("l_returnflag"))
    )


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface (SURVEY.md §2.8): date formatting (F4),
    string slice (F5), rounding (F7), arithmetic (F8), clamp (F9),
    conditional tiers (F10), epoch conversion (F3).
    All whole-stage-codegen'd column expressions — no Python boundary.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
            F.year("o_orderdate").alias("order_year"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.concat(F.lit("ORD-"), F.col("o_orderkey").cast("string")).alias("order_tag"),
            F.round(F.col("o_totalprice") / 1000.0, 3).alias("price_k"),
            F.greatest(F.lit(0.0), F.round(F.col("o_totalprice") - 200000.0, 2)).alias(
                "over_200k"
            ),
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
        )
        .orderBy(F.asc("o_orderkey"))
        .limit(1000)
    )


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregate — reference parses JSON event
    payloads and hyperparameter blobs in Python (core-logic/
    run_consumer.py:163, dashboard/app.py:2614-2624, F2); engine-native
    equivalent is get_json_object pushed into the scan projection."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set semantics (SURVEY.md §2.7): the reference merges two event
    sources with preference order (dashboard/app.py:1020-1040) and dedups
    on PK at write time (S4/J5).  Native shape: unionByName + distinct."""
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 150000.0).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return high.unionByName(urgent).distinct().orderBy("o_custkey")


def anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert emulation via anti-join (SURVEY.md S4/J5): the reference's
    ``INSERT ... ON CONFLICT (pk) DO NOTHING`` (etl/load_users_from_minio.py:
    93-97) = keep only rows whose PK is absent from the existing table.
    Here: orders from 2000+ whose customer never ordered before 2000.

    Scale: both sides shuffle on the key; if 'existing keys' is small it
    broadcasts.  This is the single-writer upsert path; a transactional
    store (Delta MERGE) is the multi-writer answer (SURVEY.md §7.4.2).
    """
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    incoming = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        incoming.join(existing, "o_custkey", "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership against another table (left semi) — the reference
    does this with Python sets ("not already passed",
    core-logic/run_consumer.py:247-259); engine-native is a semi join that
    never materializes the probe side's payload columns."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent_cust = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.join(
            urgent_cust, customer.c_custkey == urgent_cust.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-occurrence via self-join (SURVEY.md J4/A8): the
    reference builds course co-occurrence with per-user
    ``itertools.combinations`` in a driver loop (core-logic/
    train_module.py:396-405) — O(rows) through one Python process.  The
    distributed form is a self-equi-join on the grouping key with a ``<``
    residual, then count.

    Scale: the join key (order) bounds the blowup — pairs per order =
    C(items_per_order, 2), so skew is bounded by the largest basket, not
    the table size.  Dedup before the join (an order can list a part
    twice) keeps the pair space tight.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    basket = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .orderBy(F.desc("n_cooccur"), F.asc("part_a"), F.asc("part_b"))
        .limit(50)
    )


def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random sample — the reference samples with
    ``ORDER BY RANDOM() LIMIT n`` (scripts/modify_training_data.py:43-51)
    and unseeded ``random.sample`` (run_producer.py:42-54).  For
    oracle-checkable determinism we key the "randomness" on a hash of the
    PK — the same technique a distributed engine uses for repeatable
    sampling without a global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") % 97 == 3)
        .orderBy("o_orderkey")
    )


def cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — full grouping-sets capability
    (SURVEY.md §2.4 notes the reference's nearest analog is re-summing
    group results in pandas, A12)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("revenue"),
        )
        .orderBy(
            F.asc_nulls_last("l_returnflag"), F.asc_nulls_last("l_linestatus")
        )
    )


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — absent from the reference
    (SURVEY.md §2.4 'not present: median/percentile'); first-class here.
    Spark's percentile() matches DuckDB's quantile_cont (linear
    interpolation)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (groupBy().pivot().agg()) — the engine-native form of the
    reference's SUM(CASE WHEN ...) pivot emulation (dashboard/app.py:
    301-314, A4).  Pivot values are pinned so the schema is static (a
    requirement for any production pipeline — and for streaming)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


def events_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bucket aggregation over the event stream table — daily counts,
    distinct users, value sums (the dashboard's activity-over-time charts,
    reference dashboard/app.py:1060-1119)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(sum_fixed(F.round(F.col("value") * 1000000).cast("long"), sf_dir=sf_dir) / 1000000.0, 4).alias("total_value"),
        )
        .orderBy("day")
    )


def user_topk_recommendations(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """The consumer's candidate-scoring query as a set-level batch op
    (SURVEY.md M10/M11 + O3): candidates = distinct event users x top-15
    popular parts (popularity fallback, run_consumer.py:247-263), score =
    0.3*user-signal + 0.7*popularity blend (run_consumer.py:278-294),
    keep top-5 per user (run_consumer.py:303,330).

    Scale: popularity is tiny (top-15) => broadcast crossJoin; ranking is
    one window shuffle on user_id.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    popularity = (
        lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(15)
    )
    users = events.select("user_id").distinct()
    scored = users.crossJoin(F.broadcast(popularity)).withColumn(
        "score", F.round(0.3 * (F.col("user_id") % 10) + 0.7 * F.col("n"), 4)
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("l_partkey"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "user_id",
            F.col("l_partkey").alias("item_id"),
            "score",
            F.col("rn").alias("rank"),
        )
        .orderBy("user_id", "rank")
    )


def approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profiling — approx_count_distinct (HyperLogLog++) and
    percentile_approx (KLL-style quantile sketch) per order priority.

    At 100 TB these replace their exact forms: the sketches are fixed-size
    mergeable state, so the aggregation stays one map-side-combined
    shuffle regardless of cardinality, where exact distinct would shuffle
    every distinct value.

    Oracle signal: raw sketch outputs are engine-specific (not
    bit-identical to DuckDB's), so the hashed output carries the EXACT
    aggregates plus booleans asserting each sketch landed within its
    published tolerance of the exact value (HLL++ rsd=0.02 → 3σ = 6%;
    percentile_approx accuracy=10000 → ~rank-exact, checked at 2%
    relative).  The DuckDB oracle computes the same exact aggregates and
    literal TRUEs, turning the former rows-only grey row into a full
    hash-checked pass that still exercises the sketches.
    """
    orders = load_table(spark, sf_dir, "orders")
    profile = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx_customers"),
        F.expr("percentile(o_totalprice, 0.5)").alias("__exact_p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("__exact_p95"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("__approx_p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("__approx_p95"),
    )
    rel_err = lambda a, b: F.abs(F.col(a) - F.col(b)) / F.col(b)  # noqa: E731
    return (
        profile.select(
            "o_orderpriority",
            "n_orders",
            "n_customers",
            (rel_err("__approx_customers", "n_customers") <= 0.06).alias(
                "approx_customers_ok"
            ),
            (rel_err("__approx_p50", "__exact_p50") <= 0.02).alias("approx_p50_ok"),
            (rel_err("__approx_p95", "__exact_p95") <= 0.02).alias("approx_p95_ok"),
        )
        .orderBy("o_orderpriority")
    )


def hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL mergeable-sketch rollup — the piece approx_profile's
    single-pass sketches don't show: per-(day, event_type) HLL sketches
    are built once (at 100 TB this is the persisted daily layer a
    metrics warehouse materializes), then ``hll_union_agg`` MERGES the
    fixed-size binary sketches into per-event_type distinct-user counts
    WITHOUT rescanning raw events — arbitrary rollups from KB-scale
    state.  Exact distincts would have to reshuffle every raw user id
    per rollup; sketch union touches #days × #types rows.

    Oracle signal (approx_profile's invariant-profile recipe): exact
    aggregates hash-compared outright, sketch estimate asserted within
    the HLL error budget as a literal-TRUE boolean (lgConfigK=12 →
    rsd ≈ 1.04/√4096 ≈ 1.6%; 3σ < 6%)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_events",
            "n_users",
            (
                F.abs(F.col("__approx_users") - F.col("n_users"))
                / F.col("n_users")
                <= 0.06
            ).alias("approx_users_ok"),
        )
        .orderBy("event_type")
    )


def event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-minute rate per event type (A10) — the dashboard's
    n/(max-min) throughput metric (reference dashboard/app.py:1060-1066)
    as a single aggregation: count, time span, ratio."""
    events = load_table(spark, sf_dir, "events")
    # fractional epoch (cast to double) — unix_timestamp truncates to
    # whole seconds and would disagree with the oracle's epoch() in the
    # 6th decimal of the rate
    span_min = (F.max("ts").cast("double") - F.min("ts").cast("double")) / 60.0
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.round(F.count(F.lit(1)) / span_min, 6).alias("events_per_min"),
        )
        .orderBy("event_type")
    )


def cheapest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregates (min_by/max_by): each customer's cheapest
    and priciest order in ONE aggregation pass — no self-join back, no
    window sort.  The classic argmin pattern the reference would express
    as a subquery-join; at scale this halves the shuffles.

    Determinism note: prices here are continuous doubles with no
    (custkey, price) ties at any test SF (verified), so a scalar ordering
    key suffices; with tie-prone keys, pack (price, orderkey) into a
    struct on the Spark side and a fixed-width sort string in SQL."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", F.col("o_totalprice")).alias("cheapest_orderkey"),
            F.round(F.min("o_totalprice"), 2).alias("cheapest_price"),
            F.max_by("o_orderkey", F.col("o_totalprice")).alias("priciest_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("priciest_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (year → month → grand total) over order
    revenue — the hypertable-style continuous-aggregate shape, computed
    as one Expand + hash aggregate pass (no per-level rescan).

    Scale: rollup multiplies input rows by hierarchy depth inside the
    Expand operator BEFORE the shuffle, but partial aggregation collapses
    each level map-side, so the shuffle carries |years| + |year-months|
    + 1 rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_month", F.month("o_orderdate"))
        .rollup("o_year", "o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("revenue"),
        )
        .orderBy(
            F.asc_nulls_last("o_year"), F.asc_nulls_last("o_month")
        )
    )


def paginated_orders(spark: SparkSession, sf_dir: str, page: int = 3, size: int = 100) -> DataFrame:
    """OFFSET/LIMIT pagination (page 3 of 100) over a total ordering —
    the dashboard's interactive result paging, engine-native via
    DataFrame.offset (Spark plans limit+offset together as
    CollectLimit(offset, limit); a total ordering is what makes pages
    stable)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .offset(page * size)
        .limit(size)
    )


def variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    access — at 100 TB this beats per-access ``get_json_object`` (the
    json_extraction query's shape), which re-parses the JSON STRING for
    every extracted field.  One parse, N typed reads.

    Profiles the numeric payload key per event_type; the DuckDB oracle
    does the same with its JSON extraction."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: daily active users over weekly active users
    per day — the product-health ratio every events dashboard tracks.

    Shape: DAU is one (day, user) distinct + count; WAU reuses the SAME
    distinct frame exploded to the 7 days each activity day supports
    (explode of a 7-literal array — bounded fan-out, not a range join),
    so the whole query is two aggregates over one deduplicated frame.
    No per-day window scans, no self-join of events."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    active = events.select(day.alias("d"), "user_id").distinct()
    dau = active.groupBy("d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    # a user active on day X counts toward WAU of days X..X+6
    supported = active.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("off"),
        "d",
        "user_id",
    ).select(F.date_add(F.col("d"), F.col("off")).cast("timestamp").alias("w_day"), "user_id")
    wau = supported.groupBy("w_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, dau.d == wau.w_day)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
        .limit(60)
    )


def gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap filling: per-(event_type, day) activity with
    EXPLICIT zero rows for days a type went silent — the dense series a
    charting layer or forecasting job requires (a missing row and a
    zero are different facts; raw groupBy only produces the former).

    Shape: the day spine is one ``sequence(min_day, max_day)`` explode
    off a broadcast 1-row min/max aggregate, cross-joined with the tiny
    distinct-type frame, then one left join against the aggregated
    dailies — the spine is #days × #types rows however large the fact
    table, and the facts aggregate BEFORE the join so the join never
    touches raw events."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        sum_fixed(F.round(F.col("value") * 1000000).cast("long"), sf_dir=sf_dir).alias(
            "micros"
        ),
    )
    bounds = events.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(F.coalesce("micros", F.lit(0)) / 1000000.0, 4).alias(
                "total_value"
            ),
            (F.col("n_events").isNull()).alias("is_gap"),
        )
        .orderBy("event_type", "day")
    )


def rolling_distinct_users(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """Rolling 7-day distinct users per day — the metric exact
    aggregation cannot do incrementally (distinct does not subtract):
    the scale answer is the DAILY HLL SKETCH LAYER with a sliding
    ``hll_union_agg`` window, so each day's rolling figure unions 7
    fixed-size sketches instead of rescanning a week of raw events.

    Output carries the EXACT rolling distinct (computed via a bounded
    day-spine range join — each event lands in ≤ 7 day windows, fine at
    gate scale and hash-comparable) next to the sketch estimate's
    within-budget boolean, the approx_profile invariant-recipe: the
    oracle recomputes the exact numbers and literal TRUEs.  The sliding
    union itself runs over the #days-row daily frame — an unkeyed
    window on a calendar-bounded frame, the documented exception."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = events.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    # RANGE frame on the day ordinal, not ROWS on the daily frame: with a
    # calendar gap a 7-ROW window silently spans >7 calendar days and
    # diverges from the exact side's day-range join (r6 advisory — the
    # shipped corpora are day-dense, but gap_filled_daily exists because
    # gaps are expected).
    day_ord = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.orderBy(day_ord.cast("long"))
        .rangeBetween(-(window_days - 1), 0)
    )
    approx = daily.select(
        "day",
        F.sum("n_events").over(w).alias("n_events_7d"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "__approx_7d"
        ),
    )
    # exact rolling distinct: day spine range-joined to (day, user) pairs
    days = daily.select(F.col("day").alias("spine_day"))
    pairs = events.distinct().select(
        F.col("day").alias("ev_day"), "user_id"
    )
    exact = (
        days.join(
            pairs,
            (F.col("ev_day") <= F.col("spine_day"))
            & (F.col("ev_day") > F.date_sub(F.col("spine_day"), window_days)),
        )
        .groupBy("spine_day")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users_7d"))
        .withColumnRenamed("spine_day", "day")
    )
    return (
        approx.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events_7d",
            "n_users_7d",
            (
                F.abs(F.col("__approx_7d") - F.col("n_users_7d"))
                / F.col("n_users_7d")
                <= 0.06
            ).alias("approx_users_ok"),
        )
        .orderBy("day")
    )


def ddsketch_quantile_rollup(
    spark: SparkSession, sf_dir: str, gamma: float = 1.02
) -> DataFrame:
    """Mergeable QUANTILE sketch layer — the percentile twin of
    :func:`hll_daily_rollup`'s distinct-count layer: exact quantiles
    cannot be rolled up (order statistics don't merge), so the scale
    answer is a DDSketch-style structure — values quantized to
    log-spaced buckets ``b = ceil(ln(v)/ln(γ))`` (γ = 1.02 ⇒ ~1 %
    relative-error guarantee), per-day bucket COUNTS as the persisted
    daily state, and any rollup window merged by summing counts per
    bucket.  Deterministic end to end (no engine RNG, no interpolation),
    so unlike t-digest/KLL the whole sketch replays bit-for-bit in SQL.

    Output per event_type: merged-sketch p50/p90/p99 estimates next to
    the EXACT order statistics and within-budget booleans — the
    approx_profile invariant recipe (the oracle recomputes the exact
    numbers, replays the sketch arithmetic, and emits literal TRUEs).

    Scale: daily state is ≤ #types × #buckets rows (KB); the merge is a
    keyed sum; the exact twin exists only for the gate and would never
    run at 100 TB.  ``ln`` ratios are rounded to 6 dp before ``ceil`` so
    a last-ulp libm difference between engines cannot flip a bucket
    boundary."""
    import math

    from pyspark.sql import Window

    events = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            "value",
            "event_id",
        )
        .filter(F.col("value") > 0)
    )
    b = F.ceil(
        F.round(F.log("value") / F.lit(math.log(gamma)), 6)
    ).cast("long")
    # persisted daily layer: (type, day, bucket) -> count
    daily = events.groupBy("event_type", "day", b.alias("b")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # rollup merge: sum counts per bucket — the mergeable property
    merged = daily.groupBy("event_type", "b").agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "b",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )

    def pick(q):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("b")
            )
        )

    def est(bcol):
        return F.round(
            2.0 * F.pow(F.lit(gamma), bcol) / F.lit(gamma + 1.0), 6
        )

    sk = cum.groupBy("event_type").agg(
        F.max("total").cast("long").alias("n_events"),
        est(pick(0.5)).alias("p50_est"),
        est(pick(0.9)).alias("p90_est"),
        est(pick(0.99)).alias("p99_est"),
    )
    # exact order statistics (gate-only twin): value at row ceil(q*n)
    w_rn = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.select(
        "event_type",
        "value",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    exact = ranked.groupBy("event_type").agg(
        *[
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                    F.col("value"),
                )
            ).alias(f"p{int(q * 100)}_exact")
            for q in (0.5, 0.9, 0.99)
        ]
    )
    budget = 0.02  # γ=1.02 guarantees ~1 % relative error; 2× headroom
    out = sk.join(exact, "event_type")
    for q in (50, 90, 99):
        out = out.withColumn(
            f"p{q}_ok",
            (
                F.abs(F.col(f"p{q}_est") - F.col(f"p{q}_exact"))
                / F.col(f"p{q}_exact")
                <= budget
            ),
        )
    return out.orderBy("event_type")


def cms_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 4,
    width: int = 256,
    k: int = 15,
) -> DataFrame:
    """Mergeable FREQUENCY sketch layer (count-min) — completes the
    sketch family next to :func:`hll_daily_rollup` (distinct) and
    :func:`ddsketch_quantile_rollup` (quantiles): per-item counts can't
    be kept exactly for an unbounded key space, so the daily state is a
    depth×width counter grid (bucket_j(x) = md5-hash_j(x) mod width,
    counts summed per cell) and any rollup window merges by summing
    cells — the same keyed-sum mergeability as the other two layers.

    Point estimate for an item = min over the depth rows of its cell
    counts; CMS guarantees estimate ≥ true count (collisions only ADD),
    and err ≤ (e/width)·N with prob 1−e^(−depth).  Both properties are
    emitted as columns next to the exact twin for the top-k items —
    everything md5-derived, so the sketch replays bit-for-bit in SQL.

    Scale: ONE fact scan exploded ×depth (map-side combined straight
    into ≤ days × depth × width cells, KB-sized state); the exact twin
    is gate-only; top-k probes broadcast into the merged grid.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.to_date("l_shipdate").alias("day")
    )
    j_bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("l_partkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    cells = lineitem.withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).select("day", "j", j_bucket.alias("bucket"))
    # persisted daily layer: (day, j, bucket) -> count
    daily = cells.groupBy("day", "j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # rollup merge: sum cells — the mergeable property
    merged = daily.groupBy("j", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )
    exact = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    topk = exact.orderBy(F.desc("exact_n"), "l_partkey").limit(k)
    probes = topk.withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).select("l_partkey", "exact_n", "j", j_bucket.alias("bucket"))
    total = lineitem.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    budget = F.ceil(2.718281828 * F.col("__N") / width).cast("long")
    return (
        probes.join(merged, ["j", "bucket"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("n").cast("long").alias("cms_est"))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "exact_n",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_n")).alias("overestimates"),
            ((F.col("cms_est") - F.col("exact_n")) <= budget).alias(
                "within_budget"
            ),
        )
        .orderBy(F.desc("exact_n"), "l_partkey")
    )


def kmv_distinct_rollup(
    spark: SparkSession,
    sf_dir: str,
    k: int = 256,
    n_shards: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch with a weekly merge
    — the third member of the mergeable-sketch family beside
    :func:`hll_daily_rollup` (distinct) and
    :func:`ddsketch_quantile_rollup` (quantiles), and the one whose
    ESTIMATE is itself engine-reproducible: the sketch is the k smallest
    md5-uniform hashes of the key (the ``hash_uniform`` recipe — exact
    32-bit-integer-over-2^32 doubles), the estimator is (k-1)/u_k
    (Bar-Yossef et al. 2002), and both replay bit-for-bit in SQL — so
    unlike the HLL layer, whose JVM-internal sketch forces a
    within-budget boolean, the KMV estimate is hash-compared OUTRIGHT.

    Two-level layer, mirroring the HLL rollup: per-day sketches (the
    persisted daily state, ≤ k rows/day) are UNIONED per ISO week and
    re-cut to the k smallest — set union + top-k IS the KMV merge — so
    the weekly estimate never rescans raw events.

    Scale: the per-day k-smallest is computed shard-locally first
    (``user_id % n_shards``; a rank window over (day, shard) partitions
    ~n_shards× smaller than a day) and the global day cut ranks only the
    ≤ n_shards·k survivors — the two-phase top-k that keeps the sort off
    any fat day partition.  The exact weekly distinct (one rescan) and
    relative error ship as the gate readout only.

    Output per week: week, n_days, n_exact, n_sketch, kmv_estimate,
    rel_err."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    days = ev.select("week", "day", "user_id").distinct()
    hashed = days.withColumn(
        "u", hash_uniform(F.col("user_id"), "kmv:")
    ).withColumn("shard", F.pmod(F.col("user_id"), F.lit(n_shards)))
    # phase 1: shard-local k smallest within each day
    w_shard = Window.partitionBy("day", "shard").orderBy("u")
    local = hashed.withColumn("rk", F.row_number().over(w_shard)).filter(
        F.col("rk") <= k
    )
    # phase 2: the day cut over <= n_shards*k survivors
    w_day = Window.partitionBy("day").orderBy("u")
    daily = (
        local.drop("rk")
        .withColumn("rk", F.row_number().over(w_day))
        .filter(F.col("rk") <= k)
        .select("week", "day", "u")
    )
    # weekly merge: union of day sketches, distinct values, re-cut to k
    w_week = Window.partitionBy("week").orderBy("u")
    weekly = (
        daily.select("week", "u")
        .distinct()
        .withColumn("rk", F.row_number().over(w_week))
        .filter(F.col("rk") <= k)
    )
    sketch = weekly.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max(F.when(F.col("rk") == k, F.col("u"))).alias("u_k"),
    )
    n_days = daily.select("week", "day").distinct().groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    exact = (
        ev.select("week", "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return (
        sketch.join(n_days, "week")
        .join(exact, "week")
        .select(
            "week",
            "n_days",
            "n_exact",
            "n_sketch",
            F.round(
                F.when(
                    F.col("n_sketch") < k,
                    F.col("n_sketch").cast("double"),
                ).otherwise(F.lit(float(k - 1)) / F.col("u_k")),
                4,
            ).alias("kmv_estimate"),
            F.round(
                F.abs(
                    F.when(
                        F.col("n_sketch") < k,
                        F.col("n_sketch").cast("double"),
                    ).otherwise(F.lit(float(k - 1)) / F.col("u_k"))
                    - F.col("n_exact")
                )
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("week")
    )


def bloom_membership_profile(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = 4,
    m_bits: int = 8192,
) -> DataFrame:
    """Bloom-filter membership sketch — completing the mergeable-sketch
    quartet (distinct: HLL/KMV, frequency: CMS, quantile: DDSketch,
    membership: THIS): the KB-scale "have I seen this key?" prefilter an
    incremental pipeline consults before paying an anti-join — e.g.
    dedup probes (functions/dedup.py) skipping fingerprints the settled
    corpus provably lacks.  Build over the distinct order-placing
    customers; probe EVERY customer; audit against the exact semi-join.

    Same engine-reproducibility discipline as cms_heavy_hitters: the
    ``n_hashes`` positions are md5-derived (``('0x'||substr(md5(j||':'||
    key),1,8))::BIGINT % m`` — exact integer math in both engines), the
    filter state is the DISTINCT SET of set positions (≤ m rows — the
    relational encoding of the bitmap; set-union mergeable by
    construction), and the probe is a broadcast join against that
    KB-scale state followed by an all-``n_hashes``-hit test.  A member's
    positions are all set by construction, so false negatives are
    impossible — the audit's no_false_negatives must come out TRUE —
    while false positives are counted and rated against the classic
    (1-e^{-kn/m})^k expectation ballpark.

    The probe set is every customer PLUS a planted definitely-absent
    twin per customer (c_custkey + 10_000_000 — the planted-data
    discipline): in this corpus every customer has placed an order, so
    without the plants the false-positive denominator would be empty.

    Output (1 row): n_keys_built, n_bits_set, n_probed, n_present,
    n_maybe, n_false_pos, fp_rate, no_false_negatives."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    base_cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    customers = base_cust.unionByName(
        base_cust.select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey")
        )
    )
    # both shared frames are consumed 3x (position build / audit join /
    # count) — persist so the distincts run once
    build_keys = persist_tracked(orders.distinct())

    def positions(df: DataFrame, key: str) -> DataFrame:
        j = F.explode(
            F.sequence(F.lit(0), F.lit(n_hashes - 1))
        ).alias("j")
        out = df.select(F.col(key).alias("key"), j)
        hex8 = F.substring(
            F.md5(
                F.concat(
                    F.col("j").cast("string"),
                    F.lit(":"),
                    F.col("key").cast("string"),
                )
            ),
            1,
            8,
        )
        return out.withColumn(
            "pos", (F.conv(hex8, 16, 10).cast("long") % m_bits).cast("long")
        )

    bits = persist_tracked(
        positions(build_keys, "o_custkey").select("pos").distinct()
    )
    probe = positions(customers, "c_custkey")
    hits = probe.join(F.broadcast(bits), "pos").groupBy("key").agg(
        F.count(F.lit(1)).alias("__n_hit")
    )
    verdict = (
        customers.join(
            hits.withColumnRenamed("key", "c_custkey"), "c_custkey", "left"
        )
        .withColumn(
            "maybe",
            F.when(F.coalesce("__n_hit", F.lit(0)) == n_hashes, 1).otherwise(
                0
            ),
        )
        .join(
            build_keys.withColumn("present", F.lit(1)).withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            "c_custkey",
            "left",
        )
        .withColumn("present", F.coalesce("present", F.lit(0)))
    )
    n_built = build_keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_built")
    )
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    return (
        verdict.agg(
            F.count(F.lit(1)).cast("long").alias("n_probed"),
            F.sum("present").cast("long").alias("n_present"),
            F.sum("maybe").cast("long").alias("n_maybe"),
            F.sum(F.col("maybe") * (1 - F.col("present")))
            .cast("long")
            .alias("n_false_pos"),
            F.round(
                F.sum(F.col("maybe") * (1 - F.col("present")))
                / F.sum(1 - F.col("present")),
                6,
            ).alias("fp_rate"),
            (
                F.min(
                    F.when(F.col("present") == 1, F.col("maybe")).otherwise(1)
                )
                == 1
            ).alias("no_false_negatives"),
        )
        .crossJoin(F.broadcast(n_built))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_keys_built",
            "n_bits_set",
            "n_probed",
            "n_present",
            "n_maybe",
            "n_false_pos",
            "fp_rate",
            "no_false_negatives",
        )
    )


def bloom_pruned_join(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = 4,
    m_bits: int = 8192,
) -> DataFrame:
    """Join with a Bloom-filter runtime prefilter on the probe side —
    the scale pattern behind Spark's own runtime row-level filtering
    (spark.sql.optimizer.runtimeFilter.bloomFilter): when the build
    side is selective (here: urgent orders), shipping a KB-scale bitmap
    to every probe task and dropping non-members BEFORE the shuffle
    cuts the exchanged bytes by the build side's selectivity; false
    positives cost nothing semantically because the exact join still
    runs behind the filter.

    The bitmap is the :func:`bloom_membership_profile` relational state
    collapsed to ONE array row and broadcast — the probe-side test is a
    narrow map (n_hashes md5 mods + array_contains), no shuffle, no
    per-row Python.  All positions are md5-derived, so the oracle
    replays the filter bit-for-bit, including the false positives the
    pruning stats count.

    Output: per-returnflag rollup of the joined rows (identical to the
    plain join — the invariant the gate checks) plus the audit columns
    n_probe / n_bloom_pass showing what the bitmap saved."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
    )

    def pos(col, j: int):
        hex8 = F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 8
        )
        return (F.conv(hex8, 16, 10).cast("long") % m_bits).cast("long")

    # dense 64-bit-word bitmap: m_bits/64 longs in a fixed-index array,
    # so each probe is element_at (O(1)) + shift/mask — NOT a linear
    # array_contains scan over up to m_bits entries (the r8 session-3
    # bench finding: the scan made this 34 s at sf0.1; the bitmap test
    # is set-membership-exact, so the oracle is untouched)
    n_words = m_bits // 64
    words = (
        build.select(
            F.explode(
                F.array(*[pos(F.col("o_orderkey"), j) for j in range(n_hashes)])
            ).alias("p")
        )
        .select(
            F.expr("p div 64").cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
            .alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bitmap = (
        spark.range(n_words)
        .select(F.col("id").cast("long").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce(F.col("bits"), F.lit(0)).alias("bits"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "bits"))),
                lambda x: x["bits"],
            ).alias("__bm")
        )
    )
    # fan the probe out first: the single parquet file splits into only
    # ~3 input partitions at sf0.1, so the 4-hash md5 filter would run
    # on 3 of 32 cores; fanning out the 3 narrow columns costs far less
    # than it recovers (the standing fan_out lesson — measured 4.2-4.7 s
    # -> 1.5-1.7 s warm at sf0.1 together with the single-pass fold
    # below)
    from project_bigdata_recsys_spark.catalog import fan_out

    probed = fan_out(
        lineitem.select(
            "l_orderkey",
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
    ).crossJoin(F.broadcast(bitmap))

    keep = probed
    for j in range(n_hashes):
        pj = pos(F.col("l_orderkey"), j)
        keep = keep.withColumn("__p", pj).filter(
            F.expr(
                "(shiftright(element_at(__bm, CAST(__p / 64 AS INT) + 1),"
                " CAST(__p % 64 AS INT)) & 1) = 1"
            )
        ).drop("__p")
    passed = keep.drop("__bm")
    # ONE pass over the bloom-passed rows: the exact join runs as a LEFT
    # join (build keys are distinct, so multiplicity is 1 and AQE still
    # broadcasts the small side), which lets the bloom-pass audit count
    # and the joined rollup come out of the SAME aggregation — the
    # pre-r13 shape ran a separate passed.count() branch that re-scanned
    # lineitem and re-evaluated the 4-hash md5 filter end to end; at
    # 100 TB that duplicate probe pass is a full extra fact scan.
    matched = passed.join(
        build.withColumnRenamed("o_orderkey", "l_orderkey").withColumn(
            "__hit", F.lit(1)
        ),
        "l_orderkey",
        "left",
    )
    per_flag = matched.groupBy("l_returnflag").agg(
        F.count("__hit").cast("long").alias("n_items"),
        F.round(
            F.sum(F.when(F.col("__hit") == 1, F.col("cents"))) / 100.0, 2
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("__n_pass_flag"),
    )
    from pyspark.sql import Window

    all_rows = Window.partitionBy()  # ≤ #returnflags rows — driver-tiny
    return (
        per_flag.withColumn(
            "n_bloom_pass",
            F.sum("__n_pass_flag").over(all_rows).cast("long"),
        )
        .filter(F.col("n_items") > 0)
        .drop("__n_pass_flag")
        .crossJoin(
            F.broadcast(
                lineitem.agg(F.count(F.lit(1)).cast("long").alias("n_probe"))
            )
        )
        .select(
            "l_returnflag", "n_items", "revenue", "n_probe", "n_bloom_pass"
        )
        .orderBy("l_returnflag")
    )


def kmv_set_ops(
    spark: SparkSession, sf_dir: str, k: int = 64
) -> DataFrame:
    """Set algebra ON the KMV sketches — the property that makes the
    KMV layer more than a distinct counter: two audiences' sketches
    alone estimate their union size, Jaccard, and intersection, without
    rescanning either side (Beyer et al. 2007).  Audiences here:
    adjacent-day active-user sets, i.e. day-over-day overlap straight
    from the same per-day sketches :func:`kmv_distinct_rollup` /
    ``stream_kmv_distinct`` already maintain.

    Estimators are engine-reproducible end-to-end: hashes are the
    md5-uniform recipe, the union sketch is the k smallest of the two
    sketches' merged values (top-k IS the union merge), |A∪B| is
    (k−1)/u_k (the kmv_distinct_rollup fallback to exact below
    saturation), Jaccard is the fraction of union-sketch values present
    in BOTH input sketches (two keyed semi joins against KB-scale
    sketch frames), and |A∩B| = round(J·|A∪B|).  Exact counts ride
    along as the gate readout.

    Scale: sketches are ≤ k rows/day; every window partitions by day or
    day-pair; the pair joins touch sketch frames only — the raw events
    are scanned once to build daily sketches (and once more for the
    exact audit, which production drops)."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        "user_id",
    )
    daily_users = persist_tracked(ev.distinct())
    hashed = daily_users.withColumn(
        "u", hash_uniform(F.col("user_id"), "kmv:")
    )
    w_day = Window.partitionBy("day").orderBy("u")
    sketch = persist_tracked(
        hashed.withColumn("rk", F.row_number().over(w_day))
        .filter(F.col("rk") <= k)
        .select("day", "u")
    )
    nxt = sketch.select((F.col("day") - 1).alias("day"), F.col("u").alias("u2"))
    merged = sketch.select("day", "u").unionByName(
        nxt.select("day", F.col("u2").alias("u"))
    ).distinct()
    w_pair = Window.partitionBy("day").orderBy("u")
    union_sk = (
        merged.withColumn("rk", F.row_number().over(w_pair))
        .filter(F.col("rk") <= k)
    )
    # membership of each union-sketch value in both day sketches
    in_a = sketch.select("day", "u").withColumn("__a", F.lit(1))
    in_b = nxt.select("day", F.col("u2").alias("u")).withColumn(
        "__b", F.lit(1)
    )
    marked = (
        union_sk.join(in_a, ["day", "u"], "left")
        .join(in_b, ["day", "u"], "left")
    )
    pair_est = marked.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sketch"),
        F.max(F.when(F.col("rk") == k, F.col("u"))).alias("__uk"),
        F.sum(
            (F.coalesce("__a", F.lit(0)) * F.coalesce("__b", F.lit(0)))
        )
        .cast("long")
        .alias("__n_both"),
    )
    # exact audit (production drops this scan)
    a_cnt = daily_users.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_a_exact")
    )
    b_cnt = a_cnt.select(
        (F.col("day") - 1).alias("day"), F.col("n_a_exact").alias("n_b_exact")
    )
    inter = (
        daily_users.alias("x")
        .join(
            daily_users.select(
                (F.col("day") - 1).alias("day"), "user_id"
            ).alias("y"),
            ["day", "user_id"],
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_exact"))
    )
    est_union = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__uk"))
    jac = F.col("__n_both") / F.col("n_union_sketch").cast("double")
    out = (
        pair_est.join(a_cnt, "day")
        .join(b_cnt, "day")
        .join(inter, "day", "left")
        .select(
            "day",
            "n_a_exact",
            "n_b_exact",
            F.coalesce("inter_exact", F.lit(0))
            .cast("long")
            .alias("inter_exact"),
            (
                F.col("n_a_exact")
                + F.col("n_b_exact")
                - F.coalesce("inter_exact", F.lit(0))
            )
            .cast("long")
            .alias("union_exact"),
            F.round(est_union, 4).alias("union_est"),
            F.round(jac, 6).alias("jaccard_est"),
            F.round(jac * est_union).cast("long").alias("inter_est"),
        )
    )
    # the inner join on b_cnt already dropped the partnerless last day
    return out.orderBy("day")


def cms_join_size_estimate(
    spark: SparkSession, sf_dir: str, n_hashes: int = 4, width: int = 512
) -> DataFrame:
    """Join-size estimation from Count-Min sketches — the planner-side
    use of the CMS beyond heavy hitters: the inner product of two key
    sketches upper-bounds the equi-join cardinality (Cormode &
    Muthukrishnan 2005, §4.3), so a nightly KB-scale sketch answers
    "how big would this join blow up?" without touching either table.
    Probed here on the SELF-join sizes Σc² of lineitem.l_partkey and
    events.user_id — exactly the number that prices a co-occurrence
    pair generation (cooccurrence_pairs) before running it.

    Everything is integer: counters are Σ of per-key BIGINT counts at
    md5-derived positions, the estimate is min over the d rows of
    Σ_p C_p² — so the estimate itself hash-checks outright, with the
    exact Σc² as the gate readout (production drops the exact pass).

    Output per probed key: n_rows, n_keys, exact_self_join,
    cms_estimate, overest_frac."""
    probes = [
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("events.user_id", "events", "user_id"),
    ]
    outs = []
    for label, tbl, key in probes:
        counts = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("key"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        positions = counts.select(
            "c",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_hashes - 1))
            ).alias("j"),
            "key",
        ).select(
            "j",
            "c",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("j").cast("string"),
                                F.lit(":"),
                                F.col("key").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("pos"),
        )
        cms = positions.groupBy("j", "pos").agg(
            F.sum("c").cast("long").alias("cnt")
        )
        est = (
            cms.groupBy("j")
            .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ip"))
            .agg(F.min("ip").cast("long").alias("cms_estimate"))
        )
        exact = counts.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.col("c") * F.col("c"))
            .cast("long")
            .alias("exact_self_join"),
        )
        outs.append(
            exact.crossJoin(F.broadcast(est)).select(
                F.lit(label).alias("table_key"),
                "n_rows",
                "n_keys",
                "exact_self_join",
                "cms_estimate",
                F.round(
                    (F.col("cms_estimate") - F.col("exact_self_join"))
                    / F.col("exact_self_join").cast("double"),
                    6,
                ).alias("overest_frac"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_key")


def join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics-based join-order advisor for the customer ⨝ orders ⨝
    lineitem chain: estimates every left-deep order's intermediate
    cardinality with the textbook containment formula
    |A ⨝ B| = |A|·|B| / max(ndv_A(k), ndv_B(k)), computes the TRUE
    intermediate sizes next to them, and recommends the order with the
    smallest estimated intermediate — the explainable CBO decision
    (what analyze_table's stats are FOR, and what Catalyst does
    opaquely; cms_join_size_estimate is the sketch-based sibling for
    keys too hot to count exactly).

    Exactness: row counts and exact NDVs are BIGINTs; estimates are
    one integer-derived division rounded to 2 dp; true sizes are exact
    join counts.  Fully lazy: the five 1-row aggregates cross-join
    broadcast-style — no driver-side collect splits the plan.

    Scale: three stat aggregations + the chain's two real intermediate
    counts; no windows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    sc = customer.agg(
        F.count(F.lit(1)).cast("long").alias("rows_c"),
        F.count_distinct("c_custkey").cast("long").alias("ndv_c_cust"),
    )
    so = orders.agg(
        F.count(F.lit(1)).cast("long").alias("rows_o"),
        F.count_distinct("o_custkey").cast("long").alias("ndv_o_cust"),
        F.count_distinct("o_orderkey").cast("long").alias("ndv_o_order"),
    )
    sl = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("rows_l"),
        F.count_distinct("l_orderkey").cast("long").alias("ndv_l_order"),
    )
    t_co = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .agg(F.count(F.lit(1)).cast("long").alias("true_co"))
    )
    t_ol = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .agg(F.count(F.lit(1)).cast("long").alias("true_ol"))
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the 1-row stat frame feeds BOTH output steps —
    # unmaterialized, r2 re-ran all five aggregations (14 scans → 7;
    # guide §5)
    one = persist_tracked(
        sc.crossJoin(F.broadcast(so))
        .crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(t_co))
        .crossJoin(F.broadcast(t_ol))
    )
    est_co = F.round(
        F.col("rows_c")
        * F.col("rows_o")
        / F.greatest(F.col("ndv_c_cust"), F.col("ndv_o_cust")),
        2,
    )
    est_ol = F.round(
        F.col("rows_o")
        * F.col("rows_l")
        / F.greatest(F.col("ndv_o_order"), F.col("ndv_l_order")),
        2,
    )
    rec = F.when(est_co <= est_ol, F.lit("customer_first")).otherwise(
        F.lit("lineitem_first")
    )
    r1 = one.select(
        F.lit("customer*orders").alias("step"),
        F.col("rows_c").alias("rows_left"),
        F.col("rows_o").alias("rows_right"),
        est_co.alias("est_rows"),
        F.col("true_co").alias("true_rows"),
        F.round(est_co / F.col("true_co"), 4).alias("est_over_true"),
        rec.alias("recommended"),
    )
    r2 = one.select(
        F.lit("orders*lineitem").alias("step"),
        F.col("rows_o").alias("rows_left"),
        F.col("rows_l").alias("rows_right"),
        est_ol.alias("est_rows"),
        F.col("true_ol").alias("true_rows"),
        F.round(est_ol / F.col("true_ol"), 4).alias("est_over_true"),
        rec.alias("recommended"),
    )
    return r1.unionByName(r2).orderBy("step")
