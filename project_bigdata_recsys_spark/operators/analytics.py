"""TPC-H-shaped analytical queries — the multi-join / agg plans whose
physical shape is what matters at 100 TB.

The reference has no multi-join analytics (SURVEY.md §2.3: "the driver's
TPC-H-ish harness will exercise multi-way equi-joins"); these queries are
the engine's declaration that the relational core handles the canonical
warehouse shapes: wide-scan aggregation (Q1), selective 3-way join top-K
(Q3), 6-way star join with region filter (Q5), decorrelated scalar
subquery (Q17), and group-HAVING semi join (Q18).

Scale notes applied throughout:
  - Dimension tables (region/nation/customer/supplier/part at any sf are
    tiny next to lineitem) are broadcast explicitly, so the fact table
    never shuffles for dimension joins.
  - Aggregations always map-side combine (hash partial) before the one
    shuffle on the grouping key.
  - Date filters are literal predicates on scan columns so parquet
    row-group pruning and vectorized-reader filter pushdown engage
    (verify with .explain: PushedFilters).
  - Top-K via orderBy().limit() => TakeOrderedAndProject, never a global
    sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def _round_half_up(x: float, nd: int) -> float:
    """Driver-side twin of Spark's ``F.round`` on doubles: HALF_UP on the
    shortest decimal representation (Java ``BigDecimal.valueOf`` uses
    ``Double.toString``; ``repr`` is Python's equivalent).  Python's
    built-in ``round`` is banker's rounding and would diverge on exact
    .5 boundaries, so every driver-side iterate that must fold the same
    doubles as the SQL oracle goes through this."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
        )
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass wide aggregation over the fact table
    with derived expressions (disc price, charge) computed pre-aggregation
    inside whole-stage codegen.  One shuffle (4 groups)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(disc_price * 10000).cast("long")
    charge_c = F.round(charge * 1000000).cast("long")
    dpct_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Exact fixed-point sums: every money/qty expression here has
            # a bounded decimal width by construction (qty/price/discount
            # 2dp, disc_price 4dp, charge 6dp), so per-row scaling to an
            # integer and summing as BIGINT is exact and partition-order-
            # independent — sum(double) can flip the printed 2-decimal
            # rounding between runs.  sum_fixed picks the accumulator:
            # BIGINT at test sf, DECIMAL(38,0) past the ~sf1 headroom
            # (functions/fixedpoint.py).
            F.round(sum_fixed(qty_c, sf_dir=sf_dir) / 100.0, 2).alias("sum_qty"),
            F.round(sum_fixed(price_c, sf_dir=sf_dir) / 100.0, 2).alias("sum_base_price"),
            F.round(sum_fixed(disc_c, sf_dir=sf_dir) / 10000.0, 2).alias("sum_disc_price"),
            F.round(sum_fixed(charge_c, sf_dir=sf_dir) / 1000000.0, 2).alias("sum_charge"),
            F.round(sum_fixed(qty_c, sf_dir=sf_dir) / F.count(F.lit(1)) / 100.0, 4).alias(
                "avg_qty"
            ),
            F.round(sum_fixed(price_c, sf_dir=sf_dir) / F.count(F.lit(1)) / 100.0, 4).alias(
                "avg_price"
            ),
            F.round(sum_fixed(dpct_c, sf_dir=sf_dir) / F.count(F.lit(1)) / 100.0, 4).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both dimension and fact sides,
    3-way join, revenue aggregation, top-10.

    Scale: customer filter (1/5 selectivity) broadcasts; orders⨝lineitem
    is the only big shuffle; date predicates push to both scans."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                sum_fixed(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long"), sf_dir=sf_dir) / 10000.0, 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join (region→nation→{customer,supplier}
    →orders→lineitem) with the extra c_nationkey = s_nationkey "local"
    condition, revenue per nation.

    Scale: the entire dimension chain (region⨝nation⨝customer and
    supplier) broadcasts; lineitem⨝orders is the sole repartition; the
    local-supplier condition is applied as a post-join filter on two
    broadcast-sourced columns, so no extra shuffle."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("c_nation"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("s_nation"))

    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nation") == F.col("s_nation"))
        .groupBy("n_name")
        .agg(
            F.round(
                sum_fixed(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long"), sf_dir=sf_dir) / 10000.0, 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: scalar correlated subquery (per-part average
    quantity) decorrelated into an aggregate-then-join — the rewrite
    Catalyst itself applies to the SQL form, expressed directly.

    Scale: the per-part average is a small aggregate (|part| rows) =>
    broadcast back against lineitem; total cost is two scans of lineitem
    and zero fact-side shuffles."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0 / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING on the fact table, then semi
    join the qualifying keys back through orders⨝customer, top-100.

    Scale: the HAVING output is small => broadcast semi join; orders and
    customer join on the reduced key set only."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big_keys = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(F.broadcast(big_keys), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("total_qty"), 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def cohort_retention(spark: SparkSession, sf_dir: str, max_offset: int = 6) -> DataFrame:
    """Cohort retention — the warehouse query every product dashboard
    wants and the reference's SQL cannot express without pandas help:
    customers grouped by first-order month, tracked for how many return
    in each subsequent month.

    Shape: first-order month per customer is one aggregate; activity
    months are one distinct projection; retention is ONE broadcast-less
    equi-join on customer followed by a (cohort, offset) count — no
    window over the whole fact table, no per-cohort re-scan.  Offsets
    cap at ``max_offset`` to bound the output, not the computation."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    cohort = (
        orders.groupBy("o_custkey")
        .agg(F.min(month).alias("cohort_month"))
    )
    activity = orders.select(
        "o_custkey", month.alias("active_month")
    ).distinct()
    offset = F.round(
        F.months_between(F.col("active_month"), F.col("cohort_month"))
    ).cast("int")
    joined = activity.join(cohort, "o_custkey").select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        offset.alias("month_offset"),
    )
    return (
        joined.filter(F.col("month_offset") <= max_offset)
        .groupBy("cohort", "month_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .orderBy("cohort", "month_offset")
        .limit(500)
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user, did a
    view happen, then a click AFTER it, then a purchase AFTER that?
    The product-analytics primitive (strictly ordered steps — a
    purchase before the first view must NOT count).

    Shape: one conditional min(CASE) aggregate per STAGE — the stage-k
    pass joins events to the (small, one-row-per-user) stage-k-1 frame
    on user_id and aggregates, so an N-stage funnel is N user-keyed
    shuffle joins + aggregates, all partial-aggregated, with no windows
    and no event-to-event self-join (the quadratic trap).  After the
    first shuffle every pass is co-partitioned on user_id."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
    )
    # steps 2 and 3 need the PREVIOUS step's timestamp — join the tiny
    # per-user frame back and aggregate conditionally on it
    with_view = events.join(per_user, "user_id")
    step2 = with_view.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).alias("t_click"),
    )
    with_click = events.join(step2, "user_id")
    step3 = with_click.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).alias("t_purchase"),
    )
    return step3.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t_view").cast("long").alias("n_viewed"),
        F.count("t_click").cast("long").alias("n_view_click"),
        F.count("t_purchase").cast("long").alias("n_view_click_purchase"),
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quartiles per
    customer, the classic marketing-warehouse rollup.  Each dimension's
    quartile comes from an EXACT global percent_rank computed with the
    distributed range-shuffle recipe (functions.text.with_exact_percent_
    rank) — three range exchanges, no single-partition window, no ntile
    over an unkeyed frame.  Quartile = floor(pr·4) clamped; (metric,
    custkey) total orders make every cut deterministic.  Output: the
    4×4×4 segment grid with counts and average spend."""
    from project_bigdata_recsys_spark.functions.text import (
        with_exact_percent_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        # exact integer-cent spend: rank + avg stay order-independent
        sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir).alias(
            "spend_cents"
        ),
    )
    q = lambda col: F.least(F.floor(F.col(col) * 4), F.lit(3)).cast("int")  # noqa: E731
    r = with_exact_percent_rank(per_cust, ["last_order", "o_custkey"], "pr_r")
    fq = with_exact_percent_rank(r, ["n_orders", "o_custkey"], "pr_f")
    m = with_exact_percent_rank(fq, ["spend_cents", "o_custkey"], "pr_m")
    return (
        m.select(
            q("pr_r").alias("r_quartile"),
            q("pr_f").alias("f_quartile"),
            q("pr_m").alias("m_quartile"),
            "spend_cents",
        )
        .groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                sum_fixed("spend_cents", sf_dir=sf_dir) / F.count(F.lit(1)) / 100.0, 4
            ).alias("avg_spend"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


def multi_touch_attribution(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value is split
    EQUALLY across the same user's clicks in the preceding
    ``window_days`` — the classic marketing-warehouse credit model (the
    as-of join gives last-touch; this gives every touch its share).

    Determinism discipline: purchase value is carried as micro-scaled
    BIGINT and the per-click share is integer division
    (round(micros / n_touches)) — per-row exact, so the day-level credit
    sums are partition-order-independent like every other money sum in
    this repo.

    Scale: purchases join clicks per USER (equi key) with the window as
    a join filter — fan-out bounded by per-user activity, never a time
    cross product; the per-purchase touch count is a window over the
    purchase id (data-cardinality key)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 1000000).cast("long").alias("p_micros"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("click_day"),
    )
    touched = purch.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window_days} DAYS"))
    )
    w = Window.partitionBy("purchase_id")
    credited = touched.withColumn(
        "credit_micros",
        F.round(F.col("p_micros") / F.count(F.lit(1)).over(w)).cast("long"),
    )
    return (
        credited.groupBy("click_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("purchase_id").cast("long").alias("n_purchases"),
            F.round(sum_fixed("credit_micros", sf_dir=sf_dir) / 1000000.0, 4).alias(
                "credited_value"
            ),
        )
        .orderBy("click_day")
    )


def decayed_popularity(
    spark: SparkSession, sf_dir: str, half_life_days: float = 7.0
) -> DataFrame:
    """Exponentially time-decayed activity score per event type — the
    'trending now' ranking signal (recent events count fully, week-old
    events half, with the corpus max timestamp as 'now' so the score is
    a pure function of the data).  Weights are per-row quantized to
    nano-units and summed as BIGINT (the fixed-point discipline), so the
    comparison survives any partitioning."""
    events = load_table(spark, sf_dir, "events")
    now = events.agg(F.max("ts").alias("now_ts"))
    age_days = (
        F.col("now_ts").cast("double") - F.col("ts").cast("double")
    ) / 86400.0
    weight = F.pow(F.lit(0.5), age_days / half_life_days)
    return (
        events.crossJoin(F.broadcast(now))
        .select(
            "event_type",
            F.round(weight * 1e9).cast("long").alias("w_nanos"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(sum_fixed("w_nanos", sf_dir=sf_dir) / 1e9, 4).alias("decayed_score"),
        )
        .orderBy("event_type")
    )


def kfold_assignment(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Deterministic k-fold split by USER (all of a user's events share
    a fold — the grouped-CV rule that stops per-user leakage across
    folds, the same principle cluster_aware_split applies to near-dup
    clusters): fold = md5(user) % k, profiled per fold with event mass
    and value so fold balance is visible."""
    events = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % k
    ).cast("int")
    return (
        events.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                sum_fixed(F.round(F.col("value") * 1000000).cast("long"), sf_dir=sf_dir)
                / 1000000.0,
                4,
            ).alias("total_value"),
        )
        .orderBy("fold")
    )


def event_transitions(
    spark: SparkSession, sf_dir: str, top: int = 25
) -> DataFrame:
    """First-order behavior transitions: counts of (event_type → next
    event_type) per user journey — the Markov-chain view of product
    analytics (which step follows which; funnels are its special case).
    One per-user lag window ordered by (ts, event_id), one aggregation
    on the tiny #types² key space; the share denominator is a sum over
    that ALREADY-AGGREGATED frame (persist_tracked — #types² rows, safe
    to cache at any corpus size), so the events scan runs once and no
    driver-side count() splits the job."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = persist_tracked(
        steps.groupBy("from_type", "to_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions")
        )
    )
    total = counts.agg(F.sum("n_transitions").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("__total"), 6).alias(
                "transition_share"
            ),
        )
        .orderBy(F.desc("n_transitions"), "from_type", "to_type")
        .limit(top)
    )


def pareto_curve(spark: SparkSession, sf_dir: str, n_bands: int = 10) -> DataFrame:
    """Contribution (Lorenz/Pareto) analysis: parts ranked by revenue,
    rolled into rank deciles with each band's share and CUMULATIVE share
    of total revenue — the 80/20 concentration readout a catalog owner
    ranks assortments by.

    Shape: revenue per part (one agg on the fact table), exact global
    rank of the aggregated frame via the range-shuffle recipe (the
    per-part frame is item-cardinality, but the recipe needs no
    single-partition window even so), then a #bands-sized rollup with a
    cumulative window over 10 rows.  Revenue is cent-exact BIGINT all
    the way."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.text import (
        with_exact_percent_rank,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir).alias(
            "cents"
        )
    )
    ranked = with_exact_percent_rank(
        per_part,
        ["cents", "l_partkey"],
        "pr",
    )
    # band 0 = highest-revenue decile: invert the ascending percent rank
    band = F.least(
        F.floor((1.0 - F.col("pr")) * n_bands), F.lit(n_bands - 1)
    ).cast("int")
    bands = (
        ranked.select(band.alias("band"), "cents")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            sum_fixed("cents", sf_dir=sf_dir).alias("band_cents"),
        )
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bands.select(
            "band",
            "n_items",
            F.round(F.col("band_cents") / 100.0, 2).alias("band_revenue"),
            F.round(
                F.col("band_cents") / F.sum("band_cents").over(w_all), 6
            ).alias("revenue_share"),
            F.round(
                F.sum("band_cents").over(w_cum)
                / F.sum("band_cents").over(w_all),
                6,
            ).alias("cumulative_share"),
        )
        .orderBy("band")
    )


def conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user who purchased at or
    after their first click, the lag between that first click and the
    first subsequent purchase, bucketed into the operations bands
    (<10 min, <1 h, <6 h, <1 d, <7 d, ≥7 d) — the latency histogram a
    growth team reads next to the funnel's step counts.

    Shape: one user-keyed window for the first click, one filtered
    aggregation for the first qualifying purchase, and a #bands rollup;
    shares derive from the already-aggregated tiny frame."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ev = events.withColumn(
        "first_click",
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w),
    )
    conv = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("first_click").isNotNull()
            & (F.col("ts") >= F.col("first_click"))
        )
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.first("first_click").alias("first_click"),
        )
    )
    lag_sec = F.col("first_purchase").cast("double") - F.col(
        "first_click"
    ).cast("double")
    bucket = (
        F.when(lag_sec < 600, "a_lt_10m")
        .when(lag_sec < 3600, "b_lt_1h")
        .when(lag_sec < 6 * 3600, "c_lt_6h")
        .when(lag_sec < 86400, "d_lt_1d")
        .when(lag_sec < 7 * 86400, "e_lt_7d")
        .otherwise("f_ge_7d")
    )
    counts = conv.select(bucket.alias("lag_bucket")).groupBy("lag_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.select(
            "lag_bucket",
            "n_users",
            F.round(
                F.col("n_users") / F.sum("n_users").over(w_all), 6
            ).alias("share"),
        )
        .orderBy("lag_bucket")
    )


def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: cent-exact monthly totals with
    the MoM delta and growth rate from a lag window over the tiny
    #months frame — the first chart of every revenue dashboard."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir).alias(
            "cents"
        ),
    )
    w = Window.orderBy("month")
    prev = F.lag("cents").over(w)
    return (
        monthly.select(
            "month",
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round((F.col("cents") - prev) / 100.0, 2).alias("mom_delta"),
            F.when(
                prev.isNotNull(),
                F.round((F.col("cents") - prev) / prev, 6),
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


def concurrent_events_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — the classic interval sweep-line
    (max simultaneous sessions / requests / jobs), computed scale-out.

    A naive sweep is ONE global sort per key — at 100 TB that is a
    single-reducer bottleneck per event_type (5 types = 5 reducers).
    Instead each interval [start, start + value seconds) is exploded to
    the calendar days it touches (bounded: values are < 10 minutes, so
    ≤ 2 rows), clipped to day boundaries, and the +1/−1 sweep runs
    per (event_type, day) — hundreds of independent partitions whose
    boundary carry-in is exact because a crossing interval contributes
    +1 at the next day's first instant.  Peak per type is then a tiny
    max over (type, day) peaks.

    All arithmetic is integer microseconds (unix_micros + round(value·1e6))
    so both engines sweep identical integers; at equal timestamps −1
    sorts before +1, so back-to-back intervals [a,b) [b,c) never count
    as concurrent, and the per-day max is invariant to intra-tie order.
    """
    from pyspark.sql import Window

    day_us = 86_400_000_000
    # Guard: only positive durations enter the sweep.  round(value·1e6) ≤ 0
    # would make F.sequence(lo_day, hi_day) DESCEND (hi < lo), emitting
    # spurious edge rows where the oracle's range(a, b+1) is empty —
    # mutate_with_noise clamps values to exactly 0.0, so zero is reachable.
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.unix_micros(F.col("ts")).alias("start_us"),
            (
                F.unix_micros(F.col("ts"))
                + F.round(F.col("value") * 1_000_000).cast("long")
            ).alias("end_us"),
        )
        .filter(F.col("end_us") > F.col("start_us"))
    )
    pieces = (
        ev.withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_us") / day_us).cast("long"),
                    F.floor((F.col("end_us") - 1) / day_us).cast("long"),
                )
            ),
        )
        .select(
            "event_type",
            "day",
            F.greatest(F.col("start_us"), F.col("day") * day_us).alias("lo"),
            F.least(F.col("end_us"), (F.col("day") + 1) * day_us).alias("hi"),
        )
        .select(
            "event_type",
            "day",
            F.explode(
                F.array(
                    F.struct(F.col("lo").alias("t"), F.lit(1).alias("delta")),
                    F.struct(F.col("hi").alias("t"), F.lit(-1).alias("delta")),
                )
            ).alias("e"),
        )
        .select("event_type", "day", "e.t", "e.delta")
    )
    sweep = Window.partitionBy("event_type", "day").orderBy("t", "delta")
    day_peaks = (
        pieces.withColumn(
            "running",
            F.sum("delta").over(
                sweep.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.max("running").alias("day_peak"))
    )
    totals = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("day_peak").desc(), F.col("day")
    )
    best = (
        day_peaks.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day_peak").cast("long").alias("peak_concurrent"),
            F.col("day").cast("long").alias("peak_epoch_day"),
        )
    )
    return (
        best.join(totals, "event_type")
        .select("event_type", "n_intervals", "peak_concurrent", "peak_epoch_day")
        .orderBy("event_type")
    )


def trending_items(
    spark: SparkSession,
    sf_dir: str,
    half_scale_days: int = 30,
    k: int = 15,
) -> DataFrame:
    """Time-decayed popularity — the trending-items serving table a
    recommender puts behind its "hot now" shelf (the recency-weighted
    counterpart of ml.recsys.kb_popular_items' all-time counts): each
    order of an item contributes a weight that decays hyperbolically
    with its age, w = s/(s+age_days), s = ``half_scale_days`` (weight
    halves at age s — same knee as exponential decay but a RATIONAL
    function of an integer day age, so both engines compute the exact
    same doubles; no libm pow/exp in the plan).

    Fixed-point discipline: per-order weights are rounded to integer
    micro-units before the per-item sum (sum_fixed), making the score
    an exact integer fold; the top-K cuts on (score_micro DESC, item) —
    a total order — via TakeOrdered, never a global sort.

    Scale: one lineitem-orders join (orders date broadcast-prunable),
    one map-side-combined aggregation on l_partkey, top-K.  The anchor
    date is a 1-row broadcast aggregate, not a driver collect."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    anchor = orders.agg(F.max("o_orderdate").alias("__anchor"))
    s = float(half_scale_days)
    aged = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "l_partkey",
            F.datediff(F.col("__anchor"), F.col("o_orderdate")).alias("age"),
        )
    )
    w_micro = F.round(
        F.lit(1_000_000.0) * F.lit(s) / (F.lit(s) + F.col("age"))
    ).cast("long")
    scored = aged.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        sum_fixed(w_micro, sf_dir).cast("long").alias("__score_micro"),
    )
    return (
        scored.orderBy(F.desc("__score_micro"), "l_partkey")
        .limit(k)
        .select(
            "l_partkey",
            "n_orders",
            F.round(F.col("__score_micro") / 1000000.0, 6).alias(
                "trend_score"
            ),
        )
    )


def ucb_ranking(
    spark: SparkSession,
    sf_dir: str,
    min_pulls: int = 25,
    k: int = 20,
) -> DataFrame:
    """UCB1 explore/exploit ranking over item interaction history — the
    bandit scoring a recommender serves between model refreshes (the
    reference retrains ALS offline and serves a static top-N; a bandit
    layer is how production closes the feedback loop without waiting for
    the next batch train).  Arm = part, pull = a lineitem touch, reward
    = the line was kept (l_returnflag = 'N').  UCB1 score =
    mean_reward + sqrt(2·ln(N)/n) — items with few pulls get a wide
    confidence bonus, well-explored items converge to their mean.

    Determinism: mean and bonus are IEEE double expressions of integer
    aggregates (identical on both engines — the bm25_scores ln()
    precedent), rounded to 6 dp; the cut is on the (score, item) total
    order.

    Scale: ONE map-side-combined aggregation over the fact table on
    l_partkey; the total-pull count N rides along as a broadcast 1-row
    aggregate crossJoin; top-K via TakeOrdered.  No windows, no joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "N", 1).otherwise(0).alias("__r"),
    )
    arms = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_pulls"),
        F.sum("__r").cast("long").alias("__s"),
    )
    total = arms.agg(F.sum("n_pulls").cast("long").alias("__N"))
    mean = F.col("__s") / F.col("n_pulls")
    bonus = F.sqrt(F.lit(2.0) * F.log(F.col("__N")) / F.col("n_pulls"))
    return (
        arms.crossJoin(F.broadcast(total))
        .filter(F.col("n_pulls") >= min_pulls)
        .select(
            "l_partkey",
            "n_pulls",
            F.round(mean, 6).alias("mean_reward"),
            F.round(mean + bonus, 6).alias("ucb_score"),
        )
        .orderBy(F.desc("ucb_score"), "l_partkey")
        .limit(k)
    )


def session_ngrams(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    k: int = 15,
) -> DataFrame:
    """Frequent in-session event sequences (PrefixSpan-lite): sessionize
    the event stream (same gaps-and-islands kernel and >= gap boundary
    as operators/windows.sessionize), slide a trigram window over each
    session's event-type sequence, and count the top-K paths corpus-wide
    — the "what do users actually do" mining step behind funnel design
    (event_funnel picks steps; this discovers them).

    Determinism: in-session order is the (ts, event_id) total order, so
    every trigram is reproducible; the cut is on (count DESC, trigram).

    Scale: all windows are partitioned by user (lag for the gap flag,
    running sum for session ids, two leads for the trigram) — one
    shuffle on user_id serves all four; the trigram count is one
    map-side-combined aggregation.  No unpartitioned window anywhere."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    flagged = events.select(
        "user_id", "event_id", "ts", "event_type"
    ).withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.col("ts")
                >= F.col("prev_ts")
                + F.expr(f"INTERVAL {gap_minutes} MINUTES")
            ),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy("user_id", "session_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    tri = sessioned.select(
        "user_id",
        F.col("event_type").alias("__e1"),
        F.lead("event_type", 1).over(w_sess).alias("__e2"),
        F.lead("event_type", 2).over(w_sess).alias("__e3"),
    ).filter(F.col("__e2").isNotNull() & F.col("__e3").isNotNull())
    return (
        tri.select(
            F.concat_ws(">", "__e1", "__e2", "__e3").alias("trigram"),
            "user_id",
        )
        .groupBy("trigram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "trigram")
        .limit(k)
    )


#: Exponential-decay weights for the 14-day EWMA baseline, frozen as
#: micro fixed-point literals (round(0.7^k * 1e6) for k = 1..14) so the
#: Spark plan and the DuckDB oracle share the exact same integers —
#: no runtime pow(), no libm.
EWMA_WEIGHTS_MICRO: tuple[tuple[int, int], ...] = (
    (1, 700000), (2, 490000), (3, 343000), (4, 240100), (5, 168070),
    (6, 117649), (7, 82354), (8, 57648), (9, 40354), (10, 28248),
    (11, 19773), (12, 13841), (13, 9689), (14, 6782),
)


def ewma_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA anomaly detection over per-type daily event volume — the
    pipeline-health monitor a production ingest runs: each day's count is
    compared to an exponentially-weighted baseline of the previous 14
    days; a ratio outside [0.5, 1.5] flags a feed outage or a burst.
    The closed-form EWMA (weights frozen as integer literals, baseline =
    Σ w·x / Σ w) sidesteps the sequential recurrence that doesn't
    distribute AND all engine pow() divergence.

    Determinism: numerator/denominator are exact BIGINT folds; the only
    double op is the final division, identical on identical inputs; the
    flag tests the ROUNDED ratio.

    Scale: one fact-scan aggregation to (event_type, day) counts —
    everything after runs on the ~types×days frame: a broadcast 14-row
    weight join shifts each day's count onto the 14 future days it
    baselines (equi-join, no range scan), one regroup, one equi-join
    back.  Days without full 14-day history are excluded."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return ewma_flags_from_counts(spark, counts)


def ewma_flags_from_counts(
    spark: SparkSession, counts: DataFrame
) -> DataFrame:
    """The EWMA baseline + flag kernel of :func:`ewma_anomalies`, shared
    with the streaming twin (streaming/replay.stream_ewma_anomalies):
    input is a (event_type, day, n) counts frame — batch-aggregated or
    drained from a streaming sink — output the flagged profile.

    Shape note: the current-day count rides the SAME shifted-contribution
    aggregation as the history (a zero-weight age-0 row), so there is no
    counts-to-baseline self-join — which also keeps the kernel usable on
    self-join-hostile frames like a streaming memory sink."""
    ages = spark.createDataFrame(
        [(0, 0), *EWMA_WEIGHTS_MICRO], "age INT, w LONG"
    )
    folded = (
        counts.crossJoin(F.broadcast(ages))
        .select(
            "event_type",
            (F.col("day") + F.col("age")).alias("day"),
            "age",
            (F.col("w") * F.col("n")).alias("__wn"),
            "w",
            "n",
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum(F.when(F.col("age") == 0, F.col("n")))
            .cast("long")
            .alias("n"),
            F.sum(F.when(F.col("age") > 0, F.col("__wn")).otherwise(0))
            .cast("long")
            .alias("__ws"),
            F.sum(F.when(F.col("age") > 0, F.col("w")).otherwise(0))
            .cast("long")
            .alias("__sw"),
            F.sum(F.when(F.col("age") > 0, 1).otherwise(0)).alias("__nh"),
        )
        .filter(
            F.col("n").isNotNull()
            & (F.col("__nh") == len(EWMA_WEIGHTS_MICRO))
        )
    )
    ratio = F.round(F.col("n") * F.col("__sw") / F.col("__ws"), 6)
    return folded.select(
        "event_type",
        "day",
        "n",
        F.round(F.col("__ws") / F.col("__sw"), 4).alias("baseline"),
        ratio.alias("ratio"),
        F.when((ratio >= 1.5) | (ratio <= 0.5), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    ).orderBy("event_type", "day")


def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of time-to-first-purchase — the
    right-censoring-aware conversion curve (a plain "median hours to
    purchase over converters" is biased optimistic because users who
    never converted are silently dropped; KM keeps them at risk until
    their observation window ends).  Duration = hours from a user's
    first event to their first purchase; users with no purchase are
    right-censored at the corpus horizon (standard convention: deaths
    at t precede censorings at t, so both stay in the risk set at t).

    Estimator arithmetic is engine-reproducible: at-risk counts fold as
    integers via a reverse cumulative sum over the ≤ #hours-in-corpus
    duration frame; the survival product Π(1−dᵢ/nᵢ) is computed as
    exp(Σ ln((nᵢ−dᵢ)/nᵢ)) with the ln/exp libm precedent (bm25/ucb)
    behind round(…, 6), with the all-remaining-die edge (nᵢ = dᵢ → S=0
    from that point on, where ln would blow up) guarded by an integer
    prefix-max flag on both engines.

    Scale: per-user min/conditional-min aggregation (one shuffle on
    user_id), then every window runs over the duration-level frame —
    bounded by the corpus hour span, never by row count (pinned in
    _GLOBAL_WINDOW_AUDITED).

    Output per death time: t_hours, n_risk, n_deaths, n_censored,
    survival."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 3600.0).cast("long").alias("h"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    horizon = ev.agg(F.max("h").alias("__max_h"))
    per_user = ev.groupBy("user_id").agg(
        F.min("h").alias("__first_h"),
        F.min(F.when(F.col("is_p") == 1, F.col("h"))).alias("__first_p"),
    )
    durations = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("__first_p").isNotNull(),
            F.col("__first_p") - F.col("__first_h"),
        )
        .otherwise(F.col("__max_h") - F.col("__first_h"))
        .cast("long")
        .alias("t_hours"),
        F.col("__first_p").isNotNull().cast("int").alias("d"),
    )
    level = durations.groupBy("t_hours").agg(
        F.sum("d").cast("long").alias("n_deaths"),
        F.sum(1 - F.col("d")).cast("long").alias("n_censored"),
    )
    w_rev = (
        Window.orderBy(F.desc("t_hours"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = level.withColumn(
        "n_risk",
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(w_rev),
    )
    deaths = at_risk.filter(F.col("n_deaths") > 0)
    w_fwd = (
        Window.orderBy("t_hours")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = (
        deaths.withColumn(
            "__zero",
            F.max(
                (F.col("n_deaths") >= F.col("n_risk")).cast("int")
            ).over(w_fwd),
        )
        .withColumn(
            "__lnsum",
            F.sum(
                F.when(
                    F.col("n_deaths") < F.col("n_risk"),
                    F.log(
                        (F.col("n_risk") - F.col("n_deaths"))
                        / F.col("n_risk").cast("double")
                    ),
                ).otherwise(F.lit(0.0))
            ).over(w_fwd),
        )
        .withColumn(
            "survival",
            F.when(F.col("__zero") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.col("__lnsum")), 6)
            ),
        )
    )
    return curve.select(
        "t_hours", "n_risk", "n_deaths", "n_censored", "survival"
    ).orderBy("t_hours")


def ols_trend_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend line over daily event
    volume — the closed-form regression a monitoring pipeline fits per
    segment ("is error volume trending up?") without MLlib: slope,
    intercept, and R² come straight from the five sufficient statistics
    (n, Σx, Σy, Σxx, Σxy, Σyy), which distribute as exact BIGINT folds.

    x = day index relative to the corpus min day (broadcast 1-row
    anchor, so x stays small and Σxx cannot overflow); y = that group's
    event count for the day.  The sufficient statistics are integers on
    both engines; slope/intercept/R² combine them as doubles with
    identical expression shape, rounded at 6 dp.

    Scale: one (day, type) pre-aggregation (map-side combined), one
    #groups×#days-row per-group fold — no windows, no joins beyond the
    broadcast anchor.  Adding a regressor means adding a moment column,
    not a new pass."""
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        "event_type",
    )
    anchor = ev.agg(F.min("day").alias("__day0"))
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            (F.col("day") - F.col("__day0")).cast("long").alias("x"),
            "y",
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("__sx"),
        F.sum("y").cast("long").alias("__sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("__sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("__sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("__syy"),
    )
    n = F.col("n_days").cast("double")
    cov_n = n * F.col("__sxy") - F.col("__sx").cast("double") * F.col("__sy")
    var_x_n = n * F.col("__sxx") - F.col("__sx").cast("double") * F.col("__sx")
    var_y_n = n * F.col("__syy") - F.col("__sy").cast("double") * F.col("__sy")
    slope = cov_n / var_x_n
    return stats.select(
        "event_type",
        "n_days",
        F.col("__sy").alias("n_events"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(
            (F.col("__sy") - slope * F.col("__sx")) / n, 6
        ).alias("intercept"),
        F.round(cov_n * cov_n / (var_x_n * var_y_n), 6).alias("r2"),
    ).orderBy("event_type")


#: Poisson(1) CDF thresholds P(X <= k), k = 0..7, frozen to 12 dp and
#: embedded identically in the Spark plan and the DuckDB oracle (the
#: EWMA_WEIGHTS_MICRO literal discipline) — the inverse-CDF table that
#: turns an md5-uniform draw into a bootstrap replica weight.
POISSON1_CDF = [
    0.367879441171,
    0.735758882343,
    0.919698602929,
    0.981011843124,
    0.996340153173,
    0.999405815182,
    0.999916758851,
    0.999989750803,
]

POISSON1_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    + " ELSE 8 END"
)


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimate per event segment — the classic
    "WHEN did the level shift?" complement of the drift quartet
    (Welch/KS/MW say IF the halves differ; Page's cumulative-sum
    statistic localizes the break): the day t maximizing |Σ_{i≤t}
    (yᵢ − μ)| is the maximum-likelihood single-changepoint location
    for a mean shift.

    Arithmetic is exact end-to-end: with per-day counts yᵢ and total T
    over n days, the scaled deviation Dᵢ = n·yᵢ − T is an INTEGER, so
    the CUSUM path Sₜ = ΣDᵢ folds as BIGINT and the argmax is an
    integer total order (abs desc, then earliest day).  Only the
    human-readable magnitude divides back by n at the end.

    Scale: one (type, day) pre-aggregation; the cumsum window
    partitions by segment over day-level rows (bounded by the calendar,
    not the row count).

    Output per event_type: n_days, total, peak_day (epoch day),
    cusum_max (mean-units, 4 dp), shift_sign."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    return cusum_from_counts(daily)


def cusum_from_counts(daily: DataFrame) -> DataFrame:
    """Shared readout of the CUSUM changepoint — takes the per-(segment,
    day) count frame (the state a streaming twin keeps current) and
    emits the argmax localization.  Shared by :func:`cusum_changepoint`
    and replay.stream_cusum_changepoint, so the streamed localization
    is bit-identical to the batch one."""
    from pyspark.sql import Window

    totals = daily.groupBy("event_type").agg(
        F.sum("y").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    dev = daily.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "day",
        "total",
        "n_days",
        (F.col("n_days") * F.col("y") - F.col("total"))
        .cast("long")
        .alias("d"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    path = dev.withColumn("s", F.sum("d").over(w_cum))
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.asc("day")
    )
    return (
        path.withColumn("__rk", F.row_number().over(w_pick))
        .filter(F.col("__rk") == 1)
        .select(
            "event_type",
            "n_days",
            "total",
            F.col("day").alias("peak_day"),
            F.round(F.abs(F.col("s")) / F.col("n_days").cast("double"), 4)
            .alias("cusum_max"),
            F.signum(F.col("s")).cast("int").alias("shift_sign"),
        )
        .orderBy("event_type")
    )


def seasonal_naive_eval(
    spark: SparkSession, sf_dir: str, season_days: int = 7
) -> DataFrame:
    """Seasonal-naive forecast backtest — THE baseline every volume
    forecast must beat before it earns a deploy (ŷ(d) = y(d − 7): free,
    and on weekly-seasonal traffic embarrassingly strong): per segment,
    MAE / MAPE / bias of the same-weekday-last-week prediction over
    every day with a 7-day-old partner.

    Arithmetic: counts are integers, so |y − ŷ| folds as BIGINT; MAPE
    lifts each day's relative error to integer 1e-6 units before the
    fold (the micro discipline — double sums are order-dependent).

    Scale: one (segment, day) pre-aggregation and a self-join on
    (segment, day − 7) — day-level frames, calendar-bounded."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    lagged = daily.select(
        "event_type",
        (F.col("day") + season_days).alias("day"),
        F.col("y").alias("yhat"),
    )
    joined = daily.join(lagged, ["event_type", "day"])
    folds = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.abs(F.col("y") - F.col("yhat")))
        .cast("long")
        .alias("__sae"),
        F.sum(F.col("y") - F.col("yhat")).cast("long").alias("__sbias"),
        F.sum(
            F.round(
                F.lit(1000000.0)
                * F.abs(F.col("y") - F.col("yhat"))
                / F.col("y")
            ).cast("long")
        )
        .cast("long")
        .alias("__sape_micro"),
    )
    return folds.select(
        "event_type",
        "n_eval",
        F.round(F.col("__sae") / F.col("n_eval").cast("double"), 4).alias(
            "mae"
        ),
        F.round(
            F.col("__sape_micro") / F.col("n_eval") / 1000000.0, 6
        ).alias("mape"),
        F.round(
            F.col("__sbias") / F.col("n_eval").cast("double"), 4
        ).alias("bias"),
    ).orderBy("event_type")


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust means per segment — the outlier-resistant KPI
    (a handful of fat-finger values can move a raw mean; clipping at
    the exact global 1st/99th percentiles bounds any single row's
    influence).  The thresholds come from the range-shuffle EXACT
    quantile kernel (text.global_quantile_threshold — no per-row global
    sort, no fat-partition histogram window), values clip in integer
    cents, and every fold is BIGINT.

    Scale: two threshold kernels over one (value, count) histogram +
    one broadcast of the 1-row threshold frame into a single scan.

    Output per event_type: n, raw_mean, winsorized_mean, n_clipped_lo,
    n_clipped_hi."""
    from project_bigdata_recsys_spark.functions.text import (
        global_quantile_threshold,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    lo = global_quantile_threshold(ev, "vc", 0.01).select(
        F.col("threshold").alias("__lo")
    )
    hi = global_quantile_threshold(ev, "vc", 0.99).select(
        F.col("threshold").alias("__hi")
    )
    th = lo.crossJoin(hi)
    clipped = ev.crossJoin(F.broadcast(th)).select(
        "event_type",
        "vc",
        F.greatest(F.col("__lo"), F.least(F.col("__hi"), F.col("vc")))
        .cast("long")
        .alias("wc"),
        (F.col("vc") < F.col("__lo")).cast("int").alias("__clo"),
        (F.col("vc") > F.col("__hi")).cast("int").alias("__chi"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum("vc").cast("long") / F.count(F.lit(1)) / 100.0, 6
            ).alias("raw_mean"),
            F.round(
                F.sum("wc").cast("long") / F.count(F.lit(1)) / 100.0, 6
            ).alias("winsorized_mean"),
            F.sum("__clo").cast("long").alias("n_clipped_lo"),
            F.sum("__chi").cast("long").alias("n_clipped_hi"),
        )
        .orderBy("event_type")
    )


def degree_distribution_profile(
    spark: SparkSession, sf_dir: str, d_min: int = 2
) -> DataFrame:
    """Key-degree distribution with a Hill power-law tail estimate —
    the skew diagnostic that decides salting/AQE strategy BEFORE a join
    runs (complement of skew_report's top-K: this sees the whole
    shape).  Degrees of lineitem.l_partkey bucket by integer log2
    (length(bin(d)) − 1 — exact integer arithmetic, no libm at bucket
    boundaries); the tail exponent is the Hill/MLE estimator
    α = 1 + n/(Σ ln d − n·ln(d_min − ½)) over d ≥ d_min, with each ln d
    frozen to integer 1e-6 units per KEY before the fold (double sums
    are order-dependent; ln of an exact integer is the libm
    precedent).

    Scale: one degree aggregation, one ≤64-row bucket rollup, one
    broadcast 1-row alpha frame.

    Output per log2 bucket: bucket, n_keys, min_degree, max_degree,
    plus the constant tail columns n_tail, hill_alpha."""
    deg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    buckets = deg.groupBy(
        (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
    )
    tail = deg.filter(F.col("d") >= d_min).agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(F.round(F.log("d") * 1000000.0).cast("long"))
        .cast("long")
        .alias("__sln_micro"),
    )
    alpha = tail.select(
        "n_tail",
        F.round(
            1.0
            + F.col("n_tail")
            / (
                F.col("__sln_micro") / 1000000.0
                - F.col("n_tail") * float(math_log_half(d_min))
            ),
            6,
        ).alias("hill_alpha"),
    )
    return (
        buckets.crossJoin(F.broadcast(alpha))
        .select(
            "bucket", "n_keys", "min_degree", "max_degree",
            "n_tail", "hill_alpha",
        )
        .orderBy("bucket")
    )


def math_log_half(d_min: int) -> float:
    """ln(d_min − ½) frozen to 12 dp — the Hill-estimator continuity
    correction, embedded as the SAME literal in the Spark plan and the
    DuckDB oracle (the POISSON1_CDF literal discipline)."""
    import math

    return round(math.log(d_min - 0.5), 12)


def acf_ljung_box(
    spark: SparkSession, sf_dir: str, max_lag: int = 7
) -> DataFrame:
    """Sample autocorrelation (lags 1..max_lag) of each event type's
    DAILY count series plus the cumulative Ljung-Box Q statistic — the
    standard "is this volume series white noise?" diagnostic a pipeline
    runs before trusting a seasonal baseline (complements
    seasonal_naive_eval / ewma_anomalies, which ASSUME structure this
    query tests for).

    Exactness: with x_t the day-t count (missing days are true zeros in
    the contiguous [min_day, max_day] range), the demeaned ACF expands
    into pure BIGINT cross-moments —

        r_k = (n^2*C_k - n*S*(A_k + B_k) + (n-k)*S^2)
              / (n^2*SS - n*S^2)

    where C_k = sum x_t*x_{t-k}, A_k / B_k the range-clipped sums and
    S/SS the series total / sum of squares: one exact integer division
    per lag, rounded to 6 dp; Q_k = n(n+2) * cumsum_j<=k(r_j^2/(n-j))
    is computed from the ROUNDED r_j on both engines (identical doubles
    in, identical doubles out), rounded to 4 dp.  Zero-count days
    contribute nothing to C/A/B, so the whole statistic reads off the
    nonzero (event_type, day) count frame — the day GRID is never
    materialized.

    Scale: one fact aggregation to (type, day) counts (bounded by
    #types x #days, thousands of rows for years of data), then a
    #lags-way self-join on that tiny frame.  Integer cross-moments stay
    exact below ~9e15 (double/BIGINT); at counts where n^2*C_k would
    pass 2^63 the same plan runs with DECIMAL(38,0) casts (the
    fixedpoint.sum_fixed widening convention)."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events")
    # persist: the (type, day) count frame feeds the bounds rollup, both
    # self-join sides, and the clipped sums — unmaterialized, each
    # consumer re-ran the fact aggregation (5 events scans; guide §5).
    # #types × #days rows.
    counts = persist_tracked(
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        (F.max("day") - F.min("day") + 1).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    # pair cross-products: join counts to itself at distance `lag`
    c1 = counts.select("event_type", "day", F.col("x").alias("x_t"))
    c2 = counts.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day0"),
        F.col("x").alias("x_tk"),
    )
    ck = (
        c1.crossJoin(F.broadcast(lags))
        .join(
            c2,
            (F.col("event_type") == F.col("et2"))
            & (F.col("day") == F.col("day0") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("x_t") * F.col("x_tk")).cast("long").alias("c_k"))
    )
    # range-clipped sums A_k (t > k) and B_k (t <= n-k)
    clipped = (
        counts.join(F.broadcast(bounds), "event_type")
        .crossJoin(F.broadcast(lags))
        .groupBy("event_type", "lag")
        .agg(
            F.sum(
                F.when(F.col("day") >= F.col("d0") + F.col("lag"), F.col("x"))
                .otherwise(0)
            )
            .cast("long")
            .alias("a_k"),
            F.sum(
                F.when(F.col("day") <= F.col("d1") - F.col("lag"), F.col("x"))
                .otherwise(0)
            )
            .cast("long")
            .alias("b_k"),
        )
    )
    terms = (
        clipped.join(ck, ["event_type", "lag"], "left")
        .withColumn("c_k", F.coalesce(F.col("c_k"), F.lit(0)))
        .join(F.broadcast(bounds), "event_type")
        .filter(F.col("lag") < F.col("n"))
        .select(
            "event_type",
            "lag",
            F.col("n").alias("n_days"),
            F.round(
                (
                    F.col("n") * F.col("n") * F.col("c_k")
                    - F.col("n")
                    * F.col("s")
                    * (F.col("a_k") + F.col("b_k"))
                    + (F.col("n") - F.col("lag")) * F.col("s") * F.col("s")
                ).cast("double")
                / (
                    F.col("n") * F.col("n") * F.col("ss")
                    - F.col("n") * F.col("s") * F.col("s")
                ),
                6,
            ).alias("acf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("lag")
    return (
        terms.withColumn(
            "__term",
            F.col("acf") * F.col("acf") / (F.col("n_days") - F.col("lag")),
        )
        .withColumn(
            "q_stat",
            F.round(
                F.col("n_days")
                * (F.col("n_days") + 2)
                * F.sum("__term").over(w),
                4,
            ),
        )
        .drop("__term")
        .orderBy("event_type", "lag")
    )


def bradley_terry_ratings(
    spark: SparkSession, sf_dir: str, iters: int = 8
) -> DataFrame:
    """Bradley-Terry strength ratings from pairwise preferences via the
    MM algorithm (Hunter 2004) — the estimator behind RLHF reward-model
    preference data and ranking-from-duels evaluations.  Duels are
    derived deterministically from behavior: for every user and every
    pair of event types the user performed, the type with the HIGHER
    per-user count wins (ties dropped).  Eight MM updates
    ``u_i = W_i / sum_j g_ij / (w_i + w_j)`` with per-iteration
    sum-normalization, each iterate frozen to 6 dp so both engines fold
    identical doubles (the pagerank unrolled-iteration recipe, plus a
    per-step round).

    Scale: the fact table reduces to (user, type) counts, then a
    per-user self-join whose fan-out is bounded by #types^2 per user.
    The duel matrix itself is bounded by #event-types² (~25 cells at any
    sf), so it is collected ONCE (the bounded-collect class of
    ml/ranking.py and the partition-metadata collects in
    operators/maintenance.py) and the MM fixed-point runs driver-side —
    8 iterations over a 25-cell matrix is arithmetic, not a distributed
    job, and the pre-r10 frame-per-iterate version spent ~3 s of pure
    scheduler round-trips on it.  The fact table is never touched after
    the one distributed duel aggregation."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = cnt.select(
        "user_id", F.col("event_type").alias("ti"), F.col("n").alias("ni")
    )
    b = cnt.select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("tj"),
        F.col("n").alias("nj"),
    )
    duels = a.join(
        b, (F.col("user_id") == F.col("u2")) & (F.col("ti") < F.col("tj"))
    ).filter(F.col("ni") != F.col("nj"))
    wins = (
        duels.select(
            F.when(F.col("ni") > F.col("nj"), F.col("ti"))
            .otherwise(F.col("tj"))
            .alias("winner"),
            F.when(F.col("ni") > F.col("nj"), F.col("tj"))
            .otherwise(F.col("ti"))
            .alias("loser"),
        )
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # the ONE bounded collect: ≤ #event-types² (winner, loser, w) cells
    win_rows = wins.collect()
    games: dict[tuple[str, str], int] = {}
    big_w: dict[str, int] = {}
    n_wins: dict[str, int] = {}
    for r in win_rows:
        games[(r.winner, r.loser)] = games.get((r.winner, r.loser), 0) + r.w
        games[(r.loser, r.winner)] = games.get((r.loser, r.winner), 0) + r.w
        big_w[r.winner] = big_w.get(r.winner, 0) + r.w
        n_wins[r.winner] = n_wins.get(r.winner, 0) + r.w
    items = sorted({i for i, _ in games})
    rating = {i: 1.0 for i in items}
    for _ in range(iters):
        u = {}
        for i in items:
            den = 0.0
            for j in items:
                g = games.get((i, j))
                if g:
                    # clamp: two all-loss items dueling only each other
                    # can collapse rating[i]+rating[j] to 0 after an
                    # all-loss iteration — the distributed version
                    # produced NULLs there, not a ZeroDivisionError
                    den += g / max(rating[i] + rating[j], 1e-12)
            u[i] = (big_w.get(i, 0) / den) if den else 0.0
        s = sum(u[i] for i in items)
        if not s:
            break
        rating = {i: _round_half_up(u[i] / s, 6) for i in items}
    n_games = {
        i: sum(g for (a, _), g in games.items() if a == i) for i in items
    }
    out_rows = [
        (i, n_wins.get(i, 0), n_games.get(i, 0), rating[i]) for i in items
    ]
    return spark.createDataFrame(
        out_rows, "item string, n_wins bigint, n_games bigint, rating double"
    ).orderBy(F.col("rating").desc(), "item")


def pinball_quantile_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile-forecast backtest under pinball loss: per event type,
    fit constant q10/q50/q90 predictors as EXACT order statistics of
    the train-half daily counts (zero-count days included as true
    zeros), then score the test half with the pinball (quantile) loss —
    the standard scoring rule that makes under- vs over-prediction
    asymmetry explicit and which a plain MAE/RMSE backtest
    (seasonal_naive_eval) cannot assess.

    Exactness: the day split is the integer midpoint of the observed
    range; quantiles come off a (type, count) histogram cumsum at rank
    ceil(q·n/100); pinball loss in integer hundredths —
    q·(y−ŷ) or (100−q)·(ŷ−y) — summed as BIGINT and divided once.

    Scale: the fact table reduces to (type, day) counts; the day grid
    is #types × #days (bounded, years = thousands); histogram cumsum
    windows partition per type over distinct count values."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events")
    # persist: counts feeds the bounds rollup AND the grid join; the
    # zero-filled series feeds the train histogram AND the test scoring
    # — unmaterialized, each consumer re-ran the fact aggregation
    # (4 events scans; guide §5).  Both frames are #types × #days rows.
    counts = persist_tracked(
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        F.floor((F.col("d0") + F.col("d1")) / 2).cast("long").alias("mid"),
    )
    series = persist_tracked(
        grid.join(counts, ["event_type", "day"], "left").select(
            "event_type",
            "day",
            "mid",
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    train = series.filter(F.col("day") <= F.col("mid"))
    test = series.filter(F.col("day") > F.col("mid"))
    hist = train.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("y")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "y",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(wn).cast("long").alias("n_train_days"),
    )
    qs = spark.createDataFrame([(10,), (50,), (90,)], ["q"]).select(
        F.col("q").cast("int").alias("q")
    )
    preds = (
        cum.crossJoin(F.broadcast(qs))
        .filter(
            F.col("cum_n")
            >= F.ceil(F.col("q") * F.col("n_train_days") / 100.0).cast("long")
        )
        .groupBy("event_type", "q", "n_train_days")
        .agg(F.min("y").cast("long").alias("pred"))
    )
    loss_c = F.when(
        F.col("y") >= F.col("pred"),
        F.col("q") * (F.col("y") - F.col("pred")),
    ).otherwise((100 - F.col("q")) * (F.col("pred") - F.col("y")))
    return (
        test.join(F.broadcast(preds), "event_type")
        .groupBy("event_type", "q", "n_train_days", "pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_days"),
            F.round(F.sum(loss_c) / 100.0 / F.count(F.lit(1)), 4).alias(
                "avg_pinball"
            ),
        )
        .select(
            "event_type",
            "q",
            "pred",
            "n_train_days",
            "n_test_days",
            "avg_pinball",
        )
        .orderBy("event_type", "q")
    )


def absorption_funnel_prob(
    spark: SparkSession, sf_dir: str, target: str = "purchase", steps: int = 6
) -> DataFrame:
    """Markov absorption probabilities: P(reach the ``target`` event
    within 1/3/6 behavioral steps | current event type), from the
    first-order transition chain with the target made absorbing — the
    quantitative funnel (event_funnel counts one fixed path;
    this scores EVERY state's distance-to-conversion, the number a
    growth team ranks intervention points by).

    p_0 = 1{target};  p_k(s) = Σ_to P(s→to)·p_{k-1}(to), target pinned
    at 1 — ``steps`` unrolled fixed-point iterations, each iterate
    rounded to 6 dp so both engines fold identical doubles (the
    pagerank/BT recipe, with :func:`_round_half_up` as the driver-side
    twin of ``F.round``).

    Scale: the fact table reduces to the #types² transition matrix via
    one user-partitioned lag window; the matrix (~25 cells at any sf)
    is collected ONCE (bounded-collect class, ml/ranking.py precedent)
    and the absorption chain runs driver-side — the pre-r10 version
    burned ~3 s of scheduler round-trips iterating #types-row frames."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps_df = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps_df.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # the ONE bounded collect: ≤ #event-types² transition cells
    cells = counts.collect()
    n_out: dict[str, int] = {}
    for r in cells:
        n_out[r.from_type] = n_out.get(r.from_type, 0) + r.n
    prob = {(r.from_type, r.to_type): r.n / n_out[r.from_type] for r in cells}
    states = sorted(n_out)
    ph = {s: 1.0 if s == target else 0.0 for s in states}
    snapshots: dict[int, dict[str, float]] = {}
    for k in range(1, steps + 1):
        nxt = {}
        for s in states:
            acc = 0.0
            for t in states:
                p_st = prob.get((s, t))
                if p_st:
                    acc += p_st * ph[t]
            nxt[s] = _round_half_up(acc, 6)
        ph = {
            s: 1.0 if s == target else nxt.get(s, 0.0) for s in states
        }
        if k in (1, 3, steps):
            snapshots[k] = dict(ph)
    out_rows = [
        (s, n_out[s], *(snapshots[k][s] for k in sorted(snapshots)))
        for s in states
    ]
    schema = "state string, n_out bigint, " + ", ".join(
        f"p_hit_{k} double" for k in sorted(snapshots)
    )
    return spark.createDataFrame(out_rows, schema).orderBy("state")


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on each event type's daily
    count series — the distribution-free complement of
    ols_trend_per_group's parametric slope (MK sees ANY monotone trend,
    is immune to outlier days, and needs no linearity):
    S = Σ_{i<j} sign(x_j − x_i), Var(S) with the tie correction
    Σ t(t−1)(2t+5), z with the ±1 continuity correction, verdict at
    the 5% two-sided level.

    Exactness: S and the tie-group terms are pure BIGINT folds over
    the (type, day) count frame (zero days enter as true zeros via the
    bounded day grid); z is one sqrt of an integer ratio, rounded 4 dp.

    Scale: the fact table reduces to #types × #days counts; the pair
    fold is a per-type self-join over that bounded frame (≤ #days²
    per type, thousands of days = millions of tiny rows, still
    negligible next to the fact scan)."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    return mann_kendall_from_counts(counts)


def mann_kendall_from_counts(counts: DataFrame) -> DataFrame:
    """Shared readout of the Mann-Kendall test over a (event_type, day,
    y) count frame — the kernel behind :func:`mann_kendall_trend` and
    its streaming twin (replay.stream_mann_kendall), so the streamed
    verdict is bit-identical to batch."""
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    series = persist_tracked(series)
    a = series.select("event_type", "day", "y")
    b = series.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("y").alias("y2"),
    )
    s_stat = (
        a.join(
            b,
            (F.col("event_type") == F.col("et2"))
            & (F.col("day") < F.col("day2")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    n_days = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        series.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    joined = (
        n_days.join(s_stat, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                (
                    F.col("n_days")
                    * (F.col("n_days") - 1)
                    * (2 * F.col("n_days") + 5)
                    - F.col("tie_term")
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "event_type",
        "n_days",
        "s_stat",
        F.round("var_s", 4).alias("var_s"),
        F.round(z, 4).alias("z_score"),
        F.when(F.round(z, 4) > 1.96, F.lit("increasing"))
        .when(F.round(z, 4) < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    ).orderBy("event_type")


def woe_iv_profile(
    spark: SparkSession, sf_dir: str, n_bins: int = 10
) -> DataFrame:
    """Weight-of-evidence / information-value profile of event value
    against conversion — the credit-scoring feature-screening standard
    (IV < 0.02 useless, > 0.3 strong) that tells a feature-engineering
    pass whether a numeric column separates the label BEFORE any model
    is fit.  Value deciles are EXACT equal-count bins off the
    range-shuffle cumulative histogram (text.global_value_cum kernel;
    the bin index is pure integer arithmetic (n_bins·cum + N − 1) div
    N); WoE per bin is ln of Laplace-smoothed class shares (+0.5/bin),
    and IV folds micro-frozen per-bin terms so the total is exact.

    Scale: one kernel pass (no global sort), one join of the fact rows
    to the distinct-value bin map, one 10-group aggregation."""
    from project_bigdata_recsys_spark.functions.text import global_value_cum

    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("good"),
    )
    cum = global_value_cum(ev.select("v"), "v")
    binmap = cum.select(
        "v",
        F.expr(
            f"(({n_bins} * `__cum` + `__n_total` - 1) div `__n_total`)"
        )
        .cast("int")
        .alias("bin"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: binned feeds the class-total rollup and the scored frame,
    # and scored itself is consumed twice (IV fold + readout) — each
    # re-evaluation cascaded down through the fact join and the
    # range-shuffle cum kernel (12 events scans unmaterialized, §5).
    # n_bins rows.
    binned = persist_tracked(
        ev.join(binmap, "v").groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("good").cast("long").alias("n_good"),
            F.sum(1 - F.col("good")).cast("long").alias("n_bad"),
        )
    )
    tot = binned.agg(
        F.sum("n_good").cast("long").alias("__G"),
        F.sum("n_bad").cast("long").alias("__B"),
    )
    gs = (F.col("n_good") + 0.5) / (F.col("__G") + 0.5 * n_bins)
    bs = (F.col("n_bad") + 0.5) / (F.col("__B") + 0.5 * n_bins)
    woe = F.round(F.log(gs / bs), 6)
    scored = binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_good",
        "n_bad",
        F.round(F.col("n_good") / F.col("n"), 4).alias("good_rate"),
        woe.alias("woe"),
        F.round(F.lit(1_000_000.0) * (gs - bs) * woe)
        .cast("long")
        .alias("__ivt"),
    )
    iv = scored.agg(
        F.round(F.sum("__ivt") / 1e6, 6).alias("iv_total")
    )
    return (
        scored.drop("__ivt")
        .crossJoin(F.broadcast(iv))
        .orderBy("bin")
    )


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of each event type's daily count series —
    the median of all pairwise slopes (y_j − y_i)/(j − i): the
    estimator that PAIRS with mann_kendall_trend (MK detects a
    monotone trend, Theil-Sen quantifies it, both immune to outlier
    days where the OLS slope is not).

    Exactness: the pair frame is bounded (#days² per type); each slope
    is ONE double division of integers rounded to 9 dp, and the median
    is the exact lower-median order statistic under a total ordering
    (slope, day_i, day_j) — deterministic under ties.

    Scale: same shape as mann_kendall_trend — fact table → bounded
    day grid, per-type self-join over it; the rank window partitions
    per type."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    series = persist_tracked(series)
    b = series.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("y").alias("y2"),
    )
    slopes = (
        series.join(
            b,
            (F.col("event_type") == F.col("et2"))
            & (F.col("day") < F.col("day2")),
        )
        .select(
            "event_type",
            "day",
            "day2",
            F.round(
                (F.col("y2") - F.col("y")) / (F.col("day2") - F.col("day")),
                9,
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "day", "day2")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    return (
        ranked.filter(
            F.col("rn") == F.expr("(`n_pairs` + 1) div 2")
        )
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope").alias("slope_per_day"),
        )
        .orderBy("event_type")
    )


# Holt linear-trend weights for alpha=0.3, beta=0.1 over a 28-day
# window, unrolled offline to closed-form per-day coefficients and
# frozen to 1e-6 integers (the EWMA_WEIGHTS_MICRO discipline: the
# recursion runs at AUTHORING time; the engines only fold literals).
# Level weights sum to exactly 1_000_000, trend weights to 0.
HOLT_LEVEL_MICRO = [
    -21652, -3774, -4302, -4871, -5476, -6106, -6743, -7365, -7937,
    -8415, -8737, -8823, -8567, -7834, -6451, -4199, -802, 4085, 10891,
    20148, 32508, 48772, 69917, 97127, 131836, 175770, 231000, 300000,
]
HOLT_TREND_MICRO = [
    -4577, -928, -1090, -1274, -1483, -1717, -1979, -2268, -2584,
    -2924, -3285, -3659, -4037, -4404, -4740, -5017, -5196, -5231,
    -5056, -4589, -3726, -2332, -242, 2754, 6917, 12567, 20100, 30000,
]


def holt_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing backtest: fit level + trend on
    the 28 days before the final week of each event type's daily count
    series and score the 7-day-ahead forecasts ŷ(h) = level + h·trend —
    the trend-aware member of the forecasting family (seasonal_naive
    assumes pure seasonality, pinball_quantile_eval scores constants,
    ewma_anomalies has no trend term).

    Exactness: the Holt recursion (α=0.3, β=0.1, l₁=y₁, b₁=0) is
    linear in the observations, so its closed-form per-day weights are
    precomputed offline and embedded as micro-integer LITERALS in both
    engines — level, trend, every forecast and every absolute error is
    then a pure BIGINT fold; one division at the readout.

    Scale: fact table → bounded zero-filled day grid; the fit joins 28
    grid rows per type to a broadcast 28-row weight table."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events")
    # persist: the kernel consumes the count frame twice (bounds rollup
    # + grid join) — unmaterialized, the batch caller re-ran the fact
    # aggregation per consumer (guide §5; the stream twin feeds a
    # scratch-parquet frame instead, which re-reads cheaply)
    counts = persist_tracked(
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    return holt_eval_from_counts(counts)


def holt_eval_from_counts(counts: DataFrame) -> DataFrame:
    """Shared readout of the Holt backtest over a (event_type, day, y)
    count frame — the kernel behind :func:`holt_forecast_eval` and its
    streaming twin (replay.stream_holt_forecast), so the streamed fit
    and MAE are bit-identical to batch."""
    spark = counts.sparkSession
    bounds = counts.groupBy("event_type").agg(F.max("day").alias("d1"))
    grid = bounds.select(
        "event_type",
        "d1",
        F.explode(F.sequence(F.col("d1") - 34, F.col("d1"))).alias("day"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the 35-row-per-type zero-filled series feeds the train
    # fit AND the test scoring (guide §5)
    series = persist_tracked(
        grid.join(counts, ["event_type", "day"], "left").select(
            "event_type",
            "d1",
            "day",
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    weights = spark.createDataFrame(
        [
            (i + 1, HOLT_LEVEL_MICRO[i], HOLT_TREND_MICRO[i])
            for i in range(28)
        ],
        ["idx", "wl", "wb"],
    )
    train = series.filter(F.col("day") <= F.col("d1") - 7).withColumn(
        "idx", (F.col("day") - (F.col("d1") - 34) + 1).cast("long")
    )
    fit = (
        train.join(F.broadcast(weights), "idx")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("wl") * F.col("y")).cast("long").alias("l_micro"),
            F.sum(F.col("wb") * F.col("y")).cast("long").alias("b_micro"),
        )
    )
    test = series.filter(F.col("day") > F.col("d1") - 7).withColumn(
        "h", (F.col("day") - (F.col("d1") - 7)).cast("long")
    )
    scored = test.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "l_micro",
        "b_micro",
        F.abs(
            F.col("y") * 1_000_000
            - (F.col("l_micro") + F.col("h") * F.col("b_micro"))
        ).alias("abs_err_micro"),
    )
    return (
        scored.groupBy("event_type", "l_micro", "b_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_days"),
            F.round(F.sum("abs_err_micro") / 1e6 / F.count(F.lit(1)), 4)
            .alias("mae"),
        )
        .select(
            "event_type",
            F.round(F.col("l_micro") / 1e6, 4).alias("level"),
            F.round(F.col("b_micro") / 1e6, 4).alias("trend_per_day"),
            "n_test_days",
            "mae",
        )
        .orderBy("event_type")
    )


def overdispersion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check of daily counts per event type — the
    variance-to-mean dispersion index with its chi-square statistic
    ((n−1)·D against the Poisson null): the modeling gate a forecaster
    runs BEFORE trusting Poisson assumptions anywhere (alerting
    thresholds, rate CIs, the SPRT's binomial model).  D ≈ 1 Poisson,
    D > 1 clumped (bursts), D < 1 regular.

    Exactness: BIGINT count moments over the zero-filled bounded day
    grid; the index and chi-square are one division each, rounded 4
    dp.

    Scale: fact table → #types × #days counts; one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    m = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    mean = F.col("s") / F.col("n_days").cast("double")
    var = (
        F.col("ss") - F.col("s") * (F.col("s") / F.col("n_days").cast("double"))
    ) / (F.col("n_days") - 1.0)
    d_idx = F.round(var / mean, 4)
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        d_idx.alias("dispersion_index"),
        F.round((F.col("n_days") - 1) * var / mean, 4).alias("chi_square"),
        F.when(d_idx > 1.5, F.lit("overdispersed"))
        .when(d_idx < 0.67, F.lit("underdispersed"))
        .otherwise(F.lit("poisson_like"))
        .alias("verdict"),
    ).orderBy("event_type")


def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen capture-recapture estimate of a population from
    two sparse captures — validated here in the textbook way: two
    INDEPENDENT deterministic md5 subsamples (30% each) of the user
    population play the captures, and N̂ = (n1+1)(n2+1)/(m+1) − 1
    (Chapman's bias-corrected form) must recover the exact distinct
    count the engine can also compute — ``recovery_ratio`` ≈ 1 is the
    shipped evidence the estimator works, before it's pointed at a
    population where only samples exist (the actual use: users the
    corpus has NEVER seen, which no distinct-count can report).

    Exactness: the captures are pure md5 functions of the user id;
    every count is a BIGINT; one Chapman fold rounded to 2 dp.

    Scale: one distinct aggregation + one fold; no windows."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct().select(
        "user_id",
        (hash_uniform(F.col("user_id"), "crA:") < 0.3).cast("int").alias(
            "in_a"
        ),
        (hash_uniform(F.col("user_id"), "crB:") < 0.3).cast("int").alias(
            "in_b"
        ),
    )
    agg = users.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.sum(
            F.greatest(F.col("in_a"), F.col("in_b"))
        ).cast("long").alias("n_observed"),
        F.count(F.lit(1)).cast("long").alias("n_true"),
    )
    nhat = F.round(
        (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0,
        2,
    )
    return agg.select(
        "n1",
        "n2",
        "m",
        "n_observed",
        nhat.alias("n_hat"),
        "n_true",
        F.round(nhat / F.col("n_true"), 4).alias("recovery_ratio"),
    )


def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the four
    non-purchase event channels (click=1, view=2, signup=4, error=8 as
    bitmask members): the cooperative-game credit split marketing
    teams cite as the principled alternative to last-touch /
    position-based rules (multi_touch_attribution) — each channel's
    credit is its average marginal contribution to the conversion rate
    over ALL orderings of the other channels.  Exact enumeration is
    feasible because the coalition lattice is 2⁴ = 16 masks; the game
    value v(S) is the observed conversion rate of users whose channel
    set is EXACTLY S (unobserved coalitions contribute 0 — the
    standard observed-coalition convention).

    Exactness: per-mask rates rounded to 6 dp; Shapley weights are the
    exact rationals |S|!·(n−|S|−1)!/n! carried as integer numerators
    over 24; φ folds micro-frozen terms.

    Scale: one fact scan to per-user masks, one 16-row game table,
    and a 4×16 broadcast lattice walk."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.max((F.col("event_type") == "click").cast("int")) * 1
            + F.max((F.col("event_type") == "view").cast("int")) * 2
            + F.max((F.col("event_type") == "signup").cast("int")) * 4
            + F.max((F.col("event_type") == "error").cast("int")) * 8
        ).alias("mask"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    game = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.sum("conv") / F.count(F.lit(1)), 6).alias("v"),
    )
    grid = spark.range(16).select(F.col("id").cast("int").alias("m"))
    vfull = grid.join(game, grid.m == game.mask, "left").select(
        "m", F.coalesce(F.col("v"), F.lit(0.0)).alias("v")
    )
    channels = spark.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4), ("error", 8)],
        ["channel", "bit"],
    )
    # |S|!(n-|S|-1)!/n! for n=4 as 24ths, indexed by |S| = 0..3
    w24 = (
        F.when(F.col("s_size") == 0, 6)
        .when(F.col("s_size") == 1, 2)
        .when(F.col("s_size") == 2, 2)
        .otherwise(6)
    )
    base = (
        channels.crossJoin(F.broadcast(vfull))
        .filter(F.expr("(m & bit) = 0"))
        .select(
            "channel",
            "bit",
            F.col("m").alias("s_mask"),
            F.col("v").alias("v_s"),
            F.expr("bit_count(m)").cast("int").alias("s_size"),
        )
    )
    vb = vfull.select(
        F.col("m").alias("m_with"), F.col("v").alias("v_with")
    )
    terms = base.join(
        F.broadcast(vb),
        F.expr("m_with = (s_mask | bit)"),
    ).select(
        "channel",
        (
            w24
            * F.round(
                F.lit(1_000_000.0) * (F.col("v_with") - F.col("v_s"))
            ).cast("long")
        ).alias("t24"),
    )
    with_ch = per_user.crossJoin(F.broadcast(channels)).filter(
        F.expr("(mask & bit) != 0")
    ).groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_with_channel")
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.round(F.sum("t24") / 24.0 / 1e6, 6).alias("shapley_value")
        )
        .join(with_ch, "channel", "left")
        .select(
            "channel",
            F.coalesce(F.col("n_users_with_channel"), F.lit(0)).alias(
                "n_users_with_channel"
            ),
            "shapley_value",
        )
        .orderBy(F.desc("shapley_value"), "channel")
    )


def sequence_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order predictability of user journeys: per current event
    type, the conditional entropy H(next | current) = −Σ p·ln p over
    the observed transition distribution, its normalized form
    H/ln(#successors) ∈ [0,1], and the modal next step — the
    information-theoretic readout of the same transition matrix
    event_transitions counts and absorption_funnel_prob walks (H ≈ 0:
    rule-like behavior worth a dedicated funnel; H ≈ max: the next
    step is unpredictable and sequence features won't help a model).

    Exactness: transition counts are BIGINTs; each −p·ln p term is
    micro-frozen from exact integer ratios before the per-state fold;
    the modal step breaks ties by name.

    Scale: one user-partitioned lag window to #types² counts;
    everything after is broadcast-sized."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from project_bigdata_recsys_spark.caching import persist_tracked

    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    # persist: the #types² transition counts feed the out-mass rollup,
    # the entropy join, and BOTH sides of the modal-next join —
    # unmaterialized, each consumer re-ran the per-user lag window over
    # the fact table (4 events scans; guide §5)
    counts = persist_tracked(
        steps.groupBy("from_type", "to_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    outs = counts.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_out"),
        F.count(F.lit(1)).cast("long").alias("n_succ"),
    )
    term = F.round(
        F.lit(-1_000_000.0)
        * (F.col("n") / F.col("n_out"))
        * F.log(F.col("n") / F.col("n_out"))
    ).cast("long")
    ent = (
        counts.join(F.broadcast(outs), "from_type")
        .groupBy("from_type", "n_out", "n_succ")
        .agg(F.sum(term).cast("long").alias("h_micro"))
    )
    modal = counts.join(
        counts.groupBy("from_type").agg(F.max("n").alias("__mx")),
        "from_type",
    ).filter(F.col("n") == F.col("__mx")).groupBy("from_type").agg(
        F.min("to_type").alias("modal_next")
    )
    return (
        ent.join(modal, "from_type")
        .select(
            "from_type",
            "n_out",
            "n_succ",
            F.round(F.col("h_micro") / 1e6, 6).alias("entropy_nats"),
            F.when(
                F.col("n_succ") > 1,
                F.round(
                    F.col("h_micro")
                    / 1e6
                    / F.log(F.col("n_succ").cast("double")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("entropy_normalized"),
            "modal_next",
        )
        .orderBy("from_type")
    )


def markov_removal_attribution(
    spark: SparkSession, sf_dir: str, target: str = "purchase", steps: int = 6
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al.): each
    channel's credit is how much the journey-level conversion
    probability DROPS when walks may no longer pass through it — the
    other principled data-driven attribution next to
    shapley_channel_attribution (Shapley credits presence in the
    journey SET; removal effects credit position in the journey
    GRAPH).  Base conversion = Σ_s π(s)·p_hit(s) over the first-event
    distribution with the absorption chain of absorption_funnel_prob;
    removing channel c zeroes every transition into c (walks through
    it die, the classic unnormalized removal), and journeys STARTING
    at c die outright.

    Exactness: one transition matrix + one first-event distribution
    feed all five chains (base + 4 removals); every iterate is rounded
    to 6 dp (the absorption recipe), every Σ π·p term micro-frozen.

    Scale: the fact table is read twice (lag window, first-event
    window), both user-partitioned distributed reductions; the #types²
    transition matrix and #types first-event distribution (~30 cells
    total at any sf) are collected ONCE (bounded-collect class,
    ml/ranking.py precedent) and all five absorption chains run
    driver-side — the pre-r10 version burned ~6.6 s of scheduler
    round-trips iterating 5 chains × 6 steps of #types-row frames."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps_df = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps_df.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    first = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_first"))
    )
    # the two bounded collects: #types² transition cells + #types firsts
    cells = counts.collect()
    n_first = {r.event_type: r.n_first for r in first.collect()}
    n_users = sum(n_first.values())
    n_out: dict[str, int] = {}
    for r in cells:
        n_out[r.from_type] = n_out.get(r.from_type, 0) + r.n
    prob = {(r.from_type, r.to_type): r.n / n_out[r.from_type] for r in cells}
    all_states = sorted(n_out)

    def chain(excl: str | None) -> float:
        states = [s for s in all_states if s != excl]
        ph = {s: 1.0 if s == target else 0.0 for s in states}
        for _ in range(steps):
            nxt = {}
            for s in states:
                acc = 0.0
                for t in states:
                    p_st = prob.get((s, t))
                    if p_st:
                        acc += p_st * ph[t]
                nxt[s] = _round_half_up(acc, 6)
            ph = {s: 1.0 if s == target else nxt[s] for s in states}
        # B = Σ π(s)·p(s) over surviving states, micro-frozen per term
        tm = sum(
            int(_round_half_up(n_first[s] * ph[s] * 1e6, 0))
            for s in states
            if s in n_first
        )
        return _round_half_up(tm / 1e6 / n_users, 6)

    base = chain(None)
    rows = []
    for ch in ("click", "view", "signup", "error"):
        cpw = chain(ch)
        # degenerate corpus (base conversion probability 0): the removal
        # effect is undefined — emit NULL, the pre-collapse Spark-plan
        # divide-by-zero semantics
        re = (
            _round_half_up(1.0 - cpw / base, 6) if base else None
        )
        rows.append((ch, base, cpw, re))
    sre = sum(
        int(_round_half_up(re * 1e6, 0))
        for _, _, _, re in rows
        if re is not None
    )
    out_rows = [
        (
            ch,
            b,
            cpw,
            re,
            _round_half_up(int(_round_half_up(re * 1e6, 0)) / sre, 4)
            if re is not None and sre
            else None,
        )
        for ch, b, cpw, re in rows
    ]
    return spark.createDataFrame(
        out_rows,
        "channel string, base_conv_prob double, conv_prob_without double,"
        " removal_effect double, attribution_share double",
    ).orderBy(F.desc("removal_effect"), "channel")


def changepoint_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented trend readout at the CUSUM changepoint: split each
    event type's zero-filled daily series at the shared
    :func:`cusum_from_counts` peak and fit exact closed-form OLS slopes
    on each side — the composition that turns "a changepoint exists
    here" (cusum_changepoint) into "the trend went from +a/day to
    −b/day at day D", which is what an incident review actually asks.

    Exactness: both slopes are pure BIGINT sufficient-statistic folds
    ((nΣxy − ΣxΣy)/(nΣx² − (Σx)²), the ols_trend_per_group recipe),
    one division each rounded to 6 dp; degenerate one-day segments
    report slope 0.

    Scale: one fact aggregation + the bounded day grid; the CUSUM
    kernel and both OLS fits run on #types × #days rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    daily = persist_tracked(daily)
    peak = cusum_from_counts(daily).select(
        "event_type", "peak_day", "cusum_max"
    )
    seg = daily.join(F.broadcast(peak), "event_type").select(
        "event_type",
        "peak_day",
        "cusum_max",
        (F.col("day") <= F.col("peak_day")).cast("int").alias("before"),
        (F.col("day") - F.col("peak_day")).cast("long").alias("x"),
        "y",
    )
    stats = seg.groupBy("event_type", "peak_day", "cusum_max", "before").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den != 0,
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den,
            6,
        ),
    ).otherwise(F.lit(0.0))
    sided = stats.select(
        "event_type",
        "peak_day",
        "cusum_max",
        "before",
        slope.alias("slope"),
        F.round(F.col("sy") / F.col("n").cast("double"), 4).alias("mean_y"),
        F.col("n").alias("n_days"),
    )
    b = sided.filter(F.col("before") == 1).select(
        "event_type",
        "peak_day",
        "cusum_max",
        F.col("n_days").alias("n_days_before"),
        F.col("mean_y").alias("mean_before"),
        F.col("slope").alias("slope_before"),
    )
    a = sided.filter(F.col("before") == 0).select(
        "event_type",
        F.col("n_days").alias("n_days_after"),
        F.col("mean_y").alias("mean_after"),
        F.col("slope").alias("slope_after"),
    )
    return (
        b.join(a, "event_type", "left")
        .select(
            "event_type",
            "peak_day",
            "cusum_max",
            "n_days_before",
            F.coalesce(F.col("n_days_after"), F.lit(0)).alias("n_days_after"),
            "mean_before",
            F.coalesce(F.col("mean_after"), F.lit(0.0)).alias("mean_after"),
            "slope_before",
            F.coalesce(F.col("slope_after"), F.lit(0.0)).alias("slope_after"),
            F.round(
                F.coalesce(F.col("slope_after"), F.lit(0.0))
                - F.col("slope_before"),
                6,
            ).alias("slope_change"),
        )
        .orderBy("event_type")
    )


def spearman_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation between per-user
    activity (event count) and per-user spend (value total) — the
    robust dependence check beside the Pearson machinery
    (embedding_correlation_pairs): Spearman sees any monotone
    relationship and ignores the heavy upper tail that drives Pearson
    on money columns.

    Exactness: midranks are computed from the cumulative histogram as
    pure integers (double-rank 2c − n + 1, so .5 midranks never leave
    integer space); the correlation is one closed-form fold of BIGINT
    rank moments with a single sqrt, rounded to 6 dp.

    Scale: one fact aggregation to per-user pairs; both rank maps come
    off the range-shuffle cumulative-histogram kernel (no global sort)
    and join back by value — broadcast-sized distinct-value frames."""
    from project_bigdata_recsys_spark.functions.text import global_value_cum

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("a"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("b"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    per_user = persist_tracked(per_user)

    def drank(col: str):
        hist = per_user.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("__nv")
        )
        cum = global_value_cum(per_user.select(col), col)
        return (
            cum.join(hist, col)
            .select(
                F.col(col),
                (2 * F.col("__cum") - F.col("__nv") + 1)
                .cast("long")
                .alias(f"dr_{col}"),
            )
        )
    ranked = per_user.join(F.broadcast(drank("a")), "a").join(
        F.broadcast(drank("b")), "b"
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dr_a").cast("long").alias("sx"),
        F.sum("dr_b").cast("long").alias("sy"),
        F.sum(F.col("dr_a") * F.col("dr_a")).cast("long").alias("sxx"),
        F.sum(F.col("dr_b") * F.col("dr_b")).cast("long").alias("syy"),
        F.sum(F.col("dr_a") * F.col("dr_b")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_users"),
        F.round(
            num.cast("double") / F.sqrt(denx.cast("double") * deny),
            6,
        ).alias("spearman_rho"),
    )


def price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per part type: within each
    p_type, OLS of ln(total quantity sold) on ln(retail price) across
    parts — the econometric readout (a slope of −1.2 means a 1% price
    increase loses 1.2% of volume) that turns the warehouse's
    lineitem × part join into a pricing decision.

    Exactness: both logs are frozen to 1e-4 integers per part (libm ln
    of exact cent-derived doubles, the bm25 precedent), so the OLS
    sufficient statistics are BIGINT folds; the slope and R² divide
    once each (R² numerators cast to double before multiplying — the
    BIGINT product would overflow), rounded to 4 dp.

    Scale: one lineitem aggregation to per-part quantities, a
    broadcast join to the part dimension, one per-type fold."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = lineitem.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("long")
        .alias("q")
    )
    base = qty.join(
        F.broadcast(
            part.select("p_partkey", "p_type", "p_retailprice")
        ),
        qty.l_partkey == F.col("p_partkey"),
    ).select(
        "p_type",
        F.round(F.log(F.round(F.col("p_retailprice") * 100) / 100.0) * 10_000)
        .cast("long")
        .alias("xm"),
        F.round(F.log(F.col("q").cast("double")) * 10_000)
        .cast("long")
        .alias("ym"),
    )
    m = base.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xm").cast("long").alias("sx"),
        F.sum("ym").cast("long").alias("sy"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sxx"),
        F.sum(F.col("ym") * F.col("ym")).cast("long").alias("syy"),
        F.sum(F.col("xm") * F.col("ym")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "p_type",
        F.col("n").alias("n_parts"),
        F.round(F.col("sx") / 1e4 / F.col("n"), 4).alias("avg_ln_price"),
        F.round(F.col("sy") / 1e4 / F.col("n"), 4).alias("avg_ln_qty"),
        F.round(num.cast("double") / denx, 4).alias("elasticity"),
        F.round(
            num.cast("double") * num / (denx.cast("double") * deny), 4
        ).alias("r_squared"),
    ).orderBy("p_type")


def seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonal indices per event type —
    the decomposition readout behind seasonal_naive_eval's y(d)=y(d-7)
    assumption: index_w = mean(count | weekday w) / overall mean.  An
    index row near 1.0 everywhere says the weekly forecast baseline
    buys nothing; a 1.4 Monday says alerts must be weekday-aware
    (ewma_anomalies' flat baseline would page every Monday).

    Exactness: weekday from the integer epoch day ((day + 4) % 7 —
    1970-01-01 was a Thursday), BIGINT count sums over the zero-filled
    grid, one division per index rounded to 4 dp.

    Scale: fact table -> bounded day grid -> 7 rows per type."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events")
    # persist: counts feeds the bounds rollup AND the grid join; per_wd
    # feeds the total rollup AND the index join (4 events scans -> 1;
    # guide §5).  Both bounded frames.
    counts = persist_tracked(
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        ((F.col("day") + 4) % 7).cast("int").alias("weekday"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    per_wd = persist_tracked(
        series.groupBy("event_type", "weekday").agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("y").cast("long").alias("s"),
        )
    )
    tot = per_wd.groupBy("event_type").agg(
        F.sum("n_days").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
    )
    return (
        per_wd.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "weekday",
            "n_days",
            F.round(F.col("s") / F.col("n_days").cast("double"), 4).alias(
                "mean_count"
            ),
            F.round(
                (F.col("s") / F.col("n_days").cast("double"))
                / (F.col("st") / F.col("nt").cast("double")),
                4,
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "weekday")
    )


def negbin_fit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of the daily count
    series per event type — the parametric follow-up to
    overdispersion_profile's verdict: r = mean²/(var − mean),
    p = mean/var (NB2 parameterization), shipped WITH its own
    goodness check — the fitted zero probability (r/(r + mean))^r next
    to the OBSERVED zero-day fraction (the comparison a Poisson fit
    fails loudly on clumped feeds).  Types with var <= mean report the
    Poisson limit (r = NULL semantics as r = 0, p0 from e^(−mean)).

    Exactness: BIGINT count moments over the zero-filled grid; mean
    and var rounded to 6 dp before the one pow()/exp() (libm
    precedent), outputs rounded 4 dp.

    Scale: fact table → bounded day grid → one fold per type."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double") / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    m = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
        F.sum((F.col("y") == 0).cast("int")).cast("long").alias("n_zero"),
    )
    mean = F.round(F.col("s") / F.col("n_days").cast("double"), 6)
    var = F.round(
        (
            F.col("ss")
            - F.col("s") * (F.col("s") / F.col("n_days").cast("double"))
        )
        / (F.col("n_days") - 1.0),
        6,
    )
    over = var > mean
    r = F.when(over, F.round(mean * mean / (var - mean), 4)).otherwise(
        F.lit(0.0)
    )
    p = F.when(over, F.round(mean / var, 4)).otherwise(F.lit(1.0))
    p0_fit = F.when(
        over,
        F.round(
            F.pow(
                F.round(mean * mean / (var - mean), 4)
                / (F.round(mean * mean / (var - mean), 4) + mean),
                F.round(mean * mean / (var - mean), 4),
            ),
            4,
        ),
    ).otherwise(F.round(F.exp(-mean), 4))
    return m.select(
        "event_type",
        "n_days",
        mean.alias("mean_daily"),
        var.alias("var_daily"),
        r.alias("nb_r"),
        p.alias("nb_p"),
        p0_fit.alias("p0_fitted"),
        F.round(F.col("n_zero") / F.col("n_days").cast("double"), 4).alias(
            "p0_observed"
        ),
    ).orderBy("event_type")


def theil_inequality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of user spend per event type and
    overall — the decomposable concentration measure (0 = perfectly
    equal, ln(n) = one user owns everything) that complements
    pareto_curve's band view with a single comparable number and,
    unlike Gini, needs NO sorting: T = Σ (xᵢ/X)·ln(xᵢ/μ) is one
    scan-and-fold.

    Exactness: per-user cent totals are BIGINTs; each share·ln term is
    micro-frozen from exact integer ratios before the fold; zero-spend
    users contribute 0 (the x→0 limit).

    Scale: one aggregation to per-(type, user) totals, one fold per
    type; the 'all' row folds the same frame."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    per = persist_tracked(per)

    def theil(df, key_expr):
        g = df.groupBy(key_expr.alias("segment"), "user_id").agg(
            F.sum("x").cast("long").alias("x")
        )
        tot = g.groupBy("segment").agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("x").cast("long").alias("xt"),
        )
        term = F.when(
            F.col("x") > 0,
            F.round(
                F.lit(1_000_000.0)
                * (F.col("x") / F.col("xt").cast("double"))
                * F.log(
                    F.col("x")
                    / (F.col("xt") / F.col("n_users").cast("double"))
                )
            ).cast("long"),
        ).otherwise(F.lit(0))
        return (
            g.join(F.broadcast(tot), "segment")
            .groupBy("segment", "n_users")
            .agg(F.sum(term).cast("long").alias("tm"))
            .select(
                "segment",
                "n_users",
                F.round(F.col("tm") / 1e6, 6).alias("theil_t"),
            )
        )
    by_type = theil(per, F.col("event_type"))
    overall = theil(per, F.lit("__all__"))
    return by_type.unionByName(overall).orderBy("segment")


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment 2-D skyline (Pareto frontier): the orders no other
    same-segment order strictly dominates on (cheaper-or-equal price,
    same-or-later date, at least one strict) — Börzsönyi et al.'s
    SKYLINE OF operator, the "best deals" frontier that pareto_curve's
    band view cannot answer (it ranks one measure; the skyline trades
    off two).

    Plan (the sort-filter skyline, NOT the textbook O(n²) NOT EXISTS):
    with orders sorted by price within a segment, an order is dominated
    iff a strictly-cheaper order has a same-or-later date, OR a
    cheaper-or-equal one has a strictly-later date — both are range
    running-max windows over the cent-exact price, so the whole
    operator is ONE window sort per segment partition (two frames share
    it) instead of a per-segment self-join.  At 100 TB that is one
    shuffle on the segment key; the oracle runs the identical
    window formulation, and the n² NOT EXISTS form is pinned equal in
    tests at sf0.001.

    Exactness: prices as BIGINT cents, dates as integer days — no
    doubles anywhere."""
    base = skyline_base(spark, sf_dir)
    return (
        skyline_filter(base)
        .select("segment", "o_orderkey", "price_cents", "order_date")
        .orderBy("segment", "price_cents", "o_orderkey")
    )


def skyline_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (segment, o_orderkey, price_cents, order_date, day_n) frame
    the skyline runs over — shared by the batch form and the streaming
    local-skyline fold."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
        )
        .cast("long")
        .alias("day_n"),
    )


def skyline_filter(base: DataFrame) -> DataFrame:
    """The two-range-window dominance filter over a skyline base frame
    — the shared kernel of skyline_orders and stream_skyline.  Skylines
    are an idempotent merge algebra (skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))), which is what makes the
    streaming per-batch local-skyline fold exact."""
    from pyspark.sql import Window

    strictly_cheaper = (
        Window.partitionBy("segment")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    cheaper_or_equal = (
        Window.partitionBy("segment")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = base.select(
        "segment",
        "o_orderkey",
        "price_cents",
        "order_date",
        "day_n",
        F.max("day_n").over(strictly_cheaper).alias("best_day_lt"),
        F.max("day_n").over(cheaper_or_equal).alias("best_day_le"),
    )
    return flagged.filter(
        (F.col("best_day_lt").isNull() | (F.col("best_day_lt") < F.col("day_n")))
        & (F.col("best_day_le") == F.col("day_n"))
    ).drop("best_day_lt", "best_day_le")
