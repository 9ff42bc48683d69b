"""Range / banded joins — joining on an interval predicate without a
nested-loop.

A naive range join (``a.value BETWEEN b.lo AND b.hi``) is a cartesian
product with a filter — O(n·m) and a broadcast-nested-loop plan at any
scale.  The scale-correct form when bands are regular (fixed width) is a
*bucket equi-join*: map each value to its band id arithmetically and join
on the id, which Catalyst plans as an ordinary hash join (one shuffle, or
none with a broadcast band table).

For irregular bands small enough to broadcast, a broadcast-nested-loop
join IS the right plan (m tiny ⇒ O(n·m) with m≈10 is a scan) — Spark
picks it automatically when the band side is broadcast; both forms are
exposed here.

The reference has no range joins (SURVEY.md §2.3 "not present"); this is
a first-class capability for feature bucketing and histogram workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def band_id(value_col, width: float, origin: float = 0.0):
    """Arithmetic band assignment — the equi-join key for regular bands."""
    return F.floor((value_col - F.lit(origin)) / F.lit(width)).cast("long")


def quantity_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue histogram over regular 10-unit quantity bands via the
    arithmetic bucket form — zero joins, one aggregation shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.withColumn("band", band_id(F.col("l_quantity"), 10.0))
        .groupBy("band")
        .agg(
            (F.col("band") * 10.0).alias("band_lo"),
            ((F.col("band") + 1) * 10.0).alias("band_hi"),
            F.count(F.lit(1)).alias("n"),
            F.round(sum_fixed(F.round(F.col("l_extendedprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("revenue"),
        )
        .select("band", "band_lo", "band_hi", "n", "revenue")
        .orderBy("band")
    )


def price_tier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval join: orders classified into named price tiers
    by ``o_totalprice BETWEEN lo AND hi`` against a literal tier table.

    Scale: the tier table is tiny ⇒ Spark broadcasts it and the
    "nested loop" is a per-row scan of 4 tiers — linear in orders, no
    shuffle of the fact side at all."""
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [
            ("budget", 0.0, 50_000.0),
            ("mid", 50_000.0, 150_000.0),
            ("premium", 150_000.0, 300_000.0),
            ("luxury", 300_000.0, 1e12),
        ],
        "tier string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / F.count(F.lit(1)) / 100.0, 4
            ).alias("avg_price"),
            F.round(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("total"),
        )
        .orderBy("tier")
    )


def grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-(returnflag,
    linestatus), per-returnflag, and grand total in one pass — Spark
    expands to a single Expand + hash aggregate, not three scans."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / 100.0, 2) AS revenue
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
        """
    )


def interval_overlap_counts(
    spark: SparkSession, sf_dir: str, bucket_days: int = 7
) -> DataFrame:
    """INTERVAL OVERLAP join via bucketization — the range-join shape
    Spark has no native optimization for: a naive ``s <= w_end AND e >=
    w_start`` predicate compiles to BroadcastNestedLoopJoin (every row
    against every window).  Bucketizing turns it into an equi-join:
    each interval explodes into the coarse calendar buckets it touches
    (~interval_len/bucket_days rows), each window lives in exactly ONE
    aligned bucket, so a hash join on bucket + the exact overlap filter
    gives identical results with O(rows × buckets-touched) work.

    Data: deterministic delivery intervals synthesized from lineitem
    ([shipdate, shipdate + (quantity % 14 + 1) days] — the corpus ships
    no end-date column), overlap-counted against aligned weekly windows.
    Plan-test-pinned: BroadcastHashJoin on bucket, never a nested-loop.
    """
    li = load_table(spark, sf_dir, "lineitem")
    origin = F.lit("1995-01-01").cast("date")
    start = F.to_date("l_shipdate")
    span = (F.col("l_quantity").cast("int") % 14 + 1)
    iv = li.select(
        start.alias("s"),
        F.date_add(start, span).alias("e"),
        "l_quantity",
    )
    b0 = F.floor(F.datediff(F.col("s"), origin) / bucket_days)
    b1 = F.floor(F.datediff(F.col("e"), origin) / bucket_days)
    exploded = iv.withColumn("bucket", F.explode(F.sequence(b0, b1)))
    weeks = (
        spark.sql(
            "SELECT explode(sequence(to_date('1995-01-01'), "
            "to_date('2002-01-01'), interval 7 days)) AS w_start"
        )
        .select(
            "w_start",
            F.date_add("w_start", bucket_days - 1).alias("w_end"),
            F.floor(F.datediff("w_start", origin) / bucket_days).alias("bucket"),
        )
    )
    joined = exploded.join(F.broadcast(weeks), "bucket").filter(
        (F.col("s") <= F.col("w_end")) & (F.col("e") >= F.col("w_start"))
    )
    return (
        joined.groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            F.date_format("w_start", "yyyy-MM-dd").alias("week_start"),
            "n_overlap",
            "total_qty",
        )
        .orderBy("week_start")
    )
