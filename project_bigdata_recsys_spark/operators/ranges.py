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
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
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
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
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
               round(sum(l_extendedprice), 2) AS revenue
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
        """
    )
