"""Explicit set operations — UNION / INTERSECT / EXCEPT.

The reference never writes a set operation (SURVEY.md §2.7: set semantics
appear only as PK-dedup-on-write, distinct id-maps, and Python set
membership); a complete engine exposes them first-class.  All three are
one-shuffle hash aggregations in Spark (Catalyst plans INTERSECT/EXCEPT
as left-semi / left-anti joins over distinct inputs), so they scale the
same way a groupBy on the compared columns does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def _buyer_keys(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return high, open_


def customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with BOTH a high-priority order and an open order —
    INTERSECT (deduplicating), planned as distinct + left-semi join."""
    high, open_ = _buyer_keys(spark, sf_dir)
    return high.intersect(open_).orderBy("o_custkey")


def customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with a high-priority order but NO open order — EXCEPT
    (deduplicating), planned as distinct + left-anti join."""
    high, open_ = _buyer_keys(spark, sf_dir)
    return high.subtract(open_).orderBy("o_custkey")


def priority_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-filtered projections with a source
    tag, then a per-source aggregate — the dashboard's two-event-source
    merge (reference dashboard/app.py:1020-1040) as a set-level op."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", F.lit("urgent").alias("src"), "o_totalprice"
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        "o_custkey", F.lit("big").alias("src"), "o_totalprice"
    )
    return (
        urgent.unionByName(big)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("total"),
        )
        .orderBy("src")
    )
