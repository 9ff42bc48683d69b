"""Data-quality validation — the checks a training-data pipeline runs
before every training job.

The reference's only guards are a row-count freshness gate and hard exits
on empty frames (airflow/dags/recsys_pipeline.py:175-212,
core-logic/train_module.py:261-264); a 100 TB pipeline needs declared,
queryable expectations: null rates, primary-key uniqueness, referential
integrity, value-range conformance.  Each check is one aggregation or
anti-join — they compose into a single report DataFrame so one action
scans each table once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table


def null_rates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Null fraction per column in one pass (conditional partial aggs)."""
    n = F.count(F.lit(1))
    aggs = [
        F.round(F.sum(F.col(c).isNull().cast("int")) / n, 6).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)


def fk_orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent — left-anti join (one shuffle,
    or broadcast when the parent key set is small)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )


def pk_duplicates(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Primary-key groups with more than one row."""
    return (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-check report over the star schema: referential
    integrity (lineitem→orders→customer, lineitem→part/supplier), PK
    uniqueness, null counts, and value-range conformance.

    Scale: every check is a single aggregate or anti-join; the report
    unions tiny one-row frames, so total cost is one scan per base table
    per check family.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    def one(check: str, count_df: DataFrame) -> DataFrame:
        return count_df.select(
            F.lit(check).alias("check"),
            F.col("violations").cast("long").alias("violations"),
        )

    checks = [
        one(
            "lineitem_orphan_orderkey",
            fk_orphans(lineitem, orders, "l_orderkey", "o_orderkey").agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "lineitem_orphan_partkey",
            fk_orphans(lineitem, part, "l_partkey", "p_partkey").agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "lineitem_orphan_suppkey",
            fk_orphans(lineitem, supplier, "l_suppkey", "s_suppkey").agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "orders_orphan_custkey",
            fk_orphans(orders, customer, "o_custkey", "c_custkey").agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "orders_pk_duplicates",
            pk_duplicates(orders, ["o_orderkey"]).agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "lineitem_pk_duplicates",
            pk_duplicates(lineitem, ["l_orderkey", "l_linenumber"]).agg(
                F.count(F.lit(1)).alias("violations")
            ),
        ),
        one(
            "lineitem_negative_quantity",
            lineitem.agg(
                F.sum((F.col("l_quantity") <= 0).cast("int")).alias("violations")
            ),
        ),
        one(
            "lineitem_discount_out_of_range",
            lineitem.agg(
                F.sum(
                    ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("int")
                ).alias("violations")
            ),
        ),
        one(
            "orders_null_orderdate",
            orders.agg(
                F.sum(F.col("o_orderdate").isNull().cast("int")).alias("violations")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check")
