"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``project_bigdata_recsys_spark`` (see SURVEY.md §2
for the operator inventory each query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_bigdata_recsys_spark.plans.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    course_stats: scan -> join -> conditional agg -> derived ratio ->
    top-K (the reference dashboard's per-course enrollment stats,
    dashboard/app.py:301-320, on the star schema).
    """
    from project_bigdata_recsys_spark.operators.relational import course_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return course_stats(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query.  EVERY declared query
    has one (round 3): engine-seeded iterative/probabilistic operators
    (ALS, GBT, ml-LSH) are declared as invariant profiles — exact data
    anchors the oracle recomputes plus structural booleans it asserts as
    literal TRUE (see plans/queries.py)."""
    return dict(ORACLES)
