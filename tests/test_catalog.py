"""Catalog must be correct in ANY SparkSession, not just get_spark()'s.

Round-1 driver gate regression: the gate builds its own vanilla
SparkSession (no ``spark.sql.legacy.parquet.nanosAsLong``), and every
events.parquet read died with PARQUET_TYPE_ILLEGAL (CORRECTNESS_r01).
``load_table`` now sets the required runtime confs itself.
"""

from __future__ import annotations

from pyspark.sql.types import TimestampType

from project_bigdata_recsys_spark.catalog import load_table
from tests.conftest import SF_SMALL


def _driver_like_session(spark):
    """A session with fresh SQLConf and the correctness confs stripped,
    simulating the driver gate's externally built SparkSession."""
    ns = spark.newSession()
    ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    return ns


def test_events_readable_in_foreign_session(spark):
    ns = _driver_like_session(spark)
    events = load_table(ns, SF_SMALL, "events")
    assert isinstance(events.schema["ts"].dataType, TimestampType)
    assert events.count() > 0
    # load_table restored the oracle-parity confs on the foreign session
    assert ns.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_query_matches_between_sessions(spark):
    """Same events aggregate through both sessions — identical results."""
    from project_bigdata_recsys_spark.operators.relational import events_per_day

    ours = events_per_day(spark, SF_SMALL).collect()
    theirs = events_per_day(_driver_like_session(spark), SF_SMALL).collect()
    assert ours == theirs
