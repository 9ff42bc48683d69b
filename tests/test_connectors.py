"""Connector surface tests — Kafka payload symmetry and JDBC I/O.

No broker exists in this sandbox, so the Kafka path is exercised up to
the last broker-free point (payload serialization) plus an env-gated
live test.  JDBC, however, runs LIVE here: pyspark ships the Derby
embedded driver, so the wrappers round-trip against a real database
in-process (plus the env-gated Postgres twin for deployments)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.sources.jdbc import jdbc_read_options
from project_bigdata_recsys_spark.streaming.jobs import (
    KAFKA_EVENT_SCHEMA,
    kafka_event_payload,
)


def test_kafka_payload_round_trips(spark):
    """produce(serialize) → consume(parse) must be lossless: the payload
    is the exact inverse of kafka_events_stream's from_json."""
    rows = [
        ("alice", "c101", "play_video", "2024-03-01 10:00:00.5"),
        ("bob", "c202", "problem_check", "2024-03-01 10:05:30.25"),
    ]
    events = spark.createDataFrame(
        rows, "username string, course_id string, action string, ts_s string"
    ).select("username", "course_id", "action", F.col("ts_s").cast("timestamp").alias("ts"))

    wire = kafka_event_payload(events)
    assert wire.columns == ["key", "value"]  # the Kafka sink contract
    assert {r.key for r in wire.collect()} == {"alice", "bob"}

    # consumer-side parse (same expressions as kafka_events_stream)
    parsed = wire.select(
        F.from_json(F.col("value"), KAFKA_EVENT_SCHEMA).alias("e")
    ).select(
        F.col("e.username").alias("username"),
        F.col("e.course_id").alias("course_id"),
        F.col("e.action").alias("action"),
        F.timestamp_seconds(F.col("e.timestamp")).alias("ts"),
    )
    assert sorted(parsed.collect()) == sorted(events.collect())


def test_kafka_payload_malformed_value_nulls(spark):
    """Consumer tolerance (S3): malformed JSON parses to NULL fields, not
    an error — the drop-bad-rows behavior of the reference consumer."""
    bad = spark.createDataFrame([("k", "{not json"),], "key string, value string")
    parsed = bad.select(F.from_json("value", KAFKA_EVENT_SCHEMA).alias("e"))
    e = parsed.head().e
    # PERMISSIVE parse: an all-NULL struct (or NULL), never an exception
    assert e is None or all(v is None for v in e.asDict().values())


def test_jdbc_read_options_parallel_scan():
    opts = jdbc_read_options(
        "jdbc:postgresql://db:5432/app",
        "public.interactions",
        partition_column="id",
        num_partitions=32,
        lower_bound=1,
        upper_bound=1_000_000,
    )
    # the reference's single-partition whole-table scan, fixed:
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "1000000"
    assert int(opts["fetchsize"]) > 0


def test_jdbc_read_options_unpartitioned():
    opts = jdbc_read_options("jdbc:postgresql://db:5432/app", "tiny_dim")
    assert "partitionColumn" not in opts and "numPartitions" not in opts


def test_jdbc_live_round_trip_embedded_derby(spark, tmp_path):
    """S5/S6 LIVE in-sandbox: pyspark ships the Derby embedded driver
    (the Hive-metastore dependency), so the wrappers round-trip against
    a real JDBC database with no external service — bounded-fan-in
    batched write (overwrite then append), quoted bounds probe, and a
    genuinely range-split parallel re-scan."""
    from project_bigdata_recsys_spark.sources.jdbc import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    write_jdbc(
        df, url, "roundtrip", mode="overwrite", max_connections=4,
        properties=props,
    )
    back = read_jdbc(
        spark, url, "roundtrip", partition_column="id", num_partitions=4,
        properties=props,
    )
    assert back.count() == 1000
    assert back.rdd.getNumPartitions() == 4  # the parallel range scan
    assert back.agg(F.sum("bucket")).head()[0] == df.agg(F.sum("bucket")).head()[0]
    # append mode: the upsert building block must not clobber the table
    write_jdbc(
        df.limit(10), url, "roundtrip", mode="append", max_connections=2,
        properties=props,
    )
    again = read_jdbc(
        spark, url, "roundtrip", partition_column="id", num_partitions=2,
        properties=props,
    )
    assert again.count() == 1010


# --------------------------------------------------------------------------
# Live integration tests — env-gated (skip cleanly where no broker/database
# exists; see docs/DEPLOY_CONNECTORS.md for the compose file that provides
# both and the spark-submit --packages line the Kafka source needs).
# --------------------------------------------------------------------------
import os
import uuid


@pytest.mark.skipif(
    "KAFKA_BOOTSTRAP" not in os.environ,
    reason="live Kafka round-trip: set KAFKA_BOOTSTRAP=host:9092 "
    "(and launch with the spark-sql-kafka package on the classpath)",
)
def test_kafka_live_round_trip(spark):
    """S10/S11 end-to-end against a real broker: serialize with the
    producer payload, publish with the batch Kafka sink, read back from
    earliest, parse with the consumer expressions — the live twin of
    test_kafka_payload_round_trips."""
    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"
    rows = [
        ("alice", "c101", "play_video", "2024-03-01 10:00:00"),
        ("bob", "c202", "problem_check", "2024-03-01 10:05:30"),
    ]
    events = spark.createDataFrame(
        rows, "username string, course_id string, action string, ts_s string"
    ).select(
        "username", "course_id", "action", F.col("ts_s").cast("timestamp").alias("ts")
    )
    from project_bigdata_recsys_spark.streaming.jobs import kafka_event_payload

    (
        kafka_event_payload(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), KAFKA_EVENT_SCHEMA).alias("e")
    ).select("e.username", "e.course_id", "e.action")
    got = {(r.username, r.course_id, r.action) for r in parsed.collect()}
    assert got == {(u, c, a) for u, c, a, _ in rows}


@pytest.mark.skipif(
    "JDBC_URL" not in os.environ,
    reason="live JDBC round-trip: set JDBC_URL=jdbc:postgresql://host/db"
    "?user=u&password=p (and launch with the driver jar on the classpath)",
)
def test_jdbc_live_round_trip(spark):
    """S5/S6 end-to-end against a real database: bounded-fan-in write,
    then a parallel bound-probed range scan back — asserts both the data
    and the scan parallelism (the reference read single-partition)."""
    from project_bigdata_recsys_spark.sources.jdbc import read_jdbc, write_jdbc

    url = os.environ["JDBC_URL"]
    table = f"spark_graft_it_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    write_jdbc(df, url, table, mode="overwrite", max_connections=4)
    back = read_jdbc(spark, url, table, partition_column="id", num_partitions=4)
    assert back.count() == 1000
    assert back.rdd.getNumPartitions() == 4  # the parallel range scan
    assert back.agg(F.sum("bucket")).head()[0] == df.agg(F.sum("bucket")).head()[0]
