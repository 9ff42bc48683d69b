"""Batch ingest layer (SURVEY.md §2.1 S2–S4, S18–S19).

The reference ingests CSV row-by-row through one Python process with
per-field try/except coercion and 5,000-row INSERT batches
(etl/load_users_from_minio.py, etl/load_interactions_from_minio.py).  The
engine-native form is a schema'd PERMISSIVE CSV scan — coercion failures
become NULLs engine-side, bad-PK rows are dropped with one filter, and the
"ON CONFLICT DO NOTHING" upsert becomes dropDuplicates + left-anti append.

Scale: the CSV scan parallelizes per file-split; the upsert's anti-join
shuffles on the PK (broadcast when the incoming slice is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed

#: users table schema — reference sql/init.sql:1-7 + README.md:386-392.
USERS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("gender", StringType()),
        StructField("education", StringType()),
        StructField("birth_year", IntegerType()),
    ]
)

#: 22 behavioral counters + 2 session aggregates — reference sql/init.sql:14-37.
ACTION_COLS = [
    "action_problem_get",
    "action_problem_check",
    "action_problem_save",
    "action_reset_problem",
    "action_problem_check_correct",
    "action_problem_check_incorrect",
    "action_create_thread",
    "action_create_comment",
    "action_delete_thread",
    "action_delete_comment",
    "action_click_info",
    "action_click_courseware",
    "action_click_about",
    "action_click_forum",
    "action_click_progress",
    "action_pause_video",
    "action_play_video",
    "action_seek_video",
    "action_stop_video",
    "action_load_video",
    "action_close_courseware",
    "action_close_forum",
]
SESSION_COLS = ["unique_session_count", "avg_nActions_per_session"]

INTERACTIONS_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("course_id", StringType())]
    + [StructField("truth", IntegerType())]
    + [StructField(c, DoubleType()) for c in ACTION_COLS + SESSION_COLS]
    + [StructField("event_ts", LongType())]
)


def read_csv_tolerant(
    spark: SparkSession, path: str, schema: StructType, pk_cols: list[str]
) -> DataFrame:
    """Header CSV scan with per-field NULL coercion and bad-PK row drop —
    reference parse_birth_year / parse_float / parse_int + key-error drop
    (etl/load_users_from_minio.py:43-49,79-84;
    etl/load_interactions_from_minio.py:57-72,100-113).

    PERMISSIVE mode makes unparseable fields NULL (exactly the reference's
    tolerant parsers); dropping rows with NULL PKs reproduces the
    bad-key-drops-row rule.
    """
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )
    cond = None
    for c in pk_cols:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond)


def upsert_append(
    existing: DataFrame | None, incoming: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """First-writer-wins upsert (S4/J5): dedup incoming on PK, then keep
    only PKs absent from existing — ``INSERT ... ON CONFLICT DO NOTHING``
    (etl/load_users_from_minio.py:93-97) without a transactional store.
    Single-writer semantics; multi-writer needs a table format with MERGE
    (SURVEY.md §7.4.2)."""
    deduped = incoming.dropDuplicates(pk_cols)
    if existing is None:
        return deduped
    new_rows = deduped.join(existing.select(*pk_cols), pk_cols, "left_anti")
    return existing.unionByName(new_rows)


def csv_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable S1–S3 + S8 exercise: snapshot ``orders`` to a CSV
    sink, inject malformed rows (unparseable numerics, NULL PKs — the
    reference's tolerant-parser cases), re-scan with
    :func:`read_csv_tolerant`, and aggregate.

    Every injected row carries an empty PK, so the tolerant scan must
    coerce its bad fields to NULL *and* drop it; the aggregate then equals
    the same aggregate over the original parquet — which is exactly what
    the DuckDB oracle computes.  Any coercion or PK-drop regression makes
    the counts diverge and the gate row go red.
    """
    import os
    from project_bigdata_recsys_spark.caching import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    snap = os.path.join(scratch_dir(prefix="spark_csv_snapshot_"), "orders_csv")
    # S8: CSV snapshot sink (header'd, engine-parallel writer)
    orders.write.mode("overwrite").option("header", True).csv(snap)

    # inject a malformed shard: header + rows with empty PK / garbage fields
    header = ",".join(orders.columns)
    n_cols = len(orders.columns)
    bad_rows = [
        ",".join([""] + ["not_a_number"] * (n_cols - 1)),
        ",".join([""] + ["?"] * (n_cols - 1)),
        "," * (n_cols - 1),
    ]
    with open(os.path.join(snap, "part-99999-malformed.csv"), "w") as fh:
        fh.write(header + "\n" + "\n".join(bad_rows) + "\n")

    clean = read_csv_tolerant(spark, snap, orders.schema, pk_cols=["o_orderkey"])
    return (
        clean.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir) / 100.0, 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def hash_uniform(col, salt: str):
    """Deterministic uniform [0, 1) from md5(salt || value) — the seeded
    draw of the synthetic/mutation sources.  Unlike ``F.rand(seed)``
    (engine-private RNG stream), this depends only on DATA, so the same
    draw reproduces bit-for-bit in any engine: DuckDB's
    ``('0x' || substr(md5(...), 1, 8))::BIGINT / 4294967296.0`` is the
    identical expression, which makes the generator oracle-checkable."""
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8)
    return F.conv(hex8, 16, 10).cast("double") / F.lit(4294967296.0)


def synthetic_interactions(
    spark: SparkSession, n: int = 5000, seed: int = 42
) -> DataFrame:
    """Seeded synthetic interaction generator — reference
    scripts/add_synthetic_data.py:29-140: engagement tier drives action
    ranges and pass probability (85/60/30%).  spark.range + hash-based
    uniforms keep it fully distributed AND engine-independent (the
    reference's version is an unseeded single-process loop); ``seed``
    salts every draw."""
    base = spark.range(n).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")
    u = lambda tag: hash_uniform(rid, f"{seed}:{tag}:")  # noqa: E731
    tier = (
        F.when(u("tier") < 0.3, "high").when(u("tier") < 0.7, "mid").otherwise("low")
    )
    df = base.withColumn("tier", tier)
    plays = (
        F.when(F.col("tier") == "high", 50 + u("plays") * 150)
        .when(F.col("tier") == "mid", 10 + u("plays") * 40)
        .otherwise(u("plays") * 10)
    )
    checks = (
        F.when(F.col("tier") == "high", 20 + u("checks") * 80)
        .when(F.col("tier") == "mid", 5 + u("checks") * 15)
        .otherwise(u("checks") * 5)
    )
    pass_prob = (
        F.when(F.col("tier") == "high", 0.85)
        .when(F.col("tier") == "mid", 0.60)
        .otherwise(0.30)
    )
    return df.select(
        (F.col("row_id") % 1000).alias("user_id"),
        F.concat(F.lit("course-"), (F.col("row_id") % 200).cast("string")).alias(
            "course_id"
        ),
        F.when(u("truth") < pass_prob, 0).otherwise(1).alias("truth"),
        F.round(plays, 2).alias("action_play_video"),
        F.round(checks, 2).alias("action_problem_check"),
        (F.lit(1700000000) + F.col("row_id")).alias("event_ts"),
    )


def mutate_with_noise(
    df: DataFrame,
    numeric_cols: list[str],
    label_col: str = "truth",
    sample_fraction: float = 0.10,
    flip_fraction: float = 0.05,
    seed: int = 42,
    key_col: str = "event_ts",
) -> DataFrame:
    """Drift simulator — reference scripts/modify_training_data.py:28-133:
    multiply a random sample's features by noise, flip 5% of labels,
    clamp at 0.  In-place UPDATE becomes read → withColumn → overwrite.
    Draws are hash-uniforms keyed on ``key_col`` (engine-independent, so
    the whole mutation is oracle-checkable)."""
    key = F.col(key_col)
    u = lambda tag: hash_uniform(key, f"{seed}:{tag}:")  # noqa: E731
    in_sample = u("sample") < sample_fraction
    out = df
    for i, c in enumerate(numeric_cols):
        noisy = F.greatest(
            F.lit(0.0), F.round(F.col(c) * (0.8 + u(f"noise{i}") * 0.4), 2)
        )  # F9 clamp
        out = out.withColumn(c, F.when(in_sample, noisy).otherwise(F.col(c)))
    flip = u("flip") < flip_fraction
    return out.withColumn(
        label_col,
        F.when(in_sample & flip, 1 - F.col(label_col)).otherwise(F.col(label_col)),
    )


def read_jsonl_tolerant(
    spark: SparkSession, path: str, schema, pk_cols: list[str]
) -> DataFrame:
    """Tolerant JSONL scan — the corpus-ingest format training pipelines
    actually receive (one JSON doc per line, from crawlers and vendor
    dumps, with a reliable fraction of truncated/corrupt lines).  Same
    contract as read_csv_tolerant: PERMISSIVE parse (bad field → NULL,
    corrupt line → all-NULL row), then rows with NULL PKs drop.  The
    explicit schema keeps ingestion one pass — inferSchema on JSON is a
    full extra scan of 100 TB."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .schema(schema)
        .json(path)
    )
    cond = None
    for c in pk_cols:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond)


def jsonl_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable JSONL ingest exercise: snapshot ``documents`` to
    a JSONL sink, inject corrupt lines (truncated JSON, wrong types,
    missing PK), re-scan tolerantly, and profile per lang.  The injected
    rows must all be coerced/dropped, so the per-lang counts equal the
    oracle's counts over the original parquet."""
    import os
    from project_bigdata_recsys_spark.caching import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    snap = os.path.join(scratch_dir(prefix="spark_jsonl_"), "docs_jsonl")
    docs.write.mode("overwrite").json(snap)

    bad_lines = [
        '{"doc_id": 1, "text": "truncated...',          # corrupt JSON
        '{"doc_id": null, "text": "no pk", "lang": "en"}',  # NULL PK
        '{"text": "missing pk entirely", "lang": "en"}',    # absent PK
        '{"doc_id": "NaN-ish", "text": "bad type", "lang": "en"}',  # wrong type
    ]
    with open(os.path.join(snap, "part-99999-malformed.json"), "w") as fh:
        fh.write("\n".join(bad_lines) + "\n")

    clean = read_jsonl_tolerant(spark, snap, docs.schema, pk_cols=["doc_id"])
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


def orc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC snapshot sink + re-scan, gate-checkable (the columnar sibling
    of :func:`csv_roundtrip_query`): orders → ORC (Spark-native, no
    extra jars) → full re-scan → the same per-status aggregate, which
    must equal the oracle's aggregate over the original parquet.  ORC
    is schema-preserving, so unlike the CSV path there is no tolerant
    coercion to exercise — what this pins is the write/read fidelity of
    the second columnar format a lake migration actually encounters
    (types, decimals-as-doubles, TIMESTAMP_NTZ order dates).

    Scale: one snapshot write + one scan; the re-scan aggregate pushes
    the usual partial-agg path, and ORC predicate pushdown/column
    pruning apply exactly as for parquet."""
    import os

    from project_bigdata_recsys_spark.caching import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    snap = os.path.join(scratch_dir(prefix="spark_orc_snapshot_"), "orders_orc")
    orders.write.mode("overwrite").orc(snap)
    back = spark.read.orc(snap)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                sum_fixed(
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                    sf_dir=sf_dir,
                )
                / 100.0,
                2,
            ).alias("total"),
        )
        .orderBy("o_orderstatus")
    )
