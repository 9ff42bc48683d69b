"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY.md §2.3 notes the reference has none either; this is a first-class
capability for event/feature-store workloads, composed from built-ins per
the task's custom-operator ladder: composition > pandas UDF > RDD).

Implementation: union both sides tagged, then one window pass per key
ordered by (ts, side) carrying the right side's payload forward with
``last_value(..., ignorenulls)``.  Exactly one shuffle (the window
partition), no range-explosion, no per-row Python.

Scale: equivalent to a single sort-merge pass per key — the same plan a
native ASOF JOIN executes; skewed keys behave like any window skew (salt
or AQE).  Memory is O(1) per row beyond the sort (running frame is
unbounded-preceding..current with a scalar carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    inclusive: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    key and right_ts <= left_ts (or < when inclusive=False).

    Returns all left columns plus ``asof_<col>`` for each right payload
    column (NULL when no earlier right row exists — LEFT ASOF semantics).

    ``right_tiebreak``: column that deterministically orders right rows
    sharing (key, right_ts); the row with the greatest tiebreak wins.
    Without it the carried payload among exact-timestamp ties depends on
    physical row order (partitioning/run-dependent).
    """
    lcols = left.columns
    # side tag orders right rows before left rows at equal timestamps when
    # inclusive (so an exactly-simultaneous right row is visible to left)
    side_left = 1 if inclusive else 0
    side_right = 0 if inclusive else 1

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(side_left).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(side_right).alias("__side"),
        (
            F.col(right_tiebreak).cast("long")
            if right_tiebreak
            else F.lit(0).cast("long")
        ).alias("__tb"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_payload).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # __tb ascending => among right rows tied on (ts, side), F.last picks
    # the greatest tiebreak; left rows carry __tb NULL (sorts first, which
    # is irrelevant — left rows never feed the carried payload)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__l").isNotNull())
    out = carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out


def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent click at-or-before
    it — the canonical attribution query an as-of join answers."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "click_value"],
        right_tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round(F.col("asof_click_value"), 4).alias("click_value"),
    ).orderBy("event_id")


def pit_join(
    facts: DataFrame,
    dim_versions: DataFrame,
    key: str,
    event_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """POINT-IN-TIME join against an SCD2-versioned dimension: each fact
    row is matched to the single dimension version whose
    ``[valid_from, valid_to)`` interval contains the fact's event time —
    the feature-store correctness join (training features must reflect
    the attribute values AS OF the event, or the model trains on leaked
    future state).

    Plan shape: an EQUI join on the key with the validity range as a
    join-condition post-filter — Spark plans the sort-merge/broadcast
    hash join on ``key`` and evaluates the interval test inside the
    join, so there is no range explosion and no nested loop; versions
    per key are few (SCD2 change counts), so per-key fan-out is bounded
    by change frequency, not corpus size."""
    dv = dim_versions.withColumnsRenamed(
        {c: f"__dim_{c}" for c in dim_versions.columns if c != key}
    )
    return facts.join(
        dv,
        (facts[key] == dv[key])
        & (facts[event_time] >= dv[f"__dim_{valid_from}"])
        & (facts[event_time] < dv[f"__dim_{valid_to}"]),
        "left",
    ).drop(dv[key])


def pit_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query for :func:`pit_join`: a deterministic SCD2 customer
    dimension (md5-chosen 30% of customers switch market segment to
    '<seg>_V2' on 1996-01-01; everyone else keeps one open-ended
    version) joined point-in-time to orders on o_orderdate, rolled up
    per EFFECTIVE segment.  The oracle replays the same draw arithmetic,
    so every order must land on exactly the version valid at its date —
    a fact matched to the wrong version shifts a rollup row and breaks
    the hash."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    changed = hash_uniform(F.col("c_custkey"), "scd:") < 0.3
    cutover = F.lit("1996-01-01")
    lo, hi = F.lit("1990-01-01"), F.lit("9999-12-31")
    v_open = customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        lo.alias("valid_from"),
        F.when(changed, cutover).otherwise(hi).alias("valid_to"),
    )
    v_new = customer.filter(changed).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("segment"),
        cutover.alias("valid_from"),
        hi.alias("valid_to"),
    )
    dim = v_open.unionByName(v_new)
    facts = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).withColumnRenamed("o_custkey", "c_custkey")
    joined = pit_join(facts, dim, "c_custkey", "order_day")
    return (
        joined.groupBy(F.col("__dim_segment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.round(sum_fixed("cents", sf_dir=sf_dir) / 100.0, 2).alias("total_spend"),
        )
        .orderBy("segment")
    )
