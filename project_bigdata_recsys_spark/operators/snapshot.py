"""Snapshot diff: added / removed / changed rows between two table states.

A daily-refresh warehouse (the reference refreshes Postgres tables
in-place via upsert, etl/load_interactions_from_minio.py:118-150, and its
dashboard has no way to say WHAT changed) needs the delta between
yesterday's and today's snapshot: which PKs appeared, vanished, or
changed payload.  The Spark-native shape is a PK full-outer join
comparing content digests — never a row-by-row driver loop.

Scale (100 TB): both sides shuffle once on the PK (co-partitioned by the
join), digests are computed in the scan projection (whole-stage codegen,
32-byte sha2 — the join carries key + digest, not the payload), and the
classification is a post-join CASE.  With both snapshots bucketed on the
PK (operators/bucketing.py) the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed

#: Null sentinel for digest concat — distinguishes NULL from empty string.
_NULL = "\x01<null>"


def row_digest(df: DataFrame, cols: list[str]) -> F.Column:
    """Content digest over ``cols``: sha256 of the null-sentineled,
    unit-separated concat.  Order-stable and collision-safe for diffing."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


def table_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """Classify every PK as added / removed / changed / unchanged.

    Returns the key columns plus ``change_type``.  One full-outer join on
    the PK; payload travels as a digest."""
    o = old.select(
        *key_cols, row_digest(old, compare_cols).alias("__old_digest")
    )
    n = new.select(
        *key_cols, row_digest(new, compare_cols).alias("__new_digest")
    )
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__old_digest").isNull(), "added")
        .when(F.col("__new_digest").isNull(), "removed")
        .when(F.col("__old_digest") != F.col("__new_digest"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(*key_cols, change.alias("change_type"))


def bump_price_cents(price: F.Column) -> F.Column:
    """1% price bump computed entirely in integer cents with an explicit
    HALF_UP tie-break: ``(cents*101 + 50) div 100``.  No double is ever
    rounded, so Spark and any SQL oracle replaying the same integer
    expression agree bit-for-bit even on exact half-cent products —
    e.g. 295,166.50 × 1.01 = 298,118.165, which Spark's decimal-string
    ``round`` sends UP while DuckDB's binary-double ``round`` sends DOWN
    (the r5/r6 ``cdc_current_view`` divergence; o_orderkey 10234 at
    sf0.01 is the regression pin).

    The DuckDB twin is ``BUMP_PRICE_CENTS_SQL`` (format with the price
    expression).  Intermediate ``cents*101`` stays < 2^53, so the
    double-division-then-truncate is exact; inputs carry ≤2 decimals by
    construction (TPC-H money)."""
    cents = F.round(price * 100).cast("long")
    return ((cents * F.lit(101) + F.lit(50)) / F.lit(100)).cast("long") / 100.0


#: DuckDB twin of :func:`bump_price_cents` — format with the price column.
BUMP_PRICE_CENTS_SQL = (
    "(((CAST(round({price} * 100) AS BIGINT) * 101 + 50) // 100) / 100.0)"
)


def _mutated_orders(orders: DataFrame) -> DataFrame:
    """Deterministic 'next-day' snapshot of orders: drop ~2% of rows,
    bump ~5% of prices by 1%, append ~1% re-keyed new rows.  All draws
    are md5-uniforms on the PK (sources/ingest.py::hash_uniform
    discipline), so the whole diff is oracle-checkable."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    key = F.col("o_orderkey")
    kept = orders.filter(hash_uniform(key, "snap-drop:") >= 0.02)
    bumped = kept.withColumn(
        "o_totalprice",
        F.when(
            hash_uniform(key, "snap-bump:") < 0.05,
            bump_price_cents(F.col("o_totalprice")),
        ).otherwise(F.col("o_totalprice")),
    )
    fresh = (
        orders.filter(hash_uniform(key, "snap-new:") < 0.01)
        .withColumn("o_orderkey", key + F.lit(1_000_000_000))
    )
    return bumped.unionByName(fresh)


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: diff orders against its deterministic next-day
    mutation, rolled up per change_type with key ranges as anchors."""
    orders = load_table(spark, sf_dir, "orders")
    diff = table_diff(
        orders,
        _mutated_orders(orders),
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("change_type")
    )


def cdc_current_view(
    changes: DataFrame, key_cols: list[str], seq_col: str, op_col: str
) -> DataFrame:
    """Merge-on-read CDC apply: collapse an insert/update/delete changelog
    to the current state — latest ``seq_col`` wins per PK, and a winning
    'D' op removes the key.  The lakehouse current-view pattern without a
    table format: the reference runs in-place Postgres UPDATEs
    (scripts/modify_training_data.py:60-101); at warehouse scale the
    changelog is append-only and the view is this one window.

    Shape: one PK-partitioned window (keys are data-cardinality — no fat
    partitions), no joins."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", op_col, seq_col)
    )


def cdc_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: deterministic changelog over orders (seq 0 = base
    insert; md5-chosen updates at seq 1 bumping price 1%; md5-chosen
    deletes at seq 2) collapsed to the current view, profiled per
    status.  All draws are md5-uniforms on the PK, so the oracle
    replays the changelog exactly."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
    )
    updates = (
        orders.filter(hash_uniform(key, "cdc-upd:") < 0.05)
        .select(
            "o_orderkey",
            "o_orderstatus",
            bump_price_cents(F.col("o_totalprice")).alias("o_totalprice"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
        )
    )
    deletes = (
        orders.filter(hash_uniform(key, "cdc-del:") < 0.02)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit(2).alias("seq"),
            F.lit("D").alias("op"),
        )
    )
    changelog = base.unionByName(updates).unionByName(deletes)
    current = cdc_current_view(changelog, ["o_orderkey"], "seq", "op")
    return (
        current.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # Exact-cents sum: per-row scale to integer cents (base money
            # is TPC-H 2-decimal; the update branch bumps via
            # bump_price_cents, so ≤2 decimals holds on EVERY path),
            # sum as BIGINT —
            # partition-order-independent, unlike sum(double) whose
            # 2-decimal rounding can flip vs a serial oracle summation.
            F.round(
                sum_fixed(F.round(F.col("o_totalprice") * 100).cast("long"), sf_dir=sf_dir)
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def scd2_history(
    changes: DataFrame, key_cols: list[str], seq_col: str, op_col: str
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: turn the same changelog
    cdc_current_view collapses into full VERSION HISTORY — every non-
    delete change becomes a row with [valid_from, valid_to) sequence
    bounds; the latest surviving version is flagged current.  A delete
    closes the prior version's interval (the tombstone itself stores no
    attributes, so it emits no history row).

    One PK-partitioned lead() window — same shuffle as the current-view
    collapse, so keeping full history costs no extra exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.asc(seq_col))
    versioned = changes.withColumn("__next_seq", F.lead(seq_col).over(w))
    return (
        versioned.filter(F.col(op_col) != "D")
        .select(
            *key_cols,
            *[c for c in changes.columns if c not in key_cols + [seq_col, op_col]],
            F.col(seq_col).alias("valid_from"),
            F.col("__next_seq").alias("valid_to"),
            F.col("__next_seq").isNull().alias("is_current"),
        )
    )


def scd2_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: SCD2 history over the deterministic orders changelog
    (same md5 draws as cdc_current_view), profiled per status: total
    versions, current rows, closed rows.  Together with cdc_current_view
    this pins that history ⊇ current (the current rows of the history
    must reconcile with the collapsed view)."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(0).alias("seq"), F.lit("I").alias("op"),
    )
    updates = orders.filter(hash_uniform(key, "cdc-upd:") < 0.05).select(
        "o_orderkey", "o_orderstatus",
        bump_price_cents(F.col("o_totalprice")).alias("o_totalprice"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    deletes = orders.filter(hash_uniform(key, "cdc-del:") < 0.02).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(2).alias("seq"), F.lit("D").alias("op"),
    )
    changelog = base.unionByName(updates).unionByName(deletes)
    hist = scd2_history(changelog, ["o_orderkey"], "seq", "op")
    return (
        hist.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_versions"),
            F.sum(F.when(F.col("is_current"), 1).otherwise(0))
            .cast("long")
            .alias("n_current"),
            F.sum(F.when(~F.col("is_current"), 1).otherwise(0))
            .cast("long")
            .alias("n_closed"),
        )
        .orderBy("o_orderstatus")
    )


def merge_aggregate_state(
    prior: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a DELTA of partial aggregates into a persisted aggregate
    state: union + one re-aggregation summing every non-key column —
    valid for any algebraic aggregate carried as mergeable partials
    (counts, fixed-point sums; averages ride as sum+count pairs).  The
    materialized-view maintenance kernel: history is NEVER rescanned,
    each refresh costs O(delta) + one shuffle of |keys| state rows
    (an incremental_dedup / update_components sibling for aggregations;
    the sketch twin for distincts is hll_daily_rollup's union layer)."""
    val_cols = [c for c in prior.columns if c not in keys]
    return (
        prior.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in val_cols])
    )


def incremental_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query for :func:`merge_aggregate_state`: the per-(event_type,
    day) count/value state is built from events BEFORE 2024-01-16 (the
    settled history), the remaining days aggregate as the daily delta,
    the delta folds into the state, and the folded state rolls up per
    event_type.  Folded ≡ full recompute is the merge contract — which
    is exactly what the DuckDB oracle computes over raw events.  Value
    mass is carried as micro-scaled BIGINTs (the fixed-point discipline)
    so partials merge exactly."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 1000000).cast("long").alias("micros"),
    )
    part = lambda df: df.groupBy("event_type", "day").agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("n"),
        sum_fixed("micros", sf_dir=sf_dir).alias("micros"),
    )
    prior = part(ev.filter(F.col("day") < "2024-01-16"))
    delta = part(ev.filter(F.col("day") >= "2024-01-16"))
    state = merge_aggregate_state(prior, delta, ["event_type", "day"])
    return (
        state.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("n_events"),
            F.round(sum_fixed("micros", sf_dir=sf_dir) / 1000000.0, 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


def partition_digests(
    df: DataFrame, part_col, content_cols: list[str]
) -> DataFrame:
    """Order-independent per-partition content digest: bit_xor over the
    per-row sha256-derived 64-bit hashes.  XOR is commutative and
    associative, so the digest is identical under any row order or
    partitioning — comparable across engines and runs without sorting
    anything."""
    # 15 hex chars = 60 bits: stays inside signed int64 in every engine
    # (16 chars can exceed 2^63 and null out on the cast)
    row_hash = F.conv(
        F.substring(row_digest(df, content_cols), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(part_col.alias("part"), row_hash.alias("h"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("h").alias("digest"),
        )
    )


def backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level backfill planning: compare per-day content
    digests of a day-partitioned output between the current source and
    its deterministic next-day mutation, and classify each day as
    unchanged / changed / added / removed — the table an orchestrator
    reads to recompute ONLY the partitions whose inputs actually moved,
    instead of a blanket date-range rerun.  snapshot_diff answers "which
    ROWS changed"; this answers the cheaper planning question "which
    PARTITIONS must rebuild" from two digest scans and a tiny join (one
    row per day on each side — driver-safe at any scale)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.date_format("o_orderdate", "yyyy-MM")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    old_d = partition_digests(orders, day, cols)
    new_d = partition_digests(_mutated_orders(orders), day, cols)
    o = old_d.select(
        "part",
        F.col("n_rows").alias("n_rows_old"),
        F.col("digest").alias("digest_old"),
    )
    n = new_d.select(
        "part",
        F.col("n_rows").alias("n_rows_new"),
        F.col("digest").alias("digest_new"),
    )
    status = (
        F.when(F.col("digest_old").isNull(), "added")
        .when(F.col("digest_new").isNull(), "removed")
        # row count guards XOR cancellation: an even multiset change
        # (two identical rows added, a dup count changing by 2) XORs to
        # the same digest, but cannot keep n_rows equal too.
        .when(
            (F.col("digest_old") != F.col("digest_new"))
            | (F.col("n_rows_old") != F.col("n_rows_new")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        o.join(n, "part", "full_outer")
        .select(
            "part",
            F.coalesce("n_rows_old", F.lit(0)).alias("n_rows_old"),
            F.coalesce("n_rows_new", F.lit(0)).alias("n_rows_new"),
            status.alias("status"),
        )
        .orderBy("part")
    )
