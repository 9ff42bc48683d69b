"""Scale-infrastructure operators: salted skew join, bucketed co-located
join.  Assertions cover both result equivalence and the plan property
each operator exists to deliver."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from project_bigdata_recsys_spark.operators.skew import salted_join
from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = lineitem.join(orders, "l_orderkey").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(lineitem, orders, "l_orderkey", salt_buckets=4).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_left_semantics(spark):
    # left join keeps unmatched big-side rows exactly once
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "z")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, small, "k", salt_buckets=3, how="left")
    rows = {(r.k, r.v, r.w) for r in out.collect()}
    assert rows == {(1, "a", "x"), (1, "b", "x"), (2, "c", "y"), (99, "z", None)}


def test_bucketed_join_has_no_exchange(spark):
    with tempfile.TemporaryDirectory(prefix="spark_buckets_") as tmp:
        lineitem = load_table(spark, SF_SMALL, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders = load_table(spark, SF_SMALL, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, location=tmp)
        write_bucketed(orders, "b_orders", "l_orderkey", 8, location=tmp)
        # at sf0.001 the planner would broadcast (and rightly skip bucketed
        # scans); disable broadcast to observe the co-located-join property
        # that matters when BOTH sides are too big to broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and the result matches the plain (shuffled) join
            assert joined.count() == lineitem.join(orders, "l_orderkey").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partition_pruning(spark, tmp_path):
    """Writing partitioned by a date bucket and filtering on it must prune
    at the file-index level (PartitionFilters), not scan-and-filter —
    the mechanism that turns a 100 TB table scan into a single-day read."""
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMALL, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    events.write.partitionBy("day").parquet(out)
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [" in plan
    # pruning must reduce files read: count partitions touched
    n_days = events.select("day").distinct().count()
    assert one_day.count() == events.filter(F.col("day") == "2024-01-05").count()
    scanned = one_day.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(out).select(F.input_file_name()).distinct().count()
    assert scanned < all_files / max(1, n_days // 2)


def test_approx_profile_accuracy(spark):
    """Sketches must track exact values: the query itself carries the
    sketch-vs-exact tolerance checks as booleans (so the driver's oracle
    gate verifies them too); here assert every check holds and the exact
    companions agree with an independent aggregation."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.operators.relational import approx_profile

    rows = {r.o_orderpriority: r for r in approx_profile(spark, SF_SMALL).collect()}
    assert rows, "empty profile"
    for r in rows.values():
        assert r.approx_customers_ok and r.approx_p50_ok and r.approx_p95_ok

    orders = load_table(spark, SF_SMALL, "orders")
    exact = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("nd"),
        )
        .collect()
    }
    for prio, e in exact.items():
        assert rows[prio].n_orders == e.n
        assert rows[prio].n_customers == e.nd


def test_schema_evolution_merge(spark, tmp_path):
    """Appends with a widened schema must coexist: mergeSchema reads the
    union of columns, with nulls backfilled for pre-evolution files —
    how a long-lived 100 TB table absorbs new feature columns without
    rewrite."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    v1 = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    v1.write.parquet(out)
    v2 = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("priority_code", F.lit("NEW"))
        .limit(100)
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "priority_code"}
    assert merged.filter(F.col("priority_code").isNull()).count() == v1.count()
    assert merged.filter(F.col("priority_code") == "NEW").count() == 100


def test_join_strategy_hints(spark):
    """The engine exposes physical join strategy control: merge and
    shuffle_hash hints must be honored over the planner's default."""
    from pyspark.sql import functions as F

    lineitem = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    merge_plan = (
        lineitem.join(orders.hint("merge"), "l_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in merge_plan
    hash_plan = (
        lineitem.join(orders.hint("shuffle_hash"), "l_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffledHashJoin" in hash_plan


def test_write_sorted_partitioned_layout(spark, tmp_path):
    """Layout writer: every output file belongs to one partition value
    and is internally sorted on the sort key (what makes parquet
    row-group min/max stats selective)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.operators.bucketing import (
        write_sorted_partitioned,
    )

    events = load_table(spark, SF_SMALL, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "layout")
    write_sorted_partitioned(events, out, "day", ["user_id", "ts"])

    files = glob.glob(out + "/day=*/**/*.parquet", recursive=True)
    assert files, "no files written"
    for f in files[:10]:
        t = pq.read_table(f, columns=["user_id"])
        vals = t.column("user_id").to_pylist()
        assert vals == sorted(vals), f"file {f} not sorted on user_id"
    # round trip: nothing lost
    assert spark.read.parquet(out).count() == events.count()


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling: with a pathologically skewed key and
    thresholds lowered to observe it at test scale, the post-execution
    plan must mark the sort-merge join as skew-handled."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k rows all sharing key 0 vs a uniform right side
        big = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        ).union(
            spark.range(5_000).select(
                (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("payload")
            )
        )
        right = spark.range(101).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        joined = big.join(right, "k")
        # collect() executes THIS DataFrame's queryExecution (count()
        # would run a different aggregated plan and leave this one
        # unfinalized, isFinalPlan=false)
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_quality_check_primitives(spark):
    """The composable check primitives (null rates, FK orphans, PK dups)
    work standalone — they are the building blocks users compose into
    their own reports beyond the canned data_quality_report."""
    from project_bigdata_recsys_spark.operators.quality import (
        fk_orphans,
        null_rates,
        pk_duplicates,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")

    rates = null_rates(child, ["fk"]).head()
    assert abs(rates.fk - 0.25) < 1e-9

    orphans = fk_orphans(child, parent, "fk", "pk").collect()
    # 99 has no parent; NULL fk never matches either — both are orphans
    assert sorted(r.id for r in orphans) == [3, 4]

    dups = pk_duplicates(
        spark.createDataFrame([(1,), (1,), (2,)], "k int"), ["k"]
    ).collect()
    assert len(dups) == 1 and dups[0].k == 1 and dups[0].n == 2


def test_compact_parquet_preserves_rows(spark, tmp_path):
    """Compaction: 40 tiny files rewritten to the target count with the
    exact same rows."""
    import os

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.maintenance import compact_parquet
    from tests.conftest import SF_SMALL

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, SF_SMALL, "orders")
    orders.repartition(40).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small == 40

    stats = compact_parquet(spark, src, dst, target_rows_per_file=10_000).head()
    n_big = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_big == stats.n_files_target < n_small
    assert stats.n_rows == orders.count()

    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b


def test_zorder_narrows_both_column_spans(spark, tmp_path):
    """Z-ordered files must cover rectangles of (a, b) space: the mean
    per-file min/max span of the SECOND column shrinks materially vs a
    layout range-partitioned on the first column alone (which leaves the
    second column's spans at full width)."""
    import pyarrow.parquet as pq
    import os

    from project_bigdata_recsys_spark.operators.maintenance import write_zordered

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    z_dir = str(tmp_path / "zordered")
    lin_dir = str(tmp_path / "linear")
    write_zordered(df, "a", "b", z_dir, n_files=16, bits=8)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lin_dir)

    def mean_span(d, col):
        spans = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    # rows preserved
    assert sorted(map(tuple, spark.read.parquet(z_dir).collect())) == sorted(
        map(tuple, df.collect())
    )
    # the one-column layout keeps column b spans near full width (~64);
    # z-order must cut the mean b-span at least in half while keeping
    # a-spans bounded (rectangles, not stripes)
    assert mean_span(lin_dir, "b") > 40
    assert mean_span(z_dir, "b") < mean_span(lin_dir, "b") / 2
    assert mean_span(z_dir, "a") < 64


def test_export_shuffled_deterministic_disjoint_ranges(spark, tmp_path):
    """Shuffled export: files hold disjoint, ordered md5-key ranges
    (pyarrow footer proof), rows are conserved, and the global order is
    identical across reruns."""
    import pyarrow.parquet as pq

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.maintenance import export_shuffled
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_shuffled(docs, out1, n_files=4, key_col="doc_id")
    export_shuffled(docs, out2, n_files=4, key_col="doc_id")

    import glob

    files = sorted(glob.glob(out1 + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += md.num_rows
        schema_names = [md.schema.column(i).name for i in range(len(md.schema))]
        ki = schema_names.index("__shuffle_key")
        mins = min(md.row_group(g).column(ki).statistics.min for g in range(md.num_row_groups))
        maxs = max(md.row_group(g).column(ki).statistics.max for g in range(md.num_row_groups))
        ranges.append((mins, maxs))
    assert total == docs.count()
    # files sorted by name must cover ordered disjoint ranges... but part
    # file naming order need not match range order — sort by range instead
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping ranges {hi1} vs {lo2}"

    # rerun is byte-identical in content: same rows in the same global order
    a = spark.read.parquet(out1).orderBy("__shuffle_key").collect()
    b = spark.read.parquet(out2).orderBy("__shuffle_key").collect()
    assert a == b
