"""Round-13 regression pins (r12 VERDICT brief + ADVICE items).

- `_stage_and_swap` partition-name escaping: a fully-deleted touched
  partition whose value Spark Hive-escapes (e.g. a colon) must actually
  be removed — the pre-r13 code rmtree'd the raw f-string name and left
  the escaped directory (and its stale rows) behind;
- the staging dir joins the exit purge only after the swap commits
  (recovery-copy preservation), covered implicitly: a green merge still
  registers its staging for purge (no /tmp leak on success).
"""

from __future__ import annotations

import os


def test_stage_and_swap_escaped_partition_full_delete(spark, tmp_path):
    """Deleting every row of a partition whose value needs Hive escaping
    must remove the real (escaped) directory, not miss it via a raw
    f-string name (r12 ADVICE #1)."""
    import shutil

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_apply_changelog,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "x:1"), (2, "b", "x:1"), (3, "c", "plain")],
        "id long, v string, part string",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(target)
    dirs = {d for d in os.listdir(target) if d.startswith("part=")}
    # precondition: Spark escaped the colon, so the raw name is absent
    assert "part=x%3A1" in dirs and "part=x:1" not in dirs

    changelog = spark.createDataFrame(
        [(1, None, "x:1", 1, "D"), (2, None, "x:1", 1, "D")],
        "id long, v string, part string, seq int, op string",
    )
    touched = merge_apply_changelog(
        spark, target, changelog, ["id"], "part"
    )
    assert touched == ["x:1"]

    dirs_after = {d for d in os.listdir(target) if d.startswith("part=")}
    assert "part=x%3A1" not in dirs_after  # stale dir really gone
    got = {(r.id, r.v, r.part) for r in spark.read.parquet(target).collect()}
    assert got == {(3, "c", "plain")}
    shutil.rmtree(target)


def test_compact_ann_index_probe_identity_and_file_drop(spark, tmp_path):
    """fold → compact → probe ≡ rebuild → probe (r11 verdict task #4):
    compaction must cut the fragment count the streaming folds created
    while leaving every probe result — and therefore index content —
    bit-identical to a from-scratch build over the full corpus."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.similarity import (
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        query_ann_index,
        rp_index_rows,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    max_vec = emb.agg({"vec_id": "max"}).collect()[0][0]
    split = int(max_vec * 0.7)

    idx = str(tmp_path / "idx")
    rp_index_rows(
        emb.filter(emb.vec_id < split), 4, 6
    ).write.mode("overwrite").partitionBy("t", "bucket").parquet(idx)

    # three append-mode fold batches, like three micro-batches of the
    # ingest stream — each append adds files to its touched partitions
    lo = split
    step = max(1, (int(max_vec) - split) // 3 + 1)
    for i in range(3):
        batch = emb.filter(
            (emb.vec_id >= lo + i * step) & (emb.vec_id < lo + (i + 1) * step)
        )
        append_ann_index(spark, idx, batch, 4, 6)

    before = [
        tuple(r)
        for r in query_ann_index(spark, sf, idx, query_vec_id=0).collect()
    ]
    stats = compact_ann_index(spark, idx, target_rows_per_file=1_000_000)
    assert stats["partitions_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    # every partition now holds exactly the files its rows justify (=1
    # at this scale)
    assert stats["files_after"] == stats["partitions_total"]

    after = [
        tuple(r)
        for r in query_ann_index(spark, sf, idx, query_vec_id=0).collect()
    ]
    assert before == after  # probe identity through the compacted index

    rebuilt = str(tmp_path / "idx2")
    build_ann_index(spark, sf, rebuilt)
    reb = [
        tuple(r)
        for r in query_ann_index(
            spark, sf, rebuilt, query_vec_id=0
        ).collect()
    ]
    assert after == reb  # fold→compact ≡ rebuild

    # idempotent: a second compaction finds nothing to do
    again = compact_ann_index(spark, idx, target_rows_per_file=1_000_000)
    assert again["partitions_compacted"] == 0
    assert again["files_after"] == stats["files_after"]


def test_compact_ann_index_multi_file_target(spark, tmp_path):
    """The rows-per-file target above 1 output file per partition (the
    salt path): a partition holding more files than its rows justify is
    rewritten to at most ceil(rows/target) files with the row set
    untouched; partitions already within budget are left alone."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.functions.similarity import (
        compact_ann_index,
    )

    idx = str(tmp_path / "idx")
    rows = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("t"),
        (F.col("id") % 2).cast("int").alias("bucket"),
    )
    # 8 fragments per partition directory
    rows.repartition(8).write.mode("overwrite").partitionBy(
        "t", "bucket"
    ).parquet(idx)

    before = {
        tuple(r) for r in spark.read.parquet(idx).collect()
    }
    stats = compact_ann_index(spark, idx, target_rows_per_file=25)
    # 50 rows per bucket / 25 per file = 2 files each, down from 8
    assert stats["partitions_total"] == 2
    assert stats["partitions_compacted"] == 2
    assert stats["files_after"] <= 4 < stats["files_before"]
    after = {tuple(r) for r in spark.read.parquet(idx).collect()}
    assert before == after

    again = compact_ann_index(spark, idx, target_rows_per_file=25)
    assert again["partitions_compacted"] == 0


def test_run_replay_incremental_enforces_min_batches(spark):
    """The incremental gate helper must FAIL, not silently pass, when
    the source drains in fewer micro-batches than the gate claims —
    here batchSize >= n collapses consumption to one poll, so the ≥3
    requirement raises (r11 verdict task #5: the multi-batch claim has
    to be load-bearing, not decorative)."""
    import pytest

    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        _run_replay_incremental,
    )

    spark.dataSource.register(SyntheticInteractionsDataSource)
    stream = (
        spark.readStream.format("synthetic_interactions")
        .option("n", 300)
        .option("seed", 42)
        .option("batchSize", 300)
        .option("numPartitions", 2)
        .load()
    )
    with pytest.raises(RuntimeError, match="micro-batches"):
        _run_replay_incremental(
            stream, spark, expected_rows=300, min_batches=3
        )


def test_stage_and_swap_escaped_partition_update(spark, tmp_path):
    """An UPDATE on an escaped-value partition swaps the escaped dir in
    place (staged name and target name agree because both are
    Spark-written)."""
    import shutil

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_into_partitioned,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "x:1"), (2, "b", "plain")],
        "id long, v string, part string",
    ).write.mode("overwrite").partitionBy("part").parquet(target)

    updates = spark.createDataFrame(
        [(1, "a2", "x:1")], "id long, v string, part string"
    )
    merge_into_partitioned(spark, target, updates, ["id"], "part")

    dirs = {d for d in os.listdir(target) if d.startswith("part=")}
    assert dirs == {"part=x%3A1", "part=plain"}
    got = {(r.id, r.v, r.part) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a2", "x:1"), (2, "b", "plain")}
    shutil.rmtree(target)


# --- merge-on-read join-view maintenance (r13 third wave) ------------------


def test_join_view_mor_reconcile_and_recompute_agree(spark):
    """The three lifecycle states — merge-on-read resolution over
    base+ledgers, the post-reconcile plain scan, and a from-scratch
    recompute of orders' ⋈ dim' — must be row-identical; reconcile must
    leave the ledgers empty; and a second reconcile must be a no-op that
    rewrites no base partition (mtime-pinned idempotency)."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import viewmaint as vm

    sf = "/root/testdata/sf0.001"
    customer = load_table(spark, sf, "customer")

    dirs = vm.setup_join_view(spark, sf)
    mor = vm.profile_join_view(
        vm.resolve_join_view(
            spark,
            dirs["base"],
            dirs["fact_ledger"],
            dirs["dim_ledger"],
            customer,
        ),
        sf,
    ).collect()

    vm.reconcile_join_view(
        spark, dirs["base"], dirs["fact_ledger"], dirs["dim_ledger"], customer
    )
    for d in (dirs["fact_ledger"], dirs["dim_ledger"]):
        assert not any(f.endswith(".parquet") for f in os.listdir(d))
    rec = vm.profile_join_view(
        vm.resolve_join_view(
            spark,
            dirs["base"],
            dirs["fact_ledger"],
            dirs["dim_ledger"],
            customer,
        ),
        sf,
    ).collect()
    assert [tuple(r) for r in mor] == [tuple(r) for r in rec]

    # from-scratch recompute: apply both deltas and re-join
    from pyspark.sql import functions as F

    lf = vm.fact_delta(spark, sf).drop("seq")
    base_orders = vm._orders_projected(spark, sf)
    orders2 = base_orders.join(
        lf.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(lf)
    ld = vm.dim_delta(spark, sf)
    dim2 = customer.select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    ).join(ld.select("c_custkey", "new_segment"), "c_custkey", "left")
    dim2 = dim2.select(
        "c_custkey", F.coalesce("new_segment", "segment").alias("segment")
    )
    full = orders2.join(
        dim2, orders2["o_custkey"] == dim2["c_custkey"]
    ).select("o_orderkey", "o_custkey", "o_totalprice", "part", "segment")
    scratch = vm.profile_join_view(full, sf).collect()
    assert [tuple(r) for r in mor] == [tuple(r) for r in scratch]

    # idempotency: nothing to fold, no partition directory rewritten
    mtimes = {
        d: os.path.getmtime(os.path.join(dirs["base"], d))
        for d in os.listdir(dirs["base"])
        if d.startswith("part=")
    }
    vm.reconcile_join_view(
        spark, dirs["base"], dirs["fact_ledger"], dirs["dim_ledger"], customer
    )
    after = {
        d: os.path.getmtime(os.path.join(dirs["base"], d))
        for d in os.listdir(dirs["base"])
        if d.startswith("part=")
    }
    assert mtimes == after


def test_join_view_mor_resolution_never_shuffles_base(spark):
    """The MOR read path's contract at 100 TB: the base participates in
    broadcast joins only.  No SortMergeJoin anywhere in the resolved
    plan, and every ledger join is a BroadcastHashJoin."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import viewmaint as vm

    sf = "/root/testdata/sf0.001"
    dirs = vm.setup_join_view(spark, sf)
    resolved = vm.resolve_join_view(
        spark,
        dirs["base"],
        dirs["fact_ledger"],
        dirs["dim_ledger"],
        load_table(spark, sf, "customer"),
    )
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # anti, enrich, override


def test_join_view_insert_offset_guard_fires(spark, tmp_path):
    """A base order key at/above the +1e9 planting offset must fail the
    build loudly (scan-time raise_error), not silently collide with a
    planted insert — the dedup family's planted_id contract."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from project_bigdata_recsys_spark.operators import viewmaint as vm

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(vm.INSERT_KEY_OFFSET + 7, 1, 100.0, "1995-01-01")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate",
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        [(1, "BUILDING")], "c_custkey long, c_mktsegment string"
    ).write.parquet(os.path.join(sf, "customer.parquet"))

    with pytest.raises(SparkRuntimeException, match="offset collision"):
        vm.setup_join_view(spark, sf)


def test_join_view_reconcile_midstream_is_invariant(spark):
    """Fold-point invariance — the MOR semantics contract under
    continuous ingest: land part of the fact delta, reconcile, land the
    rest, and the resolved profile must equal the never-reconciled
    resolution of the full delta.  (Production reconciles on a ledger-
    size trigger, so correctness must not depend on WHEN the fold
    happens.)"""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators import viewmaint as vm
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    sf = "/root/testdata/sf0.001"
    customer = load_table(spark, sf, "customer")

    # path A: all deltas as ledgers, resolve once (the join_view_mor shape)
    dirs_a = vm.setup_join_view(spark, sf)
    want = vm.profile_join_view(
        vm.resolve_join_view(
            spark,
            dirs_a["base"],
            dirs_a["fact_ledger"],
            dirs_a["dim_ledger"],
            customer,
        ),
        sf,
    ).collect()

    # path B: first tercile -> reconcile -> remaining terciles -> resolve
    dirs_b = vm.setup_join_view(spark, sf, write_fact_ledger=False)
    delta = vm.fact_delta(spark, sf)
    u = hash_uniform(F.col("o_orderkey"), "jv-batch:")
    delta.filter(u < 1 / 3).write.mode("overwrite").parquet(
        dirs_b["fact_ledger"]
    )
    vm.reconcile_join_view(
        spark,
        dirs_b["base"],
        dirs_b["fact_ledger"],
        dirs_b["dim_ledger"],
        customer,
    )
    delta.filter(u >= 1 / 3).write.mode("overwrite").parquet(
        dirs_b["fact_ledger"]
    )
    got = vm.profile_join_view(
        vm.resolve_join_view(
            spark,
            dirs_b["base"],
            dirs_b["fact_ledger"],
            dirs_b["dim_ledger"],
            customer,
        ),
        sf,
    ).collect()
    assert [tuple(r) for r in want] == [tuple(r) for r in got]


def test_value_side_cum_partitioning_invariant(spark):
    """The drift kernel's output — including the partition-edge
    successor patch — must be identical at any range-partition count.
    The pre-fix kernel re-sampled its range boundaries per consuming
    branch under AQE, so `__pid` meant different ranges in different
    branches and edge rows got a WRONG successor (v_next < v at 7-core
    parallelism, shrinking W1 ~3%; caught by
    tools/check_order_stability.py).  The persist pins one
    materialization; this pins the invariance."""
    from project_bigdata_recsys_spark.caching import release_tracked
    from project_bigdata_recsys_spark.operators.quality import (
        _value_side_cum,
    )

    sf = "/root/testdata/sf0.001"
    frames = {}
    for n in (3, 7, 32):
        pdf = _value_side_cum(spark, sf, n_parts=n).toPandas()
        # the global-max row's successor is null -> NaN in pandas, and
        # NaN != NaN would fail the comparison on identical frames
        pdf = pdf.astype(object).where(pdf.notna(), None)
        frames[n] = sorted(map(tuple, pdf.itertuples(index=False)))
        release_tracked()
    assert frames[3] == frames[7] == frames[32]
    # sanity: every successor is strictly greater than its value
    vs = {c: i for i, c in enumerate(
        _value_side_cum(spark, sf, n_parts=7).columns
    )}
    release_tracked()
    for row in frames[7]:
        v, v_next = row[vs["v"]], row[vs["v_next"]]
        assert v_next is None or v_next > v
