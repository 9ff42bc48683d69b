"""Round-6 operator contracts: boundary-aware packing, int8 quantization
QA, incremental-CC gate profile, shuffled-export manifest, and the
labeling-reuse audit.  Oracle parity runs separately in
test_oracle_parity; these pin the semantics directly."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from tests.conftest import SF_SMALL


def test_pack_boundaries_conserves_tokens_and_charges_overhead(spark):
    """boundary_tokens charges the budget but never the reported content
    mass; placement differs from the raw form once boundaries tighten
    the budget; fill ratios stay <= 1."""
    from project_bigdata_recsys_spark.functions.curation import (
        pack_sequences_for,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    raw = pack_sequences_for(docs, budget=256, n_shards=4).collect()
    bounded = pack_sequences_for(
        docs, budget=256, n_shards=4, boundary_tokens=2
    ).collect()
    # content-token mass is conserved across both manifests
    assert sum(r.n_tokens for r in raw) == sum(r.n_tokens for r in bounded)
    assert sum(r.n_docs for r in raw) == sum(r.n_docs for r in bounded)
    # boundary charge -> at least as many sequences, never fewer
    assert len(bounded) >= len(raw)
    for r in bounded:
        assert 0 < r.fill_ratio <= 1.0
    # overhead really is charged: some sequence's doc count shrinks or
    # the sequence count grows (the corpus has multi-doc sequences)
    assert len(bounded) > len(raw) or any(
        b.n_docs != a.n_docs for a, b in zip(raw, bounded)
    )


def test_pack_boundaries_zero_matches_raw_form(spark):
    """boundary_tokens=0 is exactly the raw concat-and-chop manifest."""
    from project_bigdata_recsys_spark.functions.curation import (
        pack_sequences_for,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    raw = pack_sequences_for(docs, budget=256).collect()
    zero = pack_sequences_for(docs, budget=256, boundary_tokens=0).collect()
    assert raw == zero


def test_int8_quantization_profile_matches_numpy(spark):
    """Per-label avg/min reconstruction stats agree with a numpy
    recompute of the same symmetric per-vector int8 quantization."""
    import numpy as np

    from project_bigdata_recsys_spark.functions.similarity import (
        int8_quantization_profile,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    by_label: dict[str, list] = {}
    for row in emb:
        v = np.asarray([float(x) for x in row.embedding], dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        if scale == 0:
            continue
        q = np.clip(np.round(v / scale), -127, 127)
        recon = q * scale
        mse = float(((v - recon) ** 2).sum() / len(v))
        cos = float(
            (v * recon).sum()
            / (np.sqrt((v * v).sum()) * np.sqrt((recon * recon).sum()))
        )
        by_label.setdefault(row.label, []).append((mse, cos, scale))
    rows = int8_quantization_profile(spark, SF_SMALL).collect()
    assert {r.label for r in rows} == set(by_label)
    for r in rows:
        stats = by_label[r.label]
        assert r.n_vecs == len(stats)
        assert abs(r.avg_mse - sum(m for m, _, _ in stats) / len(stats)) < 1e-6
        assert abs(r.avg_cos - sum(c for _, c, _ in stats) / len(stats)) < 1e-5
        assert abs(r.min_cos - min(c for _, c, _ in stats)) < 1e-5
        # int8 at 64 dims keeps geometry: cosines should stay high
        assert r.min_cos > 0.99


def test_incremental_components_profile_equals_full_recompute(spark):
    """The folded labeling's cluster-size histogram equals a full CC
    recompute over all pairs — the star-equivalence contract the gate
    query rides on."""
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        incremental_components_profile,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    full = connected_components(simhash_near_pairs_for(docs, sort=False))
    expected = (
        full.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.min("cluster_id").alias("min_cluster_id"),
        )
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_clusters",
            "min_cluster_id",
        )
        .orderBy("cluster_size")
        .collect()
    )
    got = incremental_components_profile(spark, SF_SMALL).collect()
    assert got == expected


def test_shuffled_export_manifest_replays_md5_order(spark):
    """Sampled ranks reproduce a Python sort of md5(doc_id): same keys at
    the same 1-based positions."""
    from project_bigdata_recsys_spark.operators.maintenance import (
        shuffled_export_manifest,
    )

    ids = [
        r.doc_id
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id")
        .collect()
    ]
    perm = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
    )
    rows = shuffled_export_manifest(spark, SF_SMALL, every=25).collect()
    assert [r.rank for r in rows] == list(range(1, len(ids) + 1, 25))
    for r in rows:
        key, doc = perm[r.rank - 1]
        assert (r.shuffle_key, r.doc_id) == (key, doc)


def test_split_source_audit_totals_and_bounds(spark):
    """Every document lands in exactly one (source, split) cell; cross-
    source dup mass is bounded by clustered mass; rates recompute."""
    from project_bigdata_recsys_spark.functions.curation import (
        split_source_audit,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    rows = split_source_audit(spark, SF_SMALL).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    for r in rows:
        assert 0 <= r.n_cross_docs <= r.n_clustered <= r.n_docs
        if r.n_clustered:
            assert abs(r.cross_rate - round(r.n_cross_docs / r.n_clustered, 4)) < 1e-9
        else:
            assert r.cross_rate == 0.0


def test_stream_semantic_dedup_equals_batch_contamination(spark):
    """A full bounded replay of the streaming probe must reproduce the
    batch semantic_contamination table exactly (same threshold, split,
    tables, planes) — the stream/batch equivalence contract every other
    streaming twin in this repo pins."""
    from project_bigdata_recsys_spark.functions.similarity import (
        semantic_contamination,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_semantic_dedup,
    )

    batch = semantic_contamination(spark, SF_SMALL).collect()
    streamed = stream_semantic_dedup(spark, SF_SMALL).collect()
    assert streamed == batch


def test_dedup_keep_best_winner_rule(spark):
    """The winner is the max-quality member (min doc_id on ties): the
    case-flip variant (+1M) must beat its original (uppercase evades the
    lowercase stopword list), and the punctuation/whitespace variants
    must lose to theirs."""
    from project_bigdata_recsys_spark.functions.text import dedup_keep_best

    rows = dedup_keep_best(spark, SF_SMALL, limit=1000).collect()
    assert rows and all(r.n_docs >= 2 for r in rows)
    # every planted group: original + 3 variants
    planted_groups = [r for r in rows if r.n_docs == 4]
    assert planted_groups
    for r in planted_groups:
        # winner is the +1M case-flip variant unless the original has
        # zero stopwords (then quality ties and min doc_id wins)
        assert r.winner_id >= 1_000_000 or r.winner_id == (
            r.winner_id % 10_000_000
        )
        assert r.winner_id < 2_000_000  # never the mangled +2M/+3M copies


def test_hll_sketch_layer_survives_parquet_roundtrip(spark, tmp_path):
    """The daily sketch layer is PERSISTABLE state: binary HLL sketches
    written to parquet and read back must union to the same estimates as
    the in-memory two-level rollup — the materialized-metrics-layer
    contract the operator's 100 TB story rests on."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt

    ev = _lt(spark, SF_SMALL, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    out = str(tmp_path / "daily_sketches")
    daily.write.parquet(out)
    merged_disk = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .orderBy("event_type")
        .collect()
    )
    merged_mem = (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .orderBy("event_type")
        .collect()
    )
    assert merged_disk == merged_mem
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in merged_disk:
        assert abs(r.est - exact[r.event_type]) / exact[r.event_type] <= 0.06


def test_pit_join_picks_version_valid_at_event_time(spark):
    """Literal-frame check: facts land on exactly the version whose
    [valid_from, valid_to) interval contains the event time; facts
    before any version get NULLs (left semantics)."""
    from project_bigdata_recsys_spark.operators.asof import pit_join

    dim = spark.createDataFrame(
        [
            (1, "old", "1990-01-01", "1996-01-01"),
            (1, "new", "1996-01-01", "9999-12-31"),
            (2, "only", "1995-01-01", "9999-12-31"),
        ],
        "k int, seg string, valid_from string, valid_to string",
    )
    facts = spark.createDataFrame(
        [(1, "1995-12-31"), (1, "1996-01-01"), (2, "1994-06-01")],
        "k int, d string",
    )
    rows = {
        (r.k, r.d): r["__dim_seg"]
        for r in pit_join(facts, dim, "k", "d").collect()
    }
    assert rows[(1, "1995-12-31")] == "old"
    assert rows[(1, "1996-01-01")] == "new"  # boundary: inclusive from
    assert rows[(2, "1994-06-01")] is None  # before first version


def test_merge_aggregate_state_equals_full_recompute(spark):
    """Folding the post-cutoff delta into the prior state reproduces the
    full per-key aggregation over all events exactly."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.operators.snapshot import (
        merge_aggregate_state,
    )

    ev = _lt(spark, SF_SMALL, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 1000000).cast("long").alias("micros"),
    )
    part = lambda df: df.groupBy("event_type", "day").agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("micros").alias("micros"),
    )
    folded = merge_aggregate_state(
        part(ev.filter(F.col("day") < "2024-01-16")),
        part(ev.filter(F.col("day") >= "2024-01-16")),
        ["event_type", "day"],
    )
    assert sorted(folded.collect()) == sorted(part(ev).collect())


def test_negative_samples_never_collide_with_positives(spark):
    """Every sampled (user, item) is a true negative; each user gets at
    most k rows in slot order; the draw is reproducible run-to-run."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.ml.recsys import negative_samples

    orders = _lt(spark, SF_SMALL, "orders").select("o_custkey", "o_orderkey")
    li = _lt(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    pos = {
        (r.o_custkey, r.l_partkey)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey).collect()
    }
    rows = negative_samples(spark, SF_SMALL, limit=10_000).collect()
    assert rows
    per_user: dict[int, list[int]] = {}
    for r in rows:
        assert (r.user_id, r.item_id) not in pos
        per_user.setdefault(r.user_id, []).append(r.slot)
    for slots in per_user.values():
        assert len(slots) <= 3 and slots == sorted(slots)
    again = negative_samples(spark, SF_SMALL, limit=10_000).collect()
    assert again == rows


def test_backfill_plan_agrees_with_row_level_diff(spark):
    """A month is 'unchanged' iff the row-level snapshot diff finds no
    added/removed/changed key in it — the digest plan must agree with
    the expensive row diff it replaces."""
    from project_bigdata_recsys_spark.operators.snapshot import (
        _mutated_orders,
        backfill_plan,
        table_diff,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    plan = {r.part: r.status for r in backfill_plan(spark, SF_SMALL).collect()}
    diff = table_diff(
        orders,
        _mutated_orders(orders),
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    )
    # month per key comes from the ORIGINAL table; brand-new keys
    # (+1e9 rekeys) inherit their source row's month via key - 1e9
    month = {
        r.o_orderkey: r.m
        for r in orders.select(
            "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("m")
        ).collect()
    }
    dirty = set()
    for r in diff.filter(F.col("change_type") != "unchanged").collect():
        key = r.o_orderkey if r.o_orderkey in month else r.o_orderkey - 1_000_000_000
        dirty.add(month[key])
    for part, status in plan.items():
        assert (status != "unchanged") == (part in dirty), (part, status)


def test_fixed_point_sums_invariant_under_partitioning(spark):
    """The round-6 exactness claim, pinned directly: the converted
    money/value aggregations return IDENTICAL rows when the shuffle
    partitioning (and so the double-addition order) changes — the
    property plain sum(double) does not have."""
    from project_bigdata_recsys_spark.operators.analytics import (
        pricing_summary,
        rfm_segments,
    )
    from project_bigdata_recsys_spark.operators.relational import (
        events_per_day,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                "pricing": pricing_summary(spark, SF_SMALL).collect(),
                "rfm": rfm_segments(spark, SF_SMALL).collect(),
                "events": events_per_day(spark, SF_SMALL).collect(),
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert results["32"] == results["7"]


def test_psi_drift_totals_and_small_shift(spark):
    """Bucket masses cover both snapshots exactly; the ~2%-drop/1%-bump
    mutation is a SMALL shift, so total PSI must sit well below the 0.1
    'stable' bar while remaining nonzero."""
    from project_bigdata_recsys_spark.operators.quality import psi_drift
    from project_bigdata_recsys_spark.operators.snapshot import _mutated_orders

    orders = load_table(spark, SF_SMALL, "orders")
    rows = psi_drift(spark, SF_SMALL).collect()
    assert sum(r.n_old for r in rows) == orders.count()
    assert sum(r.n_new for r in rows) == _mutated_orders(orders).count()
    total_psi = sum(r.psi_term for r in rows)
    assert 0 < total_psi < 0.1


def test_pareto_curve_is_a_lorenz_curve(spark):
    """Cumulative share is monotone and ends at 1.0; band 0 (the
    top-revenue decile) carries the largest share."""
    from project_bigdata_recsys_spark.operators.analytics import pareto_curve

    rows = pareto_curve(spark, SF_SMALL).collect()
    assert [r.band for r in rows] == list(range(len(rows)))
    cums = [r.cumulative_share for r in rows]
    assert cums == sorted(cums) and abs(cums[-1] - 1.0) < 1e-6
    assert rows[0].revenue_share == max(r.revenue_share for r in rows)


def test_ab_test_lift_partitions_users(spark):
    """The two arms cover every active user exactly once and the rates
    are well-formed."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.operators.experiments import ab_test_lift

    n_users = (
        _lt(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    rows = ab_test_lift(spark, SF_SMALL).collect()
    assert {r.arm for r in rows} == {"control", "treatment"}
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.conversion_rate <= 1
        assert r.n_converted <= r.n_users


def test_fuzzy_name_matches_banding_loses_no_pairs(spark):
    """The length-banded candidate set finds exactly the pairs a
    brute-force all-pairs Levenshtein pass finds (recall proof of the
    band construction)."""
    import itertools

    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.functions.dedup import (
        fuzzy_name_matches,
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = sorted(
        r.p_name
        for r in _lt(spark, SF_SMALL, "part").select("p_name").distinct().collect()
    )
    brute = {
        (a, b)
        for a, b in itertools.combinations(names, 2)
        if lev(a, b) <= 2
    }
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_name_matches(spark, SF_SMALL, top=100_000).collect()
    }
    assert got == brute


def test_gap_filled_daily_is_dense_and_consistent(spark):
    """Every (type, day) cell exists exactly once across the full date
    range; zero rows are flagged as gaps; non-gap rows match the raw
    aggregation."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.operators.relational import (
        gap_filled_daily,
    )

    rows = gap_filled_daily(spark, SF_SMALL).collect()
    types = {r.event_type for r in rows}
    days = sorted({r.day for r in rows})
    assert len(rows) == len(types) * len(days)
    raw = {
        (r.event_type, r.day): r.n
        for r in _lt(spark, SF_SMALL, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        expect = raw.get((r.event_type, r.day), 0)
        assert r.n_events == expect
        assert r.is_gap == (expect == 0)


def test_update_ann_index_equals_rebuild(spark, tmp_path):
    """Folding a vector batch into the persisted RP-LSH index yields
    byte-identical membership to rebuilding over the union (and the
    probe results through it match) — the incremental contract of all
    three persisted retrieval indexes."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.functions.similarity import (
        rp_index_rows,
        update_ann_index,
    )

    emb = _lt(spark, SF_SMALL, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    inc_dir = str(tmp_path / "inc")
    rp_index_rows(old, 4, 6).write.partitionBy("t", "bucket").parquet(inc_dir)
    update_ann_index(spark, inc_dir, new)
    folded = sorted(
        (r.vec_id, r.t, r.bucket)
        for r in spark.read.parquet(inc_dir).collect()
    )
    rebuilt = sorted(
        (r.vec_id, r.t, r.bucket) for r in rp_index_rows(emb, 4, 6).collect()
    )
    assert folded == rebuilt
    # empty batch is a no-op
    update_ann_index(spark, inc_dir, emb.filter(F.col("vec_id") < 0))
    assert sorted(
        (r.vec_id, r.t, r.bucket)
        for r in spark.read.parquet(inc_dir).collect()
    ) == rebuilt


def test_packing_sweep_conserves_mass_across_budgets(spark):
    """Token mass and doc counts are budget-invariant; sequence counts
    decrease (weakly) as the budget grows."""
    from project_bigdata_recsys_spark.functions.curation import (
        packing_efficiency_sweep,
    )

    rows = packing_efficiency_sweep(spark, SF_SMALL).collect()
    assert [r.budget for r in rows] == [128, 256, 512]
    assert len({r.token_mass for r in rows}) == 1
    assert len({r.n_docs for r in rows}) == 1
    seqs = [r.n_sequences for r in rows]
    assert seqs == sorted(seqs, reverse=True)
    for r in rows:
        assert r.boundary_mass == 2 * r.n_docs
        assert r.utilization > 0


def test_personalized_pagerank_biases_toward_seeds(spark):
    """Seed-restricted teleport must (a) conserve total rank mass ~1,
    (b) give the seed set a strictly larger rank share than under the
    uniform-teleport classic form."""
    from project_bigdata_recsys_spark.functions.graph import (
        item_cooccurrence_edges,
        pagerank,
    )

    edges = item_cooccurrence_edges(spark, SF_SMALL)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter((F.col("node") % 10) == 0)
    )
    classic = {r.node: r.rank for r in pagerank(edges).collect()}
    pers = {r.node: r.rank for r in pagerank(edges, seeds=seeds).collect()}
    assert abs(sum(classic.values()) - 1.0) < 1e-6
    assert abs(sum(pers.values()) - 1.0) < 1e-6
    seed_ids = {n for n in classic if n % 10 == 0}
    share_classic = sum(classic[n] for n in seed_ids)
    share_pers = sum(pers[n] for n in seed_ids)
    assert share_pers > share_classic
