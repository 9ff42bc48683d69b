"""Round-14 later-wave pins: MMR greedy order, vacuum/time-travel
invariants, blocking-audit ground truth, Qini arithmetic, and the
advisor clamps — each checked against an independent pure-Python
recompute or a structural invariant the oracle hash alone can't state.
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL


def test_mmr_matches_python_greedy(spark):
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.similarity import (
        mmr_diversified_rerank,
    )

    got = [
        (r.rank, r.vec_id, r.rel_micro, r.max_sim_micro, r.mmr_micro)
        for r in mmr_diversified_rerank(spark, SF_SMALL, k=6).collect()
    ]
    emb = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }

    def cos_micro(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        # Spark round() is HALF_UP on the double product — replicate
        v = d / (na * nb) * 1000000.0
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    q = emb[0]
    rel = {
        vid: cos_micro(e, q) for vid, e in emb.items() if vid != 0
    }
    shortlist = sorted(rel, key=lambda v: (-rel[v], v))[:50]
    selected = [min(shortlist, key=lambda v: (-rel[v], v))]
    want = [(1, selected[0], rel[selected[0]], 0, rel[selected[0]])]
    for rank in range(2, 7):
        best = None
        for v in shortlist:
            if v in selected:
                continue
            ms = max(cos_micro(emb[v], emb[s]) for s in selected)
            key = (-(rel[v] - ms), v)
            if best is None or key < best[0]:
                best = (key, v, ms)
        _, v, ms = best
        selected.append(v)
        want.append((rank, v, rel[v], ms, rel[v] - ms))
    assert got == want


def test_vacuum_plan_invariants(spark):
    from project_bigdata_recsys_spark.operators.maintenance import (
        vacuum_retention_plan,
    )

    rows = vacuum_retention_plan(spark, SF_SMALL).collect()
    assert rows, "plan must cover every version"
    vmax = max(r.v for r in rows)
    floor_v = vmax - 3 + 1
    total_added = sum(r.n_added for r in rows)
    total_removed = sum(r.n_removed for r in rows)
    total_deletable = sum(r.n_deletable for r in rows)
    # removals are a subset of additions; deletable a subset of removals
    assert total_removed <= total_added
    assert total_deletable <= total_removed
    for r in rows:
        # nothing removed at or before the floor survives as retained,
        # and nothing removed after the floor is deletable
        if r.v <= floor_v:
            assert r.n_deletable == r.n_removed
        else:
            assert r.n_deletable == 0
        assert (r.reclaim_rows > 0) == (r.n_deletable > 0)
    # versions are dense 1..V
    assert sorted(r.v for r in rows) == list(range(1, vmax + 1))


def test_blocking_audit_ground_truth(spark):
    from project_bigdata_recsys_spark.functions.dedup import (
        blocking_quality_audit,
    )

    rows = {r.strategy: r for r in blocking_quality_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"sorted_neighborhood_w3", "char1_lenband4"}
    sn, blk = rows["sorted_neighborhood_w3"], rows["char1_lenband4"]
    assert sn.n_truth == blk.n_truth > 0
    for r in rows.values():
        assert 0 <= r.n_found <= r.n_truth
        assert 0 <= r.recall_micro <= 1000000
        assert 0 < r.reduction_micro <= 1000000
    # SN adjacency must find at least as many planted variants as the
    # length-band blocker (a variant is one char longer and can cross
    # a band boundary; it can never leave the SN sort neighborhood's
    # block since the leading token is unchanged)
    assert sn.n_found >= blk.n_found


def test_qini_matches_python(spark):
    from project_bigdata_recsys_spark.operators.experiments import (
        qini_uplift_curve,
    )
    from project_bigdata_recsys_spark.catalog import load_table

    got = [
        (r.bin, r.nt_k, r.nc_k, r.yt_k, r.yc_k, r.qini_micro)
        for r in qini_uplift_curve(spark, SF_SMALL).collect()
    ]
    import hashlib

    ev = load_table(spark, SF_SMALL, "events").collect()
    days = [math.floor(r.ts.timestamp() / 86400.0) for r in ev]
    mid = math.floor((min(days) + max(days)) / 2.0)
    per_user: dict = {}
    for r, d in zip(ev, days):
        ne, pe, y = per_user.get(r.user_id, (0, 0, 0))
        if d <= mid:
            ne += 1
            if r.event_type == "purchase":
                pe += 1
        elif r.event_type == "purchase":
            y = 1
        per_user[r.user_id] = (ne, pe, y)
    bins: dict = {}
    for uid, (ne, pe, y) in per_user.items():
        p_micro = math.floor(1000000.0 * (pe + 1) / (ne + 2) + 0.5)
        b = p_micro // 100000
        h = int(hashlib.md5(f"qini:{uid}".encode()).hexdigest()[:8], 16)
        treat = 1 if h / 4294967296.0 < 0.5 else 0
        nt, nc, yt, yc = bins.get(b, (0, 0, 0, 0))
        bins[b] = (
            nt + treat,
            nc + 1 - treat,
            yt + treat * y,
            yc + (1 - treat) * y,
        )
    want = []
    nt_k = nc_k = yt_k = yc_k = 0
    for b in sorted(bins, reverse=True):
        nt, nc, yt, yc = bins[b]
        nt_k += nt
        nc_k += nc
        yt_k += yt
        yc_k += yc
        q = (yt_k * max(nc_k, 1) - yc_k * nt_k) * 1000000 // max(nc_k, 1)
        want.append((b, nt_k, nc_k, yt_k, yc_k, q))
    assert got == want


def test_partition_advisor_clamps(spark):
    from project_bigdata_recsys_spark.operators.maintenance import (
        shuffle_partition_advisor,
    )

    rows = shuffle_partition_advisor(spark, SF_SMALL).collect()
    assert {r.table_name for r in rows} == {
        "lineitem",
        "orders",
        "customer",
        "events",
        "documents",
    }
    for r in rows:
        assert r.n_rows > 0 and r.est_bytes > 0
        assert r.scan_partitions >= 1
        assert 32 <= r.shuffle_partitions <= 2000
        # the ceil arithmetic: scan partitions never under-provision
        assert r.scan_partitions * 128 * 1024 * 1024 >= r.est_bytes
