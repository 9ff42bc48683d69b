"""Round-13 eighth wave pins: Fellegi-Sunter linkage, integer IPF
raking, and the sort-filter skyline.

- fellegi_sunter_linkage: the frozen per-field weights must equal an
  independent Python recompute of ln(m/u) from exact value-frequency
  integers, and the top-50 pair scores must equal a brute-force
  re-scoring of the blocked pairs;
- ipf_weight_calibration: the unrolled integer IPF must equal a pure
  Python big-int recompute cell by cell, and the final lang margins
  must sit within the floor-division loss bound of their targets;
- skyline_orders: the two-window plan must return EXACTLY the orders
  the textbook O(n²) dominance test keeps (the plan is the optimized
  form; the n² form is the spec).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from tests.conftest import SF_SMALL


def _half_up_micro(x: float) -> int:
    """Spark F.round(double)-compatible HALF_UP at 0 dp of x*1e6."""
    return int(
        Decimal(repr(float(x) * 1e6)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def test_skyline_equals_brute_force_dominance(spark):
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.analytics import skyline_orders

    got = [
        (r.segment, r.o_orderkey, r.price_cents, r.order_date)
        for r in skyline_orders(spark, SF_SMALL).collect()
    ]
    assert got, "empty skyline"

    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer")
    base = [
        (r.segment, r.o_orderkey, r.cents, r.day, r.order_date)
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1990-01-01").cast("date"),
            ).alias("day"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .collect()
    ]
    by_seg: dict = {}
    for seg, key, cents, day, ds in base:
        by_seg.setdefault(seg, []).append((key, cents, day, ds))
    want = []
    for seg, rows in by_seg.items():
        for key, cents, day, ds in rows:
            dominated = any(
                sc <= cents and sd >= day and (sc < cents or sd > day)
                for _, sc, sd, _ in rows
            )
            if not dominated:
                want.append((seg, key, cents, ds))
    want.sort(key=lambda t: (t[0], t[2], t[1]))
    assert got == want


def test_ipf_matches_python_bigint_recompute(spark):
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.curation import (
        ipf_weight_calibration,
    )

    got = [
        (r.lang, r.source, r.n_docs, r.weight_micro)
        for r in ipf_weight_calibration(spark, SF_SMALL).collect()
    ]
    assert got

    docs = load_table(spark, SF_SMALL, "documents")
    counts = {
        (r.lang, r.source): r.n
        for r in docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    langs = sorted({k[0] for k in counts})
    srcs = sorted({k[1] for k in counts})
    w = {k: n * 1_000_000 for k, n in counts.items()}
    wt = sum(w.values())
    t_l = {
        lang: wt // len(langs) + (1 if i + 1 <= wt % len(langs) else 0)
        for i, lang in enumerate(langs)
    }
    t_s = {
        s: wt // len(srcs) + (1 if i + 1 <= wt % len(srcs) else 0)
        for i, s in enumerate(srcs)
    }
    for _ in range(3):
        for axis, target in ((0, t_l), (1, t_s)):
            margins: dict = {}
            for k, v in w.items():
                margins[k[axis]] = margins.get(k[axis], 0) + v
            w = {
                k: (v * target[k[axis]]) // max(margins[k[axis]], 1)
                for k, v in w.items()
            }
    want = sorted(
        (lang, src, counts[(lang, src)], w[(lang, src)])
        for (lang, src) in counts
    )
    assert got == want

    # margin-convergence sanity: after the final LANG... the final
    # scaling is on source, so check SOURCE margins — each sits below
    # its target by at most the per-group floor loss (#cells)
    marg: dict = {}
    for lang, src, _, wm in got:
        marg[src] = marg.get(src, 0) + wm
    cells_per_src: dict = {}
    for lang, src, _, _ in got:
        cells_per_src[src] = cells_per_src.get(src, 0) + 1
    for s, m in marg.items():
        assert 0 <= t_s[s] - m <= cells_per_src[s], (s, m, t_s[s])


def test_fellegi_sunter_matches_python_rescore(spark):
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import (
        fellegi_sunter_linkage,
    )

    got = [
        (r.custkey_a, r.custkey_b, r.pattern, r.score_micro)
        for r in fellegi_sunter_linkage(spark, SF_SMALL).collect()
    ]
    assert got

    cust = load_table(spark, SF_SMALL, "customer").collect()
    recs = []
    for r in cust:
        cents_shift = int(
            Decimal(repr(float(r.c_acctbal) * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        ) + 100_000
        recs.append(
            (
                r.c_custkey,
                int(r.c_nationkey),
                r.c_mktsegment,
                cents_shift // 100_000,
                cents_shift // 10_000,
                r.c_name[-2:],
            )
        )
    n = len(recs)

    def u_stat(idx: int) -> int:
        freq: dict = {}
        for rec in recs:
            freq[rec[idx]] = freq.get(rec[idx], 0) + 1
        return sum(c * c for c in freq.values())

    weights = {}
    for f, idx in (("seg", 2), ("band", 4), ("suf", 5)):
        u = u_stat(idx)
        weights[("a", f)] = _half_up_micro(math.log((19 * n * n) / (20 * u)))
        weights[("d", f)] = _half_up_micro(
            math.log((1 * n * n) / (20 * (n * n - u)))
        )

    pairs = []
    by_block: dict = {}
    for rec in recs:
        by_block.setdefault((rec[1], rec[3]), []).append(rec)
    for rows in by_block.values():
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                lo, hi = (a, b) if a[0] < b[0] else (b, a)
                pattern = "".join(
                    "1" if lo[idx] == hi[idx] else "0" for idx in (2, 4, 5)
                )
                score = sum(
                    weights[("a" if agree == "1" else "d", f)]
                    for agree, f in zip(pattern, ("seg", "band", "suf"))
                )
                pairs.append((lo[0], hi[0], pattern, score))
    pairs.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert got == pairs[:50]

    # calibrated-score sanity: full agreement outranks every partial
    # pattern, and all-field agreement weight is positive
    assert all(w > 0 for (k, f), w in weights.items() if k == "a")
    best = max(got, key=lambda t: t[3])
    assert best[2] == "111" or "111" not in {p for _, _, p, _ in pairs}


def _hash32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_winnowing_matches_python_recompute(spark):
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.text import winnowing_overlap

    got = [tuple(r) for r in winnowing_overlap(spark, SF_SMALL).collect()]
    assert got, "no overlapping pairs at sf0.001"

    k, w, max_df = 3, 4, 10
    docs = load_table(spark, SF_SMALL, "documents").collect()
    fps: dict = {}
    for r in docs:
        toks = r.text.split(" ")
        n_g = max(len(toks) - k + 1, 1)
        grams = [
            _hash32_py(" ".join(toks[i : i + k])) for i in range(n_g)
        ]
        n_w = max(len(grams) - w + 1, 1)
        fps[r.doc_id] = {
            min(grams[j : j + w]) for j in range(n_w)
        }
    df: dict = {}
    for s in fps.values():
        for fp in s:
            df[fp] = df.get(fp, 0) + 1
    rare = {fp for fp, c in df.items() if c <= max_df}
    ids = sorted(fps)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b] & rare)
            if shared:
                mn = min(len(fps[a]), len(fps[b]))
                pairs.append(
                    (a, b, shared, len(fps[a]), len(fps[b]),
                     shared * 1_000_000 // mn)
                )
    pairs.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert got == pairs[:20]


def test_kcenter_matches_python_greedy(spark):
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.similarity import (
        kcenter_coreset,
    )

    got = [tuple(r) for r in kcenter_coreset(spark, SF_SMALL).collect()]
    assert len(got) == 5

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }

    def cos6(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        v = dot / (math.sqrt(na) * math.sqrt(nb))
        return float(
            Decimal(repr(v)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    import math

    centers = [min(emb)]
    for _ in range(4):
        best = None
        for vid in sorted(emb):
            if vid in centers:
                continue
            mc = max(cos6(emb[vid], emb[c]) for c in centers)
            if best is None or mc < best[0] or (mc == best[0] and vid < best[1]):
                best = (mc, vid)
        centers.append(best[1])
    # assignment: nearest center, ties to earlier-selected
    stats = {c: [0, 2.0] for c in centers}
    for vid, v in emb.items():
        best = None
        for order, c in enumerate(centers):
            cr = cos6(v, emb[c])
            if best is None or cr > best[0] or (cr == best[0] and order < best[1]):
                best = (cr, order)
        c = centers[best[1]]
        stats[c][0] += 1
        stats[c][1] = min(stats[c][1], best[0])
    want = [
        (i, c, stats[c][0], stats[c][1]) for i, c in enumerate(centers)
    ]
    assert got == want


def test_stream_winnowing_equals_batch(spark):
    from project_bigdata_recsys_spark.functions.text import winnowing_overlap
    from project_bigdata_recsys_spark.streaming.replay import stream_winnowing

    batch = [tuple(r) for r in winnowing_overlap(spark, SF_SMALL).collect()]
    stream = [tuple(r) for r in stream_winnowing(spark, SF_SMALL).collect()]
    # per-doc fingerprints are batch-local, so the merged ledger readout
    # must equal the batch form BIT-identically
    assert stream == batch


def test_stream_skyline_equals_batch(spark):
    from project_bigdata_recsys_spark.operators.analytics import skyline_orders
    from project_bigdata_recsys_spark.streaming.replay import stream_skyline

    batch = [tuple(r) for r in skyline_orders(spark, SF_SMALL).collect()]
    stream = [tuple(r) for r in stream_skyline(spark, SF_SMALL).collect()]
    # skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — the local
    # frontier fold must reach the batch frontier exactly
    assert stream == batch


def test_exact_matched_cohort_matches_python(spark):
    import hashlib
    from datetime import datetime

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.experiments import (
        exact_matched_cohort,
    )

    got = [tuple(r) for r in exact_matched_cohort(spark, SF_SMALL).collect()]
    assert got and got[0][0] == -1  # grand-total row sorts first

    t0 = datetime(2024, 1, 16)
    ev = load_table(spark, SF_SMALL, "events").collect()
    pre: dict = {}
    post: dict = {}
    for r in ev:
        if r.ts < t0:
            d = pre.setdefault(r.user_id, [0, 0, 0])
            d[0] += 1
            if r.event_type == "error":
                d[1] += 1
            if r.event_type == "purchase":
                d[2] += 1
        elif r.event_type == "purchase":
            post[r.user_id] = post.get(r.user_id, 0) + 1
    users = [
        (u, n // 5, e >= p, post.get(u, 0)) for u, (n, e, p) in pre.items()
    ]
    arms: dict = {}
    for u, band, exp, out in users:
        arms.setdefault((band, exp), []).append((u, out))
    k_of: dict = {}
    for band in {b for b, _ in arms}:
        if (band, True) in arms and (band, False) in arms:
            k_of[band] = min(len(arms[(band, True)]), len(arms[(band, False)]))

    def rank_key(u):
        h = int(hashlib.md5(f"match:{u}".encode()).hexdigest()[:8], 16)
        return (h, u)

    rows = {}
    for band in sorted({b for b, _ in arms}):
        n_exp = len(arms.get((band, True), []))
        n_une = len(arms.get((band, False), []))
        oe = oc = 0
        k = k_of.get(band, 0)
        if k:
            sel_e = sorted(arms[(band, True)], key=lambda t: rank_key(t[0]))[:k]
            sel_c = sorted(arms[(band, False)], key=lambda t: rank_key(t[0]))[:k]
            oe = sum(o for _, o in sel_e)
            oc = sum(o for _, o in sel_c)
        rows[band] = (band, n_exp, n_une, k, oe, oc)
    total = (
        -1,
        sum(r[1] for r in rows.values()),
        sum(r[2] for r in rows.values()),
        sum(r[3] for r in rows.values()),
        sum(r[4] for r in rows.values()),
        sum(r[5] for r in rows.values()),
    )
    want = [total] + [rows[b] for b in sorted(rows)]
    assert got == want
    # matched arms are size-balanced by construction
    for band, _, _, k, _, _ in got:
        assert k >= 0


def test_golden_record_fusion_matches_python_union_find(spark):
    import hashlib

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import (
        golden_record_fusion,
    )

    got = [tuple(r) for r in golden_record_fusion(spark, SF_SMALL).collect()]
    assert got, "no fused records (planted variants guarantee some)"

    part = load_table(spark, SF_SMALL, "part").collect()
    names: dict = {}
    stats: dict = {}
    for r in part:
        names[r.p_name] = names.get(r.p_name, 0) + 1
        cents = int(round(r.p_retailprice * 100))
        mk, mc = stats.get(r.p_name, (None, None))
        stats[r.p_name] = (
            r.p_partkey if mk is None else min(mk, r.p_partkey),
            cents if mc is None else max(mc, cents),
        )
    recs = dict(names)
    for n in list(names):
        h = int(hashlib.md5(f"sn:{n}".encode()).hexdigest()[:8], 16)
        if h % 3 == 0:
            # a planted variant colliding with a REAL name is dropped by
            # the sn_records anti-join (ADVICE r13); the dict replica
            # must see the same collision-free vocabulary to be a fair
            # comparison, so assert it rather than silently collapse
            assert n + "s" not in names, f"planted collision: {n}s"
            recs[n + "s"] = 0  # planted, count 0

    def lev(a, b):
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    # sorted-neighborhood candidates, window 3
    by_blk: dict = {}
    for n in recs:
        by_blk.setdefault(n.split(" ")[0], []).append(n)
    parent = {n: n for n in recs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for blk in by_blk.values():
        blk.sort()
        for i, a in enumerate(blk):
            for b in blk[i + 1 : i + 3]:
                if lev(a, b) <= 1:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for n in recs:
        comps.setdefault(find(n), []).append(n)
    want = []
    for members in comps.values():
        if len(members) < 2:
            continue
        canonical = min(members, key=lambda n: (len(n), n))
        keys = [stats[n][0] for n in members if n in stats]
        cents = [stats[n][1] for n in members if n in stats]
        want.append(
            (
                canonical,
                len(members),
                min(keys) if keys else None,
                sum(names.get(n, 0) for n in members),
                max(cents) if cents else None,
            )
        )
    want.sort(key=lambda t: t[0])
    assert got == want


def test_stream_ipf_equals_batch(spark):
    from project_bigdata_recsys_spark.functions.curation import (
        ipf_weight_calibration,
    )
    from project_bigdata_recsys_spark.streaming.replay import stream_ipf

    batch = [tuple(r) for r in ipf_weight_calibration(spark, SF_SMALL).collect()]
    stream = [tuple(r) for r in stream_ipf(spark, SF_SMALL).collect()]
    # count cells merge exactly across micro-batches, so the folded
    # cell table feeds the shared kernel to a BIT-identical result
    assert stream == batch


def test_burrows_delta_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.text import burrows_delta

    got = [tuple(r) for r in burrows_delta(spark, SF_SMALL).collect()]
    assert got

    docs = load_table(spark, SF_SMALL, "documents").collect()
    tf: dict = {}
    freq: dict = {}
    totals: dict = {}
    for r in docs:
        for t in r.text.split(" "):
            if not t:
                continue
            freq[t] = freq.get(t, 0) + 1
            totals[r.source] = totals.get(r.source, 0) + 1
            tf[(r.source, t)] = tf.get((r.source, t), 0) + 1
    vocab = sorted(freq, key=lambda t: (-freq[t], t))[:30]
    srcs = sorted(totals)
    rate = {
        (s, t): tf.get((s, t), 0) * 1_000_000 // totals[s]
        for s in srcs
        for t in vocab
    }
    z: dict = {}
    for t in vocab:
        vals = [rate[(s, t)] for s in srcs]
        mean = sum(vals) // len(srcs)
        devs = {s: rate[(s, t)] - mean for s in srcs}
        ssq = sum(d * d for d in devs.values())
        for s in srcs:
            if ssq == 0:
                z[(s, t)] = 0
            else:
                import math

                v = devs[s] * 1e6 / math.sqrt(ssq / len(srcs))
                z[(s, t)] = int(
                    Decimal(repr(v)).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
    pairs = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sab = sum(abs(z[(a, t)] - z[(b, t)]) for t in vocab)
            pairs.append((a, b, sab // len(vocab), len(vocab)))
    pairs.sort(key=lambda r: (r[2], r[0], r[1]))
    assert got == pairs[:20]


def test_skyline_plan_is_one_window_sort_no_join_per_row(spark):
    """The scale contract of the sort-filter skyline: the customer
    dimension broadcasts (the orders side never shuffles for it) and
    the two dominance frames share ONE window sort per segment — never
    a per-segment self-join or NOT EXISTS."""
    from project_bigdata_recsys_spark.operators.analytics import skyline_orders

    plan = skyline_orders(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") <= 2  # both frames in one window region


def test_fellegi_weights_are_broadcast_not_recomputed_per_pair(spark):
    """The six frozen ln(m/u) weights must reach the pair fan-out as a
    1-row broadcast — any plan that recomputes the u-statistics per
    pair (or sort-merge-joins them in) breaks the Σ|b|² cost model."""
    from project_bigdata_recsys_spark.functions.dedup import (
        fellegi_sunter_linkage,
    )

    plan = (
        fellegi_sunter_linkage(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan  # top-50 never global-sorts


def test_ipf_iterations_stay_on_the_cell_table(spark):
    """The only corpus-sized operator in the IPF plan must be the one
    initial (lang, source) aggregation: the cell frame has two
    consumers (the totals aggregate and the iteration chain), and both
    must read the PERSISTED cells (InMemoryTableScan), not re-derive
    them from the corpus scan — without the persist this plan read
    documents twice (found by this test's first version)."""
    from project_bigdata_recsys_spark.functions.curation import (
        ipf_weight_calibration,
    )

    plan = (
        ipf_weight_calibration(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
