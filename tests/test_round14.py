"""Round-14 first-wave pins: iterated BPE training, the incremental
entity-resolution fold, and MOR join-view time travel.

- bpe_train_merges: the learned merge table must equal a pure-Python
  reference BPE trainer (Sennrich-style greedy scan) run on the same
  normalized vocabulary — the plan's replace()-based merge application
  is the optimized form; the Python scan is the spec;
- stream_golden_record: the ledger fold's fused records must equal the
  batch golden_record_fusion rows exactly (fold ≡ batch);
- join_view_time_travel: the as-of-1 profile must equal the HEAD
  profile of the single-epoch fixture (join_view_mor), and the HEAD
  resolve of the two-epoch fixture must DIFFER (epoch 2 visible) — a
  time-travel read that never excludes anything would pass the shared
  oracle trivially.
"""

from __future__ import annotations

import re
from collections import Counter

from tests.conftest import SF_SMALL


def _python_bpe(words: dict[str, int], n_merges: int) -> list[tuple]:
    """Reference BPE trainer: greedy left-to-right merge scan over
    symbol tuples, frequency-weighted pair counts, (count DESC, a, b)
    tie-break — the spec bpe_train_merges' replace() plan must match."""
    segs = {w: tuple(w) for w in words}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, freq in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, a, b, n))
        merged = a + b
        for w, s in segs.items():
            if a not in s:
                continue
            ns = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            segs[w] = tuple(ns)
    return out


def test_bpe_train_merges_matches_python_trainer(spark):
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.text import bpe_train_merges

    got = [
        (r.merge_rank, r.sym_a, r.sym_b, r.n_pairs)
        for r in bpe_train_merges(spark, SF_SMALL, n_merges=6).collect()
    ]
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    words: Counter = Counter()
    for row in docs:
        for w in row.text.split(" "):
            if re.fullmatch(r"[a-z]{2,}", w):
                words[w] += 1
    want = _python_bpe(dict(words), 6)
    assert got == want
    # merges actually compose: later ranks may reference merged symbols
    assert len(got) == 6 and got[0][3] >= got[-1][3]


def test_stream_golden_record_equals_batch(spark):
    from project_bigdata_recsys_spark.functions.dedup import (
        golden_record_fusion,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_golden_record,
    )

    batch = [tuple(r) for r in golden_record_fusion(spark, SF_SMALL).collect()]
    fold = [tuple(r) for r in stream_golden_record(spark, SF_SMALL).collect()]
    assert fold == batch
    assert batch, "fixture must fuse at least one component"


def test_join_view_time_travel_excludes_epoch2(spark):
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.operators.viewmaint import (
        dim_delta_epoch2,
        fact_delta_epoch2,
        join_view_mor,
        profile_join_view,
        resolve_join_view,
        setup_join_view,
    )

    head_single = [tuple(r) for r in join_view_mor(spark, SF_SMALL).collect()]

    dirs = setup_join_view(spark, SF_SMALL)
    fact_delta_epoch2(spark, SF_SMALL).write.mode("append").parquet(
        dirs["fact_ledger"]
    )
    dim_delta_epoch2(spark, SF_SMALL).write.mode("append").parquet(
        dirs["dim_ledger"]
    )
    customer = load_table(spark, SF_SMALL, "customer")

    asof1 = profile_join_view(
        resolve_join_view(
            spark,
            dirs["base"],
            dirs["fact_ledger"],
            dirs["dim_ledger"],
            customer,
            as_of_seq=1,
        ),
        SF_SMALL,
    )
    assert [tuple(r) for r in asof1.collect()] == head_single

    head_two = profile_join_view(
        resolve_join_view(
            spark,
            dirs["base"],
            dirs["fact_ledger"],
            dirs["dim_ledger"],
            customer,
        ),
        SF_SMALL,
    ).collect()
    segments = {r.segment for r in head_two}
    assert "MOVED2" in segments, "HEAD must see the epoch-2 dim move"
    assert [tuple(r) for r in head_two] != head_single


def test_isotonic_pav_matches_sequential_pav(spark):
    from project_bigdata_recsys_spark.ml.classifier import (
        isotonic_calibration_pav,
        propensity_scored,
    )

    got = [
        (r.bin, r.n_users, r.isotonic_micro)
        for r in isotonic_calibration_pav(spark, SF_SMALL).collect()
    ]
    rows = propensity_scored(spark, SF_SMALL).collect()
    agg: dict = {}
    for r in rows:
        n, s = agg.get(r.bin, (0, 0))
        agg[r.bin] = (n + 1, s + r.y)
    bins = sorted(agg)
    # classic sequential pool-adjacent-violators on (n, sum_y) blocks,
    # then freeze each pooled average to micro exactly as the operator
    blocks = [[b, agg[b][0], agg[b][1]] for b in bins]
    i = 0
    while i < len(blocks) - 1:
        # violation when avg(i) > avg(i+1): compare as cross products
        if blocks[i][2] * blocks[i + 1][1] > blocks[i + 1][2] * blocks[i][1]:
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    # assign each original bin the micro average of its pooled block
    fit: dict = {}
    k = 0
    starts = [blk[0] for blk in blocks]
    for b in bins:
        while k + 1 < len(blocks) and starts[k + 1] <= b:
            k += 1
        fit[b] = blocks[k][2] * 1000000 // blocks[k][1]
    want = [(b, agg[b][0], fit[b]) for b in bins]
    assert got == want
    # monotone non-decreasing by construction
    fits = [f for _, _, f in got]
    assert fits == sorted(fits)


def test_pr_auc_matches_brute_force(spark):
    from collections import defaultdict

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.ml.classifier import pr_auc_by_group

    got = {
        r.grp: (r.n_pos, r.n_neg, r.pr_auc_micro)
        for r in pr_auc_by_group(spark, SF_SMALL).collect()
    }
    orders = load_table(spark, SF_SMALL, "orders").collect()
    by_grp: dict = defaultdict(list)
    for o in orders:
        by_grp[o.o_orderpriority].append(
            (int(round(o.o_totalprice * 100)), 1 if o.o_orderstatus == "F" else 0)
        )
    for grp, rows in by_grp.items():
        # threshold sweep over distinct cents descending
        levels: dict = defaultdict(lambda: [0, 0])
        for cents, pos in rows:
            levels[cents][0] += 1
            levels[cents][1] += pos
        c = ctp = 0
        prev_prec = 1000000
        area2 = 0
        for cents in sorted(levels, reverse=True):
            t, tp = levels[cents]
            c += t
            ctp += tp
            prec = ctp * 1000000 // c
            area2 += tp * (prec + prev_prec)
            prev_prec = prec
        n_pos = sum(p for _, p in rows)
        want = (n_pos, len(rows) - n_pos, area2 // (2 * n_pos))
        assert got[grp] == want, grp


def test_brier_decomposition_consistent_with_bins(spark):
    from project_bigdata_recsys_spark.ml.classifier import (
        brier_decomposition,
        propensity_scored,
    )

    r = brier_decomposition(spark, SF_SMALL).collect()[0]
    rows = propensity_scored(spark, SF_SMALL).collect()
    n = len(rows)
    sy = sum(x.y for x in rows)
    assert (r.n_users, r.n_pos) == (n, sy)
    # uncertainty is the exact base-rate variance in micro
    assert r.uncertainty_micro == sy * (n - sy) * 1000000 // (n * n)
    # python recompute of the binned reliability / resolution
    agg: dict = {}
    for x in rows:
        nb, sp, syb = agg.get(x.bin, (0, 0, 0))
        agg[x.bin] = (nb + 1, sp + x.p_micro, syb + x.y)
    rel_num = sum(
        (sp - syb * 1000000) ** 2 // nb for nb, sp, syb in agg.values()
    )
    res_num = sum(
        (syb * n - sy * nb) ** 2 * 1000000 // nb
        for nb, sp, syb in agg.values()
    )
    assert r.reliability_micro == rel_num // (n * 1000000)
    assert r.resolution_micro == res_num // (n * n * n)
    # decomposition sanity: REL - RES + UNC approximates the raw Brier
    # within the within-bin-variance budget (binning's price)
    approx = r.reliability_micro - r.resolution_micro + r.uncertainty_micro
    assert abs(approx - r.brier_micro) <= 110000
