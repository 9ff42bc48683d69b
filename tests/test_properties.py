"""Property-based tests (hypothesis) — randomized semantic checks of the
custom operators against brute-force reference implementations.

SURVEY.md §5.1 notes the reference's only randomized testing is its
synthetic-data scripts; here randomized inputs drive real assertions.
Hypothesis generates adversarial small cases (duplicate timestamps, empty
sides, single-key data) that fixed fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_bigdata_recsys_spark.operators.asof import asof_join

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=0,
    max_size=25,
)

_key = lambda t: tuple(-1 if x is None else x for x in t)  # noqa: E731


def brute_force_asof(left, right):
    """Per left row: payload of the latest right row with the same key and
    right_ts <= left_ts (right side pre-deduped per (key, ts))."""
    out = []
    for k, lts, lv in left:
        cand = [(rts, rv) for rk, rts, rv in right if rk == k and rts <= lts]
        out.append((k, lts, lv, max(cand)[1] if cand else None))
    return sorted(out, key=_key)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_asof_join_matches_brute_force(spark, left, right):
    # dedupe (key, ts) on the right so "the latest right row at a given
    # instant" is unique and both implementations must agree exactly
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(left or [(0, 0, 0)], "k long, ts long, v long")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, ts long, rv long")
    if not right:
        rdf = rdf.limit(0)

    got = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts", right_payload=["rv"])
    got_rows = sorted(
        ((r.k, r.ts, r.v, r.asof_rv) for r in got.collect()), key=_key
    )
    assert got_rows == brute_force_asof(left, right)


sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=300),  # minute offset
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


def brute_force_sessions(events, gap_minutes=30):
    """Per user: sort timestamps, split where the gap reaches the
    threshold (half-open [start, last+gap) — Spark session_window
    semantics), return per-session event counts."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, m in events:
        by_user[u].append(m)
    out = []
    for u, ms in by_user.items():
        ms.sort()
        runs, cur = [], [ms[0]]
        for m in ms[1:]:
            if m - cur[-1] >= gap_minutes:
                runs.append(cur)
                cur = [m]
            else:
                cur.append(m)
        runs.append(cur)
        out.extend((u, i + 1, len(r)) for i, r in enumerate(runs))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=sess_events)
def test_sessionize_matches_brute_force(spark, events):
    """Gaps-and-islands sessionization (operators/windows.py::sessionize
    logic) agrees with a per-user brute-force split on random event sets."""
    from datetime import datetime, timedelta

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1)
    rows = [
        (u, i, base + timedelta(minutes=m), 1.0)
        for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    # same computation as windows.sessionize, on arbitrary input
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    flagged = df.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") >= F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    got = sorted(
        (r.user_id, r.session_id, r.n)
        for r in sessioned.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == brute_force_sessions(events)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_asof_join_exclusive_matches_brute_force(spark, left, right):
    """inclusive=False: only strictly-earlier right rows match."""
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(left or [(0, 0, 0)], "k long, ts long, v long")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, ts long, rv long")
    if not right:
        rdf = rdf.limit(0)

    got = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        right_payload=["rv"], inclusive=False,
    )
    got_rows = sorted(((r.k, r.ts, r.v, r.asof_rv) for r in got.collect()), key=_key)
    want = []
    for k, lts, lv in left:
        cand = [(rts, rv) for rk, rts, rv in right if rk == k and rts < lts]
        want.append((k, lts, lv, max(cand)[1] if cand else None))
    assert got_rows == sorted(want, key=_key)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation (+pointer halving) must agree
    with a sequential union-find on arbitrary small graphs."""
    from project_bigdata_recsys_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    want = union_find_components(edges)
    # union-find roots are component minima by construction (min-merge)
    assert got == want


# ---------------------------------------------------------------------------
# Sequence packing (curation.pack_sequences_for) vs a brute-force packer
# ---------------------------------------------------------------------------

_pack_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),            # doc_id
        st.sampled_from(["en", "de", "fr"]),               # lang
        st.lists(                                          # tokens
            st.sampled_from(["a", "bb", "ccc"]), min_size=0, max_size=9
        ),
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _brute_force_pack(rows, budget):
    """Reference packer: per lang, stream docs in doc_id order, a doc
    belongs to the sequence where it starts."""
    out = {}
    by_lang = {}
    for doc_id, lang, toks in rows:
        by_lang.setdefault(lang, []).append((doc_id, len(toks)))
    for lang, docs in by_lang.items():
        acc = 0
        for doc_id, n in sorted(docs):
            seq_no = acc // budget
            key = (lang, seq_no)
            nd, nt = out.get(key, (0, 0))
            out[key] = (nd + 1, nt + n)
            acc += n
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_pack_docs, budget=st.sampled_from([1, 3, 7]))
def test_pack_sequences_matches_brute_force(spark, rows, budget):
    from project_bigdata_recsys_spark.functions.curation import pack_sequences_for

    data = [(d, lang, " ".join(toks)) for d, lang, toks in rows]
    df = spark.createDataFrame(
        data or [(0, "en", "x")], "doc_id long, lang string, text string"
    )
    if not data:
        df = df.limit(0)

    got = {
        (r.lang, r.seq_no): (r.n_docs, r.n_tokens)
        for r in pack_sequences_for(df, budget=budget).collect()
    }
    want = _brute_force_pack(rows, budget)
    assert got == want

    # sharded form: same totals, and per-(lang, shard) streams also obey
    # the brute-force packing on their own sub-streams
    sharded = pack_sequences_for(df, budget=budget, n_shards=3).collect()
    assert sum(r.n_tokens for r in sharded) == sum(v[1] for v in want.values())
    assert sum(r.n_docs for r in sharded) == sum(v[0] for v in want.values())


_span_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # doc_id (unique-ified below)
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20
        ),
    ),
    min_size=1,
    max_size=8,
)


def _brute_force_span_dedup(docs, width):
    """Reference implementation: segment, global keep-first by
    (doc_id, seg_no), reassemble."""
    segs = []  # (doc_id, seg_no, span)
    for doc_id, toks in docs:
        for s in range(0, max(len(toks), 1), width):
            segs.append((doc_id, s // width, " ".join(toks[s : s + width])))
    first = {}
    for doc_id, seg_no, span in sorted(segs):
        first.setdefault(span, (doc_id, seg_no))
    out = {}
    for doc_id, toks in docs:
        kept, dropped, total = [], 0, 0
        for s in range(0, max(len(toks), 1), width):
            span = " ".join(toks[s : s + width])
            total += 1
            if first[span] == (doc_id, s // width):
                kept.append(span)
            elif len([1 for d2, s2, sp2 in segs if sp2 == span]) == 1:
                kept.append(span)  # unique span (can't happen: unique => first)
            else:
                dropped += 1
        out[doc_id] = (total, dropped, " ".join(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_span_docs, width=st.sampled_from([2, 3, 8]))
def test_remove_duplicate_spans_matches_brute_force(spark, docs, width):
    """Randomized spans over a tiny alphabet force heavy duplication —
    keep-first, drop counts, and the rebuilt text must match the
    reference implementation exactly."""
    from project_bigdata_recsys_spark.functions.spans import (
        remove_duplicate_spans,
    )

    # unique-ify doc ids, keep hypothesis's ordering adversarial
    uniq = {}
    for doc_id, toks in docs:
        while doc_id in uniq:
            doc_id += 10
        uniq[doc_id] = toks
    data = [(d, " ".join(t)) for d, t in uniq.items()]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_spans_dropped, r.text_kept)
        for r in remove_duplicate_spans(df, width=width).collect()
    }
    want = _brute_force_span_dedup(list(uniq.items()), width)
    assert got == want


_pr_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=12,
)


def _brute_force_pagerank(edge_list, damping=0.85, iters=3):
    """Straight-line reference: symmetric unit edges collapsed to
    weights, same fixed-iteration recurrence as functions.graph.pagerank."""
    from collections import defaultdict

    w = defaultdict(float)
    for a, b in edge_list:
        w[(a, b)] += 1.0
        w[(b, a)] += 1.0
    nodes = sorted({x for e in w for x in e})
    n = len(nodes)
    out_w = defaultdict(float)
    for (s, _d), wt in w.items():
        out_w[s] += wt
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inflow = defaultdict(float)
        for (s, d), wt in w.items():
            inflow[d] += rank[s] * wt / out_w[s]
        rank = {v: (1 - damping) / n + damping * inflow[v] for v in nodes}
    return rank


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_list=_pr_edges)
def test_pagerank_matches_brute_force(spark, edge_list):
    from collections import defaultdict

    from project_bigdata_recsys_spark.caching import release_tracked
    from project_bigdata_recsys_spark.functions.graph import pagerank

    w = defaultdict(float)
    for a, b in edge_list:
        w[(a, b)] += 1.0
        w[(b, a)] += 1.0
    edges = spark.createDataFrame(
        [(s, d, wt) for (s, d), wt in w.items()], "src long, dst long, w double"
    )
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    release_tracked()
    want = _brute_force_pagerank(edge_list)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


_diff_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # id
        st.integers(min_value=0, max_value=3),   # payload
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_diff_rows, new=_diff_rows)
def test_table_diff_matches_brute_force(spark, old, new):
    from project_bigdata_recsys_spark.operators.snapshot import table_diff

    old_d = {k: v for k, v in old}   # last write wins, like dropDuplicates
    new_d = {k: v for k, v in new}
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            want[k] = "added"
        elif k not in new_d:
            want[k] = "removed"
        elif old_d[k] != new_d[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    o = spark.createDataFrame(
        list(old_d.items()) or [(99, 0)], "id long, v long"
    )
    n = spark.createDataFrame(
        list(new_d.items()) or [(99, 0)], "id long, v long"
    )
    if not old_d:
        o = o.limit(0)
    if not new_d:
        n = n.limit(0)
    got = {r.id: r.change_type for r in table_diff(o, n, ["id"], ["v"]).collect()}
    assert got == want


_gq_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_gq_rows, q=st.sampled_from([0.1, 0.25, 0.5, 0.9]))
def test_group_quantile_threshold_matches_brute_force(spark, rows, q):
    """Histogram-cumsum threshold == min{score : #(<=score) >= q*n} per
    group, on random ties-heavy distributions."""
    from project_bigdata_recsys_spark.functions.text import (
        group_quantile_threshold,
    )

    df = spark.createDataFrame(
        [(g, float(s)) for g, s in rows], "g string, score double"
    )
    got = {
        r.g: (r.threshold, r.n_total)
        for r in group_quantile_threshold(df, "g", "score", q).collect()
    }
    want = {}
    from collections import defaultdict

    groups = defaultdict(list)
    for g, s in rows:
        groups[g].append(float(s))
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        thr = next(v for v in vals if sum(1 for x in vals if x <= v) >= q * n)
        want[g] = (thr, n)
    assert got == want


_cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # key
        st.integers(min_value=0, max_value=9),     # value
        st.sampled_from(["I", "U", "D"]),
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_cdc_ops)
def test_cdc_current_view_matches_replay(spark, ops):
    """Latest-seq-wins CDC collapse == sequential replay of the log."""
    from project_bigdata_recsys_spark.operators.snapshot import cdc_current_view

    changes = spark.createDataFrame(
        [(k, v, i, op) for i, (k, v, op) in enumerate(ops)],
        "id long, v long, seq int, op string",
    )
    state: dict[int, int] = {}
    for k, v, op in ops:  # replay in seq order (enumeration order)
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    got = {r.id: r.v for r in cdc_current_view(changes, ["id"], "seq", "op").collect()}
    assert got == state


# --- boilerplate span kernel vs brute force --------------------------------

_doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # tiny alphabet forces collisions
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=20,
)


def _brute_spans(texts, k, tail):
    from collections import Counter

    spans = []
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        span = toks[-k:] if tail else toks[:k]
        spans.append(" ".join(span))
    return {s: c for s, c in Counter(spans).items() if c >= 2}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_doc_texts, tail=st.booleans())
def test_boilerplate_kernel_matches_brute_force(spark, texts, tail):
    """The prefix/suffix span kernel reports exactly the spans a Python
    Counter finds repeated, with identical counts — including empty-token
    runs, all-empty documents and spans shorter than k."""
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        boilerplate_profile_for,
    )

    docs = spark.createDataFrame(
        [(t, f"s{i % 3}") for i, t in enumerate(texts)], "text string, source string"
    )
    out = boilerplate_profile_for(docs, k=3, min_docs=2, tail=tail)
    col = "suffix" if tail else "prefix"
    got = {r[col]: r.n_docs for r in out.collect()}
    assert got == _brute_spans(texts, 3, tail)
