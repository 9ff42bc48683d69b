"""Round-10 regression pins: sf_dir threaded through EVERY sum_fixed call
site (VERDICT r9 task #2 — the last latent-wrong-answer mechanism), with
the two-dirs-one-session scenario proven end-to-end through a real query
builder, not just the wide_sums() unit surface that test_round8 pins."""

from __future__ import annotations

import ast
import glob
import os

import pytest

from tests.conftest import SF_SMALL

PKG = os.path.join(os.path.dirname(__file__), "..", "project_bigdata_recsys_spark")


# ---------------------------------------------------------------------------
# source-level guard: no sum_fixed call may rely on session-global inference
# ---------------------------------------------------------------------------


def test_every_sum_fixed_call_site_passes_sf_dir():
    """Session-global accumulator inference picks the wrong width when one
    session touches two data dirs of different scales; explicit sf_dir at
    every call site is the fix, and this AST sweep keeps it fixed."""
    offenders = []
    for path in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = (
                fn.id
                if isinstance(fn, ast.Name)
                else (fn.attr if isinstance(fn, ast.Attribute) else None)
            )
            if name != "sum_fixed":
                continue
            explicit = any(kw.arg == "sf_dir" for kw in node.keywords) or (
                len(node.args) > 1
            )
            if not explicit:
                offenders.append(f"{os.path.relpath(path, PKG)}:{node.lineno}")
    assert offenders == [], (
        "sum_fixed call sites relying on session-global width inference "
        f"(pass sf_dir= explicitly): {offenders}"
    )


# ---------------------------------------------------------------------------
# end-to-end: a polluted session must not change a small-dir query's plan
# ---------------------------------------------------------------------------


def _polluted_session(fp):
    """Simulate the hazard: the session has already touched a hint-less
    production corpus, so SESSION-scope inference says widen."""
    fp.note_sf_dir("/data/prod_corpus_2026")
    assert fp.wide_sums() is True  # session inference would widen


def test_small_dir_query_stays_long_mode_in_polluted_session(spark, monkeypatch):
    """pricing_summary over sf0.001 must keep the BIGINT accumulator even
    after the session saw an unhinted dir — the threaded sf_dir, not the
    session dict, decides.  Long vs wide is visible in the analyzed plan:
    only wide mode casts the accumulator to decimal(38,0)."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp
    from project_bigdata_recsys_spark.operators.analytics import pricing_summary

    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")
    fp.reset_sf_hints()
    try:
        _polluted_session(fp)
        plan = pricing_summary(spark, SF_SMALL)._jdf.queryExecution().analyzed().toString()
        assert "decimal(38,0)" not in plan, (
            "small-sf query widened to decimal(38,0) because session-global "
            "state leaked into the accumulator choice"
        )
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)


def test_unhinted_dir_query_widens_in_small_session(spark, monkeypatch, tmp_path):
    """The mirror image: a query against a hint-LESS dir must widen even
    when every other dir the session saw is small — safety over speed for
    unknown corpora, decided per-frame."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp
    from project_bigdata_recsys_spark.operators.analytics import pricing_summary

    corpus = tmp_path / "corpus"  # basename carries no sfN hint
    corpus.symlink_to(SF_SMALL)
    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")
    fp.reset_sf_hints()
    try:
        fp.note_sf_dir(SF_SMALL)
        assert fp.wide_sums() is False  # session inference says narrow
        plan = pricing_summary(spark, str(corpus))._jdf.queryExecution().analyzed().toString()
        assert "decimal(38,0)" in plan, (
            "unhinted-dir query kept the narrow BIGINT accumulator because "
            "session-global state leaked into the accumulator choice"
        )
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)


def test_two_dirs_one_session_values_parity(spark, monkeypatch):
    """Both widths must agree on VALUES at test scale: the same query run
    in a clean session and in a polluted one (where the unhinted dir
    would have flipped a session-scoped decision) returns identical rows."""
    from project_bigdata_recsys_spark.functions import fixedpoint as fp
    from project_bigdata_recsys_spark.operators.analytics import pricing_summary
    from project_bigdata_recsys_spark.operators.relational import user_activity

    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "auto")

    def run():
        a = sorted(map(tuple, pricing_summary(spark, SF_SMALL).collect()))
        b = sorted(map(tuple, user_activity(spark, SF_SMALL).collect()))
        return a, b

    fp.reset_sf_hints()
    try:
        fp.note_sf_dir(SF_SMALL)
        clean = run()
        _polluted_session(fp)
        assert run() == clean
    finally:
        fp.reset_sf_hints()
        fp.note_sf_dir(SF_SMALL)


# ---------------------------------------------------------------------------
# round-10 stretch operators: semantic invariants beyond oracle parity
# ---------------------------------------------------------------------------


def test_dedup_manifest_diff_invariants(spark):
    """Keeper statuses partition the keeper set; arrival fate sums; the
    planted-duplicate corpus guarantees every class is non-vacuous."""
    from project_bigdata_recsys_spark.functions.dedup import dedup_manifest_diff

    rows = dedup_manifest_diff(spark, SF_SMALL).collect()
    assert rows, "empty manifest diff"
    for r in rows:
        assert r.n_keepers == r.n_retained + r.n_displaced + r.n_new_content
        assert r.n_arrivals_deduped == r.n_arrivals - r.n_arrivals_kept
        assert 0 <= r.n_arrivals_kept <= r.n_arrivals
    tot = {
        c: sum(r[c] for r in rows)
        for c in ("n_displaced", "n_new_content", "n_arrivals_deduped")
    }
    assert all(v > 0 for v in tot.values()), f"vacuous class: {tot}"


def test_hard_negatives_are_cross_label_and_exactly_k(spark):
    """Every mined negative carries a different label than its anchor,
    each anchor yields exactly k ranked rows, and similarity is
    non-increasing in rank (the 'hard' ordering)."""
    from project_bigdata_recsys_spark.functions.similarity import (
        hard_negative_mining,
    )

    out = hard_negative_mining(spark, SF_SMALL, n_queries=4, k=5).collect()
    by_q = {}
    for r in out:
        assert r.neg_label != r.anchor_label
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for rows in by_q.values():
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)


@pytest.mark.parametrize(
    "rnd,stop",
    [
        ("12", r"\(r13 continues"),
        ("13", r"\(recomputed"),
        ("14", r"\(r15 onward"),
        ("15", r"\(r16 block"),
        ("16", r"\(r17 block"),
        ("17", r"\(r18 onward"),
    ],
)
def test_write_ahead_schedule_names_are_registered(rnd, stop):
    """The write-ahead rotations (now in plans/schedule.py, r13 verdict
    task 3) are only worth their session-loss insurance if every name in
    them resolves; a typo would surface as a driver KeyError one round
    later.  Name-list lines are the indented ones — prose in the
    schedule docstring is flush-left."""
    import re

    from project_bigdata_recsys_spark.plans.queries import QUERIES

    src = open(
        os.path.join(PKG, "plans", "schedule.py"), encoding="utf-8"
    ).read()
    block = re.search(
        rf"Round-{rnd} rotation schedule.*?{stop}", src, re.S
    ).group(0)
    names = []
    for line in block.splitlines():
        if line.startswith("    ") and line.strip():
            names += [x.strip() for x in line.split(",") if x.strip()]
    assert len(names) == 50 and len(set(names)) == 50, len(names)
    missing = [n for n in names if n not in QUERIES]
    assert missing == [], f"r{rnd} schedule names not in QUERIES: {missing}"


def test_parquet_memos_revalidate_after_purge(spark):
    """The r10 parquet-backed shared memos (minhash signatures,
    co-occurrence edges, oriented edges) must rebuild when their scratch
    path vanishes mid-process — the shared_components revalidation
    contract — and the rebuilt frame must be row-identical."""
    import shutil

    from project_bigdata_recsys_spark.functions import dedup, graph

    sig1 = sorted(
        map(tuple, dedup.shared_minhash_signatures(spark, SF_SMALL).collect())
    )
    key = next(iter(dedup._MINHASH_SIGS))
    shutil.rmtree(os.path.dirname(dedup._MINHASH_SIGS[key]))
    sig2 = sorted(
        map(tuple, dedup.shared_minhash_signatures(spark, SF_SMALL).collect())
    )
    assert sig1 == sig2

    e1 = sorted(
        map(tuple, graph.shared_cooccurrence_edges(spark, SF_SMALL).collect())
    )
    gkey = next(iter(graph._COOC_EDGES))
    shutil.rmtree(os.path.dirname(graph._COOC_EDGES[gkey]))
    e2 = sorted(
        map(tuple, graph.shared_cooccurrence_edges(spark, SF_SMALL).collect())
    )
    assert e1 == e2
