"""Curation-operator invariants (functions/curation.py) — oracle parity
runs separately in test_oracle_parity; these pin the semantic contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.curation import (
    corpus_mixture,
    pack_sequences,
    tfidf_top_terms,
)
from tests.conftest import SF_SMALL


def test_pack_sequences_covers_corpus(spark):
    """Every document lands in exactly one sequence; token mass is
    conserved; sequence numbers are dense from 0 per lang."""
    docs = load_table(spark, SF_SMALL, "documents")
    packed = pack_sequences(spark, SF_SMALL, budget=256)
    rows = packed.collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tokens = (
        docs.select(
            F.size(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
            ).alias("n")
        )
        .agg(F.sum("n"))
        .head()[0]
    )
    assert sum(r.n_tokens for r in rows) == total_tokens
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.seq_no)
        assert 0 < r.fill_ratio <= 1.0
    for seqs in by_lang.values():
        assert sorted(seqs) == list(range(len(seqs)))  # dense from 0


def test_corpus_mixture_temperature_rebalances(spark):
    """alpha<1 must upweight small domains: every lang's mixture share
    sits between uniform and proportional; quotas are met exactly when
    the lang has enough documents."""
    mix = corpus_mixture(spark, SF_SMALL, alpha=0.5, target_docs=100).collect()
    n_total = sum(r.n_docs for r in mix)
    n_langs = len(mix)
    assert abs(sum(r.mix_weight for r in mix) - 1.0) < 1e-4
    for r in mix:
        prop = r.n_docs / n_total
        lo, hi = sorted((prop, 1.0 / n_langs))
        assert lo - 1e-6 <= r.mix_weight <= hi + 1e-6, (r.lang, r.mix_weight)
        assert r.n_sampled <= r.n_docs
        assert r.n_sampled > 0 and r.sampled_tokens > 0


def test_tfidf_ranks_and_monotonicity(spark):
    """Per-doc ranks are 1..k with scores non-increasing; rarer terms of
    equal tf never score below more common ones."""
    out = tfidf_top_terms(spark, SF_SMALL, k=3).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for rows in per_doc.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.tfidf for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_curation_degenerate_inputs(spark):
    """Empty and extreme parameters must degrade gracefully: empty edge
    set → empty components; tiny budget → token mass still conserved;
    oversized mixture target → quotas clamp at corpus size per lang;
    whitespace-only text → zero chunks."""
    from project_bigdata_recsys_spark.functions.dedup import connected_components
    from project_bigdata_recsys_spark.functions.text import chunk_rows

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0

    tiny = pack_sequences(spark, SF_SMALL, budget=1).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    total_tokens = (
        docs.select(
            F.size(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
            ).alias("n")
        )
        .agg(F.sum("n"))
        .head()[0]
    )
    assert sum(r.n_tokens for r in tiny) == total_tokens

    big = corpus_mixture(spark, SF_SMALL, alpha=0.5, target_docs=10_000_000).collect()
    for r in big:
        assert r.n_sampled == r.n_docs  # quota clamps at corpus size

    blank = spark.createDataFrame(
        [(1, "   "), (2, ""), (3, "one two")], "doc_id long, text string"
    )
    rows = chunk_rows(blank, chunk_tokens=5, stride=4).collect()
    assert {r.doc_id for r in rows} == {3}
