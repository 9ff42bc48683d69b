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
    big_sharded = corpus_mixture(
        spark, SF_SMALL, alpha=0.5, target_docs=10_000_000, n_shards=4
    ).collect()
    for r in big_sharded:
        assert r.n_sampled == r.n_docs  # every shard clamps at its size

    blank = spark.createDataFrame(
        [(1, "   "), (2, ""), (3, "one two")], "doc_id long, text string"
    )
    rows = chunk_rows(blank, chunk_tokens=5, stride=4).collect()
    assert {r.doc_id for r in rows} == {3}


# ---------------------------------------------------------------------------
# Sharded (production-scale) curation paths: n_shards > 1 splits each
# lang's window into deterministic md5 sub-streams.  These assert the
# sharded/unsharded equivalence contracts the docstrings promise.
# ---------------------------------------------------------------------------


def test_shard_key_rejects_nonpositive(spark):
    import pytest

    from project_bigdata_recsys_spark.functions.curation import shard_key

    for bad in (0, -1):
        with pytest.raises(ValueError):
            shard_key(F.lit(1), bad)


def test_pack_sequences_sharded_conserves_mass(spark):
    """Sharded vs unsharded packing: total doc count and token mass are
    conserved, per-shard fill ratios obey the same <=1.0 bound, seq_nos
    are dense from 0 per (lang, shard), and the window in the physical
    plan is keyed by (lang, shard) — never a lang-only fat partition."""
    flat = pack_sequences(spark, SF_SMALL, budget=256).collect()
    sharded_df = pack_sequences(spark, SF_SMALL, budget=256, n_shards=4)
    sharded = sharded_df.collect()

    assert sum(r.n_docs for r in sharded) == sum(r.n_docs for r in flat)
    assert sum(r.n_tokens for r in sharded) == sum(r.n_tokens for r in flat)
    by_key: dict[tuple, list[int]] = {}
    for r in sharded:
        assert 0 < r.fill_ratio <= 1.0
        assert 0 <= r.shard < 4
        by_key.setdefault((r.lang, r.shard), []).append(r.seq_no)
    for seqs in by_key.values():
        assert sorted(seqs) == list(range(len(seqs)))  # dense from 0
    assert len(by_key) > len({k[0] for k in by_key})  # really fanned out

    plan = sharded_df._jdf.queryExecution().executedPlan().toString()
    # the running-sum window must be partitioned by lang AND shard
    import re

    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan.lower())
    assert win_specs, plan
    assert any("shard" in s and "lang" in s for s in win_specs), win_specs


def test_corpus_mixture_sharded_quota_conserved(spark):
    """Sharded mixture: weights/quotas are shard-invariant; per-lang
    n_sampled matches the unsharded draw exactly whenever every shard
    holds at least its quota share (true at this SF/target)."""
    flat = {r.lang: r for r in corpus_mixture(spark, SF_SMALL, alpha=0.5, target_docs=100).collect()}
    sharded = {
        r.lang: r
        for r in corpus_mixture(
            spark, SF_SMALL, alpha=0.5, target_docs=100, n_shards=4
        ).collect()
    }
    assert set(flat) == set(sharded)
    for lang, r in sharded.items():
        assert r.n_docs == flat[lang].n_docs
        assert r.mix_weight == flat[lang].mix_weight
        assert r.n_sampled == flat[lang].n_sampled
        assert r.sampled_tokens > 0


def test_curation_funnel_sharded_stage_counts_invariant(spark):
    """Sharding the pack stage must not change any stage count except
    n_sequences, which can only grow (each shard rounds up its own last
    sequence) and is bounded by unsharded + #langs*(n_shards-1)."""
    from project_bigdata_recsys_spark.functions.curation import curation_funnel

    flat = curation_funnel(spark, SF_SMALL).head()
    sharded = curation_funnel(spark, SF_SMALL, n_shards=4).head()
    for col in ("n_raw", "n_unique", "n_kept", "kept_tokens", "n_chunks", "chunk_tokens"):
        assert getattr(sharded, col) == getattr(flat, col), col
    n_langs = 5
    assert flat.n_sequences <= sharded.n_sequences <= flat.n_sequences + n_langs * 3


def test_cluster_capped_sample_invariants(spark):
    """Cap semantics: kept + dropped = total per lang; a cap of 10^6
    keeps everything; a cap of 1 keeps exactly one doc per cluster
    (kept count equals the number of distinct clusters touched)."""
    from project_bigdata_recsys_spark.functions.curation import cluster_capped_sample
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )

    out = cluster_capped_sample(spark, SF_SMALL, max_per_cluster=2).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    assert sum(r.n_docs for r in out) == docs.count()
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_kept > 0

    keep_all = cluster_capped_sample(spark, SF_SMALL, max_per_cluster=1_000_000).collect()
    assert all(r.n_dropped == 0 for r in keep_all)

    one = cluster_capped_sample(spark, SF_SMALL, max_per_cluster=1).collect()
    comps = connected_components(simhash_near_pairs_for(docs, sort=False))
    n_clustered_docs = comps.count()
    n_clusters = comps.select("cluster_id").distinct().count()
    n_singletons = docs.count() - n_clustered_docs
    assert sum(r.n_kept for r in one) == n_clusters + n_singletons


def test_corpus_mixture_tokens_respects_budget(spark):
    """Token-budget mixing: every lang's sampled token mass reaches its
    quota but overshoots by at most ONE document (the crossing doc), and
    sharded quota-splitting conserves the per-lang token quota."""
    from project_bigdata_recsys_spark.functions.curation import (
        corpus_mixture_tokens,
    )

    rows = corpus_mixture_tokens(
        spark, SF_SMALL, alpha=0.5, target_tokens=5_000
    ).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        if r.n_sampled < r.n_docs:  # quota binding for this lang
            assert r.sampled_tokens >= r.token_quota
            # overshoot bounded by the largest admitted doc: remove the
            # crossing doc and we must be under quota
            per_doc_max = r.sampled_tokens / max(r.n_sampled, 1)
            assert r.sampled_tokens - r.token_quota <= max(
                per_doc_max * r.n_sampled, 1
            )
        else:  # lang exhausted below quota: everything admitted
            assert r.sampled_tokens == r.lang_tokens

    sharded = corpus_mixture_tokens(
        spark, SF_SMALL, alpha=0.5, target_tokens=5_000, n_shards=4
    ).collect()
    for u, s in zip(rows, sharded):
        assert u.lang == s.lang
        assert u.token_quota == s.token_quota  # quota conserved across shards
        # sharded draw differs but stays within quota + n_shards crossing docs
        if s.n_sampled < s.n_docs:
            assert s.sampled_tokens >= s.token_quota - 4  # floor rounding slack
