"""Source-triage invariants (functions/sourcetriage.py) — oracle parity
runs separately in test_oracle_parity; these pin the semantic contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.curation import corpus_mixture
from project_bigdata_recsys_spark.functions.sourcetriage import (
    boilerplate_prefix_profile,
    cross_source_overlap,
    source_scorecard,
)
from tests.conftest import SF_SMALL


def test_source_scorecard_accounts_every_doc(spark):
    """One row per source; doc counts sum to corpus + planted set; every
    planted duplicate (and its original) is flagged as dup mass."""
    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()
    n_planted = docs.filter(F.col("doc_id") % 10 == 0).count()
    rows = source_scorecard(spark, SF_SMALL).collect()
    assert len(rows) == docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs + n_planted
    # each planted copy duplicates its original: >= 2*n_planted dup docs
    # (more only if the raw corpus had its own exact duplicates)
    assert sum(r.n_dup_docs for r in rows) >= 2 * n_planted
    for r in rows:
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.n_langs >= 1
        assert r.avg_tokens > 0


def test_cross_source_overlap_bounds(spark):
    """Pairs are canonically ordered, shared counts positive, jaccard in
    (0, 1], and n_shared never exceeds either side's shingle count."""
    rows = cross_source_overlap(spark, SF_SMALL).collect()
    assert rows, "sf0.001 corpus has cross-source shingle overlap"
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert r.n_shared >= 1
        assert 0.0 < r.jaccard <= 1.0
    # descending by shared count (ties broken by pair name)
    shared = [r.n_shared for r in rows]
    assert shared == sorted(shared, reverse=True)


def test_boilerplate_prefixes_are_real_repeats(spark):
    """Every reported prefix occurs in >= 2 documents and its recount
    from the raw table matches; n_sources <= n_docs."""
    out = boilerplate_prefix_profile(spark, SF_SMALL, k=8, min_docs=2)
    rows = out.collect()
    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    prefixes = docs.select(
        F.array_join(F.slice(toks, 1, 8), " ").alias("prefix"), "source"
    )
    recount = {
        r.prefix: (r.n, r.ns)
        for r in prefixes.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("source").alias("ns"),
        )
        .filter(F.col("n") >= 2)
        .collect()
    }
    assert {r.prefix for r in rows} == set(recount)
    for r in rows:
        n, ns = recount[r.prefix]
        assert (r.n_docs, r.n_sources) == (n, ns)
        assert 1 <= r.n_sources <= r.n_docs


def test_source_mixture_matches_lang_kernel_contract(spark):
    """corpus_mixture(by='source') obeys the same quota contract as the
    lang-keyed default: n_sampled == min(quota, n_docs) per source, and
    weights sum to ~1."""
    rows = corpus_mixture(spark, SF_SMALL, by="source").collect()
    assert rows[0].__fields__[0] == "source"
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    docs = load_table(spark, SF_SMALL, "documents")
    sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total_w = sum(sizes[r.source] ** 0.5 for r in rows)
    for r in rows:
        quota = round(200 * (sizes[r.source] ** 0.5) / total_w)
        assert r.n_sampled == min(quota, sizes[r.source])


def test_semantic_contamination_precision_exact(spark):
    """LSH-flagged contamination is a subset of the brute-force truth per
    label (precision exact — LSH only bounds which pairs are examined),
    and the eval split is fully accounted."""
    import math

    from project_bigdata_recsys_spark.functions.similarity import (
        semantic_contamination,
    )

    rows = semantic_contamination(spark, SF_SMALL).collect()
    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    vecs = {r.vec_id: (r.label, list(r.embedding)) for r in emb}
    train = [v for i, (_, v) in sorted(vecs.items()) if i < 250]
    brute: dict[int, int] = {}
    n_eval: dict[int, int] = {}
    for i, (lab, v) in vecs.items():
        if i < 250:
            continue
        n_eval[lab] = n_eval.get(lab, 0) + 1
        nv = math.sqrt(sum(x * x for x in v))
        hit = any(
            round(
                sum(a * b for a, b in zip(v, t))
                / (nv * math.sqrt(sum(x * x for x in t))),
                6,
            )
            >= 0.40
            for t in train
        )
        if hit:
            brute[lab] = brute.get(lab, 0) + 1
    assert sum(r.n_eval for r in rows) == len(vecs) - 250
    for r in rows:
        assert r.n_eval == n_eval[r.label]
        assert 0 <= r.n_contaminated <= brute.get(r.label, 0)
        assert abs(r.contamination_rate - r.n_contaminated / r.n_eval) < 1e-4


def test_unigram_logloss_matches_hand_computation(spark):
    """Per-doc mean -ln(p) recomputed in Python from the corpus unigram
    distribution matches the plan's output for every document."""
    import math

    from project_bigdata_recsys_spark.functions.text import (
        unigram_logloss_profile,
    )

    docs = load_table(spark, SF_SMALL, "documents").collect()
    counts: dict[str, int] = {}
    for d in docs:
        for t in d.text.split(" "):
            if t:
                counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    rows = unigram_logloss_profile(spark, SF_SMALL).collect()
    by_id = {d.doc_id: d for d in docs}
    assert len(rows) == len(docs)
    for r in rows:
        toks = [t for t in by_id[r.doc_id].text.split(" ") if t]
        assert r.n_tokens == len(toks)
        expect = sum(-math.log(counts[t] / total) for t in toks) / len(toks)
        assert abs(r.avg_logloss - round(expect, 4)) <= 1e-4


def test_length_bucketed_batches_accounting(spark):
    """Every doc lands in exactly one bucket; batches are full except the
    bucket's last; buckets are equi-depth; padding arithmetic closes."""
    import math

    from project_bigdata_recsys_spark.functions.curation import (
        length_bucketed_batches,
    )

    rows = length_bucketed_batches(spark, SF_SMALL, n_buckets=8, batch_size=16
    ).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 2  # equi-depth by construction
    for r in rows:
        assert r.n_batches == math.ceil(r.n_docs / 16)
        assert r.padded_tokens >= 0
        assert 0.0 <= r.pad_ratio < 1.0
        denom = r.token_mass + r.padded_tokens
        assert abs(r.pad_ratio - r.padded_tokens / denom) < 1e-4


def test_novelty_profile_bounds_and_split(spark):
    """Eval docs fully accounted (every eval doc with >=1 shingle gets a
    row), novelty is a valid fraction, and totals are consistent."""
    from pyspark.sql import functions as SF

    from project_bigdata_recsys_spark.functions.dedup import (
        novelty_profile,
        shingles,
    )

    rows = novelty_profile(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    with_grams = docs.filter(SF.col("doc_id") % 5 == 0).select(
        "lang",
        SF.size(
            SF.filter(shingles(SF.col("text"), 5), lambda g: SF.length(g) > 0)
        ).alias("ng"),
    ).filter(SF.col("ng") > 0)
    expect = {
        r.lang: r.n
        for r in with_grams.groupBy("lang").agg(SF.count(SF.lit(1)).alias("n")).collect()
    }
    assert {r.lang: r.n_docs for r in rows} == expect
    for r in rows:
        assert 0 <= r.total_novel <= r.total_grams
        assert 0.0 <= r.avg_novelty <= 1.0


def test_source_dup_attribution_reconciles_with_clusters(spark):
    """Per-source clustered-doc counts sum to the total near-dup cluster
    membership (the near_dup_clusters view of the same CC labeling), and
    cross counts are valid fractions."""
    from project_bigdata_recsys_spark.functions.dedup import near_dup_clusters
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        source_dup_attribution,
    )

    rows = source_dup_attribution(spark, SF_SMALL).collect()
    clusters = near_dup_clusters(spark, SF_SMALL).collect()
    assert sum(r.n_dup_docs for r in rows) == sum(c.cluster_size for c in clusters)
    for r in rows:
        assert 0 <= r.n_cross_docs <= r.n_dup_docs
        assert abs(r.cross_rate - r.n_cross_docs / r.n_dup_docs) < 1e-4


def test_boilerplate_suffix_profile_finds_planted_footers(spark):
    """The planted duplicate set guarantees one footer group per planted
    doc; every reported suffix is a real >=2 repeat in the planted
    corpus."""
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        boilerplate_suffix_profile,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    # recount DISTINCT planted suffixes, not planted docs: two planted
    # docs sharing a last-8-token suffix merge into one group, so a
    # group-count >= doc-count assertion could fail on a colliding corpus
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.array_join(
            F.slice(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0),
                F.greatest(
                    F.size(
                        F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
                    )
                    - 7,
                    F.lit(1),
                ),
                8,
            ),
            " ",
        ).alias("suffix")
    )
    n_planted_suffixes = planted.distinct().count()
    n_planted = planted.count()
    rows = boilerplate_suffix_profile(spark, SF_SMALL).collect()
    assert len(rows) >= n_planted_suffixes  # every planted suffix groups
    assert all(r.n_docs >= 2 for r in rows)
    # planted mass: original + copy of every planted doc lands in some
    # group, so total docs across groups covers 2x the planted set
    assert sum(r.n_docs for r in rows) >= 2 * n_planted


def test_source_vocabulary_profile_recounts(spark):
    """TTR per source matches a Python recount of distinct terms over
    tokens; one row per source."""
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        source_vocabulary_profile,
    )

    docs = load_table(spark, SF_SMALL, "documents").collect()
    by_src: dict[str, list[str]] = {}
    for d in docs:
        by_src.setdefault(d.source, []).extend(
            t for t in d.text.split(" ") if t
        )
    rows = source_vocabulary_profile(spark, SF_SMALL).collect()
    assert len(rows) == len(by_src)
    for r in rows:
        toks = by_src[r.source]
        assert r.n_tokens == len(toks)
        assert r.n_terms == len(set(toks))
        assert abs(r.ttr - round(len(set(toks)) / len(toks), 4)) <= 1e-4


def test_source_triage_report_composes_blocks(spark):
    """The composite report equals its three standalone blocks joined:
    same rows as the scorecard, ttr from the vocabulary profile, and
    cross_rate zero exactly for sources without clustered docs."""
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        source_dup_attribution,
        source_triage_report,
        source_vocabulary_profile,
    )

    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        per_doc_features,
        scorecard_rollup,
    )

    report = {r.source: r for r in source_triage_report(spark, SF_SMALL).collect()}
    # the report's scorecard block runs over the REAL corpus (no planted
    # duplicates — consistent denominators with ttr/cross_rate), so
    # compare against the unplanted kernel, not the planted gate query
    docs = _lt(spark, SF_SMALL, "documents")
    sc = {
        r.source: r
        for r in scorecard_rollup(
            per_doc_features(docs).withColumn("n_tokens", F.size("toks"))
        ).collect()
    }
    vp = {r.source: r for r in source_vocabulary_profile(spark, SF_SMALL).collect()}
    att = {r.source: r for r in source_dup_attribution(spark, SF_SMALL).collect()}
    assert set(report) == set(sc)
    for s, r in report.items():
        assert r.n_docs == sc[s].n_docs
        assert r.dup_rate == sc[s].dup_rate
        assert r.ttr == vp[s].ttr
        expect_cross = att[s].cross_rate if s in att else 0.0
        assert r.cross_rate == expect_cross


def test_source_dup_attribution_reuses_components(spark):
    """Passing a precomputed CC labeling yields output identical to the
    self-computed form (the cluster_aware_split reuse contract)."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )
    from project_bigdata_recsys_spark.functions.sourcetriage import (
        source_dup_attribution,
    )

    docs = _lt(spark, SF_SMALL, "documents")
    comps = connected_components(simhash_near_pairs_for(docs, sort=False))
    a = source_dup_attribution(spark, SF_SMALL).collect()
    b = source_dup_attribution(spark, SF_SMALL, components=comps).collect()
    assert a == b


def test_label_centroid_outliers_match_numpy(spark):
    """Lowest-cosine-to-own-centroid members per label recomputed with
    numpy agree exactly (values and ranking)."""
    import numpy as np

    from project_bigdata_recsys_spark.functions.similarity import (
        label_centroid_outliers,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append((r.vec_id, np.array(r.embedding, dtype=np.float64)))
    expect = {}
    for lab, members in by_label.items():
        c = np.mean([v for _, v in members], axis=0)
        cn = np.sqrt(np.dot(c, c))
        scored = sorted(
            (round(float(np.dot(v, c)) / (float(np.sqrt(np.dot(v, v))) * cn), 6), vid)
            for vid, v in members
        )
        expect[lab] = scored[:5]
    rows = label_centroid_outliers(spark, SF_SMALL).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.label, []).append((r.cos_sim, r.vec_id))
    for lab, pairs in got.items():
        assert [p[1] for p in pairs] == [p[1] for p in expect[lab]]
        for (gc, _), (ec, _) in zip(pairs, expect[lab]):
            assert abs(gc - ec) <= 2e-6


def test_nearest_centroid_agreement_matches_numpy(spark):
    """Per-label nearest-centroid accuracy recomputed with numpy agrees
    (rounded-cosine argmax with the same label_c tie-break)."""
    import numpy as np

    from project_bigdata_recsys_spark.functions.similarity import (
        nearest_centroid_agreement,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, np.float64))
    cents = {
        lab: np.mean(vs, axis=0) for lab, vs in by_label.items()
    }
    cns = {lab: float(np.sqrt(np.dot(c, c))) for lab, c in cents.items()}
    agree: dict[int, list[int]] = {}
    for r in emb:
        v = np.array(r.embedding, np.float64)
        vn = float(np.sqrt(np.dot(v, v)))
        best = min(
            (-round(float(np.dot(v, c)) / (vn * cns[lab]), 6), lab)
            for lab, c in cents.items()
        )[1]
        agree.setdefault(r.label, []).append(1 if best == r.label else 0)
    rows = nearest_centroid_agreement(spark, SF_SMALL).collect()
    assert {r.label for r in rows} == set(agree)
    for r in rows:
        assert r.n_vecs == len(agree[r.label])
        assert r.n_agree == sum(agree[r.label])


def test_source_quantile_filter_keeps_above_own_p25(spark):
    """Each source keeps only docs strictly above its OWN p25 threshold;
    kept counts match a Python recount of the per-source distribution."""
    from project_bigdata_recsys_spark.functions.text import (
        quality_features,
        source_quantile_filter,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.select(
        "source", (feats["alpha_ratio"] - feats["stopword_ratio"]).alias("s")
    ).collect()
    by_src: dict[str, list[float]] = {}
    for r in scored:
        by_src.setdefault(r.source, []).append(r.s)
    rows = source_quantile_filter(spark, SF_SMALL).collect()
    assert {r.source for r in rows} <= set(by_src)
    for r in rows:
        vals = sorted(by_src[r.source])
        n = len(vals)
        # threshold = min distinct score whose cumulative count >= 0.25*n
        seen = 0
        thr = None
        for v in sorted(set(vals)):
            seen += vals.count(v)
            if seen >= 0.25 * n:
                thr = v
                break
        assert abs(r.threshold - round(thr, 6)) <= 1e-6
        assert r.n_total == n
        assert r.n_kept == sum(1 for v in vals if v > thr)
