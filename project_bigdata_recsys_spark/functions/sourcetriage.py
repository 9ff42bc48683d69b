"""Source-level corpus triage (SURVEY.md §2.12 extension): the
per-source decisions a large-crawl curation pipeline makes BEFORE
document-level filtering — which sources to keep, down-weight, or drop.

The documents table carries a ``source`` column (crawl / feed / dump of
origin).  At 100 TB the corpus is a union of hundreds of such sources of
wildly different quality and redundancy, and the first curation pass is
source-level:

  source_scorecard          per-source health report: volume, language
                            spread, token mass, mean quality, exact-dup
                            rate — the table a curation run reads to rank
                            sources.
  cross_source_overlap      pairwise shingle overlap between sources
                            (Jaccard over distinct 5-gram hashes) — which
                            crawls re-scrape the same pages; the
                            "drop source B, it is 80% source A" signal.
  boilerplate_prefix_profile / boilerplate_suffix_profile
                            repeated document prefixes/suffixes
                            (first/last-k-token fingerprints) — templated
                            headers, licence blocks and footers; the
                            span-level dedup's cheap source-scoped cousin.
  source_dup_attribution    per-source split of near-dup cluster
                            membership into intra-source (boilerplate)
                            vs cross-source (mirror) duplication.
  source_vocabulary_profile type-token ratio per source (Heaps-law QA).
  source_triage_report      the composed per-source decision table
                            (scorecard + TTR + attribution).

All hashes are md5-of-the-data (the dedup.py discipline), so every
operator is oracle-checked by the DuckDB gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.text import quality_features, tokens


def source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source health report: n_docs, language spread, token mass,
    mean quality score, and exact-duplicate rate.

    Duplicate rate is corpus-wide (a doc counts as duplicated if its
    sha256(text) appears anywhere in the corpus more than once — cross-
    source copies count for BOTH sources, which is the decision-relevant
    number: a mirror source is 100% duplicated even though every one of
    its pages is "first" somewhere else).  The driver corpus has no
    exact duplicates, so the query plants the same deterministic set
    exact_duplicates uses (every doc_id % 10 == 0 re-appears under
    doc_id + 1_000_000, keeping its source) and the scorecard must
    price those in.

    Scale: one text scan computes fingerprint + token count + quality
    features; the dup check shuffles 32-byte digests only (groupBy fp →
    copy count, joined back on fp); the final rollup groups on source —
    a low-cardinality key AFTER per-fingerprint aggregation, so no fat
    partitions.  No text ever shuffles, and the per-doc feature frame
    (digest + two numbers per doc) is persist_tracked because it feeds
    both the copy count and the join probe — one text scan total.
    """
    from project_bigdata_recsys_spark.functions.dedup import planted_id
    from project_bigdata_recsys_spark.caching import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        planted_id("doc_id").alias("doc_id"), "text", "lang", "source"
    )
    corpus = docs.select("doc_id", "text", "lang", "source").unionByName(planted)
    per_doc = persist_tracked(
        per_doc_features(corpus)
        .withColumn("n_tokens", F.size("toks"))
        .drop("toks")
    )
    return scorecard_rollup(per_doc)


def per_doc_features(docs: DataFrame) -> DataFrame:
    """The shared one-text-scan per-document feature frame every triage
    block reads: (doc_id, source, lang, sha256 fingerprint, non-empty
    token array, quality score).  Projection-only — callers persist it
    once and fan out; Catalyst prunes ``toks`` away for consumers that
    only need counts."""
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        "source",
        "lang",
        F.sha2("text", 256).alias("fp"),
        F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0).alias(
            "toks"
        ),
        (feats["alpha_ratio"] - feats["stopword_ratio"]).alias("quality"),
    )


def scorecard_rollup(per_doc: DataFrame) -> DataFrame:
    """Scorecard aggregation over a per-doc feature frame
    (doc_id, source, lang, fp, n_tokens, quality) — the kernel behind
    :func:`source_scorecard` (planted gate corpus) and
    :func:`source_triage_report` (real corpus)."""
    copies = per_doc.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    flagged = per_doc.join(copies, "fp").withColumn(
        "is_dup", F.when(F.col("n_copies") > 1, 1).otherwise(0)
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.sum("is_dup").cast("long").alias("n_dup_docs"),
            F.round(F.sum("is_dup") / F.count(F.lit(1)), 4).alias("dup_rate"),
        )
        .orderBy("source")
    )


def cross_source_overlap(
    spark: SparkSession, sf_dir: str, n: int = 5, top: int = 25
) -> DataFrame:
    """Pairwise source overlap: Jaccard similarity between the distinct
    5-gram shingle sets of every source pair, top pairs by shared-shingle
    count — the "crawl B re-scrapes crawl A" detector that decides which
    redundant sources to drop before any document-level dedup runs.

    Scale: documents never meet — each doc explodes to (shingle-hash,
    source), distinct per source, and the pair join keys on the 64-bit
    hash where each group holds at most #sources rows (sources number in
    the hundreds at 100 TB, so per-key fan-out is bounded by S²/2, not by
    corpus size).  Only 16-hex-char hashes shuffle, never shingle text.
    The distinct (source, hash) frame feeds THREE consumers (both pair-
    join sides + the per-source sizes), so it is persist_tracked — the
    scan+shingle+distinct pipeline runs once, not three times (the
    dedup.py signature-frame discipline).  The output is one row per
    overlapping source pair — at most S(S-1)/2 rows total, driver-safe
    at any corpus scale.
    """
    from project_bigdata_recsys_spark.caching import persist_tracked
    from project_bigdata_recsys_spark.functions.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = persist_tracked(
        docs.select(
            "source", F.explode(shingles(F.col("text"), n)).alias("shingle")
        )
        .filter(F.length("shingle") > 0)
        .select("source", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"), "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n_shingles").alias("nb")
    )
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("n_shared"), "src_a", "src_b")
        .limit(top)
    )


def boilerplate_profile_for(
    docs: DataFrame, k: int = 8, min_docs: int = 2, tail: bool = False
) -> DataFrame:
    """Shared kernel for the prefix (header) and suffix (footer)
    boilerplate profiles: the first/last ``k`` non-empty tokens of each
    document as a fingerprint, grouped corpus-wide.

    Scale: grouping keys on the md5 of the span (16 bytes shuffle per
    doc, never the text); the span string itself is carried as min()
    — 1:1 with its hash — so the aggregate stays a pure digest shuffle.
    Output is capped by the filter to spans seen ≥ ``min_docs``
    times, a tiny frame at any scale.
    """
    toks = F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)
    if tail:
        # last k tokens: slice from max(len-k+1, 1), length min(k, len)
        start = F.greatest(F.size(toks) - (k - 1), F.lit(1))
        span = F.array_join(
            F.slice(toks, start, F.least(F.lit(k), F.size(toks))), " "
        )
    else:
        span = F.array_join(F.slice(toks, 1, k), " ")
    out_col = "suffix" if tail else "prefix"
    return (
        docs.select(
            "source",
            F.md5(span).alias("span_fp"),
            span.alias(out_col),
        )
        .groupBy("span_fp")
        .agg(
            F.min(out_col).alias(out_col),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(out_col, "n_docs", "n_sources")
        .orderBy(F.desc("n_docs"), out_col)
    )


def boilerplate_prefix_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """Repeated document prefixes: the first ``k`` tokens of each
    document, grouped corpus-wide — templated headers, licence banners
    and scraper chrome show up as prefixes shared by many documents
    (often across sources).  The cheap precursor to span-level dedup:
    a curation run reads this to write prefix-strip rules.  Scale notes
    in :func:`boilerplate_profile_for` (the shared kernel).
    """
    return boilerplate_profile_for(
        load_table(spark, sf_dir, "documents"), k=k, min_docs=min_docs
    )


def boilerplate_suffix_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """Repeated document SUFFIXES — the footer twin of
    :func:`boilerplate_prefix_profile` (copyright lines, nav footers,
    signature blocks cluster at document END; a prefix scan never sees
    them).  Same digest-shuffle kernel, sliced from the tail.

    The driver corpus has no naturally repeated suffixes (its prefixes
    collide, its endings don't), which would make this gate query a
    vacuous always-empty check — so it plants the same deterministic
    duplicate set exact_duplicates uses (every doc_id % 10 == 0
    re-appears, source preserved) and must find exactly those footer
    groups.
    """
    from project_bigdata_recsys_spark.functions.dedup import planted_id
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        planted_id("doc_id").alias("doc_id"), "text", "source"
    )
    corpus = docs.select("doc_id", "text", "source").unionByName(planted)
    return boilerplate_profile_for(corpus, k=k, min_docs=min_docs, tail=True)


def source_dup_attribution(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    """Where does each source's near-duplication COME FROM: for every
    document in a near-dup cluster (banded simhash pairs → connected
    components, the audited dedup machinery), is its cluster confined to
    one source (templated boilerplate — fix with a prefix-strip rule) or
    spread across sources (mirror/re-scrape — fix by dropping a source)?
    The per-source cross-duplication rate is the number that separates
    the two remediations; cross_source_overlap gives the corpus-level
    view, this gives the per-document attribution.

    Output per source (sources with clustered docs only): clustered doc
    count, docs in cross-source clusters, and the cross rate.

    Scale: reuses the banded pair generator and CC kernel unchanged
    (skew-capped before pairs, pointer-halving CC); the attribution adds
    one join of cluster labels to (doc_id, source) — a digest-and-id
    shuffle — and a per-cluster distinct-source count on a key the data
    is already clustered by.  Cluster groups are band-bounded small, so
    no fat partitions.  A run that already holds the CC labeling (e.g.
    right after near_dup_clusters or cluster_aware_split) passes it via
    ``components`` ((doc_id, cluster_id)) and skips the pair/CC
    recompute entirely — identical output by construction (test-pinned,
    same contract as cluster_aware_split).
    """
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, sf_dir, "documents")
    if components is not None:
        comps = components
    else:
        pairs = simhash_near_pairs_for(docs, sort=False)
        comps = connected_components(pairs)
    members = comps.join(docs.select("doc_id", "source"), "doc_id")
    return attribution_rollup(members)


def attribution_rollup(members: DataFrame) -> DataFrame:
    """Per-source intra-vs-cross duplication rollup over a labeled
    membership frame (doc_id, cluster_id, source) — shared by
    :func:`source_dup_attribution` and :func:`source_triage_report`."""
    cstats = members.groupBy("cluster_id").agg(
        F.countDistinct("source").alias("n_sources")
    )
    cross = F.when(F.col("n_sources") > 1, 1).otherwise(0)
    return (
        members.join(cstats, "cluster_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_docs"),
            F.sum(cross).cast("long").alias("n_cross_docs"),
            F.round(F.sum(cross) / F.count(F.lit(1)), 4).alias("cross_rate"),
        )
        .orderBy("source")
    )


def source_vocabulary_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: token mass, distinct-term count and
    type-token ratio — the Heaps-law corpus QA metric (a source whose TTR
    is far below its peers is template/boilerplate-heavy; far above is
    OCR noise or ID soup).  Read next to source_scorecard when ranking
    sources.

    Scale: explode → one aggregation keyed on (source, term-hash) for
    distinct counting, one on source for mass — both partial-aggregated
    map-side, shuffling 16-hex digests, never terms.  count_distinct
    over the md5 avoids shuffling raw token strings (collision odds at
    64 bits are negligible against vocabulary sizes).
    """
    docs = load_table(spark, sf_dir, "documents")
    term_rows = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    hashed = term_rows.select(
        "source", F.substring(F.md5("term"), 1, 16).alias("h")
    )
    return vocabulary_rollup(hashed)


def vocabulary_rollup(hashed: DataFrame) -> DataFrame:
    """TTR aggregation over a (source, term-hash) frame — kernel behind
    :func:`source_vocabulary_profile` and the composed report."""
    return (
        hashed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count_distinct("h").cast("long").alias("n_terms"),
            F.round(F.count_distinct("h") / F.count(F.lit(1)), 4).alias("ttr"),
        )
        .orderBy("source")
    )


def source_triage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full source-triage decision table as ONE composed query:
    scorecard (volume / languages / tokens / quality / exact-dup rate) +
    vocabulary TTR + near-dup cross-source attribution, one row per
    source — the table a curation owner actually sorts when deciding
    which sources to keep, down-weight, strip, or drop.

    Composition reuses each block's rollup kernel over ONE shared
    per-doc feature frame (fingerprint + token array + quality, one text
    scan, persist_tracked) and ONE connected-components labeling:

      scorecard   <- per_doc (n_tokens = size(toks), fp for dup rate)
      ttr         <- explode(per_doc.toks)
      attribution <- simhash over per_doc.toks (tokens_col reuse) -> CC
                     -> attribution_rollup, never a second pair/CC pass

    vs the round-5 form (three independent pipelines = three text scans
    plus a fresh simhash+CC), this is one scan + one CC — the
    curation_funnel composition discipline.  Every block runs over the
    REAL corpus with the SAME denominators: the standalone scorecard
    gate plants synthetic duplicates to stay non-vacuous, but a decision
    table that mixes planted dup_rate with unplanted ttr/cross_rate
    would overstate corpus duplication (round-5 advisory), so the
    composed report does not plant anywhere.  Sources with no near-dup
    clusters read cross_rate 0.
    """
    from project_bigdata_recsys_spark.caching import persist_tracked
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, sf_dir, "documents")
    per_doc = persist_tracked(per_doc_features(docs))

    sc = scorecard_rollup(
        per_doc.withColumn("n_tokens", F.size("toks"))
    ).select("source", "n_docs", "n_langs", "n_tokens", "avg_quality", "dup_rate")

    hashed = per_doc.select(
        "source", F.explode("toks").alias("term")
    ).select("source", F.substring(F.md5("term"), 1, 16).alias("h"))
    vp = vocabulary_rollup(hashed).select("source", "ttr")

    pairs = simhash_near_pairs_for(
        per_doc.select("doc_id", "toks"), sort=False, tokens_col="toks"
    )
    members = connected_components(pairs).join(
        per_doc.select("doc_id", "source"), "doc_id"
    )
    att = attribution_rollup(members).select("source", "cross_rate")
    return (
        sc.join(vp, "source")
        .join(att, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_langs",
            "n_tokens",
            "avg_quality",
            "dup_rate",
            "ttr",
            F.coalesce("cross_rate", F.lit(0.0)).alias("cross_rate"),
        )
        .orderBy("source")
    )


def prefix_cache_savings(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> DataFrame:
    """Serving-side value of shared prefixes: per language, how many
    prompt tokens an inference server's prefix cache would skip because
    documents open identically ((n_docs - 1) × prefix length per
    repeated-prefix group) — the boilerplate kernel re-read as an
    inference-cost estimate instead of a cleanup signal.

    Same digest-shuffle shape as boilerplate_prefix_profile; the gate
    corpus plants the deterministic duplicate set so the savings table
    is non-vacuous (the raw corpus repeats prefixes naturally too)."""
    from project_bigdata_recsys_spark.functions.dedup import planted_id
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        planted_id("doc_id").alias("doc_id"), "text", "lang"
    )
    corpus = docs.select("doc_id", "text", "lang").unionByName(planted)
    toks = F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)
    pref = corpus.select(
        "lang",
        F.md5(F.array_join(F.slice(toks, 1, k), " ")).alias("prefix_fp"),
        F.least(F.size(toks), F.lit(k)).alias("prefix_tokens"),
        F.size(toks).alias("n_tokens"),
    )
    groups = pref.groupBy("lang", "prefix_fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("prefix_tokens").alias("prefix_tokens"),
        F.sum("n_tokens").alias("group_tokens"),
    )
    return (
        groups.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prefix_groups"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_groups"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum((F.col("n_docs") - 1) * F.col("prefix_tokens"))
            .cast("long")
            .alias("saved_tokens"),
            F.round(
                F.sum((F.col("n_docs") - 1) * F.col("prefix_tokens"))
                / F.sum("group_tokens"),
                6,
            ).alias("saved_frac"),
        )
        .orderBy("lang")
    )


def source_dup_attribution_reused(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production form of :func:`source_dup_attribution`: reads the
    persist_shared CC labeling (dedup.shared_components) instead of
    paying pair generation + CC per query — identical output by the
    ``components=`` reuse contract (test-pinned), same oracle.  Benched
    adjacently with cluster_aware_split_reused so the second entry
    measures the marginal rollup cost of the real nightly contract."""
    from project_bigdata_recsys_spark.functions.dedup import shared_components

    return source_dup_attribution(
        spark, sf_dir, components=shared_components(spark, sf_dir)
    )
