"""Exact duplicated-span dedup (substring-level deduplication).

Training-data pipelines remove *repeated passages*, not just repeated
documents: boilerplate headers, licence blocks, templated paragraphs that
recur across millions of pages (Lee et al., "Deduplicating Training Data
Makes Language Models Better" — done there with a suffix array on one
machine).  The distributed approximation used at corpus scale is
fixed-width token windows: segment every document into W-token spans,
hash each span, count span-hash frequency across the corpus, and drop
every occurrence of a duplicated span except the first.

Scale design (100 TB):
- Segmentation is a pure map over the text scan — ``split`` + ``sequence``
  + ``transform`` + ``posexplode``, all JVM whole-stage codegen, no
  Python.
- The frequency count shuffles **span hashes only** (16-byte md5 prefix,
  never span text), with map-side partial aggregation; the keep-first
  winner (min (doc_id, seg_no)) rides in the same aggregate, so one
  shuffle covers both questions.
- The verdict joins back on the span hash — an equi-join on a
  high-cardinality uniform key.  A boilerplate span seen 10^9 times is
  ONE row on the verdict side (hash, min_key), so hot spans cost nothing
  extra on the build side; the probe side fans out naturally.
- Document reassembly groups by doc_id — the same key the segments were
  exploded from, and collect_list carries only kept spans.

The reference has no text pipeline at all (its string handling is
psycopg2 value plumbing, e.g. dashboard/app.py:273-351); this module is
part of the beyond-reference curation surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table

#: Span width in tokens.  Real pipelines use ~50; the synthetic docs are
#: 10–100 tokens, so 8 keeps several spans per document at test scale.
DEFAULT_SPAN_TOKENS = 8


def span_segments(
    docs: DataFrame,
    width: int = DEFAULT_SPAN_TOKENS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Explode documents into non-overlapping ``width``-token spans.

    Returns (doc_id, *carry, seg_no, span) with seg_no 0-based.  The
    trailing partial span (fewer than ``width`` tokens) is KEPT —
    dropping it would let duplicated tails slip through — and hashes
    like any other span.  Pure column expressions; the oracle replicates
    with DuckDB list slicing.  ``carry`` threads extra columns through
    (streaming consumers can't re-join them: a second projection of the
    same source would make it a stream-stream join)."""
    toks = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    seg_nos = F.sequence(F.lit(0), n_seg - 1)
    spans = F.transform(
        seg_nos,
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    return docs.select(
        "doc_id", *carry, F.posexplode(spans).alias("seg_no", "span")
    )


def span_hash(span: Column) -> Column:
    """16-hex-char md5 prefix of the span — the shuffle key.  64 bits of
    hash over a ~10^12-span corpus gives ~fraction 10^-5 colliding pairs;
    collisions only ever *over*-dedup one span occurrence, never corrupt
    text, and the verify-bearing queries compare span text post-join."""
    return F.substring(F.md5(span), 1, 16)


def duplicated_spans(spark: SparkSession, sf_dir: str, width: int = DEFAULT_SPAN_TOKENS) -> DataFrame:
    """Top duplicated spans across the corpus: span text, total
    occurrences, distinct documents.  The heavy-hitter report a curation
    run reads to decide boilerplate filters."""
    docs = load_table(spark, sf_dir, "documents")
    segs = span_segments(docs, width)
    return (
        segs.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("span"))
        .limit(20)
    )


def remove_duplicate_spans(
    docs: DataFrame, width: int = DEFAULT_SPAN_TOKENS
) -> DataFrame:
    """Drop every occurrence of a corpus-duplicated span except the first
    (first = min (doc_id, seg_no) across the corpus), then reassemble
    each document from its kept spans in order.

    Returns (doc_id, n_spans, n_spans_dropped, text_kept).  Logical
    shape: one hash-keyed aggregate, one hash equi-join (both sides of
    which repartition on the span key), one doc_id regroup — every
    exchange is keyed on span-hash or doc_id, never anything
    lower-cardinality than the data itself."""
    segs = span_segments(docs, width).withColumn("h", span_hash(F.col("span")))
    # One aggregate answers both "is this span duplicated?" and "which
    # occurrence is first?".  The occurrence key packs (doc_id, seg_no)
    # into one long so min() is a single partial-aggregable function.
    occ_key = (F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")).alias(
        "occ"
    )
    verdict = (
        segs.select("h", occ_key)
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min("occ").alias("first_occ"),
        )
    )
    kept = (
        segs.join(verdict, "h")
        .withColumn(
            "keep",
            (F.col("n_occ") == 1)
            | (
                F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")
                == F.col("first_occ")
            ),
        )
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_spans_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("seg_no"), F.col("span")),
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )


def span_dedup_profile(
    spark: SparkSession, sf_dir: str, width: int = DEFAULT_SPAN_TOKENS
) -> DataFrame:
    """Gate query: per-document span-dedup result for the 50 lowest
    doc_ids — doc count keeps the compare cheap while the rebuilt text
    (sha-hashed) pins the whole keep/drop/reassemble path bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs, width)
    return (
        out.select(
            "doc_id",
            "n_spans",
            "n_spans_dropped",
            F.sha2(F.col("text_kept"), 256).alias("kept_sha"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Incremental span dedup: persisted corpus span index + O(batch) probe
# (index bucket = first hex byte of the span key -> 256 partitions)
# --------------------------------------------------------------------------


def build_span_index(
    spark: SparkSession, sf_dir: str, index_dir: str, width: int = DEFAULT_SPAN_TOKENS
) -> None:
    """Persist the corpus span verdicts ONCE per corpus version — the
    incremental form of span dedup, mirroring dedup.build_dedup_index:
    every daily batch probes this relation instead of re-segmenting and
    re-hashing 100 TB of settled corpus.

    Layout: one parquet relation (h, n_occ, first_occ) partitioned by
    ``sb`` = first hex byte of the span key (256 directories).  A small
    batch's probe prunes to the buckets it actually hits; a large batch
    hits all 256 and the probe degrades gracefully to a full — still
    digest-only — scan."""
    docs = load_table(spark, sf_dir, "documents")
    segs = span_segments(docs, width).withColumn("h", span_hash(F.col("span")))
    verdict = (
        segs.select(
            "h",
            (F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")).alias("occ"),
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min("occ").alias("first_occ"))
        .withColumn("sb", F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
    )
    # cluster on the partition key first: the groupBy leaves verdict
    # hash-partitioned by h, so an unclustered write emits up to tasks ×
    # 256 sb files; one shuffle bounds it at one file per dir (guide §6)
    verdict.repartition("sb").write.mode("overwrite").partitionBy(
        "sb"
    ).parquet(index_dir)


def probe_span_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    width: int = DEFAULT_SPAN_TOKENS,
    prune_partitions: bool = True,
) -> DataFrame:
    """Classify every span of a NEW batch against the persisted corpus
    index + the batch itself, per lang:

      dup_corpus  span already in the settled corpus (drop)
      dup_intra   span new to the corpus but repeated within the batch,
                  beyond its first batch occurrence (drop)
      new         first sighting (keep)

    O(batch) segmentation/hashing; the corpus side is a digest-only
    parquet scan — optionally partition-pruned by the batch's distinct
    first-byte buckets (≤256 values, a bounded driver-side collect,
    same discipline as dedup.probe_dedup_index)."""
    idx = spark.read.parquet(index_dir).select("h", "sb")
    segs = span_segments(batch.select("doc_id", "text"), width).withColumn(
        "h", span_hash(F.col("span"))
    )
    segs = segs.join(batch.select("doc_id", "lang"), "doc_id")
    if prune_partitions:
        hit = [
            r.sb
            for r in segs.select(
                F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("sb")
            )
            .distinct()
            .collect()
        ]
        idx = idx.filter(F.col("sb").isin(hit))
    occ = (F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")).alias("occ")
    intra = (
        segs.select("h", occ)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("b_occ"), F.min("occ").alias("b_first"))
    )
    joined = (
        segs.withColumn(
            "occ", F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")
        )
        .join(intra, "h")
        .join(idx.select("h").withColumn("in_corpus", F.lit(True)), "h", "left")
    )
    cls = (
        F.when(F.col("in_corpus"), "dup_corpus")
        .when((F.col("b_occ") > 1) & (F.col("occ") != F.col("b_first")), "dup_intra")
        .otherwise("new")
    )
    return (
        joined.withColumn("cls", cls)
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("cls") == "dup_corpus", 1).otherwise(0))
            .cast("long")
            .alias("n_dup_corpus"),
            F.sum(F.when(F.col("cls") == "dup_intra", 1).otherwise(0))
            .cast("long")
            .alias("n_dup_intra"),
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .orderBy("lang")
    )


def update_span_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    width: int = DEFAULT_SPAN_TOKENS,
) -> None:
    """Fold an ADMITTED batch into the persisted span index WITHOUT
    rebuilding it: merge the batch's span verdicts into the stored ones
    and rewrite only the ``sb`` partitions the batch touches (dynamic
    partition overwrite).  Daily maintenance cost is O(batch +
    touched-buckets), never O(corpus) — the same incremental discipline
    as dedup.update_components.

    Merge semantics match a from-scratch build exactly (test-pinned):
    n_occ adds, first_occ takes the min — both associative, so
    yesterday's index ⊕ today's batch ≡ rebuild over the union."""
    segs = span_segments(batch.select("doc_id", "text"), width).withColumn(
        "h", span_hash(F.col("span"))
    )
    batch_verdict = (
        segs.select(
            "h",
            (F.col("doc_id").cast("long") * 1_000_000 + F.col("seg_no")).alias("occ"),
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min("occ").alias("first_occ"))
        .withColumn("sb", F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
    )
    touched = [r.sb for r in batch_verdict.select("sb").distinct().collect()]
    if not touched:
        return
    stored = spark.read.parquet(index_dir).filter(F.col("sb").isin(touched))
    merged = (
        stored.select("h", "n_occ", "first_occ", "sb")
        .unionByName(batch_verdict)
        .groupBy("h", "sb")
        .agg(F.sum("n_occ").alias("n_occ"), F.min("first_occ").alias("first_occ"))
        .select("h", "n_occ", "first_occ", "sb")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("sb")
        .parquet(index_dir)
    )


def span_contamination(
    spark: SparkSession,
    sf_dir: str,
    width: int = DEFAULT_SPAN_TOKENS,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """N-gram-overlap decontamination — the method eval suites actually
    need: an eval document is contaminated if a large fraction of its
    token spans appears ANYWHERE in the training corpus, which catches
    quotes and partial copies that exact/minhash document fingerprints
    miss (dedup.contamination_check is the whole-document form).

    Benchmark stand-in: every 17th document re-keyed as the eval set
    (the contamination_check convention), so each eval doc's spans all
    exist in train — plus planted fresh docs that must score 0.
    Mechanism: eval spans left-join the DISTINCT train span-key set
    (digest-only, the span_dedup shuffle shape), per-doc overlap
    fraction, flag at ``flag_threshold``.  Per-lang rollup."""
    docs = load_table(spark, sf_dir, "documents")
    train_h = (
        span_segments(docs, width)
        .select(span_hash(F.col("span")).alias("h"))
        .distinct()
        .withColumn("in_train", F.lit(True))
    )
    evals = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text", "lang"
    )
    fresh = docs.filter(F.col("doc_id") % 17 == 1).select(
        (F.col("doc_id") + 6_000_000).alias("doc_id"),
        F.concat(F.lit("unseen eval item "), F.col("doc_id").cast("string")).alias(
            "text"
        ),
        "lang",
    )
    eval_set = evals.unionByName(fresh)
    segs = span_segments(eval_set, width, carry=("lang",)).withColumn(
        "h", span_hash(F.col("span"))
    )
    per_doc = (
        segs.join(train_h, "h", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("in_train"), 1).otherwise(0)).alias("n_hit"),
        )
        .withColumn(
            "overlap", F.round(F.col("n_hit") / F.col("n_spans"), 4)
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum(F.when(F.col("overlap") >= flag_threshold, 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.round(F.avg("overlap"), 6).alias("avg_overlap"),
        )
        .orderBy("lang")
    )


def span_curation_funnel(
    spark: SparkSession,
    sf_dir: str,
    width: int = DEFAULT_SPAN_TOKENS,
    max_dropped_frac: float = 0.5,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """Composed span-first curation: corpus-wide span dedup → drop
    documents that were mostly boilerplate (more than
    ``max_dropped_frac`` of their spans removed, or emptied entirely) →
    quality-cut the REBUILT text (alpha ratio over text_kept — scoring
    the original text would grade content the dedup already deleted).

    Per-lang funnel counts at every stage plus retained token mass —
    the audit trail a curation run ships.  Stage kernels are the
    already-gated primitives (remove_duplicate_spans, quality_features'
    alpha ratio), composed in one plan; lang rejoins on doc_id (batch
    side, data-cardinality key)."""
    from project_bigdata_recsys_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    deduped = remove_duplicate_spans(docs, width).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    survived = deduped.withColumn(
        "pass_span",
        (F.col("n_spans_dropped") / F.col("n_spans") <= max_dropped_frac)
        & (F.length("text_kept") > 0),
    )
    alpha = F.round(
        F.length(F.regexp_replace(F.col("text_kept"), r"[^a-zA-Z]", "")).cast(
            "double"
        )
        / F.length("text_kept"),
        4,
    )
    scored = survived.withColumn(
        "pass_quality",
        F.col("pass_span") & (alpha >= min_alpha_ratio),
    )
    n_tok_kept = F.size(
        F.filter(tokens(F.col("text_kept")), lambda t: F.length(t) > 0)
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("pass_span"), 1).otherwise(0))
            .cast("long")
            .alias("n_after_span"),
            F.sum(F.when(F.col("pass_quality"), 1).otherwise(0))
            .cast("long")
            .alias("n_after_quality"),
            F.sum(
                F.when(F.col("pass_quality"), n_tok_kept).otherwise(0)
            )
            .cast("long")
            .alias("tokens_retained"),
        )
        .orderBy("lang")
    )
