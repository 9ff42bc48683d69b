"""Corpus-curation operators for training-data pipelines (SURVEY.md
§2.12 extension): sequence packing, domain mixing, TF-IDF term profiling.

These are the batch-prep steps between "deduplicated, quality-filtered
corpus" (functions/dedup.py, functions/text.py) and "token stream fed to
a trainer":

  pack_sequences   concat-and-chop packing of documents into fixed
                   token-budget training sequences — the standard
                   pretraining batch-prep that turns ragged documents
                   into dense, uniform-length sequences.
  corpus_mixture   temperature-weighted domain sampling (w_d ∝ n_d^α):
                   upweights small domains, the standard mixing rule for
                   multi-domain / multilingual training corpora.
  tfidf_top_terms  per-document top-k TF-IDF terms — the lightweight
                   per-domain vocabulary profile used for corpus QA and
                   domain-classifier features.

Everything is deterministic (document-derived ordering, md5 sampling —
never an engine RNG), so each operator is oracle-checked exactly like
the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.caching import persist_tracked
from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.text import tokens


def shard_key(doc_id, n_shards: int):
    """Deterministic shard id in [0, n_shards): md5-derived
    ``hash32(doc_id) % n_shards`` — engine-independent (DuckDB:
    ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % n``),
    so sharded operators stay oracle-checkable (the gate registers
    ``pack_sequences_sharded`` against exactly that SQL).  hash32 is
    non-negative, so ``%`` and ``pmod`` agree."""
    from project_bigdata_recsys_spark.functions.dedup import hash32

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return (hash32(doc_id.cast("string")) % n_shards).cast("int")


def pack_sequences(
    spark: SparkSession, sf_dir: str, budget: int = 256, n_shards: int = 1
) -> DataFrame:
    """Gate wrapper: :func:`pack_sequences_for` over the documents table."""
    return pack_sequences_for(
        load_table(spark, sf_dir, "documents"), budget=budget, n_shards=n_shards
    )


def pack_sequences_for(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 1,
    boundary_tokens: int = 0,
) -> DataFrame:
    """Pack documents into fixed ``budget``-token training sequences by
    concat-and-chop within each lang: documents stream in doc_id order,
    token counts accumulate, and a document belongs to the sequence where
    it STARTS (seq_no = floor(tokens-before-it / budget)).

    Output: one row per (lang[, shard], seq_no) with document count,
    token count and fill ratio — the packing manifest a trainer's data
    loader reads.

    Scale: with ``n_shards=1`` the running-sum window is keyed by lang
    only — exact single-stream semantics, but parallelism capped at
    #langs (a handful of fat partitions at 100 TB).  ``n_shards > 1`` is
    the production form: each lang splits into ``n_shards`` deterministic
    sub-streams (md5 of doc_id — :func:`shard_key`), the window keys
    become (lang, shard), and every shard packs its own dense sequences
    independently — packing needs no cross-shard contiguity, so the plan
    parallelizes to #langs × n_shards partitions with no correctness
    loss: per-shard fill ratios obey the same bound and the total token
    mass is conserved (asserted in tests against the unsharded form,
    including hypothesis-generated corpora).

    ``boundary_tokens`` charges each document's budget cost with the
    document-boundary specials a real pretraining packer inserts
    (BOS+EOS = 2; EOS-only = 1): placement cumsum and fill ratio count
    n_tokens + boundary_tokens per doc, while the reported ``n_tokens``
    stays content-token mass.  Default 0 keeps the raw-concat form.
    """
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0))
    with_counts = docs.select("doc_id", "lang", n_tok.alias("n_tokens"))
    if n_shards > 1:
        with_counts = with_counts.withColumn(
            "shard", shard_key(F.col("doc_id"), n_shards)
        )
        keys = ["lang", "shard"]
    else:
        keys = ["lang"]
    w = (
        Window.partitionBy(*keys)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cost = F.col("n_tokens") + F.lit(boundary_tokens)
    placed = with_counts.withColumn(
        "seq_no",
        F.floor((F.sum(cost).over(w) - cost) / F.lit(budget)).cast("long"),
    )
    return (
        placed.groupBy(*keys, "seq_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            *keys,
            "seq_no",
            "n_docs",
            "n_tokens",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("n_tokens") + F.col("n_docs") * boundary_tokens)
                    / budget,
                ),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy(*keys, "seq_no")
    )


def corpus_mixture(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    target_docs: int = 200,
    n_shards: int = 1,
    by: str = "lang",
) -> DataFrame:
    """Temperature-weighted domain mixture: sample quota per domain
    ∝ n_domain^alpha (alpha<1 upweights small domains — the standard
    multilingual rebalancing rule), filled deterministically by md5-rank
    within each domain so the drawn set is reproducible across engines and
    re-runs (same discipline as ml.classifier.deterministic_stratified_split).

    The domain key is ``by`` — "lang" (multilingual rebalancing, the
    default) or "source" (crawl/feed mixing, the ``source_mixture`` gate
    query); any documents column works.

    Output per domain: corpus size, mixture weight, the quota, and the
    sampled token mass — the mixing manifest of the training job.

    Scale: one count aggregation (tiny), one md5-rank window per domain,
    one filtered aggregation.  With ``n_shards=1`` the rank window is
    keyed by domain only — parallelism capped at #domains.  ``n_shards > 1``
    is the production form: each domain splits into deterministic md5
    sub-streams (:func:`shard_key`), the domain quota splits across shards
    (floor share + remainder to the lowest shard ids, so per-domain quotas
    are conserved exactly), and each (domain, shard) fills its share by
    local md5-rank.  The drawn SET differs from the unsharded draw (both
    are valid deterministic uniform draws); per-domain n_sampled is
    identical whenever every shard holds ≥ its share (asserted in
    tests), and the whole plan parallelizes to #domains × n_shards.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0))
    # persist: base feeds the domain sizes AND the md5-rank fill, and
    # the quota frame is consumed by both the sampled join and the final
    # readout — unmaterialized, every consumer re-tokenized the corpus
    # (5 documents scans across the 5 mixture gate queries; guide §5).
    # (doc_id, domain, n_tokens) — narrow, no text.
    base = persist_tracked(docs.select("doc_id", by, n_tok.alias("n_tokens")))

    sizes = base.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = sizes.withColumn("w_raw", F.pow("n_docs", F.lit(alpha)))
    total_w = weighted.agg(F.sum("w_raw").alias("w_sum"))
    quotas = (
        weighted.crossJoin(F.broadcast(total_w))
        .select(
            by,
            "n_docs",
            F.round(F.col("w_raw") / F.col("w_sum"), 6).alias("mix_weight"),
            F.round(F.lit(target_docs) * F.col("w_raw") / F.col("w_sum"), 0)
            .cast("long")
            .alias("quota"),
        )
    )
    if n_shards > 1:
        base = base.withColumn("shard", shard_key(F.col("doc_id"), n_shards))
        w = Window.partitionBy(by, "shard").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        # per-shard quota share: floor + remainder to lowest shard ids —
        # sums exactly to the domain quota
        shard_quota = F.floor(F.col("quota") / n_shards) + F.when(
            F.col("shard") < F.col("quota") % n_shards, F.lit(1)
        ).otherwise(F.lit(0))
        ranked = base.withColumn("rk", F.row_number().over(w))
        sampled = (
            ranked.join(F.broadcast(quotas.select(by, "quota")), by)
            .filter(F.col("rk") <= shard_quota)
            .groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("n_sampled"),
                F.sum("n_tokens").alias("sampled_tokens"),
            )
        )
    else:
        w = Window.partitionBy(by).orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        ranked = base.withColumn("rk", F.row_number().over(w))
        sampled = (
            ranked.join(F.broadcast(quotas.select(by, "quota")), by)
            .filter(F.col("rk") <= F.col("quota"))
            .groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("n_sampled"),
                F.sum("n_tokens").alias("sampled_tokens"),
            )
        )
    return (
        quotas.join(sampled, by, "left")
        .select(
            by,
            "n_docs",
            "mix_weight",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0)).alias("sampled_tokens"),
        )
        .orderBy(by)
    )


def curation_funnel(
    spark: SparkSession,
    sf_dir: str,
    keep_above: float = 0.25,
    chunk_tokens: int = 50,
    stride: int = 40,
    budget: int = 256,
    n_shards: int = 1,
) -> DataFrame:
    """The full corpus→trainer pipeline as ONE composed, gate-checkable
    query: plant duplicates → exact dedup (keep-min-id) → quality
    percentile cut → chunk → pack — reporting the funnel counts a
    curation run logs at every stage.

    Each stage reuses the exact kernel its standalone operator ships
    (dedup.dedup_exact, text.with_exact_percent_rank, text.chunk_rows,
    the pack_sequences window), so this row doubles as a composition
    test: the oracle recomputes the whole pipeline in SQL and any
    stage-boundary disagreement (lost rows, double-counted tokens,
    misaligned chunk/pack arithmetic) breaks the hash.

    ``n_shards > 1`` shards the pack stage exactly like
    :func:`pack_sequences` (window keys (lang, shard) instead of lang
    — parallelism #langs × n_shards at 100 TB); n_raw/n_unique/n_kept/
    kept_tokens/n_chunks/chunk_tokens are shard-invariant and
    n_sequences counts distinct (lang, shard, seq_no) — asserted
    against the unsharded form in tests.

    Output (single row): n_raw, n_unique, n_kept, kept_tokens, n_chunks,
    chunk_tokens, n_sequences.
    """
    from project_bigdata_recsys_spark.functions.dedup import planted_id
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.dedup import dedup_exact
    from project_bigdata_recsys_spark.functions.text import (
        chunk_rows,
        quality_features,
        with_exact_percent_rank,
    )


    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        planted_id("doc_id").alias("doc_id"), "text", "lang"
    )
    corpus = docs.select("doc_id", "text", "lang").unionByName(planted)
    # persist: uniq feeds both the score→chunk→pack chain and the
    # n_unique rollup — unmaterialized, each consumer re-runs the whole
    # planted-union + exact-dedup join (4 document scans apiece; the
    # funnel plan read documents 14x in total, guide §5).
    uniq = persist_tracked(dedup_exact(corpus))

    feats = quality_features(F.col("text"))
    scored = uniq.select(
        "doc_id",
        "lang",
        "text",
        (feats["alpha_ratio"] - feats["stopword_ratio"]).alias("score"),
    )
    kept = with_exact_percent_rank(scored, ["score", "doc_id"]).filter(
        F.col("pr") >= keep_above
    )
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0))
    # persist the NARROW kept rollup only (doc_id, lang, n_tokens): it
    # feeds the chunk stage's doc set and the pack window.  The chunk
    # tokenization reads text back through the already-cached ``uniq``
    # (ADVICE r15: carrying text here kept TWO corpus-text-sized caches
    # live simultaneously — guide §5, cache footprint).
    kept_counted = persist_tracked(
        kept.select("doc_id", "lang", n_tok.alias("n_tokens"))
    )

    chunks = chunk_rows(
        kept_counted.select("doc_id").join(
            uniq.select("doc_id", "text"), "doc_id"
        ),
        chunk_tokens,
        stride,
    )
    chunk_stats = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )

    if n_shards > 1:
        kept_counted = kept_counted.withColumn(
            "shard", shard_key(F.col("doc_id"), n_shards)
        )
        pack_keys = ["lang", "shard"]
    else:
        pack_keys = ["lang"]
    w = (
        Window.partitionBy(*pack_keys)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept_counted.withColumn(
        "seq_no",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
        ).cast("long"),
    )
    pack_stats = packed.agg(
        F.count_distinct(*pack_keys, "seq_no").alias("n_sequences"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    counts = corpus.agg(F.count(F.lit(1)).alias("n_raw")).crossJoin(
        uniq.agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        counts.crossJoin(pack_stats)
        .crossJoin(chunk_stats)
        .select(
            "n_raw",
            "n_unique",
            "n_kept",
            "kept_tokens",
            "n_chunks",
            "chunk_tokens",
            "n_sequences",
        )
    )


def cluster_capped_sample(
    spark: SparkSession, sf_dir: str, max_per_cluster: int = 2
) -> DataFrame:
    """Dedup-AWARE sampling: cap each near-duplicate cluster at
    ``max_per_cluster`` deterministic representatives (md5-rank pick,
    same discipline as corpus_mixture) instead of dropping all-but-one —
    the curation policy that keeps paraphrase/boilerplate families
    represented without letting them dominate the token budget.

    Composition: banded simhash pairs → connected components → every doc
    labeled (singletons form their own cluster) → per-cluster md5-rank →
    per-lang kept/dropped rollup.  Deterministic end-to-end, so the
    DuckDB oracle (recursive-CTE CC + the same window) hash-checks it.

    Scale: the per-cluster window partitions on cluster_id — clusters
    are band-bounded small and singletons dominate, so no fat
    partitions; everything upstream is the already-audited pair/CC
    machinery."""
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_pairs_for(docs, sort=False)
    comps = connected_components(pairs)
    labeled = (
        docs.select("doc_id", "lang")
        .join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = labeled.withColumn("rk", F.row_number().over(w))
    kept_flag = F.when(F.col("rk") <= max_per_cluster, 1).otherwise(0)
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept_flag).cast("long").alias("n_kept"),
            F.sum(1 - kept_flag).cast("long").alias("n_dropped"),
        )
        .orderBy("lang")
    )


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, k: int = 3, min_df: int = 1
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = in-document term count,
    idf = ln((N+1)/(df+1)) + 1 (smoothed), ranked by rounded score then
    term for a total cross-engine order.

    Scale: explode → two Tungsten aggregations (term counts per doc;
    document frequency per term) → broadcast-join the term dictionary
    (small relative to the corpus; switch to a shuffle join if the
    vocabulary outgrows the broadcast budget) → per-doc top-k window.
    Partial aggregation absorbs token skew map-side.  The corpus size N
    feeds the idf as a broadcast 1-row aggregate crossJoin (the
    corpus_mixture w_sum trick) — ONE job, no separate driver-side
    ``docs.count()`` scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs_row = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    term_rows = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = (
        F.log((F.col("__n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1.0
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs_row))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * idf, 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf")
        .orderBy("doc_id", "rank")
    )


def weighted_sample(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, per stratum:
    k documents per lang with inclusion probability proportional to
    token count — the Efraimidis–Spirakis A-Res scheme (each item draws
    u ∈ (0,1), key = u^(1/w), take the top-k keys).  The standard way a
    curation run takes a token-mass-faithful subsample for eval or
    annotation without a global sort.

    Draws are md5-uniforms keyed on doc_id (sources/ingest.py::
    hash_uniform discipline — data-derived, never an engine RNG), so the
    whole sample is oracle-checkable.  One scan, one per-lang window over
    ~#langs × shardable keys; at 100 TB swap the row_number window for
    the same shard_key split pack_sequences uses, or a per-partition
    top-k + merge (the key is i.i.d. per row, so top-k commutes)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    hex8 = F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8)
    # (conv(hex8) + 1) / 2^32: open interval (0, 1] — u = 0 would send
    # every zero-draw doc to key 0 regardless of weight
    u = (F.conv(hex8, 16, 10).cast("double") + 1.0) / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / n_tok.cast("double"))
    scored = docs.select(
        "doc_id", "lang", n_tok.alias("weight"), key.alias("ares_key")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("ares_key"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "lang",
            "rn",
            "doc_id",
            "weight",
            F.round("ares_key", 6).alias("ares_key"),
        )
        .orderBy("lang", "rn")
    )


def cluster_aware_split(
    spark: SparkSession,
    sf_dir: str,
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    components: DataFrame | None = None,
) -> DataFrame:
    """Leakage-safe train/valid/test split: every member of a near-dup
    cluster lands in the SAME split, so paraphrases of a training
    document can never contaminate eval.  A plain per-doc hash split
    leaks — this is the decontamination-correct version.

    Mechanism: banded simhash pairs → connected components → each doc
    labeled with its cluster (singletons self-labeled) → the SPLIT DRAW
    KEYS ON cluster_id, not doc_id (sources/ingest.py::hash_uniform
    md5 discipline).  The output measures leakage rather than assuming
    it: n_leaky_clusters counts clusters spanning >1 split and must be 0.

    Scale: reuses the audited pair/CC machinery; the split itself is a
    pure projection; the leak audit is one extra aggregate on
    cluster_id — a key the data is already shuffled by.  A run that
    already holds the CC labeling (e.g. right after near_dup_clusters)
    passes it via ``components`` ((doc_id, cluster_id)) and skips the
    pair/CC recompute entirely — identical output by construction
    (test-pinned)."""
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    docs = load_table(spark, sf_dir, "documents")
    if components is not None:
        comps = components
    else:
        pairs = simhash_near_pairs_for(docs, sort=False)
        comps = connected_components(pairs)
    labeled = (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    u = hash_uniform(F.col("cluster_id"), "split:")
    split = (
        F.when(u < train_frac, "train")
        .when(u < train_frac + valid_frac, "valid")
        .otherwise("test")
    )
    assigned = labeled.withColumn("split", split)
    leaky = (
        assigned.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_leaky_clusters")
        )
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )


def corpus_mixture_tokens(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    target_tokens: int = 20_000,
    n_shards: int = 1,
) -> DataFrame:
    """Temperature-weighted mixture with a TOKEN budget — what training
    jobs actually allocate (a quota of 1000 docs means 30x more English
    tokens than Thai; a token quota doesn't).  Weights ∝ (lang token
    mass)^alpha; each lang admits md5-ranked documents until its running
    token sum reaches quota, INCLUDING the crossing document (so every
    lang with data gets ≥1 doc and the shortfall is bounded by one
    document, never a systematic undershoot).

    Same window discipline as corpus_mixture: lang-keyed cumsum at
    ``n_shards=1``; the production form splits each lang quota across
    md5 shards (floor share + remainder to low shard ids — conserved
    exactly) and each (lang, shard) fills by local cumsum, so
    parallelism is #langs × n_shards."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0))
    base = docs.select("doc_id", "lang", n_tok.alias("n_tokens"))

    sizes = base.groupBy("lang").agg(
        F.sum("n_tokens").alias("lang_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    weighted = sizes.withColumn("w_raw", F.pow("lang_tokens", F.lit(alpha)))
    total_w = weighted.agg(F.sum("w_raw").alias("w_sum"))
    quotas = weighted.crossJoin(F.broadcast(total_w)).select(
        "lang",
        "n_docs",
        F.col("lang_tokens").cast("long").alias("lang_tokens"),
        F.round(F.col("w_raw") / F.col("w_sum"), 6).alias("mix_weight"),
        F.round(F.lit(target_tokens) * F.col("w_raw") / F.col("w_sum"), 0)
        .cast("long")
        .alias("token_quota"),
    )
    if n_shards > 1:
        base = base.withColumn("shard", shard_key(F.col("doc_id"), n_shards))
        part_cols = ["lang", "shard"]
        quota_expr = F.floor(F.col("token_quota") / n_shards) + F.when(
            F.col("shard") < F.col("token_quota") % n_shards, F.lit(1)
        ).otherwise(F.lit(0))
    else:
        part_cols = ["lang"]
        quota_expr = F.col("token_quota")
    w = Window.partitionBy(*part_cols).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    cum_before = (
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    )
    admitted = (
        base.withColumn("cum_before", cum_before)
        .join(F.broadcast(quotas.select("lang", "token_quota")), "lang")
        .filter(F.col("cum_before") < quota_expr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_tokens").alias("sampled_tokens"),
        )
    )
    return (
        quotas.join(admitted, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            "mix_weight",
            "token_quota",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
        .orderBy("lang")
    )


def augment_token_dropout(
    spark: SparkSession,
    sf_dir: str,
    drop_prob: float = 0.15,
) -> DataFrame:
    """Deterministic data augmentation: per-token dropout keyed on
    md5(doc_id:position) — the contrastive-pair / denoising-objective
    prep step (each document yields a corrupted view whose corruption is
    reproducible across runs and engines, unlike F.rand views that
    change under every retry/speculative re-execution — determinism here
    is a CORRECTNESS property, not a convenience, because a re-run task
    must emit the identical augmented row).

    One projection: positions via ``transform`` over the token array,
    kept tokens re-joined JVM-side.  Output anchors the pair: token
    counts and both fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # per-position uniform: md5(doc_id ':' pos) first-8-hex / 2^32
    did = F.col("doc_id").cast("string")
    kept = F.filter(
        F.transform(
            toks,
            lambda t, i: F.struct(
                t.alias("tok"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(did, F.lit(":"), i.cast("string"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(4294967296.0)
                ).alias("u"),
            ),
        ),
        lambda s: s["u"] >= drop_prob,
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("n_kept"),
            F.sha2(F.col("text"), 256).alias("orig_sha"),
            F.sha2(
                F.array_join(F.transform(kept, lambda s: s["tok"]), " "), 256
            ).alias("aug_sha"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def length_bucketed_batches(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, batch_size: int = 16
) -> DataFrame:
    """Length-bucketed batching manifest: documents binned into exact
    equi-depth token-length buckets, then batched ``batch_size`` at a
    time within each bucket in length order — the standard seq2seq /
    padded-batch prep that minimizes padding waste (a batch pads every
    member to its longest doc, so batching similar lengths together is
    the whole game).  Output per bucket: doc/batch counts, the length
    range, token mass, padded tokens and the padding ratio — the number
    a data loader reads to pick batch_size and bucket count.

    Scale: bucket assignment rides the exact-rank recipe
    (text.with_exact_percent_rank — range shuffle + local ranks +
    broadcast offsets, never a single-partition sort); the within-bucket
    window partitions on the bucket id, and equi-depth buckets hold
    n/n_buckets rows EACH by construction, so the per-bucket windows are
    perfectly balanced — parallelism is n_buckets, a knob you size to
    the cluster (unlike lang-keyed windows whose fatness follows the
    data).  Everything downstream aggregates (batch, then bucket) on
    already-shuffled keys.
    """
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.text import (
        with_exact_percent_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0))
    counted = docs.select("doc_id", n_tok.alias("n_tokens"))
    ranked = with_exact_percent_rank(counted, ["n_tokens", "doc_id"])
    bucket = F.least(
        F.floor(F.col("pr") * n_buckets), F.lit(n_buckets - 1)
    ).cast("int")
    w = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    placed = (
        ranked.withColumn("bucket", bucket)
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "batch_no", F.floor((F.col("rk") - 1) / batch_size).cast("long")
        )
    )
    batches = placed.groupBy("bucket", "batch_no").agg(
        F.count(F.lit(1)).alias("n_in_batch"),
        F.max("n_tokens").alias("batch_max"),
        F.sum("n_tokens").alias("batch_mass"),
    )
    pad = F.col("n_in_batch") * F.col("batch_max") - F.col("batch_mass")
    return (
        batches.withColumn("padded", pad)
        .groupBy("bucket")
        .agg(
            F.sum("n_in_batch").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("batch_mass").cast("long").alias("token_mass"),
            F.sum("padded").cast("long").alias("padded_tokens"),
            F.round(
                F.sum("padded") / (F.sum("batch_mass") + F.sum("padded")), 4
            ).alias("pad_ratio"),
        )
        .orderBy("bucket")
    )


def split_source_audit(
    spark: SparkSession,
    sf_dir: str,
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    components: DataFrame | None = None,
) -> DataFrame:
    """The labeling-REUSE contract as one benchable query: a single
    banded-simhash + connected-components pass labels the corpus, and
    that ONE labeling then feeds both downstream consumers —
    :func:`cluster_aware_split`'s leakage-safe split draw (md5 on
    cluster_id) and sourcetriage's cross-source attribution — rolled up
    per (source, split).  This is the production shape the
    ``components=`` parameters exist for; benched next to
    near_dup_clusters / cluster_aware_split it shows the marginal cost
    of a second consumer is joins on an already-shuffled key, not a
    repeated pair+CC pass (the round-5 bench triple-paid that family).

    Output per (source, split): docs, clustered docs, docs in
    cross-source clusters, cross rate — the pre-training audit of "which
    split of which source carries mirrored content"."""
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    docs = load_table(spark, sf_dir, "documents")
    if components is None:
        pairs = simhash_near_pairs_for(docs, sort=False)
        comps = connected_components(pairs)
    else:
        comps = components
    labeled = (
        docs.select("doc_id", "source")
        .join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    u = hash_uniform(F.col("cluster_id"), "split:")
    split = (
        F.when(u < train_frac, "train")
        .when(u < train_frac + valid_frac, "valid")
        .otherwise("test")
    )
    assigned = persist_tracked(labeled.withColumn("split", split))
    csrc = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.countDistinct("source").alias("n_sources"),
    )
    n_clu = F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0))
    n_cross = F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
    return (
        assigned.join(csrc, "cluster_id")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            n_clu.cast("long").alias("n_clustered"),
            n_cross.cast("long").alias("n_cross_docs"),
            F.when(n_clu > 0, F.round(n_cross / n_clu, 4))
            .otherwise(F.lit(0.0))
            .alias("cross_rate"),
        )
        .orderBy("source", "split")
    )


def packing_efficiency_sweep(
    spark: SparkSession,
    sf_dir: str,
    budgets: tuple[int, ...] = (128, 256, 512),
    n_shards: int = 4,
    boundary_tokens: int = 2,
) -> DataFrame:
    """Sequence-budget capacity planning: the packing manifest computed
    at several context budgets and rolled into one per-budget efficiency
    table (sequences produced, token mass, boundary overhead,
    utilization) — the readout that answers "what do we pay for a
    shorter context window" before a pretraining run is configured.

    Composition: one :func:`pack_sequences_for` manifest per budget
    (same sharded kernel the gate checks), each collapsed to one row;
    utilization is raw (token+boundary mass over sequence capacity) and
    may exceed 1 where a long document overflows the sequence it starts
    — the per-sequence capped fill lives in the manifest itself."""
    docs = load_table(spark, sf_dir, "documents")
    out = None
    for budget in budgets:
        m = pack_sequences_for(
            docs,
            budget=budget,
            n_shards=n_shards,
            boundary_tokens=boundary_tokens,
        )
        row = m.agg(
            F.lit(budget).cast("int").alias("budget"),
            F.count(F.lit(1)).cast("long").alias("n_sequences"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("token_mass"),
            (F.sum("n_docs") * boundary_tokens)
            .cast("long")
            .alias("boundary_mass"),
            F.round(
                (F.sum("n_tokens") + F.sum("n_docs") * boundary_tokens)
                / (F.count(F.lit(1)) * budget),
                4,
            ).alias("utilization"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("budget")


def cluster_aware_split_reused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of :func:`cluster_aware_split`: reads the
    persist_shared CC labeling (dedup.shared_components) — identical
    output by the ``components=`` reuse contract, same oracle; benches
    the marginal split cost of the real nightly contract."""
    from project_bigdata_recsys_spark.functions.dedup import shared_components

    return cluster_aware_split(
        spark, sf_dir, components=shared_components(spark, sf_dir)
    )


def split_source_audit_reused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of :func:`split_source_audit`: loads the
    parquet-backed nightly labeling (dedup.shared_components) instead of
    re-running pair generation + CC — identical output by the
    ``components=`` reuse contract, same oracle; benches the marginal
    two-rollup cost of the real nightly contract."""
    from project_bigdata_recsys_spark.functions.dedup import shared_components

    return split_source_audit(
        spark, sf_dir, components=shared_components(spark, sf_dir)
    )


def domain_quota_sample(
    spark: SparkSession,
    sf_dir: str,
    n_domain_buckets: int = 150,
    quota: int = 20,
) -> DataFrame:
    """URL/domain-level dedup with per-registrable-domain quotas — the
    web-corpus curation step that stops a handful of mega-domains from
    dominating the token budget (the C4/RefinedWeb-style per-host cap).
    The driver corpus carries no URL column, so a deterministic synthetic
    domain is derived from the PK (the planted-data discipline): u =
    md5-uniform(doc_id); domain index = floor(u²·n_buckets) — the square
    skews mass toward low indexes, giving the Zipf-ish heavy head real
    host distributions have.

    Scale shape — the part that matters at 100 TB: the per-domain pick
    window runs ONLY over docs of OVER-QUOTA domains.  Domains at or
    under quota (the overwhelming majority of registrable domains on the
    real web) keep everything and never enter the window, so the fat
    partition a wikipedia.org-sized host would create is the only kind
    the window ever sees — and those are exactly the partitions the cap
    then truncates.  Pick order is md5(doc_id) rank (deterministic,
    engine-independent).

    Output per source: docs, distinct domains, kept, dropped."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = hash_uniform(F.col("doc_id"), "domain:")
    # persist: dom feeds the per-domain counts AND the annotate join;
    # the annotated frame feeds the under/over split — unmaterialized,
    # each consumer re-scanned the corpus and re-hashed (4 documents
    # scans; guide §5).  Narrow integer/string columns only.
    dom = persist_tracked(
        docs.withColumn(
            "domain_idx",
            F.floor(u * u * F.lit(float(n_domain_buckets))).cast("long"),
        )
    )
    counts = dom.groupBy("domain_idx").agg(
        F.count(F.lit(1)).cast("long").alias("__n_dom")
    )
    with_n = persist_tracked(dom.join(counts, "domain_idx"))
    under = with_n.filter(F.col("__n_dom") <= quota).withColumn(
        "kept", F.lit(1)
    )
    over = with_n.filter(F.col("__n_dom") > quota)
    w = Window.partitionBy("domain_idx").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    over_ranked = over.withColumn(
        "kept",
        F.when(F.row_number().over(w) <= quota, 1).otherwise(0),
    )
    labeled = under.unionByName(over_ranked.select(*under.columns))
    return (
        labeled.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("domain_idx").cast("long").alias("n_domains"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(1 - F.col("kept")).cast("long").alias("n_dropped"),
        )
        .orderBy("source")
    )


def incremental_domain_quota(
    spark: SparkSession,
    sf_dir: str,
    n_domain_buckets: int = 150,
    quota: int = 20,
) -> DataFrame:
    """Production form of the per-domain quota: admit TODAY'S BATCH
    against yesterday's persisted per-domain admitted counts — first
    come, first served up to the remaining quota — never rescanning the
    processed corpus.  The aggregation sibling of incremental_dedup /
    merge_aggregate_state: state is one (domain, n_admitted) row per
    domain, the batch pays O(batch) + one broadcast-sized state join.

    Driver-corpus stand-ins (no persisted state ships with the gate
    data): prior corpus = doc_id % 7 != 0, today's batch = doc_id % 7
    == 0; prior admissions replay the same md5-rank rule the full-corpus
    :func:`domain_quota_sample` applies, so the state the batch sees is
    exactly what yesterday's run would have persisted.

    Batch admit rule: rank batch docs per domain by md5(doc_id); doc
    admitted iff prior_admitted + rank ≤ quota.  Output per source:
    batch docs, admitted, rejected, and the number of domains the batch
    found already saturated."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = hash_uniform(F.col("doc_id"), "domain:")
    dom = docs.withColumn(
        "domain_idx",
        F.floor(u * u * F.lit(float(n_domain_buckets))).cast("long"),
    )
    prior = dom.filter(F.col("doc_id") % 7 != 0)
    batch = dom.filter(F.col("doc_id") % 7 == 0)

    # yesterday's state: per-domain admitted counts under the same rule
    # (production loads this one-aggregate table from parquet)
    w_prior = Window.partitionBy("domain_idx").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    state = (
        prior.withColumn("rk", F.row_number().over(w_prior))
        .groupBy("domain_idx")
        .agg(
            F.sum(F.when(F.col("rk") <= quota, 1).otherwise(0))
            .cast("long")
            .alias("n_admitted")
        )
    )

    w_batch = Window.partitionBy("domain_idx").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    admitted = (
        batch.withColumn("rk", F.row_number().over(w_batch))
        .join(F.broadcast(state), "domain_idx", "left")
        .withColumn(
            "prior_admitted", F.coalesce("n_admitted", F.lit(0)).cast("long")
        )
        .withColumn(
            "admit",
            F.when(
                F.col("prior_admitted") + F.col("rk") <= quota, 1
            ).otherwise(0),
        )
    )
    return (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batch"),
            F.sum("admit").cast("long").alias("n_admitted"),
            F.sum(1 - F.col("admit")).cast("long").alias("n_rejected"),
            F.countDistinct(
                F.when(F.col("prior_admitted") >= quota, F.col("domain_idx"))
            )
            .cast("long")
            .alias("n_saturated_domains"),
        )
        .orderBy("source")
    )


def domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain reweighting: tilt the training mixture toward
    sources whose documents score WORSE under the corpus unigram LM —
    the one-step, reference-model-free form of the DoReMi recipe (Xie
    et al. 2023: upweight domains with excess loss, since easy domains
    are already learned).  Baseline share = each source's doc share;
    excess = source mean LM score minus corpus mean; new weight
    ∝ share · exp(excess), renormalized.

    Determinism: per-doc scores are the shared 4-dp
    :func:`text.doc_unigram_scores` kernel; source/corpus means are
    fixed-point folds of those 4-dp values; exp() of the 4-dp excess is
    the one libm call (the bm25/ucb precedent), frozen to micro units
    BEFORE the normalizing sum, so the denominator is an exact BIGINT.

    Scale: one corpus tokenization (shared kernel), one per-source
    aggregation (#sources rows), corpus totals as a broadcast 1-row
    aggregate.  No windows, no fact-side joins past the kernel."""
    from project_bigdata_recsys_spark.functions.text import doc_unigram_scores

    scored = doc_unigram_scores(spark, sf_dir)
    per_source = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.round(F.col("score") * 10000).cast("long")).alias("__s4"),
    )
    corpus = per_source.agg(
        F.sum("n_docs").cast("long").alias("__n_all"),
        F.sum("__s4").cast("long").alias("__s4_all"),
    )
    # means as 4-dp fixed-point; excess rounded to 4 dp before exp()
    src_mean = F.round(F.col("__s4") / 10000.0 / F.col("n_docs"), 4)
    all_mean = F.round(F.col("__s4_all") / 10000.0 / F.col("__n_all"), 4)
    excess = F.round(src_mean - all_mean, 4)
    share = F.col("n_docs") / F.col("__n_all")
    w_micro = F.round(F.lit(1_000_000.0) * share * F.exp(excess)).cast(
        "long"
    )
    weighted = per_source.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        F.round(share, 6).alias("base_share"),
        src_mean.alias("avg_logloss"),
        excess.alias("excess"),
        w_micro.alias("__wm"),
    )
    denom = weighted.agg(F.sum("__wm").cast("long").alias("__wsum"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "base_share",
            "avg_logloss",
            "excess",
            F.round(F.col("__wm") / F.col("__wsum"), 6).alias("new_share"),
        )
        .orderBy("source")
    )


def dsir_importance_sample(
    spark: SparkSession, sf_dir: str, n_buckets: int = 512
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    estimate target and raw distributions over HASHED n-gram features
    (unigrams + adjacent bigrams, md5-hashed into ``n_buckets``), weight
    every raw document by its log importance ratio
    ``sum ln(p_target(b)/p_raw(b))`` over its feature occurrences, and
    select the raw documents whose weight is positive (more target-like
    than raw-like).  Target class = ``lang = 'en'`` documents — the
    "curated reference" stand-in; raw = everything else.  This completes
    the data-selection suite next to :func:`domain_reweight` (DoReMi
    group-level tilt) and ``text.quality_lr_score`` (NB mean-weight
    classifier): DSIR is the per-document SUM-of-log-ratios form, the
    log-space product of ratios of the paper.

    Determinism: per-bucket log ratios are ln() of exact integer-derived
    rationals with Laplace smoothing (the bm25/qlr libm precedent),
    frozen to micro fixed point BEFORE the per-document sum, so every
    document weight is an exact BIGINT on both engines.

    Scale: tokenize once; the feature frame feeds both the bucket-count
    pass and the scoring pass (persisted); the weight table is bounded
    by ``n_buckets`` rows — broadcast by construction, it cannot outgrow
    the budget the way a raw vocabulary would.  Two aggregations + one
    broadcast join; no windows, no all-pairs.

    Reference parity anchor: the reference has no data-selection stage;
    this extends its curation surface (SURVEY.md §2.12) with the
    published DSIR recipe re-expressed as two Spark aggregation passes.
    """
    from project_bigdata_recsys_spark.functions.dedup import hash32

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(1, size(__toks) - 1),"
            " i -> concat(element_at(__toks, i), '_',"
            " element_at(__toks, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        "doc_id",
        "source",
        (F.col("lang") == "en").cast("int").alias("__tgt"),
        F.explode(F.concat(F.col("__toks"), bigrams)).alias("term"),
    )
    hashed = persist_tracked(
        base.select(
            "doc_id",
            "__tgt",
            (hash32(F.col("term"), "dsir:") % n_buckets).alias("bucket"),
        )
    )
    counts = hashed.groupBy("bucket").agg(
        F.sum("__tgt").cast("long").alias("ct"),
        F.sum(1 - F.col("__tgt")).cast("long").alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").cast("long").alias("__T"),
        F.sum("cr").cast("long").alias("__R"),
    )
    wts = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.lit(1_000_000.0)
            * (
                F.log((F.col("ct") + 1) / (F.col("__T") + n_buckets))
                - F.log((F.col("cr") + 1) / (F.col("__R") + n_buckets))
            )
        )
        .cast("long")
        .alias("__w"),
    )
    docw = (
        hashed.join(F.broadcast(wts), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("__w").cast("long").alias("__lw"))
    )
    scored = docs.select("doc_id", "source", (F.col("lang") == "en").cast("int").alias("__tgt")).join(
        docw, "doc_id", "left"
    ).withColumn("__lw", F.coalesce(F.col("__lw"), F.lit(0)))
    raw_sel = F.when((F.col("__tgt") == 0) & (F.col("__lw") > 0), 1).otherwise(0)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(1 - F.col("__tgt")).cast("long").alias("n_raw"),
            F.round(F.sum("__lw") / 1_000_000.0 / F.count(F.lit(1)), 6).alias(
                "avg_logw"
            ),
            F.sum(raw_sel).cast("long").alias("n_selected"),
            F.round(
                F.when(
                    F.sum(1 - F.col("__tgt")) > 0,
                    F.sum(raw_sel) / F.sum(1 - F.col("__tgt")),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("sel_frac"),
        )
        .orderBy("source")
    )


def vocab_cover_sources(
    spark: SparkSession, sf_dir: str, steps: int = 5
) -> DataFrame:
    """Greedy maximum-coverage source selection: which ``steps`` sources
    together cover the most vocabulary — the classic (1 − 1/e)-
    approximate set-cover greedy, run over (source, term) sets.  The
    data-mixing question it answers is real: with budget for k source
    pipelines, which ones buy the most linguistic coverage
    (corpus_mixture weights by SIZE; this weighs by MARGINAL NOVELTY —
    a tiny source full of unique vocabulary beats a huge redundant
    one).

    Determinism: pure counts with (gain DESC, source ASC) tie-break;
    each greedy step is exact.

    Scale: one tokenization to a distinct (source, term) frame over
    the unigram+bigram feature space (the dsir/hashing-audit universe —
    the unigram vocabulary alone is coverable by one source); each step is one anti-join + one argmax over
    #sources rows; the covered set is localCheckpointed per step (the
    iterative-loop lineage discipline)."""
    from project_bigdata_recsys_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)
    )
    feats = F.concat(
        F.col("__toks"),
        F.when(
            F.size("__toks") >= 2,
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> concat(element_at(__toks, i), '_',"
                " element_at(__toks, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    st = persist_tracked(
        docs.select("source", F.explode(feats).alias("term")).distinct()
    )
    v_tot = st.select("term").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v_total")
    )
    covered = st.select("term").distinct().limit(0)
    out = None
    for step in range(1, steps + 1):
        gains = (
            st.join(covered, "term", "left_anti")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
        )
        picked = gains.orderBy(
            F.desc("new_terms"), F.asc("source")
        ).limit(1)
        covered = (
            covered.unionByName(
                st.join(
                    F.broadcast(picked.select("source")), "source", "semi"
                ).select("term")
            )
            .distinct()
            .localCheckpoint()
        )
        cov_n = covered.agg(
            F.count(F.lit(1)).cast("long").alias("covered_terms")
        )
        row = (
            picked.crossJoin(F.broadcast(cov_n))
            .crossJoin(F.broadcast(v_tot))
            .select(
                F.lit(step).cast("int").alias("step"),
                "source",
                "new_terms",
                "covered_terms",
                F.round(F.col("covered_terms") / F.col("v_total"), 4).alias(
                    "coverage_frac"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step")


def largest_remainder_allocation(
    spark: SparkSession, sf_dir: str, budget: int = 1000
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer token
    budget across sources proportional to their token mass — the
    exact-integer allocator behind shard budgets, sampling quotas and
    mixture seats (corpus_mixture yields FRACTIONAL weights; training
    jobs need integer counts that sum EXACTLY to the budget, and naive
    rounding loses or invents seats).

    Exactness: pure integer arithmetic — base seats are (B·w) div W,
    remainders are the exact integer residues (B·w − base·W), and the
    leftover seats go to the largest residues under a total tie-break;
    seat totals are pinned to the budget.

    Scale: one token-count aggregation; the apportionment runs on the
    #sources-row frame (bounded window, audited)."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # persist: the #sources-row token counts feed the total AND the
    # quota frame, which itself feeds the leftover fold AND the ranked
    # apportionment — unmaterialized, each consumer re-tokenized the
    # corpus (4 documents scans; guide §5)
    counts = persist_tracked(
        docs.select(
            "source", F.size(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)).alias("tk")
        )
        .groupBy("source")
        .agg(F.sum("tk").cast("long").alias("n_tokens"))
    )
    tot = counts.agg(F.sum("n_tokens").cast("long").alias("w_all"))
    quotas = persist_tracked(counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"({budget} * n_tokens) div w_all").cast("long").alias("base"),
        (
            F.lit(budget) * F.col("n_tokens")
            - F.expr(f"({budget} * n_tokens) div w_all") * F.col("w_all")
        ).cast("long").alias("rem"),
        F.round(F.lit(float(budget)) * F.col("n_tokens") / F.col("w_all"), 4)
        .alias("quota"),
        F.col("w_all"),
    ))
    leftover = quotas.groupBy("w_all").agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("extra_seats")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = quotas.join(F.broadcast(leftover), "w_all").withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    return ranked.select(
        "source",
        "n_tokens",
        "quota",
        F.col("base").alias("base_seats"),
        F.when(F.col("rnk") <= F.col("extra_seats"), 1)
        .otherwise(0)
        .cast("int")
        .alias("extra"),
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("extra_seats"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
    ).orderBy("source")


def quantile_normalize_profile(
    spark: SparkSession, sf_dir: str, grid: int = 1000
) -> DataFrame:
    """Per-mille quantile normalization of document length across
    sources — the batch-effect correction (standard in bioinformatics,
    same move as cross-domain score calibration): every document's
    length maps to the POOLED length at its within-source quantile, so
    after normalization all sources share one distribution and
    downstream length filters stop encoding source identity.  The
    profile shows per source the mean before and after plus the
    post-normalization spread across sources (should collapse toward
    the pooled mean).

    Exactness: within-source ranks are row_numbers under a total
    (value, doc_id) order; the quantile grid index is pure integer
    arithmetic (grid·r + n − 1) div n; pooled grid values are exact
    order statistics off the cumulative histogram; all means are
    integer folds.

    Scale: the rank window partitions per source; the pooled lookup is
    a ``grid``-row broadcast built from the distinct-value histogram —
    per-row mapping is an equi join, never a range join."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.text import global_value_cum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("v")
    )
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "v",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(wn).cast("long").alias("ns"),
    ).withColumn(
        "g",
        F.expr(f"({grid} * r + ns - 1) div ns").cast("long"),
    )
    cum = global_value_cum(docs.select("v"), "v")
    grid_df = spark.range(1, grid + 1).select(F.col("id").alias("g"))
    pooled = (
        grid_df.join(
            cum,
            F.col("__cum")
            >= F.expr(f"CAST(ceil(g * `__n_total` / {grid}.0) AS BIGINT)"),
        )
        .groupBy("g")
        .agg(F.min("v").cast("long").alias("v_mapped"))
    )
    mapped = ranked.join(F.broadcast(pooled), "g")
    per_source = mapped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("v") / F.count(F.lit(1)), 4).alias("mean_pre"),
        F.round(F.sum("v_mapped") / F.count(F.lit(1)), 4).alias("mean_post"),
    )

    per_source = persist_tracked(per_source)
    spread = per_source.agg(
        F.round(
            F.max(F.round(F.col("mean_pre") * 1e4).cast("long")) / 1e4
            - F.min(F.round(F.col("mean_pre") * 1e4).cast("long")) / 1e4,
            4,
        ).alias("pre_spread"),
        F.round(
            F.max(F.round(F.col("mean_post") * 1e4).cast("long")) / 1e4
            - F.min(F.round(F.col("mean_post") * 1e4).cast("long")) / 1e4,
            4,
        ).alias("post_spread"),
    )
    return (
        per_source.crossJoin(F.broadcast(spread))
        .orderBy("source")
    )


def mixture_temperature_sweep(
    spark: SparkSession,
    sf_dir: str,
    alphas: tuple[float, ...] = (0.2, 0.3, 0.5, 0.7, 1.0),
) -> DataFrame:
    """Temperature-sampling sweep over the source mixture — the tuning
    artifact behind the mT5/XLM-R/CC-100 "temperature" knob: for each
    candidate alpha, the sampled share of every source under
    ``w_s ∝ p_s^alpha`` (p_s = the source's token share), the boost
    factor vs natural sampling, and the resulting mixture entropy.  A
    data team reads exactly this table to pick the alpha that upweights
    small sources enough without flattening the mixture (alpha=1 is
    natural sampling; alpha→0 is uniform).  corpus_mixture ships ONE
    fixed alpha (0.5) as a doc-quota sampler; this is the sweep that
    justifies the choice.

    Exactness: p_s is BIGINT/BIGINT token shares; each pow() weight is
    frozen to micro fixed-point BEFORE the normalizing sum (the
    bm25/ucb libm precedent); entropy terms freeze at nano before
    summing.  Scale: ONE corpus tokenization scan reduced to #sources
    rows, then a #alphas-way explode of a tiny frame — all downstream
    joins broadcast."""

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(
            F.filter(tokens(F.col("text")), lambda x: F.length(x) > 0)
        ).alias("n_tokens"),
    )
    # the #sources-row reduction feeds total/fanned/norms/ent — without
    # the persist every lineage branch re-tokenizes the corpus (8 scans)
    sizes = persist_tracked(
        per_doc.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("src_tokens"),
        )
    )
    total = sizes.agg(F.sum("src_tokens").cast("long").alias("total"))
    fanned = (
        sizes.crossJoin(F.broadcast(total))
        .withColumn(
            "alpha", F.explode(F.array(*[F.lit(float(a)) for a in alphas]))
        )
        .withColumn("p", F.col("src_tokens") / F.col("total"))
        .withColumn(
            "w_micro",
            F.round(F.pow("p", F.col("alpha")) * 1e6, 0).cast("long"),
        )
    )
    norms = fanned.groupBy("alpha").agg(
        F.sum("w_micro").cast("long").alias("w_sum")
    )
    shared = fanned.join(F.broadcast(norms), "alpha").withColumn(
        "share", F.col("w_micro") / F.col("w_sum")
    )
    ent = shared.groupBy("alpha").agg(
        F.round(
            F.sum(
                F.round(-F.col("share") * F.log("share") * 1e9, 0).cast(
                    "long"
                )
            )
            / 1e9,
            6,
        ).alias("mix_entropy")
    )
    return (
        shared.join(F.broadcast(ent), "alpha")
        .select(
            "alpha",
            "source",
            "n_docs",
            "src_tokens",
            F.round("p", 6).alias("base_share"),
            F.round("share", 6).alias("sampling_share"),
            F.round(F.col("share") / F.col("p"), 4).alias("boost"),
            "mix_entropy",
        )
        .orderBy("alpha", "source")
    )


def token_budget_planner(
    spark: SparkSession,
    sf_dir: str,
    budget_ratio: float = 1.5,
    max_epochs: int = 4,
) -> DataFrame:
    """Token-budget allocation under a repetition cap — the
    data-constrained-scaling planning step (Muennighoff et al. 2023:
    repeating a source beyond ~4 epochs returns almost nothing): given
    a training budget of ``budget_ratio × corpus tokens``, fill it
    greedily from the best-scoring source down (corpus-unigram LM
    score, the shared doc_unigram_scores kernel — lower loss = more
    fluent), each source contributing at most ``max_epochs`` passes
    over its own tokens.  Output per source: quality rank inputs, the
    allocated tokens, and the resulting epoch count — the table a
    pretraining run's data card publishes.

    Exactness: allocation is pure BIGINT arithmetic under an ordered
    cumulative window (greatest/least clamp); the only floats are the
    4-dp mean score (micro-frozen sums) and the final epochs division.
    Scale: the corpus reduces to #sources rows before the window; the
    unpartitioned cumsum is bounded by source cardinality (audited,
    same class as largest_remainder_allocation)."""
    from project_bigdata_recsys_spark.functions.text import doc_unigram_scores

    docs = load_table(spark, sf_dir, "documents")
    # persisted for the same reason as mixture_temperature_sweep's sizes
    # frame: the total-budget agg branch would re-tokenize the corpus
    sizes = persist_tracked(
        docs.select(
            "source",
            F.size(
                F.filter(tokens(F.col("text")), lambda x: F.length(x) > 0)
            ).alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("src_tokens"))
    )
    quality = (
        doc_unigram_scores(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.round(F.col("score") * 10000, 0).cast("long"))
            .cast("long")
            .alias("s4"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("s4") / 10000.0 / F.col("n_docs"), 4).alias(
                "mean_score"
            ),
        )
    )
    total = sizes.agg(F.sum("src_tokens").cast("long").alias("total"))
    base = (
        sizes.join(quality, "source")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "budget",
            F.floor(F.col("total") * F.lit(float(budget_ratio))).cast(
                "long"
            ),
        )
        .withColumn(
            "cap_tokens",
            (F.lit(int(max_epochs)) * F.col("src_tokens")).cast("long"),
        )
    )
    w = (
        Window.orderBy("mean_score", "source")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    alloc = base.withColumn(
        "cum_before", F.coalesce(F.sum("cap_tokens").over(w), F.lit(0))
    ).withColumn(
        "alloc_tokens",
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("cap_tokens"), F.col("budget") - F.col("cum_before")),
        ).cast("long"),
    )
    return alloc.select(
        "source",
        "mean_score",
        "n_docs",
        F.col("src_tokens").alias("n_tokens"),
        "cap_tokens",
        "alloc_tokens",
        F.round(F.col("alloc_tokens") / F.col("src_tokens"), 4).alias(
            "epochs"
        ),
    ).orderBy("mean_score", "source")


def training_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source DATA CARD a corpus release ships (Datasheets for
    Datasets / Dolma precedent): one row per source with the numbers a
    consumer of the corpus needs before training on it — volume (docs,
    tokens), exact-duplicate exposure, content quality (corpus-unigram
    LM score), PII and credential exposure rates, and language-mix
    entropy.  Composes six existing oracle-green kernels into ONE
    relation; every constituent stays individually gated, this is the
    release artifact.

    Population: the planted corpus (documents plus the standard
    +1,000,000 duplicate planting) — the 'as ingested' view in which
    duplicate exposure is non-vacuous; the LM quality column joins the
    shared unigram memo, which scores the original snapshot (unique
    content), and is reported per source over those docs.

    Scale: three corpus scans (stats+language mix, fingerprints,
    PII+secret regex — text never shuffles; the dup join is
    digest-only) plus the #sources-row memo rollup; all per-source
    frames meet in broadcast joins."""
    from project_bigdata_recsys_spark.functions.dedup import planted_id
    from project_bigdata_recsys_spark.functions.text import (
        PII_PATTERNS,
        SECRET_PATTERNS,
        doc_unigram_scores,
        plant_pii,
        plant_secrets,
    )

    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    # md5-uniform ~10% planting (salt "card:"), NOT the %10 convention:
    # doc_id assignment correlates with source in the synthetic corpus
    # (doc_id % 10 == 0 lands in 2 of 20 sources), so the modular plant
    # would leave 18 sources' dup_rate vacuously zero
    corpus = docs.unionByName(
        docs.filter(hash_uniform(F.col("doc_id"), "card:") < 0.1).select(
            planted_id("doc_id").alias("doc_id"),
            "source",
            "lang",
            "text",
        )
    )

    # scan A: volume + language mix (entropy nano-frozen, the
    # mixture_temperature_sweep discipline)
    lang_counts = persist_tracked(
        corpus.select(
            "source",
            "lang",
            F.size(
                F.filter(tokens(F.col("text")), lambda x: F.length(x) > 0)
            ).alias("n_tokens"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_tokens").cast("long").alias("toks"),
        )
    )
    src_tot = lang_counts.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )
    p = F.col("n") / F.col("n_docs")
    stats = (
        lang_counts.join(F.broadcast(src_tot), "source")
        .groupBy("source", "n_docs", "n_tokens")
        .agg(
            F.round(
                F.sum(F.round(-p * F.log(p) * 1e9, 0).cast("long")) / 1e9, 6
            ).alias("lang_entropy")
        )
    )

    # scan B: exact-duplicate exposure (digest-only shuffle)
    fps = corpus.select("source", F.sha2("text", 256).alias("fp"))
    fp_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("cnt"))
    dups = (
        fps.join(fp_counts, "fp")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_docs")
        )
    )

    # scan C: PII + credential exposure in one planted projection
    exposed = plant_pii(plant_secrets(corpus))
    pii_any = sum(
        (
            F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
            for pat in PII_PATTERNS.values()
        ),
        F.lit(0),
    )
    sec_any = sum(
        (
            F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
            for pat in SECRET_PATTERNS.values()
        ),
        F.lit(0),
    )
    exposure = (
        exposed.select(
            "source",
            (pii_any > 0).cast("int").alias("has_pii"),
            (sec_any > 0).cast("int").alias("has_secret"),
        )
        .groupBy("source")
        .agg(
            F.sum("has_pii").cast("long").alias("pii_docs"),
            F.sum("has_secret").cast("long").alias("secret_docs"),
        )
    )

    # memo rollup: LM quality over the original snapshot
    quality = (
        doc_unigram_scores(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.round(F.col("score") * 10000, 0).cast("long"))
                / 10000.0
                / F.count(F.lit(1)),
                4,
            ).alias("mean_lm_score")
        )
    )

    return (
        stats.join(F.broadcast(dups), "source")
        .join(F.broadcast(exposure), "source")
        .join(F.broadcast(quality), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "dup_docs",
            F.round(F.col("dup_docs") / F.col("n_docs"), 6).alias("dup_rate"),
            "mean_lm_score",
            "pii_docs",
            F.round(F.col("pii_docs") / F.col("n_docs"), 6).alias("pii_rate"),
            "secret_docs",
            F.round(F.col("secret_docs") / F.col("n_docs"), 6).alias(
                "secret_rate"
            ),
            "lang_entropy",
        )
        .orderBy("source")
    )


def ipf_weight_calibration(
    spark: SparkSession,
    sf_dir: str,
    n_iters: int = 3,
    unit: int = 1_000_000,
) -> DataFrame:
    """Iterative proportional fitting (raking) of per-cell corpus
    weights so the weighted (lang, source) margins approach uniform
    targets — the survey-statistics calibration step a corpus mixer
    runs when the crawl over-represents some language × source cells
    and the training mix must honor BOTH axis quotas at once
    (corpus_mixture handles one axis; IPF reconciles two).

    Determinism/exactness (the all-integer IPF): weights live in micro
    units (``n_docs × unit``), axis targets are a largest-remainder
    integer split of the grand total (the largest_remainder_allocation
    rule), and every scaling step is an exact integer floor division
    ``w·t ÷ margin`` — Spark computes it as DECIMAL(38,0) ``div`` and
    DuckDB as HUGEINT ``//``, the same integers on both engines, so the
    unrolled ``n_iters`` rounds are hash-identical with no float
    anywhere.

    Scale: the ONLY full-data pass is the initial (lang, source)
    count; every IPF round then runs on the |langs|·|sources| cell
    table (bounded by contract — axis cardinalities, not corpus size),
    including its single-partition rank windows.  At 100 TB this is
    one scan + driver-scale refinement, the same shape as
    token_budget_planner."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return ipf_from_cells(cells, n_iters=n_iters, unit=unit)


def ipf_from_cells(
    cells: DataFrame, n_iters: int = 3, unit: int = 1_000_000
) -> DataFrame:
    """The IPF scaling kernel over a (lang, source, n_docs) cell frame —
    shared by the batch form and the streaming cell-ledger fold (count
    cells merge exactly across micro-batches, so the folded frame feeds
    the identical iterations).

    The cell frame is persisted before fan-out: it has TWO consumers
    (the grand-total/axis-cardinality aggregate and the iteration
    chain), and without the persist each consumer re-derives it from
    the corpus scan — a plan-shape test pins the single-scan contract
    (tests/test_round13c.py)."""

    cells = persist_tracked(
        cells.withColumn("w", (F.col("n_docs") * F.lit(unit)).cast("long"))
    )
    totals = cells.agg(
        F.sum("w").cast("long").alias("wt"),
        F.countDistinct("lang").cast("long").alias("nl"),
        F.countDistinct("source").cast("long").alias("ns"),
    )
    cur = cells.crossJoin(F.broadcast(totals))
    # largest-remainder uniform targets per axis: the first (wt % k)
    # values in lexicographic order get one extra micro-unit
    lang_rk = F.dense_rank().over(Window.orderBy("lang"))
    src_rk = F.dense_rank().over(Window.orderBy("source"))
    cur = cur.withColumn(
        "t_l",
        F.expr("wt div nl")
        + F.when(lang_rk <= F.col("wt") % F.col("nl"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "t_s",
        F.expr("wt div ns")
        + F.when(src_rk <= F.col("wt") % F.col("ns"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    scale = (
        "CAST(w AS DECIMAL(38,0)) * CAST({t} AS DECIMAL(38,0))"
        " div CAST(GREATEST(m, 1) AS DECIMAL(38,0))"
    )
    for _ in range(n_iters):
        cur = (
            cur.withColumn("m", F.sum("w").over(Window.partitionBy("lang")))
            .withColumn("w", F.expr(scale.format(t="t_l")))
            .drop("m")
        )
        cur = (
            cur.withColumn("m", F.sum("w").over(Window.partitionBy("source")))
            .withColumn("w", F.expr(scale.format(t="t_s")))
            .drop("m")
        )
    return cur.select(
        "lang",
        "source",
        "n_docs",
        F.col("w").cast("long").alias("weight_micro"),
    ).orderBy("lang", "source")
