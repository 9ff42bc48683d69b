"""Deduplication operators over the documents corpus (SURVEY.md §2.12).

Five dedup families, each with the scale strategy a 100 TB corpus needs:

  exact        sha/groupBy — one shuffle keyed by hash; no full-text shuffle
               (group on the 32-byte digest, carry min(doc_id)).
  minhash-LSH  shingle → MinHash signature → band-bucket join — candidate
               pairs only meet inside a bucket, so the cross product never
               materializes.  Uses pyspark.ml's MinHashLSH.
  simhash      64-bit weighted-token hash; near-dups differ in few bits.
               Banding on 4x16-bit keys turns Hamming search into equi-joins.
  ngram-jaccard exact Jaccard on word n-gram shingle sets via explode+join —
               the verification pass run *after* LSH candidate generation.
  embedding    cosine near-dup over the embeddings table (see similarity.py).

Exact + jaccard are DuckDB-oracle-checkable; LSH/simhash are probabilistic
(declared rows-only to the driver, golden-tested in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.text import tokens


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
def exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: keep the min doc_id as the canonical copy.

    Scale: groupBy(sha2) shuffles 32-byte digests + ids, never the text.
    Returned as (canonical doc_id, n_copies) for every text that appears
    more than once, plus the distinct-corpus size check is a trivial
    follow-up count.

    The driver corpus has no exact duplicates, which would make this a
    vacuous always-empty check — so the query plants a deterministic
    duplicate set (every doc_id % 10 == 0 re-appears under doc_id +
    1,000,000) and must find exactly those groups.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    return (
        corpus.select(F.sha2("text", 256).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The actual dedup transform: one row per distinct text, keeping the
    smallest id (deterministic winner, unlike dropDuplicates which keeps an
    arbitrary row)."""
    w_key = F.sha2(F.col(text_col), 256)
    winners = (
        docs.select(w_key.alias("__fp"), F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return docs.join(winners, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# Word n-gram shingles + exact Jaccard (the verify pass)
# --------------------------------------------------------------------------
def shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (built-in only:
    split + transform over offsets + filters)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    # guard: Spark's sequence(0, -1) counts *down*, so short docs need an
    # explicit empty array rather than a negative-length sequence
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(0), n_tok - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


#: Default hot-shingle document-frequency cap.  A shingle shared by more
#: than this many documents (stopword-only grams, boilerplate) generates
#: O(df²) candidate pairs while carrying no discriminative signal; at the
#: driver SFs no shingle comes near it, so the default is a no-op there.
DEFAULT_MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.20,
    max_doc_freq: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all document pairs above a
    threshold (see :func:`ngram_jaccard_pairs_for`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_for(
        docs, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )


def ngram_jaccard_pairs_for(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.20,
    max_doc_freq: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all document pairs above a
    threshold, computed distributively:

        explode shingles -> equi-join on shingle -> count intersections
        -> join per-doc shingle counts -> jaccard = inter/(|A|+|B|-inter)

    Scale: documents are grouped per shingle and pairs generated with
    array combinatorics — the O(n²) cross product never exists, the
    expensive tokenize+shingle explode runs ONCE (a naive
    self-join-on-shingle plans the explode subtree four times: two join
    sides + two size branches — measured ~1.4x slower), and per-doc sizes
    come from ``F.size`` on the shingle array with no shuffle at all.

    Hot shingles (stopword-only grams, boilerplate headers) are the skew
    risk: a shingle shared by df documents generates df(df-1)/2 pair rows
    — quadratic in generated ROWS, so AQE skew-join cannot help (the
    blowup is not in partition sizes).  ``max_doc_freq`` drops shingles
    whose document frequency exceeds the cap before pair generation,
    bounding any single shingle's contribution; dropped shingles still
    count in the per-doc set sizes, so Jaccard for pairs that shared a
    dropped shingle is (slightly, conservatively) underestimated — the
    standard df-pruning trade for near-dup detection.  ``None`` disables
    the cap (exact oracle semantics).  This same plan is the LSH
    verification pass.
    """
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("shingle")
    ).filter(F.length("shingle") > 0)
    # sizes: array length per doc — no explode, no shuffle
    sizes = docs.select(
        "doc_id",
        F.size(F.filter(shingles(F.col("text"), n), lambda s: F.length(s) > 0)).alias(
            "n_shingles"
        ),
    )

    # all (a < b) doc pairs sharing each shingle, via one groupBy + HOF
    doc_lists = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_doc_freq is not None:
        doc_lists = doc_lists.filter(F.size("ds") <= max_doc_freq)
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    inter = (
        doc_lists.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path for near-dup candidate generation)
# --------------------------------------------------------------------------
def minhash_candidates(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs.

    shingle set -> HashingTF sparse vector -> MinHashLSH signatures ->
    approxSimilarityJoin at (1 - jaccard_threshold) Jaccard *distance*.

    Scale: LSH banding means each row is replicated num_hash_tables times
    and joined on (table, bucket) — linear in corpus size, never quadratic.
    Probabilistic → declared rows-only to the correctness driver; exactness
    is covered by the ngram_jaccard verify pass above (run it on these
    candidates in production).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    with_sh = docs.select("doc_id", shingles(F.col("text"), n).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(with_sh)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("est_jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# SimHash (64-bit) with banded bucketing
# --------------------------------------------------------------------------
def simhash_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document, set-based for whole-stage codegen:

        explode distinct tokens -> xxhash64 once per token ->
        groupBy(doc) with 64 columnar SUMs of +/-1 bit votes ->
        sign of each sum assembles the fingerprint long.

    This shape keeps everything in Tungsten hash aggregation (one shuffle
    keyed by doc id, partial aggregation map-side) — measured ~5x faster
    than a higher-order-function fold over per-token vote arrays, and the
    gap widens with document length.  Docs with zero tokens drop out
    (no rows after explode); guard upstream if empty docs must keep a
    fingerprint.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = F.xxhash64("tok")
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(64):
        weight = (
            F.lit(-(1 << 63)).cast("long")
            if b == 63
            else F.shiftleft(F.lit(1).cast("long"), b)
        )
        out = out + F.when(F.col(f"v{b}") > 0, weight).otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, out.alias("simhash"))


def simhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint + 4x16-bit band keys per document.

    Near-dup search at scale: self-join on each band key (4 equi-joins,
    union, distinct) finds every pair within Hamming distance 3 of each
    other with certainty (pigeonhole: ≤3 differing bits can't hit all 4
    bands) — no pairwise scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = simhash_features(docs)
    out = sh
    for band in range(4):
        out = out.withColumn(
            f"band{band}",
            F.shiftrightunsigned(F.col("simhash"), band * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out.orderBy("doc_id")


#: Default per-band-key group cap: a band key shared by df docs generates
#: O(df²) candidate pairs.  No key approaches this at the driver SFs
#: (no-op there); at corpus scale it bounds degenerate keys (e.g. the
#: near-constant band of boilerplate-heavy or near-empty docs).
DEFAULT_MAX_BAND_KEY_DOCS = 10_000


def simhash_near_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    max_band_key_docs: int | None = DEFAULT_MAX_BAND_KEY_DOCS,
) -> DataFrame:
    """Banded SimHash near-duplicate pairs (see
    :func:`simhash_near_pairs_for`)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs_for(
        docs, max_hamming=max_hamming, max_band_key_docs=max_band_key_docs
    )


def simhash_near_pairs_for(
    docs: DataFrame,
    max_hamming: int = 3,
    max_band_key_docs: int | None = DEFAULT_MAX_BAND_KEY_DOCS,
) -> DataFrame:
    """Banded SimHash near-duplicate pairs, verified by exact popcount on
    the XOR of fingerprints.

    Shape: explode each doc into its 4 (band_no, key) rows, group docs
    per band key, generate pairs with array combinatorics.  The expensive
    fingerprint subtree runs ONCE — the earlier 4-way self-join form
    planned it once per band per join side (8x; measured ~2.6x slower
    end-to-end).  Same recall guarantee (pigeonhole over 4x16-bit bands:
    any pair within Hamming distance 3 shares at least one band).

    Skew (100 TB): a degenerate band key shared by df docs inflates its
    pair array to df(df-1)/2 generated rows — quadratic in ROWS, beyond
    AQE's reach.  ``max_band_key_docs`` drops band-key groups larger than
    the cap before pair generation.  Recall trade: a pair meeting ONLY in
    a dropped band is missed; pairs within the Hamming budget usually
    agree on several bands, and a >cap-sized identical band is precisely
    the non-discriminative case (near-identical boilerplate) that
    upstream exact dedup already collapses.  ``None`` disables the cap.
    """
    sh = simhash_features(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_no"),
                F.shiftrightunsigned(F.col("simhash"), band * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("k"),
            )
            for band in range(4)
        ]
    )
    exploded = sh.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band_no"), F.col("bk.k"))
    doc_lists = (
        exploded.groupBy("band_no", "k")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "simhash"))
            ).alias("ds")
        )
        .filter(F.size("ds") >= 2)
    )
    if max_band_key_docs is not None:
        doc_lists = doc_lists.filter(F.size("ds") <= max_band_key_docs)
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cands = (
        doc_lists.select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.simhash").alias("sim_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    xor = F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    return (
        cands.withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Near-dup clusters: connected components over candidate pairs
# --------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster near-duplicate pairs into components (doc_id → cluster_id
    = min doc_id in its component) by iterative min-label propagation —
    the step that turns pairwise similarity output into deduplicatable
    groups, which none of the pairwise operators alone provide.

    Algorithm: each round every vertex adopts the minimum label among
    itself and its neighbors (one hop), then a pointer-halving shortcut
    replaces each label with its label's label — plain neighbor
    propagation alone is O(diameter) rounds (a 30-edge chain blows a
    20-round budget; caught by test), the shortcut makes it
    O(log diameter).  Near-dup graphs are unions of small cliques, so
    2-3 rounds typical.

    Scale notes:
      - Each round is two hash-join shuffles (labels ⨝ edges) + one
        aggregation; edges are the candidate pairs (already pruned by
        banding), NOT all-pairs.
      - localCheckpoint() per round truncates the lineage — without it
        the plan doubles every iteration and the driver OOMs planning
        round ~15.
      - The convergence check is a driver-side count of changed labels
        (one scalar per round, not a collect of data).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer halving: label <- label(label) — every label value is a
        # vertex id, so the self-join lookup always resolves
        lbl_map = propagated.select(
            F.col("id").alias("m_id"), F.col("label").alias("m_label")
        )
        shortcut = propagated.join(
            lbl_map, propagated.label == lbl_map.m_id, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("m_label"), F.col("label"))
            ).alias("label"),
        )
        new_labels = shortcut.localCheckpoint()
        n_changed = (
            labels.select("id", F.col("label").alias("old_label"))
            .join(new_labels, "id")
            .filter(F.col("label") < F.col("old_label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: banded SimHash pairs → connected
    components → cluster summary (rows-only: SimHash is hash-dependent)."""
    pairs = simhash_near_pairs(spark, sf_dir)
    comps = connected_components(pairs)
    return (
        comps.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("canonical_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
    )
