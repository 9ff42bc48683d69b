"""Similarity search over the embeddings table (SURVEY.md §2.12).

Embedding column is ``array<float>`` (64-dim in the driver data).  Three
tiers:

  brute-force   exact cosine top-k — F.zip_with/F.aggregate dot products,
                JVM-side, no Python.  O(n·d) per query: the correctness
                baseline and the oracle-checkable path.
  LSH-bucketed  BucketedRandomProjectionLSH (pyspark.ml) — sub-linear
                candidate generation for euclidean-normalized vectors.
  IVF-style     coarse k-means-ish partition via random-projection sign
                buckets; queries probe only their bucket (+neighbors).

Also: embedding-cosine near-duplicate pairs (the 5th dedup family of
functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, computed in double precision
    JVM-side (zip_with + aggregate — no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_brute_force(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for one stored query vector against the corpus.

    Scale: the query row is a broadcast (1 row); the scan is
    embarrassingly parallel; top-k is TakeOrderedAndProject (per-partition
    heaps, no global sort).  This is the exact baseline ANN variants are
    validated against.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.crossJoin(F.broadcast(query))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.40
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs).

    O(n²) by construction — correct at test SFs and the verification
    oracle for the LSH variant below, which is the 100 TB path.  The
    self-join condition vec_id < vec_id halves the work; AQE picks the
    join strategy.

    Each side is L2-normalized BEFORE the join (n rows), so the per-pair
    work inside the n² loop is a single dot product — measured ~3x faster
    than computing cosine (dot + two norms) per pair.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select("vec_id", _normalized().alias("unit"))
    a = normed.select(F.col("vec_id").alias("id_a"), F.col("unit").alias("unit_a"))
    b = normed.select(F.col("vec_id").alias("id_b"), F.col("unit").alias("unit_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("unit_a"), F.col("unit_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def embedding_near_dup_pairs_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.40,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """The SCALE path for embedding near-dup detection: candidate pairs
    meet only inside an RP-LSH (table, bucket) cell, then exact cosine
    verification — linear-ish in corpus size where
    :func:`embedding_near_dup_pairs` (the declared exact oracle form) is
    O(n²).  Every reported similarity is the true cosine; LSH only
    bounds WHICH pairs are examined, so precision is exact and the
    (deterministic) recall loss is pairs sharing no bucket in any table.

    Reuses the deterministic Rademacher bucket kernel (rp_index_rows —
    DuckDB reproduces every bucket bit) and the dedup family's hybrid
    pair generator (array combinatorics for small cells, explode+join
    above the cap — the same skew bound banded minhash uses).
    """
    from project_bigdata_recsys_spark.functions.dedup import bucket_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    buckets = rp_index_rows(emb, n_tables, n_planes)
    doc_lists = (
        buckets.groupBy("t", "bucket")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    cands = (
        bucket_pairs(doc_lists, ["t", "bucket"])
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the normalized vectors feed BOTH verification join
    # sides — unmaterialized, each side re-scanned the corpus and
    # re-ran the norm fold (guide §5)
    normed = persist_tracked(
        emb.select("vec_id", _normalized().alias("unit"))
    )
    a = normed.select(F.col("vec_id").alias("id_a"), F.col("unit").alias("unit_a"))
    b = normed.select(F.col("vec_id").alias("id_b"), F.col("unit").alias("unit_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("unit_a"), F.col("unit_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def embedding_dup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.40, use_lsh: bool = False
) -> DataFrame:
    """The fifth dedup family taken to completion: embedding-cosine
    near-dup pairs → connected components → cluster summary — the same
    pairs→clusters composition the text families get via
    dedup.near_dup_clusters, so semantic-duplicate groups (paraphrases,
    translations) are deduplicatable, not just detectable.

    ``use_lsh=False`` (the gate/oracle form) feeds the exact all-pairs
    stage; ``use_lsh=True`` is the corpus-scale path — the same clusters
    from :func:`embedding_near_dup_pairs_lsh` banded candidates, no n²
    stage anywhere (precision of the pair stage is exact either way)."""
    from project_bigdata_recsys_spark.functions.dedup import connected_components

    pair_fn = embedding_near_dup_pairs_lsh if use_lsh else embedding_near_dup_pairs
    pairs = pair_fn(spark, sf_dir, threshold)
    comps = connected_components(pairs, a_col="id_a", b_col="id_b")
    return (
        comps.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("canonical_id"),
            F.max("doc_id").alias("max_vec_id"),
        )
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
    )


def _normalized(emb_col: str = "embedding") -> Column:
    n = l2_norm(F.col(emb_col))
    return F.transform(F.col(emb_col), lambda x: x.cast("double") / n)


def knn_lsh(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH on
    L2-normalized vectors (euclidean distance on the unit sphere is
    monotone in cosine: cos = 1 - d²/2).

    Scale: signatures are computed in one pass; approxNearestNeighbors
    probes matching buckets only.  Probabilistic → rows-only check;
    validated against knn_brute_force in tests (recall@k assertion).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    # persist: the normalized vector frame feeds the LSH fit, the query
    # lookup, and the neighbor probe — each re-ran the normalize scan
    # (9 embeddings scans through MLlib's internals; guide §5)
    from project_bigdata_recsys_spark.caching import persist_tracked

    normed = persist_tracked(
        emb.select(
            "vec_id", "label", array_to_vector(_normalized()).alias("features")
        )
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(normed)
    query_row = normed.filter(F.col("vec_id") == query_vec_id).head()
    if query_row is None:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    neighbors = model.approxNearestNeighbors(
        normed.filter(F.col("vec_id") != query_vec_id), query_row.features, k
    )
    return neighbors.select(
        "vec_id",
        "label",
        F.round(1.0 - F.col("distCol") * F.col("distCol") / 2.0, 6).alias("cos_sim"),
    ).orderBy(F.desc("cos_sim"), F.asc("vec_id"))


def knn_lsh_profile(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    min_recall: float = 0.5,
) -> DataFrame:
    """Driver-checkable profile of the BucketedRandomProjectionLSH path.

    pyspark.ml's LSH draws its hyperplanes from an engine-private RNG, so
    the raw neighbor rows of :func:`knn_lsh` cannot be reproduced by a SQL
    oracle.  Checkable instead: exact anchors the oracle recomputes
    (corpus size; mean cosine of the TRUE top-k, which the DuckDB oracle
    computes with list_dot_product exactly as the knn_brute_force oracle
    does) plus quality booleans asserted as literal TRUE:

      recall_ok     |LSH top-k ∩ exact top-k| / k >= min_recall
                    (same bar as tests/test_dedup_similarity.py)
      sims_exact_ok the cosines LSH reports (1 - d²/2 on unit vectors)
                    match brute-force cosines to 1e-5 for its returned ids
      k_rows_ok     LSH returned exactly k neighbors
    """
    exact = knn_brute_force(spark, sf_dir, query_vec_id, k).select(
        "vec_id", F.col("cos_sim").alias("exact_sim")
    )
    approx = knn_lsh(spark, sf_dir, query_vec_id, k).select(
        "vec_id", F.col("cos_sim").alias("lsh_sim")
    )
    emb = load_table(spark, sf_dir, "embeddings")

    anchors = exact.agg(
        F.round(F.avg("exact_sim"), 6).alias("exact_topk_avg_sim")
    ).crossJoin(emb.agg(F.count(F.lit(1)).alias("n_corpus")))
    overlap = approx.join(exact, "vec_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    # LSH-reported cosine must equal the true cosine for every id it
    # returned (the approximation is in WHICH ids, never in the values)
    true_sims = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("q_emb"))
        .crossJoin(emb.select("vec_id", "embedding"))
        .select("vec_id", cosine(F.col("embedding"), F.col("q_emb")).alias("true_sim"))
    )
    sim_check = approx.join(true_sims, "vec_id").agg(
        F.count(F.lit(1)).alias("n_lsh"),
        (F.max(F.abs(F.col("lsh_sim") - F.col("true_sim"))) <= 1e-5).alias(
            "sims_exact_ok"
        ),
    )
    return (
        anchors.crossJoin(overlap)
        .crossJoin(sim_check)
        .select(
            F.col("n_corpus").cast("long").alias("n_corpus"),
            "exact_topk_avg_sim",
            (F.col("n_overlap") >= F.lit(min_recall) * k).alias("recall_ok"),
            "sims_exact_ok",
            (F.col("n_lsh") == k).alias("k_rows_ok"),
        )
    )


def ivf_bucketed_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 4,
) -> DataFrame:
    """IVF-style ANN with sign-of-random-projection coarse buckets.

    Partition the corpus into 2^n_planes buckets by the sign pattern of
    n_planes fixed pseudo-random hyperplanes (derived deterministically
    from dimension index — no RNG, reproducible).  A query probes only its
    own bucket.  At 100 TB: write the corpus bucketed/partitioned by
    bucket_id once, then each query reads one partition — partition
    pruning does the candidate selection.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def plane_sign(p: int):
        # closure (not a default arg: Spark counts lambda params strictly)
        return lambda x, i: x.cast("double") * F.when(
            F.pmod(i * 31 + p * 17, 2) == 0, 1.0
        ).otherwise(-1.0)

    def bucket_id(col: Column) -> Column:
        planes = []
        for p in range(n_planes):
            # deterministic pseudo-plane: alternating +/- pattern keyed by
            # (dim*31 + p) parity — fixed, engine-agnostic
            proj = F.aggregate(
                F.zip_with(col, F.sequence(F.lit(0), F.size(col) - 1), plane_sign(p)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            planes.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = planes[0]
        for pl in planes[1:]:
            out = out + pl
        return out

    bucketed = emb.withColumn("bucket", bucket_id(F.col("embedding")))
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_centroid_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat ANN with DATA-SAMPLED centroids: Voronoi cells around
    ``n_cells`` corpus vectors drawn by md5 rank (IVF training on a
    random subset, zero Lloyd rounds — iterating means would make cell
    means order-of-summation floats no SQL oracle could reproduce; the
    sampled centroids are data values, bit-exact in both engines).

    Complements :func:`ivf_bucketed_knn` (fixed sign-hyperplane cells):
    sampled centroids ADAPT to the corpus distribution — clustered
    corpora get proportionally more cells where the mass is, the known
    weakness of data-oblivious sign buckets.

    Shape: seed draw is a TakeOrderedAndProject over md5 (per-partition
    heaps — no global sort); assignment is one broadcast cross join
    (n_cells per row) + per-vector argmax window; the query probes its
    ``n_probe`` nearest cells and reranks exactly.  At 100 TB, persist
    the assignment partitioned by cell exactly like build_ann_index and
    the probe becomes partition pruning.
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    md5_key = F.md5(F.col("vec_id").cast("string"))
    seeds = emb.orderBy(md5_key, "vec_id").limit(n_cells)
    w_cell = Window.orderBy(F.md5(F.col("seed_id").cast("string")), "seed_id")
    centroids = (
        seeds.select(
            F.col("vec_id").alias("seed_id"), F.col("embedding").alias("c_emb")
        )
        .withColumn("cell", F.row_number().over(w_cell))
    )
    # hoist each side's norm out of the cross join (float-identical —
    # same expression, materialized once instead of once per pair)
    with_norm = emb.withColumn("v_norm", l2_norm(F.col("embedding")))
    cent_norm = centroids.withColumn("c_norm", l2_norm(F.col("c_emb")))
    assign = with_norm.crossJoin(F.broadcast(cent_norm)).select(
        "vec_id",
        "label",
        "cell",
        F.round(
            dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("v_norm") * F.col("c_norm")),
            6,
        ).alias("cs"),
    )
    w_best = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
    ranked = assign.withColumn("rn", F.row_number().over(w_best))
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "label", "cell")
    q_cells = ranked.filter(
        (F.col("vec_id") == query_vec_id) & (F.col("rn") <= n_probe)
    ).select("cell")
    cand = (
        cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


#: Fixed-point scale for Lloyd centroid means: component sums are taken
#: over ``round(x * 1e6)`` BIGINTs, so the per-cell sum is exact integer
#: arithmetic — order-independent, hence bit-identical across engines and
#: shuffle schedules — and the mean is ONE double division at the end.
_LLOYD_SCALE = 1_000_000


def lloyd_assignments(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = 8,
    n_iters: int = 2,
) -> DataFrame:
    """Lloyd-iterated k-means cell assignment over the embeddings table
    — the shared kernel of :func:`ivf_lloyd_knn` and the SemDeDup-style
    embedding-cluster dedup (:func:`semdedup_profile`).  Returns the
    fully-ranked frame (vec_id, label, embedding, cell, cs, rn): rn = 1
    is each vector's home cell, rn ≤ p is its p-probe set.

    Staying oracle-checkable is the trick: a naive float mean is
    order-of-summation dependent (no SQL oracle could reproduce a
    shuffle-scheduled sum), so per-dimension sums run in FIXED-POINT —
    ``round(x*1e6)`` BIGINTs, exact integer addition in any order — and
    the centroid component is one double division ``s/(n*1e6)``, which
    DuckDB computes bit-identically.  Cells that lose every member keep
    their previous centroid (both engines apply the same rule).

    Driver-side state is MODEL-sized, never data-sized: each round
    collects n_cells × dim scalars (the centroids), exactly like the
    query_ann_index probe collect.  Per round the corpus does one
    broadcast cross join (n_cells rows) + argmax window + one fixed-point
    aggregation — all distributed; at 100 TB persist the final assignment
    partitioned by cell like build_ann_index and the probe is partition
    pruning."""
    import hashlib

    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")

    # seed draw: md5-ranked corpus vectors (TakeOrderedAndProject), then
    # cell ids by md5 rank of the seed id — identical to ivf_centroid_knn
    md5_key = F.md5(F.col("vec_id").cast("string"))
    seed_rows = (
        emb.orderBy(md5_key, "vec_id")
        .limit(n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    seed_rows.sort(
        key=lambda r: (hashlib.md5(str(r.vec_id).encode()).hexdigest(), r.vec_id)
    )
    centroids = [
        (cell + 1, [float(x) for x in r.embedding])
        for cell, r in enumerate(seed_rows)
    ]

    def _assign(cent_rows: list) -> DataFrame:
        cent_df = spark.createDataFrame(
            cent_rows, "cell int, c_emb array<double>"
        ).withColumn("c_norm", l2_norm(F.col("c_emb")))
        # precompute each side's norm ONCE (float-identical to the inline
        # form — same expression, materialized): without this the vector
        # norm re-evaluates once per (row, centroid) pair, n_cells× the
        # work, every assignment pass
        with_norm = emb.withColumn("v_norm", l2_norm(F.col("embedding")))
        scored = with_norm.crossJoin(F.broadcast(cent_df)).select(
            "vec_id",
            "label",
            "embedding",
            "cell",
            F.round(
                dot(F.col("embedding"), F.col("c_emb"))
                / (F.col("v_norm") * F.col("c_norm")),
                6,
            ).alias("cs"),
        )
        w_best = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
        return scored.withColumn("rn", F.row_number().over(w_best))

    for _ in range(n_iters):
        assigned = _assign(centroids).filter(F.col("rn") == 1)
        sums = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.round(F.col("x").cast("double") * _LLOYD_SCALE, 0).cast(
                        "long"
                    )
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # bounded: n_cells x dim rows of scalars
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r.cell, {})[r.pos] = (r.s, r.n)
        centroids = [
            (
                cell,
                [
                    by_cell[cell][p][0] / (by_cell[cell][p][1] * float(_LLOYD_SCALE))
                    for p in sorted(by_cell[cell])
                ]
                if cell in by_cell
                else prev,  # empty cell keeps its previous centroid
            )
            for cell, prev in centroids
        ]

    return _assign(centroids)


def ivf_lloyd_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
) -> DataFrame:
    """IVF-flat ANN with LLOYD-ITERATED centroids — the recall upgrade
    over :func:`ivf_centroid_knn`'s zero-round sampled seeds: ``n_iters``
    k-means rounds move the cells onto the corpus distribution, so
    clustered corpora stop splitting a natural cluster across seed cells.
    The assignment kernel (and its oracle-parity contract) lives in
    :func:`lloyd_assignments`."""
    emb = load_table(spark, sf_dir, "embeddings")
    ranked = lloyd_assignments(spark, sf_dir, n_cells, n_iters)
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "label", "cell")
    q_cells = ranked.filter(
        (F.col("vec_id") == query_vec_id) & (F.col("rn") <= n_probe)
    ).select("cell")
    cand = (
        cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


#: Rademacher plane weight: +1/-1 chosen by a Knuth-multiplier scramble of
#: (dim, plane, table) — sign-random-projection LSH with a weight function
#: both engines compute exactly (no RNG, no stored plane matrix).
_RP_KNUTH = 2_654_435_761
_RP_MOD = 1 << 32
_RP_HALF = 1 << 31


def _rp_weight(i, p: int, t: int):
    mixed = (i * 31 + p * 17 + t * 101) * F.lit(_RP_KNUTH) % F.lit(_RP_MOD)
    return F.when(mixed < F.lit(_RP_HALF), F.lit(1.0)).otherwise(F.lit(-1.0))


def rp_bucket(col: Column, t: int, n_planes: int) -> Column:
    """Sign-pattern bucket id of one hash table: bit p = sign of the
    projection onto pseudo-random Rademacher plane (t, p)."""
    out = F.lit(0)
    for p in range(n_planes):

        def w(p: int = p, t: int = t):
            return lambda x, i: x.cast("double") * _rp_weight(i, p, t)

        proj = F.aggregate(
            F.zip_with(col, F.sequence(F.lit(0), F.size(col) - 1), w()),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def rp_index_rows(emb: DataFrame, n_tables: int, n_planes: int) -> DataFrame:
    """One (vec_id, t, bucket) row per vector per hash table — the RP-LSH
    index relation, shared by the inline :func:`knn_rp_lsh` and the
    persisted :func:`build_ann_index` paths."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        rp_bucket(F.col("embedding"), t, n_planes).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.t", "tb.bucket")


def build_ann_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    n_tables: int = 4,
    n_planes: int = 6,
) -> None:
    """Persist the RP-LSH index, partitioned by (t, bucket).

    This is the 100 TB similarity-search shape: the corpus is hashed ONCE
    and written clustered by hash table + bucket; each query then reads
    exactly ``n_tables`` partitions via partition pruning instead of
    re-hashing the corpus per query (which the inline knn_rp_lsh — the
    correctness/oracle form — necessarily does).  Deterministic
    Rademacher planes mean index and probe always agree, with no stored
    plane matrix to version."""
    emb = load_table(spark, sf_dir, "embeddings")
    # cluster on the partition key before the partitioned write: without
    # it every map task emits a file per (t, bucket) it sees (tasks ×
    # n_tables·2^n_planes tiny files); hash-clustering bounds the layout
    # at one file per partition dir (guide §6 small-files)
    rp_index_rows(emb, n_tables, n_planes).repartition(
        "t", "bucket"
    ).write.mode("overwrite").partitionBy("t", "bucket").parquet(index_dir)


def query_ann_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """Probe the persisted index: compute the query's ``n_tables`` bucket
    ids (one row — driver-side collect is O(n_tables) scalars, not data),
    scan ONLY those (t, bucket) partitions, then rerank candidates by
    exact cosine.  Row-identical to :func:`knn_rp_lsh` by construction
    (same planes, same buckets, same rerank) — asserted in tests, along
    with the plan's partition filters."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_emb_row = emb.filter(F.col("vec_id") == query_vec_id).select("embedding")
    probes = rp_index_rows(
        q_emb_row.withColumn("vec_id", F.lit(query_vec_id)), n_tables, n_planes
    ).collect()
    pred = None
    for r in probes:
        clause = (F.col("t") == r.t) & (F.col("bucket") == r.bucket)
        pred = clause if pred is None else (pred | clause)
    index = spark.read.parquet(index_dir).filter(pred)
    cand_ids = (
        index.filter(F.col("vec_id") != query_vec_id).select("vec_id").distinct()
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def knn_rp_lsh(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """Multi-table random-hyperplane LSH with exact cosine rerank — the
    deterministic sibling of :func:`knn_lsh` (pyspark.ml's LSH draws its
    planes from an engine-private RNG, so only this variant can be
    oracle-checked).

    Each vector gets ``n_tables`` sign-pattern buckets; a query probes its
    bucket in EVERY table (union of probes — recall compounds per table,
    unlike single-probe IVF), candidates are deduped, then reranked by
    exact cosine.

    Scale shape: ONE corpus scan exploded into (table, bucket) rows, one
    broadcast join against the query's n_tables probe rows, distinct on
    candidate id, then a semi-join-shaped rerank over the candidate set
    only.  At 100 TB the (table, bucket) explosion is the LSH index you'd
    persist (partitioned by table+bucket → partition pruning per probe).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    buckets = rp_index_rows(emb, n_tables, n_planes)
    q_buckets = buckets.filter(F.col("vec_id") == query_vec_id).select(
        F.col("t").alias("q_t"), F.col("bucket").alias("q_bucket")
    )
    cand_ids = (
        buckets.join(
            F.broadcast(q_buckets),
            (F.col("t") == F.col("q_t")) & (F.col("bucket") == F.col("q_bucket")),
        )
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


#: plane id of the in-bucket SORT projection — outside every bucket
#: plane (p < 16), so the ordering direction is independent of the
#: bucketing directions.
_SORT_PLANE = 997


def _sort_projection(col: Column) -> Column:
    """1-D Rademacher projection ordering bucket members for the banded
    candidate window — same deterministic weight family as the bucket
    planes (plane 997, table 0), so DuckDB computes the identical
    value."""

    def w():
        return lambda x, i: x.cast("double") * _rp_weight(i, _SORT_PLANE, 0)

    return F.aggregate(
        F.zip_with(col, F.sequence(F.lit(0), F.size(col) - 1), w()),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _banded_candidates(posd: DataFrame, band: int) -> DataFrame:
    """Directed candidate edges from a positioned bucket relation
    (vec_id, t, bucket, pos): pairs within ``band`` positions of each
    other in the sort-projection order.  The join is equi on
    (t, bucket, block) with the right side exploded to its three
    adjacent blocks, so the pair stream is O(n · band · tables) — the
    occ² blowup of the naive in-bucket self-join never materializes
    (at sf1 the probe measured Σocc² = 411M generated pairs on
    cone-clustered data; this kernel generates ≤ n · 2band · tables).

    WHY a band instead of the whole bucket: sign-random-projection
    buckets cannot subdivide a tight co-directional cluster (every
    origin hyperplane leaves the cone on one side), so bucket occupancy
    grows linearly with corpus size on clustered embeddings no matter
    how many planes are used — the in-bucket join is then quadratic.
    Ordering members by an independent 1-D projection and connecting
    each vector to its band neighbors is the classic sorted-projection
    refinement: true nearest neighbors project close together, so they
    stay within the band, while the pair count is linear by
    construction.  The exact-cosine rerank downstream is unchanged."""
    a = posd.select(
        F.col("vec_id").alias("src_id"),
        "t",
        "bucket",
        F.col("pos").alias("pa"),
        F.floor(F.col("pos") / band).cast("long").alias("blk"),
    )
    blk = F.floor(F.col("pos") / band).cast("long")
    b = posd.select(
        F.col("vec_id").alias("nbr_id"),
        "t",
        "bucket",
        F.col("pos").alias("pb"),
        F.explode(F.array(blk - 1, blk, blk + 1)).alias("blk"),
    )
    return (
        a.join(b, ["t", "bucket", "blk"])
        .filter(
            (F.col("src_id") != F.col("nbr_id"))
            & (F.abs(F.col("pa") - F.col("pb")) <= band)
        )
        .select("src_id", "nbr_id")
        .distinct()
    )


def occupancy_planes(n: int, target: int = 32, floor: int = 6, cap: int = 16) -> int:
    """Occupancy-bounded RP-LSH plane count: the smallest L with
    n / 2^L ≤ ``target``, clamped to [floor, cap] — pure integer
    arithmetic (bit_length), so DuckDB's ``length(bin(x))`` computes
    the identical value and the rule itself is oracle-checkable.

    WHY: with FIXED planes the bucket count is constant, so occupancy
    grows linearly with the corpus and the in-bucket pair join grows
    QUADRATICALLY — the sf1 scale probe measured knn_graph at 73x for
    10x rows before this rule (SCALEPROBE_r15.json).  Holding expected
    occupancy constant keeps the pair join linear in n.  At the gate
    and bench scales (≤ 2k vectors) L stays at the floor, so every
    committed plan and oracle hash is unchanged."""
    x = (n + target - 1) // target - 1
    return min(cap, max(floor, x.bit_length()))


def knn_graph_lsh(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_tables: int = 4,
    n_planes: int | None = None,
    band: int = 64,
) -> DataFrame:
    """Approximate kNN GRAPH: top-k neighbors for EVERY vector at once —
    the building block curation pipelines need for diversity sampling,
    semantic cluster maps, and graph-based dedup, where one-query-at-a-
    time probes (:func:`knn_rp_lsh`) don't scale to "all vectors".

    Shape: the corpus hashes once into (t, bucket) rows (plane count
    occupancy-scaled with the corpus — :func:`occupancy_planes`);
    inside each bucket, members are ORDERED by an independent 1-D sort
    projection and DIRECTED candidate edges connect vectors within
    ``band`` positions (:func:`_banded_candidates` — O(n·band·tables)
    pairs by construction); dedup across tables; exact-cosine rerank;
    per-source row_number keeps the top-k.

    The band exists because of a measured failure mode
    (SCALEPROBE_r15.json): sign-random-projection buckets cannot split
    a tight co-directional cluster, so on clustered embeddings bucket
    occupancy grows linearly with the corpus and the plain in-bucket
    self-join grows QUADRATICALLY — the sf1 probe read 59x wall time
    for 10x rows (Σocc² = 411M pairs).  With the band the pair stream
    is linear in n at any clustering.  At 100 TB the positioned bucket
    relation comes from the persisted :func:`build_ann_index` instead
    of re-hashing (:func:`knn_graph_from_index`, row-identical).

    Output: (src_id, rank, nbr_id, cos_sim) — deterministic (md5-derived
    buckets, rounded sort keys, rounded cosine, total tie-order), so the
    DuckDB oracle reproduces the whole graph."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    if n_planes is None:
        # occupancy-bounded width: one count (index metadata in the
        # persisted form — build_ann_index knows its corpus size), the
        # same integer rule the oracle computes via length(bin(x))
        n_planes = occupancy_planes(emb.count())
    proj = emb.select(
        "vec_id", F.round(_sort_projection(F.col("embedding")), 6).alias("sp")
    )
    # persist both multi-consumer frames: the positioned bucket relation
    # feeds BOTH sides of the banded join and the norm frame both rerank
    # branches — Spark has no cross-branch CSE, so unpersisted the
    # RP hash (the dominant cost) runs twice (measured ~2x at sf0.1)
    wpos = Window.partitionBy("t", "bucket").orderBy("sp", "vec_id")
    posd = persist_tracked(
        rp_index_rows(emb, n_tables, n_planes)
        .join(proj, "vec_id")
        .withColumn("pos", F.row_number().over(wpos))
    )
    cand = _banded_candidates(posd, band)
    with_norm = persist_tracked(
        emb.withColumn("v_norm", l2_norm(F.col("embedding")))
    )
    e_src = with_norm.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("src_emb"),
        F.col("v_norm").alias("src_norm"),
    )
    e_nbr = with_norm.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_emb"),
        F.col("v_norm").alias("nbr_norm"),
    )
    scored = (
        cand.join(e_src, "src_id")
        .join(e_nbr, "nbr_id")
        .select(
            "src_id",
            "nbr_id",
            F.round(
                dot(F.col("src_emb"), F.col("nbr_emb"))
                / (F.col("src_norm") * F.col("nbr_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", F.col("rank").cast("int").alias("rank"), "nbr_id", "cos_sim")
        .orderBy("src_id", "rank")
    )


def knn_graph_from_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    k: int = 3,
    band: int = 64,
) -> DataFrame:
    """The kNN graph built from the PERSISTED ANN index instead of
    re-hashing the corpus: :func:`build_ann_index`'s (t, bucket) rows
    take the same sort-projection positions and banded candidate join
    as :func:`knn_graph_lsh`, then the same exact-cosine rerank and
    per-source top-k — row-identical by construction (same
    deterministic buckets, same sort keys), asserted in tests.

    This is the 100 TB nightly-graph shape: hash once per corpus
    version, rebuild the graph from the stored relation; the banded
    join shuffles only (vec_id, t, bucket, pos) rows, never
    embeddings.  NOTE: the stored index is bucket rows only, so the
    inline and index forms must agree on the plane-count rule — the
    index carries whatever width it was built with."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id", F.round(_sort_projection(F.col("embedding")), 6).alias("sp")
    )
    wpos = Window.partitionBy("t", "bucket").orderBy("sp", "vec_id")
    posd = persist_tracked(
        spark.read.parquet(index_dir)
        .join(proj, "vec_id")
        .withColumn("pos", F.row_number().over(wpos))
    )
    cand = _banded_candidates(posd, band)
    with_norm = persist_tracked(
        emb.withColumn("v_norm", l2_norm(F.col("embedding")))
    )
    e_src = with_norm.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("src_emb"),
        F.col("v_norm").alias("src_norm"),
    )
    e_nbr = with_norm.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_emb"),
        F.col("v_norm").alias("nbr_norm"),
    )
    scored = (
        cand.join(e_src, "src_id")
        .join(e_nbr, "nbr_id")
        .select(
            "src_id",
            "nbr_id",
            F.round(
                dot(F.col("src_emb"), F.col("nbr_emb"))
                / (F.col("src_norm") * F.col("nbr_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", F.col("rank").cast("int").alias("rank"), "nbr_id", "cos_sim")
        .orderBy("src_id", "rank")
    )


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus profile computed with higher-order array
    functions only (transform/aggregate/size — all JVM-side, no UDF):
    vector dimensionality, L2-norm distribution, per-vector max
    component.  The declared HOF surface of the engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_vec = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        l2_norm(F.col("embedding")).alias("norm"),
        F.aggregate(
            F.col("embedding"),
            F.lit(float("-inf")),
            lambda acc, x: F.greatest(acc, x.cast("double")),
        ).alias("max_component"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            # fixed-point avg (per-row 1e-9 quantize, exact BIGINT sum)
            # so the 6-decimal comparison is partition-order-independent
            F.round(
                sum_fixed(F.round(F.col("norm") * 1e9).cast("long"), sf_dir=sf_dir)
                / F.count(F.lit(1))
                / 1e9,
                6,
            ).alias("avg_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
            F.round(
                sum_fixed(F.round(F.col("max_component") * 1e9).cast("long"), sf_dir=sf_dir)
                / F.count(F.lit(1))
                / 1e9,
                6,
            ).alias("avg_max_component"),
        )
        .orderBy("label")
    )


def knn_multi_query(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
) -> DataFrame:
    """Batched exact top-k: many query vectors against the corpus in one
    pass — the realistic retrieval workload (single-query knn_brute_force
    is the unit form).

    Scale: queries broadcast (n_queries rows); corpus scans once; per-
    query ranking is one window shuffle keyed by query id.  For large
    query sets, swap broadcast for the IVF/LSH bucketed variants."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_codebook(
    emb: DataFrame, m_sub: int, k_codes: int, sub_dim: int
) -> DataFrame:
    """Deterministic product-quantization codebook: ``k_codes`` corpus
    vectors drawn by md5 rank (the ivf_centroid_knn seed discipline — no
    engine RNG, so DuckDB reproduces every centroid bit-for-bit), each
    split into ``m_sub`` sub-vectors.  Returns (m, code, c_sub) —
    m_sub × k_codes rows, always broadcast-sized (a real deployment's
    codebook is KBs regardless of corpus size; that is the point of PQ)."""
    from pyspark.sql import Window

    md5_key = F.md5(F.col("vec_id").cast("string"))
    seeds = emb.orderBy(md5_key, "vec_id").limit(k_codes)
    w_code = Window.orderBy(F.md5(F.col("seed_id").cast("string")), "seed_id")
    coded = seeds.select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("s_emb")
    ).withColumn("code", F.row_number().over(w_code))
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    return coded.select(
        "code",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("s_emb"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "c_sub"),
    )


def pq_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """Product-quantization ANN: compress every vector to ``m_sub`` byte
    codes (64 floats → 8 codes here), answer queries by asymmetric
    distance (ADC) over a query-specific lookup table, exact-rerank the
    shortlist.  THE memory-bound scale path: a 100 TB embedding corpus
    becomes ~m_sub bytes/vector of resident index while scans touch no
    raw vectors until the final rerank.

    All distances are the dot-product identity ‖a−b‖² = a·a − 2a·b + b·b
    computed with the same left-to-right sums in Spark and DuckDB, and
    the codebook is md5-rank-sampled data (pq_codebook), so encoding,
    ADC, and rerank are deterministic and fully oracle-checked.

    Shape at scale: codebook and ADC table broadcast (m_sub × k_codes
    rows); encoding is a per-row map over the one corpus scan; the
    shortlist is TakeOrderedAndProject on the rounded ADC distance; only
    ``rerank_factor × k`` raw vectors are ever fetched for rerank."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    dim_row = emb.limit(1).select(F.size("embedding").alias("d")).head()
    sub_dim = dim_row.d // m_sub
    book = pq_codebook(emb, m_sub, k_codes, sub_dim)

    # encode: explode each vector into its m sub-vectors, broadcast-join
    # the codebook, argmin L2^2 per (vec_id, m) with code tie-break
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    vec_subs = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                subs,
                lambda m: F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
            )
        ).alias("m", "v_sub"),
    )
    d2 = (
        dot(F.col("v_sub"), F.col("v_sub"))
        - 2 * dot(F.col("v_sub"), F.col("c_sub"))
        + dot(F.col("c_sub"), F.col("c_sub"))
    )
    w_best = Window.partitionBy("vec_id", "m").orderBy(
        F.round(d2, 9).asc(), F.col("code").asc()
    )
    codes = (
        vec_subs.join(F.broadcast(book), "m")
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )

    # ADC lookup table: distance from the QUERY's sub-vectors to every
    # codebook entry — m_sub x k_codes rows, broadcast
    q_subs = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.posexplode(
                F.transform(
                    subs,
                    lambda m: F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
                )
            ).alias("m", "q_sub")
        )
    )
    adc = q_subs.join(book, "m").select(
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    shortlist = (
        codes.join(F.broadcast(adc), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(rerank_factor * k)
    )

    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(shortlist.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def build_pq_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    m_sub: int = 8,
    k_codes: int = 16,
) -> None:
    """Persist the PQ index: codebook/ (m, code, c_sub — KBs) and
    codes/ (vec_id, m, code — ~m_sub small ints per vector).  Encode
    ONCE per corpus version; every query then reads codes, never raw
    vectors, until its final rerank.  At 100 TB the codes relation is
    ~1000x smaller than the embeddings it summarizes — the scan that
    replaces the brute-force scan."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    sub_dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d // m_sub
    book = pq_codebook(emb, m_sub, k_codes, sub_dim)
    book.write.mode("overwrite").parquet(f"{index_dir}/codebook")
    stored_book = spark.read.parquet(f"{index_dir}/codebook")

    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    vec_subs = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                subs,
                lambda m: F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
            )
        ).alias("m", "v_sub"),
    )
    d2 = (
        dot(F.col("v_sub"), F.col("v_sub"))
        - 2 * dot(F.col("v_sub"), F.col("c_sub"))
        + dot(F.col("c_sub"), F.col("c_sub"))
    )
    w_best = Window.partitionBy("vec_id", "m").orderBy(
        F.round(d2, 9).asc(), F.col("code").asc()
    )
    (
        vec_subs.join(F.broadcast(stored_book), "m")
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/codes")
    )


def query_pq_index(
    spark: SparkSession,
    index_dir: str,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    rerank_factor: int = 4,
) -> DataFrame:
    """Probe the persisted PQ index: broadcast ADC table from the stored
    codebook, shortlist over the stored codes (no raw-vector scan),
    exact rerank on the shortlist only.  Row-identical to the inline
    pq_knn by construction (test-pinned)."""
    book = spark.read.parquet(f"{index_dir}/codebook")
    codes = spark.read.parquet(f"{index_dir}/codes")
    emb = load_table(spark, sf_dir, "embeddings")
    m_sub = book.agg(F.max("m")).head()[0] + 1
    sub_dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d // m_sub

    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    q_subs = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.posexplode(
            F.transform(
                subs,
                lambda m: F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
            )
        ).alias("m", "q_sub")
    )
    adc = q_subs.join(book, "m").select(
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    shortlist = (
        codes.join(F.broadcast(adc), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(rerank_factor * k)
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(shortlist.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pq_multi_query(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """Batched PQ retrieval: many queries against the code relation in
    one pass — ADC tables for ALL queries form one broadcast
    (n_queries × m_sub × k_codes rows, still KBs), the code scan is
    shared, per-query shortlists come from one window, and the exact
    rerank touches only rerank_factor × k raw vectors PER QUERY.  The
    production retrieval shape: the corpus is scanned once as codes no
    matter how many queries ride along."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    sub_dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d // m_sub
    book = pq_codebook(emb, m_sub, k_codes, sub_dim)

    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    split_subs = lambda col: F.posexplode(  # noqa: E731
        F.transform(subs, lambda m: F.slice(col, m * sub_dim + 1, sub_dim))
    )
    vec_subs = emb.select("vec_id", split_subs(F.col("embedding")).alias("m", "v_sub"))
    d2 = (
        dot(F.col("v_sub"), F.col("v_sub"))
        - 2 * dot(F.col("v_sub"), F.col("c_sub"))
        + dot(F.col("c_sub"), F.col("c_sub"))
    )
    w_best = Window.partitionBy("vec_id", "m").orderBy(
        F.round(d2, 9).asc(), F.col("code").asc()
    )
    codes = (
        vec_subs.join(F.broadcast(book), "m")
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )

    queries_df = emb.filter(F.col("vec_id") < n_queries)
    q_subs = queries_df.select(
        F.col("vec_id").alias("query_id"),
        split_subs(F.col("embedding")).alias("m", "q_sub"),
    )
    adc = q_subs.join(book, "m").select(
        "query_id",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    approx = (
        codes.join(F.broadcast(adc), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("vec_id")
    )
    shortlist = (
        approx.withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= rerank_factor * k)
        .select("query_id", "vec_id")
    )
    q_emb = queries_df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    reranked = (
        emb.join(shortlist, "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def semantic_contamination(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.40,
    split_at: int = 250,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-level eval decontamination: which EVAL vectors are
    semantically too close to some TRAIN vector (cosine >= threshold) —
    the companion to the n-gram contamination_check (exact copies) and
    span_contamination (partial copies): paraphrases and translations
    share no n-grams but do share embedding neighborhoods, and a
    benchmark row leaked into pretraining usually survives as exactly
    such a neighbor.

    Split: vec_id < ``split_at`` is train, the rest eval (the driver
    corpus has no split column; a real run passes its own frames).

    Scale: the SAME one-sided probe shape as probe_dedup_index — eval
    and train vectors meet only inside an RP-LSH (table, bucket) cell
    (rp_index_rows, deterministic Rademacher planes DuckDB reproduces
    bit-for-bit), then exact cosine verification over candidates only.
    O(train) bucketing once + O(eval x cell) verification, never
    eval x train.  Reported rates are per eval label with an exact
    cosine — LSH bounds which pairs are EXAMINED (deterministic recall
    bound), precision is exact.
    """
    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    # persist: the (vec_id, t, bucket) rows feed BOTH probe sides, and
    # the norm-annotated vectors feed BOTH cosine sides —
    # unmaterialized, each consumer re-ran the RP projections / norm
    # folds over the corpus (5 embeddings scans; guide §5)
    buckets = persist_tracked(rp_index_rows(emb, n_tables, n_planes))
    eval_b = buckets.filter(F.col("vec_id") >= split_at).select(
        F.col("vec_id").alias("eval_id"), "t", "bucket"
    )
    train_b = buckets.filter(F.col("vec_id") < split_at).select(
        F.col("vec_id").alias("train_id"), "t", "bucket"
    )
    cands = (
        eval_b.join(train_b, ["t", "bucket"])
        .select("eval_id", "train_id")
        .dropDuplicates()
    )
    # exact cosine as dot/(|a||b|) over the RAW vectors — the SAME
    # expression shape (and so the same FP association order) as the
    # DuckDB twin; a pre-normalized dot can differ in the 6th decimal
    # exactly at the round/threshold boundary (r5 advisory).  The norms
    # ARE safe to hoist per vector (r7): l2_norm evaluated on the vector
    # side is the identical fold, just computed once per vector instead
    # of once per candidate pair — only the dot stays per-pair.
    raw = persist_tracked(
        emb.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("__nrm")
        )
    )
    ev = raw.select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("emb_e"),
        F.col("__nrm").alias("norm_e"),
    )
    tr = raw.select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("emb_t"),
        F.col("__nrm").alias("norm_t"),
    )
    cos = dot(F.col("emb_e"), F.col("emb_t")) / (
        F.col("norm_e") * F.col("norm_t")
    )
    hits = (
        cands.join(ev, "eval_id")
        .join(tr, "train_id")
        .filter(F.round(cos, 6) >= threshold)
        .select("eval_id")
        .dropDuplicates()
    )
    eval_rows = emb.filter(F.col("vec_id") >= split_at).select(
        F.col("vec_id").alias("eval_id"), "label"
    )
    return (
        eval_rows.join(hits.withColumn("flag", F.lit(1)), "eval_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(F.coalesce("flag", F.lit(0))).cast("long").alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce("flag", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("contamination_rate"),
        )
        .orderBy("label")
    )


def label_centroid_outliers(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Mislabel QA over the embeddings table: per label, the ``k``
    members whose cosine to their OWN label centroid is lowest — the
    standard embedding-space screen for annotation errors and polluted
    classes (a vector far from its class centroid is either mislabeled
    or an outlier worth auditing before training a classifier on it).

    Scale: the centroid is a (label, pos) mean over the exploded
    vectors — one partial-aggregated shuffle keyed by (label, pos),
    #labels × dim rows out, broadcast back for the per-vector dot
    product (labels × dim is KB-scale however big the corpus); the
    per-vector reduce groups on vec_id, a key the explode preserved
    data-locality for.  No pairwise work anywhere — O(n · dim), the
    cheapest possible pass.
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = vals.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    per_vec = (
        vals.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vn"),
        )
    )
    scored = per_vec.join(F.broadcast(cnorm), "label").select(
        "label",
        "vec_id",
        F.round(F.col("dot") / (F.col("vn") * F.col("cn")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("label", "rank", "vec_id", "cos_sim")
        .orderBy("label", "rank")
    )


def nearest_centroid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality metric over the embeddings table: for every vector,
    is the NEAREST label centroid its own label?  Per-label agreement
    rate is the nearest-centroid-classifier accuracy — the one-pass
    screen that tells a dataset owner which classes are internally
    coherent and which bleed into neighbors (low agreement = label noise
    or genuinely overlapping classes; read next to
    label_centroid_outliers, which names the individual suspects).

    Scale: centroids as in label_centroid_outliers (one (label, pos)
    partial-agg shuffle, KB-scale result broadcast back); each vector
    then scores against ALL centroids — O(n · labels · dim) JVM work
    with no pairwise vector joins; the argmax is a per-vec window over
    #labels rows (bounded, never data-sized partitions).
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = vals.groupBy(F.col("label").alias("label_c"), F.col("pos")).agg(
        F.avg("v").alias("c")
    )
    cnorm = cent.groupBy("label_c").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    scores = (
        vals.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "label_c")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vn"),
        )
        .join(F.broadcast(cnorm), "label_c")
        .select(
            "vec_id",
            "label",
            "label_c",
            F.round(F.col("dot") / (F.col("vn") * F.col("cn")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("label_c")
    )
    nearest = (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "label",
            F.when(F.col("label_c") == F.col("label"), 1).otherwise(0).alias(
                "agree"
            ),
        )
    )
    return (
        nearest.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("agree").cast("long").alias("n_agree"),
            F.round(F.sum("agree") / F.count(F.lit(1)), 4).alias("agree_rate"),
        )
        .orderBy("label")
    )


def int8_quantization_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 embedding quantization QA — the 4x-compression
    companion to the PQ family (pq_codebook): symmetric per-vector
    quantization (scale = max|x| / 127, q = clamp(round(x/scale))),
    profiled per label by reconstruction MSE and original↔reconstruction
    cosine.  The table a vector-store owner reads before switching the
    ANN index to int8 storage: which label slices lose recall-relevant
    geometry (min_cos) and how much error the corpus averages.

    Scale: everything is a per-row array expression inside whole-stage
    codegen (transform/aggregate HOFs, no UDF, no shuffle before the
    #labels-sized rollup).  All reductions run in array-index order, so
    the DuckDB twin reproduces them bit-for-bit; zero vectors (scale 0)
    are excluded on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    withs = (
        emb.select("vec_id", "label", arr.alias("emb"))
        .withColumn(
            "scale",
            F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x)))
            / 127.0,
        )
        .filter(F.col("scale") > 0)
        .withColumn(
            "recon",
            F.transform(
                F.col("emb"),
                lambda x: F.least(
                    F.greatest(F.round(x / F.col("scale")), F.lit(-127.0)),
                    F.lit(127.0),
                )
                * F.col("scale"),
            ),
        )
    )
    mse = (
        F.aggregate(
            F.zip_with(
                F.col("emb"), F.col("recon"), lambda x, y: F.pow(x - y, 2)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(F.col("emb"))
    )
    cos = dot(F.col("emb"), F.col("recon")) / (
        l2_norm(F.col("emb")) * l2_norm(F.col("recon"))
    )
    return (
        withs.select("label", F.col("scale"), mse.alias("mse"), cos.alias("cos_sim"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("mse"), 8).alias("avg_mse"),
            F.round(F.avg("cos_sim"), 6).alias("avg_cos"),
            F.round(F.min("cos_sim"), 6).alias("min_cos"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
        )
        .orderBy("label")
    )


def centroid_confusion_matrix(
    spark: SparkSession, sf_dir: str, threshold: float = 0.90
) -> DataFrame:
    """Class-separability QA: pairwise cosine between LABEL CENTROIDS —
    the #labels × #labels confusability readout next to
    nearest_centroid_agreement (per-vector) and label_centroid_outliers
    (per-member): two classes whose centroids nearly coincide will
    confuse any classifier trained on this embedding space.

    Scale: centroids are one (label, pos) mean shuffle (#labels × dim
    rows out — KB-scale at any corpus size); the pair matrix is
    #labels², computed entirely on the tiny centroid frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vals = emb.select(
        "label", F.posexplode(arr).alias("pos", "v")
    )
    cent = vals.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    packed = (
        cent.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c"))
            ).alias("pc")
        )
        .select(
            "label",
            F.transform(F.col("pc"), lambda s: s["c"]).alias("centroid"),
        )
    )
    a = packed.select(
        F.col("label").alias("label_a"), F.col("centroid").alias("cent_a")
    )
    b = packed.select(
        F.col("label").alias("label_b"), F.col("centroid").alias("cent_b")
    )
    cos = dot(F.col("cent_a"), F.col("cent_b")) / (
        l2_norm(F.col("cent_a")) * l2_norm(F.col("cent_b"))
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(cos, 6).alias("cos_sim"),
        )
        .withColumn("confusable", F.col("cos_sim") >= threshold)
        .orderBy(F.desc("cos_sim"), "label_a", "label_b")
    )


def update_ann_index(
    spark: SparkSession,
    index_dir: str,
    new_emb: DataFrame,
    n_tables: int = 4,
    n_planes: int = 6,
) -> None:
    """Fold NEW vectors into the persisted RP-LSH index WITHOUT
    rebuilding it — the daily-maintenance sibling of
    spans.update_span_index and dedup's index fold, completing the
    incremental story for all three persisted retrieval indexes: only
    the (t, bucket) partitions the new vectors hash into are rewritten
    (dynamic partition overwrite), so refresh cost is O(batch +
    touched-buckets), never O(corpus).

    The index rows are plain (vec_id, t, bucket) membership — a set
    union, trivially associative — so yesterday's index ⊕ today's batch
    ≡ a from-scratch build over the union (test-pinned)."""
    # persist: the touched-partition collect AND the write both consume
    # this frame, and the n_tables × n_planes RP projections are the
    # expensive part of a fold — hash the batch once, not twice
    batch_rows = rp_index_rows(new_emb, n_tables, n_planes).persist()
    try:
        touched = [
            (r.t, r.bucket)
            for r in batch_rows.select("t", "bucket").distinct().collect()
        ]
        if not touched:
            return
        cond = None
        for t, bkt in touched:
            c = (F.col("t") == t) & (F.col("bucket") == bkt)
            cond = c if cond is None else (cond | c)
        stored = spark.read.parquet(index_dir).filter(cond).select(
            "vec_id", "t", "bucket"
        )
        merged = stored.unionByName(
            batch_rows.select("vec_id", "t", "bucket")
        ).dropDuplicates(["vec_id", "t", "bucket"])
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("t", "bucket")
            .parquet(index_dir)
        )
    finally:
        batch_rows.unpersist()


def append_ann_index(
    spark: SparkSession,
    index_dir: str,
    new_emb: DataFrame,
    n_tables: int = 4,
    n_planes: int = 6,
) -> None:
    """Append-only fold of new vectors into the persisted RP-LSH index —
    the production-cadence sibling of :func:`update_ann_index`: instead
    of REWRITING every touched (t, bucket) partition (overwrite cost =
    O(touched partition size) per trigger, which grows with the hot
    buckets), this anti-joins the batch against only the touched
    partitions (partition-pruned probe) and APPENDS the genuinely-new
    membership rows — O(batch) written per trigger, stored rows never
    rewritten.

    The price is layout, not content: every fold adds at least one
    file to each touched partition, so hot buckets fragment at cadence
    — which is exactly the debt :func:`compact_ann_index` retires.
    Content equivalence with the overwrite fold (and with a rebuild) is
    by construction: membership is a set, the anti-join inserts each
    (vec_id, t, bucket) at most once."""
    # hash the batch once (see update_ann_index): both the touched
    # collect and the append read this frame
    batch_rows = rp_index_rows(new_emb, n_tables, n_planes).persist()
    try:
        touched = [
            (r.t, r.bucket)
            for r in batch_rows.select("t", "bucket").distinct().collect()
        ]
        if not touched:
            return
        cond = None
        for t, bkt in touched:
            c = (F.col("t") == t) & (F.col("bucket") == bkt)
            cond = c if cond is None else (cond | c)
        stored = spark.read.parquet(index_dir).filter(cond).select(
            "vec_id", "t", "bucket"
        )
        fresh = (
            batch_rows.select("vec_id", "t", "bucket")
            .dropDuplicates(["vec_id", "t", "bucket"])
            .join(stored, ["vec_id", "t", "bucket"], "left_anti")
        )
        fresh.write.mode("append").partitionBy("t", "bucket").parquet(
            index_dir
        )
    finally:
        batch_rows.unpersist()


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Compact the persisted RP-LSH index after streaming folds
    (r11 verdict task #4, carried to r13): every
    :func:`update_ann_index` fold rewrites its touched (t, bucket)
    partitions with however many files the fold's tasks produced, so at
    production cadence the hot buckets accumulate small files and probe
    cost drifts from "read one clustered file set" toward "open
    hundreds of fragments".  This rewrites ONLY the partitions holding
    more files than their row count justifies, to
    ``ceil(rows / target_rows_per_file)`` files each — probe results
    are identical before and after (same rows, same pruning), which is
    the compaction contract a table format's OPTIMIZE gives you.

    Cost shape: the fragmentation census is one directory listing
    (driver-side, bounded by n_tables × 2^n_planes partitions by
    construction — the bucket space is fixed at index build time, not
    data-sized) plus one footer-only row-count aggregation; the rewrite
    reads and writes ONLY fragmented partitions (partition-pruned scan,
    dynamic partition overwrite) — O(fragmented), never O(index).

    Returns a stats dict: partitions seen/compacted, files before/after
    (after = files actually on disk post-rewrite)."""
    import math
    import os

    # census: files per partition directory (two-level Hive layout)
    n_files: dict[tuple[str, str], int] = {}
    for t_name in os.listdir(index_dir):
        if not t_name.startswith("t="):
            continue
        t_dir = os.path.join(index_dir, t_name)
        for b_name in os.listdir(t_dir):
            if not b_name.startswith("bucket="):
                continue
            n_files[(t_name, b_name)] = sum(
                1
                for f in os.listdir(os.path.join(t_dir, b_name))
                if f.endswith(".parquet")
            )
    # row counts per partition: partition-column-only aggregation —
    # answered from parquet footers, no column IO
    rows = {
        (f"t={r.t}", f"bucket={r.bucket}"): r.n
        for r in spark.read.parquet(index_dir)
        .groupBy("t", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    plan = []  # (t_value, bucket_value, files_needed)
    for key, nf in n_files.items():
        n = rows.get(key, 0)
        need = max(1, math.ceil(n / target_rows_per_file))
        if nf > need:
            plan.append(
                (int(key[0][2:]), int(key[1][7:]), need)
            )
    stats = {
        "partitions_total": len(n_files),
        "partitions_compacted": len(plan),
        "files_before": sum(n_files.values()),
    }
    if plan:
        pred = None
        for t, bkt, _ in plan:
            c = (F.col("t") == t) & (F.col("bucket") == bkt)
            pred = c if pred is None else (pred | c)
        need_df = F.broadcast(
            spark.createDataFrame(
                plan, "t int, bucket int, __need int"
            )
        )
        out_files = max(1, sum(p[2] for p in plan))
        (
            spark.read.parquet(index_dir)
            .filter(pred)
            .join(need_df, ["t", "bucket"])
            .withColumn(
                "__salt", F.pmod(F.col("vec_id"), F.col("__need"))
            )
            .repartition(out_files, "t", "bucket", "__salt")
            .drop("__need", "__salt")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("t", "bucket")
            .parquet(index_dir)
        )
    stats["files_after"] = sum(
        sum(
            1
            for f in os.listdir(os.path.join(index_dir, t_name, b_name))
            if f.endswith(".parquet")
        )
        for (t_name, b_name) in n_files
    )
    return stats


def ann_index_diff(
    spark: SparkSession,
    sf_dir: str,
    split_frac: float = 0.9,
    retire_frac: float = 0.05,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """Cross-snapshot ANN-index DIFF (r12 verdict task 7): the
    manifest-diff recipe (functions/dedup.py::dedup_manifest_diff)
    applied to the persisted (vec_id, t, bucket) relation — the
    audit an index owner runs between two maintenance states: which
    memberships appeared, which were retired, and per-table churn
    checksums, without re-probing anything.

    Snapshots are deterministic: T0 indexes the settled corpus
    (vec_id < split); T1 retires an md5-chosen ``retire_frac`` cohort
    of the base and adds the arrival tail — so the diff has BOTH
    directions.  Both snapshots are persisted in the index layout and
    diffed with anti-joins on (vec_id, t, bucket): co-partitioned by
    the layout they were written in, output bounded by churn, never
    O(index²).  Stable counts derive arithmetically (|T0| − removed),
    so the whole readout is one pass over each snapshot."""
    import os

    from project_bigdata_recsys_spark.caching import scratch_dir
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    emb = load_table(spark, sf_dir, "embeddings")
    max_vec = emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"]
    split_at = int(max_vec * split_frac) if max_vec is not None else 0

    work = scratch_dir(prefix="spark_ann_diff_")
    d0 = os.path.join(work, "t0")
    d1 = os.path.join(work, "t1")
    # a vector's buckets depend only on the vector, so hash the corpus
    # ONCE and carve both snapshot memberships out of the hashed
    # relation with filters — T0 and T1 overlap on ~95% of the base,
    # and the RP projections are the expensive part
    # cluster by the layout key BEFORE persisting: both snapshot writes
    # below are then shuffle-free AND land one file per (t, bucket) dir
    # instead of tasks × dirs small files (guide §6) — filters preserve
    # the hash partitioning, so one shuffle serves both writes.  The
    # explicit task count keeps the ~256 directories written in
    # parallel (an AQE-coalesced bare repartition(col) collapses this
    # small-byte frame to 1-2 tasks — the merge-family rationale)
    hashed = (
        rp_index_rows(emb, n_tables, n_planes)
        .repartition(
            emb.sparkSession.sparkContext.defaultParallelism, "t", "bucket"
        )
        .persist()
    )
    try:
        hashed.filter(F.col("vec_id") < split_at).write.mode(
            "overwrite"
        ).partitionBy("t", "bucket").parquet(d0)
        retained = hash_uniform(F.col("vec_id"), "retire:") >= retire_frac
        hashed.filter(
            ((F.col("vec_id") < split_at) & retained)
            | (F.col("vec_id") >= split_at)
        ).write.mode("overwrite").partitionBy("t", "bucket").parquet(d1)
    finally:
        hashed.unpersist()

    s0 = spark.read.parquet(d0).select("vec_id", "t", "bucket")
    s1 = spark.read.parquet(d1).select("vec_id", "t", "bucket")
    chk = (
        F.col("bucket").cast("long") * F.lit(100003)
        + F.col("vec_id").cast("long")
    )
    added = (
        s1.join(s0, ["vec_id", "t", "bucket"], "left_anti")
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_added"),
            F.sum(chk).cast("long").alias("added_checksum"),
        )
    )
    removed = (
        s0.join(s1, ["vec_id", "t", "bucket"], "left_anti")
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_removed"),
            F.sum(chk).cast("long").alias("removed_checksum"),
        )
    )
    tot = s0.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n_t0"))
    return (
        tot.join(added, "t", "left")
        .join(removed, "t", "left")
        .select(
            F.col("t").cast("long").alias("t"),
            (
                F.col("n_t0") - F.coalesce("n_removed", F.lit(0))
            ).cast("long").alias("n_stable"),
            F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias(
                "n_removed"
            ),
            F.coalesce("added_checksum", F.lit(0)).cast("long").alias(
                "added_checksum"
            ),
            F.coalesce("removed_checksum", F.lit(0)).cast("long").alias(
                "removed_checksum"
            ),
        )
        .orderBy("t")
    )


def ann_recall_profile(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 6,
) -> DataFrame:
    """ANN quality measured, not asserted: per query, the RECALL of the
    RP-LSH candidate stage against exact brute-force top-k — the number
    an index owner tunes n_tables/n_planes by.  Rerank is exact cosine,
    so candidate recall IS end-to-end recall; everything (buckets,
    cosines, ranks) is deterministic, making the evaluation itself an
    oracle-checkable query rather than a test-only claim.

    Scale: brute truth runs only over the n_queries probe set (broadcast
    queries, one corpus scan); the candidate side is the same banded
    probe knn_rp_lsh ships."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    truth = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )

    buckets = rp_index_rows(emb, n_tables, n_planes)
    q_buckets = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "t", "bucket"
    )
    cands = (
        buckets.join(F.broadcast(q_buckets), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    hit = cands.withColumn("hit", F.lit(1))
    return (
        truth.join(hit, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias(
                "n_found"
            ),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics — the whitening/normalization
    QA a vector pipeline runs before training or indexing (dead
    dimensions, dominant dimensions, off-center means all distort
    cosine geometry).  Mean and variance derive from per-row fixed-point
    quantizations (1e-9 for values, 1e-12 for squares) summed as BIGINT,
    so the profile is partition-order-independent like every other
    compared aggregate in this repo.

    Shape: one posexplode + one (pos)-keyed Tungsten aggregation —
    #dims output rows at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vals = emb.select(F.posexplode(arr).alias("pos", "v"))
    nanos = F.round(F.col("v") * 1e9).cast("long")
    sq_pico = F.round(F.col("v") * F.col("v") * 1e12).cast("long")
    per_dim = vals.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(nanos).alias("s1"),
        F.sum(sq_pico).alias("s2"),
        F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    mean = F.col("s1") / F.col("n") / 1e9
    var = F.col("s2") / F.col("n") / 1e12 - mean * mean
    return (
        per_dim.select(
            F.col("pos").cast("int").alias("dim"),
            "n",
            F.round(mean, 6).alias("mean"),
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
            F.round(F.col("n_zero") / F.col("n"), 4).alias("zero_frac"),
            F.round("mn", 6).alias("min_v"),
            F.round("mx", 6).alias("max_v"),
        )
        .orderBy("dim")
    )


def ann_rerank(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    shortlist: int = 25,
    k: int = 5,
) -> DataFrame:
    """Two-stage retrieval: bi-encoder shortlist → cross-encoder-style
    rerank — the production retrieval stack (recall stage cheap and
    index-backed, precision stage expensive but bounded).

    Stage 1 (retrieval): cosine top-``shortlist`` per query vector.  The
    gate form scores exactly so the oracle pins the shortlist
    bit-for-bit; at scale this stage is the persisted ANN probe
    (:func:`query_ann_index` / the IVF family) — interchangeable because
    stage 2 only sees (query, candidate) pairs.

    Stage 2 (rerank): a RICHER pairwise scorer over the |queries| ×
    shortlist candidate pairs only — a deterministic stand-in for a
    cross-encoder model (a real model slots in as an Arrow-batched
    Pandas UDF with the same (q_emb, emb) → score signature):
    ``0.7·cos + 0.2·sign_agreement + 0.1/(1+L2)``, all three terms
    JVM-side HOF expressions.

    Scale shape: stage 2's cost is candidates × dim, never corpus ×
    dim — the whole point of the two-stage pattern; reranking never
    touches the index."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "q_emb",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
    )
    from pyspark.sql import Window

    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    short = scored.withColumn("__rnk", F.row_number().over(w1)).filter(
        F.col("__rnk") <= shortlist
    )
    sign_agree = (
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("q_emb"),
                lambda x, y: F.when(
                    (x.cast("double") * y.cast("double")) > 0, 1.0
                ).otherwise(0.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.size("embedding")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("q_emb"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    reranked = short.select(
        "query_id",
        "vec_id",
        "cos_sim",
        F.round(
            0.7 * F.col("cos_sim") + 0.2 * sign_agree + 0.1 / (1.0 + l2), 6
        ).alias("rerank_score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.asc("vec_id")
    )
    return (
        reranked.withColumn(
            "final_rank", F.row_number().over(w2).cast("int")
        )
        .filter(F.col("final_rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rerank_score", "final_rank")
        .orderBy("query_id", "final_rank")
    )


def rerank_uplift_profile(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    shortlist: int = 25,
    k: int = 5,
) -> DataFrame:
    """Evaluation of the two-stage rerank as an oracle query (the
    ann_recall_profile precedent): per query, how much does the
    cross-encoder-style stage actually change the bi-encoder's top-k —
    overlap@k, whether the top-1 moved, and the mean absolute rank
    shift of the final top-k.  A rerank stage whose uplift profile is
    identity is dead weight; one that replaces everything suggests the
    recall stage is mis-tuned — this is the monitoring query between
    those failure modes.  Deterministic end to end (integer ranks over
    the same 6-dp-rounded scores ann_rerank uses)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "q_emb",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
    )
    from pyspark.sql import Window

    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    short = scored.withColumn("cos_rank", F.row_number().over(w_cos)).filter(
        F.col("cos_rank") <= shortlist
    )
    sign_agree = (
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("q_emb"),
                lambda x, y: F.when(
                    (x.cast("double") * y.cast("double")) > 0, 1.0
                ).otherwise(0.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.size("embedding")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("q_emb"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    reranked = short.select(
        "query_id",
        "vec_id",
        "cos_rank",
        F.round(
            0.7 * F.col("cos_sim") + 0.2 * sign_agree + 0.1 / (1.0 + l2), 6
        ).alias("rerank_score"),
    )
    w_rr = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.asc("vec_id")
    )
    ranked = reranked.withColumn("final_rank", F.row_number().over(w_rr))
    return (
        ranked.filter(F.col("final_rank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("cos_rank") <= k, 1).otherwise(0)
            )
            .cast("long")
            .alias("overlap_at_k"),
            F.max(
                F.when(F.col("final_rank") == 1, F.col("cos_rank") == 1)
            ).alias("top1_same"),
            F.round(
                F.avg(F.abs(F.col("cos_rank") - F.col("final_rank"))), 4
            ).alias("mean_rank_shift"),
        )
        .orderBy("query_id")
    )


def semdedup_profile(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = 8,
    n_iters: int = 2,
    threshold: float = 0.40,
    max_cell: int = 4096,
) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means the corpus, then search for semantic
    duplicates ONLY within each cluster — pairwise cosine never crosses
    cluster boundaries, which is the whole scale story: the global n²
    collapses to Σ cᵢ², and cᵢ is controlled by the number of clusters
    (production: √n clusters keeps cells ~√n; ``max_cell`` additionally
    drops degenerate cells outright, the simhash band-cap discipline).

    Keep rule, deterministic on both engines: a vector is DROPPED iff
    some LOWER-id vector in its cell has cosine ≥ threshold (keep-min
    canonical — same tie discipline as exact_duplicates).  Composition:
    :func:`lloyd_assignments` (the oracle-pinned fixed-point Lloyd
    kernel) → per-cell self-join on cell id (never a cross join) →
    anti-semantics via distinct dropped ids.

    Output: one row per cell — n_vecs, n_dropped, n_kept, kept_frac —
    the dedup-rate readout a curation run records per semantic region.

    Reference parity: the reference has no embedding dedup at all
    (nearest analogue: exact duplicate drop in core-logic ETL); this is
    a beyond-reference §2.12 training-data operator."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    ranked = lloyd_assignments(spark, sf_dir, n_cells, n_iters)
    # persist: the home-cell assignment feeds the size rollup plus BOTH
    # sides of the within-cell pair join — unmaterialized, each consumer
    # re-runs the corpus × centroid assignment (crossJoin + argmax
    # window) behind lloyd_assignments' lazy frame (guide §5).
    cells = persist_tracked(
        ranked.filter(F.col("rn") == 1).select("vec_id", "cell", "embedding")
    )
    sizes = cells.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    # degenerate-cell cap: a cell larger than max_cell would quadratically
    # dominate the pair stage — drop it from pairing (kept whole), same
    # build-time cap the simhash band index applies
    eligible = cells.join(
        F.broadcast(sizes.filter(F.col("n_vecs") <= max_cell)), "cell"
    )
    # hoist each side's norm once per row (the measured 3x pattern):
    # the per-pair expression is then dot/(na*nb) — the oracle's shape
    normed = eligible.select(
        "cell",
        "vec_id",
        F.col("embedding").alias("v"),
        l2_norm(F.col("embedding")).alias("nv"),
    )
    a = normed.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = normed.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    dropped = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            )
            >= threshold
        )
        .select("cell", F.col("id_b").alias("vec_id"))
        .distinct()
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    )
    return (
        sizes.join(dropped, "cell", "left")
        .select(
            "cell",
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            F.round(
                (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0)))
                / F.col("n_vecs"),
                6,
            ).alias("kept_frac"),
        )
        .orderBy("cell")
    )


def hybrid_search_rrf(
    spark: SparkSession,
    sf_dir: str,
    n_query_terms: int = 3,
    depth: int = 50,
    n_probe_cells: int = 5,
    k: int = 10,
    n_vecs: int = 500,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the production RAG
    stack's default: a lexical BM25 ranking and a dense embedding
    ranking fused by RRF (Cormack et al.: score = Σ 1/(60 + rank)),
    which needs no score calibration between the two spaces and is why
    it ships everywhere.  Query terms are the corpus top-``n_query_
    terms`` (same as text.bm25_scores, whose ranking is reused at
    ``depth``); each term's dense query vector comes from the md5 id
    bridge, and the dense list is the IVF-shortlist shape: rank the
    ``n_vecs`` index cells first (bounded frame), probe the top
    ``n_probe_cells``, rank only those cells' documents.

    Determinism: both rankings cut on (6-dp score, id) total orders;
    RRF contributions are round(1e9/(60+rank)) — integer-derived,
    engine-identical — summed as BIGINTs; output carries rrf_micro as
    the exact integer.

    Scale: BM25 side as documented in bm25_scores; dense side touches
    |cells| + |probed docs| rows, never the corpus; fusion is a keyed
    full-outer join over ≤ 2·depth rows per term; every window
    partitions on the query term over shortlist-bounded frames."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import hash32
    from project_bigdata_recsys_spark.functions.text import bm25_scores

    sparse = bm25_scores(
        spark, sf_dir, n_query_terms=n_query_terms, top_docs=depth
    ).select("query_term", F.col("rk").alias("__rk_s"), "doc_id")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    qvec = (
        sparse.select("query_term")
        .distinct()
        .withColumn("__qv", hash32(F.col("query_term"), "qvec:") % n_vecs)
        .join(
            emb.select(
                F.col("vec_id").alias("__qv"), F.col("__v").alias("__qe")
            ),
            "__qv",
        )
        .select("query_term", "__qe")
    )
    cells = emb.crossJoin(F.broadcast(qvec)).select(
        "query_term",
        "vec_id",
        F.round(cosine(F.col("__v"), F.col("__qe")), 6).alias("__cos"),
    )
    w_cell = Window.partitionBy("query_term").orderBy(
        F.desc("__cos"), "vec_id"
    )
    probed = (
        cells.withColumn("__crk", F.row_number().over(w_cell))
        .filter(F.col("__crk") <= n_probe_cells)
        .select("query_term", "vec_id", "__cos")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % n_vecs).alias("vec_id")
    )
    w_doc = Window.partitionBy("query_term").orderBy(
        F.desc("__cos"), "doc_id"
    )
    dense = (
        docs.join(F.broadcast(probed), "vec_id")
        .withColumn("__rk_d", F.row_number().over(w_doc))
        .filter(F.col("__rk_d") <= depth)
        .select("query_term", "doc_id", "__rk_d")
    )
    rrf_s = F.round(F.lit(1_000_000_000.0) / (60 + F.col("__rk_s"))).cast(
        "long"
    )
    rrf_d = F.round(F.lit(1_000_000_000.0) / (60 + F.col("__rk_d"))).cast(
        "long"
    )
    fused = (
        sparse.join(dense, ["query_term", "doc_id"], "full_outer")
        .select(
            "query_term",
            "doc_id",
            F.coalesce(F.col("__rk_s"), F.lit(0)).cast("int").alias(
                "bm25_rank"
            ),
            F.coalesce(F.col("__rk_d"), F.lit(0)).cast("int").alias(
                "cos_rank"
            ),
            (
                F.coalesce(rrf_s, F.lit(0)) + F.coalesce(rrf_d, F.lit(0))
            ).alias("rrf_micro"),
        )
    )
    w_fused = Window.partitionBy("query_term").orderBy(
        F.desc("rrf_micro"), "doc_id"
    )
    return (
        fused.withColumn("__frk", F.row_number().over(w_fused))
        .filter(F.col("__frk") <= k)
        .drop("__frk")
        .orderBy("query_term", F.desc("rrf_micro"), "doc_id")
    )


def embedding_correlation_pairs(
    spark: SparkSession, sf_dir: str, top_k: int = 20
) -> DataFrame:
    """Most-correlated embedding-dimension pairs — the redundancy QA
    behind whitening / PCA decisions (two near-duplicate dimensions
    waste index width and distort cosine geometry;
    :func:`embedding_dim_profile` sees each dimension alone, THIS sees
    the cross-moments).  Pearson r per (i, j) pair from exact integer
    folds: values quantize to 1e-6 units, per-row products stay in
    BIGINT (≤ ~1.6e13), and the cross/auto sums widen to DECIMAL(38,0)
    so no corpus size overflows them; r combines those exact integers
    as doubles with identical shape on both engines, ordered by the
    integer micro of |r| (total order with the (i, j) tiebreak).

    Shape: one posexplode, a vec_id-keyed self-join producing the
    #dims²/2 pair moments per vector (Catalyst shuffles on vec_id —
    the declarative form of the per-partition Gram-matrix fold; at
    extreme dim counts swap in a mapInPandas X^T·X partial, same
    output contract), a broadcast join against the 64-row per-dim
    moment frame, TakeOrdered top-k."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # persist: vals feeds the per-dim moments plus BOTH sides of the
    # vec_id self-join — unmaterialized, the corpus scan + 64-way
    # posexplode ran three times (guide §5)
    vals = persist_tracked(
        emb.select(
            "vec_id",
            F.posexplode(arr).alias("pos", "v"),
        ).select(
            "vec_id", "pos", F.round(F.col("v") * 1e6).cast("long").alias("vm")
        )
    )
    # persist: broadcast twice (i-side and j-side moment joins); 64 rows
    per_dim = persist_tracked(
        vals.groupBy("pos").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vm").cast("long").alias("s1"),
            F.sum(F.col("vm") * F.col("vm"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
    )
    a = vals.select("vec_id", F.col("pos").alias("i"), F.col("vm").alias("vi"))
    b = vals.select("vec_id", F.col("pos").alias("j"), F.col("vm").alias("vj"))
    pair_sums = (
        a.join(b, "vec_id")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("vi") * F.col("vj")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("sij"),
        )
    )
    di = per_dim.select(
        F.col("pos").alias("i"),
        F.col("n").alias("n_vecs"),
        F.col("s1").alias("si"),
        F.col("s2").alias("sii"),
    )
    dj = per_dim.select(
        F.col("pos").alias("j"),
        F.col("s1").alias("sj"),
        F.col("s2").alias("sjj"),
    )
    n = F.col("n_vecs").cast("double")
    num = n * F.col("sij").cast("double") - F.col("si").cast(
        "double"
    ) * F.col("sj")
    var_i = n * F.col("sii").cast("double") - F.col("si").cast(
        "double"
    ) * F.col("si")
    var_j = n * F.col("sjj").cast("double") - F.col("sj").cast(
        "double"
    ) * F.col("sj")
    r = num / F.sqrt(var_i * var_j)
    scored = (
        pair_sums.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .filter((var_i > 0) & (var_j > 0))
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            "n_vecs",
            F.round(r, 6).alias("r"),
            F.round(F.abs(r) * 1e6).cast("long").alias("__abs_micro"),
        )
    )
    return (
        scored.orderBy(
            F.desc("__abs_micro"), F.asc("dim_i"), F.asc("dim_j")
        )
        .limit(top_k)
        .drop("__abs_micro")
    )


def embedding_top_pc(
    spark: SparkSession, sf_dir: str, n_iterations: int = 4
) -> DataFrame:
    """Top principal component of the embedding matrix by power
    iteration on the exact covariance — the PCA diagnostic a vector
    pipeline runs before trusting ANN indexes or whitening transforms
    (a dominant PC means anisotropic embeddings: cosine distances
    compress, IVF centroids align with one axis, recall drops).

    Exactness: components are frozen to 1e-4 fixed point, so every
    covariance cell is pure BIGINT cross-moments — cov_ij =
    (n·Σxy − Σx·Σy)/(n(n−1)) with ONE double division rounded to 9 dp;
    the 64x64 matrix then drives ``n_iterations`` power steps
    v → C·v / max|C·v| with each iterate rounded to 6 dp (both engines
    fold identical doubles), and the Rayleigh quotient gives the
    eigenvalue at 4 dp.  BIGINT headroom: n·Σxy stays under 2^63 up to
    ~5·10^5 vectors; past that the same plan runs with DECIMAL(38,0)
    casts (the fixedpoint widening convention).

    Scale: one posexplode pass (n·d cells), the Gram fan-out joins on
    vec_id with bounded d² = 4096 fan-out per vector and map-side
    combines into a d²-row matrix — broadcast territory; the power
    loop never touches the fact table again (d-row iterates,
    localCheckpoint per step)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") * 10_000).cast("long").alias("xm"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    n_tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sx = cells.groupBy("i").agg(F.sum("xm").cast("long").alias("sx"))
    right = cells.select(
        F.col("vec_id").alias("v2"),
        F.col("i").alias("j"),
        F.col("xm").alias("ym"),
    )
    sxy = (
        cells.join(right, cells.vec_id == right.v2)
        .groupBy("i", "j")
        .agg(F.sum(F.col("xm") * F.col("ym")).cast("long").alias("sxy"))
    )
    cov = (
        sxy.join(F.broadcast(sx), "i")
        .join(
            F.broadcast(
                sx.select(F.col("i").alias("j"), F.col("sx").alias("sy"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            "i",
            "j",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * (F.col("n") - 1.0))
                / 1e8,
                9,
            ).alias("c"),
        )
    )
    cov = persist_tracked(cov)
    v = cov.select(F.col("i").alias("dim")).distinct().select(
        "dim", F.lit(1.0).alias("v")
    )
    for _ in range(n_iterations):
        v = v.localCheckpoint()
        u = (
            cov.join(v, cov.j == v.dim)
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("dim"), F.round(F.col("u") / F.col("m"), 6).alias("v")
        )
    v = v.localCheckpoint()
    u = (
        cov.join(v, cov.j == v.dim)
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("v")).alias("u"))
    )
    ray = (
        u.join(v, u.i == v.dim)
        .agg(
            F.round(
                F.sum(F.col("v") * F.col("u")) / F.sum(F.col("v") * F.col("v")),
                4,
            ).alias("eigenvalue")
        )
    )
    return (
        v.crossJoin(F.broadcast(ray))
        .select("dim", F.col("v").alias("loading"), "eigenvalue")
        .orderBy("dim")
    )


def jl_distortion_audit(
    spark: SparkSession, sf_dir: str, d_out: int = 8, n_sample: int = 32
) -> DataFrame:
    """Johnson-Lindenstrauss projection distortion audit: project the
    64-d embeddings to ``d_out`` dimensions with a deterministic ±1
    random-sign matrix (md5 parity per (dim, output-dim) cell — the
    Achlioptas construction) and measure, on an md5-ranked sample of
    ``n_sample`` vectors (bounded at ANY corpus size), how far pairwise
    squared distances drift from the E[ratio]=1 guarantee.  The go/no-go
    study before swapping full vectors for cheap sketches in the dedup /
    ANN shortlist paths.

    Exactness: components frozen at 1e-4, so projections and both
    squared distances are pure BIGINTs; the per-pair ratio is ONE
    double division rounded to 6 dp, and the mean folds micro-frozen
    ratios.

    Scale: the projection pass is one narrow (cells × d_out) fan-out
    and would run corpus-wide; the AUDIT sample is a TakeOrdered of
    n_sample vectors, so the pair stage is n_sample² regardless of
    corpus size."""
    from project_bigdata_recsys_spark.caching import persist_tracked
    from project_bigdata_recsys_spark.functions.dedup import hash32
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    emb = load_table(spark, sf_dir, "embeddings")
    samp = (
        emb.select(
            "vec_id",
            "embedding",
            hash_uniform(F.col("vec_id"), "jl:").alias("__u"),
        )
        .orderBy("__u", "vec_id")
        .limit(n_sample)
    )
    cells = persist_tracked(
        samp.select(
            "vec_id", F.posexplode("embedding").alias("i", "x")
        ).select(
            "vec_id",
            "i",
            F.round(F.col("x").cast("double") * 10_000)
            .cast("long")
            .alias("xm"),
        )
    )
    ks = spark.range(0, d_out).select(F.col("id").cast("int").alias("kk"))
    sign = 1 - 2 * (
        hash32(F.concat_ws(":", F.col("i"), F.col("kk")), "jls:") % 2
    )
    proj = persist_tracked(
        cells.crossJoin(F.broadcast(ks))
        .groupBy("vec_id", "kk")
        .agg(F.sum(sign * F.col("xm")).cast("long").alias("p"))
    )
    pa = proj.select(
        F.col("vec_id").alias("va"), "kk", F.col("p").alias("p_a")
    )
    pb = proj.select(
        F.col("vec_id").alias("vb"),
        F.col("kk").alias("k2"),
        F.col("p").alias("p_b"),
    )
    po = (
        pa.join(pb, (F.col("kk") == F.col("k2")) & (F.col("va") < F.col("vb")))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("p_a") - F.col("p_b")) * (F.col("p_a") - F.col("p_b"))
            )
            .cast("long")
            .alias("proj2")
        )
    )
    ca = cells.select(F.col("vec_id").alias("va"), "i", F.col("xm").alias("x_a"))
    cb = cells.select(
        F.col("vec_id").alias("vb"),
        F.col("i").alias("i2"),
        F.col("xm").alias("x_b"),
    )
    od = (
        ca.join(cb, (F.col("i") == F.col("i2")) & (F.col("va") < F.col("vb")))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("x_a") - F.col("x_b")) * (F.col("x_a") - F.col("x_b"))
            )
            .cast("long")
            .alias("orig2")
        )
    )
    ratio = F.round(
        F.col("proj2") / (F.lit(float(d_out)) * F.col("orig2")), 6
    )
    pairs = po.join(od, ["va", "vb"]).select(ratio.alias("ratio"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("ratio") * 1e6).cast("long")) / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.round(
            F.sum((F.abs(F.col("ratio") - 1.0) <= 0.2).cast("int"))
            / F.count(F.lit(1)),
            4,
        ).alias("frac_within_20pct"),
    )


def hard_negative_mining(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for each
    anchor vector, the top-k most-similar vectors with a DIFFERENT label
    — near the anchor in embedding space yet semantically negative, the
    examples a contrastive loss learns the most from (and the standard
    curation step before dense-retriever / embedding-model training;
    random negatives are trivially separable at scale).

    Output: (query_id, anchor_label, rank, neg_vec_id, neg_label,
    cos_sim) — exactly k rows per anchor, ranked by similarity.

    Scale: anchors broadcast (n_queries rows), corpus scans once, the
    different-label filter drops same-class rows BEFORE the per-anchor
    rank window (one shuffle keyed by query id).  This exact form is the
    oracle/gate variant; at corpus scale the candidate stage swaps for
    the IVF/RP-LSH bucketed probes (`ivf_bucketed_knn`, `knn_rp_lsh`)
    with this as the verification baseline — identical composition to
    knn_multi_query vs the ANN family."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("q_emb"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "query_id",
            "anchor_label",
            F.col("vec_id").alias("neg_vec_id"),
            F.col("label").alias("neg_label"),
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neg_vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "anchor_label",
            "rank",
            "neg_vec_id",
            "neg_label",
            "cos_sim",
        )
        .orderBy("query_id", "rank")
    )


def kcenter_coreset(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez's 2-approximation,
    the farthest-point heuristic behind k-center coreset sampling for
    training data): starting from the lowest vec_id, repeatedly pick
    the vector FARTHEST from the chosen set — the vector whose maximum
    cosine to any selected center is smallest — then report each
    center's covered population and coverage radius.  This is the
    DIVERSITY sampler of the curation family: quota/temperature
    sampling balances counts, dedup removes near-equals, k-center picks
    a spread that covers the embedding space.

    Determinism: each round ranks on the 6-dp-rounded cosine with a
    vec_id tie-break (the knn-family discipline), and final assignment
    breaks cosine ties toward the earlier-selected center — total
    orders both engines replay; the oracle unrolls the identical k−1
    greedy rounds.

    Scale: each greedy round is ONE scan with the current centers as
    broadcast literals (k·dim doubles — never a join), and the
    selection itself is a TakeOrderedAndProject top-1, so the loop is
    k−1 bounded-driver-collect rounds of O(n·k·dim) work; the final
    assignment explodes the k-center literal array once (n·k rows).
    The k collected rows are bounded by contract (k is the coreset
    budget, never data-sized)."""
    emb = load_table(spark, sf_dir, "embeddings")
    seed = (
        emb.orderBy("vec_id")
        .limit(1)
        .select("vec_id", "embedding")
        .collect()[0]
    )
    centers: list[tuple[int, list[float]]] = [
        (int(seed.vec_id), [float(x) for x in seed.embedding])
    ]
    for _ in range(k - 1):
        cos_cols = [
            F.round(
                cosine(F.col("embedding"), F.array(*[F.lit(v) for v in cemb])),
                6,
            )
            for _, cemb in centers
        ]
        max_cos = cos_cols[0] if len(cos_cols) == 1 else F.greatest(*cos_cols)
        nxt = (
            emb.filter(~F.col("vec_id").isin([cid for cid, _ in centers]))
            .select("vec_id", "embedding", max_cos.alias("mc"))
            .orderBy(F.asc("mc"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        centers.append((int(nxt.vec_id), [float(x) for x in nxt.embedding]))
    carr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("sel_order"),
                F.lit(cid).cast("long").alias("center_id"),
                F.array(*[F.lit(v) for v in cemb]).alias("cemb"),
            )
            for i, (cid, cemb) in enumerate(centers)
        ]
    )
    asg = (
        emb.select("vec_id", "embedding", F.explode(carr).alias("c"))
        .select(
            "vec_id",
            F.col("c.sel_order").alias("sel_order"),
            F.col("c.center_id").alias("center_id"),
            F.round(cosine(F.col("embedding"), F.col("c.cemb")), 6).alias(
                "cos_r"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_r"), F.asc("sel_order")
    )
    return (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("sel_order", "center_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("cos_r").alias("min_cos"),
        )
        .orderBy("sel_order")
    )


def mmr_diversified_rerank(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    depth: int = 50,
    k: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) —
    the classic diversity rerank every RAG stack applies to its ANN
    shortlist: greedily select the candidate maximizing
    λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) with λ = 1/2, so near-
    duplicates of an already-selected hit are pushed down even when
    their raw relevance is high (recs_diversity_profile MEASURES
    shortlist redundancy; this one FIXES it).

    Exactness: relevance and pairwise similarity freeze once to micro
    (round(cos·1e6), the calibration_bins pattern), so with λ = 1/2 the
    argmax is over exact integers rel_micro − max_sim_micro with a
    vec_id tie-break — a total order both engines replay; the oracle
    unrolls the identical k−1 greedy rounds (the kcenter_coreset
    discipline).

    Scale: the shortlist is the broadcast-sized top-``depth`` frame
    (ONE corpus scan + TakeOrdered heap — the expensive part, shared
    with every ANN probe); each greedy round is one scan OF THE
    SHORTLIST with the selected set as broadcast literals and a 1-row
    TakeOrdered collect (bounded by k, the rerank budget).  The corpus
    is never rescanned after the shortlist."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    rel_micro = F.round(
        cosine(F.col("embedding"), F.col("q_emb")) * 1000000.0
    ).cast("long")
    shortlist = persist_tracked(
        emb.crossJoin(F.broadcast(query))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "embedding", rel_micro.alias("rel_micro"))
        .orderBy(F.desc("rel_micro"), F.asc("vec_id"))
        .limit(depth)
    )
    first = (
        shortlist.orderBy(F.desc("rel_micro"), F.asc("vec_id"))
        .limit(1)
        .collect()[0]
    )  # bounded: one row per greedy round, k rounds total
    selected = [
        (
            1,
            int(first.vec_id),
            int(first.rel_micro),
            0,
            [float(x) for x in first.embedding],
        )
    ]
    for rank in range(2, k + 1):
        sim_cols = [
            F.round(
                cosine(F.col("embedding"), F.array(*[F.lit(v) for v in semb]))
                * 1000000.0
            ).cast("long")
            for _, _, _, _, semb in selected
        ]
        max_sim = (
            sim_cols[0] if len(sim_cols) == 1 else F.greatest(*sim_cols)
        )
        nxt = (
            shortlist.filter(
                ~F.col("vec_id").isin([vid for _, vid, _, _, _ in selected])
            )
            .select(
                "vec_id",
                "embedding",
                "rel_micro",
                max_sim.alias("ms"),
            )
            .orderBy(
                F.desc(F.col("rel_micro") - F.col("ms")), F.asc("vec_id")
            )
            .limit(1)
            .collect()[0]
        )
        selected.append(
            (
                rank,
                int(nxt.vec_id),
                int(nxt.rel_micro),
                int(nxt.ms),
                [float(x) for x in nxt.embedding],
            )
        )
    return spark.createDataFrame(
        [(r, v, rm, ms, rm - ms) for r, v, rm, ms, _ in selected],
        "rank int, vec_id long, rel_micro long, max_sim_micro long,"
        " mmr_micro long",
    ).orderBy("rank")


def _ivf_coarse_ranked(emb: DataFrame, n_cells: int):
    """Shared coarse quantizer of the IVF-PQ family: md5-rank sampled
    centroids (the ivf_centroid_knn seed discipline — data values, no
    engine RNG, bit-exact in DuckDB) and the fully-ranked assignment
    frame (vec_id, label, embedding, cell, c_emb, cs, rn): rn = 1 is the
    home cell, rn <= p the p-probe set.  Returns (centroids, ranked)."""
    from pyspark.sql import Window

    md5_key = F.md5(F.col("vec_id").cast("string"))
    seeds = emb.orderBy(md5_key, "vec_id").limit(n_cells)
    w_cell = Window.orderBy(F.md5(F.col("seed_id").cast("string")), "seed_id")
    centroids = seeds.select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("c_emb")
    ).withColumn("cell", F.row_number().over(w_cell))
    return centroids, _ivf_assign(emb, centroids)


def _ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Rounded-cosine cell assignment of ``emb`` against GIVEN
    centroids — factored out so the incremental admission path
    (:func:`update_ivf_pq_index`) assigns new batches against the
    STORED centroids with the exact expressions the build used."""
    from pyspark.sql import Window

    with_norm = emb.withColumn("v_norm", l2_norm(F.col("embedding")))
    cent_norm = centroids.withColumn("c_norm", l2_norm(F.col("c_emb")))
    scored = with_norm.crossJoin(F.broadcast(cent_norm)).select(
        "vec_id",
        "label",
        "embedding",
        "cell",
        "c_emb",
        F.round(
            dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("v_norm") * F.col("c_norm")),
            6,
        ).alias("cs"),
    )
    w_best = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
    return scored.withColumn("rn", F.row_number().over(w_best))


def _residual(a: Column, b: Column) -> Column:
    """Element-wise float64 residual a − b (zip_with — JVM-side, no
    Python), the quantity IVF-PQ encodes instead of the raw vector."""
    return F.zip_with(
        a, b, lambda x, y: x.cast("double") - y.cast("double")
    )


def _pq_residual_frames(
    residuals: DataFrame, m_sub: int, k_codes: int, sub_dim: int
):
    """PQ codebook trained on RESIDUALS plus the per-vector code frame.

    ``residuals`` carries (vec_id, cell, r) where r = embedding − home
    centroid.  The codebook is md5-rank sampled residual vectors split
    into ``m_sub`` sub-vectors (pq_codebook's discipline applied to the
    residual space — faiss's IVF-PQ trains its product quantizer on
    residuals for exactly the recall reason the profile query measures);
    codes are the per-(vec_id, m) argmin with the 9-dp/code tie-break
    contract shared with pq_knn.  Returns (book, codes)."""
    book = _pq_codebook(residuals, k_codes, m_sub, sub_dim)
    return book, _pq_encode(residuals, book, m_sub, sub_dim)


def _pq_codebook(
    seed_residuals: DataFrame, k_codes: int, m_sub: int, sub_dim: int
) -> DataFrame:
    """The md5-rank sampled residual codebook (code, m, c_sub) — the
    TRAIN half, separated so the incremental path can freeze it."""
    from pyspark.sql import Window

    md5_key = F.md5(F.col("vec_id").cast("string"))
    seeds = seed_residuals.orderBy(md5_key, "vec_id").limit(k_codes)
    w_code = Window.orderBy(F.md5(F.col("seed_id").cast("string")), "seed_id")
    coded = seeds.select(
        F.col("vec_id").alias("seed_id"), F.col("r").alias("s_emb")
    ).withColumn("code", F.row_number().over(w_code))
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    return coded.select(
        "code",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("s_emb"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "c_sub"),
    )


def _pq_encode(
    residuals: DataFrame, book: DataFrame, m_sub: int, sub_dim: int
) -> DataFrame:
    """Per-(vec_id, m) argmin against a GIVEN codebook with the
    9-dp/code tie-break contract — the ENCODE half, shared by the
    one-shot build and the frozen-quantizer incremental admission."""
    from pyspark.sql import Window

    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    vec_subs = residuals.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("r"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "v_sub"),
    )
    d2 = (
        dot(F.col("v_sub"), F.col("v_sub"))
        - 2 * dot(F.col("v_sub"), F.col("c_sub"))
        + dot(F.col("c_sub"), F.col("c_sub"))
    )
    w_best = Window.partitionBy("vec_id", "m").orderBy(
        F.round(d2, 9).asc(), F.col("code").asc()
    )
    return (
        vec_subs.join(F.broadcast(book), "m")
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "m", "code")
    )


def ivf_pq_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """IVF-PQ composed ANN — the faiss IVFPQ shape: a coarse md5-sampled
    Voronoi quantizer routes each vector to a home cell, the product
    quantizer encodes its RESIDUAL (vector − home centroid) into
    ``m_sub`` byte codes, and a query probes its ``n_probe`` nearest
    cells with a per-cell ADC table built from the QUERY's residual
    against that cell's centroid.  Composes :func:`ivf_centroid_knn`
    (the coarse stage) with :func:`pq_knn` (the code stage); residual
    encoding is what makes the shared codebook accurate across cells —
    the recall uplift :func:`ivf_pq_recall_profile` measures.

    Everything is deterministic and DuckDB-reproducible: sampled
    centroids and codebook rows are data values, assignments use the
    rounded-cosine/cell tie-break, sub-quantizer argmins the 9-dp/code
    tie-break, ADC sums round to 6 dp — the pq_knn contract verbatim.

    Shape at scale: centroids (n_cells) and the residual codebook
    (m_sub × k_codes) broadcast; assignment + residual + encoding is ONE
    corpus scan; the probe touches only the n_probe cells' code rows
    (persist the codes partitioned by cell — build_ivf_pq_index — and
    this is partition pruning, the inverted-list read of a real IVF);
    only rerank_factor × k raw vectors are fetched for the exact rerank.
    Reference parity: the reference has no ANN index at all (its
    nearest-neighbor surface is the in-memory candidate loop of
    core-logic/run_consumer.py:213-260); this is the 100 TB
    replacement."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub
    centroids, ranked = _ivf_coarse_ranked(emb, n_cells)
    # persist: residuals feed BOTH the codebook's sampled-seed lineage
    # and the full encode; unpersisted, the corpus × centroids
    # assignment (crossJoin + per-vec window) runs twice inside the one
    # shortlist action (guide §5 persist-on-reuse)
    residuals = persist_tracked(
        ranked.filter(F.col("rn") == 1).select(
            "vec_id",
            "cell",
            _residual(F.col("embedding"), F.col("c_emb")).alias("r"),
        )
    )
    book, codes = _pq_residual_frames(residuals, m_sub, k_codes, sub_dim)

    # query side: its n_probe nearest cells, one residual (and hence one
    # ADC table) PER probed cell — m_sub x k_codes x n_probe rows, tiny
    q_cells = (
        ranked.filter(
            (F.col("vec_id") == query_vec_id) & (F.col("rn") <= n_probe)
        )
        .select("cell", _residual(F.col("embedding"), F.col("c_emb")).alias("qr"))
    )
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    q_subs = q_cells.select(
        "cell",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("qr"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "q_sub"),
    )
    adc = q_subs.join(book, "m").select(
        "cell",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    shortlist = (
        codes.join(F.broadcast(adc), ["cell", "m", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(rerank_factor * k)
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(shortlist.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def build_ivf_pq_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    n_cells: int = 8,
    m_sub: int = 8,
    k_codes: int = 16,
    subset: Column | None = None,
) -> None:
    """Persist the IVF-PQ index: centroids/ (cell, c_emb — n_cells
    rows), codebook/ (m, code, c_sub — m_sub × k_codes rows), and
    codes/ (vec_id, cell, m, code) PARTITIONED BY cell, so a probe's
    inverted-list read is parquet partition pruning (the build_ann_index
    precedent).  Encode once per corpus version; queries never touch raw
    vectors until their final rerank.  At 100 TB the codes relation is
    ~m_sub small ints per vector — the scan that replaces brute force —
    and each probe reads only n_probe / n_cells of it."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    if subset is not None:
        # incremental contract (faiss add()): quantizers train on, and
        # the initial build encodes, ONLY this corpus version; later
        # batches are admitted by update_ivf_pq_index with the
        # quantizers frozen
        emb = emb.filter(subset)
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub
    centroids, ranked = _ivf_coarse_ranked(emb, n_cells)
    centroids.select("cell", "c_emb").write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )
    # persist: the codebook write and the codes write each evaluate the
    # residual frame (and the codes write's broadcast codebook lineage
    # evaluates it a third time) — one corpus × centroids assignment
    # instead of three (guide §5 persist-on-reuse)
    residuals = persist_tracked(
        ranked.filter(F.col("rn") == 1).select(
            "vec_id",
            "cell",
            _residual(F.col("embedding"), F.col("c_emb")).alias("r"),
        )
    )
    book, codes = _pq_residual_frames(residuals, m_sub, k_codes, sub_dim)
    book.write.mode("overwrite").parquet(f"{index_dir}/codebook")
    # cluster on the partition key first: one file per cell dir instead
    # of tasks × n_cells (guide §6 small-files)
    codes.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{index_dir}/codes")


def query_ivf_pq_index(
    spark: SparkSession,
    index_dir: str,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = 2,
    rerank_factor: int = 4,
) -> DataFrame:
    """Probe the persisted IVF-PQ index: rank the stored centroids
    against the query (n_cells rows — driver-free, one broadcast join),
    build the per-probed-cell ADC tables from the stored codebook, and
    shortlist over the stored codes — the cell partition filter is
    pushed into the parquet scan, so only the probed inverted lists are
    read.  Row-identical to the inline ivf_pq_knn by construction
    (test-pinned, the query_pq_index precedent)."""
    from pyspark.sql import Window

    book = spark.read.parquet(f"{index_dir}/codebook")
    codes = spark.read.parquet(f"{index_dir}/codes")
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    emb = load_table(spark, sf_dir, "embeddings")
    m_sub = book.agg(F.max("m")).head()[0] + 1
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub

    q_emb = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_raw")
    )
    cent_norm = centroids.withColumn("c_norm", l2_norm(F.col("c_emb")))
    w_cell = Window.orderBy(F.desc("cs"), F.asc("cell"))
    q_cells = (
        q_emb.crossJoin(F.broadcast(cent_norm))
        .select(
            "cell",
            "c_emb",
            "q_raw",
            F.round(
                dot(F.col("q_raw"), F.col("c_emb"))
                / (l2_norm(F.col("q_raw")) * F.col("c_norm")),
                6,
            ).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= n_probe)
        .select("cell", _residual(F.col("q_raw"), F.col("c_emb")).alias("qr"))
    )
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    q_subs = q_cells.select(
        "cell",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("qr"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "q_sub"),
    )
    adc = q_subs.join(book, "m").select(
        "cell",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    shortlist = (
        codes.join(F.broadcast(adc), ["cell", "m", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(rerank_factor * k)
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.join(shortlist.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_pq_recall_profile(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """Candidate-recall uplift of IVF-PQ's residual coding over flat PQ
    at the SAME shortlist budget (rerank_factor × k) — the ann_rerank
    readout pattern: per query, |shortlist ∩ exact top-k| / k for both
    index shapes plus the uplift.  Flat PQ quantizes raw vectors with
    one global codebook; IVF-PQ quantizes residuals, so the same
    k_codes of codebook capacity describes the much smaller residual
    ball — the uplift column is that geometry made measurable.  One
    corpus encode per index shape (both single scans), per-query ADC
    tables broadcast, truth is the exact windowed top-k — everything on
    the pq_knn determinism contract, so the profile itself is
    oracle-gated.

    The ``cell_ceiling`` column decomposes the two effects IVF-PQ
    mixes: it is the recall an EXACT search restricted to the probed
    cells would achieve — the coarse quantizer's pruning loss, the
    best any in-cell code can do.  recall_ivf_pq reads against that
    ceiling (coding quality), not against 1.0; on a near-uniform
    corpus with few sampled cells the ceiling itself is the binding
    constraint, which is exactly what this readout is for."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub
    shortlist_n = rerank_factor * k
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )

    # exact truth: brute-force cosine per query, top-k.  persist: the
    # truth frame joins all THREE hit readouts (flat, ivf, ceiling) —
    # unpersisted, the corpus × queries brute-force pass runs three
    # times inside the one readout action (guide §5 persist-on-reuse)
    w_truth = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    truth = persist_tracked(
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w_truth))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )

    # flat-PQ shortlist: global codebook over RAW vectors (pq_knn's
    # encode), per-query ADC, windowed top-shortlist.  persist: the
    # codebook feeds the encode AND the query ADC; its lineage is a
    # corpus TakeOrdered, so unpersisted each consumer re-scans
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    flat_book = persist_tracked(pq_codebook(emb, m_sub, k_codes, sub_dim))
    vec_subs = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                subs,
                lambda m: F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
            )
        ).alias("m", "v_sub"),
    )
    d2 = (
        dot(F.col("v_sub"), F.col("v_sub"))
        - 2 * dot(F.col("v_sub"), F.col("c_sub"))
        + dot(F.col("c_sub"), F.col("c_sub"))
    )
    w_best = Window.partitionBy("vec_id", "m").orderBy(
        F.round(d2, 9).asc(), F.col("code").asc()
    )
    flat_codes = (
        vec_subs.join(F.broadcast(flat_book), "m")
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )
    q_subs_flat = queries.select(
        "query_id",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("q_emb"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "q_sub"),
    )
    adc_flat = q_subs_flat.join(flat_book, "m").select(
        "query_id",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("vec_id")
    )
    flat_short = (
        flat_codes.join(F.broadcast(adc_flat), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist_n)
        .select("query_id", "vec_id")
    )

    # IVF-PQ shortlist: coarse cells + residual codebook + per-(query,
    # probed cell) ADC — ivf_pq_knn's exact arithmetic, multi-query
    # form.  persist: residuals feed the codebook sample, the encode,
    # and the cell-ceiling membership — three corpus × centroids
    # assignment passes collapsed to one
    centroids, ranked = _ivf_coarse_ranked(emb, n_cells)
    residuals = persist_tracked(
        ranked.filter(F.col("rn") == 1).select(
            "vec_id",
            "cell",
            _residual(F.col("embedding"), F.col("c_emb")).alias("r"),
        )
    )
    res_book, res_codes = _pq_residual_frames(
        residuals, m_sub, k_codes, sub_dim
    )
    q_cells = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= n_probe)
    ).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        _residual(F.col("embedding"), F.col("c_emb")).alias("qr"),
    )
    q_subs_ivf = q_cells.select(
        "query_id",
        "cell",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("qr"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "q_sub"),
    )
    adc_ivf = q_subs_ivf.join(res_book, "m").select(
        "query_id",
        "cell",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    ivf_short = (
        res_codes.join(F.broadcast(adc_ivf), ["cell", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist_n)
        .select("query_id", "vec_id")
    )

    # pruning ceiling: every corpus vector whose HOME cell is probed —
    # the candidate set an exact in-cell search would see
    in_cells = residuals.select("vec_id", "cell").join(
        F.broadcast(q_cells.select("query_id", "cell")), "cell"
    ).select("query_id", "vec_id")

    hits_flat = (
        truth.join(flat_short, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_flat"))
    )
    hits_ivf = (
        truth.join(ivf_short, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_ivf"))
    )
    hits_ceiling = (
        truth.join(in_cells, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_ceil"))
    )
    base = queries.select("query_id")
    return (
        base.join(hits_flat, "query_id", "left")
        .join(hits_ivf, "query_id", "left")
        .join(hits_ceiling, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("n_flat"), F.lit(0)) / k, 4).alias(
                "recall_pq"
            ),
            F.round(F.coalesce(F.col("n_ivf"), F.lit(0)) / k, 4).alias(
                "recall_ivf_pq"
            ),
            F.round(F.coalesce(F.col("n_ceil"), F.lit(0)) / k, 4).alias(
                "cell_ceiling"
            ),
            F.round(
                (
                    F.coalesce(F.col("n_ivf"), F.lit(0))
                    - F.coalesce(F.col("n_flat"), F.lit(0))
                )
                / k,
                4,
            ).alias("uplift"),
        )
        .orderBy("query_id")
    )


def update_ivf_pq_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    subset: Column,
    m_sub: int = 8,
) -> None:
    """O(batch) admission of new vectors into the persisted IVF-PQ
    index — faiss's ``add()`` contract: the coarse centroids and the
    residual codebook are FROZEN (read from the index, never
    retrained); the batch is assigned to its home cell against the
    stored centroids, residual-encoded against the stored codebook
    with the identical 9-dp argmin, and the codes APPEND to the
    cell-partitioned relation.  Cost: |batch| × n_cells broadcast
    scoring + |batch| × (m_sub·k_codes) broadcast encoding — nothing
    already indexed is touched.  Quantizer staleness is the documented
    trade (retrain cadence is an ops decision, the vacuum/compaction
    discipline); :func:`ivf_pq_incremental_knn` gates exactly this
    train-once-admit-rest pipeline against its SQL twin."""
    emb = load_table(spark, sf_dir, "embeddings").filter(subset)
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    book = spark.read.parquet(f"{index_dir}/codebook")
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub
    ranked = _ivf_assign(emb, centroids)
    residuals = ranked.filter(F.col("rn") == 1).select(
        "vec_id",
        "cell",
        _residual(F.col("embedding"), F.col("c_emb")).alias("r"),
    )
    # cluster on the partition key first: one file per touched cell per
    # admission instead of tasks × cells (guide §6 small-files)
    _pq_encode(residuals, book, m_sub, sub_dim).repartition(
        "cell"
    ).write.mode("append").partitionBy("cell").parquet(
        f"{index_dir}/codes"
    )


def ivf_pq_incremental_knn(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_waves: int = 3,
) -> DataFrame:
    """Gate form of the incremental IVF-PQ pipeline: build the index on
    the first deterministic wave (vec_id % 3 == 0 — quantizers train
    on and encode that corpus version only), admit the remaining waves
    through :func:`update_ivf_pq_index` with the quantizers frozen,
    then probe.  The SQL twin mirrors the whole pipeline by restricting
    the two seed samples to the wave-0 subset while encoding/probing
    over ALL vectors — so the gate proves the frozen-quantizer
    admission math end-to-end, including the recall consequence of
    stale quantizers (the shortlist the probe returns IS the stale-
    quantizer shortlist; the rerank stays exact)."""
    from project_bigdata_recsys_spark.caching import scratch_dir

    index_dir = scratch_dir("ivfpq_incr")
    build_ivf_pq_index(
        spark, sf_dir, index_dir, subset=F.col("vec_id") % n_waves == 0
    )
    for wave in range(1, n_waves):
        update_ivf_pq_index(
            spark, sf_dir, index_dir, F.col("vec_id") % n_waves == wave
        )
    return query_ivf_pq_index(
        spark, index_dir, sf_dir, query_vec_id=query_vec_id, k=k
    )


def ivf_pq_nprobe_sweep(
    spark: SparkSession,
    sf_dir: str,
    probes: tuple = (1, 2, 4, 8),
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """The n_probe TUNING CURVE of the IVF-PQ index — the sweep every
    deployment runs before fixing its probe budget (the lsh_band_sweep
    idiom): for each n_probe, mean recall@k of the ADC shortlist
    against the exact top-k, the probed-cell exact-search ceiling, and
    the candidate volume the probe pays for it.

    ONE corpus encode serves every sweep point: a vector's codes live
    in its home cell only, so its ADC score is probe-independent — the
    probe budget merely gates WHICH home cells are admitted.  The
    scored frame carries each candidate's home-cell rank for its
    query, and each sweep point is a filter (cell_rank ≤ p) + bounded
    window over that one persisted frame.  At 100 TB the sweep costs
    one index encode plus #probes shortlist reads — never #probes
    re-encodes."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.limit(1).select(F.size("embedding").alias("d")).head().d
    sub_dim = dim // m_sub
    shortlist_n = rerank_factor * k
    max_p = max(probes)
    denom = float(n_queries * k)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w_truth = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    truth = persist_tracked(
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w_truth))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )

    centroids, ranked = _ivf_coarse_ranked(emb, n_cells)
    # persist: residuals feed the codebook's sampled-seed lineage and
    # the encode — one corpus × centroids assignment instead of two
    residuals = persist_tracked(
        ranked.filter(F.col("rn") == 1).select(
            "vec_id",
            "cell",
            _residual(F.col("embedding"), F.col("c_emb")).alias("r"),
        )
    )
    res_book, res_codes = _pq_residual_frames(
        residuals, m_sub, k_codes, sub_dim
    )
    subs = F.sequence(F.lit(0), F.lit(m_sub - 1))
    q_cells = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= max_p)
    ).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("rn").alias("cell_rank"),
        _residual(F.col("embedding"), F.col("c_emb")).alias("qr"),
    )
    q_subs = q_cells.select(
        "query_id",
        "cell",
        "cell_rank",
        F.posexplode(
            F.transform(
                subs, lambda m: F.slice(F.col("qr"), m * sub_dim + 1, sub_dim)
            )
        ).alias("m", "q_sub"),
    )
    adc = q_subs.join(res_book, "m").select(
        "query_id",
        "cell",
        "cell_rank",
        "m",
        "code",
        (
            dot(F.col("q_sub"), F.col("q_sub"))
            - 2 * dot(F.col("q_sub"), F.col("c_sub"))
            + dot(F.col("c_sub"), F.col("c_sub"))
        ).alias("d2"),
    )
    scored = persist_tracked(
        res_codes.join(F.broadcast(adc), ["cell", "m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.round(F.sum("d2"), 6).alias("approx_d2"),
            F.max("cell_rank").alias("cell_rank"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("vec_id")
    )
    out = None
    for p in probes:
        cand = scored.filter(F.col("cell_rank") <= p)
        short = (
            cand.withColumn("srn", F.row_number().over(w_short))
            .filter(F.col("srn") <= shortlist_n)
            .select("query_id", "vec_id")
        )
        row = (
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
            .crossJoin(
                truth.join(short, ["query_id", "vec_id"]).agg(
                    F.count(F.lit(1)).alias("n_hit")
                )
            )
            .crossJoin(
                truth.join(
                    cand.select("query_id", "vec_id"),
                    ["query_id", "vec_id"],
                ).agg(F.count(F.lit(1)).alias("n_ceil"))
            )
            .select(
                F.lit(p).cast("int").alias("n_probe"),
                F.round(F.lit(p) / n_cells, 4).alias("probed_frac"),
                "n_candidates",
                F.round(F.col("n_hit") / denom, 4).alias("recall"),
                F.round(F.col("n_ceil") / denom, 4).alias("cell_ceiling"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_probe")
