"""Graph analytics over co-occurrence structure: weighted PageRank.

The reference ranks items by raw popularity (its knowledge base keeps a
global top-N course list, core-logic/train_module.py:396-422); a
co-occurrence-graph PageRank is the standard upgrade — an item is
important if it co-occurs with other important items, which surfaces
long-tail items that raw counts bury.  Candidate generators read the top
of this ranking the same way they read kb_popular_items.

Spark-first design: the classic Pregel loop expressed as DataFrame
joins — each iteration is one shuffle join (ranks ⋈ edges on src) plus
one aggregate (sum of contributions by dst), exactly the partitioning a
1000-executor cluster wants.  Iterations are FIXED-COUNT (not
convergence-tested), so the whole computation is a deterministic
dataflow the DuckDB oracle replays as unrolled CTEs.

Float determinism note: per-dst contribution sums are floating-point
adds in engine-dependent order; outputs are rounded (6 dp) and the gate
compares with relative tolerance — same discipline as every avg()/sum()
query in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table

DAMPING = 0.85
N_ITERATIONS = 3


def item_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric weighted edges (src, dst, w) between parts co-ordered in
    the same order.  Same bounded self-join as relational.cooccurrence_
    pairs (blowup capped by basket size, dedup before the join), emitted
    in both directions so the random walk is over the undirected graph —
    which also guarantees no dangling nodes (every node has out-edges)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    basket = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )


def shared_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-occurrence edge frame, built ONCE per (session, sf):
    within a single :func:`pagerank` call the lazy edge pipeline is
    re-derived by norm/outw/nodes, and the classic + personalized gate
    pair used to pay the basket self-join twice more on top (r6
    advisory: ~19.5 s of bench on two rebuilds).  PARQUET-backed
    (round 10, the shared_components / shared_minhash_signatures
    pattern): the memory-persist tier only protected ADJACENT
    consumers — a session owner's block sweep between queries evicted
    the blocks, so every non-adjacent consumer (kcore, triangles,
    Adamic-Adar, degree profiles) silently re-ran the basket self-join
    (~5-6 s each at sf0.1).  A parquet read is sweep-proof and is what
    the real contract does anyway (a nightly graph-build job).  The
    path revalidates against scratch purges."""
    import os

    from project_bigdata_recsys_spark.caching import scratch_dir

    key = (spark.sparkContext.applicationId, str(sf_dir))
    if key not in _COOC_EDGES or not os.path.exists(_COOC_EDGES[key]):
        path = os.path.join(scratch_dir(prefix="spark_cooc_edges_"), "edges")
        item_cooccurrence_edges(spark, sf_dir).write.mode(
            "overwrite"
        ).parquet(path)
        _COOC_EDGES[key] = path
    return spark.read.parquet(_COOC_EDGES[key])


_COOC_EDGES: dict[tuple, str] = {}


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    n_iterations: int = N_ITERATIONS,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst, w) edges, fixed iteration count.

    rank₀(v) = 1/N;  rankᵢ₊₁(v) = (1-d)/N + d·Σ_{u→v} rankᵢ(u)·w(u,v)/W(u)

    N rides along as a broadcast 1-row aggregate (no driver-side
    count()), so the whole loop is one lazy plan.  Each iteration
    shuffles on src (join) then dst (agg).  The loop-invariant frames
    (normalized edges, node set) are persist_tracked — without that the
    lazy lineage re-derives the whole edge pipeline once per iteration
    and the plan blows up combinatorially (measured: 274 Exchanges at 3
    iterations unpersisted vs ~10 persisted).  For long chains also
    localCheckpoint ranks every few rounds (the connected_components
    discipline, functions/dedup.py:589).

    ``seeds`` (a one-column ``node`` frame) switches to PERSONALIZED
    PageRank: the teleport mass lands uniformly on the seed set instead
    of all nodes (rank₀ = teleport), biasing the stationary ranking
    toward the seeds' neighborhoods — topic-sensitive retrieval.  With
    ``seeds=None`` the teleport vector is uniform and the math reduces
    exactly to the classic form."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    # co-partition the loop's two persisted operands on their join keys
    # with an EXPLICIT partition count (user repartitions are exempt
    # from AQE coalescing, so the cached partitioning is stable): the
    # per-iteration contribution join then matches hash(src) against
    # hash(node) without re-exchanging either side each round
    # (guide §2.4 — two operations keyed the same way share one
    # exchange; previously the SMJ re-shuffled both sides per iteration)
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    outw = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    norm = persist_tracked(
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("w_out")).alias("p"))
        .repartition(n_part, "src")
    )
    nodes = persist_tracked(edges.select(F.col("src").alias("node")).distinct())
    if seeds is None:
        n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_base"))
        base = nodes.crossJoin(F.broadcast(n_row)).select(
            "node", (F.lit(1.0) / F.col("n_base")).alias("tele")
        )
    else:
        seed_nodes = seeds.select("node").distinct().join(nodes, "node")
        ns = seed_nodes.agg(F.count(F.lit(1)).cast("double").alias("n_base"))
        base = (
            nodes.join(
                F.broadcast(seed_nodes.withColumn("__s", F.lit(1.0))),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(ns))
            .select(
                "node",
                (F.coalesce(F.col("__s"), F.lit(0.0)) / F.col("n_base")).alias(
                    "tele"
                ),
            )
        )
    base = persist_tracked(base.repartition(n_part, "node"))
    ranks = base.select("node", "tele", F.col("tele").alias("rank"))
    for _ in range(n_iterations):
        # ranks feeds BOTH sides of the update join (contrib and the
        # teleport base), so an unpersisted frame doubles its lineage
        # every iteration — persist makes it a leaf and keeps the plan
        # linear in n_iterations.  No explicit repartition here: each
        # iterate is the update join's output, already hash(node,
        # n_part)-partitioned (left side of the left join), so it stays
        # co-partitioned with `norm` for the next round's join.
        ranks = persist_tracked(ranks)
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                "tele",
                (
                    (1.0 - damping) * F.col("tele")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def item_pagerank(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Gate query: top-k parts by co-occurrence PageRank.  Rounded rank
    + total ordering under the LIMIT (oracle-parity rules)."""
    edges = shared_cooccurrence_edges(spark, sf_dir)
    ranks = pagerank(edges)
    return (
        ranks.select(
            F.col("node").alias("part"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("part"))
        .limit(k)
    )


def item_pagerank_personalized(
    spark: SparkSession, sf_dir: str, k: int = 25
) -> DataFrame:
    """Gate query: topic-sensitive PageRank — teleport mass restricted
    to the md5-free deterministic seed set (parts with partkey % 10 ==
    0), top-k by the personalized rank.  The retrieval primitive behind
    'more like THESE' recommendations over the co-occurrence graph."""
    edges = shared_cooccurrence_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter((F.col("node") % 10) == 0)
    )
    ranks = pagerank(edges, seeds=seeds)
    return (
        ranks.select(
            F.col("node").alias("part"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("part"))
        .limit(k)
    )


def item_pmi(spark: SparkSession, sf_dir: str, k: int = 25, min_pairs: int = 3) -> DataFrame:
    """Pointwise mutual information over part co-occurrence — the
    association measure that separates "frequently bought together"
    from "both just popular" (raw co-counts, the reference KB's measure
    via train_module.py:396-405, are dominated by bestsellers).

    PMI(a,b) = log2(N·c_ab / (c_a·c_b)) with N = total baskets.  Built
    from one basket self-join (bounded by basket size), two broadcast
    joins for the margins, and N folded in as a broadcast 1-row
    aggregate — no driver-side count.  min_pairs floors the co-count so
    rare-pair noise (PMI's known failure mode) can't top the ranking."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    lineitem = load_table(spark, sf_dir, "lineitem")
    # persist: basket feeds BOTH self-join sides plus the margin and
    # basket-count rollups — unmaterialized, each consumer re-scans
    # lineitem and re-runs the distinct shuffle (guide §5
    # persist-on-reuse; 2 int columns, MEMORY_AND_DISK spill).
    basket = persist_tracked(
        lineitem.select("l_orderkey", "l_partkey").distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pairs)
    )
    # persist: the per-part margin rollup is broadcast twice (a-side and
    # b-side); |parts| rows.
    margins = persist_tracked(
        basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    )
    n_row = basket.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    return (
        pair_counts.join(
            F.broadcast(margins.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))),
            "part_a",
        )
        .join(
            F.broadcast(margins.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log2(
                    F.col("n_baskets") * F.col("c_ab") / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("part_a"), F.asc("part_b"))
        .limit(k)
    )


def association_rules(
    spark: SparkSession,
    sf_dir: str,
    min_cooccur: int = 3,
    k: int = 25,
) -> DataFrame:
    """Market-basket association rules a→b with support, confidence, and
    lift — the interpretable candidate-generation layer next to ALS (the
    reference's KB keeps raw co-occurrence counts only,
    core-logic/train_module.py:396-405).  Directed rules: confidence
    P(b|a) = c_ab/c_a is asymmetric, so each unordered co-occurrence
    yields two rules.

    Same bounded basket self-join as item_pmi; margins and the basket
    count broadcast; min_cooccur floors the pair count before ranking so
    singleton-pair noise can't dominate lift."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    lineitem = load_table(spark, sf_dir, "lineitem")
    # persist: basket feeds both self-join sides plus the margin and
    # basket-count rollups — unmaterialized, the plan scanned lineitem
    # SEVEN times (guide §5 persist-on-reuse; 2 int columns,
    # MEMORY_AND_DISK spill).
    basket = persist_tracked(
        lineitem.select("l_orderkey", "l_partkey").distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    # persist: the directed-rule union consumes `half` twice — without
    # materialization the whole basket self-join runs twice.  Bounded by
    # the min_cooccur support floor.
    half = persist_tracked(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_cooccur)
    )
    rules = half.selectExpr("x AS antecedent", "y AS consequent", "c_ab").unionByName(
        half.selectExpr("y AS antecedent", "x AS consequent", "c_ab")
    )
    # persist: broadcast twice (antecedent and consequent margins).
    margins = persist_tracked(
        basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    )
    n_row = basket.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    return (
        rules.join(
            F.broadcast(
                margins.select(
                    F.col("l_partkey").alias("antecedent"), F.col("c").alias("c_a")
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                margins.select(
                    F.col("l_partkey").alias("consequent"), F.col("c").alias("c_b")
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "antecedent",
            "consequent",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(F.col("c_ab") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("c_ab") / F.col("c_a"), 6).alias("confidence"),
            F.round(
                F.col("n_baskets") * F.col("c_ab") / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.desc("confidence"), F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
        )
        .limit(k)
    )


def item_communities(
    spark: SparkSession, sf_dir: str, min_cooccur: int = 3
) -> DataFrame:
    """Product communities: connected components over the co-occurrence
    graph thresholded at ``min_cooccur`` shared baskets — the
    "product-family" clustering a merchandiser reads next to the
    pairwise rules.  Reuses the dedup CC kernel (min-label propagation +
    pointer halving) on a non-text domain: the component machinery is
    generic over any pair relation.

    Thresholding BEFORE clustering is the scale control: it prunes the
    graph to strong edges (the same role banding plays for text pairs),
    so CC rounds run over thousands of edges, not the full pair space."""
    from project_bigdata_recsys_spark.caching import persist_tracked
    from project_bigdata_recsys_spark.functions.dedup import connected_components

    lineitem = load_table(spark, sf_dir, "lineitem")
    # persist: both self-join sides — one lineitem scan + one distinct
    # shuffle instead of two (guide §5).
    basket = persist_tracked(
        lineitem.select("l_orderkey", "l_partkey").distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("doc_a"),
            F.col("b.l_partkey").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_cooccur)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("doc_id").alias("min_part"),
            F.max("doc_id").alias("max_part"),
        )
        .filter(F.col("n_parts") >= 2)
        .orderBy(F.desc("n_parts"), F.asc("cluster_id"))
        .limit(25)
    )


def _orient_edges(edges: DataFrame) -> DataFrame:
    """Degree-ordered orientation of an undirected (src, dst, w) edge
    frame: each edge points from its lower-(degree, id) endpoint to the
    higher one — returns (u, v, vdeg).  Shared by the triangle count and
    any wedge-style consumer; the degree computation and the two
    annotation joins run once per materialization."""
    und = edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    deg = (
        und.select(F.col("src").alias("node"))
        .unionByName(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    with_deg = (
        und.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return with_deg.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
    )


def shared_oriented_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degree-ordered oriented edge frame, built once per
    (session, sf) — r7 advisory: item_triangles and every other wedge
    consumer re-derived degrees + orientation from the shared edge frame
    per call; this tier makes the orientation itself a one-time cost.
    Parquet-backed (round 10) for the same sweep-proofing as the edge
    frame it derives from."""
    import os

    from project_bigdata_recsys_spark.caching import scratch_dir

    key = (spark.sparkContext.applicationId, str(sf_dir))
    if key not in _COOC_ORIENTED or not os.path.exists(_COOC_ORIENTED[key]):
        path = os.path.join(
            scratch_dir(prefix="spark_cooc_oriented_"), "oriented"
        )
        _orient_edges(shared_cooccurrence_edges(spark, sf_dir)).write.mode(
            "overwrite"
        ).parquet(path)
        _COOC_ORIENTED[key] = path
    return spark.read.parquet(_COOC_ORIENTED[key])


_COOC_ORIENTED: dict[tuple, str] = {}


def shared_item_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part distinct-basket counts (l_partkey, c), persisted once
    per (session, sf) — the margin frame item_similar_neighbors (and
    any Salton/lift-style scorer) normalizes by; one basket scan +
    groupBy instead of one per query."""
    from project_bigdata_recsys_spark.caching import persist_shared

    def build() -> DataFrame:
        basket = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        return basket.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )

    key = f"item-margins:{spark.sparkContext.applicationId}:{sf_dir}"
    return persist_shared(key, build)


def item_triangles(
    spark: SparkSession,
    sf_dir: str,
    k: int = 20,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Triangle counting over the co-purchase graph — the clustering /
    community-density primitive (a part's triangle count measures how
    cliquish its co-purchase neighborhood is).

    Scale shape: the textbook degree-ordered orientation.  Each
    undirected edge points from its lower-(degree, id) endpoint to the
    higher one, so every triangle is generated EXACTLY once as a wedge
    (x→y, x→z) closed by y→z, and the wedge join's fan-out per node is
    its out-degree under orientation — O(√m) max even for power-law
    hubs, the standard O(m^1.5) bound — instead of the unbounded d²
    a naive shared-neighbor self-join pays on hub nodes.  Per-node
    counts explode each triangle to its 3 corners (bounded ×3), and
    the top-k is a TakeOrdered heap, never a global sort.
    """
    from project_bigdata_recsys_spark.caching import persist_tracked

    oriented = (
        shared_oriented_edges(spark, sf_dir)
        if edges is None
        else _orient_edges(edges)
    )
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("vdeg").alias("ydeg")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("z"), F.col("vdeg").alias("zdeg")
    )
    wedges = e1.join(e2, "u").where(
        (F.col("ydeg") < F.col("zdeg"))
        | ((F.col("ydeg") == F.col("zdeg")) & (F.col("y") < F.col("z")))
    )
    closer = oriented.select(
        F.col("u").alias("y"), F.col("v").alias("z")
    )
    tris = wedges.join(closer, ["y", "z"]).select(
        F.col("u").alias("x"), "y", "z"
    )
    corners = tris.select(
        F.explode(F.array("x", "y", "z")).alias("l_partkey")
    )
    # persist: per_node feeds BOTH the readout and the grand total —
    # unmaterialized, `tris` is a common subexpression Spark re-executes
    # per consumer, so the whole wedge join ran TWICE (guide §5
    # persist-on-reuse; plan before/after in plans/r15/).  The total is
    # derived from per_node (Σ corner counts = 3·|triangles|, exact
    # integer div) instead of a second count over `tris`, so the
    # persisted frame is |V| rows, never the triangle set itself.
    per_node = persist_tracked(
        corners.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )
    )
    total = per_node.agg(
        F.expr("sum(n_triangles) div 3")
        .cast("long")
        .alias("total_triangles")
    )
    return (
        per_node.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n_triangles"), "l_partkey")
        .limit(k)
    )


def item_similar_neighbors(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    top_items: int = 50,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Item-to-item serving table: for each of the ``top_items`` most
    co-purchased parts, its top-k neighbors by Salton cosine
    c_ab / √(c_a·c_b) — the degree-normalized similarity that, unlike
    raw co-counts (the reference KB's measure) and unlike PMI's
    rare-pair amplification, is the standard i2i collaborative-filtering
    score.

    Shape: FOURTH consumer of the persist_shared co-occurrence edge
    frame (both directions, so each src row already carries its full
    neighbor list); margins broadcast; the per-src top-k window
    partitions on src with bounded neighbor counts.  Ranking compares
    the 6-dp-rounded score (√ is IEEE-exact, so even the raw doubles
    agree — the round is belt-and-braces), dst tie-break.
    """
    from pyspark.sql import Window

    edges = edges if edges is not None else shared_cooccurrence_edges(spark, sf_dir)
    margins = shared_item_margins(spark, sf_dir)
    anchors = (
        margins.orderBy(F.desc("c"), "l_partkey")
        .limit(top_items)
        .select(F.col("l_partkey").alias("src"), F.col("c").alias("c_src"))
    )
    scored = (
        edges.join(F.broadcast(anchors), "src")
        .join(
            F.broadcast(
                margins.select(
                    F.col("l_partkey").alias("dst"), F.col("c").alias("c_dst")
                )
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            F.col("w").cast("long").alias("c_ab"),
            F.round(
                F.col("w") / F.sqrt(F.col("c_src") * F.col("c_dst")), 6
            ).alias("salton"),
        )
    )
    pick = Window.partitionBy("src").orderBy(
        F.col("salton").desc(), F.col("dst")
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick).cast("int"))
        .where(F.col("rk") <= k)
        .select("src", "rk", "dst", "c_ab", "salton")
        .orderBy("src", "rk")
    )


def link_prediction_adamic_adar(
    spark: SparkSession,
    sf_dir: str,
    k: int = 20,
    center_cap: int = 64,
) -> DataFrame:
    """Adamic-Adar link prediction over the co-purchase graph: for item
    pairs NOT yet co-purchased, score their affinity by the common
    neighbors z they share, each weighted 1/ln(deg z) — a rare shared
    neighbor is strong evidence, a hub says nothing.  The classic
    cold-start candidate generator: the top-scored non-edges are the
    "customers who bought these also bought" pairs a recommender
    surfaces before any interaction exists.

    Scale shape: wedge enumeration at the CENTER node (pairs of z's
    neighbors), whose fan-out is deg(z)² — so centers above
    ``center_cap`` are dropped, the textbook hub cut (a super-hub's
    1/ln(deg) contribution is near-constant noise spread over
    quadratically many pairs; the same reasoning that drops stopwords
    from inverted indexes).  Remaining joins are all keyed: adjacency
    self-join on the center, anti-join against existing edges, one
    aggregation, TakeOrdered top-k.  Per-wedge weights are micro
    fixed-point BIGINTs (round(1e6/ln(deg))) so the fold is exact.

    Degrees/edges come from the session-persisted co-occurrence frame
    (shared_cooccurrence_edges) — no basket rescan."""
    edges = shared_cooccurrence_edges(spark, sf_dir)
    und = edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    adj = und.select(
        F.col("src").alias("z"), F.col("dst").alias("nb")
    ).unionByName(und.select(F.col("dst").alias("z"), F.col("src").alias("nb")))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    centers = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= center_cap)
    ).select(
        "z",
        F.round(F.lit(1_000_000.0) / F.log(F.col("deg")))
        .cast("long")
        .alias("__w"),
    )
    wedges = (
        adj.join(centers, "z")
        .alias("a")
        .join(
            adj.select(F.col("z"), F.col("nb").alias("nb2")).alias("b"),
            (F.col("a.z") == F.col("b.z")) & (F.col("a.nb") < F.col("b.nb2")),
        )
        .select(
            F.col("a.nb").alias("u"),
            F.col("b.nb2").alias("v"),
            F.col("a.__w").alias("__w"),
        )
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("__w").cast("long").alias("__aa"),
    )
    non_edges = scored.join(
        und,
        (scored.u == und.src) & (scored.v == und.dst),
        "left_anti",
    )
    return (
        non_edges.orderBy(F.desc("__aa"), "u", "v")
        .limit(k)
        .select(
            "u",
            "v",
            "n_common",
            F.round(F.col("__aa") / 1_000_000.0, 6).alias("aa_score"),
        )
    )


def hits_scores(
    edges: DataFrame, n_iterations: int = 3
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a bipartite
    (hub, auth) edge frame, fixed iteration count: a(p) = Σ h(o) over
    in-edges, h(o) = Σ a(p) over out-edges, each half-step normalized to
    MEAN 1 (instead of the classic L2 norm — scale-free at any corpus
    size, and exactly replayable in SQL) and frozen to 6 dp so both
    engines fold identical doubles into the next round.

    Scale: the edge frame is the fact-scale side (shuffles on hub then
    auth per iteration — same shape as pagerank); score frames are one
    row per distinct node.  Loop-invariant edges and each iterate are
    persist_tracked (the pagerank lineage discipline)."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    e = persist_tracked(edges.select("hub", "auth").distinct())
    hubs = e.select("hub").distinct().select("hub", F.lit(1.0).alias("h"))

    def normalize(df: DataFrame, key: str, col: str) -> DataFrame:
        mean = df.agg((F.sum(col) / F.count(F.lit(1))).alias("__m"))
        return df.crossJoin(F.broadcast(mean)).select(
            key, F.round(F.col(col) / F.col("__m"), 6).alias(col)
        )

    auths = None
    for _ in range(n_iterations):
        # each normalize() reads its input twice (agg + join): truncate
        # lineage per half-step or the plan quadruples every iteration
        hubs = hubs.localCheckpoint()
        auths = normalize(
            e.join(hubs, "hub").groupBy("auth").agg(F.sum("h").alias("a")),
            "auth",
            "a",
        )
        auths = auths.localCheckpoint()
        hubs = normalize(
            e.join(auths, "auth").groupBy("hub").agg(F.sum("a").alias("h")),
            "hub",
            "h",
        )
    return auths


def order_part_hits(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Gate query: top-k authority parts in the bipartite order→part
    graph under HITS — parts are authoritative when ordered by orders
    that also order other authoritative parts (a mutually-reinforcing
    popularity notion PageRank's random walk doesn't express).  Rounded
    score + total ordering under the LIMIT."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = lineitem.select(
        F.col("l_orderkey").alias("hub"), F.col("l_partkey").alias("auth")
    )
    return (
        hits_scores(edges)
        .select(F.col("auth").alias("part"), F.col("a").alias("authority"))
        .orderBy(F.desc("authority"), F.asc("part"))
        .limit(k)
    )


def textrank_keywords(
    spark: SparkSession, sf_dir: str, k: int = 25, min_len: int = 4
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word-adjacency graph — words of length >= min_len that
    appear next to each other in a document are linked; the stationary
    rank surfaces corpus keywords that sit in many well-connected
    contexts, a strictly different signal from raw frequency
    (token_frequencies) or TF-IDF (tfidf_top_terms).

    Composes the existing :func:`pagerank` kernel (same damping /
    iteration count / lineage discipline) over adjacency edges built in
    one tokenization pass; the adjacency self-pairing is positional
    (array transform), never a join."""
    from project_bigdata_recsys_spark.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents").withColumn(
        "__toks",
        F.filter(
            F.split(F.col("text"), " "), lambda t: F.length(t) >= min_len
        ),
    )
    pairs = (
        docs.filter(F.size("__toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> struct(element_at(__toks, i) AS w1,"
                    " element_at(__toks, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the symmetric union consumes `half` twice, and pagerank
    # consumes `edges` three times (out-weights, normalization join,
    # node set) — unmaterialized, the tokenize + pair-explode pass ran
    # up to six times (guide §5).  Both frames are vocabulary-bounded.
    half = persist_tracked(
        pairs.filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = half.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "w"
    ).unionByName(
        half.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
    )
    # parallel adjacencies (a,b seen both ways) merge into one edge so
    # the oracle's symmetric-sum matches exactly
    edges = persist_tracked(
        edges.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    ranks = pagerank(edges)
    return (
        ranks.select(
            F.col("node").alias("word"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(k)
    )


def kcore_profile(
    spark: SparkSession, sf_dir: str, deg_frac: float = 0.25, n_rounds: int = 6
) -> DataFrame:
    """k-core peeling profile of the item co-occurrence graph at the
    data-derived threshold k = the p25 initial degree (exact order
    statistic off the degree histogram): per peel round, the surviving
    node/edge counts — the subgraph-density diagnostic for deciding
    where graph features (triangles, neighbors) are meaningful.  On an
    expander-like graph (this corpus: random co-purchases) the profile
    correctly shows the cascade — removing the low-degree quartile
    drops survivors below k and the core empties within ~3 rounds —
    which is itself the finding: there is no dense core, so
    core-restricted features would be vacuous.  Fixed ``n_rounds``
    synchronous rounds keep it deterministic and oracle-expressible
    (chained materialized CTEs on the SQL side).

    Scale: starts from the persist_shared co-occurrence edge frame
    (zero rebuild next to pagerank/triangles/neighbors); the threshold
    is ONE bounded 1-row collect off the #distinct-degrees histogram
    (the ml/ranking.py bounded-collect class) embedded as a literal;
    each live round is one degree aggregation + two semi-joins — O(m)
    per round — and the per-round survivor stats (1-row aggregates,
    same bounded class) short-circuit the loop: once the core empties,
    the remaining rounds are emitted as zero literals instead of
    running empty-frame jobs (on this corpus the cascade empties by
    round ~3, so half the pre-r10 rounds were pure scheduler
    overhead)."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    g = persist_tracked(
        shared_cooccurrence_edges(spark, sf_dir).select("src", "dst").distinct()
    )
    deg0 = g.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hist = deg0.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "d",
        F.sum("n").over(w).alias("c"),
        F.sum("n").over(Window.partitionBy()).alias("nt"),
    )
    k_raw = (
        cum.filter(F.col("c") >= deg_frac * F.col("nt"))
        .agg(F.min("d").cast("long").alias("k"))
        .collect()[0]["k"]
    )
    # empty edge frame: min over an empty agg is NULL — default k to 0
    # (every round peels nothing) instead of raising TypeError
    k_val = int(k_raw) if k_raw is not None else 0
    rows: list[tuple[int, int, int, int]] = []
    empty = False
    for r in range(1, n_rounds + 1):
        if empty:
            rows.append((r, k_val, 0, 0))
            continue
        keep = (
            g.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k_val)
            .select("src")
        )
        # keep's plan embeds g, and g_{r} reads g_{r-1} three ways — the
        # chained-CTE blowup (3^rounds); localCheckpoint caps the plan
        g = g.join(keep, "src", "semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "semi"
        ).localCheckpoint()
        stats = g.agg(
            F.count_distinct("src").cast("long").alias("n_nodes"),
            F.count(F.lit(1)).cast("long").alias("n_edges_directed"),
        ).collect()[0]
        rows.append((r, k_val, stats["n_nodes"], stats["n_edges_directed"]))
        empty = stats["n_edges_directed"] == 0
    return spark.createDataFrame(
        rows, "round int, k long, n_nodes bigint, n_edges_directed bigint"
    ).orderBy("round")


def two_hop_reach(
    spark: SparkSession, sf_dir: str, k_seeds: int = 20
) -> DataFrame:
    """Exact 2-hop neighborhood size for the top-degree items in the
    co-occurrence graph — the expansion diagnostic that separates hub
    items whose influence saturates in one hop from bridges that reach
    a large second shell (what a graph-feature or candidate-generation
    stage needs to know before fanning out 2-hop features corpus-wide).

    Bounded by construction, never corpus-n²: seeds are the ``k_seeds``
    highest-degree nodes (total order: degree DESC, node ASC), their
    1-hop pair list (Σ seed degrees rows) BROADCASTS into the edge
    scan for the second hop, so the only big-side work is two passes
    over the shared edge memo; the frontier blowup is capped at
    Σ_{v∈N1(seeds)} deg(v) — the documented deg² knob, controlled by
    ``k_seeds``, not data size.  Reach counts dedupe (seed, node) pairs
    exactly and exclude the seed itself."""
    edges = shared_cooccurrence_edges(spark, sf_dir).select("src", "dst")
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    seeds = (
        deg.orderBy(F.desc("degree"), F.asc("src"))
        .limit(k_seeds)
        .select(F.col("src").alias("seed"), "degree")
    )
    h1 = edges.join(
        F.broadcast(seeds), edges.src == F.col("seed")
    ).select("seed", "degree", F.col("dst").alias("n1"))
    h2 = edges.join(
        F.broadcast(h1.select("seed", "n1")), edges.src == F.col("n1")
    ).select("seed", F.col("dst").alias("node"))
    reach = (
        h1.select("seed", F.col("n1").alias("node"))
        .unionByName(h2)
        .filter(F.col("node") != F.col("seed"))
        .distinct()
    )
    return (
        reach.groupBy("seed")
        .agg(F.count(F.lit(1)).cast("long").alias("n_two_hop"))
        .join(F.broadcast(seeds), "seed")
        .select(
            F.col("seed").alias("part"),
            "degree",
            F.col("degree").alias("n_one_hop"),
            "n_two_hop",
            F.round(
                F.col("n_two_hop") / F.col("degree").cast("double"), 6
            ).alias("expansion_ratio"),
        )
        .orderBy("part")
    )


def cooccurrence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month churn of the co-occurrence graph — the
    graph-evolution audit that tells a recommender when its item-item
    edges actually move: per consecutive month pair, how many edges
    survived, appeared, and dropped, and the edge-set Jaccard.  A flat
    Jaccard says cached graph features stay valid; a cliff says the
    co-purchase structure rotated and downstream features (triangles,
    neighbors, PageRank) need a rebuild — the temporal complement to
    the static profiles.

    Scale: the per-month edge build is the SAME basket-bounded
    self-join as item_cooccurrence_edges with the month tag riding
    along (blowup capped by basket size, never corpus n²); the
    month-over-month intersection is ONE co-partitioned (src, dst)
    equi-join of the edge frame against itself restricted to a
    broadcast consecutive-month map; everything after is
    #months-sized.  Counts are exact BIGINTs, the single ratio rounds
    at 6 dp."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    )
    basket = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("month", "l_orderkey", "l_partkey")
    )
    a, b = basket.alias("a"), basket.alias("b")
    # NOT persisted: all four consumers hang off the identical
    # self-join+distinct subtree, which AQE dedupes via ReusedExchange —
    # an explicit persist was A/B-measured SLOWER (materialization cost
    # without saved work); contrast heaps_fit_profile's per_doc, whose
    # consumers differ and genuinely re-run the producer
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.month").alias("month"),
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    months = edges.select("month").distinct()
    w = Window.orderBy("month").rowsBetween(-1, -1)
    # the month list is #months-sized; the unkeyed window is bounded
    month_pairs = (
        months.withColumn("prev_month", F.max("month").over(w))
        .filter(F.col("prev_month").isNotNull())
        .select("prev_month", F.col("month").alias("curr_month"))
    )
    counts = edges.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    prev_e = edges.select(
        F.col("month").alias("prev_month"), "src", "dst"
    )
    curr_e = edges.select(
        F.col("month").alias("curr_month"), "src", "dst"
    )
    common = (
        prev_e.join(F.broadcast(month_pairs), "prev_month")
        .join(curr_e, ["curr_month", "src", "dst"])
        .groupBy("prev_month", "curr_month")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    out = (
        month_pairs.join(
            counts.select(
                F.col("month").alias("prev_month"),
                F.col("n_edges").alias("n_prev"),
            ),
            "prev_month",
        )
        .join(
            counts.select(
                F.col("month").alias("curr_month"),
                F.col("n_edges").alias("n_curr"),
            ),
            "curr_month",
        )
        .join(common, ["prev_month", "curr_month"], "left")
        .select(
            "prev_month",
            "curr_month",
            "n_prev",
            "n_curr",
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("long")
            .alias("n_common"),
        )
    )
    return out.select(
        "prev_month",
        "curr_month",
        "n_prev",
        "n_curr",
        "n_common",
        (F.col("n_curr") - F.col("n_common")).cast("long").alias("n_new"),
        (F.col("n_prev") - F.col("n_common")).cast("long").alias("n_dropped"),
        F.round(
            F.col("n_common")
            / (F.col("n_prev") + F.col("n_curr") - F.col("n_common")).cast(
                "double"
            ),
            6,
        ).alias("edge_jaccard"),
    ).orderBy("curr_month")


def label_prop_communities(
    spark: SparkSession,
    sf_dir: str,
    n_rounds: int = 3,
    min_weight: float = 2.0,
    top_k: int = 50,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the co-occurrence graph thresholded at
    ``min_weight`` shared baskets — the finer-grained companion to
    :func:`item_communities`' connected components: CC lumps everything
    reachable into one family, LPA splits a connected region along its
    internal density structure, which is what a merchandiser wants when
    the whole catalog is one giant component.

    Determinism (the property plain LPA lacks): updates are SYNCHRONOUS
    (every round reads only the previous round's labels) and the vote
    is totally ordered — max neighbor-label count, ties to the MINIMUM
    label — so the fixed ``n_rounds`` unrolled rounds give one exact
    answer on any engine, partition order, or schedule; the DuckDB twin
    unrolls the identical three rounds (the pagerank-oracle pattern).

    Scale: each round is one |E|-bounded join (labels onto edge
    destinations) + one (node, label)-bounded vote count — shuffles on
    the node key reuse the same partitioning round to round; nothing is
    iterated to convergence (fixed rounds, the incremental-CC
    discipline for bounded lineage)."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the thresholded edge list feeds the label init plus one
    # join per round (4 scans of the edge memo + filter otherwise;
    # guide §5).  Two int columns.
    edges = persist_tracked(
        shared_cooccurrence_edges(spark, sf_dir)
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(n_rounds):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .select("src", "label")
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("src").alias("node"), "label")
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_member"),
            F.sum("node").cast("long").alias("member_checksum"),
        )
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(top_k)
    )


def local_clustering_profile(
    spark: SparkSession, sf_dir: str, k: int = 25, max_degree: int = 512
) -> DataFrame:
    """Local clustering coefficient per item — cc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) over the co-purchase graph: the node-level
    cliquishness readout that separates "hub of one community" (high
    cc) from "bridge between communities" (low cc at equal degree),
    which the global triangle count (item_triangles) cannot see.

    Reuses the degree-ordered-orientation triangle kernel (every
    triangle generated exactly once, wedge fan-out bounded O(√m)) and
    the shared oriented-edge frame — no new corpus-sized work beyond
    one per-node corner fold and a degree join.  cc freezes once to
    micro by exact integer floor-div (2·T·1e6 div d(d−1)); the top-k
    heap orders on (cc_micro DESC, n_triangles DESC, key) — total.
    ``max_degree`` bounds the readout to non-hub nodes the way the
    Adamic-Adar center cap does (a 100 TB hub's cc is ~0 and
    uninteresting; the cap documents that, it does not hide a cost —
    the kernel already paid the oriented bound)."""
    oriented = shared_oriented_edges(spark, sf_dir)
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("vdeg").alias("ydeg")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("z"), F.col("vdeg").alias("zdeg")
    )
    wedges = e1.join(e2, "u").where(
        (F.col("ydeg") < F.col("zdeg"))
        | ((F.col("ydeg") == F.col("zdeg")) & (F.col("y") < F.col("z")))
    )
    closer = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closer, ["y", "z"]).select(
        F.col("u").alias("x"), "y", "z"
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = (
        oriented.select(F.col("u").alias("l_partkey"))
        .unionAll(oriented.select(F.col("v").alias("l_partkey")))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        per_node.join(deg, "l_partkey")
        .filter((F.col("degree") >= 2) & (F.col("degree") <= max_degree))
        .select(
            "l_partkey",
            "degree",
            "n_triangles",
            F.expr(
                "CAST(2 * n_triangles AS DECIMAL(38, 0)) * 1000000"
                " div CAST(degree * (degree - 1) AS DECIMAL(38, 0))"
            )
            .cast("long")
            .alias("cc_micro"),
        )
        .orderBy(
            F.desc("cc_micro"), F.desc("n_triangles"), F.asc("l_partkey")
        )
        .limit(k)
    )
