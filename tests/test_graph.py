"""PageRank and cluster-aware split contracts (functions/graph.py,
functions/curation.py::cluster_aware_split) — oracle parity runs
separately in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.functions.curation import cluster_aware_split
from project_bigdata_recsys_spark.functions.graph import pagerank
from tests.conftest import SF_SMALL


def _edges(spark, pairs):
    """Symmetric unit-weight edges from undirected pair list."""
    rows = [(a, b, 1.0) for a, b in pairs] + [(b, a, 1.0) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long, w double")


def test_pagerank_mass_conserved_and_center_wins(spark):
    """Star graph 0–{1,2,3,4}: the hub must outrank every leaf, leaves
    tie, and total rank mass stays 1 (symmetric graph, no dangling)."""
    ranks = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [(0, i) for i in (1, 2, 3, 4)])).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    hub, leaves = ranks[0], [ranks[i] for i in (1, 2, 3, 4)]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12


def test_pagerank_weight_sensitivity(spark):
    """On a path 1—2—3 with the 2—3 edge 10x heavier, node 3 must
    outrank node 1 (more inflow from the shared neighbor)."""
    rows = [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 10.0), (3, 2, 10.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert ranks[3] > ranks[1]


def test_pagerank_regular_graph_uniform(spark):
    """On a 4-cycle (vertex-transitive), every node gets exactly the
    same rank — any asymmetry would reveal order-dependent arithmetic."""
    ranks = [
        r.rank
        for r in pagerank(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])).collect()
    ]
    assert max(ranks) - min(ranks) < 1e-12
    assert abs(sum(ranks) - 1.0) < 1e-9


def test_cluster_aware_split_no_leakage_and_covers_corpus(spark):
    """Split covers every document exactly once and no near-dup cluster
    spans two splits (the measured leak count is zero)."""
    from project_bigdata_recsys_spark.catalog import load_table

    rows = cluster_aware_split(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert all(r.n_leaky_clusters == 0 for r in rows)
    assert all(r.n_clusters <= r.n_docs for r in rows)


def test_cluster_aware_split_accepts_precomputed_components(spark):
    """Passing the CC labeling skips the pair/CC recompute and must give
    byte-identical output to the self-computed form."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import (
        connected_components,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    comps = connected_components(simhash_near_pairs_for(docs, sort=False))
    a = cluster_aware_split(spark, SF_SMALL).collect()
    b = cluster_aware_split(spark, SF_SMALL, components=comps).collect()
    assert a == b
