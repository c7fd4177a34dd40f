"""avg_neighbor_degree and modularity vs brute-force oracles."""

from __future__ import annotations

from collections import defaultdict

from distributed_pagerank_spark.operators.graphstats import (
    avg_neighbor_degree,
    modularity,
)
from distributed_pagerank_spark.plans.labelprop import label_propagation
from distributed_pagerank_spark.sources.generator import generate_graph

from tests.conftest import edges_df


def sym_nbrs(pairs):
    nbrs = defaultdict(set)
    for s, d in pairs:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    return nbrs


def brute_knn(pairs):
    nbrs = sym_nbrs(pairs)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    by_degree = defaultdict(list)
    for v, ns in nbrs.items():
        by_degree[deg[v]].append(
            sum(deg[w] for w in ns) / len(ns)
        )
    return {
        k: (round(sum(vals) / len(vals), 6), len(vals))
        for k, vals in by_degree.items()
    }


def brute_modularity(pairs, labels):
    nbrs = sym_nbrs(pairs)
    edges = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    m = len(edges)
    lab = {v: labels.get(v, v) for v in nbrs}
    m_c, d_c = defaultdict(int), defaultdict(int)
    for u, v in edges:
        if lab[u] == lab[v]:
            m_c[lab[u]] += 1
    for v, ns in nbrs.items():
        d_c[lab[v]] += len(ns)
    return sum(
        m_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )


def test_avg_neighbor_degree_star(spark):
    # star K1,4: hub degree 4 sees leaves (deg 1); leaves see the hub
    got = {
        r["degree"]: (round(r["knn"], 6), r["n_vertices"])
        for r in avg_neighbor_degree(
            spark, edges_df(spark, [(0, i) for i in range(1, 5)])
        ).collect()
    }
    assert got == {4: (1.0, 1), 1: (4.0, 4)}


def test_avg_neighbor_degree_generated_matches_brute(spark):
    edges = generate_graph(spark, 70, max_edges=5, seed=3)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    got = {
        r["degree"]: (round(r["knn"], 6), r["n_vertices"])
        for r in avg_neighbor_degree(spark, edges).collect()
    }
    assert got == brute_knn(pairs)


def test_modularity_two_cliques(spark):
    # two triangles joined by one edge, labeled by clique: Q = 2*(3/7) -
    # ((7/14)^2)*2 = 6/7 - 1/2
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)]
    row = modularity(
        spark,
        edges_df(spark, pairs),
        spark.createDataFrame(labels, "id long, label long"),
    ).collect()[0]
    assert row["m_edges"] == 7
    assert row["n_communities"] == 2
    assert abs(row["modularity"] - brute_modularity(
        pairs, dict(labels))) < 1e-12


def test_modularity_singleton_default_for_unlabeled(spark):
    # no labels at all -> every vertex its own community
    pairs = [(0, 1), (1, 2)]
    row = modularity(
        spark,
        edges_df(spark, pairs),
        spark.createDataFrame([], "id long, label long"),
    ).collect()[0]
    assert row["n_communities"] == 3
    assert abs(row["modularity"] - brute_modularity(pairs, {})) < 1e-12


def test_modularity_of_lp_communities_matches_brute(spark):
    edges = generate_graph(spark, 60, max_edges=3, seed=11)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    labels = label_propagation(spark, edges, rounds=3)
    lab_map = {r["id"]: r["label"] for r in labels.collect()}
    row = modularity(spark, edges, labels).collect()[0]
    assert abs(row["modularity"] - brute_modularity(
        pairs, lab_map)) < 1e-12
