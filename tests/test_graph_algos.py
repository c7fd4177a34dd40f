from __future__ import annotations

import pytest

from distributed_pagerank_spark.oracle import (
    brute_components,
    brute_label_propagation,
    brute_triangles,
)
from distributed_pagerank_spark.plans.components import connected_components
from distributed_pagerank_spark.plans.labelprop import label_propagation
from distributed_pagerank_spark.plans.triangles import triangle_count
from distributed_pagerank_spark.sources.generator import generate_graph

from tests.conftest import ALL_FIXTURES, edges_df


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_components_exact(spark, name):
    pairs = ALL_FIXTURES[name]
    got = {
        r["id"]: r["component"]
        for r in connected_components(spark, edges_df(spark, pairs)).collect()
    }
    assert got == brute_components(pairs)


def test_components_generated(spark):
    edges = generate_graph(spark, 60, max_edges=3, seed=5)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    got = {r["id"]: r["component"] for r in connected_components(spark, edges).collect()}
    assert got == brute_components(pairs)
    # generator chains i-1 -> i, so the graph is connected: 1 component
    assert set(got.values()) == {0}


@pytest.mark.parametrize(
    "name,expected",
    [("triangle_plus", 1), ("chain5", 0), ("cycle4", 0), ("star_in", 0)],
)
def test_triangles_fixtures(spark, name, expected):
    pairs = ALL_FIXTURES[name]
    assert brute_triangles(pairs) == expected  # sanity: oracle agrees
    got = triangle_count(spark, edges_df(spark, pairs)).first()["triangles"]
    assert got == expected


def test_triangles_generated(spark):
    edges = generate_graph(spark, 40, max_edges=6, seed=3)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    got = triangle_count(spark, edges).first()["triangles"]
    assert got == brute_triangles(pairs)
    assert got > 0


@pytest.mark.parametrize("name", ["triangle_plus", "two_components", "chain5"])
def test_label_propagation_matches_oracle(spark, name):
    pairs = ALL_FIXTURES[name]
    rounds = 4
    got = {
        r["id"]: r["label"]
        for r in label_propagation(spark, edges_df(spark, pairs), rounds=rounds).collect()
    }
    assert got == brute_label_propagation(pairs, rounds)


def test_label_propagation_generated(spark):
    edges = generate_graph(spark, 30, max_edges=4, seed=9)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    rounds = 3
    got = {
        r["id"]: r["label"]
        for r in label_propagation(spark, edges, rounds=rounds).collect()
    }
    assert got == brute_label_propagation(pairs, rounds)


def chain_edges(n):
    return [(i, i + 1) for i in range(n - 1)]


def test_components_pointer_matches_hashmin(spark):
    edges = generate_graph(spark, 300, max_edges=4, seed=11)
    a = {r["id"]: r["component"] for r in
         connected_components(spark, edges, algorithm="hashmin").collect()}
    b = {r["id"]: r["component"] for r in
         connected_components(spark, edges, algorithm="pointer").collect()}
    assert a == b


def test_components_default_is_pointer_logarithmic_on_chain(spark):
    """A length-n chain needs ~n hash-min rounds but O(log n) with pointer
    jumping — the 100 TB path for long-diameter graphs, and the DEFAULT
    (no algorithm argument) as of round 3."""
    import math as m
    n = 1024
    metrics = []
    out = connected_components(
        spark, edges_df(spark, chain_edges(n)), metrics_out=metrics,
    )
    assert out.where("component != 0").count() == 0  # one component, min id 0
    iters = len(metrics)
    assert iters <= m.ceil(m.log2(n)) + 4, iters  # 10 + slack, vs 1023 hash-min
