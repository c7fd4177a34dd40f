from __future__ import annotations

import pytest

from distributed_pagerank_spark.operators.graphstats import (
    degree_assortativity,
    reciprocity,
)
from tests.conftest import CYCLE4, STAR_IN, TWO_COMPONENTS, edges_df


def test_reciprocity_symmetric_graph(spark):
    r = reciprocity(spark, edges_df(spark, TWO_COMPONENTS)).first()
    assert r["total_edges"] == 4
    assert r["reciprocal_edges"] == 4
    assert r["reciprocity"] == 1.0


def test_reciprocity_one_way_cycle(spark):
    r = reciprocity(spark, edges_df(spark, CYCLE4)).first()
    assert r["reciprocity"] == 0.0


def test_reciprocity_mixed_dups_self_loops(spark):
    # (0,1)+(1,0) mutual; (1,2) one-way; dup (0,1) and self-loop ignored
    pairs = [(0, 1), (0, 1), (1, 0), (1, 2), (3, 3)]
    r = reciprocity(spark, edges_df(spark, pairs)).first()
    assert r["total_edges"] == 3
    assert r["reciprocal_edges"] == 2
    assert r["reciprocity"] == pytest.approx(2 / 3)


def test_assortativity_star_is_negative_one(spark):
    # a star is perfectly disassortative: every edge joins deg-4 to deg-1
    r = degree_assortativity(spark, edges_df(spark, STAR_IN)).first()
    assert r["assortativity"] == pytest.approx(-1.0)


def test_assortativity_regular_graph_undefined(spark):
    # all degrees equal → zero variance → corr undefined (NULL)
    r = degree_assortativity(spark, edges_df(spark, CYCLE4)).first()
    assert r["assortativity"] is None


def test_assortativity_matches_numpy(spark):
    import numpy as np

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    und = set()
    for s, d in pairs:
        und.add((min(s, d), max(s, d)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = np.corrcoef(xs, ys)[0, 1]
    r = degree_assortativity(spark, edges_df(spark, pairs)).first()
    assert r["assortativity"] == pytest.approx(want, abs=1e-12)
