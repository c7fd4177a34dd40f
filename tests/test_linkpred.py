from __future__ import annotations

import math

import pytest

from distributed_pagerank_spark.operators.linkpred import link_prediction
from distributed_pagerank_spark.sources.generator import generate_graph
from tests.conftest import edges_df


def brute_linkpred(pairs, method, top_k=10, max_middle_degree=None):
    und, nbrs = set(), {}
    for s, d in pairs:
        if s != d:
            und.add((min(s, d), max(s, d)))
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cand = {}
    for w, ns in nbrs.items():
        if max_middle_degree is not None and len(ns) > max_middle_degree:
            continue
        for u in ns:
            for v in ns:
                if u < v and (u, v) not in und:
                    cand.setdefault((u, v), []).append(w)
    rows = []
    for (u, v), ws in cand.items():
        if method == "common_neighbors":
            score = float(len(ws))
        elif method == "jaccard":
            score = len(ws) / len(nbrs[u] | nbrs[v])
        else:
            score = sum(1.0 / math.log(len(nbrs[w])) for w in ws)
        rows.append((u, v, len(ws), score))
    out = {}
    by_u = {}
    for r in rows:
        by_u.setdefault(r[0], []).append(r)
    for u, rs in by_u.items():
        rs.sort(key=lambda r: (-r[3], r[1]))
        for rank, r in enumerate(rs[:top_k], 1):
            out[(u, r[1])] = (r[2], r[3], rank)
    return out


# square 0-1-2-3-0: each vertex has two distance-2 partners' wedges;
# diagonals (0,2) and (1,3) have two common neighbors each
SQUARE = [(0, 1), (1, 2), (2, 3), (3, 0)]


@pytest.mark.parametrize("method", ["adamic_adar", "common_neighbors", "jaccard"])
def test_linkpred_square(spark, method):
    got = {
        (r["u"], r["v"]): (r["common"], r["score"], r["rank"])
        for r in link_prediction(
            spark, edges_df(spark, SQUARE), method=method
        ).collect()
    }
    want = brute_linkpred(SQUARE, method)
    assert set(got) == set(want) == {(0, 2), (1, 3)}
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1])
        assert got[k][2] == want[k][2]


@pytest.mark.parametrize("method", ["adamic_adar", "jaccard"])
def test_linkpred_generated_matches_brute(spark, method):
    edges = generate_graph(spark, 60, max_edges=3, seed=17)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    want = brute_linkpred(pairs, method, top_k=5)
    got = {
        (r["u"], r["v"]): (r["common"], r["score"], r["rank"])
        for r in link_prediction(
            spark, edges, method=method, top_k=5
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1]), k
        assert got[k][2] == want[k][2], k


def test_linkpred_hub_cap_excludes_middle(spark):
    # star center (degree 4) as the only middle vertex: capping below 4
    # removes every candidate
    star = [(i, 0) for i in range(1, 5)]
    full = link_prediction(spark, edges_df(spark, star), method="common_neighbors")
    assert full.count() == 6  # C(4,2) leaf pairs
    capped = link_prediction(
        spark, edges_df(spark, star), method="common_neighbors",
        max_middle_degree=3,
    )
    assert capped.count() == 0


def test_linkpred_rejects_unknown_method(spark):
    with pytest.raises(ValueError):
        link_prediction(spark, edges_df(spark, SQUARE), method="katz")
