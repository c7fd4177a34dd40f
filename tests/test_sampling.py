from __future__ import annotations

import pytest

from distributed_pagerank_spark.operators.sampling import (
    sample_edges,
    sample_vertices_induced,
)
from distributed_pagerank_spark.sources.generator import generate_graph


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_sample_edges_deterministic_subset(spark, hash_fn):
    g = generate_graph(spark, 300, max_edges=4, seed=3)
    full = {(r["src"], r["dst"]) for r in g.collect()}
    s1 = {(r["src"], r["dst"]) for r in
          sample_edges(g, 0.3, seed=7, hash_fn=hash_fn).collect()}
    s2 = {(r["src"], r["dst"]) for r in
          sample_edges(g, 0.3, seed=7, hash_fn=hash_fn).collect()}
    assert s1 == s2  # deterministic
    assert s1 <= full
    # Bernoulli(0.3) over ~1200 edges: generous 4-sigma band
    assert 0.2 < len(s1) / len(full) < 0.4
    # nested property: a smaller fraction with the same seed is a subset
    s_small = {(r["src"], r["dst"]) for r in
               sample_edges(g, 0.1, seed=7, hash_fn=hash_fn).collect()}
    assert s_small <= s1


def test_sample_vertices_induced_property(spark):
    g = generate_graph(spark, 300, max_edges=4, seed=3)
    sub = sample_vertices_induced(g, 0.5, seed=9)
    rows = sub.collect()
    assert 0 < len(rows) < g.count()
    # both endpoints of every kept edge pass the same vertex test:
    # re-sampling the sample is a no-op
    again = sample_vertices_induced(sub, 0.5, seed=9)
    assert again.count() == len(rows)


def test_sample_rejects_bad_fraction(spark):
    g = generate_graph(spark, 20, max_edges=2, seed=1)
    with pytest.raises(ValueError):
        sample_edges(g, 1.5)
    with pytest.raises(ValueError):
        sample_vertices_induced(g, -0.1)
