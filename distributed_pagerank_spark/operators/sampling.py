"""Deterministic seeded graph sampling — the scale-down primitives.

At 10^12 turns every exploratory analysis starts from a sample; these
are the two standard graph samplers, both DETERMINISTIC (hash of the
row's own keys, never RNG state), so a sample is reproducible across
runs, partitionings, and engines:

- ``sample_edges`` — Bernoulli over edges: keep (src, dst) when
  ``h(src|dst) mod 10^6 < fraction·10^6``. Preserves degree distribution
  shape in expectation; map-only, zero shuffles.
- ``sample_vertices_induced`` — Bernoulli over vertices, keep the induced
  subgraph (edges with BOTH endpoints sampled): preserves local
  structure (triangles, clustering) within the sample; map-only too —
  the vertex decision re-derives from the endpoint id hash on each side,
  so no vertex-table join is needed.

``hash_fn='md5'`` selects the cross-engine 60-bit hash
(operators.dedup.hash60_md5) so the sampled set has an exact DuckDB
oracle twin; ``'xxhash64'`` (default) is the fast JVM path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.dedup import hash60_md5

_DENOM = 1_000_000


def _keep(h: Column, fraction: float) -> Column:
    return F.pmod(h, F.lit(_DENOM)) < int(fraction * _DENOM)


def _hash(expr: Column, seed: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return hash60_md5(expr, seed)
    if hash_fn == "xxhash64":
        # fold to non-negative so pmod's range matches the md5 tier
        return F.abs(F.xxhash64(expr, F.lit(seed)))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def sample_edges(
    edges: DataFrame,
    fraction: float,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bernoulli edge sample at ``fraction`` ∈ [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    h = _hash(F.concat_ws("|", "src", "dst"), seed, hash_fn)
    return edges.where(_keep(h, fraction))


def sample_vertices_induced(
    edges: DataFrame,
    fraction: float,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Induced-subgraph sample: keep edges whose BOTH endpoint vertices
    pass the seeded Bernoulli test at ``fraction``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    ks = _keep(_hash(F.col("src").cast("string"), seed, hash_fn), fraction)
    kd = _keep(_hash(F.col("dst").cast("string"), seed, hash_fn), fraction)
    return edges.where(ks & kd)
