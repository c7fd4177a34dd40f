"""Graph-construction operators: vertex extraction, degrees, symmetrize.

Replaces the reference's load-time graph construction
(``pkg/graph/graph.go:51-99``): where the Go code builds a reverse
adjacency map and a per-source out-link count in master RAM, we express
both as DataFrames and let Catalyst/Tungsten pick the physical strategy.

Duplicate-edge policy (SURVEY §2.1 S4): the reference text loader counts
duplicate edges in the out-degree but stores only one in-link — an
inconsistency. Default here is ``distinct()`` edges (self-consistent);
``dup_policy="reference"`` reproduces the quirk for parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """All vertex ids appearing as src or dst → ``(id long)``.

    Explode, not a union of two selects: a union evaluates ``edges``
    twice, which doubles the raw-input scan when the input is not cached —
    at 100 TB the scan is the cost."""
    return edges.select(
        F.explode(F.array("src", "dst")).alias("id")
    ).distinct()


def out_degrees(edges: DataFrame, dup_policy: str = "distinct") -> DataFrame:
    """Per-source out-degree → ``(id, out_degree)``.

    ``dup_policy='distinct'`` (default) collapses duplicate edges first;
    ``'reference'`` counts raw lines like ``graph.go:78``.
    """
    e = edges.distinct() if dup_policy == "distinct" else edges
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: each edge in both directions, deduped, no self-loops.

    Used by connected components, label propagation, triangle counting.
    Single-scan shape: one explode emits both directions per input row
    (the union-of-two-selects equivalent reads the input twice per
    evaluation — a 2× raw scan on uncached 100 TB inputs).
    """
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return both.where(F.col("src") != F.col("dst")).distinct()
