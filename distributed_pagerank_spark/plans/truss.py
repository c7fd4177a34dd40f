"""k-truss decomposition by iterative support peeling.

No reference counterpart (the reference computes only PageRank,
``pkg/graph/pagerank.go``); standard definition (Cohen 2008): the
k-truss is the maximal subgraph of the undirected simple graph in which
every edge participates in at least k−2 triangles *within the
subgraph*. Obtained by repeatedly deleting edges whose in-subgraph
support drops below k−2; the fixpoint is unique (deletion order does
not matter), so level-synchronous rounds compute the exact truss.

Per-round plan: enumerate each surviving triangle once via the
degree-ordered compact-forward intersection (``plans/triangles.py
triangle_rows`` — per-vertex oriented adjacency is O(√m), so the
enumeration is skew-resistant on power-law graphs), explode each
triangle to its three canonical ``(least, greatest)`` edges, count
support with one map-side-combined aggregation, and inner-join the
surviving edge set. The edge set only ever shrinks and is snapshotted
per round with ``localCheckpoint`` so lineage stays flat; at 100 TB the
full-graph triangle enumeration is paid once on the raw scan and every
later round touches only the surviving (typically much smaller)
subgraph.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.plans.loop import (
    loop_conf,
    release_local_checkpoint,
)
from distributed_pagerank_spark.plans.triangles import triangle_rows


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected simple edges as ``(src, dst)`` with src < dst, deduped;
    self-loops carry no triangles and are dropped."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _edge_support(spark: SparkSession, cur: DataFrame) -> DataFrame:
    """Per-edge triangle count within ``cur`` → ``(src, dst, support)``.

    Edges in no triangle are absent (support 0 implied); one triangle
    enumeration + one aggregation.
    """
    tris = triangle_rows(spark, cur)
    corners = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst"),
                ),
                F.struct(
                    F.least("a", "c").alias("src"),
                    F.greatest("a", "c").alias("dst"),
                ),
                F.struct(
                    F.least("b", "c").alias("src"),
                    F.greatest("b", "c").alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    sup = (
        corners.groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("support"))
        .localCheckpoint(eager=True)
    )
    release_local_checkpoint(tris)
    return sup


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    metrics_out: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Edges of the k-truss with their in-truss support →
    ``(src, dst, support)``, src < dst.

    Empty result when no k-truss exists. ``k < 3`` is rejected (the
    2-truss is the whole edge set — no triangle constraint to enforce).
    """
    if k < 3:
        raise ValueError("k must be >= 3")
    metrics = metrics_out if metrics_out is not None else []
    cur = _canonical(edges).localCheckpoint(eager=True)
    n_cur = cur.count()
    out = None

    with loop_conf(spark):
        for rnd in range(1, max_iter + 1):
            t0 = time.monotonic()
            if n_cur == 0:
                break
            sup = _edge_support(spark, cur)
            survivors = (
                cur.join(sup, ["src", "dst"], "inner")
                .where(F.col("support") >= k - 2)
                .localCheckpoint(eager=True)
            )
            n_next = survivors.count()
            release_local_checkpoint(sup)
            metrics.append(
                {"round": rnd, "removed": n_cur - n_next,
                 "total_s": round(time.monotonic() - t0, 4)}
            )
            if n_next == n_cur:
                # fixpoint: survivors' support was computed on a graph
                # identical to the final subgraph
                release_local_checkpoint(cur)
                out = survivors
                break
            release_local_checkpoint(cur)
            cur = survivors.select("src", "dst").localCheckpoint(eager=True)
            release_local_checkpoint(survivors)
            n_cur = n_next

    if out is None:
        if n_cur == 0:
            # emptied: the k-truss does not exist
            out = (
                cur.select(
                    "src", "dst", F.lit(0).cast("long").alias("support")
                )
                .where(F.lit(False))
                .localCheckpoint(eager=True)
            )
        else:
            # max_iter exhausted mid-peel: return the current survivor
            # set with support recomputed on it — a supergraph of the
            # k-truss (peeling truncated early, never over-deleted)
            sup = _edge_support(spark, cur)
            out = (
                cur.join(sup, ["src", "dst"], "left")
                .select(
                    "src", "dst",
                    F.coalesce("support", F.lit(0))
                    .cast("long").alias("support"),
                )
                .localCheckpoint(eager=True)
            )
            release_local_checkpoint(sup)
        release_local_checkpoint(cur)
    return out
