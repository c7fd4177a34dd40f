"""Betweenness centrality from sampled roots (multi-root Brandes).

No reference counterpart (the reference computes only PageRank,
``pkg/graph/pagerank.go``); standard Brandes (2001) dependency
accumulation, run for K roots simultaneously — the exact algorithm when
the roots are all vertices, the canonical unbiased sampling
approximation (Brandes–Pich) when they are a subset. ``max_depth``
additionally truncates to paths of at most that many hops
(bounded-distance betweenness) so web-scale graphs pay a fixed round
count; both the sampling and the truncation are part of the declared
semantics, not hidden error.

Two level-synchronous passes, each one join per round over a shared
persisted edge table (the multi-source-BFS economy, ``plans/bfs.py``):

- forward: per level, frontier ⋈ edges → anti-join the visited set →
  ``groupBy(root, dst).sum(sigma)`` — sigma(v) = number of shortest
  s→v paths, accumulated level by level;
- backward: per level (deepest first), successors hand back
  ``sigma(v)/sigma(w) · (1 + delta(w))`` along edges into the level
  below; betweenness(v) = Σ over roots of delta(v), roots excluded.

State is keyed ``(root, id)``; per-level slices are kept as flat
localCheckpoint snapshots (bounded by max_depth), so lineage never
grows and the backward pass re-reads exactly the rows it needs.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.degrees import symmetrize
from distributed_pagerank_spark.plans.loop import (
    loop_conf,
    release_local_checkpoint,
)


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int = 10,
    directed: bool = False,
    num_partitions: int | None = None,
    metrics_out: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Depth-truncated Brandes betweenness from ``roots`` →
    ``(id, betweenness)`` for every vertex reached by some root.

    ``roots``: one ``root`` column (vertex ids). ``directed=False``
    (default) symmetrizes the edge table. A vertex's score counts only
    dependencies of the sampled roots (scale by |V|/K for the
    Brandes–Pich estimate of the full sum).
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    metrics = metrics_out if metrics_out is not None else []
    e = edges if directed else symmetrize(edges)
    e = (
        e.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()

    # ---- forward pass: per-level (root, id, sigma) slices
    levels: list[DataFrame] = []  # levels[i] = vertices at dist i
    frontier = (
        roots.select(
            F.col("root").cast("long").alias("root"),
            F.col("root").cast("long").alias("id"),
            F.lit(1.0).alias("sigma"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # depth-0 visited set: a projection of the just-checkpointed frontier
    # — flat lineage already, no second checkpoint job needed (r6)
    visited = frontier.select("root", "id")
    levels.append(frontier)
    with loop_conf(spark):
        for depth in range(1, max_depth + 1):
            t0 = time.monotonic()
            cand = (
                frontier.join(e, frontier["id"] == e["src"])
                .select("root", F.col("dst").alias("id"), "sigma")
            )
            # aggregate BEFORE the anti-join (guide §2.3): the sigma sum
            # gets map-side partial aggregation, so the (root,id,sigma)
            # exchange carries one row per pair instead of one per path,
            # and the anti-join then reuses the groupBy's (root,id)
            # partitioning — one exchange of the candidate stream, not
            # two. Identical result: pairs the anti-join drops are
            # dropped whole, kept pairs sum the same rows.
            nxt = (
                cand.groupBy("root", "id")
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited, ["root", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            n = nxt.count()
            metrics.append(
                {"phase": "forward", "depth": depth, "rows": n,
                 "total_s": round(time.monotonic() - t0, 4)}
            )
            if n == 0:
                release_local_checkpoint(nxt)
                break
            new_visited = visited.unionByName(
                nxt.select("root", "id")
            ).localCheckpoint(eager=True)
            release_local_checkpoint(visited)
            visited = new_visited
            levels.append(nxt)
            frontier = nxt
    release_local_checkpoint(visited)

    # ---- backward pass: delta accumulates deepest-level-first
    last = len(levels) - 1
    contributions: list[DataFrame] = []
    delta_slices: list[DataFrame] = []  # released after `out` materializes
    delta_above: DataFrame | None = None  # (root, id, sigma, delta)
    with loop_conf(spark):
        for lev in range(last, 0, -1):
            t0 = time.monotonic()
            cur = levels[lev]
            if delta_above is None:
                # deepest level: delta is a literal over an
                # already-checkpointed slice — no data to snapshot, no
                # lineage to cut, so no checkpoint job (r6: one job less)
                cur_delta = cur.select(
                    "root", "id", "sigma", F.lit(0.0).alias("delta")
                )
            else:
                # hand-back join: v (level lev) → w (level lev+1) edges
                w = delta_above.select(
                    "root",
                    F.col("id").alias("wid"),
                    F.col("sigma").alias("wsigma"),
                    F.col("delta").alias("wdelta"),
                )
                handed = (
                    cur.join(e, cur["id"] == e["src"])
                    .select("root", "id", "sigma",
                            F.col("dst").alias("wid"))
                    .join(w, ["root", "wid"])
                    .groupBy("root", "id", "sigma")
                    .agg(
                        F.sum(
                            F.col("sigma") / F.col("wsigma")
                            * (F.lit(1.0) + F.col("wdelta"))
                        ).alias("delta")
                    )
                )
                cur_delta = (
                    cur.join(
                        handed.select("root", "id", "delta"),
                        ["root", "id"],
                        "left",
                    )
                    .select(
                        "root", "id", "sigma",
                        F.coalesce("delta", F.lit(0.0)).alias("delta"),
                    )
                    .localCheckpoint(eager=True)
                )
            delta_above = cur_delta
            delta_slices.append(cur_delta)
            contributions.append(
                cur_delta.select("id", "delta")
            )
            metrics.append(
                {"phase": "backward", "depth": lev,
                 "total_s": round(time.monotonic() - t0, 4)}
            )

    if not contributions:
        out = spark.createDataFrame([], "id long, betweenness double")
        out = out.localCheckpoint(eager=True)
    else:
        allc = contributions[0]
        for c in contributions[1:]:
            allc = allc.unionByName(c)
        out = (
            allc.groupBy("id")
            .agg(F.sum("delta").alias("betweenness"))
            .localCheckpoint(eager=True)
        )
    for sl in delta_slices:
        release_local_checkpoint(sl)
    for lv in levels:
        release_local_checkpoint(lv)
    e.unpersist()
    return out
