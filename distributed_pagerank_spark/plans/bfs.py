"""Multi-source BFS — shortest hop distances from K roots in one loop.

The web-graph distance primitive (reachability, radius/eccentricity
estimation, k-hop neighbourhood sizing) run level-synchronously: per
round, the FRONTIER (vertices first reached last round) joins the edge
table once for all roots, candidates already seen are anti-joined away,
and the remainder becomes the next frontier. State is keyed
``(root, id)`` and grows monotonically with the reached set; the
per-round join cost tracks the frontier size — the expensive artifact
(the edge table, partitioned by ``src`` and persisted) is shared across
every root and every round, exactly like the multi-seed PPR loop
(``plans/ppr.py``).

Unweighted shortest paths only: the first round that reaches a vertex
fixes its distance, so no relaxation or re-visits occur — each round is
one join + one distinct + one anti-join against the visited set.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.degrees import symmetrize
from pyspark.sql import Observation

from distributed_pagerank_spark.plans.loop import (
    loop_conf,
    obs_name,
    release_local_checkpoint,
    safe_truncate,
)


def multi_source_bfs(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
    directed: bool = False,
    num_partitions: int | None = None,
    truncate_interval: int = 5,
    metrics_out: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Hop distances ``(root, id, dist)`` from every root in ``sources``.

    ``sources``: ``(root, id)`` — typically ``root == id`` (a root per
    row), but a root may start from several vertices (multi-origin BFS:
    ``dist`` is then the hop count from the nearest origin of that
    root). ``directed=False`` (default) symmetrizes the edge table
    first — link-graph distance queries usually want the undirected
    view; pass ``True`` to follow edge direction.

    Rounds run to ``max_depth`` or until every frontier is empty,
    whichever is first. The visited set is the result.
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    e = edges if directed else symmetrize(edges)
    e = (
        e.select("src", "dst")
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()

    frontier = (
        sources.select("root", "id", F.lit(0).alias("dist"))
        .distinct()
        .repartition(num_partitions, "id")
        .persist()
    )
    if frontier.count() == 0:
        e.unpersist()
        raise ValueError("empty sources: no BFS roots")
    visited = frontier  # depth 0: the visited set IS the frontier
    metrics = metrics_out if metrics_out is not None else []
    last_truncated, since_truncate = None, 0

    with loop_conf(spark):
        for depth in range(1, max_depth + 1):
            t0 = time.monotonic()
            candidates = (
                frontier.join(e, frontier["id"] == e["src"])
                .select("root", F.col("dst").alias("id"))
                .distinct()
                .withColumn("dist", F.lit(depth))
            )
            new_frontier = (
                candidates.join(visited, ["root", "id"], "left_anti")
                .persist()
            )
            # ONE job per depth (was two): materializing the union caches
            # new_frontier's partitions on the way (persist above), and an
            # Observation counts the depth's new rows as a side-effect —
            # valid because every pre-existing visited row has dist <
            # depth, so the predicate counts exactly the new frontier.
            obs = Observation(obs_name(f"bfs_newrows_{depth}"))
            new_visited = (
                visited.unionByName(new_frontier)
                .observe(
                    obs,
                    F.sum((F.col("dist") == depth).cast("long")).alias("n_new"),
                )
                .persist()
            )
            new_visited.count()
            n_new = int(obs.get["n_new"] or 0)
            if n_new == 0:
                new_visited.unpersist()
                new_frontier.unpersist()
                metrics.append(
                    {"depth": depth, "frontier_rows": 0,
                     "total_s": round(time.monotonic() - t0, 4)}
                )
                break
            # both successors are materialized — release the predecessors
            # (at depth 1 frontier IS visited: release once, not twice).
            # Never release the live truncation leaf: new_visited's lineage
            # bottoms out at it, and if safe_truncate fell back to
            # localCheckpoint a released leaf cannot recompute — it is
            # released at the NEXT truncation instead (pagerank protocol).
            if frontier is not visited:
                frontier.unpersist()
            if visited is not last_truncated:
                release_local_checkpoint(visited)
            frontier, visited = new_frontier, new_visited
            since_truncate += 1
            if since_truncate >= truncate_interval and depth < max_depth:
                truncated = safe_truncate(spark, visited)
                visited.unpersist()
                visited = truncated
                if last_truncated is not None:
                    release_local_checkpoint(last_truncated)
                last_truncated = truncated
                since_truncate = 0
            metrics.append(
                {"depth": depth, "frontier_rows": n_new,
                 "total_s": round(time.monotonic() - t0, 4)}
            )

    e.unpersist()
    if frontier is not visited:
        frontier.unpersist()  # its rows live on in the visited union
    return visited.select("root", "id", "dist")
