"""k-core decomposition by iterative peeling (degeneracy analysis).

No reference counterpart (the reference computes only PageRank);
standard definition: the k-core is the maximal induced subgraph of the
undirected simple graph in which every vertex has degree ≥ k. Obtained
by repeatedly deleting vertices of degree < k until none remain — the
order of deletion does not matter (the fixpoint is unique), so the
level-synchronous rounds below compute the exact core.

Per-round plan: one degree aggregation over the current (cached) edge
set, then an anti-join of the edge set against the REMOVED vertex set
on each endpoint. The removed set is the small side — after the first
round it is typically a sliver of |V| — so it is broadcast when its
size (already known from the convergence count) is below a threshold,
making steady-state rounds one aggregation shuffle plus two map-side
broadcast anti-joins over an edge set that only ever shrinks. Edges are
re-persisted per round and the predecessor released, so the 100 TB scan
is paid once and each round touches only the surviving subgraph.
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
    safe_truncate,
)

# removed-vertex sets at or below this row count ship as broadcast
# anti-joins (two map-side passes, no shuffle of the big edge side)
BROADCAST_REMOVED_MAX = 1_000_000


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
    truncate_interval: int = 5,
    metrics_out: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Vertices of the k-core with their in-core degree → ``(id, degree)``.

    Empty result when no k-core exists. ``k < 1`` is rejected (the 0-core
    is the whole vertex set including isolated vertices, which an edge
    list cannot represent).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cur = (
        symmetrize(edges)
        .repartition(num_partitions, "src")
        .persist()
    )
    cur.count()
    metrics = metrics_out if metrics_out is not None else []
    since_truncate = 0
    last_truncated = None

    with loop_conf(spark):
        for rnd in range(1, max_iter + 1):
            t0 = time.monotonic()
            deg = cur.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("degree")
            )
            removed = deg.where(F.col("degree") < k).select("id").persist()
            n_removed = removed.count()
            if n_removed == 0:
                removed.unpersist()
                metrics.append(
                    {"round": rnd, "removed": 0,
                     "total_s": round(time.monotonic() - t0, 4)}
                )
                break
            rem = (
                F.broadcast(removed)
                if n_removed <= BROADCAST_REMOVED_MAX
                else removed
            )
            nxt = (
                cur.join(rem, cur["src"] == rem["id"], "left_anti")
                .join(rem, cur["dst"] == rem["id"], "left_anti")
                .persist()
            )
            nxt.count()
            release_local_checkpoint(cur)
            removed.unpersist()
            cur = nxt
            since_truncate += 1
            if since_truncate >= truncate_interval:
                truncated = safe_truncate(spark, cur)
                cur.unpersist()
                if last_truncated is not None:
                    release_local_checkpoint(last_truncated)
                last_truncated = truncated
                cur = truncated
                since_truncate = 0
            metrics.append(
                {"round": rnd, "removed": n_removed,
                 "total_s": round(time.monotonic() - t0, 4)}
            )

    out = (
        cur.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("degree"))
        .localCheckpoint(eager=True)
    )
    release_local_checkpoint(cur)
    return out
