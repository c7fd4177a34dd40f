"""Connected components via hash-min label exchange (north-rule N1).

No reference implementation exists (the reference computes only PageRank);
semantics fixed by SURVEY §2.4: treat edges as undirected, iterate
``label(v) ← min(label(v), min over neighbors' labels)`` to fixpoint.
Exact output: ``(id, component)`` where component = min vertex id in the
component.

Per-iteration plan: one join of the label vector into the cached
symmetrized edge table, one min-aggregation by dst, one left join back —
the same shuffle structure as the PageRank loop, so the same scale
properties hold (static edges cached + pre-partitioned; only the label
vector moves). Convergence = zero changed labels (scalar agg).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.degrees import (
    symmetrize,
    vertices_from_edges,
)
from distributed_pagerank_spark.plans.loop import (
    CheckpointManager,
    release_local_checkpoint,
)


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 1,
    resume: bool = True,
    num_partitions: int | None = None,
    metrics_out: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """→ ``(id long, component long)`` at fixpoint."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ckpt = CheckpointManager(spark, checkpoint_dir)
    sym = (
        symmetrize(edges)
        .repartition(num_partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    sym.count()

    labels = None
    start_iter = 0
    if resume and ckpt.enabled():
        latest = ckpt.latest()
        if latest is not None:
            start_iter, labels, manifest = latest
            if manifest.get("converged"):
                sym.unpersist()
                return labels.select("id", "component")
    if labels is None:
        labels = vertices_from_edges(edges).select(
            "id", F.col("id").alias("component")
        )
    labels = labels.repartition(num_partitions, "id").persist()
    labels.count()

    iteration = start_iter
    prev = labels
    since_truncate = 0
    while iteration < max_iter:
        iteration += 1
        t0 = time.monotonic()
        nbr = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        obs = Observation(f"cc_changed_{iteration}")
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["dst"], "left")
            .select(
                "id",
                F.col("component").alias("old"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .observe(
                obs,
                F.sum((F.col("component") != F.col("old")).cast("long")).alias(
                    "changed"
                ),
            )
            .select("id", "component")
            .persist()
        )
        new_labels.count()
        changed = obs.get["changed"] or 0
        labels = new_labels
        if prev is not None:
            release_local_checkpoint(prev)
        prev = new_labels
        since_truncate += 1
        if since_truncate >= 5:
            truncated = labels.checkpoint(eager=True)  # reliable: see pagerank
            labels.unpersist()
            labels = truncated
            prev = None
            since_truncate = 0
        converged = changed == 0
        meta = {
            "algo": "connected_components",
            "changed": changed,
            "converged": converged,
            "iter_s": round(time.monotonic() - t0, 4),
        }
        if metrics_out is not None:
            metrics_out.append({"iteration": iteration, **meta})
        if ckpt.enabled() and (
            iteration % checkpoint_interval == 0 or converged
        ):
            ckpt.save(iteration, labels, meta)  # durable resume point only
        if converged:
            break
    sym.unpersist()
    return labels.select("id", "component")
