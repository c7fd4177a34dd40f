"""Skew handling: hub salting + two-stage aggregation.

The reference partitions work round-robin over vertices
(``pkg/node/master.go:280-320``) — degree-oblivious, so a power-law hub
lands its whole in-neighborhood on one worker. At 10^12-turn scale a hot
``dst`` (a popular tool vertex, a conversation root) would hot-spot one
shuffle partition. Mandated fix (BASELINE.json north_rule: "skewed
high-degree hub vertices handled by salting plus two-stage aggregation"):

1. join the (small) set of hub ids — dst in-degree above a threshold —
   onto the contribution stream as a broadcast;
2. **stage 1**: ``groupBy(dst, salt)`` where ``salt = pmod(hash(src), S)``
   for hubs and 0 otherwise → at most ``S`` partial rows per hub;
3. **stage 2**: ``groupBy(dst)`` over the partials — now skew-free.

Note Spark's hash aggregate already does a map-side partial combine, which
resolves *sum* skew in most cases; explicit salting additionally protects
the stage-boundary shuffle when a single key's partials exceed a partition
(and is the documented contract for this engine). It costs one extra small
shuffle, so it is opt-in via ``skew_salt`` in the algorithm entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hub_ids(edges: DataFrame, threshold: int) -> DataFrame:
    """dst vertices with in-degree > threshold → ``(hub_id)``. Small by
    construction on power-law graphs (broadcast side of the salt join)."""
    return (
        edges.groupBy("dst")
        .agg(F.count("*").alias("in_deg"))
        .where(F.col("in_deg") > threshold)
        .select(F.col("dst").alias("hub_id"))
    )


def salted_sum(
    contribs: DataFrame,
    hubs: DataFrame,
    key: str = "dst",
    value: str = "contrib",
    salt_buckets: int = 32,
    salt_source: str = "src",
) -> DataFrame:
    """Two-stage skew-safe sum of ``value`` by ``key``.

    ``contribs`` must carry ``salt_source`` (e.g. the edge src) to derive a
    deterministic salt. Returns ``(key, sum)`` with column names
    ``(<key>, sum)``.
    """
    salted = contribs.join(
        F.broadcast(hubs), contribs[key] == hubs["hub_id"], "left"
    ).withColumn(
        "_salt",
        F.when(
            F.col("hub_id").isNotNull(),
            F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)),
    )
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_psum"))
    return partial.groupBy(key).agg(F.sum("_psum").alias("sum"))
