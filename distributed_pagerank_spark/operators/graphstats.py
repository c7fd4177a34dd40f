"""Whole-graph summary statistics: reciprocity, degree assortativity.

The two single-pass diagnostics a link-graph analysis reports next to
the degree histogram (operators/degrees.py): how mutual the directed
edges are, and whether high-degree vertices attach to high-degree
vertices. No reference counterpart (the reference computes only
PageRank); standard definitions.

Both are one or two shuffles over the edge table with scalar outputs —
no iteration, no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.degrees import symmetrize


def reciprocity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Fraction of directed simple edges (u,v) whose reverse (v,u) also
    exists → one row ``(reciprocal_edges, total_edges, reciprocity)``.

    One self-join of the deduped edge set on the swapped key (left-semi,
    so the big side streams once); 1.0 on a symmetric graph, 0.0 on a
    DAG or bipartite one-way graph.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    total = e.count()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").count()
    e.unpersist()
    row = [(int(recip), int(total),
            0.0 if total == 0 else recip / total)]
    return spark.createDataFrame(
        row, "reciprocal_edges long, total_edges long, reciprocity double"
    )


def degree_assortativity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Newman's degree assortativity coefficient r over the undirected
    simple graph → one row ``(assortativity double)``.

    r = Pearson correlation of (deg(u), deg(v)) across all directed
    endpoint pairs of the symmetrized edge set (each undirected edge
    contributes both orientations, which is exactly Newman's symmetric
    formulation). Negative on hub-and-spoke / bipartite graphs,
    positive on social-style graphs.
    """
    sym = symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
    # explicit moments instead of F.corr: under ANSI mode (Spark 4
    # default) corr raises DIVIDE_BY_ZERO on zero-variance input (regular
    # graphs); the CASE guard returns NULL there instead
    moments = (
        sym.join(du, "src")
        .join(dv, "dst")
        .agg(
            F.covar_samp("du", "dv").alias("cov"),
            F.stddev_samp("du").alias("su"),
            F.stddev_samp("dv").alias("sv"),
        )
    )
    out = moments.select(
        F.when(
            (F.col("su") > 0) & (F.col("sv") > 0),
            F.col("cov") / (F.col("su") * F.col("sv")),
        ).alias("assortativity")
    ).localCheckpoint(eager=True)
    sym.unpersist()
    return out
