"""Triangle counting via degree-ordered wedge joins (north-rule N3).

Semantics (SURVEY §2.4): count each unordered vertex triangle of the
undirected simple graph exactly once. Algorithm: orient every undirected
edge from the lower-(degree, id) endpoint to the higher one; join oriented
edges on the middle vertex to enumerate wedges ``a→b→c``; a wedge closes
into a triangle iff the oriented edge ``a→c`` exists (left-semi join).
Degree ordering bounds the out-degree of every vertex by O(sqrt(m)), so
the wedge join is skew-resistant even on power-law graphs — the standard
trick the naive ``src<dst`` orientation lacks.

Everything is built-in joins/aggregations (sort-merge or broadcast as AQE
decides); no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.degrees import symmetrize


def oriented_edges(edges: DataFrame, _sym: DataFrame | None = None) -> DataFrame:
    """Undirected simple edges oriented low-(degree,id) → high-(degree,id).

    Output ``(a, b)`` — each undirected edge exactly once. ``_sym`` lets a
    caller that already holds a cached symmetrized table (triangle_count)
    pass it in, so the degree agg and the orientation join share one scan
    instead of re-symmetrizing the raw input for each.
    """
    sym = _sym if _sym is not None else symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    e = (
        sym.join(deg.withColumnRenamed("deg", "deg_src"), sym["src"] == deg["id"])
        .drop("id")
        .join(
            deg.withColumnRenamed("deg", "deg_dst").withColumnRenamed("id", "id2"),
            F.col("dst") == F.col("id2"),
        )
        .drop("id2")
    )
    return e.where(
        (F.col("deg_src") < F.col("deg_dst"))
        | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
    ).select(F.col("src").alias("a"), F.col("dst").alias("b"))


def triangle_count(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """→ single-row ``(triangles long)``."""
    # cache the symmetrized table: the degree agg and the orientation join
    # both read it, so the raw input is scanned once (symmetrize itself is
    # a single-scan explode) instead of 4× in the uncached shape
    sym = symmetrize(edges).persist()
    o = oriented_edges(edges, _sym=sym).persist()
    o.count()
    sym.unpersist()
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(y, F.col("x.b") == F.col("y.a")).select(
        F.col("x.a").alias("a"), F.col("y.b").alias("c")
    )
    closing = o.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
    tris = wedges.join(
        closing,
        (wedges["a"] == closing["ca"]) & (wedges["c"] == closing["cc"]),
        "left_semi",
    )
    result = tris.agg(F.count("*").alias("triangles"))
    out = result.localCheckpoint(eager=True)
    o.unpersist()
    return out
