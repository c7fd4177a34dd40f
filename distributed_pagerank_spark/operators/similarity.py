"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute-force cosine top-k** — exact baseline. ``method='sql'`` keeps the
  whole computation in JVM higher-order functions (zip_with/aggregate) for
  oracle parity; ``method='pandas'`` is the throughput path: one Arrow
  batch → one numpy matmul per partition, then a global top-k — at 100 TB
  the corpus streams through executors once, only (q × k) rows shuffle.
- **random-hyperplane LSH** — the scale path: ``n_planes`` sign bits
  bucket the corpus; queries probe their own bucket (plus optional
  multi-probe neighbors at Hamming distance 1). Deterministic, seeded
  hyperplanes derived from xxhash64 — identical across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a, b):
    """Cosine similarity of two array<float> columns (JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "pandas",
) -> DataFrame:
    """Exact cosine top-k → ``(query_id, vec_id, cos_sim, rk)``.

    ``queries``: (query_id, embedding). Self-matches (same id) are kept —
    filter upstream if undesired.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if method == "sql":
        joined = corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
        ).crossJoin(F.broadcast(q))
        scored = joined.select(
            "query_id",
            "vec_id",
            cosine_similarity_col(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    elif method == "pandas":
        import numpy as np
        import pandas as pd

        qrows = q.collect()  # queries are small by contract; corpus streams
        qids = [r["query_id"] for r in qrows]
        qmat = np.array([r["qvec"] for r in qrows], dtype=np.float64)
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        spark = corpus.sparkSession
        b_qids = spark.sparkContext.broadcast(qids)
        b_qmat = spark.sparkContext.broadcast(qmat)

        topn = k  # per-batch top-k per query; global top-k ⊆ union of these

        def score(batches):
            for pdf in batches:
                ids = pdf["vec_id"].to_numpy()
                c = np.array(list(pdf["cvec"]), dtype=np.float64)
                c = c / np.linalg.norm(c, axis=1, keepdims=True)
                sims = c @ b_qmat.value.T  # (batch, q)
                for qi, qid in enumerate(b_qids.value):
                    s = sims[:, qi]
                    # lexsort keeps the (cos desc, id asc) tie order, so the
                    # per-batch cut never drops a global-top-k tie winner
                    top = np.lexsort((ids, -s))[: min(len(ids), topn)]
                    yield pd.DataFrame(
                        {"query_id": qid, "vec_id": ids[top], "cos_sim": s[top]}
                    )

        scored = corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
        ).mapInPandas(score, "query_id long, vec_id long, cos_sim double")
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "vec_id", F.col("cos_sim").cast("double"), "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int):
    """Deterministic pseudo-random hyperplanes: uniform in [-1,1) from a
    splitmix-style integer hash — no RNG state, reproducible anywhere."""
    import numpy as np

    def h(i: int) -> int:
        x = (i + seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return x ^ (x >> 31)

    vals = np.array(
        [h(i) / 2**63 - 1.0 for i in range(n_planes * dim)], dtype=np.float64
    )
    return vals.reshape(n_planes, dim)


def lsh_bucket_col(vec_col, planes) -> F.Column:
    """Signature bucket id: sign bits against each hyperplane, packed into
    a long. Pure column expression over array<float>."""
    bits = []
    for p_i, plane in enumerate(planes):
        dot = F.lit(0.0)
        # unrolled dot product: plane is a Python list of constants, so this
        # compiles to a codegen'd arithmetic chain, no UDF.
        for d, wgt in enumerate(plane):
            dot = dot + F.get(vec_col, d) * float(wgt)
        bits.append(F.when(dot >= 0, F.lit(1 << p_i).cast("long")).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for b in bits:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH buckets.

    Corpus is bucketed once (a column expression — free at scan time);
    each query probes its bucket and, with ``multiprobe``, all buckets at
    Hamming distance 1 (n_planes+1 probes) to cut misses near plane
    boundaries. Join is bucket-equi — no cross join anywhere.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        q = q.select("query_id", "qvec", F.explode(probes).alias("bucket"))
    else:
        q = q.select("query_id", "qvec", F.col("qbucket").alias("bucket"))
    scored = c.join(q, "bucket").select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, candidates via
    shared LSH bucket → ``(id_a, id_b, cos_sim)``."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = (
        e.alias("x")
        .join(e.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine_similarity_col(F.col("x.vec"), F.col("y.vec")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )
    return pairs
