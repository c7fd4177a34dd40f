from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    kmeans_refine,
    lsh_topk,
    seeded_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def numpy_topk(emb_rows, q_rows, k):
    import numpy as np

    ids = np.array([r.vec_id for r in emb_rows])
    m = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in q_rows:
        v = np.array(q.embedding, dtype=np.float64)
        v /= np.linalg.norm(v)
        s = m @ v
        order = np.lexsort((ids, -s))[:k]
        out[q.query_id] = list(ids[order])
    return out


def test_brute_force_pandas_matches_numpy(spark, emb, queries):
    got = brute_force_topk(emb, queries, k=5, method="pandas").collect()
    want = numpy_topk(emb.collect(), queries.collect(), 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rk)):
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert by_q == {q: want[q] for q in by_q}
    # self-match ranks first with sim ~1
    firsts = {r.query_id: (r.vec_id, r.cos_sim) for r in got if r.rk == 1}
    for q, (vid, sim) in firsts.items():
        assert vid == q and math.isclose(sim, 1.0, abs_tol=1e-9)


def test_sql_and_pandas_methods_agree(spark, emb, queries):
    a = brute_force_topk(emb, queries, k=5, method="sql").collect()
    b = brute_force_topk(emb, queries, k=5, method="pandas").collect()
    ka = {(r.query_id, r.rk): r.vec_id for r in a}
    kb = {(r.query_id, r.rk): r.vec_id for r in b}
    assert ka == kb


def test_lsh_recall_vs_brute(spark, emb, queries):
    exact = brute_force_topk(emb, queries, k=10, method="pandas").collect()
    # 4 planes → 16 buckets over 500 quasi-random vectors; more planes
    # would over-partition data this unclustered (recall/cost knob).
    approx = lsh_topk(emb, queries, k=10, n_planes=4).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    ap = {}
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) > 0.5  # multiprobe LSH, loose bound
    # self-match must always be found (same bucket trivially)
    for q in ex:
        assert q in ap.get(q, set())


def test_embedding_near_duplicates_finds_planted(spark, emb):
    # plant an exact duplicate of vec 0 with a new id
    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(99999).cast("long").alias("vec_id"), "embedding", "label"
    )
    with_dup = emb.unionByName(dup)
    pairs = embedding_near_duplicates(with_dup, threshold=0.999).collect()
    assert any(r.id_a == 0 and r.id_b == 99999 for r in pairs)


def test_bucket_kernel_paths_agree(spark, emb):
    """The Arrow sign-matmul kernel and the unrolled codegen expression
    bucket identically (random vectors never land exactly on a plane)."""
    from distributed_pagerank_spark.operators.similarity import (
        _bucket_pandas_udf,
        _hyperplanes,
        lsh_bucket_col,
    )
    dim = len(emb.select("embedding").first()[0])
    planes = _hyperplanes(dim, 6, seed=7)
    both = emb.select(
        "vec_id",
        lsh_bucket_col(F.col("embedding"), planes).alias("b_sql"),
        _bucket_pandas_udf(planes)(F.col("embedding")).alias("b_arrow"),
    )
    assert both.where("b_sql != b_arrow").count() == 0


def test_ivf_full_probe_equals_brute_force(spark, emb, queries):
    """Probing every cell is an exhaustive scan — IVF must return exactly
    the brute-force top-k (each corpus vector lives in exactly one cell,
    so the union of all probed cells is the whole corpus, no dup pairs)."""
    exact = brute_force_topk(emb, queries, k=10, method="pandas").collect()
    full = ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=8).collect()
    ke = {(r.query_id, r.rk): r.vec_id for r in exact}
    kf = {(r.query_id, r.rk): r.vec_id for r in full}
    assert ke == kf


def test_ivf_recall_and_self_match(spark, emb, queries):
    exact = brute_force_topk(emb, queries, k=10, method="pandas").collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=3).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) > 0.4  # 3/8 of corpus scanned
    # a query that is itself a corpus vector probes its own cell first
    for q in ex:
        assert q in ap.get(q, set())


def test_ivf_expression_and_arrow_paths_agree(spark, emb):
    """The unrolled argmax expression and the Arrow matmul kernel assign
    identical cells and probe lists (incl. tie order) on real vectors."""
    from distributed_pagerank_spark.operators.similarity import (
        _ivf_pandas_udfs,
        ivf_assign_col,
        ivf_probe_col,
    )

    cents = seeded_centroids(emb, 8)
    assign_udf, probe_udf = _ivf_pandas_udfs(cents, 3)
    both = emb.select(
        "vec_id",
        ivf_assign_col(F.col("embedding"), cents).alias("a_sql"),
        assign_udf(F.col("embedding")).alias("a_arrow"),
        ivf_probe_col(F.col("embedding"), cents, 3).alias("p_sql"),
        probe_udf(F.col("embedding")).alias("p_arrow"),
    )
    assert both.where("a_sql != a_arrow").count() == 0
    assert both.where("p_sql != p_arrow").count() == 0


def test_ivf_arrow_routing_executes(spark, emb, queries):
    """n_centroids × dim above MAX_UNROLLED_NODES must route to the Arrow
    kernel and still produce a valid top-k with self-matches."""
    from distributed_pagerank_spark.operators.similarity import MAX_UNROLLED_NODES

    assert 40 * 64 > MAX_UNROLLED_NODES
    out = ivf_topk(emb, queries, k=5, n_centroids=40, n_probe=8).collect()
    firsts = {r.query_id: r.vec_id for r in out if r.rk == 1}
    assert firsts == {q: q for q in firsts} and len(firsts) == 5


def test_kmeans_refine_reduces_assignment_cost(spark, emb):
    """One Lloyd iteration must not increase spherical k-means cost
    (mean max-cosine to the assigned centroid must not drop)."""
    import numpy as np

    rows = emb.collect()
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)

    def cost(cents):
        c = np.array([v for _, v in cents], dtype=np.float64)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        return (m @ c.T).max(axis=1).mean()

    seed = seeded_centroids(emb, 8)
    refined = kmeans_refine(emb, seed, iters=2)
    assert [cid for cid, _ in refined] == [cid for cid, _ in seed]
    assert cost(refined) >= cost(seed) - 1e-9
    # refined centroids drive the same operator unchanged
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=5, centroids=refined, n_probe=3).collect()
    assert {r.query_id for r in out} == {0, 1, 2}


def test_kmeans_refine_driver_collect_is_k_rows(spark, emb, monkeypatch):
    """The Lloyd update must ship ONE array row per cell through the
    driver, never k×dim scalar rows (the round-3 bottleneck: ~2.7e8 rows
    per iteration at a 65k-cell × 4096-dim coarse quantizer)."""
    # patch the CONCRETE class (pyspark.sql.classic.dataframe.DataFrame in
    # Spark 4) — the pyspark.sql.DataFrame base's collect is overridden
    cls = type(emb)

    k = 8
    seed = seeded_centroids(emb, k)
    sizes: list[int] = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    kmeans_refine(emb, seed, iters=2)
    assert sizes and max(sizes) <= k, sizes


def test_kmeans_refine_averages_directions_not_raw_vectors(spark):
    """Spherical update: a cell holding one long and one short vector of
    different directions must move toward the MEAN DIRECTION (equal
    weight), not toward the long vector."""
    import numpy as np

    rows = [
        (0, [1.0, 0.0, 0.0]),          # seed centroid, cell anchor
        (1, [100.0, 0.0, 0.0]),        # long vector along x
        (2, [0.0, 1.0, 0.0]),          # unit vector along y
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    refined = kmeans_refine(df, [(0, [1.0, 0.0, 0.0])], iters=1)
    got = np.array(refined[0][1])
    got = got / np.linalg.norm(got)
    # mean of unit vectors x̂, x̂, ŷ → direction (2, 1, 0)/√5; a raw-vector
    # mean would be dominated by the 100-long vector (≈ x̂)
    want = np.array([2.0, 1.0, 0.0]) / math.sqrt(5.0)
    assert np.allclose(got, want, atol=1e-9), got


def test_ivf_zero_norm_vector_ranks_last_on_both_paths(spark):
    """A zero-norm embedding's cosine is NaN; both the expression path and
    the Arrow kernel must pin it to −1.0 so assignment agrees (NaN would
    win array_max but lose the numpy lexsort)."""
    from distributed_pagerank_spark.operators.similarity import (
        _ivf_pandas_udfs,
        ivf_assign_col,
    )

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [3.0, 0.1])],
        "vec_id long, embedding array<double>",
    )
    expr = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", ivf_assign_col(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    assign_udf, _ = _ivf_pandas_udfs(cents, 1)
    arrow = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", assign_udf(F.col("embedding")).alias("cell")
        ).collect()
    }
    assert expr == arrow, (expr, arrow)
    # all sims pinned to −1.0 → tie → smallest cid
    assert expr[10] == 0 and expr[11] == 0


def test_lsh_bigdim_uses_arrow_and_executes(spark):
    """dim 1024 × 16 planes = 16k-term dot products: the unrolled Catalyst
    expression would be a ~16k-node tree per plane; the size guard must
    route to the Arrow kernel and the query must plan+run in bounded time."""
    import time

    from distributed_pagerank_spark.operators.similarity import (
        MAX_UNROLLED_NODES,
        _hyperplanes,
        lsh_topk,
    )
    dim, n_planes = 1024, 16
    assert _hyperplanes(dim, n_planes, 42).size > MAX_UNROLLED_NODES
    base = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0),
        ).alias("embedding"),
    )
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.monotonic()
    out = lsh_topk(base, q, k=5, n_planes=n_planes, dim=dim).collect()
    assert time.monotonic() - t0 < 120
    assert len(out) > 0
    assert all(r.rk <= 5 for r in out)
