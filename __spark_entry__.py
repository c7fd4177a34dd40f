"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank on the sf0.001 derived graph.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data toolkit); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB ANSI-SQL twins for every SQL-expressible query
(iterative fixpoints are unrolled to fixed iteration counts; both sides
run the same count). Hash-compared floats are rounded identically on both
sides; timestamps are exported as epoch longs to dodge TZ representation
skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_pagerank_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    lang_id,
    normalized_fingerprint,
    quality_score,
    token_count,
    winnow_fingerprints,
)
from distributed_pagerank_spark.operators.degrees import out_degrees
from distributed_pagerank_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from distributed_pagerank_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from distributed_pagerank_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)
from distributed_pagerank_spark.plans.components import connected_components
from distributed_pagerank_spark.plans.labelprop import label_propagation
from distributed_pagerank_spark.plans.pagerank import pagerank
from distributed_pagerank_spark.plans.triangles import triangle_count
from distributed_pagerank_spark.sources.transcripts import (
    derive_edges,
    synth_transcripts,
)
from distributed_pagerank_spark.streaming.events import (
    epoch_seconds_ntz,
    sessionize,
    windowed_event_counts,
)

SUPP_OFFSET = 100_000  # disjoint vertex-id spaces: custkey vs suppkey
PAGERANK_ITERS = 5
CC_ITERS = 8
LPA_ROUNDS = 3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- graphs
def _graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → supplier edges via orders ⋈ lineitem (disjoint id spaces)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + SUPP_OFFSET).cast("long").alias("dst"),
        )
        .distinct()
    )


_EDGES_CTE = f"""edges AS (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {SUPP_OFFSET} AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)"""

_VERTS_CTE = """verts AS (
  SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges
)"""

_SYM_CTE = """sym AS (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
)"""


def _supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier co-occurrence graph: suppliers sharing an order."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = l.alias("a"), l.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").cast("long").alias("src"),
            F.col("b.l_suppkey").cast("long").alias("dst"),
        )
        .distinct()
    )


def _pagerank_sql(k: int = PAGERANK_ITERS, c: float = 0.85) -> str:
    iters = []
    prev = "r0"
    for i in range(1, k + 1):
        iters.append(f"""r{i} AS (
  SELECT v.id,
         {c} * coalesce(s.s, 0) + {1.0 - c} / (SELECT n FROM nn) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank / d.out_degree) AS s
    FROM edges e JOIN {prev} r ON e.src = r.id
                 JOIN deg d ON e.src = d.id
    GROUP BY e.dst
  ) s ON v.id = s.id
)""")
        prev = f"r{i}"
    return f"""WITH {_EDGES_CTE},
{_VERTS_CTE},
deg AS (SELECT src AS id, count(*) AS out_degree FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM verts),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts),
{",".join(iters)}
SELECT id, round(rank / (SELECT sum(rank) FROM {prev}), 6) AS rank FROM {prev}"""


def _cc_sql(k: int = CC_ITERS) -> str:
    iters = []
    prev = "l0"
    for i in range(1, k + 1):
        iters.append(f"""l{i} AS (
  SELECT v.id, least(v.component, coalesce(m.mn, v.component)) AS component
  FROM {prev} v LEFT JOIN (
    SELECT s.dst AS id, min(l.component) AS mn
    FROM sym s JOIN {prev} l ON s.src = l.id GROUP BY s.dst
  ) m ON v.id = m.id
)""")
        prev = f"l{i}"
    return f"""WITH {_EDGES_CTE},
{_VERTS_CTE},
{_SYM_CTE},
l0 AS (SELECT id, id AS component FROM verts),
{",".join(iters)}
SELECT id, component FROM {prev}"""


def _lpa_sql(k: int = LPA_ROUNDS) -> str:
    iters = []
    prev = "l0"
    for i in range(1, k + 1):
        iters.append(f"""l{i} AS (
  SELECT v.id, coalesce(t.new_label, v.label) AS label
  FROM {prev} v LEFT JOIN (
    SELECT id, new_label FROM (
      SELECT s.dst AS id, l.label AS new_label,
             row_number() OVER (PARTITION BY s.dst
                                ORDER BY count(*) DESC, l.label ASC) AS rn
      FROM sym s JOIN {prev} l ON s.src = l.id
      GROUP BY s.dst, l.label
    ) x WHERE rn = 1
  ) t ON v.id = t.id
)""")
        prev = f"l{i}"
    return f"""WITH {_EDGES_CTE},
{_VERTS_CTE},
{_SYM_CTE},
l0 AS (SELECT id, id AS label FROM verts),
{",".join(iters)}
SELECT id, label FROM {prev}"""


_TRIANGLES_SQL = """WITH pairs AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
)
SELECT count(*) AS triangles
FROM pairs x JOIN pairs y ON x.dst = y.src
             JOIN pairs z ON z.src = x.src AND z.dst = y.dst"""


# ------------------------------------------------------- text SQL twins
_TOKENS_SQL_EXPR = (
    r"CASE WHEN text IS NULL OR trim(text) = '' THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)


def _lang_sql_expr() -> str:
    cnt = {
        lang: rf"len(regexp_extract_all(lower(text), '\b({'|'.join(ws)})\b'))"
        for lang, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(cnt.values()) + ")"
    whens = "\n".join(
        f"WHEN {cnt[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"CASE WHEN text IS NULL OR {best} = 0 THEN 'und' {whens} ELSE 'und' END"


def _quality_sql_expr() -> str:
    toks = _TOKENS_SQL_EXPR
    stops = rf"len(regexp_extract_all(lower(text), '\b({'|'.join(STOPWORDS)})\b'))"
    punct = (
        r"CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        r"(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))"
        r"::DOUBLE / length(text) END"
    )
    stop_ratio = f"CASE WHEN {toks} = 0 THEN 0.0 ELSE {stops}::DOUBLE / {toks} END"
    return (
        f"CASE WHEN text IS NULL THEN 0.0 ELSE "
        f"0.4 * least({toks}::DOUBLE / 100.0, 1.0) "
        f"+ 0.3 * (1.0 - {punct}) "
        f"+ 0.3 * least({stop_ratio} * 5.0, 1.0) END"
    )


_FINGERPRINT_SQL_EXPR = (
    r"md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),"
    r" '\s+', ' ', 'g')))"
)

_SHINGLES_CTE = r"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
  )
)"""


# ----------------------------------------------------------- queries()
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the customer→supplier graph at sf0.001."""
    edges = _graph_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, edges, c=0.85, eps=1e-6, max_iter=20)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- graph engine (SURVEY §2.2 / §2.4) ---------------------------
    q["graph_edges"] = lambda s, d: _graph_edges(s, d)

    q["out_degree"] = lambda s, d: out_degrees(_graph_edges(s, d)).select(
        "id", "out_degree"
    )

    def _q_pagerank(s, d):
        res = pagerank(s, _graph_edges(s, d), c=0.85, eps=0.0,
                       max_iter=PAGERANK_ITERS)
        return res.ranks.select("id", F.round("rank", 6).alias("rank"))
    q["pagerank_k5"] = _q_pagerank

    def _q_pagerank_salted(s, d):
        res = pagerank(s, _graph_edges(s, d), c=0.85, eps=0.0,
                       max_iter=PAGERANK_ITERS, skew_salt=8, hub_threshold=4)
        return res.ranks.select("id", F.round("rank", 6).alias("rank"))
    q["pagerank_k5_salted"] = _q_pagerank_salted

    def _q_pagerank_transcripts(s, d):
        # rows-only: flagship path over the BASELINE input_hint table shape
        t = synth_transcripts(s, n_convs=300, seed=42)
        res = pagerank(s, derive_edges(t), c=0.85, eps=1e-6, max_iter=12)
        return res.ranks.select("id", F.round("rank", 9).alias("rank"))
    q["pagerank_transcripts"] = _q_pagerank_transcripts

    q["connected_components"] = lambda s, d: connected_components(
        s, _graph_edges(s, d), max_iter=CC_ITERS
    )

    q["label_propagation_k3"] = lambda s, d: label_propagation(
        s, _graph_edges(s, d), rounds=LPA_ROUNDS
    )

    q["triangle_count"] = lambda s, d: triangle_count(s, _supplier_pairs(s, d))

    # --- relational / analytics --------------------------------------
    def _q_tpch_q1(s, d):
        li = _t(s, d, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc"),
                F.count("*").alias("n_rows"),
            )
        )
    q["tpch_q1"] = _q_tpch_q1

    def _q_top_suppliers(s, d):
        li = _t(s, d, "lineitem")
        rev = li.groupBy("l_suppkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
        w = Window.orderBy(F.desc("rev"), F.asc("l_suppkey"))
        return (
            rev.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 5)
            .select("l_suppkey", F.round("rev", 2).alias("revenue"), "rk")
        )
    q["top_suppliers_by_revenue"] = _q_top_suppliers

    # --- text analysis ------------------------------------------------
    q["doc_token_counts"] = lambda s, d: _t(s, d, "documents").select(
        "doc_id", token_count("text").alias("tokens")
    )
    q["doc_lang_id"] = lambda s, d: _t(s, d, "documents").select(
        "doc_id", lang_id("text").alias("pred_lang")
    )
    q["doc_quality"] = lambda s, d: _t(s, d, "documents").select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )
    q["doc_fingerprint"] = lambda s, d: _t(s, d, "documents").select(
        "doc_id", normalized_fingerprint("text").alias("fingerprint")
    )
    q["doc_winnow"] = lambda s, d: _t(s, d, "documents").select(
        "doc_id", F.size(winnow_fingerprints("text")).alias("n_fingerprints")
    )  # rows-only: procedural sketch

    # --- dedup ---------------------------------------------------------
    q["dedup_exact_groups"] = lambda s, d: exact_duplicates(
        _t(s, d, "documents")
    ).select("fingerprint", "n_docs", "keep_id")

    q["dedup_jaccard_pairs"] = lambda s, d: jaccard_pairs(
        _t(s, d, "documents"), threshold=0.5
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))

    q["dedup_minhash_lsh"] = lambda s, d: minhash_lsh_pairs(
        _t(s, d, "documents"), threshold=0.5
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))

    q["dedup_simhash"] = lambda s, d: simhash_pairs(
        _t(s, d, "documents"), max_hamming=3
    ).select("id_a", "id_b", "hamming")

    # --- similarity search ---------------------------------------------
    def _q_ann(s, d):
        emb = _t(s, d, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        queries_df = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return brute_force_topk(emb, queries_df, k=10, method="sql").select(
            "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"
        )
    q["ann_cosine_topk"] = _q_ann

    def _q_ann_lsh(s, d):
        emb = _t(s, d, "embeddings")
        queries_df = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return lsh_topk(emb, queries_df, k=10, n_planes=4).select(
            "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"
        )
    q["ann_lsh_topk"] = _q_ann_lsh

    q["embedding_near_dups"] = lambda s, d: embedding_near_duplicates(
        _t(s, d, "embeddings"), threshold=0.8, n_planes=4
    ).select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))

    def _q_embedding_stats(s, d):
        emb = _t(s, d, "embeddings")
        norm = F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        )
        return (
            emb.select("label", norm.alias("norm"))
            .groupBy("label")
            .agg(
                F.count("*").alias("n_vecs"),
                F.round(F.avg("norm"), 6).alias("avg_norm"),
            )
        )
    q["embedding_stats"] = _q_embedding_stats

    # --- multimodal plumbing -------------------------------------------
    def _q_multimodal(s, d):
        media = attach_binary_payload(_t(s, d, "documents"), "doc_id", "text")
        return extract_features(media).select("media_id", "kind", "n_bytes")
    q["multimodal_meta"] = _q_multimodal

    # --- events: windows + sessions ------------------------------------
    def _q_windows(s, d):
        out = windowed_event_counts(_t(s, d, "events"), window="1 hour")
        return out.select(
            epoch_seconds_ntz("window_start").alias("window_start_epoch"),
            "event_type",
            "n",
            F.round("total_value", 4).alias("total_value"),
        )
    q["events_windowed_counts"] = _q_windows

    def _q_sessions(s, d):
        ev = _t(s, d, "events")
        out = sessionize(ev, gap_minutes=30, tiebreak_col="event_id")
        return out.select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            epoch_seconds_ntz("session_start").alias("start_epoch"),
            epoch_seconds_ntz("session_end").alias("end_epoch"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    q["events_sessionize"] = _q_sessions

    return q


def oracle_sql() -> dict[str, str]:
    return {
        "graph_edges": f"WITH {_EDGES_CTE} SELECT src, dst FROM edges",
        "out_degree": f"""WITH {_EDGES_CTE}
SELECT src AS id, count(*) AS out_degree FROM edges GROUP BY src""",
        "pagerank_k5": _pagerank_sql(),
        "pagerank_k5_salted": _pagerank_sql(),
        "connected_components": _cc_sql(),
        "label_propagation_k3": _lpa_sql(),
        "triangle_count": _TRIANGLES_SQL,
        "tpch_q1": """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
       count(*) AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
        "top_suppliers_by_revenue": """SELECT l_suppkey, round(rev, 2) AS revenue, rk FROM (
  SELECT l_suppkey, rev,
         row_number() OVER (ORDER BY rev DESC, l_suppkey ASC) AS rk
  FROM (SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY l_suppkey)
) WHERE rk <= 5""",
        "doc_token_counts": f"SELECT doc_id, {_TOKENS_SQL_EXPR} AS tokens FROM documents",
        "doc_lang_id": f"SELECT doc_id, {_lang_sql_expr()} AS pred_lang FROM documents",
        "doc_quality": f"SELECT doc_id, round({_quality_sql_expr()}, 6) AS quality FROM documents",
        "doc_fingerprint": f"SELECT doc_id, {_FINGERPRINT_SQL_EXPR} AS fingerprint FROM documents",
        "dedup_exact_groups": f"""SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS keep_id
FROM (SELECT doc_id, {_FINGERPRINT_SQL_EXPR} AS fp FROM documents)
GROUP BY fp HAVING count(*) > 1""",
        "dedup_jaccard_pairs": f"""WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(common::DOUBLE / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
FROM common JOIN sizes sa ON common.id_a = sa.doc_id
            JOIN sizes sb ON common.id_b = sb.doc_id
WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.5""",
        "ann_cosine_topk": """WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rk FROM ranked WHERE rk <= 10""",
        "embedding_stats": """SELECT label, count(*) AS n_vecs,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> x::DOUBLE * x::DOUBLE)))), 6) AS avg_norm
FROM embeddings GROUP BY label""",
        "multimodal_meta": """SELECT doc_id AS media_id, 'image' AS kind,
       octet_length(encode(text)) AS n_bytes FROM documents""",
        "events_windowed_counts": """SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS window_start_epoch,
       event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2""",
        # NB: every output column is cast to BIGINT explicitly — DuckDB's
        # windowed sum() yields HUGEINT, which hash-mismatches Spark's
        # BIGINT even when values are equal.
        "events_sessionize": """WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS end_epoch,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, session_idx""",
    }
