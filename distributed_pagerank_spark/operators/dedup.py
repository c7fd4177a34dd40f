"""Deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle,
  map-side combine; the 100 TB default.
- **n-gram Jaccard (exact near-dup)**: shingle inverted index + self-join.
  Exact but O(pairs sharing a shingle) — the correctness oracle for the
  approximate tiers at test scale.
- **MinHash + LSH**: k minhashes per doc computed as k aggregates in ONE
  pass over the shingle index (no k× data explosion), banded into buckets;
  candidate pairs = bucket co-occupants. Scales to 10^9 docs: cost is
  (shingles × 1) + (docs × bands) rows through two shuffles.
- **SimHash**: 64-bit signature via per-bit signed sums of token hashes —
  64 conditional aggregates in one pass; near-dups = signatures within a
  Hamming ball, candidates via 16-bit chunk banding.

All hashing is ``xxhash64`` with explicit seeds — deterministic across
runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_pagerank_spark.functions.text import (
    normalized_fingerprint,
    word_shingles,
)


# ---------------------------------------------------------------- exact
def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ ``(fingerprint, n_docs, keep_id)`` for fingerprints with >1 doc.
    ``keep_id`` = min id (the canonical survivor)."""
    fp = df.select(
        F.col(id_col).alias("id"), normalized_fingerprint(text_col).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row (min id) per normalized fingerprint."""
    fp = df.withColumn("__fp", normalized_fingerprint(text_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [ "__fp", id_col]).drop("__fp")


# ------------------------------------------------- exact n-gram Jaccard
def shingle_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Inverted index ``(id, shingle)`` of distinct word n-grams."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs → ``(id_a, id_b, jaccard)``
    with ``id_a < id_b`` and ``jaccard >= threshold``.

    Inverted-index self-join: only docs sharing ≥1 shingle are compared.
    Common-shingle count is a two-phase hash agg; sizes join in after, so
    the wide join carries only (id, id) pairs.
    """
    idx = shingle_index(df, id_col, text_col, n).persist()
    sizes = idx.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = idx.withColumnRenamed("id", "id_a")
    b = idx.withColumnRenamed("id", "id_b")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    res = out.localCheckpoint(eager=True)
    idx.unpersist()
    return res


# ----------------------------------------------------------- MinHash/LSH
def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """→ ``(id, sig array<long>)``: k minhashes in one aggregation pass
    (k min() columns over the shingle index — no row explosion)."""
    idx = shingle_index(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64("shingle", F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = idx.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs → ``(id_a, id_b, est_jaccard)``.

    Bands of r = num_hashes/bands rows; candidates share ≥1 band bucket;
    ``est_jaccard`` = fraction of agreeing minhashes (unbiased Jaccard
    estimator), filtered at ``threshold``.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, id_col, text_col, n, seed).persist()
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.get("sig", bi * r + j) for j in range(r)]).alias(
                    "bucket"
                ),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_arr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(num_hashes),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    out = est.localCheckpoint(eager=True)
    sig.unpersist()
    return out


# --------------------------------------------------------------- SimHash
def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """→ ``(id, simhash long)``: per-bit signed sums of whitespace-token
    hashes, sign → bit. One explode + one aggregation."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok", F.lit(seed)))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"getbit(h, {b})") == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    # assemble bits into one signed 64-bit long (bit 63 = sign bit)
    bit_vals = [
        F.when(
            F.col(f"b{b}") > 0,
            F.lit(2**b if b < 63 else -(2**63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(bits)
    ]
    sig = sums.select(
        "id",
        F.aggregate(
            F.array(*bit_vals), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("simhash"),
    )
    return sig


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.
    Candidates via 16-bit chunk banding (pigeonhole: distance ≤3 ⇒ some
    chunk of 4 is identical)."""
    sig = simhash_signatures(df, id_col, text_col, seed=seed).persist()
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("cb"),
    ).select("id", "simhash", F.col("cb.chunk").alias("chunk"), F.col("cb.val").alias("val"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "val"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    res = out.localCheckpoint(eager=True)
    sig.unpersist()
    return res
