"""quota_select and concat_chunk_pack (operators/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_pagerank_spark.operators.corpus import (
    concat_chunk_pack,
    quota_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, tokens long")


def test_quota_select_caps_each_group(spark):
    rows = [(i, f"s{i % 3}", 10 * (i + 1)) for i in range(12)]
    out = quota_select(
        _docs(spark, rows), "source", 2,
        order_by=[F.col("tokens").desc(), F.col("doc_id")],
    )
    got = {(r.source, r.doc_id) for r in out.collect()}
    # per source, the two highest-token docs win (ids 9..11 then 6..8)
    assert got == {("s0", 9), ("s0", 6), ("s1", 10), ("s1", 7),
                   ("s2", 11), ("s2", 8)}
    assert "rank" not in out.columns and "__rank" not in out.columns


def test_quota_select_keep_rank_and_small_groups(spark):
    rows = [(1, "a", 5), (2, "a", 7), (3, "b", 1)]
    out = quota_select(
        _docs(spark, rows), "source", 5,
        order_by=[F.col("tokens").desc(), F.col("doc_id")], keep_rank=True,
    ).collect()
    ranks = {r.doc_id: r.rank for r in out}
    assert len(out) == 3                       # quota above group size: all kept
    assert ranks == {2: 1, 1: 2, 3: 1}


def test_concat_chunk_pack_offsets_match_serial_scan(spark):
    rows = [(i, "s", t) for i, t in enumerate([5, 0, 7, 3, 10, 1, 256, 2])]
    out = concat_chunk_pack(
        _docs(spark, rows), "tokens", "doc_id", chunk_tokens=8, n_buckets=3
    ).orderBy("doc_id").collect()
    # serial reference: running offset in doc_id order
    offset, expected = 0, []
    for _, _, t in rows:
        expected.append((offset, offset // 8, (offset + max(t - 1, 0)) // 8))
        offset += t
    got = [(r.start, r.first_bin, r.last_bin) for r in out]
    assert got == expected
    # a doc that straddles windows spans more than one bin
    straddler = next(r for r in out if r.doc_id == 6)
    assert straddler.last_bin > straddler.first_bin


def test_concat_chunk_pack_bucket_count_invariance(spark):
    rows = [(i, "s", (i * 37) % 23) for i in range(50)]
    df = _docs(spark, rows)
    a = concat_chunk_pack(df, "tokens", "doc_id", 16, n_buckets=1)
    b = concat_chunk_pack(df, "tokens", "doc_id", 16, n_buckets=13)
    cols = ["doc_id", "start", "first_bin", "last_bin"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_quota_select_salted_matches_single_phase(spark):
    # deterministic total order => the salted two-phase plan must return
    # exactly the single-phase result (n_salts=1 degenerates to classic)
    rows = [(i, f"s{i % 4}", (i * 13) % 97) for i in range(200)]
    order = [F.col("tokens").desc(), F.col("doc_id")]
    base = quota_select(_docs(spark, rows), "source", 7, order_by=order,
                        keep_rank=True, n_salts=1)
    salted = quota_select(_docs(spark, rows), "source", 7, order_by=order,
                          keep_rank=True, n_salts=8)
    cols = ["doc_id", "source", "tokens", "rank"]
    assert sorted(map(tuple, base.select(cols).collect())) == sorted(
        map(tuple, salted.select(cols).collect())
    )


def test_quota_select_dominant_group_is_salt_split(spark):
    # one domain owning almost the whole crawl: phase 1 must partition by
    # (source, salt) — the skewed group is spread across n_salts tasks and
    # the final per-group window only ever sees <= n_salts*quota rows.
    rows = [(i, "megadomain", i) for i in range(500)] + [
        (1000 + i, f"tail{i}", i) for i in range(5)
    ]
    out = quota_select(
        _docs(spark, rows), "source", 10,
        order_by=[F.col("tokens").desc(), F.col("doc_id")], n_salts=16,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "phase-1 exchange must include the salt key"
    got = sorted(r.doc_id for r in out.where(F.col("source") == "megadomain").collect())
    assert got == list(range(490, 500))      # top-10 tokens of the big group
    assert out.count() == 10 + 5


def test_concat_chunk_pack_clustered_ids_stay_balanced(spark):
    # clustered/sparse doc-id space (two dense islands a billion apart):
    # value-range bucketing packs everything into 2 of n buckets; the
    # quantile buckets must stay row-balanced AND the offsets exact.
    rows = [(i, "s", (i * 7) % 31) for i in range(40)] + [
        (10**9 + i, "s", (i * 11) % 29) for i in range(40)
    ]
    out = concat_chunk_pack(
        _docs(spark, rows), "tokens", "doc_id", chunk_tokens=16,
        n_buckets=8, keep_bucket=True,
    ).orderBy("doc_id").collect()
    offset, expected = 0, []
    for _, _, t in sorted(rows):
        expected.append((offset, offset // 16, (offset + max(t - 1, 0)) // 16))
        offset += t
    assert [(r.start, r.first_bin, r.last_bin) for r in out] == expected
    sizes = {}
    for r in out:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert len(sizes) >= 4, f"quantile cuts collapsed: {sizes}"
    assert max(sizes.values()) <= 2 * (80 // len(sizes)), sizes


def test_bucket_of_bsearch_matches_filter_form(spark):
    # >256 cuts switches _bucket_of to the balanced comparison tree;
    # it must compute the identical "count of cuts < val" as the
    # literal-array filter form on every side of every boundary.
    from distributed_pagerank_spark.operators.corpus import (
        _BSEARCH_MIN_CUTS,
        _bucket_of,
    )

    cuts = [3 * i + 1 for i in range(_BSEARCH_MIN_CUTS + 44)]  # 300 cuts
    vals = [0, 1, 2, 4, 450, 451, 452, 898, 899, 900, 1200]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.b
        for r in df.select("v", _bucket_of(F.col("v"), cuts).alias("b")).collect()
    }
    expected = {v: sum(1 for c in cuts if c < v) for v in vals}
    assert got == expected


def test_quota_select_salt_skips_text_payload(spark):
    # the salt must hash the cheap tiebreak column (last plain order_by
    # entry), never the document text — at corpus scale hashing the
    # payload per row to derive 4 bits of salt is pure waste (r5 verdict).
    rows = [(i, f"s{i % 2}", "x" * 50, (i * 13) % 97) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, tokens long"
    )
    out = quota_select(
        df, "source", 5,
        order_by=[F.col("tokens").desc(), F.col("doc_id")], n_salts=8,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    salt_line = next(ln for ln in plan.splitlines() if "pmod(hash(" in ln)
    hash_args = re.search(r"pmod\(hash\(([^)]*)\)", salt_line).group(1)
    assert "doc_id" in hash_args and "text" not in hash_args, salt_line
    # and the selection itself is still the exact single-phase result
    single = quota_select(
        df, "source", 5,
        order_by=[F.col("tokens").desc(), F.col("doc_id")], n_salts=1,
    )
    cols = ["doc_id", "source", "tokens"]
    assert sorted(map(tuple, out.select(cols).collect())) == sorted(
        map(tuple, single.select(cols).collect())
    )


def test_concat_chunk_pack_empty_input(spark):
    df = _docs(spark, []).where(F.lit(False))
    out = concat_chunk_pack(df, "tokens", "doc_id", 8)
    assert out.count() == 0
    assert {"start", "first_bin", "last_bin"} <= set(out.columns)
