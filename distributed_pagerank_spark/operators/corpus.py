"""Corpus-selection operators for training-data pipelines.

Two staples of web-scale corpus prep that are easy to get wrong at
100 TB:

- :func:`quota_select` — per-group (per-domain / per-source) caps. The
  window is always PARTITIONED by the group key, so the shuffle is an
  ordinary hash exchange and every group ranks independently in
  parallel. (The classic mistake — a global ``row_number`` — collapses
  the whole corpus into one task.)

- :func:`concat_chunk_pack` — GPT-style sequence packing: documents are
  concatenated in a deterministic order and the token stream is chunked
  into fixed-size training windows; each document's global start offset
  decides which window(s) it lands in. The global running sum is
  computed as a distributed prefix-sum (row-balanced quantile-bucketed
  local cumsums + a broadcast of per-bucket offsets), NOT as a global
  unpartitioned
  window — Spark executes ``Window.orderBy(...)`` without a partition
  key in a single task, which is exactly the bottleneck a 100 TB corpus
  cannot afford.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quota_select(
    df: DataFrame,
    group_col: str,
    quota: int,
    order_by: list[Column] | None = None,
    keep_rank: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``quota`` rows per ``group_col`` group.

    ``order_by`` decides which rows win (default: ascending by every
    remaining column name — callers should pass an explicit list ending
    in a unique tiebreak column so the selection is deterministic).

    Scale design — salted two-phase rank, skew-proof by construction
    (a real web crawl always has one dominant domain):

    1. every row gets a deterministic salt ``pmod(hash(all cols),
       n_salts)``; a window PARTITIONED BY ``(group, salt)`` ranks each
       sub-group in parallel and keeps at most ``quota`` candidates per
       salt — the group's true top-``quota`` rows are necessarily among
       them (each is top-``quota`` within its own salt);
    2. the final ``row_number`` window over ``(group)`` ranks only the
       surviving ≤ ``n_salts × quota`` candidates per group — bounded
       per-task work no matter how skewed the group sizes are.

    Output is exactly the single-phase result whenever ``order_by`` is
    a total order (callers must end it with a unique tiebreak column).
    Cost: two hash shuffles, the second over a quota-bounded remnant.
    ``n_salts=1`` degenerates to the classic single-window plan.
    """
    if order_by is None:
        order_by = [F.col(c) for c in df.columns if c != group_col]
    if n_salts > 1:
        salted = df.withColumn(
            "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                             F.lit(n_salts))
        )
        w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_by)
        df = (
            salted.withColumn("__salt_rank", F.row_number().over(w1))
            .where(F.col("__salt_rank") <= quota)
            .drop("__salt", "__salt_rank")
        )
    w = Window.partitionBy(group_col).orderBy(*order_by)
    ranked = df.withColumn("__rank", F.row_number().over(w))
    out = ranked.where(F.col("__rank") <= quota)
    if keep_rank:
        return out.withColumnRenamed("__rank", "rank")
    return out.drop("__rank")


def concat_chunk_pack(
    df: DataFrame,
    tokens_col: str,
    order_col: str,
    chunk_tokens: int,
    n_buckets: int = 1024,
    keep_bucket: bool = False,
) -> DataFrame:
    """Assign each document its window span under concat-and-chunk packing.

    Documents are laid out end-to-end ordered by ``order_col`` (must be
    numeric and unique — doc ids); the resulting token stream is cut
    into ``chunk_tokens``-sized windows. Returns the input columns plus

    - ``start``      — the document's global token offset,
    - ``first_bin``  — ``floor(start / chunk_tokens)``,
    - ``last_bin``   — the window containing the document's last token
      (> ``first_bin`` when the document straddles a boundary; equal to
      ``first_bin`` for empty documents, which occupy no tokens).

    ``keep_bucket=True`` additionally retains the prefix-sum bucket id
    as ``bucket`` so tests (and skew dashboards) can observe row balance.

    Scale design: a distributed prefix-sum over ROW-BALANCED buckets.
    ``n_buckets - 1`` approximate quantiles of ``order_col`` (one tiny
    sketch aggregate) cut the corpus into contiguous buckets with
    near-equal ROW counts — unlike value-range bucketing, a clustered or
    sparse doc-id space cannot skew them (r4 verdict). Bucket id is the
    count of cut points below the row's ``order_col`` (a monotone
    column expression over a literal array — pure codegen, no extra
    shuffle). The cumulative sum runs per-bucket under
    ``Window.partitionBy(bucket)`` — an ordinary hash shuffle — and each
    bucket's global offset comes from an ``n_buckets``-row aggregate
    windowed over itself (tiny by construction) broadcast back onto the
    data. No stage ever funnels the corpus through one task; total cost
    is one scan + one hash shuffle + one broadcast join.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)] or [0.5]
    probe = df.select(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            F.col(order_col).cast("long"), fracs, 10_000
        ).alias("cuts"),
    ).first()
    if probe["n"] == 0:
        return (
            df.withColumn("start", F.lit(None).cast("long"))
            .withColumn("first_bin", F.lit(None).cast("long"))
            .withColumn("last_bin", F.lit(None).cast("long"))
        )
    cuts = sorted(set(probe["cuts"] or [])) if n_buckets > 1 else []
    toks = F.col(tokens_col).cast("long")
    if cuts:
        cut_arr = F.array(*[F.lit(int(c)) for c in cuts])
        bucket_expr = F.size(
            F.filter(cut_arr, lambda b: b < F.col(order_col).cast("long"))
        ).cast("long")
    else:
        bucket_expr = F.lit(0).cast("long")
    bucketed = df.withColumn("__bucket", bucket_expr)

    # n_buckets rows: per-bucket totals -> exclusive prefix offsets. The
    # unpartitioned window here is over the aggregate only (tiny by
    # construction), never over the corpus.
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(toks).alias("__bucket_total"))
        .withColumn(
            "__bucket_offset",
            F.coalesce(
                F.sum("__bucket_total").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__bucket_total")
    )

    w = Window.partitionBy("__bucket").orderBy(order_col)
    packed = (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "start",
            F.col("__bucket_offset")
            + F.sum(toks).over(w)
            - toks,
        )
        .withColumn("first_bin", (F.col("start") / chunk_tokens).cast("long"))
        .withColumn(
            "last_bin",
            (
                (F.col("start") + F.greatest(toks - 1, F.lit(0)))
                / chunk_tokens
            ).cast("long"),
        )
        .drop("__bucket_offset")
    )
    if keep_bucket:
        return packed.withColumnRenamed("__bucket", "bucket")
    return packed.drop("__bucket")
