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
  computed as a distributed prefix-sum (range-bucketed local cumsums +
  a broadcast of per-bucket offsets), NOT as a global unpartitioned
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
) -> DataFrame:
    """Keep at most ``quota`` rows per ``group_col`` group.

    ``order_by`` decides which rows win (default: ascending by every
    remaining column name — callers should pass an explicit list ending
    in a unique tiebreak column so the selection is deterministic).
    One hash shuffle on the group key; each group is ranked
    independently, so the plan parallelizes across groups. Heavily
    skewed group keys (one domain owning half the crawl) concentrate in
    one task — cap such groups upstream or pre-split them with a salt
    and take the per-salt quota as a candidate set.
    """
    if order_by is None:
        order_by = [F.col(c) for c in df.columns if c != group_col]
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

    Scale design: a distributed prefix-sum. ``order_col``'s range is cut
    into ``n_buckets`` contiguous buckets (one tiny min/max aggregate);
    the cumulative sum runs per-bucket under
    ``Window.partitionBy(bucket)`` — an ordinary hash shuffle — and each
    bucket's global offset comes from an ``n_buckets``-row aggregate
    windowed over itself (tiny by construction) broadcast back onto the
    data. No stage ever funnels the corpus through one task; total cost
    is one scan + one hash shuffle + one broadcast join.
    """
    lo, hi = df.select(
        F.min(order_col).cast("long"), F.max(order_col).cast("long")
    ).first()
    if lo is None:
        return (
            df.withColumn("start", F.lit(None).cast("long"))
            .withColumn("first_bin", F.lit(None).cast("long"))
            .withColumn("last_bin", F.lit(None).cast("long"))
        )
    span = max((hi - lo + n_buckets) // n_buckets, 1)
    toks = F.col(tokens_col).cast("long")
    bucketed = df.withColumn(
        "__bucket", ((F.col(order_col).cast("long") - F.lit(lo)) / span).cast("long")
    )

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
        .drop("__bucket", "__bucket_offset")
    )
    return packed
