"""Interleaved A/B: AQE on vs off inside each iterative loop (sf0.1,
local[32]).

r5 follow-up to the r4 local[8] PageRank measurement that set
LOOP_CONFS={adaptive off}: HITS measured 33% FASTER with AQE left on
(tools/ab_hits.py), so the blanket off-switch needs re-measuring per
algorithm at the bench shape. Usage: python tools/ab_loop_aqe.py [reps]
[algo ...]; prints per-(algo, variant) min/median.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_pagerank_spark.plans import loop as loop_mod
from distributed_pagerank_spark.plans.betweenness import betweenness
from distributed_pagerank_spark.plans.bfs import multi_source_bfs
from distributed_pagerank_spark.plans.components import connected_components
from distributed_pagerank_spark.plans.hits import hits
from distributed_pagerank_spark.plans.labelprop import label_propagation
from distributed_pagerank_spark.plans.pagerank import pagerank
from distributed_pagerank_spark.plans.ppr import personalized_pagerank_multi
from distributed_pagerank_spark.session import get_spark
import __spark_entry__ as contract


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[0]) if args else 3
    only = set(args[1:])
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-loop-aqe", master="local[32]",
                      shuffle_partitions=32)
    edges = contract._graph_edges(spark, sf_dir).persist()
    edges.count()

    def _ppr():
        custs = edges.select("src").distinct()
        seeds = custs.where(F.col("src") % 50 == 0).select(
            F.lit(1).alias("set_id"), F.col("src").alias("id"),
            F.lit(1.0).alias("weight"),
        ).unionByName(custs.where(F.col("src") % 50 == 1).select(
            F.lit(2).alias("set_id"), F.col("src").alias("id"),
            (F.col("src") % 7 + 1).cast("double").alias("weight"),
        ))
        personalized_pagerank_multi(spark, edges, seeds, k=5).count()

    def _bfs():
        roots = (edges.select("src").distinct()
                 .where(F.col("src") % 250 == 0)
                 .select(F.col("src").alias("root"), F.col("src").alias("id")))
        multi_source_bfs(spark, edges, roots, max_depth=3).count()

    def _betweenness():
        roots = (edges.select("src").distinct()
                 .where(F.col("src") % 250 == 0)
                 .select(F.col("src").alias("root")))
        betweenness(spark, edges, roots, max_depth=3).count()

    algos = {
        "pagerank": lambda: pagerank(
            spark, edges, c=0.85, eps=0.0, max_iter=10).ranks.count(),
        "cc": lambda: connected_components(spark, edges, max_iter=10).count(),
        "labelprop": lambda: label_propagation(spark, edges, rounds=3).count(),
        "hits": lambda: hits(spark, edges, max_iter=10).scores.count(),
        "ppr": _ppr,
        "bfs": _bfs,
        "betweenness": _betweenness,
    }
    if only:
        algos = {k: v for k, v in algos.items() if k in only}

    def run(fn, loop_aqe: bool) -> float:
        old = dict(loop_mod.LOOP_CONFS)
        if loop_aqe:
            loop_mod.LOOP_CONFS.clear()
        try:
            t0 = time.monotonic()
            fn()
            return round(time.monotonic() - t0, 3)
        finally:
            loop_mod.LOOP_CONFS.clear()
            loop_mod.LOOP_CONFS.update(old)

    times: dict[str, list[float]] = {}
    for name, fn in algos.items():  # warmup each, discarded
        run(fn, False)
    for _ in range(reps):
        for name, fn in algos.items():
            for variant in ("aqe_off", "aqe_on"):
                key = f"{name}/{variant}"
                times.setdefault(key, []).append(
                    run(fn, variant == "aqe_on"))
    out = {
        key: {"min_s": min(ts), "median_s": round(statistics.median(ts), 3),
              "all_s": ts}
        for key, ts in times.items()
    }
    for name in algos:
        off, on = out[f"{name}/aqe_off"], out[f"{name}/aqe_on"]
        out[f"{name}/aqe_on_over_off_min"] = round(
            on["min_s"] / off["min_s"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
