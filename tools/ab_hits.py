"""Interleaved A/B of HITS loop knobs at sf0.1/local[32].

HISTORICAL (r6 first wave): the truncate_interval arms are vestigial
since the fourth wave — hits() cuts lineage every iteration via the
lazy-checkpoint mass aggregate and ignores the parameter, so the
interval variants now all run identical code. Kept for the r6 A/B
record; only the AQE on/off contrast remains meaningful.

Usage: python tools/ab_hits.py [reps] — runs the configured variants
interleaved (rep 1 of each, then rep 2, ...) on the customer→supplier
graph and prints per-variant min/median (the noise-robust protocol from
BENCH/BASELINE.md). Knobs under test (r5 verdict item 5):

- truncate_interval 2 / 3 (current) / 4 — lineage-truncation cadence vs
  Catalyst tree growth;
- AQE left ON inside the loop (LOOP_CONFS override) vs the default off.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_pagerank_spark.plans import loop as loop_mod
from distributed_pagerank_spark.plans.hits import hits
from distributed_pagerank_spark.session import get_spark
import __spark_entry__ as contract


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-hits", master="local[32]",
                      shuffle_partitions=32)
    edges = contract._graph_edges(spark, sf_dir).persist()
    edges.count()

    def run(interval: int, loop_aqe: bool) -> None:
        old = dict(loop_mod.LOOP_CONFS)
        if loop_aqe:
            loop_mod.LOOP_CONFS.clear()
        try:
            hits(spark, edges, max_iter=10,
                 truncate_interval=interval).scores.count()
        finally:
            loop_mod.LOOP_CONFS.clear()
            loop_mod.LOOP_CONFS.update(old)

    variants = {
        "int2": lambda: run(2, False),
        "int3_current": lambda: run(3, False),
        "int4": lambda: run(4, False),
        "int3_loop_aqe": lambda: run(3, True),
    }
    times: dict[str, list[float]] = {v: [] for v in variants}
    variants["int3_current"]()  # warmup, discarded
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.monotonic()
            fn()
            times[name].append(round(time.monotonic() - t0, 3))
    out = {
        name: {"min_s": min(ts), "median_s": round(statistics.median(ts), 3),
               "all_s": ts}
        for name, ts in times.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
