"""Interleaved A/B of connected-components algorithms at sf0.1/local[32].

Usage: python tools/ab_cc.py [reps] — runs hashmin/hybrid/pointer
interleaved (rep 1 of each, then rep 2, ...) on the supplier co-occurrence
graph and prints per-algorithm min/median, the noise-robust protocol from
BENCH/BASELINE.md. The hybrid default must sit within ~1.1x of hashmin on
this shallow graph (its stall detector must never arm the jump join here).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_pagerank_spark.plans.components import connected_components
from distributed_pagerank_spark.session import get_spark
import __spark_entry__ as contract


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-cc", master="local[32]",
                      shuffle_partitions=32)
    edges = contract._graph_edges(spark, sf_dir).persist()
    edges.count()
    algos = ["hashmin", "hybrid", "pointer"]
    times: dict[str, list[float]] = {a: [] for a in algos}
    rounds: dict[str, int] = {}
    # warmup rep (JIT/codegen), discarded
    connected_components(spark, edges, max_iter=10, algorithm="hashmin").count()
    for _ in range(reps):
        for a in algos:
            metrics: list[dict] = []
            t0 = time.monotonic()
            connected_components(
                spark, edges, max_iter=10, algorithm=a, metrics_out=metrics
            ).count()
            times[a].append(round(time.monotonic() - t0, 3))
            rounds[a] = len(metrics)
            if a == "hybrid":
                assert not any(m["jumping"] for m in metrics), (
                    "hybrid armed jumps on the shallow supplier graph"
                )
    out = {
        a: {
            "min_s": min(ts),
            "median_s": round(statistics.median(ts), 3),
            "rounds": rounds[a],
            "all_s": ts,
        }
        for a, ts in times.items()
    }
    out["hybrid_over_hashmin_min_ratio"] = round(
        out["hybrid"]["min_s"] / out["hashmin"]["min_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
