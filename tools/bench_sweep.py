"""Config sweep for the scaling benchmark: run one (cores, config) cell per
fresh JVM and print median iteration wall-clock. Used to pick the config
that maximizes 8->32 scaling efficiency before the full measured run.

Usage: python tools/bench_sweep.py CORES CONFIG [N_CONVS] [WARMUP] [MEASURE]
CONFIG: base | tuned
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = {
    "base": {},
    "tuned": {
        # AQE off: fixed per-iteration stage graph, no driver re-planning
        # or materialization barriers inside the loop
        "spark.sql.adaptive.enabled": "false",
        # local mode: no locality preference worth waiting for
        "spark.locality.wait": "0ms",
        # shuffle lands in tmpfs — lz4 costs CPU, saves nothing
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
}


def main():
    cores = int(sys.argv[1])
    config = sys.argv[2]
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_400_000
    warmup = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    measure = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    parts_mult = 2 if config == "tuned" else 1

    from distributed_pagerank_spark.session import get_spark
    from distributed_pagerank_spark.sources.transcripts import (
        derive_edges,
        synth_transcripts,
    )
    from distributed_pagerank_spark.plans.pagerank import pagerank

    spark = get_spark(
        app_name=f"sweep-{cores}-{config}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8) * parts_mult,
        extra_conf={"spark.driver.memory": "48g", **CONFIGS[config]},
    )
    t0 = time.monotonic()
    t = synth_transcripts(spark, n_convs=n_convs, seed=42)
    edges = derive_edges(t).localCheckpoint(eager=True)
    m = edges.count()
    gen_s = time.monotonic() - t0
    res = pagerank(
        spark, edges, c=0.85, eps=0.0, max_iter=warmup + measure,
        num_partitions=max(cores, 8) * parts_mult,
    )
    iters = [x["total_s"] for x in res.metrics[warmup:]]
    print(json.dumps({
        "cores": cores, "config": config, "edges": m,
        "gen_s": round(gen_s, 1),
        "iter_times_s": [round(x, 2) for x in iters],
        "median_iter_s": round(statistics.median(iters), 3),
    }))


if __name__ == "__main__":
    main()
