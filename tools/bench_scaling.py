"""Scaling-efficiency benchmark (BASELINE.md protocol).

No real cluster exists in the sandbox, so the north-rule's N vs 4N
executor criterion is evidenced by running the IDENTICAL PageRank job on
the IDENTICAL deterministic input at two parallelism levels —
``local[8]`` vs ``local[32]`` — in fresh JVMs (subprocess per level), and
reporting iterations/hour at both plus
``efficiency = (throughput_4N / throughput_N) / 4``.

The host is multi-tenant and jittery, so each level runs WARMUP + MEASURE
iterations and reports the MEDIAN per-iteration wall-clock.

Usage:
    python tools/bench_scaling.py                 # orchestrate both levels
    python tools/bench_scaling.py --worker 8      # one level (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

N_CONVS = int(os.environ.get("SCALING_N_CONVS", "1400000"))
WARMUP = 3
MEASURE = 7


def worker(cores: int) -> None:
    sys.path.insert(0, "/root/repo")
    from distributed_pagerank_spark.session import get_spark
    from distributed_pagerank_spark.sources.transcripts import (
        derive_edges,
        synth_transcripts,
    )
    from distributed_pagerank_spark.plans.pagerank import pagerank

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )
    t0 = time.monotonic()
    t = synth_transcripts(spark, n_convs=N_CONVS, seed=42)
    edges = derive_edges(t).localCheckpoint(eager=True)
    m = edges.count()
    gen_s = time.monotonic() - t0

    res = pagerank(
        spark, edges, c=0.85, eps=0.0, max_iter=WARMUP + MEASURE,
        num_partitions=max(cores, 8),
    )
    iter_times = [x["total_s"] for x in res.metrics[WARMUP:]]
    med = statistics.median(iter_times)
    print(json.dumps({
        "cores": cores,
        "edges": m,
        "vertices": res.ranks.count(),
        "gen_s": round(gen_s, 1),
        "iter_times_s": [round(x, 2) for x in iter_times],
        "median_iter_s": round(med, 3),
        "iters_per_hour": round(3600.0 / med, 1),
    }))


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, timeout=3600,
            cwd="/root/repo",
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    tp8 = results[8]["iters_per_hour"]
    tp32 = results[32]["iters_per_hour"]
    eff = (tp32 / tp8) / 4.0
    summary = {
        "metric": "pagerank_scaling_efficiency_local8_vs_local32",
        "throughput_n": tp8,
        "throughput_4n": tp32,
        "efficiency": round(eff, 3),
        "edges": results[8]["edges"],
        "detail": results,
    }
    print(json.dumps(summary))
    with open("/root/repo/BENCH/scaling_result.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
