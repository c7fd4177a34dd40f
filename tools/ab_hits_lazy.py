"""A/B + bit-equivalence check for the r6 HITS lazy-checkpoint loop.

Usage: python tools/ab_hits_lazy.py [reps]

1. Equivalence: runs the round-5 implementation (expected at
   /tmp/hits_r5.py — a pre-edit copy of plans/hits.py) and the current
   one on the customer→supplier graph at sf0.001, sf0.01 and sf0.1 and
   compares the RAW 64-bit patterns of every (hub, auth) double. The
   old loop derives a_mass from an Observation, the new one from an
   aggregate over the checkpointed snapshot — this check proves the two
   sums (and everything downstream) are bit-identical in practice.
2. Timing: interleaved min-of-reps of old vs new at sf0.1/local[32],
   10 iterations (the bench shape).
"""

from __future__ import annotations

import importlib.util
import json
import struct
import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_pagerank_spark.plans.hits import hits as hits_new
from distributed_pagerank_spark.session import get_spark
import __spark_entry__ as contract


def load_old():
    spec = importlib.util.spec_from_file_location("hits_r5", "/tmp/hits_r5.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["hits_r5"] = mod  # dataclass resolution needs the registry
    spec.loader.exec_module(mod)
    return mod.hits


def bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def collect_scores(spark, fn, edges, k):
    res = fn(spark, edges, max_iter=k)
    rows = res.scores.orderBy("id").collect()
    return [(r["id"], bits(r["hub"]), bits(r["auth"])) for r in rows]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-hits-lazy", master="local[32]",
                      shuffle_partitions=32)
    hits_old = load_old()

    verdicts = {}
    for sf in ("0.001", "0.01", "0.1"):
        edges = contract._graph_edges(spark, f"/root/testdata/sf{sf}").persist()
        edges.count()
        k = 8 if sf != "0.1" else 10
        old = collect_scores(spark, hits_old, edges, k)
        new = collect_scores(spark, hits_new, edges, k)
        mism = sum(1 for a, b in zip(old, new) if a != b)
        verdicts[sf] = {"rows": len(old), "rows_new": len(new),
                        "bit_mismatches": mism}
        edges.unpersist()
        print(f"sf{sf}: {verdicts[sf]}", flush=True)

    edges = contract._graph_edges(spark, "/root/testdata/sf0.1").persist()
    edges.count()
    times = {"old": [], "new": []}
    hits_new(spark, edges, max_iter=10).scores.count()  # warmup, discarded
    for _ in range(reps):
        for name, fn in (("old", hits_old), ("new", hits_new)):
            t0 = time.monotonic()
            fn(spark, edges, max_iter=10).scores.count()
            times[name].append(round(time.monotonic() - t0, 3))
    out = {"equivalence": verdicts,
           "times": times,
           "min": {k: min(v) for k, v in times.items()}}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
