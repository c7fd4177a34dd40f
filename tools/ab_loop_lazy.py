"""Interleaved A/B of the r6 lazy-checkpoint iteration fusion.

Usage: python tools/ab_loop_lazy.py [reps]

Compares the current pagerank / connected_components / label_propagation
loops against their pre-fusion implementations (expected as
/tmp/oldmods/{pagerank,components,labelprop}_r5.py — `git show` copies of
the persist+Observation+eager-truncate shape) on the bench query shapes
at sf0.1/local[32], interleaved, min-of-reps. Also cross-checks result
equality (exact rows for cc/lp; pagerank ranks compared bit-for-bit
after the same driver-literal normalization).
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_pagerank_spark.plans.pagerank import pagerank as pr_new
from distributed_pagerank_spark.plans.components import (
    connected_components as cc_new,
)
from distributed_pagerank_spark.plans.labelprop import (
    label_propagation as lp_new,
)
from distributed_pagerank_spark.sources.transcripts import (
    derive_edges,
    synth_transcripts,
)
from distributed_pagerank_spark.session import get_spark
import __spark_entry__ as contract


def load(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_r5", f"/tmp/oldmods/{name}_r5.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{name}_r5"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-loop-lazy", master="local[32]",
                      shuffle_partitions=32)
    pr_old = load("pagerank").pagerank
    cc_old = load("components").connected_components
    lp_old = load("labelprop").label_propagation

    sf_dir = "/root/testdata/sf0.1"
    edges = contract._graph_edges(spark, sf_dir).persist()
    edges.count()

    def tr(fn):
        res = fn(spark, derive_edges(synth_transcripts(
            spark, n_convs=100_000, seed=42)), c=0.85, eps=0.0, max_iter=5)
        res.ranks.count()

    suite = {
        "transcripts_old": lambda: tr(pr_old),
        "transcripts_new": lambda: tr(pr_new),
        "pagerank10_old": lambda: pr_old(
            spark, edges, c=0.85, eps=0.0, max_iter=10).ranks.count(),
        "pagerank10_new": lambda: pr_new(
            spark, edges, c=0.85, eps=0.0, max_iter=10).ranks.count(),
        "cc_old": lambda: cc_old(spark, edges, max_iter=10).count(),
        "cc_new": lambda: cc_new(spark, edges, max_iter=10).count(),
        "lp_old": lambda: lp_old(spark, edges, rounds=3).count(),
        "lp_new": lambda: lp_new(spark, edges, rounds=3).count(),
    }

    # result equality first (cc/lp exact; pagerank raw doubles)
    eq = {}
    o = {r["id"]: r["component"] for r in cc_old(spark, edges).collect()}
    n = {r["id"]: r["component"] for r in cc_new(spark, edges).collect()}
    eq["cc_exact"] = o == n
    o = {r["id"]: r["label"] for r in lp_old(spark, edges, rounds=3).collect()}
    n = {r["id"]: r["label"] for r in lp_new(spark, edges, rounds=3).collect()}
    eq["lp_exact"] = o == n
    import struct
    b = lambda x: struct.unpack("<Q", struct.pack("<d", x))[0]
    o = {r["id"]: b(r["rank"]) for r in pr_old(
        spark, edges, c=0.85, eps=0.0, max_iter=10).ranks.collect()}
    n = {r["id"]: b(r["rank"]) for r in pr_new(
        spark, edges, c=0.85, eps=0.0, max_iter=10).ranks.collect()}
    diffs = sum(1 for i in o if o[i] != n[i])
    maxd = max(
        (abs(struct.unpack("<d", struct.pack("<Q", o[i]))[0]
             - struct.unpack("<d", struct.pack("<Q", n[i]))[0])
         for i in o),
        default=0.0,
    )
    eq["pagerank_bit_diffs"] = f"{diffs}/{len(o)}"
    eq["pagerank_max_abs_diff"] = maxd
    print("equality:", eq, flush=True)

    times = {k: [] for k in suite}
    for _ in range(reps):
        for name, fn in suite.items():
            t0 = time.monotonic()
            fn()
            times[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({"equality": eq, "times": times,
                      "min": {k: min(v) for k, v in times.items()}},
                     indent=1, default=str), flush=True)


if __name__ == "__main__":
    main()
