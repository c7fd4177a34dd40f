"""Pool scaling samples across campaigns (BASELINE.md protocol).

Judge criterion (VERDICT round 2, item 7): steady median >= 0.8 in a
single campaign, OR >= 30 pooled steady samples per level with the
min/amortized conclusions unchanged. The round-2 campaign contributed 18
steady samples per level, the round-3 campaign 40, the confirm pair 8,
and the six round-4 steal-monitored 8v32 campaigns 8 per pair (quiet,
pair2, pair3, quiet3, and the two-pair pair45 and quiet2 campaigns = 16
each); all ran the IDENTICAL
protocol on the IDENTICAL input (n_convs=11.2M,
seed=42, 85,121,530 edges — asserted below), interleaved fresh-JVM legs
with warmup discard, so their steady-state per-iteration samples are
drawn from the same population and pooling is legitimate. Truncation
(checkpoint) iterations pool the same way for the amortized statistic.

Usage:
    python tools/pool_scaling.py [--out FILE] [result.json ...]
Defaults: all 8v32 campaigns → BENCH/scaling_pooled.json. Campaigns with
different level sets (e.g. 4v16) must be pooled separately with explicit
paths and --out (the level-set guard below enforces it).
"""

from __future__ import annotations

import json
import statistics
import sys

DEFAULT_INPUTS = [
    "/root/repo/BENCH/scaling_result_r2.json",
    "/root/repo/BENCH/scaling_result_r3.json",
    "/root/repo/BENCH/scaling_result_confirm85.json",
    "/root/repo/BENCH/scaling_result_quiet_r4.json",
    "/root/repo/BENCH/scaling_result_pair2_r4.json",
    "/root/repo/BENCH/scaling_result_pair3_r4.json",
    "/root/repo/BENCH/scaling_result_pair45_r4.json",
    "/root/repo/BENCH/scaling_result_quiet2_r4.json",
    "/root/repo/BENCH/scaling_result_quiet3_r4.json",
]


def pool(paths: list[str]) -> dict:
    pooled: dict[str, dict] = {}
    campaigns = []
    level_set: set[str] | None = None
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        # level-set consistency guard (ADVICE r4): a 4v16 campaign pooled
        # with 8v32 campaigns passes the edges/vertices asserts but would
        # silently produce a bogus 4-vs-32 factor-8 efficiency. All pooled
        # campaigns must have run the SAME parallelism levels.
        this_levels = set(r["levels"])
        if level_set is None:
            level_set = this_levels
        assert this_levels == level_set, (
            f"{p} ran levels {sorted(this_levels)} but the pool is over "
            f"{sorted(level_set)} — pool 4v16 and 8v32 campaigns separately"
        )
        campaigns.append({
            "path": p, "protocol": r.get("protocol"),
            "n_convs": r.get("n_convs"), "warmup": r.get("warmup"),
            "measure": r.get("measure"),
        })
        for lvl, s in r["levels"].items():
            tgt = pooled.setdefault(lvl, {
                "cores": s["cores"], "edges": s["edges"],
                "vertices": s["vertices"],
                "steady_iter_s": [], "trunc_iter_s": [],
                "per_campaign_n": [],
            })
            # same-population guard: identical input graph required
            assert tgt["edges"] == s["edges"], (p, lvl, s["edges"])
            assert tgt["vertices"] == s["vertices"], (p, lvl)
            tgt["steady_iter_s"].extend(s["steady_iter_s"])
            tgt["trunc_iter_s"].extend(s["trunc_iter_s"])
            tgt["per_campaign_n"].append(len(s["steady_iter_s"]))

    lvl_sorted = sorted(level_set or set(), key=int)
    out = {
        "metric": (
            f"pagerank_scaling_efficiency_local{lvl_sorted[0]}"
            f"_vs_local{lvl_sorted[-1]}_pooled"
            if len(lvl_sorted) >= 2 else "pagerank_scaling_efficiency_pooled"
        ),
        "campaigns": campaigns,
        "levels": {},
    }
    for lvl, s in pooled.items():
        steady = sorted(s["steady_iter_s"])
        n_iters = len(s["steady_iter_s"]) + len(s["trunc_iter_s"])
        total = sum(s["steady_iter_s"]) + sum(s["trunc_iter_s"])
        out["levels"][lvl] = {
            **s,
            "n_steady": len(steady),
            "median_steady_iter_s": round(statistics.median(steady), 3),
            "min_steady_iter_s": round(steady[0], 3),
            "p25_steady_iter_s": round(steady[(len(steady) - 1) // 4], 3),
            "amortized_iter_s": round(total / n_iters, 3),
        }
    levels = sorted(out["levels"], key=int)
    if len(levels) >= 2:
        lo, hi = out["levels"][levels[0]], out["levels"][levels[-1]]
        factor = int(levels[-1]) / int(levels[0])
        out["scale_factor"] = factor
        for stat in ("min", "p25", "median", "amortized"):
            key = f"{stat}_steady_iter_s" if stat != "amortized" else "amortized_iter_s"
            out[f"efficiency_{stat}"] = round((lo[key] / hi[key]) / factor, 3)
    return out


def main() -> None:
    argv = sys.argv[1:]
    out_path = "/root/repo/BENCH/scaling_pooled.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    paths = argv or DEFAULT_INPUTS
    out = pool(paths)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("levels", "campaigns")}))
    for lvl in sorted(out["levels"], key=int):
        s = out["levels"][lvl]
        print(f"# local[{lvl}]: n={s['n_steady']} min={s['min_steady_iter_s']}"
              f" p25={s['p25_steady_iter_s']}"
              f" median={s['median_steady_iter_s']}"
              f" amortized={s['amortized_iter_s']}")


if __name__ == "__main__":
    main()
