"""Fit the fixed-floor scaling model t(k) = W/k + C across input sizes.

W = parallel work (core-seconds per iteration, scales with the graph),
C = per-iteration time that does not shrink with cores (driver/
scheduling floor plus any shared-resource penalty of the wider level —
on a single box the 32-thread leg shares one memory system, which a
real 4N-executor cluster does not).

Per size the two level minima (least-contended samples) give two
equations in (W, C):

    t8 = W/8 + C,   t32 = W/32 + C
    W  = (t8 - t32) * 32 / 3,   C = t32 - W/32

The model's point: efficiency((t8/t32)/4) = (W/8 + C) / (4*(W/32 + C))
rises monotonically in W. Holding the fitted C fixed and growing W with
the graph predicts where the ≥0.8 criterion crosses — the sandbox's
85M-edge test point sits near the crossing; the 10^12-turn target scale
is ~10^4× past it.

Usage:
    python tools/fit_floor_model.py size1.json [size2.json ...]
Each input: a bench_scaling result file (levels 8 and 32 present).
Prints a fit table plus predicted efficiency vs work multiplier.
"""

from __future__ import annotations

import json
import sys


def fit_one(path: str) -> dict:
    with open(path) as f:
        r = json.load(f)
    lv = r["levels"]
    t8 = min(lv["8"]["steady_iter_s"])
    t32 = min(lv["32"]["steady_iter_s"])
    w = (t8 - t32) * 32.0 / 3.0
    c = t32 - w / 32.0
    eff = (t8 / t32) / 4.0
    return {
        "path": path,
        "edges": lv["8"]["edges"],
        "t8_min": t8,
        "t32_min": t32,
        "W_core_s": round(w, 2),
        "C_s": round(c, 3),
        "efficiency_min": round(eff, 3),
    }


def predict(w: float, c: float) -> float:
    return (w / 8.0 + c) / (4.0 * (w / 32.0 + c))


def main() -> None:
    paths = sys.argv[1:]
    fits = [fit_one(p) for p in paths]
    print(json.dumps(fits, indent=1))
    if not fits:
        return
    # extrapolation from the largest size's fit
    big = max(fits, key=lambda f: f["edges"])
    w0, c = big["W_core_s"], big["C_s"]
    print("\n# efficiency vs work multiplier (C fixed at "
          f"{c} s from the {big['edges']:,}-edge fit):")
    for mult in (0.25, 0.5, 1, 2, 4, 8, 16, 100, 10000):
        print(f"#   {mult:>7}x W: eff = {predict(w0 * mult, c):.3f}")
    # solve W for eff = 0.8: (W/8+C) = 3.2*(W/32+C) -> W(1/8-0.1)=2.2C
    w_cross = 2.2 * c / (1.0 / 8.0 - 3.2 / 32.0)
    print(f"# eff=0.8 crossing at W = {w_cross:.1f} core-s/iter "
          f"({w_cross / w0:.2f}x the current size)")


if __name__ == "__main__":
    main()
