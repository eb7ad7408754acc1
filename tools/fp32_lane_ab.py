"""Paired, interleaved A/B of the fp32-bs24 lane-pad bench arm (VERDICT r4 #5).

The claim under test: lane_pad=128/min_ch=64 on BOTH towers wins +2.1% at
the fp32-bs24 reference operating point. The r4 driver capture showed only
+0.3% (206.87 vs 206.28) — within run noise — while earlier sequential
audit-trail runs showed +2.1-3.1%. Sequential arms confound the comparison
with slow relay drift (cache state, relay load), so this tool interleaves:

  round i: baseline, lane    (alternating order each round to cancel
  round i+1: lane, baseline   any first-mover advantage)

and reports per-round PAIRED deltas, their mean, std, and a sign count.
Decision rule (written into stdout JSON): the arm is KEPT iff the mean
paired delta is positive and exceeds 2x the standard error of the paired
deltas; otherwise it is RETIRED to "within noise" and bench.py drops it.

Budget-guarded via FP32AB_BUDGET_S (default 2400): partial rounds still
print, the verdict line then says how many rounds completed.

Usage: python tools/fp32_lane_ab.py [--rounds 5] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()

    import bench
    from gan_codes_tpu.utils.compile_cache import enable_bench_cache
    enable_bench_cache(lambda m: print(f"[fp32ab] {m}", flush=True))

    pairs: list = []  # (baseline_ips, lane_ips) per round

    def verdict(partial=False):
        if not pairs:
            return {"verdict": "NO_DATA", "rounds": 0}
        base = np.array([p[0] for p in pairs])
        lane = np.array([p[1] for p in pairs])
        delta = lane - base
        n = len(delta)
        se = float(delta.std(ddof=1) / np.sqrt(n)) if n > 1 else float("inf")
        keep = bool(delta.mean() > 0 and delta.mean() > 2 * se)
        return {
            "verdict": "KEEP" if keep else "RETIRE",
            "rounds": n, "partial": partial,
            "baseline_mean": round(float(base.mean()), 2),
            "lane_mean": round(float(lane.mean()), 2),
            "delta_mean": round(float(delta.mean()), 3),
            "delta_std": round(float(delta.std(ddof=1)), 3) if n > 1 else None,
            "delta_se": round(se, 3) if np.isfinite(se) else None,
            "delta_pct": round(float(delta.mean() / base.mean() * 100), 2),
            "positive_rounds": int((delta > 0).sum()),
            "pairs": [[round(b, 2), round(l, 2)] for b, l in pairs],
            "rule": "KEEP iff mean paired delta > 0 and > 2*SE",
        }

    budget_s = float(os.environ.get("FP32AB_BUDGET_S", 2400))

    def _bail():
        print(json.dumps(verdict(partial=True)), flush=True)
        os._exit(0)

    wd = threading.Timer(budget_s, _bail)
    wd.daemon = True
    wd.start()

    lane = {"lane_pad": 128, "lane_pad_min_ch": 64}

    def run(arm: str) -> float:
        over = lane if arm == "lane" else None
        return bench.bench_step("float32", 24, iters=a.iters,
                                generator_overrides=over,
                                discriminator_overrides=over)

    for r in range(a.rounds):
        order = ("base", "lane") if r % 2 == 0 else ("lane", "base")
        got = {}
        for arm in order:
            got[arm] = run(arm)
            print(f"[fp32ab] round {r} {arm}: {got[arm]:.2f} img/s",
                  flush=True)
        pairs.append((got["base"], got["lane"]))
    wd.cancel()
    print(json.dumps(verdict()), flush=True)


if __name__ == "__main__":
    main()
