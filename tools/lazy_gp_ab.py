"""Training-quality A/B for lazy MA-GP regularization (gp_interval 1 vs 4).

VERDICT r4 item #1: the one measured large perf lever — running the MA-GP
phase every 4th step with the coefficient x4 (StyleGAN2-style lazy
regularization; reference semantics anchor `src/deep_fusion_gan/model.py:
202-212` runs GP every step) — sits opt-in at ~713 img/s (+24% over the
578 img/s headline) solely because its training-quality impact was never
measured. This harness produces that evidence: THREE full training legs on
a synthetic CUB fixture, identical pipeline, real eval (random-weights
InceptionV3 — the same feature net for every leg, so IS/FID are comparable
across arms even without the pretrained weights this zero-egress
environment cannot fetch):

  gp1_seedA  — every-step GP, seed A        (the reference recipe)
  gp4_seedA  — GP every 4th step (x4 coef), seed A   (the candidate)
  gp1_seedB  — every-step GP, seed B        (cross-seed noise scale)

Decision rule (written into REPORT.json): the candidate PROMOTES iff
  * all legs finite and inside the longrun loss-health bands, AND
  * |tailFID(gp4) - tailFID(gp1_A)| <= max(1.5 * |tailFID(gp1_A) -
    tailFID(gp1_B)|, 0.10 * tailFID(gp1_A))
i.e. the lazy arm's quality shift is bounded by the cross-seed noise (with
a 10% relative floor so a tiny noise estimate can't fail a healthy arm).
Tail metrics average the last 25% of epochs (the converged regime).
d_gp_loss (the logged per-active-step gradient-norm penalty, normalized
back to reference scale by train/step.py) doubles as the gradient-norm
health trace the verdict asked for.

Budget-guarded (LAZY_AB_BUDGET_S, default 5400): a daemon watchdog kills
the running leg, writes a partial REPORT.json, and exits 0 — the r4
dispatch-probe lesson (two silent rc=124 timeouts) applied up front.

Usage: python tools/lazy_gp_ab.py [--epochs 40] [--image-size 128] ...
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_current_proc: subprocess.Popen | None = None


def run_leg(name, data_dir, work, inception, epochs, batch, image_size,
            dtype, gp_dtype, gp_interval, seed, cache_dir):
    global _current_proc
    leg_dir = os.path.join(work, name)
    cmd = [sys.executable, "-m", "gan_codes_tpu.train_entry",
           "--data", data_dir, "--image-size", str(image_size),
           "--batch-size", str(batch), "--epochs", str(epochs),
           "--dtype", dtype, "--gp-dtype", gp_dtype,
           "--gp-interval", str(gp_interval), "--seed", str(seed),
           "--inception", inception,
           # on-device Newton-Schulz FID: scipy's exact sqrtm costs ~70s
           # PER EPOCH on this 1-core host (measured) and would dominate
           # every leg; the same estimator on every arm keeps the A/B fair
           "--eval-sqrtm", "newton_schulz",
           # final-epoch checkpoint only: per-epoch Orbax saves would
           # dominate wall time through the relay and resume isn't under test
           "--ckpt-every", str(epochs),
           "--compile-cache", cache_dir,
           "--images", os.path.join(leg_dir, "images"),
           "--weights", os.path.join(leg_dir, "weights")]
    os.makedirs(leg_dir, exist_ok=True)
    t0 = time.time()
    with open(os.path.join(leg_dir, "log.txt"), "w") as log:
        _current_proc = subprocess.Popen(
            cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
            env=dict(os.environ, PYTHONUNBUFFERED="1"))
        rc = _current_proc.wait()
        _current_proc = None
    print(f"[lazy_ab] leg {name}: rc={rc} in {time.time() - t0:.0f}s",
          flush=True)
    assert rc == 0, f"leg {name} failed rc={rc} (see {leg_dir}/log.txt)"
    return leg_dir


def read_metrics(leg_dir):
    def f(v):  # JSONL stringifies non-finite floats ("Infinity"/"NaN")
        return float(v)

    rows = [json.loads(l) for l in
            open(os.path.join(leg_dir, "weights", "metrics_log.jsonl"))
            if '"epoch_seconds"' in l]  # epoch rows only (not kind=step)
    return {k: np.array([f(r[k]) for r in rows])
            for k in ("g_loss", "d_loss", "d_gp_loss", "is_score",
                      "fid_score", "epoch_seconds")}


def health(m):
    """Longrun loss-health bands (tools/longrun.py, calibrated round 2)."""
    fin = all(np.isfinite(m[k]).all() for k in ("g_loss", "d_loss",
                                                "d_gp_loss"))
    return {
        "finite": bool(fin),
        "d_loss_band": bool(np.all((m["d_loss"] > 0.0) & (m["d_loss"] < 4.0))),
        "g_loss_band": bool(np.all(np.abs(m["g_loss"]) < 20.0)),
        "gp_nonnegative": bool(np.all(m["d_gp_loss"] >= -1e-6)),
        "d_loss_range": [float(m["d_loss"].min()), float(m["d_loss"].max())],
        "g_loss_range": [float(m["g_loss"].min()), float(m["g_loss"].max())],
        "gp_range": [float(m["d_gp_loss"].min()),
                     float(m["d_gp_loss"].max())],
    }


def tail_mean(x, frac=0.25):
    n = max(1, int(len(x) * frac))
    t = np.asarray(x[-n:], np.float64)
    t = t[np.isfinite(t)]
    return float(t.mean()) if t.size else float("nan")


def build_report(legs: dict, interval: int) -> dict:
    """Aggregate the three legs' metric arrays into the decision report
    (factored out of main so the rule is unit-testable without chip runs —
    tests/test_tools.py)."""
    tails = {k: {n: tail_mean(m[k]) for n, m in legs.items()}
             for k in ("fid_score", "is_score", "g_loss", "d_loss",
                       "d_gp_loss")}
    fid_noise = abs(tails["fid_score"]["gp1_seedA"]
                    - tails["fid_score"]["gp1_seedB"])
    fid_effect = abs(tails["fid_score"][f"gp{interval}_seedA"]
                     - tails["fid_score"]["gp1_seedA"])
    fid_bound = max(1.5 * fid_noise, 0.10 * tails["fid_score"]["gp1_seedA"])
    healths = {n: health(m) for n, m in legs.items()}
    all_healthy = all(h["finite"] and h["d_loss_band"] and h["g_loss_band"]
                      and h["gp_nonnegative"] for h in healths.values())
    promote = bool(all_healthy and np.isfinite(fid_effect)
                   and fid_effect <= fid_bound)
    return {
        "tail_metrics_last25pct": tails,
        "fid_noise_cross_seed": round(fid_noise, 4),
        "fid_effect_gp_interval": round(fid_effect, 4),
        "fid_bound": round(fid_bound, 4),
        "health": healths,
        "verdict": "PROMOTE" if promote else "KEEP_OPT_IN",
        "rule": "promote iff all legs healthy and fid_effect <= "
                "max(1.5*cross_seed_noise, 0.10*baseline_tail_fid)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gp-dtype", default="bfloat16")
    ap.add_argument("--n-train", type=int, default=384)
    ap.add_argument("--n-test", type=int, default=96)
    ap.add_argument("--seed-a", type=int, default=123321)
    ap.add_argument("--seed-b", type=int, default=777)
    ap.add_argument("--interval", type=int, default=4)
    ap.add_argument("--data", default="/tmp/lazygp_cub")
    ap.add_argument("--work", default="/tmp/lazygp")
    ap.add_argument("--cache", default=os.environ.get(
        "BENCH_COMPILE_CACHE", "/tmp/xla_bench_cache"))
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "lazy_gp_ab"))
    a = ap.parse_args()
    sys.path.insert(0, REPO)
    os.makedirs(a.out, exist_ok=True)

    budget_s = float(os.environ.get("LAZY_AB_BUDGET_S", 5400))

    def _bail():
        print(f"[lazy_ab] BUDGET EXCEEDED ({budget_s:.0f}s)", flush=True)
        p = _current_proc
        if p is not None:
            p.kill()
        with open(os.path.join(a.out, "REPORT.json"), "w") as f:
            json.dump({"verdict": "INCOMPLETE",
                       "reason": f"budget {budget_s:.0f}s exceeded"}, f)
        os._exit(0)

    wd = threading.Timer(budget_s, _bail)
    wd.daemon = True
    wd.start()

    # 1. fixture + random-weights inception (same file for every leg)
    if not os.path.exists(os.path.join(a.data, "captions.pickle")):
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        info = make_synthetic_cub(a.data, n_train=a.n_train, n_test=a.n_test,
                                  image_size=int(a.image_size * 76 / 64))
        print(f"[lazy_ab] fixture: {info}", flush=True)
    inception = os.path.join(a.data, "inception_rand.pth")
    if not os.path.exists(inception):
        import torch
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import torch_ref
        torch.save(torch_ref.random_inception_state_dict(seed=1), inception)
        print("[lazy_ab] wrote random-weights inception", flush=True)

    if os.path.exists(a.work):
        shutil.rmtree(a.work)

    # 2. the three legs (candidate FIRST: if the budget truncates the run,
    #    the question under test has data before the noise-scale leg does)
    legs = {}
    for name, interval, seed in (
            (f"gp{a.interval}_seedA", a.interval, a.seed_a),
            ("gp1_seedA", 1, a.seed_a),
            ("gp1_seedB", 1, a.seed_b)):
        leg_dir = run_leg(name, a.data, a.work, inception, a.epochs,
                          a.batch_size, a.image_size, a.dtype, a.gp_dtype,
                          interval, seed, a.cache)
        legs[name] = read_metrics(leg_dir)
        # persist per-leg evidence immediately
        shutil.copy(os.path.join(leg_dir, "weights", "metrics_log.jsonl"),
                    os.path.join(a.out, f"metrics_{name}.jsonl"))
        grid = os.path.join(leg_dir, "images",
                            f"fake_sample_epoch_{a.epochs - 1}.png")
        if os.path.exists(grid):
            shutil.copy(grid, os.path.join(a.out, f"grid_{name}.png"))

    # 3. verdict
    report = build_report(legs, a.interval)
    report["operating_point"] = {
        "image_size": a.image_size, "batch_size": a.batch_size,
        "dtype": a.dtype, "gp_dtype": a.gp_dtype, "epochs": a.epochs,
        "n_train": a.n_train, "interval": a.interval}
    with open(os.path.join(a.out, "REPORT.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    wd.cancel()


if __name__ == "__main__":
    main()
