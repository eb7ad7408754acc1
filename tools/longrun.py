"""Long-duration 256px training proof with a mid-run kill and resume.

VERDICT r1 item #7: run the engine at the reference operating point (256px,
`src/train.py:20-22`) for tens of epochs ON THE CHIP, SIGKILL it mid-run,
resume from the Orbax checkpoint, and prove the resumed run is EQUIVALENT to
an uninterrupted twin (same seed): identical final G/D parameters and
identical per-epoch loss histories. Equivalence holds because checkpoints
carry the step RNG, the loader's shuffle/augment stream is epoch-keyed
(DataLoader.set_epoch), and eval noise is epoch-keyed in Trainer.fit.

Beyond resume-equivalence, the run also produces TRAINING-QUALITY evidence
(VERDICT r2 item #8): per-epoch sample grids (first/quartile/last epochs
copied into --out) and loss-health band assertions over the whole run — the
epoch-mean D hinge loss must stay inside a sane band and the G adversarial
loss must not run away (the mode-collapse signature), all values finite.
Bands are calibrated from the round-2 30-epoch 256px on-chip run
(d_loss 1.05-2.23, g_loss -0.55-6.24; artifacts/longrun/).

Artifacts (curves, sample grids, step-time stability, equivalence + health
report) go to --out (default artifacts/longrun/).

Usage: python tools/longrun.py [--epochs 30] [--kill-after-epoch 14]
                               [--batch-size 24] [--dtype float32]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(data_dir, work, epochs, batch, image_size, dtype, kill_after=None):
    """Run train_entry as a subprocess; optionally SIGKILL it once
    `kill_after` epochs have completed (watched via stdout)."""
    cmd = [sys.executable, "-m", "gan_codes_tpu.train_entry",
           "--data", data_dir, "--image-size", str(image_size),
           "--batch-size", str(batch), "--epochs", str(epochs),
           "--dtype", dtype,
           "--images", os.path.join(work, "images"),
           "--weights", os.path.join(work, "weights")]
    log_path = os.path.join(work, f"log_{int(time.time())}.txt")
    os.makedirs(work, exist_ok=True)
    env = dict(os.environ, PYTHONUNBUFFERED="1")  # kill trigger needs
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,  # live lines
                            stderr=subprocess.STDOUT, text=True, env=env)
    killed = False
    lines = []
    with open(log_path, "w") as log:
        for line in proc.stdout:
            log.write(line)
            lines.append(line)
            if line.startswith("Epoch ") or "Resuming" in line:
                print(f"  [{os.path.basename(work)}] {line.rstrip()}",
                      flush=True)
            if (kill_after is not None and not killed
                    and line.startswith(f"Epoch {kill_after}:")):
                print(f"  >>> SIGKILL after epoch {kill_after} "
                      f"(mid-run crash simulation)", flush=True)
                proc.send_signal(signal.SIGKILL)
                killed = True
    rc = proc.wait()
    return rc, killed, lines, log_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--kill-after-epoch", type=int, default=14)
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--n-train", type=int, default=192)
    ap.add_argument("--n-test", type=int, default=48)
    ap.add_argument("--data", default="/tmp/longrun_cub")
    ap.add_argument("--work", default="/tmp/longrun")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "longrun"))
    a = ap.parse_args()

    sys.path.insert(0, REPO)

    # 1. synthetic CUB-format fixture at the 256px operating point
    if not os.path.exists(os.path.join(a.data, "captions.pickle")):
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        info = make_synthetic_cub(a.data, n_train=a.n_train, n_test=a.n_test,
                                  image_size=int(a.image_size * 76 / 64))
        print(f"fixture: {info}", flush=True)

    if os.path.exists(a.work):
        shutil.rmtree(a.work)

    # 2. uninterrupted twin
    print(f"== leg A: straight {a.epochs} epochs ==", flush=True)
    t0 = time.time()
    rc, _, lines_a, log_a = run_leg(a.data, os.path.join(a.work, "straight"),
                                    a.epochs, a.batch_size, a.image_size,
                                    a.dtype)
    assert rc == 0, f"straight leg failed rc={rc}"
    t_straight = time.time() - t0

    # 3. killed + resumed run
    print(f"== leg B: kill after epoch {a.kill_after_epoch}, then resume ==",
          flush=True)
    rc, killed, lines_b1, log_b1 = run_leg(
        a.data, os.path.join(a.work, "resumed"), a.epochs, a.batch_size,
        a.image_size, a.dtype, kill_after=a.kill_after_epoch)
    assert killed, "kill was never triggered"
    assert rc != 0, "process should have died from SIGKILL"
    rc, _, lines_b2, log_b2 = run_leg(
        a.data, os.path.join(a.work, "resumed"), a.epochs, a.batch_size,
        a.image_size, a.dtype)
    assert rc == 0, f"resumed leg failed rc={rc}"
    resumed_line = next((l for l in lines_b2 if "Resuming" in l), None)
    assert resumed_line, "resume print missing"

    # 4. equivalence: final params + histories bit-identical
    import numpy as np
    import jax

    def final_state(leg):
        import orbax.checkpoint as ocp
        path = os.path.join(a.work, leg, "weights")
        state = ocp.StandardCheckpointer().restore(
            os.path.join(path, "checkpoint"))
        with open(os.path.join(path, "histories.json")) as f:
            blob = json.load(f)
        return state, blob, int(blob.pop("epoch"))

    sa, ha, ea = final_state("straight")
    sb, hb, eb = final_state("resumed")
    assert ea == eb == a.epochs - 1, (ea, eb)
    mismatches = []
    paths_a = jax.tree_util.tree_flatten_with_path(sa)[0]
    leaves_b = jax.tree.leaves(sb)
    for (keypath, x), y in zip(paths_a, leaves_b):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            mismatches.append(jax.tree_util.keystr(keypath))
    hist_equal = {k: ha[k] == hb[k] for k in ha}

    # 5. artifacts
    os.makedirs(a.out, exist_ok=True)
    for leg in ("straight", "resumed"):
        src = os.path.join(a.work, leg, "weights", "metrics_log.jsonl")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(a.out, f"metrics_{leg}.jsonl"))
    from gan_codes_tpu.utils.plotting import plot_losses
    plot_losses(ha["g_losses"], ha["d_losses"], ha["d_gp_losses"],
                os.path.join(a.out, "loss_curves.png"))

    # sample grids: the visual proof the GAN trains, not just resumes.
    # Keep first / quartile / last epochs (full set stays in --work logs).
    grid_dir = os.path.join(a.out, "sample_grids")
    os.makedirs(grid_dir, exist_ok=True)
    keep_epochs = sorted({0, a.epochs // 4, a.epochs // 2,
                          3 * a.epochs // 4, a.epochs - 1})
    copied_grids = []
    for e in keep_epochs:
        for name in (f"fake_sample_epoch_{e}.png",
                     f"samples_with_text_epoch_{e}.jpg"):
            src = os.path.join(a.work, "straight", "images", name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(grid_dir, name))
                copied_grids.append(name)
    assert copied_grids, "no sample grids were produced by the run"

    # loss-health bands over EVERY epoch (epoch means; bands calibrated
    # from the round-2 on-chip 256px run, see module docstring). A dying D
    # pins d_loss near 0 or >4; a mode-collapse / divergence signature is
    # |g_loss| running away; everything must be finite.
    health = {
        "finite": all(np.isfinite(ha[k]).all() for k in
                      ("g_losses", "d_losses", "d_gp_losses")),
        "d_loss_band": bool(np.all((np.array(ha["d_losses"]) > 0.0)
                                   & (np.array(ha["d_losses"]) < 4.0))),
        "g_loss_band": bool(np.all(np.abs(ha["g_losses"]) < 20.0)),
        "gp_nonnegative": bool(np.all(np.array(ha["d_gp_losses"]) >= 0.0)),
        "d_loss_range": [float(np.min(ha["d_losses"])),
                         float(np.max(ha["d_losses"]))],
        "g_loss_range": [float(np.min(ha["g_losses"])),
                         float(np.max(ha["g_losses"]))],
    }
    health["ok"] = (health["finite"] and health["d_loss_band"]
                    and health["g_loss_band"] and health["gp_nonnegative"])

    epoch_secs = []
    for line in open(os.path.join(a.out, "metrics_straight.jsonl")):
        epoch_secs.append(json.loads(line)["epoch_seconds"])
    steady = epoch_secs[1:]

    report = {
        "operating_point": {"image_size": a.image_size,
                            "batch_size": a.batch_size, "dtype": a.dtype,
                            "epochs": a.epochs, "n_train": a.n_train},
        "straight_wall_seconds": round(t_straight, 1),
        "epoch_seconds_first": round(epoch_secs[0], 2),
        "epoch_seconds_steady_mean": round(float(np.mean(steady)), 2),
        "epoch_seconds_steady_std": round(float(np.std(steady)), 2),
        "killed_after_epoch": a.kill_after_epoch,
        "resume_print": resumed_line.strip(),
        "param_mismatches": mismatches,
        "histories_equal": hist_equal,
        "equivalent": not mismatches and all(hist_equal.values()),
        "sample_grids": copied_grids,
        "loss_health": health,
    }
    with open(os.path.join(a.out, "LONGRUN.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    assert report["equivalent"], "kill-and-resume NOT equivalent!"
    assert health["ok"], f"loss-health bands violated: {health}"
    print("LONGRUN OK: kill-and-resume bit-identical; loss health in band; "
          f"{len(copied_grids)} sample grids in {grid_dir}", flush=True)


if __name__ == "__main__":
    main()
