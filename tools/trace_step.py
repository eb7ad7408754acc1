"""Device-trace proof of where the bf16-bs128 train step's time goes.

VERDICT r2 item #4: the "architectural floor" claim (D's narrow-channel
convs cap MXU lane utilization at <=50%) was argued from step ablation;
this tool backs it with an actual device profile. It:

  1. compiles the full 3-phase step (reference semantics, bf16 compute,
     bs128 @ 256px) and saves the OPTIMIZED HLO (fusion names + per-op
     source metadata);
  2. captures a `jax.profiler.trace` of one scan-rolled dispatch (the
     relay-safe timing shape: CLAUDE.md rules) — the trace contains a real
     /device:TPU lane with per-fusion timings;
  3. joins trace fusions to their HLO definitions, classifies each fusion
     (which convolution shapes it contains, fwd/bwd, which phase by source
     metadata), and computes per-fusion achieved FLOP/s against the conv
     FLOP count;
  4. writes the joined table + a summary to --out (default
     artifacts/trace_r3/): trace.json.gz, step_hlo.txt, ANALYSIS.json,
     and prints the summary.

Usage: python tools/trace_step.py [--batch 128] [--iters 2] [--out DIR]
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_step(batch: int, iters: int, image_size: int = 256,
               lane_pad: int = 0, lane_pad_min_ch: int = 0,
               g_lane_pad: bool = False, vmem_kib: int | None = None,
               image_pad: int = 0):
    import functools

    import jax
    import jax.numpy as jnp
    from gan_codes_tpu.config import GANConfig
    from gan_codes_tpu.models.text_encoder import init_text_encoder
    from gan_codes_tpu.train.state import create_train_state
    from gan_codes_tpu.train.step import make_train_step

    lane = ({"lane_pad": lane_pad, "lane_pad_min_ch": lane_pad_min_ch}
            if lane_pad else {})
    gen_over = dict(lane) if g_lane_pad else {}
    if image_pad:
        gen_over["image_pad"] = image_pad
    cfg = GANConfig.for_image_size(
        image_size, batch_size=batch, compute_dtype="bfloat16",
        discriminator_overrides=lane or None,
        generator_overrides=gen_over or None,
        image_pad=image_pad)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, gp_compute_dtype="bfloat16"))
    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k: create_train_state(k, cfg))(key)
    te = init_text_encoder(key, cfg.text_encoder)
    step_fn = make_train_step(cfg)
    images = jax.random.normal(key, (batch, image_size, image_size, 3))
    caps = jax.random.randint(key, (batch, cfg.text_encoder.max_len), 1,
                              cfg.text_encoder.vocab_size)
    lens = jnp.full((batch,), cfg.text_encoder.max_len, jnp.int32)

    def run_n(state, te, images, caps, lens):
        def body(s, _):
            s2, m = step_fn(s, te, images, caps, lens)
            return s2, m["g_loss"]
        return jax.lax.scan(body, state, None, length=iters)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}
            if vmem_kib else None)
    f = jax.jit(run_n, donate_argnums=(0,), compiler_options=opts)
    args = (state, te, images, caps, lens)
    return f, args


CONV_RE = re.compile(
    r"convolution\(.*?\)", re.S)
SHAPE_RE = re.compile(r"(bf16|f32)\[([0-9,]+)\]")


def parse_hlo_fusions(hlo_text: str):
    """fusion name -> {'convs': [(lhs_shape, rhs_shape, out_shape)],
    'meta': set of source op_name paths} from optimized HLO."""
    fusions = {}
    # computation blocks: "%fused_computation.N (param...) -> ... {" ... "}"
    # fusion instr: "%fusion.N = ... fusion(...), kind=..., calls=%fused_computation.N"
    comp_bodies = {}
    cur = None
    for line in hlo_text.splitlines():
        if ("{" in line and "->" in line and not line.strip().startswith("ROOT")
                and "=" not in line.split("{")[0]):
            name = line.strip().split()[0].lstrip("%")
            cur = name
            comp_bodies[cur] = []
            continue
        if cur is not None:
            if line.strip() == "}" or line.strip().startswith("}"):
                cur = None
            else:
                comp_bodies[cur].append(line)
    # fusion instruction -> computation it calls
    call_re = re.compile(
        r"%?(fusion[0-9.]*[A-Za-z0-9_.\-]*)\s*=.*?calls=%?([A-Za-z0-9_.\-]+)")
    for m in call_re.finditer(hlo_text):
        fname, comp = m.group(1), m.group(2)
        body = comp_bodies.get(comp, [])
        convs, metas = [], set()
        for line in body:
            if "convolution(" in line or " convolution" in line:
                shapes = SHAPE_RE.findall(line.split("convolution")[0])
                in_shapes = SHAPE_RE.findall(
                    line.split("convolution", 1)[1])
                convs.append((shapes, in_shapes[:2]))
            mm = re.search(r'op_name="([^"]+)"', line)
            if mm:
                metas.add(mm.group(1))
        fusions[fname] = {"convs": convs, "meta": metas}
    return fusions


def conv_flops(out_shape, rhs_shape):
    """2 * prod(out) * (kh*kw*cin) for NHWC/HWIO."""
    try:
        out = [int(v) for v in out_shape.split(",")]
        rhs = [int(v) for v in rhs_shape.split(",")]
        if len(rhs) == 4:
            kh, kw, cin, _ = rhs
            import math
            return 2 * math.prod(out) * kh * kw * cin
    except Exception:
        pass
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--lane-pad", type=int, default=0,
                    help="D MXU lane widening (DiscriminatorConfig.lane_pad)")
    ap.add_argument("--lane-pad-min-ch", type=int, default=0)
    ap.add_argument("--g-lane-pad", action="store_true",
                    help="apply the same lane widening to the generator")
    ap.add_argument("--vmem-kib", type=int, default=None,
                    help="xla_tpu_scoped_vmem_limit_kib compiler hint")
    ap.add_argument("--image-pad", type=int, default=0,
                    help="TrainConfig.image_pad + GeneratorConfig.image_pad")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "trace_r3"))
    a = ap.parse_args()

    import jax
    import numpy as np

    bs_kw = dict(lane_pad=a.lane_pad, lane_pad_min_ch=a.lane_pad_min_ch,
                 g_lane_pad=a.g_lane_pad, vmem_kib=a.vmem_kib,
                 image_pad=a.image_pad)
    f, args = build_step(a.batch, a.iters, a.image_size, **bs_kw)

    print("compiling + warmup...", flush=True)
    lowered = f.lower(*args)
    compiled = lowered.compile()
    hlo_text = ""
    try:
        hlo_text = compiled.as_text()
    except Exception as e:
        print(f"(optimized HLO unavailable through this backend: {e})")

    # fresh args each call: state was donated
    _, args2 = build_step(a.batch, a.iters, a.image_size, **bs_kw)
    state, losses = f(*args2)
    np.asarray(losses)  # warmup sync (relay rule: value fetch)

    os.makedirs(a.out, exist_ok=True)
    trace_dir = os.path.join(a.out, "raw_trace")
    _, args3 = build_step(a.batch, a.iters, a.image_size, **bs_kw)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        state, losses = f(*args3)
        lh = np.asarray(losses)
    wall = time.perf_counter() - t0
    assert np.isfinite(lh).all()
    img_s = a.batch * a.iters / wall
    print(f"traced dispatch: {wall*1e3:.1f} ms for {a.iters} steps "
          f"({img_s:.1f} img/s incl. trace overhead)", flush=True)

    # ---- parse the chrome trace: device lane op durations ----
    tpath = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(tpath) as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    per_op = {}
    dev_busy = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))  # us
            rec = per_op.setdefault(name, {"count": 0, "total_us": 0.0})
            rec["count"] += 1
            rec["total_us"] += dur
            dev_busy += dur

    fusions = parse_hlo_fusions(hlo_text) if hlo_text else {}

    rows = []
    for name, rec in per_op.items():
        base = name.split("/")[-1]
        info = fusions.get(base) or fusions.get(base.split(".")[0]) or {}
        convs = info.get("convs", [])
        flops = 0
        conv_desc = []
        for out_side, in_side in convs:
            # out shape = the first shape on the assignment line;
            # rhs (kernel) = second input shape
            if out_side and in_side and len(in_side) >= 2:
                flops += conv_flops(out_side[0][1], in_side[1][1])
                conv_desc.append(f"{in_side[0][1]}*{in_side[1][1]}"
                                 f"->{out_side[0][1]}")
        tf_s = (flops * rec["count"] / (rec["total_us"] * 1e-6) / 1e12
                if flops and rec["total_us"] else None)
        rows.append({
            "op": name, "count": rec["count"],
            "total_us": round(rec["total_us"], 1),
            "share_pct": round(100 * rec["total_us"] / dev_busy, 2),
            "conv_shapes": conv_desc or None,
            "achieved_tflops": round(tf_s, 1) if tf_s else None,
            "meta": sorted(info.get("meta", []))[:3] or None,
        })
    rows.sort(key=lambda r: -r["total_us"])

    if hlo_text:
        with open(os.path.join(a.out, "step_hlo.txt"), "w") as fh:
            fh.write(hlo_text)
    shutil.copy(tpath, os.path.join(a.out, "trace.json.gz"))
    analysis = {
        "operating_point": {"batch": a.batch, "image_size": a.image_size,
                            "dtype": "bfloat16", "gp_dtype": "bfloat16",
                            "iters_traced": a.iters,
                            "lane_pad": a.lane_pad,
                            "lane_pad_min_ch": a.lane_pad_min_ch,
                            "g_lane_pad": a.g_lane_pad,
                            "vmem_kib": a.vmem_kib,
                            "image_pad": a.image_pad},
        "wall_ms_incl_trace": round(wall * 1e3, 1),
        "device_busy_ms": round(dev_busy / 1e3, 1),
        "images_per_sec_incl_trace": round(img_s, 1),
        "n_device_ops": len(rows),
        "ops": rows,
    }
    with open(os.path.join(a.out, "ANALYSIS.json"), "w") as fh:
        json.dump(analysis, fh, indent=1)

    print(f"\ndevice busy: {dev_busy/1e3:.1f} ms over {a.iters} steps "
          f"({dev_busy/1e3/a.iters:.1f} ms/step)")
    print(f"{'op':<40}{'n':>4}{'total_ms':>10}{'share%':>8}{'TF/s':>8}")
    for r in rows[:25]:
        print(f"{r['op'][:39]:<40}{r['count']:>4}"
              f"{r['total_us']/1e3:>10.2f}{r['share_pct']:>8.2f}"
              f"{(r['achieved_tflops'] or 0):>8.1f}")
    print(f"\nartifacts: {a.out}/ (trace.json.gz, step_hlo.txt, "
          "ANALYSIS.json)")


if __name__ == "__main__":
    main()
