"""A/B the D shortcut's avg-pool implementations on the full train step.

The round-3 device trace (artifacts/trace_r3/WALL.md) put 18.3 ms/step
(8%) on `nn.avg_pool2d` (reduce_window) — all of it the D residual-block
shortcut (`ops/blocks.py:166`, the pool-first commute). Three candidates,
all exact math:

  A. baseline: lax.reduce_window (current implementation)
  B. reshape-mean: x.reshape(N,H/2,2,W/2,2,C).mean((2,4)) — same values
     (4-term sum reassociated), but XLA fuses reshape+reduce more freely
     than reduce-window.
  C. fold: for in!=out blocks, avg_pool2x2 -> conv1x1 composes into ONE
     2x2 stride-2 conv whose kernel is the 1x1 kernel replicated / 4
     (composition of two linear maps; bias unchanged). Never materializes
     the pooled intermediate. 4x the shortcut MACs, ~0.5x the HBM traffic.

Timing per CLAUDE.md relay rules (bench.bench_step: one scan-rolled
dispatch, value-fetch sync). Usage: python tools/pool_ab.py [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp


def reshape_mean_pool(x, window: int = 2):
    n, h, w, c = x.shape
    y = x.reshape(n, h // window, window, w // window, window, c)
    return jnp.mean(y, axis=(2, 4))


def make_folded_res_block_d(nn, baseline_pool):
    def res_block_d_folded(params, x):
        h = nn.conv2d(params["conv_1"], x, stride=2, padding=1)
        h = nn.leaky_relu(h)
        h = nn.conv2d(params["conv_2"], h, stride=1, padding=1)
        h = nn.leaky_relu(h)
        if "shortcut_conv" in params:
            w1 = params["shortcut_conv"]["w"]  # [1,1,in,out]
            w2 = jnp.broadcast_to(w1 / 4.0, (2, 2) + w1.shape[2:])
            fold = {"w": w2}
            if "b" in params["shortcut_conv"]:
                fold["b"] = params["shortcut_conv"]["b"]
            shortcut = nn.conv2d(fold, x, stride=2, padding=0)
        else:
            shortcut = baseline_pool(x, 2)
        return shortcut + params["gamma"].astype(x.dtype) * h
    return res_block_d_folded


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variants", default="A,B,C")
    a = ap.parse_args()

    import bench
    from gan_codes_tpu.ops import blocks, nn

    base_pool = nn.avg_pool2d
    base_block = blocks.res_block_d

    def run(label):
        ips = bench.bench_step("bfloat16", a.batch, iters=a.iters,
                               gp_dtype="bfloat16", xla_vmem_kib=65536)
        print(f"[pool_ab] {label}: {ips:.2f} img/s", flush=True)
        return ips

    results = {}
    wanted = set(a.variants.split(","))
    if "A" in wanted:
        results["A_reduce_window"] = run("A baseline reduce_window")
    if "B" in wanted:
        nn.avg_pool2d = reshape_mean_pool
        try:
            results["B_reshape_mean"] = run("B reshape-mean")
        finally:
            nn.avg_pool2d = base_pool
    if "C" in wanted:
        blocks.res_block_d = make_folded_res_block_d(nn, base_pool)
        try:
            results["C_folded_2x2s2"] = run("C folded 2x2 stride-2")
        finally:
            blocks.res_block_d = base_block
    print(results)


if __name__ == "__main__":
    main()
