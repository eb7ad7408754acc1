"""A/B the D-shortcut avg-pool formulations on the full train step.

The round-3 device trace (artifacts/trace_r3/WALL.md) put 18.3 ms/step
(8%) on `nn.avg_pool2d` (reduce_window) — all of it the D residual-block
shortcut. Three candidates, all exact math:

  A. unfolded baseline: pool-first commute, avg_pool2x2 -> conv1x1
     (the round-2 implementation; monkeypatched back in).
  B. reshape-mean: x.reshape(N,H/2,2,W/2,2,C).mean((2,4)) — same values
     (4-term sum reassociated), but a different XLA lowering than
     reduce-window.
  C. fold: avg_pool2x2 -> conv1x1 composes into ONE 2x2 stride-2 conv
     whose kernel is the 1x1 kernel replicated / 4 (composition of two
     linear maps; bias unchanged). Never materializes the pooled
     intermediate. 4x the shortcut MACs, ~0.5x the HBM traffic.

Measured (v5e, bf16 bs128, 2026-08-17): A 555.0, B 509.0, C 578.4 img/s.
C is the in-tree implementation since `ops/blocks.py::res_block_d`
adopted the fold — variant C therefore runs the unpatched tree, and A/B
monkeypatch the old shortcut back in to stay meaningful baselines.

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


def make_unfolded_res_block_d(nn):
    """The round-2 shortcut: pool first, then the 1x1 conv (module-attr
    `nn.avg_pool2d` so variant B's pool patch takes effect through it)."""
    def res_block_d_unfolded(params, x):
        h = nn.conv2d(params["conv_1"], x, stride=2, padding=1)
        h = nn.leaky_relu(h)
        h = nn.conv2d(params["conv_2"], h, stride=1, padding=1)
        h = nn.leaky_relu(h)
        shortcut = nn.avg_pool2d(x, 2)
        if "shortcut_conv" in params:
            shortcut = nn.conv2d(params["shortcut_conv"], shortcut,
                                 stride=1, padding=0)
        return shortcut + params["gamma"].astype(x.dtype) * h
    return res_block_d_unfolded


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
    unfolded = make_unfolded_res_block_d(nn)
    if "A" in wanted:
        blocks.res_block_d = unfolded
        try:
            results["A_unfolded_reduce_window"] = run(
                "A unfolded pool->conv1x1 (reduce_window)")
        finally:
            blocks.res_block_d = base_block
    if "B" in wanted:
        blocks.res_block_d = unfolded
        nn.avg_pool2d = reshape_mean_pool
        try:
            results["B_unfolded_reshape_mean"] = run(
                "B unfolded pool->conv1x1 (reshape-mean)")
        finally:
            nn.avg_pool2d = base_pool
            blocks.res_block_d = base_block
    if "C" in wanted:
        results["C_folded_2x2s2"] = run("C folded 2x2 stride-2 (in-tree)")
    print(results)


if __name__ == "__main__":
    main()
