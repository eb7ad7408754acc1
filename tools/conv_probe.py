"""Per-conv-shape fwd/dX/dW timing for the generator ladder.

The G backward runs at ~33 TF/s vs the forward's ~107 TF/s (tools/
phase_bench.py, bf16 bs128 256px). This probe times each conv shape in the
ladder separately — forward, grad-to-input (dX), grad-to-weights (dW) — to
locate the inefficiency before building anything. Same relay timing rules as
bench.py: one lax.scan dispatch, carry consumes the full output, arrays as
jit arguments, value-fetch sync.

Usage: python tools/conv_probe.py [--batch 128] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=DIMNUMS,
                                    preferred_element_type=x.dtype)


def timed(fn, args, iters, name, flops):
    @jax.jit
    def run(*a):
        def body(c, _):
            # nudge the FIRST arg by the carry so the body is loop-DEPENDENT
            # (a loop-invariant body gets hoisted out by LICM and the probe
            # measures one execution + the dispatch floor), and mean-consume
            # the output so XLA can't DCE or slice-propagate it away.
            a0 = a[0] * (1 + c * 1e-12).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            return c + jnp.mean(out).astype(jnp.float32), None
        return lax.scan(body, jnp.float32(0.0), None, length=iters)

    float(np.asarray(run(*args)[0]))  # compile + drain (value fetch)
    t0 = time.perf_counter()
    float(np.asarray(run(*args)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.3f} ms   {flops / dt / 1e12:7.1f} TF/s",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()
    dt = jnp.dtype(a.dtype)
    b = a.batch
    key = jax.random.PRNGKey(0)

    # (H, Cin, Cout) for every 3x3 conv in the 256px G ladder (config.py
    # block_channels), spatial size at which the block runs
    shapes = [
        (4, 256, 256), (8, 256, 256), (16, 256, 256), (32, 256, 256),
        (64, 256, 128), (64, 128, 128),
        (128, 128, 64), (128, 64, 64),
        (256, 64, 32), (256, 32, 32),
    ]
    print(f"== conv_probe {a.dtype} bs{b} on {jax.devices()[0]} ==", flush=True)
    totals = {"fwd": 0.0, "dX": 0.0, "dW": 0.0}
    for h, cin, cout in shapes:
        x = jax.random.normal(key, (b, h, h, cin), dt)
        w = jax.random.normal(key, (3, 3, cin, cout), dt) * 0.05
        dy = jax.random.normal(key, (b, h, h, cout), dt)
        flops = 2.0 * b * h * h * 9 * cin * cout

        totals["fwd"] += timed(lambda x, w: conv(x, w), (x, w), a.iters,
                               f"{h}x{h} {cin}->{cout} fwd", flops)

        def dx_fn(dy, w, x=x):
            _, vjp = jax.vjp(lambda xx: conv(xx, w), x)
            return vjp(dy)[0]
        totals["dX"] += timed(dx_fn, (dy, w), a.iters,
                              f"{h}x{h} {cin}->{cout} dX", flops)

        def dw_fn(dy, x, w=w):
            _, vjp = jax.vjp(lambda ww: conv(x, ww), w)
            return vjp(dy)[0]
        totals["dW"] += timed(dw_fn, (dy, x), a.iters,
                              f"{h}x{h} {cin}->{cout} dW", flops)
    print({k: f"{v * 1e3:.1f} ms" for k, v in totals.items()}, flush=True)


if __name__ == "__main__":
    main()
