"""A/B probes for exact-math rewrites of the discriminator's hot block.

dblock_probe localized the D wall: block1 (256^2, 32->64) fwd+bwd 30.4ms at
52.6 TF/s, with the stride-2 conv1 at ~21 TF/s by subtraction. Two
candidate rewrites, both mathematically identical to the reference ops:

A. shortcut commute: avg_pool(conv1x1(x)) == conv1x1(avg_pool(x)) (linear
   ops commute with the mean) — 4x fewer shortcut FLOPs and no full-res
   Cout intermediate.
B. space-to-depth: a 3x3 stride-2 conv == a 2x2 stride-1 conv over the
   space-to-depth (2x2 cells -> 4C channels) input, with the 3x3 kernel
   zero-embedded into 4x4 then rearranged — denser MXU work (K 9C -> 16C
   with 7/16 zeros, but stride-1 and lane-aligned).

Each probe checks numerics (allclose vs the reference composition) then
times fwd and fwd+bwd at the hinge-phase batch.

Usage: python tools/d_opt_probe.py [--batch 256] [--dtype bfloat16]
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


def timed(fn, args, iters, name, flops):
    @jax.jit
    def run(*a):
        def body(c, _):
            a0 = jax.tree.map(
                lambda t: (t * (1 + c * 1e-12).astype(t.dtype)
                           if jnp.issubdtype(t.dtype, jnp.floating) else t),
                a[0])
            out = fn(a0, *a[1:])
            return c + out.astype(jnp.float32), None
        return lax.scan(body, jnp.float32(0.0), None, length=iters)

    float(np.asarray(run(*args)[0]))
    t0 = time.perf_counter()
    float(np.asarray(run(*args)[0]))
    dt = (time.perf_counter() - t0) / iters
    tfs = flops / dt / 1e12 if flops else 0.0
    print(f"{name:40s} {dt * 1e3:8.3f} ms   {tfs:7.1f} TF/s", flush=True)
    return dt


def conv_s2(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DIMNUMS,
                                    preferred_element_type=x.dtype)


def space_to_depth(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def s2d_weights(w):
    """[3,3,Cin,Cout] -> [2,2,4*Cin,Cout] for the s2d formulation.

    Zero-embed the 3x3 taps into a 4x4 grid at offset (1,1) (so original tap
    (dy,dx), dy,dx in -1..1, lands at 4x4 position (dy+1, dx+1); the conv
    then starts from cell (i-1, j-1), i.e. SAME padding (1,0) on the cell
    grid), then fold each 2x2 sub-block of the 4x4 into the channel dim in
    the same (row-major sub-pixel, then channel) order space_to_depth uses.
    """
    cin, cout = w.shape[2], w.shape[3]
    w4 = jnp.zeros((4, 4, cin, cout), w.dtype).at[1:4, 1:4].set(w)
    w4 = w4.reshape(2, 2, 2, 2, cin, cout)          # [cy, sy, cx, sx, ci, co]
    w4 = jnp.transpose(w4, (0, 2, 1, 3, 4, 5))      # [cy, cx, sy, sx, ci, co]
    return w4.reshape(2, 2, 4 * cin, cout)


def conv_s2d(x, w):
    xs = space_to_depth(x)
    ws = s2d_weights(w)
    return lax.conv_general_dilated(xs, ws, (1, 1), [(1, 0), (1, 0)],
                                    dimension_numbers=DIMNUMS,
                                    preferred_element_type=x.dtype)


def avg_pool(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def conv1x1(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), [(0, 0), (0, 0)],
                                    dimension_numbers=DIMNUMS,
                                    preferred_element_type=x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    dt = jnp.dtype(a.dtype)
    b = a.batch
    key = jax.random.PRNGKey(0)

    print(f"== d_opt_probe {a.dtype} bs{b} on {jax.devices()[0]} ==",
          flush=True)

    for h, cin, cout in [(256, 32, 64), (128, 64, 128), (64, 128, 256),
                         (32, 256, 512)]:
        x = jax.random.normal(key, (b, h, h, cin), dt)
        w = (jax.random.normal(key, (3, 3, cin, cout), dt) * 0.05)

        ref = conv_s2(x, w)
        got = conv_s2d(x, w)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        # bf16 reassociation roundoff; exactness is proven in fp32 (CPU check)
        assert err < 0.1, f"s2d mismatch {err} at {h}"
        fl = 2.0 * b * (h // 2) ** 2 * 9 * cin * cout
        fl_s2d = fl * 16 / 9

        timed(lambda x, w: jnp.mean(conv_s2(x, w)), (x, w), a.iters,
              f"{h}^2 {cin}->{cout} s2 conv fwd", fl)
        timed(lambda x, w: jnp.mean(conv_s2d(x, w)), (x, w), a.iters,
              f"{h}^2 {cin}->{cout} s2d conv fwd", fl_s2d)

        def fb(form):
            def f(w, x):
                y, vjp = jax.vjp(lambda ww, xx: form(xx, ww), w, x)
                gw, gx = vjp(jnp.ones_like(y))
                return (jnp.mean(gx) + jnp.mean(gw)).astype(jnp.float32)
            return f
        timed(fb(conv_s2), (w, x), a.iters,
              f"{h}^2 {cin}->{cout} s2 conv fwd+bwd", 3 * fl)
        timed(fb(conv_s2d), (w, x), a.iters,
              f"{h}^2 {cin}->{cout} s2d conv fwd+bwd", 3 * fl_s2d)

    # shortcut commute at block1's shape
    h, cin, cout = 256, 32, 64
    x = jax.random.normal(key, (b, h, h, cin), dt)
    w1 = jax.random.normal(key, (1, 1, cin, cout), dt) * 0.1

    ref = avg_pool(conv1x1(x, w1))
    got = conv1x1(avg_pool(x), w1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"shortcut commute max |diff| = {err:.2e}", flush=True)
    fl = 2.0 * b * h * h * cin * cout

    timed(lambda x, w: jnp.mean(avg_pool(conv1x1(x, w))), (x, w1), a.iters,
          "shortcut conv@full+pool fwd", fl)
    timed(lambda x, w: jnp.mean(conv1x1(avg_pool(x), w)), (x, w1), a.iters,
          "shortcut pool+conv@half fwd", fl / 4)

    def fb2(form):
        def f(w, x):
            y, vjp = jax.vjp(lambda ww, xx: form(xx, ww), w, x)
            gw, gx = vjp(jnp.ones_like(y))
            return (jnp.mean(gx) + jnp.mean(gw)).astype(jnp.float32)
        return f
    timed(fb2(lambda x, w: avg_pool(conv1x1(x, w))), (w1, x), a.iters,
          "shortcut conv@full+pool fwd+bwd", 3 * fl)
    timed(fb2(lambda x, w: conv1x1(avg_pool(x), w)), (w1, x), a.iters,
          "shortcut pool+conv@half fwd+bwd", 3 * fl / 4)


if __name__ == "__main__":
    main()
