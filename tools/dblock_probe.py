"""Per-block fwd / fwd+bwd timing for the discriminator ladder.

Ablation (tools/step_ablate.py) shows the D-involving phases are 74% of the
step (bf16 bs128: hinge 102.9ms + GP 84.1ms + G-phase D-part 36.2ms) running
at 57-69 TF/s while G hits 116-128 TF/s. This probe times the stem and each
res_block_d to locate whether the waste is one pathological op (strided dX,
avg-pool, the 3-channel stem) or spread across the narrow-channel blocks.

Usage: python tools/dblock_probe.py [--batch 256] [--dtype bfloat16]
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

from gan_codes_tpu.ops import blocks, nn


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
    print(f"{name:36s} {dt * 1e3:8.3f} ms   {tfs:7.1f} TF/s", flush=True)
    return dt


def block_flops(b, h, cin, cout):
    """fwd FLOPs for res_block_d at input HxH: conv1 s2 + conv2 + shortcut."""
    out = h // 2
    f = 2.0 * b * out * out * 9 * cin * cout        # conv1 stride 2
    f += 2.0 * b * out * out * 9 * cout * cout      # conv2
    if cin != cout:
        f += 2.0 * b * h * h * cin * cout           # 1x1 shortcut (pre-pool)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)  # [2B] of the step
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    dt = jnp.dtype(a.dtype)
    b = a.batch
    key = jax.random.PRNGKey(0)

    print(f"== dblock_probe {a.dtype} bs{b} on {jax.devices()[0]} ==",
          flush=True)

    # stem: 3x3 3->32 at 256^2
    stem = jax.tree.map(lambda t: t.astype(dt),
                        nn.torch_conv_init(key, 3, 3, 3, 32, bias=True))
    x0 = jax.random.normal(key, (b, 256, 256, 3), dt)
    f_stem = 2.0 * b * 256 * 256 * 9 * 3 * 32
    timed(lambda x, p: jnp.mean(nn.conv2d(p, x, stride=1, padding=1)),
          (x0, stem), a.iters, "stem 3->32 @256 fwd", f_stem)

    def stem_fwd_bwd(p, x):
        y, vjp = jax.vjp(lambda pp, xx: nn.conv2d(pp, xx, 1, 1), p, x)
        gp, gx = vjp(jnp.ones_like(y))
        return (jnp.mean(gx) + sum(jnp.mean(t) for t in jax.tree.leaves(gp))
                ).astype(jnp.float32)
    timed(stem_fwd_bwd, (stem, x0), a.iters, "stem 3->32 @256 fwd+bwd",
          3 * f_stem)

    # D ladder: (input H, Cin, Cout)
    shapes = [(256, 32, 64), (128, 64, 128), (64, 128, 256), (32, 256, 512),
              (16, 512, 512), (8, 512, 512)]
    tot_f = tot_fb = 0.0
    for h, cin, cout in shapes:
        kp, kx = jax.random.split(jax.random.PRNGKey(h + cin))
        params = jax.tree.map(
            lambda t: t.astype(dt),
            jax.jit(lambda k: blocks.init_res_block_d(k, cin, cout))(kp))
        x = jax.random.normal(kx, (b, h, h, cin), dt)
        fl = block_flops(b, h, cin, cout)

        tot_f += timed(lambda x, p: jnp.mean(blocks.res_block_d(p, x)),
                       (x, params), a.iters,
                       f"{h}x{h} {cin}->{cout} fwd", fl)

        def fwd_bwd(p, x):
            y, vjp = jax.vjp(lambda pp, xx: blocks.res_block_d(pp, xx), p, x)
            gp, gx = vjp(jnp.ones_like(y))
            acc = jnp.mean(gx.astype(jnp.float32))
            for t in jax.tree.leaves(gp):
                acc = acc + jnp.mean(t.astype(jnp.float32))
            return acc
        tot_fb += timed(fwd_bwd, (params, x), a.iters,
                        f"{h}x{h} {cin}->{cout} fwd+bwd", 3 * fl)
    print(f"block totals: fwd {tot_f * 1e3:.1f} ms, fwd+bwd "
          f"{tot_fb * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
