"""Per-res-block fwd / fwd+bwd timing for the generator ladder.

Decomposes the G backward wall: tools/conv_probe.py showed the ladder's
convs cost ~90ms total (fwd+dX+dW, bf16 bs128) while G fwd+bwd measures
~220ms — this probe times each res_block_g's fwd and fwd+bwd so the
difference vs the block's conv-only cost isolates what the elementwise
modulation-chain backward (mask applies + per-(B,C) gain reductions) costs
per block.

Usage: python tools/block_probe.py [--batch 128] [--dtype bfloat16]
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

from gan_codes_tpu.ops import blocks


def timed(fn, args, iters, name, batch):
    @jax.jit
    def run(*a):
        def body(c, _):
            a0 = jax.tree.map(
                lambda t: (t * (1 + c * 1e-12).astype(t.dtype)
                           if jnp.issubdtype(t.dtype, jnp.floating) else t),
                a[0])
            out = fn(a0, *a[1:])
            return c + jnp.mean(out).astype(jnp.float32), None
        return lax.scan(body, jnp.float32(0.0), None, length=iters)

    float(np.asarray(run(*args)[0]))  # compile + drain
    t0 = time.perf_counter()
    float(np.asarray(run(*args)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sentence-dim", type=int, default=256)
    a = ap.parse_args()
    dt = jnp.dtype(a.dtype)
    b = a.batch
    key = jax.random.PRNGKey(0)

    # (H, Cin, Cout) for the 256px ladder (config.py block_channels)
    shapes = [(4, 256, 256), (8, 256, 256), (16, 256, 256), (32, 256, 256),
              (64, 256, 128), (128, 128, 64), (256, 64, 32)]
    print(f"== block_probe {a.dtype} bs{b} on {jax.devices()[0]} ==",
          flush=True)
    tot_f, tot_fb = 0.0, 0.0
    for h, cin, cout in shapes:
        kp, kx, ks = jax.random.split(jax.random.PRNGKey(h + cin), 3)
        params = jax.jit(
            lambda k: blocks.init_res_block_g(k, cin, cout, a.sentence_dim)
        )(kp)
        params = jax.tree.map(lambda t: t.astype(dt), params)
        x = jax.random.normal(kx, (b, h, h, cin), dt)
        sent = jax.random.normal(ks, (b, a.sentence_dim), dt)

        def fwd(x, params, sent):
            return blocks.res_block_g(params, x, sent)
        tot_f += timed(fwd, (x, params, sent), a.iters,
                       f"{h}x{h} {cin}->{cout} block fwd", b)

        def fwd_bwd(params, x, sent):
            y, vjp = jax.vjp(
                lambda p, xx: blocks.res_block_g(p, xx, sent), params, x)
            gp, gx = vjp(jnp.ones_like(y))
            return (sum(jnp.sum(t.astype(jnp.float32) ** 0)
                        for t in jax.tree.leaves(gp))
                    + jnp.mean(gx.astype(jnp.float32)))
        # consume all grads: mean over x-grad + a use of every param grad
        def fwd_bwd2(params, x, sent):
            y, vjp = jax.vjp(
                lambda p, xx: blocks.res_block_g(p, xx, sent), params, x)
            gp, gx = vjp(jnp.ones_like(y))
            acc = jnp.mean(gx.astype(jnp.float32))
            for t in jax.tree.leaves(gp):
                acc = acc + jnp.mean(t.astype(jnp.float32))
            return acc
        tot_fb += timed(fwd_bwd2, (params, x, sent), a.iters,
                        f"{h}x{h} {cin}->{cout} block fwd+bwd", b)
    print(f"totals: fwd {tot_f * 1e3:.1f} ms, fwd+bwd {tot_fb * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
