"""Decompose the full-G fwd+bwd cost: blocks sum to ~63ms (block_probe) but
the monolithic G fwd+bwd probe measures ~220ms at bf16 bs128. Time the full
generator fwd+bwd (no optimizer), +global-norm-clip, +adam, and at smaller
image sizes, to find the missing ~150ms.

Usage: python tools/gdecomp_probe.py [--batch 128] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from gan_codes_tpu.config import GANConfig
from gan_codes_tpu.models.generator import generator_apply, init_generator


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def timed(fn, args, iters, name):
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
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    b = a.batch
    key = jax.random.PRNGKey(0)

    for img in (256, 128):
        cfg = GANConfig.for_image_size(img, batch_size=b,
                                       compute_dtype=a.dtype)
        gen_cfg = cfg.generator
        cdtype = cfg.train.compute_jnp_dtype
        g_params = jax.jit(lambda k: init_generator(k, gen_cfg))(key)
        noise = jax.random.normal(key, (b, gen_cfg.latent_dim), cdtype)
        sents = jax.random.normal(key, (b, gen_cfg.sentence_dim), cdtype)

        def fwd_only(gp, nz, s):
            y = generator_apply(_cast(gp, cdtype), gen_cfg, nz, s)
            return jnp.mean(y).astype(jnp.float32)
        timed(fwd_only, (g_params, noise, sents), a.iters,
              f"G{img} fwd")

        def fwd_bwd(gp, nz, s):
            def loss(p):
                return jnp.mean(
                    generator_apply(_cast(p, cdtype), gen_cfg, nz, s)
                ).astype(jnp.float32)
            l, grads = jax.value_and_grad(loss)(gp)
            acc = l
            for t in jax.tree.leaves(grads):
                acc = acc + jnp.mean(t.astype(jnp.float32))
            return acc
        timed(fwd_bwd, (g_params, noise, sents), a.iters,
              f"G{img} fwd+bwd (no opt)")

        def fwd_bwd_ones(gp, nz, s):
            y, vjp = jax.vjp(
                lambda p: generator_apply(_cast(p, cdtype), gen_cfg, nz, s),
                gp)
            (grads,) = vjp(jnp.ones_like(y))
            acc = jnp.mean(y).astype(jnp.float32)
            for t in jax.tree.leaves(grads):
                acc = acc + jnp.mean(t.astype(jnp.float32))
            return acc
        timed(fwd_bwd_ones, (g_params, noise, sents), a.iters,
              f"G{img} fwd+bwd (ones cotangent)")

        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adam(1e-4, b1=0.0, b2=0.9))
        opt0 = jax.jit(tx.init)(g_params)

        def fwd_bwd_adam(carry, nz, s):
            gp, opt = carry
            def loss(p):
                return jnp.mean(
                    generator_apply(_cast(p, cdtype), gen_cfg, nz, s)
                ).astype(jnp.float32)
            l, grads = jax.value_and_grad(loss)(gp)
            upd, opt = tx.update(grads, opt, gp)
            gp = optax.apply_updates(gp, upd)
            return l + jnp.mean(jax.tree.leaves(gp)[0]).astype(jnp.float32)
        # carry-style: nudge applies to the (params, opt) tuple
        timed(fwd_bwd_adam, ((g_params, opt0), noise, sents), a.iters,
              f"G{img} fwd+bwd+clip+adam")


if __name__ == "__main__":
    main()
