"""Per-phase on-chip timing for the 3-phase train step.

SUPERSEDED for phase totals by tools/step_ablate.py: isolated one-phase scan
programs through the TPU relay proved untrustworthy (this tool put G fwd+bwd
at 220ms where full-step ablation and two other probes measured ~76ms — see
PERF.md "Measurement methodology"). Use step_ablate.py for phase costs;
keep this tool only for quick relative comparisons within one probe shape.

Times each phase of the step (`train/step.py`) as its OWN scan-rolled jitted
program on the real chip, plus isolated G/D forward/backward probes. Same
single-dispatch methodology as bench.py (per-dispatch timing through the TPU
relay is wrong by ~50x; one lax.scan dispatch + block_until_ready is
accurate).

Two harness rules learned the hard way:
  * every probe's compute must depend on the scan CARRY, or XLA's while-loop
    invariant code motion hoists the body out and the probe measures nothing;
  * arrays must be passed as jit ARGUMENTS, not closure captures — captured
    constants are embedded in the compile payload (a 256MB literal overflows
    the TPU relay's request limit with HTTP 413).

Usage:  python tools/phase_bench.py [--dtype bfloat16] [--batch 64]
                                    [--gp-dtype float32] [--iters 10]
Prints one line per probe: name, ms/iter, img/s for that phase alone.
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from gan_codes_tpu.config import GANConfig
from gan_codes_tpu.models.discriminator import (discriminator_embeds,
                                                discriminator_logits)
from gan_codes_tpu.models.generator import generator_apply
from gan_codes_tpu.models.text_encoder import init_text_encoder, text_encoder_apply
from gan_codes_tpu.train import losses
from gan_codes_tpu.train.state import create_train_state, make_optimizers


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def _fetch(tree) -> float:
    """Value-fetch sync: through the TPU relay block_until_ready can return
    before execution completes; only fetching values reliably drains."""
    import numpy as np
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def timed_scan(fn, carry, inp, iters, name, batch):
    """Compile fn rolled `iters` times into one program; time the 2nd call,
    ending the timed window with a value fetch (see _fetch)."""
    @jax.jit
    def run(c, inp):
        return jax.lax.scan(lambda c, _: fn(c, inp), c, None, length=iters)

    _fetch(run(carry, inp))     # compile + exec + drain
    # distinct inputs for the timed call: identical repeated requests have
    # been observed to return suspiciously instantly through the relay
    carry2 = jax.tree.map(
        lambda p: p * (1 + 1e-9) if jnp.issubdtype(p.dtype, jnp.floating)
        else p, carry)
    t0 = time.perf_counter()
    _fetch(run(carry2, inp))
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    print(f"{name:28s} {ms:8.2f} ms/iter   {batch / (dt / iters):9.1f} img/s",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gp-dtype", default="float32")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--g-variants", action="store_true",
                    help="also time G fwd+bwd with remat / pallas backward")
    a = ap.parse_args()

    cfg = GANConfig.for_image_size(a.image_size, batch_size=a.batch,
                                   compute_dtype=a.dtype)
    if a.gp_dtype != "float32":
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, gp_compute_dtype=a.gp_dtype))
    gen_cfg, te_cfg, loss_cfg = cfg.generator, cfg.text_encoder, cfg.loss
    cdtype = cfg.train.compute_jnp_dtype
    gp_dtype = (jnp.bfloat16 if loss_cfg.gp_compute_dtype == "bfloat16"
                else jnp.float32)
    b = a.batch

    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k: create_train_state(k, cfg))(key)
    te_params = init_text_encoder(key, te_cfg)
    g_tx, d_tx = make_optimizers(cfg)

    images = jax.random.normal(key, (b, a.image_size, a.image_size, 3))
    captions = jax.random.randint(key, (b, te_cfg.max_len), 1,
                                  te_cfg.vocab_size)
    cap_lens = jnp.full((b,), te_cfg.max_len, jnp.int32)
    noise = jax.random.normal(key, (b, gen_cfg.latent_dim))
    sents = jax.jit(text_encoder_apply, static_argnums=1)(
        te_params, te_cfg, captions, cap_lens)
    fake = jax.jit(
        lambda gp, nz, s: generator_apply(_cast(gp, cdtype), gen_cfg,
                                          nz.astype(cdtype), s.astype(cdtype))
    )(state.g_params, noise, sents)
    jax.block_until_ready(fake)

    inp = dict(
        images=images, images_c=images.astype(cdtype), captions=captions,
        cap_lens=cap_lens, noise=noise, sents=sents,
        sents_c=sents.astype(cdtype), fake=fake,
        both=jnp.concatenate([images.astype(cdtype), fake], axis=0),
        te_params=te_params, g_params=state.g_params,
        d_params=state.d_params,
        d_params_c=_cast(state.d_params, cdtype),
    )

    print(f"== phase_bench {a.dtype} bs{b} gp={a.gp_dtype} "
          f"{a.image_size}px iters={a.iters} on {jax.devices()[0]} ==",
          flush=True)

    def nudge(params, scalar):
        """Per-iter param perturbation: keeps the scan body loop-dependent
        with a BIG carry at negligible cost. The scalar MUST consume the
        probe's FULL output (jnp.mean) — a single-element slice lets XLA
        slice-propagate backwards and dead-code-eliminate the computation
        under test (root-caused: a 24x-FLOP-range conv probe timed flat)."""
        return jax.tree.map(lambda p: p * (1 + scalar * 1e-12), params)

    # --- text encoder fwd ---
    def te_fwd(tp, i):
        s = text_encoder_apply(tp, te_cfg, i["captions"], i["cap_lens"])
        return nudge(tp, jnp.mean(s).astype(jnp.float32)), None
    timed_scan(te_fwd, te_params, inp, a.iters, "text_encoder fwd", b)

    # --- G forward alone ---
    def g_fwd(gp, i):
        y = generator_apply(_cast(gp, cdtype), gen_cfg,
                            i["noise"].astype(cdtype), i["sents_c"])
        return nudge(gp, jnp.mean(y).astype(jnp.float32)), None
    timed_scan(g_fwd, state.g_params, inp, a.iters, "G fwd", b)

    # --- D embeds fwd at B and 2B ---
    def d_fwd_b(dp, i):
        e = discriminator_embeds(_cast(dp, cdtype), i["images_c"])
        return nudge(dp, jnp.mean(e).astype(jnp.float32)), None
    timed_scan(d_fwd_b, state.d_params, inp, a.iters, "D embeds fwd [B]", b)

    def d_fwd_2b(dp, i):
        e = discriminator_embeds(_cast(dp, cdtype), i["both"])
        return nudge(dp, jnp.mean(e).astype(jnp.float32)), None
    timed_scan(d_fwd_2b, state.d_params, inp, a.iters,
               "D embeds fwd [2B]", 2 * b)

    # --- Phase 1: D hinge (fwd+bwd+adam) ---
    def d_hinge(carry, i):
        d_params, d_opt = carry
        def loss_fn(dp):
            return losses.d_hinge_loss(
                discriminator_embeds, discriminator_logits, _cast(dp, cdtype),
                i["images_c"], i["fake"], i["sents_c"]).astype(jnp.float32)
        dl, grads = jax.value_and_grad(loss_fn)(d_params)
        upd, d_opt = d_tx.update(grads, d_opt, d_params)
        return (optax.apply_updates(d_params, upd), d_opt), dl
    timed_scan(d_hinge, (state.d_params, state.d_opt_state), inp, a.iters,
               "phase1 D-hinge", b)

    # --- Phase 2: MA-GP (double backward + adam) ---
    def gp_phase(carry, i):
        d_params, d_opt = carry
        def loss_fn(dp):
            return losses.ma_gradient_penalty(
                discriminator_embeds, discriminator_logits,
                _cast(dp, gp_dtype), i["images"].astype(gp_dtype),
                i["sents"].astype(gp_dtype), loss_cfg)
        gl, grads = jax.value_and_grad(loss_fn)(d_params)
        upd, d_opt = d_tx.update(grads, d_opt, d_params)
        return (optax.apply_updates(d_params, upd), d_opt), gl
    timed_scan(gp_phase, (state.d_params, state.d_opt_state), inp, a.iters,
               "phase2 MA-GP", b)

    # --- Phase 3 sub-probes ---
    # G fwd+bwd across backward-path variants: remat (recompute modulation
    # chains, keep conv outputs) and the Pallas fused-affine custom VJP.
    g_variants = [("", gen_cfg)]
    if a.g_variants:
        g_variants += [
            (" remat", dataclasses.replace(gen_cfg, remat_blocks=True)),
            (" pallas", dataclasses.replace(gen_cfg, use_pallas=True)),
            (" remat+pallas", dataclasses.replace(gen_cfg, remat_blocks=True,
                                                  use_pallas=True)),
        ]
    for tag, gcfg in g_variants:
        def g_fwd_bwd(carry, i, gcfg=gcfg):
            g_params, g_opt = carry
            fake_l, g_vjp = jax.vjp(
                lambda gp: generator_apply(_cast(gp, cdtype), gcfg,
                                           i["noise"].astype(cdtype),
                                           i["sents_c"]),
                g_params)
            (grads,) = g_vjp(jnp.ones_like(fake_l))
            upd, g_opt = g_tx.update(grads, g_opt, g_params)
            return (optax.apply_updates(g_params, upd), g_opt), None
        timed_scan(g_fwd_bwd, (state.g_params, state.g_opt_state), inp,
                   a.iters, f"  G fwd+bwd+adam{tag}", b)

    def d_bwd_to_input(dp, i):
        def loss_from_fake(f):
            return losses.g_hinge_loss(
                discriminator_embeds, discriminator_logits, _cast(dp, cdtype),
                f, i["sents_c"]).astype(jnp.float32)
        gl, d_fake = jax.value_and_grad(loss_from_fake)(i["fake"])
        return nudge(dp, jnp.mean(d_fake).astype(jnp.float32)), None
    timed_scan(d_bwd_to_input, state.d_params, inp, a.iters,
               "  D fwd+bwd-to-input", b)

    # --- Phase 3: G step (G fwd via vjp + D fwd + bwd-to-fake + G bwd + adam) ---
    def g_phase(carry, i):
        g_params, g_opt = carry
        fake_l, g_vjp = jax.vjp(
            lambda gp: generator_apply(_cast(gp, cdtype), gen_cfg,
                                       i["noise"].astype(cdtype),
                                       i["sents_c"]),
            g_params)
        def loss_from_fake(f):
            return losses.g_hinge_loss(
                discriminator_embeds, discriminator_logits, i["d_params_c"],
                f, i["sents_c"]).astype(jnp.float32)
        gl, d_fake = jax.value_and_grad(loss_from_fake)(fake_l)
        (grads,) = g_vjp(d_fake.astype(fake_l.dtype))
        upd, g_opt = g_tx.update(grads, g_opt, g_params)
        return (optax.apply_updates(g_params, upd), g_opt), gl
    timed_scan(g_phase, (state.g_params, state.g_opt_state), inp, a.iters,
               "phase3 G-step (incl G fwd)", b)


if __name__ == "__main__":
    main()
