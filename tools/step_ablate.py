"""Phase-cost measurement by ABLATION on the full train step.

tools/phase_bench.py (isolated per-phase programs) and tools/gdecomp_probe.py
(isolated G fwd+bwd) disagree by 3x on the G backward (220 vs 76 ms at bf16
bs128) — isolated-probe timing through the TPU relay has failure modes in
both directions. This tool uses the ONE harness validated against physics
(bench.py: donated carry so the timed call sees different inputs, value-fetch
sync, one lax.scan dispatch): it times the FULL 3-phase step with phases
selectively disabled and reads phase costs off the differences.

Variants:
  full        reference semantics (= bench.py headline)
  no_hinge    phase 1 skipped (D params flow straight to GP)
  no_gp       phase 2 skipped
  no_gphase   phase 3 skipped entirely (fake still computed for phase 1)
  no_gbwd     phase 3 computes the D-side loss/grad-to-fake but skips the
              G backward + update (isolates the G-VJP cost)

Usage: python tools/step_ablate.py [--batch 128] [--dtype bfloat16]
                                   [--gp-dtype bfloat16]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_codes_tpu.config import GANConfig
from gan_codes_tpu.ops import nn
from gan_codes_tpu.models.discriminator import (discriminator_embeds,
                                                discriminator_logits)
from gan_codes_tpu.models.generator import generator_apply
from gan_codes_tpu.models.text_encoder import (init_text_encoder,
                                               text_encoder_apply)
from gan_codes_tpu.train import losses
from gan_codes_tpu.train.state import create_train_state, make_optimizers


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_ablated_step(cfg: GANConfig, skip=()):
    """A copy of train/step.py's 3-phase structure with phases toggleable.
    Diagnostic only — no NaN guards / EMA / metrics plumbing."""
    gen_cfg, loss_cfg = cfg.generator, cfg.loss
    cdtype = cfg.train.compute_jnp_dtype
    gp_dtype = (jnp.bfloat16 if loss_cfg.gp_compute_dtype == "bfloat16"
                else jnp.float32)
    g_tx, d_tx = make_optimizers(cfg)
    # same wiring as train/step.py: D lane widening comes in through a
    # partial; G's comes through gen_cfg inside generator_apply
    d_embeds = (discriminator_embeds if not cfg.discriminator.lane_pad
                else functools.partial(
                    discriminator_embeds,
                    lane_pad=cfg.discriminator.lane_pad,
                    lane_pad_min_ch=cfg.discriminator.lane_pad_min_ch))
    # same padding rule as train/step.py: common width for all D inputs,
    # generator keeps its widened lanes so they stay consumed
    img_pad = max(cfg.train.image_pad, gen_cfg.image_pad)
    keep_pad = gen_cfg.image_pad > 0

    def _pad_img(x):
        return nn.pad_channels(x, img_pad)

    def step(state, sents, images):
        images = _pad_img(images)
        rng, k_noise = jax.random.split(state.rng)
        sents_c = sents.astype(cdtype)
        noise = jax.random.normal(k_noise,
                                  (images.shape[0], gen_cfg.latent_dim), cdtype)
        fake, g_vjp = jax.vjp(
            lambda gp: generator_apply(_cast(gp, cdtype), gen_cfg, noise,
                                       sents_c, keep_pad=keep_pad),
            state.g_params)

        d_params_1, d_opt_state = state.d_params, state.d_opt_state
        out = jnp.float32(0.0)
        if "hinge" not in skip:
            def d_loss_fn(dp):
                return losses.d_hinge_loss(
                    d_embeds, discriminator_logits,
                    _cast(dp, cdtype), images.astype(cdtype),
                    _pad_img(jax.lax.stop_gradient(fake)),
                    sents_c).astype(jnp.float32)
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            upd, d_opt_state = d_tx.update(d_grads, d_opt_state, state.d_params)
            d_params_1 = optax.apply_updates(state.d_params, upd)
            out = out + d_loss

        d_params_2 = d_params_1
        if "gp" not in skip:
            def gp_loss_fn(dp):
                return losses.ma_gradient_penalty(
                    d_embeds, discriminator_logits,
                    _cast(dp, gp_dtype), images.astype(gp_dtype),
                    sents.astype(gp_dtype), loss_cfg)
            gp_loss, gp_grads = jax.value_and_grad(gp_loss_fn)(d_params_1)
            upd, d_opt_state = d_tx.update(gp_grads, d_opt_state, d_params_1)
            d_params_2 = optax.apply_updates(d_params_1, upd)
            out = out + gp_loss

        g_params, g_opt_state = state.g_params, state.g_opt_state
        if "gphase" not in skip:
            d2c = _cast(d_params_2, cdtype)

            def g_loss_from_fake(f):
                return losses.g_hinge_loss(
                    d_embeds, discriminator_logits, d2c, _pad_img(f),
                    sents_c).astype(jnp.float32)
            g_adv, d_fake = jax.value_and_grad(g_loss_from_fake)(fake)
            out = out + g_adv
            if "gbwd" not in skip:
                (g_grads,) = g_vjp(d_fake.astype(fake.dtype))
                upd, g_opt_state = g_tx.update(g_grads, g_opt_state,
                                               state.g_params)
                g_params = optax.apply_updates(state.g_params, upd)
            else:
                out = out + jnp.mean(d_fake).astype(jnp.float32)
        else:
            out = out + jnp.mean(fake).astype(jnp.float32)

        new_state = state.replace(step=state.step + 1, g_params=g_params,
                                  d_params=d_params_2,
                                  g_opt_state=g_opt_state,
                                  d_opt_state=d_opt_state, rng=rng)
        return new_state, out

    return step


def bench_variant(cfg, skip, iters, sents, images, name):
    state = jax.jit(lambda k: create_train_state(k, cfg))(jax.random.PRNGKey(0))
    step = make_ablated_step(cfg, skip)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, sents, images):
        def body(s, _):
            s2, m = step(s, sents, images)
            return s2, m
        return jax.lax.scan(body, state, None, length=iters)

    state, out = run_n(state, sents, images)
    np.asarray(out)                      # warmup ends with value fetch
    t0 = time.perf_counter()
    state, out = run_n(state, sents, images)   # donated: fresh state values
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    b = images.shape[0]
    print(f"{name:12s} {dt * 1e3:8.2f} ms/step   {b / dt:7.1f} img/s",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gp-dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--d-lane-pad", type=int, default=0,
                    help="DiscriminatorConfig.lane_pad (exact MXU widening)")
    ap.add_argument("--g-lane-pad", type=int, default=0,
                    help="GeneratorConfig.lane_pad")
    ap.add_argument("--lane-pad-min-ch", type=int, default=0)
    ap.add_argument("--image-pad", type=int, default=0,
                    help="TrainConfig.image_pad + GeneratorConfig.image_pad")
    a = ap.parse_args()

    cfg = GANConfig.for_image_size(
        a.image_size, batch_size=a.batch, compute_dtype=a.dtype,
        loss_overrides={"gp_compute_dtype": a.gp_dtype},
        generator_overrides={"lane_pad": a.g_lane_pad,
                             "lane_pad_min_ch": a.lane_pad_min_ch,
                             "image_pad": a.image_pad},
        discriminator_overrides={"lane_pad": a.d_lane_pad,
                                 "lane_pad_min_ch": a.lane_pad_min_ch},
        image_pad=a.image_pad)
    te_cfg = cfg.text_encoder
    key = jax.random.PRNGKey(1)
    te_params = init_text_encoder(key, te_cfg)
    captions = jax.random.randint(key, (a.batch, te_cfg.max_len), 1,
                                  te_cfg.vocab_size)
    cap_lens = jnp.full((a.batch,), te_cfg.max_len, jnp.int32)
    sents = jax.jit(text_encoder_apply, static_argnums=1)(
        te_params, te_cfg, captions, cap_lens)
    images = jax.random.normal(key, (a.batch, a.image_size, a.image_size, 3))

    print(f"== step_ablate {a.dtype} bs{a.batch} gp={a.gp_dtype} "
          f"{a.image_size}px iters={a.iters} ==", flush=True)
    results = {}
    for name, skip in [("full", ()), ("no_hinge", ("hinge",)),
                       ("no_gp", ("gp",)), ("no_gphase", ("gphase",)),
                       ("no_gbwd", ("gbwd",))]:
        results[name] = bench_variant(cfg, skip, a.iters, sents, images, name)
    full = results["full"]
    print(f"\nphase costs by difference (full = {full * 1e3:.1f} ms):")
    for name, label in [("no_hinge", "D-hinge"), ("no_gp", "MA-GP"),
                        ("no_gphase", "G-phase"), ("no_gbwd", "G-bwd+update")]:
        print(f"  {label:14s} {(full - results[name]) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
