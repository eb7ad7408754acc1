"""The single jitted 3-phase GAN train step.

Reference semantics reproduced (`src/deep_fusion_gan/model.py:163-231`): each
batch runs (1) a D hinge step with the shift-by-one mismatch term and detached
fakes, (2) a second D step on the MA-GP penalty computed with the
*post-phase-1* D params, then (3) a G step whose D forward uses the
*post-phase-2* D params, with the same fake images (same noise). The DAMSM
cosine loss is computed and logged each G step but carries weight
`cfg.loss.damsm_weight` (0.0 by default = the reference's logged-only quirk).

TPU-first design decisions:
  * All three phases live in ONE `jax.jit` program: XLA fuses the whole step,
    and there is exactly one host->device dispatch per batch.
  * The MA-GP double backward is `jax.grad` of a function that itself calls
    `jax.grad` — no retain_graph machinery, no second dispatch.
  * No length-sorting of captions (the reference sorts every batch for
    pack_padded_sequence, `src/objects/utils.py:11-17`); the masked-scan LSTM
    makes it unnecessary. The mismatch shift pairing is equally arbitrary
    either way.
  * Under bf16 compute, master params/optimizer state stay fp32 and the GP
    phase runs in fp32 (grad-norm stability).
  * Noise and NaN-guard randomness come from the PRNG key carried in
    TrainState, so runs are reproducible and resume-safe — the reference
    loses RNG state across resumes (SURVEY.md §5).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import GANConfig
from ..models.discriminator import discriminator_embeds, discriminator_logits
from ..models.generator import generator_apply
from ..models.text_encoder import text_encoder_apply
from ..ops import nn
from . import losses
from .state import TrainState, ema_update, make_optimizers

Params = Any
Metrics = Dict[str, jnp.ndarray]


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def make_train_step(cfg: GANConfig):
    """Build the pure step function `(state, text_params, images, captions,
    cap_lens) -> (state, metrics)`. Wrap with jax.jit (single device) or the
    helpers in `parallel/` (mesh)."""
    g_tx, d_tx = make_optimizers(cfg)
    gen_cfg, te_cfg, loss_cfg = cfg.generator, cfg.text_encoder, cfg.loss
    cdtype = cfg.train.compute_jnp_dtype
    ema_decay = cfg.train.ema_decay
    # MXU lane widening for D's narrow front convs (exact math, perf A/B —
    # DiscriminatorConfig.lane_pad). 0 = reference-shaped convs.
    d_embeds = (discriminator_embeds if not cfg.discriminator.lane_pad
                else functools.partial(
                    discriminator_embeds,
                    lane_pad=cfg.discriminator.lane_pad,
                    lane_pad_min_ch=cfg.discriminator.lane_pad_min_ch))
    # TrainConfig.image_pad: zero-pad the RGB dim for every D forward so the
    # image-boundary convs (stem reduction 27/128, grad-to-image output
    # lanes 3/128) fill the MXU (exact math — see the config docstring).
    # GeneratorConfig.image_pad contributes via keep_pad: the generator
    # returns its widened output directly (pad lanes exact zeros post-tanh)
    # so the lanes stay CONSUMED by the D forwards — a slice-then-re-pad
    # roundtrip would invite XLA to slice-propagate the widened conv away.
    # All D inputs (real and fake — d_hinge_loss concatenates them) pad to
    # the common width.
    img_pad = max(cfg.train.image_pad, gen_cfg.image_pad)
    keep_pad = gen_cfg.image_pad > 0

    def _pad_img(x):
        return nn.pad_channels(x, img_pad)

    # Lazy regularization (LossConfig.gp_interval): the penalty phase runs
    # every k-th step with coefficient scaled by k (StyleGAN2-style equal
    # time-averaged pressure); k=1 (default) is the reference's every-step
    # double backward and compiles with no cond at all.
    k_interval = loss_cfg.gp_interval
    gp_cfg = (loss_cfg if k_interval == 1 else dataclasses.replace(
        loss_cfg, gp_coef=loss_cfg.gp_coef * k_interval))

    def guard(loss, grads, key):
        """Reference _check_nan semantics on a (loss, grads) pair."""
        if not loss_cfg.nan_guard:
            return loss, grads
        guarded = losses.nan_guard_loss(loss, key)
        return guarded, losses.zero_grads_if_nonfinite(loss, grads)

    def train_step(state: TrainState, text_params: Params,
                   images: jnp.ndarray, captions: jnp.ndarray,
                   cap_lens: jnp.ndarray) -> Tuple[TrainState, Metrics]:
        rng, k_noise, k_d, k_gp, k_g = jax.random.split(state.rng, 5)
        batch = images.shape[0]

        # Frozen text encoder forward (eval mode, no dropout) — `model.py:171`.
        sents = text_encoder_apply(text_params, te_cfg, captions, cap_lens)
        sents = jax.lax.stop_gradient(sents)

        noise = jax.random.normal(k_noise, (batch, gen_cfg.latent_dim))

        images_c = _pad_img(images).astype(cdtype)
        sents_c = sents.astype(cdtype)

        # ONE generator forward for the whole step. The reference reuses its
        # `fake_images` tensor across the D and G phases (`model.py:182-215`);
        # here jax.vjp gives us the same reuse — the forward runs once and the
        # G-phase gradient comes from the saved linearization instead of a
        # second forward.
        fake, g_vjp = jax.vjp(
            lambda gp: generator_apply(_cast(gp, cdtype), gen_cfg,
                                       noise.astype(cdtype), sents_c,
                                       keep_pad=keep_pad),
            state.g_params)
        fake_detached = _pad_img(jax.lax.stop_gradient(fake))

        # ---- Phase 1: D hinge (adversarial + mismatch) ----
        def d_loss_fn(d_params):
            return losses.d_hinge_loss(
                d_embeds, discriminator_logits,
                _cast(d_params, cdtype), images_c, fake_detached, sents_c
            ).astype(jnp.float32)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_loss, d_grads = guard(d_loss, d_grads, k_d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params_1 = optax.apply_updates(state.d_params, d_updates)

        # ---- Phase 2: MA-GP on the post-phase-1 D (`model.py:200-210`) ----
        # D forward dtype is configurable (fp32 = reference numerics; bf16 is
        # ~30% faster); the norm/penalty math is always fp32 inside
        # ma_gradient_penalty.
        gp_dtype = (jnp.bfloat16 if loss_cfg.gp_compute_dtype == "bfloat16"
                    else jnp.float32)

        def gp_loss_fn(d_params):
            return losses.ma_gradient_penalty(
                d_embeds, discriminator_logits,
                _cast(d_params, gp_dtype),
                # image-grad on the pad channels is exactly zero (zero stem
                # rows), so the GP norm over the padded tensor is unchanged
                _pad_img(images).astype(gp_dtype), sents.astype(gp_dtype),
                gp_cfg)

        def run_gp(operands):
            d_params_1, d_opt_state = operands
            gp_loss, gp_grads = jax.value_and_grad(gp_loss_fn)(d_params_1)
            gp_loss, gp_grads = guard(gp_loss, gp_grads, k_gp)
            gp_updates, d_opt_state = d_tx.update(gp_grads, d_opt_state,
                                                  d_params_1)
            return (optax.apply_updates(d_params_1, gp_updates), d_opt_state,
                    gp_loss)

        if k_interval == 1:
            d_params_2, d_opt_state, gp_loss = run_gp((d_params_1, d_opt_state))
            gp_active = jnp.float32(1.0)
        else:
            gp_active = (state.step % k_interval == 0).astype(jnp.float32)
            d_params_2, d_opt_state, gp_loss = jax.lax.cond(
                state.step % k_interval == 0,
                run_gp,
                lambda ops: (ops[0], ops[1], jnp.float32(0.0)),
                (d_params_1, d_opt_state))

        # ---- Phase 3: G step against the post-phase-2 D (`model.py:214-228`).
        # The D forward differentiates w.r.t. the *fake images*; the cotangent
        # then flows through the saved G linearization (g_vjp) — no second
        # generator forward.
        d_params_2_c = _cast(d_params_2, cdtype)

        def g_loss_from_fake(fake_in):
            adv = losses.g_hinge_loss(
                d_embeds, discriminator_logits, d_params_2_c,
                _pad_img(fake_in), sents_c).astype(jnp.float32)
            # DAMSM sees the real RGB image (pad lanes, when present, are
            # exact zeros — sliced off rather than fed to the cosine).
            rgb = fake_in[..., :images.shape[-1]]
            txtimg = losses.damsm_cosine_loss(
                rgb.astype(jnp.float32), sents).astype(jnp.float32)
            total = adv + loss_cfg.damsm_weight * txtimg
            return total, (adv, txtimg)

        (g_total, (g_adv, txtimg_loss)), d_fake = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)(fake)
        (g_grads,) = g_vjp(d_fake.astype(fake.dtype))
        # Key the grad-zeroing on the loss actually differentiated (g_total
        # includes the weighted DAMSM term, `model.py:219-224`); the logged
        # adversarial value gets its own NaN replacement.
        if loss_cfg.nan_guard:
            g_grads = losses.zero_grads_if_nonfinite(g_total, g_grads)
            g_adv = losses.nan_guard_loss(g_adv, k_g)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = ema_update(state.g_ema_params, g_params, ema_decay)

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params_2,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            g_ema_params=g_ema,
            rng=rng,
        )
        metrics = {
            "d_loss": d_loss,
            # Logged at the REFERENCE coefficient: with lazy regularization
            # (gp_interval = k > 1) the applied penalty is scaled by k
            # (gp_cfg above), so the raw per-active-step value is k x the
            # reference's logged coef*mean(norm^p). Dividing by k here makes
            # the metric cadence-independent — an interval-4 run's epoch
            # mean (over active steps, see d_gp_active) is directly
            # comparable to an interval-1 run and to the reference.
            "d_gp_loss": gp_loss / k_interval,
            # 1.0 on steps where the GP phase actually ran. Skipped steps
            # emit d_gp_loss = 0.0 and are masked OUT of epoch means
            # (train_epoch) so the mean reflects the penalty per
            # application, not the cadence.
            "d_gp_active": gp_active,
            "g_loss": g_adv,
            "txtimg_loss": txtimg_loss,
        }
        return new_state, metrics

    return train_step


def make_jitted_train_step(cfg: GANConfig):
    """Single-device jitted step with state donation (buffers reused in-place).

    `cfg.train.xla_scoped_vmem_kib` ships a scoped-VMEM budget to the TPU
    compiler (measured +2.8% at bf16 bs128; see TrainConfig)."""
    step = make_train_step(cfg)
    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=cfg.train.step_compiler_options())


def make_scanned_train_step(cfg: GANConfig):
    """N full train steps per dispatch: a `lax.scan` device loop over stacked
    batches (`TrainConfig.steps_per_dispatch`).

    The standard production-TPU training-loop pattern (keep the device inside
    one XLA program instead of bouncing to the host every step): the stacked
    leading axis is the scan axis, and each scan iteration is exactly
    `make_train_step`'s 3-phase step on its own batch slice — same math, same
    per-step RNG stream, same optimizer threading as N sequential dispatches
    (pinned step-for-step in tests/test_scan_dispatch.py). The reference has
    no equivalent — its loop is one `train_one_epoch` Python iteration per
    batch (`src/deep_fusion_gan/model.py:282-298`).

    Signature: `(state, text_params, images[N,B,H,W,C], captions[N,B,L],
    cap_lens[N,B]) -> (state, metrics)` where each metrics leaf is stacked
    `[N]` (one value per inner step, so epoch means / gp_active masking are
    identical to the single-step path).
    """
    step = make_train_step(cfg)

    def multi_step(state: TrainState, text_params: Params,
                   images: jnp.ndarray, captions: jnp.ndarray,
                   cap_lens: jnp.ndarray) -> Tuple[TrainState, Metrics]:
        def body(carry, batch):
            imgs, caps, lens = batch
            return step(carry, text_params, imgs, caps, lens)

        return jax.lax.scan(body, state, (images, captions, cap_lens))

    return multi_step


def make_jitted_scanned_train_step(cfg: GANConfig):
    """Single-device jitted `steps_per_dispatch` device loop (state donated)."""
    return jax.jit(make_scanned_train_step(cfg), donate_argnums=(0,),
                   compiler_options=cfg.train.step_compiler_options())
