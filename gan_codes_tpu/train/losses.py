"""Loss functions: hinge adversarial + mismatch, MA-GP, DAMSM cosine.

Pure functions designed to live inside one jitted train step. Capability
parity with the reference trainer (`src/deep_fusion_gan/model.py:59-85,173-231`)
and `src/damsm/loss.py:4-25`.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig

Params = Dict


def d_hinge_loss(d_embeds_fn: Callable, d_logits_fn: Callable, d_params: Params,
                 real_images: jnp.ndarray, fake_images: jnp.ndarray,
                 sentence_embeds: jnp.ndarray) -> jnp.ndarray:
    """Matching-aware hinge loss for D (`model.py:173-189`).

    d_loss = mean(relu(1 - logit(real, sent)))
           + (mean(relu(1 + logit(fake, sent))) + mean(relu(1 + mismatch))) / 2
    where mismatch pairs real-image embed i with sentence i+1 (shift-by-one
    within the batch), reusing the real embeds. `fake_images` must already be
    detached from G (stop_gradient at the call site).

    TPU perf note: the reference issues the real and fake D forwards as two
    separate module calls (`model.py:173-187`); per-sample conv results are
    batch-independent, so here the two embed towers run as ONE [2B] forward
    and the three logit heads as ONE [3B-1] forward — identical values,
    roughly half the kernel launches and a fuller MXU at small batch.
    """
    b = real_images.shape[0]
    both = jnp.concatenate([real_images, fake_images], axis=0)
    embeds = d_embeds_fn(d_params, both)
    real_embeds = embeds[:b]

    emb_cat = jnp.concatenate([embeds, real_embeds[: b - 1]], axis=0)
    sent_cat = jnp.concatenate(
        [sentence_embeds, sentence_embeds, sentence_embeds[1:b]], axis=0)
    logits = d_logits_fn(d_params, emb_cat, sent_cat)
    real_logits = logits[:b]
    fake_logits = logits[b:2 * b]
    mism_logits = logits[2 * b:]

    loss_real = jnp.mean(jax.nn.relu(1.0 - real_logits))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + fake_logits))
    loss_mismatch = jnp.mean(jax.nn.relu(1.0 + mism_logits))
    return loss_real + (loss_fake + loss_mismatch) / 2.0


def ma_gradient_penalty(d_embeds_fn: Callable, d_logits_fn: Callable,
                        d_params: Params, real_images: jnp.ndarray,
                        sentence_embeds: jnp.ndarray,
                        cfg: LossConfig) -> jnp.ndarray:
    """Matching-aware gradient penalty (`model.py:59-85,202-203`).

    grads = d(sum logits)/d(real_images, sentence_embeds); per-sample norm
    sqrt(sum g^2 + eps) clamped to [0, clip]; penalty = coef * mean(norm^power).

    The reference takes `torch.autograd.grad(..., create_graph=True)` and then
    backprops the penalty into D's weights — a double backward. Here that is
    simply `jax.grad` of this function (grad-of-grad through the full conv
    stack), which XLA compiles into the same fused program as the rest of the
    step. Differentiating w.r.t. *inputs* happens in fp32 even under bf16
    compute (the caller casts) to keep the norm stable.
    """
    def logits_sum(images, sents):
        embeds = d_embeds_fn(d_params, images)
        logits = d_logits_fn(d_params, embeds, sents)
        return jnp.sum(logits)

    g_img, g_sent = jax.grad(logits_sum, argnums=(0, 1))(
        real_images, sentence_embeds)

    b = real_images.shape[0]
    # norm/penalty math always in fp32 (matters when the D forward runs bf16)
    flat = jnp.concatenate(
        [g_img.reshape(b, -1), g_sent.reshape(b, -1)], axis=1
    ).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(flat ** 2, axis=1) + cfg.gp_eps)
    norm = jnp.clip(norm, 0.0, cfg.gp_norm_clip)
    return cfg.gp_coef * jnp.mean(norm ** cfg.gp_power)


def g_hinge_loss(d_embeds_fn: Callable, d_logits_fn: Callable, d_params: Params,
                 fake_images: jnp.ndarray,
                 sentence_embeds: jnp.ndarray) -> jnp.ndarray:
    """Generator adversarial loss: -mean(logit(fake, sent)) (`model.py:215-217`)."""
    fake_embeds = d_embeds_fn(d_params, fake_images)
    fake_logits = d_logits_fn(d_params, fake_embeds, sentence_embeds)
    return -jnp.mean(fake_logits)


def damsm_cosine_loss(fake_images: jnp.ndarray,
                      sentence_embeds: jnp.ndarray) -> jnp.ndarray:
    """Simplified DAMSM text-image alignment loss (`src/damsm/loss.py:4-25`).

    Global-average-pool the fake image to a 3-vector, embed it into the
    sentence space with a fixed rectangular-identity projection (the first 3
    coordinates carry the RGB means, the rest are zero — exactly what the
    reference's non-learned `F.linear(img_feat, eye(256, 3))` does), then
    1 - mean cosine similarity.

    fake_images are NHWC here (reference is NCHW; the pooled values are
    identical). The caller passes precomputed sentence embeds instead of
    re-running the frozen text encoder as the reference wastefully does
    (`model.py:221` -> `damsm/loss.py:14`) — same value, one less LSTM pass.
    """
    img_feat = jnp.mean(fake_images, axis=(1, 2))  # [B, 3]
    d = sentence_embeds.shape[-1]
    padded = jnp.pad(img_feat, ((0, 0), (0, d - img_feat.shape[-1])))

    def normalize(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    scores = jnp.sum(normalize(padded) * normalize(sentence_embeds), axis=1)
    return 1.0 - jnp.mean(scores)


def nan_guard_loss(loss: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Reference `_check_nan` semantics (`model.py:99-104`): a NaN/Inf loss is
    replaced with `0.01 * randn()`, whose gradient w.r.t. params is zero —
    the optimizer still steps on its momentum. Returns the guarded scalar."""
    finite = jnp.isfinite(loss)
    fallback = 0.01 * jax.random.normal(key, ())
    return jnp.where(finite, loss, fallback)


def zero_grads_if_nonfinite(loss: jnp.ndarray, grads):
    """Zero the gradient pytree when the loss is non-finite (the gradient of
    the reference's replaced constant loss is exactly zero)."""
    finite = jnp.isfinite(loss)
    return jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
