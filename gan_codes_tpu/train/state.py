"""Training state pytree + optimizer construction.

The reference keeps G, D, two Adam optimizers, and an RNG scattered across a
class (`src/deep_fusion_gan/model.py:28-53`); here everything the jitted step
touches lives in one explicit, checkpointable TrainState so a step is a pure
function `(state, batch) -> (state, metrics)`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..config import GANConfig
from ..models.discriminator import init_discriminator
from ..models.generator import init_generator

Params = Any


@chex.dataclass
class TrainState:
    step: jnp.ndarray            # int32 scalar
    g_params: Params
    d_params: Params
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState
    g_ema_params: Params         # EMA generator for eval/sampling (config 5)
    rng: jax.Array               # PRNG carried across steps (resume-safe)


def make_optimizers(cfg: GANConfig):
    """TTUR Adam with global-norm clip, matching the reference exactly
    (`model.py:42-53`: G lr 1e-4 / D lr 4e-4, betas (0.0, 0.9), clip 5.0).

    torch's clip_grad_norm_ runs before Adam, so clip is chained first.
    """
    o = cfg.optim
    g_tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip_g),
        optax.adam(o.g_lr, b1=o.beta1, b2=o.beta2, eps=o.eps),
    )
    d_tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip_d),
        optax.adam(o.d_lr, b1=o.beta1, b2=o.beta2, eps=o.eps),
    )
    return g_tx, d_tx


def create_train_state(rng: jax.Array, cfg: GANConfig) -> TrainState:
    kg, kd, krest = jax.random.split(rng, 3)
    g_params = init_generator(kg, cfg.generator)
    d_params = init_discriminator(kd, cfg.discriminator)
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        g_ema_params=jax.tree.map(jnp.copy, g_params),
        rng=krest,
    )


def ema_update(ema_params: Params, new_params: Params, decay: float) -> Params:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, new_params)
