"""Deep-fusion affine modulation op.

Capability parity with the reference AffineBlock
(`src/generator/fusion_block.py:5-39`): two 2-layer MLPs map the sentence
embedding to per-channel scale gamma and shift beta, broadcast over HxW, and
the feature map is modulated `gamma * x + beta`.

TPU-first design: the gamma/beta MLPs are tiny matmuls computed once per block
per step; the expensive part is the [B,H,W,C]-sized elementwise modulation +
LeakyReLU chains, which are memory-bandwidth-bound. `affine_leaky` expresses
the modulate+activate pair as one op so XLA fuses it into a single VPU pass
(and so a Pallas kernel can swap in — see `ops/pallas/fused_affine.py`).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from . import nn

Params = Dict


def init_affine(key: jax.Array, sentence_dim: int, hidden_dim: int,
                out_channels: int, dtype=jnp.float32) -> Params:
    """Xavier-normal weights, zero biases (reference `fusion_block.py:22-31`)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "gamma_mlp": [
            nn.xavier_normal_linear_init(k1, sentence_dim, hidden_dim, dtype),
            nn.xavier_normal_linear_init(k2, hidden_dim, out_channels, dtype),
        ],
        "beta_mlp": [
            nn.xavier_normal_linear_init(k3, sentence_dim, hidden_dim, dtype),
            nn.xavier_normal_linear_init(k4, hidden_dim, out_channels, dtype),
        ],
    }


def _mlp(layers, s: jnp.ndarray) -> jnp.ndarray:
    h = nn.dense(layers[0], s)
    h = jax.nn.relu(h)
    return nn.dense(layers[1], h)


def affine_params(params: Params, sentence_embed: jnp.ndarray):
    """Compute per-sample per-channel (gamma, beta): [B, C] each."""
    return _mlp(params["gamma_mlp"], sentence_embed), _mlp(params["beta_mlp"], sentence_embed)


def modulate(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """gamma * x + beta with [B,C] params broadcast over NHWC feature maps."""
    return gamma[:, None, None, :] * x + beta[:, None, None, :]


def affine(params: Params, x: jnp.ndarray, sentence_embed: jnp.ndarray) -> jnp.ndarray:
    """Reference AffineBlock.forward (`fusion_block.py:33-39`), NHWC."""
    gamma, beta = affine_params(params, sentence_embed)
    return modulate(x, gamma, beta)


def affine_leaky(params: Params, x: jnp.ndarray, sentence_embed: jnp.ndarray,
                 negative_slope: float = 0.2) -> jnp.ndarray:
    """Affine modulation immediately followed by LeakyReLU.

    This is the hot elementwise chain inside every DFBlock
    (`src/generator/residual_block.py:35-47`); keeping it one op lets the
    compiler (or a Pallas kernel) do a single HBM round trip.
    """
    gamma, beta = affine_params(params, sentence_embed)
    return nn.leaky_relu(modulate(x, gamma, beta), negative_slope)


def double_affine_leaky(params_a: Params, params_b: Params, x: jnp.ndarray,
                        sentence_embed: jnp.ndarray,
                        use_pallas: bool = False) -> jnp.ndarray:
    """The full DFBlock pre-conv chain:
    lrelu(affine_b(lrelu(affine_a(x)))) — two modulations + two activations.

    With `use_pallas=True` the four elementwise passes run as ONE Pallas VMEM
    pass (`ops/pallas/fused_affine.py`) with a fused backward; otherwise the
    jnp composition (XLA's own fusion). The gamma/beta MLPs are tiny MXU
    matmuls and stay in XLA either way.
    """
    g1, b1 = affine_params(params_a, sentence_embed)
    g2, b2 = affine_params(params_b, sentence_embed)
    if x.shape[-1] != g1.shape[-1]:
        # Lane-padded activations (GeneratorConfig.lane_pad): x carries zero
        # pad lanes beyond the real channel count. Zero-padding gamma AND
        # beta keeps them exact zeros through gamma*0 + 0 and LeakyReLU.
        pad = ((0, 0), (0, x.shape[-1] - g1.shape[-1]))
        g1, b1, g2, b2 = (jnp.pad(v, pad) for v in (g1, b1, g2, b2))
    if use_pallas:
        from .pallas.fused_affine import fused_double_affine_leaky

        return fused_double_affine_leaky(x, g1.astype(x.dtype),
                                         b1.astype(x.dtype),
                                         g2.astype(x.dtype),
                                         b2.astype(x.dtype))
    h = nn.leaky_relu(modulate(x, g1, b1))
    return nn.leaky_relu(modulate(h, g2, b2))
