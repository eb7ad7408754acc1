"""Generator / discriminator residual blocks as pure init/apply functions.

Capability parity:
  * `res_block_g` == reference ResidualBlockG (`src/generator/residual_block.py:9-59`):
    two DFBlocks (affine -> lrelu -> affine -> lrelu -> 3x3 conv), a 1x1-conv
    shortcut iff channels change, and `shortcut(x) + gamma * residual` with a
    learnable scalar gamma initialized to 0.
  * `res_block_d` == reference ResidualBlockD (`src/discriminator/residual_block.py:7-30`):
    main path 4x4/s2 conv -> lrelu -> 3x3 conv -> lrelu (bias-free), shortcut
    1x1 conv (iff channel change) -> 2x2 avg-pool, gamma-scaled sum.

All activations NHWC.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from . import fusion, nn

Params = Dict


# ---------------------------------------------------------------------------
# Generator residual block (UpBlock body)
# ---------------------------------------------------------------------------

def init_res_block_g(key: jax.Array, in_ch: int, out_ch: int,
                     sentence_dim: int = 256, affine_hidden: int = 256,
                     dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    p = {
        # DFBlock 1: modulates/convolves the in_ch feature map -> out_ch
        "affine_1": fusion.init_affine(ks[0], sentence_dim, affine_hidden, in_ch, dtype),
        "affine_2": fusion.init_affine(ks[1], sentence_dim, affine_hidden, in_ch, dtype),
        "conv_1": nn.torch_conv_init(ks[2], 3, 3, in_ch, out_ch, bias=True, dtype=dtype),
        # DFBlock 2: out_ch -> out_ch
        "affine_3": fusion.init_affine(ks[3], sentence_dim, affine_hidden, out_ch, dtype),
        "affine_4": fusion.init_affine(ks[4], sentence_dim, affine_hidden, out_ch, dtype),
        "conv_2": nn.torch_conv_init(ks[5], 3, 3, out_ch, out_ch, bias=True, dtype=dtype),
        "gamma": jnp.zeros((), dtype),
    }
    if in_ch != out_ch:
        kshort = jax.random.fold_in(key, 7)
        p["shortcut_conv"] = nn.torch_conv_init(kshort, 1, 1, in_ch, out_ch,
                                                bias=True, dtype=dtype)
    return p


def _df_block(affine_a: Params, affine_b: Params, conv: Params,
              x: jnp.ndarray, sentence_embed: jnp.ndarray,
              use_pallas: bool) -> jnp.ndarray:
    """One DFBlock: double affine-modulation+LeakyReLU then 3x3 conv.

    With use_pallas, the whole block runs as the fused Pallas
    modulation+conv kernel (`ops/pallas/fused_modconv.py`) when the shape
    qualifies, else the fused modulation kernel + XLA conv."""
    if use_pallas:
        from .pallas.fused_modconv import _supported, fused_modconv3x3

        if _supported(x):
            g1, b1 = fusion.affine_params(affine_a, sentence_embed)
            g2, b2 = fusion.affine_params(affine_b, sentence_embed)
            return fused_modconv3x3(
                x, g1.astype(x.dtype), b1.astype(x.dtype),
                g2.astype(x.dtype), b2.astype(x.dtype),
                conv["w"], conv["b"])
    h = fusion.double_affine_leaky(affine_a, affine_b, x, sentence_embed,
                                   use_pallas)
    y = nn.conv2d(conv, h, stride=1, padding=1)
    # remat boundary marker: under GeneratorConfig.remat_blocks the backward
    # keeps conv outputs and recomputes the elementwise chains
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(y, "conv_out")


def res_block_g(params: Params, x: jnp.ndarray, sentence_embed: jnp.ndarray,
                use_pallas: bool = False) -> jnp.ndarray:
    h = _df_block(params["affine_1"], params["affine_2"], params["conv_1"],
                  x, sentence_embed, use_pallas)
    h = _df_block(params["affine_3"], params["affine_4"], params["conv_2"],
                  h, sentence_embed, use_pallas)

    shortcut = x
    if "shortcut_conv" in params:
        shortcut = nn.conv2d(params["shortcut_conv"], x, stride=1, padding=0)
    return shortcut + params["gamma"].astype(x.dtype) * h


# ---------------------------------------------------------------------------
# Discriminator residual block (DownBlock)
# ---------------------------------------------------------------------------

def init_res_block_d(key: jax.Array, in_ch: int, out_ch: int,
                     dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv_1": nn.torch_conv_init(k1, 4, 4, in_ch, out_ch, bias=False, dtype=dtype),
        "conv_2": nn.torch_conv_init(k2, 3, 3, out_ch, out_ch, bias=False, dtype=dtype),
        "gamma": jnp.zeros((), dtype),
    }
    if in_ch != out_ch:
        p["shortcut_conv"] = nn.torch_conv_init(k3, 1, 1, in_ch, out_ch,
                                                bias=True, dtype=dtype)
    return p


def res_block_d(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = nn.conv2d(params["conv_1"], x, stride=2, padding=1)
    h = nn.leaky_relu(h)
    h = nn.conv2d(params["conv_2"], h, stride=1, padding=1)
    h = nn.leaky_relu(h)

    shortcut = x
    if "shortcut_conv" in params:
        shortcut = nn.conv2d(params["shortcut_conv"], x, stride=1, padding=0)
    shortcut = nn.avg_pool2d(shortcut, 2)
    return shortcut + params["gamma"].astype(x.dtype) * h
