"""One-stage text-to-image generator (init/apply pytree style).

Capability parity with reference Generator (`src/generator/model.py:8-46`):
latent -> Linear -> [B,4,4,8nc] seed -> N x (ResidualBlockG + nearest-2x
upsample) -> non-upsampling ResidualBlockG -> LeakyReLU -> 3x3 conv -> tanh
-> [B,H,W,3] in [-1, 1]. NHWC throughout (TPU layout); the reference is NCHW.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import GeneratorConfig
from ..ops import blocks, nn

Params = Dict


def init_generator(key: jax.Array, cfg: GeneratorConfig, dtype=jnp.float32) -> Params:
    n_blocks = len(cfg.block_channels)
    keys = jax.random.split(key, n_blocks + 2)
    params: Params = {
        "linear_in": nn.torch_linear_init(
            keys[0], cfg.latent_dim,
            cfg.seed_channels * cfg.base_size * cfg.base_size, dtype=dtype),
        "blocks": [
            blocks.init_res_block_g(keys[1 + i], in_ch, out_ch,
                                    cfg.sentence_dim, cfg.affine_hidden, dtype)
            for i, (in_ch, out_ch) in enumerate(cfg.block_channels)
        ],
        "conv_out": nn.torch_conv_init(keys[-1], 3, 3, cfg.n_channels, 3,
                                       bias=True, dtype=dtype),
    }
    return params


def generator_apply(params: Params, cfg: GeneratorConfig,
                    noise: jnp.ndarray, sentence_embed: jnp.ndarray,
                    keep_pad: bool = False) -> jnp.ndarray:
    """noise [B, latent_dim], sentence_embed [B, sentence_dim] -> [B, H, W, 3].

    keep_pad=True (train-step internal, only meaningful with
    cfg.image_pad > 0) returns the image_pad-widened output [B, H, W,
    image_pad] instead of slicing back to 3: the pad lanes are exact zeros
    even post-tanh (zero kernels/bias, tanh(0) == 0), so the consumer can
    feed D directly. Keeping the lanes CONSUMED matters for the perf A/B —
    a slice-then-re-pad roundtrip invites XLA to slice-propagate the conv
    back to 3 output lanes and silently nullify the widening.
    """
    b = noise.shape[0]
    x = nn.dense(params["linear_in"], noise)
    # Reference reshapes to NCHW [B, 8nc, 4, 4] (`generator/model.py:37`); we
    # keep the same logical layout then transpose to NHWC so ported torch
    # weights line up element-for-element.
    x = x.reshape(b, cfg.seed_channels, cfg.base_size, cfg.base_size)
    x = jnp.transpose(x, (0, 2, 3, 1))

    # MXU lane widening for the ladder's narrow tail (exact math, perf A/B —
    # GeneratorConfig.lane_pad; see DiscriminatorConfig.lane_pad for the
    # contract). Bypasses the Pallas fused path when active.
    lp = dict(lane_pad=cfg.lane_pad, lane_pad_min_ch=cfg.lane_pad_min_ch)
    block_fn = functools.partial(blocks.res_block_g,
                                 use_pallas=cfg.use_pallas, **lp)
    up_block_fn = functools.partial(blocks.res_block_g_up, **lp)
    if cfg.remat_blocks:
        # Recompute each block's elementwise modulation chains in the
        # backward instead of saving them to HBM; conv outputs (the expensive
        # MXU results, tagged "conv_out" in ops/blocks.py) stay saved.
        remat = functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names("conv_out"))
        block_fn, up_block_fn = remat(block_fn), remat(up_block_fn)

    # The reference runs block(x) then upsamples after every block but the
    # last (`src/generator/model.py:26-33`); the equivalent upsample-BEFORE-
    # block ordering lets every block after the first fold its upsample into
    # the block body (res_block_g_up: low-res modulation chain + sub-pixel
    # conv + low-res shortcut — exact math, see ops/blocks.py). fuse_upsample
    # keeps the plain order available for A/B and the Pallas path.
    for i, block_params in enumerate(params["blocks"]):
        if i == 0:
            x = block_fn(block_params, x, sentence_embed)
        elif cfg.fuse_upsample and not cfg.use_pallas:
            x = up_block_fn(block_params, x, sentence_embed)
        else:
            x = nn.upsample_nearest_2x(x)
            x = block_fn(block_params, x, sentence_embed)

    x = nn.leaky_relu(x)
    conv_out = params["conv_out"]
    real_out = conv_out["w"].shape[3]
    # cfg.image_pad widens the 3 RGB output lanes (sliced back below);
    # a lane-padded ladder output widens conv_out's Cin to match. Both are
    # exact zero-padding (nn.lane_pad_params).
    cout = max(real_out, cfg.image_pad) if cfg.image_pad else real_out
    if x.shape[-1] != conv_out["w"].shape[2] or cout != real_out:
        conv_out = nn.lane_pad_params(conv_out, x.shape[-1], cout)
    x = nn.conv2d(conv_out, x, stride=1, padding=1)
    if cout != real_out and not keep_pad:
        x = x[..., :real_out]
    return jnp.tanh(x)


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
