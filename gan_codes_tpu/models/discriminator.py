"""Matching-aware discriminator (init/apply pytree style).

Capability parity with reference Discriminator (`src/discriminator/model.py:8-58`):
  * `discriminator_embeds` == build_embeds: 3x3 conv stem then N strided
    residual blocks, image_size -> 4 spatial, [B, 4, 4, 16nc].
  * `discriminator_logits` == get_logits: tile the sentence embedding over the
    4x4 grid, concat on channels, 3x3 conv (no bias) -> LeakyReLU -> 4x4
    VALID conv (no bias) -> [B, 1, 1, 1].

The two-phase split is load-bearing: the trainer reuses real-image embeds for
the shift-by-one mismatched-pair hinge term (`src/deep_fusion_gan/model.py:177-180`).
NHWC throughout.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import DiscriminatorConfig
from ..ops import blocks, nn

Params = Dict


def init_discriminator(key: jax.Array, cfg: DiscriminatorConfig,
                       dtype=jnp.float32) -> Params:
    n_blocks = cfg.n_down_blocks
    keys = jax.random.split(key, n_blocks + 3)
    return {
        "conv_stem": nn.torch_conv_init(keys[0], 3, 3, 3, cfg.n_channels,
                                        bias=True, dtype=dtype),
        "blocks": [
            blocks.init_res_block_d(keys[1 + i], in_ch, out_ch, dtype)
            for i, (in_ch, out_ch) in enumerate(cfg.block_channels)
        ],
        "conv_joint": nn.torch_conv_init(
            keys[-2], 3, 3, cfg.embed_channels + cfg.sentence_dim,
            cfg.n_channels * 2, bias=False, dtype=dtype),
        "conv_logit": nn.torch_conv_init(
            keys[-1], cfg.final_size, cfg.final_size, cfg.n_channels * 2, 1,
            bias=False, dtype=dtype),
    }


def discriminator_embeds(params: Params, image: jnp.ndarray,
                         lane_pad: int = 0,
                         lane_pad_min_ch: int = 0) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, 4, 4, embed_channels].

    lane_pad > 0 (DiscriminatorConfig.lane_pad) zero-pads the narrow front
    convs to >= lane_pad MXU lanes at trace time — exact math (see
    nn.lane_pad_params), unchanged param/checkpoint shapes; layers with real
    Cout < lane_pad_min_ch keep their natural width. The returned embeds are
    sliced back to their real width, so downstream logits and losses are
    untouched."""
    stem = params["conv_stem"]
    cout = nn.lane_cout(stem["w"].shape[3], lane_pad, lane_pad_min_ch)
    # Cin always tracks the incoming image width: TrainConfig.image_pad
    # feeds zero-padded image channels (the kernel's matching rows pad to
    # zeros — exact), independent of the lane_pad knob.
    stem = nn.lane_pad_params(stem, image.shape[-1], cout)
    x = nn.conv2d(stem, image, stride=1, padding=1)
    for block_params in params["blocks"]:
        x = blocks.res_block_d(block_params, x, lane_pad, lane_pad_min_ch)
    real = params["blocks"][-1]["conv_2"]["w"].shape[3]
    return x[..., :real] if x.shape[-1] != real else x


def discriminator_logits(params: Params, image_embed: jnp.ndarray,
                         sentence_embed: jnp.ndarray) -> jnp.ndarray:
    """([B,4,4,C], [B,S]) -> [B,1,1,1] matching-aware logits."""
    b, h, w, _ = image_embed.shape
    sent = jnp.broadcast_to(sentence_embed[:, None, None, :],
                            (b, h, w, sentence_embed.shape[-1]))
    joint = jnp.concatenate([image_embed, sent.astype(image_embed.dtype)], axis=-1)
    x = nn.conv2d(params["conv_joint"], joint, stride=1, padding=1)
    x = nn.leaky_relu(x)
    return nn.conv2d(params["conv_logit"], x, stride=1, padding="VALID")


def discriminator_apply(params: Params, image: jnp.ndarray,
                        sentence_embed: jnp.ndarray) -> jnp.ndarray:
    """Convenience: embeds + logits in one call."""
    return discriminator_logits(params, discriminator_embeds(params, image),
                                sentence_embed)


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
