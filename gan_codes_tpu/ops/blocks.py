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


def _g_cout(conv: Params, lane_pad: int, lane_pad_min_ch: int) -> int:
    """Padded output width for a G conv under GeneratorConfig.lane_pad."""
    return nn.lane_cout(conv["w"].shape[3], lane_pad, lane_pad_min_ch)


def _df_block(affine_a: Params, affine_b: Params, conv: Params,
              x: jnp.ndarray, sentence_embed: jnp.ndarray,
              use_pallas: bool, cout: int = 0) -> jnp.ndarray:
    """One DFBlock: double affine-modulation+LeakyReLU then 3x3 conv.

    With use_pallas, the whole block runs as the fused Pallas
    modulation+conv kernel (`ops/pallas/fused_modconv.py`) when the shape
    qualifies, else the fused modulation kernel + XLA conv. `cout` > 0
    lane-pads the conv to that output width (callers pass it only when
    GeneratorConfig.lane_pad is active; the Pallas path is bypassed then)."""
    if cout:
        h = fusion.double_affine_leaky(affine_a, affine_b, x, sentence_embed,
                                       False)
        y = nn.conv2d(nn.lane_pad_params(conv, x.shape[-1], cout), h,
                      stride=1, padding=1)
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(y, "conv_out")
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
                use_pallas: bool = False, lane_pad: int = 0,
                lane_pad_min_ch: int = 0) -> jnp.ndarray:
    """lane_pad > 0 (GeneratorConfig.lane_pad) widens this block's convs to
    >= lane_pad MXU lanes with exact zero-padding — same contract as the
    discriminator's (see res_block_d); `x` may arrive pre-padded."""
    c1 = _g_cout(params["conv_1"], lane_pad, lane_pad_min_ch) if lane_pad else 0
    c2 = _g_cout(params["conv_2"], lane_pad, lane_pad_min_ch) if lane_pad else 0
    h = _df_block(params["affine_1"], params["affine_2"], params["conv_1"],
                  x, sentence_embed, use_pallas and not lane_pad, c1)
    h = _df_block(params["affine_3"], params["affine_4"], params["conv_2"],
                  h, sentence_embed, use_pallas and not lane_pad, c2)

    shortcut = x
    if "shortcut_conv" in params:
        sc = params["shortcut_conv"]
        if lane_pad:
            sc = nn.lane_pad_params(sc, x.shape[-1], h.shape[-1])
        shortcut = nn.conv2d(sc, x, stride=1, padding=0)
    elif shortcut.shape[-1] != h.shape[-1]:
        # identity shortcut on an un-padded input (e.g. the raw seed) while
        # the block body got lane-padded: zero-pad to match — exact
        shortcut = jnp.pad(
            shortcut,
            ((0, 0), (0, 0), (0, 0), (0, h.shape[-1] - shortcut.shape[-1])))
    return shortcut + params["gamma"].astype(x.dtype) * h


def res_block_g_up(params: Params, x_low: jnp.ndarray,
                   sentence_embed: jnp.ndarray, lane_pad: int = 0,
                   lane_pad_min_ch: int = 0) -> jnp.ndarray:
    """== res_block_g(params, upsample_nearest_2x(x_low), sent), exactly.

    The generator upsamples before every block but the first (`src/generator/
    model.py:26-33`). Nearest-upsampling commutes with every pointwise op, so
    the TPU-efficient evaluation order is:

      * DFBlock-1's modulation chain runs at LOW resolution (4x fewer
        elementwise FLOPs / HBM traffic; per-channel affine + LeakyReLU give
        duplicated pixels identical values), then upsamples before the
        plain SAME 3x3 conv (the fully-folded sub-pixel conv
        nn.conv3x3_on_upsampled measured SLOWER end to end — see the inline
        note and PERF.md),
      * the 1x1 shortcut conv runs at LOW resolution then upsamples
        (1x1 convs are pointwise across space).

    DFBlock-2 sees the post-conv high-res map and is unchanged. Same params
    pytree as res_block_g — checkpoints and converters are unaffected.
    """
    from jax.ad_checkpoint import checkpoint_name

    c1 = _g_cout(params["conv_1"], lane_pad, lane_pad_min_ch) if lane_pad else 0
    c2 = _g_cout(params["conv_2"], lane_pad, lane_pad_min_ch) if lane_pad else 0
    conv_1 = (nn.lane_pad_params(params["conv_1"], x_low.shape[-1], c1)
              if c1 else params["conv_1"])

    h_low = fusion.double_affine_leaky(params["affine_1"], params["affine_2"],
                                       x_low, sentence_embed, False)
    # Measured on chip (bf16 bs128 full step): the folded sub-pixel conv
    # (nn.conv3x3_on_upsampled, 2.25x fewer MACs) LOSES end-to-end (506.6 vs
    # 529.6 img/s) — the 4-phase interleave and the odd-size [H+1] conv tile
    # poorly. Upsampling the (cheap, low-res) chain output and running the
    # plain SAME conv keeps the low-res-chain/shortcut wins without that.
    h = checkpoint_name(
        nn.conv2d(conv_1, nn.upsample_nearest_2x(h_low),
                  stride=1, padding=1), "conv_out")
    h = _df_block(params["affine_3"], params["affine_4"], params["conv_2"],
                  h, sentence_embed, False, c2)

    shortcut = x_low
    if "shortcut_conv" in params:
        sc = params["shortcut_conv"]
        if lane_pad:
            sc = nn.lane_pad_params(sc, x_low.shape[-1], h.shape[-1])
        shortcut = nn.conv2d(sc, x_low, stride=1, padding=0)
    elif shortcut.shape[-1] != h.shape[-1]:
        shortcut = jnp.pad(
            shortcut,
            ((0, 0), (0, 0), (0, 0), (0, h.shape[-1] - shortcut.shape[-1])))
    shortcut = nn.upsample_nearest_2x(shortcut)
    return shortcut + params["gamma"].astype(x_low.dtype) * h


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


def res_block_d(params: Params, x: jnp.ndarray, lane_pad: int = 0,
                lane_pad_min_ch: int = 0) -> jnp.ndarray:
    """lane_pad > 0 widens this block's convs to >= lane_pad MXU lanes with
    exact zero-padding (DiscriminatorConfig.lane_pad); `x` may already carry
    zero pad lanes from the previous block — the kernels' Cin is padded to
    match. Blocks whose real Cout < lane_pad_min_ch keep their natural
    output width (the padding-FLOP overhead outweighs the lane gain on the
    narrowest layers — see the config docstring's roofline note)."""
    w1 = params["conv_1"]["w"]
    out_real = w1.shape[3]
    cin = x.shape[-1]
    cout = nn.lane_cout(out_real, lane_pad, lane_pad_min_ch)
    conv_1 = nn.lane_pad_params(params["conv_1"], cin, cout)
    conv_2 = nn.lane_pad_params(params["conv_2"], cout, cout)
    h = nn.conv2d(conv_1, x, stride=2, padding=1)
    h = nn.leaky_relu(h)
    h = nn.conv2d(conv_2, h, stride=1, padding=1)
    h = nn.leaky_relu(h)

    # The reference computes avg_pool(conv1x1(x) + bias) (`src/discriminator/
    # residual_block.py` shortcut). Both ops are linear maps, so their
    # composition is ONE 2x2 stride-2 conv whose kernel is the 1x1 kernel
    # replicated over the window / 4 (bias unchanged) — mathematically
    # identical (float sums reassociated; parity tests pass at existing
    # tolerances) while never materializing either intermediate. The device
    # trace put 8% of the bf16-bs128 step in the pooled-shortcut
    # reduce_windows (artifacts/trace_r3/WALL.md); the fold measured
    # 578.4 vs 555.0 img/s on the full step (tools/pool_ab.py, +4.2%).
    # When channels match (no shortcut_conv) the identity branch keeps the
    # plain pool (pool-first commute of round 2: 4x fewer MACs than the
    # reference order, ~2GB less HBM traffic per direction at 256^2).
    if "shortcut_conv" in params:
        w1 = params["shortcut_conv"]["w"]  # [1, 1, in_ch, out_ch]
        folded = dict(params["shortcut_conv"],
                      w=jnp.broadcast_to(w1 / 4.0, (2, 2) + w1.shape[2:]))
        folded = nn.lane_pad_params(folded, cin, cout)
        shortcut = nn.conv2d(folded, x, stride=2, padding=0)
    else:
        # identity branch: in_ch == out_ch, so padded widths match too and
        # the pool carries the zero pad lanes through unchanged
        shortcut = nn.avg_pool2d(x, 2)
    return shortcut + params["gamma"].astype(x.dtype) * h
