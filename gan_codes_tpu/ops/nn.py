"""Core neural-net primitives as pure functions over parameter pytrees.

TPU-first conventions:
  * Activations are NHWC (TPU-preferred layout); conv kernels are HWIO.
  * Everything is jit-safe: static shapes, no Python control flow on values.
  * Initializers reproduce PyTorch's default distributions so training
    dynamics match the reference (kaiming-uniform(a=sqrt(5)) for conv/linear
    weights, uniform(+-1/sqrt(fan_in)) biases, xavier-normal where the
    reference requests it — see `src/generator/fusion_block.py:22-31`).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers (PyTorch-default-compatible)
# ---------------------------------------------------------------------------

def torch_linear_init(key: jax.Array, in_dim: int, out_dim: int,
                      bias: bool = True, dtype=jnp.float32) -> Params:
    """nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    kw, kb = jax.random.split(key)
    bound = math.sqrt(1.0 / in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def xavier_normal_linear_init(key: jax.Array, in_dim: int, out_dim: int,
                              dtype=jnp.float32) -> Params:
    """xavier_normal_ weights + zero bias (reference AffineBlock MLPs)."""
    std = math.sqrt(2.0 / (in_dim + out_dim))
    w = jax.random.normal(key, (in_dim, out_dim), dtype) * std
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def torch_conv_init(key: jax.Array, kh: int, kw: int, in_ch: int, out_ch: int,
                    bias: bool = True, dtype=jnp.float32) -> Params:
    """nn.Conv2d default init in HWIO layout."""
    kkw, kkb = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    p = {"w": jax.random.uniform(kkw, (kh, kw, in_ch, out_ch), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kkb, (out_ch,), dtype, -bound, bound)
    return p


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def conv2d(params: Params, x: jnp.ndarray, stride: int = 1,
           padding: int | str = "SAME") -> jnp.ndarray:
    """NHWC x HWIO -> NHWC convolution."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def lane_pad_params(params: Params, cin: int, cout: int) -> Params:
    """Zero-pad a conv param dict to kernel [kh, kw, cin, cout] (+ bias).

    Exact math for MXU lane widening (DiscriminatorConfig.lane_pad): padded
    INPUT channels multiply zero kernel taps (x*0 accumulates exactly), and
    padded OUTPUT channels are produced by all-zero kernels/bias, so they
    carry exact zeros through conv/LeakyReLU/avg-pool chains; in the
    backward, the pad's VJP slices the cotangent back, and the cotangent on
    pad lanes is itself zero (it flows only through the next layer's zero
    pad-kernels). Happens INSIDE the traced function — parameter trees,
    optimizer state, and checkpoints keep their real shapes.
    """
    w = params["w"]
    ci, co = w.shape[2], w.shape[3]
    if ci == cin and co == cout:
        return params
    out = dict(params,
               w=jnp.pad(w, ((0, 0), (0, 0), (0, cin - ci), (0, cout - co))))
    if "b" in params:
        out["b"] = jnp.pad(params["b"], (0, cout - co))
    return out


def lane_cout(out_real: int, lane_pad: int, lane_pad_min_ch: int) -> int:
    """Output width of a conv under the lane_pad knob: >= lane_pad lanes,
    except layers whose real Cout is under lane_pad_min_ch keep natural
    width (roofline guard — see DiscriminatorConfig.lane_pad).

    THE single copy of this rule: the exactness contract requires
    producer/consumer widths to agree block-to-block (identity shortcuts
    assume it), so every site — D blocks, D stem, G blocks — must compute
    the width identically."""
    if lane_pad and out_real >= lane_pad_min_ch:
        return max(out_real, lane_pad)
    return out_real


def pad_channels(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero-pad the trailing (channel) dim of `x` up to `n` lanes; no-op when
    already that wide or `n` is 0.

    The image-boundary half of the MXU lane-fill scheme
    (TrainConfig.image_pad): exact math because the matching conv-kernel
    rows are zero-padded by lane_pad_params, the pad lanes carry exact
    zeros forward, and the slice/pad VJP pair keeps cotangents exact.
    Shared by the train step, tools/step_ablate.py, and the exactness
    tests so the padding rule cannot silently diverge between them.
    """
    if not n or x.shape[-1] >= n:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, n - x.shape[-1]),))


def conv3x3_on_upsampled(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """== conv2d(params, upsample_nearest_2x(x), stride=1, padding=1), exactly.

    MEASURED NEGATIVE — kept as a tested reference, NOT used by the model:
    despite 2.25x fewer MACs the folded form lost end to end on chip (506.6
    vs 529.6 img/s; the 4-phase interleave and odd-size [H+1] conv tile
    poorly — PERF.md "What lost"). res_block_g_up upsamples the low-res
    chain output and runs the plain conv instead.

    Nearest-upsampling duplicates pixels, so the SAME-padded 3x3 conv on the
    [2H, 2W] map reads each original pixel through summed taps: for output
    sub-pixel phase p in {0,1} (per axis), the three taps fold onto two
    original-pixel offsets — phase 0 reads offsets (-1, 0) with weights
    (w0, w1+w2), phase 1 reads (0, +1) with (w0+w1, w2). Folding both axes
    gives ONE 2x2 stride-1 conv with 4*Cout output channels (all four phases
    at once) followed by a sub-pixel interleave:

      * 16/36 = 2.25x fewer MACs than convolving the upsampled map, and
      * the upsampled Cin feature map is never materialized in HBM, and
      * N = 4*Cout fills the 128-lane MXU where the generator ladder's
        narrow tail (Cout in {32, 64}) would waste 50-75% of it.

    Bitwise this reassociates the tap additions; parity tests pass at their
    existing tolerances. Reference semantics covered: `src/generator/
    model.py:26-33` (upsample -> ResidualBlockG) with the block's first conv
    `src/generator/residual_block.py:35-47`.
    """
    w = params["w"]
    cout = w.shape[-1]
    # fold rows: r0 = phase-0 kernel rows at offsets (-1, 0); r1 = phase 1
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)          # [2, 3, ci, co]
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)

    def fold_cols(r):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)   # [2, 2, ci, co]
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        return c0, c1

    k00, k01 = fold_cols(r0)
    k10, k11 = fold_cols(r1)
    wf = jnp.concatenate([k00, k01, k10, k11], axis=-1)  # [2, 2, ci, 4*co]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = lax.conv_general_dilated(
        xp, wf.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)                  # [B, H+1, W+1, 4*co]
    n, h1, w1, _ = z.shape
    h, wd = h1 - 1, w1 - 1
    phases = [z[:, py:py + h, px:px + wd, p * cout:(p + 1) * cout]
              for p, (py, px) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)])]
    y = jnp.stack(phases, axis=-2).reshape(n, h, wd, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * wd, cout)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


def avg_pool2d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """F.avg_pool2d(x, window) on NHWC."""
    y = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, window, window, 1),
        padding="VALID",
    )
    return y / float(window * window)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2) (default mode='nearest') on NHWC.

    Implemented as a reshape/broadcast so XLA lowers it to a cheap copy
    rather than a gather.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def global_mean_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over spatial dims: NHWC -> NC."""
    return jnp.mean(x, axis=(1, 2))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
