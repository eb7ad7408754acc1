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
