"""Pallas TPU kernel: fused double affine-modulation + LeakyReLU chain.

The hot elementwise chain inside every generator DFBlock
(`src/generator/residual_block.py:35-47`) is

    h = lrelu(g1 * x + b1); out = lrelu(g2 * h + b2)

over a [B, H, W, C] feature map with per-sample per-channel (g, b) from the
sentence-conditioning MLPs. Four elementwise passes = four HBM round trips if
unfused; this kernel does the whole chain in ONE pass through VMEM, with a
custom VJP whose backward kernel likewise recomputes the masks in-register
and emits dx plus the per-sample (dg1, db1, dg2, db2) reductions in one pass.

The MLPs producing (g, b) stay outside (tiny MXU matmuls XLA handles well);
this kernel owns the bandwidth-bound part. `ops/fusion.py::double_affine_leaky`
dispatches here when `use_pallas=True`, else to the jnp composition — both
paths are numerically identical (tests/test_pallas.py).

TPU tiling notes: feature maps are processed as [B, HW, C] with (1, T, C)
blocks (T a divisor of HW, multiple of 8); the per-sample vectors are carried
as [B, 1, C] so their (1, 1, C) blocks satisfy Mosaic's block-shape rule
(each of the last two dims divisible by the min tile or equal to the full
array dim). The backward's dg/db outputs map every HW-tile grid step j to the
same (1, 1, C) block, which Mosaic keeps resident in VMEM across the j loop —
initialized at j == 0, accumulated after.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_SLOPE = 0.2


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_tile(hw: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if hw % t == 0:
            return t
    return hw


def _interpret() -> bool:
    """Use the Pallas interpreter off-TPU (CPU tests / virtual meshes)."""
    platform = jax.devices()[0].platform.lower()
    return not ("tpu" in platform or "axon" in platform)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _lrelu(y):
    """Comparison-free LeakyReLU: Mosaic rejects bf16 vector compares in some
    packed layouts; max/min are supported and exactly equivalent."""
    return jnp.maximum(y, 0) + NEG_SLOPE * jnp.minimum(y, 0)


def _fwd_kernel(x_ref, g1_ref, b1_ref, g2_ref, b2_ref, o_ref):
    x = x_ref[0]
    g1, b1 = g1_ref[0], b1_ref[0]
    g2, b2 = g2_ref[0], b2_ref[0]
    y1 = g1 * x + b1  # [T, C] * [1, C] broadcasts on sublanes
    o_ref[0] = _lrelu(g2 * _lrelu(y1) + b2)


def _fwd(x3, g1, b1, g2, b2):
    b, hw, c = x3.shape
    t = _pick_tile(hw)
    grid = (b, _cdiv(hw, t))
    map_spec = pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0))
    vec_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[map_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=_interpret(),
    )(x3, g1[:, None, :], b1[:, None, :], g2[:, None, :], b2[:, None, :])


# ---------------------------------------------------------------------------
# Backward: dx in one pass + per-sample (dg1, db1, dg2, db2) reductions
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g1_ref, b1_ref, g2_ref, b2_ref, dy_ref,
                dx_ref, dg1_ref, db1_ref, dg2_ref, db2_ref):
    j = pl.program_id(1)
    x = x_ref[0]
    g1, b1 = g1_ref[0], b1_ref[0]
    g2, b2 = g2_ref[0], b2_ref[0]
    dy = dy_ref[0]

    y1 = g1 * x + b1
    # compare in fp32: bf16 vector compares are unsupported in this layout
    m1 = jnp.where(y1.astype(jnp.float32) >= 0, 1.0,
                   NEG_SLOPE).astype(x.dtype)
    h = y1 * m1
    y2 = g2 * h + b2
    m2 = jnp.where(y2.astype(jnp.float32) >= 0, 1.0,
                   NEG_SLOPE).astype(x.dtype)

    dy2 = dy * m2
    dh = dy2 * g2
    dy1 = dh * m1
    dx_ref[0] = dy1 * g1

    pg2 = jnp.sum(dy2 * h, axis=0, keepdims=True)
    pb2 = jnp.sum(dy2, axis=0, keepdims=True)
    pg1 = jnp.sum(dy1 * x, axis=0, keepdims=True)
    pb1 = jnp.sum(dy1, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        dg1_ref[0] = pg1
        db1_ref[0] = pb1
        dg2_ref[0] = pg2
        db2_ref[0] = pb2

    @pl.when(j != 0)
    def _():
        dg1_ref[0] += pg1
        db1_ref[0] += pb1
        dg2_ref[0] += pg2
        db2_ref[0] += pb2


def _bwd_call(x3, g1, b1, g2, b2, dy3):
    b, hw, c = x3.shape
    t = _pick_tile(hw)
    grid = (b, _cdiv(hw, t))
    map_spec = pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0))
    vec_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    out_shapes = (
        jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[map_spec, vec_spec, vec_spec, vec_spec, vec_spec, map_spec],
        out_specs=(map_spec, vec_spec, vec_spec, vec_spec, vec_spec),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(x3, g1[:, None, :], b1[:, None, :], g2[:, None, :], b2[:, None, :], dy3)


# ---------------------------------------------------------------------------
# Public op with custom VJP (NHWC)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_double_affine_leaky(x: jnp.ndarray, g1, b1, g2, b2) -> jnp.ndarray:
    """lrelu(g2 * lrelu(g1 * x + b1) + b2); x [B,H,W,C], params [B,C]."""
    b, h, w, c = x.shape
    out = _fwd(x.reshape(b, h * w, c), g1, b1, g2, b2)
    return out.reshape(b, h, w, c)


def _vjp_fwd(x, g1, b1, g2, b2):
    return fused_double_affine_leaky(x, g1, b1, g2, b2), (x, g1, b1, g2, b2)


def _vjp_bwd(res, dy):
    x, g1, b1, g2, b2 = res
    b, h, w, c = x.shape
    dx3, dg1, db1, dg2, db2 = _bwd_call(
        x.reshape(b, h * w, c), g1, b1, g2, b2, dy.reshape(b, h * w, c))
    return (dx3.reshape(b, h, w, c), dg1[:, 0, :], db1[:, 0, :],
            dg2[:, 0, :], db2[:, 0, :])


fused_double_affine_leaky.defvjp(_vjp_fwd, _vjp_bwd)


def reference_double_affine_leaky(x, g1, b1, g2, b2):
    """Pure-jnp composition (what XLA fuses on its own); used as the
    correctness oracle and the non-TPU fallback."""
    y1 = g1[:, None, None, :] * x + b1[:, None, None, :]
    h = jnp.where(y1 >= 0, y1, y1 * NEG_SLOPE)
    y2 = g2[:, None, None, :] * h + b2[:, None, None, :]
    return jnp.where(y2 >= 0, y2, y2 * NEG_SLOPE)
