"""Pallas TPU kernel: fused [double affine modulation + LeakyReLU] -> 3x3 conv.

This is the full DFBlock hot path (`src/generator/residual_block.py:35-40`):

    h = lrelu(g2 * lrelu(g1 * x + b1) + b2)   # elementwise, per-sample (g,b)
    y = conv3x3_same(h, W) + bias             # MXU

Unfused, `h` is materialized to HBM between the elementwise chain and the
conv (XLA does not fuse elementwise producers into conv *inputs*). This
kernel keeps `h` entirely in VMEM: each grid step manually DMAs a
(tile_h + 2, W + 2, Cin) halo slice of the pre-padded input from HBM,
modulates it in-register, and computes the SAME-conv as 9 shifted
[tile_h*W, Cin] @ [Cin, Cout] MXU matmuls accumulated in fp32.

Backward runs as the plain XLA composition via custom_vjp (the fusion win is
in the forward's HBM traffic; the backward needs dW/dx convolutions XLA
already handles well).

Used when `GeneratorConfig.use_pallas` requests it AND shapes qualify
(H divisible by the row tile); otherwise callers fall back to the jnp
composition. Correctness: tests/test_pallas.py::TestFusedModConv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_affine import NEG_SLOPE, _interpret, _lrelu


def _pick_row_tile(h: int, w: int, cin: int, dtype_bytes: int = 4) -> int:
    """Largest row tile keeping the halo slice + output comfortably in VMEM.

    The kernel's live set is ~6-8x the input tile (modulated copies, per-shift
    matmul outputs, fp32 accumulator), against a 16MB scoped-VMEM budget —
    keep the tile itself under ~1MB.
    """
    budget = 1024 * 1024  # bytes for the input tile
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t == 0 and (t + 2) * (w + 2) * cin * dtype_bytes <= budget:
            return t
    return 1


def _kernel(x_hbm, g1_ref, b1_ref, g2_ref, b2_ref, w_ref, bias_ref, o_ref,
            x_vmem, sem, *, tile_h: int, out_w: int):
    """Double-buffered: the halo DMA for grid step k+1 is issued before the
    compute of step k, hiding HBM latency behind the matmuls. Scratch
    persists across the sequential TPU grid, so slot k%2 alternates."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    k = b * n_i + i
    n_k = pl.num_programs(0) * n_i
    slot = jax.lax.rem(k, 2)
    next_slot = 1 - slot

    def dma(for_k, to_slot):
        bb = jax.lax.div(for_k, n_i)
        ii = jax.lax.rem(for_k, n_i)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile_h, tile_h + 2)],
            x_vmem.at[to_slot], sem.at[to_slot])

    @pl.when(k == 0)
    def _():
        dma(0, 0).start()

    @pl.when(k + 1 < n_k)
    def _():
        dma(k + 1, next_slot).start()

    dma(k, slot).wait()
    x = x_vmem[slot]  # [tile_h+2, W+2, Cin]
    g1 = g1_ref[0, 0][None, None, :]
    b1 = b1_ref[0, 0][None, None, :]
    g2 = g2_ref[0, 0][None, None, :]
    b2 = b2_ref[0, 0][None, None, :]
    y1 = g1 * x + b1
    h = _lrelu(y1)          # comparison-free: bf16 vector compares
    y2 = g2 * h + b2        # are unsupported in packed layouts
    h = _lrelu(y2)

    # SAME-conv zero padding must stay zero: the halo's padded rows/cols went
    # through the modulation above (g*0 + b != 0) — mask them back out.
    th2, w2 = h.shape[0], h.shape[1]
    total_h = pl.num_programs(1) * tile_h  # H (unpadded)
    # 3D iotas: Mosaic can't minor-dim-reshape sub-32-bit (bool) vectors
    row_ids = lax.broadcasted_iota(jnp.int32, (th2, w2, 1), 0) + i * tile_h
    col_ids = lax.broadcasted_iota(jnp.int32, (th2, w2, 1), 1)
    valid = ((row_ids >= 1) & (row_ids <= total_h)
             & (col_ids >= 1) & (col_ids <= out_w))
    h = jnp.where(valid, h, 0.0)

    cin = h.shape[-1]
    cout = w_ref.shape[-1]
    # 9 shifted matmuls, arranged so every reshape is contiguous: matmul the
    # full-width row band (rows dy..dy+tile_h are a contiguous slice of h),
    # then apply the dx shift on the *output* side as a strided slice-add —
    # Mosaic faults on reshapes of width-strided slices, adds are fine.
    acc = jnp.zeros((tile_h, out_w, cout), jnp.float32)
    for dy in range(3):
        band = h[dy: dy + tile_h].reshape(tile_h * w2, cin)
        for dx in range(3):
            z = jnp.dot(band, w_ref[dy, dx],
                        preferred_element_type=jnp.float32)
            z = z.reshape(tile_h, w2, cout)
            acc = acc + z[:, dx: dx + out_w, :]
    out = acc + bias_ref[0, 0][None, None, :]
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_forward(x, g1, b1, g2, b2, w, bias):
    n, h, wdt, cin = x.shape
    cout = w.shape[-1]
    tile_h = _pick_row_tile(h, wdt, cin)
    # Width must land 8-sublane-aligned: manual DMA slices of an HBM array
    # whose second-to-last dim isn't a multiple of 8 FAULT the TPU worker
    # (root-caused empirically; rows — dim 1 — may be sliced freely). Pad
    # W+2 up to the next multiple of 8; the in-kernel validity mask already
    # zeroes columns beyond W+1.
    w_pad = -(-(wdt + 2) // 8) * 8
    x_padded = jnp.pad(x, ((0, 0), (1, 1), (1, w_pad - wdt - 1), (0, 0)))

    grid = (n, h // tile_h)
    vec = pl.BlockSpec((1, 1, cin), lambda b, i: (b, 0, 0))
    kernel = functools.partial(_kernel, tile_h=tile_h, out_w=wdt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x_padded stays in HBM
            vec, vec, vec, vec,
            pl.BlockSpec((3, 3, cin, cout), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wdt, cout),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w_pad, cin), x.dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x_padded, g1[:, None, :], b1[:, None, :], g2[:, None, :],
      b2[:, None, :], w, bias[None, None, :])


def _xla_composition(x, g1, b1, g2, b2, w, bias):
    """Oracle / backward path: same math in plain XLA ops."""
    y1 = g1[:, None, None, :] * x + b1[:, None, None, :]
    h = jnp.where(y1 >= 0, y1, y1 * NEG_SLOPE)
    y2 = g2[:, None, None, :] * h + b2[:, None, None, :]
    h = jnp.where(y2 >= 0, y2, y2 * NEG_SLOPE)
    y = lax.conv_general_dilated(
        h, w.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype)
    return y + bias.astype(h.dtype)


def _supported(x) -> bool:
    """On real TPU the manual-DMA path additionally requires lane-aligned
    channels (Cin % 128 == 0 — Mosaic rejects HBM slices of lane-padded
    arrays); other shapes fall back to the XLA composition. The width
    (sublane) alignment is handled internally by padding."""
    h, _, cin = x.shape[1:]
    if h % _pick_row_tile(h, x.shape[2], cin) != 0:
        return False
    return _interpret() or cin % 128 == 0


@jax.custom_vjp
def fused_modconv3x3(x, g1, b1, g2, b2, w, bias):
    """lrelu-modulated double affine followed by SAME 3x3 conv, one VMEM pass.

    x [B,H,W,Cin]; g*/b* [B,Cin]; w [3,3,Cin,Cout]; bias [Cout].
    Falls back to the XLA composition when the shape doesn't qualify
    (H must tile; on TPU, Cin must be a multiple of 128 — Mosaic's HBM
    lane-alignment rule for manual DMA slices).
    """
    if not _supported(x):
        return _xla_composition(x, g1, b1, g2, b2, w, bias)
    return _fused_forward(x, g1, b1, g2, b2, w, bias)


def _vjp_fwd(x, g1, b1, g2, b2, w, bias):
    return fused_modconv3x3(x, g1, b1, g2, b2, w, bias), (x, g1, b1, g2, b2,
                                                          w, bias)


def _vjp_bwd(res, dy):
    # Backward through the identical XLA composition (same values).
    _, vjp = jax.vjp(_xla_composition, *res)
    return vjp(dy)


fused_modconv3x3.defvjp(_vjp_fwd, _vjp_bwd)
