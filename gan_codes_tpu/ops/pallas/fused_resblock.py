"""Pallas TPU kernel: one ENTIRE generator residual block in a single pass.

The reference ResidualBlockG (`src/generator/residual_block.py:9-59`) is

    h1 = conv3x3(lrelu(g2*lrelu(g1*x + b1) + b2), W1) + c1     # DFBlock 1
    h2 = conv3x3(lrelu(g4*lrelu(g3*h1 + b3) + b4), W2) + c2    # DFBlock 2
    out = shortcut(x) + gamma * h2

The per-DFBlock kernel (`fused_modconv.py`) keeps the modulated activations
in VMEM but still writes `h1` to HBM between the two DFBlocks. This kernel
keeps `h1` resident too: each grid step DMAs a (tile+4)-row halo slice of x,
computes tile+2 rows of h1 in VMEM (recomputing the 2-row overlap between
adjacent tiles — ~2/tile extra conv1 FLOPs), modulates again, computes the
tile rows of h2, applies the shortcut (identity or 1x1 conv) and the
residual sum — one HBM read of x, one HBM write of out, nothing else.

gamma folding: `shortcut + gamma*h2 = shortcut + conv(m2, gamma*W2) +
gamma*c2`, so the learnable scalar is folded into W2/c2 *outside* the kernel
(zero in-kernel cost; one extra weight-sized multiply per step).

Backward runs through the plain XLA composition via custom_vjp (the fusion
win is forward HBM traffic; the backward's dW/dx convs are XLA's strength).

MEASURED NEGATIVE — bit-exact-validated on chip but 0.33-0.81x XLA across
the generator ladder (ROADMAP.md "Pallas verdict"); deliberately NOT wired
into the model. Kept as kernel-development evidence; do not call it from the
forward path expecting a win.

Hardware rules inherited from fused_modconv.py (root-caused in round 1):
  * manual DMA row slices need the sliced array's width dim 8-aligned -> x is
    pre-padded to Wp = align8(W+4) with a 2-col offset;
  * manual DMA needs lane-aligned channels (Cin % 128 == 0);
  * reshapes must be of contiguous row bands; column-strided slices may only
    be *added*, never reshaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_affine import NEG_SLOPE, _interpret, _lrelu


def _align8(n: int) -> int:
    return -(-n // 8) * 8


def _pick_tile(h: int, w: int, cin: int, dtype_bytes: int) -> int:
    """Largest row tile whose x halo slice stays under ~0.75MB (the pair
    kernel's live set — x, m1, h1, m2, two fp32 accumulators — is ~8-10x the
    input tile against the 16MB VMEM budget)."""
    budget = 768 * 1024
    wp = _align8(w + 4)
    for t in (64, 32, 16, 8, 4, 2):
        if h % t == 0 and (t + 4) * wp * cin * dtype_bytes <= budget:
            return t
    return 1


def _double_mod(x, ga, ba, gb, bb):
    return _lrelu(gb * _lrelu(ga * x + ba) + bb)


def _kernel(x_hbm, g1_ref, b1_ref, g2_ref, b2_ref, w1_ref, c1_ref,
            g3_ref, b3_ref, g4_ref, b4_ref, w2_ref, c2_ref, ws_ref, cs_ref,
            o_ref, x_vmem, sem, *, tile: int, out_w: int, has_shortcut: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    k = b * n_i + i
    n_k = pl.num_programs(0) * n_i
    slot = jax.lax.rem(k, 2)

    def dma(for_k, to_slot):
        bb = jax.lax.div(for_k, n_i)
        ii = jax.lax.rem(for_k, n_i)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile, tile + 4)],
            x_vmem.at[to_slot], sem.at[to_slot])

    @pl.when(k == 0)
    def _():
        dma(0, 0).start()

    @pl.when(k + 1 < n_k)
    def _():
        dma(k + 1, 1 - slot).start()

    dma(k, slot).wait()
    x = x_vmem[slot]                      # [tile+4, Wp, Cin]; img col = c-2
    wp = x.shape[1]
    cin = x.shape[-1]
    cout = w1_ref.shape[-1]
    total_h = n_i * tile                  # H

    def vec(ref):
        return ref[0, 0][None, None, :]

    # ---- DFBlock 1 pre-conv chain; semantic conv padding must stay zero ----
    m1 = _double_mod(x, vec(g1_ref), vec(b1_ref), vec(g2_ref), vec(b2_ref))
    rows = lax.broadcasted_iota(jnp.int32, (tile + 4, wp, 1), 0) + i * tile - 2
    cols = lax.broadcasted_iota(jnp.int32, (tile + 4, wp, 1), 1) - 2
    valid1 = ((rows >= 0) & (rows < total_h) & (cols >= 0) & (cols < out_w))
    m1 = jnp.where(valid1, m1, 0.0)

    # ---- conv1 -> h1 [tile+2, Wp-2, Cout]; h1 img coords: row i*tile+r-1,
    # col c1-1. 9 shifted band matmuls, fp32 accumulation.
    wm = wp - 2
    acc1 = jnp.zeros((tile + 2, wm, cout), jnp.float32)
    for dy in range(3):
        band = m1[dy: dy + tile + 2].reshape((tile + 2) * wp, cin)
        for dx in range(3):
            z = jnp.dot(band, w1_ref[dy, dx],
                        preferred_element_type=jnp.float32)
            z = z.reshape(tile + 2, wp, cout)
            acc1 = acc1 + z[:, dx: wm + dx, :]
    h1 = (acc1 + c1_ref[0, 0][None, None, :]).astype(x.dtype)

    # ---- DFBlock 2 pre-conv chain on the resident h1 ----
    m2 = _double_mod(h1, vec(g3_ref), vec(b3_ref), vec(g4_ref), vec(b4_ref))
    rows2 = lax.broadcasted_iota(jnp.int32, (tile + 2, wm, 1), 0) + i * tile - 1
    cols2 = lax.broadcasted_iota(jnp.int32, (tile + 2, wm, 1), 1) - 1
    valid2 = ((rows2 >= 0) & (rows2 < total_h) & (cols2 >= 0) & (cols2 < out_w))
    m2 = jnp.where(valid2, m2, 0.0)

    # ---- conv2 (weights pre-scaled by gamma) -> tile rows of gamma*h2 ----
    acc2 = jnp.zeros((tile, out_w, cout), jnp.float32)
    for dy in range(3):
        band = m2[dy: dy + tile].reshape(tile * wm, cout)
        for dx in range(3):
            z = jnp.dot(band, w2_ref[dy, dx],
                        preferred_element_type=jnp.float32)
            z = z.reshape(tile, wm, cout)
            acc2 = acc2 + z[:, dx: out_w + dx, :]
    res = acc2 + c2_ref[0, 0][None, None, :]

    # ---- shortcut + residual sum ----
    # Matmul the full-width row band (contiguous reshape), slice after:
    # reshaping a column-strided slice faults Mosaic; slicing for an add
    # is fine (round-1 root cause, see module docstring).
    if has_shortcut:
        xrow = x[2: 2 + tile].reshape(tile * wp, cin)
        s_full = jnp.dot(xrow, ws_ref[0, 0],
                         preferred_element_type=jnp.float32)
        s = (s_full.reshape(tile, wp, cout)[:, 2: 2 + out_w, :]
             + cs_ref[0, 0][None, None, :])
    else:
        s = x[2: 2 + tile, 2: 2 + out_w, :].astype(jnp.float32)
    o_ref[0] = (s + res).astype(o_ref.dtype)


def _fused_forward(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2,
                   gamma, ws, cs):
    n, h, w, cin = x.shape
    cout = w1.shape[-1]
    tile = _pick_tile(h, w, cin, x.dtype.itemsize)
    wp = _align8(w + 4)
    x_padded = jnp.pad(x, ((0, 0), (2, 2), (2, wp - w - 2), (0, 0)))

    # fold the learnable residual scale into DFBlock 2's conv
    gamma = gamma.astype(jnp.float32)
    w2s = (w2.astype(jnp.float32) * gamma).astype(w2.dtype)
    c2s = (c2.astype(jnp.float32) * gamma).astype(c2.dtype)

    has_shortcut = ws is not None
    if not has_shortcut:
        # dummy refs keep the kernel signature static
        ws = jnp.zeros((1, 1, cin, cout), x.dtype)
        cs = jnp.zeros((cout,), x.dtype)

    grid = (n, h // tile)
    vin = pl.BlockSpec((1, 1, cin), lambda b, i: (b, 0, 0))
    vout = pl.BlockSpec((1, 1, cout), lambda b, i: (b, 0, 0))
    one_out = pl.BlockSpec((1, 1, cout), lambda b, i: (0, 0, 0))
    kernel = functools.partial(_kernel, tile=tile, out_w=w,
                               has_shortcut=has_shortcut)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x_padded stays in HBM
            vin, vin, vin, vin,
            pl.BlockSpec((3, 3, cin, cout), lambda b, i: (0, 0, 0, 0)),
            one_out,
            vout, vout, vout, vout,
            pl.BlockSpec((3, 3, cout, cout), lambda b, i: (0, 0, 0, 0)),
            one_out,
            pl.BlockSpec((1, 1, cin, cout), lambda b, i: (0, 0, 0, 0)),
            one_out,
        ],
        out_specs=pl.BlockSpec((1, tile, w, cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 4, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x_padded, g1[:, None, :], b1[:, None, :], g2[:, None, :],
      b2[:, None, :], w1, c1[None, None, :], g3[:, None, :], b3[:, None, :],
      g4[:, None, :], b4[:, None, :], w2s, c2s[None, None, :],
      ws, cs[None, None, :])


def _xla_composition(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2,
                     gamma, ws, cs):
    """Same math in plain XLA ops (oracle, fallback, and backward path)."""
    def mod(t, ga, ba, gb, bb):
        y1 = ga[:, None, None, :] * t + ba[:, None, None, :]
        h = jnp.where(y1 >= 0, y1, y1 * NEG_SLOPE)
        y2 = gb[:, None, None, :] * h + bb[:, None, None, :]
        return jnp.where(y2 >= 0, y2, y2 * NEG_SLOPE)

    def conv(t, w, c):
        y = lax.conv_general_dilated(
            t, w.astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=t.dtype)
        return y + c.astype(t.dtype)

    h1 = conv(mod(x, g1, b1, g2, b2), w1, c1)
    h2 = conv(mod(h1, g3, b3, g4, b4), w2, c2)
    shortcut = x
    if ws is not None:
        shortcut = lax.conv_general_dilated(
            x, ws.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype) + cs.astype(x.dtype)
    return shortcut + gamma.astype(x.dtype) * h2


def _supported(x) -> bool:
    """Same hardware rules as fused_modconv: the row tile must be a real
    (>= 8-row) tile — _pick_tile only returns divisors of H, so the previous
    `h % tile` check was dead code and odd H silently degenerated to tile=1
    (a 5-row DMA per output row). On real TPU the manual halo DMA also needs
    lane-aligned channels (Cin % 128 == 0)."""
    _, h, w, cin = x.shape
    if _pick_tile(h, w, cin, x.dtype.itemsize) < 8:
        return False
    return _interpret() or cin % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_resblock_g(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2,
                     gamma, ws, cs):
    """Whole ResidualBlockG forward in one VMEM pass (h1 never touches HBM).

    x [B,H,W,Cin]; g1..b2 [B,Cin]; w1 [3,3,Cin,Cout]; c1 [Cout];
    g3..b4 [B,Cout]; w2 [3,3,Cout,Cout]; c2 [Cout]; gamma scalar;
    ws [1,1,Cin,Cout] / cs [Cout] or None (identity shortcut).
    Falls back to the XLA composition when the shape doesn't qualify.
    """
    if not _supported(x):
        return _xla_composition(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4,
                                w2, c2, gamma, ws, cs)
    return _fused_forward(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2,
                          gamma, ws, cs)


def _vjp_fwd(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2, gamma, ws, cs):
    out = fused_resblock_g(x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2,
                           gamma, ws, cs)
    return out, (x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2, gamma,
                 ws, cs)


def _vjp_bwd(res, dy):
    _, vjp = jax.vjp(_xla_composition, *res)
    return vjp(dy)


fused_resblock_g.defvjp(_vjp_fwd, _vjp_bwd)
