"""Tests for the perf tooling's math (tools/trace_report.py).

The wall analysis (artifacts/trace_r3/WALL.md) hangs on exact useful-MAC
counting of every convolution form XLA emits — forward convs, padded
full-correlation input gradients, lhs_dilated transposed convs, strided
weight gradients. `dim_tap_sum` is the per-spatial-dim core; these tests
pin it against a brute-force sliding-window count and check the
end-to-end FLOP parse on real HLO instruction shapes."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from trace_report import conv_flops_from_line, dim_tap_sum, parse_window


def brute_taps(out_size, in_size, k, stride, pad_lo, lhs_dil, rhs_dil):
    """Count (output position, kernel tap) pairs that touch a real input
    element by literally materializing the dilated/padded axis."""
    padded_in = (in_size - 1) * lhs_dil + 1 if in_size > 0 else 0
    real = np.zeros(padded_in, bool)
    real[::lhs_dil] = True
    total = 0
    for j in range(out_size):
        for t in range(k):
            p = j * stride + t * rhs_dil - pad_lo
            if 0 <= p < padded_in and real[p]:
                total += 1
    return total


class TestDimTapSum:
    def test_plain_forward_conv(self):
        # 3x3 stride 1 pad 1 on 8 -> every output sees k taps except edges
        assert dim_tap_sum(8, 8, 3, 1, 1, 1, 1) == brute_taps(8, 8, 3, 1, 1, 1, 1)
        # interior-only sanity: 8 outputs x 3 taps - 2 edge misses
        assert dim_tap_sum(8, 8, 3, 1, 1, 1, 1) == 8 * 3 - 2

    def test_strided(self):
        assert dim_tap_sum(4, 8, 4, 2, 1, 1, 1) == brute_taps(4, 8, 4, 2, 1, 1, 1)

    @pytest.mark.parametrize("out,inp,k,s,p,ld,rd", [
        (128, 1, 128, 1, 127, 1, 1),    # XLA full-correlation input grad
        (64, 128, 3, 2, 1, 1, 1),       # strided forward
        (128, 64, 3, 1, 2, 2, 1),       # transposed conv (lhs_dilate=2)
        (3, 256, 256, 1, 1, 1, 1),      # weight gradient (huge "kernel")
        (5, 7, 4, 3, 2, 2, 3),          # everything at once
        (1, 1, 1, 1, 0, 1, 1),          # degenerate
    ])
    def test_matches_bruteforce(self, out, inp, k, s, p, ld, rd):
        assert dim_tap_sum(out, inp, k, s, p, ld, rd) == \
            brute_taps(out, inp, k, s, p, ld, rd)


class TestParseWindow:
    def test_defaults_when_fields_omitted(self):
        sizes, strides, pads, ld, rd = parse_window(
            "convolution(...), window={size=3x3}, dim_labels=...", 2)
        assert sizes == [3, 3] and strides == [1, 1]
        assert pads == [(0, 0), (0, 0)] and ld == [1, 1] and rd == [1, 1]

    def test_full_window(self):
        sizes, strides, pads, ld, rd = parse_window(
            "window={size=4x4 stride=2x2 pad=1_1x1_1 lhs_dilate=2x2 "
            "rhs_dilate=1x1}", 2)
        assert sizes == [4, 4] and strides == [2, 2]
        assert pads == [(1, 1), (1, 1)] and ld == [2, 2] and rd == [1, 1]


class TestConvFlops:
    def test_forward_conv_flops(self):
        # NHWC 3x3 pad-1 conv: B=2, 8x8, Cin=4 -> Cout=8
        line = ('  %c = bf16[2,8,8,8]{3,2,1,0} convolution(%a, %w), '
                'window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f')
        shapes = {"a": [2, 8, 8, 4], "w": [3, 3, 4, 8]}
        flops, info = conv_flops_from_line(line, shapes)
        # interior count per dim: 8*3-2 = 22 -> taps 22*22
        assert flops == 2 * (2 * 8) * 4 * 22 * 22
        assert info["cout"] == 8

    def test_input_gradient_full_correlation_equals_forward(self):
        # dL/dx of a 1x1 conv, XLA's padded form: lhs spatial 1x1,
        # window 128x128 pad 127 -> exactly the forward conv's FLOPs.
        line = ('  %c = bf16[256,128,128,32]{0,3,2,1} convolution(%k, %g), '
                'window={size=128x128 pad=127_127x127_127 rhs_reversal=1x1},'
                ' dim_labels=01bf_o01i->f01b')
        shapes = {"k": [1, 1, 32, 64], "g": [256, 128, 128, 64]}
        flops, info = conv_flops_from_line(line, shapes)
        # forward: 2 * B(256) * 128*128 * Cout(32) * Cin(64) * 1x1 kernel
        assert flops == 2 * 256 * 128 * 128 * 32 * 64

    def test_unresolvable_operand_returns_zero(self):
        line = ('  %c = bf16[2,8,8,8]{3,2,1,0} convolution(%a, %w), '
                'window={size=3x3}, dim_labels=b01f_01io->b01f')
        flops, info = conv_flops_from_line(line, {"a": [2, 8, 8, 4]})
        assert flops == 0 and info is None


class TestLazyGpReport:
    """Decision-rule unit tests for tools/lazy_gp_ab.py::build_report (the
    gp_interval promotion evidence harness) — the aggregation must be
    correct BEFORE it spends an hour of chip time."""

    @staticmethod
    def _leg(fid, g=0.5, d=1.5, gp=0.01, n=40):
        return {"fid_score": np.full(n, fid, np.float64),
                "is_score": np.full(n, 1.2), "g_loss": np.full(n, g),
                "d_loss": np.full(n, d), "d_gp_loss": np.full(n, gp),
                "epoch_seconds": np.full(n, 1.0)}

    def _report(self, fid1a, fid4a, fid1b, **cand_overrides):
        from lazy_gp_ab import build_report
        legs = {"gp4_seedA": self._leg(fid4a, **cand_overrides),
                "gp1_seedA": self._leg(fid1a), "gp1_seedB": self._leg(fid1b)}
        return build_report(legs, 4)

    def test_promotes_within_noise(self):
        r = self._report(fid1a=100.0, fid4a=103.0, fid1b=104.0)
        # effect 3.0 <= max(1.5*4.0, 10.0) = 10.0
        assert r["verdict"] == "PROMOTE"
        assert r["fid_effect_gp_interval"] == 3.0
        assert r["fid_noise_cross_seed"] == 4.0

    def test_rejects_large_effect(self):
        r = self._report(fid1a=100.0, fid4a=130.0, fid1b=101.0)
        # effect 30 > max(1.5*1, 10.0)
        assert r["verdict"] == "KEEP_OPT_IN"

    def test_rejects_unhealthy_candidate_even_if_fid_close(self):
        r = self._report(fid1a=100.0, fid4a=100.5, fid1b=101.0, d=5.0)
        assert r["verdict"] == "KEEP_OPT_IN"
        assert not r["health"]["gp4_seedA"]["d_loss_band"]

    def test_rejects_nonfinite_candidate(self):
        r = self._report(fid1a=100.0, fid4a=float("inf"), fid1b=101.0)
        assert r["verdict"] == "KEEP_OPT_IN"

    def test_tail_mean_uses_last_quarter(self):
        from lazy_gp_ab import tail_mean
        x = np.concatenate([np.full(30, 100.0), np.full(10, 50.0)])
        assert tail_mean(x) == 50.0
        assert tail_mean(np.array([float("nan"), 3.0]), frac=1.0) == 3.0
