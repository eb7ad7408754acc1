"""CPU smoke tests for the chip A/B harness code paths.

The lane/imgpad A/B (tools/lanepad_ab.py) and phase ablation
(tools/step_ablate.py) run unattended in a queued TPU-relay window; a
trivial wiring error (bad kwarg, config routing typo) would burn that
scarce window with no data. These tests execute the exact same entry
points at toy size on CPU so the queue can only fail for chip-side
reasons. (Numerical exactness of the knobs themselves is pinned in
tests/test_image_pad.py and tests/test_parity.py::TestLanePad.)
"""
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")  # bench.py lives at the repo root, outside the pkg

import bench

TINY = dict(batch=2, iters=1, image_size=16)


class TestBenchStepArms:
    """Every kwarg combination the A/B and bench candidates use."""

    def test_imgpad_arm(self):
        ips = bench.bench_step("bfloat16", gp_dtype="bfloat16",
                               generator_overrides={"image_pad": 16},
                               train_overrides={"image_pad": 16}, **TINY)
        assert np.isfinite(ips) and ips > 0

    def test_lane_arm_both_towers(self):
        over = {"lane_pad": 16, "lane_pad_min_ch": 8}
        ips = bench.bench_step("bfloat16", gp_dtype="bfloat16",
                               generator_overrides=over,
                               discriminator_overrides=over, **TINY)
        assert np.isfinite(ips) and ips > 0

    def test_combined_arm(self):
        ips = bench.bench_step(
            "bfloat16", gp_dtype="bfloat16",
            generator_overrides={"image_pad": 16, "lane_pad": 16,
                                 "lane_pad_min_ch": 8},
            discriminator_overrides={"lane_pad": 16, "lane_pad_min_ch": 8},
            train_overrides={"image_pad": 16}, **TINY)
        assert np.isfinite(ips) and ips > 0

    def test_lazy_gp_arm(self):
        ips = bench.bench_step("bfloat16", gp_dtype="bfloat16", batch=2,
                               iters=2, image_size=16,
                               loss_overrides={"gp_interval": 2})
        assert np.isfinite(ips) and ips > 0


def test_step_ablate_builds_and_runs():
    from gan_codes_tpu.config import GANConfig
    from gan_codes_tpu.models.text_encoder import (init_text_encoder,
                                                   text_encoder_apply)
    from gan_codes_tpu.train.state import create_train_state
    from tools.step_ablate import make_ablated_step

    cfg = GANConfig.for_image_size(
        16, batch_size=2, compute_dtype="bfloat16",
        generator_overrides={"image_pad": 16, "lane_pad": 16},
        discriminator_overrides={"lane_pad": 16},
        image_pad=16, n_channels=4)
    key = jax.random.PRNGKey(0)
    te = init_text_encoder(key, cfg.text_encoder)
    caps = jax.random.randint(key, (2, cfg.text_encoder.max_len), 1,
                              cfg.text_encoder.vocab_size)
    lens = jax.numpy.full((2,), cfg.text_encoder.max_len, jax.numpy.int32)
    sents = text_encoder_apply(te, cfg.text_encoder, caps, lens)
    images = jax.random.normal(key, (2, 16, 16, 3))
    state = jax.jit(lambda k: create_train_state(k, cfg))(key)

    for skip in ((), ("gp",)):
        step = jax.jit(make_ablated_step(cfg, skip=skip))
        new_state, out = step(state, sents, images)
        assert np.isfinite(float(out)), f"skip={skip}"
