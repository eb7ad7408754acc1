"""Exactness tests for image-boundary padding (TrainConfig.image_pad +
GeneratorConfig.image_pad).

RGB's 3 channels fill 3/128 MXU output lanes in the MA-GP / G-phase
grad-to-image convs and 27/128 reduction rows in D's stem conv — the
slowest-rate convs in the device trace (artifacts/trace_r3_postfold).
Padding the image-channel dim with zeros is exact math: G's conv_out pad
lanes come from zero kernels/bias and are sliced off before tanh, D's stem
kernel rows matching the pad channels are zeros, and the GP's image-grad on
pad channels is exactly zero so the penalty norm is unchanged. These tests
pin all of that — forwards, the GP value AND its d/d(D-params) double
backward, and the composed 3-phase train step (alone and combined with conv
lane widening).
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, LossConfig,
                                  TextEncoderConfig, TrainConfig)
from gan_codes_tpu.models.discriminator import (discriminator_embeds,
                                                discriminator_logits,
                                                init_discriminator)
from gan_codes_tpu.models.generator import generator_apply, init_generator
from gan_codes_tpu.models.text_encoder import init_text_encoder
from gan_codes_tpu.ops.nn import pad_channels as _pad_img
from gan_codes_tpu.train import losses
from gan_codes_tpu.train.state import create_train_state
from gan_codes_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(21)


def _liven_gammas(params):
    for i, bp in enumerate(params["blocks"]):
        bp["gamma"] = jnp.asarray(0.3 + 0.07 * i, jnp.float32)


class TestGeneratorImagePad:
    def test_forward_and_grads_exact(self):
        base = GeneratorConfig(n_channels=4, image_size=32)
        kp, kn, ks = jax.random.split(KEY, 3)
        p = init_generator(kp, base)
        _liven_gammas(p)
        noise = jax.random.normal(kn, (3, base.latent_dim))
        sents = jax.random.normal(ks, (3, base.sentence_dim))

        want = generator_apply(p, base, noise, sents)
        padded_cfg = dataclasses.replace(base, image_pad=16)
        got = generator_apply(p, padded_cfg, noise, sents)
        assert got.shape == want.shape  # public contract: [B, H, W, 3]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        def loss(cfg):
            return lambda pp: jnp.sum(
                generator_apply(pp, cfg, noise, sents) ** 2)

        g0 = jax.grad(loss(base))(p)
        g1 = jax.grad(loss(padded_cfg))(p)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_keep_pad_output(self):
        """keep_pad=True (the train step's mode) returns the widened tensor
        with pad lanes exactly zero even post-tanh, and real lanes equal to
        the sliced output."""
        base = GeneratorConfig(n_channels=4, image_size=32)
        padded_cfg = dataclasses.replace(base, image_pad=16)
        kp, kn, ks = jax.random.split(KEY, 3)
        p = init_generator(kp, base)
        _liven_gammas(p)
        noise = jax.random.normal(kn, (3, base.latent_dim))
        sents = jax.random.normal(ks, (3, base.sentence_dim))

        wide = generator_apply(p, padded_cfg, noise, sents, keep_pad=True)
        assert wide.shape[-1] == 16
        assert float(jnp.abs(wide[..., 3:]).max()) == 0.0
        want = generator_apply(p, base, noise, sents)
        np.testing.assert_allclose(np.asarray(wide[..., :3]),
                                   np.asarray(want), atol=1e-5, rtol=1e-5)

    def test_conv_out_actually_widens(self):
        cfg = dataclasses.replace(GeneratorConfig(n_channels=4,
                                                  image_size=32),
                                  image_pad=16)
        p = init_generator(KEY, cfg)
        noise = jnp.zeros((2, cfg.latent_dim))
        sents = jnp.zeros((2, cfg.sentence_dim))
        text = str(jax.make_jaxpr(
            lambda pp: generator_apply(pp, cfg, noise, sents))(p))
        assert "f32[2,32,32,16]" in text, "conv_out must emit 16 lanes"


class TestDiscriminatorImagePad:
    def _setup(self):
        cfg = DiscriminatorConfig(n_channels=4, image_size=16,
                                  sentence_dim=10)
        kp, kr, ks = jax.random.split(KEY, 3)
        p = init_discriminator(kp, cfg)
        _liven_gammas(p)
        imgs = jax.random.normal(kr, (3, 16, 16, 3))
        sents = jax.random.normal(ks, (3, 10))
        return p, imgs, sents

    def test_embeds_on_padded_image_exact(self):
        p, imgs, _ = self._setup()
        base = discriminator_embeds(p, imgs)
        got = discriminator_embeds(p, _pad_img(imgs, 16))
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    def test_gp_value_and_d_grads_exact(self):
        """MA-GP differentiates w.r.t. the (padded) image: the image-grad on
        pad channels must be exactly zero so the norm — and the second-order
        d(penalty)/d(D-params) — is unchanged."""
        p, imgs, sents = self._setup()

        def gp(images_in):
            return lambda dp: losses.ma_gradient_penalty(
                discriminator_embeds, discriminator_logits, dp, images_in,
                sents, LossConfig())

        v0, g0 = jax.value_and_grad(gp(imgs))(p)
        v1, g1 = jax.value_and_grad(gp(_pad_img(imgs, 16)))(p)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_image_grad_pad_channels_are_zero(self):
        p, imgs, sents = self._setup()

        def logit_sum(images_in):
            e = discriminator_embeds(p, images_in)
            return jnp.sum(discriminator_logits(p, e, sents))

        gi = jax.grad(logit_sum)(_pad_img(imgs, 16))
        assert float(jnp.abs(gi[..., 3:]).max()) == 0.0
        gi_ref = jax.grad(logit_sum)(imgs)
        np.testing.assert_allclose(np.asarray(gi[..., :3]),
                                   np.asarray(gi_ref), atol=1e-6, rtol=1e-5)


class TestFullStepImagePad:
    def _mk(self, image_pad=0, lane_pad=0):
        return GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16,
                                      image_pad=image_pad,
                                      lane_pad=lane_pad),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                              lane_pad=lane_pad),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
            train=TrainConfig(image_pad=image_pad),
        )

    @pytest.mark.parametrize("combo", [dict(image_pad=16),
                                       dict(image_pad=16, lane_pad=16)])
    def test_two_steps_exact(self, combo):
        te = init_text_encoder(jax.random.PRNGKey(1),
                               self._mk().text_encoder)
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        finals = []
        for kw in ({}, combo):
            cfg = self._mk(**kw)
            state = create_train_state(KEY, cfg)
            step = jax.jit(make_train_step(cfg))
            for _ in range(2):
                state, m = step(state, te, images, caps, lens)
            finals.append((state, m))
        (s0, m0), (s1, m1) = finals
        for k in m0:
            np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                       rtol=1e-5, err_msg=k)
        for tower in ("d_params", "g_params"):
            for a, b in zip(jax.tree.leaves(getattr(s1, tower)),
                            jax.tree.leaves(getattr(s0, tower))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6, rtol=1e-5)
