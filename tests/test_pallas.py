"""Pallas fused DFBlock-modulation kernel: forward and custom-VJP correctness
vs the jnp composition (interpreter mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_codes_tpu.ops import blocks, fusion
from gan_codes_tpu.ops.pallas.fused_affine import (
    fused_double_affine_leaky, reference_double_affine_leaky)

KEY = jax.random.PRNGKey(9)


def _inputs(b=2, h=8, w=8, c=16):
    ks = jax.random.split(KEY, 5)
    x = jax.random.normal(ks[0], (b, h, w, c))
    g1 = jax.random.normal(ks[1], (b, c))
    b1 = jax.random.normal(ks[2], (b, c))
    g2 = jax.random.normal(ks[3], (b, c))
    b2 = jax.random.normal(ks[4], (b, c))
    return x, g1, b1, g2, b2


class TestFusedForward:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 4, 4, 32),
                                       (3, 16, 16, 8)])
    def test_matches_reference(self, shape):
        b, h, w, c = shape
        x, g1, b1, g2, b2 = _inputs(b, h, w, c)
        got = fused_double_affine_leaky(x, g1, b1, g2, b2)
        want = reference_double_affine_leaky(x, g1, b1, g2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_under_jit(self):
        x, g1, b1, g2, b2 = _inputs()
        got = jax.jit(fused_double_affine_leaky)(x, g1, b1, g2, b2)
        want = reference_double_affine_leaky(x, g1, b1, g2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestFusedVJP:
    def test_grads_match_reference(self):
        x, g1, b1, g2, b2 = _inputs()

        def loss_fused(*args):
            return jnp.sum(jnp.sin(fused_double_affine_leaky(*args)))

        def loss_ref(*args):
            return jnp.sum(jnp.sin(reference_double_affine_leaky(*args)))

        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g1, b1, g2, b2)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g1, b1, g2, b2)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-5, rtol=1e-5)

    def test_multi_tile_accumulation(self):
        """HW large enough to span multiple grid tiles: the dg/db
        accumulation across j must be exact."""
        x, g1, b1, g2, b2 = _inputs(b=2, h=32, w=32, c=8)

        def loss_fused(g1, b1):
            return jnp.sum(fused_double_affine_leaky(x, g1, b1, g2, b2) ** 2)

        def loss_ref(g1, b1):
            return jnp.sum(reference_double_affine_leaky(x, g1, b1, g2, b2) ** 2)

        got = jax.grad(loss_fused, argnums=(0, 1))(g1, b1)
        want = jax.grad(loss_ref, argnums=(0, 1))(g1, b1)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-4, rtol=1e-4)


class TestBlockIntegration:
    def test_res_block_g_pallas_path_matches(self):
        kp, kx, ks = jax.random.split(KEY, 3)
        p = blocks.init_res_block_g(kp, 16, 8, sentence_dim=12,
                                    affine_hidden=24)
        p["gamma"] = jnp.asarray(0.5, jnp.float32)
        x = jax.random.normal(kx, (2, 8, 8, 16))
        s = jax.random.normal(ks, (2, 12))
        base = blocks.res_block_g(p, x, s, use_pallas=False)
        fused = blocks.res_block_g(p, x, s, use_pallas=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    def test_generator_pallas_flag(self):
        import dataclasses

        from gan_codes_tpu.config import GeneratorConfig
        from gan_codes_tpu.models.generator import (generator_apply,
                                                    init_generator)

        cfg = GeneratorConfig(n_channels=4, image_size=16, sentence_dim=12)
        cfg_p = dataclasses.replace(cfg, use_pallas=True)
        p = init_generator(KEY, cfg)
        noise = jax.random.normal(KEY, (2, cfg.latent_dim))
        sent = jax.random.normal(KEY, (2, 12))
        base = generator_apply(p, cfg, noise, sent)
        fused = generator_apply(p, cfg_p, noise, sent)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)


class TestFusedModConv:
    """Fused modulation+conv3x3 kernel vs the XLA composition."""

    def _inputs(self, b=2, h=16, w=16, cin=8, cout=16):
        from gan_codes_tpu.ops import nn
        ks = jax.random.split(jax.random.PRNGKey(3), 7)
        x = jax.random.normal(ks[0], (b, h, w, cin))
        g1 = jax.random.normal(ks[1], (b, cin))
        b1 = jax.random.normal(ks[2], (b, cin))
        g2 = jax.random.normal(ks[3], (b, cin))
        b2 = jax.random.normal(ks[4], (b, cin))
        conv = nn.torch_conv_init(ks[5], 3, 3, cin, cout)
        return x, g1, b1, g2, b2, conv["w"], conv["b"]

    def test_forward_matches_xla(self):
        from gan_codes_tpu.ops.pallas.fused_modconv import (
            _xla_composition, fused_modconv3x3)
        args = self._inputs()
        got = fused_modconv3x3(*args)
        want = _xla_composition(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_forward_under_jit_multi_tile(self):
        from gan_codes_tpu.ops.pallas.fused_modconv import (
            _xla_composition, fused_modconv3x3)
        args = self._inputs(b=1, h=32, w=8, cin=4, cout=4)
        got = jax.jit(fused_modconv3x3)(*args)
        want = _xla_composition(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_grads_match_xla(self):
        from gan_codes_tpu.ops.pallas.fused_modconv import (
            _xla_composition, fused_modconv3x3)
        args = self._inputs(b=2, h=8, w=8, cin=4, cout=8)

        def lf(fn):
            return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

        got = jax.grad(lf(fused_modconv3x3), argnums=tuple(range(7)))(*args)
        want = jax.grad(lf(_xla_composition), argnums=tuple(range(7)))(*args)
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                       atol=1e-4, rtol=1e-4)
