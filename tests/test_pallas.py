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


class TestFusedResBlock:
    """Whole-ResidualBlockG kernel (ops/pallas/fused_resblock.py): forward vs
    the XLA composition, VJP wiring, shortcut variants, odd widths."""

    def _args(self, b=2, h=8, w=8, cin=16, cout=16, shortcut=False, seed=3):
        from gan_codes_tpu.ops.pallas import fused_resblock as fr
        ks = jax.random.split(jax.random.PRNGKey(seed), 16)
        vec = lambda k, c: jax.random.normal(k, (b, c)) * 0.5
        x = jax.random.normal(ks[0], (b, h, w, cin))
        g1, b1, g2, b2 = (vec(ks[i], cin) for i in range(1, 5))
        g3, b3, g4, b4 = (vec(ks[i], cout) for i in range(5, 9))
        w1 = jax.random.normal(ks[9], (3, 3, cin, cout)) * 0.05
        c1 = jax.random.normal(ks[10], (cout,)) * 0.1
        w2 = jax.random.normal(ks[11], (3, 3, cout, cout)) * 0.05
        c2 = jax.random.normal(ks[12], (cout,)) * 0.1
        gamma = jnp.asarray(0.7)
        ws = (jax.random.normal(ks[13], (1, 1, cin, cout)) * 0.1
              if shortcut else None)
        cs = (jax.random.normal(ks[14], (cout,)) * 0.1 if shortcut else None)
        return (x, g1, b1, g2, b2, w1, c1, g3, b3, g4, b4, w2, c2, gamma,
                ws, cs), fr

    @pytest.mark.parametrize("case", [
        dict(h=8, w=8, cin=16, cout=16, shortcut=False),
        dict(h=16, w=16, cin=32, cout=16, shortcut=True),
        dict(h=8, w=12, cin=16, cout=8, shortcut=True),  # non-aligned width
    ])
    def test_forward_matches_xla(self, case):
        args, fr = self._args(**case)
        got = fr.fused_resblock_g(*args)
        want = fr._xla_composition(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    def test_forward_under_jit_multi_tile(self):
        # h=128, w=8, cin=16 -> _pick_tile returns 64 (verified), so the
        # grid really has 2 row tiles and the i>0 halo/DMA paths execute
        # (h=16 was single-tile and left them uncovered)
        from gan_codes_tpu.ops.pallas.fused_resblock import _pick_tile
        assert _pick_tile(128, 8, 16, 4) == 64
        args, fr = self._args(h=128, w=8, cin=16, cout=16)
        got = jax.jit(fr.fused_resblock_g)(*args)
        want = fr._xla_composition(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    def test_grads_match_xla(self):
        args, fr = self._args(h=8, w=8, cin=16, cout=16, shortcut=True)

        def loss_pallas(*a):
            return jnp.sum(fr.fused_resblock_g(*a) ** 2)

        def loss_xla(*a):
            return jnp.sum(fr._xla_composition(*a) ** 2)

        # differentiate w.r.t. x, the affine vectors, conv weights, and gamma
        argnums = tuple(range(14))
        got = jax.grad(loss_pallas, argnums)(*args)
        want = jax.grad(loss_xla, argnums)(*args)
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                       atol=2e-3, rtol=1e-4)

    def test_equals_res_block_g_op(self):
        """The kernel computes exactly ops/blocks.py::res_block_g at shared
        params (reference `src/generator/residual_block.py:9-59`)."""
        from gan_codes_tpu.ops.pallas import fused_resblock as fr
        key = jax.random.PRNGKey(5)
        b, h, w, cin, cout = 2, 8, 8, 16, 8
        params = blocks.init_res_block_g(key, cin, cout, sentence_dim=12,
                                         affine_hidden=10)
        x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, cin))
        sent = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
        want = blocks.res_block_g(params, x, sent)

        g1, b1 = fusion.affine_params(params["affine_1"], sent)
        g2, b2 = fusion.affine_params(params["affine_2"], sent)
        g3, b3 = fusion.affine_params(params["affine_3"], sent)
        g4, b4 = fusion.affine_params(params["affine_4"], sent)
        got = fr.fused_resblock_g(
            x, g1, b1, g2, b2, params["conv_1"]["w"], params["conv_1"]["b"],
            g3, b3, g4, b4, params["conv_2"]["w"], params["conv_2"]["b"],
            params["gamma"], params["shortcut_conv"]["w"],
            params["shortcut_conv"]["b"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)
