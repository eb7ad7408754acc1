"""Golden-parity tests: JAX ops/models vs functional-PyTorch oracles at shared
weights (SURVEY.md §4 test plan item (a))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_ref as tr
from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, TextEncoderConfig)
from gan_codes_tpu.models.discriminator import (discriminator_embeds,
                                                discriminator_logits,
                                                init_discriminator)
from gan_codes_tpu.models.generator import generator_apply, init_generator
from gan_codes_tpu.models.text_encoder import (convert_torch_state_dict,
                                               init_text_encoder,
                                               text_encoder_apply)
from gan_codes_tpu.ops import blocks, fusion, nn

KEY = jax.random.PRNGKey(42)


def allclose(a, b, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestPrimitives:
    def test_upsample_nearest_matches_interpolate(self):
        x = jax.random.normal(KEY, (2, 5, 7, 3))
        got = nn.upsample_nearest_2x(x)
        want = torch.nn.functional.interpolate(tr.nhwc2nchw(x).clone().detach(),
                                               scale_factor=2)
        allclose(got, tr.nchw2nhwc(want), atol=0)

    def test_avg_pool_matches_torch(self):
        x = jax.random.normal(KEY, (2, 8, 8, 5))
        got = nn.avg_pool2d(x, 2)
        want = torch.nn.functional.avg_pool2d(tr.nhwc2nchw(x), 2)
        allclose(got, tr.nchw2nhwc(want), atol=1e-6)

    def test_leaky_relu(self):
        x = jax.random.normal(KEY, (4, 4))
        got = nn.leaky_relu(x, 0.2)
        want = torch.nn.functional.leaky_relu(tr.j2t(x), 0.2)
        allclose(got, want.numpy(), atol=0)

    def test_conv2d_stride2_pad1(self):
        kx, kw = jax.random.split(KEY)
        x = jax.random.normal(kx, (2, 8, 8, 4))
        p = nn.torch_conv_init(kw, 4, 4, 4, 6, bias=False)
        got = nn.conv2d(p, x, stride=2, padding=1)
        want = torch.nn.functional.conv2d(tr.nhwc2nchw(x), tr.conv_w(p),
                                          stride=2, padding=1)
        allclose(got, tr.nchw2nhwc(want), atol=1e-5)


class TestBlocks:
    def test_affine_block(self):
        kp, kx, ks = jax.random.split(KEY, 3)
        p = fusion.init_affine(kp, 16, 32, 8)
        x = jax.random.normal(kx, (3, 5, 5, 8))
        s = jax.random.normal(ks, (3, 16))
        got = fusion.affine(p, x, s)
        want = tr.affine(p, tr.nhwc2nchw(x), tr.j2t(s))
        allclose(got, tr.nchw2nhwc(want))

    @pytest.mark.parametrize("in_ch,out_ch", [(16, 16), (16, 8)])
    def test_res_block_g(self, in_ch, out_ch):
        kp, kx, ks = jax.random.split(KEY, 3)
        p = blocks.init_res_block_g(kp, in_ch, out_ch, sentence_dim=12,
                                    affine_hidden=24)
        # nonzero gamma so the residual path is exercised
        p["gamma"] = jnp.asarray(0.7, jnp.float32)
        x = jax.random.normal(kx, (2, 6, 6, in_ch))
        s = jax.random.normal(ks, (2, 12))
        got = blocks.res_block_g(p, x, s)
        want = tr.res_block_g(p, tr.nhwc2nchw(x), tr.j2t(s))
        allclose(got, tr.nchw2nhwc(want))

    @pytest.mark.parametrize("in_ch,out_ch", [(8, 16), (16, 16)])
    def test_res_block_d(self, in_ch, out_ch):
        kp, kx = jax.random.split(KEY)
        p = blocks.init_res_block_d(kp, in_ch, out_ch)
        p["gamma"] = jnp.asarray(-0.3, jnp.float32)
        x = jax.random.normal(kx, (2, 8, 8, in_ch))
        got = blocks.res_block_d(p, x)
        want = tr.res_block_d(p, tr.nhwc2nchw(x))
        allclose(got, tr.nchw2nhwc(want))


class TestModels:
    def test_generator_remat_matches_baseline(self):
        """GeneratorConfig.remat_blocks changes the backward's memory
        strategy only: outputs and parameter gradients are identical."""
        import dataclasses
        import numpy as np
        cfg = GeneratorConfig(n_channels=4, image_size=16, sentence_dim=12)
        cfg_r = dataclasses.replace(cfg, remat_blocks=True)
        kp, kn, ks = jax.random.split(KEY, 3)
        p = jax.jit(lambda k: init_generator(k, cfg))(kp)
        noise = jax.random.normal(kn, (2, cfg.latent_dim))
        sent = jax.random.normal(ks, (2, cfg.sentence_dim))

        def grads(c):
            out = generator_apply(p, c, noise, sent)
            g = jax.grad(lambda pp: jnp.sum(
                generator_apply(pp, c, noise, sent) ** 2))(p)
            return out, g

        out0, g0 = grads(cfg)
        out1, g1 = grads(cfg_r)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                   atol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_conv3x3_on_upsampled_is_exact(self):
        """The folded 2x2 sub-pixel conv == conv3x3(upsample_nearest_2x(x))
        (kept as a measured-negative capability: 506.6 vs 529.6 img/s end to
        end on chip — see ops/blocks.py::res_block_g_up)."""
        import numpy as np
        from gan_codes_tpu.ops import nn
        for h, w, ci, co in [(4, 4, 3, 5), (8, 6, 16, 32), (5, 7, 4, 4)]:
            k = jax.random.fold_in(KEY, h * 31 + w)
            p = nn.torch_conv_init(k, 3, 3, ci, co, bias=True)
            x = jax.random.normal(jax.random.fold_in(k, 1), (2, h, w, ci))
            ref = nn.conv2d(p, nn.upsample_nearest_2x(x), stride=1, padding=1)
            got = nn.conv3x3_on_upsampled(p, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5)

    def test_fused_upsample_block_is_exact(self):
        """res_block_g_up == res_block_g after upsample (exact: the chain and
        1x1 shortcut commute with nearest-2x; conv1 folds to the sub-pixel
        form), and the generator's fused/plain paths agree bitwise in fwd."""
        import dataclasses
        import numpy as np
        from gan_codes_tpu.ops import blocks, nn

        for cin, cout in [(16, 16), (32, 16)]:
            kp, kx, ks = jax.random.split(jax.random.fold_in(KEY, cin), 3)
            p = blocks.init_res_block_g(kp, cin, cout, 12)
            x = jax.random.normal(kx, (2, 6, 6, cin))
            s = jax.random.normal(ks, (2, 12))
            ref = blocks.res_block_g(p, nn.upsample_nearest_2x(x), s)
            got = blocks.res_block_g_up(p, x, s)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

        cfg = GeneratorConfig(n_channels=4, image_size=32, sentence_dim=12)
        kp, kn, ks = jax.random.split(KEY, 3)
        p = jax.jit(lambda k: init_generator(k, cfg))(kp)
        noise = jax.random.normal(kn, (2, cfg.latent_dim))
        sent = jax.random.normal(ks, (2, 12))
        ref = generator_apply(p, dataclasses.replace(cfg, fuse_upsample=False),
                              noise, sent)
        got = generator_apply(p, cfg, noise, sent)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_generator_full_forward(self):
        cfg = GeneratorConfig(n_channels=8, image_size=32, sentence_dim=20)
        kp, kn, ks = jax.random.split(KEY, 3)
        p = init_generator(kp, cfg)
        # randomize the gamma scalars away from the 0 init
        for i, bp in enumerate(p["blocks"]):
            bp["gamma"] = jnp.asarray(0.1 * (i + 1), jnp.float32)
        noise = jax.random.normal(kn, (2, cfg.latent_dim))
        sent = jax.random.normal(ks, (2, cfg.sentence_dim))
        got = generator_apply(p, cfg, noise, sent)
        assert got.shape == (2, 32, 32, 3)
        want = tr.generator(p, cfg, noise, sent)
        allclose(got, tr.nchw2nhwc(want), atol=3e-4, rtol=3e-4)

    def test_discriminator_full_forward(self):
        cfg = DiscriminatorConfig(n_channels=8, image_size=32, sentence_dim=20)
        kp, kx, ks = jax.random.split(KEY, 3)
        p = init_discriminator(kp, cfg)
        for i, bp in enumerate(p["blocks"]):
            bp["gamma"] = jnp.asarray(0.2 * (i + 1), jnp.float32)
        x = jax.random.normal(kx, (2, 32, 32, 3))
        s = jax.random.normal(ks, (2, 20))
        emb = discriminator_embeds(p, x)
        assert emb.shape == (2, 4, 4, cfg.embed_channels)
        logits = discriminator_logits(p, emb, s)
        assert logits.shape == (2, 1, 1, 1)
        emb_t = tr.discriminator_embeds(p, tr.nhwc2nchw(x))
        allclose(emb, tr.nchw2nhwc(emb_t), atol=3e-4, rtol=3e-4)
        logits_t = tr.discriminator_logits(p, emb_t, tr.j2t(s))
        allclose(logits, tr.nchw2nhwc(logits_t), atol=3e-4, rtol=3e-4)

    def test_param_counts_match_reference(self):
        """Measured reference sizes: G 12.24M / D 19.65M / TE 2.08M (SURVEY §6)."""
        cfg = GANConfig.for_image_size(256)
        gp = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
        dp = jax.jit(lambda k: init_discriminator(k, cfg.discriminator))(KEY)
        tp = jax.jit(lambda k: init_text_encoder(k, cfg.text_encoder))(KEY)
        count = lambda t: sum(int(p.size) for p in jax.tree.leaves(t))
        assert count(gp) == 12_240_010
        assert abs(count(dp) - 19_645_254) < 10
        assert count(tp) == 2_075_320


class TestTextEncoderParity:
    """Masked-scan biLSTM vs torch packed-sequence LSTM (SURVEY §7 hard part #2)."""

    def _torch_encoder(self, cfg, seed=0):
        torch.manual_seed(seed)
        emb = torch.nn.Embedding(cfg.vocab_size, cfg.embed_dim)
        lstm = torch.nn.LSTM(cfg.embed_dim, cfg.per_direction_hidden, 1,
                             batch_first=True, bidirectional=cfg.bidirectional)
        return emb, lstm

    def _state_dict(self, emb, lstm):
        sd = {"encoder.weight": emb.weight.detach()}
        for name, p in lstm.named_parameters():
            sd[f"rnn.{name}"] = p.detach()
        return sd

    def test_packed_lstm_parity_unsorted_lengths(self):
        cfg = TextEncoderConfig(vocab_size=100, embed_dim=16, hidden_dim=24,
                                max_len=9)
        emb, lstm = self._torch_encoder(cfg)
        params = convert_torch_state_dict(self._state_dict(emb, lstm), cfg)

        rng = np.random.RandomState(7)
        caps = rng.randint(1, 100, size=(5, 9)).astype(np.int32)
        lens = np.array([3, 9, 1, 7, 5], dtype=np.int32)  # deliberately unsorted
        for i, l in enumerate(lens):
            caps[i, l:] = 0

        got = text_encoder_apply(params, cfg, jnp.asarray(caps), jnp.asarray(lens))

        with torch.no_grad():
            e = emb(torch.from_numpy(caps.astype(np.int64)))
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                e, lens.tolist(), batch_first=True, enforce_sorted=False)
            _, (h_n, _) = lstm(packed)
            want = h_n.transpose(0, 1).reshape(5, -1)
        allclose(got, want.numpy(), atol=5e-5, rtol=5e-4)

    def test_full_length_batch(self):
        cfg = TextEncoderConfig(vocab_size=50, embed_dim=8, hidden_dim=16,
                                max_len=6)
        emb, lstm = self._torch_encoder(cfg, seed=3)
        params = convert_torch_state_dict(self._state_dict(emb, lstm), cfg)
        caps = np.arange(24).reshape(4, 6).astype(np.int32) % 50
        lens = np.full((4,), 6, np.int32)
        got = text_encoder_apply(params, cfg, jnp.asarray(caps), jnp.asarray(lens))
        with torch.no_grad():
            e = emb(torch.from_numpy(caps.astype(np.int64)))
            _, (h_n, _) = lstm(e)
            want = h_n.transpose(0, 1).reshape(4, -1)
        allclose(got, want.numpy(), atol=5e-5, rtol=5e-4)

    def test_random_init_shapes(self):
        cfg = TextEncoderConfig(vocab_size=64, embed_dim=10, hidden_dim=8,
                                max_len=5)
        p = init_text_encoder(KEY, cfg)
        out = text_encoder_apply(p, cfg, jnp.zeros((2, 5), jnp.int32),
                                 jnp.array([2, 5]))
        assert out.shape == (2, 8)


class TestLanePad:
    """DiscriminatorConfig.lane_pad: trace-time zero-padding of D's narrow
    convs to fuller MXU lanes must be EXACT — forwards, gradients, and a
    whole 3-phase train step (`ops/nn.py::lane_pad_params`)."""

    def _setup(self, image_size=16):
        cfg = DiscriminatorConfig(n_channels=4, image_size=image_size,
                                  sentence_dim=10)
        kp, kr, ks = jax.random.split(jax.random.PRNGKey(5), 3)
        p = init_discriminator(kp, cfg)
        for i, bp in enumerate(p["blocks"]):
            bp["gamma"] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        imgs = jax.random.normal(kr, (3, image_size, image_size, 3))
        sents = jax.random.normal(ks, (3, 10))
        return cfg, p, imgs, sents

    @pytest.mark.parametrize("lane_pad", [8, 16, 64])
    def test_embeds_exact(self, lane_pad):
        # lane_pad=8: partial (only the 4-ch layers pad); 16: all narrow
        # layers pad; 64: wider than embed_channels, exercises the final
        # slice back to real width.
        _, p, imgs, _ = self._setup()
        base = discriminator_embeds(p, imgs)
        padded = discriminator_embeds(p, imgs, lane_pad=lane_pad)
        assert padded.shape == base.shape
        np.testing.assert_allclose(np.asarray(padded), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    def test_hinge_and_gp_grads_exact(self):
        import functools
        from gan_codes_tpu.config import LossConfig
        from gan_codes_tpu.train import losses

        _, p, imgs, sents = self._setup()
        fake = jax.random.normal(jax.random.PRNGKey(8), imgs.shape)
        padded_embeds = functools.partial(discriminator_embeds, lane_pad=16)

        def hinge(embeds_fn, dp):
            return losses.d_hinge_loss(embeds_fn, discriminator_logits, dp,
                                       imgs, fake, sents)

        def gp(embeds_fn, dp):
            return losses.ma_gradient_penalty(
                embeds_fn, discriminator_logits, dp, imgs, sents,
                LossConfig())

        for fn in (hinge, gp):
            v0, g0 = jax.value_and_grad(
                lambda dp: fn(discriminator_embeds, dp))(p)
            v1, g1 = jax.value_and_grad(lambda dp: fn(padded_embeds, dp))(p)
            np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, rtol=1e-4)

    def test_full_train_step_exact(self):
        import dataclasses
        from gan_codes_tpu.models.text_encoder import init_text_encoder
        from gan_codes_tpu.train.state import create_train_state
        from gan_codes_tpu.train.step import make_train_step

        def mk(lane_pad):
            return GANConfig(
                generator=GeneratorConfig(n_channels=4, image_size=16),
                discriminator=DiscriminatorConfig(n_channels=4,
                                                  image_size=16,
                                                  lane_pad=lane_pad),
                text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                               hidden_dim=256, max_len=6),
            )

        te = init_text_encoder(jax.random.PRNGKey(1), mk(0).text_encoder)
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        finals = []
        for lane_pad in (0, 16):
            cfg = mk(lane_pad)
            state = create_train_state(KEY, cfg)
            step = jax.jit(make_train_step(cfg))
            for _ in range(2):
                state, m = step(state, te, images, caps, lens)
            finals.append((state, m))
        (s0, m0), (s1, m1) = finals
        for k in m0:
            np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-5,
                                       err_msg=k)
        for a, b in zip(jax.tree.leaves(s1.d_params),
                        jax.tree.leaves(s0.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.g_params),
                        jax.tree.leaves(s0.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)

    def test_min_ch_threshold_exact_and_selective(self):
        """lane_pad_min_ch: layers below the threshold keep natural width
        (check via the padded stem's traced output shape) and values stay
        exact."""
        _, p, imgs, _ = self._setup()
        base = discriminator_embeds(p, imgs)
        got = discriminator_embeds(p, imgs, lane_pad=16, lane_pad_min_ch=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)
        # stem Cout=4 < 8: must NOT pad; block Couts 8 and 16: pad to 16.
        from gan_codes_tpu.ops import nn as nn_ops
        stem_padded = nn_ops.lane_pad_params(p["conv_stem"], 3, 4)
        assert stem_padded is p["conv_stem"]  # no-op path returns the dict
        text = str(jax.make_jaxpr(
            lambda pp: discriminator_embeds(pp, imgs, lane_pad=16,
                                            lane_pad_min_ch=8))(p))
        assert "f32[3,16,16,4]" in text, "stem Cout must stay 4 (below min)"
        assert "f32[3,8,8,16]" in text, "block-1 Cout 8 must pad to 16"
        full = str(jax.make_jaxpr(
            lambda pp: discriminator_embeds(pp, imgs, lane_pad=16))(p))
        assert "f32[3,16,16,16]" in full, "min_ch=0 must pad the stem too"

    def test_generator_lane_pad_exact(self):
        """GeneratorConfig.lane_pad: padded ladder forwards (both upsample
        orders, remat on) and G grads through a D loss stay exact."""
        import dataclasses
        base_cfg = GeneratorConfig(n_channels=4, image_size=32)
        kp, kn, ks = jax.random.split(jax.random.PRNGKey(12), 3)
        p = init_generator(kp, base_cfg)
        for i, bp in enumerate(p["blocks"]):
            bp["gamma"] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        noise = jax.random.normal(kn, (3, base_cfg.latent_dim))
        sents = jax.random.normal(ks, (3, base_cfg.sentence_dim))

        want = generator_apply(p, base_cfg, noise, sents)
        for overrides in ({"lane_pad": 16}, {"lane_pad": 16,
                                             "lane_pad_min_ch": 8},
                          {"lane_pad": 16, "fuse_upsample": False},
                          {"lane_pad": 16, "remat_blocks": True}):
            cfg = dataclasses.replace(base_cfg, **overrides)
            got = generator_apply(p, cfg, noise, sents)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=str(overrides))

        # grads through a scalar loss of the output
        def loss(cfg):
            return lambda pp: jnp.sum(
                generator_apply(pp, cfg, noise, sents) ** 2)

        g0 = jax.grad(loss(base_cfg))(p)
        g1 = jax.grad(loss(dataclasses.replace(base_cfg, lane_pad=16)))(p)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_full_train_step_exact_with_g_and_d_pad(self):
        """One jitted 3-phase step with BOTH towers lane-padded matches the
        unpadded step."""
        import dataclasses
        from gan_codes_tpu.models.text_encoder import init_text_encoder
        from gan_codes_tpu.train.state import create_train_state
        from gan_codes_tpu.train.step import make_train_step

        def mk(pad):
            return GANConfig(
                generator=GeneratorConfig(n_channels=4, image_size=16,
                                          lane_pad=pad),
                discriminator=DiscriminatorConfig(n_channels=4,
                                                  image_size=16,
                                                  lane_pad=pad),
                text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                               hidden_dim=256, max_len=6),
            )

        te = init_text_encoder(jax.random.PRNGKey(1), mk(0).text_encoder)
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        finals = []
        for pad in (0, 16):
            cfg = mk(pad)
            state = create_train_state(KEY, cfg)
            step = jax.jit(make_train_step(cfg))
            for _ in range(2):
                state, m = step(state, te, images, caps, lens)
            finals.append((state, m))
        (s0, m0), (s1, m1) = finals
        for k in m0:
            np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-5,
                                       err_msg=k)
        for tower in ("d_params", "g_params"):
            for a, b in zip(jax.tree.leaves(getattr(s1, tower)),
                            jax.tree.leaves(getattr(s0, tower))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6, rtol=1e-5,
                                           err_msg=tower)
