"""Loss-function parity vs torch autograd oracles, including the MA-GP
grad-of-grad (SURVEY §7 hard part #1) and full train-step sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import torch_ref as tr
from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, LossConfig,
                                  TextEncoderConfig, TrainConfig)
from gan_codes_tpu.models.discriminator import (discriminator_embeds,
                                                discriminator_logits,
                                                init_discriminator)
from gan_codes_tpu.train import losses
from gan_codes_tpu.train.state import create_train_state
from gan_codes_tpu.train.step import make_jitted_train_step
from gan_codes_tpu.models.text_encoder import init_text_encoder

KEY = jax.random.PRNGKey(11)
D_CFG = DiscriminatorConfig(n_channels=4, image_size=16, sentence_dim=10)


def _torch_d_loss(t_params, real, fake, sents):
    relu = F.relu
    real_embeds = tr.discriminator_embeds(t_params, real)
    real_logits = tr.discriminator_logits(t_params, real_embeds, sents)
    loss_real = relu(1.0 - real_logits).mean()
    b = real.shape[0]
    mism = tr.discriminator_logits(t_params, real_embeds[: b - 1], sents[1:b])
    loss_mism = relu(1.0 + mism).mean()
    fake_logits = tr.discriminator_logits(
        t_params, tr.discriminator_embeds(t_params, fake.detach()), sents)
    loss_fake = relu(1.0 + fake_logits).mean()
    return loss_real + (loss_fake + loss_mism) / 2.0


class TestHinge:
    def test_d_hinge_matches_torch(self):
        kp, kr, kf, ks = jax.random.split(KEY, 4)
        p = init_discriminator(kp, D_CFG)
        real = jax.random.normal(kr, (4, 16, 16, 3))
        fake = jax.random.normal(kf, (4, 16, 16, 3))
        sents = jax.random.normal(ks, (4, 10))

        got = losses.d_hinge_loss(discriminator_embeds, discriminator_logits,
                                  p, real, fake, sents)
        t_params = tr.to_torch_tree(p)
        want = _torch_d_loss(t_params, tr.nhwc2nchw(real), tr.nhwc2nchw(fake),
                             tr.j2t(sents))
        np.testing.assert_allclose(float(got), float(want), atol=1e-5)

    def test_g_hinge_matches_torch(self):
        kp, kf, ks = jax.random.split(KEY, 3)
        p = init_discriminator(kp, D_CFG)
        fake = jax.random.normal(kf, (4, 16, 16, 3))
        sents = jax.random.normal(ks, (4, 10))
        got = losses.g_hinge_loss(discriminator_embeds, discriminator_logits,
                                  p, fake, sents)
        t_params = tr.to_torch_tree(p)
        want = -tr.discriminator_logits(
            t_params, tr.discriminator_embeds(t_params, tr.nhwc2nchw(fake)),
            tr.j2t(sents)).mean()
        np.testing.assert_allclose(float(got), float(want), atol=1e-5)


class TestMAGP:
    """Value AND d(penalty)/d(D-params) must match torch's double backward
    (`deep_fusion_gan/model.py:59-85,202-210`)."""

    def _setup(self):
        kp, kr, ks = jax.random.split(KEY, 3)
        p = init_discriminator(kp, D_CFG)
        # nonzero gammas so all paths carry gradient
        for i, bp in enumerate(p["blocks"]):
            bp["gamma"] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        real = jax.random.normal(kr, (3, 16, 16, 3))
        sents = jax.random.normal(ks, (3, 10))
        cfg = LossConfig()
        return p, real, sents, cfg

    def _torch_gp(self, t_params, images, sents, cfg):
        images = images.clone().requires_grad_()
        sents = sents.clone().requires_grad_()
        embeds = tr.discriminator_embeds(t_params, images)
        logits = tr.discriminator_logits(t_params, embeds, sents)
        grads = torch.autograd.grad(logits, (images, sents),
                                    torch.ones_like(logits),
                                    retain_graph=True, create_graph=True)
        b = images.shape[0]
        flat = torch.cat([grads[0].reshape(b, -1), grads[1].reshape(b, -1)], 1)
        norm = torch.sqrt((flat ** 2).sum(1) + cfg.gp_eps)
        norm = torch.clamp(norm, 0, cfg.gp_norm_clip)
        return cfg.gp_coef * (norm ** cfg.gp_power).mean()

    def test_gp_value_matches_torch(self):
        p, real, sents, cfg = self._setup()
        got = losses.ma_gradient_penalty(
            discriminator_embeds, discriminator_logits, p, real, sents, cfg)
        t_params = tr.to_torch_tree(p)
        want = self._torch_gp(t_params, tr.nhwc2nchw(real), tr.j2t(sents), cfg)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    def test_gp_param_grads_match_torch_double_backward(self):
        p, real, sents, cfg = self._setup()

        def gp_fn(d_params):
            return losses.ma_gradient_penalty(
                discriminator_embeds, discriminator_logits, d_params,
                real, sents, cfg)

        j_grads = jax.grad(gp_fn)(p)

        t_params = tr.to_torch_tree(p, requires_grad=True)
        loss = self._torch_gp(t_params, tr.nhwc2nchw(real), tr.j2t(sents), cfg)
        loss.backward()

        j_leaves = [np.asarray(x) for x in
                    tr.tree_leaves(jax.tree.map(lambda x: x, j_grads))]
        t_leaves = [t.grad.numpy() if t.grad is not None else np.zeros(t.shape)
                    for t in tr.tree_leaves(t_params)]
        assert len(j_leaves) == len(t_leaves)
        for jg, tg in zip(j_leaves, t_leaves):
            np.testing.assert_allclose(jg, tg, atol=2e-4, rtol=2e-3)


class TestDamsm:
    def test_damsm_matches_reference_semantics(self):
        """The reference projects pooled RGB means with eye(256, 3)
        (`src/damsm/loss.py:16-17`) == zero-padding to 256-d."""
        kf, ks = jax.random.split(KEY)
        fake = jax.random.normal(kf, (4, 8, 8, 3))
        sents = jax.random.normal(ks, (4, 12))
        got = losses.damsm_cosine_loss(fake, sents)

        img_feat = tr.nhwc2nchw(fake).mean(dim=[2, 3])
        proj = F.linear(img_feat, torch.eye(12, 3))
        scores = (F.normalize(proj, dim=1) * F.normalize(tr.j2t(sents), dim=1)).sum(1)
        want = 1 - scores.mean()
        np.testing.assert_allclose(float(got), float(want), atol=1e-6)


class TestNanGuard:
    def test_finite_loss_passthrough(self):
        loss = jnp.asarray(1.5)
        out = losses.nan_guard_loss(loss, KEY)
        assert float(out) == 1.5

    def test_nan_loss_replaced_and_grads_zeroed(self):
        loss = jnp.asarray(jnp.nan)
        out = losses.nan_guard_loss(loss, KEY)
        assert np.isfinite(float(out)) and abs(float(out)) < 0.1
        grads = {"w": jnp.ones((3,))}
        zeroed = losses.zero_grads_if_nonfinite(loss, grads)
        np.testing.assert_array_equal(np.asarray(zeroed["w"]), 0.0)


class TestTrainStep:
    def test_three_phase_step_runs_and_updates(self):
        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
            train=TrainConfig(batch_size=4),
        )
        state = create_train_state(KEY, cfg)
        te_params = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        step = make_jitted_train_step(cfg)

        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])

        g_before = jax.tree.map(np.asarray, state.g_params)
        rng_before = np.asarray(state.rng)
        state2, metrics = step(state, te_params, images, caps, lens)

        for name in ("d_loss", "d_gp_loss", "g_loss", "txtimg_loss"):
            assert np.isfinite(float(metrics[name])), name
        assert int(state2.step) == 1
        # params actually moved
        moved = any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree.leaves(g_before),
                [np.asarray(x) for x in jax.tree.leaves(state2.g_params)]))
        assert moved
        # rng advanced (resume-safe randomness)
        assert not np.array_equal(rng_before, np.asarray(state2.rng))

    def test_gp_interval_lazy_regularization(self):
        """LossConfig.gp_interval: MA-GP runs every k-th step with coef
        scaled by k (StyleGAN2-style lazy regularization); interval 1 is the
        reference's every-step semantics and steps with it match exactly."""
        import dataclasses
        from gan_codes_tpu.train.step import make_train_step

        def mk(interval):
            return GANConfig(
                generator=GeneratorConfig(n_channels=4, image_size=16),
                discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
                text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                               hidden_dim=256, max_len=6),
                loss=LossConfig(gp_interval=interval),
                train=TrainConfig(batch_size=4),
            )

        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        te = init_text_encoder(jax.random.PRNGKey(1), mk(1).text_encoder)

        # interval=2: step 0 runs GP (scaled 2x), step 1 skips (gp metric 0)
        cfg2 = mk(2)
        state = create_train_state(KEY, cfg2)
        step2 = jax.jit(make_train_step(cfg2))
        s1, m1 = step2(state, te, images, caps, lens)
        s2, m2 = step2(s1, te, images, caps, lens)
        assert float(m1["d_gp_loss"]) != 0.0
        assert float(m2["d_gp_loss"]) == 0.0
        # The APPLIED penalty on the active step is scaled 2x, but the
        # logged metric is normalized back to the reference coefficient
        # (step.py divides by the interval) so histories stay comparable
        # across cadences — the active step's log equals the interval-1
        # value at identical params.
        cfg1 = mk(1)
        state1 = create_train_state(KEY, cfg1)
        step1 = jax.jit(make_train_step(cfg1))
        _, m1_ref = step1(state1, te, images, caps, lens)
        np.testing.assert_allclose(float(m1["d_gp_loss"]),
                                   float(m1_ref["d_gp_loss"]), rtol=1e-5)

    def test_ema_params_track_but_differ_from_raw(self):
        """The EMA generator is genuinely maintained: after steps it differs
        from both its init and the raw params (BASELINE config 5 input)."""
        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
            train=TrainConfig(batch_size=4, ema_decay=0.9),
        )
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        from gan_codes_tpu.train.step import make_train_step
        step = jax.jit(make_train_step(cfg))
        state = create_train_state(KEY, cfg)
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        for _ in range(3):
            state, _ = step(state, te, images, caps, lens)
        raw = jax.tree.leaves(state.g_params)
        ema = jax.tree.leaves(state.g_ema_params)
        diff = max(np.abs(np.asarray(a) - np.asarray(b)).max()
                   for a, b in zip(raw, ema))
        assert diff > 0.0, "EMA params identical to raw after updates"

    def test_g_nan_guard_keys_on_total_loss(self, monkeypatch):
        """Regression (VERDICT r1 weak #6): with damsm_weight > 0 and a NaN
        DAMSM term but finite adversarial loss, the G grads must be zeroed —
        the guard keys on the loss actually differentiated, not just g_adv."""
        import dataclasses
        from gan_codes_tpu.train import step as step_mod

        monkeypatch.setattr(
            step_mod.losses, "damsm_cosine_loss",
            lambda fake, sents: jnp.float32(jnp.nan) * jnp.mean(fake))
        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
        )
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, damsm_weight=1.0))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        step = jax.jit(step_mod.make_train_step(cfg))
        state = create_train_state(KEY, cfg)
        g_before = [np.asarray(x) for x in jax.tree.leaves(state.g_params)]
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        state2, metrics = step(state, te, images, caps, lens)
        # grads zeroed -> Adam step is exactly zero -> G params unchanged
        for a, b in zip(g_before, jax.tree.leaves(state2.g_params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        # logged adversarial loss stays finite (guarded), D still trains
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))

    def test_step_deterministic_given_state(self):
        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
        )
        te_params = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        from gan_codes_tpu.train.step import make_train_step
        step = jax.jit(make_train_step(cfg))  # no donation: reuse state
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])

        state = create_train_state(KEY, cfg)
        _, m1 = step(state, te_params, images, caps, lens)
        _, m2 = step(state, te_params, images, caps, lens)
        for k in m1:
            assert float(m1[k]) == float(m2[k]), k


class TestGPDtypes:
    def test_bf16_gp_close_to_fp32(self):
        """gp_compute_dtype='bfloat16' (perf option) must track the fp32
        reference within bf16 tolerance on a tiny D."""
        kp, kr, ks = jax.random.split(KEY, 3)
        p = init_discriminator(kp, D_CFG)
        real = jax.random.normal(kr, (3, 16, 16, 3))
        sents = jax.random.normal(ks, (3, 10))
        cfg = LossConfig()

        def cast(tree, dt):
            return jax.tree.map(lambda x: x.astype(dt), tree)

        f32 = losses.ma_gradient_penalty(
            discriminator_embeds, discriminator_logits, p, real, sents, cfg)
        bf16 = losses.ma_gradient_penalty(
            discriminator_embeds, discriminator_logits,
            cast(p, jnp.bfloat16), real.astype(jnp.bfloat16),
            sents.astype(jnp.bfloat16), cfg)
        assert bf16.dtype == jnp.float32  # norm math stays fp32
        np.testing.assert_allclose(float(bf16), float(f32), rtol=0.1)


class TestComputeDtypeConfigs:
    def _cfg(self, **loss_kw):
        import dataclasses
        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                           hidden_dim=256, max_len=6),
            train=TrainConfig(batch_size=4, compute_dtype="bfloat16"),
        )
        if loss_kw:
            cfg = dataclasses.replace(
                cfg, loss=dataclasses.replace(cfg.loss, **loss_kw))
        return cfg

    def test_bf16_step_keeps_fp32_master_params(self):
        """The bf16 operating point (BASELINE config 5): bf16 compute, fp32
        master params/optimizer, finite losses."""
        cfg = self._cfg(gp_compute_dtype="bfloat16")
        state = create_train_state(KEY, cfg)
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        from gan_codes_tpu.train.step import make_train_step
        step = jax.jit(make_train_step(cfg))
        images = jax.random.normal(KEY, (4, 16, 16, 3))
        caps = jax.random.randint(KEY, (4, 6), 1, 30)
        lens = jnp.array([2, 6, 3, 5])
        state2, metrics = step(state, te, images, caps, lens)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
            assert v.dtype == jnp.float32, k
        for leaf in jax.tree.leaves(state2.g_params):
            assert leaf.dtype == jnp.float32

    def test_damsm_weight_changes_g_grads(self):
        """damsm_weight is a real knob: nonzero weight must alter the G
        update (the reference never backpropagated it, `model.py:217-231`)."""
        from gan_codes_tpu.train.step import make_train_step
        te = None
        results = []
        for w in (0.0, 5.0):
            cfg = GANConfig(
                generator=GeneratorConfig(n_channels=4, image_size=16),
                discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
                text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                               hidden_dim=256, max_len=6),
            )
            import dataclasses
            cfg = dataclasses.replace(
                cfg, loss=dataclasses.replace(cfg.loss, damsm_weight=w))
            state = create_train_state(KEY, cfg)
            te = te or init_text_encoder(jax.random.PRNGKey(1),
                                         cfg.text_encoder)
            step = jax.jit(make_train_step(cfg))
            images = jax.random.normal(KEY, (4, 16, 16, 3))
            caps = jax.random.randint(KEY, (4, 6), 1, 30)
            lens = jnp.array([2, 6, 3, 5])
            s2, _ = step(state, te, images, caps, lens)
            results.append([np.asarray(l) for l in jax.tree.leaves(s2.g_params)])
        # compare across ALL leaves: block-internal params sit behind the
        # gamma=0 residual gate at init and legitimately get zero grads
        max_diff = max(np.abs(a - b).max()
                       for a, b in zip(results[0], results[1]))
        assert max_diff > 0.0, "damsm_weight had no effect on the G update"
