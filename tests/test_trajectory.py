"""Full-trainer trajectory oracle (VERDICT r3 item 2).

`make_train_step` composes three optimizer phases whose ORDER and STALENESS
semantics come from the reference (`src/deep_fusion_gan/model.py:163-231`):
the hinge D update sees pre-step params, the MA-GP update sees the
post-phase-1 D, and the G update plays against the post-GP D while reusing
the fake images generated from pre-step G params. Per-component parity
(forwards, GP grads, Adam) is pinned elsewhere; this test pins the
*composition* — both sides start from identical weights and consume identical
batches/noise, and losses + parameters must track over multiple steps. In a
zero-egress environment this multi-step trajectory is the strongest available
proxy for "training dynamics match the reference".
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_ref as tr
from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, TextEncoderConfig,
                                  TrainConfig)
from gan_codes_tpu.models.text_encoder import (init_text_encoder,
                                               text_encoder_apply)
from gan_codes_tpu.train.state import create_train_state, ema_update
from gan_codes_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(77)
N_STEPS = 6
BATCH = 6


def _tiny_cfg():
    return GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=16),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
        text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                       hidden_dim=256, max_len=6),
        train=TrainConfig(batch_size=BATCH),
    )


def _liven_gammas(params, base):
    """Residual gates init at 0 (reference semantics), which makes step-1
    block-internal grads exactly zero on both sides — trivially equal. Set
    them nonzero so every parameter carries gradient from step 1."""
    for i, bp in enumerate(params["blocks"]):
        bp["gamma"] = jnp.asarray(base + 0.07 * i, jnp.float32)


class TestTrainerTrajectory:
    def test_multi_step_trajectory_tracks_torch_reference(self):
        cfg = _tiny_cfg()
        state = create_train_state(KEY, cfg)
        _liven_gammas(state.g_params, 0.30)
        _liven_gammas(state.d_params, 0.25)
        te = init_text_encoder(jax.random.PRNGKey(3), cfg.text_encoder)
        g0 = jax.tree.map(np.asarray, state.g_params)
        d0 = jax.tree.map(np.asarray, state.d_params)
        ema0 = jax.tree.map(np.asarray, state.g_ema_params)

        step = jax.jit(make_train_step(cfg))
        rngs = jax.random.split(jax.random.PRNGKey(9), N_STEPS)
        batches_jax, batches_torch, jax_metrics = [], [], []
        for i in range(N_STEPS):
            ki, kc, kl = jax.random.split(rngs[i], 3)
            images = jax.random.normal(ki, (BATCH, 16, 16, 3)) * 0.5
            caps = jax.random.randint(kc, (BATCH, 6), 1, 30)
            lens = jax.random.randint(kl, (BATCH,), 2, 7)
            batches_jax.append((images, caps, lens))

        for images, caps, lens in batches_jax:
            # Replicate the step's internal RNG consumption (step.py:79-86)
            # so the torch loop sees the exact same noise draw.
            _, k_noise, _, _, _ = jax.random.split(state.rng, 5)
            noise = jax.random.normal(k_noise, (BATCH,
                                                cfg.generator.latent_dim))
            sents = text_encoder_apply(te, cfg.text_encoder, caps, lens)
            batches_torch.append((tr.nhwc2nchw(images), tr.j2t(sents),
                                  tr.j2t(noise)))
            state, m = step(state, te, images, caps, lens)
            jax_metrics.append({k: float(v) for k, v in m.items()})

        t_metrics, t_g, t_d = tr.reference_train_loop(
            g0, d0, cfg.generator, cfg.loss, cfg.optim, batches_torch)

        # Per-step losses: step k's values are functions of the params after
        # k-1 full 3-phase updates — any drift in phase order, staleness, or
        # optimizer math shows up here long before fp32 noise does.
        for i, (jm, tm) in enumerate(zip(jax_metrics, t_metrics)):
            for k in ("d_loss", "d_gp_loss", "g_loss"):
                np.testing.assert_allclose(
                    jm[k], tm[k], rtol=2e-4, atol=2e-5,
                    err_msg=f"step {i} {k}: jax={jm[k]} torch={tm[k]}")

        # Final parameters track within fp32 drift. Also require the
        # trajectories actually went somewhere: the drift from init must
        # dominate the comparison tolerance or the assert proves nothing.
        def max_abs_diff(a_tree, b_tree):
            return max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                       for a, b in zip(tr.tree_leaves(a_tree),
                                       tr.tree_leaves(b_tree)))

        t_g_np = jax.tree.map(lambda t: t.detach().numpy(), t_g)
        t_d_np = jax.tree.map(lambda t: t.detach().numpy(), t_d)
        g_final = jax.tree.map(np.asarray, state.g_params)
        d_final = jax.tree.map(np.asarray, state.d_params)

        g_drift = max_abs_diff(g_final, g0)
        d_drift = max_abs_diff(d_final, d0)
        g_gap = max_abs_diff(g_final, t_g_np)
        d_gap = max_abs_diff(d_final, t_d_np)
        # 6 G steps at lr 1e-4 / 12 D steps at lr 4e-4, sign-like Adam
        # updates (beta1=0): expect drift near N*lr.
        assert g_drift > 3e-4, f"G barely moved ({g_drift})"
        assert d_drift > 1e-3, f"D barely moved ({d_drift})"
        assert g_gap < g_drift / 5, f"G diverged from torch: gap={g_gap} " \
                                    f"drift={g_drift}"
        assert d_gap < d_drift / 5, f"D diverged from torch: gap={d_gap} " \
                                    f"drift={d_drift}"

        # EMA side-car: exactly the decay-recursion over the JAX G
        # trajectory start (machinery check; the reference has no EMA).
        expect_ema = ema0
        del expect_ema  # EMA covered in test_losses; params suffice here.

    def _run_and_compare(self, cfg, n_steps, batch_key, gp_interval=1,
                         rtol=2e-4, atol=2e-5, gap_ratio=5):
        """Shared trajectory harness: run n_steps of the jitted 3-phase step
        and the torch reference loop from identical weights/batches/noise;
        assert per-step losses track and final params stay within
        drift/gap_ratio of the torch endpoint. Returns (g_gap, d_gap,
        g_drift, d_drift) for extra caller asserts."""
        state = create_train_state(KEY, cfg)
        _liven_gammas(state.g_params, 0.30)
        _liven_gammas(state.d_params, 0.25)
        te = init_text_encoder(jax.random.PRNGKey(3), cfg.text_encoder)
        g0 = jax.tree.map(np.asarray, state.g_params)
        d0 = jax.tree.map(np.asarray, state.d_params)

        step = jax.jit(make_train_step(cfg))
        rngs = jax.random.split(batch_key, n_steps)
        batches_torch, jax_metrics = [], []
        for i in range(n_steps):
            ki, kc, kl = jax.random.split(rngs[i], 3)
            images = jax.random.normal(ki, (BATCH, 16, 16, 3)) * 0.5
            caps = jax.random.randint(kc, (BATCH, 6), 1, 30)
            lens = jax.random.randint(kl, (BATCH,), 2, 7)
            _, k_noise, _, _, _ = jax.random.split(state.rng, 5)
            noise = jax.random.normal(k_noise, (BATCH,
                                                cfg.generator.latent_dim))
            sents = text_encoder_apply(te, cfg.text_encoder, caps, lens)
            batches_torch.append((tr.nhwc2nchw(images), tr.j2t(sents),
                                  tr.j2t(noise)))
            state, m = step(state, te, images, caps, lens)
            jax_metrics.append({k: float(v) for k, v in m.items()})

        t_metrics, t_g, t_d = tr.reference_train_loop(
            g0, d0, cfg.generator, cfg.loss, cfg.optim, batches_torch,
            gp_interval=gp_interval)
        for i, (jm, tm) in enumerate(zip(jax_metrics, t_metrics)):
            for k in ("d_loss", "d_gp_loss", "g_loss"):
                np.testing.assert_allclose(
                    jm[k], tm[k], rtol=rtol, atol=atol,
                    err_msg=f"step {i} {k}: jax={jm[k]} torch={tm[k]}")

        def max_abs_diff(a_tree, b_tree):
            return max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                       for a, b in zip(tr.tree_leaves(a_tree),
                                       tr.tree_leaves(b_tree)))

        t_g_np = jax.tree.map(lambda t: t.detach().numpy(), t_g)
        t_d_np = jax.tree.map(lambda t: t.detach().numpy(), t_d)
        g_final = jax.tree.map(np.asarray, state.g_params)
        d_final = jax.tree.map(np.asarray, state.d_params)
        g_drift = max_abs_diff(g_final, g0)
        d_drift = max_abs_diff(d_final, d0)
        g_gap = max_abs_diff(g_final, t_g_np)
        d_gap = max_abs_diff(d_final, t_d_np)
        assert g_drift > 3e-4, f"G barely moved ({g_drift})"
        assert d_drift > 1e-3, f"D barely moved ({d_drift})"
        assert g_gap < g_drift / gap_ratio, \
            f"G diverged from torch: gap={g_gap} drift={g_drift}"
        assert d_gap < d_drift / gap_ratio, \
            f"D diverged from torch: gap={d_gap} drift={d_drift}"
        return g_gap, d_gap, g_drift, d_drift

    def test_lazy_gp_trajectory_tracks_torch(self):
        """VERDICT r5 #8: the lazy-regularization COMPOSITION (gp_interval=2
        — phase 2 and its D optimizer step every other step, x2 coefficient,
        Adam moments advancing differently on skip steps) must track the
        torch loop with the same cadence. This is the trajectory-level
        evidence behind promoting the gp_interval operating points."""
        cfg = _tiny_cfg()
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, gp_interval=2))
        self._run_and_compare(cfg, n_steps=6,
                              batch_key=jax.random.PRNGKey(31),
                              gp_interval=2)

    def test_long_horizon_trajectory_drift_bounded(self):
        """VERDICT r5 #8: a 12-step fp32 run (double the main oracle's
        horizon, 24 D updates / 12 G updates) with explicit drift bounds —
        the gap to the torch endpoint stays a small fraction of how far the
        weights travelled, i.e. divergence does not compound with horizon."""
        g_gap, d_gap, g_drift, d_drift = self._run_and_compare(
            _tiny_cfg(), n_steps=12, batch_key=jax.random.PRNGKey(9),
            rtol=4e-4, atol=4e-5)
        # the trajectories moved substantially further than the 6-step run's
        # floors, so the gap/drift ratio is a real bound, not vacuous
        assert g_drift > 6e-4 and d_drift > 2e-3

    def test_full_loop_trajectory_with_torch_text_encoder(self):
        """The strongest end-to-end FID-parity proxy available without
        pretrained assets: BOTH sides consume raw captions. The torch side
        encodes with the reference's packed-sequence biLSTM
        (`src/text_encoder/model.py:33-56`, eval mode — no dropout, as the
        frozen trainer encoder runs, `src/deep_fusion_gan/model.py:37-39`);
        the JAX side runs the full jitted step whose masked-scan encoder
        uses the SAME weights via convert_torch_state_dict. Any drift in
        the converter, the packed-semantics LSTM, or their composition
        with the 3-phase trainer shows up in the tracked losses/params."""
        cfg = _tiny_cfg()
        state = create_train_state(KEY, cfg)
        _liven_gammas(state.g_params, 0.30)
        _liven_gammas(state.d_params, 0.25)

        torch.manual_seed(11)
        te_cfg = cfg.text_encoder
        emb = torch.nn.Embedding(te_cfg.vocab_size, te_cfg.embed_dim)
        lstm = torch.nn.LSTM(te_cfg.embed_dim, te_cfg.per_direction_hidden,
                             1, batch_first=True, bidirectional=True)
        sd = {"encoder.weight": emb.weight.detach()}
        for name, p in lstm.named_parameters():
            sd[f"rnn.{name}"] = p.detach()
        from gan_codes_tpu.models.text_encoder import convert_torch_state_dict
        te = convert_torch_state_dict(sd, te_cfg)

        g0 = jax.tree.map(np.asarray, state.g_params)
        d0 = jax.tree.map(np.asarray, state.d_params)

        def torch_sents(caps, lens):
            with torch.no_grad():
                e = emb(torch.from_numpy(np.asarray(caps, np.int64)))
                packed = torch.nn.utils.rnn.pack_padded_sequence(
                    e, np.asarray(lens).tolist(), batch_first=True,
                    enforce_sorted=False)
                _, (h_n, _) = lstm(packed)
                return h_n.transpose(0, 1).reshape(len(lens), -1)

        step = jax.jit(make_train_step(cfg))
        rngs = jax.random.split(jax.random.PRNGKey(21), 4)
        batches_torch, jax_metrics = [], []
        for i in range(4):
            ki, kc, kl = jax.random.split(rngs[i], 3)
            images = jax.random.normal(ki, (BATCH, 16, 16, 3)) * 0.5
            caps = np.array(jax.random.randint(kc, (BATCH, 6), 1, 30))
            # deliberately unsorted variable lengths: the reference sorts
            # per batch for pack_padded_sequence; ours must not need to
            lens = np.array(jax.random.randint(kl, (BATCH,), 2, 7))
            for b, l in enumerate(lens):
                caps[b, l:] = 0
            _, k_noise, _, _, _ = jax.random.split(state.rng, 5)
            noise = jax.random.normal(k_noise, (BATCH,
                                                cfg.generator.latent_dim))
            batches_torch.append((tr.nhwc2nchw(images),
                                  torch_sents(caps, lens), tr.j2t(noise)))
            state, m = step(state, te, images, jnp.asarray(caps),
                            jnp.asarray(lens))
            jax_metrics.append({k: float(v) for k, v in m.items()})

        t_metrics, t_g, t_d = tr.reference_train_loop(
            g0, d0, cfg.generator, cfg.loss, cfg.optim, batches_torch)

        # Slightly looser than the shared-embedding test: the two LSTMs
        # agree to ~5e-5 (their own parity bound), which propagates.
        for i, (jm, tm) in enumerate(zip(jax_metrics, t_metrics)):
            for k in ("d_loss", "d_gp_loss", "g_loss"):
                np.testing.assert_allclose(
                    jm[k], tm[k], rtol=8e-4, atol=8e-5,
                    err_msg=f"step {i} {k}: jax={jm[k]} torch={tm[k]}")

        def max_abs_diff(a_tree, b_tree):
            return max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                       for a, b in zip(tr.tree_leaves(a_tree),
                                       tr.tree_leaves(b_tree)))

        t_g_np = jax.tree.map(lambda t: t.detach().numpy(), t_g)
        t_d_np = jax.tree.map(lambda t: t.detach().numpy(), t_d)
        g_final = jax.tree.map(np.asarray, state.g_params)
        d_final = jax.tree.map(np.asarray, state.d_params)
        g_drift = max_abs_diff(g_final, g0)
        d_drift = max_abs_diff(d_final, d0)
        g_gap = max_abs_diff(g_final, t_g_np)
        d_gap = max_abs_diff(d_final, t_d_np)
        assert g_drift > 2e-4, f"G barely moved ({g_drift})"
        assert d_drift > 8e-4, f"D barely moved ({d_drift})"
        assert g_gap < g_drift / 4, f"G diverged: gap={g_gap} drift={g_drift}"
        assert d_gap < d_drift / 4, f"D diverged: gap={d_gap} drift={d_drift}"

    def test_trajectory_catches_phase_misordering(self):
        """Negative control: an oracle variant that computes the G loss
        against the PRE-GP discriminator (wrong staleness) must diverge
        beyond the tolerances above — i.e. the main test has teeth."""
        cfg = _tiny_cfg()
        state = create_train_state(KEY, cfg)
        _liven_gammas(state.g_params, 0.30)
        _liven_gammas(state.d_params, 0.25)
        te = init_text_encoder(jax.random.PRNGKey(3), cfg.text_encoder)
        g0 = jax.tree.map(np.asarray, state.g_params)
        d0 = jax.tree.map(np.asarray, state.d_params)

        step = jax.jit(make_train_step(cfg))
        ki, kc, kl = jax.random.split(jax.random.PRNGKey(9), 3)
        images = jax.random.normal(ki, (BATCH, 16, 16, 3)) * 0.5
        caps = jax.random.randint(kc, (BATCH, 6), 1, 30)
        lens = jax.random.randint(kl, (BATCH,), 2, 7)
        _, k_noise, _, _, _ = jax.random.split(state.rng, 5)
        noise = jax.random.normal(k_noise, (BATCH, cfg.generator.latent_dim))
        sents = text_encoder_apply(te, cfg.text_encoder, caps, lens)
        _, m = step(state, te, images, caps, lens)

        # Wrong-staleness torch value: G loss vs the D BEFORE the GP update.
        t_d = tr.to_torch_tree(d0, requires_grad=True)
        t_g = tr.to_torch_tree(g0)
        d_leaves = [t for t in tr.tree_leaves(t_d) if t.is_floating_point()]
        d_opt = torch.optim.Adam(
            d_leaves, lr=cfg.optim.d_lr,
            betas=(cfg.optim.beta1, cfg.optim.beta2), eps=cfg.optim.eps)
        timg, tsent = tr.nhwc2nchw(images), tr.j2t(sents)
        fake = tr.generator(t_g, cfg.generator, tr.j2t(noise), tsent)
        re = tr.discriminator_embeds(t_d, timg)
        d_loss = (torch.relu(1 - tr.discriminator_logits(t_d, re, tsent))
                  .mean()
                  + (torch.relu(1 + tr.discriminator_logits(
                      t_d, tr.discriminator_embeds(t_d, fake.detach()),
                      tsent)).mean()
                     + torch.relu(1 + tr.discriminator_logits(
                         t_d, re[:BATCH - 1], tsent[1:])).mean()) / 2)
        d_loss.backward()
        torch.nn.utils.clip_grad_norm_(d_leaves, cfg.optim.grad_clip_d)
        d_opt.step()  # post-phase-1, PRE-GP discriminator
        with torch.no_grad():
            wrong_g = -tr.discriminator_logits(
                t_d, tr.discriminator_embeds(t_d, fake), tsent).mean()
        # The jitted step's g_loss is computed against the post-GP D and must
        # NOT match the pre-GP value within the main test's tolerance.
        assert not np.isclose(float(m["g_loss"]), float(wrong_g),
                              rtol=2e-4, atol=2e-5), \
            "tolerance too loose: pre-GP and post-GP g_loss indistinguishable"
