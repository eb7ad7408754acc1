"""End-to-end smoke tests: trainer on a synthetic CUB fixture with
checkpoint/resume, plus the sample/generate inference paths
(SURVEY §4 item (e), BASELINE config 1)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_codes_tpu.config import (DataConfig, DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, TextEncoderConfig,
                                  TrainConfig)
from gan_codes_tpu.data import CUBDataset, DataLoader, make_synthetic_cub
from gan_codes_tpu.generate import generate_from_prompt, preprocess_caption
from gan_codes_tpu.models.text_encoder import init_text_encoder
from gan_codes_tpu.sample import sample
from gan_codes_tpu.train.trainer import Trainer


IMG = 16


def tiny_cfg(n_words):
    return GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=IMG),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=IMG),
        text_encoder=TextEncoderConfig(vocab_size=n_words, embed_dim=8,
                                       hidden_dim=256, max_len=18),
        train=TrainConfig(batch_size=4, eval_max_batches=1),
        data=DataConfig(image_size=IMG),
    )


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cub_e2e"))
    info = make_synthetic_cub(root, n_train=8, n_test=4, image_size=IMG)
    return info


@pytest.fixture(scope="module")
def setup(fixture_dir, tmp_path_factory):
    root = fixture_dir["root"]
    cfg = tiny_cfg(fixture_dir["n_words"])
    train_ds = CUBDataset(DataConfig(data_dir=root, image_size=IMG), "train")
    test_ds = CUBDataset(DataConfig(data_dir=root, image_size=IMG), "test",
                         augment=False)
    te_params = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
    work = str(tmp_path_factory.mktemp("work"))
    return cfg, train_ds, test_ds, te_params, work


class TestTrainerE2E:
    def test_fit_two_epochs_then_resume(self, setup):
        cfg, train_ds, test_ds, te_params, work = setup
        ckpt_dir = os.path.join(work, "ckpt")
        img_dir = os.path.join(work, "imgs")

        trainer = Trainer(cfg, te_params, ckpt_dir, img_dir,
                          code2word=train_ds.code2word)
        train_loader = DataLoader(train_ds, 4, seed=0)
        test_loader = DataLoader(test_ds, 4, shuffle=False)

        hist = trainer.fit(train_loader, test_loader, num_epochs=2,
                           auto_resume=False)
        assert len(hist["g_losses"]) == 2
        assert all(np.isfinite(v) for v in hist["g_losses"])
        assert all(np.isfinite(v) for v in hist["d_losses"])
        assert int(trainer.state.step) == 4  # 2 epochs x 2 batches

        # per-epoch artifacts exist (`model.py:283-284,329-387`)
        assert os.path.exists(os.path.join(img_dir,
                                           "fake_sample_epoch_1.png"))
        assert os.path.exists(os.path.join(img_dir,
                                           "samples_with_text_epoch_1.jpg"))

        # resume: fresh trainer picks up from the checkpoint
        trainer2 = Trainer(cfg, te_params, ckpt_dir, img_dir,
                           code2word=train_ds.code2word)
        hist2 = trainer2.fit(train_loader, test_loader, num_epochs=3,
                             auto_resume=True)
        assert int(trainer2.state.step) == 6  # resumed at step 4, +1 epoch
        assert len(hist2["g_losses"]) == 3  # restored 2 + 1 new

        # RNG state survives the round trip (gap the reference had)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(trainer.state.rng)).shape,
            np.asarray(jax.device_get(trainer2.state.rng)).shape)

    def test_resume_is_bit_identical_to_uninterrupted(self, setup):
        """Kill-and-resume equivalence: training 1 epoch, restarting from the
        checkpoint, and training 2 more yields the SAME final parameters as 3
        uninterrupted epochs. Holds because the checkpoint carries the step
        RNG, the loader's shuffle/augment stream is epoch-keyed
        (DataLoader.set_epoch), and eval noise is epoch-keyed in fit()."""
        cfg, train_ds, test_ds, te_params, work = setup

        def run(ckpt_name, schedule):
            ckpt_dir = os.path.join(work, ckpt_name)
            img_dir = os.path.join(work, ckpt_name + "_imgs")
            state = None
            for num_epochs in schedule:  # fresh Trainer per leg = a restart
                trainer = Trainer(cfg, te_params, ckpt_dir, img_dir,
                                  code2word=train_ds.code2word)
                trainer.fit(DataLoader(train_ds, 4, seed=11),
                            DataLoader(test_ds, 4, shuffle=False),
                            num_epochs=num_epochs, auto_resume=True)
                state = trainer.state
            return state

        straight = run("eq_straight", [3])
        resumed = run("eq_resumed", [1, 3])
        assert int(straight.step) == int(resumed.step)
        for a, b in zip(jax.tree.leaves(straight.g_params),
                        jax.tree.leaves(resumed.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(resumed.d_params),
                        jax.tree.leaves(straight.d_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_uses_ema_eval_knob(self, setup, monkeypatch):
        """TrainConfig.eval_use_ema routes fit's per-epoch eval through the
        EMA generator (VERDICT r1 weak #5 / BASELINE config 5)."""
        import dataclasses
        cfg, train_ds, _, te_params, work = setup
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, eval_use_ema=True))
        trainer = Trainer(cfg, te_params, os.path.join(work, "ema_ckpt"),
                          os.path.join(work, "ema_imgs"),
                          code2word=train_ds.code2word)
        seen = []

        def fake_evaluate(loader, use_ema=False):
            seen.append(use_ema)
            return 0.0, 0.0, None, None, None

        monkeypatch.setattr(trainer, "evaluate", fake_evaluate)
        trainer.fit([], [], num_epochs=1, auto_resume=False)
        assert seen == [True]

    def test_checkpoint_every_epochs_knob(self, setup, monkeypatch):
        """checkpoint_every_epochs=2 saves epochs 1 and 2 (every 2nd + the
        final epoch) but not epoch 0 — the knob was previously dead config."""
        import dataclasses
        cfg, train_ds, _, te_params, work = setup
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           checkpoint_every_epochs=2))
        trainer = Trainer(cfg, te_params, os.path.join(work, "ck_every"),
                          os.path.join(work, "ck_every_imgs"),
                          code2word=train_ds.code2word)
        saved = []
        monkeypatch.setattr(trainer.ckpt, "save",
                            lambda epoch, *a, **k: saved.append(epoch))
        loader = DataLoader(train_ds, 4, seed=5)
        trainer.fit(loader, num_epochs=3, auto_resume=False)
        assert saved == [1, 2]

    def test_eval_caches_real_fid_stats_per_loader(self, setup, monkeypatch):
        """With a deterministic test loader, the real-side FID stats are
        computed once and reused across evaluate() calls; a DIFFERENT loader
        object recomputes them (cache is loader-keyed)."""
        from gan_codes_tpu.models.inception import init_inception
        import gan_codes_tpu.eval.metrics as metrics_mod

        cfg, train_ds, test_ds, te_params, work = setup
        trainer = Trainer(cfg, te_params, os.path.join(work, "fid_ckpt"),
                          os.path.join(work, "fid_imgs"),
                          inception_params=init_inception(jax.random.PRNGKey(3)),
                          code2word=train_ds.code2word)
        calls = []
        real_activation_stats = metrics_mod.activation_stats

        def counting_stats(params, images, batch_size=8, **kw):
            calls.append(images.shape)
            return real_activation_stats(params, images, batch_size, **kw)

        import gan_codes_tpu.train.trainer as trainer_mod
        monkeypatch.setattr(metrics_mod, "activation_stats", counting_stats)

        # each evaluate computes the FAKE side once; the REAL side only on a
        # cache miss: first call 2 stats passes, repeat 1, new loader 2 again
        loader = DataLoader(test_ds, 4, shuffle=False)
        rng0 = trainer._eval_rng
        r1 = trainer.evaluate(loader)
        assert len(calls) == 2
        trainer._eval_rng = rng0  # same eval noise -> same fakes -> same FID
        r2 = trainer.evaluate(loader)
        assert len(calls) == 3  # cached real side: fake pass only
        np.testing.assert_allclose(r1[1], r2[1], rtol=1e-6)

        other = DataLoader(test_ds, 4, shuffle=False)
        trainer.evaluate(other)
        assert len(calls) == 5  # new loader object: real side recomputed

    def test_evaluate_without_inception_uses_reference_sentinels(self, setup):
        """Absent inception weights must yield the reference failure
        sentinels IS=1.0 / FID=inf (`src/evaluation/metrics.py:58-60,
        113-118`), not 0.0 — zeros read as a perfect FID in plots/logs."""
        cfg, train_ds, test_ds, te_params, work = setup
        trainer = Trainer(cfg, te_params, os.path.join(work, "sent_ckpt"),
                          os.path.join(work, "sent_imgs"),
                          code2word=train_ds.code2word)
        loader = DataLoader(test_ds, 4, shuffle=False)
        is_score, fid_score, *_ = trainer.evaluate(loader)
        assert is_score == 1.0
        assert fid_score == float("inf")
        # empty eval set takes the same sentinels
        is2, fid2, *_ = trainer.evaluate([])
        assert (is2, fid2) == (1.0, float("inf"))

    def test_gp_interval_epoch_mean_masks_skipped_steps(self, setup):
        """With lazy regularization (gp_interval=2) the epoch-mean GP loss
        averages only the steps where the GP phase ran (skipped steps emit
        0.0); the step logs the penalty at the reference coefficient, so
        the masked mean is cadence-independent."""
        import dataclasses
        from gan_codes_tpu.train.step import make_train_step

        cfg, train_ds, _, te_params, work = setup
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, gp_interval=2))
        trainer = Trainer(cfg, te_params, os.path.join(work, "gpi_ckpt"),
                          os.path.join(work, "gpi_imgs"),
                          code2word=train_ds.code2word)
        # replay the same batches through a raw (non-donating) step to get
        # the unmasked per-step gp losses
        loader = DataLoader(train_ds, 4, seed=7)
        raw_step = jax.jit(make_train_step(cfg))
        state = trainer.state
        per_step = []
        for batch in loader:
            images, captions, cap_lens = trainer._device_batch(batch)
            state, metrics = raw_step(state, trainer.text_encoder_params,
                                      images, captions, cap_lens)
            per_step.append((float(metrics["d_gp_loss"]),
                             float(metrics["d_gp_active"])))
        assert [a for _, a in per_step] == [1.0, 0.0]  # interval 2, 2 steps

        epoch_metrics = trainer.train_epoch(DataLoader(train_ds, 4, seed=7))
        active_losses = [l for l, a in per_step if a == 1.0]
        np.testing.assert_allclose(epoch_metrics["d_gp_loss"],
                                   np.mean(active_losses), rtol=1e-6)
        assert "d_gp_active" not in epoch_metrics

    def test_eval_every_epochs_sentinels_and_cadence(self, setup):
        """TrainConfig.eval_every_epochs: skipped epochs log the reference
        failure sentinels (IS 1.0 / FID inf, `src/evaluation/metrics.py:
        58-60`), evaluated epochs (every Nth + the last) get real scores;
        histories stay one-entry-per-epoch."""
        import dataclasses

        from gan_codes_tpu.models.inception import init_inception

        cfg, train_ds, test_ds, te_params, work = setup
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, eval_every_epochs=2,
                                           eval_sqrtm="newton_schulz"))
        trainer = Trainer(cfg, te_params, os.path.join(work, "ee_ckpt"),
                          os.path.join(work, "ee_imgs"),
                          code2word=train_ds.code2word,
                          inception_params=init_inception(
                              jax.random.PRNGKey(3)))
        hist = trainer.fit(DataLoader(train_ds, 4, seed=0),
                           DataLoader(test_ds, 4, shuffle=False),
                           num_epochs=3, auto_resume=False)
        trainer.close()
        assert len(hist["fid_scores"]) == 3
        # epoch 0 skipped -> sentinels; epoch 1 (2nd) + epoch 2 (last) eval
        assert hist["is_scores"][0] == 1.0
        assert hist["fid_scores"][0] == float("inf")
        assert np.isfinite(hist["fid_scores"][1])
        assert np.isfinite(hist["fid_scores"][2])
        # sample dumps only on evaluated epochs
        imgs = os.path.join(work, "ee_imgs")
        assert not os.path.exists(os.path.join(imgs,
                                               "fake_sample_epoch_0.png"))
        assert os.path.exists(os.path.join(imgs, "fake_sample_epoch_2.png"))

        # 0 = final-epoch-only (the sibling-knob 0-is-off convention; a
        # review finding showed 0 used to ZeroDivisionError mid-fit)
        cfg0 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, eval_every_epochs=0))
        tr0 = Trainer(cfg0, te_params, os.path.join(work, "ee0_ckpt"),
                      os.path.join(work, "ee0_imgs"),
                      code2word=train_ds.code2word,
                      inception_params=init_inception(jax.random.PRNGKey(3)))
        hist0 = tr0.fit(DataLoader(train_ds, 4, seed=0),
                        DataLoader(test_ds, 4, shuffle=False),
                        num_epochs=2, auto_resume=False)
        tr0.close()
        assert hist0["fid_scores"][0] == float("inf")
        assert np.isfinite(hist0["fid_scores"][1])  # last epoch evaluates

    def test_log_every_steps_writes_step_rows(self, setup):
        """TrainConfig.log_every_steps (SURVEY §5 per-step scalars): fit
        writes kind='step' rows — one per Nth step, tagged with their epoch
        (so resume's truncate_from drops them with the epoch) — while the
        per-epoch rows keep their schema."""
        import dataclasses
        import json

        cfg, train_ds, test_ds, te_params, work = setup
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, log_every_steps=1))
        ckpt_dir = os.path.join(work, "steplog_ckpt")
        trainer = Trainer(cfg, te_params, ckpt_dir,
                          os.path.join(work, "steplog_imgs"),
                          code2word=train_ds.code2word)
        trainer.fit(DataLoader(train_ds, 4, seed=0),
                    DataLoader(test_ds, 4, shuffle=False),
                    num_epochs=2, auto_resume=False)
        trainer.close()

        rows = [json.loads(l) for l in
                open(os.path.join(ckpt_dir, "metrics_log.jsonl"))]
        step_rows = [r for r in rows if r.get("kind") == "step"]
        epoch_rows = [r for r in rows if "epoch_seconds" in r]
        # 8 train images / bs4 = 2 steps per epoch, 2 epochs
        assert [r["step"] for r in step_rows] == [1, 2, 3, 4]
        assert [r["epoch"] for r in step_rows] == [0, 0, 1, 1]
        assert all(np.isfinite(r["g_loss"]) and np.isfinite(r["d_loss"])
                   for r in step_rows)
        assert len(epoch_rows) == 2 and "kind" not in epoch_rows[0]
        # rows are time-ordered: an epoch's step rows precede its epoch row
        kinds = [("step" if r.get("kind") == "step" else "epoch")
                 for r in rows]
        assert kinds == ["step", "step", "epoch", "step", "step", "epoch"]
        # a replayed epoch's step rows vanish with its epoch row
        trainer.metrics_log = type(trainer.metrics_log)(
            os.path.join(ckpt_dir, "metrics_log.jsonl"))
        trainer.metrics_log.truncate_from(1)
        rows = [json.loads(l) for l in
                open(os.path.join(ckpt_dir, "metrics_log.jsonl"))]
        assert all(r["epoch"] < 1 for r in rows)
        trainer.close()

    def test_generate_ema_vs_raw_diverge(self, setup):
        """After training steps, EMA and raw generator outputs differ for the
        same captions+noise (the EMA copy is connected, not dead state)."""
        cfg, train_ds, test_ds, te_params, work = setup
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
        trainer = Trainer(cfg, te_params, os.path.join(work, "ema2_ckpt"),
                          os.path.join(work, "ema2_imgs"),
                          code2word=train_ds.code2word)
        loader = DataLoader(train_ds, 4, seed=0)
        trainer.train_epoch(loader)
        batch = next(iter(DataLoader(test_ds, 4, shuffle=False)))
        noise = jax.random.normal(jax.random.PRNGKey(3),
                                  (4, cfg.generator.latent_dim))
        raw = trainer.generate(batch["captions"], batch["cap_lens"],
                               use_ema=False, noise=noise)
        ema = trainer.generate(batch["captions"], batch["cap_lens"],
                               use_ema=True, noise=noise)
        assert float(np.abs(np.asarray(raw) - np.asarray(ema)).max()) > 0.0

    def test_generator_only_checkpoints(self, setup):
        cfg, train_ds, _, te_params, work = setup
        ckpt_dir = os.path.join(work, "ckpt")
        trainer = Trainer(cfg, te_params, ckpt_dir, os.path.join(work, "i2"),
                          code2word=train_ds.code2word)
        epoch = trainer.ckpt.latest_generator_epoch()
        assert epoch is not None
        template = jax.eval_shape(lambda: {
            "g_params": trainer.state.g_params,
            "g_ema_params": trainer.state.g_ema_params})
        tree = trainer.ckpt.restore_generator(epoch, template)
        assert "g_params" in tree and "g_ema_params" in tree


class TestInferencePaths:
    def test_sample_batch_to_pngs(self, setup):
        cfg, train_ds, test_ds, te_params, work = setup
        loader = DataLoader(test_ds, 4, shuffle=False)
        batch = next(iter(loader))
        from gan_codes_tpu.models.generator import init_generator
        g_params = jax.jit(
            lambda k: init_generator(k, cfg.generator))(jax.random.PRNGKey(0))
        out_dir = os.path.join(work, "samples")
        paths = sample(g_params, te_params, cfg, batch, out_dir)
        assert len(paths) == 4
        for p in paths:
            assert os.path.exists(p)

    def test_generate_from_prompt(self, setup):
        cfg, train_ds, _, te_params, _ = setup
        from gan_codes_tpu.models.generator import init_generator
        g_params = jax.jit(
            lambda k: init_generator(k, cfg.generator))(jax.random.PRNGKey(0))
        img = generate_from_prompt("this bird has a red beak", g_params,
                                   te_params, cfg, train_ds.word2code)
        assert img.shape == (IMG, IMG, 3)
        assert np.abs(img).max() <= 1.0

    def test_generate_main_show_opens_viewer(self, tmp_path, monkeypatch):
        """`main(show=True)` opens the saved image in the system viewer
        (reference `test_generate.py:76-81` parity, opt-in for headless
        hosts); show=False must not touch the viewer."""
        import PIL.Image
        import gan_codes_tpu.generate as gen_mod
        import gan_codes_tpu.models.text_encoder as te_mod

        from gan_codes_tpu.config import GANConfig

        class StubCkpt:
            def __init__(self, d):
                pass

            def resolve_inference_config(self, vocab_size, image_size=None):
                return GANConfig.for_image_size(image_size or 256,
                                                vocab_size=vocab_size)

            def restore_generator_tree(self, gen_cfg, epoch=None):
                return {"g_params": {}, "g_ema_params": {}}, 3

        monkeypatch.setattr(gen_mod, "load_vocab",
                            lambda d: ({0: "a"}, {"a": 0}))
        monkeypatch.setattr(te_mod, "load_text_encoder",
                            lambda path, cfg: {})
        monkeypatch.setattr(gen_mod, "CheckpointManager", StubCkpt)
        monkeypatch.setattr(
            gen_mod, "generate_from_prompt",
            lambda *a, **k: np.zeros((8, 8, 3), np.float32))
        shown = []
        orig_open = PIL.Image.open

        def spy_open(path, *a, **k):
            img = orig_open(path, *a, **k)
            monkeypatch.setattr(type(img), "show",
                                lambda self, *aa, **kk: shown.append(path))
            return img

        monkeypatch.setattr(PIL.Image, "open", spy_open)
        out = str(tmp_path / "gen")
        p1 = gen_mod.main("d", "enc.pth", "w", out, prompt="a", show=False)
        assert shown == []
        p2 = gen_mod.main("d", "enc.pth", "w", out, prompt="a", show=True)
        assert shown == [p2] and os.path.exists(p1)

    def test_preprocess_caption_oov_and_pad(self, setup):
        cfg, train_ds, *_ = setup
        caps, lens = preprocess_caption("A Bird, with ZYXW plumage.",
                                        train_ds.word2code, max_len=18)
        assert caps.shape == (1, 18)
        assert int(lens[0]) == 5
        # OOV token maps to <unk> id
        unk = train_ds.word2code.get("<unk>", 0)
        assert caps[0, 3] == unk


class TestTrainEntryFunction:
    def test_train_function_end_to_end(self, tmp_path):
        """The train() entry (reference `train.py:8-73`) on a tiny synthetic
        dataset: builds loaders/config/trainer, runs, returns histories."""
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        from gan_codes_tpu.train_entry import train

        import jax

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=4, n_test=2, image_size=24)
        cache = str(tmp_path / "xla_cache")
        prev_cache_dir = jax.config.jax_compilation_cache_dir
        try:
            histories = train(
                data_path=root, encoder_weights_path=None,
                image_save_path=str(tmp_path / "imgs"),
                gen_path_save=str(tmp_path / "weights"),
                image_size=16, batch_size=2, num_epochs=1,
                compile_cache_dir=cache)
        finally:
            # train() sets the cache dir process-globally; don't leak the
            # (about-to-be-deleted) tmp path into later tests
            jax.config.update("jax_compilation_cache_dir", prev_cache_dir)
        assert len(histories["g_losses"]) == 1
        assert np.isfinite(histories["g_losses"][0])
        import os
        assert os.path.exists(str(tmp_path / "weights" / "checkpoint"))
        assert os.path.exists(str(tmp_path / "weights" / "metrics_log.jsonl"))
        # --compile-cache populated the persistent cache with the train-step
        # executable (proven 35.8s -> 10.6s epoch-1 across fresh processes,
        # bit-identical losses)
        assert any("train_step" in f for f in os.listdir(cache))

    def test_compile_cache_refuses_multihost(self, tmp_path):
        """A persistent compile cache under a distributed run reloads
        executables with collective thunks and deadlocks the Gloo rendezvous
        (root-caused in tests/mp_worker.py) — the combination must raise
        before jax.distributed.initialize."""
        import pytest

        from gan_codes_tpu.train_entry import train

        with pytest.raises(ValueError, match="multihost"):
            train(data_path="unused", encoder_weights_path=None,
                  multihost=True,
                  compile_cache_dir=str(tmp_path / "cache"))

    def test_matmul_precision_knob_plumbs_to_jax_config(self, tmp_path,
                                                        monkeypatch):
        """`--matmul-precision highest` must set jax_default_matmul_precision
        BEFORE any compute (true-fp32 semantics, PARITY.md). Intercept at
        fix_seed (the first call after the config updates) to keep the test
        cheap — no train-step compile."""
        import jax

        from gan_codes_tpu import train_entry
        from gan_codes_tpu.train_entry import train

        seen = {}

        def probe(_seed):
            seen["precision"] = jax.config.jax_default_matmul_precision
            raise RuntimeError("stop-after-config")

        monkeypatch.setattr(train_entry, "fix_seed", probe)
        before = jax.config.jax_default_matmul_precision
        try:
            with pytest.raises(RuntimeError, match="stop-after-config"):
                train(data_path=str(tmp_path), encoder_weights_path=None,
                      matmul_precision="highest")
            assert seen["precision"] == "highest"
        finally:
            jax.config.update("jax_default_matmul_precision",
                              before if before is not None else "default")
