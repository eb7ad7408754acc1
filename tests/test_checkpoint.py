"""Checkpoint round-trip bit-exactness (incl. RNG + EMA + optimizer state —
the reference dropped RNG across resumes, SURVEY §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, TextEncoderConfig)
from gan_codes_tpu.train.checkpoint import CheckpointManager, empty_histories
from gan_codes_tpu.train.state import create_train_state

KEY = jax.random.PRNGKey(5)


def tiny_cfg():
    return GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=16),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
        text_encoder=TextEncoderConfig(vocab_size=16, embed_dim=4,
                                       hidden_dim=8, max_len=4),
    )


class TestCheckpointRoundTrip:
    def test_state_bit_exact(self, tmp_path):
        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        hist = empty_histories()
        hist["g_losses"].append(1.25)
        hist["fid_scores"].append(42.0)
        mgr.save(epoch=0, state=state, histories=hist)

        template = jax.jit(lambda k: create_train_state(k, cfg))(
            jax.random.PRNGKey(999))  # different values, same structure
        restored, epoch, hist2 = mgr.restore(template)

        assert epoch == 0
        assert hist2["g_losses"] == [1.25]
        assert hist2["fid_scores"] == [42.0]
        for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                        jax.tree.leaves(jax.device_get(restored))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_histories_published_after_state_finalizes(self, tmp_path):
        """histories.json is the resume commit point: it names the epoch
        restore() returns, so it must land only after every async Orbax save
        has finalized. If it were written first, a crash in the window would
        pair epoch-N histories with epoch-(N-1) params and resume would
        silently skip an epoch of training."""
        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        events = []
        orig_save = mgr._ckptr.save
        orig_wait = mgr._ckptr.wait_until_finished
        orig_json = mgr._write_json
        mgr._ckptr.save = lambda *a, **k: (events.append("orbax_save"),
                                           orig_save(*a, **k))[-1]
        mgr._ckptr.wait_until_finished = lambda: (events.append("wait"),
                                                  orig_wait())[-1]
        mgr._write_json = lambda name, obj: (events.append(name),
                                             orig_json(name, obj))[-1]
        mgr.save(0, state, empty_histories(), config=cfg)
        hist_at = events.index("histories.json")
        assert "wait" in events[:hist_at], events
        assert "orbax_save" not in events[hist_at:], events

    def test_numbered_checkpoint_cadence(self, tmp_path):
        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), numbered_every=2)
        mgr.save(0, state, empty_histories())  # epoch 0: no numbered
        mgr.save(1, state, empty_histories())  # epoch 1: numbered (2 % 2 == 0)
        import os
        names = set(os.listdir(str(tmp_path / "ckpt")))
        assert "checkpoint_epoch_1" in names
        assert "checkpoint_epoch_0" not in names
        assert "gen_0" in names and "gen_1" in names

    def test_config_persisted_and_verified(self, tmp_path):
        """The checkpoint records its GANConfig; resuming with a semantically
        different config fails loudly with a readable diff, while
        resume-mutable fields (num_epochs etc.) may change freely."""
        import dataclasses
        import os

        import pytest

        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state, empty_histories(), config=cfg)
        assert os.path.exists(str(tmp_path / "ckpt" / "config.json"))

        mgr.verify_config(cfg)  # identical: fine

        grown = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator, n_channels=8))
        with pytest.raises(ValueError) as err:
            mgr.verify_config(grown)
        assert "generator.n_channels" in str(err.value)
        assert "4" in str(err.value) and "8" in str(err.value)

        extended = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, num_epochs=999))
        mgr.verify_config(extended)  # allowlisted: fine

        # pure-perf knobs are resume-mutable: toggling the documented VMEM
        # hint or G remat across a resume must not block the restore
        perf = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, xla_scoped_vmem_kib=65536),
            generator=dataclasses.replace(cfg.generator, remat_blocks=True))
        mgr.verify_config(perf)

        # ... including the exact-math MXU lane-fill knobs (lane_pad /
        # image_pad change no numerics and no param shapes)
        padded = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, image_pad=16),
            generator=dataclasses.replace(cfg.generator, image_pad=16,
                                          lane_pad=16, lane_pad_min_ch=8),
            discriminator=dataclasses.replace(cfg.discriminator, lane_pad=16,
                                              lane_pad_min_ch=8))
        mgr.verify_config(padded)

        # logging cadence is resume-mutable (changes what's WRITTEN, not
        # what's computed): enabling per-step rows mid-stream must not
        # block the restore
        steplog = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, log_every_steps=2))
        mgr.verify_config(steplog)

        # checkpoints predating config persistence verify as a no-op
        os.remove(str(tmp_path / "ckpt" / "config.json"))
        mgr.verify_config(grown)

    def test_trainer_resume_rejects_changed_config(self, tmp_path):
        """Trainer.fit(auto_resume=True) refuses to restore a checkpoint
        written under a different architecture config."""
        import dataclasses

        import pytest

        from gan_codes_tpu.config import DataConfig, TrainConfig
        from gan_codes_tpu.data import CUBDataset, DataLoader, make_synthetic_cub
        from gan_codes_tpu.models.text_encoder import init_text_encoder
        from gan_codes_tpu.train.trainer import Trainer

        root = str(tmp_path / "data")
        info = make_synthetic_cub(root, n_train=4, n_test=2, image_size=16)
        cfg = dataclasses.replace(
            tiny_cfg(),
            text_encoder=TextEncoderConfig(vocab_size=info["n_words"],
                                           embed_dim=8, hidden_dim=256,
                                           max_len=18),
            train=TrainConfig(batch_size=4, eval_max_batches=1))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        ds = CUBDataset(DataConfig(data_dir=root, image_size=16), "train")
        ckpt_dir = str(tmp_path / "ckpt2")
        trainer = Trainer(cfg, te, ckpt_dir, str(tmp_path / "imgs"))
        trainer.fit(DataLoader(ds, 4, seed=0), num_epochs=1,
                    auto_resume=False)

        changed = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, gp_coef=3.0))
        trainer2 = Trainer(changed, te, ckpt_dir, str(tmp_path / "imgs"))
        with pytest.raises(ValueError, match="loss.gp_coef"):
            trainer2.fit(DataLoader(ds, 4, seed=0), num_epochs=2,
                         auto_resume=True)

    def test_latest_generator_epoch(self, tmp_path):
        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.latest_generator_epoch() is None
        mgr.save(3, state, empty_histories())
        mgr.save(7, state, empty_histories())
        assert mgr.latest_generator_epoch() == 7

    def test_histories_json_is_strict_rfc_json_with_inf_sentinels(
            self, tmp_path):
        """The FID failure sentinel float('inf') must not leak as a bare
        `Infinity` token (invalid per RFC 8259 — jq/JSON.parse/pandas reject
        the file). Non-finite floats are stringified on write and restored
        to floats on read (utils/jsonio.py)."""
        import json
        import math

        def strict_loads(text):
            def reject(tok):
                raise AssertionError(f"non-RFC JSON token: {tok}")
            return json.loads(text, parse_constant=reject)

        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        hist = empty_histories()
        hist["fid_scores"] = [float("inf"), 12.5]
        hist["is_scores"] = [1.0, float("nan")]
        mgr.save(1, state, hist, config=cfg)

        for name in ("histories.json", "config.json"):
            with open(str(tmp_path / "ckpt" / name)) as f:
                strict_loads(f.read())  # parses under a strict reader

        _, epoch, restored = mgr.restore(state)
        assert epoch == 1
        assert restored["fid_scores"][0] == float("inf")
        assert restored["fid_scores"][1] == 12.5
        assert math.isnan(restored["is_scores"][1])


class TestResolveInferenceConfig:
    def test_override_validated_against_trained_size(self, tmp_path):
        """An explicit --image-size must neither discard the persisted
        config (a non-default-width checkpoint would fail restore against
        the rebuilt default) nor silently accept a size the weights cannot
        restore into (review findings, two rounds)."""
        import dataclasses

        from gan_codes_tpu.config import GANConfig
        from gan_codes_tpu.train.checkpoint import CheckpointManager

        cfg = GANConfig.for_image_size(16, n_channels=4, vocab_size=20)
        mgr = CheckpointManager(str(tmp_path / "w"))
        mgr.save_config(cfg)

        same = mgr.resolve_inference_config(vocab_size=20, image_size=16)
        assert same == cfg  # size-matching override is a no-op

        # a DIFFERENT size cannot restore (the block ladder derives from
        # image_size) -> clean error naming the trained size, not a deep
        # Orbax tree mismatch
        import pytest

        with pytest.raises(ValueError, match="trained at\n?.*16px|16px"):
            mgr.resolve_inference_config(vocab_size=20, image_size=32)

        vocab = mgr.resolve_inference_config(vocab_size=77)
        assert vocab.text_encoder.vocab_size == 77
        assert vocab.generator == cfg.generator

    def test_pre_config_dir_falls_back_to_256(self, tmp_path):
        from gan_codes_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "w"))
        cfg = mgr.resolve_inference_config(vocab_size=10)
        assert cfg.generator.image_size == 256
        assert cfg.text_encoder.vocab_size == 10
        cfg2 = mgr.resolve_inference_config(vocab_size=10, image_size=64)
        assert cfg2.generator.image_size == 64
