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

    def test_latest_generator_epoch(self, tmp_path):
        cfg = tiny_cfg()
        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.latest_generator_epoch() is None
        mgr.save(3, state, empty_histories())
        mgr.save(7, state, empty_histories())
        assert mgr.latest_generator_epoch() == 7
