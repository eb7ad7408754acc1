"""The `steps_per_dispatch` device loop (train/step.py
make_scanned_train_step): N full train steps in ONE jitted lax.scan dispatch
must reproduce N sequential single-step dispatches — same per-step RNG
stream, optimizer threading, metrics, and final params — single-device and
over the 8-virtual-device DP mesh, including the trainer's ragged-tail
fallback path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, LossConfig,
                                  TextEncoderConfig, TrainConfig)
from gan_codes_tpu.models.text_encoder import init_text_encoder
from gan_codes_tpu.train.state import create_train_state
from gan_codes_tpu.train.step import make_scanned_train_step, make_train_step

KEY = jax.random.PRNGKey(7)


def tiny_cfg(**train_kw):
    return GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=16),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
        text_encoder=TextEncoderConfig(vocab_size=30, embed_dim=8,
                                       hidden_dim=256, max_len=6),
        train=TrainConfig(**train_kw),
    )


def _batches(n, batch=4, max_len=6, vocab=30, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, batch, 16, 16, 3)).astype(np.float32)
    caps = rng.integers(1, vocab, (n, batch, max_len)).astype(np.int32)
    lens = rng.integers(1, max_len + 1, (n, batch)).astype(np.int32)
    return imgs, caps, lens


def _assert_tree_close(a, b, atol, rtol, msg):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol, err_msg=msg)


class TestScannedStep:
    def test_scan_equals_sequential(self):
        """3 scanned steps == 3 sequential dispatches: stacked metrics match
        per step and both towers' params match at the end. Tolerances cover
        XLA reassociation between the scanned and unrolled programs only."""
        cfg = tiny_cfg()
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        state0 = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        imgs, caps, lens = _batches(3)

        single = jax.jit(make_train_step(cfg))
        state_s = state0
        seq_metrics = []
        for i in range(3):
            state_s, m = single(state_s, te, imgs[i], caps[i], lens[i])
            seq_metrics.append(m)

        scanned = jax.jit(make_scanned_train_step(cfg))
        state_k, mk = scanned(state0, te, imgs, caps, lens)

        assert int(state_k.step) == int(state_s.step) == 3
        for i, m in enumerate(seq_metrics):
            for key in m:
                np.testing.assert_allclose(
                    float(mk[key][i]), float(m[key]), atol=1e-6, rtol=1e-5,
                    err_msg=f"step {i} metric {key}")
        for name in ("g_params", "d_params", "g_ema_params"):
            _assert_tree_close(getattr(state_s, name),
                               getattr(state_k, name),
                               atol=1e-6, rtol=1e-4, msg=name)
        # identical RNG stream threading
        np.testing.assert_array_equal(np.asarray(state_s.rng),
                                      np.asarray(state_k.rng))

    def test_scan_threads_gp_interval(self):
        """With lazy GP (interval 2) the scan carry's step counter drives the
        lax.cond exactly like sequential dispatches: active pattern 1,0,1,0."""
        cfg = dataclasses.replace(tiny_cfg(), loss=LossConfig(gp_interval=2))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        state0 = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        imgs, caps, lens = _batches(4)
        scanned = jax.jit(make_scanned_train_step(cfg))
        _, mk = scanned(state0, te, imgs, caps, lens)
        np.testing.assert_array_equal(np.asarray(mk["d_gp_active"]),
                                      [1.0, 0.0, 1.0, 0.0])
        assert float(mk["d_gp_loss"][1]) == 0.0

    def test_parallel_scanned_matches_single_device(self):
        """Mesh-compiled device loop (dp.make_parallel_scanned_train_step):
        sharded over 8 virtual devices == single-device scanned."""
        from gan_codes_tpu.parallel import (make_mesh,
                                            make_parallel_scanned_train_step,
                                            replicate, shard_batch_stack)

        cfg = tiny_cfg()
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        state0 = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        imgs, caps, lens = _batches(2, batch=8)

        scanned = jax.jit(make_scanned_train_step(cfg))
        state_s, ms = scanned(state0, te, imgs, caps, lens)

        mesh = make_mesh()
        pstep = make_parallel_scanned_train_step(cfg, mesh,
                                                 donate_state=False)
        sharded = shard_batch_stack(mesh, cfg, imgs, caps, lens)
        state_p, mp = pstep(replicate(mesh, state0), replicate(mesh, te),
                            *sharded)
        for key in ms:
            np.testing.assert_allclose(np.asarray(mp[key]),
                                       np.asarray(ms[key]),
                                       atol=1e-5, rtol=2e-4, err_msg=key)
        for name in ("g_params", "d_params"):
            _assert_tree_close(getattr(state_s, name),
                               getattr(state_p, name),
                               atol=5e-5, rtol=2e-3, msg=name)


class TestTrainerDispatch:
    @pytest.mark.parametrize("mesh_mode", [False, True])
    def test_trainer_epoch_matches_default(self, tmp_path, mesh_mode):
        """A Trainer at steps_per_dispatch=2 matches the n=1 twin: same step
        count, epoch metric means, final params.

        Single-device: batches 4,4,4,2 (one full chunk, then an odd full
        batch flushed by the SIZE-mismatch guard, then the ragged tail —
        both single-step fallback paths). Mesh: 3 batches of 8 over the
        8-virtual-device data axis (one stacked chunk + count remainder)."""
        from gan_codes_tpu.config import DataConfig
        from gan_codes_tpu.data import CUBDataset, DataLoader, make_synthetic_cub
        from gan_codes_tpu.parallel import make_mesh
        from gan_codes_tpu.train.trainer import Trainer

        root = str(tmp_path / "data")
        if mesh_mode:
            # batch must be divisible by the data axis (8): 3 full batches
            mesh, bs, n_train, drop_last, n_steps = make_mesh(), 8, 24, True, 3
        else:
            mesh, bs, n_train, drop_last, n_steps = None, 4, 14, False, 4
        make_synthetic_cub(root, n_train=n_train, n_test=8, image_size=16)

        def run(n_disp, tag):
            cfg = dataclasses.replace(
                tiny_cfg(batch_size=bs, eval_max_batches=0,
                         steps_per_dispatch=n_disp),
                text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                               hidden_dim=256, max_len=18))
            te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
            tr = Trainer(cfg, te, str(tmp_path / f"ckpt{tag}"),
                         str(tmp_path / f"imgs{tag}"), mesh=mesh)
            loader = DataLoader(CUBDataset(DataConfig(data_dir=root,
                                                      image_size=16),
                                           "train"), bs, seed=0,
                                drop_last=drop_last)
            loader.set_epoch(0)
            means = tr.train_epoch(loader)
            tr.close()
            return tr, means

        tr1, means1 = run(1, f"a{mesh_mode}")
        tr2, means2 = run(2, f"b{mesh_mode}")
        assert int(tr2.state.step) == int(tr1.state.step) == n_steps
        for k in means1:
            np.testing.assert_allclose(means2[k], means1[k],
                                       atol=1e-5, rtol=2e-4, err_msg=k)
        for name in ("g_params", "d_params"):
            _assert_tree_close(getattr(tr1.state, name),
                               getattr(tr2.state, name),
                               atol=5e-5, rtol=2e-3, msg=name)

    def test_gp_interval_epoch_mean_masking(self, tmp_path):
        """Stacked [N] d_gp_active entries mask epoch means exactly like the
        per-step path: interval-2 over 4 steps averages the 2 active steps."""
        from gan_codes_tpu.config import DataConfig
        from gan_codes_tpu.data import CUBDataset, DataLoader, make_synthetic_cub
        from gan_codes_tpu.train.trainer import Trainer

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=16, n_test=8, image_size=16)
        cfg = dataclasses.replace(
            tiny_cfg(batch_size=4, eval_max_batches=0, steps_per_dispatch=2),
            loss=LossConfig(gp_interval=2),
            text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                           hidden_dim=256, max_len=18))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        tr = Trainer(cfg, te, str(tmp_path / "ckpt"), str(tmp_path / "imgs"))
        loader = DataLoader(CUBDataset(DataConfig(data_dir=root,
                                                  image_size=16),
                                       "train"), 4, seed=0)
        loader.set_epoch(0)
        means = tr.train_epoch(loader)
        tr.close()
        assert int(tr.state.step) == 4
        assert np.isfinite(means["d_gp_loss"]) and means["d_gp_loss"] != 0.0


class TestResumeMutability:
    def test_steps_per_dispatch_is_resume_mutable(self):
        from gan_codes_tpu.train.checkpoint import config_mismatches

        a = tiny_cfg(steps_per_dispatch=1)
        b = tiny_cfg(steps_per_dispatch=4)
        assert config_mismatches(dataclasses.asdict(a),
                                 dataclasses.asdict(b)) == []


class TestDevicePrefetch:
    def test_device_prefetch_trajectory_identical(self, tmp_path):
        """TrainConfig.device_prefetch moves batch uploads to a worker
        thread; the step SEQUENCE is unchanged, so a twin epoch with the
        knob on must land on bit-comparable metrics and params."""
        from gan_codes_tpu.config import DataConfig
        from gan_codes_tpu.data import (CUBDataset, DataLoader,
                                        make_synthetic_cub)
        from gan_codes_tpu.train.trainer import Trainer

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=16, n_test=8, image_size=16)

        def run(prefetch, tag):
            cfg = dataclasses.replace(
                tiny_cfg(batch_size=4, eval_max_batches=0,
                         device_prefetch=prefetch),
                text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                               hidden_dim=256, max_len=18))
            te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
            tr = Trainer(cfg, te, str(tmp_path / f"ckpt{tag}"),
                         str(tmp_path / f"imgs{tag}"))
            loader = DataLoader(CUBDataset(DataConfig(data_dir=root,
                                                      image_size=16),
                                           "train"), 4, seed=0)
            loader.set_epoch(0)
            means = tr.train_epoch(loader)
            tr.close()
            return tr, means

        tr1, means1 = run(False, "off")
        tr2, means2 = run(True, "on")
        assert int(tr2.state.step) == int(tr1.state.step) == 4
        for k in means1:
            np.testing.assert_allclose(means2[k], means1[k],
                                       atol=0, rtol=0, err_msg=k)
        for name in ("g_params", "d_params"):
            _assert_tree_close(getattr(tr1.state, name),
                               getattr(tr2.state, name),
                               atol=0, rtol=0, msg=name)
