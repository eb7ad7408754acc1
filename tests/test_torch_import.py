"""Reference (torch) -> framework weight-import tests.

The oracle leg runs the reference's forward semantics DIRECTLY on the raw
reference-format state_dict (torch NCHW, reference key names — mirroring
`src/generator/model.py:32-46`, `src/generator/residual_block.py:34-60`,
`src/discriminator/model.py:36-59`), with no layout conversion at all.
If the converter's transposes or key mapping were wrong, this leg and the
converted-JAX leg would diverge.
"""
import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig)
from gan_codes_tpu.models.discriminator import discriminator_apply
from gan_codes_tpu.models.generator import generator_apply
from gan_codes_tpu.models.torch_import import (
    convert_torch_discriminator_state_dict,
    convert_torch_generator_state_dict, import_generator_checkpoint,
    infer_generator_config, load_torch_generator)

GCFG = GeneratorConfig(n_channels=4, latent_dim=12, sentence_dim=16,
                       affine_hidden=8, image_size=16)
DCFG = DiscriminatorConfig(n_channels=4, sentence_dim=16, image_size=16)


# -- reference-format state_dict builders (shapes from the reference
# module definitions: generator/model.py:8-30, discriminator/model.py:8-34)

def _make_ref_generator_sd(cfg: GeneratorConfig, seed: int = 0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    sd = {"linear_in.weight": r(cfg.seed_channels * cfg.base_size ** 2,
                                cfg.latent_dim),
          "linear_in.bias": r(cfg.seed_channels * cfg.base_size ** 2)}

    def affine(prefix, out_ch):
        for mlp in ("gamma_mlp", "beta_mlp"):
            sd[f"{prefix}.{mlp}.0.weight"] = r(cfg.affine_hidden,
                                               cfg.sentence_dim)
            sd[f"{prefix}.{mlp}.0.bias"] = r(cfg.affine_hidden)
            sd[f"{prefix}.{mlp}.2.weight"] = r(out_ch, cfg.affine_hidden)
            sd[f"{prefix}.{mlp}.2.bias"] = r(out_ch)

    names = [f"res_blocks.{i}"
             for i in range(len(cfg.block_channels) - 1)] + ["res_block_out"]
    for name, (cin, cout) in zip(names, cfg.block_channels):
        affine(f"{name}.fusion_block_1", cin)
        affine(f"{name}.fusion_block_2", cin)
        sd[f"{name}.conv_1.weight"] = r(cout, cin, 3, 3)
        sd[f"{name}.conv_1.bias"] = r(cout)
        affine(f"{name}.fusion_block_3", cout)
        affine(f"{name}.fusion_block_4", cout)
        sd[f"{name}.conv_2.weight"] = r(cout, cout, 3, 3)
        sd[f"{name}.conv_2.bias"] = r(cout)
        if cin != cout:
            sd[f"{name}.scale_conv.weight"] = r(cout, cin, 1, 1)
            sd[f"{name}.scale_conv.bias"] = r(cout)
        # nonzero: a zero gamma would hide any residual-path mapping error
        sd[f"{name}.gamma"] = r(1)
    sd["conv_out.1.weight"] = r(3, cfg.n_channels, 3, 3)
    sd["conv_out.1.bias"] = r(3)
    return sd


def _make_ref_discriminator_sd(cfg: DiscriminatorConfig, seed: int = 1):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    sd = {"img_forward.0.weight": r(cfg.n_channels, 3, 3, 3),
          "img_forward.0.bias": r(cfg.n_channels)}
    for i, (cin, cout) in enumerate(cfg.block_channels):
        p = f"img_forward.{i + 1}"
        sd[f"{p}.residual_conv.0.weight"] = r(cout, cin, 4, 4)
        sd[f"{p}.residual_conv.2.weight"] = r(cout, cout, 3, 3)
        if cin != cout:
            sd[f"{p}.scale_conv.weight"] = r(cout, cin, 1, 1)
            sd[f"{p}.scale_conv.bias"] = r(cout)
        sd[f"{p}.gamma"] = r(1)
    sd["img_sentence_forward.0.weight"] = r(
        cfg.n_channels * 2, cfg.embed_channels + cfg.sentence_dim, 3, 3)
    sd["img_sentence_forward.2.weight"] = r(
        1, cfg.n_channels * 2, cfg.final_size, cfg.final_size)
    return sd


# raw-state_dict reference forwards live in torch_ref (shared with
# tools/validate_pretrained.py --check-weights)
from torch_ref import (sd_discriminator_forward,  # noqa: E402
                       sd_generator_forward)


class TestGeneratorImport:
    def test_converted_forward_matches_raw_torch(self):
        sd = _make_ref_generator_sd(GCFG)
        params = convert_torch_generator_state_dict(sd, GCFG)

        noise = torch.randn(3, GCFG.latent_dim,
                            generator=torch.Generator().manual_seed(7))
        sent = torch.randn(3, GCFG.sentence_dim,
                           generator=torch.Generator().manual_seed(8))
        want = sd_generator_forward(sd, GCFG, noise, sent)  # NCHW
        got = generator_apply(params, GCFG, np.asarray(noise),
                              np.asarray(sent))  # NHWC
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(),
            atol=2e-5, rtol=1e-4)

    def test_infer_config_from_shapes(self):
        sd = _make_ref_generator_sd(GCFG)
        inferred = infer_generator_config(sd)
        assert inferred.n_channels == GCFG.n_channels
        assert inferred.latent_dim == GCFG.latent_dim
        assert inferred.sentence_dim == GCFG.sentence_dim
        assert inferred.affine_hidden == GCFG.affine_hidden
        assert inferred.image_size == GCFG.image_size

    def test_wrong_config_raises_readably(self):
        sd = _make_ref_generator_sd(GCFG)
        import dataclasses

        bad = dataclasses.replace(GCFG, n_channels=8)
        with pytest.raises((ValueError, KeyError)):
            convert_torch_generator_state_dict(sd, bad)

    def test_load_accepts_full_checkpoint_dict(self, tmp_path):
        """The reference's checkpoint.pt wraps the state_dict under
        'generator' (`model.py:111-115`); a raw gen_N.pth is bare."""
        sd = _make_ref_generator_sd(GCFG)
        raw, full = str(tmp_path / "gen_5.pth"), str(tmp_path / "ckpt.pt")
        torch.save(sd, raw)
        torch.save({"generator": sd, "epoch": 5}, full)
        p1, c1 = load_torch_generator(raw)
        p2, c2 = load_torch_generator(full)
        assert c1 == c2 == GCFG
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_import_cli_roundtrip_through_serve(self, tmp_path):
        """import_generator_checkpoint produces a weights dir that the
        serving stack consumes as-is (config.json + Orbax gen_N)."""
        from gan_codes_tpu.train.checkpoint import CheckpointManager

        sd = _make_ref_generator_sd(GCFG)
        pth = str(tmp_path / "gen_3.pth")
        torch.save(sd, pth)
        out = str(tmp_path / "weights")
        import_generator_checkpoint(pth, out, epoch=3)

        mgr = CheckpointManager(out)
        assert mgr.latest_generator_epoch() == 3
        cfg = mgr.load_config()
        assert cfg.generator == GCFG
        from gan_codes_tpu.models.generator import init_generator
        template = jax.eval_shape(
            lambda k: {"g_params": init_generator(k, cfg.generator),
                       "g_ema_params": init_generator(k, cfg.generator)},
            jax.random.PRNGKey(0))
        tree = mgr.restore_generator(3, template)
        noise = np.zeros((1, GCFG.latent_dim), np.float32)
        sent = np.zeros((1, GCFG.sentence_dim), np.float32)
        img = generator_apply(tree["g_params"], cfg.generator, noise, sent)
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()


class TestDiscriminatorImport:
    def test_converted_forward_matches_raw_torch(self):
        sd = _make_ref_discriminator_sd(DCFG)
        params = convert_torch_discriminator_state_dict(sd, DCFG)

        img = torch.randn(2, 3, DCFG.image_size, DCFG.image_size,
                          generator=torch.Generator().manual_seed(9))
        sent = torch.randn(2, DCFG.sentence_dim,
                           generator=torch.Generator().manual_seed(10))
        want = sd_discriminator_forward(sd, DCFG, img, sent)  # NCHW
        got = discriminator_apply(params, np.asarray(
            img.permute(0, 2, 3, 1).contiguous()), np.asarray(sent))
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(),
            atol=2e-5, rtol=1e-4)


class TestExport:
    def test_ref_sd_roundtrips_through_import_export(self):
        """reference sd -> convert -> export must reproduce every tensor
        bit-exactly (transposes are involutions; key mapping is 1:1)."""
        from gan_codes_tpu.models.torch_import import (
            export_generator_state_dict)

        sd = _make_ref_generator_sd(GCFG)
        back = export_generator_state_dict(
            convert_torch_generator_state_dict(sd, GCFG))
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(),
                                          err_msg=k)

    def test_discriminator_roundtrip(self):
        from gan_codes_tpu.models.torch_import import (
            export_discriminator_state_dict)

        sd = _make_ref_discriminator_sd(DCFG)
        back = export_discriminator_state_dict(
            convert_torch_discriminator_state_dict(sd, DCFG))
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(),
                                          err_msg=k)

    def test_export_checkpoint_cli_path(self, tmp_path):
        """weights-dir -> gen_N.pth: the exported file reloads through the
        import path and the forward agrees with the original params."""
        from gan_codes_tpu.models.torch_import import (
            export_generator_checkpoint)

        sd = _make_ref_generator_sd(GCFG, seed=11)
        pth = str(tmp_path / "gen_7.pth")
        torch.save(sd, pth)
        wdir = str(tmp_path / "weights")
        import_generator_checkpoint(pth, wdir, epoch=7)

        out_pth = str(tmp_path / "exported.pth")
        export_generator_checkpoint(wdir, out_pth)
        back = torch.load(out_pth, weights_only=True)
        for k in sd:
            np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(),
                                          err_msg=k)


def _make_ref_adam_sd(model_sd, step=5, seed=20):
    """Synthetic torch Adam optimizer state in the reference's layout:
    state keyed by parameter index in `model.parameters()` order (== the
    model state_dict key order, asserted below)."""
    g = torch.Generator().manual_seed(seed)
    state = {}
    for i, k in enumerate(model_sd):
        state[i] = {"step": torch.tensor(float(step)),
                    "exp_avg": torch.randn(model_sd[k].shape, generator=g),
                    "exp_avg_sq": torch.rand(model_sd[k].shape, generator=g)}
    return {"state": state,
            "param_groups": [{"params": list(range(len(model_sd)))}]}


class TestLazyAdamState:
    """torch creates per-param Adam state lazily on first grad; a checkpoint
    can therefore have params with NO state entry (or none at all for a
    group). The importer must substitute zero moments / fresh-init instead
    of crashing (review finding, round 4)."""

    def _sd(self):
        g = torch.Generator().manual_seed(4)
        return {"a.weight": torch.randn(3, 2, generator=g),
                "b.weight": torch.randn(4, generator=g)}

    def test_param_missing_from_state_gets_zero_moments(self, capsys):
        from gan_codes_tpu.models.torch_import import _adam_moments
        sd = self._sd()
        opt = _make_ref_adam_sd(sd, step=9)
        del opt["state"][1]  # b.weight never received a gradient
        mu, nu, count = _adam_moments(opt, sd, lambda d: d)
        assert count == 9
        np.testing.assert_array_equal(mu["b.weight"].numpy(),
                                      np.zeros(4, np.float32))
        np.testing.assert_array_equal(nu["b.weight"].numpy(),
                                      np.zeros(4, np.float32))
        # the stepped param's moments import untouched
        np.testing.assert_array_equal(
            mu["a.weight"].numpy(), opt["state"][0]["exp_avg"].numpy())
        assert "zero moments substituted" in capsys.readouterr().out

    def test_no_state_for_any_group_param_is_fresh_init(self, capsys):
        from gan_codes_tpu.models.torch_import import _adam_moments
        sd = self._sd()
        opt = _make_ref_adam_sd(sd)
        # non-empty state dict whose ids all belong to some OTHER group
        opt["state"] = {99: opt["state"][0]}
        assert _adam_moments(opt, sd, lambda d: d) is None
        out = capsys.readouterr().out
        assert "fresh Adam init" in out
        assert "zero moments substituted" not in out  # no misleading notice


class TestTrainingCheckpointImport:
    def test_parameters_order_matches_state_dict_order(self):
        """The importer maps optimizer indices to state_dict keys assuming
        both traversals agree (direct params, then children, registration
        order) — incl. a module whose direct Parameter is registered AFTER
        its submodules, like the reference blocks' trailing `gamma`."""
        import torch.nn as nn

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = nn.Linear(3, 4)
                self.conv = nn.Conv2d(2, 2, 1)
                self.gamma = nn.Parameter(torch.zeros(1))  # after children

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.stem = nn.Linear(2, 3)
                self.blocks = nn.ModuleList([Block(), Block()])

        net = Net()
        assert [n for n, _ in net.named_parameters()] == list(
            net.state_dict())

    def test_full_checkpoint_resumes_in_trainer(self, tmp_path):
        """reference checkpoint.pt -> import -> our Trainer auto-resumes:
        epoch/histories restored, Adam moments land in the optax state
        (layout-transposed), and one more epoch trains finitely."""
        from gan_codes_tpu.data import CUBDataset, DataLoader
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        from gan_codes_tpu.config import DataConfig
        from gan_codes_tpu.models.text_encoder import init_text_encoder
        from gan_codes_tpu.models.torch_import import (
            import_training_checkpoint)
        from gan_codes_tpu.train.checkpoint import CheckpointManager
        from gan_codes_tpu.train.state import create_train_state
        from gan_codes_tpu.train.trainer import Trainer

        gsd = _make_ref_generator_sd(GCFG, seed=30)
        dsd = _make_ref_discriminator_sd(DCFG, seed=31)
        ck = {"generator": gsd, "discriminator": dsd,
              "g_optimizer": _make_ref_adam_sd(gsd, step=7, seed=32),
              "d_optimizer": _make_ref_adam_sd(dsd, step=14, seed=33),
              "epoch": 2,
              # numpy scalars, as the REAL reference writes them
              # (model.py:233-236 appends np.mean outputs): regression for
              # torch>=2.6 weights_only rejecting numpy globals
              "g_losses": [np.float64(0.5), np.float64(0.4),
                           np.float64(0.3)],
              "d_losses": [2.0, 1.9, 1.8],
              "d_gp_losses": [0.1, 0.1, 0.1],
              "txtimg_losses": [1.0, 0.9, 0.8],
              "is_scores": [1.0, 1.0, 1.0], "fid_scores": [9.0, 8.0, 7.0]}
        pt = str(tmp_path / "checkpoint.pt")
        torch.save(ck, pt)

        wdir = str(tmp_path / "weights")
        epoch = import_training_checkpoint(pt, wdir, seed=5,
                                   vocab_size=20, batch_size=2)
        assert epoch == 2

        mgr = CheckpointManager(wdir)
        cfg = mgr.load_config()
        assert cfg.generator == GCFG
        assert cfg.train.seed == 5  # the ACTUAL seed the rng derives from
        template = jax.eval_shape(
            lambda k: create_train_state(k, cfg), jax.random.PRNGKey(0))
        state, last_epoch, hist = mgr.restore(template)
        assert last_epoch == 2 and int(state.step) == 7
        assert hist["g_losses"] == [0.5, 0.4, 0.3]
        assert hist["fid_scores"] == [9.0, 8.0, 7.0]

        # spot-check moment layout: linear_in exp_avg must be transposed
        adam = state.g_opt_state[1][0]  # chain(clip, adam(scale_by_adam,.))
        import optax
        assert isinstance(adam, optax.ScaleByAdamState)
        assert int(adam.count) == 7
        np.testing.assert_allclose(
            np.asarray(adam.mu["linear_in"]["w"]),
            ck["g_optimizer"]["state"][0]["exp_avg"].numpy().T, atol=0)
        # gamma params: converted weight is scalar, moment must be too
        assert np.shape(adam.mu["blocks"][0]["gamma"]) == ()

        # the imported directory is a normal resume point: one more epoch
        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=4, n_test=2, image_size=24)
        dcfg = DataConfig(data_dir=root, image_size=GCFG.image_size)
        train_ds = CUBDataset(dcfg, "train")
        test_ds = CUBDataset(dcfg, "test", augment=False)
        import dataclasses

        assert cfg.text_encoder.vocab_size == train_ds.n_words
        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, eval_max_batches=1))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg2.text_encoder)
        trainer = Trainer(cfg2, te, wdir, str(tmp_path / "imgs"),
                          code2word=train_ds.code2word, seed=5)
        hist2 = trainer.fit(DataLoader(train_ds, 2, seed=5),
                            DataLoader(test_ds, 2, shuffle=False, seed=5),
                            num_epochs=4, auto_resume=True)
        assert len(hist2["g_losses"]) == 4  # 3 imported + 1 new
        assert np.isfinite(hist2["g_losses"][3])
