"""Utility-layer tests: profiling, image IO, plotting, batch helpers."""
import json
import os

import numpy as np

from gan_codes_tpu.data.loader import Batch
from gan_codes_tpu.data.utils import normalize_images_np, sort_batch_by_length
from gan_codes_tpu.utils import image_io, plotting
from gan_codes_tpu.utils.profiling import MetricsLogger, StepTimer


class TestProfiling:
    def test_step_timer_skips_warmup(self):
        import time
        timer = StepTimer(skip_first=2)
        for _ in range(5):
            with timer:
                time.sleep(0.001)
        s = timer.summary()
        assert s["steps"] == 3
        assert s["mean_s"] > 0 and s["p95_s"] >= s["p50_s"]

    def test_metrics_logger_jsonl(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log(1, g_loss=0.5, d_loss=2.0)
        log.log(2, g_loss=0.4, d_loss=1.9)
        log.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["step"] == 1 and lines[0]["g_loss"] == 0.5
        assert lines[1]["step"] == 2 and lines[1]["d_loss"] == 1.9

    def test_metrics_logger_inf_sentinel_is_strict_json(self, tmp_path):
        """fid=inf rows (inception absent) must stay RFC 8259-parseable —
        bare `Infinity` tokens break jq/JSON.parse/pandas (utils/jsonio.py
        stringifies non-finite floats)."""
        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log(1, fid_score=float("inf"), is_score=1.0,
                g_loss=float("nan"))
        log.close()

        def reject(tok):
            raise AssertionError(f"non-RFC JSON token: {tok}")

        (rec,) = [json.loads(l, parse_constant=reject) for l in open(path)]
        assert rec["fid_score"] == "Infinity"
        assert rec["g_loss"] == "NaN"
        assert rec["is_score"] == 1.0

        from gan_codes_tpu.utils.jsonio import restore_nonfinite
        back = restore_nonfinite(rec)
        assert back["fid_score"] == float("inf")

    def test_metrics_logger_truncate_from(self, tmp_path):
        """Resume replays epochs after the last checkpoint; truncate_from
        drops their stale rows so the log stays one-row-per-epoch."""
        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        for e in range(4):
            log.log(e * 10, epoch=e, g_loss=float(e))
        log.truncate_from(2)       # epochs 2, 3 will be replayed
        log.log(99, epoch=2, g_loss=2.5)  # replayed epoch 2
        log.close()
        lines = [json.loads(l) for l in open(path)]
        assert [l["epoch"] for l in lines] == [0, 1, 2]
        assert lines[-1]["g_loss"] == 2.5


class TestImageIO:
    def test_denormalize_range(self):
        img = np.array([[[-1.0, 0.0, 1.0]]], np.float32)
        out = image_io.denormalize_to_uint8(img)
        np.testing.assert_array_equal(out[0, 0], [0, 127, 255])

    def test_save_image_slash_safe(self, tmp_path):
        img = np.zeros((8, 8, 3), np.float32)
        path = image_io.save_image(img, str(tmp_path), "001.Bird/img_01")
        assert os.path.basename(path) == "001.Bird_img_01.png"
        assert os.path.exists(path)

    def test_grid_shape(self, tmp_path):
        imgs = np.zeros((5, 8, 8, 3), np.float32)
        path = image_io.save_image_grid(imgs, str(tmp_path / "g.png"))
        assert os.path.exists(path)

    def test_decode_caption(self):
        cap = np.array([3, 2, 0, 0])
        s = image_io.decode_caption(cap, 2, {3: "red", 2: "bird"})
        assert s == "red bird"
        s2 = image_io.decode_caption(cap, 2, None)
        assert s2 == "[3] [2]"


class TestPlotting:
    def test_plot_losses_and_metrics(self, tmp_path):
        p1 = plotting.plot_losses([1.0, 0.5], [2.0, 1.8], [0.1, 0.2],
                                  str(tmp_path / "l.png"))
        p2 = plotting.plot_metrics([100.0, 80.0], [1.5, 2.0],
                                   epochs=[0, 1],
                                   path_save=str(tmp_path / "m.png"))
        assert os.path.exists(p1) and os.path.exists(p2)


class TestBatchHelpers:
    def test_sort_by_length_descending(self):
        batch = Batch(images=np.arange(4)[:, None],
                      captions=np.arange(8).reshape(4, 2),
                      cap_lens=np.array([2, 5, 1, 5]),
                      file_names=["a", "b", "c", "d"])
        out = sort_batch_by_length(batch)
        assert out["cap_lens"].tolist() == [5, 5, 2, 1]
        assert out["file_names"] == ["b", "d", "a", "c"]  # stable

    def test_normalize_np(self):
        u8 = np.array([0, 127.5, 255], np.uint8)
        out = normalize_images_np(u8)
        assert out.min() >= -1.0 and out.max() <= 1.0


class TestCompilerOptions:
    """TrainConfig.step_compiler_options: the scoped-VMEM hint must ship
    ONLY on TPU backends — the flag is unknown to the CPU compiler and
    would fail every test-suite compile."""

    def test_none_by_default(self):
        from gan_codes_tpu.config import TrainConfig
        assert TrainConfig().step_compiler_options() is None

    def test_suppressed_on_cpu(self):
        from gan_codes_tpu.config import TrainConfig
        cfg = TrainConfig(xla_scoped_vmem_kib=65536)
        # conftest forces the CPU platform for the whole suite
        assert cfg.step_compiler_options() is None

    def test_emitted_for_tpu(self, monkeypatch):
        import jax
        from gan_codes_tpu.config import TrainConfig
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cfg = TrainConfig(xla_scoped_vmem_kib=65536)
        assert cfg.step_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "65536"}


class TestConfigFromDict:
    def test_round_trips_asdict(self):
        import dataclasses

        from gan_codes_tpu.config import GANConfig

        cfg = GANConfig.for_image_size(64, vocab_size=123)
        assert GANConfig.from_dict(dataclasses.asdict(cfg)) == cfg

    def test_tolerates_unknown_and_missing_keys(self):
        """Checkpoints written by older/newer framework versions must still
        load: unknown keys are dropped, missing keys take field defaults."""
        import dataclasses

        from gan_codes_tpu.config import GANConfig

        cfg = GANConfig.for_image_size(32)
        d = dataclasses.asdict(cfg)
        d["generator"]["some_future_knob"] = True   # newer writer
        del d["loss"]["gp_norm_clip"]               # older writer
        d.pop("optim")                              # much older writer
        rebuilt = GANConfig.from_dict(d)
        assert rebuilt.generator == cfg.generator
        assert rebuilt.loss.gp_norm_clip == cfg.loss.gp_norm_clip  # default
        assert rebuilt.optim == cfg.optim


class TestCompileCache:
    def test_enable_sets_jax_config(self, tmp_path, monkeypatch):
        """The shared --compile-cache helper points JAX's persistent cache
        at the directory (absolute) and caches EVERY compile (floor 0):
        through the remote-TPU relay even sub-second programs cost a full
        round-trip per process."""
        import jax

        from gan_codes_tpu.utils.compile_cache import enable_compile_cache

        prev_dir = jax.config.jax_compilation_cache_dir
        prev_floor = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            enable_compile_cache(str(tmp_path / "cache"))
            assert jax.config.jax_compilation_cache_dir == str(
                tmp_path / "cache")
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              prev_floor)
