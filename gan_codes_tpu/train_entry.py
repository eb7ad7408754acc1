"""Full training entry point.

Capability parity with `src/train.py:8-73`: fix seed, build train/test
loaders, construct the trainer with the dataset vocab, wire code2word, resume
from the latest checkpoint if present, fit, print the per-epoch metric table.
Paths/hyperparameters come from CLI flags instead of hard-coded Windows paths.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

from .config import DataConfig, GANConfig
from .data.dataset import CUBDataset
from .data.loader import DataLoader
from .models.text_encoder import init_text_encoder, load_text_encoder
from .train.trainer import Trainer
from .utils.seeding import fix_seed


def train(data_path: str, encoder_weights_path: Optional[str],
          image_save_path: str = "gen_images",
          gen_path_save: str = "gen_weights",
          image_size: int = 256, batch_size: int = 24,
          num_epochs: int = 600, seed: int = 123321,
          inception_weights_path: Optional[str] = None,
          compute_dtype: str = "float32", debug_nans: bool = False,
          data_parallel: bool = False, multihost: bool = False,
          damsm_weight: float = 0.0, gp_compute_dtype: str = "float32",
          eval_use_ema: bool = False, gp_interval: int = 1,
          remat_g: bool = False, ckpt_every: int = 1,
          xla_vmem_kib: Optional[int] = None,
          matmul_precision: Optional[str] = None,
          compile_cache_dir: Optional[str] = None,
          n_channels: int = 32, eval_augment: bool = False,
          d_lane_pad: int = 0, g_lane_pad: int = 0,
          lane_pad_min_ch: int = 0, image_pad: int = 0,
          steps_per_dispatch: int = 1, log_every_steps: int = 0,
          mesh_layout: str = "flat", mesh_slices: int = 0,
          device_prefetch: bool = False, eval_every: int = 1,
          eval_sqrtm: str = "scipy"):
    import jax

    # Test/harness hook: this image's sitecustomize registers the axon TPU
    # backend at interpreter start and IGNORES the JAX_PLATFORMS env var, so
    # subprocess harnesses (tools/lazy_gp_ab.py CPU smoke mode, CI) force the
    # platform here, before the first device query (conftest.py rationale).
    if os.environ.get("GAN_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GAN_PLATFORM"])

    if compile_cache_dir:
        if multihost:
            # Root-caused (tests/mp_worker.py): reloading cached XLA
            # executables with Gloo collective thunks desyncs the ranks'
            # Gloo context rendezvous and deadlocks — a persistent cache
            # must never be shared across process generations of a
            # distributed run.
            raise ValueError(
                "--compile-cache is incompatible with --multihost: cached "
                "executables with collective thunks desync the distributed "
                "rendezvous on reload (see CLAUDE.md). Drop one of the two.")
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache(compile_cache_dir)

    if matmul_precision:
        # TPU matmuls/convs on fp32 inputs default to bf16 multiplies with
        # fp32 accumulation ('default'). 'highest' forces true fp32 via
        # multi-pass bf16 (~4.5x slower at the fp32-bs24 point, PERF.md);
        # the reference's CUDA fp32 corresponds to 'highest'.
        jax.config.update("jax_default_matmul_precision", matmul_precision)
    if debug_nans:
        # jax-native analogue of the reference's NaN guards (SURVEY §5):
        # fail fast with a traceback instead of guarding silently.
        jax.config.update("jax_debug_nans", True)
    if multihost:
        # Multi-host DP: every process joins the global JAX runtime (the
        # coordinator address/process id come from the TPU environment or the
        # standard JAX_COORDINATOR_* variables). Must run before the first
        # device query. Each host then reads a disjoint interleaved shard of
        # the epoch permutation (identical seeds keep the global order
        # consistent across hosts), and the GSPMD step's global-batch
        # arrays are assembled from per-host shards.
        jax.distributed.initialize()
        data_parallel = True
    root_key = fix_seed(seed)

    os.makedirs(image_save_path, exist_ok=True)
    os.makedirs(gen_path_save, exist_ok=True)

    data_cfg = DataConfig(data_dir=data_path, image_size=image_size)
    train_ds = CUBDataset(data_cfg, "train")
    # The reference applies RandomCrop/Flip to the TEST loader too
    # (`src/utils.py:13-24`); deterministic eval is the better-practice
    # default here, --eval-augment reproduces the reference protocol.
    test_ds = CUBDataset(data_cfg, "test", augment=eval_augment)
    print(f"Test set size: {len(test_ds)} images")

    cfg = GANConfig.for_image_size(
        image_size, n_channels=n_channels, vocab_size=train_ds.n_words,
        loss_overrides={"damsm_weight": damsm_weight,
                        "gp_compute_dtype": gp_compute_dtype,
                        "gp_interval": gp_interval},
        generator_overrides={"remat_blocks": remat_g,
                             "lane_pad": g_lane_pad,
                             "lane_pad_min_ch": lane_pad_min_ch,
                             "image_pad": image_pad},
        discriminator_overrides={"lane_pad": d_lane_pad,
                                 "lane_pad_min_ch": lane_pad_min_ch},
        image_pad=image_pad,
        batch_size=batch_size, num_epochs=num_epochs, seed=seed,
        compute_dtype=compute_dtype, eval_use_ema=eval_use_ema,
        checkpoint_every_epochs=ckpt_every,
        xla_scoped_vmem_kib=xla_vmem_kib,
        steps_per_dispatch=steps_per_dispatch,
        log_every_steps=log_every_steps,
        device_prefetch=device_prefetch,
        eval_every_epochs=eval_every, eval_sqrtm=eval_sqrtm)

    # Per-host input sharding (jax.process_* are 0/1 single-host, so this is
    # always-on and a no-op outside --multihost).
    shard = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
    train_loader = DataLoader(train_ds, batch_size, seed=seed, **shard)
    test_loader = DataLoader(test_ds, batch_size, shuffle=False, seed=seed,
                             **shard)

    if encoder_weights_path and os.path.exists(encoder_weights_path):
        te_params = load_text_encoder(encoder_weights_path, cfg.text_encoder)
    else:
        print("Warning: no pretrained text encoder; using random init")
        te_params = init_text_encoder(root_key, cfg.text_encoder)

    inception_params = None
    if inception_weights_path and os.path.exists(inception_weights_path):
        from .models.inception import load_torch_inception
        inception_params = load_torch_inception(inception_weights_path)
    else:
        print("Warning: no Inception weights; IS/FID disabled")

    mesh = None
    if data_parallel:
        if mesh_layout == "hybrid":
            # DCN-aware multi-slice layout (SURVEY §2.3 DP row): devices
            # grouped by physical slice (or per-process under multi-host
            # CPU), gradient psum ICI-contiguous within a slice, only the
            # outer `replica` axis crossing DCN (parallel/mesh.py).
            from .parallel import make_hybrid_mesh

            mesh = make_hybrid_mesh(n_slices=mesh_slices or None)
        else:
            from .parallel import make_mesh

            mesh = make_mesh()
        print(f"Data-parallel over mesh: {dict(mesh.shape)}")

    trainer = Trainer(cfg, te_params, gen_path_save, image_save_path,
                      code2word=train_ds.code2word,
                      inception_params=inception_params, seed=seed, mesh=mesh)

    histories = trainer.fit(train_loader, test_loader,
                            num_epochs=num_epochs, auto_resume=True)

    for epoch in range(len(histories["g_losses"])):
        print(f"Epoch {epoch + 1}: "
              f"G Loss: {histories['g_losses'][epoch]:.4f}, "
              f"D Loss: {histories['d_losses'][epoch]:.4f}, "
              f"D GP Loss: {histories['d_gp_losses'][epoch]:.4f}, "
              f"Text-Image Loss: {histories['txtimg_losses'][epoch]:.4f}, "
              f"IS: {histories['is_scores'][epoch]:.4f}, "
              f"FID: {histories['fid_scores'][epoch]:.4f}")
    return histories


def main():
    p = argparse.ArgumentParser(description="Train the TPU-native DF-GAN")
    p.add_argument("--data", required=True)
    p.add_argument("--text-encoder", default=None)
    p.add_argument("--inception", default=None)
    p.add_argument("--images", default="gen_images")
    p.add_argument("--weights", default="gen_weights")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--seed", type=int, default=123321)
    p.add_argument("--n-channels", type=int, default=32,
                   help="base channel width of G/D (the reference's 32; "
                        "must match a resumed checkpoint's width)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--gp-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="MA-GP phase D-forward dtype (norm math stays fp32)")
    p.add_argument("--damsm-weight", type=float, default=0.0,
                   help="weight of the DAMSM cosine term in the G loss "
                        "(0.0 = the reference's logged-only quirk)")
    p.add_argument("--eval-ema", action="store_true",
                   help="evaluate + sample with the EMA generator")
    p.add_argument("--eval-augment", action="store_true",
                   help="apply train-time RandomCrop/Flip augmentation to "
                        "the test loader too, reproducing the reference's "
                        "eval protocol (src/utils.py:13-24); default is "
                        "deterministic eval")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save the Orbax checkpoint every N epochs (1 = the "
                        "reference's every-epoch saves; a crash replays at "
                        "most N-1 epochs, resume stays bit-exact)")
    p.add_argument("--gp-interval", type=int, default=1,
                   help="lazy regularization: run MA-GP every N steps with "
                        "the coefficient scaled by N (1 = reference "
                        "every-step semantics)")
    p.add_argument("--d-lane-pad", type=int, default=0,
                   help="zero-pad D's narrow convs to >= N MXU lanes at "
                        "trace time (exact math, same checkpoints; perf "
                        "A/B for the 32/64-lane conv wall — see PERF.md). "
                        "0 = off")
    p.add_argument("--g-lane-pad", type=int, default=0,
                   help="same lane widening for the G ladder's narrow tail")
    p.add_argument("--lane-pad-min-ch", type=int, default=0,
                   help="only lane-pad convs whose real Cout >= N "
                        "(roofline: padding 32->128 quadruples FLOPs and "
                        "likely loses; 64->128 doubles them and should win)")
    p.add_argument("--image-pad", type=int, default=0,
                   help="zero-pad the RGB dim to N lanes for G's output "
                        "conv and every D forward (exact math; fills the "
                        "3/128-lane image-boundary convs — see PERF.md). "
                        "0 = off")
    p.add_argument("--remat-g", action="store_true",
                   help="jax.checkpoint the G blocks: recompute modulation "
                        "chains in the backward instead of saving them")
    p.add_argument("--xla-vmem-kib", type=int, default=None,
                   help="TPU scoped-VMEM budget hint for the train-step "
                        "compile (xla_tpu_scoped_vmem_limit_kib; 65536 "
                        "measured +2.8%% on v5e at bf16 bs128). Exact math; "
                        "no effect on CPU")
    p.add_argument("--matmul-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="jax_default_matmul_precision. TPU fp32 matmuls/"
                        "convs default to bf16 multiplies + fp32 accumulate;"
                        " 'highest' = true fp32 (multi-pass, ~4.5x slower "
                        "at fp32 bs24 — matches the reference's CUDA fp32)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: re-runs "
                        "skip the multi-minute train-step compile. "
                        "Single-process only (incompatible with --multihost; "
                        "see CLAUDE.md on the collective-thunk reload "
                        "deadlock)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all devices (batch sharded)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="device loop: run N full train steps per host "
                        "dispatch via one jitted lax.scan over stacked "
                        "batches (exact math; amortizes dispatch latency — "
                        "biggest win on remote/relay-attached devices)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="run IS/FID + sample dumps every N epochs (last "
                        "epoch always; skipped epochs log the reference "
                        "sentinels IS 1.0 / FID inf). 1 = reference "
                        "every-epoch protocol; 0 = final epoch only")
    p.add_argument("--eval-sqrtm", default="scipy",
                   choices=["scipy", "newton_schulz"],
                   help="FID matrix sqrt: exact host scipy (reference "
                        "path; ~70s on a 1-core host) or the on-device "
                        "Newton-Schulz iteration (ms; rtol ~2e-2)")
    p.add_argument("--device-prefetch", action="store_true",
                   help="upload batch i+1 on a worker thread while batch "
                        "i's step runs (identical trajectory; wins when "
                        "host->device transfer is the bottleneck — see "
                        "tools/dispatch_probe.py). Single-process only")
    p.add_argument("--log-every-steps", type=int, default=0,
                   help="also write every Nth step's loss scalars as "
                        "kind='step' JSONL rows (0 = per-epoch rows only; "
                        "no extra host syncs — reuses the per-epoch fetch)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-host DP "
                        "(implies --dp; per-host input sharding)")
    p.add_argument("--mesh-layout", default="flat",
                   choices=["flat", "hybrid"],
                   help="DP mesh layout: 'flat' = one data axis over all "
                        "devices; 'hybrid' = DCN-aware (replica, data, "
                        "model) mesh grouping devices by physical slice so "
                        "gradient collectives stay ICI-contiguous within a "
                        "slice (multi-slice deployments)")
    p.add_argument("--mesh-slices", type=int, default=0,
                   help="force N virtual slices for --mesh-layout hybrid "
                        "when the platform reports one slice (testing; "
                        "0 = group by hardware)")
    a = p.parse_args()
    train(a.data, a.text_encoder, a.images, a.weights, a.image_size,
          a.batch_size, a.epochs, a.seed, a.inception, a.dtype,
          n_channels=a.n_channels,
          debug_nans=a.debug_nans, data_parallel=a.dp, multihost=a.multihost,
          damsm_weight=a.damsm_weight, gp_compute_dtype=a.gp_dtype,
          eval_use_ema=a.eval_ema, gp_interval=a.gp_interval,
          remat_g=a.remat_g, ckpt_every=a.ckpt_every,
          xla_vmem_kib=a.xla_vmem_kib, matmul_precision=a.matmul_precision,
          compile_cache_dir=a.compile_cache, eval_augment=a.eval_augment,
          d_lane_pad=a.d_lane_pad, g_lane_pad=a.g_lane_pad,
          lane_pad_min_ch=a.lane_pad_min_ch, image_pad=a.image_pad,
          steps_per_dispatch=a.steps_per_dispatch,
          log_every_steps=a.log_every_steps,
          mesh_layout=a.mesh_layout, mesh_slices=a.mesh_slices,
          device_prefetch=a.device_prefetch, eval_every=a.eval_every,
          eval_sqrtm=a.eval_sqrtm)


if __name__ == "__main__":
    main()
