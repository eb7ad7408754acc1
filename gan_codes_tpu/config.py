"""Typed configuration for the TPU-native DF-GAN framework.

The reference (Nandan-Upadhyaya/GAN-codes) hard-codes every hyperparameter as a
literal scattered across files; this module centralizes exactly those knobs
(see reference `Deep_Fusion_GAN/src/train.py:12-57`,
`src/deep_fusion_gan/model.py:28-53,182,203,251`, `src/utils.py:16,24,27`,
`src/objects/dataset.py:26,100`, `src/text_encoder/model.py:10`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def _log2_int(x: int) -> int:
    l = int(math.log2(x))
    if 2**l != x:
        raise ValueError(f"expected a power of two, got {x}")
    return l


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """One-stage text-to-image generator (reference `src/generator/model.py:8-46`).

    The reference is fixed at 256x256 (6 upsampling residual blocks from a 4x4
    seed plus one non-upsampling output block). Here the spatial ladder is
    derived from `image_size` so the same architecture family covers the
    64/128/256 operating points in BASELINE.json.
    """

    n_channels: int = 32
    latent_dim: int = 100
    sentence_dim: int = 256
    affine_hidden: int = 256
    image_size: int = 256
    base_size: int = 4  # spatial size of the reshaped latent seed
    # Fused Pallas DFBlock modulation kernel. MEASURED SLOWER: 0.63x XLA
    # end-to-end on v5e (267 vs 421 img/s full step; PERF.md "What lost") —
    # XLA already fuses the modulation chain into conv epilogues. Kept for
    # kernel development/evidence only; do not enable expecting a win.
    use_pallas: bool = False
    # Fold each nearest-2x upsample into the following block (exact math:
    # low-res modulation chain + 2x2 sub-pixel conv with 2.25x fewer MACs +
    # low-res shortcut; see ops/blocks.py::res_block_g_up). Default on;
    # ignored on the Pallas path.
    fuse_upsample: bool = True
    # jax.checkpoint each residual block: the G backward re-derives the
    # modulation chains instead of loading saved residuals from HBM —
    # trades cheap VPU recompute for the backward's dominant HBM traffic
    # (G bwd measured ~3.2x G fwd without it; see tools/phase_bench.py).
    remat_blocks: bool = False
    # MXU lane widening for the ladder's narrow tail (64/32-ch blocks at
    # 128^2/256^2): zero-pad conv channels to >= lane_pad lanes at trace
    # time. Exact math, unchanged checkpoints — same contract as
    # DiscriminatorConfig.lane_pad (see its docstring); layers with real
    # Cout < lane_pad_min_ch keep natural width. Bypasses the Pallas path.
    lane_pad: int = 0
    lane_pad_min_ch: int = 0
    # Zero-pad conv_out's 3 RGB output lanes up to this width inside
    # generator_apply, slicing back to 3 before tanh (0 = off). The forward
    # fills image_pad/128 MXU lanes instead of 3/128, and the backward's
    # grad-to-input conv gets a 9*image_pad reduction dim instead of 27.
    # Exact math (zero kernels/bias produce the pad lanes; the slice VJP
    # zero-pads the cotangent); the public output stays [B, H, W, 3].
    # MEASURED a loss at every operating point (see TrainConfig.image_pad).
    image_pad: int = 0

    @property
    def n_up_blocks(self) -> int:
        return _log2_int(self.image_size) - _log2_int(self.base_size)

    @property
    def block_channels(self) -> Tuple[Tuple[int, int], ...]:
        """(in, out) channels per upsampling block + the final non-up block.

        Mirrors the reference ladder 256,256,256,256 -> 128 -> 64 -> (out) 32
        for n_channels=32 / 6 blocks (`src/generator/model.py:15-24`); shorter
        ladders drop the leading 8nc->8nc blocks.
        """
        nc = self.n_channels
        n_up = self.n_up_blocks
        if n_up < 2:
            raise ValueError("image_size must be at least 4x base_size")
        ladder = [(8 * nc, 8 * nc)] * (n_up - 2) + [(8 * nc, 4 * nc), (4 * nc, 2 * nc)]
        ladder.append((2 * nc, nc))  # non-upsampling output block
        return tuple(ladder)

    @property
    def seed_channels(self) -> int:
        return 8 * self.n_channels


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """Matching-aware discriminator (reference `src/discriminator/model.py:8-58`).

    Downsamples image_size -> 4 through strided residual blocks, then fuses the
    tiled sentence embedding and reduces to a single logit.
    """

    n_channels: int = 32
    sentence_dim: int = 256
    image_size: int = 256
    final_size: int = 4
    # Zero-pad D's narrow conv channels up to this many MXU lanes at apply
    # time (0 = off). The v5e MXU is 128 lanes wide; DF-GAN's front blocks
    # (Cout 32/64 at 256^2/128^2) run at ~half the full-width conv rate
    # (artifacts/trace_r3_postfold/WALL.md: 64 vs 164 TF/s). Padding is
    # EXACT math — pad lanes carry zeros through conv/lrelu/pool (zero
    # kernels in, zero cotangents back; tests/test_parity.py pins it) — and
    # touches no param/checkpoint shapes (weights are padded inside the
    # traced fn). MEASURED on-chip 2026-08-19 (PERF.md round-4): a 26% LOSS
    # at bf16 bs128, a +2.1% WIN at fp32 bs24 (the reference operating
    # point, the only config where enabling pad=128/min_ch=64 is advised).
    lane_pad: int = 0
    # Only pad convs whose real Cout >= this (roofline: padding 64->128
    # doubles FLOPs at ~2.5x the rate = a win; padding 32->128 quadruples
    # them = likely a loss; 0 pads every narrow conv).
    lane_pad_min_ch: int = 0

    @property
    def n_down_blocks(self) -> int:
        return _log2_int(self.image_size) - _log2_int(self.final_size)

    @property
    def block_channels(self) -> Tuple[Tuple[int, int], ...]:
        """Channel ladder 1->2->4->8->16->16->16 (x n_channels), truncated to
        the number of down blocks (reference uses all 6 at 256px)."""
        nc = self.n_channels
        mults = [1, 2, 4, 8, 16, 16, 16]
        n = self.n_down_blocks
        if n + 1 > len(mults):
            raise ValueError(f"image_size {self.image_size} too large")
        return tuple((mults[i] * nc, mults[i + 1] * nc) for i in range(n))

    @property
    def embed_channels(self) -> int:
        return self.block_channels[-1][1]


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """Frozen DAMSM-style biLSTM encoder (reference `src/text_encoder/model.py:6-31`)."""

    vocab_size: int = 5450
    embed_dim: int = 300  # ninput
    hidden_dim: int = 256  # total across directions; 128 per direction
    max_len: int = 18  # n_steps / caption pad length
    dropout: float = 0.5
    bidirectional: bool = True

    @property
    def per_direction_hidden(self) -> int:
        return self.hidden_dim // (2 if self.bidirectional else 1)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """TTUR Adam + global-norm clip (reference `src/deep_fusion_gan/model.py:42-53`)."""

    g_lr: float = 1e-4
    d_lr: float = 4e-4
    beta1: float = 0.0
    beta2: float = 0.9
    eps: float = 1e-8
    grad_clip_g: float = 5.0
    grad_clip_d: float = 5.0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Hinge + MA-GP knobs (reference `src/deep_fusion_gan/model.py:77-85,173-231`)."""

    gp_coef: float = 2.0
    gp_power: int = 6
    gp_norm_clip: float = 10.0
    gp_eps: float = 1e-8
    # The reference computes the DAMSM text-image cosine loss every G step but
    # never adds it to g_loss before backward (`model.py:217-231`). We replicate
    # that (weight 0.0 = logged only) but expose the weight.
    damsm_weight: float = 0.0
    nan_guard: bool = True
    # MA-GP phase compute dtype: "float32" (reference numerics; default) or
    # "bfloat16" (grad-of-grad D forward in bf16, norm/penalty math still
    # fp32 — measured ~30% faster GP phase on v5e).
    gp_compute_dtype: str = "float32"
    # Lazy regularization (StyleGAN2-style, Karras et al. 2020 §appendix B):
    # run the MA-GP phase every `gp_interval` steps with the coefficient
    # scaled by the interval, keeping the same time-averaged regularization
    # pressure. 1 = the reference's every-step semantics (default). The GP
    # double-backward is ~1/3 of step cost, so interval 4 buys ~25% step
    # throughput at slightly noisier regularization.
    gp_interval: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop knobs (reference `src/train.py:20-57`)."""

    batch_size: int = 24
    num_epochs: int = 600
    seed: int = 123321
    eval_max_batches: int = 32  # `model.py:251`
    # Eval cadence: run IS/FID (+ sample dumps) every Nth epoch, always
    # including the last (1 = the reference's every-epoch protocol,
    # `model.py:239-280`; 0 = final epoch only). Skipped epochs log the
    # reference failure sentinels (IS 1.0 / FID inf —
    # `src/evaluation/metrics.py:58-60`), keeping histories
    # one-entry-per-epoch.
    eval_every_epochs: int = 1
    # FID matrix-sqrt backend: "scipy" = the reference's exact host sqrtm
    # (`src/evaluation/metrics.py:108`; ~70s/epoch on a 1-core host);
    # "newton_schulz" = the on-device iteration (f64 on CPU, f32 on TPU —
    # rtol ~2e-2 vs scipy, test_metrics.py::TestSqrtm), milliseconds.
    eval_sqrtm: str = "scipy"
    checkpoint_every_epochs: int = 1
    numbered_checkpoint_every: int = 10
    ema_decay: float = 0.999  # EMA generator (BASELINE.json config 5; 0 disables)
    eval_use_ema: bool = False  # evaluate/sample with the EMA generator
    compute_dtype: str = "float32"  # "bfloat16" for the bf16 operating point
    data_axis: str = "data"  # mesh axis name for data parallelism
    # TPU compiler hint for the train-step jit: scoped-VMEM budget in KiB
    # (XLA flag xla_tpu_scoped_vmem_limit_kib, shipped per-executable via
    # jit compiler_options — the only way to reach the remote compiler
    # through the relay). Measured on v5e at bf16 bs128: 65536 -> +2.8%
    # step throughput (547 -> 563 img/s, repeatable); None = compiler
    # default. Exact math — a scheduling/fusion budget, not a numerics
    # change. Ignored on CPU (options dict only built for TPU backends).
    xla_scoped_vmem_kib: Optional[int] = None
    # Zero-pad the image-channel dim to this many lanes for every D forward
    # inside the train step (0 = off). RGB's 3 channels fill 3/128 MXU
    # output lanes in the GP/G-phase grad-to-image convs and 27/128
    # reduction rows in D's stem conv (9 taps x 3 ch) — the trace's
    # slowest-rate convs (artifacts/trace_r3_postfold: 10.5 and 44 TF/s).
    # EXACT math: pad channels are zeros, the stem kernel's matching rows
    # are zeros, and the MA-GP norm is unchanged because the image-grad on
    # pad channels is exactly zero. Param/checkpoint shapes untouched.
    # MEASURED on-chip 2026-08-19 (PERF.md round-4): a LOSS at every
    # operating point (-3.3% bf16 bs128, -7.6% fp32 bs24) — the unpadded
    # 3-lane boundary convs were already special-cased by XLA; kept as the
    # tested negative result. Stays off.
    image_pad: int = 0
    # Device loop: run this many full train steps per host dispatch via ONE
    # jitted lax.scan over stacked batches (train/step.py
    # make_scanned_train_step). Exact math — each scan iteration is the
    # complete 3-phase step on its own batch, so step-for-step results match
    # the default per-batch dispatch (pinned in tests/test_scan_dispatch.py).
    # Amortizes host-loop + dispatch + transfer round trips; the win scales
    # with dispatch latency (largest on remote/relay-attached devices,
    # measured in PERF.md). Epochs whose batch count is not a multiple run
    # the remainder through the single-step program (a second compile).
    steps_per_dispatch: int = 1
    # One-ahead threaded device upload: batch i+1's host->device transfer
    # runs on a worker thread while batch i's step executes. Exact same
    # step sequence/trajectory — only WHEN the transfer happens changes.
    # Targets hosts whose device link supports genuinely parallel DMA;
    # through the dev RELAY it measured -16% (single serialized
    # connection: the worker's upload contends with the dispatch stream —
    # PERF.md round 5, tools/dispatch_probe.py `dprefetch` arm), so it
    # stays opt-in. Single-process only: the trainer ignores it under a
    # multi-host mesh, where make_array_from_process_local_data must stay
    # on the main thread with the collectives. Also ignored when
    # steps_per_dispatch > 1 — the scan device loop takes precedence (its
    # stacked upload IS the feed path there).
    device_prefetch: bool = False
    # Structured per-step scalar logging (SURVEY §5 metrics row): 0 = the
    # default per-epoch JSONL rows only; N > 0 additionally flushes every
    # Nth step's loss scalars as `kind="step"` rows at epoch end. No extra
    # host syncs — the values already ride the one per-epoch metrics fetch
    # (Trainer.train_epoch's accumulator); this only changes what is
    # written to disk.
    log_every_steps: int = 0

    @property
    def compute_jnp_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def step_compiler_options(self) -> Optional[Dict[str, str]]:
        """compiler_options for jitting the train step, or None.

        Only emitted when the default backend is a TPU: the flag is unknown
        to the CPU compiler and would fail compilation (tests run CPU)."""
        if self.xla_scoped_vmem_kib is None:
            return None
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return None
        return {"xla_tpu_scoped_vmem_limit_kib":
                str(int(self.xla_scoped_vmem_kib))}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """CUB pipeline knobs (reference `src/objects/dataset.py`, `src/utils.py:13-24`)."""

    data_dir: str = "data"
    image_size: int = 256
    embeddings_num: int = 10  # captions per image
    max_caption_len: int = 18
    resize_ratio: float = 76.0 / 64.0  # Resize(imsize * 76/64) before RandomCrop
    bbox_radius_factor: float = 0.75


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Top-level config bundling every subsystem."""

    generator: GeneratorConfig = dataclasses.field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(default_factory=DiscriminatorConfig)
    text_encoder: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    @staticmethod
    def from_dict(d: dict) -> "GANConfig":
        """Inverse of `dataclasses.asdict` — rebuilds the config a checkpoint
        was written with (`CheckpointManager` persists it as config.json).
        Unknown keys are ignored and missing keys take the field default, so
        configs written by older/newer versions of the framework still load."""
        def build(cls, sub: Optional[dict]):
            known = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in (sub or {}).items() if k in known})

        return GANConfig(
            generator=build(GeneratorConfig, d.get("generator")),
            discriminator=build(DiscriminatorConfig, d.get("discriminator")),
            text_encoder=build(TextEncoderConfig, d.get("text_encoder")),
            optim=build(OptimConfig, d.get("optim")),
            loss=build(LossConfig, d.get("loss")),
            train=build(TrainConfig, d.get("train")),
            data=build(DataConfig, d.get("data")),
        )

    @staticmethod
    def for_image_size(image_size: int, n_channels: int = 32,
                       vocab_size: int = 5450,
                       loss_overrides: Optional[dict] = None,
                       generator_overrides: Optional[dict] = None,
                       discriminator_overrides: Optional[dict] = None,
                       **train_overrides) -> "GANConfig":
        return GANConfig(
            generator=GeneratorConfig(n_channels=n_channels,
                                      image_size=image_size,
                                      **(generator_overrides or {})),
            discriminator=DiscriminatorConfig(
                n_channels=n_channels, image_size=image_size,
                **(discriminator_overrides or {})),
            text_encoder=TextEncoderConfig(vocab_size=vocab_size),
            loss=LossConfig(**loss_overrides) if loss_overrides else LossConfig(),
            train=TrainConfig(**train_overrides) if train_overrides else TrainConfig(),
            data=DataConfig(image_size=image_size),
        )
