"""gan_codes_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
Nandan-Upadhyaya/GAN-codes Deep-Fusion-GAN text-to-image stack.

Layers (mirrors the reference's capability surface, SURVEY.md §1-2):
  ops/       neural building blocks (affine fusion, residual blocks, Pallas kernels)
  models/    generator, matching-aware discriminator, biLSTM text encoder, InceptionV3
  data/      CUB caption/bbox dataset pipeline + device feed
  train/     losses, jitted 3-phase train step, trainer engine, checkpointing
  parallel/  mesh construction + data-parallel (pjit/shard_map) train steps
  eval/      on-device Inception Score + FID
  utils/     seeding, plotting, image IO
"""

from .config import (DataConfig, DiscriminatorConfig, GANConfig,
                     GeneratorConfig, LossConfig, OptimConfig,
                     TextEncoderConfig, TrainConfig)

__version__ = "0.1.0"

__all__ = [
    "GANConfig", "GeneratorConfig", "DiscriminatorConfig", "TextEncoderConfig",
    "OptimConfig", "LossConfig", "TrainConfig", "DataConfig",
]
