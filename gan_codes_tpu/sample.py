"""Batch inference: encode captions, generate, save PNGs.

Capability parity with `src/sample.py:13-43`: fresh Gaussian noise per call,
denormalize (x+1)*127.5 -> uint8 HWC PNG named after the dataset file name.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import GANConfig
from .models.generator import generator_apply
from .models.text_encoder import text_encoder_apply
from .utils import image_io

Params = Any


# Jitted once at module level (cfg is a hashable frozen dataclass, so repeat
# calls with the same config hit the jit cache instead of retracing — the
# "hundreds of tiny compiles" anti-pattern this image punishes).
@functools.partial(jax.jit, static_argnums=1)
def generate_images(g_params: Params, cfg: GANConfig,
                    sentence_embeds: jnp.ndarray,
                    rng: jax.Array) -> jnp.ndarray:
    """Fresh noise -> G forward (reference `sample.py:13-18`)."""
    noise = jax.random.normal(rng, (sentence_embeds.shape[0],
                                    cfg.generator.latent_dim))
    return generator_apply(g_params, cfg.generator, noise, sentence_embeds)


def sample(g_params: Params, text_encoder_params: Params, cfg: GANConfig,
           batch, save_dir: str, rng: Optional[jax.Array] = None) -> list:
    """Generate one image per batch item and save PNGs
    (reference `sample.py:31-43`). `batch` is a loader Batch (uint8 images
    ignored; captions/cap_lens/file_names used)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sents = text_encoder_apply(text_encoder_params, cfg.text_encoder,
                               jnp.asarray(batch["captions"]),
                               jnp.asarray(batch["cap_lens"]))
    fakes = generate_images(g_params, cfg, sents, rng)
    fakes = np.asarray(jax.device_get(fakes))
    paths = []
    for i, name in enumerate(batch["file_names"]):
        paths.append(image_io.save_image(fakes[i], save_dir, name))
    return paths
