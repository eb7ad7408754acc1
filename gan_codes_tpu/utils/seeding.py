"""Seeding (reference `src/utils.py:27-35`, seed 123321).

JAX PRNG keys are explicit, so "fixing the seed" means constructing the root
key; numpy is seeded for the host-side data pipeline.
"""
from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 123321


def fix_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Seed python/numpy global RNGs and return the root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    print(f"Seed {seed} fixed")
    return jax.random.PRNGKey(seed)
