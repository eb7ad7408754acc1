"""Device mesh construction.

The reference is strictly single-device (`src/deep_fusion_gan/model.py:26`);
the TPU build's parallelism is data-parallel over a named mesh axis with XLA
collectives riding ICI (SURVEY §2.3). The mesh keeps a (trivial, size-1)
`model` axis available so tensor-parallel shardings can be introduced without
API changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              data_axis: str = "data", model_axis: str = "model",
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — the DP configuration
    BASELINE.json config 4 requires.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))
