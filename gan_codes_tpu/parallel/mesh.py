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


# Mesh axis name for the slice-crossing (DCN) dimension of a hybrid mesh.
# parallel/dp.py keys on this name to widen the batch sharding spec, so it
# lives here as the single shared constant.
DCN_AXIS = "replica"


def _group_by_slice(devices) -> dict:
    """Group devices by physical slice. TPU runtimes expose `slice_index`
    on multi-slice deployments — but single-slice (and CPU) backends report
    it as 0 on EVERY device, so a degenerate one-group split falls back to
    the owning process (multi-process CPU/Gloo runs: one process == one
    'slice', which is exactly the boundary its collectives cross over the
    slow transport)."""
    by_slice: dict = {}
    for d in devices:
        by_slice.setdefault(int(getattr(d, "slice_index", 0) or 0),
                            []).append(d)
    if len(by_slice) > 1:
        return by_slice
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(int(getattr(d, "process_index", 0)),
                           []).append(d)
    return by_proc


def make_hybrid_mesh(n_model: int = 1, n_slices: Optional[int] = None,
                     dcn_axis: str = DCN_AXIS, data_axis: str = "data",
                     model_axis: str = "model",
                     devices: Optional[Sequence] = None) -> Mesh:
    """Build a DCN-aware `(replica, data, model)` mesh for multi-slice DP
    (SURVEY §2.3 DP row: "DCN-aware mesh for multi-slice").

    Devices are grouped by physical slice so the `data` axis — where the
    per-step gradient psum lives — is ICI-contiguous WITHIN a slice, and
    only the outer `replica` axis crosses the slow DCN transport. XLA then
    lowers the batch reduction hierarchically: intra-slice all-reduce over
    ICI, inter-slice combine over DCN, instead of a topology-blind flat
    ring. On real multi-slice TPU the intra-slice order additionally goes
    through `mesh_utils.create_hybrid_device_mesh` (ICI-nearest-neighbour
    layout); elsewhere (CPU test meshes, single-slice) the per-slice device
    order is kept as enumerated.

    `n_slices` forces a virtual slice count when the platform reports only
    one (the 8-virtual-device CPU test mesh): devices are split into
    `n_slices` equal contiguous groups so the axis contract is testable
    without multi-slice hardware.

    The step compiled over this mesh is numerically identical to the flat
    `make_mesh` DP step — only the device layout (and therefore the
    collective schedule) changes; tests/test_parallel.py asserts
    sharded == single-device on it.
    """
    devices = list(devices if devices is not None else jax.devices())
    groups = _group_by_slice(devices)
    if n_slices and len(groups) > 1 and len(groups) != n_slices:
        # a forced slice count that contradicts the hardware grouping must
        # not be silently ignored — the user asked for a topology the
        # devices don't have
        raise ValueError(
            f"n_slices={n_slices} requested but devices group into "
            f"{len(groups)} physical slices/processes")
    if len(groups) == 1 and n_slices and n_slices > 1:
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices do not split into "
                             f"{n_slices} equal virtual slices")
        per = len(devices) // n_slices
        groups = {i: devices[i * per:(i + 1) * per]
                  for i in range(n_slices)}
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"unequal devices per slice: "
                         f"{ {k: len(v) for k, v in groups.items()} }")
    per_slice = sizes.pop()
    if per_slice % n_model:
        raise ValueError(f"{per_slice} devices per slice do not factor into "
                         f"model={n_model}")
    n_rep = len(groups)
    dp = per_slice // n_model

    grid = None
    if n_rep > 1 and any(getattr(d, "slice_index", None) is not None
                         for d in devices):
        # Real multi-slice TPU: let mesh_utils pick the ICI-optimal
        # intra-slice order. Fail-soft to the manual layout — the manual
        # grid is correct (slice-major), just not ICI-distance-optimized.
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, dp, n_model),
                dcn_mesh_shape=(n_rep, 1, 1),
                devices=devices).reshape(n_rep, dp, n_model)
        except Exception:
            grid = None
    if grid is None:
        rows = [groups[k] for k in sorted(groups)]
        grid = np.asarray(rows).reshape(n_rep, dp, n_model)
    return Mesh(grid, (dcn_axis, data_axis, model_axis))
