"""Data-parallel training over a device mesh.

TPU-native replacement for the reference's (absent) distributed layer
(SURVEY §2.3): the jitted 3-phase step is compiled under GSPMD with the batch
dimension sharded over the mesh's `data` axis and all state replicated. XLA
inserts the gradient all-reduces (psum over ICI) automatically from the
`jnp.mean` reductions in the losses, so the sharded step is *numerically
identical* to the single-device step on the same global batch — which is
exactly what `tests/test_parallel.py` asserts on an 8-virtual-device CPU
mesh. The shift-by-one mismatch term crosses shard boundaries; GSPMD lowers
it to a collective-permute.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GANConfig
from .mesh import DCN_AXIS, make_mesh
from ..train.step import make_train_step


def batch_axes(mesh: Mesh, cfg: GANConfig):
    """Mesh axes the global-batch dimension shards over: the ICI `data`
    axis, preceded by the DCN `replica` axis when the mesh is hybrid
    (mesh.py::make_hybrid_mesh). Replica-major order keeps each slice's
    shard a CONTIGUOUS block of the global batch, so per-host loader shards
    (DataLoader shard_id=process_index) land on their own slice's devices
    without DCN reshuffling."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, cfg.train.data_axis)
    return cfg.train.data_axis


def make_parallel_train_step(cfg: GANConfig, mesh: Mesh,
                             donate_state: bool = True):
    """Compile the train step for the mesh: state/text-params replicated,
    batch tensors sharded on the data axis."""
    step = make_train_step(cfg)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(batch_axes(mesh, cfg)))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded,
                      batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=cfg.train.step_compiler_options(),
    )


def make_parallel_scanned_train_step(cfg: GANConfig, mesh: Mesh,
                                     donate_state: bool = True):
    """Mesh-compiled `steps_per_dispatch` device loop (see
    train/step.py::make_scanned_train_step): state/text-params replicated,
    stacked batch tensors sharded on the data axis of every inner step
    (leading scan axis unsharded). Each scan iteration carries the same
    GSPMD layout as `make_parallel_train_step`, so sharded == single-device
    holds chunk-for-chunk (tests/test_scan_dispatch.py)."""
    from ..train.step import make_scanned_train_step

    multi = make_scanned_train_step(cfg)
    replicated = NamedSharding(mesh, P())
    stack_sharded = NamedSharding(mesh, P(None, batch_axes(mesh, cfg)))
    return jax.jit(
        multi,
        in_shardings=(replicated, replicated, stack_sharded, stack_sharded,
                      stack_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=cfg.train.step_compiler_options(),
    )


def shard_batch_stack(mesh: Mesh, cfg: GANConfig, images, captions, cap_lens):
    """`shard_batch` for a stack of `steps_per_dispatch` batches: axis 0 is
    the scan (step) axis, axis 1 the batch axis sharded over `data`. Under
    multi-host each process passes its stacked LOCAL shards and the global
    stacked batch is assembled across processes, exactly like shard_batch."""
    sharding = NamedSharding(mesh, P(None, batch_axes(mesh, cfg)))
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)
    return put(images), put(captions), put(cap_lens)


def shard_batch(mesh: Mesh, cfg: GANConfig, images, captions, cap_lens):
    """Place a host batch onto the mesh, sharded along the data axis.

    Single process: a plain device_put scatter. Multi-host: each process
    holds its own loader shard (`DataLoader(shard_id=process_index)`), and the
    global batch is assembled from the per-process local shards — so the
    global batch size is local_batch * process_count."""
    sharding = NamedSharding(mesh, P(batch_axes(mesh, cfg)))
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)
    return put(images), put(captions), put(cap_lens)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
