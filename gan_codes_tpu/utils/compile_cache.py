"""Persistent XLA compilation cache wiring (no reference counterpart —
TPU-runtime quality of life; the reference's CUDA kernels have no
multi-minute per-process compile to amortize).

Shared by the train/serve/generate CLIs' `--compile-cache DIR` flags.
"""
from __future__ import annotations

import os


def enable_compile_cache(directory: str) -> None:
    """Point JAX's persistent compilation cache at `directory`.

    Later processes load cached executables instead of recompiling (the
    256px train step costs minutes per compile; measured 35.8s -> 10.6s
    for a compile-dominated epoch across fresh processes, losses
    bit-identical).

    NEVER enable this for multi-process (`--multihost`) runs: reloading
    cached executables that contain collective thunks desyncs the Gloo
    context rendezvous and deadlocks (root-caused in tests/mp_worker.py;
    `train_entry.train` enforces this).
    """
    import jax

    # The persistent-cache singleton binds to jax_compilation_cache_dir at
    # the FIRST compile of the process; if some earlier code already
    # compiled under a different cache dir (e.g. the test suite's conftest
    # cache), updating the config alone is inert. Reset the singleton so
    # this directory actually takes effect. Fail-soft: private-ish API,
    # and a failed reset just means the previous directory keeps serving.
    try:
        from jax._src import compilation_cache as _cc

        if _cc.is_initialized():
            _cc.reset_cache()
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(directory))
    # Cache EVERY compile, including sub-second ones (floor 0 overrides
    # JAX's 1s default): through the remote-TPU relay each tiny program
    # (weight casts, threefry seeds, ... — ~18 of them before serve's
    # first batch) costs a full compile round-trip per process, which the
    # default floor would re-pay on every invocation. Deliberately global
    # to all callers (train/generate/serve/bench): everything in this
    # image compiles through the relay; the cost is a KB-scale cache
    # entry + one write per tiny program.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def enable_bench_cache(log, env: str = "BENCH_COMPILE_CACHE",
                       default: str = "/tmp/xla_bench_cache") -> None:
    """The bench-tooling cache convention, in ONE place so bench.py and
    tools/lanepad_ab.py cannot drift apart (the A/B pre-warms the driver's
    bench only while both resolve the same env var, default dir, and '0'
    opt-out). Fail-soft: a cache problem must never cost a measurement run.

    `log` is called with one diagnostic string (route it to stderr in tools
    whose stdout is a machine-read contract).
    """
    directory = os.environ.get(env, default)
    if not directory or directory == "0":
        return
    try:
        enable_compile_cache(directory)
        log(f"compile cache: {directory}")
    except Exception as e:
        log(f"compile cache disabled: {e}")
