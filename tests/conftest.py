"""Test configuration: force an 8-virtual-device CPU platform so data-parallel
mesh tests run without TPU hardware (SURVEY.md §4 test plan).

Note: this image's sitecustomize registers the `axon` TPU backend at
interpreter start and wins over the JAX_PLATFORMS env var, so the platform
must be forced through jax.config *after* import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache for the suite (VERDICT r4 #6): CPU
# compiles of the train-step programs dominate the ~80 min cold wall time;
# re-runs load cached executables instead. Safe here because everything in
# the pytest PROCESS is single-process CPU; the multi-PROCESS Gloo tests
# (test_multiprocess.py) spawn mp_worker.py WITHOUT this conftest, so they
# never see the cache (sharing one across process generations of a
# distributed run deadlocks the Gloo rendezvous — CLAUDE.md). Keyed by
# platform+compiler fingerprint, fail-soft on any cache problem.
# TEST_COMPILE_CACHE=0 opts out; any other value overrides the directory.
_cache = os.environ.get("TEST_COMPILE_CACHE", "/tmp/xla_test_cache")
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
