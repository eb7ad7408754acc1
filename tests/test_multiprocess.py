"""Real 2-process multi-host DP integration test.

SURVEY §2.3's data-parallel obligation, proven with actual processes rather
than a single-process virtual mesh: two Python workers join one
`jax.distributed` runtime (localhost coordinator, CPU collectives, 4 virtual
devices each → an 8-device global mesh) and drive the exact code paths
`train_entry --multihost` uses in production:

  * `jax.distributed.initialize` + `make_mesh()` over the global device set
  * per-process loader sharding (`DataLoader(shard_id, num_shards)`)
  * `jax.make_array_from_process_local_data` batch assembly
    (`parallel/dp.py::shard_batch`)
  * the collective resume decision + process-0 history broadcast
    (`train/checkpoint.py::has_checkpoint/restore`)
  * cross-process moment-reduced IS/FID (`eval/metrics.py::
    compute_is_fid_multihost`)

Asserted: both legs stay in lockstep (identical param/opt digests and
histories every run), a killed-and-resumed pair is bit-identical to an
uninterrupted pair (the reference's resume guarantee,
`src/deep_fusion_gan/model.py:106-161`, upgraded to multi-host), and the
reduced eval scores equal the direct single-host scores on the same global
set.

Workers live in `mp_worker.py` (not pytest-collected). Each pair-run
recompiles from scratch — a shared persistent compilation cache would be
faster but is UNSAFE here: reloading cached XLA:CPU executables containing
Gloo collective thunks desyncs the ranks' Gloo context rendezvous and
deadlocks the second pair (root-caused; see mp_worker.main for details).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(spec: dict, tmp: str, tag: str, timeout: int = 1500):
    """Spawn 2 workers with a fresh coordinator port; return their JSON
    results (index = process id)."""
    procs, logs = [], []
    spec = dict(spec, port=_free_port(), nprocs=2)
    for pid in range(2):
        out_path = os.path.join(tmp, f"{tag}_out_{pid}.json")
        wspec = dict(spec, pid=pid, out=out_path)
        env = dict(os.environ)
        # the worker sets its own device-count flag; a leaked test-session
        # XLA_FLAGS would double-apply
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO
        log = open(os.path.join(tmp, f"{tag}_log_{pid}.txt"), "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, json.dumps(wspec)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    finally:
        texts = []
        for log in logs:
            log.seek(0)
            texts.append(log.read())
            log.close()
    for pid, (p, text) in enumerate(zip(procs, texts)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{text[-6000:]}")
        assert "WORKER_OK" in text
    results = []
    for pid in range(2):
        with open(os.path.join(tmp, f"{tag}_out_{pid}.json")) as f:
            results.append(json.load(f))
    return results


@pytest.fixture(scope="module")
def mp_env(tmp_path_factory):
    """Synthetic CUB fixture + shared compile cache for all pair-runs."""
    tmp = str(tmp_path_factory.mktemp("mp"))
    sys.path.insert(0, REPO)
    from gan_codes_tpu.data.synthetic import make_synthetic_cub

    root = os.path.join(tmp, "data")
    info = make_synthetic_cub(root, n_train=8, n_test=4, image_size=16)
    return {"tmp": tmp, "data_root": root, "n_words": info["n_words"],
            "cache_dir": None, "local_devices": 4}


class TestTwoProcessDP:
    def test_train_lockstep_resume_bitexact(self, mp_env):
        """2 epochs fresh → resume to 4 ≡ uninterrupted 4 (digests + full
        histories), with both legs in lockstep throughout."""
        tmp = mp_env["tmp"]
        base = {k: mp_env[k] for k in
                ("data_root", "n_words", "cache_dir", "local_devices")}
        base.update(mode="train",
                    img_dir=os.path.join(tmp, "imgs"))

        ckpt_a = os.path.join(tmp, "ckpt_resume")
        first = _run_pair(dict(base, ckpt_dir=ckpt_a, epochs=2), tmp, "first")
        # fresh directory: both processes took the no-checkpoint branch of
        # the COLLECTIVE decision
        assert [r["had_checkpoint"] for r in first] == [False, False]
        # lockstep: replicated state is bit-identical across processes
        assert first[0]["g_digest"] == first[1]["g_digest"]
        assert first[0]["d_digest"] == first[1]["d_digest"]
        assert first[0]["opt_digest"] == first[1]["opt_digest"]
        assert first[0]["histories"] == first[1]["histories"]
        assert len(first[0]["histories"]["g_losses"]) == 2

        # "kill after epoch 2, restart": same pair re-spawned, auto-resume
        resumed = _run_pair(dict(base, ckpt_dir=ckpt_a, epochs=4), tmp,
                            "resumed")
        assert [r["had_checkpoint"] for r in resumed] == [True, True]
        assert resumed[0]["g_digest"] == resumed[1]["g_digest"]
        assert resumed[0]["histories"] == resumed[1]["histories"]
        assert len(resumed[0]["histories"]["g_losses"]) == 4

        # uninterrupted control run: bit-identical params/opt state and
        # losses — the single-host resume guarantee holds multi-process
        straight = _run_pair(
            dict(base, ckpt_dir=os.path.join(tmp, "ckpt_straight"),
                 epochs=4), tmp, "straight")
        assert straight[0]["g_digest"] == resumed[0]["g_digest"]
        assert straight[0]["d_digest"] == resumed[0]["d_digest"]
        assert straight[0]["opt_digest"] == resumed[0]["opt_digest"]
        for key in ("g_losses", "d_losses", "d_gp_losses", "txtimg_losses"):
            np.testing.assert_allclose(straight[0]["histories"][key],
                                       resumed[0]["histories"][key],
                                       rtol=0, atol=0)
        assert resumed[0]["step"] == straight[0]["step"]

    def test_hybrid_mesh_train_matches_flat_mesh(self, mp_env):
        """The DCN-aware (replica, data, model) mesh — one 'slice' per
        process, collectives crossing Gloo only on the replica axis —
        trains in lockstep AND lands on the same numbers as the flat-mesh
        run (same seed/data): the hybrid layout changes the collective
        schedule, not the math (SURVEY §2.3 DP row)."""
        tmp = mp_env["tmp"]
        base = {k: mp_env[k] for k in
                ("data_root", "n_words", "cache_dir", "local_devices")}
        base.update(mode="train", img_dir=os.path.join(tmp, "imgs_hy"))

        hybrid = _run_pair(dict(base, hybrid_mesh=True, epochs=2,
                                ckpt_dir=os.path.join(tmp, "ckpt_hybrid")),
                           tmp, "hybrid")
        assert hybrid[0]["g_digest"] == hybrid[1]["g_digest"]
        assert hybrid[0]["opt_digest"] == hybrid[1]["opt_digest"]
        assert hybrid[0]["histories"] == hybrid[1]["histories"]
        flat = _run_pair(dict(base, epochs=2,
                              ckpt_dir=os.path.join(tmp, "ckpt_flat2")),
                         tmp, "flat2")
        # same global batches, same replicated math: histories agree to
        # reduction-order tolerance across the two mesh layouts
        for key in ("g_losses", "d_losses", "d_gp_losses"):
            np.testing.assert_allclose(hybrid[0]["histories"][key],
                                       flat[0]["histories"][key],
                                       rtol=2e-4, atol=1e-5)

    def test_eval_moment_reduction_matches_direct(self, mp_env):
        """Cross-process IS/FID via summed moments == the direct single-host
        scores on the same global image set, identical on every process
        (the worker itself asserts the direct comparison on process 0)."""
        tmp = mp_env["tmp"]
        spec = {k: mp_env[k] for k in
                ("data_root", "n_words", "cache_dir", "local_devices")}
        spec.update(mode="eval_metrics")
        results = _run_pair(spec, tmp, "evalm", timeout=900)
        assert results[0]["is_mh"] == pytest.approx(results[1]["is_mh"])
        assert results[0]["fid_mh"] == pytest.approx(results[1]["fid_mh"])
        # process 0 re-scored the full set directly and compared inside the
        # worker; re-assert here for visibility
        np.testing.assert_allclose(results[0]["is_mh"],
                                   results[0]["is_direct"], rtol=1e-5)
        np.testing.assert_allclose(results[0]["fid_mh"],
                                   results[0]["fid_direct"],
                                   rtol=1e-3, atol=1e-3)

    def test_config_mismatch_raises_on_all_processes(self, mp_env):
        """A config mismatch on resume must raise on BOTH processes (verdict
        computed on process 0 and broadcast) even when only process 0's
        filesystem view contains config.json — a per-host decision would
        send the other host alone into the collective restore and deadlock
        it. No jit compiles involved, so this pair-run is fast."""
        tmp = mp_env["tmp"]
        spec = {k: mp_env[k] for k in
                ("data_root", "n_words", "cache_dir", "local_devices")}
        dirs = [os.path.join(tmp, f"cfg_view_{i}") for i in range(2)]
        spec.update(mode="config_mismatch", ckpt_dirs=dirs)
        results = _run_pair(spec, tmp, "cfgmm", timeout=300)
        assert [r["raised_mismatch"] for r in results] == [True, True]
