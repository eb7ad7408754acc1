"""Worker process for the 2-process multi-host integration test.

NOT collected by pytest (no test_ prefix); spawned by
`tests/test_multiprocess.py` as `python mp_worker.py '<json spec>'`.
Each worker joins a real `jax.distributed` runtime (localhost coordinator,
Gloo CPU collectives, 4 virtual devices per process) and exercises the
actual `--multihost` code paths: `jax.distributed.initialize`,
`make_array_from_process_local_data` (via `parallel.dp.shard_batch`), the
collective checkpoint resume decision, and the cross-process moment
reduction behind multi-host IS/FID.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys


def _digest(tree) -> str:
    import jax
    import numpy as np

    leaves = jax.tree.leaves(jax.device_get(tree))
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def run_train(spec) -> dict:
    import jax

    from gan_codes_tpu.config import (DataConfig, DiscriminatorConfig,
                                      GANConfig, GeneratorConfig,
                                      TextEncoderConfig, TrainConfig)
    from gan_codes_tpu.data import CUBDataset, DataLoader
    from gan_codes_tpu.models.text_encoder import init_text_encoder
    from gan_codes_tpu.parallel import make_hybrid_mesh, make_mesh
    from gan_codes_tpu.train.trainer import Trainer

    root = spec["data_root"]
    cfg = GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=16),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
        text_encoder=TextEncoderConfig(vocab_size=spec["n_words"],
                                       embed_dim=8, hidden_dim=256,
                                       max_len=18),
        train=TrainConfig(batch_size=4, eval_max_batches=1, seed=7),
        data=DataConfig(data_dir=root, image_size=16),
    )
    if spec.get("hybrid_mesh"):
        # DCN-aware mesh: each PROCESS's local devices form one "slice"
        # (mesh.py::_group_by_slice falls back to process_index when
        # slice_index is degenerate), so the
        # replica axis is exactly the Gloo-crossing boundary here — the
        # CPU-testable analogue of a multi-slice TPU deployment.
        mesh = make_hybrid_mesh()
        assert mesh.shape["replica"] == jax.process_count(), mesh.shape
    else:
        mesh = make_mesh()
    te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
    train_ds = CUBDataset(DataConfig(data_dir=root, image_size=16), "train")

    shard = dict(shard_id=jax.process_index(),
                 num_shards=jax.process_count())
    train_loader = DataLoader(train_ds, 4, seed=7, **shard)

    trainer = Trainer(cfg, te, spec["ckpt_dir"], spec["img_dir"],
                      code2word=train_ds.code2word, mesh=mesh)
    had_checkpoint = trainer.ckpt.has_checkpoint()  # collective decision
    hist = trainer.fit(train_loader, None, num_epochs=spec["epochs"],
                       auto_resume=True)
    trainer.close()
    return {
        "pid": jax.process_index(),
        "had_checkpoint": bool(had_checkpoint),
        "histories": hist,
        "step": int(trainer.state.step),
        "g_digest": _digest(trainer.state.g_params),
        "d_digest": _digest(trainer.state.d_params),
        "opt_digest": _digest((trainer.state.g_opt_state,
                               trainer.state.d_opt_state)),
    }


def run_eval_metrics(spec) -> dict:
    """Cross-process moment-reduced IS/FID == direct single-host scores on
    the same global set (VERDICT r2 item #1, proven multi-process)."""
    import jax
    import numpy as np

    from gan_codes_tpu.eval.metrics import (compute_is_fid,
                                            compute_is_fid_multihost)
    from gan_codes_tpu.models.inception import init_inception

    params = init_inception(jax.random.PRNGKey(3))  # identical on all procs
    key = jax.random.PRNGKey(0)
    real_full = jax.random.uniform(key, (8, 16, 16, 3), minval=-1, maxval=1)
    fake_full = jax.random.uniform(jax.random.fold_in(key, 1),
                                   (8, 16, 16, 3), minval=-1, maxval=1)
    pid, n = jax.process_index(), jax.process_count()
    sl = slice(pid * 8 // n, (pid + 1) * 8 // n)
    is_mh, fid_mh = compute_is_fid_multihost(params, fake_full[sl],
                                             real_full[sl], batch_size=8)
    out = {"pid": pid, "is_mh": is_mh, "fid_mh": fid_mh}
    if pid == 0:
        is_d, fid_d = compute_is_fid(params, fake_full, real_full,
                                     batch_size=8)
        out["is_direct"], out["fid_direct"] = is_d, fid_d
        np.testing.assert_allclose(is_mh, is_d, rtol=1e-5)
        np.testing.assert_allclose(fid_mh, fid_d, rtol=1e-3, atol=1e-3)
    return out


def run_config_mismatch(spec) -> dict:
    """verify_config must raise on EVERY process together (process-0 verdict
    broadcast), even when only process 0's filesystem view has config.json —
    a per-host decision would send the other host alone into the collective
    restore that follows, deadlocking it."""
    import dataclasses

    import jax

    from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                      GeneratorConfig, TextEncoderConfig)
    from gan_codes_tpu.train.checkpoint import CheckpointManager

    def cfg(nc):
        return GANConfig(
            generator=GeneratorConfig(n_channels=nc, image_size=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16),
            text_encoder=TextEncoderConfig(vocab_size=16, embed_dim=4,
                                           hidden_dim=8, max_len=4))

    pid = jax.process_index()
    d = spec["ckpt_dirs"][pid]  # per-process view; only pid 0 has config.json
    mgr = CheckpointManager(d)
    if pid == 0:
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg(4)), f)
    raised = ""
    try:
        mgr.verify_config(cfg(8))
    except ValueError as e:
        raised = str(e)
    return {"pid": pid, "raised_mismatch": "n_channels" in raised}


def main():
    spec = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               f"{spec['local_devices']}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compilation cache, deliberately (root-caused): loading a
    # persistently-cached XLA:CPU executable that contains Gloo collective
    # thunks desyncs the Gloo context rendezvous between ranks — the pair
    # that COMPILES always passes, while a later pair that LOADS the same
    # programs from a shared jax_compilation_cache_dir deadlocks in Gloo
    # context creation (rank 0 waiting on key `cpu:gloo/0,2048/1`, rank 1 in
    # `tcp/pair.h Connect timeout`) and dies after the 30s timeout. Verified
    # both ways on this jax/XLA build (3/3 cold-cache pair-runs pass, warm
    # cross-run cache fails on the second pair). Recompiling per pair costs
    # a few minutes but is deterministic.
    if spec.get("cache_dir"):
        jax.config.update("jax_compilation_cache_dir", spec["cache_dir"])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{spec['port']}",
        num_processes=spec["nprocs"], process_id=spec["pid"])

    if spec["mode"] == "train":
        out = run_train(spec)
    elif spec["mode"] == "eval_metrics":
        out = run_eval_metrics(spec)
    elif spec["mode"] == "config_mismatch":
        out = run_config_mismatch(spec)
    else:
        raise ValueError(spec["mode"])

    with open(spec["out"], "w") as f:
        json.dump(out, f)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
