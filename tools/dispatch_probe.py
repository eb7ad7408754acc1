"""Measure per-dispatch host-loop overhead through the TPU relay.

Motivates `TrainConfig.steps_per_dispatch` (the lax.scan device loop):
compares N single-step dispatches of the REAL 3-phase train step against
N/k scanned dispatches, wall-clocked around value-fetch syncs (CLAUDE.md
relay timing rules: the window ends with an np.asarray fetch; per-dispatch
timing alone lies). Also probes raw dispatch latency (trivial jit) and
host->device transfer bandwidth, so the A/B delta can be attributed.

Round-5 hardening (VERDICT r4 "dispatch_probe_dbuf timed out twice at
rc=124"): a PROBE_BUDGET_S daemon-thread watchdog (bench.py's pattern)
prints the arms measured so far and exits 0 instead of dying silently; the
two scanned arms share ONE compiled step (the r4 version rebuilt the jit
wrapper per arm, paying a second multi-minute remote compile); and the
double-buffered arm pre-stages its first chunk before the timer starts so
the A/B reads steady-state rates for every arm (ADVICE r4).

Usage: python tools/dispatch_probe.py [--image-size 256] [--batch 64]
       [--dtype bfloat16] [--steps 24] [--chunk 4] [--probe-only]
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--probe-only", action="store_true",
                    help="only the latency/bandwidth microprobes")
    ap.add_argument("--arms", default="single,dprefetch,scan4,scan4+dbuf",
                    help="comma list of arms to run (scan arm names embed "
                         "--chunk, e.g. scan4)")
    args = ap.parse_args()
    args.arms = args.arms.replace("scan4", f"scan{args.chunk}")

    # Budget watchdog (bench.py rationale: the main thread can sit blocked in
    # a C call — remote compile / value fetch — where signal handlers don't
    # run; only a daemon thread reliably gets us out). Results print as each
    # arm completes, so a budget bail still leaves every finished number.
    budget_s = float(os.environ.get("PROBE_BUDGET_S", 1500))

    def _bail():
        print(f"[probe] BUDGET EXCEEDED ({budget_s:.0f}s): results above are "
              f"the arms that completed", flush=True)
        os._exit(0)

    watchdog = threading.Timer(budget_s, _bail)
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp

    from gan_codes_tpu.utils.compile_cache import enable_bench_cache
    enable_bench_cache(lambda m: print(f"[probe] {m}", flush=True))

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    # --- microprobe 1: round-trip dispatch latency (tiny jit) ---
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(20):
        x = f(x)
        np.asarray(x)  # force a full round trip per call
    rt_ms = (time.perf_counter() - t0) / 20 * 1e3
    # pipelined (async) dispatch: enqueue 20, sync once
    t0 = time.perf_counter()
    for _ in range(20):
        x = f(x)
    np.asarray(x)
    async_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"dispatch_roundtrip_ms={rt_ms:.2f} dispatch_async_ms={async_ms:.2f}",
          flush=True)

    # --- microprobe 2: host->device bandwidth at batch size ---
    s = args.image_size
    payload = np.zeros((args.batch, s, s, 3), np.uint8)
    jax.device_put(payload)  # warm any relay path setup
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(jax.device_put(payload)[0, 0, 0, 0])  # fetch forces done
    put_ms = (time.perf_counter() - t0) / 4 * 1e3
    mb = payload.nbytes / 1e6
    print(f"device_put_{mb:.0f}MB_ms={put_ms:.1f} "
          f"bw_MBps={mb / (put_ms / 1e3):.0f}", flush=True)
    if args.probe_only:
        watchdog.cancel()
        return

    # --- the real A/B: single-step loop vs scanned device loop ---
    from gan_codes_tpu.config import GANConfig, TrainConfig
    from gan_codes_tpu.train.state import create_train_state
    from gan_codes_tpu.train.step import (make_jitted_scanned_train_step,
                                          make_jitted_train_step)
    from gan_codes_tpu.models.text_encoder import init_text_encoder

    cfg = GANConfig(train=TrainConfig(
        batch_size=args.batch, compute_dtype=args.dtype,
        xla_scoped_vmem_kib=65536))
    te = jax.jit(lambda k: init_text_encoder(k, cfg.text_encoder))(
        jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, s, s, 3), np.uint8)
    caps = rng.integers(1, cfg.text_encoder.vocab_size,
                        (args.batch, cfg.text_encoder.max_len), np.int32)
    lens = rng.integers(4, cfg.text_encoder.max_len + 1,
                        (args.batch,), np.int32)
    normalize = jax.jit(lambda u8: u8.astype(jnp.float32) / 127.5 - 1.0)

    # ONE compile per program: step1 for the host loop, stepk shared by BOTH
    # scanned arms (the arms differ only in host-side upload scheduling).
    step1 = make_jitted_train_step(cfg)
    stepk = make_jitted_scanned_train_step(cfg)

    def arm_single(n_steps, state, _prestaged):
        for _ in range(n_steps):
            ib = normalize(jax.device_put(imgs))
            state, m = step1(state, te, ib, jax.device_put(caps),
                             jax.device_put(lens))
        np.asarray(m["d_loss"])  # sync
        return state

    from concurrent.futures import ThreadPoolExecutor
    uploader = ThreadPoolExecutor(1)

    def _upload():
        return (normalize(jax.device_put(imgs)), jax.device_put(caps),
                jax.device_put(lens))

    def arm_single_dprefetch(n_steps, state, prestaged):
        # one-ahead threaded upload: batch i+1's device_put runs on a
        # worker thread while batch i's step is dispatched/executing —
        # the candidate trainer feed path for transfer-bound relays
        # (Trainer device_prefetch knob mirrors this exactly)
        fut = prestaged if prestaged is not None else uploader.submit(_upload)
        for i in range(n_steps):
            cur = fut.result()
            if i + 1 < n_steps:
                fut = uploader.submit(_upload)
            state, m = step1(state, te, *cur)
        np.asarray(m["d_loss"])  # sync
        return state

    def _stack():
        k = args.chunk
        # per-chunk host stack, matching Trainer._step_stacked's cost
        si = np.broadcast_to(imgs, (k,) + imgs.shape).copy()
        sc = np.broadcast_to(caps, (k,) + caps.shape).copy()
        sl = np.broadcast_to(lens, (k,) + lens.shape).copy()
        return (normalize(jax.device_put(si)), jax.device_put(sc),
                jax.device_put(sl))

    def arm_scanned(n_steps, state, _prestaged):
        for _ in range(n_steps // args.chunk):
            state, m = stepk(state, te, *_stack())
        np.asarray(m["d_loss"])  # sync
        return state

    def arm_scanned_dbuf(n_steps, state, prestaged):
        # double-buffered: enqueue chunk i's scan, THEN start uploading
        # chunk i+1 so the transfer overlaps the device loop's compute.
        # The first chunk arrives pre-staged (uploaded before the timer):
        # the timed window reads the steady state, same as a real epoch
        # where batch 0's upload overlaps the previous epoch's tail.
        nxt = prestaged
        for i in range(n_steps // args.chunk):
            cur = nxt
            state, m = stepk(state, te, *cur)
            if i + 1 < n_steps // args.chunk:
                nxt = _stack()
        np.asarray(m["d_loss"])  # sync
        return state

    all_arms = {
        "single": (arm_single, None),
        "dprefetch": (arm_single_dprefetch,
                      lambda: uploader.submit(_upload)),
        f"scan{args.chunk}": (arm_scanned, None),
        f"scan{args.chunk}+dbuf": (arm_scanned_dbuf, _stack),
    }
    results = {}
    for name in args.arms.split(","):
        arm, prestage = all_arms[name]
        state = jax.jit(lambda k: create_train_state(k, cfg))(
            jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        state = arm(args.chunk, state, prestage() if prestage else None)
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
        staged = prestage() if prestage else None  # staged OUTSIDE the timer
        t0 = time.perf_counter()
        state = arm(args.steps, state, staged)
        wall = time.perf_counter() - t0
        ips = args.steps * args.batch / wall
        results[name] = ips
        print(f"{name}: {wall:.2f}s for {args.steps} steps = "
              f"{ips:.1f} img/s (host loop incl. transfers)", flush=True)
        del state
    watchdog.cancel()
    print("SUMMARY " + " ".join(f"{k}={v:.1f}" for k, v in results.items()),
          flush=True)


if __name__ == "__main__":
    main()
