"""Resident inference sampler — the production "serve" path.

The reference's serving story is `test_generate.py` (load weights, encode a
prompt, one G forward per run of the script). This module keeps everything
resident and jitted once: a `Sampler` holds generator (raw or EMA) + text
encoder params on device, compiles the encode+generate pipeline at a fixed
batch size (padding partial batches so XLA never retraces), and turns
prompts/caption-token batches into images.
"""
from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GANConfig
from .generate import preprocess_caption
from .models.generator import generator_apply
from .models.text_encoder import text_encoder_apply

Params = Any


def _cast_floating(tree: Params, dtype) -> Params:
    """Cast every floating leaf to `dtype` (ints/bools untouched)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


class Sampler:
    """Batched prompt -> image inference with a single compiled pipeline.

    Optional weight-reload hooks (set by `build_sampler`, which owns the
    weights directory; None on directly-constructed Samplers):
    `reload_generator(epoch=None) -> (params, epoch)` restores gen_N at
    the serving dtype, `latest_generator_epoch() -> Optional[int]` is the
    cheap newest-epoch probe the `--watch` poller uses.
    """

    reload_generator = None
    latest_generator_epoch = None

    def __init__(self, cfg: GANConfig, g_params: Params,
                 text_encoder_params: Params,
                 word2code: Optional[Dict[str, int]] = None,
                 batch_size: int = 8, seed: int = 0, mesh=None):
        """`mesh` (a `jax.sharding.Mesh` with a "data" axis, e.g.
        `parallel.make_mesh()`) serves the batch data-parallel: params
        replicated, the prompt batch sharded over the axis — the GSPMD
        scale-out of the single compiled pipeline. `batch_size` must
        divide evenly over the axis."""
        self.cfg = cfg
        self.word2code = word2code
        self.batch_size = batch_size
        self._rng = jax.random.PRNGKey(seed)

        def pipeline(g_params, te_params, captions, cap_lens, noise):
            # Serve at the params' dtype: noise arrives fp32 from the host
            # PRNG; without the cast, bf16 weights + fp32 activations
            # promote the whole ladder back to fp32 (the train step casts
            # for the same reason, train/step.py).
            dt = jax.tree.leaves(g_params)[0].dtype
            sents = text_encoder_apply(te_params, cfg.text_encoder,
                                       captions, cap_lens)
            return generator_apply(g_params, cfg.generator,
                                   noise.astype(dt), sents)

        self._shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = cfg.train.data_axis
            if axis not in mesh.axis_names:
                raise ValueError(
                    f"mesh axes {mesh.axis_names} have no "
                    f"'{axis}' axis (cfg.train.data_axis)")
            n_data = mesh.shape[axis]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"{axis} axis ({n_data})")
            rep = NamedSharding(mesh, PartitionSpec())
            shard = NamedSharding(mesh, PartitionSpec(axis))
            self._shardings = (rep, shard)
            self._g_params = jax.device_put(g_params, rep)
            self._te_params = jax.device_put(text_encoder_params, rep)
            self._pipeline = jax.jit(
                pipeline,
                in_shardings=(rep, rep, shard, shard, shard),
                out_shardings=shard)
        else:
            self._g_params = jax.device_put(g_params)
            self._te_params = jax.device_put(text_encoder_params)
            self._pipeline = jax.jit(pipeline)

    def _next_noise(self, n: int) -> jnp.ndarray:
        self._rng, k = jax.random.split(self._rng)
        return jax.random.normal(k, (n, self.cfg.generator.latent_dim))

    def swap_generator_params(self, g_params: Params) -> None:
        """Hot-swap the served generator params without a restart (weight
        reload — e.g. pick up a newer `gen_N` while the trainer is still
        running). The new tree must match the compiled pipeline's structure
        and leaf shapes exactly, so the jitted program is reused as-is (no
        retrace, no warm-up hit); leaves are cast to the pipeline's dtypes
        and placed with the same (replicated, under DP) sharding.

        NOT thread-safe on its own: callers serialize against in-flight
        generates (the HTTP layer swaps under its dispatch lock)."""
        old = self._g_params
        if jax.tree.structure(g_params) != jax.tree.structure(old):
            raise ValueError(
                "new generator params have a different tree structure than "
                "the compiled pipeline's (architecture mismatch?)")
        errs: List[str] = []
        jax.tree_util.tree_map_with_path(
            lambda path, n, o: errs.append(
                f"{jax.tree_util.keystr(path)}: {tuple(n.shape)} != "
                f"{tuple(o.shape)}") if tuple(n.shape) != tuple(o.shape)
            else None, g_params, old)
        if errs:
            raise ValueError("new generator params' shapes do not match the "
                             "compiled pipeline's: " + "; ".join(errs))
        new = jax.tree.map(lambda n, o: jnp.asarray(n, o.dtype), g_params, old)
        self._g_params = jax.device_put(
            new, self._shardings[0]) if self._shardings else jax.device_put(new)

    def generate_tokens(self, captions: np.ndarray,
                        cap_lens: np.ndarray) -> np.ndarray:
        """Token batch [N, T] + lengths [N] -> images [N, H, W, 3] in [-1,1].

        N may be anything; batches are padded to `batch_size` so the compiled
        program is reused for every call.
        """
        captions = np.asarray(captions, np.int32)
        cap_lens = np.asarray(cap_lens, np.int32)
        n = captions.shape[0]
        bs = self.batch_size
        outs = []
        for i in range(0, n, bs):
            c = captions[i: i + bs]
            l = cap_lens[i: i + bs]
            pad = bs - c.shape[0]
            if pad:
                c = np.concatenate([c, np.zeros((pad, c.shape[1]), c.dtype)])
                l = np.concatenate([l, np.ones((pad,), l.dtype)])
            img = self._pipeline(self._g_params, self._te_params,
                                 jnp.asarray(c), jnp.asarray(l),
                                 self._next_noise(bs))
            outs.append(np.asarray(jax.device_get(img))[: bs - pad or bs])
        return np.concatenate(outs, axis=0)[:n]

    def warmup(self) -> float:
        """Compile + execute the pipeline once on a dummy batch so the
        first real request doesn't pay the (remote) compile; returns the
        wall seconds spent. Uses a fixed throwaway key, NOT self._rng, so
        the served noise stream is identical with or without warmup."""
        import time as _t

        t0 = _t.perf_counter()
        max_len = self.cfg.text_encoder.max_len
        noise = jax.random.normal(
            jax.random.PRNGKey(0),
            (self.batch_size, self.cfg.generator.latent_dim))
        out = self._pipeline(
            self._g_params, self._te_params,
            jnp.ones((self.batch_size, max_len), jnp.int32),
            jnp.ones((self.batch_size,), jnp.int32), noise)
        np.asarray(out)  # value fetch = real sync through the relay
        return _t.perf_counter() - t0

    def tokenize_prompts(
            self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Free-text prompts -> (captions [N, max_len], lengths [N])
        (tokenization per reference `test_generate.py:12-19`)."""
        if self.word2code is None:
            raise ValueError("Sampler needs word2code for free-text prompts")
        caps, lens = [], []
        for prompt in prompts:
            c, l = preprocess_caption(prompt, self.word2code,
                                      self.cfg.text_encoder.max_len)
            caps.append(c[0])
            lens.append(l[0])
        return np.stack(caps), np.asarray(lens)

    def generate_prompts(self, prompts: Sequence[str]) -> np.ndarray:
        """Free-text prompts -> images."""
        return self.generate_tokens(*self.tokenize_prompts(prompts))

    def throughput(self, n_batches: int = 10) -> float:
        """Measured images/sec through the compiled pipeline.

        Follows the repo's relay timing rules (CLAUDE.md, root-caused in
        bench.py): iters rolled into ONE lax.scan dispatch, the scan carry
        consuming the full output, params passed as jit ARGUMENTS, and both
        the warmup and the timed window ended by a VALUE FETCH — through the
        TPU relay `jax.block_until_ready` can return before execution
        completes, so it must not be the sync. The timed call also gets a
        different input value (the warmup's output) than the warmup did."""
        import time as _t

        bs = self.batch_size
        cfg = self.cfg

        @jax.jit
        def run(g, te, captions, cap_lens, noise):
            gdt = jax.tree.leaves(g)[0].dtype

            def body(nz, i):
                # Roll the caption batch by the per-iteration index so the
                # encoder input is NOT loop-invariant — otherwise XLA
                # hoists the whole text-encoder out of the scan (relay
                # rule 3) and the benchmark times n_batches generates but
                # only ONE encode.
                caps = jnp.roll(captions, i, axis=0)
                lens = jnp.roll(cap_lens, i, axis=0)
                sents = text_encoder_apply(te, cfg.text_encoder, caps, lens)
                img = generator_apply(g, cfg.generator, nz.astype(gdt),
                                      sents)
                return nz + 1e-6 * jnp.mean(img).astype(nz.dtype), None

            out, _ = jax.lax.scan(body, noise, jnp.arange(n_batches))
            return out

        if self._shardings is not None:
            # benchmark the SAME data-parallel layout the pipeline serves
            # with; an unsharded jit here would measure replicated compute
            rep, shard = self._shardings
            run = jax.jit(run.__wrapped__,
                          in_shardings=(rep, rep, shard, shard, shard),
                          out_shardings=shard)

        g, te = self._g_params, self._te_params
        captions = jnp.ones((bs, cfg.text_encoder.max_len), jnp.int32)
        cap_lens = jnp.full((bs,), cfg.text_encoder.max_len, jnp.int32)
        noise = self._next_noise(bs)
        warm = np.asarray(run(g, te, captions, cap_lens, noise))  # value
        t0 = _t.perf_counter()                       # fetch = real sync
        out = np.asarray(run(g, te, captions, cap_lens, jnp.asarray(warm)))
        dt = _t.perf_counter() - t0
        assert np.isfinite(out).all()
        return bs * n_batches / dt


def build_sampler(data_dir: str, encoder_weights_path: str,
                  gen_weights_dir: str, image_size: Optional[int] = None,
                  batch_size: int = 8, use_ema: bool = False,
                  dtype: str = "float32", seed: int = 0,
                  data_parallel: bool = False) -> Tuple[Sampler, int]:
    """Load vocab/weights and build the resident Sampler (shared by the
    batch-CLI and HTTP paths); returns (sampler, checkpoint_epoch).

    This owns the reference's serving load path (`test_generate.py:30-49`:
    vocab from captions.pickle, text encoder state_dict, latest generator
    weights by epoch number) with the checkpoint's persisted config
    resolving the architecture."""
    from .generate import load_vocab
    from .models.text_encoder import load_text_encoder
    from .train.checkpoint import CheckpointManager

    code2word, word2code = load_vocab(data_dir)
    ckpt = CheckpointManager(gen_weights_dir)
    cfg = ckpt.resolve_inference_config(vocab_size=len(code2word),
                                        image_size=image_size)
    te_params = load_text_encoder(encoder_weights_path, cfg.text_encoder)

    def load_generator(epoch: Optional[int] = None) -> Tuple[Params, int]:
        """Restore g (or EMA) params at `epoch` (None = latest gen_N) at
        the serving dtype — the initial load AND the hot-reload path."""
        tree, ep = ckpt.restore_generator_tree(cfg.generator, epoch=epoch)
        g = tree["g_ema_params" if use_ema else "g_params"]
        if dtype == "bfloat16":
            g = _cast_floating(g, jnp.bfloat16)
        return g, ep

    g_params, epoch = load_generator()
    if dtype == "bfloat16":
        te_params = _cast_floating(te_params, jnp.bfloat16)

    mesh = None
    if data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh()
        print(f"Serving data-parallel over mesh: {dict(mesh.shape)}")
    sampler = Sampler(cfg, g_params, te_params, word2code=word2code,
                      batch_size=batch_size, seed=seed, mesh=mesh)
    # Weight hot-reload hooks for the HTTP layer (`POST /reload`, --watch):
    # re-read gen_N from the same weights dir and swap via
    # swap_generator_params; the cheap epoch probe lets the watcher poll
    # without restoring anything.
    sampler.reload_generator = load_generator
    sampler.latest_generator_epoch = ckpt.latest_generator_epoch
    return sampler, epoch


class RequestCoalescer:
    """Dynamic request batching for the HTTP server: concurrent /generate
    requests are coalesced into one pipeline dispatch instead of each
    paying a full padded batch (a 1-prompt request through a bs-128
    pipeline computes 128 images and keeps 1; eight such requests
    serialized = 8 dispatches where one would do — TF-Serving/Triton-style
    "dynamic batching", no reference counterpart).

    Handler threads `submit(captions, lens)` and block; one dispatcher
    thread takes the first queued request, keeps gathering until it has
    `max_items` prompts or `window_s` elapses, runs the sampler ONCE under
    the dispatch lock, and hands each waiter its slice. A failed dispatch
    propagates the exception to every request in that batch.
    """

    _STOP = object()

    def __init__(self, sampler: Sampler, lock, window_s: float,
                 max_items: Optional[int] = None):
        import queue
        import threading

        if window_s <= 0:
            raise ValueError(f"window_s must be > 0, got {window_s}")
        self._sampler = sampler
        self._lock = lock
        self._window = window_s
        self._max = max_items or sampler.batch_size
        self._q = queue.Queue()
        self._stopped = False
        self.dispatches = 0  # pipeline batches run (for /metrics)
        self._thread = threading.Thread(target=self._run,
                                        name="request-coalescer",
                                        daemon=True)
        self._thread.start()

    def submit(self, captions: np.ndarray, lens: np.ndarray) -> np.ndarray:
        import threading

        if self._stopped:
            raise RuntimeError("coalescer stopped (server shutting down)")
        slot = {"done": threading.Event(), "images": None, "error": None,
                "caps": captions, "lens": lens}
        self._q.put(slot)
        # Generous bound: the first dispatch before warmup can carry a
        # multi-minute remote compile; a dead dispatcher must still not
        # hang the handler forever.
        if not slot["done"].wait(timeout=600):
            raise RuntimeError("coalescer dispatch timed out")
        if slot["error"] is not None:
            raise slot["error"]
        return slot["images"]

    def _run(self):
        import queue
        import time as _t

        while True:
            slot = self._q.get()
            if slot is self._STOP:
                return
            batch = [slot]
            n = len(slot["caps"])
            deadline = _t.monotonic() + self._window
            while n < self._max:
                remaining = deadline - _t.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._q.put(self._STOP)  # re-arm for the outer loop
                    break
                batch.append(nxt)
                n += len(nxt["caps"])
            try:
                caps = np.concatenate([b["caps"] for b in batch])
                lens = np.concatenate([b["lens"] for b in batch])
                with self._lock:
                    images = self._sampler.generate_tokens(caps, lens)
                self.dispatches += 1
                i = 0
                for b in batch:
                    b["images"] = images[i: i + len(b["caps"])]
                    i += len(b["caps"])
            except Exception as e:  # propagate to every waiter in the batch
                for b in batch:
                    b["error"] = e
            finally:
                for b in batch:
                    b["done"].set()

    def stop(self, timeout: float = 30.0):
        """Stop after draining queued requests; joins the dispatcher.
        Later submits fail fast instead of hanging."""
        self._stopped = True
        self._q.put(self._STOP)
        self._thread.join(timeout)


def make_http_server(sampler: Sampler, host: str = "127.0.0.1",
                     port: int = 0, max_prompts: int = 1024,
                     max_body_bytes: int = 16 << 20,
                     max_inflight: int = 64,
                     epoch: Optional[int] = None,
                     reloader=None,
                     watch_interval: Optional[float] = None,
                     latest_epoch_fn=None,
                     handler_timeout: Optional[float] = 120.0,
                     coalesce_window: Optional[float] = None):
    """HTTP server around a resident `Sampler` (no reference counterpart —
    the reference's serving story is one script run per prompt,
    `test_generate.py:21-84`; this is the long-lived production surface).

    Endpoints (JSON, stdlib-only):
      GET  /healthz            -> {"status": "ok", "batch_size",
                                   "image_size", "epoch"}
      GET  /metrics            -> request/shed/error/image counters +
                                  generate-latency sums (JSON; scrape or
                                  diff between polls for rates)
      POST /generate           <- {"prompts": ["a red bird", ...]}
                                  or {"captions": [[ids...]], "cap_lens": [..]}
                                  + optional "format": "png" (default) |
                                    "jpeg", "quality": 1..100 (jpeg, def 95)
                               -> {"images": [<base64>, ...], "count": N,
                                   "format": "png"|"jpeg"}
      POST /reload             <- {} or {"epoch": N} — hot-swap the served
                                  generator weights from the weights dir
                                  (latest gen_N, or an explicit epoch)
                                  without restarting or recompiling; swaps
                                  atomically w.r.t. in-flight generates.
                                  Requires `reloader` (the CLI wires
                                  `build_sampler`'s; epoch -> /healthz).

    `watch_interval` (seconds; CLI `--watch`) starts a background watcher
    that polls `latest_epoch_fn` and auto-swaps when the trainer writes a
    newer gen_N — continuous train-and-serve without a client driving
    /reload. The watcher stops at `server_close()`. An explicit
    `POST /reload {"epoch": N}` PINS that epoch (the watcher would
    otherwise re-upgrade an operator's rollback within one poll); a bare
    `POST /reload {}` unpins and resumes following the latest.

    `handler_timeout` (seconds, None = unbounded) is the per-socket-op
    timeout on handler connections: it bounds how long a stalled client
    can pin a handler thread in a body read (the shed/404 drain paths)
    or a response write — and therefore how long `server_close()`'s
    join of the non-daemon handler threads can block at shutdown.

    `coalesce_window` (seconds; CLI `--coalesce-ms`) enables dynamic
    request batching: concurrent /generate requests are gathered for up
    to the window (or until one pipeline batch is full) and dispatched
    as ONE padded batch instead of one each — see `RequestCoalescer`.
    Worth it when traffic is many small requests; a single client
    sending full batches gains nothing and pays the window once.

    PNG encode is the host-side wall at batch scale (measured ~35-50 img/s
    at 256px on a 1-vCPU serving host vs 4500+ img/s through the TPU
    pipeline); "jpeg" encodes ~10x faster (~400 img/s) at ~half the bytes.

    Returns the bound `ThreadingHTTPServer` (port via `.server_address[1]`);
    call `.serve_forever()` to block (the CLI does). Handler threads
    serialize JAX dispatch through one lock — the pipeline is a single
    compiled program, so concurrency above it buys nothing on one chip.
    /generate requests beyond `max_inflight` are shed with a 503 instead
    of queueing unboundedly (each queued request holds a thread + body).
    Binds loopback by default; put a real gateway in front for anything
    public.
    """
    import base64
    import io
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    from .utils.image_io import denormalize_to_uint8

    import time

    if max_inflight < 1:
        raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
    if watch_interval is not None:
        if reloader is None or latest_epoch_fn is None:
            raise ValueError("watch_interval needs both reloader and "
                             "latest_epoch_fn (build_sampler provides them)")
        if watch_interval <= 0:
            raise ValueError(
                f"watch_interval must be > 0, got {watch_interval}")
    lock = threading.Lock()
    # Load shedding: dispatch is serialized through `lock`, so each request
    # beyond the one running just holds a thread + its decoded body in RAM.
    # Past max_inflight queued /generate requests, answer 503 immediately
    # instead of queueing unboundedly.
    inflight = threading.BoundedSemaphore(max_inflight)
    # One restore at a time (restores are seconds of disk+device_put; the
    # actual swap still happens under `lock`, atomically w.r.t. generates).
    reload_lock = threading.Lock()
    stats_lock = threading.Lock()
    stats = {"requests_total": 0, "generate_ok": 0, "generate_error": 0,
             "shed_total": 0, "images_total": 0, "reloads_total": 0,
             "generate_seconds_total": 0.0, "last_generate_seconds": 0.0}
    state = {"epoch": epoch, "pinned": False}
    coalescer = (RequestCoalescer(sampler, lock, coalesce_window)
                 if coalesce_window is not None else None)

    def bump(**deltas):
        with stats_lock:
            for k, v in deltas.items():
                stats[k] += v

    def do_reload(want: Optional[int] = None) -> int:
        """The one reload-and-swap critical section (POST /reload AND the
        watcher): restore outside the dispatch lock, swap inside it."""
        with reload_lock:
            params, ep = reloader(epoch=want)
            with lock:  # atomic w.r.t. in-flight generates
                sampler.swap_generator_params(params)
                state["epoch"] = ep
        bump(reloads_total=1)
        return ep

    def encode_images(images: np.ndarray, fmt: str, quality: int) -> List[str]:
        kw = {"quality": quality} if fmt == "JPEG" else {}
        out = []
        for img in images:
            buf = io.BytesIO()
            Image.fromarray(denormalize_to_uint8(
                np.asarray(img, np.float32))).save(buf, format=fmt, **kw)
            out.append(base64.b64encode(buf.getvalue()).decode("ascii"))
        return out

    class Handler(BaseHTTPRequestHandler):
        # Socket timeout for every read/write on a handler connection
        # (StreamRequestHandler.setup applies it): a stalled client can
        # pin a thread (body drain, response write) at most this long,
        # which also bounds server_close()'s non-daemon thread join.
        timeout = handler_timeout

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            try:
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                # Client gone (e.g. timed out while queued in the listen
                # backlog during warmup): nothing to answer and nothing
                # wrong server-side — don't spray a traceback per request
                # (observed live driving `serve --http`).
                self.close_connection = True

        def log_message(self, fmt, *args):  # route access logs to stderr
            print(f"[serve-http] {self.address_string()} {fmt % args}",
                  file=sys.stderr)

        def do_GET(self):
            bump(requests_total=1)
            if self.path == "/healthz":
                return self._send(
                    200, {"status": "ok",
                          "batch_size": sampler.batch_size,
                          "image_size": sampler.cfg.generator.image_size,
                          "epoch": state["epoch"],
                          "pinned": state["pinned"]})
            if self.path == "/metrics":
                with stats_lock:
                    snap = dict(stats)
                snap.update(epoch=state["epoch"], pinned=state["pinned"],
                            max_inflight=max_inflight,
                            batch_size=sampler.batch_size)
                if coalescer is not None:
                    snap["coalesced_dispatches"] = coalescer.dispatches
                return self._send(200, snap)
            self._send(404, {"error": "unknown path"})

        def _drain_body(self):
            """Consume the unread request body (bounded by max_body_bytes)
            before an error response on paths that never read it (503
            shed, POST 404, bad Content-Length): closing the socket with
            body bytes still in flight RSTs the connection and the client
            sees a reset instead of the status code."""
            try:
                n = min(int(self.headers.get("Content-Length", 0)),
                        max_body_bytes)
            except (TypeError, ValueError):
                return
            while n > 0:
                chunk = self.rfile.read(min(n, 1 << 16))
                if not chunk:
                    break
                n -= len(chunk)

        def do_POST(self):
            bump(requests_total=1)
            if self.path == "/reload":
                return self._reload()
            if self.path != "/generate":
                self._drain_body()
                return self._send(404, {"error": "unknown path"})
            if not inflight.acquire(blocking=False):
                self._drain_body()
                bump(shed_total=1)
                return self._send(503, {"error": "server busy: "
                                        f"{max_inflight} requests in flight"})
            try:
                self._generate()
            finally:
                inflight.release()

        def _reload(self):
            if reloader is None:
                self._drain_body()
                return self._send(
                    400, {"error": "reload not available: server was built "
                          "without a weights-directory reloader"})
            try:  # client-caused problems -> 400
                n = int(self.headers.get("Content-Length", 0))
                if not 0 <= n <= max_body_bytes:
                    self._drain_body()
                    raise ValueError(
                        f"Content-Length must be 0..{max_body_bytes}")
                req = json.loads(self.rfile.read(n)) if n else {}
                want = req.get("epoch")
                if want is not None:
                    want = int(want)
            except (ValueError, TypeError) as e:
                return self._send(400, {"error": str(e)})
            try:  # server-side restore/swap problems -> 404/500
                ep = do_reload(want)
                # An explicit epoch is an operator's pin (e.g. rolling
                # back a bad latest): the --watch poller must not
                # re-upgrade it. A bare reload unpins.
                state["pinned"] = want is not None
            except FileNotFoundError as e:
                return self._send(404, {"error": str(e)})
            except Exception as e:  # corrupt checkpoint, restore failure
                return self._send(500,
                                  {"error": f"{type(e).__name__}: {e}"})
            self._send(200, {"status": "ok", "epoch": ep,
                             "pinned": state["pinned"]})

        def _generate(self):
            t0 = time.perf_counter()
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= max_body_bytes:
                    self._drain_body()
                    raise ValueError(
                        f"Content-Length must be 1..{max_body_bytes}")
                req = json.loads(self.rfile.read(n))
                prompts = req.get("prompts")
                captions = req.get("captions")
                if (prompts is None) == (captions is None):
                    raise ValueError(
                        "pass exactly one of 'prompts' or 'captions'")
                items = prompts if prompts is not None else captions
                if not isinstance(items, list) or \
                        not 0 < len(items) <= max_prompts:
                    raise ValueError(
                        f"need a list of 1..{max_prompts} items")
                fmt = str(req.get("format", "png")).lower()
                if fmt not in ("png", "jpeg"):
                    raise ValueError("format must be 'png' or 'jpeg'")
                quality = int(req.get("quality", 95))
                if not 1 <= quality <= 100:
                    raise ValueError("quality must be 1..100")
                if captions is not None:
                    # Normalize to the pipeline's compiled [N, max_len]
                    # width (a request-controlled width would retrace the
                    # jit under the lock) and validate lengths: len 0 or
                    # > max_len would silently encode garbage.
                    max_len = sampler.cfg.text_encoder.max_len
                    caps = np.zeros((len(captions), max_len), np.int32)
                    for i, c in enumerate(captions):
                        row = np.asarray(c, np.int32).reshape(-1)[:max_len]
                        caps[i, : len(row)] = row
                    lens = np.asarray(
                        req.get("cap_lens",
                                [min(len(c), max_len) for c in captions]),
                        np.int32).reshape(-1)
                    if lens.shape != (len(captions),) or (lens < 1).any() \
                            or (lens > max_len).any():
                        raise ValueError(
                            f"cap_lens must be {len(captions)} ints in "
                            f"1..{max_len}")
                if prompts is not None:
                    caps, lens = sampler.tokenize_prompts(
                        [str(p) for p in prompts])
                if coalescer is not None:
                    images = coalescer.submit(caps, lens)
                else:
                    with lock:
                        images = sampler.generate_tokens(caps, lens)
            except ValueError as e:
                bump(generate_error=1)
                return self._send(400, {"error": str(e)})
            except Exception as e:  # malformed JSON, wrong shapes, ...
                bump(generate_error=1)
                return self._send(400,
                                  {"error": f"{type(e).__name__}: {e}"})
            encoded = encode_images(images, fmt.upper(), quality)
            # Request-level latency: queue wait behind the dispatch lock +
            # pipeline + image encode (encode is the measured host-side
            # wall at batch scale — excluding it would report "capacity
            # fine" while clients wait in PNG compression).
            dt = time.perf_counter() - t0
            with stats_lock:
                stats["generate_ok"] += 1
                stats["images_total"] += int(len(images))
                stats["generate_seconds_total"] += dt
                stats["last_generate_seconds"] = dt
            self._send(200, {"images": encoded,
                             "count": int(len(images)), "format": fmt})

    watcher_stop = threading.Event()

    def watch_loop():
        while not watcher_stop.wait(watch_interval):
            try:
                if state["pinned"]:  # operator rollback holds until a
                    continue         # bare POST /reload unpins
                ep = latest_epoch_fn()
                if ep is None or ep == state["epoch"]:
                    continue
                ep = do_reload()
                print(f"[serve-http] watcher: now serving epoch-{ep} "
                      "weights", file=sys.stderr, flush=True)
            except Exception as e:
                # Transient by design (e.g. the trainer mid-write); the
                # next poll retries. Keep serving the current weights.
                print(f"[serve-http] watcher: reload failed, keeping "
                      f"epoch {state['epoch']}: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)

    class Server(ThreadingHTTPServer):
        # ThreadingHTTPServer defaults to DAEMON handler threads, which
        # socketserver._Threads.append does not track — server_close()
        # would join nothing and process exit would kill in-flight
        # handlers mid-response. Non-daemon threads give the documented
        # graceful-stop semantics: shutdown() ends the accept loop,
        # server_close() joins the in-flight handlers to completion.
        daemon_threads = False

        def server_close(self):
            watcher_stop.set()
            if coalescer is not None:
                # BEFORE joining handler threads: they may be blocked in
                # coalescer.submit; stop() drains the queue and completes
                # every waiter, letting the handler join below finish.
                coalescer.stop()
            super().server_close()
            if self._watcher_thread is not None:
                self._watcher_thread.join(timeout=30)

        _watcher_thread = None

    server = Server((host, port), Handler)
    if watch_interval is not None:
        server._watcher_thread = threading.Thread(
            target=watch_loop, name="weight-watcher", daemon=True)
        server._watcher_thread.start()
    return server


def main(data_dir: str, encoder_weights_path: str, gen_weights_dir: str,
         out_dir: str, prompts: Sequence[str],
         image_size: Optional[int] = None,
         batch_size: int = 8, use_ema: bool = False, dtype: str = "float32",
         seed: int = 0, data_parallel: bool = False) -> List[str]:
    """Batch prompt -> image serving: N prompts through ONE compiled
    resident pipeline (the production counterpart of `generate.py`'s
    one-prompt interactive path; reference serving story is
    `test_generate.py:21-84`, one G forward per script run).

    Writes one PNG per prompt plus a grid; returns the per-prompt paths.
    `dtype="bfloat16"` serves with bf16 params (noise/activations follow,
    see Sampler.pipeline). `image_size=None` (the default) rebuilds the
    model from the checkpoint's persisted config.json; an explicit size is
    validated against the trained size (weights cannot restore into a
    different ladder) and only selects the architecture for pre-config
    weight dirs (which default to the reference's 256px)."""
    from .utils import image_io

    sampler, epoch = build_sampler(
        data_dir, encoder_weights_path, gen_weights_dir,
        image_size=image_size, batch_size=batch_size, use_ema=use_ema,
        dtype=dtype, seed=seed, data_parallel=data_parallel)
    images = np.asarray(sampler.generate_prompts(list(prompts)),
                        dtype=np.float32)
    paths = [image_io.save_image(img, out_dir, f"serve_{i:04d}")
             for i, img in enumerate(images)]
    image_io.save_image_grid(images, os.path.join(out_dir, "serve_grid.png"))
    print(f"Served {len(paths)} prompts (epoch-{epoch} weights"
          f"{', EMA' if use_ema else ''}) -> {out_dir}")
    return paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="batch prompt -> image serving")
    ap.add_argument("--data", default="data",
                    help="dataset dir (vocab via captions.pickle)")
    ap.add_argument("--text-encoder", default="text_encoder.pth")
    ap.add_argument("--weights", default="gen_weights")
    ap.add_argument("--out", default="served_images")
    ap.add_argument("--image-size", type=int, default=None,
                    help="override the checkpoint's persisted config "
                         "(default: read it from <weights>/config.json, "
                         "256 for pre-config checkpoints)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--dp", action="store_true",
                    help="serve data-parallel over all devices (params "
                         "replicated, prompt batch sharded; the device "
                         "count must divide batch-size)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--ema", action="store_true",
                    help="serve from the EMA generator")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compile-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache: repeat "
                         "invocations skip the pipeline compile")
    ap.add_argument("--prompts-file", default=None,
                    help="file with one prompt per line")
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="instead of batch-serving the given prompts, run "
                         "a resident HTTP server (loopback) with "
                         "GET /healthz and POST /generate "
                         '{"prompts": [...]} -> base64 PNGs')
    ap.add_argument("--http-host", default="127.0.0.1",
                    help="bind address for --http (default loopback)")
    ap.add_argument("--max-inflight", type=int, default=64,
                    help="concurrent /generate requests beyond this are "
                         "shed with a 503 instead of queueing (each queued "
                         "request holds a thread + its body)")
    ap.add_argument("--coalesce-ms", type=float, default=None,
                    metavar="MS",
                    help="with --http: dynamic request batching — gather "
                         "concurrent /generate requests for up to this "
                         "many milliseconds (or one full pipeline batch) "
                         "and run them as ONE padded dispatch")
    ap.add_argument("--watch", type=float, default=None, metavar="SECONDS",
                    help="with --http: poll the weights dir at this "
                         "interval and auto-serve newer gen_N epochs as "
                         "the trainer writes them (hot swap, no restart)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the startup pipeline warmup (first request "
                         "then pays the compile)")
    ap.add_argument("prompts", nargs="*", help="prompts on the command line")
    a = ap.parse_args()
    if a.max_inflight < 1:
        ap.error(f"--max-inflight must be >= 1, got {a.max_inflight}")
    if a.watch is not None:
        if a.http is None:
            ap.error("--watch requires --http")
        if a.watch <= 0:
            ap.error(f"--watch must be > 0 seconds, got {a.watch}")
    if a.coalesce_ms is not None:
        if a.http is None:
            ap.error("--coalesce-ms requires --http")
        if a.coalesce_ms <= 0:
            ap.error(f"--coalesce-ms must be > 0, got {a.coalesce_ms}")
    if a.compile_cache:
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache(a.compile_cache)
    if a.http is not None:
        sampler, epoch = build_sampler(
            a.data, a.text_encoder, a.weights, image_size=a.image_size,
            batch_size=a.batch_size, use_ema=a.ema, dtype=a.dtype,
            seed=a.seed, data_parallel=a.dp)
        # Bind BEFORE the warmup: a port conflict must fail fast, not
        # after minutes of pipeline compile. (Connections arriving before
        # serve_forever just wait in the listen backlog.)
        server = make_http_server(sampler, host=a.http_host, port=a.http,
                                  max_inflight=a.max_inflight, epoch=epoch,
                                  reloader=sampler.reload_generator,
                                  watch_interval=a.watch,
                                  latest_epoch_fn=(
                                      sampler.latest_generator_epoch),
                                  coalesce_window=(
                                      a.coalesce_ms / 1000.0
                                      if a.coalesce_ms is not None
                                      else None))
        # Graceful stop: SIGTERM/SIGINT end serve_forever's loop (in-flight
        # handler threads run to completion) instead of killing mid-request.
        # shutdown() must not run on the serve_forever thread -> spawn one.
        # Installed BEFORE the warmup: warmup can take minutes (remote
        # compile), and a signal there would otherwise hard-kill the
        # process with accepted connections in the backlog. shutdown()
        # just sets the stop flag, so a during-warmup signal makes the
        # post-warmup serve_forever() return immediately — a clean
        # no-serve exit once the (uninterruptible) compile finishes.
        import signal
        import threading

        stopping = threading.Event()

        def _stop(signum, _frame):
            print(f"Signal {signum}: stopping server...", flush=True)
            stopping.set()
            threading.Thread(target=server.shutdown, daemon=True).start()

        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)
        if not a.no_warmup:
            print("Warming the pipeline (compile + one dummy batch)...",
                  flush=True)
            print(f"Pipeline warm in {sampler.warmup():.1f}s", flush=True)
        if not stopping.is_set():
            print(f"Serving epoch-{epoch} weights on "
                  f"http://{a.http_host}:{server.server_address[1]} "
                  f"(batch {a.batch_size}, {a.dtype})", flush=True)
        server.serve_forever()
        server.server_close()
        print("Server stopped", flush=True)
    else:
        prompts = list(a.prompts)
        if a.prompts_file:
            with open(a.prompts_file) as f:
                prompts += [l.strip() for l in f if l.strip()]
        if not prompts:
            ap.error("no prompts given (positional or --prompts-file)")
        main(a.data, a.text_encoder, a.weights, a.out, prompts,
             image_size=a.image_size, batch_size=a.batch_size,
             use_ema=a.ema, dtype=a.dtype, seed=a.seed, data_parallel=a.dp)
