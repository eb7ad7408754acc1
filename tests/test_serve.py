"""Resident Sampler (serve path) tests."""
import jax
import numpy as np

from gan_codes_tpu.config import (DiscriminatorConfig, GANConfig,
                                  GeneratorConfig, TextEncoderConfig)
from gan_codes_tpu.models.generator import init_generator
from gan_codes_tpu.models.text_encoder import init_text_encoder
from gan_codes_tpu.serve import Sampler

KEY = jax.random.PRNGKey(4)


def make_sampler(batch_size=4):
    cfg = GANConfig(
        generator=GeneratorConfig(n_channels=4, image_size=16,
                                  sentence_dim=16),
        discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                          sentence_dim=16),
        text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                       hidden_dim=16, max_len=6),
    )
    g = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
    te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
    word2code = {"<unk>": 1, "bird": 2, "red": 3, "blue": 4}
    return Sampler(cfg, g, te, word2code, batch_size=batch_size)


class TestSampler:
    def test_token_batch_any_size(self):
        s = make_sampler(batch_size=4)
        caps = np.ones((6, 6), np.int32)  # 6 items through bs-4 pipeline
        lens = np.full((6,), 6, np.int32)
        imgs = s.generate_tokens(caps, lens)
        assert imgs.shape == (6, 16, 16, 3)
        assert np.isfinite(imgs).all() and np.abs(imgs).max() <= 1.0

    def test_prompts(self):
        s = make_sampler()
        imgs = s.generate_prompts(["a red bird", "a blue bird, big."])
        assert imgs.shape == (2, 16, 16, 3)

    def test_noise_advances(self):
        s = make_sampler()
        caps = np.ones((2, 6), np.int32)
        lens = np.full((2,), 6, np.int32)
        a = s.generate_tokens(caps, lens)
        b = s.generate_tokens(caps, lens)
        assert not np.allclose(a, b)  # fresh noise per call (sample.py:13-18)

    def test_throughput_runs(self):
        s = make_sampler()
        ips = s.throughput(n_batches=3)
        assert ips > 0

    def test_swap_generator_params(self):
        """Hot reload: swapped params serve through the same compiled
        pipeline; mismatched shapes/structures are rejected readably."""
        import jax.numpy as jnp
        import pytest

        s = make_sampler()
        caps = np.ones((2, 6), np.int32)
        lens = np.full((2,), 6, np.int32)
        s_twin = make_sampler()  # same seed -> same noise stream
        before = s_twin.generate_tokens(caps, lens)

        s.swap_generator_params(jax.tree.map(jnp.zeros_like, s._g_params))
        after = s.generate_tokens(caps, lens)
        assert np.array_equal(after, np.zeros_like(after))  # tanh(0) = 0
        assert not np.array_equal(before, after)

        with pytest.raises(ValueError, match="shapes"):
            s.swap_generator_params(jax.tree.map(
                lambda x: jnp.zeros(x.shape + (1,), x.dtype), s._g_params))
        with pytest.raises(ValueError, match="structure"):
            s.swap_generator_params({"not": jnp.zeros(())})

    def test_warmup_preserves_noise_stream(self):
        """warmup() compiles/executes but must not advance the serving
        RNG: a warmed server serves the same images as a cold one."""
        caps = np.ones((2, 6), np.int32)
        lens = np.full((2,), 6, np.int32)
        cold = make_sampler().generate_tokens(caps, lens)
        warmed = make_sampler()
        assert warmed.warmup() > 0
        assert np.array_equal(warmed.generate_tokens(caps, lens), cold)


class TestHTTPServe:
    """The resident HTTP surface (serve.make_http_server / `serve --http`)."""

    def _start(self, batch_size=4):
        import threading

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=batch_size)
        server = make_http_server(sampler, port=0)  # ephemeral loopback port
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, f"http://127.0.0.1:{server.server_address[1]}"

    def _post(self, url, payload, path="/generate"):
        import json
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def _get(self, url, path):
        import json
        import urllib.request

        with urllib.request.urlopen(url + path) as r:
            return json.loads(r.read())

    def test_healthz_generate_and_errors(self):
        import base64
        import io
        import json
        import urllib.request

        from PIL import Image

        server, url = self._start()
        try:
            with urllib.request.urlopen(url + "/healthz") as r:
                h = json.loads(r.read())
            assert h["status"] == "ok" and h["batch_size"] == 4

            # free-text prompts -> decodable PNGs at the model's size
            code, body = self._post(url, {"prompts": ["a red bird",
                                                      "a blue bird"]})
            assert code == 200 and body["count"] == 2
            img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
            assert img.size == (16, 16) and img.mode == "RGB"

            # token path (5 items through the bs-4 pipeline: padding+split)
            code, body = self._post(
                url, {"captions": [[2, 3, 0, 0, 0, 0]] * 5,
                      "cap_lens": [2] * 5})
            assert code == 200 and body["count"] == 5

            # narrow/ragged caption widths are normalized to the compiled
            # max_len width (no per-request retrace), lens defaulted
            code, body = self._post(url, {"captions": [[2, 3], [4]]})
            assert code == 200 and body["count"] == 2

            # jpeg is the fast-encode production format (~10x png)
            code, body = self._post(url, {"prompts": ["a red bird"],
                                          "format": "jpeg", "quality": 90})
            assert code == 200 and body["format"] == "jpeg"
            img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
            assert img.format == "JPEG" and img.size == (16, 16)
            code, body = self._post(url, {"prompts": ["x"],
                                          "format": "webp"})
            assert code == 400 and "format" in body["error"]

            # error paths: both/neither input kinds, malformed JSON
            code, body = self._post(url, {})
            assert code == 400 and "exactly one" in body["error"]
            code, body = self._post(url, {"prompts": ["x"],
                                          "captions": [[1]]})
            assert code == 400
            code, body = self._post(url, {"prompts": []})
            assert code == 400
            # non-list payloads must not be iterated char-by-char
            code, body = self._post(url, {"prompts": "a red bird"})
            assert code == 400 and "list" in body["error"]
            # zero/oversized cap_lens would encode garbage silently
            code, body = self._post(url, {"captions": [[2, 3]],
                                          "cap_lens": [0]})
            assert code == 400 and "cap_lens" in body["error"]
            code, body = self._post(url, {"captions": [[2, 3]],
                                          "cap_lens": [99]})
            assert code == 400 and "cap_lens" in body["error"]
            # an all-empty caption row has no valid default length
            code, body = self._post(url, {"captions": [[]]})
            assert code == 400 and "cap_lens" in body["error"]
        finally:
            server.shutdown()
            server.server_close()  # release the listening socket fd

    def test_load_shedding_503(self):
        """Requests beyond max_inflight are shed with a 503 instead of
        queueing a thread + body each behind the dispatch lock."""
        import threading

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        gate, entered = threading.Event(), threading.Event()
        real = sampler.generate_tokens

        def stub(caps, lens):  # the handler dispatch path (generate_tokens)
            entered.set()
            gate.wait(30)
            return real(caps, lens)

        sampler.generate_tokens = stub
        server = make_http_server(sampler, port=0, max_inflight=1)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            first = {}

            def blocked():
                first["resp"] = self._post(url, {"prompts": ["a bird"]})

            t1 = threading.Thread(target=blocked)
            t1.start()
            # Once the first request is inside the handler it holds the one
            # inflight slot (blocked on `gate`); the overlap must shed 503.
            assert entered.wait(30)
            code, body = self._post(url, {"prompts": ["another"]})
            assert code == 503 and "busy" in body["error"]
            gate.set()
            t1.join(60)
            assert first["resp"][0] == 200  # the held request completes
        finally:
            gate.set()
            server.shutdown()
            server.server_close()

    def test_max_inflight_validated(self):
        import pytest

        from gan_codes_tpu.serve import make_http_server

        with pytest.raises(ValueError, match="max_inflight"):
            make_http_server(make_sampler(), port=0, max_inflight=0)

    def test_shed_503_readable_with_large_body(self):
        """The shed path must DRAIN the unread request body before
        responding: closing the socket with megabytes still in flight
        RSTs the connection and the client never sees the 503."""
        import threading

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        gate, entered = threading.Event(), threading.Event()
        real = sampler.generate_tokens

        def stub(caps, lens):  # the handler dispatch path (generate_tokens)
            entered.set()
            gate.wait(30)
            return real(caps, lens)

        sampler.generate_tokens = stub
        server = make_http_server(sampler, port=0, max_inflight=1)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            t1 = threading.Thread(target=self._post, args=(
                url, {"prompts": ["a bird"]}), daemon=True)
            t1.start()
            assert entered.wait(30)
            # 8 MB body (beyond loopback socket buffers): without the
            # drain, urllib raises ConnectionReset/BrokenPipe mid-send.
            code, body = self._post(
                url, {"prompts": ["x"], "pad": "x" * (8 << 20)})
            assert code == 503 and "busy" in body["error"]
        finally:
            gate.set()
            server.shutdown()
            server.server_close()

    def test_reload_swaps_weights_metrics_and_epoch(self):
        """POST /reload hot-swaps the served generator params through the
        compiled pipeline (no retrace) and updates /healthz's epoch; the
        /metrics counters track requests, images, and reloads."""
        import base64
        import io
        import threading

        import jax.numpy as jnp
        from PIL import Image

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        zeros = jax.tree.map(jnp.zeros_like, sampler._g_params)

        def reloader(epoch=None):
            if epoch == 99:
                raise FileNotFoundError("No gen_99 in weights")
            return zeros, 7 if epoch is None else epoch

        server = make_http_server(sampler, port=0, epoch=3,
                                  reloader=reloader)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            assert self._get(url, "/healthz")["epoch"] == 3

            code, body = self._post(url, {"prompts": ["a red bird"]})
            assert code == 200

            code, body = self._post(url, {}, path="/reload")
            assert code == 200 and body["epoch"] == 7
            assert self._get(url, "/healthz")["epoch"] == 7

            # all-zero params -> G output exactly tanh(0)=0 -> uint8 127/128
            code, body = self._post(url, {"prompts": ["a red bird"]})
            arr = np.asarray(Image.open(io.BytesIO(
                base64.b64decode(body["images"][0]))))
            assert set(np.unique(arr)) <= {127, 128}

            # explicit epoch passthrough + missing-epoch 404
            code, body = self._post(url, {"epoch": 5}, path="/reload")
            assert code == 200 and body["epoch"] == 5
            code, body = self._post(url, {"epoch": 99}, path="/reload")
            assert code == 404 and "gen_99" in body["error"]
            code, body = self._post(url, {"epoch": "x"}, path="/reload")
            assert code == 400

            m = self._get(url, "/metrics")
            assert m["generate_ok"] == 2 and m["images_total"] == 2
            assert m["reloads_total"] == 2 and m["epoch"] == 5
            assert m["generate_seconds_total"] > 0
            assert m["requests_total"] >= 8
        finally:
            server.shutdown()
            server.server_close()

    def test_watcher_auto_reloads(self):
        """--watch: the background watcher polls the weights dir's latest
        epoch and hot-swaps without any client driving /reload; it stops
        at server_close()."""
        import threading
        import time

        import jax.numpy as jnp

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        zeros = jax.tree.map(jnp.zeros_like, sampler._g_params)
        current = {"epoch": 1, "params": sampler._g_params}

        server = make_http_server(
            sampler, port=0, epoch=1,
            reloader=lambda epoch=None: (current["params"],
                                         current["epoch"]),
            watch_interval=0.05,
            latest_epoch_fn=lambda: current["epoch"])
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            assert self._get(url, "/healthz")["epoch"] == 1
            # the trainer "writes" a newer epoch; the watcher must pick
            # it up with no /reload call
            current["params"], current["epoch"] = zeros, 2
            deadline = time.monotonic() + 15
            while time.monotonic() < deadline:
                if self._get(url, "/healthz")["epoch"] == 2:
                    break
                time.sleep(0.05)
            assert self._get(url, "/healthz")["epoch"] == 2
            assert self._get(url, "/metrics")["reloads_total"] == 1

            import base64
            import io

            from PIL import Image

            code, body = self._post(url, {"prompts": ["a red bird"]})
            arr = np.asarray(Image.open(io.BytesIO(
                base64.b64decode(body["images"][0]))))
            assert set(np.unique(arr)) <= {127, 128}  # zeros served
        finally:
            server.shutdown()
            server.server_close()
        assert not server._watcher_thread.is_alive()  # stopped at close

    def test_reload_pin_suppresses_watcher(self):
        """An explicit POST /reload {"epoch": N} is an operator pin (e.g.
        rolling back a bad latest): the watcher must NOT re-upgrade it;
        a bare POST /reload {} unpins and resumes following latest."""
        import threading
        import time

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        keep = sampler._g_params
        current = {"epoch": 5}

        def reloader(epoch=None):
            return keep, current["epoch"] if epoch is None else epoch

        server = make_http_server(
            sampler, port=0, epoch=5, reloader=reloader,
            watch_interval=0.05, latest_epoch_fn=lambda: current["epoch"])
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            # operator rolls back to epoch 3 -> pinned
            code, body = self._post(url, {"epoch": 3}, path="/reload")
            assert code == 200 and body == {"status": "ok", "epoch": 3,
                                            "pinned": True}
            # trainer writes epoch 6; the watcher must hold the pin
            current["epoch"] = 6
            time.sleep(0.5)  # ~10 poll intervals
            h = self._get(url, "/healthz")
            assert h["epoch"] == 3 and h["pinned"] is True
            # bare reload unpins and jumps to latest
            code, body = self._post(url, {}, path="/reload")
            assert code == 200 and body["epoch"] == 6
            assert body["pinned"] is False
            # watcher follows again
            current["epoch"] = 7
            deadline = time.monotonic() + 15
            while time.monotonic() < deadline:
                if self._get(url, "/healthz")["epoch"] == 7:
                    break
                time.sleep(0.05)
            assert self._get(url, "/healthz")["epoch"] == 7
        finally:
            server.shutdown()
            server.server_close()

    def test_reloader_failure_is_500_not_400(self):
        """Server-side reload failures (wiring bugs, corrupt checkpoints)
        must surface as 500, not get blamed on the client as 400."""
        import threading

        from gan_codes_tpu.serve import make_http_server

        def bad_reloader(epoch=None):
            raise TypeError("wiring bug inside restore")

        server = make_http_server(make_sampler(batch_size=2), port=0,
                                  reloader=bad_reloader)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, body = self._post(url, {}, path="/reload")
            assert code == 500 and "TypeError" in body["error"]
            # but a malformed client epoch is still a 400
            code, body = self._post(url, {"epoch": "x"}, path="/reload")
            assert code == 400
        finally:
            server.shutdown()
            server.server_close()

    def test_stalled_client_bounded_by_handler_timeout(self):
        """A client that claims a large Content-Length and stalls must not
        pin a handler thread forever in the drain (and with non-daemon
        handler threads, block server_close): the per-socket timeout
        drops it, and shutdown completes promptly after."""
        import socket
        import threading
        import time

        from gan_codes_tpu.serve import make_http_server

        server = make_http_server(make_sampler(batch_size=2), port=0,
                                  handler_timeout=1.0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            s = socket.create_connection(
                ("127.0.0.1", server.server_address[1]))
            s.sendall(b"POST /nope HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: 1000000\r\n\r\nabc")  # then stall
            s.settimeout(15)
            t0 = time.monotonic()
            try:
                data = s.recv(65536)  # server must give up within ~1s
            except OSError:
                data = b""
            assert time.monotonic() - t0 < 8
            s.close()
        finally:
            server.shutdown()
            t0 = time.monotonic()
            server.server_close()  # joins handler threads: must be prompt
            assert time.monotonic() - t0 < 8

    def test_watch_validation(self):
        import pytest

        from gan_codes_tpu.serve import make_http_server

        s = make_sampler(batch_size=2)
        with pytest.raises(ValueError, match="watch_interval"):
            make_http_server(s, port=0, watch_interval=1.0)  # no reloader
        with pytest.raises(ValueError, match="watch_interval"):
            make_http_server(s, port=0, watch_interval=0.0,
                             reloader=lambda epoch=None: (None, 0),
                             latest_epoch_fn=lambda: 0)

    def test_coalescer_batches_concurrent_requests(self):
        """--coalesce-ms: concurrent 1-prompt requests ride ONE pipeline
        dispatch (each got a full padded batch before); every client gets
        its own slice (distinct noise rows)."""
        import base64
        import threading

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=4)
        calls = {"n": 0}
        real = sampler.generate_tokens

        def counting(caps, lens):
            calls["n"] += 1
            return real(caps, lens)

        sampler.generate_tokens = counting
        server = make_http_server(sampler, port=0, coalesce_window=1.0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            results = [None] * 4

            def post_one(i):
                results[i] = self._post(url, {"prompts": ["a red bird"]})

            threads = [threading.Thread(target=post_one, args=(i,))
                       for i in range(4)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(120)
            assert all(r is not None and r[0] == 200 for r in results)
            assert all(r[1]["count"] == 1 for r in results)
            # coalesced: 4 requests in at most 2 dispatches (1 on an idle
            # host; timing may split a straggler off on a loaded one)
            assert 1 <= calls["n"] <= 2
            # each client got its OWN slice: same caption, different noise
            imgs = [r[1]["images"][0] for r in results]
            assert len(set(imgs)) == 4
            m = self._get(url, "/metrics")
            assert m["coalesced_dispatches"] == calls["n"]
            assert m["generate_ok"] == 4 and m["images_total"] == 4
        finally:
            server.shutdown()
            server.server_close()
        # base64 sanity: responses decode
        base64.b64decode(imgs[0])

    def test_coalescer_error_propagates_to_all_waiters(self):
        import threading

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=4)

        def boom(caps, lens):
            raise RuntimeError("pipeline exploded")

        sampler.generate_tokens = boom
        server = make_http_server(sampler, port=0, coalesce_window=0.5)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            results = [None, None]

            def post_one(i):
                results[i] = self._post(url, {"prompts": ["a bird"]})

            threads = [threading.Thread(target=post_one, args=(i,))
                       for i in range(2)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(60)
            for r in results:
                assert r[0] == 400 and "pipeline exploded" in r[1]["error"]
        finally:
            server.shutdown()
            server.server_close()

    def test_coalescer_validation(self):
        import pytest

        from gan_codes_tpu.serve import RequestCoalescer

        with pytest.raises(ValueError, match="window_s"):
            RequestCoalescer(make_sampler(batch_size=2), None, 0.0)

    def test_reload_unavailable_without_reloader(self):
        import threading

        from gan_codes_tpu.serve import make_http_server

        server = make_http_server(make_sampler(batch_size=2), port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, body = self._post(url, {}, path="/reload")
            assert code == 400 and "reload not available" in body["error"]
        finally:
            server.shutdown()
            server.server_close()

    def test_close_joins_inflight_handlers(self):
        """server_close() must block until in-flight handlers finish
        (non-daemon handler threads) — the graceful-stop contract; the
        ThreadingHTTPServer default silently joins nothing."""
        import threading
        import time

        from gan_codes_tpu.serve import make_http_server

        sampler = make_sampler(batch_size=2)
        gate, entered = threading.Event(), threading.Event()
        real = sampler.generate_tokens

        def stub(caps, lens):  # the handler dispatch path (generate_tokens)
            entered.set()
            gate.wait(30)
            return real(caps, lens)

        sampler.generate_tokens = stub
        server = make_http_server(sampler, port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        first = {}

        def held():
            first["resp"] = self._post(url, {"prompts": ["a bird"]})

        t1 = threading.Thread(target=held)
        t1.start()
        assert entered.wait(30)
        server.shutdown()  # stop the accept loop; handler still running
        threading.Timer(0.5, gate.set).start()
        t0 = time.monotonic()
        server.server_close()  # must join the in-flight handler
        assert time.monotonic() - t0 >= 0.4
        t1.join(60)
        assert first["resp"][0] == 200  # ran to completion, not killed


class TestServeMain:
    def test_serve_main_end_to_end(self, tmp_path):
        """The batch-serving CLI surface: vocab from the dataset dir, torch
        text-encoder weights, generator restored from a gen_N checkpoint,
        N prompts -> N PNGs + grid through one compiled pipeline (bf16
        serving exercised; 3 prompts through a bs-2 pipeline exercises the
        padding path)."""
        import os

        import torch

        from gan_codes_tpu import serve
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        from gan_codes_tpu.generate import load_vocab
        from gan_codes_tpu.train.checkpoint import CheckpointManager
        from gan_codes_tpu.train.state import create_train_state

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=4, n_test=2, image_size=24)
        code2word, _ = load_vocab(root)
        cfg = GANConfig.for_image_size(16, vocab_size=len(code2word))

        emb, half = cfg.text_encoder.embed_dim, cfg.text_encoder.hidden_dim // 2
        g = torch.Generator().manual_seed(0)
        sd = {"encoder.weight": torch.randn(len(code2word), emb, generator=g)}
        for sfx in ("", "_reverse"):
            sd[f"rnn.weight_ih_l0{sfx}"] = torch.randn(4 * half, emb,
                                                       generator=g)
            sd[f"rnn.weight_hh_l0{sfx}"] = torch.randn(4 * half, half,
                                                       generator=g)
            sd[f"rnn.bias_ih_l0{sfx}"] = torch.randn(4 * half, generator=g)
            sd[f"rnn.bias_hh_l0{sfx}"] = torch.randn(4 * half, generator=g)
        pth = str(tmp_path / "text_encoder.pth")
        torch.save(sd, pth)

        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        weights = str(tmp_path / "weights")
        mgr = CheckpointManager(weights)
        mgr.save_generator(3, state)

        out = str(tmp_path / "served")
        paths = serve.main(root, pth, weights, out,
                           ["a red bird", "a blue bird", "small bird"],
                           image_size=16, batch_size=2, dtype="bfloat16",
                           use_ema=True)
        assert len(paths) == 3
        assert all(os.path.exists(p) for p in paths)
        assert os.path.exists(os.path.join(out, "serve_grid.png"))

    def test_build_sampler_reload_latest(self, tmp_path):
        """build_sampler's reload hook re-reads the weights dir: after the
        trainer writes a newer gen_N, reload_generator() returns it (the
        serving-dtype cast applied), and swap serves it."""
        import torch

        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        from gan_codes_tpu.generate import load_vocab
        from gan_codes_tpu.serve import build_sampler
        from gan_codes_tpu.train.checkpoint import CheckpointManager
        from gan_codes_tpu.train.state import create_train_state

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=4, n_test=2, image_size=24)
        code2word, _ = load_vocab(root)
        cfg = GANConfig.for_image_size(16, vocab_size=len(code2word))

        emb, half = cfg.text_encoder.embed_dim, cfg.text_encoder.hidden_dim // 2
        g = torch.Generator().manual_seed(0)
        sd = {"encoder.weight": torch.randn(len(code2word), emb, generator=g)}
        for sfx in ("", "_reverse"):
            sd[f"rnn.weight_ih_l0{sfx}"] = torch.randn(4 * half, emb,
                                                       generator=g)
            sd[f"rnn.weight_hh_l0{sfx}"] = torch.randn(4 * half, half,
                                                       generator=g)
            sd[f"rnn.bias_ih_l0{sfx}"] = torch.randn(4 * half, generator=g)
            sd[f"rnn.bias_hh_l0{sfx}"] = torch.randn(4 * half, generator=g)
        pth = str(tmp_path / "text_encoder.pth")
        torch.save(sd, pth)

        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        weights = str(tmp_path / "weights")
        mgr = CheckpointManager(weights)
        mgr.save_generator(3, state)

        sampler, epoch = build_sampler(root, pth, weights, image_size=16,
                                       batch_size=2, dtype="bfloat16")
        assert epoch == 3

        # the trainer advances: a newer gen_N lands in the same dir
        mgr.save_generator(5, state)

        new_params, new_epoch = sampler.reload_generator()
        assert new_epoch == 5
        import jax.numpy as jnp

        assert jax.tree.leaves(new_params)[0].dtype == jnp.bfloat16
        sampler.swap_generator_params(new_params)
        imgs = sampler.generate_prompts(["a red bird"])
        assert np.isfinite(imgs).all()

        # explicit epoch: restore the older weights again
        _, ep3 = sampler.reload_generator(epoch=3)
        assert ep3 == 3
        import pytest

        with pytest.raises(FileNotFoundError, match="gen_9"):
            sampler.reload_generator(epoch=9)

    def test_inference_mains_read_checkpoint_config(self, tmp_path):
        """`serve.main` / `generate.main` with no image size rebuild the
        model from the checkpoint's persisted config.json — a 16px-trained
        checkpoint must serve as-is, NOT fail restore against the 256px
        default's 7-block generator tree (regression: caught driving the
        CLI against a 32px training run)."""
        import os

        import torch

        from gan_codes_tpu import generate, serve
        from gan_codes_tpu.data.synthetic import make_synthetic_cub
        from gan_codes_tpu.generate import load_vocab
        from gan_codes_tpu.train.checkpoint import CheckpointManager
        from gan_codes_tpu.train.state import create_train_state

        root = str(tmp_path / "data")
        make_synthetic_cub(root, n_train=4, n_test=2, image_size=24)
        code2word, _ = load_vocab(root)
        cfg = GANConfig.for_image_size(16, vocab_size=len(code2word))

        emb, half = cfg.text_encoder.embed_dim, cfg.text_encoder.hidden_dim // 2
        g = torch.Generator().manual_seed(0)
        sd = {"encoder.weight": torch.randn(len(code2word), emb, generator=g)}
        for sfx in ("", "_reverse"):
            sd[f"rnn.weight_ih_l0{sfx}"] = torch.randn(4 * half, emb,
                                                       generator=g)
            sd[f"rnn.weight_hh_l0{sfx}"] = torch.randn(4 * half, half,
                                                       generator=g)
            sd[f"rnn.bias_ih_l0{sfx}"] = torch.randn(4 * half, generator=g)
            sd[f"rnn.bias_hh_l0{sfx}"] = torch.randn(4 * half, generator=g)
        pth = str(tmp_path / "text_encoder.pth")
        torch.save(sd, pth)

        state = jax.jit(lambda k: create_train_state(k, cfg))(KEY)
        weights = str(tmp_path / "weights")
        mgr = CheckpointManager(weights)
        # the real producer path: save() persists config.json + gen_N
        mgr.save(0, state, {"g_losses": [0.1]}, config=cfg)
        assert mgr.load_config() == cfg

        out = str(tmp_path / "served")
        paths = serve.main(root, pth, weights, out, ["a red bird"])
        assert len(paths) == 1
        img = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                         .open(paths[0]))
        assert img.shape[:2] == (16, 16)  # checkpoint's size, not 256

        p = generate.main(data_dir=root, encoder_weights_path=pth,
                          gen_weights_dir=weights,
                          image_save_path=str(tmp_path / "gen"),
                          prompt="a blue bird")
        assert p is not None and os.path.exists(p)


class TestSamplerDP:
    def test_mesh_sampler_matches_single_device(self):
        """Data-parallel serving (params replicated, batch sharded over the
        mesh's data axis) must produce the same images as the single-device
        pipeline — same host PRNG seed means identical noise, so any delta
        beyond reduction-order noise is a sharding bug."""
        from gan_codes_tpu.parallel import make_mesh

        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16,
                                      sentence_dim=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                              sentence_dim=16),
            text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                           hidden_dim=16, max_len=6),
        )
        g = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        word2code = {"<unk>": 1, "bird": 2, "red": 3}

        single = Sampler(cfg, g, te, word2code, batch_size=8, seed=3)
        dp = Sampler(cfg, g, te, word2code, batch_size=8, seed=3,
                     mesh=make_mesh())
        caps = np.tile(np.arange(1, 7, dtype=np.int32), (11, 1))  # 11 -> pad
        lens = np.full((11,), 6, np.int32)
        a = single.generate_tokens(caps, lens)
        b = dp.generate_tokens(caps, lens)
        assert a.shape == b.shape == (11, 16, 16, 3)
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_batch_not_divisible_by_mesh_raises(self):
        from gan_codes_tpu.parallel import make_mesh

        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16,
                                      sentence_dim=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                              sentence_dim=16),
            text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                           hidden_dim=16, max_len=6),
        )
        g = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        import pytest

        with pytest.raises(ValueError, match="divisible"):
            Sampler(cfg, g, te, batch_size=6, mesh=make_mesh())

    def test_dp_swap_matches_single_device(self):
        """Hot reload under DP serving: the swapped params must be
        re-placed with the replicated sharding, so a DP sampler serves
        the same images as a single-device one after the swap."""
        from gan_codes_tpu.parallel import make_mesh

        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16,
                                      sentence_dim=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                              sentence_dim=16),
            text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                           hidden_dim=16, max_len=6),
        )
        g = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
        g2 = jax.jit(lambda k: init_generator(k, cfg.generator))(
            jax.random.PRNGKey(9))
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)

        single = Sampler(cfg, g, te, batch_size=8, seed=3)
        dp = Sampler(cfg, g, te, batch_size=8, seed=3, mesh=make_mesh())
        single.swap_generator_params(g2)
        dp.swap_generator_params(g2)
        caps = np.tile(np.arange(1, 7, dtype=np.int32), (8, 1))
        lens = np.full((8,), 6, np.int32)
        a = single.generate_tokens(caps, lens)
        b = dp.generate_tokens(caps, lens)
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_dp_throughput_runs_sharded(self):
        """throughput() on a mesh Sampler must benchmark the sharded
        pipeline (review finding: an unsharded jit silently measured
        replicated compute)."""
        from gan_codes_tpu.parallel import make_mesh

        cfg = GANConfig(
            generator=GeneratorConfig(n_channels=4, image_size=16,
                                      sentence_dim=16),
            discriminator=DiscriminatorConfig(n_channels=4, image_size=16,
                                              sentence_dim=16),
            text_encoder=TextEncoderConfig(vocab_size=20, embed_dim=8,
                                           hidden_dim=16, max_len=6),
        )
        g = jax.jit(lambda k: init_generator(k, cfg.generator))(KEY)
        te = init_text_encoder(jax.random.PRNGKey(1), cfg.text_encoder)
        s = Sampler(cfg, g, te, batch_size=8, mesh=make_mesh())
        assert s.throughput(n_batches=2) > 0
