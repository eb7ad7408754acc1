"""Measure the resident serving path (prompt -> 256px image) on chip.

Covers the inference side of the framework the way bench.py covers
training: `serve.Sampler`'s compiled encode+generate pipeline (reference
serving story: one G forward per script run, `test_generate.py:21-84`;
here everything is resident and batched). Timing follows the relay rules
via Sampler.throughput (one scan-rolled dispatch, value-fetch sync).

Usage: python tools/serve_bench.py [--image-size 256] [--iters 20]
Prints one line per (dtype, batch) point and a JSON summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", default="8,64,128")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    a = ap.parse_args()

    from gan_codes_tpu.config import GANConfig
    from gan_codes_tpu.models.generator import init_generator
    from gan_codes_tpu.models.text_encoder import init_text_encoder
    from gan_codes_tpu.serve import Sampler

    cfg = GANConfig.for_image_size(a.image_size)
    kg, kt = jax.random.split(jax.random.PRNGKey(0))
    g32 = init_generator(kg, cfg.generator)
    te32 = init_text_encoder(kt, cfg.text_encoder)

    results = {}
    for dtype_name in a.dtypes.split(","):
        dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        cast = lambda tree: jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
        for bs in (int(b) for b in a.batches.split(",")):
            s = Sampler(cfg, cast(g32), cast(te32), batch_size=bs)
            ips = s.throughput(n_batches=a.iters)
            key = f"{dtype_name}_bs{bs}"
            results[key] = round(ips, 1)
            print(f"[serve_bench] {key}: {ips:.1f} img/s", flush=True)
    print(json.dumps({"image_size": a.image_size, "serve_img_per_sec": results}))


if __name__ == "__main__":
    main()
