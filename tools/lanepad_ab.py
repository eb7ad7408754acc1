"""A/B DiscriminatorConfig.lane_pad on the full train step (VERDICT r4 #3).

The post-fold device trace (artifacts/trace_r3_postfold/WALL.md) puts 50.4%
of the bf16-bs128 step (112.9 ms) in convs whose minor/lane dim is 32 or 64,
running at ~64 TF/s vs ~164 for full-width convs in the SAME program.
lane_pad zero-pads D's narrow conv channels to >= N MXU lanes at trace time
(exact math — pinned by tests/test_parity.py::TestLanePad).

Roofline expectation: a 64-lane conv padded to 128 does 2x the FLOPs at the
full-width rate — 2/164 vs 1/64.3 time-per-useful-TFLOP, ~22% faster IF the
padded conv reaches the full-width rate and HBM traffic (2x activations on
those layers) doesn't bite first. A 32-lane conv padded to 128 does 4x the
FLOPs — likely a LOSS (4/164 > 1/64.3); pad 64 only widens the 32-lane
layers to 64, a separate point on the curve. Hence three arms per operating
point: 0 (baseline), 64, 128.

Timing per CLAUDE.md relay rules via bench.bench_step (one scan-rolled
dispatch, value-fetch sync). Usage: python tools/lanepad_ab.py [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pads", default="0,64,128,128:64",
                    help="comma list of pad[:min_ch] arms; 128:64 pads only "
                         "layers with real Cout >= 64 up to 128 lanes")
    ap.add_argument("--towers", default="d,gd",
                    help="comma list per arm: d = D only, g = G only, "
                         "gd = both towers padded")
    ap.add_argument("--points", default="bf16_bs128,fp32_bs24",
                    help="comma list of operating points to sweep")
    a = ap.parse_args()

    import bench

    # Share bench.py's persistent compile cache (same env var / default dir
    # / opt-out, via the one shared helper): arms that are also bench
    # candidates pre-warm the driver's bench. Fail-soft: never lose a sweep.
    from gan_codes_tpu.utils.compile_cache import enable_bench_cache
    enable_bench_cache(lambda m: print(f"[lanepad_ab] {m}", flush=True))

    points = {
        # headline point: bf16 bs128, bf16 GP, scoped-VMEM hint
        "bf16_bs128": dict(compute_dtype="bfloat16", batch=128,
                           gp_dtype="bfloat16", xla_vmem_kib=65536),
        # the reference operating point (narrow convs are a larger share)
        "fp32_bs24": dict(compute_dtype="float32", batch=24,
                          gp_dtype="float32"),
    }

    results = {}
    for point in a.points.split(","):
        kw = points[point]
        # image-boundary padding arms (TrainConfig.image_pad +
        # GeneratorConfig.image_pad): RGB's 3 channels fill 3/128 output
        # lanes in the grad-to-image convs and 27/128 reduction rows in the
        # stem — a separate exact-math axis from conv lane widening.
        for ip in (16, 32):
            label = f"{point}_imgpad{ip}"
            try:
                ips = bench.bench_step(
                    iters=a.iters,
                    generator_overrides={"image_pad": ip},
                    train_overrides={"image_pad": ip},
                    **kw)
                results[label] = round(ips, 2)
                print(f"[lanepad_ab] {label}: {ips:.2f} img/s", flush=True)
            except Exception as e:
                print(f"[lanepad_ab] {label} FAILED: {e}", flush=True)
                results[label] = None
        for arm in a.pads.split(","):
            pad, _, min_ch = arm.partition(":")
            pad, min_ch = int(pad), int(min_ch or 0)
            over = {"lane_pad": pad, "lane_pad_min_ch": min_ch}
            towers = ("-",) if pad == 0 else a.towers.split(",")
            for tw in towers:
                label = (f"{point}_pad{pad}"
                         + (f"min{min_ch}" if min_ch else "")
                         + (f"_{tw}" if pad else ""))
                try:
                    ips = bench.bench_step(
                        iters=a.iters,
                        discriminator_overrides=(
                            over if pad and "d" in tw else None),
                        generator_overrides=(
                            over if pad and "g" in tw else None),
                        **kw)
                    results[label] = round(ips, 2)
                    print(f"[lanepad_ab] {label}: {ips:.2f} img/s",
                          flush=True)
                except Exception as e:
                    print(f"[lanepad_ab] {label} FAILED: {e}", flush=True)
                    results[label] = None
        # combined arm: image-boundary padding + the roofline-preferred
        # lane-widening point, in case the axes compose
        label = f"{point}_imgpad16_pad128min64_gd"
        try:
            ips = bench.bench_step(
                iters=a.iters,
                generator_overrides={"image_pad": 16, "lane_pad": 128,
                                     "lane_pad_min_ch": 64},
                discriminator_overrides={"lane_pad": 128,
                                         "lane_pad_min_ch": 64},
                train_overrides={"image_pad": 16},
                **kw)
            results[label] = round(ips, 2)
            print(f"[lanepad_ab] {label}: {ips:.2f} img/s", flush=True)
        except Exception as e:
            print(f"[lanepad_ab] {label} FAILED: {e}", flush=True)
            results[label] = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
