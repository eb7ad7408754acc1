"""Push-button validation harness for the FID-parity north star.

This environment has neither real CUB data nor the reference's pretrained
weights (zero egress), so the north-star check — FID on CUB within +-2 of the
reference at matched steps — cannot run today. This tool makes it ONE COMMAND
the day the assets land, and self-proves the harness end-to-end on
schema-correct random weights right now:

  python tools/validate_pretrained.py --self-test
  python tools/validate_pretrained.py \
      --text-encoder /path/to/text_encoder.pth \
      --inception /path/to/inception_v3_torchvision_state_dict.pth \
      [--cub-dir /path/to/CUB_birds] [--n-images 64]

Validations (each prints its measured delta and PASS/FAIL):
  (a) Sentence embeddings: the JAX masked-scan biLSTM
      (`models/text_encoder.py`) vs torch's packed LSTM — the reference
      encoder semantics (`src/text_encoder/model.py:33-56`, loaded per
      `:58-63`) — at the REAL weights, on unsorted variable lengths.
  (b) FID: the JAX resident-InceptionV3 + scipy-Frechet pipeline
      (`eval/metrics.py::compute_fid`) vs the reference pipeline
      (`src/evaluation/metrics.py:62-118`) re-run in functional torch
      (tests/torch_ref.py oracle: the torchvision Inception3 graph) on the
      SAME image sets.
  (c) Inception Score likewise (`src/evaluation/metrics.py:7-60`, splits=1).

Images come from the real CUB test split when --cub-dir is given (the
reference's eval inputs), otherwise from a seeded synthetic set — either way
both frameworks see identical arrays, so the deltas isolate GRAPH numerics.

Exit code 0 iff every check passes. Finally prints the exact matched-steps
procedure for the +-2 FID comparison.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # torch_ref oracle

# Tolerances: cross-framework fp32 graph drift only (same weights, same
# inputs). FID tolerance is far inside the +-2 north-star budget.
TOL_SENT_ABS = 5e-4       # max |delta| on sentence embeddings
TOL_IS_REL = 0.01         # 1% relative on IS
TOL_FID_ABS = 0.5         # absolute on FID (plus 1% relative escape)

_RESULTS = []


def _check(name: str, ok: bool, detail: str) -> None:
    _RESULTS.append((name, bool(ok)))
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")


# ---------------------------------------------------------------------------
# (a) text encoder at real weights
# ---------------------------------------------------------------------------

def torch_sentence_embeddings(sd, captions: np.ndarray,
                              cap_lens: np.ndarray) -> np.ndarray:
    """Reference RNNEncoder forward in eval mode (dropout inactive), run
    functionally from the raw state_dict: Embedding -> pack_padded_sequence
    -> biLSTM -> final hidden transposed/reshaped (`model.py:33-56`)."""
    import torch
    import torch.nn.functional as F

    emb_w = sd["encoder.weight"]
    vocab, e_dim = emb_w.shape
    h_dim = sd["rnn.weight_hh_l0"].shape[1]
    bidir = "rnn.weight_ih_l0_reverse" in sd
    lstm = torch.nn.LSTM(e_dim, h_dim, 1, batch_first=True,
                         bidirectional=bidir)
    lstm.load_state_dict({k[len("rnn."):]: sd[k] for k in sd
                          if k.startswith("rnn.")})
    lstm.eval()
    with torch.no_grad():
        e = F.embedding(torch.from_numpy(captions.astype(np.int64)), emb_w)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            e, cap_lens.tolist(), batch_first=True, enforce_sorted=False)
        _, (h_n, _) = lstm(packed)
        sent = h_n.transpose(0, 1).contiguous().view(captions.shape[0], -1)
    return sent.numpy()


def validate_text_encoder(te_path: str, captions: np.ndarray,
                          cap_lens: np.ndarray) -> None:
    import torch

    from gan_codes_tpu.config import TextEncoderConfig
    from gan_codes_tpu.models.text_encoder import (convert_torch_state_dict,
                                                   text_encoder_apply)

    sd = torch.load(te_path, map_location="cpu", weights_only=True)
    vocab, e_dim = sd["encoder.weight"].shape
    h_dim = int(sd["rnn.weight_hh_l0"].shape[1])
    bidir = "rnn.weight_ih_l0_reverse" in sd
    cfg = TextEncoderConfig(vocab_size=int(vocab), embed_dim=int(e_dim),
                            hidden_dim=h_dim * (2 if bidir else 1),
                            max_len=int(captions.shape[1]),
                            bidirectional=bidir)
    captions = np.where(captions >= vocab, 0, captions)  # OOV -> <unk>=0

    import jax.numpy as jnp
    params = convert_torch_state_dict(sd, cfg)
    got = np.asarray(text_encoder_apply(params, cfg, jnp.asarray(captions),
                                        jnp.asarray(cap_lens)))
    want = torch_sentence_embeddings(sd, captions, cap_lens)
    delta = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want)) + 1e-12)
    _check("sentence embeddings (JAX masked-scan vs torch packed LSTM)",
           delta < max(TOL_SENT_ABS, 1e-4 * scale),
           f"max|delta|={delta:.3e} over {captions.shape[0]} unsorted-length "
           f"captions (scale {scale:.3f}, tol {TOL_SENT_ABS})")


# ---------------------------------------------------------------------------
# (b)+(c) IS / FID at real inception weights
# ---------------------------------------------------------------------------

def torch_is_fid(sd, fake: np.ndarray, real: np.ndarray,
                 batch_size: int = 8) -> tuple:
    """The reference eval pipeline (`src/evaluation/metrics.py:7-118`) in
    functional torch: [-1,1] -> [0,1] clamp -> bilinear 299 upsample ->
    Inception3; IS from clamp(+-50)->softmax->KL (splits=1), FID from pool3
    (mu, cov) + scipy sqrtm Frechet. Inputs NHWC to match the JAX side."""
    import torch
    import torch.nn.functional as F
    from scipy import linalg

    import torch_ref

    def batches(x):
        x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).astype(np.float32))
        x = torch.clamp((x + 1.0) / 2.0, 0.0, 1.0)
        for i in range(0, x.shape[0], batch_size):
            chunk = x[i:i + batch_size]
            yield F.interpolate(chunk, size=(299, 299), mode="bilinear",
                                align_corners=False)

    with torch.no_grad():
        preds = torch.cat([
            torch.softmax(torch.clamp(torch_ref.inception_v3_logits(sd, b),
                                      -50.0, 50.0), dim=1)
            for b in batches(fake)]).numpy()
        acts = {name: torch.cat([torch_ref.inception_v3_pool_features(sd, b)
                                 for b in batches(x)]).double().numpy()
                for name, x in (("fake", fake), ("real", real))}

    py = preds.mean(axis=0) + 1e-10
    kl = np.sum((preds + 1e-10) * (np.log(preds + 1e-10) - np.log(py)), axis=1)
    is_score = float(np.exp(np.mean(kl)))

    mu = {k: a.mean(axis=0) for k, a in acts.items()}
    sig = {k: np.cov(a, rowvar=False) for k, a in acts.items()}
    covmean, _ = linalg.sqrtm(sig["real"] @ sig["fake"], disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu["real"] - mu["fake"]
    fid = float(diff @ diff + np.trace(sig["real"]) + np.trace(sig["fake"])
                - 2.0 * np.trace(covmean))
    return is_score, fid


def validate_metrics(inception_path: str, fake: np.ndarray,
                     real: np.ndarray) -> None:
    import torch

    import jax.numpy as jnp
    from gan_codes_tpu.eval.metrics import compute_fid, compute_inception_score
    from gan_codes_tpu.models.inception import convert_torch_inception_state_dict

    sd = torch.load(inception_path, map_location="cpu", weights_only=True)
    sd = {k: v for k, v in sd.items()
          if "AuxLogits" not in k and "num_batches_tracked" not in k}
    params = convert_torch_inception_state_dict(sd)

    is_jax = compute_inception_score(params, jnp.asarray(fake), batch_size=8,
                                     splits=1)
    fid_jax = compute_fid(params, jnp.asarray(real), jnp.asarray(fake),
                          batch_size=8)
    is_ref, fid_ref = torch_is_fid(sd, fake, real)

    d_is = abs(is_jax - is_ref)
    _check("Inception Score (JAX pipeline vs reference-in-torch)",
           d_is <= TOL_IS_REL * max(is_ref, 1.0),
           f"jax={is_jax:.5f} ref={is_ref:.5f} |delta|={d_is:.3e} "
           f"(tol {TOL_IS_REL * 100:.0f}%)")
    d_fid = abs(fid_jax - fid_ref)
    _check("FID (JAX pipeline vs reference-in-torch)",
           d_fid <= max(TOL_FID_ABS, 0.01 * abs(fid_ref)),
           f"jax={fid_jax:.5f} ref={fid_ref:.5f} |delta|={d_fid:.3e} "
           f"(tol {TOL_FID_ABS} abs / 1% rel) — north-star budget is +-2")


# ---------------------------------------------------------------------------
# input assembly
# ---------------------------------------------------------------------------

def validate_weights_dir(weights_dir: str, n: int = 4) -> None:
    """Migration sanity check for a framework weights dir: export the
    generator to a reference-format torch state_dict and assert our
    forward matches the reference semantics (torch_ref raw-state_dict
    forward — no layout conversion on the torch leg) at the ACTUAL
    trained weights, not just the random-weight test fixtures."""
    import jax
    import torch
    import torch_ref

    from gan_codes_tpu.models.generator import generator_apply
    from gan_codes_tpu.models.torch_import import (
        export_generator_state_dict)
    from gan_codes_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(weights_dir)
    cfg = mgr.load_config()
    if cfg is None:
        _check("weights-dir export/forward parity", False,
               f"{weights_dir}/config.json missing")
        return
    try:
        tree, epoch = mgr.restore_generator_tree(cfg.generator)
    except FileNotFoundError as e:
        _check("weights-dir export/forward parity", False, str(e))
        return
    sd = export_generator_state_dict(tree["g_params"])

    g = np.random.default_rng(0)
    noise = g.standard_normal((n, cfg.generator.latent_dim),
                              dtype=np.float32)
    sent = g.standard_normal((n, cfg.generator.sentence_dim),
                             dtype=np.float32)
    want = torch_ref.sd_generator_forward(
        sd, cfg.generator, torch.from_numpy(noise), torch.from_numpy(sent))
    got = np.asarray(jax.device_get(generator_apply(
        tree["g_params"], cfg.generator, noise, sent)))
    delta = float(np.abs(got - want.permute(0, 2, 3, 1).numpy()).max())
    _check("weights-dir export/forward parity",
           delta < 5e-4,
           f"epoch-{epoch} gen ({cfg.generator.image_size}px) vs reference "
           f"semantics on the exported state_dict: max|delta|={delta:.3e} "
           f"(tol 5e-4)")


def load_cub_inputs(cub_dir: str, n_images: int):
    """Real CUB test-split images (reference eval inputs: bbox crop, center
    76/64 resize, [-1,1]) + their captions."""
    from gan_codes_tpu.config import DataConfig
    from gan_codes_tpu.data import CUBDataset, DataLoader

    ds = CUBDataset(DataConfig(data_dir=cub_dir, image_size=256), "test",
                    augment=False)
    loader = DataLoader(ds, batch_size=n_images, shuffle=False,
                        drop_last=False)
    batch = next(iter(loader))
    images = batch["images"].astype(np.float32)
    if images.max() > 1.5:  # uint8 payload
        images = images / 127.5 - 1.0
    return (images[:n_images], batch["captions"][:n_images],
            batch["cap_lens"][:n_images])


def synthetic_inputs(n_images: int, vocab: int, max_len: int = 18):
    rng = np.random.RandomState(123321)
    images = rng.uniform(-1, 1, (n_images, 64, 64, 3)).astype(np.float32)
    lens = rng.randint(1, max_len + 1, size=n_images).astype(np.int32)
    caps = rng.randint(1, vocab, size=(n_images, max_len)).astype(np.int32)
    for i, l in enumerate(lens):
        caps[i, l:] = 0
    return images, caps, lens


def make_self_test_assets(out_dir: str) -> tuple:
    """Schema-correct RANDOM weights in the exact on-disk formats the real
    assets use, so --self-test exercises every load/convert path."""
    import torch

    import torch_ref

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(0)
    emb = torch.nn.Embedding(200, 300)
    lstm = torch.nn.LSTM(300, 128, 1, batch_first=True, bidirectional=True)
    te_sd = {"encoder.weight": emb.weight.detach()}
    te_sd.update({f"rnn.{k}": v.detach()
                  for k, v in lstm.named_parameters()})
    te_path = os.path.join(out_dir, "text_encoder.pth")
    torch.save(te_sd, te_path)

    inc_path = os.path.join(out_dir, "inception_v3.pth")
    torch.save(torch_ref.random_inception_state_dict(seed=1), inc_path)
    return te_path, inc_path


def print_north_star_procedure(args) -> None:
    print("""
================== FID-parity north star: matched-steps run ==================
With real assets in hand (all graph-level checks above green), the +-2 FID
comparison at matched steps is:

1. Reference leg (GPU/CPU, pytorch): run `src/train.py` with its shipped
   hyperparameters (256px, bs 24, seed 123321, 600 epochs) pointing at the
   CUB dir + pretrained DAMSM text_encoder.pth; it logs per-epoch FID.
2. This framework, SAME operating point:
     python -m gan_codes_tpu.train_entry --data <CUB_DIR> \\
         --text-encoder <text_encoder.pth> --inception <inception_v3.pth> \\
         --image-size 256 --batch-size 24 --epochs 600 --seed 123321 \\
         --images out/images --weights out/weights
   (fp32 defaults replicate the reference math; identical text-encoder and
   inception weights make the conditioning and the metric identical.)
3. Compare fid_scores at equal epoch indices (both eval on the first 32 test
   batches per epoch): |FID_tpu - FID_ref| must stay within +-2 once both
   runs are past early-training noise. Histories live in
   out/weights/histories.json and metrics_log.jsonl (this repo) and the
   reference's checkpoint.pt histories.
==============================================================================""")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--text-encoder", help="pretrained DAMSM text_encoder.pth")
    ap.add_argument("--inception",
                    help="torchvision inception_v3 state_dict (.pth)")
    ap.add_argument("--cub-dir", help="real CUB data dir (optional)")
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--self-test", action="store_true",
                    help="prove the harness on schema-correct random weights")
    ap.add_argument("--check-weights", metavar="WEIGHTS_DIR",
                    help="migration sanity check: export WEIGHTS_DIR's "
                         "generator to a reference torch state_dict and "
                         "assert forward parity at the trained weights")
    ap.add_argument("--keep-platform", action="store_true",
                    help="run JAX on the default backend instead of forcing "
                    "CPU (cross-framework deltas then include TPU-vs-CPU "
                    "float drift)")
    args = ap.parse_args()

    import jax

    if not args.keep_platform:
        # oracle comparisons are defined on CPU fp32 (tests/conftest.py
        # convention); axon's sitecustomize ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.check_weights:
        validate_weights_dir(args.check_weights)
        if not (args.text_encoder or args.inception or args.self_test):
            failed = [n for n, ok in _RESULTS if not ok]
            print(f"\n{len(_RESULTS) - len(failed)}/{len(_RESULTS)} checks "
                  f"passed" + (f"; FAILED: {failed}" if failed else ""))
            return 1 if failed else 0

    if args.self_test:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="validate_pretrained_")
        print(f"--self-test: writing schema-correct random assets to {tmp}")
        args.text_encoder, args.inception = make_self_test_assets(tmp)
    if not args.text_encoder or not args.inception:
        ap.error("--text-encoder and --inception are required "
                 "(or --self-test / --check-weights)")

    import torch

    te_sd = torch.load(args.text_encoder, map_location="cpu",
                       weights_only=True)
    vocab = int(te_sd["encoder.weight"].shape[0])
    if args.cub_dir:
        images, caps, lens = load_cub_inputs(args.cub_dir, args.n_images)
        print(f"Inputs: {images.shape[0]} real CUB test images + captions")
    else:
        images, caps, lens = synthetic_inputs(args.n_images, vocab)
        print(f"Inputs: {images.shape[0]} seeded synthetic images + captions "
              "(pass --cub-dir to use real eval inputs)")

    validate_text_encoder(args.text_encoder, caps, lens)
    # fake/real split: disjoint halves of the set (content is irrelevant to
    # the graph-parity question; both frameworks see the same arrays)
    half = images.shape[0] // 2
    validate_metrics(args.inception, images[:half], images[half:])

    failed = [n for n, ok in _RESULTS if not ok]
    print(f"\n{len(_RESULTS) - len(failed)}/{len(_RESULTS)} checks passed"
          + (f"; FAILED: {failed}" if failed else " — eval graph is "
             "numerically interchangeable with the reference's."))
    if not failed:
        print_north_star_procedure(args)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
