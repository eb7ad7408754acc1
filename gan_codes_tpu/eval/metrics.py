"""Inception Score + FID, on-device.

Capability parity with `src/evaluation/metrics.py:7-118`, with the
inefficiencies fixed:
  * one resident, jitted InceptionV3 instead of re-instantiating torchvision's
    model twice per epoch (`metrics.py:12,67`);
  * fake/real images never leave the device until the final statistics;
  * the same numerical-safety semantics (NaN scrub of inputs, logit clamp
    +-50, epsilon'd log in IS, IS -> 1.0 / FID -> inf on failure).

FID's matrix square root uses scipy's exact `sqrtm` on host by default (the
reference's path, `metrics.py:108`), with an on-device Newton-Schulz
alternative (`sqrtm_trace_newton_schulz`) for fully host-free eval.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import inception as inception_lib

INCEPTION_SIZE = 299


def _preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] NHWC any-size -> [0,1] 299x299 (reference `metrics.py:26-28`)."""
    images = jnp.nan_to_num(images, nan=0.0, posinf=1.0, neginf=-1.0)
    images = jnp.clip((images + 1.0) / 2.0, 0.0, 1.0)
    b = images.shape[0]
    return jax.image.resize(
        images, (b, INCEPTION_SIZE, INCEPTION_SIZE, images.shape[-1]),
        method="bilinear")


@functools.partial(jax.jit, static_argnames=())
def _logits_batch(params, images):
    x = _preprocess(images)
    logits = inception_lib.inception_logits(params, x)
    logits = jnp.clip(logits, -50.0, 50.0)  # reference `metrics.py:33`
    return jax.nn.softmax(logits, axis=1)


@functools.partial(jax.jit, static_argnames=())
def _features_batch(params, images):
    x = _preprocess(images)
    return inception_lib.inception_features(params, x)


@functools.partial(jax.jit, static_argnames=("fn",))
def _scan_batches(fn, params, batches):
    """lax.scan fn over [n_batches, bs, ...]: ONE dispatch for the whole set
    (a Python loop of dispatches pays a host round trip per batch)."""
    def body(_, chunk):
        return None, fn(params, chunk)
    _, outs = jax.lax.scan(body, None, batches)
    return outs


def _batched(fn: Callable, params, images: jnp.ndarray,
             batch_size: int) -> np.ndarray:
    """Run fn over fixed-size batches (tail padded so XLA compiles once)."""
    n = images.shape[0]
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    if pad:
        images = jnp.concatenate(
            [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
    batches = images.reshape((n_batches, batch_size) + images.shape[1:])
    outs = np.asarray(_scan_batches(fn, params, batches))
    return outs.reshape((n_batches * batch_size,) + outs.shape[2:])[:n]


def compute_inception_score(inception_params, images: jnp.ndarray,
                            batch_size: int = 8, splits: int = 1) -> float:
    """IS over [-1,1] NHWC images (reference `metrics.py:7-60`)."""
    try:
        n = images.shape[0]
        preds = _batched(_logits_batch, inception_params, images, batch_size)
        preds = np.nan_to_num(preds, nan=1.0 / 1000, posinf=1.0 / 1000,
                              neginf=1.0 / 1000)
        split_scores = []
        for k in range(splits):
            part = preds[k * (n // splits): (k + 1) * (n // splits)]
            py = np.mean(part, axis=0) + 1e-10
            kl = np.sum((part + 1e-10) * (np.log(part + 1e-10) - np.log(py)),
                        axis=1)
            split_scores.append(np.exp(np.mean(kl)))
        return float(np.mean(split_scores))
    except Exception as e:  # reference returns baseline 1.0 on failure
        print(f"Error in IS calculation: {e}")
        return 1.0


def sqrtm_trace_newton_schulz(a: jnp.ndarray, num_iters: int = 50) -> jnp.ndarray:
    """trace(sqrtm(A)) via Newton-Schulz iteration, fully on device.

    A must be (numerically) PSD; float64 recommended. Avoids the host
    round-trip of scipy.linalg.sqrtm for the FID cross term.
    """
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    y = a / norm
    eye = jnp.eye(dim, dtype=a.dtype)
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return jnp.trace(y) * jnp.sqrt(norm)


def sqrtm_trace_lowrank(acts1: np.ndarray, acts2: np.ndarray) -> float:
    """EXACT trace(sqrtm(sigma1 @ sigma2)) via the Gram trick when the
    covariances are sample-rank-deficient (n_i samples << 2048 features —
    every realistic per-epoch eval, incl. the reference's 768-sample
    protocol, `model.py:251`).

    `acts_i` are CENTERED activations scaled by 1/sqrt(n_i - 1) (rows =
    samples), so sigma_i = acts_iᵀ @ acts_i. The nonzero eigenvalues of
    sigma1 @ sigma2 equal those of C @ Cᵀ with C = acts1 @ acts2ᵀ — an
    n1 x n1 symmetric PSD matrix — so the cross term is a tiny eigvalsh
    instead of a 2048² matrix square root (measured 70s in scipy on a
    1-core host; this path is milliseconds and agrees to ~1e-6)."""
    c = acts1 @ acts2.T
    g = c @ c.T if c.shape[0] <= c.shape[1] else c.T @ c
    w = np.linalg.eigvalsh(g)
    return float(np.sqrt(np.clip(w, 0.0, None)).sum())


def _frechet_distance(mu1, sigma1, mu2, sigma2,
                      use_scipy: bool = True) -> float:
    diff = mu1 - mu2
    if use_scipy:
        from scipy import linalg

        covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_covmean = np.trace(covmean)
    else:
        if jax.default_backend() == "cpu":
            # float64 genuinely enabled for this path (without the context
            # the jnp.float64 request silently truncates to fp32 and the
            # iteration loses precision against scipy)
            with jax.enable_x64():
                tr_covmean = float(sqrtm_trace_newton_schulz(
                    jnp.asarray(sigma1 @ sigma2, jnp.float64)))
        else:
            # TPU has no hardware f64 — run the iteration fp32 with more
            # steps (documented rtol ~2e-2 vs scipy in test_metrics.py::
            # TestSqrtm; the same estimator on both sides of any A/B).
            # This keeps per-epoch FID fully on device: scipy's exact
            # sqrtm costs ~70s/epoch on a 1-core host (measured 2026-08-20)
            # vs milliseconds here.
            tr_covmean = float(sqrtm_trace_newton_schulz(
                jnp.asarray(sigma1 @ sigma2, jnp.float32), num_iters=100))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


def activation_stats(inception_params, images: jnp.ndarray,
                     batch_size: int = 8, return_acts: bool = False):
    """(mu, sigma[, acts]) of pool3 activations over a [-1,1] NHWC set.

    Exposed so callers with a FIXED comparison set (the deterministic test
    split in per-epoch eval) can compute the real-side stats once and pass
    them to compute_fid(real_stats=...) — halves per-epoch FID cost with
    identical results. `return_acts=True` additionally returns the
    centered activations scaled by 1/sqrt(n-1) (so sigma == actsᵀ@acts),
    unlocking compute_fid's exact low-rank cross-term path."""
    act = _batched(_features_batch, inception_params, images,
                   batch_size).astype(np.float64)
    if np.isnan(act).any():
        raise FloatingPointError("activations contain NaN values")
    if act.shape[0] < 2:
        # covariance (ddof=1) is undefined for a single sample; raise the
        # error compute_fid maps to the reference inf sentinel (same guard
        # the multi-host moments path applies explicitly) instead of
        # letting a 0/0 NaN masquerade as a score downstream
        raise FloatingPointError(
            f"FID statistics need >=2 samples, got {act.shape[0]}")
    mu = act.mean(axis=0)
    centered = (act - mu) / np.sqrt(float(act.shape[0] - 1))
    sigma = centered.T @ centered  # == np.cov(act, rowvar=False), ddof=1
    if return_acts:
        return mu, sigma, centered
    return mu, sigma


def compute_fid(inception_params, real_images: Optional[jnp.ndarray],
                fake_images: jnp.ndarray, batch_size: int = 8,
                use_scipy_sqrtm: bool = True,
                real_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None
                ) -> float:
    """FID over [-1,1] NHWC image sets (reference `metrics.py:62-118`).

    `real_stats`: precomputed (mu, sigma) or (mu, sigma, acts) for the real
    side (from activation_stats); when given, `real_images` may be None.

    Cross-term backends, chosen per call: when BOTH sides carry their
    centered activations and the smaller side has fewer samples than
    features, the exact low-rank Gram path (`sqrtm_trace_lowrank`) runs —
    identical math to scipy's sqrtm at ~1e-6, milliseconds instead of ~70s
    host time. Otherwise `use_scipy_sqrtm` picks scipy (reference path,
    `src/evaluation/metrics.py:108`) or on-device Newton-Schulz."""
    try:
        if real_stats is None:
            real_stats = activation_stats(inception_params, real_images,
                                          batch_size, return_acts=True)
        mu1, sigma1, *rest = real_stats
        acts1 = rest[0] if rest else None
        mu2, sigma2, acts2 = activation_stats(inception_params, fake_images,
                                              batch_size, return_acts=True)
        if (acts1 is not None
                and min(acts1.shape[0], acts2.shape[0]) <= mu1.shape[0]):
            diff = mu1 - mu2
            tr_covmean = sqrtm_trace_lowrank(acts1, acts2)
            return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                         - 2.0 * tr_covmean)
        return _frechet_distance(mu1, sigma1, mu2, sigma2, use_scipy_sqrtm)
    except FloatingPointError:
        print("Warning: Activations contain NaN values")
        return float("inf")
    except Exception as e:
        print(f"Error in FID calculation: {e}")
        return float("inf")


# ---------------------------------------------------------------------------
# Cross-host (multi-process DP) evaluation via sufficient statistics.
#
# Under multi-host DP each process holds only its 1/N shard of the eval set.
# IS (splits=1, the reference's operating point, `model.py:95`) and FID are
# both functions of per-sample sums, so each host computes local MOMENTS,
# the moments are summed across processes, and every host derives the SAME
# score over the FULL eval set — numerically the single-host semantics of
# reference `src/deep_fusion_gan/model.py:239-280`.
#
# Distributed hygiene: nothing raises between a host computing its moments
# and the collective reduction (a one-host exception would desync the
# allgather and hang the other hosts); NaN presence travels as a reduced
# flag and is decided identically everywhere afterwards.
# ---------------------------------------------------------------------------

def activation_moments(inception_params, images: jnp.ndarray,
                       batch_size: int = 8) -> dict:
    """Summable pool3-activation statistics of a LOCAL image shard:
    {sum [2048], outer [2048,2048], n, nan}. Sum across hosts, then
    `stats_from_moments` recovers exactly `activation_stats`'s (mu, sigma)
    over the union of the shards."""
    act = _batched(_features_batch, inception_params, images,
                   batch_size).astype(np.float64)
    nan = np.float64(np.isnan(act).any())
    act = np.nan_to_num(act)  # keep the collective payload finite
    return {"sum": act.sum(axis=0), "outer": act.T @ act,
            "n": np.float64(act.shape[0]), "nan": nan}


def stats_from_moments(m: dict) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) from summed activation moments; matches np.cov's ddof=1
    normalization used by `activation_stats`."""
    n = m["n"]
    mu = m["sum"] / n
    sigma = (m["outer"] - n * np.outer(mu, mu)) / (n - 1.0)
    return mu, sigma


def is_moments(inception_params, images: jnp.ndarray,
               batch_size: int = 8) -> dict:
    """Summable Inception-Score statistics of a LOCAL shard (splits=1):
    {sum_p [n_classes], sum_plogp, n}. With py = sum_p/n + eps the global
    mean KL is sum_plogp/n - sum(py*log(py)) — algebraically identical to
    `compute_inception_score`'s per-sample KL mean (same 1e-10 epsilons)."""
    preds = _batched(_logits_batch, inception_params, images, batch_size)
    preds = np.nan_to_num(preds, nan=1.0 / 1000, posinf=1.0 / 1000,
                          neginf=1.0 / 1000).astype(np.float64)
    sum_plogp = np.sum((preds + 1e-10) * np.log(preds + 1e-10))
    return {"sum_p": preds.sum(axis=0), "sum_plogp": np.float64(sum_plogp),
            "n": np.float64(preds.shape[0])}


def is_from_moments(m: dict) -> float:
    try:
        if m["n"] < 1:
            # 0/0 below would be a numpy RuntimeWarning producing NaN, not an
            # exception — force the reference failure sentinel instead.
            raise ValueError("empty eval union (n=0 across all shards)")
        py = m["sum_p"] / m["n"] + 1e-10
        mean_kl = m["sum_plogp"] / m["n"] - np.sum(py * np.log(py))
        return float(np.exp(mean_kl))
    except Exception as e:  # reference failure sentinel (`metrics.py:58-60`)
        print(f"Error in IS calculation: {e}")
        return 1.0


def allreduce_moments(tree):
    """Sum every moment leaf across JAX processes. Collective: every process
    must call it with the same tree structure. fp64 fidelity requires the
    x64 context (without it the gather silently truncates to fp32 and the
    outer-product sums lose the precision FID needs).

    TPU backends have no native f64 — a device-side f64 gather may be
    silently demoted — so there the leaves travel as hi/lo f32 pairs
    (two-float split: hi = f32(x), lo = f32(x - hi) carries the bits hi
    dropped) and are recombined in f64 on the host. Validated against the
    f64 path in tests/test_metrics.py."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    if jax.default_backend() == "tpu":
        leaves, treedef = jax.tree.flatten(tree)
        f64 = [np.asarray(x, np.float64) for x in leaves]
        hi = [x.astype(np.float32) for x in f64]
        lo = [(x - h.astype(np.float64)).astype(np.float32)
              for x, h in zip(f64, hi)]
        g = multihost_utils.process_allgather({"hi": hi, "lo": lo})
        summed = [np.asarray(h, np.float64).sum(axis=0)
                  + np.asarray(l, np.float64).sum(axis=0)
                  for h, l in zip(g["hi"], g["lo"])]
        return jax.tree.unflatten(treedef, summed)

    with jax.enable_x64():
        stacked = multihost_utils.process_allgather(tree)
    return jax.tree.map(lambda x: np.asarray(x).sum(axis=0), stacked)


def compute_is_fid_multihost(
        inception_params, fake_images: jnp.ndarray,
        real_images: Optional[jnp.ndarray] = None,
        real_moments: Optional[dict] = None,
        batch_size: int = 8,
        use_scipy_sqrtm: bool = True) -> Tuple[float, float]:
    """IS + FID over eval shards distributed across processes.

    `fake_images` / `real_images` are this process's LOCAL shards; the
    returned scores cover the union across all processes and are identical
    on every process. Pass `real_moments` (from `activation_moments`, local)
    to reuse the cached real side; all processes must make the same choice.
    """
    local = {"fake_is": is_moments(inception_params, fake_images, batch_size),
             "fake_act": activation_moments(inception_params, fake_images,
                                            batch_size)}
    if real_moments is None:
        real_moments = activation_moments(inception_params, real_images,
                                          batch_size)
    local["real_act"] = real_moments
    reduced = allreduce_moments(local)

    is_score = is_from_moments(reduced["fake_is"])
    try:
        if reduced["fake_act"]["nan"] > 0 or reduced["real_act"]["nan"] > 0:
            raise FloatingPointError("activations contain NaN values")
        if reduced["fake_act"]["n"] < 2 or reduced["real_act"]["n"] < 2:
            # stats_from_moments divides by n-1; n in {0,1} would emit NaN/inf
            # covariances via numpy warnings instead of tripping the sentinel.
            raise ValueError("FID needs >=2 samples per side across shards")
        mu1, sigma1 = stats_from_moments(reduced["real_act"])
        mu2, sigma2 = stats_from_moments(reduced["fake_act"])
        fid = _frechet_distance(mu1, sigma1, mu2, sigma2,
                                use_scipy=use_scipy_sqrtm)
    except FloatingPointError:
        print("Warning: Activations contain NaN values")
        fid = float("inf")
    except Exception as e:
        print(f"Error in FID calculation: {e}")
        fid = float("inf")
    return is_score, fid


def compute_is_fid(inception_params, fake_images: jnp.ndarray,
                   real_images: Optional[jnp.ndarray],
                   batch_size: int = 8, splits: int = 1,
                   real_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                   use_scipy_sqrtm: bool = True) -> Tuple[float, float]:
    """Reference `compute_is_fid` pairing (`deep_fusion_gan/model.py:91-97`)."""
    is_score = compute_inception_score(inception_params, fake_images,
                                       batch_size, splits)
    fid = compute_fid(inception_params, real_images, fake_images, batch_size,
                      real_stats=real_stats,
                      use_scipy_sqrtm=use_scipy_sqrtm)
    return is_score, fid
