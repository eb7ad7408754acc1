"""InceptionV3 feature extractor in JAX for on-device IS/FID.

Replaces the reference's per-epoch re-instantiation of torchvision's
inception_v3 (`src/evaluation/metrics.py:12,67` — loaded from scratch TWICE
per epoch); here the network is a pure function over a params pytree, jitted
once and resident on device.

Architecture follows torchvision's InceptionV3 (transform_input=False,
aux_logits unused at eval), expressed inference-only: every BasicConv2d is a
bias-free conv followed by a *folded* batch-norm (per-channel scale/bias
precomputed from gamma/beta/running stats at weight-conversion time) and ReLU.
`convert_torch_inception_state_dict` ingests a torchvision `state_dict()`;
`init_inception` gives deterministic random weights so the IS/FID *machinery*
is testable without the 100MB pretrained file (point `load_torch_inception`
at one for reference-matching scores).
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict

POOL_DIM = 2048
NUM_CLASSES = 1000


# ---------------------------------------------------------------------------
# Inference primitives
# ---------------------------------------------------------------------------

def _conv_bn(p: Params, x: jnp.ndarray, stride: int = 1,
             padding="SAME") -> jnp.ndarray:
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding[0], padding[1]]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y)


def _max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
              padding: int = 0) -> jnp.ndarray:
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, window, window, 1), (1, stride, stride, 1),
                             pad)


def _avg_pool_3_1_1(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 avg pool, stride 1, pad 1, count_include_pad=True (torch default)."""
    y = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return y / 9.0


# ---------------------------------------------------------------------------
# Initialization / conversion
# ---------------------------------------------------------------------------

def _init_conv_bn(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> Params:
    std = math.sqrt(2.0 / (kh * kw * cout))
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std,
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


# (name, kh, kw, cin, cout) for every BasicConv2d, in torchvision naming.
def _conv_specs() -> List[Tuple[str, int, int, int, int]]:
    specs: List[Tuple[str, int, int, int, int]] = [
        ("Conv2d_1a_3x3", 3, 3, 3, 32),
        ("Conv2d_2a_3x3", 3, 3, 32, 32),
        ("Conv2d_2b_3x3", 3, 3, 32, 64),
        ("Conv2d_3b_1x1", 1, 1, 64, 80),
        ("Conv2d_4a_3x3", 3, 3, 80, 192),
    ]

    def inception_a(name, cin, pool_features):
        specs.extend([
            (f"{name}.branch1x1", 1, 1, cin, 64),
            (f"{name}.branch5x5_1", 1, 1, cin, 48),
            (f"{name}.branch5x5_2", 5, 5, 48, 64),
            (f"{name}.branch3x3dbl_1", 1, 1, cin, 64),
            (f"{name}.branch3x3dbl_2", 3, 3, 64, 96),
            (f"{name}.branch3x3dbl_3", 3, 3, 96, 96),
            (f"{name}.branch_pool", 1, 1, cin, pool_features),
        ])

    def inception_b(name, cin):
        specs.extend([
            (f"{name}.branch3x3", 3, 3, cin, 384),
            (f"{name}.branch3x3dbl_1", 1, 1, cin, 64),
            (f"{name}.branch3x3dbl_2", 3, 3, 64, 96),
            (f"{name}.branch3x3dbl_3", 3, 3, 96, 96),
        ])

    def inception_c(name, cin, c7):
        specs.extend([
            (f"{name}.branch1x1", 1, 1, cin, 192),
            (f"{name}.branch7x7_1", 1, 1, cin, c7),
            (f"{name}.branch7x7_2", 1, 7, c7, c7),
            (f"{name}.branch7x7_3", 7, 1, c7, 192),
            (f"{name}.branch7x7dbl_1", 1, 1, cin, c7),
            (f"{name}.branch7x7dbl_2", 7, 1, c7, c7),
            (f"{name}.branch7x7dbl_3", 1, 7, c7, c7),
            (f"{name}.branch7x7dbl_4", 7, 1, c7, c7),
            (f"{name}.branch7x7dbl_5", 1, 7, c7, 192),
            (f"{name}.branch_pool", 1, 1, cin, 192),
        ])

    def inception_d(name, cin):
        specs.extend([
            (f"{name}.branch3x3_1", 1, 1, cin, 192),
            (f"{name}.branch3x3_2", 3, 3, 192, 320),
            (f"{name}.branch7x7x3_1", 1, 1, cin, 192),
            (f"{name}.branch7x7x3_2", 1, 7, 192, 192),
            (f"{name}.branch7x7x3_3", 7, 1, 192, 192),
            (f"{name}.branch7x7x3_4", 3, 3, 192, 192),
        ])

    def inception_e(name, cin):
        specs.extend([
            (f"{name}.branch1x1", 1, 1, cin, 320),
            (f"{name}.branch3x3_1", 1, 1, cin, 384),
            (f"{name}.branch3x3_2a", 1, 3, 384, 384),
            (f"{name}.branch3x3_2b", 3, 1, 384, 384),
            (f"{name}.branch3x3dbl_1", 1, 1, cin, 448),
            (f"{name}.branch3x3dbl_2", 3, 3, 448, 384),
            (f"{name}.branch3x3dbl_3a", 1, 3, 384, 384),
            (f"{name}.branch3x3dbl_3b", 3, 1, 384, 384),
            (f"{name}.branch_pool", 1, 1, cin, 192),
        ])

    inception_a("Mixed_5b", 192, 32)
    inception_a("Mixed_5c", 256, 64)
    inception_a("Mixed_5d", 288, 64)
    inception_b("Mixed_6a", 288)
    inception_c("Mixed_6b", 768, 128)
    inception_c("Mixed_6c", 768, 160)
    inception_c("Mixed_6d", 768, 160)
    inception_c("Mixed_6e", 768, 192)
    inception_d("Mixed_7a", 768)
    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)
    return specs


def init_inception(key: jax.Array) -> Params:
    """Deterministic random weights (for tests / when no pretrained file)."""
    specs = _conv_specs()
    keys = jax.random.split(key, len(specs) + 1)
    params: Params = {name: _init_conv_bn(k, kh, kw, cin, cout)
                      for k, (name, kh, kw, cin, cout) in zip(keys, specs)}
    bound = math.sqrt(1.0 / POOL_DIM)
    params["fc"] = {
        "w": jax.random.uniform(keys[-1], (POOL_DIM, NUM_CLASSES), jnp.float32,
                                -bound, bound),
        "b": jnp.zeros((NUM_CLASSES,), jnp.float32),
    }
    return params


def convert_torch_inception_state_dict(state_dict, bn_eps: float = 1e-3) -> Params:
    """Fold torchvision InceptionV3 conv+BN pairs into this inference layout."""
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          dtype=np.float32)

    params: Params = {}
    for name, *_ in _conv_specs():
        w = to_np(state_dict[f"{name}.conv.weight"])  # OIHW
        gamma = to_np(state_dict[f"{name}.bn.weight"])
        beta = to_np(state_dict[f"{name}.bn.bias"])
        mean = to_np(state_dict[f"{name}.bn.running_mean"])
        var = to_np(state_dict[f"{name}.bn.running_var"])
        scale = gamma / np.sqrt(var + bn_eps)
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale),
        }
    params["fc"] = {
        "w": jnp.asarray(to_np(state_dict["fc.weight"]).T),
        "b": jnp.asarray(to_np(state_dict["fc.bias"])),
    }
    return params


def load_torch_inception(path: str) -> Params:
    import torch  # only needed for loading the pretrained file

    return convert_torch_inception_state_dict(
        torch.load(path, map_location="cpu", weights_only=True))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _inception_a(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b5 = _conv_bn(p[f"{name}.branch5x5_2"],
                  _conv_bn(p[f"{name}.branch5x5_1"], x), padding=2)
    b3 = _conv_bn(p[f"{name}.branch3x3dbl_1"], x)
    b3 = _conv_bn(p[f"{name}.branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p[f"{name}.branch3x3dbl_3"], b3, padding=1)
    bp = _conv_bn(p[f"{name}.branch_pool"], _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    b3 = _conv_bn(p[f"{name}.branch3x3"], x, stride=2, padding="VALID")
    bd = _conv_bn(p[f"{name}.branch3x3dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_3"], bd, stride=2, padding="VALID")
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b7 = _conv_bn(p[f"{name}.branch7x7_1"], x)
    b7 = _conv_bn(p[f"{name}.branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p[f"{name}.branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _conv_bn(p[f"{name}.branch_pool"], _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    b3 = _conv_bn(p[f"{name}.branch3x3_1"], x)
    b3 = _conv_bn(p[f"{name}.branch3x3_2"], b3, stride=2, padding="VALID")
    b7 = _conv_bn(p[f"{name}.branch7x7x3_1"], x)
    b7 = _conv_bn(p[f"{name}.branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p[f"{name}.branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv_bn(p[f"{name}.branch7x7x3_4"], b7, stride=2, padding="VALID")
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b3 = _conv_bn(p[f"{name}.branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p[f"{name}.branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv_bn(p[f"{name}.branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p[f"{name}.branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _conv_bn(p[f"{name}.branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bp = _conv_bn(p[f"{name}.branch_pool"], _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, 299, 299, 3] in [0, 1] -> 2048-d pool features [B, 2048].

    Input normalization matches torchvision's expectation when fed [0,1]
    images directly (the reference feeds clamped [0,1] without ImageNet
    normalization, `evaluation/metrics.py:26-28` — reproduced faithfully).
    """
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2, padding="VALID")
    x = _conv_bn(params["Conv2d_2a_3x3"], x, padding="VALID")
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x, 3, 2)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x, padding="VALID")
    x = _max_pool(x, 3, 2)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x)
    x = _inception_e(params, "Mixed_7c", x)
    return jnp.mean(x, axis=(1, 2))  # global avg pool -> [B, 2048]


def inception_logits(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, 299, 299, 3] in [0, 1] -> class logits [B, 1000]."""
    feats = inception_features(params, x)
    return jnp.dot(feats, params["fc"]["w"].astype(feats.dtype)) + \
        params["fc"]["b"].astype(feats.dtype)
