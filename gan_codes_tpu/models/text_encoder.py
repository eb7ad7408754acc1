"""DAMSM-style bidirectional-LSTM sentence encoder, TPU-native.

Capability parity with reference RNNEncoder (`src/text_encoder/model.py:6-63`):
Embedding(vocab, 300) -> Dropout(0.5) -> packed bidirectional 1-layer
LSTM(300 -> 128/direction); the sentence embedding is the concatenated final
hidden states, [B, 256].

TPU-first design: PyTorch's `pack_padded_sequence` (which requires
length-sorted batches, forcing the reference to sort every batch in
`src/objects/utils.py:11-17`) is replaced by a masked `lax.scan`:
  * forward direction: state updates only while t < length, so the final
    carry equals the hidden state at the last valid token;
  * backward direction: scan runs from t = T-1 down to 0 with the same mask,
    so the state stays at its zero init until the last valid token and the
    final carry equals the packed-LSTM backward hidden state at t = 0.
This reproduces packed-sequence semantics bit-for-bit WITHOUT sorting, with
static [B, 18] shapes XLA can compile once. The input projection for all
timesteps is hoisted out of the scan into one large matmul (MXU-friendly).

`convert_torch_state_dict` loads the reference's pretrained
`text_encoder.pth` (`src/text_encoder/model.py:58-63`) into this layout.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextEncoderConfig

Params = Dict


def init_text_encoder(key: jax.Array, cfg: TextEncoderConfig,
                      dtype=jnp.float32) -> Params:
    """Random init matching torch defaults (Embedding ~ N(0,1); LSTM weights
    U(+-1/sqrt(hidden)))."""
    h = cfg.per_direction_hidden
    e = cfg.embed_dim
    bound = 1.0 / np.sqrt(h)
    keys = jax.random.split(key, 9)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    def direction(k0, k1, k2, k3):
        return {
            "w_ih": u(k0, (e, 4 * h)),
            "w_hh": u(k1, (h, 4 * h)),
            "b_ih": u(k2, (4 * h,)),
            "b_hh": u(k3, (4 * h,)),
        }

    params = {
        "embedding": jax.random.normal(keys[0], (cfg.vocab_size, e), dtype),
        "fwd": direction(*keys[1:5]),
    }
    if cfg.bidirectional:
        params["bwd"] = direction(*keys[5:9])
    return params


def _lstm_direction(dir_params: Params, x_emb: jnp.ndarray, mask: jnp.ndarray,
                    reverse: bool) -> jnp.ndarray:
    """Run one LSTM direction with masked updates.

    x_emb: [B, T, E]; mask: [B, T] (1.0 where t < length). Returns the final
    hidden state [B, H] under packed-sequence semantics.
    """
    b, t, _ = x_emb.shape
    h_dim = dir_params["w_hh"].shape[0]
    dtype = x_emb.dtype

    # One big [B*T, E] @ [E, 4H] matmul outside the scan (MXU-friendly),
    # biases folded in.
    gates_x = (jnp.einsum("bte,eg->btg", x_emb, dir_params["w_ih"].astype(dtype))
               + (dir_params["b_ih"] + dir_params["b_hh"]).astype(dtype))
    w_hh = dir_params["w_hh"].astype(dtype)

    # scan over time-major [T, B, ...]
    gates_x_t = jnp.swapaxes(gates_x, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1)[:, :, None].astype(dtype)
    if reverse:
        gates_x_t = gates_x_t[::-1]
        mask_t = mask_t[::-1]

    def step(carry, inputs):
        h, c = carry
        gx, m = inputs
        gates = gx + jnp.dot(h, w_hh, preferred_element_type=dtype)
        # PyTorch gate order: input, forget, cell(g), output
        i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
        i_g = jax.nn.sigmoid(i_g)
        f_g = jax.nn.sigmoid(f_g)
        g_g = jnp.tanh(g_g)
        o_g = jax.nn.sigmoid(o_g)
        c_new = f_g * c + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), None

    init = (jnp.zeros((b, h_dim), dtype), jnp.zeros((b, h_dim), dtype))
    (h_final, _), _ = jax.lax.scan(step, init, (gates_x_t, mask_t))
    return h_final


def text_encoder_apply(params: Params, cfg: TextEncoderConfig,
                       captions: jnp.ndarray, cap_lens: jnp.ndarray,
                       *, deterministic: bool = True,
                       dropout_rng: Optional[jax.Array] = None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """captions [B, T] int32, cap_lens [B] int32 -> sentence embeds [B, hidden].

    `deterministic=True` matches the reference's frozen-eval usage
    (`src/deep_fusion_gan/model.py:37-39`); dropout is only applied when
    training the encoder itself.
    """
    emb = params["embedding"].astype(dtype)[captions]
    if not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when deterministic=False")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - cfg.dropout, emb.shape)
        emb = jnp.where(keep, emb / (1.0 - cfg.dropout), 0.0)

    t = captions.shape[1]
    mask = (jnp.arange(t)[None, :] < cap_lens[:, None])

    h_fwd = _lstm_direction(params["fwd"], emb, mask, reverse=False)
    if cfg.bidirectional:
        h_bwd = _lstm_direction(params["bwd"], emb, mask, reverse=True)
        return jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return h_fwd


def convert_torch_state_dict(state_dict, cfg: TextEncoderConfig) -> Params:
    """Convert a reference `text_encoder.pth` state_dict (torch tensors or
    numpy arrays) into this module's parameter pytree.

    Torch LSTM stores [4H, in] weight matrices with gate order (i, f, g, o)
    and separate b_ih / b_hh; we transpose to [in, 4H] (same gate order).
    """
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          dtype=np.float32)

    def direction(suffix: str) -> Params:
        return {
            "w_ih": jnp.asarray(to_np(state_dict[f"rnn.weight_ih_l0{suffix}"]).T),
            "w_hh": jnp.asarray(to_np(state_dict[f"rnn.weight_hh_l0{suffix}"]).T),
            "b_ih": jnp.asarray(to_np(state_dict[f"rnn.bias_ih_l0{suffix}"])),
            "b_hh": jnp.asarray(to_np(state_dict[f"rnn.bias_hh_l0{suffix}"])),
        }

    params = {
        "embedding": jnp.asarray(to_np(state_dict["encoder.weight"])),
        "fwd": direction(""),
    }
    if cfg.bidirectional:
        params["bwd"] = direction("_reverse")
    return params


def load_text_encoder(weights_path: str, cfg: TextEncoderConfig) -> Params:
    """Load the reference's pretrained torch checkpoint (requires torch)."""
    import torch  # local import: torch is only needed for weight conversion

    state_dict = torch.load(weights_path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state_dict, cfg)
