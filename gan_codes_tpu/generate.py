"""Prompt -> image generation (the "serve" path).

Capability parity with `src/test_generate.py:12-84`: tokenize a free-text
prompt (lowercase, strip '.'/',', OOV -> <unk> -> 0, pad to 18), encode with
the frozen text encoder, generate one image from fresh noise, save it.
Exposed both as a library function and an interactive `main()`.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GANConfig
from .models.generator import generator_apply
from .models.text_encoder import text_encoder_apply
from .train.checkpoint import CheckpointManager
from .utils import image_io

Params = Any


def preprocess_caption(caption: str, word2code: Dict[str, int],
                       max_len: int = 18) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize + encode a prompt (reference `test_generate.py:12-19`)."""
    tokens = caption.lower().replace(".", "").replace(",", "").split()
    encoded = [word2code.get(w, word2code.get("<unk>", 0)) for w in tokens]
    cap_len = max(1, min(len(encoded), max_len))
    arr = np.zeros((1, max_len), dtype=np.int32)
    arr[0, :cap_len] = encoded[:max_len]
    return arr, np.asarray([cap_len], dtype=np.int32)


def generate_from_prompt(prompt: str, g_params: Params,
                         text_encoder_params: Params, cfg: GANConfig,
                         word2code: Dict[str, int],
                         rng: Optional[jax.Array] = None) -> np.ndarray:
    """Returns one [-1,1] HWC image for the prompt."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    captions, cap_lens = preprocess_caption(prompt, word2code,
                                            cfg.text_encoder.max_len)
    sents = text_encoder_apply(text_encoder_params, cfg.text_encoder,
                               jnp.asarray(captions), jnp.asarray(cap_lens))
    noise = jax.random.normal(rng, (1, cfg.generator.latent_dim))
    img = generator_apply(g_params, cfg.generator, noise, sents)
    return np.asarray(jax.device_get(img))[0]


def load_vocab(data_dir: str) -> Tuple[Dict[int, str], Dict[str, int]]:
    """Read code2word/word2code from captions.pickle
    (reference `test_generate.py:30-32`)."""
    with open(os.path.join(data_dir, "captions.pickle"), "rb") as f:
        _, _, code2word, word2code = pickle.load(f)
    return code2word, word2code


def main(data_dir: str = "data", encoder_weights_path: str = "text_encoder.pth",
         gen_weights_dir: str = "gen_weights",
         image_save_path: str = "testing_images",
         prompt: Optional[str] = None, use_ema: bool = False,
         show: bool = False) -> Optional[str]:
    """Interactive prompt -> image (reference `test_generate.py:21-84`).

    `use_ema` samples from the EMA generator (the smoother weights used for
    eval under BASELINE config 5) instead of the raw training weights.
    `show` additionally opens the saved image in the system viewer
    (reference `test_generate.py:76-81` calls `image.show()` always; here
    it is opt-in because this framework targets headless TPU hosts)."""
    from .models.text_encoder import load_text_encoder

    code2word, word2code = load_vocab(data_dir)
    ckpt = CheckpointManager(gen_weights_dir)
    # Rebuild the exact model the checkpoint was trained as (its persisted
    # config.json, 256px default for pre-config dirs; vocab follows the
    # data dir's captions.pickle — reference `test_generate.py:30-34`).
    cfg = ckpt.resolve_inference_config(vocab_size=len(code2word))
    te_params = load_text_encoder(encoder_weights_path, cfg.text_encoder)
    gen_tree, _epoch = ckpt.restore_generator_tree(cfg.generator)

    if prompt is None:
        prompt = input("Enter your text prompt: ").strip()
    if not prompt:
        print("No prompt entered.")
        return None

    g = gen_tree["g_ema_params"] if use_ema else gen_tree["g_params"]
    img = generate_from_prompt(prompt, g, te_params, cfg, word2code)
    path = image_io.save_image(img, image_save_path, "sample_from_prompt")
    print(f"Generated image saved to {path}")
    if show:
        from PIL import Image

        Image.open(path).show()
    return path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="prompt -> image")
    ap.add_argument("--data", default="data")
    ap.add_argument("--text-encoder", default="text_encoder.pth")
    ap.add_argument("--weights", default="gen_weights")
    ap.add_argument("--out", default="testing_images")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--ema", action="store_true",
                    help="sample from the EMA generator")
    ap.add_argument("--show", action="store_true",
                    help="open the saved image in the system viewer "
                         "(reference test_generate.py:76-81 behavior)")
    ap.add_argument("--compile-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache: repeat "
                         "invocations skip the G-forward compile")
    a = ap.parse_args()
    if a.compile_cache:
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache(a.compile_cache)
    main(a.data, a.text_encoder, a.weights, a.out, a.prompt, use_ema=a.ema,
         show=a.show)
