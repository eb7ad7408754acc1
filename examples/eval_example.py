"""Evaluation / sampling walkthrough (mirrors the reference's
eval_example.ipynb): load a trained generator, sample a test batch to PNGs,
and generate an image from a free-text caption (`gen_own_bird` cell).
"""
import argparse
import os

import jax

from gan_codes_tpu.config import GANConfig
from gan_codes_tpu.data.dataset import CUBDataset
from gan_codes_tpu.data.loader import DataLoader
from gan_codes_tpu.config import DataConfig
from gan_codes_tpu.generate import generate_from_prompt, load_vocab
from gan_codes_tpu.models.generator import init_generator
from gan_codes_tpu.models.text_encoder import (init_text_encoder,
                                               load_text_encoder)
from gan_codes_tpu.sample import sample
from gan_codes_tpu.train.checkpoint import CheckpointManager
from gan_codes_tpu.utils import image_io


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--weights", required=True, help="gen_weights dir")
    p.add_argument("--text-encoder", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--caption", default="this bird has a red beak and a white belly")
    a = p.parse_args(argv)

    code2word, word2code = load_vocab(a.data)
    cfg = GANConfig.for_image_size(a.image_size, vocab_size=len(code2word))

    if a.text_encoder and os.path.exists(a.text_encoder):
        te_params = load_text_encoder(a.text_encoder, cfg.text_encoder)
    else:
        te_params = init_text_encoder(jax.random.PRNGKey(0), cfg.text_encoder)

    ckpt = CheckpointManager(a.weights)
    tree, epoch = ckpt.restore_generator_tree(cfg.generator)
    print(f"Loaded generator from epoch {epoch}")

    # batch sampling on the test split (reference eval cell 6)
    ds = CUBDataset(DataConfig(data_dir=a.data, image_size=a.image_size),
                    "test", augment=False)
    batch = next(iter(DataLoader(ds, min(8, len(ds)), shuffle=False)))
    paths = sample(tree["g_params"], te_params, cfg, batch,
                   os.path.join(a.out, "batch"))
    print(f"Wrote {len(paths)} sampled images")

    # free-text generation (reference gen_own_bird cell 9)
    img = generate_from_prompt(a.caption, tree["g_params"], te_params, cfg,
                               word2code)
    path = image_io.save_image(img, a.out, "own_bird")
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
