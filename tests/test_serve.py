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
