"""IS/FID machinery tests (random Inception weights; the math, batching, and
failure semantics are what's under test — pretrained weights slot in via
`load_torch_inception` for reference-matching scores)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_codes_tpu.eval.metrics import (compute_fid, compute_inception_score,
                                        compute_is_fid, _frechet_distance,
                                        sqrtm_trace_newton_schulz)
from gan_codes_tpu.models.inception import (init_inception,
                                            inception_features,
                                            inception_logits)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def inception_params():
    return init_inception(KEY)


class TestInceptionNet:
    def test_feature_and_logit_shapes(self, inception_params):
        x = jax.random.uniform(KEY, (2, 299, 299, 3))
        feats = inception_features(inception_params, x)
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()
        logits = inception_logits(inception_params, x)
        assert logits.shape == (2, 1000)

    def test_converter_roundtrip_layout(self):
        """Folded conv+BN equals torch's conv->BN(eval) on random weights."""
        import torch
        import torch.nn.functional as F

        torch.manual_seed(0)
        conv = torch.nn.Conv2d(3, 8, 3, bias=False)
        bn = torch.nn.BatchNorm2d(8, eps=1e-3)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
        bn.eval()

        sd = {"X.conv.weight": conv.weight, "X.bn.weight": bn.weight,
              "X.bn.bias": bn.bias, "X.bn.running_mean": bn.running_mean,
              "X.bn.running_var": bn.running_var}
        from gan_codes_tpu.models.inception import _conv_bn

        w = np.transpose(sd["X.conv.weight"].detach().numpy(), (2, 3, 1, 0))
        gamma = bn.weight.detach().numpy()
        scale = gamma / np.sqrt(bn.running_var.numpy() + 1e-3)
        p = {"w": jnp.asarray(w), "scale": jnp.asarray(scale),
             "bias": jnp.asarray(bn.bias.detach().numpy()
                                 - bn.running_mean.numpy() * scale)}
        x = np.random.RandomState(1).randn(2, 8, 8, 3).astype(np.float32)
        got = _conv_bn(p, jnp.asarray(x), padding="VALID")
        with torch.no_grad():
            want = F.relu(bn(conv(torch.from_numpy(
                x.transpose(0, 3, 1, 2)))))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-3)


class TestScores:
    def test_inception_score_finite_and_ge_one(self, inception_params):
        imgs = jax.random.uniform(KEY, (8, 32, 32, 3), minval=-1, maxval=1)
        score = compute_inception_score(inception_params, imgs, batch_size=4)
        assert np.isfinite(score) and score >= 1.0

    def test_fid_zero_for_identical_sets(self, inception_params):
        imgs = jax.random.uniform(KEY, (8, 32, 32, 3), minval=-1, maxval=1)
        fid = compute_fid(inception_params, imgs, imgs, batch_size=4)
        assert abs(fid) < 1e-2

    def test_fid_positive_for_different_sets(self, inception_params):
        a = jax.random.uniform(KEY, (8, 32, 32, 3), minval=-1, maxval=1)
        b = -a
        fid = compute_fid(inception_params, a, b, batch_size=4)
        assert fid > 0

    def test_is_fid_pairing(self, inception_params):
        imgs = jax.random.uniform(KEY, (4, 32, 32, 3), minval=-1, maxval=1)
        is_score, fid = compute_is_fid(inception_params, imgs, imgs,
                                       batch_size=4)
        assert np.isfinite(is_score) and np.isfinite(fid)

    def test_nan_inputs_scrubbed(self, inception_params):
        imgs = jnp.full((4, 32, 32, 3), jnp.nan)
        score = compute_inception_score(inception_params, imgs, batch_size=4)
        assert np.isfinite(score)


class TestSqrtm:
    def test_newton_schulz_matches_scipy(self):
        from scipy import linalg

        rng = np.random.RandomState(0)
        a = rng.randn(16, 24)
        s1 = a @ a.T + 1e-3 * np.eye(16)
        b = rng.randn(16, 24)
        s2 = b @ b.T + 1e-3 * np.eye(16)
        prod = s1 @ s2
        want = np.trace(linalg.sqrtm(prod).real)
        # without jax_enable_x64 this runs in f32; tolerance reflects that
        got = float(sqrtm_trace_newton_schulz(jnp.asarray(prod, jnp.float64),
                                              num_iters=100))
        np.testing.assert_allclose(got, want, rtol=2e-2)

    def test_frechet_device_path_close_to_scipy(self):
        rng = np.random.RandomState(1)
        mu1, mu2 = rng.randn(8), rng.randn(8)
        a, b = rng.randn(8, 20), rng.randn(8, 20)
        s1 = a @ a.T / 20 + 1e-3 * np.eye(8)
        s2 = b @ b.T / 20 + 1e-3 * np.eye(8)
        exact = _frechet_distance(mu1, s1, mu2, s2, use_scipy=True)
        device = _frechet_distance(mu1, s1, mu2, s2, use_scipy=False)
        np.testing.assert_allclose(device, exact, rtol=5e-2, atol=1e-2)
