"""Optimizer parity: optax clip+adam chain vs torch clip_grad_norm_+Adam at
the reference's TTUR hyperparameters (`deep_fusion_gan/model.py:42-53`)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from gan_codes_tpu.config import GANConfig, OptimConfig
from gan_codes_tpu.train.state import make_optimizers

KEY = jax.random.PRNGKey(2)


def torch_reference_updates(params_np, grads_list, lr, betas, clip):
    t_params = [torch.nn.Parameter(torch.from_numpy(p.copy()))
                for p in params_np]
    opt = torch.optim.Adam(t_params, lr=lr, betas=betas, eps=1e-8)
    outs = []
    for grads in grads_list:
        opt.zero_grad()
        for p, g in zip(t_params, grads):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(t_params, clip)
        opt.step()
        outs.append([p.detach().numpy().copy() for p in t_params])
    return outs


class TestAdamParity:
    def test_clip_adam_matches_torch_over_steps(self):
        cfg = GANConfig()
        g_tx, d_tx = make_optimizers(cfg)
        rng = np.random.RandomState(0)
        params = [rng.randn(4, 3).astype(np.float32),
                  rng.randn(5).astype(np.float32)]
        # step 1: large grads (clip active); steps 2-3: small grads
        grads_list = [
            [rng.randn(4, 3).astype(np.float32) * 10,
             rng.randn(5).astype(np.float32) * 10],
            [rng.randn(4, 3).astype(np.float32) * 0.1,
             rng.randn(5).astype(np.float32) * 0.1],
            [rng.randn(4, 3).astype(np.float32),
             rng.randn(5).astype(np.float32)],
        ]

        want = torch_reference_updates(
            params, grads_list, lr=cfg.optim.d_lr,
            betas=(cfg.optim.beta1, cfg.optim.beta2),
            clip=cfg.optim.grad_clip_d)

        j_params = [jnp.asarray(p) for p in params]
        opt_state = d_tx.init(j_params)
        for step, grads in enumerate(grads_list):
            j_grads = [jnp.asarray(g) for g in grads]
            updates, opt_state = d_tx.update(j_grads, opt_state, j_params)
            j_params = optax.apply_updates(j_params, updates)
            for a, b in zip(j_params, want[step]):
                np.testing.assert_allclose(np.asarray(a), b, atol=1e-6,
                                           rtol=1e-5)

    def test_ttur_rates(self):
        cfg = GANConfig()
        assert cfg.optim.g_lr == 1e-4 and cfg.optim.d_lr == 4e-4
        assert cfg.optim.beta1 == 0.0 and cfg.optim.beta2 == 0.9
        assert cfg.optim.grad_clip_g == 5.0 and cfg.optim.grad_clip_d == 5.0
