"""Functional PyTorch oracles for golden-parity tests.

These re-express the reference architecture's math with torch.nn.functional
calls (fresh code, functional style) so the JAX implementation can be checked
numerically against PyTorch semantics at shared weights. NCHW on the torch
side, NHWC on the JAX side; converters below bridge layouts.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def j2t(x) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x).copy())


def to_torch_tree(params, requires_grad: bool = False):
    """Convert a JAX param pytree to torch tensors, preserving JAX layouts
    (HWIO conv kernels, [in,out] dense). The functional oracles permute on the
    fly, so autograd grads land in the same layout as JAX grads."""
    if isinstance(params, dict):
        return {k: to_torch_tree(v, requires_grad) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return [to_torch_tree(v, requires_grad) for v in params]
    t = torch.from_numpy(np.asarray(params).copy())
    if requires_grad and t.is_floating_point():
        t.requires_grad_()
    return t


def tree_leaves(params):
    if isinstance(params, dict):
        for k in sorted(params):
            yield from tree_leaves(params[k])
    elif isinstance(params, (list, tuple)):
        for v in params:
            yield from tree_leaves(v)
    else:
        yield params


def conv_w(params) -> torch.Tensor:
    """JAX HWIO conv kernel -> torch OIHW."""
    return j2t(params["w"]).permute(3, 2, 0, 1).contiguous()


def conv_b(params):
    return j2t(params["b"]) if "b" in params else None


def lin_w(params) -> torch.Tensor:
    """JAX [in, out] dense weight -> torch [out, in]."""
    return j2t(params["w"]).t().contiguous()


def nhwc2nchw(x) -> torch.Tensor:
    return j2t(x).permute(0, 3, 1, 2).contiguous()


def nchw2nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().permute(0, 2, 3, 1).contiguous().numpy()


def mlp2(layers, s: torch.Tensor) -> torch.Tensor:
    h = F.relu(F.linear(s, lin_w(layers[0]), j2t(layers[0]["b"])))
    return F.linear(h, lin_w(layers[1]), j2t(layers[1]["b"]))


def affine(params, x: torch.Tensor, sent: torch.Tensor) -> torch.Tensor:
    gamma = mlp2(params["gamma_mlp"], sent)[:, :, None, None]
    beta = mlp2(params["beta_mlp"], sent)[:, :, None, None]
    return gamma * x + beta


def res_block_g(params, x: torch.Tensor, sent: torch.Tensor) -> torch.Tensor:
    h = F.leaky_relu(affine(params["affine_1"], x, sent), 0.2)
    h = F.leaky_relu(affine(params["affine_2"], h, sent), 0.2)
    h = F.conv2d(h, conv_w(params["conv_1"]), conv_b(params["conv_1"]), padding=1)
    h = F.leaky_relu(affine(params["affine_3"], h, sent), 0.2)
    h = F.leaky_relu(affine(params["affine_4"], h, sent), 0.2)
    h = F.conv2d(h, conv_w(params["conv_2"]), conv_b(params["conv_2"]), padding=1)
    short = x
    if "shortcut_conv" in params:
        short = F.conv2d(x, conv_w(params["shortcut_conv"]),
                         conv_b(params["shortcut_conv"]))
    return short + j2t(params["gamma"]) * h


def res_block_d(params, x: torch.Tensor) -> torch.Tensor:
    h = F.leaky_relu(
        F.conv2d(x, conv_w(params["conv_1"]), None, stride=2, padding=1), 0.2)
    h = F.leaky_relu(
        F.conv2d(h, conv_w(params["conv_2"]), None, padding=1), 0.2)
    short = x
    if "shortcut_conv" in params:
        short = F.conv2d(x, conv_w(params["shortcut_conv"]),
                         conv_b(params["shortcut_conv"]))
    short = F.avg_pool2d(short, 2)
    return short + j2t(params["gamma"]) * h


def generator(params, cfg, noise, sent) -> torch.Tensor:
    x = F.linear(j2t(noise), lin_w(params["linear_in"]),
                 j2t(params["linear_in"]["b"]))
    x = x.view(x.shape[0], cfg.seed_channels, cfg.base_size, cfg.base_size)
    sent_t = j2t(sent)
    for i, bp in enumerate(params["blocks"]):
        x = res_block_g(bp, x, sent_t)
        if i < cfg.n_up_blocks:
            x = F.interpolate(x, scale_factor=2)
    x = F.leaky_relu(x, 0.2)
    x = F.conv2d(x, conv_w(params["conv_out"]), conv_b(params["conv_out"]),
                 padding=1)
    return torch.tanh(x)


def discriminator_embeds(params, image: torch.Tensor) -> torch.Tensor:
    x = F.conv2d(image, conv_w(params["conv_stem"]),
                 conv_b(params["conv_stem"]), padding=1)
    for bp in params["blocks"]:
        x = res_block_d(bp, x)
    return x


def discriminator_logits(params, embed: torch.Tensor,
                         sent: torch.Tensor) -> torch.Tensor:
    b, _, h, w = embed.shape
    sent_map = sent.view(b, -1, 1, 1).expand(b, sent.shape[-1], h, w)
    joint = torch.cat([embed, sent_map], dim=1)
    x = F.leaky_relu(
        F.conv2d(joint, conv_w(params["conv_joint"]), None, padding=1), 0.2)
    return F.conv2d(x, conv_w(params["conv_logit"]), None)
