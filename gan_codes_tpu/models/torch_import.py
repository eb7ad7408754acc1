"""Import trained reference (PyTorch) G/D weights into this framework.

The reference trains with torch `nn.Module`s and ships two artifact kinds
(`src/deep_fusion_gan/model.py:315-327`): per-epoch generator-only
`gen_N.pth` files (a raw `state_dict`, what `test_generate.py:48` loads)
and full `checkpoint.pt` dicts holding `generator` / `discriminator` /
optimizer states / histories (`model.py:106-134`). These converters map
either artifact onto this framework's dict pytrees so a reference user can
serve, evaluate, or fine-tune a torch-trained model on TPU.

Layout rules (same conventions as the other converters,
`models/text_encoder.py:138`, `models/inception.py:174`):
  * torch Linear weight [out, in]   -> ours [in, out] (transpose)
  * torch Conv2d weight OIHW        -> ours HWIO (transpose 2,3,1,0)
  * torch `gamma` shape-[1] tensors -> our scalar ()
Key structure follows the reference modules exactly
(`src/generator/model.py:8-30`, `src/generator/residual_block.py:9-27`,
`src/generator/fusion_block.py:6-19`, `src/discriminator/model.py:8-34`,
`src/discriminator/residual_block.py:7-22`).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiscriminatorConfig, GANConfig, GeneratorConfig

Params = Dict


def _t2j(t) -> jnp.ndarray:
    return jnp.asarray(np.asarray(t.detach().cpu().numpy()))


def _torch_load_ref(path: str):
    """torch.load for reference artifacts, weights-only.

    Real reference checkpoint.pt files contain numpy SCALARS in the loss
    histories (`model.py:233-236` appends `np.mean(...)` outputs before
    torch.save), which torch>=2.6's weights_only unpickler rejects.
    Retry with just the numpy scalar/dtype globals allowlisted — still
    weights_only, no arbitrary code execution."""
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # only the weights_only global rejection retries; corruption / IO
        # errors surface as themselves
        core = getattr(np, "_core", None) or np.core
        allow = [core.multiarray.scalar, np.dtype]
        allow += [getattr(np.dtypes, n) for n in dir(np.dtypes)
                  if n.endswith("DType")]
        with torch.serialization.safe_globals(allow):
            return torch.load(path, map_location="cpu", weights_only=True)


def _lin(sd: Dict, prefix: str) -> Params:
    """torch nn.Linear -> {"w": [in,out], "b": [out]}."""
    p = {"w": _t2j(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _t2j(sd[f"{prefix}.bias"])
    return p


def _conv(sd: Dict, prefix: str) -> Params:
    """torch nn.Conv2d OIHW -> {"w": HWIO, "b": [out]}."""
    p = {"w": jnp.transpose(_t2j(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = _t2j(sd[f"{prefix}.bias"])
    return p


def _gamma(sd: Dict, prefix: str) -> jnp.ndarray:
    return _t2j(sd[f"{prefix}.gamma"]).reshape(())


def _affine(sd: Dict, prefix: str) -> Params:
    """Reference AffineBlock (`fusion_block.py:6-19`): two 2-layer MLPs."""
    return {
        "gamma_mlp": [_lin(sd, f"{prefix}.gamma_mlp.0"),
                      _lin(sd, f"{prefix}.gamma_mlp.2")],
        "beta_mlp": [_lin(sd, f"{prefix}.beta_mlp.0"),
                     _lin(sd, f"{prefix}.beta_mlp.2")],
    }


def _res_block_g(sd: Dict, prefix: str) -> Params:
    """Reference ResidualBlockG (`generator/residual_block.py:9-27`)."""
    p = {
        "affine_1": _affine(sd, f"{prefix}.fusion_block_1"),
        "affine_2": _affine(sd, f"{prefix}.fusion_block_2"),
        "conv_1": _conv(sd, f"{prefix}.conv_1"),
        "affine_3": _affine(sd, f"{prefix}.fusion_block_3"),
        "affine_4": _affine(sd, f"{prefix}.fusion_block_4"),
        "conv_2": _conv(sd, f"{prefix}.conv_2"),
        "gamma": _gamma(sd, prefix),
    }
    if f"{prefix}.scale_conv.weight" in sd:
        p["shortcut_conv"] = _conv(sd, f"{prefix}.scale_conv")
    return p


def infer_generator_config(sd: Dict) -> GeneratorConfig:
    """Derive the architecture a generator state_dict was trained as.

    Shapes pin every knob: `linear_in.weight` is [8*nc*4*4, latent_dim]
    (`generator/model.py:13`), the number of `res_blocks.N.` prefixes gives
    the upsampling depth (image_size = 4 << n_up), and the affine MLP
    shapes give sentence/hidden dims (`fusion_block.py:8-11`)."""
    out_dim, latent_dim = sd["linear_in.weight"].shape
    n_channels = out_dim // (8 * 4 * 4)
    n_up = len({k.split(".")[1] for k in sd if k.startswith("res_blocks.")})
    hidden, sentence_dim = sd[
        "res_blocks.0.fusion_block_1.gamma_mlp.0.weight"].shape
    return GeneratorConfig(n_channels=int(n_channels),
                           latent_dim=int(latent_dim),
                           sentence_dim=int(sentence_dim),
                           affine_hidden=int(hidden),
                           image_size=4 << n_up)


def convert_torch_generator_state_dict(sd: Dict,
                                       cfg: GeneratorConfig) -> Params:
    """Reference Generator state_dict -> this framework's G pytree.

    Mapping: `linear_in` -> linear_in; `res_blocks.{0..n-1}` +
    `res_block_out` -> blocks[0..n] (our blocks ladder appends the final
    non-upsampling block, `models/generator.py::init_generator`);
    `conv_out.1` (the Conv2d inside the reference's LeakyReLU/Conv/Tanh
    Sequential, `generator/model.py:26-30`) -> conv_out."""
    n_up = len(cfg.block_channels) - 1
    blocks = [_res_block_g(sd, f"res_blocks.{i}") for i in range(n_up)]
    blocks.append(_res_block_g(sd, "res_block_out"))
    params = {
        "linear_in": _lin(sd, "linear_in"),
        "blocks": blocks,
        "conv_out": _conv(sd, "conv_out.1"),
    }
    from .generator import init_generator

    _check_structure(params, lambda k: init_generator(k, cfg), "generator")
    return params


def _res_block_d(sd: Dict, prefix: str) -> Params:
    """Reference ResidualBlockD (`discriminator/residual_block.py:7-22`)."""
    p = {
        "conv_1": _conv(sd, f"{prefix}.residual_conv.0"),
        "conv_2": _conv(sd, f"{prefix}.residual_conv.2"),
        "gamma": _gamma(sd, prefix),
    }
    if f"{prefix}.scale_conv.weight" in sd:
        p["shortcut_conv"] = _conv(sd, f"{prefix}.scale_conv")
    return p


def convert_torch_discriminator_state_dict(sd: Dict,
                                           cfg: DiscriminatorConfig
                                           ) -> Params:
    """Reference Discriminator state_dict -> this framework's D pytree.

    `img_forward.0` (stem conv) -> conv_stem; `img_forward.{1..n}` ->
    blocks; `img_sentence_forward.{0,2}` (joint 3x3 / logit 4x4 convs,
    `discriminator/model.py:30-34`) -> conv_joint / conv_logit. The
    channel order of conv_joint's input matches because both sides
    concatenate (image_embed, sentence) in that order."""
    params = {
        "conv_stem": _conv(sd, "img_forward.0"),
        "blocks": [_res_block_d(sd, f"img_forward.{i + 1}")
                   for i in range(cfg.n_down_blocks)],
        "conv_joint": _conv(sd, "img_sentence_forward.0"),
        "conv_logit": _conv(sd, "img_sentence_forward.2"),
    }
    from .discriminator import init_discriminator

    _check_structure(params, lambda k: init_discriminator(k, cfg),
                     "discriminator")
    return params


def _check_structure(params: Params, init_fn, name: str) -> None:
    """Converted tree must match the framework's init tree exactly (same
    keys, same leaf shapes) — a size/config mismatch fails HERE with a
    readable message instead of deep inside a jitted apply."""
    template = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    got = jax.tree.map(lambda x: (jnp.shape(x)), params)
    want = jax.tree.map(lambda x: tuple(x.shape), template)
    if got != want:
        raise ValueError(
            f"Converted torch {name} does not match the configured "
            f"architecture.\n  converted: {got}\n  expected:  {want}\n"
            "Pass the config the torch model was trained with "
            "(infer_generator_config can derive it from the state_dict).")


def _maybe_unwrap(obj: Any, key: str) -> Dict:
    """Accept either a raw state_dict or the reference's full
    `checkpoint.pt` dict (`model.py:111-115`)."""
    if key in obj and isinstance(obj[key], dict):
        return obj[key]
    return obj


def load_torch_generator(path: str, cfg: GeneratorConfig = None) -> Tuple[
        Params, GeneratorConfig]:
    """Load a reference `gen_N.pth` (or `checkpoint.pt`) and convert.

    With cfg=None the architecture is inferred from the weight shapes.
    Returns (params, cfg)."""
    import torch

    sd = _maybe_unwrap(_torch_load_ref(path), "generator")
    if cfg is None:
        cfg = infer_generator_config(sd)
    return convert_torch_generator_state_dict(sd, cfg), cfg


def load_torch_discriminator(path: str, cfg: DiscriminatorConfig
                             ) -> Params:
    """Load the discriminator from a reference `checkpoint.pt` (or a raw
    discriminator state_dict) and convert."""
    import torch

    sd = _maybe_unwrap(_torch_load_ref(path), "discriminator")
    return convert_torch_discriminator_state_dict(sd, cfg)


def import_generator_checkpoint(torch_path: str, out_dir: str,
                                epoch: int = 0) -> str:
    """One-shot migration: reference `gen_N.pth` -> this framework's
    generator checkpoint directory (Orbax gen_N + config.json), ready for
    `generate.py` / `serve.py` as-is.

    The reference has no EMA generator, so the imported weights serve as
    both the raw and the EMA copy."""
    import types

    from ..train.checkpoint import CheckpointManager

    g_params, gcfg = load_torch_generator(torch_path)
    # Embed the FULL inferred generator config (latent/sentence/hidden dims
    # may differ from the 256px defaults) and keep the companion configs'
    # dims consistent with it.
    cfg = _cfg_from_generator(gcfg)
    state = types.SimpleNamespace(g_params=g_params, g_ema_params=g_params)
    mgr = CheckpointManager(out_dir)
    # config first: a crash between the two writes then leaves config.json
    # without gen_N (clean "no weights" error) instead of gen_N without
    # config.json (silent 256px-default fallback, wrong architecture).
    mgr.save_config(cfg)
    mgr.save_generator(epoch, state)
    print(f"Imported {torch_path} -> {out_dir}/gen_{epoch} "
          f"({gcfg.image_size}px, n_channels={gcfg.n_channels})")
    return out_dir


# -- full training-state import: the reference's checkpoint.pt carries G/D
# weights, both Adam optimizers, the epoch, and the loss/metric histories
# (`model.py:106-134`); converting ALL of it lets a torch training run
# resume on TPU mid-stream instead of restarting.

def _cfg_from_generator(gcfg: GeneratorConfig) -> GANConfig:
    """A full GANConfig whose companion dims follow the inferred G."""
    import dataclasses

    base = GANConfig.for_image_size(gcfg.image_size,
                                    n_channels=gcfg.n_channels)
    return dataclasses.replace(
        base, generator=gcfg,
        discriminator=dataclasses.replace(
            base.discriminator, sentence_dim=gcfg.sentence_dim),
        text_encoder=dataclasses.replace(
            base.text_encoder, hidden_dim=gcfg.sentence_dim))


def _adam_moments(opt_sd: Dict, model_sd: Dict, convert_fn):
    """torch Adam state -> (mu_tree, nu_tree, step_count) in our layout.

    torch keys optimizer state by parameter INDEX in construction order;
    the reference passes `model.parameters()` (`model.py:42-43`), whose
    order equals the model state_dict's key order (both traversals yield a
    module's direct parameters, then its children, in registration order —
    asserted in tests). The per-index `exp_avg`/`exp_avg_sq` tensors have
    their parameter's exact shape, so re-keying them by parameter name and
    running the WEIGHT converter on the result yields the moment trees with
    every layout transpose applied consistently."""
    keys = list(model_sd)
    ids = [i for g in opt_sd["param_groups"] for i in g["params"]]
    if len(ids) != len(keys):
        raise ValueError(
            f"optimizer tracks {len(ids)} params but the model state_dict "
            f"has {len(keys)} — not a matching checkpoint")
    state = opt_sd.get("state", {})
    if not state:
        return None  # optimizer never stepped; keep a fresh init
    # torch creates per-param Adam state lazily on first grad: a param that
    # never received a gradient has NO entry. Substitute zero moments and
    # say which params were fresh rather than dying on a bare KeyError.
    # Semantics caveat (inherent to optax's single global count vs torch's
    # per-param step): torch would bias-correct such a param's first real
    # update as step 1, while the imported state applies the global count —
    # a smaller first update for that param only. Exact import of a
    # partially-stepped optimizer is unrepresentable in a shared-count
    # Adam; the notice makes the substitution auditable.
    count = next((int(state[i]["step"]) for i in ids if i in state), None)
    if count is None:
        # state exists but not for this group's params: fresh init (print
        # BEFORE the substitution notice would misdocument the import)
        print("[torch_import] optimizer state has no entry for any of this "
              "group's params; fresh Adam init")
        return None
    missing = [k for k, i in zip(keys, ids) if i not in state]
    if missing:
        print(f"[torch_import] {len(missing)} param(s) had no Adam state "
              f"(never received a gradient); zero moments substituted "
              f"(bias correction will use the global step count): "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")

    def moment(i, k, field):
        return state[i][field] if i in state else model_sd[k] * 0

    mu = convert_fn({k: moment(i, k, "exp_avg") for k, i in zip(keys, ids)})
    nu = convert_fn({k: moment(i, k, "exp_avg_sq") for k, i in zip(keys, ids)})
    return mu, nu, count


def _inject_adam(opt_state, moments):
    """Replace the ScaleByAdamState inside an optax chain state."""
    import optax

    if moments is None:
        return opt_state
    mu, nu, count = moments

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=jnp.asarray(count, jnp.int32),
                              mu=mu, nu=nu)
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(rec(x) for x in s)
        return s

    return rec(opt_state)


def import_training_checkpoint(ckpt_path: str, out_dir: str,
                               seed: int = 123321,
                               vocab_size: int = None,
                               batch_size: int = None) -> int:
    """Reference `checkpoint.pt` -> a framework checkpoint directory that
    `train_entry --weights OUT_DIR` auto-resumes from.

    Converts G/D weights, both Adam moment sets (+ step counts), the epoch,
    and the histories. `vocab_size`/`batch_size` pin the run parameters the
    torch checkpoint does not record (pass the values the resumed training
    run will use, or the strict config-on-resume check will flag them).
    Not carried over (the reference does not persist them): the RNG stream
    (re-seeded from `seed`, so the resumed run's noise draws differ from a
    hypothetical uninterrupted torch run) and an EMA generator (the
    reference has none; the imported weights seed it)."""
    import dataclasses

    import torch

    from ..train.checkpoint import CheckpointManager
    from ..train.state import TrainState, make_optimizers

    ck = _torch_load_ref(ckpt_path)
    for need in ("generator", "discriminator", "g_optimizer", "d_optimizer",
                 "epoch"):
        if need not in ck:
            raise ValueError(f"{ckpt_path} has no '{need}' — expected the "
                             "reference's checkpoint.pt layout")
    gcfg = infer_generator_config(ck["generator"])
    cfg = _cfg_from_generator(gcfg)
    if vocab_size is not None:
        cfg = dataclasses.replace(cfg, text_encoder=dataclasses.replace(
            cfg.text_encoder, vocab_size=vocab_size))
    # Record the ACTUAL seed the imported RNG stream derives from — a
    # config.json claiming the default while state.rng came from another
    # seed would either trip verify_config on resume (--seed given) or
    # silently misdocument the stream (--seed omitted).
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, seed=seed,
        **({"batch_size": batch_size} if batch_size is not None else {})))
    g_params = convert_torch_generator_state_dict(ck["generator"], gcfg)
    d_params = convert_torch_discriminator_state_dict(ck["discriminator"],
                                                      cfg.discriminator)

    g_tx, d_tx = make_optimizers(cfg)
    g_m = _adam_moments(ck["g_optimizer"], ck["generator"],
                        lambda sd: convert_torch_generator_state_dict(
                            sd, gcfg))
    d_m = _adam_moments(ck["d_optimizer"], ck["discriminator"],
                        lambda sd: convert_torch_discriminator_state_dict(
                            sd, cfg.discriminator))
    # Our step counter counts train steps == G updates == the G Adam count.
    step = g_m[2] if g_m is not None else 0
    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=_inject_adam(g_tx.init(g_params), g_m),
        d_opt_state=_inject_adam(d_tx.init(d_params), d_m),
        g_ema_params=jax.tree.map(jnp.copy, g_params),
        rng=jax.random.fold_in(jax.random.PRNGKey(seed), int(ck["epoch"])),
    )
    histories = {k: [float(v) for v in ck.get(k, [])]
                 for k in ("g_losses", "d_losses", "d_gp_losses",
                           "txtimg_losses", "is_scores", "fid_scores")}
    mgr = CheckpointManager(out_dir)
    mgr.save(int(ck["epoch"]), state, histories, config=cfg)
    print(f"Imported training checkpoint {ckpt_path} (epoch "
          f"{int(ck['epoch']) + 1}, step {step}) -> {out_dir}")
    return int(ck["epoch"])


# -- export (the inverse direction): framework pytrees -> reference-format
# torch state_dicts, so TPU-trained weights run under the reference's own
# torch tooling (e.g. its evaluation scripts — relevant to the FID-parity
# validation procedure, tools/validate_pretrained.py).

def _j2t(x):
    import torch

    return torch.from_numpy(np.asarray(x).copy())


def _exp_lin(sd: Dict, prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = _j2t(p["w"]).t().contiguous()
    if "b" in p:
        sd[f"{prefix}.bias"] = _j2t(p["b"])


def _exp_conv(sd: Dict, prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = _j2t(p["w"]).permute(3, 2, 0, 1).contiguous()
    if "b" in p:
        sd[f"{prefix}.bias"] = _j2t(p["b"])


def _exp_affine(sd: Dict, prefix: str, p: Params) -> None:
    for mlp in ("gamma_mlp", "beta_mlp"):
        _exp_lin(sd, f"{prefix}.{mlp}.0", p[mlp][0])
        _exp_lin(sd, f"{prefix}.{mlp}.2", p[mlp][1])


def export_generator_state_dict(params: Params) -> Dict:
    """This framework's G pytree -> a reference-loadable state_dict
    (`Generator.load_state_dict`-compatible, `src/generator/model.py`)."""
    sd: Dict = {}
    _exp_lin(sd, "linear_in", params["linear_in"])
    names = [f"res_blocks.{i}"
             for i in range(len(params["blocks"]) - 1)] + ["res_block_out"]
    for name, bp in zip(names, params["blocks"]):
        _exp_affine(sd, f"{name}.fusion_block_1", bp["affine_1"])
        _exp_affine(sd, f"{name}.fusion_block_2", bp["affine_2"])
        _exp_conv(sd, f"{name}.conv_1", bp["conv_1"])
        _exp_affine(sd, f"{name}.fusion_block_3", bp["affine_3"])
        _exp_affine(sd, f"{name}.fusion_block_4", bp["affine_4"])
        _exp_conv(sd, f"{name}.conv_2", bp["conv_2"])
        if "shortcut_conv" in bp:
            _exp_conv(sd, f"{name}.scale_conv", bp["shortcut_conv"])
        sd[f"{name}.gamma"] = _j2t(bp["gamma"]).reshape(1)
    _exp_conv(sd, "conv_out.1", params["conv_out"])
    return sd


def export_discriminator_state_dict(params: Params) -> Dict:
    """This framework's D pytree -> a reference-loadable state_dict
    (`Discriminator.load_state_dict`-compatible,
    `src/discriminator/model.py`)."""
    sd: Dict = {}
    _exp_conv(sd, "img_forward.0", params["conv_stem"])
    for i, bp in enumerate(params["blocks"]):
        p = f"img_forward.{i + 1}"
        _exp_conv(sd, f"{p}.residual_conv.0", bp["conv_1"])
        _exp_conv(sd, f"{p}.residual_conv.2", bp["conv_2"])
        if "shortcut_conv" in bp:
            _exp_conv(sd, f"{p}.scale_conv", bp["shortcut_conv"])
        sd[f"{p}.gamma"] = _j2t(bp["gamma"]).reshape(1)
    _exp_conv(sd, "img_sentence_forward.0", params["conv_joint"])
    _exp_conv(sd, "img_sentence_forward.2", params["conv_logit"])
    return sd


def export_generator_checkpoint(weights_dir: str, torch_path: str,
                                epoch: int = None, use_ema: bool = False
                                ) -> str:
    """One-shot export: a framework weights dir -> a reference `gen_N.pth`
    the torch `test_generate.py` stack loads directly."""
    import torch

    from ..train.checkpoint import CheckpointManager

    mgr = CheckpointManager(weights_dir)
    cfg = mgr.load_config()
    if cfg is None:
        raise FileNotFoundError(
            f"{weights_dir}/config.json missing — cannot rebuild the "
            "architecture; re-save with a current trainer or import first.")
    tree, epoch = mgr.restore_generator_tree(cfg.generator, epoch)
    params = tree["g_ema_params" if use_ema else "g_params"]
    torch.save(export_generator_state_dict(params), torch_path)
    print(f"Exported {weights_dir}/gen_{epoch}"
          f"{' (EMA)' if use_ema else ''} -> {torch_path}")
    return torch_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="convert reference torch weights to a framework "
                    "checkpoint directory (import) or back (export)")
    direction = ap.add_mutually_exclusive_group(required=True)
    direction.add_argument("--gen", help="IMPORT: path to the torch "
                                         "generator weights "
                                         "(gen_N.pth / checkpoint.pt)")
    direction.add_argument("--ckpt", help="IMPORT the FULL training state "
                                          "(G/D + Adam moments + epoch + "
                                          "histories) from a reference "
                                          "checkpoint.pt; train_entry "
                                          "auto-resumes from the result")
    direction.add_argument("--export", metavar="WEIGHTS_DIR",
                           help="EXPORT: framework weights dir to convert "
                                "back to a torch gen_N.pth")
    ap.add_argument("--out", required=True,
                    help="import: output weights directory (becomes "
                         "--weights for generate.py / serve.py); "
                         "export: output .pth path")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch to import as / export from "
                         "(default: 0 for import, latest for export)")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA generator instead of the raw one")
    ap.add_argument("--vocab-size", type=int, default=None,
                    help="--ckpt: dataset vocab for the resumed run's "
                         "config (not recorded in the torch checkpoint)")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="--ckpt: batch size for the resumed run's config")
    a = ap.parse_args()
    if a.ckpt and a.epoch is not None:
        ap.error("--epoch is not valid with --ckpt: the epoch comes from "
                 "the checkpoint.pt itself")
    if not a.ckpt and (a.vocab_size is not None or a.batch_size is not None):
        ap.error("--vocab-size/--batch-size only apply to --ckpt imports")
    if a.ema and not a.export:
        ap.error("--ema only applies to --export")
    if a.gen:
        import_generator_checkpoint(a.gen, a.out,
                                    epoch=0 if a.epoch is None else a.epoch)
    elif a.ckpt:
        import_training_checkpoint(a.ckpt, a.out, vocab_size=a.vocab_size,
                                   batch_size=a.batch_size)
    else:
        export_generator_checkpoint(a.export, a.out, epoch=a.epoch,
                                    use_ema=a.ema)
