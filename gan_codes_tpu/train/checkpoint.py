"""Checkpoint / resume via Orbax.

Capability parity with the reference's checkpoint contents
(`src/deep_fusion_gan/model.py:298-327`): per-epoch `checkpoint.pt` holding
epoch, G/D params, both optimizer states, and the six metric histories;
numbered checkpoints every N epochs; generator-only weights each epoch.
Improvements the build plan requires (SURVEY §5): the PRNG key and EMA
generator are saved too, so resume is bit-exact — the reference silently
loses RNG state across restarts.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.jsonio import restore_nonfinite, sanitize_nonfinite
from .state import TrainState

HISTORY_KEYS = ("g_losses", "d_losses", "d_gp_losses", "is_scores",
                "fid_scores", "txtimg_losses")

# Config fields that may legitimately differ between the run that wrote a
# checkpoint and the run resuming from it (extending training, moving the
# dataset, changing save cadence). Everything else changing silently would
# either crash on tree-structure mismatch or — worse — train with different
# semantics, so restore fails loudly on it.
CONFIG_RESUME_MUTABLE = frozenset({
    "train.num_epochs",
    "train.checkpoint_every_epochs",
    "train.numbered_checkpoint_every",
    "train.eval_use_ema",
    "train.eval_max_batches",
    "train.eval_every_epochs",
    "train.eval_sqrtm",
    "data.data_dir",
    # Pure-performance knobs — exact math (scheduling / rematerialization
    # budgets), so toggling them across a resume changes no semantics.
    "train.xla_scoped_vmem_kib",
    "generator.remat_blocks",
    "generator.lane_pad",
    "generator.lane_pad_min_ch",
    "discriminator.lane_pad",
    "discriminator.lane_pad_min_ch",
    "generator.image_pad",
    "train.image_pad",
    # Dispatch grouping only — each inner scan step is the full 3-phase
    # step on its own batch, so the training trajectory is unchanged.
    "train.steps_per_dispatch",
    # Logging cadence only — what gets WRITTEN to the metrics JSONL, not
    # what gets computed; the trajectory is unchanged.
    "train.log_every_steps",
    # Transfer scheduling only — moves device_put to a worker thread; the
    # step sequence and numerics are identical.
    "train.device_prefetch",
})


def empty_histories() -> Dict[str, List[float]]:
    return {k: [] for k in HISTORY_KEYS}


def _broadcast_json_from_primary(obj: Optional[Any]) -> Any:
    """Broadcast a small JSON-serializable object from process 0 to all
    processes (two collectives: payload length, then the padded payload as
    uint8). Single-process: identity."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    primary = jax.process_index() == 0
    payload = (np.frombuffer(
        json.dumps(sanitize_nonfinite(obj), allow_nan=False).encode(),
        dtype=np.uint8) if primary else np.zeros((0,), np.uint8))
    n = int(multihost_utils.broadcast_one_to_all(np.int32(payload.size)))
    buf = np.zeros((n,), np.uint8)
    if primary:
        buf[:] = payload
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return json.loads(out.tobytes().decode())


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def config_mismatches(saved: Dict[str, Any], current: Dict[str, Any]
                      ) -> List[str]:
    """Human-readable list of semantic config differences (allowlisted
    resume-mutable fields excluded)."""
    flat_saved, flat_cur = _flatten(saved), _flatten(current)
    lines = []
    for path in sorted(set(flat_saved) | set(flat_cur)):
        if path in CONFIG_RESUME_MUTABLE:
            continue
        a, b = flat_saved.get(path, "<absent>"), flat_cur.get(path, "<absent>")
        if a != b:
            lines.append(f"  {path}: checkpoint={a!r} current={b!r}")
    return lines


class CheckpointManager:
    """Thin wrapper: latest + numbered checkpoints + generator-only weights."""

    def __init__(self, directory: str, numbered_every: int = 10):
        self.directory = os.path.abspath(directory)
        self.numbered_every = numbered_every
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- full training checkpoints ------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, epoch: int, state: TrainState,
             histories: Dict[str, List[float]],
             config: Any = None) -> None:
        # Multi-host DP: orbax's Checkpointer.save is a COLLECTIVE — every
        # process must call it (it runs sync_global_processes barriers and
        # internally restricts filesystem writes to the primary host), so do
        # NOT gate it on process_index. Only the plain-JSON side files are
        # process-0-only.
        state = jax.device_get(state)
        latest = self._path("checkpoint")
        self._ckptr.save(latest, state, force=True)
        if (epoch + 1) % self.numbered_every == 0:
            self._ckptr.save(self._path(f"checkpoint_epoch_{epoch}"), state,
                             force=True)
        self.save_generator(epoch, state)
        # Block until the async Orbax writes finalize BEFORE publishing
        # histories.json: the side file is the resume commit point (it names
        # the epoch restore() returns), so it must never land ahead of the
        # state it describes — a crash in that window would pair epoch-N
        # histories with epoch-(N-1) params and resume would silently skip an
        # epoch. With this ordering a crash mid-save leaves the previous
        # epoch's histories.json, and resume replays the epoch (at-least-once
        # semantics, never skip). Waiting here also prevents a save racing
        # interpreter shutdown from leaving *.orbax-checkpoint-tmp corpses.
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            self._write_json("histories.json", {"epoch": epoch, **histories})
            if config is not None:
                self.save_config(config)

    def save_config(self, config: Any) -> None:
        """Persist the run's GANConfig as config.json (atomic write) so
        inference entry points can rebuild the exact model later
        (`load_config`). Public so importers/tools don't reach into the
        private JSON helper."""
        self._write_json("config.json", dataclasses.asdict(config))

    def save_generator(self, epoch: int, state: TrainState) -> None:
        """Generator-only weights for inference (`model.py:321-327`),
        including the EMA copy. Collective like save() — every process must
        call it."""
        gen_tree = {"g_params": jax.device_get(state.g_params),
                    "g_ema_params": jax.device_get(state.g_ema_params)}
        self._ckptr.save(self._path(f"gen_{epoch}"), gen_tree, force=True)
        # Orbax saves are async; block so a direct save_generator() caller
        # (not going through save(), which waits at its end) can rely on
        # the files existing on return.
        self._ckptr.wait_until_finished()

    def _write_json(self, name: str, obj: Any) -> None:
        """Atomic JSON write: a crash mid-write must not leave a truncated
        file that a later resume would choke on. Non-finite floats (the FID
        inf sentinel) are stringified — bare `Infinity` tokens are invalid
        JSON and break strict consumers (utils/jsonio.py)."""
        tmp = self._path(name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(sanitize_nonfinite(obj), f, allow_nan=False)
        os.replace(tmp, self._path(name))

    def has_checkpoint(self) -> bool:
        """Collective resume decision under multi-host DP.

        Process 0 (the host that writes histories.json) inspects the
        filesystem and broadcasts the verdict, so every host takes the same
        branch — if each host trusted its own view, a host whose view lags
        (or a non-shared checkpoint dir) would start fresh while process 0
        restores, and the lockstep GSPMD state would silently diverge.
        Orbax itself requires the checkpoint directory to be on a shared
        filesystem for multi-host restore (PARITY.md notes this)."""
        local = os.path.exists(self._path("checkpoint")) and \
            os.path.exists(self._path("histories.json"))
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        return bool(multihost_utils.broadcast_one_to_all(
            np.int32(local if jax.process_index() == 0 else 0)))

    def load_config(self):
        """The `GANConfig` this checkpoint was trained with, or None when the
        checkpoint predates config persistence. Lets inference entry points
        (`generate.py`, `serve.py`) rebuild the exact model the gen_N trees
        belong to instead of assuming the 256px default — a 32px-trained
        checkpoint would otherwise fail restore on a tree-structure mismatch
        (7 vs 4 G blocks)."""
        path = self._path("config.json")
        if not os.path.exists(path):
            return None
        from ..config import GANConfig

        with open(path) as f:
            return GANConfig.from_dict(json.load(f))

    def resolve_inference_config(self, vocab_size: int,
                                 image_size: Optional[int] = None):
        """The config an inference entry point should rebuild the model
        with: the checkpoint's persisted config.json when present (the
        reference's 256px default otherwise), with vocab following the
        data dir's captions.pickle (reference `test_generate.py:30-34`
        semantics). An explicit `image_size` is validated against the
        trained size for config-bearing checkpoints (the block ladder
        derives from it, so a different size cannot restore) and selects
        the architecture only for pre-config dirs."""
        from ..config import GANConfig

        cfg = self.load_config()
        if cfg is None:
            return GANConfig.for_image_size(image_size or 256,
                                            vocab_size=vocab_size)
        if image_size is not None and \
                image_size != cfg.generator.image_size:
            # The block ladder derives from image_size, so weights trained
            # at one size cannot restore into another — fail HERE with the
            # real reason instead of a deep Orbax tree-structure error.
            raise ValueError(
                f"This checkpoint was trained at "
                f"{cfg.generator.image_size}px (config.json); it cannot be "
                f"served at {image_size}px. Drop --image-size (the size "
                "comes from the checkpoint), or use a weights dir without "
                "config.json to force an architecture.")
        if cfg.text_encoder.vocab_size != vocab_size:
            cfg = dataclasses.replace(
                cfg, text_encoder=dataclasses.replace(
                    cfg.text_encoder, vocab_size=vocab_size))
        return cfg

    def verify_config(self, config: Any) -> None:
        """Fail loudly if `config` differs semantically from the config the
        checkpoint was written with (resume-mutable fields excluded).

        A mismatched config would otherwise either crash deep inside Orbax on
        a tree-structure mismatch or silently resume training with different
        semantics. No-op when the checkpoint predates config persistence.

        Multi-host: the verdict is computed on process 0 (the host that wrote
        config.json) and broadcast, so every host raises — or proceeds into
        the collective restore — together. If each host decided from its own
        filesystem view, a host with a stale view would enter the collective
        restore while process 0 raised, deadlocking the rest."""
        if config is None:
            return
        from ..config import GANConfig
        if jax.process_count() == 1 or jax.process_index() == 0:
            path = self._path("config.json")
            if os.path.exists(path):
                with open(path) as f:
                    saved = json.load(f)
                # Round-trip the saved dict through GANConfig so fields added
                # AFTER the checkpoint was written take their dataclass
                # default (the semantics the old code actually ran with)
                # instead of registering as "<absent>" mismatches. A current
                # run that sets such a field to a non-default value is still
                # a genuine mismatch and still raises.
                saved = dataclasses.asdict(GANConfig.from_dict(saved))
                lines = config_mismatches(saved, dataclasses.asdict(config))
            else:
                lines = []
        else:
            lines = None
        lines = _broadcast_json_from_primary(lines)
        if lines:
            raise ValueError(
                "Config mismatch between the checkpoint in "
                f"{self.directory} and the current run:\n" + "\n".join(lines)
                + "\nRebuild the run with the checkpoint's config (or use a "
                "fresh checkpoint directory).")

    def restore(self, template: TrainState
                ) -> Tuple[TrainState, int, Dict[str, List[float]]]:
        """Restore (state, last_completed_epoch, histories). `template` is an
        abstract/concrete TrainState with the right structure.

        Multi-host: the Orbax restore is collective; histories/epoch are read
        by process 0 (their author) and broadcast, so every host resumes
        from the identical epoch even if its own view of the side file is
        stale or missing."""
        state = self._ckptr.restore(self._path("checkpoint"), template)
        if jax.process_count() == 1 or jax.process_index() == 0:
            with open(self._path("histories.json")) as f:
                blob = json.load(f)
        else:
            blob = None
        blob = restore_nonfinite(_broadcast_json_from_primary(blob))
        epoch = int(blob.pop("epoch"))
        histories = {k: list(blob.get(k, [])) for k in HISTORY_KEYS}
        return state, epoch, histories

    def latest_generator_epoch(self) -> Optional[int]:
        epochs = []
        for name in os.listdir(self.directory):
            if name.startswith("gen_"):
                try:
                    epochs.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None

    def restore_generator(self, epoch: int, template: Any) -> Any:
        """Restore {'g_params': ..., 'g_ema_params': ...} for inference."""
        return self._ckptr.restore(self._path(f"gen_{epoch}"), template)

    def restore_generator_tree(self, generator_cfg: Any,
                               epoch: Optional[int] = None) -> Any:
        """Build the {'g_params','g_ema_params'} template from the
        generator config and restore it — the shared inference restore
        used by generate.py / serve.py / the torch exporter. `epoch=None`
        restores the latest gen_N."""
        from ..models.generator import init_generator

        if epoch is None:
            epoch = self.latest_generator_epoch()
            if epoch is None:
                raise FileNotFoundError(
                    f"No generator weights (gen_N) found in {self.directory}")
        elif not os.path.exists(self._path(f"gen_{epoch}")):
            raise FileNotFoundError(
                f"No gen_{epoch} in {self.directory} (latest is "
                f"gen_{self.latest_generator_epoch()})")
        template = jax.eval_shape(
            lambda k: {"g_params": init_generator(k, generator_cfg),
                       "g_ema_params": init_generator(k, generator_cfg)},
            jax.random.PRNGKey(0))
        return self.restore_generator(epoch, template), epoch
