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

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

HISTORY_KEYS = ("g_losses", "d_losses", "d_gp_losses", "is_scores",
                "fid_scores", "txtimg_losses")


def empty_histories() -> Dict[str, List[float]]:
    return {k: [] for k in HISTORY_KEYS}


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
             histories: Dict[str, List[float]]) -> None:
        # Multi-host DP: orbax's Checkpointer.save is a COLLECTIVE — every
        # process must call it (it runs sync_global_processes barriers and
        # internally restricts filesystem writes to the primary host), so do
        # NOT gate it on process_index. Only the plain-JSON side file is
        # process-0-only.
        state = jax.device_get(state)
        latest = self._path("checkpoint")
        self._ckptr.save(latest, state, force=True)
        if jax.process_index() == 0:
            with open(self._path("histories.json"), "w") as f:
                json.dump({"epoch": epoch, **histories}, f)
        if (epoch + 1) % self.numbered_every == 0:
            self._ckptr.save(self._path(f"checkpoint_epoch_{epoch}"), state,
                             force=True)
        self.save_generator(epoch, state)
        # Block until async writes land: a save racing interpreter shutdown
        # leaves *.orbax-checkpoint-tmp corpses.
        self._ckptr.wait_until_finished()

    def save_generator(self, epoch: int, state: TrainState) -> None:
        """Generator-only weights for inference (`model.py:321-327`),
        including the EMA copy. Collective like save() — every process must
        call it."""
        gen_tree = {"g_params": jax.device_get(state.g_params),
                    "g_ema_params": jax.device_get(state.g_ema_params)}
        self._ckptr.save(self._path(f"gen_{epoch}"), gen_tree, force=True)

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._path("checkpoint")) and \
            os.path.exists(self._path("histories.json"))

    def restore(self, template: TrainState
                ) -> Tuple[TrainState, int, Dict[str, List[float]]]:
        """Restore (state, last_completed_epoch, histories). `template` is an
        abstract/concrete TrainState with the right structure."""
        state = self._ckptr.restore(self._path("checkpoint"), template)
        with open(self._path("histories.json")) as f:
            blob = json.load(f)
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
