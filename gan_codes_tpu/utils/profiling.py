"""Tracing / profiling utilities.

The reference has no profiling beyond tqdm (`SURVEY.md §5`); the TPU build
provides `jax.profiler` trace capture around training plus lightweight
per-step wall timing.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard and simple stats."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p95_s": ts[int(n * 0.95)],
            "max_s": ts[-1],
        }


class MetricsLogger:
    """Structured JSONL metrics log (the reference wrote ad-hoc CSVs it then
    gitignored — `metrics_log.csv`, SURVEY.md §6)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def log(self, step: int, **scalars) -> None:
        from .jsonio import sanitize_nonfinite

        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            # Strings pass through (row tags like kind="step"); numbers are
            # floated, with non-finite values stringified (the FID inf
            # sentinel) — bare `Infinity` tokens are invalid JSON
            # (utils/jsonio.py).
            rec[k] = v if isinstance(v, str) else sanitize_nonfinite(float(v))
        self._fh.write(json.dumps(rec, allow_nan=False) + "\n")
        self._fh.flush()

    def truncate_from(self, epoch: float) -> None:
        """Drop rows with rec['epoch'] >= epoch.

        A resumed run replays the epochs after the last checkpoint (with
        `checkpoint_every_epochs > 1` up to k-1 of them); their old rows
        would otherwise duplicate and break one-row-per-epoch consumers.
        The rewrite goes through a temp file + atomic rename so a crash
        mid-truncate cannot lose the whole log."""
        self._fh.close()
        kept = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if rec.get("epoch", -1) < epoch:
                        kept.append(line)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(kept)
        os.replace(tmp, self.path)
        self._fh = open(self.path, "a")

    def close(self) -> None:
        self._fh.close()
