"""The training engine: epoch loop, eval, checkpointing, sample dumps.

Capability parity with `DeepFusionGAN` (`src/deep_fusion_gan/model.py:20-387`):
owns G/D/frozen-text-encoder, TTUR Adam optimizers, runs the 3-phase step per
batch, per-epoch IS/FID on up to `eval_max_batches` test batches, saves
sample grids + prompt-titled figures, full checkpoints (resume-safe incl. RNG
and EMA — the reference loses RNG state), and prints the same per-epoch
metric line.

TPU-native: one jitted step per batch with donated state (zero host round
trips besides the input feed), uint8 batches normalized on device, metrics
fetched once per epoch, background-prefetched input pipeline.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GANConfig
from ..eval.metrics import compute_is_fid
from ..models.generator import generator_apply
from ..models.text_encoder import text_encoder_apply
from ..utils import image_io
from ..utils.profiling import MetricsLogger
from .checkpoint import CheckpointManager, empty_histories
from .state import TrainState, create_train_state
from .step import make_train_step

Params = Any


class Trainer:
    def __init__(self, cfg: GANConfig, text_encoder_params: Params,
                 checkpoint_dir: str, image_dir: str,
                 code2word: Optional[Dict[int, str]] = None,
                 inception_params: Optional[Params] = None,
                 seed: Optional[int] = None, mesh=None):
        """`mesh`: a jax.sharding.Mesh with a `cfg.train.data_axis` axis for
        data-parallel training (BASELINE config 4) — state replicated, batch
        sharded, psum over ICI. None = single device."""
        self.cfg = cfg
        self.mesh = mesh
        self.image_dir = image_dir
        self.code2word = code2word  # wired from the dataset (`train.py:31`)
        self.inception_params = inception_params
        os.makedirs(image_dir, exist_ok=True)

        self.ckpt = CheckpointManager(checkpoint_dir,
                                      cfg.train.numbered_checkpoint_every)
        self.metrics_log = MetricsLogger(
            os.path.join(checkpoint_dir, "metrics_log.jsonl"))

        seed = cfg.train.seed if seed is None else seed
        init_key = jax.random.PRNGKey(seed)
        # jit the init: one compiled program instead of hundreds of tiny ones
        self.state: TrainState = jax.jit(
            lambda k: create_train_state(k, cfg))(init_key)

        if mesh is not None:
            from ..parallel.dp import (make_parallel_scanned_train_step,
                                       make_parallel_train_step, replicate)

            self.state = replicate(mesh, self.state)
            self.text_encoder_params = replicate(mesh, text_encoder_params)
            self._step_fn = make_parallel_train_step(cfg, mesh)
            if cfg.train.steps_per_dispatch > 1:
                self._multi_fn = make_parallel_scanned_train_step(cfg, mesh)
        else:
            self.text_encoder_params = jax.device_put(text_encoder_params)
            from .step import (make_jitted_scanned_train_step,
                               make_jitted_train_step)

            self._step_fn = make_jitted_train_step(cfg)
            if cfg.train.steps_per_dispatch > 1:
                self._multi_fn = make_jitted_scanned_train_step(cfg)
        self._normalize = jax.jit(
            lambda u8: u8.astype(jnp.float32) / 127.5 - 1.0)
        self._sample_fn = jax.jit(
            lambda g_params, noise, sents: generator_apply(
                g_params, cfg.generator, noise, sents))
        # params go through jit ARGUMENTS, never closure captures: captured
        # device arrays embed as literals in the remote-compile payload
        # (CLAUDE.md relay rule 4; serve.py's pipeline does the same).
        self._encode_fn = jax.jit(
            lambda te_params, caps, lens: text_encoder_apply(
                te_params, cfg.text_encoder, caps, lens))
        self._eval_base = jax.random.PRNGKey(seed + 1)
        # cached (test_loader, multihost, payload) for the real FID side,
        # see _cached_real_side()
        self._real_fid_stats = None
        self._eval_rng = self._eval_base
        # per-step scalar series of the last train_epoch (only retained when
        # cfg.train.log_every_steps > 0; consumed by fit's step-row flush)
        self._last_step_series = None
        self._use_scipy_sqrtm = cfg.train.eval_sqrtm != "newton_schulz"

    def close(self) -> None:
        """Release the JSONL log file handle (idempotent)."""
        self.metrics_log.close()

    # ------------------------------------------------------------------

    def _device_batch(self, batch):
        if self.mesh is not None:
            from ..parallel.dp import shard_batch

            images, captions, cap_lens = shard_batch(
                self.mesh, self.cfg, batch["images"], batch["captions"],
                batch["cap_lens"])
        else:
            images = jax.device_put(batch["images"])
            captions = jax.device_put(batch["captions"])
            cap_lens = jax.device_put(batch["cap_lens"])
        if images.dtype == jnp.uint8:
            images = self._normalize(images)
        return images, captions, cap_lens

    def _step_single(self, batch) -> Dict[str, jnp.ndarray]:
        """One per-batch dispatch of the 3-phase step (the default path)."""
        images, captions, cap_lens = self._device_batch(batch)
        self.state, metrics = self._step_fn(
            self.state, self.text_encoder_params, images, captions, cap_lens)
        return metrics

    def _step_stacked(self, batches) -> Dict[str, jnp.ndarray]:
        """One `steps_per_dispatch` device-loop dispatch: stack the host
        batches on a leading scan axis and run them through the scanned step
        (train/step.py::make_scanned_train_step). Returned metric leaves are
        stacked `[n]` — one value per inner step."""
        images = np.stack([np.asarray(b["images"]) for b in batches])
        captions = np.stack([np.asarray(b["captions"]) for b in batches])
        cap_lens = np.stack([np.asarray(b["cap_lens"]) for b in batches])
        if self.mesh is not None:
            from ..parallel.dp import shard_batch_stack

            images, captions, cap_lens = shard_batch_stack(
                self.mesh, self.cfg, images, captions, cap_lens)
        else:
            images = jax.device_put(images)
            captions = jax.device_put(captions)
            cap_lens = jax.device_put(cap_lens)
        if images.dtype == jnp.uint8:
            images = self._normalize(images)
        self.state, metrics = self._multi_fn(
            self.state, self.text_encoder_params, images, captions, cap_lens)
        return metrics

    def train_epoch(self, train_loader) -> Dict[str, float]:
        metric_accum: Dict[str, List[jnp.ndarray]] = {}

        def accum(metrics):
            for k, v in metrics.items():
                metric_accum.setdefault(k, []).append(v)

        n_disp = self.cfg.train.steps_per_dispatch
        if n_disp > 1:
            # Device loop: group batches into full chunks of n_disp; the
            # ragged tail (or any mid-epoch batch-size change) falls back to
            # the single-step program IN ORDER, so the step sequence — and
            # therefore the training trajectory — is identical to n_disp=1.
            chunk: list = []

            def flush():
                nonlocal chunk
                if len(chunk) == n_disp:
                    accum(self._step_stacked(chunk))
                else:
                    for b in chunk:
                        accum(self._step_single(b))
                chunk = []

            def shapes(b):
                return (b["images"].shape, b["captions"].shape,
                        b["cap_lens"].shape)

            for batch in train_loader:
                # Key the chunk guard on FULL array shapes, not just batch
                # length: a loader emitting a different caption pad width
                # mid-epoch would otherwise reach np.stack and raise there
                # instead of taking the single-step fallback.
                if chunk and shapes(batch) != shapes(chunk[0]):
                    flush()
                chunk.append(batch)
                if len(chunk) == n_disp:
                    flush()
            flush()
        elif self.cfg.train.device_prefetch and jax.process_count() == 1:
            # One-ahead threaded upload (TrainConfig.device_prefetch):
            # batch i+1's device_put overlaps batch i's (async-dispatched)
            # step — the win on transfer-bound links. Identical step
            # sequence; only the transfer timing moves off the main thread.
            from concurrent.futures import ThreadPoolExecutor

            def run_staged(fut):
                images, captions, cap_lens = fut.result()
                self.state, metrics = self._step_fn(
                    self.state, self.text_encoder_params, images,
                    captions, cap_lens)
                accum(metrics)

            with ThreadPoolExecutor(1) as uploader:
                fut = None
                for batch in train_loader:
                    nxt = uploader.submit(self._device_batch, batch)
                    if fut is not None:
                        run_staged(fut)
                    fut = nxt
                if fut is not None:
                    run_staged(fut)
        else:
            for batch in train_loader:
                accum(self._step_single(batch))
        # single host sync for the whole epoch; each metric stream flattens
        # to one value per STEP (stacked-dispatch entries contribute n each)
        active = metric_accum.pop("d_gp_active", None)
        out = {k: np.concatenate([np.ravel(x) for x in jax.device_get(v)])
               for k, v in metric_accum.items()}
        means = {k: float(np.mean(v)) for k, v in out.items()}
        # Per-step scalar series for fit()'s optional step-row logging
        # (TrainConfig.log_every_steps): the SAME host fetch as the means —
        # keeping a reference costs nothing extra.
        self._last_step_series = dict(out) \
            if self.cfg.train.log_every_steps > 0 else None
        if active is not None:
            # Lazy regularization (gp_interval > 1): average d_gp_loss over
            # the steps where the GP phase actually ran. The step already
            # normalizes the logged value back to the reference coefficient
            # (step.py divides the k-scaled penalty by k), so this masked
            # mean equals the reference's per-step coef*mean(norm^p) at any
            # cadence. (A plain mean over ALL steps of the k-scaled value
            # would coincidentally match too — the k coefficient and 1/k
            # frequency cancel — but only for the mean, not per-step logs.)
            mask = np.concatenate([np.ravel(x)
                                   for x in jax.device_get(active)])
            if self._last_step_series is not None:
                self._last_step_series["d_gp_active"] = mask
            n_active = float(mask.sum())
            means["d_gp_loss"] = (
                float((out["d_gp_loss"] * mask).sum() / n_active)
                if n_active > 0 else 0.0)
        return means

    def _flush_step_rows(self, epoch: int) -> None:
        """Write every `log_every_steps`-th step's scalars as `kind="step"`
        JSONL rows (SURVEY §5 "structured per-step scalars"). Called at epoch
        end on process 0, BEFORE the epoch row so rows stay time-ordered.
        The rows carry `epoch` so a resume's `truncate_from(start_epoch)`
        drops replayed step rows together with their epoch row; per-epoch
        consumers (tools/longrun.py, plotting) filter on `kind`/key presence
        and are unaffected when the knob is off (the default)."""
        series = self._last_step_series
        k = self.cfg.train.log_every_steps
        if not series or k <= 0:
            return
        n = len(next(iter(series.values())))
        first = int(self.state.step) - n  # global step idx before this epoch
        for i in range(k - 1, n, k):
            self.metrics_log.log(
                first + i + 1, kind="step", epoch=epoch,
                **{key: float(v[i]) for key, v in series.items()})
        self._last_step_series = None

    # ------------------------------------------------------------------

    def _fresh_noise(self, batch: int) -> jnp.ndarray:
        self._eval_rng, k = jax.random.split(self._eval_rng)
        return jax.random.normal(k, (batch, self.cfg.generator.latent_dim))

    def generate(self, captions, cap_lens, use_ema: bool = False,
                 noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Encode captions + run G; the `sample.py:13-18` path."""
        sents = self._encode_fn(self.text_encoder_params,
                                jnp.asarray(captions), jnp.asarray(cap_lens))
        if noise is None:
            noise = self._fresh_noise(sents.shape[0])
        params = self.state.g_ema_params if use_ema else self.state.g_params
        return self._sample_fn(params, noise, sents)

    def evaluate(self, test_loader,
                 use_ema: bool = False) -> Tuple[float, float, Any, Any, Any]:
        """Per-epoch eval (`model.py:239-280`): generate fakes for up to
        `eval_max_batches` test batches, compute IS + FID. `use_ema=True`
        evaluates the EMA generator (BASELINE config 5)."""
        reals, fakes = [], []
        last = None
        for i, batch in enumerate(test_loader):
            if i >= self.cfg.train.eval_max_batches:
                break
            images, captions, cap_lens = self._device_batch(batch)
            fake = self.generate(captions, cap_lens, use_ema=use_ema)
            # host-local views: under multi-host DP the arrays are globally
            # sharded and np.asarray on non-addressable shards raises; each
            # host evaluates its own shard (IS/FID are set statistics, so
            # within-batch shard order is irrelevant)
            reals.append(self._to_host(images))
            fakes.append(self._to_host(fake))
            last = (fakes[-1], batch["captions"], batch["cap_lens"])
        # Reference failure sentinels (`src/evaluation/metrics.py:58-60,
        # 113-118`): IS baseline 1.0, FID inf. Used when inception weights
        # are absent / eval has no data — 0.0 would read as a perfect FID
        # in plots and logs. Under multi-host DP with inception weights we
        # must NOT early-return: the other processes are heading into the
        # collective moment reduction, and a host that skips it deadlocks
        # them — an empty shard contributes n=0 moments instead (the
        # summed statistics still cover the union).
        multihost_eval = (self.inception_params is not None
                          and jax.process_count() > 1)
        if not fakes and not multihost_eval:
            return 1.0, float("inf"), None, None, None

        s = self.cfg.generator.image_size
        empty = np.zeros((0, s, s, 3), np.float32)
        fake_all = np.concatenate(fakes) if fakes else empty
        real_all = np.concatenate(reals) if reals else empty
        is_score, fid_score = 1.0, float("inf")
        # The test loader is deterministic (shuffle=False, augment=False),
        # so the real-side FID stats are identical every epoch — compute
        # once and reuse (halves per-epoch inception cost, same values).
        # Cache only when the real side is genuinely deterministic:
        # unshuffled AND un-augmented (augment re-draws per-item seeds
        # every epoch, changing the real images under the cache). Keyed on
        # the loader object: a different test_loader must not reuse another
        # set's stats.
        deterministic = (
            getattr(test_loader, "shuffle", True) is False
            and getattr(getattr(test_loader, "dataset", None),
                        "augment", True) is False)
        if self.inception_params is not None:
            real_side = self._cached_real_side(test_loader, real_all,
                                               deterministic, multihost_eval)
            if multihost_eval:
                # Multi-host DP: every process computes moments of ITS eval
                # shard; the moments are summed across processes
                # (compute_is_fid_multihost) so the scores cover the FULL
                # eval set — single-host semantics (`src/deep_fusion_gan/
                # model.py:239-280`) at any host count, identical on every
                # process (which keeps each host's histories coherent).
                from ..eval.metrics import compute_is_fid_multihost
                is_score, fid_score = compute_is_fid_multihost(
                    self.inception_params, fake_all, real_all,
                    real_moments=real_side,
                    use_scipy_sqrtm=self._use_scipy_sqrtm)
            else:
                is_score, fid_score = compute_is_fid(
                    self.inception_params, fake_all, real_all,
                    real_stats=real_side,
                    use_scipy_sqrtm=self._use_scipy_sqrtm)
            if jax.process_index() == 0:
                print(f"Computed IS: {is_score:.4f}, FID: {fid_score:.4f}")
        return is_score, fid_score, *(last or (None, None, None))

    def _cached_real_side(self, test_loader, real_all, deterministic: bool,
                          multihost: bool):
        """Cached real-side FID representation for the active eval mode:
        summable activation MOMENTS under multi-host DP, (mu, sigma) stats
        single-host. A deterministic test loader yields identical real images
        every epoch, so the real side is computed once and reused (halves
        per-epoch inception cost, same values). Keyed on (loader object,
        mode): a different test_loader must not reuse another set's stats,
        and a mode flip must not feed a moments dict where a (mu, sigma)
        tuple is expected. Returns None when caching doesn't apply (the FID
        path then computes the real side itself). The multi-host path never
        raises here — NaN presence travels inside the moments as a reduced
        flag (distributed hygiene, see eval/metrics.py)."""
        if not deterministic:
            return None
        from ..eval import metrics
        cached = self._real_fid_stats
        if (cached is None or cached[0] is not test_loader
                or cached[1] != multihost):
            if multihost:
                payload = metrics.activation_moments(
                    self.inception_params, real_all)
            else:
                try:
                    # acts ride along so compute_fid can take its exact
                    # low-rank cross-term path every epoch
                    payload = metrics.activation_stats(
                        self.inception_params, real_all, return_acts=True)
                except FloatingPointError:
                    # Deterministic loader -> same NaN next epoch; cache the
                    # miss and let compute_fid trip its own inf sentinel.
                    payload = None
            self._real_fid_stats = (test_loader, multihost, payload)
        return self._real_fid_stats[2]

    # ------------------------------------------------------------------

    @staticmethod
    def _to_host(arr) -> np.ndarray:
        """Process-local numpy view of a possibly globally-sharded array.

        Shards are sorted by their global batch offset: addressable_shards
        iterates in device-assignment order, which only coincidentally
        matches batch order for a trivially-reshaped mesh — a permuted
        assignment (e.g. mesh_utils ICI topologies) would otherwise pair
        fakes with the wrong captions downstream."""
        if jax.process_count() == 1:
            return np.asarray(jax.device_get(arr))
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])

    def _save_samples(self, fake, captions, cap_lens, epoch: int) -> None:
        """Per-epoch image dumps (`model.py:329-387`). Process-0-only under
        multi-host (every process passes host-local data; one writes)."""
        if jax.process_index() != 0:
            return
        try:
            fake_np = np.asarray(jax.device_get(fake))
            prompts = [image_io.decode_caption(captions[i], cap_lens[i],
                                               self.code2word)
                       for i in range(min(4, fake_np.shape[0]))]
            image_io.save_images_with_prompts(
                fake_np, prompts,
                os.path.join(self.image_dir,
                             f"samples_with_text_epoch_{epoch}.jpg"))
            image_io.save_image_grid(
                fake_np, os.path.join(self.image_dir,
                                      f"fake_sample_epoch_{epoch}.png"))
        except Exception as e:
            print(f"Error saving images with text: {e}")

    # ------------------------------------------------------------------

    def fit(self, train_loader, test_loader=None,
            num_epochs: Optional[int] = None, start_epoch: int = 0,
            histories: Optional[Dict[str, List[float]]] = None,
            auto_resume: bool = True) -> Dict[str, List[float]]:
        num_epochs = num_epochs or self.cfg.train.num_epochs
        histories = histories if histories is not None else empty_histories()

        if auto_resume and start_epoch == 0 and self.ckpt.has_checkpoint():
            self.ckpt.verify_config(self.cfg)  # loud fail on semantic drift
            self.state, last_epoch, histories = self.ckpt.restore(self.state)
            start_epoch = last_epoch + 1
            print(f"Resuming from epoch {start_epoch}")
            # restored-metric print parity (`model.py:127-128`)
            if histories.get("fid_scores"):
                print(f"Last checkpoint FID: {histories['fid_scores'][-1]:.4f}, "
                      f"IS: {histories['is_scores'][-1]:.4f}")

        # Epochs >= start_epoch are about to be (re)played — drop their stale
        # rows so the JSONL keeps one row per epoch (tools/longrun.py and
        # plotting rely on that). Unconditional: a crash BEFORE the first
        # checkpoint restarts with start_epoch=0 and no resume branch, yet
        # may already have logged rows.
        if jax.process_index() == 0:
            self.metrics_log.truncate_from(start_epoch)

        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            # Epoch-keyed data order + eval noise: a killed-and-resumed run is
            # bit-identical to an uninterrupted one (test_e2e asserts this).
            # The EVAL loader is pinned too: its per-item seeds drive caption
            # choice, so an unpinned auto-advancing epoch would restart at 0
            # on resume and change logged IS/FID + sample grids.
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            if test_loader is not None and hasattr(test_loader, "set_epoch"):
                test_loader.set_epoch(epoch)
            self._eval_rng = jax.random.fold_in(self._eval_base, epoch)
            epoch_metrics = self.train_epoch(train_loader)

            histories["g_losses"].append(epoch_metrics.get("g_loss", 0.0))
            histories["d_losses"].append(epoch_metrics.get("d_loss", 0.0))
            histories["d_gp_losses"].append(epoch_metrics.get("d_gp_loss", 0.0))
            histories["txtimg_losses"].append(
                epoch_metrics.get("txtimg_loss", 0.0))

            eval_loader = test_loader if test_loader is not None else train_loader
            # Eval cadence (TrainConfig.eval_every_epochs): skipped epochs
            # record the reference failure sentinels so histories stay
            # one-entry-per-epoch; the final epoch always evaluates.
            # 0 = only the final epoch (matching the 0-is-off convention of
            # the sibling knobs).
            k_eval = self.cfg.train.eval_every_epochs
            if ((k_eval > 0 and (epoch + 1) % k_eval == 0)
                    or epoch == num_epochs - 1):
                is_score, fid_score, fake, caps, lens = self.evaluate(
                    eval_loader, use_ema=self.cfg.train.eval_use_ema)
            else:
                is_score, fid_score, fake, caps, lens = (
                    1.0, float("inf"), None, None, None)
            histories["is_scores"].append(is_score)
            histories["fid_scores"].append(fid_score)

            if fake is not None:
                self._save_samples(fake, caps, lens, epoch)
            # Reference saves every epoch (`model.py:300-312`); with
            # checkpoint_every_epochs=k only every k-th (and the final)
            # epoch is saved — a crash then replays at most k-1 epochs
            # (resume stays bit-exact: the loader streams are epoch-keyed).
            # Useful when the save dominates epoch wall time (remote-relay
            # dev setup: ~380MB/epoch; see artifacts/longrun). Numbered-
            # checkpoint epochs still save regardless, so the gen_N cadence
            # (ckpt.numbered_every) is independent of this knob.
            every = self.cfg.train.checkpoint_every_epochs
            if ((epoch + 1) % every == 0 or epoch == num_epochs - 1
                    or (epoch + 1) % self.ckpt.numbered_every == 0):
                self.ckpt.save(epoch, self.state, histories, config=self.cfg)

            dt = time.time() - t0
            if jax.process_index() == 0:
                self._flush_step_rows(epoch)
                self.metrics_log.log(
                    int(self.state.step), epoch=epoch, epoch_seconds=dt,
                    g_loss=histories["g_losses"][-1],
                    d_loss=histories["d_losses"][-1],
                    d_gp_loss=histories["d_gp_losses"][-1],
                    txtimg_loss=histories["txtimg_losses"][-1],
                    is_score=is_score, fid_score=fid_score)
            print(f"Epoch {epoch + 1}: "
                  f"G Loss: {histories['g_losses'][-1]:.4f}, "
                  f"D Loss: {histories['d_losses'][-1]:.4f}, "
                  f"D GP Loss: {histories['d_gp_losses'][-1]:.4f}, "
                  f"Text-Image Loss: {histories['txtimg_losses'][-1]:.4f}, "
                  f"IS: {is_score:.4f}, FID: {fid_score:.4f} "
                  f"[{dt:.1f}s]")

        return histories
