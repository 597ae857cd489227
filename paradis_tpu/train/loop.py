"""Training orchestration: epochs/steps, validation, checkpoints, watchdogs.

The host-side loop around the jitted train step — the functional equivalent of
the reference's Lightning Trainer + LitParadis + callbacks
(``trainer.py``, ``utils/callbacks.py``, ``train.py``):

  * steps/epochs budget (``max_steps`` counts optimizer steps),
  * host-driven LR schedule written into the optimizer state each step,
  * validation every N steps or per epoch, with denormalized report RMSEs,
  * NaN/divergence watchdogs (StopOnNaNTrainLoss, EarlyStopping semantics),
  * three checkpoint retention policies + resume/weights-only restore,
  * per-step wall-time (``dt``) and samples/sec logging.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from paradis_tpu.data.dataset import ERA5Dataset
from paradis_tpu.data.pipeline import BatchLoader
from paradis_tpu.model.paradis import Paradis
from paradis_tpu.sphere.geometry import latitude_weights
from paradis_tpu.train.checkpoint import CheckpointManager, load_params
from paradis_tpu.train.loss import WeightedLoss
from paradis_tpu.train.optim import build_optimizer, build_schedule, set_learning_rate
from paradis_tpu.train.step import create_train_state, make_eval_step, make_train_step
from paradis_tpu.utils.logging import MetricsLogger, save_run_snapshot

log = logging.getLogger("paradis_tpu")


def _host_rss_mb() -> float:
    """Current resident set size in MB (from /proc; 0.0 where unavailable)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * (4096 / 1e6)
    except (OSError, ValueError, IndexError):
        return 0.0


def _jit_cache_size(fn) -> int:
    """Compiled-signature count of a jitted callable (retrace watch)."""
    try:
        return int(fn._cache_size())
    except Exception:
        return -1


class NaNLossError(RuntimeError):
    pass


class Trainer:
    """End-to-end training driver for a config."""

    def __init__(self, cfg, log_dir: str | None = None):
        self.cfg = cfg
        self.log_dir = Path(log_dir or cfg.training.log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)

        # -- data ------------------------------------------------------------
        self.train_ds = ERA5Dataset(
            cfg.dataset.root_dir,
            cfg.training.dataset.start_date,
            cfg.training.dataset.end_date,
            forecast_steps=int(cfg.model.forecast_steps),
            cfg=cfg,
            time_interval=cfg.dataset.sampling_interval,
            preload=bool(cfg.training.dataset.preload),
        )
        val_steps = int(cfg.model.get("val_forecast_steps") or cfg.model.forecast_steps)
        self.val_ds = ERA5Dataset(
            cfg.dataset.root_dir,
            cfg.training.validation_dataset.start_date,
            cfg.training.validation_dataset.end_date,
            forecast_steps=val_steps,
            cfg=cfg,
            time_interval=cfg.dataset.sampling_interval,
            preload=bool(cfg.training.validation_dataset.preload),
        )
        # device mesh: data-parallel batches + optional longitude sharding
        # (the reference's DDP analogue; reference train.py:44-49)
        self.mesh = None
        n_devices = int(cfg.compute.get("num_devices", 1))
        n_space = int(cfg.compute.get("spatial_devices", 1))
        n_nodes = int(cfg.compute.get("num_nodes", 1))
        if n_devices * n_space * n_nodes > 1:
            from paradis_tpu.distributed import batch_shardings, mesh_from_config

            self.mesh = mesh_from_config(cfg)
            log.info("device mesh: %s", dict(self.mesh.shape))
        # store/checkpoint/metrics writes happen on process 0 only (the
        # reference's rank-0 gating under DDP, trainer.py:478-485)
        self.is_main = jax.process_index() == 0

        bs = int(cfg.compute.batch_size)  # per data-shard, like the reference
        if self.mesh is not None:
            bs *= self.mesh.shape["data"]
        shardings = batch_shardings(self.mesh) if self.mesh is not None else None
        self.train_loader = BatchLoader(
            self.train_ds, bs, shuffle=True, seed=int(cfg.init.get("seed") or 0),
            drop_last=True, sharding=shardings, mesh=self.mesh,
        )
        self.val_loader = BatchLoader(self.val_ds, bs, shuffle=False, drop_last=True,
                                      sharding=shardings, mesh=self.mesh)

        # -- model/loss/optimizer ---------------------------------------------
        ds = self.train_ds
        self.model = Paradis.from_config(
            cfg,
            input_dim=ds.num_in_features,
            output_dim=ds.num_out_features,
            lat_deg=ds.lat,
            lon_deg=ds.lon,
            training=True,
        )
        self.loss_fn = WeightedLoss.from_config(cfg, ds.lat, ds.dyn_output_features,
                                                nlon=ds.lon_size)
        val_kind = cfg.training.loss_function.get("validation_loss", None)
        self.val_loss_fn = (
            WeightedLoss.from_config(cfg, ds.lat, ds.dyn_output_features,
                                     kind=val_kind, nlon=ds.lon_size)
            if val_kind else self.loss_fn
        )

        rng = jax.random.PRNGKey(int(cfg.init.get("seed") or 0))
        sample_in = jnp.zeros((1, ds.lat_size, ds.lon_size, ds.num_in_features),
                              jnp.float32)
        params = self.model.init(rng, sample_in)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        log.info("Number of trainable parameters: %s", f"{n_params:,}")
        self.num_parameters = n_params

        if cfg.init.checkpoint_path and not cfg.init.restart:
            log.info("loading weights from %s", cfg.init.checkpoint_path)
            params = load_params(cfg.init.checkpoint_path, params)

        self.optimizer = build_optimizer(cfg, params)

        report = None
        self.report_features = []
        if cfg.training.reports.enable and ds.report_stats is not None:
            self.report_features = list(cfg.training.reports.features)
            idx = [ds.dyn_output_features.index(f) for f in self.report_features]
            kinds = []
            for f in self.report_features:
                if ds.custom_normalization and "specific_humidity" in f:
                    kinds.append("humidity")
                elif ds.custom_normalization and "precipitation" in f:
                    kinds.append("precip")
                else:
                    kinds.append("zscore")
            report = {
                "indices": np.asarray(idx),
                "std": ds.report_stats["std"],
                "kinds": kinds,
                "q_min": float(ds.q_min),
                "q_max": float(max(ds.q_max, ds.q_min * 2)),
                "lat_weights": latitude_weights(ds.lat).astype(np.float32),
            }
        self.eval_step = make_eval_step(self.model, self.val_loss_fn, cfg, report,
                                        mesh=self.mesh)

        self.state = create_train_state(params, self.optimizer)
        state_shardings = None
        if self.mesh is not None:
            from paradis_tpu.distributed import shard_state

            # ZeRO-3/FSDP: shard params + optimizer state over the data axis
            # (compute.fsdp); otherwise replicate like the reference's DDP
            self.state, state_shardings = shard_state(
                self.state, self.mesh, fsdp=bool(cfg.compute.get("fsdp", False)))
        self.train_step, _ = make_train_step(self.model, self.loss_fn, cfg,
                                             self.optimizer,
                                             state_shardings=state_shardings,
                                             mesh=self.mesh)

        # -- schedule / checkpoints / logging ----------------------------------
        max_steps = int(cfg.training.max_steps)
        if max_steps <= 0:
            epochs = max(1, int(cfg.training.max_epochs))
            max_steps = epochs * max(1, len(self.train_loader))
        self.max_steps = max_steps
        self.schedule, self.plateau = build_schedule(cfg, max_steps)

        ck = cfg.training.checkpointing
        self.ckpt = CheckpointManager(
            self.log_dir / "checkpoints",
            keep_steps=int(ck.get("keep_steps", 10)),
            step_every=int(ck.get("step_every", 100)),
        )
        if cfg.init.checkpoint_path and cfg.init.restart:
            log.info("resuming full state from %s", cfg.init.checkpoint_path)
            self.state = self.ckpt.restore(self.state, cfg.init.checkpoint_path)

        if self.is_main:
            self.metrics = MetricsLogger(self.log_dir)
            save_run_snapshot(self.log_dir, cfg)
        else:  # non-main processes keep the interface but write nothing
            class _NullMetrics:
                def log(self, *a, **k):
                    pass

            self.metrics = _NullMetrics()
        self.metrics.log(0, {"model/num_parameters": n_params})

        self.print_losses = bool(cfg.training.get("print_losses", False))
        es = cfg.training.early_stopping
        self._early_stopping = bool(es.enabled)
        self._es_patience = int(es.patience)
        self._es_best = float("inf")
        self._es_bad = 0
        self._checkpointing = bool(cfg.training.checkpointing.enabled)
        # multi-host FSDP state is cross-process sharded: EVERY process must
        # participate in saves (each writes its own shards — sharded_ckpt);
        # otherwise only the main process touches the checkpoint directory
        self._ckpt_all_procs = (
            jax.process_count() > 1 and bool(cfg.compute.get("fsdp", False))
        )

    # -- loops -----------------------------------------------------------------

    def fit(self) -> dict:
        cfg = self.cfg
        num_common = self.train_ds.num_common_features
        log_every = int(cfg.training.log_every_n_steps)
        val_every = cfg.training.validation_dataset.validation_every_n_steps
        epoch = 0
        last_val = float("nan")
        stop = False

        pbar = None
        if cfg.training.progress_bar and not cfg.training.print_losses:
            try:  # step-global progress bar (reference utils/callbacks.py:8-128)
                from tqdm import tqdm

                pbar = tqdm(total=self.max_steps, initial=int(self.state.step),
                            desc="train", unit="step")
            except ImportError:
                pbar = None

        while not stop:
            epoch_t0 = time.perf_counter()
            # host↔device sync cadence: 1 = reference-faithful per-step loss
            # checks; >1 lets dispatch pipeline (metrics and the step counter
            # stay on device between sync points — big win over high-latency
            # links, mild win everywhere).  The host mirrors the step counter
            # so schedules/cadences never force a device fetch.
            sync_every = max(1, int(cfg.training.get("sync_every_n_steps", 1) or 1))
            grad_accum = max(1, int(cfg.training.get("accumulate_grad_batches", 1)))
            micro_host = 0                      # microbatches this epoch
            step0 = int(self.state.step)        # one device sync per epoch
            window_t0 = time.perf_counter()
            window_steps = 0
            for batch in self.train_loader:
                opt_step = step0 + (micro_host // grad_accum)  # completed steps
                lr = self.schedule(opt_step)
                self.state = self.state.replace(
                    opt_state=set_learning_rate(self.state.opt_state, lr)
                )
                self.state, m = self.train_step(self.state, batch, num_common)
                micro_host += 1
                window_steps += 1

                step = step0 + (micro_host // grad_accum)
                need_sync = (
                    step % sync_every == 0
                    or step % log_every == 0
                    or (self._checkpointing and step % self.ckpt.step_every == 0)
                    or (val_every and step % int(val_every) == 0)
                    or step <= 1
                    or step >= self.max_steps
                )
                if not need_sync:
                    continue

                loss = float(m["loss"])  # forces device completion
                dt = (time.perf_counter() - window_t0) / max(1, window_steps)
                window_t0 = time.perf_counter()
                window_steps = 0

                if loss > 10 or not np.isfinite(loss):
                    raise NaNLossError(
                        f"NaN/diverged training loss {loss} at step {step}"
                    )
                self._profiler_tick(step)
                if pbar is not None:
                    pbar.n = step
                    pbar.set_postfix(train_loss=f"{loss:.4f}", lr=f"{lr:.2e}",
                                     refresh=False)
                    pbar.refresh()
                if step % log_every == 0 or step == 1:
                    bsz = batch["input"].shape[0]
                    self.metrics.log(step, {
                        "train_loss": loss,
                        "lr": lr,
                        "dt": dt,
                        "samples_per_sec": bsz / max(dt, 1e-9),
                        "grad_norm": float(m["grad_norm"]),
                        "forecast_steps": batch["target"].shape[1],
                        # soak observability: leak/retrace watch over long
                        # runs (host RSS in MB; jit cache entries — growth
                        # after warmup means shape/dtype churn is retracing)
                        "host_rss_mb": _host_rss_mb(),
                        "jit_cache_entries": _jit_cache_size(self.train_step),
                    })
                    if "grads" in m:
                        self._log_deep_stats(step, m)
                if self._checkpointing and (self.is_main or self._ckpt_all_procs):
                    self.ckpt.maybe_save_step(step, self._state_dict())
                if val_every and step and step % int(val_every) == 0:
                    last_val = self._validate(step)
                    stop = stop or self._early_stop_check(last_val)
                if step >= self.max_steps:
                    stop = True
                if stop:
                    break

            epoch += 1
            if not stop or np.isnan(last_val):
                last_val = self._validate(int(self.state.step))
                stop = stop or self._early_stop_check(last_val)
            if self.plateau is not None:
                self.plateau.update(last_val)
            if self._checkpointing and (self.is_main or self._ckpt_all_procs):
                self.ckpt.save_epoch(epoch, self._state_dict())
                self.ckpt.maybe_save_best(last_val, self._state_dict())
            max_epochs = int(self.cfg.training.max_epochs)
            if max_epochs > 0 and epoch >= max_epochs:
                stop = True
            log.info("epoch %d done in %.2fs val_loss=%.6f",
                     epoch, time.perf_counter() - epoch_t0, last_val)
            if self.print_losses:
                print(
                    f"Epoch {epoch:4d} | Val Loss: {last_val:.6f} | "
                    f"LR: {self.schedule(int(self.state.step)):.2e} | "
                    f"Elapsed time: {time.perf_counter() - epoch_t0:.4f}s"
                )

        if pbar is not None:
            pbar.close()
        return {"steps": int(self.state.step), "epochs": epoch, "val_loss": last_val}

    def _validate(self, step: int) -> float:
        limit = self.cfg.training.validation_dataset.validation_batches
        num_common = self.val_ds.num_common_features
        losses, reports = [], []
        for i, batch in enumerate(self.val_loader):
            if limit is not None and i >= int(limit):
                break
            out = self.eval_step(self.state.params, batch, num_common)
            losses.append(float(out["loss"]))
            if "report_rmse" in out:
                reports.append(np.asarray(out["report_rmse"]))
        if not losses:
            return float("nan")
        val = float(np.mean(losses))
        payload = {"val_loss": val}
        if reports:
            mean_rep = np.mean(reports, axis=0)
            for name, value in zip(self.report_features, mean_rep):
                payload[name] = float(value)
        self.metrics.log(step, payload)
        return val

    def _profiler_tick(self, step: int) -> None:
        """jax.profiler trace window around the configured steps."""
        pcfg = self.cfg.training.get("profiler", None)
        if not pcfg or not pcfg.get("enabled"):
            return
        start = int(pcfg.get("start_step", 10))
        num = int(pcfg.get("num_steps", 5))
        if step == start:
            jax.profiler.start_trace(str(self.log_dir / "profile"))
            self._profiling = True
        elif getattr(self, "_profiling", False) and step >= start + num:
            jax.profiler.stop_trace()
            self._profiling = False
            log.info("profiler trace written to %s", self.log_dir / "profile")

    def _log_deep_stats(self, step: int, m: dict) -> None:
        """Per-module grad/param stats + per-channel losses
        (reference trainer.py:520-617, 844-923)."""
        from paradis_tpu.utils.logging import grad_statistics

        momentum = None
        # first moment lives in the optimizer chain state (adam mu / muon buf)
        for node in jax.tree_util.tree_leaves(
            self.state.opt_state, is_leaf=lambda x: hasattr(x, "_fields")
        ):
            if hasattr(node, "mu"):
                momentum = node.mu
                break
            if hasattr(node, "momentum"):
                momentum = node.momentum
                break
        stats = grad_statistics(m["grads"], self.state.params, momentum)
        names = self.train_ds.dyn_output_features
        for key in ("channel_loss_weighted", "channel_loss_unweighted"):
            if key in m:
                vals = np.asarray(m[key])
                prefix = "train_loss_channel_" + key.rsplit("_", 1)[-1]
                stats.update({f"{prefix}/{n}": float(v)
                              for n, v in zip(names, vals)})
        self.metrics.log(step, stats)

    def _early_stop_check(self, val_loss: float) -> bool:
        if not self._early_stopping or np.isnan(val_loss):
            return False
        if not np.isfinite(val_loss) or val_loss > 1.5:  # divergence_threshold
            log.warning("early stopping: divergent val_loss %.4f", val_loss)
            return True
        if val_loss < self._es_best:
            self._es_best = val_loss
            self._es_bad = 0
            return False
        self._es_bad += 1
        if self._es_bad >= self._es_patience:
            log.info("early stopping: no improvement for %d validations",
                     self._es_bad)
            return True
        return False

    def _state_dict(self):
        return self.state
