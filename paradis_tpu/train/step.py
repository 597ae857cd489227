"""Jitted training/eval steps: autoregressive rollout, TBPTT, grad accumulation.

Restructures the reference's manual-optimization loop (``trainer.py:498-587``)
into JAX's loss-then-grad form:

  * the rollout over forecast steps is a ``lax.scan`` whose carry is the
    autoregressive dynamic-input stack;
  * the reference's interleaved ``manual_backward`` every
    ``detach_gradient_every`` steps becomes per-segment ``value_and_grad``
    with a stop-gradient carry between segments (identical gradients, JAX
    structure);
  * cross-batch gradient accumulation keeps a running sum in the train state
    and applies the optimizer every ``accumulate_grad_batches`` microsteps
    under ``lax.cond`` (reference trainer.py:503-506,580-587);
  * losses are scaled by ``1/(num_steps * grad_accum)`` exactly like the
    reference's ``chunk_loss`` so accumulated gradients match.

Batch layout (channels-last): ``input [B,H,W,C_dyn]``, ``target [B,S,H,W,C_out]``,
``forcings [B,S,H,W,F]``, ``constants [B,H,W,K]``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray          # optimizer steps taken
    micro_step: jnp.ndarray    # microbatches seen (for grad accumulation)
    accum: Any                 # gradient accumulator (zeros when unused)


def create_train_state(params, optimizer) -> TrainState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        micro_step=jnp.zeros((), jnp.int32),
        accum=zeros,
    )


def autoregress_next_input(dyn_input: jnp.ndarray, output: jnp.ndarray,
                           num_common: int, n_time_inputs: int) -> jnp.ndarray:
    """Shift the lagged common-feature stack and append the new prediction.

    Mirrors reference ``trainer.py:710-729``; like the reference it assumes
    the per-time dynamic block equals the common features (true whenever all
    input variables are also outputs, as in the default config).
    """
    common = output[..., :num_common]
    if n_time_inputs == 1:
        return common
    lag = num_common * n_time_inputs
    return jnp.concatenate([dyn_input[..., num_common:lag], common], axis=-1)


def _rollout_segment(model_apply, loss_fn, params, dyn_input, targets, forcings,
                     constants, num_common, n_time_inputs, diag_fn=None):
    """Scan a contiguous rollout segment.

    Returns ``(sum loss, final dyn, per-step losses, diags)`` where ``diags``
    is ``diag_fn(out, target)`` stacked over steps (None when ``diag_fn`` is
    None) — this is how per-channel diagnostics come out of the rollout the
    model is already running instead of costing an extra forward (reference
    computes them from outputs it already has, trainer.py:520-617).
    """

    def body(dyn, xs):
        forcing_t, target_t = xs
        model_in = jnp.concatenate(
            [dyn, forcing_t, jnp.broadcast_to(constants, forcing_t.shape[:1] + constants.shape[1:])],
            axis=-1,
        )
        out = model_apply(params, model_in)
        loss_t = loss_fn(out, target_t)
        diag = diag_fn(out, target_t) if diag_fn is not None else None
        nxt = autoregress_next_input(dyn, out, num_common, n_time_inputs)
        return nxt, (loss_t, diag)

    # scan over the step axis: [S, B, H, W, C]
    final_dyn, (losses, diags) = jax.lax.scan(
        body, dyn_input, (jnp.moveaxis(forcings, 1, 0), jnp.moveaxis(targets, 1, 0))
    )
    return jnp.sum(losses), final_dyn, losses, diags


def make_train_step(model, loss_fn, cfg, optimizer=None,
                    donate: bool = True,
                    state_shardings=None,
                    mesh=None) -> tuple[Callable, Any]:
    """Build (jitted train_step, optimizer).

    ``train_step(state, batch, num_common) -> (state, metrics)`` where
    metrics = {loss, loss_per_step, grad_norm, applied} plus, when
    ``training.log_additional_stats`` is on, the raw gradient tree and
    per-channel weighted/unweighted losses (reference trainer.py:520-617).

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings, from
    ``distributed.shard_state(fsdp=True)``) pins the output state's layout so
    FSDP-sharded params/optimizer state stay sharded across steps instead of
    drifting to whatever GSPMD propagation picks.

    ``mesh`` (optional ``jax.sharding.Mesh``) activates the model's in-forward
    spatial sharding constraints (``distributed.spatial_rules``) while the
    step is traced, so activations partition consistently over the mesh's
    ``(lat, space)`` axes.
    """
    from paradis_tpu.distributed import spatial_rules

    n_time = int(cfg.dataset.n_time_inputs)
    grad_accum = int(cfg.training.get("accumulate_grad_batches", 1))
    detach_every = cfg.training.optimizer.get("detach_gradient_every", None)
    deep_stats = bool(cfg.training.get("log_additional_stats", False))

    def _pin(new_state: TrainState) -> TrainState:
        if state_shardings is None:
            return new_state
        return jax.lax.with_sharding_constraint(new_state, state_shardings)

    def step_fn(state: TrainState, batch: dict, num_common_features: int):
        with spatial_rules(mesh):
            return _step_body(state, batch, num_common_features)

    def _step_body(state: TrainState, batch: dict, num_common_features: int):
        dyn_input = batch["input"]
        targets = batch["target"]
        forcings = batch["forcings"]
        constants = batch["constants"]
        S = targets.shape[1]

        seg = detach_every if detach_every else S
        seg = max(1, min(int(seg), S))
        bounds = list(range(0, S, seg))

        scale = 1.0 / (S * grad_accum)

        def make_seg_loss(diag_fn):
            def seg_loss(params, dyn, seg_targets, seg_forcings):
                total, final_dyn, per_step, diags = _rollout_segment(
                    lambda p, x: model.apply(p, x), loss_fn, params, dyn,
                    seg_targets, seg_forcings, constants, num_common_features,
                    n_time, diag_fn=diag_fn,
                )
                return total * scale, (final_dyn, per_step, diags)
            return seg_loss

        def _channel_diag(out, target_t):
            # per-channel diagnostics from outputs the rollout already has
            # (reference trainer.py:520-617) — no extra forward
            return (loss_fn.per_channel(out, target_t, weighted=True),
                    loss_fn.per_channel(out, target_t, weighted=False))

        grads = None
        dyn = dyn_input
        step_losses = []
        diag0 = None
        for i, lo in enumerate(bounds):
            hi = min(lo + seg, S)
            want_diag = deep_stats and i == 0
            g_fn = jax.value_and_grad(make_seg_loss(
                _channel_diag if want_diag else None), has_aux=True)
            (_, (dyn, per_step, diags)), g = g_fn(
                state.params, dyn, targets[:, lo:hi], forcings[:, lo:hi]
            )
            dyn = jax.lax.stop_gradient(dyn)
            step_losses.append(per_step)
            if want_diag:
                # step-0 row of the stacked diagnostics: identical to a fresh
                # forward on the step-0 input with the pre-update params
                diag0 = jax.tree.map(lambda a: a[0], diags)
            grads = g if grads is None else jax.tree.map(jnp.add, grads, g)

        losses_all = jnp.concatenate(step_losses)  # [S]
        train_loss = jnp.mean(losses_all)

        micro = state.micro_step + 1

        def _add_channel_diagnostics(metrics):
            metrics["channel_loss_weighted"] = diag0[0]
            metrics["channel_loss_unweighted"] = diag0[1]

        if grad_accum == 1:
            # no accumulation: skip the 3 full-gradient-tree HBM passes of
            # accumulate + zero + cond (~1.5 ms/step at flagship size); the
            # untouched zero accumulator passes through (donated alias)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params, opt_state=new_opt,
                step=state.step + 1, micro_step=micro, accum=state.accum,
            )
            new_state = _pin(new_state)
            metrics = {
                "loss": train_loss,
                "loss_per_step": losses_all,
                "grad_norm": optax.global_norm(grads),
                "applied": jnp.ones((), jnp.bool_),
            }
            if deep_stats:
                metrics["grads"] = grads
                _add_channel_diagnostics(metrics)
            return new_state, metrics

        accum = jax.tree.map(jnp.add, state.accum, grads)
        should_apply = (micro % grad_accum) == 0

        def apply_fn(operand):
            params, opt_state, acc = operand
            updates, new_opt = optimizer.update(acc, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(acc)
            zeroed = jax.tree.map(jnp.zeros_like, acc)
            return new_params, new_opt, zeroed, gnorm

        def skip_fn(operand):
            params, opt_state, acc = operand
            return params, opt_state, acc, jnp.zeros((), jnp.float32)

        new_params, new_opt, new_accum, gnorm = jax.lax.cond(
            should_apply, apply_fn, skip_fn, (state.params, state.opt_state, accum)
        )

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt,
            step=state.step + jnp.where(should_apply, 1, 0).astype(jnp.int32),
            micro_step=micro,
            accum=new_accum,
        )
        new_state = _pin(new_state)
        metrics = {
            "loss": train_loss,
            "loss_per_step": losses_all,
            "grad_norm": gnorm,
            "applied": should_apply,
        }
        if deep_stats:
            metrics["grads"] = grads
            _add_channel_diagnostics(metrics)
        return new_state, metrics

    jitted = jax.jit(
        step_fn,
        static_argnums=(2,),
        donate_argnums=(0,) if donate else (),
    )
    return jitted, optimizer


def make_eval_step(model, loss_fn, cfg,
                   report: Optional[dict] = None,
                   mesh=None) -> Callable:
    """Validation rollout: mean loss + optional denormalized report RMSEs.

    ``report`` carries {"indices": [R] output-channel indices, "std": [R]
    denorm stds, "lat_weights": [H]} plus optionally {"kinds": [R] of
    "zscore"|"humidity"|"precip", "q_min", "q_max"} so humidity/precipitation
    report channels use their physical denormalizations, matching the
    reference's ``_get_report_rmse`` (``trainer.py:291-315``).
    """
    n_time = int(cfg.dataset.n_time_inputs)

    def _denorm_report(vals, r):
        """vals [..., R] normalized → physical units per report channel."""
        from paradis_tpu.utils.normalization import (
            denormalize_humidity,
            denormalize_precipitation,
        )

        kinds = report.get("kinds")
        if kinds is None:
            return vals * jnp.asarray(report["std"], jnp.float32)
        cols = []
        for j, kind in enumerate(kinds):
            col = vals[..., j]
            if kind == "humidity":
                col = denormalize_humidity(col, jnp.float32(report["q_min"]),
                                           jnp.float32(report["q_max"]))
            elif kind == "precip":
                col = denormalize_precipitation(col)
            else:
                col = col * jnp.float32(report["std"][j])
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    from paradis_tpu.distributed import spatial_rules

    @functools.partial(jax.jit, static_argnums=(2,))
    def eval_fn(params, batch, num_common_features: int):
        with spatial_rules(mesh):
            return _eval_body(params, batch, num_common_features)

    def _eval_body(params, batch, num_common_features: int):
        targets = batch["target"]
        constants = batch["constants"]
        S = targets.shape[1]

        def body(dyn, xs):
            forcing_t, target_t = xs
            model_in = jnp.concatenate(
                [dyn, forcing_t,
                 jnp.broadcast_to(constants, forcing_t.shape[:1] + constants.shape[1:])],
                axis=-1,
            )
            out = model.apply(params, model_in)
            loss_t = loss_fn(out, target_t)
            extras = {}
            if report is not None:
                idx = jnp.asarray(report["indices"])
                lat_w = jnp.asarray(report["lat_weights"], jnp.float32)[None, :, None]
                pred_r = _denorm_report(out[..., idx].astype(jnp.float32), report)
                true_r = _denorm_report(target_t[..., idx].astype(jnp.float32), report)
                diff = pred_r - true_r
                mse = jnp.mean(diff * diff * lat_w[..., None], axis=(0, 1, 2))
                extras["report_mse"] = mse
            nxt = autoregress_next_input(dyn, out, num_common_features, n_time)
            return nxt, (loss_t, extras)

        _, (losses, extras) = jax.lax.scan(
            body, batch["input"],
            (jnp.moveaxis(batch["forcings"], 1, 0), jnp.moveaxis(targets, 1, 0)),
        )
        out = {"loss": jnp.mean(losses)}
        if report is not None:
            out["report_rmse"] = jnp.sqrt(jnp.mean(extras["report_mse"], axis=0))
        return out

    return eval_fn
