"""Jitted autoregressive forecast rollout with chunked host writes.

Device side: a ``lax.scan`` over forecast steps producing the stored outputs
(every ``output_frequency``-th step).  Host side: chunks of ``write_every_n``
stored steps are fetched, denormalized, wind-converted and region-written to
the WB2-layout store — the JAX equivalent of reference ``predict_step``
(``trainer.py:731-815``) with the rollout compiled once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from paradis_tpu.train.step import autoregress_next_input


def make_forecast_rollout(model, cfg):
    """Build ``rollout(params, batch) -> stored [B, T_stored, H, W, C]``."""
    n_time = int(cfg.dataset.n_time_inputs)
    num_steps = int(cfg.model.forecast_steps)
    out_freq = int(cfg.forecast.output_frequency)

    @functools.partial(jax.jit, static_argnums=(2,))
    def rollout(params, batch, num_common_features: int):
        constants = batch["constants"]

        def body(dyn, forcing_t):
            model_in = jnp.concatenate(
                [dyn, forcing_t,
                 jnp.broadcast_to(constants, forcing_t.shape[:1] + constants.shape[1:])],
                axis=-1,
            )
            out = model.apply(params, model_in)
            nxt = autoregress_next_input(dyn, out, num_common_features, n_time)
            return nxt, out

        _, outs = jax.lax.scan(
            body, batch["input"], jnp.moveaxis(batch["forcings"], 1, 0)
        )
        # outs: [S, B, H, W, C] → stored steps only, batch-first
        stored = outs[::out_freq]
        return jnp.moveaxis(stored, 0, 1).astype(jnp.float32)

    return rollout


def run_forecast(model, params, dataset, cfg, writer, batch_loader,
                 mesh=None) -> None:
    """Forecast every sample of ``dataset`` and write the WB2 store.

    With a ``mesh``, init times are sharded over the ``data`` axis (the
    reference's multi-device inference DP, forecast.py:49-50); region writes
    stay disjoint by construction.  Ragged final batches are padded to the
    mesh size and the padding dropped before writing.
    """
    rollout = make_forecast_rollout(model, cfg)
    writer.init_store(dataset)
    write_every = int(cfg.forecast.get("write_every_n") or writer.stored_steps)

    if mesh is not None:
        from paradis_tpu.distributed import replicate, shard_batch

        params = replicate(params, mesh)
        n_data = mesh.shape.get("data", 1)

    for batch in batch_loader:
        sample_idx = np.asarray(batch.pop("index"))
        n_real = len(sample_idx)
        if mesh is not None:
            pad_to = -(-n_real // n_data) * n_data
            if pad_to != n_real:
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad_to - n_real, axis=0)])
                    for k, v in batch.items()}
            batch = shard_batch(batch, mesh)
        stored = np.asarray(
            rollout(params, batch, dataset.num_common_features)
        )[:n_real]  # [B, T_stored, H, W, C]
        stored = np.moveaxis(stored, -1, 2)  # [B, T_stored, C, H, W]
        t_total = stored.shape[1]
        for lo in range(0, t_total, write_every):
            hi = min(lo + write_every, t_total)
            writer.write_forecast_chunk(
                forecast=stored[:, lo:hi],
                sample_indices=sample_idx,
                start_idx=lo,
                dataset=dataset,
            )
