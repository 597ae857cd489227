"""Serving-artifact throughput: drive a 40-step forecast from the exported
StableHLO artifacts on the chip (VERDICT r4 weak #3).

Measures three ways of producing the reference 10-day forecast protocol
(40 x 6 h, reference ``scripts/run_forecast.sh:9-27``) at flagship 5.625°:

  * ``rollout.shlo`` — ONE ``Exported.call`` of the scanned K-step rollout
    (the file the manifest tells a server to prefer);
  * ``forward.shlo`` step-at-a-time — 40 ``Exported.call`` dispatches with
    the autoregressive lag-shift on the host between steps (the fallback
    serving loop, and what an artifact-only server would do without the
    scanned export);
  * the in-process jitted ``make_forecast_rollout`` (the bench_forecast.py
    number) for reference.

Uses the same two-chain-length slope as bench.py where the work repeats
(rollout paths); the step-at-a-time loop is timed directly since its
host-side lag-shift is part of the cost being measured.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_artifact.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STEPS = 40
CHAIN_SHORT, CHAIN_LONG = 2, 8


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from paradis_tpu.forecast.export import load_artifact, save_artifact
    from paradis_tpu.forecast.rollout import make_forecast_rollout
    from paradis_tpu.train.step import autoregress_next_input

    cfg, model, d = _flagship(tiny=False)
    cfg.model.forecast_steps = STEPS
    cfg.forecast.output_frequency = 1

    H, W = d["nlat"], d["nlon"]
    n_common, n_time = d["n_common"], d["n_time"]
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(1, H, W, n_common * n_time)), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(1, STEPS, H, W, d["n_forcings"] * n_time)), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(1, H, W, d["n_const"])), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        art = save_artifact(
            Path(tmp) / "art", model, params, cfg, batch_size=1,
            nlat=H, nlon=W, input_dim=d["input_dim"],
            output_dim=d["output_dim"], n_common=n_common)
        export_s = time.perf_counter() - t0
        sizes = {p.name: p.stat().st_size for p in art.iterdir()}
        serving = load_artifact(art)

    # --- artifact scanned rollout: one dispatch per forecast -----------------
    t0 = time.perf_counter()
    out = serving.rollout(batch["input"], batch["forcings"],
                          batch["constants"])
    float(np.asarray(out[0, 0, 0, 0, 0]))
    print(f"export {export_s:.0f}s; first artifact rollout "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

    def chain_rollout(k):
        o = None
        t0 = time.perf_counter()
        for _ in range(k):
            o = serving.rollout(batch["input"], batch["forcings"],
                                batch["constants"])
        float(np.asarray(o[0, 0, 0, 0, 0]))
        return time.perf_counter() - t0

    art_rollout = min((chain_rollout(CHAIN_LONG) - chain_rollout(CHAIN_SHORT))
                      / (CHAIN_LONG - CHAIN_SHORT) for _ in range(3))

    # --- artifact step-at-a-time loop (the forward.shlo fallback) ------------
    const_b = jnp.broadcast_to(
        batch["constants"], (1,) + batch["constants"].shape[1:])

    def serve_step_loop():
        dyn = batch["input"]
        out = None
        for s in range(STEPS):
            model_in = jnp.concatenate(
                [dyn, batch["forcings"][:, s], const_b], axis=-1)
            out = serving(model_in)
            dyn = autoregress_next_input(dyn, out, n_common, n_time)
        float(np.asarray(out[0, 0, 0, 0]))

    serve_step_loop()  # compile/load
    t0 = time.perf_counter()
    serve_step_loop()
    step_loop = time.perf_counter() - t0

    # --- in-process jitted rollout (bench_forecast.py reference point) -------
    rollout = make_forecast_rollout(model, cfg)
    o = rollout(params, batch, n_common)
    float(np.asarray(o[0, 0, 0, 0, 0]))

    def chain_inproc(k):
        o = None
        t0 = time.perf_counter()
        for _ in range(k):
            o = rollout(params, batch, n_common)
        float(np.asarray(o[0, 0, 0, 0, 0]))
        return time.perf_counter() - t0

    inproc = min((chain_inproc(CHAIN_LONG) - chain_inproc(CHAIN_SHORT))
                 / (CHAIN_LONG - CHAIN_SHORT) for _ in range(3))

    print(json.dumps({
        "artifact_rollout_steps_per_sec": round(STEPS / art_rollout, 2),
        "artifact_rollout_ten_day_sec": round(art_rollout, 3),
        "artifact_steploop_steps_per_sec": round(STEPS / step_loop, 2),
        "artifact_steploop_ten_day_sec": round(step_loop, 3),
        "inprocess_rollout_steps_per_sec": round(STEPS / inproc, 2),
        "rollout_shlo_bytes": sizes.get("rollout.shlo"),
        "forward_shlo_bytes": sizes.get("forward.shlo"),
    }))


if __name__ == "__main__":
    main()
