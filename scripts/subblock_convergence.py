"""Convergence gate for the sub-blocked interp kernels (round-5 default).

Parity tests pin the sub-blocked kernels against the monolithic bodies at
1e-5/1e-6 in interpret mode; this gate additionally checks that TRAINING
TRAJECTORIES agree at flagship size on the chip (where sub-blocking
actually engages — toy grids have pb ≤ 128 and stay monolithic), the same
evidence standard the fast-departure-trig default met.

Runs N full NorMuon steps over a fixed cycle of seeded random batches with
``PARADIS_INTERP_SUBBLOCK=1`` (monolithic) vs the default, in SUBPROCESSES
(the env is read at trace time), and compares per-step losses.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/subblock_convergence.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

STEPS = 100

_WORKER = r"""
import sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from __graft_entry__ import _flagship
from paradis_tpu.train.loss import WeightedLoss
from paradis_tpu.train.optim import build_optimizer
from paradis_tpu.train.step import create_train_state, make_train_step

STEPS = %d
cfg, model, d = _flagship(tiny=False, training=True)
cfg.training.optimizer.name = "normuon"
H, W = d["nlat"], d["nlon"]
rng = np.random.default_rng(7)
batches = []
for _ in range(8):
    batches.append({
        "input": jnp.asarray(rng.normal(size=(1, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "target": jnp.asarray(rng.normal(size=(1, 1, H, W, d["output_dim"])) * 0.1, jnp.float32),
        "forcings": jnp.asarray(rng.normal(size=(1, 1, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(size=(1, H, W, d["n_const"])), jnp.float32),
    })
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
optimizer = build_optimizer(cfg, params)
loss_fn = WeightedLoss(kind="reversed_huber",
                       feature_weights=np.ones(d["output_dim"], np.float32),
                       lat_weights=None)
step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=True)
state = create_train_state(params, optimizer)
losses = []
for i in range(STEPS):
    state, m = step(state, batches[i %% len(batches)], d["n_common"])
    losses.append(float(m["loss"]))
print("LOSSES " + json.dumps(losses))
""" % STEPS


def run(subblock_env: str | None):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    if subblock_env is None:
        env.pop("PARADIS_INTERP_SUBBLOCK", None)
    else:
        env["PARADIS_INTERP_SUBBLOCK"] = subblock_env
    proc = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                          capture_output=True, text=True, timeout=2400)
    for line in proc.stdout.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise RuntimeError(f"worker failed:\n{proc.stderr[-2000:]}")


def main():
    import numpy as np

    mono = np.asarray(run("1"))
    sub = np.asarray(run(None))
    rel = np.abs(sub - mono) / np.maximum(np.abs(mono), 1e-9)
    tail = slice(STEPS // 2, None)
    print(json.dumps({
        "steps": STEPS,
        "max_rel_diff": float(rel.max()),
        "max_rel_diff_step": int(rel.argmax()),
        "tail_mean_monolithic": round(float(mono[tail].mean()), 6),
        "tail_mean_subblocked": round(float(sub[tail].mean()), 6),
        "final_monolithic": round(float(mono[-1]), 6),
        "final_subblocked": round(float(sub[-1]), 6),
    }))


if __name__ == "__main__":
    main()
