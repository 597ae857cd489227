"""Worker process for the 2-process CPU multi-host DP/FSDP tests.

Run as: python tests/_multihost_worker.py <coordinator> <num_procs> <rank>
            [mode] [ckpt_dir]

Each process owns 2 virtual CPU devices, the mesh is (data=4, space=1) over
the 4 global devices, the global batch (B=4) is assembled from per-process
local slices via ``make_global_batch``, and NorMuon training steps run on
the tiny flagship model.  Prints ``LOSS <v...>`` on success; a
single-process run of the same script (num_procs=1, 4 local devices) must
produce identical losses (reference multi-node DDP equivalence,
``train.py:44-49``).

Modes:
  dp          (default) replicated state, 2 steps.
  fsdp        ZeRO-3 sharded state, 4 steps (the uninterrupted baseline).
  fsdp_save   FSDP, 2 steps, then a cross-process sharded checkpoint into
              <ckpt_dir> (every process writes its shards — sharded_ckpt).
  fsdp_resume FSDP, restore from <ckpt_dir> (reshard on load), 2 more steps.
The fsdp_save+fsdp_resume losses must bit-match fsdp's (reference full-resume
semantics, ``train.py:71-72`` / ``utils/callbacks.py:161-197``).
"""

import os
import sys

rank = int(sys.argv[3])
num_procs = int(sys.argv[2])
coordinator = sys.argv[1]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={4 // num_procs}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
if num_procs > 1:
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=rank)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship
from paradis_tpu.distributed import (
    create_mesh, local_batch_slice, make_global_batch, replicate, shard_batch,
)
from paradis_tpu.train.loss import WeightedLoss
from paradis_tpu.train.optim import build_optimizer
from paradis_tpu.train.step import create_train_state, make_train_step

assert len(jax.devices()) == 4, jax.devices()

cfg, model, d = _flagship(tiny=True)
cfg.training.optimizer.name = "normuon"
mesh = create_mesh(data=4, space=1)

H, W = d["nlat"], d["nlon"]
B = 4
rng = np.random.default_rng(0)
batch = {
    "input": rng.normal(size=(B, H, W, d["n_common"] * d["n_time"])).astype(np.float32),
    "target": rng.normal(size=(B, 1, H, W, d["output_dim"])).astype(np.float32),
    "forcings": rng.normal(size=(B, 1, H, W, d["n_forcings"] * d["n_time"])).astype(np.float32),
    "constants": rng.normal(size=(B, H, W, d["n_const"])).astype(np.float32),
}

params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
optimizer = build_optimizer(cfg, params)
loss_fn = WeightedLoss(kind="reversed_huber",
                       feature_weights=np.ones(d["output_dim"], np.float32),
                       lat_weights=None)
fsdp = mode.startswith("fsdp")

with mesh:
    base_state = create_train_state(params, optimizer)
    if fsdp:
        from paradis_tpu.distributed import shard_state

        state, state_sh = shard_state(base_state, mesh, fsdp=True, min_size=64)
    else:
        state, state_sh = replicate(base_state, mesh), None
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer,
                                    donate=False, state_shardings=state_sh,
                                    mesh=mesh)

    if mode == "fsdp_resume":
        from paradis_tpu.train.checkpoint import CheckpointManager

        state = CheckpointManager(ckpt_dir).restore(state)

    n_steps = {"dp": 2, "fsdp": 4, "fsdp_save": 2, "fsdp_resume": 2}[mode]
    losses = []
    for _ in range(n_steps):
        if num_procs > 1:
            sl = local_batch_slice(mesh, B)
            local = {k: v[sl] if k in ("input", "target", "forcings", "constants")
                     else v for k, v in batch.items()}
            sharded = make_global_batch(local, mesh, B)
        else:
            sharded = shard_batch(batch, mesh)
        state, metrics = train_step(state, sharded, d["n_common"])
        losses.append(float(metrics["loss"]))

    if mode == "fsdp_save":
        from paradis_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, step_every=1)
        assert mgr.maybe_save_step(2, state)

print("LOSS " + " ".join(f"{v:.10f}" for v in losses), flush=True)
