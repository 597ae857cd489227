"""Worker process for the 2-process CPU multi-host DP test.

Run as: python tests/_multihost_worker.py <coordinator> <num_procs> <rank>

Each process owns 2 virtual CPU devices, the mesh is (data=4, space=1) over
the 4 global devices, the global batch (B=4) is assembled from per-process
local slices via ``make_global_batch``, and two NorMuon training steps run on
the tiny flagship model.  Prints ``LOSS <v0> <v1>`` on success; a
single-process run of the same script (num_procs=1, 4 local devices) must
produce identical losses (reference multi-node DDP equivalence,
``train.py:44-49``).
"""

import os
import sys

rank = int(sys.argv[3])
num_procs = int(sys.argv[2])
coordinator = sys.argv[1]

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
train_step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=False)

with mesh:
    state = replicate(create_train_state(params, optimizer), mesh)
    losses = []
    for _ in range(2):
        if num_procs > 1:
            sl = local_batch_slice(mesh, B)
            local = {k: v[sl] if k in ("input", "target", "forcings", "constants")
                     else v for k, v in batch.items()}
            sharded = make_global_batch(local, mesh, B)
        else:
            sharded = shard_batch(batch, mesh)
        state, metrics = train_step(state, sharded, d["n_common"])
        losses.append(float(metrics["loss"]))

print("LOSS " + " ".join(f"{v:.10f}" for v in losses), flush=True)
