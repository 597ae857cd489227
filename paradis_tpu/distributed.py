"""Device meshes and sharding rules (the framework's entire comm layer).

The reference's only distribution strategy is data parallelism via Lightning
DDP/NCCL (``train.py:44-49``); here every strategy is expressed as sharding
annotations over a ``jax.sharding.Mesh`` and XLA GSPMD inserts the
collectives (all-reduce for gradients over ICI/DCN, halo collective-permutes
for spatially sharded convolutions):

  * ``data`` axis — batch sharding (DP; gradient psum falls out of jit),
  * ``space`` axis — longitude sharding of the lat-lon grid (the spatial
    analogue of context parallelism for this attention-free model; geocyclic
    padding and SepConvs partition via GSPMD halo exchange).

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); the mesh then spans all processes' devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single host with no coordinator)."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes, process_id=process_id)


def create_mesh(data: int | None = None, space: int = 1,
                devices=None) -> Mesh:
    """Build a ``(data, space)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    if data * space != n:
        raise ValueError(f"mesh {data}x{space} does not match {n} devices")
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def mesh_from_config(cfg) -> Mesh:
    space = int(cfg.compute.get("spatial_devices", 1))
    data = int(cfg.compute.get("num_devices", 1)) * int(cfg.compute.get("num_nodes", 1))
    n = len(jax.devices())
    if data * space != n:
        # use whatever is actually available, preserving the space factor
        data = max(1, n // space)
    return create_mesh(data=data, space=space)


def batch_shardings(mesh: Mesh) -> dict:
    """NamedShardings for the training-batch dict.

    Layouts: input [B,H,W,C], target/forcings [B,S,H,W,C], constants [B,H,W,K];
    batch on ``data``, longitude on ``space``.
    """
    s4 = NamedSharding(mesh, P(DATA_AXIS, None, SPACE_AXIS, None))
    s5 = NamedSharding(mesh, P(DATA_AXIS, None, None, SPACE_AXIS, None))
    return {"input": s4, "target": s5, "forcings": s5, "constants": s4}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_shardings(mesh)
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, sh[k]) if k in sh else v
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
