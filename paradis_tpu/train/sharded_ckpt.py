"""Per-process sharded checkpointing for multi-host FSDP train state.

The reference's resume path (``/root/reference/train.py:71-72``,
``utils/callbacks.py:161-197``) covers every configuration Lightning DDP
supports because DDP state is always replicated.  Our FSDP/ZeRO-3 layout
(``distributed.shard_state``) splits params + optimizer moments over the
``data`` axis, so on multi-host runs no single process can materialize the
state; this module gives checkpointing the same "works for every supported
configuration" property:

  * :func:`save_sharded` — every process writes exactly the shards its
    devices own (the ``replica_id == 0`` copy of each distinct global slice)
    into ``shards_p{rank}.npz`` plus a JSON layout manifest;
  * :func:`restore_sharded` — each process assembles the regions *its*
    devices need from whichever stored shards overlap them, so the restoring
    topology may differ from the saving one (different process count, mesh
    shape, or FSDP min-size → full resharding on load).

No collectives are used; callers serialize the processes around directory
creation (``CheckpointManager`` does, via ``multihost_utils``).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

_MANIFEST = "manifest_p{rank}.json"
_SHARDS = "shards_p{rank}.npz"


def _leaf_key(path) -> str:
    return jax.tree_util.keystr(path)


def _norm_index(index, shape) -> tuple[list[int], list[int]]:
    """Normalize a shard index (tuple of slices) to explicit starts/stops."""
    starts, stops = [], []
    for sl, dim in zip(index, shape):
        lo, hi, step = sl.indices(dim)
        if step != 1:
            raise ValueError(f"non-unit-stride shard slice {sl}")
        starts.append(lo)
        stops.append(hi)
    return starts, stops


def save_sharded(directory: str | Path, tree) -> None:
    """Write this process's addressable replica-0 shards of ``tree``.

    Every process participating in the arrays' shardings must call this with
    the same tree; the directory must already exist on all of them.  Leaves
    that are not ``jax.Array`` (host scalars/numpy — replicated by
    construction) are written by process 0 only.
    """
    directory = Path(directory)
    rank = jax.process_index()
    arrays: dict[str, np.ndarray] = {}
    shard_entries = []
    leaf_meta = {}

    counter = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _leaf_key(path)
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            shape = tuple(leaf.shape)
            leaf_meta[key] = {"shape": list(shape), "dtype": str(leaf.dtype)}
            seen = set()
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue
                starts, stops = _norm_index(shard.index, shape)
                sig = (tuple(starts), tuple(stops))
                if sig in seen:  # same slice on several local devices
                    continue
                seen.add(sig)
                name = f"a{counter}"
                counter += 1
                arrays[name] = np.asarray(shard.data)
                shard_entries.append(
                    {"key": key, "name": name, "start": starts, "stop": stops}
                )
        elif rank == 0:
            value = np.asarray(leaf)
            leaf_meta[key] = {"shape": list(value.shape), "dtype": str(value.dtype)}
            name = f"a{counter}"
            counter += 1
            arrays[name] = value
            shard_entries.append(
                {
                    "key": key,
                    "name": name,
                    "start": [0] * value.ndim,
                    "stop": list(value.shape),
                }
            )

    np.savez(directory / _SHARDS.format(rank=rank), **arrays)
    manifest = {
        "process": rank,
        "world": jax.process_count(),
        "leaves": leaf_meta,
        "shards": shard_entries,
    }
    (directory / _MANIFEST.format(rank=rank)).write_text(json.dumps(manifest))


class _ShardIndex:
    """Lazy view over every process's saved shards of one checkpoint."""

    def __init__(self, directory: Path):
        self.directory = Path(directory)
        self.leaves: dict[str, dict] = {}
        # per leaf key: list of (start, stop, rank, name)
        self.shards: dict[str, list] = {}
        self._files: dict[int, np.lib.npyio.NpzFile] = {}
        manifests = sorted(self.directory.glob("manifest_p*.json"))
        if not manifests:
            raise FileNotFoundError(f"no shard manifests under {directory}")
        for mf in manifests:
            m = json.loads(mf.read_text())
            rank = int(m["process"])
            for key, meta in m["leaves"].items():
                prev = self.leaves.setdefault(key, meta)
                if prev["shape"] != meta["shape"] or prev["dtype"] != meta["dtype"]:
                    raise ValueError(f"inconsistent manifests for leaf {key}")
            for e in m["shards"]:
                self.shards.setdefault(e["key"], []).append(
                    (tuple(e["start"]), tuple(e["stop"]), rank, e["name"])
                )

    def _data(self, rank: int, name: str) -> np.ndarray:
        if rank not in self._files:
            self._files[rank] = np.load(self.directory / _SHARDS.format(rank=rank))
        return self._files[rank][name]

    def region(self, key: str, starts, stops) -> np.ndarray:
        """Assemble the ``[starts, stops)`` region of leaf ``key``."""
        meta = self.leaves[key]
        shape = tuple(int(b) - int(a) for a, b in zip(starts, stops))
        out = np.empty(shape, dtype=np.dtype(meta["dtype"]))
        covered = 0
        for s_start, s_stop, rank, name in self.shards.get(key, ()):
            lo = [max(a, b) for a, b in zip(starts, s_start)]
            hi = [min(a, b) for a, b in zip(stops, s_stop)]
            if any(l >= h for l, h in zip(lo, hi)):
                continue
            src = self._data(rank, name)
            src_sl = tuple(
                slice(l - o, h - o) for l, h, o in zip(lo, hi, s_start)
            )
            dst_sl = tuple(
                slice(l - o, h - o) for l, h, o in zip(lo, hi, starts)
            )
            out[dst_sl] = src[src_sl]
            covered += int(np.prod([h - l for l, h in zip(lo, hi)]))
        if covered != int(np.prod(shape)):
            raise ValueError(
                f"stored shards cover {covered} of {int(np.prod(shape))} "
                f"elements of {key}[{starts}:{stops}] — incomplete checkpoint"
            )
        return out

    def close(self) -> None:
        for f in self._files.values():
            f.close()


def restore_sharded(directory: str | Path, target_tree):
    """Restore a :func:`save_sharded` checkpoint into ``target_tree``'s layout.

    Target leaves that are ``jax.Array`` (or ``ShapeDtypeStruct``) with a
    sharding are rebuilt shard-by-shard via ``jax.make_array_from_callback``
    — each process reads only the regions its devices need; other leaves are
    returned as host numpy arrays.  Shapes must match; dtypes follow the
    stored values (cast to the target dtype when it differs).
    """
    index = _ShardIndex(Path(directory))

    def build(path, target):
        key = _leaf_key(path)
        if key not in index.leaves:
            raise KeyError(f"checkpoint has no leaf {key}")
        meta = index.leaves[key]
        shape = tuple(meta["shape"])
        t_shape = tuple(getattr(target, "shape", ()) or ())
        if t_shape != shape:
            raise ValueError(
                f"shape mismatch at {key}: checkpoint {shape} vs target {t_shape}"
            )
        t_dtype = getattr(target, "dtype", None)
        sharding = getattr(target, "sharding", None)
        if sharding is not None and isinstance(
            sharding, jax.sharding.Sharding
        ) and not isinstance(sharding, jax.sharding.SingleDeviceSharding):
            def cb(idx, _key=key, _shape=shape, _dt=t_dtype):
                starts, stops = _norm_index(idx, _shape)
                region = index.region(_key, starts, stops)
                return region.astype(_dt) if _dt is not None else region

            return jax.make_array_from_callback(shape, sharding, cb)
        full = index.region(key, [0] * len(shape), list(shape))
        if t_dtype is not None:
            full = full.astype(t_dtype)
        return full

    try:
        return jax.tree_util.tree_map_with_path(build, target_tree)
    finally:
        index.close()


def read_sharded_leaves(directory: str | Path, target_tree, prefix: str = ""):
    """Assemble every stored leaf at its STORED shape, in target structure.

    Unlike :func:`restore_sharded` this ignores the target leaves' shapes —
    it exists for ``load_params``'s cross-resolution transfer surgery, where
    GlobalBias U/V factors may deliberately mismatch.  ``prefix`` lets a
    params-only target read the params subtree of a full-state checkpoint
    (``prefix=".params"``).
    """
    index = _ShardIndex(Path(directory))

    def build(path, _target):
        key = prefix + _leaf_key(path)
        if key not in index.leaves:
            raise KeyError(f"checkpoint has no leaf {key}")
        shape = tuple(index.leaves[key]["shape"])
        return index.region(key, [0] * len(shape), list(shape))

    try:
        return jax.tree_util.tree_map_with_path(build, target_tree)
    finally:
        index.close()
