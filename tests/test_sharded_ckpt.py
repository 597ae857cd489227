"""Unit tests for per-process sharded checkpoints (train/sharded_ckpt.py).

Single-process versions of the multi-host FSDP save/restore path: the format
must round-trip bit-exactly, reshard to a different layout on load, and feed
``load_params``-style stored-shape reads (resolution-transfer surgery).
The real two-process flow is covered by tests/test_multihost.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from paradis_tpu.distributed import create_mesh, fsdp_shardings
from paradis_tpu.train.sharded_ckpt import (
    read_sharded_leaves,
    restore_sharded,
    save_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=4, space=2)


def _tree(rng):
    return {
        "w": rng.normal(size=(16, 8)).astype(np.float32),
        "b": rng.normal(size=(8,)).astype(np.float32),
        "nested": {"k": rng.normal(size=(4, 16, 3)).astype(np.float32)},
        "step": np.int32(7),
    }


def _place(tree, mesh):
    sh = fsdp_shardings(tree, mesh, min_size=8)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, sh)


def test_roundtrip_bitexact(tmp_path, rng, mesh):
    host = _tree(rng)
    placed = _place(host, mesh)
    save_sharded(tmp_path, placed)
    restored = restore_sharded(tmp_path, placed)
    for k, a, b in zip(host, jax.tree.leaves(placed), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)


def test_restore_resharded_layout(tmp_path, rng, mesh):
    """A checkpoint saved FSDP-sharded restores into any other layout."""
    host = _tree(rng)
    save_sharded(tmp_path, _place(host, mesh))

    # target: everything replicated (e.g. resuming without FSDP)
    replicated = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), host
    )
    restored = restore_sharded(tmp_path, replicated)
    for a, b in zip(jax.tree.leaves(host), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding.is_fully_replicated

    # target: plain numpy (single-device tooling)
    as_np = restore_sharded(tmp_path, host)
    for a, b in zip(jax.tree.leaves(host), jax.tree.leaves(as_np)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_shape_mismatch(tmp_path, rng, mesh):
    host = _tree(rng)
    save_sharded(tmp_path, _place(host, mesh))
    bad = dict(host, w=np.zeros((16, 9), np.float32))
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_sharded(tmp_path, bad)


def test_read_sharded_leaves_stored_shapes_and_prefix(tmp_path, rng, mesh):
    """load_params path: stored shapes win (transfer surgery needs them)."""
    from flax import struct

    @struct.dataclass
    class MiniState:
        params: dict
        step: jnp.ndarray

    params = {"U": rng.normal(size=(4, 16)).astype(np.float32)}
    state = MiniState(params=params, step=jnp.int32(3))
    placed = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
    )
    save_sharded(tmp_path, placed)

    # target with a DIFFERENT U width: read returns the stored (4, 16)
    target = {"U": np.zeros((4, 32), np.float32)}
    loaded = read_sharded_leaves(tmp_path, target, prefix=".params")
    assert loaded["U"].shape == (4, 16)
    np.testing.assert_array_equal(loaded["U"], params["U"])
