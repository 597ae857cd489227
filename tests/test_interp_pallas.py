"""Pallas fused interpolation kernel: parity with the XLA dense path.

Runs in interpreter mode on CPU (the kernel's compiled path is exercised on
the real chip by bench.py / training with compute.advection_impl=pallas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.interp import grid_sample_interp
from paradis_tpu.ops.interp_pallas import grid_sample_interp_pallas


def _setup(B=1, Hp=12, Wp=20, V=4, H=8, W=16, seed=0):
    rng = np.random.default_rng(seed)
    field = rng.normal(size=(B, Hp, Wp, V)).astype(np.float32)
    py = rng.uniform(2.0, Hp - 3.0, size=(B, H, W, V)).astype(np.float32)
    px = rng.uniform(2.0, Wp - 3.0, size=(B, H, W, V)).astype(np.float32)
    return jnp.asarray(field), jnp.asarray(py), jnp.asarray(px)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_forward_parity(mode):
    field, py, px = _setup()
    ours = np.asarray(grid_sample_interp_pallas(field, py, px, mode, interpret=True))
    ref = np.asarray(grid_sample_interp(field, py, px, mode, method="gather"))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_forward_parity_channel_remainders():
    # V=6 → vb falls back to 2
    field, py, px = _setup(V=6, seed=2)
    ours = np.asarray(grid_sample_interp_pallas(field, py, px, "bicubic",
                                                interpret=True))
    ref = np.asarray(grid_sample_interp(field, py, px, "bicubic", method="gather"))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_gradients_match_autodiff_of_dense(mode):
    field, py, px = _setup(V=2, H=4, W=6, seed=3)
    # keep positions strictly inside integer-free zones for bilinear (its
    # derivative is discontinuous at integers)
    py = jnp.floor(py) + 0.37
    px = jnp.floor(px) + 0.61

    def loss_pallas(f, y, x):
        return jnp.sum(grid_sample_interp_pallas(f, y, x, mode, interpret=True) ** 2)

    def loss_dense(f, y, x):
        return jnp.sum(grid_sample_interp(f, y, x, mode, method="dense") ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(field, py, px)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(field, py, px)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3)


def test_bad_mode():
    field, py, px = _setup()
    with pytest.raises(ValueError):
        grid_sample_interp_pallas(field, py, px, "nearest", interpret=True)


@pytest.mark.slow
def test_position_block_accumulation(monkeypatch):
    """Force multiple position blocks: the backward d_field accumulation over
    revisited output blocks must match the single-block result."""
    import paradis_tpu.ops.interp_pallas as mod

    field, py, px = _setup(V=2, H=8, W=32, seed=6)  # P = 256
    py = jnp.floor(py) + 0.37
    px = jnp.floor(px) + 0.61

    def loss(f, y, x):
        return jnp.sum(grid_sample_interp_pallas(f, y, x, "bicubic",
                                                 interpret=True) ** 2)

    g_full = jax.grad(loss, argnums=(0, 1, 2))(field, py, px)
    # shrink the budget so pb=128 < P=256 → 2 position blocks
    monkeypatch.setattr(mod, "_VMEM_BUDGET", 1)
    assert mod._pick_pb(256, 2, 12, 20, bwd=True) == 128
    g_blocked = jax.grad(loss, argnums=(0, 1, 2))(field, py, px)
    for a, b in zip(g_full, g_blocked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("n_sub", [2, 4])
def test_subblock_parity(monkeypatch, mode, n_sub):
    """Software-pipelined position sub-blocks (PARADIS_INTERP_SUBBLOCK):
    forward and all three gradients must match the monolithic kernel."""
    monkeypatch.delenv("PARADIS_INTERP_SUBBLOCK", raising=False)
    # P = 8·64 = 512 → sp = 256/128 at n_sub = 2/4 (full 128-lane sub-blocks)
    field, py, px = _setup(V=2, H=8, W=64, seed=7)
    py = jnp.floor(py) + 0.37
    px = jnp.floor(px) + 0.61

    def loss(f, y, x):
        return jnp.sum(grid_sample_interp_pallas(f, y, x, mode,
                                                 interpret=True) ** 2)

    base = np.asarray(grid_sample_interp_pallas(field, py, px, mode,
                                                interpret=True))
    g_base = jax.grad(loss, argnums=(0, 1, 2))(field, py, px)
    monkeypatch.setenv("PARADIS_INTERP_SUBBLOCK", str(n_sub))
    sub = np.asarray(grid_sample_interp_pallas(field, py, px, mode,
                                               interpret=True))
    g_sub = jax.grad(loss, argnums=(0, 1, 2))(field, py, px)
    np.testing.assert_allclose(sub, base, atol=1e-6)
    for a, b in zip(g_sub, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_n_sub_lane_rounding(monkeypatch):
    """Sub-block factors that would break 128-lane alignment round down."""
    from paradis_tpu.ops.interp_pallas import _n_sub, _pick_pb_sub

    monkeypatch.setenv("PARADIS_INTERP_SUBBLOCK", "4")
    assert _n_sub(512) == 4
    assert _n_sub(256) == 2   # 4 would give 64-lane sub-blocks
    assert _n_sub(128) == 1
    monkeypatch.delenv("PARADIS_INTERP_SUBBLOCK")
    # bare _n_sub defaults monolithic; the measured sub-blocked default
    # (sp=128, bwd pb cap 1024 / fwd 2048 — BASELINE.md round-5 ladder)
    # comes from _pick_pb_sub
    assert _n_sub(2048) == 1
    monkeypatch.delenv("PARADIS_INTERP_PB", raising=False)
    pb, ns = _pick_pb_sub(32768, 8, 132, 260, bwd=True)   # 1.40625° bwd
    assert (pb, ns) == (1024, 8)
    pb, ns = _pick_pb_sub(2048, 8, 36, 68, bwd=False)     # flagship fwd
    assert (pb, ns) == (2048, 16)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("rw", [8, 16])
@pytest.mark.slow
def test_chunked_rows_parity(mode, rw):
    """Row-chunked kernels (the large-grid path): forward + all three
    cotangents must match the dense oracle, including the zero-padded row
    remainder (R=24 pads to 32 at rw=16) and multi-chunk spans."""
    field, py, px = _setup(B=2, Hp=24, Wp=20, V=4, H=20, W=16, seed=7)
    py = jnp.floor(py) + 0.37   # away from the kernel's derivative kinks
    px = jnp.floor(px) + 0.61

    ours = np.asarray(grid_sample_interp_pallas(field, py, px, mode,
                                                interpret=True, chunk_rows=rw))
    ref = np.asarray(grid_sample_interp(field, py, px, mode, method="gather"))
    np.testing.assert_allclose(ours, ref, atol=3e-5)

    def loss_pallas(f, y, x):
        return jnp.sum(grid_sample_interp_pallas(f, y, x, mode,
                                                 interpret=True,
                                                 chunk_rows=rw) ** 2)

    def loss_dense(f, y, x):
        return jnp.sum(grid_sample_interp(f, y, x, mode, method="dense") ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(field, py, px)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(field, py, px)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3)


@pytest.mark.slow
def test_chunked_skipping_narrow_band(monkeypatch):
    """Positions clustered near their source row: most chunks are skipped by
    the pl.when guard, across multiple position blocks."""
    import paradis_tpu.ops.interp_pallas as mod

    rng = np.random.default_rng(8)
    B, H, W, V, PAD = 1, 32, 16, 2, 2
    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    field = jnp.asarray(rng.normal(size=(B, Hp, Wp, V)), jnp.float32)
    base_y = np.broadcast_to(np.arange(H)[None, :, None, None],
                             (B, H, W, V)).astype(np.float32)
    py = jnp.asarray(np.clip(base_y + rng.uniform(-1.4, 1.4, size=(B, H, W, V))
                             + PAD, 2.0, Hp - 3.0), jnp.float32)
    px = jnp.asarray(rng.uniform(2.0, Wp - 3.0, size=(B, H, W, V)), jnp.float32)

    monkeypatch.setattr(mod, "_VMEM_BUDGET", 64 * 1024)  # pb=128 < P=512

    def loss_pallas(f, y, x):
        return jnp.sum(grid_sample_interp_pallas(f, y, x, "bicubic",
                                                 interpret=True,
                                                 chunk_rows=8) ** 2)

    def loss_dense(f, y, x):
        return jnp.sum(grid_sample_interp(f, y, x, "bicubic",
                                          method="dense") ** 2)

    out = np.asarray(grid_sample_interp_pallas(field, py, px, "bicubic",
                                               interpret=True, chunk_rows=8))
    ref = np.asarray(grid_sample_interp(field, py, px, "bicubic",
                                        method="gather"))
    np.testing.assert_allclose(out, ref, atol=3e-5)
    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(field, py, px)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(field, py, px)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3)


def test_chunk_heuristics(monkeypatch):
    import paradis_tpu.ops.interp_pallas as mod

    # default is always unchunked (chunking measured slower at every size)
    assert mod._chunk_rows(36, None) == 0
    assert mod._chunk_rows(132, None) == 0
    assert mod._chunk_rows(132, 0) == 0            # explicit off
    assert mod._chunk_rows(36, 8) == 8             # explicit on
    monkeypatch.setenv("PARADIS_INTERP_CHUNK", "16")
    assert mod._chunk_rows(36, None) == 16         # env A/B switch
    # chunked kernels size row temporaries at full R (Mosaic keeps each
    # unrolled pl.when scope's stack slots live: rw-based sizing OOMed the
    # 16 MB scoped-vmem limit on v5e at 1.40625°).  High-res bwd must pick a
    # block small enough for the measured ~1.5× stack overhead.
    assert mod._pick_pb(32768, 8, 160, 264, bwd=True, rw=32) <= 128
    assert mod._pick_pb(32768, 8, 136, 264, bwd=True) <= 128


# (bf16 weight generation "GEN16" was removed: v5e Mosaic supports neither
# 16-bit comparisons nor 32→16-bit mask relayout, so it cannot compile on
# the target — see the dead-end note in ops/interp_pallas.py.)


# -- row banding --------------------------------------------------------------
#
# The banded kernels (interp_pallas._band_spec) must be bit-equivalent to the
# unbanded kernels whenever positions respect the displacement bound (the
# extra rows the unbanded kernel sums over carry exactly-zero weights), and
# must clamp positions to the bound otherwise.


def _banded_setup(mode="bicubic", m=2.0, seed=4, V=4, H=32, W=16):
    """A grid tall enough for banding to pass the profitability gate."""
    pad = 2 if mode == "bicubic" else 1
    Hp, Wp = H + 2 * pad, W + 2 * pad
    rng = np.random.default_rng(seed)
    field = rng.normal(size=(1, Hp, Wp, V)).astype(np.float32)
    arr = (np.arange(H, dtype=np.float32) + pad)[None, :, None, None]
    py = (arr + rng.uniform(-m, m, size=(1, H, W, V))).astype(np.float32)
    px = rng.uniform(1.0, Wp - 3.0, size=(1, H, W, V)).astype(np.float32)
    return jnp.asarray(field), jnp.asarray(py), jnp.asarray(px)


def test_band_spec_gates():
    from paradis_tpu.ops.interp_pallas import _band_spec

    assert _band_spec(32, 16, 36, "bicubic", None) is None  # no bound given
    assert _band_spec(32, 16, 36, "bicubic", 2.0) is not None
    # flagship-like: band not meaningfully smaller than R → rejected
    assert _band_spec(32, 64, 36, "bicubic", 4.0) is None
    # high-res-like: engaged, small band
    spec = _band_spec(128, 256, 132, "bicubic", 12.4)
    assert spec is not None
    rpb, band_rows, halo_lo, pad, mpix = spec
    assert band_rows <= 48 and band_rows % 8 == 0 and pad == 2


def test_band_env_kill(monkeypatch):
    from paradis_tpu.ops.interp_pallas import _band_spec

    monkeypatch.setenv("PARADIS_INTERP_BAND", "0")
    assert _band_spec(128, 256, 132, "bicubic", 12.4) is None


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_banded_forward_matches_unbanded(mode):
    field, py, px = _banded_setup(mode)
    banded = np.asarray(grid_sample_interp_pallas(
        field, py, px, mode, interpret=True, max_dy_pix=2.0))
    plain = np.asarray(grid_sample_interp_pallas(
        field, py, px, mode, interpret=True))
    # extra rows in the unbanded contraction carry exactly-zero weights
    np.testing.assert_allclose(banded, plain, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_banded_gradients_match_unbanded(mode):
    field, py, px = _banded_setup(mode, seed=5, V=2)
    py = jnp.floor(py) + 0.37
    px = jnp.floor(px) + 0.61

    def loss(f, y, x, band):
        out = grid_sample_interp_pallas(f, y, x, mode, interpret=True,
                                        max_dy_pix=band)
        return jnp.sum(out ** 2)

    gb = jax.grad(loss, argnums=(0, 1, 2))(field, py, px, 3.0)
    gp = jax.grad(loss, argnums=(0, 1, 2))(field, py, px, None)
    for a, b in zip(gb, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-5)


def test_banded_clamps_out_of_bound_rows():
    field, py, px = _banded_setup("bicubic", m=1.0, seed=6)
    # push some departure rows far beyond the bound
    wild = py.at[0, 3, :, :].add(20.0).at[0, 20, :, :].add(-20.0)
    banded = np.asarray(grid_sample_interp_pallas(
        field, wild, px, "bicubic", interpret=True, max_dy_pix=2.0))
    # reference: unbanded at the explicitly clamped positions
    pad = 2
    arr = (jnp.arange(32, dtype=jnp.float32) + pad)[None, :, None, None]
    clamped = jnp.clip(wild, arr - 2.0, arr + 2.0)
    plain = np.asarray(grid_sample_interp_pallas(
        field, clamped, px, "bicubic", interpret=True))
    np.testing.assert_allclose(banded, plain, atol=1e-6, rtol=1e-6)
