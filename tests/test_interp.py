import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.interp import grid_sample_interp, grid_sample_interp_dense


def _setup(B=2, Hp=10, Wp=14, V=3, H=6, W=8, seed=0):
    rng = np.random.default_rng(seed)
    field = rng.normal(size=(B, Hp, Wp, V)).astype(np.float32)
    # keep coords well inside so all taps (incl. bicubic ±2) are in-bounds
    py = rng.uniform(2.0, Hp - 3.0, size=(B, H, W, V)).astype(np.float32)
    px = rng.uniform(2.0, Wp - 3.0, size=(B, H, W, V)).astype(np.float32)
    return field, py, px


def test_integer_coords_identity_both_modes():
    field, _, _ = _setup()
    B, Hp, Wp, V = field.shape
    yy, xx = np.meshgrid(np.arange(3, 7), np.arange(3, 9), indexing="ij")
    py = np.broadcast_to(yy[None, :, :, None], (B, 4, 6, V)).astype(np.float32)
    px = np.broadcast_to(xx[None, :, :, None], (B, 4, 6, V)).astype(np.float32)
    expected = np.stack([field[b, 3:7, 3:9, :] for b in range(B)])
    for mode in ("bilinear", "bicubic"):
        out = np.asarray(grid_sample_interp(jnp.asarray(field), jnp.asarray(py),
                                            jnp.asarray(px), mode=mode))
        np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_torch_grid_sample_parity(mode):
    """Numerical parity with F.grid_sample(align_corners=True) per reference
    model/advection.py:149-167 (grid built from pixel coords)."""
    torch = pytest.importorskip("torch")
    field, py, px = _setup()
    B, Hp, Wp, V = field.shape
    _, H, W, _ = py.shape

    out = np.asarray(grid_sample_interp(jnp.asarray(field), jnp.asarray(py),
                                        jnp.asarray(px), mode=mode))

    # reference path: normalize pixel coords to [-1,1] and run grid_sample
    # per (batch × vel) single-channel map
    f = torch.from_numpy(field.transpose(0, 3, 1, 2).reshape(B * V, 1, Hp, Wp))
    gx = 2.0 * (px / (Wp - 1)) - 1.0
    gy = 2.0 * (py / (Hp - 1)) - 1.0
    grid = np.stack([gx, gy], axis=-1)  # [B,H,W,V,2]
    grid = torch.from_numpy(grid.transpose(0, 3, 1, 2, 4).reshape(B * V, H, W, 2))
    ref = torch.nn.functional.grid_sample(
        f, grid, align_corners=True, mode=mode, padding_mode="zeros"
    ).numpy().reshape(B, V, H, W).transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_bilinear_linear_field_exact():
    """Bilinear interpolation reproduces a linear ramp exactly."""
    Hp, Wp = 12, 16
    yy, xx = np.meshgrid(np.arange(Hp), np.arange(Wp), indexing="ij")
    field = (2.0 * yy + 0.5 * xx).astype(np.float32)[None, :, :, None]
    rng = np.random.default_rng(1)
    py = rng.uniform(1, Hp - 2, size=(1, 5, 7, 1)).astype(np.float32)
    px = rng.uniform(1, Wp - 2, size=(1, 5, 7, 1)).astype(np.float32)
    out = np.asarray(grid_sample_interp(jnp.asarray(field), jnp.asarray(py),
                                        jnp.asarray(px), "bilinear"))
    np.testing.assert_allclose(out, 2.0 * py + 0.5 * px, atol=1e-4)


def test_bicubic_weights_sum_to_one():
    from paradis_tpu.ops.interp import _cubic_weights

    t = jnp.linspace(0.0, 0.999, 50)
    w = _cubic_weights(t)
    np.testing.assert_allclose(np.asarray(sum(w)), 1.0, atol=1e-5)


def test_bf16_field_fp32_accumulation():
    field, py, px = _setup()
    out = grid_sample_interp(jnp.asarray(field, jnp.bfloat16), jnp.asarray(py),
                             jnp.asarray(px), "bicubic")
    assert out.dtype == jnp.bfloat16


def test_bad_mode_raises():
    field, py, px = _setup()
    with pytest.raises(ValueError):
        grid_sample_interp(jnp.asarray(field), jnp.asarray(py), jnp.asarray(px), "nearest")
    with pytest.raises(ValueError):
        grid_sample_interp(jnp.asarray(field), jnp.asarray(py), jnp.asarray(px),
                           "bilinear", method="scatter")


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_dense_matches_gather(mode):
    """The TPU-native dense-kernel path ≡ the tap-gather oracle."""
    field, py, px = _setup(B=2, Hp=12, Wp=16, V=5, H=7, W=9, seed=4)
    f, y, x = jnp.asarray(field), jnp.asarray(py), jnp.asarray(px)
    dense = np.asarray(grid_sample_interp_dense(f, y, x, mode))
    gather = np.asarray(grid_sample_interp(f, y, x, mode, method="gather"))
    np.testing.assert_allclose(dense, gather, atol=2e-5)


def test_dense_bf16_path_close():
    field, py, px = _setup()
    f32 = np.asarray(grid_sample_interp_dense(
        jnp.asarray(field), jnp.asarray(py), jnp.asarray(px), "bicubic"))
    bf16 = np.asarray(grid_sample_interp_dense(
        jnp.asarray(field, jnp.bfloat16), jnp.asarray(py), jnp.asarray(px),
        "bicubic").astype(jnp.float32))
    np.testing.assert_allclose(bf16, f32, atol=0.05)
