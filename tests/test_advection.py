import jax
import jax.numpy as jnp
import numpy as np

from paradis_tpu.ops.advection import (
    NeuralSemiLagrangian,
    departure_pixel_coords,
    enforce_pole_continuity,
)
from paradis_tpu.sphere.geometry import equiangular_lat_lon, lonlat_grids

KEY = jax.random.PRNGKey(0)


def _grids(H=8, W=16):
    lat, lon = equiangular_lat_lon(H, W, include_poles=False)
    latg, long_ = lonlat_grids(np.deg2rad(lat), np.deg2rad(lon))
    return jnp.asarray(latg, jnp.float32), jnp.asarray(long_, jnp.float32)


def test_pole_continuity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 8, 3)), jnp.float32)
    y = np.asarray(enforce_pole_continuity(x))
    for b in range(2):
        for c in range(3):
            assert np.allclose(y[b, 0, :, c], y[b, 0, 0, c])
            assert np.allclose(y[b, -1, :, c], y[b, -1, 0, c])
            np.testing.assert_allclose(y[b, 0, 0, c], np.asarray(x)[b, 0, :, c].mean(),
                                       atol=1e-6)
    np.testing.assert_allclose(y[:, 1:-1], np.asarray(x)[:, 1:-1])


def test_zero_velocity_departure_is_grid():
    latg, long_ = _grids()
    H, W = latg.shape
    u = jnp.zeros((1, H, W, 2), jnp.float32)
    py, px = departure_pixel_coords(u, u, 0.2, latg, long_)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    np.testing.assert_allclose(np.asarray(py)[0, :, :, 0], yy, atol=1e-3)
    np.testing.assert_allclose(np.asarray(px)[0, :, :, 0], xx, atol=1e-3)


def test_eastward_velocity_shifts_departure_west():
    """Positive u advects the field eastward, so departure points look west."""
    latg, long_ = _grids()
    H, W = latg.shape
    u = jnp.full((1, H, W, 1), 1.0, jnp.float32)
    v = jnp.zeros_like(u)
    dt = 0.1
    py, px = departure_pixel_coords(u, v, dt, latg, long_)
    eq = H // 2  # row nearest the equator
    xx = np.arange(W)
    dlon = 2 * np.pi / W
    expected_px = (xx - dt / dlon) % W  # wraps at the date line
    got = np.asarray(px)[0, eq, :, 0]
    # compare where no wraparound ambiguity
    mask = expected_px < W - 1.5
    np.testing.assert_allclose(got[mask], expected_px[mask], atol=0.05)


def test_module_shapes_and_pole_rows():
    latg, long_ = _grids()
    H, W = latg.shape
    m = NeuralSemiLagrangian(hidden_dim=12, num_vels=4, mesh_size=(H, W))
    hidden = jnp.asarray(np.random.default_rng(1).normal(size=(2, H, W, 12)), jnp.float32)
    u = jnp.asarray(np.random.default_rng(2).normal(size=(2, H, W, 4)), jnp.float32)
    v = jnp.asarray(np.random.default_rng(3).normal(size=(2, H, W, 4)), jnp.float32)
    params = m.init(KEY, hidden, u, v, 0.19, latg, long_)
    out = m.apply(params, hidden, u, v, 0.19, latg, long_)
    assert out.shape == (2, H, W, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_velocity_roundtrip_is_projection_identity():
    """With u=v=0 the advection reduces to up(down(x)) — interpolation exact."""
    latg, long_ = _grids()
    H, W = latg.shape
    m = NeuralSemiLagrangian(hidden_dim=8, num_vels=8, mesh_size=(H, W),
                             interpolation="bicubic")
    hidden = jnp.asarray(np.random.default_rng(4).normal(size=(1, H, W, 8)), jnp.float32)
    zeros = jnp.zeros((1, H, W, 8), jnp.float32)
    params = m.init(KEY, hidden, zeros, zeros, 0.19, latg, long_)

    out = m.apply(params, hidden, zeros, zeros, 0.19, latg, long_)

    # manually: down-project, pole-fix (twice — second is idempotent), up-project
    from paradis_tpu.ops.blocks import GMBlock

    down = GMBlock(layers=("SepConv",), input_dim=8, output_dim=8, hidden_dim=0,
                   mesh_size=(H, W)).apply(
        {"params": params["params"]["down_projection"]}, hidden)
    fixed = enforce_pole_continuity(down)
    expected = GMBlock(layers=("CLinear",), input_dim=8, output_dim=8, hidden_dim=0,
                       mesh_size=(H, W)).apply(
        {"params": params["params"]["up_projection"]}, fixed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-4)


def test_jit_and_grad():
    latg, long_ = _grids()
    H, W = latg.shape
    m = NeuralSemiLagrangian(hidden_dim=6, num_vels=3, mesh_size=(H, W))
    hidden = jnp.ones((1, H, W, 6), jnp.float32)
    u = 0.3 * jnp.ones((1, H, W, 3), jnp.float32)
    params = m.init(KEY, hidden, u, u, 0.19, latg, long_)

    def loss(p, h, uu):
        return jnp.sum(m.apply(p, h, uu, uu, 0.19, latg, long_) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(params, hidden, u)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # gradient must flow into the velocities (through departure points)
    assert float(jnp.abs(g[2]).sum()) > 0.0


def test_max_dy_clamp_consistent_across_backends():
    """With ``max_dy_pix`` set, the displacement clamp applies on EVERY
    backend (not just pallas), so xla/gather numerics match when it binds."""
    from paradis_tpu.ops.advection import interpolate

    rng = np.random.default_rng(11)
    B, H, W, V, pad = 1, 8, 16, 2, 2
    field = jnp.asarray(rng.normal(size=(B, H + 2 * pad, W, V)),
                        jnp.float32)
    # rows displaced far beyond the bound: the clamp must bind
    arr = jnp.arange(H, dtype=jnp.float32)[None, :, None, None] + pad
    py = jnp.broadcast_to(arr, (B, H, W, V)) + jnp.asarray(
        rng.uniform(-4.0, 4.0, size=(B, H, W, V)), jnp.float32)
    px = jnp.asarray(rng.uniform(2.0, W - 3.0, size=(B, H, W, V)),
                     jnp.float32)
    m = 1.0
    clamped_py = jnp.clip(py, arr - m, arr + m)
    for impl in ("xla", "gather"):
        got = np.asarray(interpolate(field, py, px, "bicubic", impl=impl,
                                     max_dy_pix=m))
        want = np.asarray(interpolate(field, clamped_py, px, "bicubic",
                                      impl=impl))
        np.testing.assert_allclose(got, want, atol=1e-6)
        # the clamp must actually have bound (else the test is vacuous)
        unclamped = np.asarray(interpolate(field, py, px, "bicubic",
                                           impl=impl))
        assert np.abs(got - unclamped).max() > 1e-3
