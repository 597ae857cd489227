import jax.numpy as jnp
import numpy as np
import pytest

from paradis_tpu.ops.sht import RealSHT
from paradis_tpu.train.amse import AMSELoss


def _sph_harm_y10(lat_grid):
    # Y_1^0 = sqrt(3/4π) sin(lat)   (in colatitude: cosθ)
    return np.sqrt(3.0 / (4 * np.pi)) * np.sin(lat_grid)


def _grid(nlat=16, nlon=32):
    lat = np.deg2rad(np.linspace(-90 + 180 / (2 * nlat), 90 - 180 / (2 * nlat), nlat))
    lon = np.deg2rad(np.arange(nlon) * 360.0 / nlon)
    return np.meshgrid(lat, lon, indexing="ij")


def test_constant_field_power_in_l0():
    nlat, nlon = 16, 32
    x = jnp.ones((1, nlat, nlon, 1), jnp.float32)
    sht = RealSHT(nlat, nlon)
    c = np.asarray(sht.analysis(x))
    # Y_0^0 = 1/sqrt(4π); coefficient of a unit field = sqrt(4π)
    assert abs(c[0, 0, 0, 0].real - np.sqrt(4 * np.pi)) < 1e-2
    # all other modes ~ zero
    rest = np.abs(c).copy()
    rest[0, 0, 0, 0] = 0
    assert rest.max() < 1e-3


def test_y10_lands_in_l1_m0():
    nlat, nlon = 16, 32
    latg, _ = _grid(nlat, nlon)
    x = jnp.asarray(_sph_harm_y10(latg)[None, :, :, None], jnp.float32)
    c = np.asarray(RealSHT(nlat, nlon).analysis(x))
    assert abs(c[0, 1, 0, 0].real - 1.0) < 1e-2
    rest = np.abs(c).copy()
    rest[0, 1, 0, 0] = 0
    # top-l row aliases slightly on midpoint grids (quadrature exact to deg n-1);
    # the AMSE loss drops that wavenumber
    assert rest.max() < 1e-2


def test_zonal_wave_lands_in_m():
    nlat, nlon = 16, 32
    latg, long_ = _grid(nlat, nlon)
    x = jnp.asarray((np.cos(3 * long_) * np.cos(latg) ** 3)[None, :, :, None], jnp.float32)
    c = np.abs(np.asarray(RealSHT(nlat, nlon).analysis(x)))[0, :, :, 0]
    # all power in m=3 column
    m_power = c.sum(axis=0)
    assert m_power[3] > 100 * (m_power.sum() - m_power[3] + 1e-12)


def test_roundtrip_bandlimited():
    nlat, nlon = 16, 32
    latg, long_ = _grid(nlat, nlon)
    x = (
        1.0
        + 0.5 * np.sin(latg)
        + 0.3 * np.cos(2 * long_) * np.cos(latg) ** 2
    ).astype(np.float32)[None, :, :, None]
    sht = RealSHT(nlat, nlon)
    back = np.asarray(sht.synthesis(sht.analysis(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=5e-3)


def test_amse_zero_for_identical_fields():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32, 3)), jnp.float32)
    loss = AMSELoss(nlat=16, nlon=32)
    assert float(loss(x, x)) < 1e-4


def test_amse_positive_and_scale_sensitive():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 16, 32, 2)), jnp.float32)
    loss = AMSELoss(nlat=16, nlon=32)
    base = float(loss(x, y))
    assert base > 0
    # amplitude term: scaling the prediction changes the loss
    assert float(loss(2.0 * x, y)) > base


def test_amse_single_mode_phase_shift_is_free():
    """AMSE's point: a pure single-mode displacement is NOT double-penalized
    (amplitude equal, coherence |conj(p)·t| invariant to one mode's phase)."""
    nlat, nlon = 16, 32
    latg, long_ = _grid(nlat, nlon)
    base = (np.cos(4 * long_) * np.cos(latg) ** 4).astype(np.float32)[None, :, :, None]
    shifted = (np.cos(4 * long_ + np.pi / 2) * np.cos(latg) ** 4).astype(np.float32)[
        None, :, :, None
    ]
    loss = AMSELoss(nlat=nlat, nlon=nlon)
    assert float(loss(jnp.asarray(shifted), jnp.asarray(base))) < 1e-3


def test_amse_penalizes_decorrelation_of_broadband_fields():
    """A spatially displaced broadband field (multi-m interference) costs more
    than a uniformly damped one — the decorrelation term at work."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(1, 16, 32, 1)).astype(np.float32)
    target = jnp.asarray(base)
    damped = jnp.asarray(0.5 * base)
    rolled = jnp.asarray(np.roll(base, 8, axis=2))
    loss = AMSELoss(nlat=16, nlon=32)
    assert float(loss(rolled, target)) > float(loss(damped, target))


def test_amse_weights():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 16, 32, 2)), jnp.float32)
    loss = AMSELoss(nlat=16, nlon=32)
    w0 = float(loss(x, y, weights=jnp.asarray([1.0, 0.0])))
    w1 = float(loss(x, y, weights=jnp.asarray([0.0, 1.0])))
    full = float(loss(x, y))
    # weighting then channel-mean: masked halves sum to the full loss
    assert w0 + w1 == pytest.approx(full, rel=1e-4)
