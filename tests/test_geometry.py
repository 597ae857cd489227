import numpy as np
import pytest

from paradis_tpu.sphere.geometry import (
    equiangular_lat_lon,
    latitude_weights,
    lonlat_grids,
    normalized_inverse_lon_spacing,
    rotated_to_latlon,
)


def test_rotated_zero_displacement_is_identity():
    lat, lon = equiangular_lat_lon(16, 32, include_poles=False)
    latg, long_ = lonlat_grids(np.deg2rad(lat), np.deg2rad(lon))
    z = np.zeros_like(latg)
    out_lat, out_lon = rotated_to_latlon(z, z, latg, long_)
    np.testing.assert_allclose(np.asarray(out_lat), latg, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_lon), long_ % (2 * np.pi), atol=1e-5)


def test_rotated_pure_lon_shift_at_equator():
    """At the equator a pure lon' displacement is a geographic lon shift."""
    lat_p = np.array([[0.0]])
    lon_p = np.array([[1.0]])
    dlon = 0.3
    out_lat, out_lon = rotated_to_latlon(
        np.array([[0.0]]), np.array([[dlon]]), lat_p, lon_p
    )
    assert abs(float(out_lat[0, 0])) < 1e-6
    assert abs(float(out_lon[0, 0]) - (1.0 + dlon)) < 1e-6


def test_rotated_pure_lat_shift_on_meridian():
    lat_p = np.array([[0.4]])
    lon_p = np.array([[2.0]])
    dlat = -0.1
    out_lat, out_lon = rotated_to_latlon(
        np.array([[dlat]]), np.array([[0.0]]), lat_p, lon_p
    )
    assert abs(float(out_lat[0, 0]) - 0.3) < 1e-6
    assert abs(float(out_lon[0, 0]) - 2.0) < 1e-6


def test_latitude_weights_unit_mean_no_poles():
    lat, _ = equiangular_lat_lon(32, 64, include_poles=False)
    w = latitude_weights(lat)
    assert abs(w.mean() - 1.0) < 1e-12
    # proportional to cos(lat)
    ratio = w / np.cos(np.deg2rad(lat))
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-12)


def test_latitude_weights_with_poles():
    lat = np.linspace(-90.0, 90.0, 33)
    w = latitude_weights(lat)
    assert abs(w.mean() - 1.0) < 1e-12
    delta = np.deg2rad(lat[1] - lat[0])
    expected_pole = np.sin(delta / 4.0) ** 2
    expected_interior = np.cos(np.deg2rad(lat[1:-1])) * np.sin(delta / 2.0)
    full = np.concatenate([[expected_pole], expected_interior, [expected_pole]])
    np.testing.assert_allclose(w, full / full.mean(), rtol=1e-12)


def test_latitude_weights_rejects_nonuniform():
    with pytest.raises(ValueError):
        latitude_weights(np.array([0.0, 1.0, 3.0]))


def test_inverse_lon_spacing_zscored():
    lat, lon = equiangular_lat_lon(16, 32, include_poles=False)
    f = normalized_inverse_lon_spacing(np.deg2rad(lat), np.deg2rad(lon))
    assert f.shape == (16, 32)
    assert abs(f.mean()) < 1e-10
    assert abs(f.std(ddof=1) - 1.0) < 1e-10
    # larger 1/distance toward the poles -> larger feature value
    assert f[0, 0] > f[8, 0]


def test_fast_trig_matches_exact_within_bound():
    """small_displacement=True agrees with exact trig to fp32 roundoff for
    every displacement within FAST_TRIG_MAX_RAD, across all latitudes."""
    from paradis_tpu.sphere.geometry import FAST_TRIG_MAX_RAD

    rng = np.random.default_rng(0)
    lat, lon = equiangular_lat_lon(16, 32, include_poles=False)
    latg, long_ = lonlat_grids(np.deg2rad(lat), np.deg2rad(lon))
    d_lat = rng.uniform(-FAST_TRIG_MAX_RAD, FAST_TRIG_MAX_RAD, latg.shape)
    d_lon = rng.uniform(-FAST_TRIG_MAX_RAD, FAST_TRIG_MAX_RAD, latg.shape)
    d_lat, d_lon = d_lat.astype(np.float32), d_lon.astype(np.float32)

    ex_lat, ex_lon = rotated_to_latlon(d_lat, d_lon, latg, long_)
    fa_lat, fa_lon = rotated_to_latlon(d_lat, d_lon, latg, long_,
                                       small_displacement=True)
    np.testing.assert_allclose(np.asarray(fa_lat), np.asarray(ex_lat), atol=3e-6)
    # longitude wraps at 2π: compare circular distance
    dlon = np.abs(np.asarray(fa_lon) - np.asarray(ex_lon))
    dlon = np.minimum(dlon, 2 * np.pi - dlon)
    assert dlon.max() < 3e-6


def test_fast_trig_clamps_beyond_bound():
    """Displacements past the bound are clamped to it (not garbage)."""
    from paradis_tpu.sphere.geometry import FAST_TRIG_MAX_RAD

    lat_p = np.array([[0.2]], np.float32)
    lon_p = np.array([[1.0]], np.float32)
    big = np.array([[2.0]], np.float32)
    z = np.zeros_like(big)
    got_lat, got_lon = rotated_to_latlon(big, z, lat_p, lon_p,
                                         small_displacement=True)
    ref_lat, ref_lon = rotated_to_latlon(
        np.full_like(big, FAST_TRIG_MAX_RAD), z, lat_p, lon_p)
    np.testing.assert_allclose(np.asarray(got_lat), np.asarray(ref_lat),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got_lon), np.asarray(ref_lon),
                               atol=3e-6)
