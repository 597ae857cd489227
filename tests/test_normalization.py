import numpy as np

from paradis_tpu.utils.normalization import (
    denormalize_humidity,
    denormalize_precipitation,
    denormalize_standard,
    normalize_humidity,
    normalize_precipitation,
    normalize_standard,
)


def test_standard_roundtrip():
    x = np.random.default_rng(0).normal(5, 3, size=(10, 4)).astype(np.float32)
    mean, std = np.float32(5.0), np.float32(3.0)
    np.testing.assert_allclose(
        denormalize_standard(normalize_standard(x, mean, std), mean, std), x, atol=1e-5
    )


def test_humidity_roundtrip_and_range():
    q = np.asarray([1e-5, 1e-4, 1e-3, 5e-3, 2e-2], np.float32)
    q_min, q_max = np.float32(1e-6), np.float32(0.03)
    n = normalize_humidity(q, q_min, q_max)
    assert (n >= 0).all() and (n <= 1.01).all()
    back = denormalize_humidity(n, q_min, q_max)
    np.testing.assert_allclose(back, q, rtol=1e-3)


def test_humidity_clips_negative_input():
    q = np.asarray([-1e-3], np.float32)
    n = normalize_humidity(q, np.float32(1e-6), np.float32(0.03))
    assert np.isfinite(n).all()


def test_precipitation_roundtrip_and_clip():
    p = np.asarray([0.0, 1e-4, 5e-3, 0.1], np.float32)
    n = normalize_precipitation(p)
    back = denormalize_precipitation(n)
    np.testing.assert_allclose(back, p, atol=1e-7)
    # denormalizing very negative values clips to zero, not negative rain
    assert denormalize_precipitation(np.asarray([-50.0], np.float32))[0] == 0.0


def test_jnp_dispatch():
    import jax.numpy as jnp

    q = jnp.asarray([1e-4, 1e-3])
    n = normalize_humidity(q, jnp.float32(1e-6), jnp.float32(0.03))
    assert isinstance(n, jnp.ndarray)
