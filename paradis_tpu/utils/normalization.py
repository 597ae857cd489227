"""Physical-variable normalizations (host numpy and device jnp compatible).

Formulae match reference ``utils/normalization.py:6-80``:
  * z-score for most variables,
  * specific humidity: log-map onto [0, 1] via dataset-wide q_min/q_max,
  * precipitation: ``log(x + 1e-6) + 10``,
with inverse maps clipping back to the physical range.

Every function dispatches on the input type — numpy arrays stay on the host
(data pipeline), jax arrays stay on device (in-step denormalized reports).
"""

from __future__ import annotations

import numpy as np


def _xp(data):
    if isinstance(data, np.ndarray) or np.isscalar(data):
        return np
    import jax.numpy as jnp

    return jnp


def normalize_standard(data, mean, std):
    return (data - mean) / std


def denormalize_standard(data, mean, std):
    return data * std + mean


def normalize_humidity(data, q_min, q_max, eps=1e-12):
    xp = _xp(data)
    log_min = xp.log(q_min)
    return (xp.log(xp.clip(data, 0, q_max) + eps) - log_min) / (xp.log(q_max) - log_min)


def denormalize_humidity(data, q_min, q_max, eps=1e-12):
    xp = _xp(data)
    log_min = xp.log(q_min)
    q = xp.exp(data * (xp.log(q_max) - log_min) + log_min) - eps
    return xp.clip(q, 0, q_max)


def normalize_precipitation(data, shift=10.0, eps=1e-6):
    xp = _xp(data)
    return xp.log(data + eps) + shift


def denormalize_precipitation(data, shift=10.0, eps=1e-6):
    xp = _xp(data)
    return xp.clip(xp.exp(data - shift) - eps, 0, None)
