"""Weighted forecast losses: MSE, reversed Huber, AMSE (spectral).

Weighting scheme (reference ``utils/loss.py:7-282``):
  * per-variable weights from config,
  * pressure-level weights ``max(p/1000, 0.2)`` on atmospheric channels,
  * GraphCast-style unit-mean latitude area weights.

The reversed Huber is the sigmoid-blended linear/quadratic kernel of
reference ``utils/loss.py:233-255``.  All loss math runs in float32.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from paradis_tpu.sphere.geometry import latitude_weights

_LEVEL_RE = re.compile(r"_h\d+$")


def strip_level(name: str) -> str:
    """'geopotential_h500' → 'geopotential' (reference utils/loss.py:211)."""
    return _LEVEL_RE.sub("", name)


def pressure_weights(levels_hpa: np.ndarray) -> np.ndarray:
    """``max(p/1000, 0.2)`` per level (reference utils/loss.py:199-201)."""
    p = np.asarray(levels_hpa, np.float32) / 1000.0
    return np.where(p > 0.2, p, 0.2).astype(np.float32)


def build_variable_weights(cfg, output_name_order: list[str]) -> np.ndarray:
    """Per-output-channel variable weights from config, in output order.

    Raises if any output feature has no configured weight
    (reference ``trainer.py:150-171``).
    """
    table = {}
    table.update(cfg.training.variable_loss_weights.atmospheric)
    table.update(cfg.training.variable_loss_weights.surface)
    out = np.zeros(len(output_name_order), np.float32)
    for i, feat in enumerate(output_name_order):
        base = strip_level(feat)
        if base not in table:
            raise ValueError(
                f"No loss weight configured for output feature {feat!r} "
                f"(base variable {base!r})."
            )
        out[i] = float(table[base])
    return out


def reversed_huber(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Smooth reversed Huber: linear for small errors, quadratic for large.

    Blend weight is ``sigmoid(2 (|e| - δ))`` (reference utils/loss.py:233-255).
    """
    error = pred - target
    abs_error = jnp.abs(error)
    small = delta * abs_error
    large = (error * error + delta * delta) / (2.0 * delta)
    w = 1.0 / (1.0 + jnp.exp(-2.0 * (abs_error - delta)))
    return (1.0 - w) * small + w * large


@dataclass(frozen=True)
class WeightedLoss:
    """Feature- and latitude-weighted pointwise loss over [B, H, W, C] fields."""

    kind: str                      # "mse" | "reversed_huber" | "amse"
    feature_weights: np.ndarray    # [C]
    lat_weights: Optional[np.ndarray] = None  # [H] or None
    delta: float = 1.0
    amse: Optional[object] = None  # AMSELoss instance when kind == "amse"

    @classmethod
    def from_config(cls, cfg, lat_deg: np.ndarray, output_name_order: list[str],
                    kind: Optional[str] = None,
                    nlon: Optional[int] = None) -> "WeightedLoss":
        kind = kind or cfg.training.loss_function.type
        levels = [float(l) for l in cfg.features.pressure_levels]

        lcfg = cfg.training.loss_function
        apply_pw = bool(lcfg.get("apply_pressure_weights", True))
        flip_geo = bool(lcfg.get("flip_geopotential_weights", False))

        var_w = build_variable_weights(cfg, output_name_order)
        fw = var_w.copy()
        if apply_pw:
            pw = pressure_weights(np.asarray(levels, np.float32))
            pw_flipped = pw[::-1]
            level_pos = {l: i for i, l in enumerate(levels)}
            # Derive the level of each output channel from its ``_h{level}``
            # name suffix — robust to any channel ordering (the reference
            # assumes [var × level] blocks, utils/loss.py:207-229; here an
            # output-only atmospheric variable would be reordered after the
            # surface commons by dataset._build_features).
            for i, feat in enumerate(output_name_order):
                m = _LEVEL_RE.search(feat)
                if m is None:
                    continue  # surface variable: variable weight only
                lev = float(m.group()[2:])
                if lev not in level_pos:
                    raise ValueError(
                        f"output feature {feat!r} has level {lev} not in "
                        f"configured pressure_levels {levels}"
                    )
                table = (
                    pw_flipped
                    if flip_geo and strip_level(feat) == "geopotential"
                    else pw
                )
                fw[i] = var_w[i] * table[level_pos[lev]]

        lat_w = None
        if cfg.training.loss_function.lat_weights and kind != "amse":
            lat_w = latitude_weights(np.asarray(lat_deg, np.float64)).astype(np.float32)

        amse = None
        if kind == "amse":
            from paradis_tpu.train.amse import AMSELoss

            # the reference derives nlon as 2*(nlat-1) (utils/loss.py:94),
            # which only matches pole-inclusive grids; use the true lon count
            nlat = len(lat_deg)
            lat_arr = np.asarray(lat_deg, np.float64)
            includes_poles = abs(lat_arr.min() + 90) < 1e-6 and abs(lat_arr.max() - 90) < 1e-6
            amse = AMSELoss(
                nlat=nlat,
                nlon=int(nlon) if nlon else 2 * (nlat - 1),
                includes_poles=includes_poles,
            )
        elif kind not in ("mse", "reversed_huber"):
            raise ValueError(
                f"{kind} not supported, choose between [reversed_huber, mse, amse]"
            )

        return cls(
            kind=kind,
            feature_weights=fw,
            lat_weights=lat_w,
            delta=float(cfg.training.loss_function.delta_loss),
            amse=amse,
        )

    # -- pointwise kernels ----------------------------------------------------

    def _pointwise(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.kind == "mse":
            d = pred - target
            return d * d
        return reversed_huber(pred, target, self.delta)

    def _weighted(self, loss: jnp.ndarray) -> jnp.ndarray:
        loss = loss * jnp.asarray(self.feature_weights)
        if self.lat_weights is not None:
            loss = loss * jnp.asarray(self.lat_weights)[:, None, None]
        return loss

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Scalar weighted loss over ``[B, H, W, C]`` prediction/target."""
        if self.kind == "amse":
            return self.amse(pred, target, weights=jnp.asarray(self.feature_weights))
        return jnp.mean(self._weighted(self._pointwise(pred, target)))

    def per_channel(self, pred: jnp.ndarray, target: jnp.ndarray,
                    weighted: bool = True) -> jnp.ndarray:
        """Per-output-channel diagnostic loss ``[C]`` (reference loss.py:105-126)."""
        loss = self._pointwise(pred, target)
        if weighted:
            loss = self._weighted(loss)
        return jnp.mean(loss, axis=(0, 1, 2))
