"""Headline forecast scoring: latitude-weighted RMSE vs the truth archive.

Computes the WB2-style deterministic headline metrics (Z500 / T850 RMSE at
chosen lead times) from a forecast store written by
:class:`paradis_tpu.forecast.writer.ZarrForecastWriter` against a
preprocessed truth store.  This is the measurement half of the project's
north-star metric (BASELINE.md) — the reference repo itself defers scoring
to external WB2 tooling.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from paradis_tpu.data import zarrlite
from paradis_tpu.sphere.geometry import latitude_weights

# forecast-store variable → truth-store stacked feature name
_TRUTH_NAME = {
    "u_component_of_wind": "u_component_of_wind",
    "v_component_of_wind": "v_component_of_wind",
    "vertical_velocity": "vertical_velocity",
    "geopotential": "geopotential",
    "temperature": "temperature",
    "specific_humidity": "specific_humidity",
    "2m_temperature": "2m_temperature",
    "mean_sea_level_pressure": "mean_sea_level_pressure",
    "10m_u_component_of_wind": "10m_u_component_of_wind",
    "10m_v_component_of_wind": "10m_v_component_of_wind",
    "total_precipitation_6hr": "total_precipitation_6hr",
}


class TruthReader:
    """Reads denormalized truth fields from a preprocessed store."""

    def __init__(self, root: str):
        self.root = Path(root)
        years = sorted(p for p in self.root.iterdir() if p.name.isdigit())
        self._groups = [zarrlite.open_store(p) for p in years]
        self.times = np.concatenate(
            [np.asarray(g["time"][...]).astype("datetime64[s]") for g in self._groups]
        )
        self._sizes = [g["data"].shape[0] for g in self._groups]
        self.features = [str(f) for f in self._groups[0]["features"][...]]
        self.lat = np.asarray(self._groups[0]["latitude"][...])

    def field(self, name: str, time: np.datetime64) -> np.ndarray | None:
        idx = int(np.searchsorted(self.times, time.astype("datetime64[s]")))
        if idx >= len(self.times) or self.times[idx] != time:
            return None
        fi = self.features.index(name)
        for g, n in zip(self._groups, self._sizes):
            if idx < n:
                return np.asarray(g["data"][idx, fi])
            idx -= n
        return None


def evaluate_store(forecast_path: str, truth_root: str,
                   variables: list[tuple[str, int | None]],
                   lead_hours: list[int]) -> dict:
    """RMSE per (variable, lead) over all init times with available truth."""
    fc = zarrlite.open_store(forecast_path)
    truth = TruthReader(truth_root)
    init_times = np.asarray(fc["time"][...]).astype("datetime64[s]")
    tds = np.asarray(fc["prediction_timedelta"][...]).astype("timedelta64[h]")
    levels = [int(l) for l in np.asarray(fc["level"][...])]
    lat_w = latitude_weights(np.asarray(fc["latitude"][...])).astype(np.float64)

    results = {}
    for var, level in variables:
        arr = fc[var]
        lvl_idx = levels.index(level) if level is not None else None
        truth_name = _TRUTH_NAME[var] + (f"_h{level}" if level is not None else "")
        for lead in lead_hours:
            td_candidates = np.nonzero(tds == np.timedelta64(lead, "h"))[0]
            if len(td_candidates) == 0:
                continue
            td_i = int(td_candidates[0])
            errors, count = 0.0, 0
            for t_i, t0 in enumerate(init_times):
                target_time = t0 + np.timedelta64(lead, "h")
                tr = truth.field(truth_name, target_time)
                if tr is None:
                    continue
                if lvl_idx is not None:
                    pred = np.asarray(arr[t_i, td_i, lvl_idx])
                else:
                    pred = np.asarray(arr[t_i, td_i])
                if not np.isfinite(pred).all():
                    continue
                se = (pred.astype(np.float64) - tr.astype(np.float64)) ** 2
                errors += float((se * lat_w[:, None]).mean())
                count += 1
            if count:
                key = f"{var}_h{level}" if level is not None else var
                results[f"{key}@{lead}h"] = float(np.sqrt(errors / count))
    return results


def _parse_variable(text: str) -> tuple[str, int | None]:
    if ":" in text:
        name, lvl = text.split(":")
        return name, int(lvl)
    return text, None


def main(argv=None):
    p = argparse.ArgumentParser(description="Score a forecast store (lat-weighted RMSE).")
    p.add_argument("--forecast", required=True)
    p.add_argument("--truth", required=True, help="preprocessed truth store root")
    p.add_argument("--variables", nargs="+",
                   default=["geopotential:500", "temperature:850"])
    p.add_argument("--lead-hours", type=int, nargs="+", default=[24, 72, 120])
    args = p.parse_args(argv)
    results = evaluate_store(args.forecast, args.truth,
                             [_parse_variable(v) for v in args.variables],
                             args.lead_hours)
    print(json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    main()
