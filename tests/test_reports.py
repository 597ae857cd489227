"""Report RMSEs: humidity/precip channels use physical denormalization."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("rep"))


def test_humidity_and_precip_reports(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 2,
        "training.optimizer.name": "adamw",
        "training.reports.features": [
            "geopotential_h500", "specific_humidity_h850",
            "total_precipitation_6hr",
        ],
    })
    log_dir = tmp_path_factory.mktemp("rlogs")
    t = Trainer(cfg, log_dir=str(log_dir))
    assert t.eval_step is not None
    res = t.fit()
    text = (log_dir / "metrics.csv").read_text()
    rows = {}
    for line in text.strip().splitlines()[1:]:
        step, name, value = line.split(",")
        rows[name] = float(value)
    # geopotential RMSE in physical units (z-scored std ~3e4 for the fixture)
    assert rows["geopotential_h500"] > 1.0
    # humidity RMSE in kg/kg: tiny physical magnitudes, positive
    assert 0 < rows["specific_humidity_h850"] < 1.0
    assert rows["total_precipitation_6hr"] >= 0
    assert np.isfinite(res["val_loss"])


def test_wb2_layout_canonicalization(tmp_path_factory):
    """A genuine-WB2-convention store ([time,level,lat,lon] atmo arrays,
    lat/lon coordinate names, descending latitude) preprocesses to exactly
    the same stacked data as the canonical layout."""
    from paradis_tpu.data import zarrlite
    from paradis_tpu.data.preprocess import preprocess
    from paradis_tpu.data.synthetic import build_raw_store

    base = tmp_path_factory.mktemp("wb2layout")
    build_raw_store(str(base / "raw_a"), nlat=8, nlon=16, n_times=8,
                    levels=(500, 850, 1000), seed=3)
    build_raw_store(str(base / "raw_b"), nlat=8, nlon=16, n_times=8,
                    levels=(500, 850, 1000), seed=3, wb2_layout=True)
    preprocess(str(base / "raw_a"), str(base / "out_a"), toa_time_stride=4)
    preprocess(str(base / "raw_b"), str(base / "out_b"), toa_time_stride=4)
    ga = zarrlite.open_store(base / "out_a" / "2000")
    gb = zarrlite.open_store(base / "out_b" / "2000")
    np.testing.assert_array_equal(np.asarray(ga["features"][...]),
                                  np.asarray(gb["features"][...]))
    np.testing.assert_allclose(np.asarray(ga["data"][...]),
                               np.asarray(gb["data"][...]), rtol=1e-6)


def test_score_against_raw_wb2_truth(store, tmp_path_factory):
    """evaluate_store scores a forecast directly against a raw WB2-layout
    archive (no preprocessing of the truth window) via WB2TruthReader."""
    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.synthetic import build_raw_store
    from paradis_tpu.forecast.evaluate import WB2TruthReader, evaluate_store, open_truth
    from paradis_tpu.forecast.writer import ZarrForecastWriter

    cfg = toy_config(store, **{
        "model.forecast_steps": 2,
        "forecast.enable": True,
    })
    out = tmp_path_factory.mktemp("wb2ev") / "fc.zarr"
    cfg.forecast.output_file = str(out)

    ds = ERA5Dataset(str(store), "2000-01-02", "2000-01-04", forecast_steps=2,
                     cfg=cfg, prediction_stage=True)
    writer = ZarrForecastWriter(cfg, ds)
    writer.init_store(ds)
    truth_norm = ERA5Dataset(str(store), "2000-01-02", "2000-01-05",
                             forecast_steps=2, cfg=cfg)
    for i in range(len(ds)):
        _, y, _, _ = truth_norm[i]
        writer.write_forecast_chunk(np.moveaxis(y, -1, 1)[None],
                                    np.asarray([i]), 0, ds)

    # the same physical fields, stored with the genuine archive's conventions
    raw_wb2 = tmp_path_factory.mktemp("wb2truth") / "era5"
    from fixtures import TOY_LEVELS, TOY_NLAT, TOY_NLON, TOY_TIMES
    build_raw_store(str(raw_wb2), nlat=TOY_NLAT, nlon=TOY_NLON,
                    n_times=TOY_TIMES, levels=TOY_LEVELS,
                    start="2000-01-01T00:00:00", seed=7, wb2_layout=True)
    assert isinstance(open_truth(str(raw_wb2)), WB2TruthReader)

    res = evaluate_store(str(out), str(raw_wb2),
                         [("geopotential", 500), ("2m_temperature", None)],
                         lead_hours=[6, 12])
    # perfect forecast: only float32/bitround noise vs the raw archive
    assert res["geopotential_h500@6h"] < 1.0
    assert res["2m_temperature@12h"] < 0.1
    # anomaly correlation of a perfect forecast is 1 (anomalies vs the
    # scored-window climatology)
    assert res["geopotential_h500@6h:acc"] > 0.999
    assert res["2m_temperature@12h:acc"] > 0.999

    # and the raw-truth scores match the preprocessed-truth scores
    res_pre = evaluate_store(str(out), str(store),
                             [("geopotential", 500), ("2m_temperature", None)],
                             lead_hours=[6, 12])
    for k in res_pre:
        np.testing.assert_allclose(res[k], res_pre[k], rtol=1e-5, atol=1e-6)
