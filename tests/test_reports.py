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
