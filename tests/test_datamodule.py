"""Era5DataModule wrapper: reference API shape over our dataset/loaders."""

import numpy as np
import pytest

from paradis_tpu.data.datamodule import Era5DataModule

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("dm"))


def test_fit_stage(store):
    cfg = toy_config(store)
    dm = Era5DataModule(cfg)
    dm.setup("fit")
    assert dm.num_out_features == 27
    assert dm.num_common_features == 23
    assert dm.output_name_order[0].startswith("geopotential")
    batch = next(iter(dm.train_dataloader()))
    assert batch["input"].shape[0] == 1
    val = next(iter(dm.val_dataloader()))
    assert val["target"].shape[1] == 1  # val_forecast_steps defaults to train
    # idempotent setup
    dm.setup("fit")


def test_predict_stage(store):
    cfg = toy_config(store, **{
        "forecast.start_date": "2000-01-05",
        "forecast.end_date": "2000-01-06",
        "model.forecast_steps": 2,
    })
    dm = Era5DataModule(cfg)
    dm.setup("predict")
    b = next(iter(dm.predict_dataloader()))
    assert "index" in b
    assert b["forcings"].shape[1] == 2


def test_unknown_stage(store):
    dm = Era5DataModule(toy_config(store))
    with pytest.raises(ValueError):
        dm.setup("test")
