"""Training-loop control paths: early stopping, step-cadence validation,
NaN watchdog."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("ctl"))


def test_early_stop_logic(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 2,
        "training.optimizer.name": "adamw",
        "training.early_stopping.enabled": True,
        "training.early_stopping.patience": 2,
    })
    t = Trainer(cfg, log_dir=str(tmp_path_factory.mktemp("es")))
    # improving → no stop, best updates
    assert t._early_stop_check(1.0) is False
    assert t._early_stop_check(0.9) is False
    # stagnating within patience
    assert t._early_stop_check(0.95) is False
    assert t._early_stop_check(0.95) is True  # patience exhausted
    # divergence threshold 1.5 stops immediately
    t2 = Trainer(toy_config(store, **{
        "training.max_steps": 2,
        "training.optimizer.name": "adamw",
        "training.early_stopping.enabled": True,
    }), log_dir=str(tmp_path_factory.mktemp("es2")))
    assert t2._early_stop_check(2.0) is True
    # NaN val loss is ignored (no decision)
    assert t2._early_stop_check(float("nan")) is False


@pytest.mark.slow
def test_validation_every_n_steps(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 4,
        "training.optimizer.name": "adamw",
        "training.validation_dataset.validation_every_n_steps": 2,
        "training.validation_dataset.validation_batches": 1,
    })
    log_dir = tmp_path_factory.mktemp("vlogs")
    t = Trainer(cfg, log_dir=str(log_dir))
    t.fit()
    text = (log_dir / "metrics.csv").read_text()
    val_steps = [int(l.split(",")[0]) for l in text.splitlines() if ",val_loss," in l]
    assert 2 in val_steps and 4 in val_steps


@pytest.mark.slow
def test_nan_watchdog_raises(store, tmp_path_factory):
    from paradis_tpu.train.loop import NaNLossError, Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 2,
        "training.optimizer.name": "adamw",
        "training.optimizer.lr": 1e10,  # divergence on purpose
        "training.gradient_clip_val": None,
    })
    t = Trainer(cfg, log_dir=str(tmp_path_factory.mktemp("nan")))
    with pytest.raises(NaNLossError):
        t.fit()
