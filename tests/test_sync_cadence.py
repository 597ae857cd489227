"""Pipelined sync cadence: checkpoints/validation still fire when
sync_every_n_steps doesn't divide their cadences."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("sync"))


def test_cadences_survive_large_sync_every(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 6,
        "training.optimizer.name": "adamw",
        "training.sync_every_n_steps": 7,  # deliberately coprime with cadences
        "training.log_every_n_steps": 5,
        "training.validation_dataset.validation_every_n_steps": 3,
        "training.validation_dataset.validation_batches": 1,
    })
    log_dir = tmp_path_factory.mktemp("slogs")
    t = Trainer(cfg, log_dir=str(log_dir))
    t.ckpt.step_every = 4  # step-checkpoint cadence not divisible by sync
    res = t.fit()
    assert res["steps"] == 6

    text = (log_dir / "metrics.csv").read_text()
    val_steps = [int(l.split(",")[0]) for l in text.splitlines() if ",val_loss," in l]
    assert 3 in val_steps and 6 in val_steps
    # step checkpoint at 4 was written despite sync_every=7
    assert (log_dir / "checkpoints" / "steps" / "00000004").exists()
    # train_loss logged at the log cadence
    train_steps = [int(l.split(",")[0]) for l in text.splitlines()
                   if ",train_loss," in l]
    assert 5 in train_steps
