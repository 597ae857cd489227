"""Trainer over a device mesh: dp x sp training end-to-end on the toy store."""

import numpy as np
import pytest

from fixtures import build_toy_store, toy_config

pytestmark = pytest.mark.slow  # integration-scale; fast lane = -m 'not slow'


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return build_toy_store(tmp_path_factory.mktemp("tmesh"))


def test_trainer_on_mesh(store, tmp_path_factory):
    from paradis_tpu.train.loop import Trainer

    cfg = toy_config(store, **{
        "training.max_steps": 3,
        "training.optimizer.name": "normuon",
        "compute.num_devices": 4,
        "compute.spatial_devices": 2,
        "compute.batch_size": 1,
    })
    t = Trainer(cfg, log_dir=str(tmp_path_factory.mktemp("mlogs")))
    assert t.mesh is not None
    assert dict(t.mesh.shape) == {"data": 4, "lat": 1, "space": 2}
    # global batch = per-shard batch x data axis
    assert t.train_loader.batch_size == 4
    res = t.fit()
    assert res["steps"] == 3
    assert np.isfinite(res["val_loss"])
