"""Shared test fixtures: a toy preprocessed store + matching config."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from paradis_tpu.config import default_config
from paradis_tpu.data.preprocess import preprocess
from paradis_tpu.data.synthetic import build_raw_store

TOY_NLAT, TOY_NLON = 8, 16
TOY_LEVELS = (500, 850, 1000)
TOY_TIMES = 30  # 2000-01-01 .. 2000-01-08T06, 6-hourly


def build_toy_store(base: Path) -> Path:
    """Raw + preprocessed synthetic stores under ``base``; returns the
    preprocessed root."""
    raw = base / "raw"
    out = base / "store"
    if not (out / "stats").exists():
        build_raw_store(str(raw), nlat=TOY_NLAT, nlon=TOY_NLON, n_times=TOY_TIMES,
                        levels=TOY_LEVELS, start="2000-01-01T00:00:00", seed=7)
        preprocess(str(raw), str(out), toa_time_stride=6)
    return out


def toy_config(root_dir: Path, **overrides):
    """Config matching the toy store dims (3 levels, small model)."""
    cfg = default_config()
    cfg.dataset.root_dir = str(root_dir)
    cfg.features.pressure_levels = list(TOY_LEVELS)
    cfg.model.latent_size = 16
    cfg.model.velocity_vectors = 4
    cfg.model.num_layers = 2
    cfg.model.bias_channels = 2
    cfg.model.bias_rank = 4
    cfg.model.physblock.velocity_net.hidden_dim = 8
    cfg.model.physblock.reaction.hidden_dim = 8
    cfg.model.physblock.output_proj.hidden_dim = 8
    cfg.training.dataset.start_date = "2000-01-01"
    cfg.training.dataset.end_date = "2000-01-05"
    cfg.training.validation_dataset.start_date = "2000-01-06"
    cfg.training.validation_dataset.end_date = "2000-01-07"
    cfg.training.max_steps = 4
    cfg.training.log_every_n_steps = 1
    cfg.training.scheduler.wsd.warmup = 1
    cfg.training.scheduler.wsd.decay = 1
    cfg.compute.use_amp = False
    for k, v in overrides.items():
        cfg.set_path(k, v)
    return cfg.resolved()
