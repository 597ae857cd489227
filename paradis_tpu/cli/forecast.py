"""Forecast CLI (reference ``forecast.py:13-118``).

    python -m paradis_tpu.cli.forecast --config cfg.yaml \
        --checkpoint-path ckpt_dir --output-file out.zarr \
        --forecast-steps 40 --sampling-interval 36h --start-date 2020-01-01
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from paradis_tpu.config import load_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run forecasts with a trained model.")
    p.add_argument("--config", default=None, help="Path to config YAML")
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--output-file", required=True, help="Output zarr path")
    p.add_argument("--root-dir", default=None)
    p.add_argument("--forecast-steps", type=int, default=40)
    p.add_argument("--sampling-interval", type=str, default="36h")
    p.add_argument("--start-date", type=str, default=None)
    p.add_argument("--end-date", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-devices", type=int, default=1,
                   help="data-parallel devices for the forecast rollout")
    p.add_argument("--write-every-n", type=int, default=10)
    p.add_argument("overrides", nargs="*", help="key.path=value overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, overrides=args.overrides)
    cfg.forecast.enable = True
    cfg.init.checkpoint_path = args.checkpoint_path
    cfg.forecast.output_file = args.output_file
    if args.root_dir:
        cfg.dataset.root_dir = args.root_dir
    cfg.model.forecast_steps = args.forecast_steps
    cfg.dataset.sampling_interval = args.sampling_interval
    if args.start_date:
        cfg.forecast.start_date = args.start_date
    if args.end_date:
        cfg.forecast.end_date = args.end_date
    cfg.forecast.write_every_n = args.write_every_n
    cfg.compute.batch_size = args.batch_size
    cfg.compute.use_amp = False  # forecast in fp32 (reference forecast.py:85)

    # honor compute.platform before any backend use
    from paradis_tpu.utils.system import pin_platform

    pin_platform(cfg)

    from paradis_tpu.data.dataset import ERA5Dataset
    from paradis_tpu.data.pipeline import BatchLoader
    from paradis_tpu.forecast.rollout import run_forecast
    from paradis_tpu.forecast.writer import ZarrForecastWriter
    from paradis_tpu.model.paradis import Paradis
    from paradis_tpu.train.checkpoint import load_params

    dataset = ERA5Dataset(
        cfg.dataset.root_dir,
        cfg.forecast.start_date,
        cfg.forecast.end_date,
        forecast_steps=int(cfg.model.forecast_steps),
        cfg=cfg,
        time_interval=cfg.dataset.sampling_interval,
        prediction_stage=True,
    )
    model = Paradis.from_config(
        cfg, input_dim=dataset.num_in_features, output_dim=dataset.num_out_features,
        lat_deg=dataset.lat, lon_deg=dataset.lon, dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, dataset.lat_size, dataset.lon_size, dataset.num_in_features)),
    )
    params = load_params(args.checkpoint_path, params)

    mesh = None
    if args.num_devices > 1:
        from paradis_tpu.distributed import create_mesh

        mesh = create_mesh(data=args.num_devices, space=1,
                           devices=jax.devices()[: args.num_devices])
    writer = ZarrForecastWriter(cfg, dataset)
    loader = BatchLoader(dataset, args.batch_size * max(1, args.num_devices),
                         shuffle=False, drop_last=False,
                         device_put=(mesh is None))
    run_forecast(model, params, dataset, cfg, writer, loader, mesh=mesh)
    print(f"forecast written: {args.output_file}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
