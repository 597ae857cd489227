"""Training CLI: ``python -m paradis_tpu.cli.train [--config X] key.path=value ...``

Hydra-style dotted overrides over the built-in defaults (reference
``train.py:17-77``).  Example:

    python -m paradis_tpu.cli.train dataset.root_dir=/data/era5 \
        training.max_steps=1000 compute.batch_size=2
"""

from __future__ import annotations

import argparse
import logging

from paradis_tpu.config import load_config
from paradis_tpu.utils.system import setup_system


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the PARADIS TPU model.")
    parser.add_argument("--config", default=None, help="optional YAML config")
    parser.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, overrides=args.overrides)

    # platform pin first — jax.distributed.initialize touches the backend
    from paradis_tpu.utils.system import pin_platform

    pin_platform(cfg)

    # multi-host bring-up before any jax use (reference multi-node DDP,
    # train.py:44-49): config keys or the standard env variables
    import os

    coord = (cfg.compute.get("coordinator_address", None)
             or os.environ.get("PARADIS_COORDINATOR"))
    if coord:
        from paradis_tpu.distributed import initialize_distributed

        initialize_distributed(
            coordinator=coord,
            num_processes=int(cfg.compute.get("num_nodes", 1) or 1),
            process_id=int(os.environ.get("PARADIS_PROCESS_ID", "0")),
        )
    setup_system(cfg)

    from paradis_tpu.train.loop import Trainer  # after setup (platform/seeds)

    log_dir = cfg.training.log_dir
    if cfg.training.get("experiment_name"):
        log_dir = f"{log_dir}/{cfg.training.experiment_name}"
    trainer = Trainer(cfg, log_dir=log_dir)
    result = trainer.fit()
    print(f"training done: {result}")
    return result


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
