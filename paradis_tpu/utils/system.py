"""System setup: seeding, precision policy, run-dir hygiene.

Reference ``utils/system.py:12-43``: reproducible seeds, matmul precision
selection tied to the AMP flag, and refusing to clobber an existing
experiment directory.
"""

from __future__ import annotations

import logging
import random
from pathlib import Path

import numpy as np

log = logging.getLogger("paradis_tpu")


def pin_platform(cfg) -> None:
    """Apply ``compute.platform`` to jax_platforms (before any backend use).

    The reference delegates accelerator selection to Lightning's
    ``accelerator="auto"``; here "auto" keeps the environment default and
    "cpu"/"tpu"/<plugin name> force a backend — e.g. CPU-only runs on a
    host whose accelerator is unavailable.  Must run before any backend
    initialization (including jax.distributed.initialize).
    """
    import jax

    platform = str(cfg.compute.get("platform", "auto") or "auto").lower()
    if platform != "auto":
        jax.config.update("jax_platforms", platform)


def setup_system(cfg) -> None:
    seed = cfg.init.get("seed", None)
    if seed is not None:
        random.seed(int(seed))
        np.random.seed(int(seed) % 2**32)
        log.info("seeded host RNGs with %s", seed)

    # precision: bf16 matmuls under AMP, full fp32 otherwise
    import jax

    pin_platform(cfg)

    if not cfg.compute.use_amp:
        jax.config.update("jax_default_matmul_precision", "highest")

    # sanitizer analogue (SURVEY.md §5): trap NaNs at the op level
    if cfg.compute.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)

    # steps/epochs sanity (reference utils/system.py:25-28)
    if int(cfg.training.max_steps) <= 0 and int(cfg.training.max_epochs) <= 0:
        raise ValueError("one of training.max_steps / training.max_epochs must be set")

    name = cfg.training.get("experiment_name")
    if name:
        exp_dir = Path(cfg.training.log_dir) / name
        if exp_dir.exists() and any(exp_dir.iterdir()) and not cfg.init.restart:
            raise FileExistsError(
                f"experiment dir {exp_dir} already exists; pick a new name or "
                f"set init.restart=true"
            )
