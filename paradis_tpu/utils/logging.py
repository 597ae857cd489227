"""Training observability: CSV (+ optional TensorBoard) metrics, run snapshots.

Covers the reference's logging surface (``train.py:37-41``, ``utils/system.py:
46-121``, deep diagnostics ``trainer.py:844-923``): scalar metrics per step,
saved config + git snapshot of the code state, and per-module gradient/param
statistics computed from the jitted step's outputs.
"""

from __future__ import annotations

import csv
import json
import subprocess
from pathlib import Path
from typing import Optional

import jax
import numpy as np


class MetricsLogger:
    """Append-only CSV metrics with an optional TensorBoard mirror."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.dir / "metrics.csv"
        self._file = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._file)
        if self._csv_path.stat().st_size == 0:
            self._writer.writerow(["step", "name", "value"])
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        for name, value in metrics.items():
            v = float(value)
            self._writer.writerow([step, name, v])
            if self._tb is not None:
                self._tb.add_scalar(name, v, step)
        self._file.flush()

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


def grad_statistics(grads, params, momentum=None) -> dict:
    """Per-top-level-module grad/param norms, ratios and grad-momentum cosine
    (reference trainer.py:844-923).  Host-side over fetched trees."""
    buckets: dict[str, dict[str, float]] = {}

    def key_of(path) -> str:
        return getattr(path[0], "key", str(path[0]))

    for (path, g), (_, p) in zip(
        jax.tree_util.tree_flatten_with_path(grads)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        k = key_of(path)
        b = buckets.setdefault(k, {"g2": 0.0, "p2": 0.0, "m2": 0.0, "gm": 0.0})
        g = np.asarray(g, np.float64)
        b["g2"] += float((g * g).sum())
        b["p2"] += float((np.asarray(p, np.float64) ** 2).sum())
    if momentum is not None:
        for (path, m), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(momentum)[0],
            jax.tree_util.tree_flatten_with_path(grads)[0],
        ):
            k = key_of(path)
            if k in buckets:
                m = np.asarray(m, np.float64)
                g = np.asarray(g, np.float64)
                buckets[k]["m2"] += float((m * m).sum())
                buckets[k]["gm"] += float((m * g).sum())

    out = {}
    eps = 1e-12
    tot_g2 = sum(b["g2"] for b in buckets.values())
    out["grad/total"] = float(np.sqrt(tot_g2))
    for k, b in sorted(buckets.items()):
        gn, pn = np.sqrt(b["g2"]), max(np.sqrt(b["p2"]), eps)
        out[f"grad/{k}"] = float(gn)
        out[f"pnorm/{k}"] = float(pn)
        out[f"gradratio/{k}"] = float(gn / pn)
        if b["m2"] > 0:
            out[f"grad_alignment/{k}"] = float(b["gm"] / (gn * np.sqrt(b["m2"]) + eps))
    return out


def save_run_snapshot(log_dir: str, cfg, repo_root: Optional[str] = None) -> None:
    """Persist the resolved config and the git state of the code
    (reference utils/system.py:46-121)."""
    d = Path(log_dir)
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.yaml").write_text(cfg.to_yaml())
    info = {}
    try:
        root = repo_root or str(Path(__file__).resolve().parents[2])
        rev = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                             capture_output=True, text=True, timeout=10)
        info["commit"] = rev.stdout.strip()
        diff = subprocess.run(["git", "-C", root, "diff", "HEAD"],
                              capture_output=True, text=True, timeout=10)
        if diff.stdout:
            (d / "uncommitted.diff").write_text(diff.stdout)
            info["dirty"] = True
    except Exception as e:  # git may be absent in deployment images
        info["error"] = str(e)
    (d / "git_info.json").write_text(json.dumps(info, indent=1))
