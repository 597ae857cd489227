"""Checkpointing (orbax) with the reference's three retention policies.

Reference ``utils/callbacks.py:161-197``: keep-all per-epoch checkpoints,
a rolling window of step checkpoints (every 100 steps, keep 10, plus
``last``), and the best-validation checkpoint.  Two load modes
(``trainer.py:222-258``): full resume vs weights-only with cross-resolution
surgery — GlobalBias U/V factors are linearly re-interpolated when the grid
resolution changed (the reference's deliberate transfer feature).
"""

from __future__ import annotations

import json
import math
import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from paradis_tpu.ops.resize import linear_interp_matrix
from paradis_tpu.train.sharded_ckpt import (
    read_sharded_leaves,
    restore_sharded,
    save_sharded,
)


def _is_cross_process_sharded(state) -> bool:
    """True when some leaf's shards live on other processes' devices.

    Replicated multi-host state is NOT cross-process sharded (every process
    can materialize it alone); FSDP state on >1 process is.
    """
    if jax.process_count() == 1:
        return False
    for leaf in jax.tree.leaves(state):
        if (
            isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable
            and not leaf.is_fully_replicated
        ):
            return True
    return False


def _sync(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


class CheckpointManager:
    """Directory layout: <root>/{steps,epochs,best}/<tag>/ orbax trees."""

    def __init__(self, root: str, keep_steps: int = 10, step_every: int = 100):
        self.root = Path(root)
        self.keep_steps = keep_steps
        self.step_every = step_every
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric = math.inf
        (self.root / "steps").mkdir(parents=True, exist_ok=True)
        (self.root / "epochs").mkdir(parents=True, exist_ok=True)
        (self.root / "best").mkdir(parents=True, exist_ok=True)

    # -- save -------------------------------------------------------------------

    def _save(self, path: Path, state, with_params: bool = True) -> None:
        """Each checkpoint dir holds the full train state (for resume) and —
        for epoch/best checkpoints — a separate bare-params tree (weights-only
        / transfer loads; ``load_params`` extracts params from state-only
        checkpoints too).  Step checkpoints skip the duplicate params tree and
        the final disk wait: the device→host transfer happens at save time,
        disk IO overlaps with training and is fenced at the next save.

        Multi-host FSDP state (cross-process sharded leaves) takes the
        per-process shard path: EVERY process must call (the Trainer does),
        each writes only its addressable shards (``sharded_ckpt``), and
        restore reshards to whatever the restoring topology is."""
        if _is_cross_process_sharded(state):
            me = jax.process_index()
            if me == 0:
                if path.exists():
                    shutil.rmtree(path)
                (path / "state_sharded").mkdir(parents=True)
            _sync(f"paradis-ckpt-mkdir:{path}")
            save_sharded(path / "state_sharded", state)
            _sync(f"paradis-ckpt-state:{path}")
            return
        if jax.process_count() > 1:
            # multi-host replicated: process 0 saves alone (Trainer gates the
            # call), so materialize the state to host numpy first — orbax
            # would otherwise try to coordinate the save across processes
            state = jax.tree.map(lambda x: np.asarray(x), state)
        self._ckptr.wait_until_finished()  # fence any in-flight async save
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save((path / "state").resolve(), state)
        if with_params:
            self._ckptr.wait_until_finished()
            self._ckptr.save((path / "params").resolve(), state.params)
            self._ckptr.wait_until_finished()

    def maybe_save_step(self, step: int, state) -> bool:
        if step % self.step_every != 0 or step == 0:
            return False
        self._save(self.root / "steps" / f"{step:08d}", state, with_params=False)
        if jax.process_index() == 0:
            self._write_pointer("last", self.root / "steps" / f"{step:08d}")
            kept = sorted((self.root / "steps").iterdir())
            for old in kept[: max(0, len(kept) - self.keep_steps)]:
                shutil.rmtree(old)
        return True

    def save_epoch(self, epoch: int, state) -> None:
        self._save(self.root / "epochs" / f"{epoch:04d}", state)
        if jax.process_index() == 0:
            self._write_pointer("last", self.root / "epochs" / f"{epoch:04d}")

    def maybe_save_best(self, metric: float, state) -> bool:
        if metric >= self.best_metric:
            return False
        self.best_metric = metric
        self._save(self.root / "best" / "best", state)
        if jax.process_index() == 0:
            (self.root / "best" / "metric.json").write_text(
                json.dumps({"val_loss": float(metric)})
            )
        return True

    def _write_pointer(self, name: str, target: Path) -> None:
        (self.root / f"{name}.json").write_text(
            json.dumps({"path": str(target.resolve())})
        )

    # -- restore ----------------------------------------------------------------

    def latest_path(self) -> Path | None:
        ptr = self.root / "last.json"
        if not ptr.exists():
            return None
        path = Path(json.loads(ptr.read_text())["path"])
        return path if path.exists() else None

    def restore(self, target_state, path: str | Path | None = None):
        """Full restore into the structure of ``target_state``.

        Accepts a checkpoint directory, its ``state`` subtree, or a
        checkpoints ROOT (resolved through its ``last.json`` pointer) — so
        ``init.checkpoint_path=<log_dir>/checkpoints`` resumes from the
        latest checkpoint like the reference's ``ckpt_path`` convention.
        """
        path = Path(path) if path else self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.root}")
        if (path / "last.json").exists():
            path = Path(json.loads((path / "last.json").read_text())["path"])
        if (path / "state_sharded").exists():
            # per-process sharded (multi-host FSDP) checkpoint: reassemble
            # into target_state's layout (reshards if topology changed)
            return restore_sharded(path / "state_sharded", target_state)
        if (path / "state").exists():
            path = path / "state"
        return self._ckptr.restore(path.resolve(), target=target_state)


def save_params(path: str, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
    ckptr.save(p.resolve(), params)
    ckptr.wait_until_finished()


def load_params(path: str, target_params):
    """Weights-only load with resolution-transfer surgery.

    Any loaded ``U``/``V`` GlobalBias factor whose trailing dimension differs
    from the target's is linearly interpolated (align-corners), matching
    reference ``trainer.py:233-257``.
    """
    ckptr = ocp.StandardCheckpointer()
    path = Path(path)
    if (path / "last.json").exists():  # a checkpoints root → follow pointer
        path = Path(json.loads((path / "last.json").read_text())["path"])
    if (path / "state_sharded").exists():  # per-process sharded checkpoint
        loaded = read_sharded_leaves(path / "state_sharded", target_params,
                                     prefix=".params")
    else:
        from_state = False
        if (path / "params").exists():  # accept a checkpoint dir or its params tree
            path = path / "params"
        elif (path / "state").exists():  # state-only (step) checkpoints
            path = path / "state"
            from_state = True
        # restore with relaxed structure: same tree, maybe different leaf shapes
        loaded = ckptr.restore(path.resolve())
        if from_state:
            loaded = loaded["params"]

    t_leaves = jax.tree_util.tree_flatten_with_path(target_params)[0]
    t_map = {jax.tree_util.keystr(k): v for k, v in t_leaves}

    def fix(path_str, value):
        target = t_map.get(path_str)
        if target is None:
            return value
        value = np.asarray(value)
        name = path_str.rsplit("'", 2)[-2] if "'" in path_str else path_str
        if name in ("U", "V") and value.shape != target.shape \
                and value.shape[:-1] == target.shape[:-1]:
            mat = linear_interp_matrix(value.shape[-1], target.shape[-1])
            return np.einsum("on,...n->...o", mat, value).astype(value.dtype)
        return value

    l_leaves = jax.tree_util.tree_flatten_with_path(loaded)[0]
    treedef = jax.tree_util.tree_structure(loaded)
    fixed = [fix(jax.tree_util.keystr(k), v) for k, v in l_leaves]
    result = jax.tree_util.tree_unflatten(treedef, fixed)

    # validate against target structure
    tgt_def = jax.tree_util.tree_structure(target_params)
    if tgt_def != treedef:
        raise ValueError(
            "checkpoint parameter tree does not match the model "
            f"(loaded {treedef} vs target {tgt_def})"
        )
    for (pk, pv), (lk, lv) in zip(t_leaves, jax.tree_util.tree_flatten_with_path(result)[0]):
        if np.shape(pv) != np.shape(lv):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(pk)}: "
                f"{np.shape(lv)} vs expected {np.shape(pv)}"
            )
    return result
