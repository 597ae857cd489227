"""Profile one training step and print a per-op time attribution table.

Runs the flagship train step under ``jax.profiler``, parses the perfetto
trace directly (no TensorBoard needed — the only consumer available in a
headless environment), joins device events with HLO op metadata from the
XLA dump, and prints per-step time bucketed by source file / op kind.

This is the tool behind the perf tables in BASELINE.md:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py \
        [--batch 4] [--nlat 128 --nlon 256] [--top 30] [--bucket source|op]

Buckets: ``source`` groups by the jaxpr source line recorded in HLO op
metadata (advection/optimizer/... attribution), ``op`` lists individual
fusions sorted by time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_step(batch_size: int, nlat: int, nlon: int, tiny: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from paradis_tpu.train.loss import WeightedLoss
    from paradis_tpu.train.optim import build_optimizer
    from paradis_tpu.train.step import create_train_state, make_train_step

    cfg, model, d = _flagship(tiny=tiny, training=True)
    cfg.training.optimizer.name = "normuon"
    if tiny:
        nlat, nlon = d["nlat"], d["nlon"]
    if (nlat, nlon) != (d["nlat"], d["nlon"]):
        from paradis_tpu.model.paradis import Paradis

        cfg.compute.gradient_checkpointing = True
        lat = np.linspace(90, -90, nlat + 2)[1:-1]
        lon = np.arange(nlon) * (360.0 / nlon)
        model = Paradis.from_config(
            cfg, input_dim=d["input_dim"], output_dim=d["output_dim"],
            lat_deg=lat, lon_deg=lon, dtype=jnp.bfloat16, training=True)
    H, W = nlat, nlon
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(
            size=(batch_size, H, W, d["n_common"] * d["n_time"])), jnp.float32),
        "target": jnp.asarray(rng.normal(
            size=(batch_size, 1, H, W, d["output_dim"])), jnp.float32),
        "forcings": jnp.asarray(rng.normal(
            size=(batch_size, 1, H, W, d["n_forcings"] * d["n_time"])), jnp.float32),
        "constants": jnp.asarray(rng.normal(
            size=(batch_size, H, W, d["n_const"])), jnp.float32),
    }
    loss_fn = WeightedLoss(kind="reversed_huber",
                           feature_weights=np.ones(d["output_dim"], np.float32),
                           lat_weights=None)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, d["input_dim"]), jnp.float32))
    optimizer = build_optimizer(cfg, params)
    train_step, _ = make_train_step(model, loss_fn, cfg, optimizer, donate=True)
    state = create_train_state(params, optimizer)
    return train_step, state, batch, d


def collect_trace(train_step, state, batch, n_common, trace_dir, steps=4):
    import jax

    state, m = train_step(state, batch, n_common)
    float(m["loss"])  # compile + sync
    for _ in range(3):
        state, m = train_step(state, batch, n_common)
    float(m["loss"])
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = train_step(state, batch, n_common)
    float(m["loss"])
    jax.profiler.stop_trace()


def parse_trace(trace_dir: str, steps: int):
    """Aggregate device-lane event durations (ms per step) by op name.

    Returns ``{op_name: [ms_per_step, hlo_category, long_name]}`` — the
    category/long_name args come straight from the profiler events and are
    the only metadata available when the HLO dump is absent (the axon
    remote-compile helper scrubs ``--xla_dump_to`` since Aug 2026).
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "axon" in n.lower()}
    if not dev_pids:  # CPU backend: ops are traced under the host process
        dev_pids = {p for p, n in pid_names.items() if "host" in n.lower()}
    agg = collections.defaultdict(lambda: [0.0, "", ""])
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        # keep op lanes only (drop step/module/framework roll-up lanes)
        if "Steps" in tname or "XLA Modules" in tname or "Framework" in tname:
            continue
        row = agg[e["name"]]
        row[0] += e.get("dur", 0) / 1e3 / steps
        args = e.get("args", {})
        if not row[1]:
            row[1] = args.get("hlo_category", "")
            row[2] = args.get("long_name", "")
    return agg


_PARAM_RE = re.compile(r"%state_params__params____(\w+?)__(?:__|\.|\b)")


def _label_from_event(name: str, category: str, long_name: str) -> str:
    """Attribution label when no HLO dump exists (trace-only metadata).

    Pallas kernels keep their jax function name (``advection.N``); for XLA
    fusions the fused parameter names (``%state_params__params____<module
    path>``) identify the owning module.
    """
    base = name.split(".")[0]
    if category == "custom-call":
        # Pallas custom-calls: tuple output = backward (d_field, d_py, d_px)
        kind = "bwd" if long_name.split("=", 1)[-1].lstrip().startswith("(") \
            else "fwd"
        return f"pallas:{base} ({kind})"
    m = _PARAM_RE.search(long_name)
    if m:
        path = m.group(1).split("____")
        mod = "/".join(path[:2]) if len(path) > 1 else path[0]
        return f"{category or base}: {mod}"
    return f"{category or '?'}: {base}"


def load_hlo_metadata(dump_dir: str):
    """op name → (jaxpr op_name, source file:line) from the HLO text dump.

    Only the largest dumped module is read: that is the train step (init /
    eval jits are far smaller), and generic op names like ``fusion.42``
    recur across modules — merging them would mis-attribute device time.
    """
    meta = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\" source_line=(\d+))?")
    paths = glob.glob(os.path.join(dump_dir, "*after_optimizations.txt"))
    if not paths:
        return meta
    with open(max(paths, key=os.path.getsize)) as f:
        for line in f:
            m = pat.search(line)
            if m:
                name, op, sf, sl = m.groups()
                meta.setdefault(
                    name, (op, f"{(sf or '?').split('/')[-1]}:{sl or '?'}"))
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--nlat", type=int, default=32)
    ap.add_argument("--nlon", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--bucket", choices=["source", "op"], default="source")
    ap.add_argument("--keep", default=None,
                    help="keep trace/dump under this dir (default: temp)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model/grid (CPU smoke test of the tooling)")
    ap.add_argument("--cpu", action="store_true", help="pin jax to CPU")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    work = args.keep or tempfile.mkdtemp(prefix="paradis_profile_")
    dump_dir = os.path.join(work, "hlo")
    trace_dir = os.path.join(work, "trace")
    # append (not setdefault): attribution needs the dump even when the
    # shell already exports XLA_FLAGS
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_dump_to={dump_dir} --xla_dump_hlo_as_text").strip()

    train_step, state, batch, d = build_step(args.batch, args.nlat, args.nlon,
                                             tiny=args.tiny)
    collect_trace(train_step, state, batch, d["n_common"], trace_dir,
                  args.steps)
    agg = parse_trace(trace_dir, args.steps)
    meta = load_hlo_metadata(dump_dir)

    total = sum(row[0] for row in agg.values())
    print(f"device time: {total:.2f} ms/step "
          f"(batch {args.batch}, {args.nlat}x{args.nlon}); trace: {work}")
    if args.bucket == "op":
        rows = sorted(((row[0], n, row[1], row[2]) for n, row in agg.items()),
                      reverse=True)
        for t, n, category, long_name in rows[: args.top]:
            op, src = meta.get(n, ("?", "?"))
            if src == "?":  # dump scrubbed: show trace-derived label instead
                src = _label_from_event(n, category, long_name)
            print(f"  {t:8.3f} ms  {n:40.40s} {src:36.36s} {op[-50:]}")
        return
    buckets = collections.defaultdict(float)
    for n, row in agg.items():
        info = meta.get(n)
        buckets[info[1] if info
                else _label_from_event(n, row[1], row[2])] += row[0]
    rows = sorted(((t, s) for s, t in buckets.items()), reverse=True)
    for t, s in rows[: args.top]:
        print(f"  {t:8.3f} ms  {s}")


if __name__ == "__main__":
    main()
