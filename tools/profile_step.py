"""Op-level device-time profile of the canonical train step on real hardware.

Round-4 verdict item 1: "Capture a jax.profiler trace of the flagship train
step on the v5e, publish the op-level time table in PERF_NOTES (top 10 ops,
ms each)".  This tool does exactly that:

  1. builds the preset's train step (same construction as bench.py),
  2. warms it up, traces ``--steps`` steps with jax.profiler,
  3. parses the written trace.json.gz device plane (each XLA HLO op launch
     carries device_duration_ps, hlo_category, bytes_accessed and the full
     HLO ``long_name``), and
  4. prints a per-op table: ms/step, % of device time, category, GB/s
     achieved (bytes_accessed / duration), and a trimmed HLO signature.

Usage:
  python tools/profile_step.py --preset flagship --steps 6
  python tools/profile_step.py --preset exact --steps 3
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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_trace_file(logdir):
    files = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    return max(files, key=os.path.getmtime)


def load_device_events(trace_file):
    """All device-plane HLO-op events: [(name, dur_us, args), ...]."""
    data = json.load(gzip.open(trace_file, "rt"))
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    out = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        # The program-level line has run_id but no hlo_category; the op-level
        # line carries hlo_category per HLO instruction.
        if "hlo_category" not in args:
            continue
        dur_us = float(args.get("device_duration_ps", 0)) / 1e6
        out.append((e["name"], dur_us, args))
    return out


def aggregate(events, steps):
    """Group op launches by name -> per-step totals."""
    by_name = collections.defaultdict(
        lambda: {"us": 0.0, "count": 0, "bytes": 0, "category": "",
                 "long_name": ""})
    for name, dur_us, args in events:
        rec = by_name[name]
        rec["us"] += dur_us
        rec["count"] += 1
        rec["bytes"] += int(args.get("bytes_accessed", 0) or 0)
        rec["category"] = args.get("hlo_category", "")
        if not rec["long_name"]:
            rec["long_name"] = args.get("long_name", "")
    rows = []
    for name, rec in by_name.items():
        rows.append({
            "name": name,
            "ms_per_step": rec["us"] / 1e3 / steps,
            "count_per_step": rec["count"] / steps,
            "category": rec["category"],
            "gbps": (rec["bytes"] / 1e9) / (rec["us"] / 1e6)
            if rec["us"] else 0.0,
            "bytes_per_step_mb": rec["bytes"] / 1e6 / steps,
            "long_name": rec["long_name"],
        })
    rows.sort(key=lambda r: -r["ms_per_step"])
    return rows


def trim_sig(long_name, width=110):
    """Strip layout annotations from an HLO signature for display."""
    s = re.sub(r"\{[^{}]*\}", "", long_name)
    s = re.sub(r"\s+", " ", s)
    return s[:width]


def print_table(rows, total_ms, wall_ms, top, show_sig=True):
    print(f"\ndevice time {total_ms:.1f} ms/step | wall {wall_ms:.1f} ms/step"
          f" | device occupancy {100 * total_ms / wall_ms:.0f}%\n")
    print(f"{'ms/step':>8} {'%dev':>5} {'x/step':>7} {'GB/s':>6} "
          f"{'category':<22} name")
    shown = 0.0
    for r in rows[:top]:
        shown += r["ms_per_step"]
        print(f"{r['ms_per_step']:8.2f} {100 * r['ms_per_step'] / total_ms:5.1f}"
              f" {r['count_per_step']:7.1f} {r['gbps']:6.0f} "
              f"{r['category']:<22} {r['name']}")
        if show_sig:
            print(f"{'':8} {trim_sig(r['long_name'])}")
    rest = total_ms - shown
    print(f"{rest:8.2f} {100 * rest / total_ms:5.1f} {'':7} {'':6} "
          f"{'(everything else)':<22}")


def by_category(rows, total_ms):
    cats = collections.defaultdict(float)
    for r in rows:
        cats[r["category"]] += r["ms_per_step"]
    print("\nby hlo_category:")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.2f} ms {100 * ms / total_ms:5.1f}%  {cat}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="flagship",
                   choices=["flagship", "exact"])
    p.add_argument("--batch-size", type=int, default=15000)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--binding", "-b", action="append", default=[])
    p.add_argument("--logdir", default=None)
    p.add_argument("--json-out", default=None,
                   help="also dump the full aggregated rows as JSON")
    p.add_argument("--trace-file", default=None,
                   help="skip measurement; just re-analyze a trace file")
    args = p.parse_args()

    steps = args.steps
    wall_ms = float("nan")
    if args.trace_file is None:
        import jax
        import jax.numpy as jnp

        from ucnerf_tpu import configs
        from ucnerf_tpu.train import state as state_lib
        from ucnerf_tpu.train import step as step_lib

        if args.preset == "flagship":
            cfg = configs.waymo_tpu(batch_size=args.batch_size)
        else:
            cfg = configs.waymo(batch_size=args.batch_size,
                                host_microbatches=True,
                                render_chunk_size=2500)
        cfg = configs.parse_bindings(cfg, args.binding)

        model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
        state = state_lib.create_train_state(cfg, params)
        train_step = step_lib.make_train_step(model, cfg)
        batch = jax.tree.map(jnp.asarray,
                             step_lib.dummy_batch(cfg, cfg.batch_size))
        key = jax.random.PRNGKey(1)
        for i in range(args.warmup):
            state, stats = train_step(state, batch,
                                      jax.random.fold_in(key, i),
                                      jnp.float32(0.5))
        float(stats["loss"])

        logdir = args.logdir or tempfile.mkdtemp(prefix="ucnerf_prof_")
        t0 = time.perf_counter()
        jax.profiler.start_trace(logdir)
        for i in range(steps):
            state, stats = train_step(state, batch,
                                      jax.random.fold_in(key, 100 + i),
                                      jnp.float32(0.5))
        float(stats["loss"])
        jax.profiler.stop_trace()
        wall_ms = (time.perf_counter() - t0) / steps * 1e3
        trace_file = find_trace_file(logdir)
        print(f"trace: {trace_file}")
    else:
        trace_file = args.trace_file

    events = load_device_events(trace_file)
    rows = aggregate(events, steps)
    total_ms = sum(r["ms_per_step"] for r in rows)
    print_table(rows, total_ms, wall_ms, args.top)
    by_category(rows, total_ms)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"steps": steps, "wall_ms_per_step": wall_ms,
                       "device_ms_per_step": total_ms, "rows": rows}, f,
                      indent=1)
        print(f"\nwrote {args.json_out}")


if __name__ == "__main__":
    main()
