#!/usr/bin/env python
"""Summarize a jax.profiler device trace (the --profile DIR output)
into a top-op table — the offline stand-in for the TensorBoard/xprof UI
on this headless machine.

Finds the newest `*.trace.json.gz` under the logdir, groups complete
events by TPU op name on device-side tracks, and prints the top-N ops
by total duration plus the covered wall span. Used for the round-4/5
step-anatomy traces (e.g. the NCI1 lockstep take_along_axis finding).

    python tools/summarize_trace.py /tmp/prof_dir [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def newest_trace(logdir: str) -> str:
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    return max(paths, key=os.path.getmtime)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--device_only", action="store_true", default=True)
    args = p.parse_args(argv)

    path = newest_trace(args.logdir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # map pid/tid → track name; device tracks carry "TPU"/"/device:"
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e.get("pid")] = e.get("args", {}).get("name", "")

    per_op = collections.Counter()
    calls = collections.Counter()
    longname = {}
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        per_op[name] += dur
        calls[name] += 1
        # semantic origin when the profiler attached HLO metadata
        a = e.get("args", {}) or {}
        ln = a.get("long_name") or a.get("tf_op") or a.get("name")
        if ln and name not in longname:
            longname[name] = str(ln)
        ts = float(e.get("ts", 0.0))
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)

    total = sum(per_op.values())
    print(f"# {path}")
    print(f"# device tracks: {sorted(set(names.values()))}")
    print(f"# device-op busy total: {total / 1e3:.2f} ms over a "
          f"{(t_max - t_min) / 1e3:.2f} ms span")
    print(f"{'op':40s} {'total_ms':>9s} {'calls':>7s} {'%busy':>6s}  origin")
    for name, dur in per_op.most_common(args.top):
        print(f"{name[:40]:40s} {dur / 1e3:9.2f} {calls[name]:7d} "
              f"{dur / total * 100:6.1f}  {longname.get(name, '')[:70]}")


if __name__ == "__main__":
    main()
