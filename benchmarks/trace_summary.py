"""Aggregate a jax.profiler chrome trace into a per-op time table.

The TPU replacement for nsys/nvprof-style kernel tables (reference
workflow: NVTX ranges + nsight, modeling_arc.py:202-206): run
anything under `arcquant_tpu.utils.timing.profile_trace`, then

  python benchmarks/trace_summary.py /tmp/arcquant_trace [--top 30]

parses plugins/profile/*/\\*.trace.json.gz and prints total device
time, call count, and mean per op name, device rows first — this is
the loop used (previously by hand) to find the scatter re-layout
copies and per-call bitcast glue (CLAUDE.md)."""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(path: str):
    """Yield chrome-trace events from a trace dir or a single
    .trace.json(.gz) file."""
    if os.path.isdir(path):
        pats = [os.path.join(path, "plugins", "profile", "*",
                             "*.trace.json.gz"),
                os.path.join(path, "*.trace.json.gz"),
                os.path.join(path, "*.trace.json")]
        files = [f for p in pats for f in glob.glob(p)]
        if not files:
            raise FileNotFoundError(f"no trace files under {path}")
    else:
        files = [path]
    for f in files:
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            data = json.load(fh)
        # chrome traces come as {"traceEvents": [...]} or as a bare
        # JSON array of events
        yield from (data.get("traceEvents", [])
                    if isinstance(data, dict) else data)


def summarize(events, device_only: bool = True):
    """Aggregate complete ('X') events by name.

    Returns (rows, device_pids) where rows = [(name, total_us,
    count, on_device)] sorted by total descending. Device pids are
    identified from process_name metadata containing TPU/device/XLA
    markers; with none found, every pid counts as device."""
    pid_name = {}
    events = list(events)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = str(
                e.get("args", {}).get("name", ""))
    dev_pids = {p for p, n in pid_name.items()
                if any(k in n.lower()
                       for k in ("tpu", "device", "xla", "/gpu"))}
    agg = collections.defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        # python source-frame spans ($file.py:line fn) nest and
        # double-count; they are host noise, not ops
        if name.startswith("$") or name.startswith("<"):
            continue
        on_dev = (not dev_pids) or e.get("pid") in dev_pids
        if device_only and not on_dev:
            continue
        a = agg[(name, on_dev)]
        a[0] += float(e["dur"])
        a[1] += 1
    rows = [(name, tot, cnt, dev)
            for (name, dev), (tot, cnt) in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows, dev_pids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (profile_trace logdir) "
                    "or .trace.json[.gz] file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--all-pids", action="store_true",
                    help="include host-side events too")
    args = ap.parse_args()
    rows, dev = summarize(load_events(args.trace),
                          device_only=not args.all_pids)
    total = sum(r[1] for r in rows)
    print(f"{len(rows)} op names, {total/1e3:.2f} ms total "
          f"({'device pids ' + str(sorted(dev)) if dev else 'no device pid metadata — counting all pids'})")
    print(f"{'op':60s} {'total_us':>12s} {'count':>8s} {'mean_us':>10s}")
    for name, tot, cnt, _ in rows[:args.top]:
        print(f"{name[:60]:60s} {tot:12.1f} {cnt:8d} {tot/cnt:10.2f}")


if __name__ == "__main__":
    main()
