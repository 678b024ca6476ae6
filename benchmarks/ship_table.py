#!/usr/bin/env python
"""Promote a measured autotune table to the shipped per-device-kind
default (kernels/autotune_tables/<kind>.json).

Prints every entry with its winner, margin, and noise, flags entries
whose margin is inside the noise gate (lookup() will defer to the
heuristic for those), and merges into the existing shipped table
(new entries win).

  python -m benchmarks.ship_table [--src /tmp/arc_r5_tune.json]
                                  [--dry]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/arc_r5_tune.json")
    ap.add_argument("--dst", default="")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    from arcquant_tpu.kernels import autotune

    with open(args.src) as f:
        src = json.load(f)
    dst_path = args.dst or autotune._shipped_table_path()
    try:
        with open(dst_path) as f:
            dst = json.load(f)
    except Exception:
        dst = {}

    margin_env = float(os.environ.get("ARC_AUTOTUNE_MARGIN", "0.08"))
    for k in sorted(src):
        e = src[k]
        fu, dm = e.get("fused", float("inf")), e.get("dma", float("inf"))
        noise = float(e.get("noise", 0.0))
        gate = max(margin_env, noise)
        if dm == float("inf"):
            verdict = "fused (no dma path)"
        elif abs(dm - fu) <= gate * min(dm, fu):
            verdict = f"INSIDE NOISE (gate {gate:.1%}) -> heuristic"
        else:
            verdict = "dma" if dm < fu else "fused"
        blk = (f" blocks=({e['bk']},{e['bn']})" if "bk" in e else "")
        dms = f"{dm*1e6:8.2f}" if dm != float("inf") else "     inf"
        print(f"{k:26s} fused {fu*1e6:8.2f} us  dma {dms} us  "
              f"noise {noise:5.1%}  -> {verdict}{blk}")
        dst[k] = e

    if args.dry:
        print(f"(dry run — not writing {dst_path})")
        return
    with open(dst_path, "w") as f:
        json.dump(dst, f, indent=1, sort_keys=True)
    print(f"wrote {len(dst)} entries -> {dst_path}")


if __name__ == "__main__":
    main()
