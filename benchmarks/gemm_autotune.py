#!/usr/bin/env python
"""Measure fused-vs-DMA decode-GEMM winners per weight shape and
persist the selection table gemm_dequant consults.

Usage:
  python -m benchmarks.gemm_autotune --model qwen2.5-7b --m 32
  python -m benchmarks.gemm_autotune --shapes 4096x4096,3584x4608

The table lands at ARC_AUTOTUNE_FILE (default
/tmp/arc_gemm_autotune.json). Copy a measured table into
arcquant_tpu/kernels/autotune_tables/<device_kind>.json to ship it as
the default for that device kind.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b",
                    help="model config name, or comma-separated list")
    ap.add_argument("--m", type=int, default=32,
                    help="decode batch size to tune at")
    ap.add_argument("--select_num", type=int, default=0,
                    help="ARC outlier count (affects padded kq)")
    ap.add_argument("--shapes", default="",
                    help="extra KQxN pairs, comma-separated")
    ap.add_argument("--fmt", default="w8", choices=["w8", "w4"])
    ap.add_argument("--reps", type=int, default=1,
                    help="timing repetitions per path (median + noise"
                         " recorded; >=5 for shipped tables)")
    ap.add_argument("--head", action="store_true",
                    help="include the W4A16 lm_head shape")
    ap.add_argument("--force", action="store_true",
                    help="re-measure shapes already in the table")
    args = ap.parse_args()

    from arcquant_tpu.kernels import autotune

    shapes = []
    if args.model:
        from arcquant_tpu.config import get_model_config
        for name in args.model.split(","):
            cfg = get_model_config(name)
            shapes += autotune.engine_weight_shapes(
                cfg, args.select_num, include_head=args.head)
    for s in filter(None, args.shapes.split(",")):
        kq, n = s.lower().split("x")
        shapes.append((int(kq), int(n)))

    res = autotune.autotune_shapes(shapes, args.m, fmt=args.fmt,
                                   reps=args.reps, force=args.force)
    table = {k: {"fused_us": round(v["fused"] * 1e6, 2),
                 "dma_us": (round(v["dma"] * 1e6, 2)
                            if v["dma"] != float("inf") else None),
                 "blocks": ([v["bk"], v["bn"]] if "bk" in v else None),
                 "noise": v.get("noise"),
                 "winner": ("dma" if v["dma"] < v["fused"]
                            else "fused")}
             for k, v in res.items()}
    print(json.dumps(table, indent=1, sort_keys=True))
    print(f"table: {autotune._user_table_path()}", file=sys.stderr)


if __name__ == "__main__":
    main()
