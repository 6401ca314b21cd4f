"""Train-step batch/remat sweep (round-3 judge Weak #5 / task 6).

The round-3 bench trains eelunet 512^2 bf16 only at batch 8 (28.15% MFU vs
38.1% inference); inference gained 3.6% going batch 8->16. This sweep
measures the untried cheap lever: bigger train batches, with remat (and/or
gradient accumulation) where batch 16 at 512^2 would not fit the 16 GB HBM
(batch-8 peak was already 14.56 GB, BENCH_r03).

Rows (eelunet bf16, reuses bench._measure_train's timing protocol — donated
state chaining + single sync readback, exact jaxpr FLOP counting):
    512^2 x 8             baseline (the bench.py train block)
    512^2 x 16 + remat    remat trades recompute FLOPs for activation HBM
    512^2 x 16 + accum 2  two 8-row micro-batches, full-batch gradient
    256^2 x 8 / 16 / 32   the non-HBM-bound scaling curve

    python tools/train_sweep.py [--iters 8]

One JSON line per row to stdout, markdown summary to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    # (label, image, batch, extra overrides)
    ("512b8", 512, 8, ()),
    ("512b16_remat", 512, 16, ("remat=true",)),
    ("512b16_accum2", 512, 16, ("accum_steps=2",)),
    ("256b8", 256, 8, ()),
    ("256b16", 256, 16, ()),
    ("256b32", 256, 32, ()),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--model", default="eelunet")
    p.add_argument("--rows", nargs="+", default=[r[0] for r in ROWS])
    args = p.parse_args(argv)

    from eelunet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("auto")
    import bench

    out = []
    for label, image, batch, extra in ROWS:
        if label not in args.rows:
            continue
        try:
            m = bench._measure_train(args.model, image, batch,
                                     iters=args.iters, extra_set=extra)
        except Exception as e:  # e.g. OOM at an infeasible point — record it
            m = {"error": f"{type(e).__name__}: {e}"}
        row = {"label": label, "image": image, "batch": batch,
               "extra": list(extra), **m}
        out.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | img/s | ms/step | MFU % | peak HBM GB |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in out:
        if "error" in r:
            print(f"| {r['label']} | — | — | — | {r['error']} |", file=sys.stderr)
            continue
        hbm = r.get("peak_hbm_estimate_bytes")
        print(f"| {r['label']} | {r.get('images_per_sec')} "
              f"| {r.get('ms_per_step')} | {r.get('mfu_pct')} "
              f"| {hbm / 2**30:.2f} |" if hbm else "| ? |", file=sys.stderr)


if __name__ == "__main__":
    main()
