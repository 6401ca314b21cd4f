"""Interleaved A/B: Pallas blocked 3x3 conv vs XLA's conv emitter on TPU.

VERDICT r2 item 7: the 512^2 forward profile names the full-res shallow-
channel stencils (dec1 3x3 128->64 = 7.4 ms/batch-8, <25% MXU) as the MFU
floor, presumed inherent. This measures that presumption: each shape runs
A (lax.conv_general_dilated [+affine+relu]) and B (ops/conv_pallas.py)
interleaved A,B,A,B,... and reports per-shape medians.

Timing: ``iters`` applications inside ONE jitted lax.scan with a single
scalar readback (axon tunnel: block_until_ready does not sync — CLAUDE.md);
input perturbed per step so the loop body cannot be hoisted.

    python tools/conv3x3_ab.py --batch 8 --image 512 --reps 5
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# (cin, cout): the eelunet full-res stencil population at 512^2
# (docs/PERF.md forward profile; enc1 conv2 64->64, dec1 128->64, head-adjacent
# 64->64). 3->64 (enc1 conv1) is excluded: cin=3 can't ride full lanes in the
# slab layout and XLA already pads it.
SHAPES = [(128, 64), (64, 64)]


def _timer(fn, vs_args, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(args, n_arr):
        def body(carry, i):
            out = fn(*args, i)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    n_arr = jnp.arange(iters, dtype=jnp.float32)
    compiled = run_n.lower(vs_args, n_arr).compile()
    float(compiled(vs_args, n_arr))  # warm
    def once():
        t0 = time.perf_counter()
        float(compiled(vs_args, n_arr))
        return (time.perf_counter() - t0) / iters
    return once


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tile_h", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--shapes", default="",
                   help="comma list of cin:cout pairs, e.g. '128:64,64:64' "
                        "(default: the built-in eelunet population)")
    args = p.parse_args(argv)
    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(":"))
                  for s in args.shapes.split(",")]

    import jax
    import jax.numpy as jnp

    from eelunet_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_reference

    # compiled Pallas exists only on TPU; CPU smoke runs fall back to the
    # interpreter (correctness plumbing only — its timings are meaningless)
    interp = jax.devices()[0].platform != "tpu"
    if interp:
        print("non-TPU platform: pallas in INTERPRET mode (timings invalid)",
              file=sys.stderr)

    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    rows = []
    for cin, cout in shapes:
        kx, kw, ks, kb, key = jax.random.split(key, 5)
        x = jax.random.normal(kx, (args.batch, args.image, args.image, cin), jnp.float32).astype(dt)
        w = (jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1).astype(dt)
        s = jax.random.normal(ks, (cout,), jnp.float32)
        b = jax.random.normal(kb, (cout,), jnp.float32)

        # NB: keep the anti-hoist perturbation in x.dtype — `x + i*1e-9`
        # promotes bf16 inputs to f32, which 4x-es the pallas slab and blows
        # the 16M scoped-vmem limit at 512^2 (observed on TPU).
        def xla_fn(x, w, s, b, i):
            return conv3x3_reference(x + (i * 1e-9).astype(x.dtype), w, s, b,
                                     relu=True)

        def pallas_fn(x, w, s, b, i):
            return conv3x3_pallas(x + (i * 1e-9).astype(x.dtype), w, s, b,
                                  relu=True, tile_h=args.tile_h,
                                  interpret=interp)

        # correctness first (single application, readback)
        got = conv3x3_pallas(x, w, s, b, relu=True, tile_h=args.tile_h,
                             interpret=interp)
        want = conv3x3_reference(x, w, s, b, relu=True)
        import numpy as np
        err = float(np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))))
        print(f"[{cin}->{cout}] maxerr {err:.4g}", file=sys.stderr)

        ta = _timer(xla_fn, (x, w, s, b), args.iters)
        tb = _timer(pallas_fn, (x, w, s, b), args.iters)
        a_ms, b_ms = [], []
        for _ in range(args.reps):  # interleaved
            a_ms.append(ta() * 1e3)
            b_ms.append(tb() * 1e3)
        am, bm = statistics.median(a_ms), statistics.median(b_ms)
        rows.append({"cin": cin, "cout": cout, "xla_ms": round(am, 3),
                     "pallas_ms": round(bm, 3),
                     "speedup": round(am / bm, 3), "maxerr": err,
                     "xla_all": [round(v, 3) for v in a_ms],
                     "pallas_all": [round(v, 3) for v in b_ms]})
        print(f"[{cin}->{cout}] xla {am:.3f} ms  pallas {bm:.3f} ms  "
              f"({am / bm:.2f}x)", file=sys.stderr)

    print(json.dumps({"harness": "conv3x3_ab", "batch": args.batch,
                      "image": args.image, "tile_h": args.tile_h,
                      "dtype": args.dtype, "iters": args.iters,
                      "platform": jax.devices()[0].platform,
                      "shapes": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
