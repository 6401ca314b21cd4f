"""A/B the two untried single-chip inference levers (VERDICT r4 #5).

Levers, at the headline operating point (eelunet 512^2 b16 bf16):

- ``bf16res``: bf16-RESIDENT param copies. The product path keeps f32 master
  params as jit arguments; the bf16-compute model re-casts every weight each
  forward, so weight HBM reads are 2x the bf16 bytes. Pre-casting once
  halves them (105 MB -> 52 MB per pass upper bound).
- ``bnfold``: BatchNorm folded into adjacent convs at load. batch_stats ride
  as jit ARGUMENTS (harness contract), so XLA cannot constant-fold the eval
  affine. This variant measures the exact COST CEILING of the fold by
  replacing eval-mode BN with identity (tool-local monkeypatch): a properly
  folded model is the same conv graph with adjusted weights and no BN op,
  so its runtime equals this variant's (it even over-credits slightly — the
  bottleneck's pre-conv BN, EELUnet.py:255-261, is not legally foldable
  because its affine would leak into SAME-padding zeros). If the ceiling is
  <2% the fold is a measured dead end and no param-rewrite machinery is
  warranted; numerics are irrelevant to the timing question.

Timing methodology == bench.py `_measure`: ITERS forwards inside one jitted
lax.scan, one scalar readback (the axon tunnel does not sync on
block_until_ready), input perturbed per step so the loop body cannot hoist.
Each variant is measured twice in the same process (same-run repeatability,
docs/PERF.md convention).

    python tools/infer_levers_ab.py [--image 512 --batch 16 --iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def measure(variant: str, image: int, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.registry import create_model, seg_probabilities
    import eelunet_tpu.nn.layers as L

    model, meta = create_model(ModelConfig(name="eelunet", dtype="bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    if variant in ("bf16res", "both"):
        variables = dict(variables)
        variables["params"] = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            variables["params"],
        )

    orig_call = L.BatchNorm.__call__
    if variant in ("bnfold", "both"):
        # identity eval-BN == cost profile of a weight-folded model
        L.BatchNorm.__call__ = lambda self, x, train=False: x

    try:
        x = jnp.zeros((batch, image, image, 3), jnp.float32)

        @jax.jit
        def run_n(vs, images, n_arr):
            def body(carry, i):
                out = model.apply(vs, images + i * 1e-9, train=False)
                return carry + jnp.sum(seg_probabilities(out, meta)), None
            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
            return s

        n_arr = jnp.arange(iters, dtype=jnp.float32)
        compiled = run_n.lower(variables, x, n_arr).compile()
        arg_bytes = None
        try:
            arg_bytes = int(compiled.memory_analysis().argument_size_in_bytes)
        except Exception:
            pass
        float(compiled(variables, x, n_arr))  # warm
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(compiled(variables, x, n_arr))
            runs.append(time.perf_counter() - t0)
        return {
            "variant": variant,
            "ms_per_batch": [round(r / iters * 1e3, 2) for r in runs],
            "img_per_s": [round(batch * iters / r, 2) for r in runs],
            "argument_bytes": arg_bytes,
        }
    finally:
        L.BatchNorm.__call__ = orig_call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variants", nargs="+",
                   default=["base", "bf16res", "bnfold", "both"])
    args = p.parse_args()

    rows = [measure(v, args.image, args.batch, args.iters) for v in args.variants]
    base = min(rows[0]["img_per_s"]) if rows and rows[0]["variant"] == "base" else None
    print("\n| variant | ms/batch (x2) | img/s (x2) | vs base | arg MB |")
    print("|---|---|---|---|---|")
    for r in rows:
        rel = (f"{(max(r['img_per_s']) / base - 1) * 100:+.1f}%"
               if base and r["variant"] != "base" else "-")
        mb = f"{r['argument_bytes'] / 1e6:.0f}" if r["argument_bytes"] else "?"
        print(f"| {r['variant']} | {r['ms_per_batch']} | {r['img_per_s']} | {rel} | {mb} |")
    print(json.dumps({"harness": "infer_levers_ab", "image": args.image,
                      "batch": args.batch, "iters": args.iters, "rows": rows}))


if __name__ == "__main__":
    main()
