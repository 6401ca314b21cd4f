"""Measure EELUnet physical-prune speedup vs channel rounding (round_to).

Round-1 finding (docs/PERF.md): at round_to=32 the 64-wide full-resolution
stages (enc1/dec1/edge1) never shrink, so slim-50 only reached 1.06x at
512^2 — the prune story was memory-only. This sweep measures round_to
{32,16,8} x amount {0.5,0.6} forward throughput to establish whether finer
rounding buys real speed or TPU lane alignment eats the gain.

    python tools/prune_round_sweep.py            # TPU, prints one JSON line
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

IMAGE = 512
BATCH = 8
ITERS = 20


def measure(model, variables, note: str) -> float:
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.float32)

    @jax.jit
    def run_n(vs, images, n_arr):
        def body(carry, i):
            out = model.apply(vs, images + i * 1e-9, train=False)
            return carry + jnp.sum(out.seg), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    n_arr = jnp.arange(ITERS, dtype=jnp.float32)
    float(run_n(variables, x, n_arr))  # compile + warm
    t0 = time.perf_counter()
    float(run_n(variables, x, n_arr))
    ips = BATCH * ITERS / (time.perf_counter() - t0)
    print(f"{note}: {ips:.1f} img/s", file=sys.stderr, flush=True)
    return ips


def main():
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.models.eelunet import EELUnet
    from eelunet_tpu.prune_physical import param_count, physical_prune_eelunet, slim_eelunet

    full = EELUnet(dtype=jnp.bfloat16)
    variables = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    results = {"full": {"img_per_sec": measure(full, variables, "full"),
                        "params": param_count(variables["params"])}}

    for amount in (0.5, 0.6, 0.7):
        for round_to in (32, 16, 8):
            sp, sb, widths = physical_prune_eelunet(
                variables["params"], variables["batch_stats"], amount, round_to
            )
            model = slim_eelunet(widths, dtype=jnp.bfloat16)
            vs = {
                "params": jax.tree_util.tree_map(jnp.asarray, sp),
                "batch_stats": jax.tree_util.tree_map(jnp.asarray, sb),
            }
            key = f"slim_a{int(amount * 100)}_r{round_to}"
            ips = measure(model, vs, key)
            results[key] = {
                "img_per_sec": ips,
                "params": param_count(sp),
                "speedup_vs_full": round(ips / results["full"]["img_per_sec"], 3),
                "widths": dict(widths),
            }
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
