"""A/B: 3D-operand (reshape to (B,H,W*C)) vs 4D-operand Pallas high-pass.

Measures (a) the isolated op at EELUnet's two call sites' shapes, and (b) the
full EELUnet 512^2 bf16 forward (the headline bench configuration), with
EELUNET_HP4D toggled via env before process start (the 4D path is the
DEFAULT in fft_pallas.py — the baseline must disable it explicitly):

    EELUNET_HP4D=0 python tools/hp4d_ab.py # 3D baseline
    EELUNET_HP4D=1 python tools/hp4d_ab.py # 4D variant

Interleave the two runs a few times (docs/PERF.md measurement discipline:
run-to-run host noise is ~5x a small effect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

ITERS = 30


def time_scan(fn, *args) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(a0, rest, n_arr):
        def body(carry, i):
            out = fn(a0 + i * 1e-9, *rest)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    n_arr = jnp.arange(ITERS, dtype=jnp.float32)
    float(run_n(args[0], args[1:], n_arr))
    t0 = time.perf_counter()
    float(run_n(args[0], args[1:], n_arr))
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms/iter


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.ops.fft_pallas import high_pass_fft_pallas
    from eelunet_tpu.registry import create_model, seg_probabilities

    # Mirror fft_pallas.py's dispatch: anything but "0" means the 4D path is
    # live where eligible — labeling an unset env as "3d" would mislabel the
    # default run and make the A/B compare the 4D path against itself.
    mode = "3d" if os.environ.get("EELUNET_HP4D") == "0" else "4d"
    rng = np.random.default_rng(0)
    res = {"mode": mode}

    # isolated op at the EELUnet 512^2 call-site shapes (post-upconv, bf16)
    for shape in [(8, 256, 256, 128), (8, 512, 512, 64)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        res[f"op_{shape[1]}x{shape[3]}_ms"] = round(
            time_scan(lambda a: high_pass_fft_pallas(a, 20, False), x), 3
        )

    # full model forward, headline configuration
    model, meta = create_model(ModelConfig(name="eelunet", dtype="bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    xb = jnp.zeros((8, 512, 512, 3), jnp.float32)

    @jax.jit
    def run_n(vs, images, n_arr):
        def body(carry, i):
            out = model.apply(vs, images + i * 1e-9, train=False)
            return carry + jnp.sum(seg_probabilities(out, meta)), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    n_arr = jnp.arange(20, dtype=jnp.float32)
    float(run_n(variables, xb, n_arr))
    t0 = time.perf_counter()
    float(run_n(variables, xb, n_arr))
    dt = time.perf_counter() - t0
    res["eelunet_512_fwd_ms_per_batch8"] = round(dt / 20 * 1e3, 2)
    res["eelunet_512_img_per_sec"] = round(8 * 20 / dt, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
