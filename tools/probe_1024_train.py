"""Re-probe 1024^2 training at micro-batch >= 2 (remote-compile-service limit).

Round-1 finding (docs/PERF.md "1024^2 training"): any train-step graph with
micro-batch >= 2 crashed the remote compile helper with HTTP 500 in <60 s —
a compile-side resource limit, not device HBM. The graph has changed since
(concat bridge, 4D-operand Pallas sites), so this tool re-probes one variant
per process invocation (a crashed compile can poison the backend state):

    python tools/probe_1024_train.py --variant b2|b4|b4a2|b2remat

Prints one JSON line: {"variant":..., "ok":..., "ms_per_step":...|"error":...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["b2", "b4", "b4a2", "b2remat", "b4a4"])
    ap.add_argument("--image_size", type=int, default=1024)
    args = ap.parse_args()

    batch, accum, remat = {
        "b2": (2, 1, False),       # plain micro-batch 2
        "b4": (4, 1, False),       # plain micro-batch 4
        "b4a2": (4, 2, False),     # scanned micro-batch 2
        "b2remat": (2, 1, True),   # micro-batch 2 + remat
        "b4a4": (4, 4, False),     # micro-batch 1 control (worked in round 1)
    }[args.variant]

    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import TrainConfig
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = TrainConfig()
    cfg.model.name = "eelunet"
    cfg.model.dtype = "bfloat16"
    cfg.data.image_size = (64, 64)   # init-only; params are resolution-free
    cfg.data.batch_size = batch
    cfg.accum_steps = accum
    cfg.remat = remat
    cfg.seed = 0

    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state()
    step = trainer._get_step("train", state)

    s = args.image_size
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, s, s, 3), jnp.float32)
    labels = (jax.random.uniform(key, (batch, s, s, 1)) > 0.5).astype(jnp.float32)

    res = {"variant": args.variant, "image_size": s,
           "batch": batch, "accum_steps": accum, "remat": remat}
    try:
        t0 = time.perf_counter()
        state, loss, _ok = step(state, images, labels)  # compile + step 1
        l0 = float(loss)                            # drain through the tunnel
        res["compile_plus_step_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            state, loss, _ok = step(state, images, labels)
        l1 = float(loss)
        res["ms_per_step"] = round((time.perf_counter() - t0) / n * 1e3, 1)
        res["ok"] = bool(l0 == l0 and l1 == l1)     # finite (not NaN)
        res["loss"] = round(l1, 4)
    except Exception as e:  # compile-service crash surfaces as XlaRuntimeError
        res["ok"] = False
        res["error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
