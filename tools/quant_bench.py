"""int8 vs dense inference A/B on the attached device (TPU intended).

Measures Predictor-level throughput for the dense (bf16) forward vs the
int8 W8A8 rewrite (eelunet_tpu/quantize.py), plus the probability delta on
identical inputs. Timing forces host readback per step (the axon tunnel's
block_until_ready does not synchronize — CLAUDE.md).

    python tools/quant_bench.py --model eelunet --image_size 512 --batch 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="eelunet")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    import numpy as np

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.inference import Predictor
    from eelunet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (args.batch, args.image_size, args.image_size, 3),
                      dtype=np.uint8)

    def bench(quantize):
        pred = Predictor(ModelConfig(name=args.model, dtype=args.dtype),
                         bucket_batches=False, quantize=quantize)
        pred.predict_proba(u8)  # compile + settle
        probs = pred.predict_proba(u8)  # drained: predict_proba returns numpy
        t0 = time.perf_counter()
        for _ in range(args.steps):
            pred.predict_proba(u8)  # np.asarray forces full readback per call
        dt = (time.perf_counter() - t0) / args.steps
        return dt, probs

    dt_dense, p_dense = bench(None)
    dt_int8, p_int8 = bench("int8")
    delta = float(np.abs(p_dense.astype(np.float32) - p_int8.astype(np.float32)).max())
    out = {
        "model": args.model,
        "image_size": args.image_size,
        "batch": args.batch,
        "dense_ms": round(dt_dense * 1e3, 2),
        "int8_ms": round(dt_int8 * 1e3, 2),
        "speedup": round(dt_dense / dt_int8, 3),
        "dense_img_s": round(args.batch / dt_dense, 1),
        "int8_img_s": round(args.batch / dt_int8, 1),
        "max_prob_delta": round(delta, 5),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
