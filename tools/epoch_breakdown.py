"""Where does training wall-time go? Phase breakdown of one epoch.

The 256^2 EELUnet step computes in ~60 ms but epochs measure 15-27 s wall
(docs/PERF.md) — this tool attributes the gap across: host decode (loader
iteration only), device compute (same resident batch re-fed), the full train
epoch (decode + H2D + compute overlapped), validation, and the full test-set
eval. Motivates (or kills) a native data-loader investment with numbers.

    python tools/epoch_breakdown.py [--image_size 256] [--n_train 160]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=160)
    ap.add_argument("--n_test", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--model", default="eelunet")
    ap.add_argument("--data_dir", default="/tmp/ebreak_data")
    ap.add_argument("--device_cache", action="store_true")
    args = ap.parse_args()

    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.config import TrainConfig
    from eelunet_tpu.data.synthetic import write_synthetic_tree
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    write_synthetic_tree(
        args.data_dir, n_train=args.n_train, n_test=args.n_test,
        image_size=(args.image_size, args.image_size),
    )

    cfg = TrainConfig()
    cfg.model.name = args.model
    cfg.model.dtype = "bfloat16"
    cfg.data.data_dir = args.data_dir
    cfg.data.image_size = (args.image_size, args.image_size)
    cfg.data.batch_size = args.batch_size
    cfg.data.device_cache = args.device_cache
    cfg.seed = 0
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    train_loader, val_loader, test_loader = build_loaders(cfg)
    state = trainer.init_state(steps_per_epoch=max(1, len(train_loader)))

    res = {"image_size": args.image_size, "n_train": args.n_train, "model": args.model}

    # (a) host decode only: iterate the raw loader, no device work
    for loader, tag in ((train_loader, "loader_train"), (test_loader, "loader_test")):
        list(iter(loader))  # warm OS page cache -> epoch-2+ conditions
        t0 = time.perf_counter()
        n = sum(1 for _ in loader)
        res[f"{tag}_s"] = round(time.perf_counter() - t0, 3)
        res[f"{tag}_batches"] = n

    # (b) device compute only: one resident (sharded) batch re-fed N times
    batch = next(iter(trainer._device_batches(train_loader)))
    step = trainer._get_step("train", state)
    # step donates its state argument (cfg.donate_buffers): never reuse a
    # state pytree after passing it in — chain the returned one.
    s, loss, _ok = step(state, *batch)  # compile
    float(loss)
    nsteps = max(1, len(train_loader))
    t0 = time.perf_counter()
    for _ in range(nsteps):
        s, loss, _ok = step(s, *batch)
    float(loss)  # drain through the tunnel
    res["compute_only_s"] = round(time.perf_counter() - t0, 3)
    res["compute_only_ms_per_step"] = round(res["compute_only_s"] / nsteps * 1e3, 1)
    state = s

    # (b2) H2D only: stream every batch through _device_batches and force the
    # transfers with a trivial jitted reduction (dispatch is async under the
    # tunnel; a host readback at the end drains the chain).
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a, b: jnp.float32(a.ravel()[0]) + jnp.float32(b.ravel()[0]))
    float(tiny(*batch))  # compile tiny
    t0 = time.perf_counter()
    accs = [tiny(im, lb) for im, lb in trainer._device_batches(train_loader)]
    float(jnp.sum(jnp.stack(accs)))  # one drain: transfers pipeline as in an epoch
    res["h2d_stream_s"] = round(time.perf_counter() - t0, 3)

    # (c) full phases via the trainer's own epoch methods. Warm-up pass first:
    # val/evaluate compile their own step/metric graphs on first use (the
    # remote compile service takes ~15 s each), which would otherwise be
    # billed to the phase.
    state, _ = trainer.train_one_epoch(state, train_loader)
    trainer.val_one_epoch(state, val_loader)
    trainer.evaluate(state, test_loader)

    t0 = time.perf_counter()
    state, _ = trainer.train_one_epoch(state, train_loader)
    res["train_epoch_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    trainer.val_one_epoch(state, val_loader)
    t1 = time.perf_counter()
    res["val_epoch_s"] = round(t1 - t0, 3)

    t0 = time.perf_counter()
    trainer.evaluate(state, test_loader)
    res["test_eval_s"] = round(time.perf_counter() - t0, 3)

    res["train_overhead_s"] = round(res["train_epoch_s"] - res["compute_only_s"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
