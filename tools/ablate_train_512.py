"""Training-step ablation at 512^2 (ROADMAP #1).

Breaks the EELUnet train step (fwd+bwd+Adam+BN, bf16, batch 8) into
attributable components by swapping one piece at a time and re-measuring the
whole step. Components are swapped by monkeypatching the model's module-level
seams (high_pass_fft / shifted_channel), overriding the loss, rebuilding the
optimizer, or cloning the high-pass impl — param shapes stay identical across
all variants so each one is a clean recompile of the same state. (The
historical concat_skip variant is gone: the model is concat-native now,
docs/PERF.md bridge measurement.)

Timing protocol (see docs/PERF.md "measurement hazards"): steps chain through
the donated TrainState and a device-scalar loss accumulator; ONE final host
readback syncs the run (block_until_ready does not sync through the axon
tunnel, and per-step readbacks pay ~50ms relay RTT each).

Usage:  python tools/ablate_train_512.py [--image 512] [--batch 8]
        [--iters 8] [--variants full,no_highpass,...]
Writes one JSON line per variant to stdout and a summary table to stderr.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_state(model_name: str, image: int, batch: int, dtype: str, lr: float = 1e-4):
    import jax.numpy as jnp

    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(
        TrainConfig(),
        [
            f"model.name={model_name}",
            f"model.dtype={dtype}",
            f"data.image_size=[{image},{image}]",
            f"data.batch_size={batch}",
            f"optimizer.lr={lr}",
            "seed=0",
        ],
    )
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state(steps_per_epoch=100)
    return trainer, state


@contextlib.contextmanager
def _patched(target_module, name, replacement):
    orig = getattr(target_module, name)
    setattr(target_module, name, replacement)
    try:
        yield
    finally:
        setattr(target_module, name, orig)


def _identity_highpass(x, mask_range=20, impl="auto"):
    return x


def _identity_shift(x, shift_ratio=0.25):
    return x


def _main_only_loss(meta):
    """BceDice on the main output only — removes the 5-scale deep-supervision
    pyramid (Loss.py:102-113 equivalent) from fwd AND bwd."""
    from eelunet_tpu import losses as L
    from eelunet_tpu.registry import seg_probabilities

    def fn(output, labels):
        probs = seg_probabilities(output, meta)
        return L.bce_dice_loss(probs, labels)

    return fn


def measure_step(step, state, images, labels, iters: int) -> float:
    """ms per training step; one readback syncs the chained donated steps."""
    state, loss, _ok = step(state, images, labels)
    float(loss)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ok = step(state, images, labels)
    float(loss)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def run_variant(name: str, image: int, batch: int, iters: int, dtype: str) -> float:
    import jax
    import jax.numpy as jnp

    import eelunet_tpu.models.eelunet as E
    from eelunet_tpu.train import trainer as T

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, image, image, 3)), jnp.float32)
    labels = jnp.asarray((rng.uniform(size=(batch, image, image, 1)) > 0.5), jnp.float32)

    patches: list = []
    loss_fn = None
    train_flag = True
    grad = True
    optimizer = None  # None = trainer's Adam

    if name == "full":
        pass
    elif name == "fwd_eval":
        grad = False
        train_flag = False
    elif name == "fwd_train_loss":
        grad = False
    elif name == "sgd":
        import optax

        optimizer = optax.sgd(1e-12)
    elif name == "loss_main_only":
        loss_fn = "main_only"
    elif name == "no_highpass":
        patches.append((E, "high_pass_fft", _identity_highpass))
    elif name == "no_shift":
        patches.append((E, "shifted_channel", _identity_shift))
    elif name == "bn_frozen":
        train_flag = "frozen"  # train-mode grads but BN in inference mode
    elif name in ("pallas_highpass", "sharded_highpass"):
        pass  # handled below: clone highpass_impl accordingly
    elif name == "remat":
        pass  # remat=True wired into make_train_step below
    else:
        raise SystemExit(f"unknown variant {name}")

    with contextlib.ExitStack() as stack:
        for mod, attr, repl in patches:
            stack.enter_context(_patched(mod, attr, repl))

        trainer, state = _build_state("eelunet", image, batch, dtype)
        # full = lowrank (XLA); pallas_highpass = kernel fwd+bwd pair;
        # sharded_highpass = the custom_partitioning-wrapped kernels (checks
        # the SPMD wrapper costs nothing on one chip).
        impl = {"pallas_highpass": "pallas", "sharded_highpass": "pallas_sharded"}.get(
            name, "lowrank"
        )
        model = trainer.model.clone(highpass_impl=impl)
        the_loss = _main_only_loss(trainer.meta) if loss_fn == "main_only" else trainer.loss_fn

        if not grad:
            # forward (+loss, + BN stats when train) only, chained via stats+accum
            def fwd_step(state, images, labels):
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                if train_flag is True:
                    out, mut = model.apply(variables, images, train=True, mutable=["batch_stats"])
                    new_state = state.replace(batch_stats=mut["batch_stats"])
                else:
                    out = model.apply(variables, images, train=False)
                    new_state = state
                return new_state, the_loss(out, labels)

            step = jax.jit(fwd_step, donate_argnums=(0,))
        elif train_flag == "frozen":
            def frozen_step(state, images, labels):
                def compute_loss(params):
                    out = model.apply(
                        {"params": params, "batch_stats": state.batch_stats}, images, train=False
                    )
                    return the_loss(out, labels)

                loss, grads = jax.value_and_grad(compute_loss)(state.params)
                new_state = state.apply_gradients(grads, state.batch_stats)
                return new_state, loss

            step = jax.jit(frozen_step, donate_argnums=(0,))
        elif optimizer is not None:
            sgd_state = optimizer.init(state.params)
            jstep = jax.jit(
                lambda params, bstats, opt, images, labels: _sgd_body(
                    model, the_loss, optimizer, params, bstats, opt, images, labels
                ),
                donate_argnums=(0, 1, 2),
            )

            params, bstats, opt = state.params, state.batch_stats, sgd_state
            params, bstats, opt, loss = jstep(params, bstats, opt, images, labels)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(iters):
                params, bstats, opt, loss = jstep(params, bstats, opt, images, labels)
            float(loss)
            return (time.perf_counter() - t0) / iters * 1e3
        else:
            step = T.make_train_step(
                model, the_loss, has_batch_stats=True, donate=True,
                remat=(name == "remat"),
            )

        return measure_step(step, state, images, labels, iters)


def _sgd_body(model, loss_fn, optimizer, params, bstats, opt, images, labels):
    import jax
    import optax

    def compute_loss(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": bstats}, images, train=True, mutable=["batch_stats"]
        )
        return loss_fn(out, labels), mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
    updates, new_opt = optimizer.update(grads, opt, params)
    return optax.apply_updates(params, updates), new_stats, new_opt, loss


DEFAULT_VARIANTS = (
    "full",
    "fwd_eval",
    "fwd_train_loss",
    "sgd",
    "loss_main_only",
    "no_highpass",
    "no_shift",
    "bn_frozen",
    "remat",
    "pallas_highpass",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", default=",".join(DEFAULT_VARIANTS))
    args = ap.parse_args()

    results = {}
    for v in args.variants.split(","):
        v = v.strip()
        if not v:
            continue
        try:
            ms = run_variant(v, args.image, args.batch, args.iters, args.dtype)
        except Exception as e:  # keep sweeping; report the failure
            print(json.dumps({"variant": v, "error": repr(e)}), flush=True)
            continue
        results[v] = ms
        print(json.dumps({"variant": v, "ms_per_step": round(ms, 1)}), flush=True)

    if "full" in results:
        base = results["full"]
        print("\nvariant            ms/step   delta vs full", file=sys.stderr)
        for v, ms in results.items():
            print(f"{v:<18} {ms:8.1f}   {ms - base:+8.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
