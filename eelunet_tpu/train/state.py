"""Train state: one pytree holding params, batch stats, optimizer state, step
and PRNG key — the full resumable state the reference never checkpoints
(SURVEY.md §5: reference saves model weights only, train.py:157-180; resume
restarts optimization).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from eelunet_tpu.config import OptimizerConfig


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray

    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Exponential moving average of params (optimizer.ema_decay > 0) — a
    # beyond-reference accuracy knob: EMA weights typically evaluate better
    # than the last iterate. None when disabled (kept out of checkpoints).
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
        return self.replace(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            step=self.step + 1,
            ema_params=new_ema,
        )


def step_lr_schedule(lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int):
    """StepLR(step_size=30, gamma=0.5) equivalent (train.py:315), stepped per
    optimizer step using the epoch boundary."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return lr * gamma ** (epoch // step_size_epochs)

    return schedule


def build_optimizer(cfg: OptimizerConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(lr, weight_decay=1e-5) + StepLR (train.py:312,315).

    torch ``Adam(weight_decay=w)`` adds w*p to the *gradient* before the Adam
    moments (L2, not AdamW); ``optax.add_decayed_weights`` before adam's
    moment update reproduces that ordering.
    """
    if cfg.lr_schedule == "step":
        lr = step_lr_schedule(cfg.lr, cfg.lr_step_size, cfg.lr_gamma, steps_per_epoch)
    elif cfg.lr_schedule == "constant":
        lr = cfg.lr
    elif cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.lr, cfg.lr_step_size * steps_per_epoch)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")

    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.name == "adam":
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif cfg.name == "sgd":
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.trace(decay=0.9))
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)


def create_train_state(
    model,
    opt_cfg: OptimizerConfig,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    steps_per_epoch: int = 1,
) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(opt_cfg, steps_per_epoch)
    decay = float(getattr(opt_cfg, "ema_decay", 0.0))
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if decay > 0 else None,
        ema_decay=decay,
    )
