"""Training/evaluation workflows — jitted, mesh-sharded, model-agnostic.

Replaces reference train.py:35-214 / evaluate.py:62-124:
- one compiled ``train_step`` (forward + loss + grads + Adam update + BN stat
  mutation) with donated state buffers; no per-step ``.item()`` host sync —
  losses accumulate on device and transfer once per epoch;
- one compiled ``eval_step`` producing summable MetricAccum counts (boundary
  F1 included, on device — the reference does it per-sample on CPU with cv2);
- mesh-aware: batches sharded over 'data', params laid out by
  ``param_shardings`` (replicated, or tensor-sharded over 'model'); XLA
  inserts the gradient psum and any TP collectives;
- checkpointing via orbax with the reference's best-metric policy;
- metrics/log history to ``loss_history.json`` (train.py:199-201 kept
  rewriting it each epoch; same artifact here) and optional TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eelunet_tpu import losses as L
from eelunet_tpu import metrics as M
from eelunet_tpu.config import TrainConfig
from eelunet_tpu.data.pipeline import DataLoader, prefetch_to_device
from eelunet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
    spatial_size,
)
from eelunet_tpu.registry import (
    ModelOutput,
    create_model,
    predict_probabilities,
    seg_probabilities,
)
from eelunet_tpu.train.checkpoint import BestTracker, CheckpointManager
from eelunet_tpu.train.state import TrainState, create_train_state


def choose_batch_placement(local_rows: int, height: int, n_data: int,
                           n_sp: int, process_count: int,
                           loader_sharded: bool) -> str:
    """Pick the mesh placement for one host-side batch: 'full' (rows over
    'data', H over 'spatial'), 'rows' (rows only — H doesn't divide the
    spatial axis), or 'replicate'.

    Tail batches that don't divide the data axis (eval loaders never drop
    samples) fall back to replication — slower for that one batch, metrics
    stay exact. Replication is NEVER valid for a process-sharded loader
    (each host holds a DIFFERENT slice; replicating would silently train
    every host on its own data while XLA assumes one global batch), so that
    combination is a hard error — the process-sharded train loader enforces
    drop_remainder precisely to keep rows divisible.
    """
    global_rows = local_rows * (process_count if loader_sharded else 1)
    rows_ok = global_rows % n_data == 0 and (loader_sharded or process_count == 1)
    if rows_ok and height % n_sp == 0:
        return "full"
    if rows_ok:
        return "rows"
    if loader_sharded and process_count > 1:
        raise ValueError(
            f"process-sharded batch of {local_rows} local rows "
            f"({global_rows} global) does not divide the data axis "
            f"({n_data}) and cannot be replicated across processes"
        )
    return "replicate"


def make_loss_fn(loss_name: str, loss_cfg, meta):
    base = L.LOSS_REGISTRY[loss_name]

    def fn(output: ModelOutput, labels):
        probs = seg_probabilities(output, meta)
        return base(output.aux, probs, labels, loss_cfg)

    return fn


def make_train_step(
    model,
    loss_fn,
    has_batch_stats: bool,
    donate: bool = True,
    remat: bool = False,
    accum_steps: int = 1,
    random_flip: bool = False,
    skip_nonfinite: bool = False,
):
    """Build the jitted train step. Returns ``(new_state, loss, ok)``.

    ``skip_nonfinite=True`` (TrainConfig.skip_nonfinite_updates) guards the
    update entirely ON DEVICE: if the loss or any gradient leaf is
    non-finite, the whole state update (params, Adam moments, BN stats, step,
    EMA) is reverted to the incoming state via a predicated select — no
    per-step host sync, so the async dispatch pipeline is untouched. ``ok``
    reports the verdict (constant True when the guard is off); the Trainer
    accumulates it on device and surfaces a per-epoch skipped-step count.
    The reference has no such guard (a NaN batch poisons the torch model
    silently, SURVEY.md §5 failure handling) — off by default to match."""
    def maybe_flip(state: TrainState, images, labels):
        if not random_flip:
            return images, labels
        # Deterministic per step and exactly resumable: the key derives from
        # the checkpointed (rng, step), not from Python-side state.
        from eelunet_tpu.data.augment import random_flip_batch

        key = jax.random.fold_in(state.rng, state.step)
        return random_flip_batch(key, images, labels)

    def apply_train(params, batch_stats, images):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            output, mutated = model.apply(variables, images, train=True, mutable=["batch_stats"])
            return output, mutated["batch_stats"]
        return model.apply(variables, images, train=True), batch_stats

    if remat:
        # Rematerialize the forward in the backward pass: trades recompute
        # FLOPs for activation HBM (SURVEY.md build-plan design stance).
        apply_train = jax.checkpoint(apply_train)

    def grads_of(params, batch_stats, images, labels):
        def compute_loss(p):
            output, new_stats = apply_train(p, batch_stats, images)
            return loss_fn(output, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
        return loss, new_stats, grads

    def guarded_apply(state: TrainState, loss, new_stats, grads):
        new_state = state.apply_gradients(grads, new_stats)
        if not skip_nonfinite:
            return new_state, jnp.bool_(True)
        ok = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            ok = ok & jnp.all(jnp.isfinite(g))
        # Predicated select over the whole state pytree: one pass of HBM
        # traffic, no branches — XLA-friendly, unlike a host-side check.
        reverted = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_state, state
        )
        # `step` advances regardless: the batch was consumed (LR schedule and
        # the step-keyed flip RNG stay aligned with batches seen), only the
        # update was dropped.
        return reverted.replace(step=new_state.step), ok

    def train_step(state: TrainState, images, labels):
        images, labels = maybe_flip(state, images, labels)
        loss, new_stats, grads = grads_of(state.params, state.batch_stats, images, labels)
        new_state, ok = guarded_apply(state, loss, new_stats, grads)
        return new_state, loss, ok

    def train_step_accum(state: TrainState, images, labels):
        images, labels = maybe_flip(state, images, labels)
        # Gradient accumulation: split the global batch into `accum_steps`
        # micro-batches scanned sequentially — only ONE micro-batch's
        # activations are live at a time, so peak HBM scales with B/accum
        # while the optimizer sees the full-batch (mean) gradient. All the
        # losses are means of per-sample terms, so the mean of micro-batch
        # losses/grads equals the full-batch value exactly (BN models aside:
        # batch stats update sequentially per micro-batch, like torch would
        # on N sequential forwards).
        b = images.shape[0]
        if b % accum_steps:
            raise ValueError(f"batch {b} not divisible by accum_steps {accum_steps}")
        mb = b // accum_steps
        im = images.reshape(accum_steps, mb, *images.shape[1:])
        lb = labels.reshape(accum_steps, mb, *labels.shape[1:])

        def body(carry, xs):
            stats, gsum, lsum = carry
            loss, new_stats, grads = grads_of(state.params, stats, xs[0], xs[1])
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (new_stats, gsum, lsum + loss), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        init = (state.batch_stats, zero_g, jnp.zeros((), jnp.float32))
        (new_stats, gsum, lsum), _ = jax.lax.scan(body, init, (im, lb))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
        loss = lsum / accum_steps
        new_state, ok = guarded_apply(state, loss, new_stats, grads)
        return new_state, loss, ok

    fn = train_step_accum if accum_steps > 1 else train_step
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(model, loss_fn, has_batch_stats: bool):
    def eval_loss_step(state: TrainState, images, labels):
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        output = model.apply(variables, images, train=False)
        return loss_fn(output, labels)

    return jax.jit(eval_loss_step)


def make_eval_step(model, meta, has_batch_stats: bool, threshold: float = 0.5,
                   tta: bool = False):
    def eval_step(state: TrainState, images, labels):
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats

        def fwd(x):
            return seg_probabilities(model.apply(variables, x, train=False), meta)

        probs = predict_probabilities(fwd, images, tta=tta)
        if probs.shape[-1] > 1:  # multi-class: argmax + confusion matrix
            return M.update_metrics_multiclass(probs, labels)
        return M.update_metrics(probs, labels, threshold)

    return jax.jit(eval_step)


class Trainer:
    """End-to-end training driver (reference train() train.py:87-214)."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        if cfg.data.add_canny_edge and cfg.model.in_channels == 3:
            # AddCannyEdge appends a 4th input channel (AddCannyEdge.py:8-41);
            # bump in_channels so the init sample and first conv agree.
            import dataclasses

            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, in_channels=4)
            )
        self.cfg = cfg
        from eelunet_tpu.data.augment import make_input_preprocess

        self._preprocess, self._has_augment = make_input_preprocess(
            cfg.data, num_classes=cfg.model.out_channels
        )
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis
        )
        model_cfg = cfg.model
        self._highpass_auto = getattr(model_cfg, "highpass_impl", "auto") == "auto"
        if self._highpass_auto:
            import dataclasses

            if spatial_size(self.mesh) > 1:
                # H-sharded activations: the low-rank matmul high-pass is
                # XLA-partitionable; a pallas_call would be gathered+replicated.
                model_cfg = dataclasses.replace(model_cfg, highpass_impl="lowrank")
            elif (
                int(self.mesh.devices.size) > 1
                and jax.default_backend() == "tpu"
                and getattr(model_cfg, "dtype", None) == "bfloat16"
            ):
                # bf16 models only — mirrors the "auto" dispatch gate. f32
                # models keep the lowrank path, whose matmuls pin
                # Precision.HIGHEST (TPU f32 matmuls otherwise run as bf16
                # MXU passes; the kernels don't pin precision).
                # Batch-sharded multi-device eval/inference: the
                # custom_partitioning wrapper keeps the Pallas kernels on
                # local shards (a bare pallas_call has no partitioning rule
                # and would be gathered+replicated). Train steps still pin
                # lowrank below.
                model_cfg = dataclasses.replace(model_cfg, highpass_impl="pallas_sharded")
        self.model, self.meta = create_model(model_cfg)
        self.loss_name = L.resolve_loss_name(
            cfg.loss.name, cfg.model.name, cfg.model.out_channels
        )
        self.loss_fn = make_loss_fn(self.loss_name, cfg.loss, self.meta)
        self._steps: Dict[str, Any] = {}
        self.ckpt = CheckpointManager(
            cfg.save_dir, cfg.model.name,
            async_writes=getattr(cfg, "async_checkpoint", False),
        )
        self.best = BestTracker()
        self._profiled = False
        self.last_skipped_steps = 0  # non-finite-guard skips, latest epoch

    # -- state ---------------------------------------------------------------
    def init_state(self, steps_per_epoch: int = 1) -> TrainState:
        cfg = self.cfg
        seed = cfg.seed if cfg.seed is not None else int(np.random.randint(0, 10000))
        self.seed = seed
        rng = jax.random.PRNGKey(seed)
        h, w = cfg.data.image_size
        sample = jnp.zeros((1, h, w, cfg.model.in_channels), jnp.float32)
        state = create_train_state(self.model, cfg.optimizer, rng, sample, steps_per_epoch)
        if getattr(cfg.model, "slim_init", ""):
            # Physically pruned weights (cli.prune --physical output): the
            # module is already the slim one (registry), so the structures
            # match; optimizer moments start fresh, like the reference's
            # weights-only finetune (prune.py:276-278).
            from eelunet_tpu.prune_physical import load_slim

            _, params, bstats = load_slim(
                cfg.model.slim_init, cfg.model.out_channels,
                dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else None,
            )
            state = state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, params),
                batch_stats=jax.tree_util.tree_map(jnp.asarray, bstats),
            )
        # Lay out state across the mesh (replicated / TP-sharded params).
        shardings = self._state_shardings(state)
        state = jax.device_put(state, shardings)
        self._state_sharding_tree = shardings
        return state

    def _state_shardings(self, state: TrainState):
        psh = param_shardings(state.params, self.mesh)
        rep = replicated_sharding(self.mesh)
        return TrainState(
            params=psh,
            batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
            opt_state=jax.tree_util.tree_map(lambda _: rep, state.opt_state),
            step=rep,
            rng=rep,
            tx=state.tx,
            # EMA mirrors the params' layout (same tree, same TP sharding)
            ema_params=psh if state.ema_params is not None else None,
            ema_decay=state.ema_decay,
        )

    def _get_step(self, name: str, state: TrainState):
        if name in self._steps:
            return self._steps[name]
        has_bs = bool(jax.tree_util.tree_leaves(state.batch_stats))
        if name == "train":
            train_model = self.model
            if self._highpass_auto and getattr(train_model, "highpass_impl", None) in (
                "auto",
                "pallas_sharded",
            ):
                # TRAIN steps pin the XLA low-rank high-pass: repeated
                # same-run A/B at 512^2 bf16 measures lowrank 236.3-236.9
                # vs Pallas fwd+bwd kernels 237.6-237.7 ms/step — parity
                # within noise, and the matmul formulation partitions
                # natively on any mesh. Inference/eval keep the kernels
                # ("auto" -> pallas on one chip — measured fwd win — and
                # the constructor's "pallas_sharded" on multi-device TPU).
                # A user-set explicit impl is honored unchanged. Param
                # trees are identical either way; state is shared.
                train_model = train_model.clone(highpass_impl="lowrank")
            fn = make_train_step(
                train_model, self.loss_fn, has_bs, self.cfg.donate_buffers,
                self.cfg.remat, self.cfg.accum_steps,
                random_flip=self.cfg.data.random_flip,
                skip_nonfinite=getattr(self.cfg, "skip_nonfinite_updates", False),
            )
        elif name == "eval_loss":
            fn = make_eval_loss_step(self.model, self.loss_fn, has_bs)
        elif name == "eval":
            fn = make_eval_step(self.model, self.meta, has_bs, self.cfg.threshold,
                                tta=self.cfg.tta)
        else:
            raise KeyError(name)
        self._steps[name] = fn
        return fn

    # -- loops ---------------------------------------------------------------
    def _device_batches(self, loader: Iterable):
        shardings = {
            "full": batch_sharding(self.mesh),
            "rows": batch_sharding(self.mesh, with_spatial=False),
            "replicate": replicated_sharding(self.mesh),
        }
        n_data = self.mesh.shape["data"]
        n_sp = spatial_size(self.mesh)
        # Multi-host: a process-sharded loader yields this host's slice of
        # each global batch — always 'data'-sharded (drop_remainder enforced
        # in the loader). Unsharded loaders on >1 process carry the full
        # batch on every host -> replicate.
        pc = jax.process_count()
        loader_sharded = getattr(loader, "process_shard", None) is not None
        from eelunet_tpu.parallel.distributed import assemble_global_batch

        def shard_or_replicate(batch):
            choice = choose_batch_placement(
                batch[0].shape[0], batch[0].shape[1], n_data, n_sp,
                pc, loader_sharded,
            )
            sharding = shardings[choice]
            out = jax.tree_util.tree_map(
                lambda a: assemble_global_batch(a, sharding), tuple(batch)
            )
            if self._has_augment or out[0].dtype == jnp.uint8:
                # Device-side input chain (uint8 scale, canny enhance/edge
                # channel, ImageNet normalize); jitted, so it fuses with the
                # sharding layout instead of running on host. Skipped only
                # for float batches with no augmentations (already normalized
                # on host — identity).
                out = self._preprocess(*out)
            return out

        return prefetch_to_device(
            map(shard_or_replicate, loader), depth=self.cfg.data.prefetch_depth, sharding=None
        )

    def train_one_epoch(self, state: TrainState, loader) -> Tuple[TrainState, float]:
        """One pass over ``loader``; returns (state, mean loss over applied
        steps). Steps the non-finite guard skipped are excluded from the mean
        and counted in ``self.last_skipped_steps`` (0 when the guard is off) —
        accumulated on device, read back once per epoch."""
        step = self._get_step("train", state)
        guard = getattr(self.cfg, "skip_nonfinite_updates", False)
        total = jnp.zeros((), jnp.float32)
        n_ok = jnp.zeros((), jnp.float32)
        n = 0
        # profile_steps > 0: trace steps [1, 1+profile_steps) of the first
        # epoch (step 0 is the compile) into log_dir/<model>/profile.
        want_prof = self.cfg.profile_steps if not self._profiled else 0
        tracing = False
        for i, (images, labels) in enumerate(self._device_batches(loader)):
            if want_prof and i == 1:
                # Drain step 0 (the compile step) through the axon tunnel
                # before opening the trace window — dispatch is async and
                # block_until_ready doesn't sync there, so without a host
                # readback step 0's device execution bleeds into the capture.
                float(total)
                prof_dir = os.path.join(self.cfg.log_dir, self.cfg.model.name, "profile")
                os.makedirs(prof_dir, exist_ok=True)
                jax.profiler.start_trace(prof_dir)
                tracing = True
            state, loss, ok = step(state, images, labels)
            if guard:
                total = total + jnp.where(ok, loss, 0.0)
                n_ok = n_ok + ok.astype(jnp.float32)
            else:  # ok is constant True: skip the two extra per-step dispatches
                total = total + loss
            n += 1
            if tracing and i >= want_prof:  # steps 1..want_prof captured
                float(total)  # drain the chained steps through the tunnel
                jax.profiler.stop_trace()
                tracing = False
                self._profiled = True
        if tracing:  # epoch shorter than profile window
            float(total)
            jax.profiler.stop_trace()
            self._profiled = True
        applied = float(n_ok) if guard else float(n)
        self.last_skipped_steps = n - int(round(applied))
        return state, float(total) / max(applied, 1.0)

    def val_one_epoch(self, state: TrainState, loader) -> float:
        step = self._get_step("eval_loss", state)
        total = jnp.zeros((), jnp.float32)
        n = 0
        for images, labels in self._device_batches(loader):
            total = total + step(state, images, labels)
            n += 1
        return float(total) / max(n, 1)

    def evaluate(self, state: TrainState, loader, return_accum: bool = False):
        """Full metric evaluation (reference evaluate.py:62-124).

        ``return_accum=True`` additionally returns the raw accumulator
        (MetricAccum / MetricAccumMC) for drill-downs like per-class tables."""
        step = self._get_step("eval", state)
        acc = None
        for images, labels in self._device_batches(loader):
            batch_acc = step(state, images, labels)
            acc = batch_acc if acc is None else acc + batch_acc
        if acc is None:
            out = {k: 0.0 for k in M.METRIC_NAMES}
            return (out, None) if return_accum else out
        final = (
            M.finalize_metrics_multiclass(acc)
            if isinstance(acc, M.MetricAccumMC)
            else M.finalize_metrics(acc)
        )
        out = {k: float(v) for k, v in final.items()}
        return (out, acc) if return_accum else out

    def fit(
        self,
        train_loader,
        val_loader,
        test_loader,
        state: Optional[TrainState] = None,
        log=print,
    ) -> Tuple[TrainState, Dict[str, Any]]:
        cfg = self.cfg
        steps_per_epoch = max(len(train_loader), 1)
        if state is None:
            state = self.init_state(steps_per_epoch=steps_per_epoch)
        start_epoch = 0
        if cfg.resume_from:
            target = cfg.resume_from
            if target == "auto":
                target = self.ckpt.latest_path()
            if target:
                from eelunet_tpu.train.checkpoint import read_meta

                state = self.ckpt.restore(target, state)
                # Exact continuation: `epochs` is the TOTAL target, not an
                # increment. The completed-epoch count is stored in the
                # snapshot's framework_meta.json; pre-epoch-meta checkpoints
                # fall back to step/steps_per_epoch (one optimizer step per
                # loader batch; accum_steps splits within a step — correct
                # only while the loader geometry is unchanged). With
                # set_epoch-pinned shuffle keys and the step-keyed flip RNG,
                # the resumed trajectory is identical to an uninterrupted
                # run (tests/test_train_e2e.py::test_resume_exact_continuation).
                meta_epoch = read_meta(target).get("epoch")
                done = (
                    int(meta_epoch)
                    if meta_epoch is not None
                    else int(state.step) // steps_per_epoch
                )
                start_epoch = min(done, cfg.epochs)
                self.best.load(self.ckpt.root)
                log(
                    f"Resumed full train state from {target} at step "
                    f"{int(state.step)} — continuing at epoch "
                    f"{start_epoch + 1}/{cfg.epochs}"
                    if start_epoch < cfg.epochs
                    else f"Resumed {target} at step {int(state.step)}: already "
                    f"trained {start_epoch} epochs, target epochs={cfg.epochs} "
                    "reached — nothing to do"
                )
            else:
                log("resume_from=auto: no checkpoint found, starting fresh")

        from eelunet_tpu.parallel.distributed import is_primary
        from eelunet_tpu.train.logging import MetricLogger

        # Only host 0 writes TB/jsonl/history and prints; checkpoint saves
        # below stay collective (orbax multihost elects the writer itself).
        primary = is_primary()
        if not primary:
            log = lambda *a, **k: None
        run_dir = os.path.join(cfg.log_dir, cfg.model.name, datetime.now().strftime("%Y%m%d_%H%M%S"))
        logger = None
        if primary:
            os.makedirs(run_dir, exist_ok=True)
            logger = MetricLogger(run_dir)
        history = {"train_loss": [], "val_loss": [], "metrics": []}
        json_path = os.path.join(self.ckpt.root, "loss_history.json")
        if start_epoch > 0 and os.path.exists(json_path):
            # Continue the history of the interrupted run (truncated to the
            # completed epochs, in case it died mid-write of a later epoch).
            try:
                with open(json_path) as f:
                    prev = json.load(f)
                history = {k: list(prev.get(k, []))[:start_epoch] for k in history}
            except (OSError, ValueError):
                pass

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            if hasattr(train_loader, "set_epoch"):
                # Pin the shuffle key to the epoch number so resumed runs
                # replay the uninterrupted run's batch order exactly.
                train_loader.set_epoch(epoch)
            state, train_loss = self.train_one_epoch(state, train_loader)
            if self.last_skipped_steps:
                log(
                    f"WARNING: epoch {epoch + 1}: skipped "
                    f"{self.last_skipped_steps} non-finite update(s) "
                    "(skip_nonfinite_updates guard)"
                )
            val_loss = self.val_one_epoch(state, val_loader)
            metrics = self.evaluate(state, test_loader) if (epoch + 1) % cfg.eval_every == 0 else {}

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["metrics"].append(metrics)
            if logger is not None:
                logger.log_epoch(epoch + 1, train_loss, val_loss, metrics)

            # Weights-only + hardlink-deduped (reference state_dict policy;
            # skips the per-epoch optimizer-moments device fetch — measured
            # checkpoint-cost entry in docs/PERF.md). background=True hands
            # the device->host fetch + write to the async writer so it
            # overlaps the next epoch's compute (fit drains the queue before
            # returning; docs/PERF.md async-checkpoint entry).
            bg = bool(getattr(cfg, "async_checkpoint", False))
            self.ckpt.save_weights_tags(
                self.best.update(metrics, val_loss), state, background=bg
            )
            if (epoch + 1) % cfg.snapshot_every == 0:
                self.ckpt.save(f"epoch_{epoch + 1}", state, epoch=epoch + 1,
                               background=bg)
                self.ckpt.prune_snapshots(cfg.keep_snapshots, background=bg)

            dt = time.time() - t0
            log(
                f"Epoch [{epoch + 1}/{cfg.epochs}]\tTrain Loss: {train_loss:.4f}\t"
                f"Val Loss: {val_loss:.4f}\t"
                + "".join(
                    f"{k}: {metrics[k]:.4f}\t"
                    for k in ("iou", "dice", "miou", "mdice", "boundary_f1")
                    if k in metrics
                )
                + f"({dt:.1f}s)"
            )
            if primary:
                with open(json_path, "w") as f:
                    json.dump(history, f, indent=2)
                # best_meta must not outrun its best-tag checkpoints (a crash
                # in the gap would make resume skip re-saving a tag that never
                # landed), so the write queues behind any pending async saves
                # — on a value snapshot, since self.best mutates next epoch.
                import copy as _copy

                best_snapshot = _copy.deepcopy(self.best)
                self.ckpt.run_after_saves(
                    partial(best_snapshot.save, self.ckpt.root)
                )

        if cfg.epochs > start_epoch and cfg.epochs % cfg.snapshot_every != 0:
            # Final full snapshot: with best tags weights-only, this (plus
            # the periodic epoch_N saves) is what resume_from=auto targets.
            # Skipped when the final epoch already wrote its epoch_N snapshot
            # (an identical full save — `last` would double the device fetch
            # and disk for nothing; latest_path finds epoch_N by mtime).
            self.ckpt.save("last", state, epoch=cfg.epochs,
                           background=bool(getattr(cfg, "async_checkpoint", False)))
        if cfg.epochs > start_epoch and getattr(state, "ema_params", None) is not None:
            # Weights-only EMA tag: evaluate/predict/serve it like any best
            # tag (--checkpoint .../{name}_ema). The EMA also lives in every
            # full snapshot, so resume keeps averaging seamlessly.
            self.ckpt.save_weights_tags(
                ["ema"], state.replace(params=state.ema_params),
                background=bool(getattr(cfg, "async_checkpoint", False)),
            )
        # Drain the async checkpoint queue before declaring the run complete:
        # every tag/snapshot is on disk when fit() returns, and a failed
        # background write surfaces here instead of being silently dropped.
        self.ckpt.wait()
        log(
            "Training complete. Best: "
            + " ".join(f"{k}={v:.4f}" for k, v in self.best.best.items())
        )
        if logger is not None:
            logger.close()
        return state, history
