"""Orbax checkpointing of the full train state.

The reference saves bare ``state_dict`` weights on each new best of six
tracked metrics plus every 10 epochs (train.py:157-180,195-197) and never
persists optimizer state, epoch or RNG — resuming restarts optimization
(SURVEY.md §5). Here the policy is mirrored with two tiers:
``{name}_best_{iou,dice,miou,mdice,boundary_f1}`` + ``{name}_best`` (min
val loss) are weights-only like the reference's state_dicts (and
hardlink-deduped within an epoch — see save_weights_tags), while periodic
``{name}_epoch_{N}`` snapshots round-trip the whole TrainState for exact
resume (which the reference cannot do).

With ``async_writes=True`` (TrainConfig.async_checkpoint, default on),
saves called with ``background=True`` — Trainer.fit's per-epoch tags and
snapshots — snapshot their tree on device and a background worker pays the
device->host fetch + write, overlapped with the next epoch's compute
(_AsyncWriter below; measured win in docs/PERF.md). Direct API calls stay
synchronous so any reader can consume the path the moment they return; fit
drains the queue before returning.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

BEST_METRICS = ("iou", "dice", "miou", "mdice", "boundary_f1")

# Sidecar format marker written into every checkpoint dir. Format 2 =
# concat-ordered EELUnet skip bridge (models/eelunet.py layout note);
# eelunet checkpoints WITHOUT the marker predate the bridge change and
# their dec-conv weights use the interleaved cin order — loading them
# unmigrated produces wrong outputs with no shape error.
FORMAT_META = {"format": 2, "eelunet_bridge": "concat"}
_META_FILE = "framework_meta.json"

_INTERLEAVE_WARNING = (
    "checkpoint %s has no framework_meta.json: if it was trained before the "
    "concat-ordered bridge (format 2), its dec-conv weights use the "
    "interleaved input-channel order and predictions will be wrong. Migrate "
    "exactly with eelunet_tpu.models.eelunet.migrate_interleaved_checkpoint "
    "and re-save."
)


def write_format_meta(
    path: str, weights_only: bool = False, ema: bool = False,
    epoch: Optional[int] = None,
) -> None:
    import json

    meta = dict(FORMAT_META)
    if weights_only:
        meta["weights_only"] = True
    if ema:
        meta["ema"] = True  # the saved tree includes an ema_params entry
    if epoch is not None:
        # Completed-epoch count at save time: exact resume reads this
        # instead of deriving epochs from step/steps_per_epoch, which
        # silently re-runs or skips epochs if the dataset or batch size
        # changed between runs.
        meta["epoch"] = int(epoch)
    target = os.path.join(path, _META_FILE)
    if os.path.exists(target):
        os.remove(target)  # break hardlinks (save_weights_tags dedup copies)
    with open(target, "w") as f:
        json.dump(meta, f)


def read_meta(path: str) -> Dict[str, Any]:
    import json

    try:
        with open(os.path.join(path, _META_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def is_weights_only(path: str) -> bool:
    return bool(read_meta(path).get("weights_only"))


def warn_if_preformat(path: str, model_name: str) -> bool:
    """Warn (and return True) for eelunet checkpoints lacking the marker."""
    if model_name == "eelunet" and not os.path.exists(os.path.join(path, _META_FILE)):
        import warnings

        warnings.warn(_INTERLEAVE_WARNING % path, stacklevel=3)
        return True
    return False


class _AsyncWriter:
    """One daemon worker draining checkpoint writes in submission order.

    The expensive part of a checkpoint on this rig is not disk but the
    device->host fetch of the arrays through the axon tunnel (docs/PERF.md
    checkpoint-cost entry) — so the caller snapshots the tree ON DEVICE (a
    compiled copy: fresh buffers, immune to train_step's donation of the live
    state) and the worker pays the fetch + orbax write while the next epoch's
    compute proceeds. Writes stay strictly ordered; a failed write is
    re-raised on the next submit()/wait() and pending work after a failure is
    skipped (later writes usually depend on the failed one's directory).
    """

    def __init__(self):
        self._q: "queue.Queue[Callable[[], None]]" = queue.Queue()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="eelunet-ckpt-writer"
        )
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            try:
                if self._exc is None:
                    fn()
            except BaseException as e:  # surfaced at next submit()/wait()
                self._exc = e
            finally:
                self._q.task_done()

    def _reraise(self):
        if self._exc is not None:
            e, self._exc = self._exc, None
            raise RuntimeError("async checkpoint write failed") from e

    def submit(self, fn: Callable[[], None]) -> None:
        self._reraise()
        self._q.put(fn)

    def wait(self) -> None:
        self._q.join()
        self._reraise()


def _device_snapshot(tree):
    """Compiled on-device copy of every array leaf: new buffers that survive
    the next train_step's buffer donation, at HBM-copy cost — no host fetch.
    jit outputs never alias inputs (absent donation), so the copies are real;
    shardings carry through, which orbax consumes shard-by-shard."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if idx:
        copies = _snapshot_jit([leaves[i] for i in idx])
        for i, c in zip(idx, copies):
            leaves[i] = c
    return jax.tree_util.tree_unflatten(treedef, leaves)


@jax.jit
def _snapshot_jit(xs):
    return [jnp.copy(x) for x in xs]


class CheckpointManager:
    def __init__(self, save_dir: str, model_name: str, async_writes: bool = False):
        self.root = os.path.abspath(os.path.join(save_dir, model_name))
        os.makedirs(self.root, exist_ok=True)
        self.model_name = model_name
        self._ckptr = ocp.StandardCheckpointer()
        # Orbax multihost saves are collective with their own barriers; a
        # per-process worker thread would have every process block its queue
        # on the slowest peer with no way to surface skew — async is a
        # single-process optimization (the multihost path stays synchronous).
        self._async = (
            _AsyncWriter() if async_writes and jax.process_count() == 1 else None
        )

    def wait(self) -> None:
        """Block until every pending async write has landed (no-op when sync);
        re-raises the first failed write."""
        if self._async is not None:
            self._async.wait()

    def run_after_saves(self, fn: Callable[[], None]) -> None:
        """Run ``fn`` after all currently-pending writes (immediately when
        sync) — for sidecar artifacts that must not outrun their checkpoint."""
        if self._async is not None:
            self._async.submit(fn)
        else:
            fn()

    def _state_tree(self, state, with_ema: Optional[bool] = None) -> Dict[str, Any]:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        has_ema = getattr(state, "ema_params", None) is not None
        if with_ema is None:
            with_ema = has_ema
        if with_ema:
            # Restore targets for pre-EMA checkpoints use the params
            # structure as the template (values overwritten or discarded).
            tree["ema_params"] = state.ema_params if has_ema else state.params
        return tree

    def _weights_tree(self, state) -> Dict[str, Any]:
        return {"params": state.params, "batch_stats": state.batch_stats}

    def save(self, tag: str, state, force: bool = True, epoch: Optional[int] = None,
             background: bool = False) -> str:
        return self.save_to(
            os.path.join(self.root, f"{self.model_name}_{tag}"), state, force, epoch,
            background=background,
        )

    def save_to(
        self, path: str, state, force: bool = True, epoch: Optional[int] = None,
        background: bool = False,
    ) -> str:
        """Save to an explicit directory path (outside the tag namespace).

        ``background=True`` (Trainer.fit's per-epoch saves) snapshots the tree
        on device and returns immediately; the write lands in queue order.
        Direct callers default to synchronous so the path is readable — by any
        reader, not just this manager — the moment the call returns."""
        from eelunet_tpu.parallel.distributed import is_primary

        has_ema = getattr(state, "ema_params", None) is not None
        enqueue = background and self._async is not None
        tree = self._state_tree(state)
        if enqueue:
            tree = _device_snapshot(tree)

        def work():
            self._ckptr.save(path, tree, force=force)
            self._ckptr.wait_until_finished()
            # Orbax's save is collective (every process calls it; orbax
            # elects the writer) — but the sidecar write is plain fs
            # mutation, so only host 0 performs it (two hosts racing
            # remove+write the same file can throw FileNotFoundError).
            if is_primary():
                write_format_meta(path, ema=has_ema, epoch=epoch)

        if enqueue:
            self._async.submit(work)
        else:
            self.wait()  # keep ordering with any earlier background writes
            work()
        return path

    def save_weights_tags(self, tags, state, background: bool = False) -> list:
        """Weights-only (params + batch_stats) saves for best-metric tags —
        the reference's ``torch.save(model.state_dict())`` semantics
        (train.py:157-180). Two measured wins on this rig (docs/PERF.md
        checkpoint-cost entry): skipping the optimizer moments avoids a
        device->host fetch of 2x the param bytes through the tunnel per
        epoch, and tags after the first are hardlink copies (the epoch's
        weights are identical), so 4 simultaneous new bests cost one save.
        Resume still needs a full snapshot (``epoch_N``; latest_path skips
        weights-only dirs)."""
        import shutil

        from eelunet_tpu.parallel.distributed import is_primary

        if not tags:
            return []
        enqueue = background and self._async is not None
        tree = self._weights_tree(state)
        if enqueue:
            tree = _device_snapshot(tree)
        paths = [
            os.path.join(self.root, f"{self.model_name}_{tag}") for tag in tags
        ]

        def work():
            primary = is_primary()
            first = None
            for path in paths:
                if first is None:
                    # Collective: every process calls save (orbax's multihost
                    # protocol elects the writer and barriers internally).
                    self._ckptr.save(path, tree, force=True)
                    self._ckptr.wait_until_finished()
                    first = path
                elif primary:
                    # The hardlink dedup copies and sidecars are plain fs
                    # mutations — primary host only, or N hosts race the same
                    # rmtree/copytree on shared storage.
                    if os.path.exists(path):
                        shutil.rmtree(path)
                    shutil.copytree(first, path, copy_function=os.link)
                if primary:
                    write_format_meta(path, weights_only=True)

        if enqueue:
            self._async.submit(work)
        else:
            self.wait()
            work()
        return paths

    def restore(self, path: str, state_template):
        """Restore into the structure of ``state_template`` (a TrainState)."""
        self.wait()  # never read under a pending async write
        if is_weights_only(path):
            raise ValueError(
                f"{path} is a weights-only (best-metric) checkpoint: it has no "
                "optimizer state to resume from. Resume from a full snapshot "
                f"({self.model_name}_epoch_N), or load weights with "
                "restore_params/--checkpoint."
            )
        warn_if_preformat(path, self.model_name)
        ckpt_ema = bool(read_meta(path).get("ema"))
        tmpl_ema = getattr(state_template, "ema_params", None) is not None
        tree = self._ckptr.restore(
            path, target=self._state_tree(state_template, with_ema=ckpt_ema)
        )
        ema = state_template.ema_params
        if tmpl_ema and not ckpt_ema:
            import warnings

            warnings.warn(
                f"{path} predates optimizer.ema_decay: initializing the EMA "
                "from the restored params", stacklevel=2)
            ema = tree["params"]
        elif ckpt_ema and tmpl_ema:
            ema = tree["ema_params"]
        elif ckpt_ema and not tmpl_ema:
            import warnings

            warnings.warn(
                f"{path} carries EMA params but optimizer.ema_decay is 0: "
                "dropping them (set ema_decay>0 to keep updating the EMA)",
                stacklevel=2)
        return state_template.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
            rng=tree["rng"],
            ema_params=ema,
        )

    def restore_params(self, path: str, state_template):
        """Weights-only restore (reference load_state_dict semantics,
        evaluate.py:172-176). Accepts both full and weights-only dirs."""
        self.wait()
        warn_if_preformat(path, self.model_name)
        if is_weights_only(path):
            tree = self._ckptr.restore(path, target=self._weights_tree(state_template))
        else:
            tree = self._ckptr.restore(
                path,
                target=self._state_tree(
                    state_template, with_ema=bool(read_meta(path).get("ema"))
                ),
            )
        return state_template.replace(params=tree["params"], batch_stats=tree["batch_stats"])

    def prune_snapshots(self, keep: int, background: bool = False) -> list:
        """Delete all but the newest ``keep`` periodic ``{name}_epoch_N``
        snapshots (by epoch number). Full snapshots carry the Adam moments —
        3x the param bytes each — so an unbounded run (the reference keeps
        every 10th-epoch .pth forever, train.py:195-197) grows disk without
        bound; ``keep=0`` preserves that behavior. Only epoch_N dirs are
        touched: best tags and ``last`` are never pruned. Primary host only
        (plain fs mutation). Returns the deleted paths (empty under
        ``background=True`` — the sweep is queued behind the pending saves it
        must not outrun)."""
        if background and self._async is not None:
            if keep > 0:
                self._async.submit(lambda: self._prune_snapshots_sync(keep))
            return []
        self.wait()
        return self._prune_snapshots_sync(keep)

    def _prune_snapshots_sync(self, keep: int) -> list:
        import re
        import shutil

        from eelunet_tpu.parallel.distributed import is_primary

        if keep <= 0 or not is_primary():
            return []
        pat = re.compile(re.escape(self.model_name) + r"_epoch_(\d+)$")
        snaps = []
        for d in os.listdir(self.root):
            m = pat.match(d)
            if m and os.path.isdir(os.path.join(self.root, d)):
                snaps.append((int(m.group(1)), os.path.join(self.root, d)))
        snaps.sort()
        doomed = [p for _, p in snaps[:-keep]] if len(snaps) > keep else []
        for p in doomed:
            shutil.rmtree(p)
        return doomed

    def latest_best_path(self) -> Optional[str]:
        self.wait()
        p = os.path.join(self.root, f"{self.model_name}_best")
        return p if os.path.exists(p) else None

    def latest_path(self) -> Optional[str]:
        """Most recently written FULL checkpoint under this model's root —
        the target of ``--resume auto`` (restart-after-preemption recovery;
        the reference's resume was a commented block, train.py:293-297).
        Weights-only best-metric dirs are skipped: they carry no optimizer
        state to resume."""
        self.wait()
        candidates = [
            p
            for d in os.listdir(self.root)
            if d.startswith(f"{self.model_name}_")
            and os.path.isdir(p := os.path.join(self.root, d))
            and not is_weights_only(p)
        ]
        return max(candidates, key=os.path.getmtime) if candidates else None


class BestTracker:
    """Best-per-metric tracking with the reference's save policy.

    State round-trips through ``best_meta.json`` (save/load below) so a
    resumed run keeps the uninterrupted run's high-water marks: without it,
    a restart would re-save ``best_*`` tags for metrics worse than already
    checkpointed (the reference cannot resume at all, SURVEY.md §5)."""

    def __init__(self):
        self.best = {m: 0.0 for m in BEST_METRICS}
        self.min_val_loss = float("inf")

    def save(self, root: str) -> None:
        import json

        with open(os.path.join(root, "best_meta.json"), "w") as f:
            json.dump({"best": self.best, "min_val_loss": self.min_val_loss}, f)

    def load(self, root: str) -> bool:
        """Restore high-water marks if a best_meta.json exists; returns
        whether one was found."""
        import json

        try:
            with open(os.path.join(root, "best_meta.json")) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return False
        self.best.update({m: float(v) for m, v in meta.get("best", {}).items()
                          if m in self.best})
        self.min_val_loss = float(meta.get("min_val_loss", float("inf")))
        return True

    def update(self, metrics: Dict[str, float], val_loss: float):
        """Return the list of checkpoint tags to save this epoch."""
        tags = []
        for m in BEST_METRICS:
            if metrics.get(m, 0.0) > self.best[m]:
                self.best[m] = float(metrics[m])
                tags.append(f"best_{m}")
        if val_loss < self.min_val_loss:
            self.min_val_loss = float(val_loss)
            tags.append("best")
        return tags
