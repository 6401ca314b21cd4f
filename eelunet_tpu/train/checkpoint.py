"""Orbax checkpointing of the full train state.

The reference saves bare ``state_dict`` weights on each new best of six
tracked metrics plus every 10 epochs (train.py:157-180,195-197) and never
persists optimizer state, epoch or RNG — resuming restarts optimization
(SURVEY.md §5). Here the whole TrainState round-trips, and the best-metric
checkpoint policy is mirrored: ``{name}_best_{iou,dice,miou,mdice,
boundary_f1}`` plus ``{name}_best`` on min val loss and periodic
``{name}_epoch_{N}`` snapshots.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
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


def write_format_meta(path: str) -> None:
    import json

    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(FORMAT_META, f)


def warn_if_preformat(path: str, model_name: str) -> bool:
    """Warn (and return True) for eelunet checkpoints lacking the marker."""
    if model_name == "eelunet" and not os.path.exists(os.path.join(path, _META_FILE)):
        import warnings

        warnings.warn(_INTERLEAVE_WARNING % path, stacklevel=3)
        return True
    return False


class CheckpointManager:
    def __init__(self, save_dir: str, model_name: str):
        self.root = os.path.abspath(os.path.join(save_dir, model_name))
        os.makedirs(self.root, exist_ok=True)
        self.model_name = model_name
        self._ckptr = ocp.StandardCheckpointer()

    def _state_tree(self, state) -> Dict[str, Any]:
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }

    def save(self, tag: str, state, force: bool = True) -> str:
        return self.save_to(os.path.join(self.root, f"{self.model_name}_{tag}"), state, force)

    def save_to(self, path: str, state, force: bool = True) -> str:
        """Save to an explicit directory path (outside the tag namespace)."""
        self._ckptr.save(path, self._state_tree(state), force=force)
        self._ckptr.wait_until_finished()
        write_format_meta(path)
        return path

    def restore(self, path: str, state_template):
        """Restore into the structure of ``state_template`` (a TrainState)."""
        warn_if_preformat(path, self.model_name)
        tree = self._ckptr.restore(path, target=self._state_tree(state_template))
        return state_template.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
            rng=tree["rng"],
        )

    def restore_params(self, path: str, state_template):
        """Weights-only restore (reference load_state_dict semantics,
        evaluate.py:172-176)."""
        warn_if_preformat(path, self.model_name)
        tree = self._ckptr.restore(path, target=self._state_tree(state_template))
        return state_template.replace(params=tree["params"], batch_stats=tree["batch_stats"])

    def latest_best_path(self) -> Optional[str]:
        p = os.path.join(self.root, f"{self.model_name}_best")
        return p if os.path.exists(p) else None

    def latest_path(self) -> Optional[str]:
        """Most recently written checkpoint under this model's root — the
        target of ``--resume auto`` (restart-after-preemption recovery; the
        reference's resume was a commented block, train.py:293-297)."""
        candidates = [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith(f"{self.model_name}_") and os.path.isdir(os.path.join(self.root, d))
        ]
        return max(candidates, key=os.path.getmtime) if candidates else None


class BestTracker:
    """Best-per-metric tracking with the reference's save policy."""

    def __init__(self):
        self.best = {m: 0.0 for m in BEST_METRICS}
        self.min_val_loss = float("inf")

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
