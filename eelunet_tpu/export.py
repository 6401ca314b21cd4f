"""Deployment artifacts: serialized StableHLO forwards with baked weights.

`jax.export` lowers the jitted uint8-in -> probabilities-out forward once
per batch bucket and serializes it; the artifact directory is a complete,
Python-model-free deployment unit (the reference has nothing comparable —
its test.py re-imports the torch model class to run inference). Weights,
normalization constants and the sigmoid/threshold convention are baked into
the program, so a serving host needs only jax + the artifact — no model
zoo, no checkpoint tree, no version-matched module code.

Artifact layout:
    <dir>/meta.json                 model/name, image_size, batch buckets
    <dir>/b<N>.stablehlo            one serialized program per bucket

Portability: programs are exported for both "tpu" and "cpu" lowering
platforms; EELUnet pins the low-rank (pure-XLA) high-pass so no Pallas
custom-calls end up in the artifact.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_META = "meta.json"


def export_model(
    model_cfg,
    checkpoint: Optional[str],
    image_size: Tuple[int, int],
    batch_sizes: Sequence[int] = (1, 8),
    out_dir: str = "exported",
    normalize_mean: Sequence[float] = (0.485, 0.456, 0.406),
    normalize_std: Sequence[float] = (0.229, 0.224, 0.225),
    platforms: Sequence[str] = ("tpu", "cpu"),
    quantize: Optional[str] = None,
) -> str:
    """Serialize uint8->probabilities forwards for each batch bucket."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from eelunet_tpu.inference import Predictor

    if getattr(model_cfg, "highpass_impl", None) in (None, "auto", "pallas", "pallas_sharded"):
        # Pallas custom-calls don't deserialize off-TPU; the low-rank matmul
        # formulation is platform-neutral and output-identical to 1e-7.
        model_cfg = dataclasses.replace(model_cfg, highpass_impl="lowrank")
    predictor = Predictor(
        model_cfg, checkpoint=checkpoint,
        normalize_mean=tuple(normalize_mean), normalize_std=tuple(normalize_std),
    )
    h, w = image_size
    mean = tuple(normalize_mean)
    std = tuple(normalize_std)
    params, batch_stats = predictor.params, predictor.batch_stats
    model, meta = predictor.model, predictor.meta

    from eelunet_tpu.data.augment import normalize_imagenet
    from eelunet_tpu.registry import seg_probabilities

    def fwd(x):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        return seg_probabilities(model.apply(vs, x, train=False), meta)

    if quantize == "int8":
        # int8 conv rewrite baked into the serialized program (W8A8 with
        # dynamic activation scales — eelunet_tpu/quantize.py)
        from eelunet_tpu.quantize import quantize_fn

        fwd = quantize_fn(fwd)
    elif quantize not in (None, "", "none"):
        raise ValueError(f"unknown quantize mode {quantize!r}; use 'int8'")

    @jax.jit
    def forward(u8):
        # weights enter as closure constants: baked into the artifact
        x = normalize_imagenet(u8.astype(jnp.float32) / 255.0, mean, std)
        return fwd(x)

    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted(set(int(b) for b in batch_sizes))
    for b in buckets:
        spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
        exp = jexport.export(forward, platforms=list(platforms))(spec)
        with open(os.path.join(out_dir, f"b{b}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(
            {
                "model": model_cfg.name,
                "image_size": [h, w],
                "batch_sizes": buckets,
                "platforms": list(platforms),
                "input": "uint8 (B,H,W,3); scale+ImageNet-normalize baked in",
                "output": "float32 probabilities (B,H,W,1)",
                "quantize": quantize or None,
            },
            f,
            indent=2,
        )
    return out_dir


class ExportedModel:
    """Runs a directory of serialized forwards; pads ragged batches up to
    the next exported bucket (rows discarded), like inference.Predictor."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, _META)) as f:
            self.meta = json.load(f)
        from jax import export as jexport

        self._fns = {}
        for b in self.meta["batch_sizes"]:
            with open(os.path.join(artifact_dir, f"b{b}.stablehlo"), "rb") as f:
                self._fns[b] = jexport.deserialize(f.read())

    def predict_proba(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images)
        if images.dtype != np.uint8:
            # The artifact bakes u8/255 + ImageNet-normalize into the
            # program; casting floats here would wrap negatives to ~255
            # and silently produce garbage.
            raise ValueError(
                f"exported artifacts take uint8 images, got {images.dtype}; "
                "pre-normalized float input needs the live Predictor"
            )
        b = int(images.shape[0])
        buckets = [k for k in sorted(self._fns) if k >= b]
        if not buckets:
            raise ValueError(
                f"batch {b} exceeds largest exported bucket "
                f"{max(self._fns)}; re-export with a larger batch_sizes"
            )
        target = buckets[0]
        if target != b:
            pad = np.zeros((target - b, *images.shape[1:]), np.uint8)
            images = np.concatenate([images, pad], axis=0)
        out = np.asarray(self._fns[target].call(images))
        return out[:b]
