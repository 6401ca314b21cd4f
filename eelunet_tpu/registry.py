"""Model registry and uniform output contract.

The reference dispatches on ``model.name`` string attributes with if-chains in
three places (train.py:62-84, evaluate.py:84-89, test.py:109-114). Here every
model returns a ``ModelOutput`` and carries static metadata, so workflows are
model-agnostic.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax.numpy as jnp


class ModelOutput(NamedTuple):
    """Uniform forward-pass result.

    seg: (B,H,W,1) segmentation map — probabilities if the model applies a
         final sigmoid (eelunet/egeunet/malunet), logits otherwise
         (unet/unet++/unext). ``ModelMeta.seg_is_logits`` records which.
    aux: deep-supervision maps, low->high resolution (empty for plain models).
    """

    seg: jnp.ndarray
    aux: Tuple[jnp.ndarray, ...] = ()


class ModelMeta(NamedTuple):
    name: str
    seg_is_logits: bool      # test.py:117-118 forgets sigmoid for logit models; we don't.
    has_aux: bool
    reference: str           # file:line citation into /root/reference


def _build(name):
    # Imports are deferred so `import eelunet_tpu` stays light.
    if name == "unet":
        from eelunet_tpu.models.unet import Unet
        return Unet
    if name == "eelunet":
        from eelunet_tpu.models.eelunet import EELUnet
        return EELUnet
    if name == "unet++":
        from eelunet_tpu.models.unetpp import UnetPlusPlus
        return UnetPlusPlus
    if name == "egeunet":
        from eelunet_tpu.models.egeunet import EGEUNet
        return EGEUNet
    if name == "malunet":
        from eelunet_tpu.models.malunet import MALUNet
        return MALUNet
    if name in ("unext", "unext_s"):
        from eelunet_tpu.models.unext import UNext, UNextS
        return UNext if name == "unext" else UNextS
    raise ValueError(f"Unsupported model type: {name!r}")


MODEL_REGISTRY: Dict[str, ModelMeta] = {
    "unet": ModelMeta("unet", True, False, "models/Unet.py:4-98"),
    "eelunet": ModelMeta("eelunet", False, True, "models/EELUnet.py:228-471"),
    "unet++": ModelMeta("unet++", True, False, "models/UnetPlusPlus.py:6-82 (repaired)"),
    "egeunet": ModelMeta("egeunet", False, True, "models/egeunet.py:217-391"),
    "unext": ModelMeta("unext", True, False, "models/unext.py:191-325"),
    "unext_s": ModelMeta("unext_s", True, False, "models/unext.py:328-462"),
    "malunet": ModelMeta("malunet", False, False, "models/malunet.py:198-324"),
}


def create_model(model_cfg) -> Tuple[Any, ModelMeta]:
    """Instantiate a flax module + metadata from a ModelConfig."""
    name = model_cfg.name
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unsupported model type: {name!r} (choices: {sorted(MODEL_REGISTRY)})")
    meta = MODEL_REGISTRY[name]
    cls = _build(name)
    dtype = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else jnp.float32

    slim_init = getattr(model_cfg, "slim_init", "")
    if slim_init:
        import json
        import os

        if name not in ("unet", "eelunet"):
            raise ValueError(f"slim_init supports unet/eelunet, not {name!r}")
        with open(os.path.join(slim_init, "widths.json")) as f:
            sidecar = json.load(f)
        widths = sidecar.get("widths", sidecar)
        if name == "eelunet":
            from eelunet_tpu.prune_physical import slim_eelunet

            model = slim_eelunet(
                widths,
                out_channels=model_cfg.out_channels,
                mask_range=model_cfg.fft_mask_range,
                dtype=dtype,
            )
        else:
            from eelunet_tpu.prune_physical import slim_unet

            model = slim_unet(widths, out_channels=model_cfg.out_channels, dtype=dtype)
        return model, meta

    if name in ("unet", "unet++"):
        model = cls(out_channels=model_cfg.out_channels, dtype=dtype)
    elif name == "eelunet":
        model = cls(
            out_channels=model_cfg.out_channels,
            mask_range=model_cfg.fft_mask_range,
            highpass_impl=getattr(model_cfg, "highpass_impl", "auto"),
            dtype=dtype,
        )
    elif name == "egeunet":
        model = cls(
            num_classes=model_cfg.out_channels,
            c_list=tuple(model_cfg.c_list),
            bridge=model_cfg.bridge,
            gt_ds=model_cfg.gt_ds,
            dtype=dtype,
        )
    elif name == "malunet":
        model = cls(
            num_classes=model_cfg.out_channels,
            c_list=tuple(model_cfg.c_list),
            split_att=model_cfg.split_att,
            bridge=model_cfg.bridge,
            dtype=dtype,
        )
    else:  # unext / unext_s
        model = cls(num_classes=model_cfg.out_channels, dtype=dtype)
    return model, meta


def seg_probabilities(output: ModelOutput, meta: ModelMeta) -> jnp.ndarray:
    """Segmentation probabilities regardless of the model's output convention.

    Single-channel logits get a sigmoid (binary); multi-channel logits get a
    softmax over the class axis (multi-class mode, out_channels > 1). Models
    that bake the activation in (seg_is_logits=False) apply the same rule
    internally."""
    import jax

    if not meta.seg_is_logits:
        return output.seg
    if output.seg.shape[-1] > 1:
        return jax.nn.softmax(output.seg, axis=-1)
    return jax.nn.sigmoid(output.seg)


def predict_probabilities(fwd, images: jnp.ndarray, tta: bool = False) -> jnp.ndarray:
    """Single entry point for probability prediction with optional flip TTA —
    serve/predict/evaluate all route through here so TTA semantics cannot
    diverge between surfaces. ``fwd``: images -> probabilities."""
    return tta_probabilities(fwd, images) if tta else fwd(images)


def tta_probabilities(fwd, images: jnp.ndarray) -> jnp.ndarray:
    """Flip test-time augmentation: average probabilities over the 4 H/W
    flip orientations, un-flipping each prediction back. A beyond-reference
    inference-time option (``TrainConfig.tta``) — 4x the forward FLOPs for a
    small accuracy gain; probabilities are averaged (not logits), the common
    segmentation-TTA convention. ``fwd``: (B,H,W,C) images -> (B,H,W,1)
    probabilities (NHWC; axes 1/2 are H/W)."""
    p = fwd(images)
    p = p + jnp.flip(fwd(jnp.flip(images, 1)), 1)
    p = p + jnp.flip(fwd(jnp.flip(images, 2)), 2)
    p = p + jnp.flip(fwd(jnp.flip(images, (1, 2))), (1, 2))
    return p / 4.0
