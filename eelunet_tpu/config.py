"""Configuration dataclasses.

The reference scatters its effective hyperparameters between argparse flags and
hardcoded code edits (criterion choice train.py:299-307, optimizer 310-312,
scheduler 315, image size 250, normalization ToothDataset.py:60, the unused
--lambda_edge flag). Here every one of those is a first-class config field with
JSON round-tripping and CLI overrides.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass
class DataConfig:
    """Dataset + input-pipeline configuration (reference data/ToothDataset.py)."""

    data_dir: str = "data/tooth"
    image_size: Tuple[int, int] = (256, 256)          # train.py:250
    batch_size: int = 8                               # train.py:227
    val_fraction: float = 0.1                         # train.py:256-259 (90/10 split)
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)  # ToothDataset.py:60
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    num_workers: int = 4          # reference uses a single-process DataLoader (train.py:261)
    prefetch_depth: int = 2       # double-buffered host->HBM prefetch
    shuffle_buffer: int = 0       # 0 = full-epoch permutation shuffle
    # Optional on-device augmentations (off by default, as in ToothDataset.py:52-55)
    add_canny_edge: bool = False  # augmentation/AddCannyEdge.py
    canny_enhance: bool = False   # augmentation/CannyEnhance.py
    canny_enhance_alpha: float = 0.2
    # Per-sample random H/V flips of (image, mask) inside the jitted train
    # step — beyond-reference (its transform is Resize+ToTensor only,
    # train.py:249-252); deterministic per (rng, step), exactly resumable.
    random_flip: bool = False
    drop_remainder: bool = True   # static shapes for jit
    packed: bool = False          # data_dir points at a cli.pack output (memmaps)
    # Ship uint8 batches to the device and scale/normalize there (4x fewer
    # host->device bytes; the jitted preprocess computes the host formula
    # u8/255 -> (x-mean)/std, matching to f32 rounding, <=1e-6 via fma
    # fusion). Measured on the axon tunnel: H2D streaming dominates epoch
    # overhead at 256^2 (docs/PERF.md epoch breakdown).
    uint8_feed: bool = True
    # Upload the whole dataset to device HBM once and gather batches on
    # device — per-epoch H2D drops to index bytes. The 512^2 wall on the
    # axon tunnel is H2D bandwidth even with uint8_feed (docs/PERF.md);
    # reference-scale segmentation sets fit HBM easily. Single-host only.
    device_cache: bool = False
    device_cache_max_gb: float = 4.0

    def __post_init__(self):
        # Accept a bare int (e.g. --set data.image_size=64) as square size;
        # every consumer expects an (H, W) tuple.
        if isinstance(self.image_size, int):
            self.image_size = (self.image_size, self.image_size)
        elif self.image_size is not None:
            self.image_size = tuple(self.image_size)


@dataclass
class ModelConfig:
    """Model selection + architecture knobs."""

    name: str = "eelunet"
    in_channels: int = 3
    out_channels: int = 1
    # EGE-UNet / MALUNet channel list (egeunet.py:219, malunet.py:199)
    c_list: Tuple[int, ...] = (8, 16, 24, 32, 48, 64)
    bridge: bool = True
    gt_ds: bool = True
    split_att: str = "fc"
    # EELUnet FFT high-pass mask half-width (EELUnet.py:145)
    fft_mask_range: int = 20
    # High-pass implementation: "auto" (Pallas on TPU bf16, XLA otherwise),
    # "pallas", or "lowrank" (pin XLA — required for activation-sharded runs).
    highpass_impl: str = "auto"
    # Path to a slim checkpoint (cli.prune --physical output): builds the
    # physically pruned module from its widths.json and initializes training
    # from its weights — finetuning the slim model directly runs the same
    # trajectory as masked finetuning (slice is bit-exact) at slim-model
    # speed. unet/eelunet only.
    slim_init: str = ""
    # Compute dtype for the forward pass ("float32" or "bfloat16"); params stay f32.
    dtype: str = "float32"

    def __post_init__(self):
        # Shell-friendly aliases for the registry's canonical "unet++"
        # (a bare `unetpp` otherwise fails only at Trainer construction —
        # which silently dropped the family from a sweep once).
        self.name = {"unetpp": "unet++", "unetplusplus": "unet++"}.get(
            self.name, self.name)


@dataclass
class LossConfig:
    """Loss selection (reference utils/Loss.py; criterion chosen at train.py:305)."""

    name: str = "auto"   # auto: edge_bce_dice for eelunet, gt_bce_dice for egeunet, bce_dice otherwise
    wb: float = 1.0
    wd: float = 1.0
    lambda_edge: float = 1.0  # parsed-but-unused in the reference (train.py:231); honored here
                              # as a multiplier on the deep-supervision term.


@dataclass
class OptimizerConfig:
    """Adam + StepLR (reference train.py:312,315)."""

    name: str = "adam"
    lr: float = 1e-4
    weight_decay: float = 1e-5
    lr_schedule: str = "step"
    lr_step_size: int = 30    # StepLR(step_size=30, gamma=0.5)
    lr_gamma: float = 0.5
    grad_clip_norm: float = 0.0  # 0 = off (reference has no clipping)
    ema_decay: float = 0.0    # >0 keeps an EMA of params updated per step
                              # (e.g. 0.999); fit saves it as the weights-only
                              # '{name}_ema' tag for cli.evaluate/predict.
                              # Beyond-reference; 0 = off.


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    The reference is single-device (train.py:236). Here the default is 1D data
    parallelism; `model_axis > 1` additionally shards the widest dense/conv
    kernels (tensor parallelism); `spatial_axis > 1` enables H-sharded
    (halo-exchange) evaluation for large resolutions.
    """

    data_axis: int = -1     # -1 = all available devices
    model_axis: int = 1
    spatial_axis: int = 1


@dataclass
class TrainConfig:
    """Top-level training configuration (reference train.py argparse + hardcoded)."""

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    epochs: int = 100                 # train.py:226; TOTAL target: a resumed
                                      # run continues to this epoch count
    seed: Optional[int] = None        # train.py:232; None -> random like set_seed (train.py:24-33)
    save_dir: str = "checkpoints"     # train.py:229
    log_dir: str = "runs"             # train.py:230
    snapshot_every: int = 10          # periodic ckpt (train.py:195-197)
    keep_snapshots: int = 0           # retain only the newest N epoch_N full
                                      # snapshots (0 = keep all, the
                                      # reference's unbounded policy); best
                                      # tags and 'last' are never pruned
    eval_every: int = 1               # full test-set eval per epoch (train.py:127)
    threshold: float = 0.5            # binarization threshold (evaluate.py:92)
    tta: bool = False                 # flip test-time augmentation at eval /
                                      # predict / serve: average probabilities
                                      # over the 4 H/W flip orientations
                                      # (4x forward FLOPs; beyond-reference)
    remat: bool = False               # jax.checkpoint the forward in train_step
                                      # (trade FLOPs for HBM at large batch/res)
    accum_steps: int = 1              # gradient accumulation: micro-batches per
                                      # optimizer step (peak activation HBM scales
                                      # with batch_size/accum_steps; batch_size
                                      # must be divisible by it)
    donate_buffers: bool = True
    skip_nonfinite_updates: bool = False  # guard each optimizer step on device:
                                      # a non-finite loss or gradient reverts
                                      # the whole update (params/moments/BN/EMA)
                                      # via a predicated select — no host sync;
                                      # skipped counts are logged per epoch.
                                      # Off = reference behavior (a NaN batch
                                      # silently poisons the model).
    async_checkpoint: bool = True     # overlap checkpoint writes with the next
                                      # epoch's compute: saves snapshot the
                                      # state on device (compiled copy) and a
                                      # background worker pays the device->host
                                      # fetch + orbax write — the dominant
                                      # per-epoch cost on tunnel rigs
                                      # (docs/PERF.md). Single-process only
                                      # (multihost saves stay synchronous).
    profile_steps: int = 0            # trace this many train steps (skipping the
                                      # compile step) with jax.profiler into
                                      # log_dir/<model>/profile — TB-viewable
                                      # xplane dump (SURVEY.md §5 tracing)
    log_every_steps: int = 50
    resume_from: str = ""             # checkpoint dir ("auto" = newest) to resume
                                      # the full train state from; continuation is
                                      # EXACT: same batch order, flip RNG, schedule
                                      # and best-tag marks as the uninterrupted run
    compile_cache: str = "auto"       # persistent XLA compilation cache directory:
                                      # "auto" -> $EELUNET_COMPILE_CACHE or
                                      # ~/.cache/eelunet_tpu/xla; "" disables
                                      # (utils/compile_cache.py)


def _to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: _to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [_to_dict(v) for v in cfg]
    return cfg


def _from_dict(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) or (isinstance(f.type, type) and dataclasses.is_dataclass(f.type)):
            kwargs[f.name] = _from_dict(f.type, v)
        elif f.name in _NESTED:
            kwargs[f.name] = _from_dict(_NESTED[f.name], v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    "data": DataConfig,
    "model": ModelConfig,
    "loss": LossConfig,
    "optimizer": OptimizerConfig,
    "mesh": MeshConfig,
}


def config_to_json(cfg: TrainConfig) -> str:
    return json.dumps(_to_dict(cfg), indent=2)


def config_from_json(s: str) -> TrainConfig:
    return _from_dict(TrainConfig, json.loads(s))


def apply_overrides(cfg: TrainConfig, overrides: Sequence[str]) -> TrainConfig:
    """Apply ``a.b.c=value`` style overrides (values parsed as JSON when possible)."""
    d = _to_dict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must look like key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        node = d
        parts = key.split(".")
        for p in parts[:-1]:
            if not isinstance(node, dict) or p not in node:
                raise KeyError(f"unknown config key: {key}")
            node = node[p]
        if not isinstance(node, dict) or parts[-1] not in node:
            raise KeyError(f"unknown config key: {key}")
        node[parts[-1]] = val
    return _from_dict(TrainConfig, d)
