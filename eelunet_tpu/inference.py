"""Batch inference API — the library-level counterpart of cli/predict.py.

Loads a checkpoint once, compiles one forward executable per input shape, and
serves numpy-in / numpy-out batch prediction. This is the programmatic surface
a reference user of test.py (mask export) migrates to.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eelunet_tpu.config import ModelConfig, TrainConfig
from eelunet_tpu.registry import create_model, seg_probabilities


def _probs_to_mask(probs: np.ndarray, threshold: float) -> np.ndarray:
    """(B,H,W,C) probabilities -> (B,H,W,1) mask: thresholded binary for
    C == 1, argmax class ids for multi-class."""
    if probs.shape[-1] > 1:
        return np.argmax(probs, axis=-1)[..., None].astype(np.float32)
    return (probs > threshold).astype(np.float32)


class Predictor:
    def __init__(
        self,
        model_cfg: ModelConfig,
        checkpoint: Optional[str] = None,
        threshold: float = 0.5,
        bucket_batches: bool = True,
        normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
        normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
        mesh=None,
        tta: bool = False,
        quantize: Optional[str] = None,
        proba_wire_dtype: Optional[str] = "auto",
        fold_bn: Any = "auto",
    ):
        """``bucket_batches`` pads each batch up to a bucket size before the
        jitted forward and slices the outputs back, so serving traffic with
        ragged batch sizes shares a bounded set of executables instead of
        compiling one per distinct size (XLA recompiles per shape; a 512^2
        eelunet compile costs minutes through a remote compile service).
        Buckets are the next power of two up to 16, then the next multiple
        of 16 — bounding padding waste above 16 to <16 rows (a pure
        power-of-two rule would nearly double compute and peak HBM for a
        batch of 65). Padding rows are zeros; their outputs are discarded.
        Disable for fixed-batch pipelines or when every row's latency
        matters.

        ``quantize``: ``"int8"`` runs every dense conv as a W8A8 int8 MXU
        conv with dynamic activation scales (eelunet_tpu.quantize — 2x MAC
        throughput on int8-capable TPUs; small accuracy cost measured in
        tests/test_quantize.py and docs/PERF.md). ``None`` = dense dtype.

        ``proba_wire_dtype``: dtype of predict_proba's device->host transfer.
        ``"auto"`` (default) ships bfloat16 for bfloat16-compute models —
        their logits are already bf16, so f32 probabilities carry pseudo-
        precision, and halving the readback bytes matters on bandwidth-
        limited device links (~22 MB/s through the axon tunnel,
        docs/PERF.md serving section). The public contract is unchanged
        (predict_proba still RETURNS float32; the cast happens on the wire).
        f32-compute models always ship f32. Pin ``"float32"`` where
        bit-exact f32 sigmoid outputs matter, or ``"bfloat16"`` to force.

        ``mesh``: a `jax.sharding.Mesh` for multi-chip batch-parallel
        serving — params/BN stats replicate, batches shard over all mesh
        axes' 'data' dimension, and XLA runs each chip on its batch slice
        (buckets round up to multiples of the data-axis size so shards stay
        equal). Single-chip default when None."""
        self.model, self.meta = create_model(model_cfg)
        self.threshold = threshold
        self.bucket_batches = bucket_batches
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from eelunet_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._batch_sharding = batch_sharding(mesh)
            self._replicated = replicated_sharding(mesh)
            self._data_size = int(mesh.shape["data"])
        sample = jnp.zeros((1, 64, 64, model_cfg.in_channels), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(0), sample)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        # Eval-time BN folding (bnfold.py): conv-adjacent BN affines absorbed
        # into conv weights at load, BN ops compiled out — measured +4.8% on
        # the eelunet 512^2 b16 headline (docs/PERF.md round 5; exactness
        # pinned by tests/test_bnfold.py). "auto" folds the families with a
        # fold map; slim (physically pruned) checkpoints are left unfolded
        # (separate module path). fold_bn=False pins the unfolded graph.
        from eelunet_tpu.bnfold import FOLDABLE_MODELS

        self._model_name = model_cfg.name
        if fold_bn == "auto":
            self._fold_bn = model_cfg.name in FOLDABLE_MODELS
        else:
            self._fold_bn = bool(fold_bn)
            if self._fold_bn and model_cfg.name not in FOLDABLE_MODELS:
                raise ValueError(
                    f"fold_bn=True: no BN fold map for '{model_cfg.name}' "
                    f"(supported: {FOLDABLE_MODELS})")
        if checkpoint:
            self.load(checkpoint)
        elif self._fold_bn:
            self.commit(self._fold(self.params, self.batch_stats))
        if mesh is not None:
            self._replicate_weights()

        mean = tuple(normalize_mean)
        std = tuple(normalize_std)
        from eelunet_tpu.data.augment import normalize_imagenet

        if quantize not in (None, "", "none", "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}; use 'int8'")
        self.quantize = quantize if quantize in ("int8",) else None

        if proba_wire_dtype == "auto":
            self._proba_wire = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else None
        elif proba_wire_dtype in (None, "", "none", "float32"):
            self._proba_wire = None
        elif proba_wire_dtype in ("bfloat16", "bf16"):
            self._proba_wire = jnp.bfloat16
        else:
            raise ValueError(
                f"unknown proba_wire_dtype {proba_wire_dtype!r}; "
                "use 'auto', 'float32' or 'bfloat16'"
            )

        def _probs(params, batch_stats, images):
            if images.dtype == jnp.uint8:
                # uint8 serving input: scale + ImageNet-normalize on device
                # (4x fewer host->device bytes than pre-normalized f32; same
                # formula as the host path, docs/PERF.md epoch breakdown).
                images = normalize_imagenet(
                    images.astype(jnp.float32) / 255.0, mean, std
                )
            vs = {"params": params}
            if batch_stats:
                vs["batch_stats"] = batch_stats

            def fwd(x):
                return seg_probabilities(self.model.apply(vs, x, train=False), self.meta)

            if self.quantize == "int8":
                from eelunet_tpu.quantize import quantize_fn

                fwd = quantize_fn(fwd)

            # Flip TTA (TrainConfig.tta): mean probability over the 4 H/W
            # flip orientations — 4x forward FLOPs in one program.
            from eelunet_tpu.registry import predict_probabilities

            return predict_probabilities(fwd, images, tta=tta)

        @jax.jit
        def _forward(params, batch_stats, images):
            out = _probs(params, batch_stats, images)
            return out if self._proba_wire is None else out.astype(self._proba_wire)

        # ModelConfig is the canonical out_channels source (module attribute
        # names vary per family: unext uses num_classes).
        n_out = int(getattr(model_cfg, "out_channels", 1) or 1)
        self.out_channels = n_out

        @jax.jit
        def _forward_mask(params, batch_stats, images, threshold):
            # Device-side _probs_to_mask: threshold/argmax the f32
            # probabilities ON the device and ship 1 byte/pixel instead of
            # 4*C — the readback is the serving bottleneck on a
            # bandwidth-limited device link (docs/PERF.md serving section).
            probs = _probs(params, batch_stats, images)
            if n_out > 1:
                return jnp.argmax(probs, axis=-1)[..., None].astype(jnp.uint8)
            return (probs > threshold).astype(jnp.uint8)

        self._forward = _forward
        self._forward_mask = _forward_mask

    def _fold(self, params, batch_stats, replicate: bool = False):
        """Produce a (folded_model, params', batch_stats') staged tuple for
        ``commit`` — BN affines absorbed, BN entries stripped to match the
        ``bn_folded=True`` module structure."""
        from eelunet_tpu.bnfold import fold_bn_eval

        params, batch_stats, _n = fold_bn_eval(self._model_name, params, batch_stats)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        if replicate and self._batch_sharding is not None:
            params = jax.device_put(params, self._replicated)
            batch_stats = jax.device_put(batch_stats, self._replicated)
        # n=0 (unet: no BN) -> nothing stripped, keep the module as-is;
        # clone(bn_folded=True) is idempotent across hot reloads.
        model = self.model.clone(bn_folded=True) if _n else None
        return (model, params, batch_stats)

    def _replicate_weights(self):
        """One-time placement: weights live replicated on every mesh device
        so predict_proba never re-transfers them."""
        self.params = jax.device_put(self.params, self._replicated)
        self.batch_stats = jax.device_put(self.batch_stats, self._replicated)

    def load(self, checkpoint: str):
        """Restore weights (+BN stats) from an orbax checkpoint dir. Slim
        (physically pruned, prune_physical.save_slim) checkpoints are
        auto-detected and swap in the slimmed module; the jitted forward
        retraces on the new param structure."""
        self.commit(self.stage(checkpoint))

    def stage(self, checkpoint: str):
        """Phase 1 of a (hot) reload: read, deserialize and device-place a
        checkpoint WITHOUT touching the live weights — all the slow work
        (disk IO, orbax restore, mesh replication transfers) happens here,
        off the serving path. Returns an opaque handle for ``commit``."""
        import os

        import orbax.checkpoint as ocp

        from eelunet_tpu.prune_physical import is_slim_checkpoint, load_slim

        model = None
        if is_slim_checkpoint(checkpoint):
            model, params, batch_stats = load_slim(
                checkpoint,
                out_channels=getattr(self.model, "out_channels", 1),
                dtype=self.model.dtype,
            )
        else:
            from eelunet_tpu.train.checkpoint import warn_if_preformat

            warn_if_preformat(os.path.abspath(checkpoint), type(self.model).__name__.lower())
            tree = ocp.StandardCheckpointer().restore(os.path.abspath(checkpoint))
            params = tree["params"]
            batch_stats = tree["batch_stats"]
            if self._fold_bn:
                return self._fold(params, batch_stats, replicate=True)
        if self._batch_sharding is not None:
            params = jax.device_put(params, self._replicated)
            batch_stats = jax.device_put(batch_stats, self._replicated)
        return (model, params, batch_stats)

    def commit(self, staged):
        """Phase 2: pointer-swap the live weights — O(1), no IO. Callers that
        serve concurrently must serialize this with dispatches (the serving
        MicroBatcher's device lock); batches already dispatched keep their
        references to the old arrays and complete unaffected."""
        model, params, batch_stats = staged
        if model is not None:  # slim checkpoint: swap module; jit retraces
            self.model = model
        self.params = params
        self.batch_stats = batch_stats

    def _dispatch_program(self, program, images: np.ndarray, *extra):
        """Pad to the batch bucket, place on device(s), dispatch. Returns
        ``(device_out, b)`` WITHOUT forcing the readback — JAX dispatch is
        async, so the caller can overlap this batch's H2D + compute with the
        previous batch's device->host readback (double-buffered serving,
        docs/PERF.md serving section)."""
        b = int(images.shape[0])
        target = b
        if self.bucket_batches and b > 0:
            # power of two up to 16; multiples of 16 above (<16 rows waste)
            target = 1 << (b - 1).bit_length() if b <= 16 else -(-b // 16) * 16
        if self._batch_sharding is not None and target > 0:
            # equal per-chip shards on the mesh's data axis
            target = -(-target // self._data_size) * self._data_size
        if target != b:
            pad = np.zeros((target - b, *images.shape[1:]), dtype=images.dtype)
            images = np.concatenate([np.asarray(images), pad], axis=0)
        if self._batch_sharding is not None:
            x = jax.device_put(np.asarray(images), self._batch_sharding)
        else:
            x = jnp.asarray(images)
        return program(self.params, self.batch_stats, x, *extra), b

    def _run_program(self, program, images: np.ndarray, *extra) -> np.ndarray:
        out, b = self._dispatch_program(program, images, *extra)
        return np.asarray(out)[:b]

    # -- two-phase (dispatch/collect) API: used by serving's double-buffered
    #    micro-batcher to overlap batch N+1's transfers with batch N's
    #    readback. collect(dispatch_x(batch)) == predict_x(batch).

    def dispatch_proba(self, images: np.ndarray):
        out, b = self._dispatch_program(self._forward, np.asarray(images))
        return (out, b, "f32")

    def dispatch_mask_wire(self, images: np.ndarray,
                           threshold: Optional[float] = None):
        thr = np.float32(self.threshold if threshold is None else threshold)
        out, b = self._dispatch_program(self._forward_mask, np.asarray(images), thr)
        return (out, b, None)

    def collect(self, handle) -> np.ndarray:
        """Force the readback of a dispatch_* handle (blocks until the
        device batch is done) and apply the public-dtype contract."""
        out, b, post = handle
        arr = np.asarray(out)[:b]
        return arr.astype(np.float32, copy=False) if post == "f32" else arr

    def predict_proba(self, images: np.ndarray) -> np.ndarray:
        """(B,H,W,3) images -> (B,H,W,C) float32 probabilities. Accepts
        either ImageNet-normalized float32 or raw uint8 (scaled + normalized
        on device; preferred for serving — 4x smaller transfers). The
        device->host transfer dtype follows ``proba_wire_dtype``."""
        out = self._run_program(self._forward, np.asarray(images))
        return out.astype(np.float32, copy=False)

    def predict_mask_wire(
        self, images: np.ndarray, threshold: Optional[float] = None
    ) -> np.ndarray:
        """(B,H,W,3) images -> (B,H,W,1) uint8 masks computed ON DEVICE:
        {0,1} thresholded for binary models, argmax class ids in multi-class
        mode. Same values as ``_probs_to_mask(predict_proba(x))`` (both
        threshold/argmax the f32 probabilities), but the wire carries 1
        byte/pixel instead of 4*C — the difference between 9 and 20+ img/s
        through the ~22 MB/s axon tunnel (docs/PERF.md serving section)."""
        thr = np.float32(self.threshold if threshold is None else threshold)
        return self._run_program(self._forward_mask, np.asarray(images), thr)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Binary masks at the configured threshold; in multi-class mode
        (out_channels > 1) the argmax class-id map, shape (B,H,W,1).
        Runs the device-side mask program (uint8 wire), upcast to the
        float32 contract of the original host-side path."""
        return self.predict_mask_wire(images).astype(np.float32)

    def predict_proba_tiled(
        self,
        images: np.ndarray,
        tile: int = 512,
        overlap: int = 64,
        tiles_per_batch: int = 16,
    ) -> np.ndarray:
        """Sliding-window inference at NATIVE resolution.

        The reference downscales every image to the training size before
        predicting (test.py:48-51) — masks for large scans lose boundary
        detail. Here images of any size run through the fixed ``tile``-shaped
        forward as overlapping windows, blended with a separable linear ramp
        over the ``overlap`` margin (seam-free), so one compiled executable
        (plus batch buckets) serves every input resolution — XLA recompiles
        per shape, and a big-shape compile costs minutes through a remote
        compile service, so arbitrary-resolution retracing is the TPU
        anti-pattern this avoids. Peak HBM stays bounded by
        ``tiles_per_batch`` tiles regardless of image size.

        Windows at the right/bottom edge shift back inside the image (the
        standard shifted-last-window rule), so every pixel is covered at the
        model's trained scale. Accepts uint8 or normalized float32 like
        predict_proba; returns (B, H, W, 1) float32 probabilities.
        """
        if not 0 <= overlap < tile:
            raise ValueError(f"overlap {overlap} must be in [0, tile={tile})")
        images = np.asarray(images)
        b, h, w = images.shape[:3]
        # Images smaller than the tile in either dim: reflect-pad up, crop back.
        ph, pw = max(tile - h, 0), max(tile - w, 0)
        if ph or pw:
            images = np.pad(
                images, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect"
            )
        hp, wp = images.shape[1:3]

        stride = tile - overlap
        ys = self._tile_origins(hp, tile, stride)
        xs = self._tile_origins(wp, tile, stride)
        ramp = self._blend_window(tile, overlap)  # (tile, tile, 1) float32

        acc = None  # allocated after the first chunk (C = prob channels)
        wsum = np.zeros((hp, wp, 1), np.float32)
        tiles, origins = [], []
        for y in ys:
            for x in xs:
                wsum[y : y + tile, x : x + tile] += ramp
                for i in range(b):
                    tiles.append(images[i, y : y + tile, x : x + tile])
                    origins.append((i, y, x))
        for start in range(0, len(tiles), tiles_per_batch):
            chunk = np.stack(tiles[start : start + tiles_per_batch])
            probs = self.predict_proba(chunk)
            if acc is None:
                acc = np.zeros((b, hp, wp, probs.shape[-1]), np.float32)
            for (i, y, x), p in zip(origins[start : start + tiles_per_batch], probs):
                acc[i, y : y + tile, x : x + tile] += p * ramp
        return (acc / wsum)[:, :h, :w]

    def predict_tiled(self, images: np.ndarray, **kw) -> np.ndarray:
        """Masks from predict_proba_tiled: thresholded binary, or the argmax
        class-id map in multi-class mode."""
        return _probs_to_mask(self.predict_proba_tiled(images, **kw), self.threshold)

    @staticmethod
    def _tile_origins(size: int, tile: int, stride: int):
        if size <= tile:
            return [0]
        origins = list(range(0, size - tile + 1, stride))
        if origins[-1] != size - tile:
            origins.append(size - tile)
        return origins

    @staticmethod
    def _blend_window(tile: int, overlap: int) -> np.ndarray:
        """Separable blend weights: 1 in the tile interior, linearly ramping
        to ~0 over the overlap margin. Strictly positive everywhere (border
        tiles have no neighbor to hand off to; normalization by the weight
        sum keeps those regions exact)."""
        ramp1d = np.ones(tile, np.float32)
        if overlap > 0:
            edge = np.arange(1, overlap + 1, dtype=np.float32) / (overlap + 1)
            ramp1d[:overlap] = edge
            ramp1d[tile - overlap :] = edge[::-1]
        return (ramp1d[:, None] * ramp1d[None, :])[..., None]
