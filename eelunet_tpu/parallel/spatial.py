"""Spatial (H-axis) sharding with halo exchange — the framework's
"long-context" mode (SURVEY.md §5).

The reference has no sequence/context parallelism (nothing to port); the
spatial analog for scaling *resolution* beyond one chip's HBM is to shard the
image height across a mesh axis and exchange 1-row halos for stencil ops:

- ``halo_exchange``: pad each shard with its neighbors' boundary rows via
  ``lax.ppermute`` (rides ICI on a real pod).
- ``sharded_stencil``: run any stencil fn (e.g. the Canny pipeline) over an
  H-sharded batch under ``shard_map``, exchanging ``halo`` rows once.
- global-receptive-field ops (FFT high-pass, global average pooling) need an
  all-gather / psum respectively; helpers below.

For full MODEL forwards, ``spatial_forward`` below shows the idiomatic route:
a single H-sharding annotation + jit, letting XLA's SPMD partitioner insert
the halos/collectives (verified ~1e-7 vs unsharded for every model family).
The manual primitives here serve pipelines running outside a model jit.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad an H-shard (N, H_local, W, C) with ``halo`` rows from each
    neighbor along ``axis_name``. Edge shards get zero rows (matching the
    zero-padding convention of the conv/NMS stages)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:, :halo]        # my first rows -> previous neighbor's bottom halo
    bot_rows = x[:, -halo:]       # my last rows  -> next neighbor's top halo

    # ppermute: send my bottom rows to the next shard (they become its top halo)
    from_prev = jax.lax.ppermute(bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])

    zero = jnp.zeros_like(from_prev)
    top_halo = jnp.where(idx == 0, zero, from_prev)
    bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def sharded_stencil(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    halo: int,
    axis_name: str = "data",
):
    """Wrap a stencil fn to run over H-sharded input on ``mesh``.

    ``fn`` must be shift-invariant with receptive-field radius <= ``halo``
    and preserve H (e.g. blur/sobel/NMS chains). Each shard computes on its
    halo-extended slab and crops the halo back off.

    Border note: within ``halo`` rows of the TRUE image top/bottom, a
    multi-stage ``fn`` that re-masks at each stage (the Canny chain) sees
    zero-VALUED halo rows instead of per-stage zero-PADDING — intermediate
    stages may differ there from the unsharded op. Interior rows (>= halo
    from the image edge) are exact; content at the image border of a
    segmentation mask is rare by construction.
    """

    def local(x):
        ext = halo_exchange(x, halo, axis_name)
        out = fn(ext)
        return out[:, halo:-halo]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
        # pallas_call out_shapes carry no varying-mesh-axes metadata; the
        # specs above already pin the only sharded axis.
        check_vma=False,
    )


def sharded_canny(
    mesh: Mesh,
    axis_name: str = "data",
    low: float = 0.2,
    high: float = 0.8,
    use_pallas: bool = False,
):
    """H-sharded Canny (blur+sobel+NMS radius: 2+1+1 = 4 rows of halo).

    This is the ``canny_edge`` variant (weak edges kept unconditionally, no
    hysteresis stage). For true hysteresis multi-device, see
    ``sharded_canny_improve`` / ``sharded_hysteresis`` below — the fixpoint
    runs under shard_map with a 1-row halo exchange per dilation step.

    ``use_pallas=True`` runs the fused Pallas kernel (ops/edge_pallas.py,
    9-24x over the XLA chain) inside each shard: the halo exchange provides
    the cross-shard rows via ``ppermute``, then the kernel's own zero-fill
    shifts see a locally-complete slab. Kernels compose with shard_map — each
    device runs its own pallas_call on its local block.
    """
    from eelunet_tpu.ops.edge import gaussian_blur, non_max_suppression, _grad_mag_angle

    if use_pallas:
        from eelunet_tpu.ops.edge_pallas import fused_canny_auto

        def stencil(x):
            return fused_canny_auto(x, low_threshold=low, high_threshold=high)

    else:

        def stencil(x):
            b = gaussian_blur(x)
            mag, ang = _grad_mag_angle(b, reflect_pad=False, angle_eps=0.0)
            nms = non_max_suppression(mag, ang)
            return (nms >= low).astype(x.dtype)

    return sharded_stencil(stencil, mesh, halo=4, axis_name=axis_name)


def sharded_hysteresis(mesh: Mesh, axis_name: str = "data", max_iters: int = 0):
    """Hysteresis thresholding under shard_map: one 3x3 dilation + 1-row halo
    exchange per iteration (reference fixpoint loop, tools.py:402-419;
    unsharded equivalent ops/edge.hysteresis_thresholding).

    ``max_iters=0`` runs to the GLOBAL fixpoint — each iteration psums a
    convergence flag across shards, so growth chains that cross shard
    boundaries keep propagating until no shard changes. ``max_iters=K`` runs
    exactly K dilation steps (the fixed-cost variant). Both are EXACT equals
    of the unsharded op everywhere, including image borders: the hysteresis
    recurrence is a pure zero-padded dilation chain, and ``halo_exchange``
    feeds edge shards zero rows — identical semantics (unlike the blur/sobel
    stages, whose border caveat is documented on ``sharded_stencil``).
    """

    def local(strong, weak):
        s = strong > 0.5
        w = weak > 0.5

        def dilate_step(sb):
            ext = halo_exchange(sb.astype(jnp.float32), 1, axis_name)
            d = jax.lax.reduce_window(
                ext, 0.0, jax.lax.max,
                (1, 3, 3, 1), (1, 1, 1, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
            return sb | ((d[:, 1:-1] > 0) & w)

        if max_iters > 0:
            out = jax.lax.fori_loop(0, max_iters, lambda _, sb: dilate_step(sb), s)
        else:
            def cond(state):
                return state[1]

            def body(state):
                sb, _ = state
                nb = dilate_step(sb)
                changed = jax.lax.psum(jnp.any(nb != sb).astype(jnp.int32), axis_name) > 0
                return nb, changed

            out, _ = jax.lax.while_loop(cond, body, (s, jnp.asarray(True)))
        return out.astype(strong.dtype)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 2,
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )


def sharded_canny_improve(
    mesh: Mesh,
    axis_name: str = "data",
    low: float = 0.2,
    high: float = 0.7,
    max_iters: int = 0,
):
    """Full ``canny_edge_improve`` pipeline H-sharded: the stencil stages
    (blur/sobel/NMS, halo=4) under one shard_map, pointwise double threshold,
    then ``sharded_hysteresis`` with per-iteration 1-row halos — closing the
    round-1 gap where hysteresis couldn't run multi-device at all.

    Same border caveat as ``sharded_stencil`` for the stencil stages (rows
    within 4 of the true image top/bottom on reflect-padded sobel); the
    hysteresis stage itself is exact everywhere. (The fused Pallas kernel is
    not offered here: it implements the zero-pad ``canny_edge`` variant with
    unconditional weak edges, not the reflect-padded improve chain.)
    """
    from eelunet_tpu.ops.edge import _grad_mag_angle, gaussian_blur, non_max_suppression

    def stencil(x):
        b = gaussian_blur(x)
        mag, ang = _grad_mag_angle(b, reflect_pad=True, angle_eps=1e-6)
        return non_max_suppression(mag, ang)

    nms_fn = sharded_stencil(stencil, mesh, halo=4, axis_name=axis_name)
    hyst = sharded_hysteresis(mesh, axis_name, max_iters)

    def run(x):
        nms = nms_fn(x)
        strong = (nms >= high).astype(x.dtype)
        weak = ((nms >= low) & (nms < high)).astype(x.dtype)
        return hyst(strong, weak)

    return run


def spatial_global_pool(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Global average pool over an H-sharded tensor: local mean + psum."""
    local_sum = jnp.sum(x, axis=(1, 2), keepdims=True)
    local_n = x.shape[1] * x.shape[2]
    total = jax.lax.psum(local_sum, axis_name)
    n = jax.lax.psum(jnp.asarray(local_n, x.dtype), axis_name)
    return total / n


def spatial_all_gather_h(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Materialize the full-H tensor on every shard (for FFT high-pass)."""
    return jax.lax.all_gather(x, axis_name, axis=1, tiled=True)


def spatial_forward(model, variables, images, mesh: Mesh, axis_name: str = "data", train: bool = False):
    """Model forward with the image HEIGHT sharded across ``axis_name`` —
    the full spatial-parallel mode for resolutions that exceed one chip.

    No manual halo code: annotating the input with an H-sharding and jitting
    lets XLA's SPMD partitioner insert conv halo exchanges, pooling psums and
    matmul collectives automatically. Verified to ~1e-7 against unsharded
    execution for every model family, including MALUNet's global pools /
    external attention and EELUnet's (low-rank-matmul) FFT high-pass — one
    reason the high-pass is formulated as matmuls rather than FFTs, which
    would force an explicit gather.

    The manual ``sharded_stencil``/``halo_exchange`` path above remains for
    pre/post-processing pipelines that run outside a model jit.
    """
    h_shard = NamedSharding(mesh, P(None, axis_name, None, None))
    rep = NamedSharding(mesh, P())
    images = jax.device_put(images, h_shard)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def fwd(vs, im):
        return model.apply(vs, im, train=train)

    return fwd(variables, images)
