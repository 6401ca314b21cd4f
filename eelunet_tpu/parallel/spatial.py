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

    The double-threshold stage is pointwise; hysteresis is intentionally not
    run under shard_map (its fixpoint is global) — use the fixed-iteration
    variant on the gathered result if needed.

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
