"""Pallas blocked 3x3 conv for shallow-channel full-res stencils.

Motivation (docs/PERF.md forward profile): the eelunet 512^2 forward is
floored by full-resolution shallow-channel convs — dec1's 3x3 128->64 alone
is 7.4 ms/batch-8, ~21% MXU utilization, while the tap-matmul roofline for
that shape is ~3.2 ms (9 accumulated (TH*W,128)@(128,64) MXU passes at the
N=64 half-lane ceiling) + ~1 ms of HBM traffic. XLA's conv emitter was
presumed near-optimal ("inherent <25%"); this kernel tests that presumption
directly — VERDICT r2 item 7.

Design (pallas_guide.md patterns; house style of ops/edge_pallas.py):
- Grid (B, H//TILE_H). The input is host-padded by 1 px (SAME), so every
  slab DMA is static-size: each program copies its (TILE_H+2, W+2, Cin)
  slab HBM->VMEM (overlapping windows can't be expressed as BlockSpec
  index maps), then accumulates the nine tap matmuls
  slab[dy:dy+TH, dx:dx+W] @ w[dy,dx] in f32 on the MXU.
- Cin rides the lane dimension; dx taps are sublane-offset slices (cheap
  vector shifts), dy taps are free row offsets.
- Optional fused per-channel scale/shift + ReLU (inference-folded BN) so a
  win would also eliminate the elementwise HBM round trip.

A/B harness: tools/conv3x3_ab.py (interleaved vs lax.conv_general_dilated).

VERDICT (measured on v5e, docs/PERF.md dead-ends + results/conv3x3_ab_512_r3
.json): XLA wins ~2x on both target shapes (128->64: 6.21 vs 12.01 ms;
64->64: 5.35 vs 12.16 ms; tile_h=32 exceeds the 16M scoped-VMEM limit).
The per-tap shifted-slab materialization dominates; XLA's emitter pipelines
DMA against compute. This module stays as a tested reference pattern and is
NOT wired into any model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, slab, sem, *,
                 tile_h, w, cin, cout, relu, out_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # The slab spans the full (8-aligned-padded) W so the HBM slice is
    # static-shape and sublane-aligned; taps only read the first w+2 cols.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile_h, tile_h + 2), :, :],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    acc = jnp.zeros((tile_h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = slab[dy:dy + tile_h, dx:dx + w, :].reshape(tile_h * w, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc * scale_ref[0] + shift_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(tile_h, w, cout).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_h", "interpret")
)
def conv3x3_pallas(x, w, scale=None, shift=None, *, relu=False, tile_h=16,
                   interpret=False):
    """SAME 3x3 stride-1 NHWC conv: (B,H,W,Cin) @ (3,3,Cin,Cout) [HWIO].

    ``scale``/``shift``: optional (Cout,) per-channel affine fused after the
    conv (a bias is shift alone; an inference-folded BN is both). ``relu``
    fuses the activation. f32 accumulation, output in x.dtype.
    """
    bsz, h, wdt, cin = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == cin, w.shape
    cout = w.shape[3]
    if h % tile_h:
        raise ValueError(f"H={h} not divisible by tile_h={tile_h}")
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((cout,), jnp.float32)

    # Mosaic requires HBM slice shapes 8-aligned along the sublane (W) dim;
    # pad W+2 up to a multiple of 8 (the extra right-margin cols are dead).
    wpad = -(-(wdt + 2) // 8) * 8
    # ...and lane-tile-aligned (128) along the minor (channel) dim: a manual
    # DMA slice of a Cin=64 HBM memref is rejected ("Slice shape along
    # dimension 3 must be aligned to tiling (128)", measured on v5e). Zero-
    # padding Cin keeps the tap matmuls exact (zero weight rows) but DOUBLES
    # the slab HBM traffic at Cin=64 — recorded as part of the dead-end
    # analysis in docs/PERF.md.
    cpad = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - wdt - 1), (0, cpad - cin)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    kern = functools.partial(
        _conv_kernel, tile_h=tile_h, w=wdt, cin=cpad, cout=cout, relu=relu,
        out_dtype=x.dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, sliced by DMA
            pl.BlockSpec((3, 3, cpad, cout), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wdt, cout),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wpad, cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, wp, scale.astype(jnp.float32).reshape(1, cout),
      shift.astype(jnp.float32).reshape(1, cout))


def conv3x3_reference(x, w, scale=None, shift=None, *, relu=False):
    """XLA oracle for the kernel (same contract)."""
    cout = w.shape[3]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if scale is not None:
        y = y * scale.reshape(1, 1, 1, cout)
    if shift is not None:
        y = y + shift.reshape(1, 1, 1, cout)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
