"""Pallas TPU kernels for the FFT high-pass filter (HighFourierTransform,
reference EELUnet.py:144-191).

Same math as ``ops/fft.high_pass_fft_lowrank`` (see that module for the
low-rank identity), restructured so the two full-resolution passes never
leave VMEM between the matmul and the elementwise work:

  kernel 1 (contract): stream x in (Th x WCt) tiles, accumulate the complex
      row-spectrum T = V_H @ X (K x W*C per batch element) in f32 directly in
      the output block — one read of x, one tiny write.
  XLA middle: contract/expand the W axis on the skinny T (K = padded 2m rows,
      ~50x smaller than x) — four small einsums, never full-res.
  kernel 2 (expand): stream x again, compute the complex low-pass rows
      U_H @ S on the fly and fuse residual + |.| into the same tile —
      one read of x + S, one write of the result.

vs. the XLA low-rank path this removes the f32 ``lr/li`` full-resolution
intermediates (2 writes + 2 reads of 4-byte data per call) and every
fusion-seam relayout around the skinny einsums, which profiling showed cost
more than the matmul FLOPs (docs/PERF.md ablation).

Gradients: ``high_pass_fft_pallas`` carries a custom VJP. The backward is the
analytic adjoint of the low-rank operator on the saved skinny spectrum S
(``_highpass_bwd_impl`` documents the math) and, like the forward, runs as a
Pallas kernel pair when the shape tiles cleanly:

  kernel B1 (contract): stream x and g, rebuild the low-pass tile from S on
      the fly, form u = g.z/|z| in-register, write u's real part once, and
      accumulate the skinny T = U_H^T conj(u) in the same pass (u's imaginary
      part never leaves VMEM).
  XLA middle: the same four skinny W-axis einsums as the forward transpose.
  kernel B2 (expand): dx = Re(u) - V_H^T rows, streamed, one write.

The XLA analytic adjoint (einsum chain) remains as ``_highpass_bwd_impl`` —
the golden path for tests and the fallback for untiled shapes. Measured at
512^2 batch 8 bf16 training: the XLA adjoint's full-res einsums hit layout
seams (277.8 ms/step vs 263.2 for lowrank-everywhere, docs/PERF.md); the
kernel pair removes those seams and the f32 full-res intermediates.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

from eelunet_tpu.ops.fft import _axis_factors, high_pass_fft_lowrank

_LANE = 128
_EPS = 1e-24  # clamped-sqrt floor, matches high_pass_fft_lowrank


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=32)
def _padded_factors(n: int, m: int, k: int):
    """Axis factors zero-padded from 2m to k rows/cols (tile alignment).

    Padding adds zero frequencies: U's extra columns are zero, so the padded
    product U @ V is exactly the unpadded operator.
    """
    ur, ui, vr, vi = _axis_factors(n, m)
    pad = k - ur.shape[1]
    ur = np.pad(ur, ((0, 0), (0, pad)))
    ui = np.pad(ui, ((0, 0), (0, pad)))
    vr = np.pad(vr, ((0, pad), (0, 0)))
    vi = np.pad(vi, ((0, pad), (0, 0)))
    return ur, ui, vr, vi


def _pick_tile(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def pallas_supported(shape) -> bool:
    """True if (B,H,W,C) tiles cleanly for the Pallas path."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    wc = w * c
    return (
        h >= 8
        and _pick_tile(h, (64, 32, 16, 8)) > 0
        and _pick_tile(wc, (4096, 2048, 1024, 512, 256, 128)) > 0
    )


# --- kernel 1: T[b] = V_H @ x[b], accumulated over H tiles -------------------
# V is passed TRANSPOSED as (H, K): Mosaic requires a block's last dim to be
# 128-divisible or span the array, which (K, Th) slices violate. Contracting
# dim 0 of both operands gives the same (K, WCt) product.
_DN_T = (((0,), (0,)), ((), ()))


def _contract_kernel(vrt_ref, vit_ref, x_ref, tr_ref, ti_ref):
    ht = pl.program_id(2)

    @pl.when(ht == 0)
    def _():
        tr_ref[0] = jnp.zeros_like(tr_ref[0])
        ti_ref[0] = jnp.zeros_like(ti_ref[0])

    xt = x_ref[0]  # (Th, WCt)
    tr_ref[0] += jax.lax.dot_general(
        vrt_ref[:], xt, _DN_T, preferred_element_type=jnp.float32
    )
    ti_ref[0] += jax.lax.dot_general(
        vit_ref[:], xt, _DN_T, preferred_element_type=jnp.float32
    )


# 4D-operand variants (default where eligible; see use_4d in _fwd_core):
# consume x/out as (B,H,W,C) blocks instead of pre-reshaped (B,H,W*C). The
# (th,wt,c) VMEM block is byte-identical to (th,wt*c) (c is minor), so the
# reshape inside the kernel is free — dropping the XLA-level reshape around
# the custom call removes the operand/result relayout copies the profile
# attributes ~3.5-4.5 ms/iter to (docs/PERF.md forward profile).
def _contract_kernel_4d(vrt_ref, vit_ref, x_ref, tr_ref, ti_ref):
    ht = pl.program_id(2)

    @pl.when(ht == 0)
    def _():
        tr_ref[0] = jnp.zeros_like(tr_ref[0])
        ti_ref[0] = jnp.zeros_like(ti_ref[0])

    blk = x_ref[0]  # (Th, Wt, C)
    xt = blk.reshape(blk.shape[0], blk.shape[1] * blk.shape[2])
    tr_ref[0] += jax.lax.dot_general(
        vrt_ref[:], xt, _DN_T, preferred_element_type=jnp.float32
    )
    ti_ref[0] += jax.lax.dot_general(
        vit_ref[:], xt, _DN_T, preferred_element_type=jnp.float32
    )


def _expand_kernel_4d(ur_ref, ui_ref, sr_ref, si_ref, x_ref, out_ref):
    ur = ur_ref[:]
    ui = ui_ref[:]
    sr = sr_ref[0]
    si = si_ref[0]
    lr = jnp.dot(ur, sr, preferred_element_type=jnp.float32) - jnp.dot(
        ui, si, preferred_element_type=jnp.float32
    )
    li = jnp.dot(ur, si, preferred_element_type=jnp.float32) + jnp.dot(
        ui, sr, preferred_element_type=jnp.float32
    )
    blk = x_ref[0]  # (Th, Wt, C)
    xt = blk.reshape(blk.shape[0], blk.shape[1] * blk.shape[2])
    zr = xt.astype(jnp.float32) - lr
    sq = zr * zr + li * li
    out = jnp.sqrt(jnp.maximum(sq, _EPS)).astype(out_ref.dtype)
    out_ref[0] = out.reshape(blk.shape)


# --- kernel 2: out = |x - U_H @ S|, fused per tile ---------------------------
def _expand_kernel(ur_ref, ui_ref, sr_ref, si_ref, x_ref, out_ref):
    ur = ur_ref[:]  # (Th, K)
    ui = ui_ref[:]
    sr = sr_ref[0]  # (K, WCt) f32
    si = si_ref[0]
    lr = jnp.dot(ur, sr, preferred_element_type=jnp.float32) - jnp.dot(
        ui, si, preferred_element_type=jnp.float32
    )
    li = jnp.dot(ur, si, preferred_element_type=jnp.float32) + jnp.dot(
        ui, sr, preferred_element_type=jnp.float32
    )
    zr = x_ref[0].astype(jnp.float32) - lr
    sq = zr * zr + li * li
    out_ref[0] = jnp.sqrt(jnp.maximum(sq, _EPS)).astype(out_ref.dtype)


def _fwd_factor_args(x: jnp.ndarray, mask_range: int):
    """Factor matrices for ``_fwd_core`` as ARRAYS (not trace constants):
    the custom_partitioning sharded path requires a const-free jaxpr, so
    every array the core touches must be an operand."""
    _, h, w, c = x.shape
    m = min(mask_range, h // 2, w // 2)  # joint clamp (EELUnet.py:155-157)
    k = max(_round_up(2 * m, 16), 16)
    uhr, uhi, vhr, vhi = _padded_factors(h, m, k)
    uwr, uwi, vwr, vwi = _padded_factors(w, m, k)
    cdt = x.dtype  # contract matmuls run in the model dtype, f32 accumulation
    return (
        jnp.asarray(np.ascontiguousarray(vhr.T), cdt),   # (H, K)
        jnp.asarray(np.ascontiguousarray(vhi.T), cdt),
        jnp.asarray(uhr, jnp.float32),                   # (H, K)
        jnp.asarray(uhi, jnp.float32),
        jnp.asarray(uwr, jnp.float32),                   # (W, K)
        jnp.asarray(uwi, jnp.float32),
        jnp.asarray(vwr, jnp.float32),                   # (K, W)
        jnp.asarray(vwi, jnp.float32),
    )


def _fwd_core(x, vhr_t, vhi_t, uhr, uhi, uwr, uwi, vwr, vwi,
              mask_range: int, interpret: bool):
    """Kernel-pair forward on explicit factor operands. Returns
    (out, s_r, s_i): the result plus the skinny complex row spectrum S
    (B, K, W*C) such that lowpass(x) = U_H @ S — saved as the VJP residual
    so the backward never recomputes the x contraction."""
    b, h, w, c = x.shape
    m = min(mask_range, h // 2, w // 2)
    k = max(_round_up(2 * m, 16), 16)
    wc = w * c
    # WCt capped at 4096: the expand kernel holds 2 double-buffered f32 S
    # blocks + x/out tiles + f32 matmul temporaries; 8192 lanes blows the
    # 16MB scoped-VMEM limit (measured: 19.03M requested).
    th = _pick_tile(h, (64, 32, 16, 8))
    wct = _pick_tile(wc, (4096, 2048, 1024, 512, 256, 128))
    if th == 0 or wct == 0:
        raise ValueError(f"unsupported shape for Pallas high-pass: {x.shape}")
    n_ht, n_wc = h // th, wc // wct

    import os

    # 4D-operand path (default on where eligible; EELUNET_HP4D=0 disables):
    # c must be lane-aligned (128-divisible) because Mosaic cannot collapse a
    # sub-lane-packed minor dim ((th,wt,64)->(th,wt*64) reshape is rejected).
    # Measured (3 interleaved repeats, docs/PERF.md): -12.5% at the eligible
    # (8,256,256,128) call site, exact fallback elsewhere.
    use_4d = (
        os.environ.get("EELUNET_HP4D") != "0"
        and c % _LANE == 0
        and wct % c == 0
        and w % (wct // c) == 0
    )
    wt = wct // c if use_4d else 0

    if use_4d:
        x_spec = pl.BlockSpec(
            (1, th, wt, c), lambda bi, wi, hi: (bi, hi, wi, 0), memory_space=pltpu.VMEM
        )
        x_arg = x
        contract_kernel = _contract_kernel_4d
    else:
        x_spec = pl.BlockSpec(
            (1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM
        )
        x_arg = x.reshape(b, h, wc)
        contract_kernel = _contract_kernel

    tr, ti = pl.pallas_call(
        contract_kernel,
        grid=(b, n_wc, n_ht),
        in_specs=[
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k, wc), jnp.float32),
            jax.ShapeDtypeStruct((b, k, wc), jnp.float32),
        ),
        interpret=interpret,
    )(vhr_t, vhi_t, x_arg)

    # --- XLA middle on the skinny T: contract then expand the W axis -------
    # T is (B, K, W, C); all four einsums touch K-row data only (~2% of x).
    prec = jax.lax.Precision.HIGHEST
    tr4 = tr.reshape(b, k, w, c)
    ti4 = ti.reshape(b, k, w, c)

    def ein(eq, a, t):
        return jnp.einsum(eq, a, t, precision=prec)

    core_r = ein("lw,bkwc->bklc", vwr, tr4) - ein("lw,bkwc->bklc", vwi, ti4)
    core_i = ein("lw,bkwc->bklc", vwr, ti4) + ein("lw,bkwc->bklc", vwi, tr4)
    s_r = ein("wl,bklc->bkwc", uwr, core_r) - ein("wl,bklc->bkwc", uwi, core_i)
    s_i = ein("wl,bklc->bkwc", uwr, core_i) + ein("wl,bklc->bkwc", uwi, core_r)
    s_r = s_r.reshape(b, k, wc)
    s_i = s_i.reshape(b, k, wc)

    if use_4d:
        out_spec = pl.BlockSpec(
            (1, th, wt, c), lambda bi, wi, hi: (bi, hi, wi, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b, h, w, c), x.dtype)
        expand_kernel = _expand_kernel_4d
    else:
        out_spec = pl.BlockSpec(
            (1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b, h, wc), x.dtype)
        expand_kernel = _expand_kernel

    out = pl.pallas_call(
        expand_kernel,
        grid=(b, n_wc, n_ht),
        in_specs=[
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(uhr, uhi, s_r, s_i, x_arg)
    return out.reshape(b, h, w, c), s_r, s_i


def _highpass_fwd(x: jnp.ndarray, mask_range: int, interpret: bool):
    out, s_r, s_i = _fwd_core(
        x, *_fwd_factor_args(x, mask_range), mask_range, interpret
    )
    return out, (s_r, s_i)


def _highpass_bwd_impl(x: jnp.ndarray, s_r, s_i, g: jnp.ndarray, mask_range: int):
    """Analytic VJP. With z = x - U_H S (complex) and out = |z| (clamped):

        u   = g * z / |z|              (zero where |z|^2 <= eps, the clamp)
        dx  = Re(u) - Re( A_H^T conj(u) A_W )

    and A_H^T conj(u) A_W factors through the same skinny K-dim chain as the
    forward: contract H by U_H^T, contract/expand W by U_W/V_W on the K-row
    core, expand H by V_H^T. One full-res matmul pass to rebuild lr/li from
    the saved S, one to contract u, one to write dx — no forward recompute.
    """
    b, h, w, c = x.shape
    m = min(mask_range, h // 2, w // 2)
    k = max(_round_up(2 * m, 16), 16)
    wc = w * c
    uhr, uhi, vhr, vhi = _padded_factors(h, m, k)
    uwr, uwi, vwr, vwi = _padded_factors(w, m, k)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    cdt = x.dtype

    def ein(eq, a, t):
        return jnp.einsum(
            eq, jnp.asarray(a, cdt), t.astype(cdt),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # rebuild the low-pass rows from the saved spectrum: lr + i li = U_H S
    lr = ein("hk,bkm->bhm", uhr, s_r) - ein("hk,bkm->bhm", uhi, s_i)
    li = ein("hk,bkm->bhm", uhr, s_i) + ein("hk,bkm->bhm", uhi, s_r)

    xm = x.reshape(b, h, wc).astype(jnp.float32)
    gm = g.reshape(b, h, wc).astype(jnp.float32)
    zr = xm - lr
    zi = -li
    sq = zr * zr + zi * zi
    r = jnp.sqrt(jnp.maximum(sq, _EPS))
    coef = jnp.where(sq >= _EPS, gm / r, 0.0)
    ur = coef * zr
    ui = coef * zi

    # T = U_H^T conj(u)  (K, WC per batch)
    t_r = ein("hk,bhm->bkm", uhr, ur) + ein("hk,bhm->bkm", uhi, ui)
    t_i = ein("hk,bhm->bkm", uhi, ur) - ein("hk,bhm->bkm", uhr, ui)

    # middle: core = T U_W (contract W), rows = core V_W (expand W)
    t_r4 = t_r.reshape(b, k, w, c)
    t_i4 = t_i.reshape(b, k, w, c)
    prec_hi = jax.lax.Precision.HIGHEST

    def einw(eq, a, t):
        return jnp.einsum(eq, jnp.asarray(a), t, precision=prec_hi)

    core_r = einw("wl,bkwc->bklc", uwr, t_r4) - einw("wl,bkwc->bklc", uwi, t_i4)
    core_i = einw("wl,bkwc->bklc", uwr, t_i4) + einw("wl,bkwc->bklc", uwi, t_r4)
    row_r = einw("lw,bklc->bkwc", vwr, core_r) - einw("lw,bklc->bkwc", vwi, core_i)
    row_i = einw("lw,bklc->bkwc", vwr, core_i) + einw("lw,bklc->bkwc", vwi, core_r)
    row_r = row_r.reshape(b, k, wc)
    row_i = row_i.reshape(b, k, wc)

    # dx = Re(u) - Re(V_H^T rows)
    adj_re = ein("kh,bkm->bhm", vhr, row_r) - ein("kh,bkm->bhm", vhi, row_i)
    dx = ur - adj_re
    return dx.reshape(b, h, w, c).astype(g.dtype)


# --- backward kernel B1: u = g.z/|z| (write Re), T = U_H^T conj(u) ----------
def _bwd_contract_kernel(uhr_ref, uhi_ref, sr_ref, si_ref, x_ref, g_ref,
                         u_ref, tr_ref, ti_ref):
    ht = pl.program_id(2)

    @pl.when(ht == 0)
    def _():
        tr_ref[0] = jnp.zeros_like(tr_ref[0])
        ti_ref[0] = jnp.zeros_like(ti_ref[0])

    uhr = uhr_ref[:]  # (Th, K) f32
    uhi = uhi_ref[:]
    sr = sr_ref[0]    # (K, WCt) f32
    si = si_ref[0]
    lr = jnp.dot(uhr, sr, preferred_element_type=jnp.float32) - jnp.dot(
        uhi, si, preferred_element_type=jnp.float32
    )
    li = jnp.dot(uhr, si, preferred_element_type=jnp.float32) + jnp.dot(
        uhi, sr, preferred_element_type=jnp.float32
    )
    zr = x_ref[0].astype(jnp.float32) - lr
    zi = -li
    sq = zr * zr + zi * zi
    r = jnp.sqrt(jnp.maximum(sq, _EPS))
    coef = jnp.where(sq >= _EPS, g_ref[0].astype(jnp.float32) / r, 0.0)
    ur = coef * zr
    ui = coef * zi
    u_ref[0] = ur.astype(u_ref.dtype)
    # t_r + i t_i = U_H^T conj(u):  t_r = Ur^T ur + Ui^T ui, t_i = Ui^T ur - Ur^T ui
    tr_ref[0] += jax.lax.dot_general(
        uhr, ur, _DN_T, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(uhi, ui, _DN_T, preferred_element_type=jnp.float32)
    ti_ref[0] += jax.lax.dot_general(
        uhi, ur, _DN_T, preferred_element_type=jnp.float32
    ) - jax.lax.dot_general(uhr, ui, _DN_T, preferred_element_type=jnp.float32)


# --- backward kernel B2: dx = Re(u) - Re(V_H^T rows), streamed --------------
def _bwd_expand_kernel(vhrt_ref, vhit_ref, rr_ref, ri_ref, u_ref, dx_ref):
    adj = jnp.dot(
        vhrt_ref[:], rr_ref[0], preferred_element_type=jnp.float32
    ) - jnp.dot(vhit_ref[:], ri_ref[0], preferred_element_type=jnp.float32)
    dx_ref[0] = (u_ref[0].astype(jnp.float32) - adj).astype(dx_ref.dtype)


def _bwd_factor_args(x: jnp.ndarray, mask_range: int):
    """Factor matrices for ``_bwd_core`` as arrays (see ``_fwd_factor_args``)."""
    _, h, w, c = x.shape
    m = min(mask_range, h // 2, w // 2)
    k = max(_round_up(2 * m, 16), 16)
    uhr, uhi, vhr, vhi = _padded_factors(h, m, k)
    uwr, uwi, vwr, vwi = _padded_factors(w, m, k)
    return (
        jnp.asarray(uhr, jnp.float32),                   # (H, K)
        jnp.asarray(uhi, jnp.float32),
        jnp.asarray(np.ascontiguousarray(vhr.T), jnp.float32),  # (H, K)
        jnp.asarray(np.ascontiguousarray(vhi.T), jnp.float32),
        jnp.asarray(uwr, jnp.float32),                   # (W, K)
        jnp.asarray(uwi, jnp.float32),
        jnp.asarray(vwr, jnp.float32),                   # (K, W)
        jnp.asarray(vwi, jnp.float32),
    )


def _bwd_core(x, s_r, s_i, g, uhr, uhi, vhr_t, vhi_t, uwr, uwi, vwr, vwi,
              mask_range: int, interpret: bool):
    """Kernel-pair version of ``_highpass_bwd_impl`` (same math, same skinny
    middle; full-res passes fused in VMEM). WCt tiles cap at 2048 here: B1
    holds two extra full-res blocks (g in, u out) plus the two skinny T
    accumulators vs the forward expand kernel's budget."""
    b, h, w, c = x.shape
    m = min(mask_range, h // 2, w // 2)
    k = max(_round_up(2 * m, 16), 16)
    wc = w * c
    th = _pick_tile(h, (64, 32, 16, 8))
    wct = _pick_tile(wc, (2048, 1024, 512, 256, 128))
    if th == 0 or wct == 0:
        raise ValueError(f"unsupported shape for Pallas high-pass bwd: {x.shape}")
    n_ht, n_wc = h // th, wc // wct

    xm = x.reshape(b, h, wc)
    gm = g.reshape(b, h, wc)

    u_re, t_r, t_i = pl.pallas_call(
        _bwd_contract_kernel,
        grid=(b, n_wc, n_ht),
        in_specs=[
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wc), x.dtype),
            jax.ShapeDtypeStruct((b, k, wc), jnp.float32),
            jax.ShapeDtypeStruct((b, k, wc), jnp.float32),
        ),
        interpret=interpret,
    )(uhr, uhi, s_r, s_i, xm, gm)

    # skinny W-axis middle (identical to _highpass_bwd_impl)
    prec = jax.lax.Precision.HIGHEST
    t_r4 = t_r.reshape(b, k, w, c)
    t_i4 = t_i.reshape(b, k, w, c)

    def ein(eq, a, t):
        return jnp.einsum(eq, a, t, precision=prec)

    core_r = ein("wl,bkwc->bklc", uwr, t_r4) - ein("wl,bkwc->bklc", uwi, t_i4)
    core_i = ein("wl,bkwc->bklc", uwr, t_i4) + ein("wl,bkwc->bklc", uwi, t_r4)
    row_r = ein("lw,bklc->bkwc", vwr, core_r) - ein("lw,bklc->bkwc", vwi, core_i)
    row_i = ein("lw,bklc->bkwc", vwr, core_i) + ein("lw,bklc->bkwc", vwi, core_r)
    row_r = row_r.reshape(b, k, wc)
    row_i = row_i.reshape(b, k, wc)

    dx = pl.pallas_call(
        _bwd_expand_kernel,
        grid=(b, n_wc, n_ht),
        in_specs=[
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, k), lambda bi, wi, hi: (hi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wct), lambda bi, wi, hi: (bi, 0, wi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wct), lambda bi, wi, hi: (bi, hi, wi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wc), g.dtype),
        interpret=interpret,
    )(vhr_t, vhi_t, row_r, row_i, u_re)
    return dx.reshape(b, h, w, c)


def _highpass_bwd_pallas(x, s_r, s_i, g, mask_range: int, interpret: bool):
    """Backward kernel pair on auto-built factors; falls back to the XLA
    analytic adjoint for shapes the kernels can't tile."""
    wc = x.shape[2] * x.shape[3]
    if _pick_tile(x.shape[1], (64, 32, 16, 8)) == 0 or _pick_tile(
        wc, (2048, 1024, 512, 256, 128)
    ) == 0:
        return _highpass_bwd_impl(x, s_r, s_i, g, mask_range)
    return _bwd_core(x, s_r, s_i, g, *_bwd_factor_args(x, mask_range), mask_range, interpret)


# --- SPMD wrappers: batch-sharded multi-device execution ---------------------
# pallas_call has no partitioning rule, so under pjit a sharded operand would
# be all-gathered and the kernel replicated per device. The high-pass couples
# only H and W; it is independent per (batch, channel). These
# custom_partitioning wrappers declare exactly that (Shardy rule: batch
# passes through, everything else need_replication), so data-parallel meshes
# run the kernels on their LOCAL batch shard with zero collectives. The
# skinny spectrum residuals (s_r, s_i) shard on batch alongside x, so the
# backward kernels stay local too.


def _batch_only_sharding(sharding, rank):
    """Keep only the batch-dim component of a NamedSharding."""
    from jax.sharding import NamedSharding, PartitionSpec

    try:
        spec = sharding.spec
    except AttributeError:  # non-Named sharding: force full replication
        return sharding
    b = spec[0] if len(spec) else None
    return NamedSharding(sharding.mesh, PartitionSpec(b, *([None] * (rank - 1))))


def _replicated_sharding_of(sharding):
    from jax.sharding import NamedSharding, PartitionSpec

    try:
        return NamedSharding(sharding.mesh, PartitionSpec())
    except AttributeError:
        return sharding


# The wrapped functions must trace to a CONST-FREE jaxpr (custom_partitioning
# asserts this), so the DFT factor matrices are explicit operands, replicated
# across the mesh by the sharding rule.

_fwd3_p = custom_partitioning(_fwd_core, static_argnums=(9, 10))


def _fwd_partition(mask_range, interpret, mesh, arg_shapes, result_shape):
    def lower(x, *facs):
        return _fwd_core(x, *facs, mask_range, interpret)

    out_sh = tuple(
        _batch_only_sharding(r.sharding, len(r.shape)) for r in result_shape
    )
    arg_sh = (_batch_only_sharding(arg_shapes[0].sharding, 4),) + tuple(
        _replicated_sharding_of(a.sharding) for a in arg_shapes[1:]
    )
    return mesh, lower, out_sh, arg_sh


_fwd3_p.def_partition(
    partition=_fwd_partition,
    sharding_rule=(
        "b h w c, h k, h k, h k, h k, w k, w k, k w, k w -> b h w c, b k m, b k m"
    ),
    need_replication_factors=("h", "w", "c", "k", "m"),
)


_bwd4_p = custom_partitioning(_bwd_core, static_argnums=(12, 13))


def _bwd_partition(mask_range, interpret, mesh, arg_shapes, result_shape):
    def lower(x, s_r, s_i, g, *facs):
        return _bwd_core(x, s_r, s_i, g, *facs, mask_range, interpret)

    arg_sh = tuple(
        _batch_only_sharding(a.sharding, len(a.shape))
        if i < 4
        else _replicated_sharding_of(a.sharding)
        for i, a in enumerate(arg_shapes)
    )
    return mesh, lower, _batch_only_sharding(result_shape.sharding, 4), arg_sh


_bwd4_p.def_partition(
    partition=_bwd_partition,
    sharding_rule=(
        "b h w c, b k m, b k m, b h w c, h k, h k, h k, h k, w k, w k, k w, k w"
        " -> b h w c"
    ),
    need_replication_factors=("h", "w", "c", "k", "m"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def high_pass_fft_pallas_sharded(x: jnp.ndarray, mask_range: int = 20, interpret: bool = False):
    """``high_pass_fft_pallas`` with SPMD partitioning declared: under a
    batch-sharded pjit/jit the kernel pair runs per-device on local shards
    (no gather). H/W/C sharding is replicated in (spatial sharding keeps the
    XLA low-rank path — parallel/spatial.py)."""
    return _fwd3_p(x, *_fwd_factor_args(x, mask_range), mask_range, interpret)[0]


def _svjp_fwd(x, mask_range, interpret):
    out, s_r, s_i = _fwd3_p(x, *_fwd_factor_args(x, mask_range), mask_range, interpret)
    return out, (x, s_r, s_i)


def _svjp_bwd(mask_range, interpret, res, g):
    x, s_r, s_i = res
    return (
        _bwd4_p(x, s_r, s_i, g, *_bwd_factor_args(x, mask_range), mask_range, interpret),
    )


high_pass_fft_pallas_sharded.defvjp(_svjp_fwd, _svjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def high_pass_fft_pallas(x: jnp.ndarray, mask_range: int = 20, interpret: bool = False):
    """abs(x - lowpass(x)) for NHWC input — fused Pallas TPU path.

    Numerically matches ``high_pass_fft_lowrank`` run at the same dtype
    (identical matmul structure; f32 accumulation). Backward is analytic
    (adjoint of the low-rank operator on the saved skinny spectrum) —
    tested against jax.grad of the XLA path.
    """
    return _highpass_fwd(x, mask_range, interpret)[0]


def _vjp_fwd(x, mask_range, interpret):
    out, (s_r, s_i) = _highpass_fwd(x, mask_range, interpret)
    return out, (x, s_r, s_i)


def _vjp_bwd(mask_range, interpret, res, g):
    x, s_r, s_i = res
    return (_highpass_bwd_pallas(x, s_r, s_i, g, mask_range, interpret),)


high_pass_fft_pallas.defvjp(_vjp_fwd, _vjp_bwd)
