"""FFT high-pass filter — exact low-rank MXU formulation.

The reference HighFourierTransform (EELUnet.py:144-191) computes
``abs(ifft2(ifftshift(fftshift(fft2(x)) * mask)))`` where ``mask`` zeroes a
centered (2m x 2m) box of the shifted spectrum. Full complex FFTs are the
single most expensive op in the EELUnet forward on TPU (~70% of runtime at
512^2, measured).

Mathematical identity exploited here: the zeroed box is a rank-1 outer
product ``box_rows x box_cols``, so

    masked_spectrum = X - diag(br) . X . diag(bc)
    ifft2(...)      = x - A_H . x . A_W^T,   A_H = F_H^-1 diag(br) F_H

and ``diag(br)`` has only 2m nonzero entries, so ``A_H = U_H V_H`` with
``U_H: (H, 2m)``, ``V_H: (2m, H)`` — the low-pass component is four skinny
complex matmuls (contract H and W down to 2m, then expand back), all MXU
work, ~100x fewer FLOPs than the FFTs at 512^2 with m=20. The result is
mathematically identical to the FFT path (float-rounding differences only);
``tests/test_eelunet_blocks.py`` checks agreement against both the jnp-FFT
path and torch.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _axis_factors(n: int, m: int):
    """(U, V) with U:(n, 2m) V:(2m, n) complex64 such that
    U @ V == F^-1 diag(b) F, b = ifftshift(indicator of the centered 2m box).
    """
    c = n // 2
    m = min(m, c)
    shifted = np.zeros(n, bool)
    shifted[c - m : c + m] = True
    b = np.fft.ifftshift(shifted)           # unshifted-frequency indicator
    sel = np.nonzero(b)[0]                  # 2m selected frequencies
    k = sel[None, :]                        # (1, 2m)
    grid = np.arange(n)[:, None]            # (n, 1)
    # F^-1[n, k] = exp(+2pi i k n / N) / N ;  F[k, n] = exp(-2pi i k n / N)
    U = np.exp(2j * np.pi * grid * k / n) / n        # (n, 2m)
    V = np.exp(-2j * np.pi * k.T * grid.T / n)       # (2m, n)
    # Cache NUMPY constants only — jnp arrays created inside a trace are
    # tracers, and caching those leaks them across jit scopes.
    return (
        np.ascontiguousarray(U.real, np.float32),
        np.ascontiguousarray(U.imag, np.float32),
        np.ascontiguousarray(V.real, np.float32),
        np.ascontiguousarray(V.imag, np.float32),
    )


def _cmul_contract(eq: str, mr, mi, tr, ti, compute_dtype=jnp.float32):
    """Complex contraction via four real einsums (complex matmul is
    UNIMPLEMENTED on the TPU backend): (mr + i mi) . (tr + i ti).

    Matmuls run in ``compute_dtype`` with f32 accumulation — bf16 inputs use
    the MXU's fast path when the surrounding model is bf16. The f32 path pins
    Precision.HIGHEST: TPU f32 matmuls otherwise default to bf16 MXU passes
    (~1e-2 abs error vs the FFT reference, observed live).
    """
    precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None

    def ein(a, b):
        return jnp.einsum(
            eq, a.astype(compute_dtype), b.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )

    rr = ein(mr, tr)
    if ti is None:
        return rr, ein(mi, tr)
    return rr - ein(mi, ti), ein(mr, ti) + ein(mi, tr)


def high_pass_fft_lowrank(x: jnp.ndarray, mask_range: int = 20) -> jnp.ndarray:
    """abs(x - lowpass(x)) for NHWC input, low-rank MXU path.

    Matches ``eelunet_tpu.models.eelunet.high_pass_fft`` up to float rounding.
    All complex arithmetic is hand-split into real matmuls.
    """
    h, w = x.shape[1], x.shape[2]
    # Reference clamp is JOINT across axes: m = min(mask_range, min(h//2, w//2))
    # (EELUnet.py:155-157), not per-axis.
    m = min(mask_range, h // 2, w // 2)
    uhr, uhi, vhr, vhi = _axis_factors(h, m)
    uwr, uwi, vwr, vwi = _axis_factors(w, m)

    # bf16 models run the matmuls in bf16 (f32 accumulation): ~0.3% relative
    # error on the low-pass component, consistent with the rest of a bf16
    # forward. f32 inputs keep the fully-f32 path (and exact parity tests).
    cd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    # Contract H and W down to 2m each, then expand back: skinny MXU matmuls.
    tr, ti = _cmul_contract("kh,bhwc->bkwc", vhr, vhi, x, None, cd)    # (B,2m,W,C)
    tr, ti = _cmul_contract("lw,bkwc->bklc", vwr, vwi, tr, ti, cd)     # (B,2m,2m,C)
    tr, ti = _cmul_contract("wl,bklc->bkwc", uwr, uwi, tr, ti, cd)     # (B,2m,W,C)
    lr, li = _cmul_contract("hk,bkwc->bhwc", uhr, uhi, tr, ti, cd)     # (B,H,W,C)

    # Elementwise tail in the input dtype (bf16 models halve the HBM traffic
    # of these full-resolution passes); f32 models keep exact parity.
    hi_re = x - lr.astype(x.dtype)
    hi_im = (-li).astype(x.dtype)
    # Clamped sqrt: the complex magnitude has an infinite gradient at exactly
    # 0, and this path produces EXACT zeros (e.g. when the clamped mask covers
    # the whole spectrum at small sizes) — unlike the FFT path whose rounding
    # noise masks the issue. Forward error <= 1e-12; gradients stay finite.
    sq = (hi_re * hi_re + hi_im * hi_im).astype(jnp.float32)
    out = jnp.sqrt(jnp.maximum(sq, 1e-24))
    return out.astype(x.dtype)
