"""Batched quantization on TPU (C11), mirroring specmodel.quant.

Pure VPU element-wise integer math; fuses into the surrounding transform
matmuls under jit.  Shifts are Python ints (static per (size, qp) trace),
so no dynamic shapes reach XLA.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from x266_tpu.specmodel.quant import (DEQUANT_SCALES, QUANT_SCALES,
                                      transform_shift)


def quantize(coef: jnp.ndarray, qp: int, size: int,
             bit_depth: int = 8) -> jnp.ndarray:
    qbits = 14 + qp // 6 + transform_shift(size, bit_depth)
    add = 171 << (qbits - 9)
    scale = int(QUANT_SCALES[qp % 6])
    # |coef| <= 32768, fQ <= 26214, add < 2^26  =>  fits int32 exactly.
    c = coef.astype(jnp.int32)
    level = (jnp.abs(c) * scale + add) >> qbits
    level = jnp.clip(level, 0, 32767)
    return (jnp.sign(c) * level).astype(jnp.int32)


def dequantize(level: jnp.ndarray, qp: int, size: int,
               bit_depth: int = 8) -> jnp.ndarray:
    ishift = 6 - transform_shift(size, bit_depth)
    scale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    c = (level.astype(jnp.int32) * scale + (1 << (ishift - 1))) >> ishift
    return jnp.clip(c, -32768, 32767)


def rd_quantize(coef: jnp.ndarray, qp: int, size: int,
                lam: float, bit_depth: int = 8) -> jnp.ndarray:
    """Rate-distortion-optimized quantization (C11 "RDOQ", encoder-only).

    The quantizer is non-normative [STD, specmodel.quant docstring], so
    instead of the fixed-deadzone hard quantizer each coefficient picks the
    level in {0, l_dn, l_up} (l_up = nearest level, l_dn = l_up - 1) that
    minimizes D + lambda*R — the TPU-first restatement of HM's sequential
    RDOQ as a fully element-wise vectorized decision (no coefficient
    ordering state; the context-adaptive rate terms are replaced by the
    kernels.cost surrogate so the decision stays branch-free VPU math).

    D is measured in the coefficient domain and converted to pixel-domain
    SSE with the forward-transform gain 2^transform_shift (exact power of
    two by the HM shift schedule, specmodel.transforms docstring), so lam
    is the standard pixel-domain lambda (config.lambda_mode).
    """
    tsh = transform_shift(size, bit_depth)
    qbits = 14 + qp // 6 + tsh
    scale = int(QUANT_SCALES[qp % 6])
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    err_scale = float(2.0 ** (-2 * tsh))

    c = coef.astype(jnp.int32)
    a = jnp.abs(c)
    # nearest level (offset 1/2) and one below
    lup = jnp.clip((a * scale + (1 << (qbits - 1))) >> qbits, 0, 32767)
    ldn = jnp.maximum(lup - 1, 0)

    def cost(l):
        dq = jnp.clip((l * dscale + (1 << (ishift - 1))) >> ishift,
                      -32768, 32767)
        e = (a - dq).astype(jnp.float32)
        rate = jnp.where(l > 0,
                         3.0 + 2.0 * jnp.log2(l.astype(jnp.float32) + 1.0),
                         0.0625)
        return e * e * err_scale + lam * rate

    c0, cd, cu = cost(jnp.zeros_like(a)), cost(ldn), cost(lup)
    lev = jnp.where(cu <= cd, lup, ldn)
    lbest = jnp.where(jnp.minimum(cu, cd) <= c0, lev,
                      jnp.zeros_like(lev))
    return (jnp.sign(c) * lbest).astype(jnp.int32)


# ---- sign-data hiding (C11) -------------------------------------------------

SDH_SPAN = 4     # min (last - first) significant scan distance per CG


@functools.cache
def _sdh_perm(size: int):
    """(ys, xs) numpy index arrays in TU scan order — imported from the
    entropy layer so the parity CG grouping matches both syntax walkers
    exactly (same diag-scan tables)."""
    from x266_tpu.cabac.syntax import tu_scan

    sc = tu_scan(size)
    return sc[:, 1].copy(), sc[:, 0].copy()


def sdh_adjust(lev: jnp.ndarray, size: int) -> jnp.ndarray:
    """Encoder-side sign-data-hiding parity enforcement (C11 [STD-shaped]).

    lev: (size, size) quantized levels of one TU.  Per 4x4 coefficient
    group whose first/last significant scan positions are >= SDH_SPAN
    apart, the entropy layer hides the FIRST significant coefficient's
    sign and the decoder infers it from the parity of the CG's
    absolute-level sum (odd = negative).  This transform fixes any
    parity mismatch by moving that first coefficient's magnitude one
    step: toward zero when |level| > 1 (cheaper in rate), away from
    zero when |level| == 1 (so the CG's first/last positions — and
    hence its eligibility — never change).  Pure element-wise/VPU math;
    the scan permutation is a static gather.
    """
    ys, xs = _sdh_perm(size)
    v = lev[ys, xs].reshape(-1, 16)               # (ncg^2, 16) scan CGs
    nz = v != 0
    has = jnp.any(nz, axis=1)
    first = jnp.argmax(nz, axis=1)
    last = 15 - jnp.argmax(nz[:, ::-1], axis=1)
    eligible = has & ((last - first) >= SDH_SPAN)
    parity = jnp.sum(jnp.abs(v), axis=1) & 1
    fv = jnp.take_along_axis(v, first[:, None], axis=1)[:, 0]
    mismatch = eligible & ((fv < 0) != (parity == 1))
    sgn = jnp.where(fv < 0, -1, 1)
    nfv = jnp.where(jnp.abs(fv) > 1, fv - sgn,
                    jnp.clip(fv + sgn, -32767, 32767))
    hit = (jnp.arange(16)[None, :] == first[:, None]) \
        & mismatch[:, None]
    v = jnp.where(hit, nfv[:, None], v)
    out = jnp.zeros_like(lev).at[ys, xs].set(v.reshape(-1))
    return out
