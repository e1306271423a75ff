"""Batched quantization on TPU (C11), mirroring specmodel.quant.

Pure VPU element-wise integer math; fuses into the surrounding transform
matmuls under jit.  Shifts are Python ints (static per (size, qp) trace),
so no dynamic shapes reach XLA.
"""

from __future__ import annotations

import functools

import jax
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


def sdh_adjust(lev: jnp.ndarray, size: int, coef: jnp.ndarray | None = None,
               qp: int = 0, bit_depth: int = 8,
               lam: float | None = None) -> jnp.ndarray:
    """Encoder-side sign-data-hiding parity enforcement (C11 [STD-shaped]).

    lev: (size, size) quantized levels of one TU.  Per 4x4 coefficient
    group whose first/last significant scan positions are >= SDH_SPAN
    apart, the entropy layer hides the FIRST significant coefficient's
    sign and the decoder infers it from the parity of the CG's
    absolute-level sum (odd = negative).  A parity mismatch is fixed by
    moving one level's magnitude a single step.

    With `coef` (the pre-quant transform coefficients, same layout) the
    adjusted position is chosen HM-style: among all scan positions in
    [first, last], pick the +-1 move with the smallest dequant-error
    increase vs `coef`, excluding moves that zero the first/last
    coefficient (which would change the CG's scan span and hence its
    eligibility on the decoder side).  Without `coef`, fall back to
    always moving the first significant coefficient (legacy behavior:
    toward zero when |level| > 1, away otherwise).  Either way the
    decoder is unaffected — it only sees the adjusted levels.  Pure
    element-wise/VPU math; the scan permutation is a static gather.
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

    if coef is None:
        sgn = jnp.where(fv < 0, -1, 1)
        nfv = jnp.where(jnp.abs(fv) > 1, fv - sgn,
                        jnp.clip(fv + sgn, -32767, 32767))
        hit = (jnp.arange(16)[None, :] == first[:, None]) \
            & mismatch[:, None]
        v = jnp.where(hit, nfv[:, None], v)
        out = jnp.zeros_like(lev).at[ys, xs].set(v.reshape(-1))
        return out

    # RD-aware choice: minimal D + lam*R increase, with D the
    # pixel-domain-scaled dequant error vs `coef` and R the same
    # level-magnitude rate surrogate rd_quantize uses.
    # X266T_SDH_MODE=dist ignores the rate term (pure min-distortion
    # move; measurement switch for tools/bd_rate.py experiments).
    import os

    tsh = transform_shift(size, bit_depth)
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    err_scale = float(2.0 ** (-2 * tsh))
    if lam is None:
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    if os.environ.get("X266T_SDH_MODE") == "dist":
        lam = 1e-9
    c = coef.astype(jnp.int32)[ys, xs].reshape(-1, 16)

    def dq(l):
        return jnp.clip((l * dscale + (1 << (ishift - 1))) >> ishift,
                        -32768, 32767)

    def rdcost(l):
        e = (dq(l) - c).astype(jnp.float32)
        a = jnp.abs(l).astype(jnp.float32)
        rate = jnp.where(a > 0, 3.0 + 2.0 * jnp.log2(a + 1.0), 0.0625)
        return e * e * err_scale + lam * rate

    e0 = rdcost(v)
    j = jnp.arange(16)[None, :]
    in_span = (j >= first[:, None]) & (j <= last[:, None])
    boundary = (j == first[:, None]) | (j == last[:, None])
    big = jnp.float32(3.4e38)
    deltas, moves = [], []
    for d in (-1, 1):
        nv = jnp.clip(v + d, -32767, 32767)
        # a +-1 move on the signed level always changes |level| by
        # exactly 1, so it always flips the CG parity
        zeroes = (nv == 0) & boundary
        ok = in_span & ~zeroes & (nv != v)
        delta = rdcost(nv) - e0
        deltas.append(jnp.where(ok, delta, big))
        moves.append(nv)
    dl = jnp.stack(deltas, axis=-1)                # (ncg, 16, 2)
    best_dir = jnp.argmin(dl, axis=-1)             # per-position best dir
    best_delta = jnp.min(dl, axis=-1)
    pos = jnp.argmin(best_delta, axis=1)           # per-CG best position
    mv = jnp.stack(moves, axis=-1)                 # (ncg, 16, 2)
    chosen_dir = jnp.take_along_axis(
        best_dir, pos[:, None], axis=1)[:, 0]
    nv_sel = jnp.take_along_axis(
        mv, pos[:, None, None], axis=1)[:, 0]      # (ncg, 2)
    nv_sel = jnp.take_along_axis(
        nv_sel, chosen_dir[:, None], axis=1)[:, 0]
    hit = (j == pos[:, None]) & mismatch[:, None]
    v = jnp.where(hit, nv_sel[:, None], v)
    out = jnp.zeros_like(lev).at[ys, xs].set(v.reshape(-1))
    return out


# ---- dependent quantization (C11, VVC-shaped) -------------------------------

# State machine over the TU's coding order (reverse diagonal scan):
# next = DQ_TRANS[state][level_parity]; states {0,1} use quantizer Q0
# (reconstruction at even half-steps, i.e. the plain grid), states
# {2,3} use Q1 (odd half-steps, offset by step/2).  Deviation from VVC
# (documented, self-consistent): the machine starts at the TU's highest
# scan position rather than the last significant one — trailing zeros
# advance the state deterministically on both sides, so encoder and
# decoder always agree.
DQ_TRANS = np.array([[0, 2], [2, 0], [1, 3], [3, 1]], dtype=np.int32)


@functools.cache
def _dq_perm(size: int):
    """Coding-order (reverse scan) index arrays: position j codes the
    sample at (ys[j], xs[j]); shares the walkers' scan tables."""
    from x266_tpu.cabac.syntax import tu_scan

    sc = tu_scan(size)[::-1]          # reverse: high frequency first
    return sc[:, 1].copy(), sc[:, 0].copy()


def _dq_deq_val(k, q1, dscale: int, ishift: int):
    """Exact-int reconstruction of signed level k under quantizer q1:
    sgn(k) * ((2|k| - q1) * dscale + 2^ishift) >> (ishift + 1)."""
    a = jnp.abs(k)
    mag = ((2 * a - q1 * (a > 0)) * dscale
           + (1 << ishift)) >> (ishift + 1)
    return jnp.sign(k) * jnp.clip(mag, 0, 32767)


def _dq_states(parity, n: int):
    """parity (..., n) in coding order -> state (..., n) via an
    associative scan over 4-state transition maps (log-depth: the
    TPU-first restatement of the sequential state machine)."""
    maps = jnp.asarray(DQ_TRANS)[jnp.arange(4)[None], parity[..., None]]
    comp = jax.lax.associative_scan(
        lambda a, b: jnp.take_along_axis(b, a, axis=-1), maps,
        axis=parity.ndim - 1)          # comp[j] = M0 o ... o Mj
    after = comp[..., 0]               # state AFTER position j (from 0)
    return jnp.concatenate(
        [jnp.zeros_like(after[..., :1]), after[..., :-1]], axis=-1)


def dq_quantize(coef: jnp.ndarray, qp: int, size: int, lam: float,
                bit_depth: int = 8) -> jnp.ndarray:
    """Greedy dependent quantization (C11 "dep quant", encoder-only).

    Per coding-order position and per candidate state, the best level
    under that state's quantizer is chosen elementwise by D + lambda*R
    over {0, k_dn, k_up} (the rd_quantize candidate set); the parity of
    each state's choice defines that position's 4->4 transition map,
    and one associative scan composes the maps into the realized state
    sequence — greedy (no trellis lookahead) but exactly consistent
    with dq_dequantize's state derivation by construction.
    """
    tsh = transform_shift(size, bit_depth)
    qbits = 14 + qp // 6 + tsh
    scale = int(QUANT_SCALES[qp % 6])
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    err_scale = float(2.0 ** (-2 * tsh))

    ys, xs = _dq_perm(size)
    c = coef.astype(jnp.int32)[..., ys, xs]       # (..., n) coding order
    a = jnp.abs(c)

    def best_for(q1):
        # nearest level in the (2k - q1) half-step grid, one below, 0
        u = (a * scale + (1 << (qbits - 2))) >> (qbits - 1)  # 2|c|/step
        kup = jnp.clip((u + q1 + 1) >> 1, 0, 32767)
        kdn = jnp.maximum(kup - 1, 0)

        def cost(k):
            dq = ((2 * k - q1 * (k > 0)) * dscale
                  + (1 << ishift)) >> (ishift + 1)
            e = (a - dq).astype(jnp.float32)
            rate = jnp.where(
                k > 0, 3.0 + 2.0 * jnp.log2(k.astype(jnp.float32) + 1.0),
                0.0625)
            return e * e * err_scale + lam * rate

        cu, cd, c0 = cost(kup), cost(kdn), cost(jnp.zeros_like(a))
        k = jnp.where(cu <= cd, kup, kdn)
        return jnp.where(jnp.minimum(cu, cd) <= c0, k,
                         jnp.zeros_like(k))

    k0 = best_for(0)                   # states 0/1 choice
    k1 = best_for(1)                   # states 2/3 choice
    # per-position transition map over the 4 states
    par = jnp.stack([k0 & 1, k0 & 1, k1 & 1, k1 & 1], axis=-1)
    maps = jnp.take_along_axis(
        jnp.broadcast_to(jnp.asarray(DQ_TRANS), par.shape[:-1] + (4, 2)),
        par[..., None], axis=-1)[..., 0]
    comp = jax.lax.associative_scan(
        lambda x, y: jnp.take_along_axis(y, x, axis=-1), maps,
        axis=par.ndim - 2)
    after = comp[..., 0]
    state = jnp.concatenate(
        [jnp.zeros_like(after[..., :1]), after[..., :-1]], axis=-1)
    k = jnp.where(state >= 2, k1, k0)
    lev = jnp.sign(c) * k
    out = jnp.zeros_like(coef)
    return out.at[..., ys, xs].set(lev)


def _minplus(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(min,+) matrix product over the trailing (4, 4) dims:
    (x @ y)[a, c] = min_b x[a, b] + y[b, c]."""
    return jnp.min(x[..., :, :, None] + y[..., None, :, :], axis=-2)


def dq_quantize_trellis(coef: jnp.ndarray, qp: int, size: int,
                        lam: float, bit_depth: int = 8) -> jnp.ndarray:
    """Exact 4-state Viterbi dependent quantization (C11, round-5 —
    VERDICT r04 item 2: the trellis the greedy dq_quantize lacked).

    Per coding-order position j and DQ state a, the legal moves are
    the two parities p (next state DQ_TRANS[a][p]); each move's cost
    is the best level of that parity under state a's quantizer
    (D + lambda*R, the rd_quantize surrogate).  The joint
    minimization over the whole TU is a shortest path through the
    4-state trellis, computed TPU-first: per-position (4, 4) (min,+)
    transition matrices composed with jax.lax.associative_scan
    (prefix AND suffix products, log depth instead of VVC's
    sequential sweep), then the optimal state at every position read
    off as argmin_b prefix[j][0, b] + min_c suffix[j+1][b, c].

    Tie-broken state sequences can in principle disagree with the
    transition structure at a position; the emitted level then comes
    from a legal-parity fallback and the DECODER is unaffected either
    way — it re-derives states from the levels' parities
    (dq_dequantize), so any emitted level field is decodable and the
    cost model is exact for consistent paths.

    Batched over leading dims; coef (..., size, size) -> levels.
    """
    tsh = transform_shift(size, bit_depth)
    qbits = 14 + qp // 6 + tsh
    scale = int(QUANT_SCALES[qp % 6])
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    err_scale = float(2.0 ** (-2 * tsh))

    ys, xs = _dq_perm(size)
    c = coef.astype(jnp.int32)[..., ys, xs]       # (..., n) coding order
    a = jnp.abs(c)
    n = a.shape[-1]

    def lev_cost(k, q1):
        dq = ((2 * k - q1 * (k > 0)) * dscale
              + (1 << ishift)) >> (ishift + 1)
        e = (a - dq).astype(jnp.float32)
        rate = jnp.where(
            k > 0, 3.0 + 2.0 * jnp.log2(k.astype(jnp.float32) + 1.0),
            0.0625)
        return e * e * err_scale + lam * rate

    BIG = jnp.float32(3.0e38)
    # best level + cost per (quantizer q1, parity p), elementwise
    levs = []          # [q1][p] -> (..., n) int32
    costs = []         # [q1][p] -> (..., n) f32
    for q1 in (0, 1):
        u = (a * scale + (1 << (qbits - 2))) >> (qbits - 1)
        kup = jnp.clip((u + q1 + 1) >> 1, 0, 32767)
        kdn = jnp.maximum(kup - 1, 0)
        cu, cd = lev_cost(kup, q1), lev_cost(kdn, q1)
        c0 = lev_cost(jnp.zeros_like(a), q1)
        lrow, crow = [], []
        for p in (0, 1):
            ku_ok = (kup & 1) == p
            kd_ok = (kdn & 1) == p
            cu_p = jnp.where(ku_ok, cu, BIG)
            cd_p = jnp.where(kd_ok, cd, BIG)
            kbest = jnp.where(cu_p <= cd_p, kup, kdn)
            cbest = jnp.minimum(cu_p, cd_p)
            if p == 0:             # k = 0 always has parity 0
                kbest = jnp.where(c0 <= cbest, 0, kbest)
                cbest = jnp.minimum(c0, cbest)
            lrow.append(kbest)
            crow.append(cbest)
        levs.append(lrow)
        costs.append(crow)

    # (..., n, 4, 4) transition matrices M[j][a][b]
    trans = np.asarray(DQ_TRANS)                  # [a][p] -> b
    m = jnp.full(a.shape + (4, 4), BIG)
    for st in range(4):
        q1 = int(st >= 2)
        for p in (0, 1):
            b = int(trans[st][p])
            m = m.at[..., st, b].set(
                jnp.minimum(m[..., st, b], costs[q1][p]))

    axis = a.ndim                                 # the n axis of m
    pref = jax.lax.associative_scan(_minplus, m, axis=axis - 1)
    # suffix products M_j (x) ... (x) M_{n-1}: reverse=True composes in
    # flipped order, so scan the TRANSPOSES ((A(x)B)^T = B^T (x) A^T)
    # and transpose back.
    mt = jnp.swapaxes(m, -1, -2)
    suff = jnp.swapaxes(
        jax.lax.associative_scan(_minplus, mt, axis=axis - 1,
                                 reverse=True), -1, -2)
    alpha = pref[..., 0, :]                       # (..., n, 4) from state 0
    beta = jnp.min(suff, axis=-1)                 # (..., n, 4) to any end
    # optimal state AFTER position j
    tail = jnp.concatenate(
        [beta[..., 1:, :], jnp.zeros_like(beta[..., :1, :])], axis=-2)
    sigma = jnp.argmin(alpha + tail, axis=-1)     # (..., n)
    # state BEFORE position j (sigma shifted; start state 0)
    before = jnp.concatenate(
        [jnp.zeros_like(sigma[..., :1]), sigma[..., :-1]], axis=-1)
    # parity implied by the transition before -> sigma (legal p, else 0)
    t_of = jnp.asarray(trans)                     # (4, 2)
    p1_next = t_of[:, 1][before]                  # state if p=1 chosen
    p_j = (p1_next == sigma).astype(jnp.int32)    # else parity 0
    q_j = (before >= 2).astype(jnp.int32)
    lev_pp = jnp.stack(
        [jnp.stack(levs[0], axis=-1), jnp.stack(levs[1], axis=-1)],
        axis=-2)                                  # (..., n, q, p)
    k = jnp.take_along_axis(
        jnp.take_along_axis(lev_pp, q_j[..., None, None],
                            axis=-2)[..., 0, :],
        p_j[..., None], axis=-1)[..., 0]
    k = jnp.where(a > 0, k, 0)    # zero coefs emit 0 (sign would drop
    lev = jnp.sign(c) * k         # the level; keep parity consistent)
    out = jnp.zeros_like(coef)
    return out.at[..., ys, xs].set(lev)


def dq_dequantize(lev: jnp.ndarray, qp: int, size: int,
                  bit_depth: int = 8) -> jnp.ndarray:
    """Dependent dequantization: derive the state sequence from the
    levels' parities (associative scan), then reconstruct each level
    under its state's quantizer.  Shared by decoder and encoder recon."""
    tsh = transform_shift(size, bit_depth)
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    ys, xs = _dq_perm(size)
    v = lev.astype(jnp.int32)[..., ys, xs]
    state = _dq_states(jnp.abs(v) & 1, v.shape[-1])
    deq = _dq_deq_val(v, (state >= 2).astype(jnp.int32), dscale, ishift)
    out = jnp.zeros_like(lev)
    return out.at[..., ys, xs].set(deq)
