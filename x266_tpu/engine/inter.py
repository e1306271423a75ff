"""Inter coding engine (C7/C8/C16 + P-slice recon; SURVEY.md M3).

Low-delay-P v1: one reference (the previous decoded picture, device-
resident as an interpolation pyramid), one MV per CU, skip mode (derived
MV, no residual), quarter-pel MC.

Pass A (mode decision, parallel): per CU size the intra candidates (as in
engine.mode_decision) compete against (a) an explicit-MV inter candidate
seeded by the 16x16 ME grid and (b) a skip estimate with the left
neighbor's MV as predictor proxy.  The normative skip MV is derived in
Pass B from actual neighbors, so the estimate only steers RD.

Pass B (recon scan): the sequential scan gains an inter branch per CU —
MC gather from the pyramid instead of neighbor prediction — and carries
an MV-state plane so skip CUs derive their MV from decoded neighbors
(rule mirrored exactly in both entropy walkers):
  predictor = left unit's MV if left CU is inter, else above (same CTU
  row) if inter, else (0, 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.engine.mode_decision import (PAD, _block_gather,
                                           _block_positions, _eval_size,
                                           _sum_children, _upsample,
                                           SPLIT_BITS)
from x266_tpu.engine.recon import _fwd_mts, _gather_ref, _inv_mts
from x266_tpu.kernels import cost as kcost
from x266_tpu.kernels import intra as kintra
from x266_tpu.kernels import interp
from x266_tpu.kernels import me as kme
from x266_tpu.kernels import quant as kquant
from x266_tpu.kernels import transforms as ktx

PRED_INTRA, PRED_INTER, PRED_SKIP = 0, 1, 2
PRED_L1, PRED_BI = 3, 4          # B slices: L1-only and bi-prediction


def _coded_mv(kind):
    """Predictor-eligible neighbor: a CODED-MV inter CU (not intra,
    not skip).  Skip CUs' MVs are DERIVED, so using them as predictors
    would propagate a derivation chain arbitrarily far from anything
    the decoupled Pass-A skip estimate can see — the round-4 '27 dB
    frame' failure (tests/test_amvp.py regression notes).  One-hop
    derivation keeps Pass A's worst-case candidate set
    {left ME, above ME, zero} an actual bound."""
    return (kind != PRED_INTRA) & (kind != PRED_SKIP)


def mv_predictor_np(pred_map, mvx_map, mvy_map, ux, uy):
    """Host-side predictor rule (entropy walkers mirror this)."""
    if ux > 0 and _coded_mv(pred_map[uy, ux - 1]):
        return int(mvx_map[uy, ux - 1]), int(mvy_map[uy, ux - 1])
    if uy > 0 and (uy & 7) != 0 and _coded_mv(pred_map[uy - 1, ux]):
        return int(mvx_map[uy - 1, ux]), int(mvy_map[uy - 1, ux])
    return 0, 0


def _blockify(frame, gy: int, gx: int, s: int):
    """(>=gy*s, >=gx*s) frame -> (gy*gx, s, s) via reshape (no gather)."""
    f = frame
    ph, pw = gy * s - f.shape[0], gx * s - f.shape[1]
    if ph > 0 or pw > 0:
        f = jnp.pad(f, ((0, max(ph, 0)), (0, max(pw, 0))))
    blk = f[:gy * s, :gx * s].reshape(gy, s, gx, s).transpose(0, 2, 1, 3)
    return blk.reshape(gy * gx, s, s)


def _inter_cost(cfg, plane, pyr_y, mv_grid, size, warped=None):
    """Explicit-inter and skip candidate costs for all size-s blocks.

    Returns (cost_inter, mvx, mvy, cost_skip) as (gy, gx) grids.
    warped: optional (explicit_frame, skip_left_frame, skip_above_frame)
    MC frames from kernels.me_pallas.warp_frames — per-block predictions
    become pure reshapes (identical values; the vmapped mc_block gathers
    they replace are the XLA-gather cliff, ~150 ms/size at 1080p).

    Skip robustness: Pass B DERIVES the skip MV (left CU's final MV,
    else above, else zero), which this decoupled pass can only proxy.
    The skip distortion is therefore the WORST CASE over the three
    derivable shapes {left ME MV, above ME MV, zero} — a single
    optimistic proxy let one mispredicted 16x16 skip cost a P frame
    ~6 dB when the real derivation diverged (no residual to recover).
    """
    w, h, s = cfg.width, cfg.height, size
    lam = np.float32(cfg.lambda_mode)
    xs_np, ys_np, gy, gx = _block_positions(w, h, s)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    nb = xs_np.shape[0]

    # MV candidate: the ME grid entry at the block's top-left corner
    m_y = (ys_np // kme.ME_BLOCK).astype(np.int32)
    m_x = (xs_np // kme.ME_BLOCK).astype(np.int32)
    mv = mv_grid[m_y, m_x]                        # (B, 2) quarter-pel
    # skip-proxy predictors: left / above ME block MVs (edge-clamped)
    mvl = mv_grid[m_y, np.maximum(m_x - 1, 0)]
    mva = mv_grid[np.maximum(m_y - 1, 0), m_x]

    orig = _block_gather(plane, gy, gx, s)        # (B, s, s)

    if warped is not None:
        pred = _blockify(warped[0], gy, gx, s)
        pred_skl = _blockify(warped[1], gy, gx, s)
        pred_ska = _blockify(warped[2], gy, gx, s)
    else:
        def mc(x, y, m):
            return interp.mc_block(pyr_y, x, y, m[0], m[1], s)

        pred = jax.vmap(mc)(xs, ys, mv)
        pred_skl = jax.vmap(mc)(xs, ys, mvl)
        pred_ska = jax.vmap(mc)(xs, ys, mva)
    # zero-MV shape: a plain slice of the reference plane (no warp)
    rp = interp.REF_PAD
    pred_zero = _blockify(pyr_y[0, rp:rp + h, rp:rp + w], gy, gx, s)

    res = orig - pred
    mv_bits = jnp.sum(2.0 + 2.0 * jnp.log2(
        jnp.abs(mv - mvl).astype(jnp.float32) + 1.0), axis=1)
    sse_l = kcost.sse(pred_skl, orig)
    sse_a = kcost.sse(pred_ska, orig)
    sse_z = kcost.sse(pred_zero, orig)
    if cfg.merge_cands:
        # merge list (C7): candidate 0 derives left-first (worst case
        # over all three derivable shapes), candidate 1 is the above
        # rule (worst case over {above, zero}); the encoder signals the
        # better index per skip CU.
        d_c0 = jnp.maximum(jnp.maximum(sse_l, sse_a), sse_z)
        d_c1 = jnp.maximum(sse_a, sse_z)
        midx = (d_c1 < d_c0).astype(jnp.int32)
        dist_s = jnp.minimum(d_c0, d_c1)
    else:
        midx = jnp.zeros(sse_l.shape, jnp.int32)
        dist_s = jnp.maximum(jnp.maximum(sse_l, sse_a), sse_z)
    if cfg.lossless:
        rate = kcost.rate_estimate_levels(res)
        cost_i = lam * (rate + mv_bits + 3.0)
        # skip carries no residual and its REAL MV is derived in Pass B
        # (may differ from the proxy evaluated here), so it can never be
        # proven pixel-exact at decision time: disallow under lossless
        cost_s = jnp.full_like(dist_s, jnp.inf)
    else:
        bdp = cfg.bit_depth
        coefs = ktx.forward_transform(res.reshape(nb, s, s), s,
                                      bit_depth=bdp)
        levels = kquant.quantize(coefs, cfg.qp, s, bdp)
        rate = kcost.rate_estimate_levels(levels)
        deq = kquant.dequantize(levels, cfg.qp, s, bdp)
        rres = ktx.inverse_transform(deq, s, bit_depth=bdp)
        recon = jnp.clip(pred + rres, 0, cfg.max_val)
        dist = kcost.sse(recon, orig)
        cost_i = dist + lam * (rate + mv_bits + 3.0)
        cost_s = dist_s + lam * 2.0

    return (cost_i.reshape(gy, gx), mv[:, 0].reshape(gy, gx),
            mv[:, 1].reshape(gy, gx), cost_s.reshape(gy, gx),
            midx.reshape(gy, gx))


@functools.cache
def make_mode_decision_p_raw(cfg: CodecConfig,
                             use_pallas: bool | None = None):
    """Pass A for P pictures: padded luma plane + luma pyramid ->
    (size_map, mode_map, pred_map, mvx_map, mvy_map).

    use_pallas: None = auto (TPU backend / X266T_PALLAS); the Pallas
    path warps full MC frames once per MV field and turns all per-block
    prediction gathers into reshapes — bit-identical decisions.
    """
    uy, ux = cfg.units_y, cfg.units_x
    lam = np.float32(cfg.lambda_mode)
    pallas = kme.use_pallas_me(use_pallas) and cfg.bit_depth == 8

    def _rep2(g, by, bx):
        """2x2-replicate the even-index subgrid back to (by, bx)."""
        r = jnp.repeat(jnp.repeat(g[0::2, 0::2], 2, axis=0), 2, axis=1)
        return r[:by, :bx]

    def run(plane, pyr_y):
        plane = plane.astype(jnp.int32)
        mv_grid = kme.me_search(
            plane[1:1 + cfg.height, 1:1 + cfg.width], pyr_y, cfg,
            float(cfg.lambda_mode), use_pallas=use_pallas)

        warp = {}
        if pallas:
            from x266_tpu.kernels import me_pallas
            by, bx = mv_grid.shape[:2]
            left = mv_grid[:, np.maximum(np.arange(bx) - 1, 0)]
            above = mv_grid[np.maximum(np.arange(by) - 1, 0), :]
            fields = [mv_grid, left, above]
            if cfg.max_cu_size >= 32:
                fields += [_rep2(f, by, bx) for f in fields]
            frames = me_pallas.warp_frames(
                pyr_y, jnp.stack(fields), cfg.height, cfg.width)
            warp[8] = warp[16] = (frames[0], frames[1], frames[2])
            if cfg.max_cu_size >= 32:
                warp[32] = (frames[3], frames[4], frames[5])

        per_size = {}
        for s in (8, 16, 32):
            if s > cfg.max_cu_size:
                continue
            cost_intra, mode_intra = _eval_size(plane, s, cfg,
                                                inter_slice=True)
            c_int, mvx, mvy, c_skip, midx = _inter_cost(
                cfg, plane, pyr_y, mv_grid, s, warp.get(s))
            valid = jnp.isfinite(cost_intra)
            c_int = jnp.where(valid, c_int, jnp.inf)
            c_skip = jnp.where(valid, c_skip, jnp.inf)
            best = jnp.minimum(jnp.minimum(cost_intra, c_int), c_skip)
            kind = jnp.where(
                c_skip <= jnp.minimum(cost_intra, c_int), PRED_SKIP,
                jnp.where(c_int < cost_intra, PRED_INTER, PRED_INTRA)
            ).astype(jnp.int32)
            if cfg.merge_cands:
                # skip CUs carry merge_idx in the mvx map slot (the
                # explicit MV is unused there; FORMAT.md §7)
                mvx = jnp.where(kind == PRED_SKIP, midx, mvx)
                mvy = jnp.where(kind == PRED_SKIP, 0, mvy)
            per_size[s] = (best, mode_intra, kind, mvx, mvy)

        size_map = jnp.full((uy, ux), 8, jnp.int32)
        b8, m8, k8, x8, y8 = per_size[8]
        mode_map = m8.astype(jnp.int32)
        pred_map = k8
        mvx_map = x8
        mvy_map = y8
        best = b8
        for s in (16, 32):
            if s not in per_size:
                continue
            bs, ms, ks, xs_, ys_ = per_size[s]
            child = _sum_children(best, *bs.shape) + lam * SPLIT_BITS
            use = bs <= child
            sel = _upsample(use, s // 8, uy, ux)
            size_map = jnp.where(sel, s, size_map)
            mode_map = jnp.where(sel, _upsample(ms, s // 8, uy, ux),
                                 mode_map)
            pred_map = jnp.where(sel, _upsample(ks, s // 8, uy, ux),
                                 pred_map)
            mvx_map = jnp.where(sel, _upsample(xs_, s // 8, uy, ux),
                                mvx_map)
            mvy_map = jnp.where(sel, _upsample(ys_, s // 8, uy, ux),
                                mvy_map)
            best = jnp.where(use, bs, child)

        return size_map, mode_map, pred_map, mvx_map, mvy_map

    return run


def _satd_s(a, b, s: int):
    """HM-style SATD8 over (B, s, s) blocks (8x8 Hadamard tiles)."""
    if s == 8:
        return kcost.satd(a, b)
    f = s // 8
    ar = a.reshape(-1, f, 8, f, 8).transpose(0, 1, 3, 2, 4)
    br = b.reshape(-1, f, 8, f, 8).transpose(0, 1, 3, 2, 4)
    return jnp.sum(kcost.satd(ar, br), axis=(1, 2))


@functools.cache
def _fwd_gain2(s: int, bit_depth: int) -> float:
    """Energy gain of the exact-int forward DCT2: ||T(r)||^2 ~= g2 *
    ||r||^2 (Parseval up to the integer-DCT row-norm scaling; constant
    per size, measured once numerically).  Lets the transform-domain
    quantization error rank candidates on the spatial-SSE scale."""
    rng = np.random.default_rng(7)
    r = rng.integers(-64, 64, (64, s, s)).astype(np.int32)
    with jax.ensure_compile_time_eval():
        c = np.asarray(ktx.forward_transform(jnp.asarray(r), s,
                                             bit_depth=bit_depth))
    return float(np.sum(c.astype(np.float64) ** 2)
                 / np.sum(r.astype(np.float64) ** 2))


def _b_candidates(cfg, plane, pyr0, pyr1, g0, g1, size,
                  warp0=None, warp1=None):
    """Explicit B-candidate (L0 / L1 / bi) + skip costs, all size-s
    blocks, with ONE full residual chain.

    TPU-first restructuring of the per-candidate RDO: the three MC
    predictions are ranked by SATD + lambda*mv-bits (the HM preselect
    metric) and only the winner runs the transform/quant/rate/recon
    chain — 3x less MXU work than chaining every candidate, at a
    sub-tolerance RD delta (gated by tests/test_rd.py).  Identical
    math on the warp (Pallas) and gather paths, so decisions stay
    backend-independent.

    Returns (cost_expl, kind_expl, mv0x, mv0y, mv1x, mv1y,
             cost_skip, midx) as (gy, gx) grids; kind_expl in
    {PRED_INTER, PRED_L1, PRED_BI}.  For kind PRED_L1 the (mv0x, mv0y)
    slots carry the L1 MV (the primary-MV convention of the maps).
    """
    w, h, s = cfg.width, cfg.height, size
    lam = np.float32(cfg.lambda_mode)
    xs_np, ys_np, gy, gx = _block_positions(w, h, s)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    nb = xs_np.shape[0]
    m_y = (ys_np // kme.ME_BLOCK).astype(np.int32)
    m_x = (xs_np // kme.ME_BLOCK).astype(np.int32)
    mv0 = g0[m_y, m_x]
    mv1 = g1[m_y, m_x]
    mvl0 = g0[m_y, np.maximum(m_x - 1, 0)]
    mvl1 = g1[m_y, np.maximum(m_x - 1, 0)]
    mva0 = g0[np.maximum(m_y - 1, 0), m_x]

    orig = _block_gather(plane, gy, gx, s)

    if warp0 is not None:
        p0 = _blockify(warp0[0], gy, gx, s)
        p_skl = _blockify(warp0[1], gy, gx, s)
        p_ska = _blockify(warp0[2], gy, gx, s)
        p1 = _blockify(warp1, gy, gx, s)
    else:
        def mc(pyr):
            return jax.vmap(lambda x, y, m: interp.mc_block(
                pyr, x, y, m[0], m[1], s))

        p0 = mc(pyr0)(xs, ys, mv0)
        p_skl = mc(pyr0)(xs, ys, mvl0)
        p_ska = mc(pyr0)(xs, ys, mva0)
        p1 = mc(pyr1)(xs, ys, mv1)
    pbi = (p0 + p1 + 1) >> 1
    rp = interp.REF_PAD
    p_zero = _blockify(pyr0[0, rp:rp + h, rp:rp + w], gy, gx, s)

    def mvbits(mv, pred):
        return jnp.sum(2.0 + 2.0 * jnp.log2(
            jnp.abs(mv - pred).astype(jnp.float32) + 1.0), axis=1)

    bits0 = mvbits(mv0, mvl0) + 3.0
    bits1 = mvbits(mv1, mvl1) + 3.0
    bitsbi = mvbits(mv0, mvl0) + mvbits(mv1, mvl1) + 6.0

    # skip distortion: worst case over the derivable shapes (see
    # _inter_cost docstring)
    sse_l = kcost.sse(p_skl, orig)
    sse_a = kcost.sse(p_ska, orig)
    sse_z = kcost.sse(p_zero, orig)
    if cfg.merge_cands:
        d_c0 = jnp.maximum(jnp.maximum(sse_l, sse_a), sse_z)
        d_c1 = jnp.maximum(sse_a, sse_z)
        midx = (d_c1 < d_c0).astype(jnp.int32)
        dist_s = jnp.minimum(d_c0, d_c1)
    else:
        midx = jnp.zeros(sse_l.shape, jnp.int32)
        dist_s = jnp.maximum(jnp.maximum(sse_l, sse_a), sse_z)

    bdp = cfg.bit_depth
    if cfg.lossless:
        # rate IS the cost: the per-candidate ranking is exact
        rates = [kcost.rate_estimate_levels(orig - p)
                 for p in (p0, p1, pbi)]
        pre = jnp.stack([lam * (r + b) for r, b in
                         zip(rates, (bits0, bits1, bitsbi))], axis=1)
        kind_pre = jnp.argmin(pre, axis=1).astype(jnp.int32)
        cost = jnp.min(pre, axis=1)
        cost_s = jnp.full_like(dist_s, jnp.inf)
    else:
        # Transform-domain ranking: fwd + quant + rate for every
        # candidate (exact rate; distortion = quantization error via
        # Parseval / _fwd_gain2) — only the winner pays the inverse
        # transform + reconstruction (the other ~half of the chain).
        g2 = np.float32(_fwd_gain2(s, bdp))
        cands = []
        for p, b in ((p0, bits0), (p1, bits1), (pbi, bitsbi)):
            res = (orig - p).reshape(nb, s, s)
            coefs = ktx.forward_transform(res, s, bit_depth=bdp)
            levels = kquant.quantize(coefs, cfg.qp, s, bdp)
            rate = kcost.rate_estimate_levels(levels)
            deq = kquant.dequantize(levels, cfg.qp, s, bdp)
            dt = jnp.sum((coefs - deq).astype(jnp.float32) ** 2,
                         axis=(-2, -1)) / g2
            cands.append((deq, dt + lam * (rate + b), rate + b))
        pre = jnp.stack([c[1] for c in cands], axis=1)     # (B, 3)
        kind_pre = jnp.argmin(pre, axis=1).astype(jnp.int32)
        sel3 = kind_pre[:, None, None]
        deq = jnp.where(sel3 == 0, cands[0][0],
                        jnp.where(sel3 == 1, cands[1][0], cands[2][0]))
        rb = jnp.where(kind_pre == 0, cands[0][2],
                       jnp.where(kind_pre == 1, cands[1][2],
                                 cands[2][2]))
        pred = jnp.where(sel3 == 0, p0, jnp.where(sel3 == 1, p1, pbi))
        rres = ktx.inverse_transform(deq, s, bit_depth=bdp)
        recon = jnp.clip(pred + rres, 0, cfg.max_val)
        cost = kcost.sse(recon, orig) + lam * rb
        cost_s = dist_s + lam * 2.0

    kind_expl = jnp.where(kind_pre == 0, PRED_INTER,
                          jnp.where(kind_pre == 1, PRED_L1, PRED_BI))
    # primary MV: L0's for INTER/BI, L1's for PRED_L1
    pmx = jnp.where(kind_pre == 1, mv1[:, 0], mv0[:, 0])
    pmy = jnp.where(kind_pre == 1, mv1[:, 1], mv0[:, 1])
    smx = jnp.where(kind_pre == 2, mv1[:, 0], 0)
    smy = jnp.where(kind_pre == 2, mv1[:, 1], 0)
    g = lambda v: v.reshape(gy, gx)                     # noqa: E731
    return (g(cost), g(kind_expl), g(pmx), g(pmy), g(smx), g(smy),
            g(cost_s), g(midx))


def _bi_cost(cfg, plane, pyr0, pyr1, g0, g1, size, warped=None):
    """Bi-prediction candidate cost: pred = (mc_L0 + mc_L1 + 1) >> 1.

    Returns (cost_bi, mv0x, mv0y, mv1x, mv1y) as (gy, gx) grids.
    """
    w, h, s = cfg.width, cfg.height, size
    lam = np.float32(cfg.lambda_mode)
    xs_np, ys_np, gy, gx = _block_positions(w, h, s)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    nb = xs_np.shape[0]
    m_y = (ys_np // kme.ME_BLOCK).astype(np.int32)
    m_x = (xs_np // kme.ME_BLOCK).astype(np.int32)
    mv0 = g0[m_y, m_x]
    mv1 = g1[m_y, m_x]
    l0 = g0[m_y, np.maximum(m_x - 1, 0)]
    l1 = g1[m_y, np.maximum(m_x - 1, 0)]

    orig = _block_gather(plane, gy, gx, s)

    if warped is not None:
        p0 = _blockify(warped[0], gy, gx, s)
        p1 = _blockify(warped[1], gy, gx, s)
    else:
        def mc(pyr):
            return jax.vmap(lambda x, y, m: interp.mc_block(
                pyr, x, y, m[0], m[1], s))

        p0 = mc(pyr0)(xs, ys, mv0)
        p1 = mc(pyr1)(xs, ys, mv1)
    pred = (p0 + p1 + 1) >> 1

    res = orig - pred
    bits = (jnp.sum(2.0 + 2.0 * jnp.log2(
        jnp.abs(mv0 - l0).astype(jnp.float32) + 1.0), axis=1)
        + jnp.sum(2.0 + 2.0 * jnp.log2(
            jnp.abs(mv1 - l1).astype(jnp.float32) + 1.0), axis=1))
    if cfg.lossless:
        rate = kcost.rate_estimate_levels(res)
        cost = lam * (rate + bits + 6.0)
    else:
        bdp = cfg.bit_depth
        coefs = ktx.forward_transform(res.reshape(nb, s, s), s,
                                      bit_depth=bdp)
        levels = kquant.quantize(coefs, cfg.qp, s, bdp)
        rate = kcost.rate_estimate_levels(levels)
        deq = kquant.dequantize(levels, cfg.qp, s, bdp)
        rres = ktx.inverse_transform(deq, s, bit_depth=bdp)
        recon = jnp.clip(pred + rres, 0, cfg.max_val)
        cost = kcost.sse(recon, orig) + lam * (rate + bits + 6.0)

    return (cost.reshape(gy, gx),
            mv0[:, 0].reshape(gy, gx), mv0[:, 1].reshape(gy, gx),
            mv1[:, 0].reshape(gy, gx), mv1[:, 1].reshape(gy, gx))


@functools.cache
def make_mode_decision_b_raw(cfg: CodecConfig,
                             use_pallas: bool | None = None):
    """Pass A for B pictures: padded luma plane + L0/L1 luma pyramids ->
    (size_map, mode_map, pred_map, mvx_map, mvy_map, mvx1_map,
    mvy1_map).

    Per CU the candidates are intra, inter-L0, inter-L1, bi-prediction
    and skip (L0 + derived MV, as in P).  The primary MV maps carry the
    L0 MV for kinds {INTER, SKIP, BI} and the L1 MV for PRED_L1; the
    mv1 maps carry BI's L1 MV.
    """
    uy, ux = cfg.units_y, cfg.units_x
    lam = np.float32(cfg.lambda_mode)
    pallas = kme.use_pallas_me(use_pallas) and cfg.bit_depth == 8

    def _rep2(g, by, bx):
        r = jnp.repeat(jnp.repeat(g[0::2, 0::2], 2, axis=0), 2, axis=1)
        return r[:by, :bx]

    def run(plane, pyr0_y, pyr1_y):
        plane = plane.astype(jnp.int32)
        cur = plane[1:1 + cfg.height, 1:1 + cfg.width]
        g0 = kme.me_search(cur, pyr0_y, cfg, float(cfg.lambda_mode),
                           use_pallas=use_pallas)
        g1 = kme.me_search(cur, pyr1_y, cfg, float(cfg.lambda_mode),
                           use_pallas=use_pallas)

        warp0, warp1 = {}, {}
        if pallas:
            from x266_tpu.kernels import me_pallas
            by, bx = g0.shape[:2]
            left0 = g0[:, np.maximum(np.arange(bx) - 1, 0)]
            above0 = g0[np.maximum(np.arange(by) - 1, 0), :]
            f0 = [g0, left0, above0]
            f1 = [g1]
            if cfg.max_cu_size >= 32:
                f0 += [_rep2(f, by, bx) for f in f0]
                f1 += [_rep2(g1, by, bx)]
            fr0 = me_pallas.warp_frames(pyr0_y, jnp.stack(f0),
                                        cfg.height, cfg.width)
            fr1 = me_pallas.warp_frames(pyr1_y, jnp.stack(f1),
                                        cfg.height, cfg.width)
            warp0[8] = warp0[16] = (fr0[0], fr0[1], fr0[2])
            warp1[8] = warp1[16] = fr1[0]
            if cfg.max_cu_size >= 32:
                warp0[32] = (fr0[3], fr0[4], fr0[5])
                warp1[32] = fr1[1]

        per_size = {}
        for s in (8, 16, 32):
            if s > cfg.max_cu_size:
                continue
            cost_intra, mode_intra = _eval_size(plane, s, cfg,
                                                inter_slice=True)
            w0 = warp0.get(s)
            w1 = warp1.get(s)
            (c_expl, kind_expl, pmx, pmy, smx, smy, c_skip,
             midx) = _b_candidates(cfg, plane, pyr0_y, pyr1_y, g0, g1,
                                   s, w0, w1)
            valid = jnp.isfinite(cost_intra)
            inf = jnp.inf
            c_expl = jnp.where(valid, c_expl, inf)
            c_skip = jnp.where(valid, c_skip, inf)
            kind = jnp.where(
                c_skip <= jnp.minimum(cost_intra, c_expl), PRED_SKIP,
                jnp.where(c_expl < cost_intra, kind_expl, PRED_INTRA)
            ).astype(jnp.int32)
            best = jnp.minimum(jnp.minimum(cost_intra, c_expl), c_skip)
            if cfg.merge_cands:
                # skip carries merge_idx in the primary-MV x slot
                pmx = jnp.where(kind == PRED_SKIP, midx, pmx)
                pmy = jnp.where(kind == PRED_SKIP, 0, pmy)
            smx = jnp.where(kind == PRED_BI, smx, 0)
            smy = jnp.where(kind == PRED_BI, smy, 0)
            per_size[s] = (best, mode_intra, kind, pmx, pmy, smx, smy)

        size_map = jnp.full((uy, ux), 8, jnp.int32)
        b8, m8, k8, x8, y8, sx8, sy8 = per_size[8]
        mode_map = m8.astype(jnp.int32)
        pred_map = k8
        mvx_map, mvy_map = x8, y8
        mvx1_map, mvy1_map = sx8, sy8
        best = b8
        for s in (16, 32):
            if s not in per_size:
                continue
            bs, ms, ks, xs_, ys_, sxs, sys_ = per_size[s]
            child = _sum_children(best, *bs.shape) + lam * SPLIT_BITS
            use = bs <= child
            sel = _upsample(use, s // 8, uy, ux)
            size_map = jnp.where(sel, s, size_map)
            mode_map = jnp.where(sel, _upsample(ms, s // 8, uy, ux),
                                 mode_map)
            pred_map = jnp.where(sel, _upsample(ks, s // 8, uy, ux),
                                 pred_map)
            mvx_map = jnp.where(sel, _upsample(xs_, s // 8, uy, ux),
                                mvx_map)
            mvy_map = jnp.where(sel, _upsample(ys_, s // 8, uy, ux),
                                mvy_map)
            mvx1_map = jnp.where(sel, _upsample(sxs, s // 8, uy, ux),
                                 mvx1_map)
            mvy1_map = jnp.where(sel, _upsample(sys_, s // 8, uy, ux),
                                 mvy1_map)
            best = jnp.where(use, bs, child)

        return (size_map, mode_map, pred_map, mvx_map, mvy_map,
                mvx1_map, mvy1_map)

    return run


def select_recon_inter_impl(cfg: CodecConfig, encode: bool,
                            b_mode: bool = False):
    """P/B-picture recon implementation selector (mirrors
    engine.recon.select_recon_impl): the Pallas kernel on the TPU
    backend (X266T_PALLAS=0 disables / =1 forces), the XLA scan
    otherwise.  Both are bit-exact (tests/test_recon_pallas.py)."""
    import os

    flag = os.environ.get("X266T_PALLAS")
    use_pallas = (jax.default_backend() == "tpu" if flag is None
                  else flag != "0")
    if use_pallas and cfg.bit_depth == 8 \
            and not cfg.sign_data_hiding \
            and not cfg.dep_quant:          # 10-bit/SDH/DQ: XLA scan
        from x266_tpu.engine.recon_pallas import (
            make_recon_inter_pallas_raw)
        return make_recon_inter_pallas_raw(cfg, encode, b_mode=b_mode)
    return make_recon_inter_raw(cfg, encode, b_mode=b_mode)


@functools.cache
def make_recon_inter_raw(cfg: CodecConfig, encode: bool,
                         b_mode: bool = False):
    """P/B-picture reconstruction scan.

    encode: f(srcY_pad, srcCb_pad, srcCr_pad, size_map, mode_map,
             mts_map, pred_map, mvx_map, mvy_map, pyr_y, pyr_cb, pyr_cr
             [, pyr1_y, pyr1_cb, pyr1_cr, mvx1_map, mvy1_map])
    decode: f(coefY, coefCb, coefCr, ...same maps/pyramids...)
    returns (y u8, cb u8, cr u8, coefY i16, coefCb i16, coefCr i16,
             mvx_final i16, mvy_final i16)   [final MVs incl. derived
             skip MVs, needed by the encoder's entropy walker]

    b_mode adds the L1 reference: pred_map kinds gain PRED_L1 (MC from
    the L1 pyramid with the primary MV) and PRED_BI (average of L0 at
    the primary MV and L1 at (mvx1, mvy1): (p0 + p1 + 1) >> 1).  The
    primary MV maps/state rules are unchanged, so P behavior and skip
    derivation are identical.
    """
    w, h = cfg.width, cfg.height
    cw, ch = w // 2, h // 2
    ux_n, uy_n = cfg.units_x, cfg.units_y
    cx_n, cy_n = cfg.ctus_x, cfg.ctus_y
    n_ctu = cx_n * cy_n
    qp = cfg.qp
    lossless = cfg.lossless
    n_modes = cfg.n_pred_modes
    n_std = cfg.n_intra_modes
    use_mip = cfg.mip
    use_mts = cfg.mts
    use_ts = cfg.transform_skip
    # NOTE: an apparent RDOQ-on-inter quality collapse (-1.7 dB on the
    # lowdelay_p RD clip) was actually the optimistic skip proxy being
    # tickled by perturbed references (_inter_cost docstring); with the
    # worst-case skip distortion it measures -11% bits +0.6 dB there.
    rdoq_lam = cfg.lambda_mode if (cfg.rdoq and encode) else None
    sdh_on = cfg.sign_data_hiding
    dq_on = cfg.dep_quant
    mid = cfg.mid_val

    # reference-substitution mask tables (C6, shared rule with the
    # intra scan — engine.recon; P/B slices infer bt=0 so only the
    # square z-order tables apply)
    use_subst = cfg.ref_substitute
    if use_subst:
        from x266_tpu.engine import availability as avail
        sizes = [s for s in (8, 16, 32) if s <= cfg.max_cu_size]
        tabL = {s: np.asarray(avail.ref_masks(w, h, s)) for s in sizes}
        tabC = {s // 2: np.asarray(avail.ref_masks(w, h, s // 2,
                                                   scale=2))
                for s in sizes}

    def _mask_at(tab, by, bx):
        r = tab.shape[-1]
        return jax.lax.dynamic_slice(jnp.asarray(tab), (by, bx, 0),
                                     (1, 1, r))[0, 0]

    def run(a, b, c, size_map, mode_map, mts_map, pred_map, mvx_map,
            mvy_map, pyr_y, pyr_cb, pyr_cr, pyr1_y=None, pyr1_cb=None,
            pyr1_cr=None, mvx1_map=None, mvy1_map=None):
        a = a.astype(jnp.int32)
        b = b.astype(jnp.int32)
        c = c.astype(jnp.int32)
        if encode:
            srcY, srcCb, srcCr = a, b, c
            coefY = jnp.zeros((h, w), jnp.int32)
            coefCb = jnp.zeros((ch, cw), jnp.int32)
            coefCr = jnp.zeros((ch, cw), jnp.int32)
        else:
            coefY, coefCb, coefCr = a, b, c
            srcY = srcCb = srcCr = None
        yP = jnp.full((1 + h + PAD, 1 + w + PAD), cfg.mid_val,
                      jnp.int32)
        cbP = jnp.full((1 + ch + PAD, 1 + cw + PAD), cfg.mid_val,
                       jnp.int32)
        crP = jnp.full((1 + ch + PAD, 1 + cw + PAD), cfg.mid_val,
                       jnp.int32)
        mvx_st = jnp.zeros((uy_n, ux_n), jnp.int32)
        mvy_st = jnp.zeros((uy_n, ux_n), jnp.int32)

        def derive_mv(ux, uy):
            uxl = jnp.maximum(ux - 1, 0)
            uyl = jnp.maximum(uy - 1, 0)
            left_ok = (ux > 0) & _coded_mv(pred_map[uy, uxl])
            above_ok = (uy > 0) & ((uy & 7) != 0) \
                & _coded_mv(pred_map[uyl, ux])
            mvx = jnp.where(left_ok, mvx_st_ref[0][uy, uxl],
                            jnp.where(above_ok, mvx_st_ref[0][uyl, ux],
                                      0))
            mvy = jnp.where(left_ok, mvy_st_ref[0][uy, uxl],
                            jnp.where(above_ok, mvy_st_ref[0][uyl, ux],
                                      0))
            return mvx, mvy

        # mutable closure cell for the state planes inside branches
        mvx_st_ref = [mvx_st]
        mvy_st_ref = [mvy_st]

        maxv = cfg.max_val
        bdv = cfg.bit_depth

        def residual_path(pred, src, coefp, x, y, s, mts_idx, skip):
            """Shared lossy/lossless residual handling for one block."""
            if encode:
                orig = jax.lax.dynamic_slice(src, (y + 1, x + 1), (s, s))
                if lossless:
                    lev = jnp.where(skip, 0, orig - pred)
                    rec = jnp.where(skip, pred, orig)
                    return jnp.clip(rec, 0, maxv), lev
                res = orig - pred
                lev = _fwd_mts(res, s, qp, mts_idx, use_mts, rdoq_lam,
                               use_ts, bdv, sdh=sdh_on, dq=dq_on)
                lev = jnp.where(skip, 0, lev)
                rres = _inv_mts(lev, s, qp, mts_idx, use_mts, use_ts,
                                bdv, dq=dq_on)
                return jnp.clip(pred + rres, 0, maxv), lev
            else:
                lev = jax.lax.dynamic_slice(coefp, (y, x), (s, s))
                if lossless:
                    return jnp.clip(pred + lev, 0, maxv), lev
                rres = _inv_mts(lev, s, qp, mts_idx, use_mts, use_ts,
                                bdv, dq=dq_on)
                return jnp.clip(pred + rres, 0, maxv), lev

        def make_branch(s):
            cs = s // 2
            u = s // 8

            def branch(args):
                yP, cbP, crP, cY, cCb, cCr, mvxs, mvys, ux, uy = args
                mvx_st_ref[0] = mvxs
                mvy_st_ref[0] = mvys
                x = ux * 8
                y = uy * 8
                mode = mode_map[uy, ux]
                mode_c = (jnp.where(mode >= n_std, 0, mode)
                          if use_mip else mode)
                kind = pred_map[uy, ux]
                mts_idx = (mts_map[uy, ux] if (use_mts or use_ts)
                           else None)
                skip = kind == PRED_SKIP
                dx, dy = derive_mv(ux, uy)
                if cfg.merge_cands:
                    if encode:
                        # candidate 1: the above rule; merge_idx rides
                        # the (otherwise unused) skip mvx slot
                        uyl = jnp.maximum(uy - 1, 0)
                        a_ok = ((uy > 0) & ((uy & 7) != 0)
                                & _coded_mv(pred_map[uyl, ux]))
                        ax = jnp.where(a_ok, mvx_st_ref[0][uyl, ux], 0)
                        ay = jnp.where(a_ok, mvy_st_ref[0][uyl, ux], 0)
                        use1 = mvx_map[uy, ux] == 1
                        dx = jnp.where(use1, ax, dx)
                        dy = jnp.where(use1, ay, dy)
                    else:
                        # decode: the entropy walker already resolved
                        # the candidate into the MV maps
                        dx = mvx_map[uy, ux]
                        dy = mvy_map[uy, ux]
                mvx = jnp.where(skip, dx, mvx_map[uy, ux])
                mvy = jnp.where(skip, dy, mvy_map[uy, ux])
                is_inter = kind != PRED_INTRA
                if b_mode:
                    is_l1 = kind == PRED_L1
                    is_bi = kind == PRED_BI
                    m1x = jnp.where(is_bi, mvx1_map[uy, ux], mvx)
                    m1y = jnp.where(is_bi, mvy1_map[uy, ux], mvy)

                def mc2(pyr0, pyr1, px, py, pmx, pmy, cmx, cmy, ss):
                    p0 = interp.mc_block(pyr0, px, py, pmx, pmy, ss)
                    if not b_mode:
                        return p0
                    p1 = interp.mc_block(pyr1, px, py, cmx, cmy, ss)
                    return jnp.where(
                        is_bi, (p0 + p1 + 1) >> 1,
                        jnp.where(is_l1, p1, p0))

                # luma prediction: intra refs or MC gather
                ref = _gather_ref(yP, x, y, s)
                if use_subst:
                    ml = _mask_at(tabL[s], uy // (s // 8),
                                  ux // (s // 8))
                    ref = kintra.substitute_refs(ref, ml, mid)
                pred_i = kintra.predict_mode(ref, mode, s, n_modes,
                                             pdpc=kintra._pdpc_on(
                                                 cfg.pdpc, s),
                                             left_ok=x > 0, top_ok=y > 0)
                pred_m = mc2(pyr_y, pyr1_y, x, y, mvx, mvy,
                             m1x if b_mode else mvx,
                             m1y if b_mode else mvy, s)
                pred = jnp.where(is_inter, pred_m, pred_i)
                # inter CUs never use MTS (mts_map is 0 there)
                rec, lev = residual_path(pred, srcY, cY, x, y, s,
                                         mts_idx, skip)
                yP = jax.lax.dynamic_update_slice(yP, rec,
                                                  (y + 1, x + 1))
                cY = jax.lax.dynamic_update_slice(cY, lev, (y, x))

                xc, yc = x // 2, y // 2
                cmx, cmy = mvx >> 1, mvy >> 1
                refb = _gather_ref(cbP, xc, yc, cs)
                if use_subst:
                    mc_ = _mask_at(tabC[cs], yc // cs, xc // cs)
                    refb = kintra.substitute_refs(refb, mc_, mid)
                pb_i = kintra.predict_mode(refb, mode_c, cs, n_modes)
                pb_m = mc2(pyr_cb, pyr1_cb, xc, yc, cmx, cmy,
                           (m1x >> 1) if b_mode else cmx,
                           (m1y >> 1) if b_mode else cmy, cs)
                pb = jnp.where(is_inter, pb_m, pb_i)
                recb, levb = residual_path(pb, srcCb, cCb, xc, yc, cs,
                                           None if not use_mts else
                                           jnp.int32(0), skip)
                cbP = jax.lax.dynamic_update_slice(cbP, recb,
                                                   (yc + 1, xc + 1))
                cCb = jax.lax.dynamic_update_slice(cCb, levb, (yc, xc))

                refr = _gather_ref(crP, xc, yc, cs)
                if use_subst:
                    refr = kintra.substitute_refs(refr, mc_, mid)
                pr_i = kintra.predict_mode(refr, mode_c, cs, n_modes)
                pr_m = mc2(pyr_cr, pyr1_cr, xc, yc, cmx, cmy,
                           (m1x >> 1) if b_mode else cmx,
                           (m1y >> 1) if b_mode else cmy, cs)
                pr = jnp.where(is_inter, pr_m, pr_i)
                recr, levr = residual_path(pr, srcCr, cCr, xc, yc, cs,
                                           None if not use_mts else
                                           jnp.int32(0), skip)
                crP = jax.lax.dynamic_update_slice(crP, recr,
                                                   (yc + 1, xc + 1))
                cCr = jax.lax.dynamic_update_slice(cCr, levr, (yc, xc))

                # record the CU's final MV over its units
                blkx = jnp.broadcast_to(mvx, (u, u)).astype(jnp.int32)
                blky = jnp.broadcast_to(mvy, (u, u)).astype(jnp.int32)
                mvxs = jax.lax.dynamic_update_slice(mvxs, blkx, (uy, ux))
                mvys = jax.lax.dynamic_update_slice(mvys, blky, (uy, ux))
                return yP, cbP, crP, cY, cCb, cCr, mvxs, mvys

            return branch

        branches = [make_branch(8), make_branch(16), make_branch(32)]

        def unit_body(z, carry):
            yP, cbP, crP, cY, cCb, cCr, mvxs, mvys, cx, cy = carry
            zx = (z & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
            zy = ((z >> 1) & 1) | (((z >> 3) & 1) << 1) \
                | (((z >> 5) & 1) << 2)
            ux = cx * 8 + zx
            uy = cy * 8 + zy
            inb = (ux < ux_n) & (uy < uy_n)
            uxc = jnp.minimum(ux, ux_n - 1)
            uyc = jnp.minimum(uy, uy_n - 1)
            sz = size_map[uyc, uxc]
            units = sz >> 3
            origin = ((ux & (units - 1)) == 0) & ((uy & (units - 1)) == 0)
            code = (sz == 16).astype(jnp.int32) \
                + 2 * (sz == 32).astype(jnp.int32)

            def do(ops):
                return jax.lax.switch(code, branches, ops)

            ops = (yP, cbP, crP, cY, cCb, cCr, mvxs, mvys, uxc, uyc)
            out = jax.lax.cond(inb & origin, do, lambda o: o[:8], ops)
            return (*out, cx, cy)

        def ctu_body(carry, ctu_idx):
            cy = ctu_idx // cx_n
            cx = ctu_idx % cx_n
            state = (*carry, cx, cy)
            state = jax.lax.fori_loop(0, 64, unit_body, state)
            return state[:8], None

        carry = (yP, cbP, crP, coefY, coefCb, coefCr, mvx_st, mvy_st)
        carry, _ = jax.lax.scan(ctu_body, carry, jnp.arange(n_ctu))
        y8 = carry[0][1:1 + h, 1:1 + w].astype(jnp.uint8)
        cb8 = carry[1][1:1 + ch, 1:1 + cw].astype(jnp.uint8)
        cr8 = carry[2][1:1 + ch, 1:1 + cw].astype(jnp.uint8)
        return (y8, cb8, cr8, carry[3].astype(jnp.int16),
                carry[4].astype(jnp.int16), carry[5].astype(jnp.int16),
                carry[6].astype(jnp.int16), carry[7].astype(jnp.int16))

    return run
