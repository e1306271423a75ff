"""Pass B: normative reconstruction scan (C6/C10/C11/C12 + decode C18).

The single piece of intra coding that is inherently sequential: each TU's
prediction reads previously reconstructed neighbors.  Expressed as a
``lax.scan`` over CTUs in raster order with a ``fori_loop`` over the 64
z-ordered 8x8 units per CTU; at each TU origin a 3-way ``lax.switch``
(static sizes 8/16/32) runs predict -> [transform -> quant] -> dequant ->
inverse -> clip and writes the reconstruction back into the padded plane.

ENCODER and DECODER run this same function (mode="encode" computes the
coded levels from original pixels; mode="decode" consumes parsed levels),
so encode->decode reconstruction is bit-exact by construction — the
SURVEY.md §4 integration gate.  Availability rule: planes are initialized
to 128 and written in coding order, so any reference read of a
not-yet-coded or out-of-picture position yields 128 deterministically
(specmodel.intra docstring).

Chroma (4:2:0) rides the same scan: TU size s/2 at (x/2, y/2) with the
derived (DM) mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.engine.mode_decision import PAD
from x266_tpu.kernels import intra as kintra
from x266_tpu.kernels import quant as kquant
from x266_tpu.kernels import transforms as ktx


def _gather_ref(plane, x, y, s):
    row = jax.lax.dynamic_slice(plane, (y, x), (1, 2 * s + 1))[0]
    col = jax.lax.dynamic_slice(plane, (y + 1, x), (2 * s, 1))[:, 0]
    return jnp.concatenate([row, col])


def cclm_pred(yP, cP, xc, yc, cs, maxv):
    """CCLM chroma prediction (C6, VVC-shaped; FORMAT.md §7).

    yP: padded luma RECON plane with this CU's luma already written
    (the luma TU precedes the chroma TUs in the scan); cP: padded
    chroma recon plane; (xc, yc): chroma TU origin in picture coords;
    cs: chroma TU size.  Model: 4 boundary (luma_ds, chroma) pairs
    (2 top, 2 left at 1/4 and 3/4), alpha from the min/max-luma pair
    in 6-bit fixed point via integer division (deterministic on both
    sides — self-consistent, no VVC LUT), beta anchored at the min.
    Out-of-picture neighbors read the mid-gray padding (the x266t
    availability rule; dynamic_slice clamps negative starts).
    """
    lum = jax.lax.dynamic_slice(yP, (2 * yc + 1, 2 * xc + 1),
                                (2 * cs, 2 * cs))
    ds = (lum[0::2, 0::2] + lum[1::2, 0::2]
          + lum[0::2, 1::2] + lum[1::2, 1::2] + 2) >> 2

    def c_at(py, px):
        return jax.lax.dynamic_slice(cP, (py, px), (1, 1))[0, 0]

    def l_ds_at(py, px):
        blk = jax.lax.dynamic_slice(yP, (py + 1, px + 1), (2, 2))
        return (blk[0, 0] + blk[0, 1] + blk[1, 0] + blk[1, 1] + 2) >> 2

    d0, d1 = cs // 4, (3 * cs) // 4
    cands_c = jnp.stack([c_at(yc, xc + 1 + d0), c_at(yc, xc + 1 + d1),
                         c_at(yc + 1 + d0, xc), c_at(yc + 1 + d1, xc)])
    cands_l = jnp.stack([l_ds_at(2 * yc - 2, 2 * (xc + d0)),
                         l_ds_at(2 * yc - 2, 2 * (xc + d1)),
                         l_ds_at(2 * (yc + d0), 2 * xc - 2),
                         l_ds_at(2 * (yc + d1), 2 * xc - 2)])
    imin = jnp.argmin(cands_l)
    imax = jnp.argmax(cands_l)
    lmin, lmax = cands_l[imin], cands_l[imax]
    cmin, cmax = cands_c[imin], cands_c[imax]
    alpha = jnp.clip(((cmax - cmin) << 6)
                     // jnp.maximum(lmax - lmin, 1), -512, 511)
    beta = cmin - ((alpha * lmin + 32) >> 6)
    return jnp.clip(((alpha * ds + 32) >> 6) + beta, 0, maxv)


# mts_map value signalling transform skip (C10); stable across profiles
# (the branch index is remapped per the active candidate list below).
TS_IDX = 5


def _fwd_mts(res, s, qp, mts_idx, use_mts, rdoq_lam=None,
             use_ts=False, bd=8, lfnst=None, sdh=False, dq=False):
    """Forward transform + quant with per-TU MTS/TS selection (luma).
    rdoq_lam: pixel-domain lambda enabling RDOQ (encoder-only), or None
    for the hard deadzone quantizer.  use_ts adds the transform-skip
    branch (mts_idx == TS_IDX): coef = res << transform_shift.
    lfnst: (lfnst_idx, mode, n_modes) traced scalars applying the
    secondary transform on the DCT2 branch's low 4x4 (C10).
    sdh: enforce sign-data-hiding parity on the quantized levels
    (C11; every branch, so the walkers can hide signs uniformly)."""
    def q(coefs):
        if dq:
            # round-5: the exact Viterbi trellis replaced the greedy
            # per-state choice (VERDICT r04 item 2)
            lv = kquant.dq_quantize_trellis(
                coefs, qp, s, float(rdoq_lam) if rdoq_lam
                else _dq_lam(qp), bd)
        elif rdoq_lam is not None:
            lv = kquant.rd_quantize(coefs, qp, s, rdoq_lam, bd)
        else:
            lv = kquant.quantize(coefs, qp, s, bd)
        if sdh:
            lv = kquant.sdh_adjust(
                lv[0], s, coef=coefs[0], qp=qp, bit_depth=bd,
                lam=float(rdoq_lam) if rdoq_lam else None)[None]
        return lv

    def fwd0(r):
        c = ktx.forward_transform(r[None], s, bit_depth=bd)
        if lfnst is not None:
            from x266_tpu.kernels.lfnst import lfnst_fwd
            li, mode, n_modes = lfnst
            c = lfnst_fwd(c[0], mode, li, n_modes)[None]
        return q(c)[0]

    if not use_mts and not use_ts:
        return fwd0(res)
    combos = ktx.MTS_COMBOS if use_mts else ktx.MTS_COMBOS[:1]
    branches = [fwd0] + [
        (lambda r, tv=tv, th=th:
         q(ktx.forward_transform(r[None], s, tv, th, bd))[0])
        for (tv, th) in combos[1:]]
    idx = mts_idx
    if use_ts:
        tsh = 15 - bd - (s.bit_length() - 1)
        branches.append(lambda r: q((r << tsh)[None])[0])
        idx = jnp.where(mts_idx == TS_IDX, len(branches) - 1,
                        jnp.minimum(mts_idx, len(branches) - 2))
    return jax.lax.switch(idx, branches, res)


def _dq_lam(qp: int) -> float:
    """Default D+lambda*R weight for dq_quantize when RDOQ is off."""
    import math

    return 0.57 * math.pow(2.0, (qp - 12) / 3.0)


def _inv_mts(lev, s, qp, mts_idx, use_mts, use_ts=False, bd=8,
             lfnst=None, dq=False):
    def deq(lv):
        if dq:
            return kquant.dq_dequantize(lv, qp, s, bd)
        return kquant.dequantize(lv, qp, s, bd)

    def inv0(lv):
        d = deq(lv[None])
        if lfnst is not None:
            from x266_tpu.kernels.lfnst import lfnst_inv
            li, mode, n_modes = lfnst
            d = lfnst_inv(d[0], mode, li, n_modes)[None]
        return ktx.inverse_transform(d, s, bit_depth=bd)[0]

    if not use_mts and not use_ts:
        return inv0(lev)
    combos = ktx.MTS_COMBOS if use_mts else ktx.MTS_COMBOS[:1]
    branches = [inv0] + [
        (lambda lv, tv=tv, th=th:
         ktx.inverse_transform(deq(lv[None]), s, tv, th, bd)[0])
        for (tv, th) in combos[1:]]
    idx = mts_idx
    if use_ts:
        tsh = 15 - bd - (s.bit_length() - 1)
        rnd = (1 << (tsh - 1)) if tsh > 0 else 0
        branches.append(lambda lv: (deq(lv[None])[0] + rnd) >> tsh)
        idx = jnp.where(mts_idx == TS_IDX, len(branches) - 1,
                        jnp.minimum(mts_idx, len(branches) - 2))
    return jax.lax.switch(idx, branches, lev)


def _tu(plane, src, coef, x, y, mode, s, qp, encode, lossless,
        n_modes, mts_idx=None, pdpc=False, rdoq_lam=None,
        use_mts=False, use_ts=False, bd=8, pred_override=None,
        lfnst=None, sdh=False, dq=False, subst_mask=None):
    """One TU: returns (recon_block (s,s), coef_block (s,s)).
    mts_idx: traced scalar transform candidate (luma TUs, when cfg.mts
    or cfg.transform_skip; TS_IDX selects transform skip) or None.
    pred_override: (s, s) prediction replacing the mode predictor
    (CCLM chroma).  lfnst: (lfnst_idx, mode, n_modes) or None (C10).
    subst_mask: (4s+1,) bool availability vector enabling HEVC-style
    reference substitution (cfg.ref_substitute) on the gathered refs."""
    maxv = (1 << bd) - 1
    if pred_override is not None:
        pred = pred_override
    else:
        ref = _gather_ref(plane, x, y, s)
        if subst_mask is not None:
            ref = kintra.substitute_refs(ref, subst_mask,
                                         1 << (bd - 1))
        pred = kintra.predict_mode(ref, mode, s, n_modes, pdpc=pdpc,
                                   left_ok=x > 0, top_ok=y > 0)
    if encode:
        orig = jax.lax.dynamic_slice(src, (y + 1, x + 1), (s, s))
        if lossless:
            return orig, orig - pred
        res = orig - pred
        lev = _fwd_mts(res, s, qp, mts_idx, use_mts, rdoq_lam, use_ts,
                       bd, lfnst, sdh, dq)
        rres = _inv_mts(lev, s, qp, mts_idx, use_mts, use_ts, bd,
                        lfnst, dq)
        return jnp.clip(pred + rres, 0, maxv), lev
    else:
        lev = jax.lax.dynamic_slice(coef, (y, x), (s, s))
        if lossless:
            return jnp.clip(pred + lev, 0, maxv), lev
        rres = _inv_mts(lev, s, qp, mts_idx, use_mts, use_ts, bd,
                        lfnst, dq)
        return jnp.clip(pred + rres, 0, maxv), lev


@functools.cache
def make_recon_pass_raw(cfg: CodecConfig, encode: bool):
    """Build the un-jitted reconstruction pass (for composition).

    encode=True:  f(origY_pad, origCb_pad, origCr_pad,
                    size_map, mode_map, mts_map)
    encode=False: f(coefY, coefCb, coefCr, size_map, mode_map, mts_map)
    both return (reconY u8, reconCb u8, reconCr u8,
                 coefY i16, coefCb i16, coefCr i16)  [all unpadded]
    """
    w, h = cfg.width, cfg.height
    cw, ch = w // 2, h // 2
    ux_n, uy_n = cfg.units_x, cfg.units_y
    cx_n, cy_n = cfg.ctus_x, cfg.ctus_y
    n_ctu = cx_n * cy_n
    qp = cfg.qp
    lossless = cfg.lossless
    n_modes = cfg.n_pred_modes
    n_std = cfg.n_intra_modes      # MIP modes are >= n_std (luma only)
    use_mip = cfg.mip
    rdoq_lam = cfg.lambda_mode if (cfg.rdoq and encode) else None
    sdh_on = cfg.sign_data_hiding
    dq_on = cfg.dep_quant
    bd = cfg.bit_depth
    mid = cfg.mid_val
    maxv_c = cfg.max_val

    use_mts = cfg.mts
    use_ts = cfg.transform_skip

    # Reference-substitution mask tables (C6, cfg.ref_substitute):
    # static per-block availability vectors, one table per TU size and
    # plane (+ BT-V-order variants for MTT rect leaves whose coding
    # order deviates from z-order — engine.availability.ref_masks).
    use_subst = cfg.ref_substitute
    if use_subst:
        from x266_tpu.engine import availability as avail
        sizes = [s for s in (8, 16, 32, 64)
                 if s <= cfg.max_cu_size]
        tabL = {s: np.asarray(avail.ref_masks(w, h, s)) for s in sizes}
        tabC = {s // 2: np.asarray(avail.ref_masks(w, h, s // 2,
                                                   scale=2))
                for s in sizes}
        if cfg.mtt:
            tabLv = {s // 2: np.asarray(
                avail.ref_masks(w, h, s // 2, btv_leaf=s))
                for s in (16, 32) if s <= cfg.max_cu_size}
            tabCv = {s // 4: np.asarray(
                avail.ref_masks(w, h, s // 4, scale=2,
                                btv_leaf=s // 2))
                for s in (16, 32) if s <= cfg.max_cu_size}

    def _mask_at(tab, by, bx):
        r = tab.shape[-1]
        return jax.lax.dynamic_slice(jnp.asarray(tab), (by, bx, 0),
                                     (1, 1, r))[0, 0]

    def run(a, b, c, size_map, mode_map, mts_map):
        # Inputs may arrive in narrow dtypes (uint8 pixels / int16 levels)
        # to keep host<->device transfers small; all internal math is
        # int32 (exactness, SURVEY.md §7 hard-part #3).
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
        yP = jnp.full((1 + h + PAD, 1 + w + PAD), mid, jnp.int32)
        cbP = jnp.full((1 + ch + PAD, 1 + cw + PAD), mid, jnp.int32)
        crP = jnp.full((1 + ch + PAD, 1 + cw + PAD), mid, jnp.int32)

        def make_branch(s):
            cs = s // 2

            def branch(args):
                if cfg.cclm and encode:
                    yP, cbP, crP, cY, cCb, cCr, mmap, ux, uy = args
                else:
                    yP, cbP, crP, cY, cCb, cCr, ux, uy = args
                    mmap = None
                x = ux * 8
                y = uy * 8
                mode = mode_map[uy, ux]
                # chroma collocated with a MIP-coded luma CU predicts
                # planar (the MIP matrices are luma-trained)
                mode_c = (jnp.where(mode >= n_std, 0, mode)
                          if use_mip else mode)
                # mts bit 3 carries the CCLM flag — mask it off the
                # transform-candidate index
                mts_idx = ((mts_map[uy, ux] & 7)
                           if (use_mts or use_ts) else None)
                lf = (((mts_map[uy, ux] >> 6) & 3, mode, n_modes)
                      if cfg.lfnst else None)
                ml = (_mask_at(tabL[s], uy // (s // 8), ux // (s // 8))
                      if use_subst else None)
                rec, lev = _tu(yP, srcY, cY, x, y, mode, s, qp,
                               encode, lossless, n_modes, mts_idx,
                               pdpc=kintra._pdpc_on(cfg.pdpc, s), rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on,
                               use_mts=use_mts, use_ts=use_ts, bd=bd,
                               lfnst=lf, subst_mask=ml)
                yP2 = jax.lax.dynamic_update_slice(yP, rec, (y + 1, x + 1))
                cY2 = jax.lax.dynamic_update_slice(cY, lev, (y, x))
                xc, yc = x // 2, y // 2
                mc = (_mask_at(tabC[cs], yc // cs, xc // cs)
                      if use_subst else None)
                pob = por = None
                mts_out = None
                if cfg.cclm:
                    # per-CU chroma choice (C6 CCLM): DM vs the linear
                    # model.  The ENCODER decides IN-SCAN by joint
                    # Cb+Cr prediction SSE vs the source (sequential
                    # encoders' chroma RDO, available here because the
                    # scan holds both recon state and the original);
                    # the flag rides bit 3 of the mts map so no new
                    # plumbing or syntax arrays are needed.
                    cc_b = cclm_pred(yP2, cbP, xc, yc, cs, maxv_c)
                    cc_r = cclm_pred(yP2, crP, xc, yc, cs, maxv_c)
                    def _dm_ref(p):
                        r = _gather_ref(p, xc, yc, cs)
                        if use_subst:
                            r = kintra.substitute_refs(r, mc, mid)
                        return r

                    dm_b = kintra.predict_mode(_dm_ref(cbP), mode_c,
                                               cs, n_modes)
                    dm_r = kintra.predict_mode(_dm_ref(crP), mode_c,
                                               cs, n_modes)
                    if encode:
                        ob = jax.lax.dynamic_slice(
                            srcCb, (yc + 1, xc + 1), (cs, cs))
                        orr = jax.lax.dynamic_slice(
                            srcCr, (yc + 1, xc + 1), (cs, cs))
                        e_cc = (jnp.sum((cc_b - ob) ** 2)
                                + jnp.sum((cc_r - orr) ** 2))
                        e_dm = (jnp.sum((dm_b - ob) ** 2)
                                + jnp.sum((dm_r - orr) ** 2))
                        use_cc = e_cc < e_dm
                        mts_out = (mts_map[uy, ux] & 7) | (
                            use_cc.astype(jnp.int32) << 3)
                    else:
                        use_cc = ((mts_map[uy, ux] >> 3) & 1) == 1
                    pob = jnp.where(use_cc, cc_b, dm_b)
                    por = jnp.where(use_cc, cc_r, dm_r)
                recb, levb = _tu(cbP, srcCb, cCb, xc, yc, mode_c, cs,
                                 qp, encode, lossless, n_modes,
                                 rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on, bd=bd,
                                 pred_override=pob, subst_mask=mc)
                cbP2 = jax.lax.dynamic_update_slice(cbP, recb,
                                                    (yc + 1, xc + 1))
                cCb2 = jax.lax.dynamic_update_slice(cCb, levb, (yc, xc))
                recr, levr = _tu(crP, srcCr, cCr, xc, yc, mode_c, cs,
                                 qp, encode, lossless, n_modes,
                                 rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on, bd=bd,
                                 pred_override=por, subst_mask=mc)
                crP2 = jax.lax.dynamic_update_slice(crP, recr,
                                                    (yc + 1, xc + 1))
                cCr2 = jax.lax.dynamic_update_slice(cCr, levr, (yc, xc))
                if cfg.cclm and encode:
                    u = s // 8
                    blk = jnp.broadcast_to(mts_out, (u, u)).astype(
                        jnp.int32)
                    mmap2 = jax.lax.dynamic_update_slice(
                        mmap, blk, (uy, ux))
                    return yP2, cbP2, crP2, cY2, cCb2, cCr2, mmap2
                return yP2, cbP2, crP2, cY2, cCb2, cCr2

            return branch

        def make_branch_rect(s, vert):
            """One rectangular MTT CU (C5): bt=1 (vert=False) is the
            BT-H leaf half (h=t, w=s, TUs side by side); bt=2 is BT-V
            (h=s, w=t, TUs stacked).  One mode, two square t-TUs coded
            sequentially — the second TU's intra references include the
            first TU's reconstruction (ISP-shaped)."""
            t = s // 2
            ct = t // 2

            def branch(args):
                yP, cbP, crP, cY, cCb, cCr, ux, uy = args
                x = ux * 8
                y = uy * 8
                mode = mode_map[uy, ux]
                mode_c = (jnp.where(mode >= n_std, 0, mode)
                          if use_mip else mode)
                for kidx in range(2):
                    dx = 0 if vert else kidx * t
                    dy = kidx * t if vert else 0
                    xt, yt = x + dx, y + dy
                    mts_tu = mts_map[uy + dy // 8, ux + dx // 8]
                    mts_idx = ((mts_tu & 7)
                               if (use_mts or use_ts) else None)
                    lf = (((mts_tu >> 6) & 3, mode, n_modes)
                          if cfg.lfnst else None)
                    if use_subst:
                        mlt = _mask_at(tabLv[t] if vert else tabL[t],
                                       yt // t, xt // t)
                    else:
                        mlt = None
                    rec, lev = _tu(yP, srcY, cY, xt, yt, mode, t, qp,
                                   encode, lossless, n_modes, mts_idx,
                                   pdpc=kintra._pdpc_on(cfg.pdpc, t), rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on,
                                   use_mts=use_mts, use_ts=use_ts,
                                   bd=bd, lfnst=lf, subst_mask=mlt)
                    yP = jax.lax.dynamic_update_slice(
                        yP, rec, (yt + 1, xt + 1))
                    cY = jax.lax.dynamic_update_slice(cY, lev, (yt, xt))
                    xc, yc = xt // 2, yt // 2
                    if use_subst:
                        mct = _mask_at(tabCv[ct] if vert else tabC[ct],
                                       yc // ct, xc // ct)
                    else:
                        mct = None
                    recb, levb = _tu(cbP, srcCb, cCb, xc, yc, mode_c,
                                     ct, qp, encode, lossless, n_modes,
                                     rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on, bd=bd,
                                     subst_mask=mct)
                    cbP = jax.lax.dynamic_update_slice(
                        cbP, recb, (yc + 1, xc + 1))
                    cCb = jax.lax.dynamic_update_slice(
                        cCb, levb, (yc, xc))
                    recr, levr = _tu(crP, srcCr, cCr, xc, yc, mode_c,
                                     ct, qp, encode, lossless, n_modes,
                                     rdoq_lam=rdoq_lam, sdh=sdh_on, dq=dq_on, bd=bd,
                                     subst_mask=mct)
                    crP = jax.lax.dynamic_update_slice(
                        crP, recr, (yc + 1, xc + 1))
                    cCr = jax.lax.dynamic_update_slice(
                        cCr, levr, (yc, xc))
                return yP, cbP, crP, cY, cCb, cCr

            return branch

        branches = [make_branch(8), make_branch(16), make_branch(32)]
        if cfg.max_cu_size >= 64:
            branches.append(make_branch(64))
        if cfg.mtt:
            branches += [make_branch_rect(16, False),
                         make_branch_rect(16, True),
                         make_branch_rect(32, False),
                         make_branch_rect(32, True)]

        cclm_carry = cfg.cclm and encode
        n_carry = 7 if cclm_carry else 6

        def unit_body(z, carry):
            if cclm_carry:
                yP, cbP, crP, cY, cCb, cCr, mmap0, cx, cy = carry
            else:
                yP, cbP, crP, cY, cCb, cCr, cx, cy = carry
                mmap0 = None
            zx = (z & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
            zy = ((z >> 1) & 1) | (((z >> 3) & 1) << 1) \
                | (((z >> 5) & 1) << 2)
            ux = cx * 8 + zx
            uy = cy * 8 + zy
            inb = (ux < ux_n) & (uy < uy_n)
            uxc = jnp.minimum(ux, ux_n - 1)
            uyc = jnp.minimum(uy, uy_n - 1)
            sz = size_map[uyc, uxc]
            units = sz >> 3                       # 1, 2 or 4
            if cfg.mtt:
                bt = (mts_map[uyc, uxc] >> 4) & 3
                ux_units = jnp.where(bt == 2, units >> 1, units)
                uy_units = jnp.where(bt == 1, units >> 1, units)
                origin = (((ux & (ux_units - 1)) == 0)
                          & ((uy & (uy_units - 1)) == 0))
                code = jnp.where(
                    bt == 0,
                    (sz == 16).astype(jnp.int32)
                    + 2 * (sz == 32).astype(jnp.int32),
                    jnp.where(sz == 16, 2 + bt, 4 + bt)
                ).astype(jnp.int32)
            else:
                origin = (((ux & (units - 1)) == 0)
                          & ((uy & (units - 1)) == 0))
                code = (sz == 16).astype(jnp.int32) \
                    + 2 * (sz == 32).astype(jnp.int32) \
                    + 3 * (sz == 64).astype(jnp.int32)

            def do(ops):
                return jax.lax.switch(code, branches, ops)

            if cclm_carry:
                ops = (yP, cbP, crP, cY, cCb, cCr, mmap0, uxc, uyc)
            else:
                ops = (yP, cbP, crP, cY, cCb, cCr, uxc, uyc)
            out = jax.lax.cond(inb & origin, do,
                               lambda o: o[:n_carry], ops)
            return (*out, cx, cy)

        def ctu_body(carry, ctu_idx):
            cy = ctu_idx // cx_n
            cx = ctu_idx % cx_n
            state = (*carry, cx, cy)
            state = jax.lax.fori_loop(0, 64, unit_body, state)
            return state[:n_carry], None

        carry = (yP, cbP, crP, coefY, coefCb, coefCr)
        if cclm_carry:
            carry = carry + (mts_map.astype(jnp.int32),)
        carry, _ = jax.lax.scan(ctu_body, carry, jnp.arange(n_ctu))
        # Narrow + slice ON DEVICE: recon as unpadded uint8/uint16
        # pictures, levels as int16 (they fit by the quant clamp) — ~3x
        # smaller downloads, which dominate on remote-attached chips.
        pdt = jnp.uint8 if bd == 8 else jnp.uint16
        y8 = carry[0][1:1 + h, 1:1 + w].astype(pdt)
        cb8 = carry[1][1:1 + ch, 1:1 + cw].astype(pdt)
        cr8 = carry[2][1:1 + ch, 1:1 + cw].astype(pdt)
        out = (y8, cb8, cr8, carry[3].astype(jnp.int16),
               carry[4].astype(jnp.int16), carry[5].astype(jnp.int16))
        if cclm_carry:
            # mts map with the in-scan CCLM decisions in bit 3 (the
            # entropy layer and the decoder consume this version)
            out = out + (carry[6],)
        return out

    return run


@functools.cache
def make_recon_pass(cfg: CodecConfig, encode: bool):
    """jit-compiled reconstruction pass (see make_recon_pass_raw)."""
    return jax.jit(make_recon_pass_raw(cfg, encode))


def select_recon_impl(cfg: CodecConfig, encode: bool):
    """Implementation selector.

    - Pallas kernel (engine.recon_pallas): the whole scan in ONE kernel
      with the CTU working set in VMEM — measured 12x faster than the
      XLA scan at 1080p on TPU v5e, bit-exact (tests/test_recon_pallas).
      Default on the TPU backend; X266T_PALLAS=0 disables, =1 forces
      (interpret mode on CPU — correct but slow, so not the CPU default).
    - XLA scan (this module): the portable reference; CPU/test default.
    - Wavefront (engine.recon_wave, X266T_WAVE_RECON=1): bit-identical,
      8x fewer sequential steps, but 6x slower under XLA (scatter-bound);
      kept as the schedule study that motivated the Pallas kernel.
    """
    import os

    if os.environ.get("X266T_WAVE_RECON") and not cfg.mip \
            and not cfg.sign_data_hiding and not cfg.dep_quant:
        # (the wavefront study path predates the MIP mode extension)
        from x266_tpu.engine.recon_wave import make_recon_wave_raw
        return make_recon_wave_raw(cfg, encode)
    flag = os.environ.get("X266T_PALLAS")
    use_pallas = (jax.default_backend() == "tpu" if flag is None
                  else flag != "0")
    # the Pallas kernel's VMEM tables/windows are 8-bit and predate
    # CCLM/MTT/LFNST/SDH; those ride the XLA scan (capability first)
    if use_pallas and cfg.bit_depth == 8 and not cfg.cclm \
            and not cfg.mtt and not cfg.lfnst \
            and not cfg.sign_data_hiding and not cfg.dep_quant \
            and cfg.max_cu_size <= 32:
        from x266_tpu.engine.recon_pallas import make_recon_pallas_raw
        return make_recon_pallas_raw(cfg, encode)
    return make_recon_pass_raw(cfg, encode)


def extract_frame(cfg: CodecConfig, planes) -> tuple[np.ndarray, ...]:
    """Recon planes (already unpadded uint8 on device) -> host arrays."""
    return tuple(np.asarray(p) for p in planes[:3])
