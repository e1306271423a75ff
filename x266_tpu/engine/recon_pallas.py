"""Pallas TPU kernel for the normative reconstruction scan (C6/C10-C12/C18).

Drop-in replacement for ``engine.recon.make_recon_pass_raw`` (same signature,
bit-exact by construction — validated by tests/test_recon_pallas.py).  The
XLA scan costs ~0.4 s/frame at 1080p purely in per-step dispatch and
HBM-resident plane updates (ROADMAP.md perf log); this kernel runs the whole
scan in ONE pallas_call with the plane working set in VMEM.

Design (all constructs probed on TPU v5e before writing — the Mosaic build
here rejects value-level dynamic_slice, unaligned multi-row refs slices and
<128-lane rolls, which shapes the implementation):

- grid = (ctus_y, ctus_x), raster order == coding order; TPU grids execute
  sequentially, so scratch carries state across CTUs.
- Per-CTU recon windows in VMEM scratch: winY (128,128) holds picture rows
  [y0, y0+128) x cols [x0, x0+128) with everything not yet coded = 128 —
  exactly the availability rule of engine.recon (128-filled planes written
  in coding order).  Rows/cols beyond the CTU stay 128 by memset.
- Inter-CTU state: double-buffered row buffers (the CTU row above's last
  pixel row; read buf (cy+1)%2, write buf cy%2) and a column buffer (the
  left CTU's right edge, reset at cx==0).  No HBM plane, no in-kernel DMA
  for pixels: recon/coef leave through regular blocked outputs.
- Dynamic addressing: sublane offsets are 8-aligned by construction for
  luma (TU y is a multiple of 8); chroma 4x4 TUs realign with an 8-aligned
  over-read plus a 2-way select.  Lane offsets use dynamic pltpu.roll plus
  iota masks (read-modify-write of full 128-lane rows).
- Intra prediction = exact-integer f32 matmuls on the MXU against the
  specmodel.intra weight matrices: refs<=255 (8-bit) x weights<=127 give
  products whose partial sums stay < 2^24, so f32 accumulation is exact
  (asserted at table-build time).  The left-reference column enters as a
  (2s,1) operand through dot_general contracting dim 0 — no transposes.
- Transforms = exact-integer f32 matmuls with 11-bit limb splitting of the
  >8-bit operand: x = (x>>11)*2048 + (x & 2047); each limb matmul is exact
  in f32 (max |partial sum| = 32*2047*255 < 2^24) and the recombination is
  int32.  Matrix entries are asserted <= 255 so they are bf16-exact and any
  >=3-pass f32 MXU decomposition preserves exactness.
- Mode weights for sizes 4/8/16 are VMEM-resident (int8, gathered with an
  aligned dynamic ref slice); the 32x32 stack (~20 MB) stays in HBM and the
  selected mode's matrix is DMA'd per TU.

Reference parity: the per-TU math mirrors engine.recon._tu and the
kernels/{intra,transforms,quant} modules line for line (same rounding, same
clips); the z-order unit walk and origin rule mirror engine.recon.ctu_body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x266_tpu.config import CodecConfig
from x266_tpu.kernels.interp import REF_PAD
from x266_tpu.kernels.transforms import MTS_COMBOS
from x266_tpu.specmodel import intra as ispec
from x266_tpu.specmodel import quant as qspec
from x266_tpu.specmodel import transforms as tspec

PRED_INTRA, PRED_INTER, PRED_SKIP = 0, 1, 2   # mirrors engine.inter
PRED_L1, PRED_BI = 3, 4

F32 = jnp.float32
I32 = jnp.int32
HIGHEST = jax.lax.Precision.HIGHEST


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


# ---- numpy table builders --------------------------------------------------

def _wgeom(s: int):
    """Row layout of the per-mode transposed weight matrix."""
    topr = _pad8(2 * s + 1)
    leftr = 2 * s
    smr = 0 if s == 4 else _pad8(ispec.ref_len(s))
    slot = _pad_to(topr + leftr + smr, 32)
    return topr, leftr, smr, slot


@functools.cache
def _weight_table(s: int, n_modes: int) -> np.ndarray:
    """(n_modes, SLOT, L) int8: rows = [top | left | smoothed] blocks of the
    transposed weight matrix; L = max(s*s, 128) lanes."""
    topr, leftr, smr, slot = _wgeom(s)
    r = ispec.ref_len(s)
    w, _ = ispec.stacked_weights(s, n_modes)          # (nm, s*s, 2R) int8
    lanes = max(s * s, 128)
    out = np.zeros((n_modes, slot, lanes), dtype=np.int8)
    for m in range(n_modes):
        wt = w[m].T.astype(np.int8)                   # (2R, s*s)
        out[m, 0:2 * s + 1, :s * s] = wt[0:2 * s + 1]
        out[m, topr:topr + leftr, :s * s] = wt[2 * s + 1:r]
        if smr:
            out[m, topr + leftr:topr + leftr + r, :s * s] = wt[r:2 * r]
    # Exactness bound: |ref|<=255, one ref half active per mode, row sums of
    # W are 2^shift <= 2^6 -> |true pred| <= 2^6*255 << 2^24.  Guard the
    # per-term bound too (f32 partial sums exact below 2^24).
    assert np.abs(w).max() <= 127
    return out


@functools.cache
def _smooth_tables(s: int) -> tuple[np.ndarray, np.ndarray]:
    """(topr, SMR) and (leftr, SMR) f32 blocks of S.T (smoothing matrix)."""
    topr, leftr, smr, _ = _wgeom(s)
    r = ispec.ref_len(s)
    st = ispec.smoothing_matrix(s).T.astype(np.float32)   # (R, R)
    a = np.zeros((topr, smr), np.float32)
    a[0:2 * s + 1, 0:r] = st[0:2 * s + 1]
    b = np.zeros((leftr, smr), np.float32)
    b[0:2 * s - 0, 0:r] = st[2 * s + 1:r]
    return a, b


@functools.cache
def _tx_table(s: int, with_mts: bool) -> np.ndarray:
    """((4 roles * NC combos) * SLOT, 128) f32 transform matrices.

    roles: 0 fwd-vertical (tv), 1 fwd-horizontal (th.T),
           2 inv-vertical (tv.T), 3 inv-horizontal (th).
    """
    combos = MTS_COMBOS if with_mts else MTS_COMBOS[:1]
    slot = max(s, 8)
    out = np.zeros((4 * len(combos) * slot, 128), np.float32)
    for ci, (tv_t, th_t) in enumerate(combos):
        tv = tspec.matrix_for(tv_t, s).astype(np.int64)
        th = tspec.matrix_for(th_t, s).astype(np.int64)
        assert max(np.abs(tv).max(), np.abs(th).max()) <= 255
        for role, mat in enumerate((tv, th.T, tv.T, th)):
            base = (role * len(combos) + ci) * slot
            out[base:base + s, 0:s] = mat.astype(np.float32)
    return out


# ---- in-kernel helpers ------------------------------------------------------

def _lane_iota(rows: int, lanes: int):
    return jax.lax.broadcasted_iota(I32, (rows, lanes), 1)


def _row_iota(rows: int, lanes: int):
    return jax.lax.broadcasted_iota(I32, (rows, lanes), 0)


def _pad_lanes(v, lanes: int):
    r, w = v.shape
    if w == lanes:
        return v
    return jnp.concatenate([v, jnp.zeros((r, lanes - w), v.dtype)], axis=1)


def _read_rows(ref, y, n, realign):
    """(n, 128) rows at dynamic offset y (8-aligned unless realign)."""
    if not realign:
        blk = ref[pl.ds(pl.multiple_of(y, 8), _pad8(n)), :]
        return blk[0:n]
    ybase = (y // 8) * 8
    rem = y - ybase
    nn = _pad8(n + 4)
    blk = ref[pl.ds(pl.multiple_of(ybase, 8), nn), :]
    return jnp.where(rem == 4, blk[4:4 + n], blk[0:n])


def _rmw_write(ref, y, s, vals, x, realign):
    """Place the (s,s) int32 block `vals` at (y, x) of a 128-lane ref."""
    lanes = 128
    vp = _pad_lanes(vals, lanes)
    if not realign:
        rows = ref[pl.ds(pl.multiple_of(y, 8), s), :]
        placed = pltpu.roll(vp, x, 1)
        lane = _lane_iota(s, lanes)
        m = (lane >= x) & (lane < x + s)
        ref[pl.ds(pl.multiple_of(y, 8), s), :] = jnp.where(m, placed, rows)
        return
    ybase = (y // 8) * 8
    rem = y - ybase
    n = _pad8(s + 4)
    rows = ref[pl.ds(pl.multiple_of(ybase, 8), n), :]

    def _cat(pieces):
        return jnp.concatenate([p for p in pieces if p.shape[0]], axis=0)

    a = _cat([vp, jnp.zeros((n - s, lanes), vp.dtype)])
    b = _cat([jnp.zeros((4, lanes), vp.dtype), vp,
              jnp.zeros((n - s - 4, lanes), vp.dtype)])
    placed = pltpu.roll(jnp.where(rem == 4, b, a), x, 1)
    lane = _lane_iota(n, lanes)
    row = _row_iota(n, lanes)
    m = ((lane >= x) & (lane < x + s)
         & (row >= rem) & (row < rem + s))
    ref[pl.ds(pl.multiple_of(ybase, 8), n), :] = jnp.where(m, placed, rows)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=HIGHEST)


def _dotg0(a, b):
    """Contract dim 0 of both: (k,1) x (k,n) -> (1,n)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32,
                               precision=HIGHEST)


def _rshift_round(x, sh: int):
    return (x + (1 << (sh - 1))) >> sh


def _limb_mm_lhs(data_i32, mat_f32):
    """Exact int32 (A @ M) with A = data (|A| < 2^27), M 8-bit entries."""
    lo = (data_i32 & 2047).astype(F32)
    hi = (data_i32 >> 11).astype(F32)
    return (_mm(lo, mat_f32).astype(I32)
            + (_mm(hi, mat_f32).astype(I32) << 11))


def _limb_mm_rhs(mat_f32, data_i32):
    lo = (data_i32 & 2047).astype(F32)
    hi = (data_i32 >> 11).astype(F32)
    return (_mm(mat_f32, lo).astype(I32)
            + (_mm(mat_f32, hi).astype(I32) << 11))


def _to2d(vec_i32, s: int):
    """(1, L>=128) int32 row vector -> (s, s) via static rolls + concat."""
    lanes = vec_i32.shape[1]
    parts = [pltpu.roll(vec_i32, (lanes - r * s) % lanes, 1)[:, :s]
             for r in range(s)]
    return jnp.concatenate(parts, axis=0)


# ---- kernel factory ---------------------------------------------------------

def _build_pallas(cfg: CodecConfig, encode: bool, interpret: bool,
                  inter: bool = False, b_mode: bool = False):
    cy_n, cx_n = cfg.ctus_y, cfg.ctus_x
    qp = cfg.qp
    lossless = cfg.lossless
    n_modes = cfg.n_pred_modes
    n_std = cfg.n_intra_modes      # mode >= n_std -> MIP (luma only)
    sizes = tuple(s for s in (8, 16, 32) if s <= cfg.max_cu_size)
    has32 = 32 in sizes
    ncombo = len(MTS_COMBOS) if cfg.mts else 1

    rwy = _pad_to(cx_n * 64 + 192, 128)
    rwc = _pad_to(cx_n * 32 + 192, 128)

    # --- static tables (numpy) ---
    wtabs = {s: _weight_table(s, n_modes) for s in (4, 8, 16)}
    w32 = _weight_table(32, n_modes) if has32 else None
    smtabs = {s: _smooth_tables(s) for s in (8, 16, 32) if s <= 32}
    txtabs = {4: _tx_table(4, False)}
    for s in sizes:
        txtabs[s] = _tx_table(s, cfg.mts)

    # quant constants (static per cfg)
    def qconsts(s):
        tsh = qspec.transform_shift(s)
        qbits = 14 + qp // 6 + tsh
        qadd = 171 << (qbits - 9)
        qscale = int(qspec.QUANT_SCALES[qp % 6])
        ishift = 6 - tsh
        dscale = int(qspec.DEQUANT_SCALES[qp % 6]) << (qp // 6)
        return qbits, qadd, qscale, ishift, dscale

    def kernel(*refs):
        it = iter(refs)
        attr_ref = next(it)
        attr2_ref = next(it) if inter else None
        attr3_ref = next(it) if b_mode else None
        dY_ref = next(it)        # src (encode) or coef (decode) blocks
        dCb_ref = next(it)
        dCr_ref = next(it)
        if inter:
            pyrY_ref = next(it)
            pyrCb_ref = next(it)
            pyrCr_ref = next(it)
        if b_mode:
            pyr1Y_ref = next(it)
            pyr1Cb_ref = next(it)
            pyr1Cr_ref = next(it)
        w4_ref = next(it)
        w8_ref = next(it)
        w16_ref = next(it)
        w32_ref = next(it) if has32 else None
        smrefs = {s: (next(it), next(it)) for s in smtabs}
        txrefs = {s: next(it) for s in sorted(txtabs)}
        recY_ref = next(it)
        recCb_ref = next(it)
        recCr_ref = next(it)
        if encode:
            cfY_ref = next(it)
            cfCb_ref = next(it)
            cfCr_ref = next(it)
        if inter:
            mvxO_ref = next(it)
            mvyO_ref = next(it)
        winY = next(it)
        winCb = next(it)
        winCr = next(it)
        topY = next(it)
        topCb = next(it)
        topCr = next(it)
        rowY0 = next(it)
        rowY1 = next(it)
        rowCb0 = next(it)
        rowCb1 = next(it)
        rowCr0 = next(it)
        rowCr1 = next(it)
        colY = next(it)
        colCb = next(it)
        colCr = next(it)
        if inter:
            predbuf = next(it)
            mcwin = next(it)
            mcsem = next(it)
            mvx_s = next(it)
            mvy_s = next(it)
            int_s = next(it)
            mvxV = next(it)
            mvyV = next(it)
        if has32:
            w32s = next(it)
            dmasem = next(it)

        cy = pl.program_id(0)
        cx = pl.program_id(1)

        # ---- per-frame / per-row / per-CTU state resets ----
        @pl.when((cy == 0) & (cx == 0))
        def _():
            for r in (rowY0, rowY1, rowCb0, rowCb1, rowCr0, rowCr1):
                r[:] = jnp.full_like(r[:], 128)

        @pl.when(cx == 0)
        def _():
            for r in (colY, colCb, colCr):
                r[:] = jnp.full_like(r[:], 128)

        winY[:] = jnp.full_like(winY[:], 128)
        winCb[:] = jnp.full_like(winCb[:], 128)
        winCr[:] = jnp.full_like(winCr[:], 128)
        if encode:
            cfY_ref[:] = jnp.zeros_like(cfY_ref[:])
            cfCb_ref[:] = jnp.zeros_like(cfCb_ref[:])
            cfCr_ref[:] = jnp.zeros_like(cfCr_ref[:])
        if inter:
            # MV-state edge: col 8 = the left CTU's rightmost unit column
            # (its values are final — raster order), "not inter" at cx==0.
            # Cols 0..7 need no reset: a CU origin only reads left/above
            # units, which are always already written (z-order).
            @pl.when(cx == 0)
            def _():
                for i in range(8):
                    int_s[i, 8] = 0

            @pl.when(cx > 0)
            def _():
                for i in range(8):
                    int_s[i, 8] = int_s[i, 7]
                    mvx_s[i, 8] = mvx_s[i, 7]
                    mvy_s[i, 8] = mvy_s[i, 7]

            mvxV[:] = jnp.zeros_like(mvxV[:])
            mvyV[:] = jnp.zeros_like(mvyV[:])

        # toprow: last pixel row of the CTU row above (128 at picture top).
        even = (cy % 2) == 0
        shy = (rwy - cx * 64) % rwy
        topY[:] = jnp.where(even, pltpu.roll(rowY1[:], shy, 1)[:, :128],
                            pltpu.roll(rowY0[:], shy, 1)[:, :128])
        shc = (rwc - cx * 32) % rwc
        topCb[:] = jnp.where(even, pltpu.roll(rowCb1[:], shc, 1)[:, :128],
                             pltpu.roll(rowCb0[:], shc, 1)[:, :128])
        topCr[:] = jnp.where(even, pltpu.roll(rowCr1[:], shc, 1)[:, :128],
                             pltpu.roll(rowCr0[:], shc, 1)[:, :128])

        # ---- one TU ----
        def intra_pred(s, win, col, top, x, y, mode, luma=False):
            """Normative intra prediction -> (s, s) int32."""
            if cfg.mip and not luma:
                # chroma collocated with a MIP luma CU predicts planar
                mode = jnp.where(mode >= n_std, 0, mode)
            realign = (s == 4)
            topr, leftr, smr, slot = _wgeom(s)
            log2s = s.bit_length() - 1

            # reference vector pieces
            row_int = win[pl.ds(jnp.maximum(y - 1, 0), 1), :]
            cand_int = pltpu.roll(row_int, (129 - x) % 128, 1)
            cand_top = pltpu.roll(top[0:1, :], (128 - x) % 128, 1)
            top_vec = jnp.where(y == 0, cand_top, cand_int)     # (1,128)

            # colbuf row r = plane(x0-1, y0+r): corner at y-1, left at
            # [y, y+2s).  Single-row reads take any offset; the block
            # read is 8-aligned (realigned for 4x4 chroma TUs).
            corner_c = col[pl.ds(jnp.maximum(y - 1, 0), 1), 0:1]
            left_c0 = _read_rows(col, y, 2 * s, realign)[:, 0:1]
            lane0 = _lane_iota(1, 128) == 0
            cornerfix = (x == 0) & (y > 0)
            top_vec = jnp.where(lane0 & cornerfix, corner_c, top_vec)

            lblk = _read_rows(win, y, 2 * s, realign)           # (2s,128)
            lv_int = pltpu.roll(lblk, (129 - x) % 128, 1)[:, 0:1]
            left_vec = jnp.where(x == 0, left_c0, lv_int)       # (2s,1)

            if cfg.ref_substitute:
                # Reference substitution (C6 round-5, FORMAT.md §7).
                # Under the z-order availability rule both sides are
                # monotone prefixes, so availability along the
                # substitution scan (left bottom->top, corner, top
                # left->right) is ONE contiguous run and the HEVC
                # propagation fill collapses to closed-form selects
                # keyed by the run endpoints — bit-identical to
                # kernels.intra.substitute_refs (gated by
                # tests/test_recon_pallas.py).  Chroma availability
                # follows the luma coding order at 2x coords.
                sc = 1 if luma else 2
                bx = cx * (64 // sc) + x          # plane coords
                by = cy * (64 // sc) + y
                pw = cfg.width // sc
                ph = cfg.height // sc
                bxl, byl = bx * sc, by * sc

                def _mort(u, v):
                    return ((u & 1) | ((v & 1) << 1) | ((u & 2) << 1)
                            | ((v & 2) << 2) | ((u & 4) << 2)
                            | ((v & 4) << 3))

                zb_ = _mort((bxl >> 3) & 7, (byl >> 3) & 7)
                cb_ = (byl >> 6) * 4096 + (bxl >> 6)

                def _zcond(pxl, pyl):
                    cp = (pyl >> 6) * 4096 + (pxl >> 6)
                    zp = _mort((pxl >> 3) & 7, (pyl >> 3) & 7)
                    return (cp < cb_) | ((cp == cb_) & (zp < zb_))

                r_i = _row_iota(2 * s, 1)
                av_l = ((bx > 0) & (by + r_i < ph)
                        & _zcond((bx - 1) * sc, (by + r_i) * sc))
                k_i = _lane_iota(1, 128)
                av_t = ((by > 0) & (k_i >= 1) & (k_i <= 2 * s)
                        & (bx + k_i - 1 < pw)
                        & _zcond((bx + k_i - 1) * sc, (by - 1) * sc))
                av_c = ((bx > 0) & (by > 0)
                        & _zcond((bx - 1) * sc, (by - 1) * sc))
                nl = jnp.sum(av_l.astype(I32))
                nt = jnp.sum(av_t.astype(I32))
                v_l0 = left_vec[0, 0]
                v_lend = jnp.sum(jnp.where(r_i == nl - 1, left_vec, 0))
                v_c = top_vec[0, 0]
                v_t1 = jnp.sum(jnp.where(k_i == 1, top_vec, 0))
                v_tend = jnp.sum(jnp.where(k_i == nt, top_vec, 0))
                first_val = jnp.where(
                    nl > 0, v_lend,
                    jnp.where(av_c, v_c,
                              jnp.where(nt > 0, v_t1, 128)))
                last_val = jnp.where(
                    nt > 0, v_tend,
                    jnp.where(av_c, v_c,
                              jnp.where(nl > 0, v_l0, 128)))
                corner_sub = jnp.where(
                    av_c, v_c, jnp.where(nl > 0, v_l0, first_val))
                left_vec = jnp.where(r_i < nl, left_vec, first_val)
                top_vec = jnp.where(
                    k_i == 0, corner_sub,
                    jnp.where(k_i <= nt, top_vec, last_val))

            topf = top_vec[:, 0:topr].astype(F32)
            leftf = left_vec.astype(F32)

            # mode weights
            if s == 32:
                cp = pltpu.make_async_copy(w32_ref.at[mode], w32s, dmasem)
                cp.start()
                cp.wait()
                wm = w32s[:]
            else:
                wref = {4: w4_ref, 8: w8_ref, 16: w16_ref}[s]
                off = pl.multiple_of(mode * slot, 32)
                wm = wref[pl.ds(off, slot), :]
            wt = wm[0:topr].astype(F32)
            wl = wm[topr:topr + leftr].astype(F32)
            pred = _mm(topf, wt) + _dotg0(leftf, wl)            # (1,L) f32
            if smr:
                smt_ref, sml_ref = smrefs[s]
                smv = _mm(topf, smt_ref[:]) + _dotg0(leftf, sml_ref[:])
                smi = ((smv.astype(I32) + 2) >> 2).astype(F32)
                ws = wm[topr + leftr:topr + leftr + smr].astype(F32)
                pred = pred + _mm(smi, ws)
            pred_i = pred.astype(I32)
            sh = jnp.where(mode <= 1, log2s + 1, 5)
            if cfg.mip:
                # MIP shift: 6 + log2(s/4) (specmodel.intra.mode_shift)
                sh = jnp.where(mode >= n_std, log2s + 4, sh)
            pred_i = (pred_i + (1 << (sh - 1))) >> sh
            pred2d = _to2d(pred_i, s)                           # (s,s)
            if cfg.pdpc and luma:
                # PDPC blend with the RAW refs (specmodel.intra.apply_pdpc;
                # luma-only, planar/DC/H/V — FORMAT.md §8).  top_vec lane 0
                # is the corner, lanes 1..s the top row; left_vec rows 0..s
                # the left column.  Pure int32 VPU math, |terms| < 2^22.
                # Availability gate (see specmodel.intra): a side's terms
                # are zeroed when its reference is out of picture.
                hm, vm = (10, 26) if n_modes == 35 else (18, 50)
                lok = ((cx > 0) | (x > 0)).astype(I32)
                tok = ((cy > 0) | (y > 0)).astype(I32)
                # weights from iota (pallas_call rejects captured jnp
                # constants): w(i) = 32 >> min(31, 2i >> scale)
                scale = (2 * log2s - 2) >> 2
                colx = jax.lax.broadcasted_iota(I32, (s, s), 1)
                rowy = jax.lax.broadcasted_iota(I32, (s, s), 0)
                wl = (32 >> jnp.minimum(31, (2 * colx) >> scale)) * lok
                wt = (32 >> jnp.minimum(31, (2 * rowy) >> scale)) * tok
                corner = top_vec[0:1, 0:1]
                traw = pltpu.roll(top_vec, 127, 1)[:, 0:s]      # (1, s)
                lcol = left_vec[0:s, 0:1]                       # (s, 1)
                both = (lok & tok) == 1
                pd = (wl * lcol + wt * traw
                      + (64 - wl - wt) * pred2d + 32) >> 6
                ver = (64 * pred2d + wl * (lcol - corner) + 32) >> 6
                hor = (64 * pred2d + wt * (traw - corner) + 32) >> 6
                pred2d = jnp.where(mode <= 1, pd, pred2d)
                pred2d = jnp.where(both & (mode == vm), ver, pred2d)
                pred2d = jnp.where(both & (mode == hm), hor, pred2d)
            return pred2d

        def mc_pred(s, pyr_ref, xpix, ypix, mvx, mvy):
            """Motion-compensated (s, s) int32 prediction: DMA an
            8/128-aligned window around the integer-pel gather position,
            then shift with rolls / static row selects (mirrors
            kernels.interp.mc_block: plane (mvy&3)*4+(mvx&3), offset
            pos + REF_PAD + (mv >> 2))."""
            f = (mvy & 3) * 4 + (mvx & 3)
            ix = xpix + REF_PAD + (mvx >> 2)
            iy = ypix + REF_PAD + (mvy >> 2)
            iyb = (iy // 8) * 8
            ixb = (ix // 128) * 128
            cp = pltpu.make_async_copy(
                pyr_ref.at[f, pl.ds(pl.multiple_of(iyb, 8), 40),
                           pl.ds(pl.multiple_of(ixb, 128), 256)],
                mcwin, mcsem)
            cp.start()
            cp.wait()
            v = mcwin[:].astype(I32)
            v = pltpu.roll(v, (256 - (ix - ixb)) % 256, 1)[:, 0:s]
            rem = iy - iyb                                      # 0..7
            out = v[0:s]
            for k in range(1, 8):
                out = jnp.where(rem == k, v[k:k + s], out)
            return out

        def tu(s, win, col, top, data_ref, cf_ref, x, y, mode, mts,
               iargs=None, luma=False):
            realign = (s == 4)
            log2s = s.bit_length() - 1

            if iargs is None:
                pred2d = intra_pred(s, win, col, top, x, y, mode, luma)
                skip = None
            else:
                (is_inter, skip, mvx, mvy, pyr_ref, x0pix, y0pix,
                 bargs) = iargs

                @pl.when(jnp.logical_not(is_inter))
                def _():
                    predbuf[0:s, 0:s] = intra_pred(s, win, col, top,
                                                   x, y, mode, luma)

                @pl.when(is_inter)
                def _():
                    p0 = mc_pred(s, pyr_ref, x0pix + x, y0pix + y,
                                 mvx, mvy)
                    if bargs is None:
                        predbuf[0:s, 0:s] = p0
                    else:
                        is_l1, is_bi, m1x, m1y, pyr1_ref = bargs
                        p1 = mc_pred(s, pyr1_ref, x0pix + x, y0pix + y,
                                     m1x, m1y)
                        predbuf[0:s, 0:s] = jnp.where(
                            is_bi, (p0 + p1 + 1) >> 1,
                            jnp.where(is_l1, p1, p0))

                pred2d = predbuf[0:s, 0:s]

            # transform matrices for this TU's combo; transform skip
            # (C10, mts == 5 on luma) clamps the table index and selects
            # the shifted-residual path after the (still computed)
            # matmuls — branchless under the sequential grid.
            nct = ncombo if (s in sizes and cfg.mts) else 1
            tslot = max(s, 8)
            txr = txrefs[s]
            use_ts = cfg.transform_skip and luma
            tsh = 7 - log2s
            is_ts = (mts == 5) if use_ts else None
            cmb = jnp.minimum(mts, nct - 1) if use_ts else mts

            def txmat(role):
                off = role * nct * tslot + cmb * tslot
                m = txr[pl.ds(pl.multiple_of(off, 8), tslot), :]
                return m[0:s, 0:s]

            qbits, qadd, qscale, ishift, dscale = qconsts(s)

            def inverse(lev):
                d = (lev * dscale + (1 << (ishift - 1))) >> ishift
                d = jnp.clip(d, -32768, 32767)
                t = _limb_mm_rhs(txmat(2), d)
                t = jnp.clip(_rshift_round(t, 7), -32768, 32767)
                r = _limb_mm_lhs(t, txmat(3))
                r = jnp.clip(_rshift_round(r, 12), -32768, 32767)
                if use_ts:
                    r = jnp.where(is_ts, (d + (1 << (tsh - 1))) >> tsh, r)
                return r

            if encode:
                dblk = _read_rows(data_ref, y, s, realign)
                orig = pltpu.roll(dblk, (128 - x) % 128, 1)[:, 0:s]
                if lossless:
                    if skip is None:
                        rec = orig
                        lev = orig - pred2d
                    else:
                        lev = jnp.where(skip, 0, orig - pred2d)
                        rec = jnp.clip(jnp.where(skip, pred2d, orig),
                                       0, 255)
                else:
                    res_i = orig - pred2d
                    res = res_i.astype(F32)
                    t = _mm(txmat(0), res).astype(I32)
                    t = _rshift_round(t, log2s - 1)
                    co = _limb_mm_lhs(t, txmat(1))
                    co = jnp.clip(_rshift_round(co, log2s + 6),
                                  -32768, 32767)
                    if use_ts:
                        co = jnp.where(is_ts, res_i << tsh, co)
                    aco = jnp.abs(co)
                    if cfg.rdoq:
                        # mirrors kernels.quant.rd_quantize exactly (the
                        # interpret-mode equality tests pin it): 3-level
                        # candidate RD decision, elementwise VPU math
                        lup = jnp.clip(
                            (aco * qscale + (1 << (qbits - 1))) >> qbits,
                            0, 32767)
                        ldn = jnp.maximum(lup - 1, 0)
                        err_scale = float(2.0 ** (-2 * (7 - log2s)))
                        lam = float(cfg.lambda_mode)

                        def rdcost(l):
                            dq = jnp.clip(
                                (l * dscale + (1 << (ishift - 1)))
                                >> ishift, -32768, 32767)
                            e = (aco - dq).astype(F32)
                            rate = jnp.where(
                                l > 0,
                                3.0 + 2.0 * jnp.log2(l.astype(F32) + 1.0),
                                0.0625)
                            return e * e * err_scale + lam * rate

                        c0 = rdcost(jnp.zeros_like(aco))
                        cd = rdcost(ldn)
                        cu = rdcost(lup)
                        alev = jnp.where(cu <= cd, lup, ldn)
                        alev = jnp.where(jnp.minimum(cu, cd) <= c0, alev,
                                         jnp.zeros_like(alev))
                    else:
                        alev = jnp.clip((aco * qscale + qadd) >> qbits,
                                        0, 32767)
                    lev = jnp.where(co > 0, alev,
                                    jnp.where(co < 0, -alev, 0))
                    if skip is not None:
                        lev = jnp.where(skip, 0, lev)
                    rec = jnp.clip(pred2d + inverse(lev), 0, 255)
                _rmw_write(cf_ref, y, s, lev, x, realign)
            else:
                dblk = _read_rows(data_ref, y, s, realign)
                lev = pltpu.roll(dblk, (128 - x) % 128, 1)[:, 0:s]
                if lossless:
                    rec = jnp.clip(pred2d + lev, 0, 255)
                else:
                    rec = jnp.clip(pred2d + inverse(lev), 0, 255)
            _rmw_write(win, y, s, rec, x, realign)

        # ---- z-order walk over the CTU's 8x8 units ----
        def derive_mv(zx, zy):
            """Skip-MV predictor (mirrors engine.inter.mv_predictor_np):
            left unit's MV if its CU is CODED-MV inter (not skip — the
            one-hop rule, engine.inter._coded_mv; int_s records that
            flag), else the above unit (same CTU row), else (0, 0)."""
            lidx = jnp.where(zx > 0, zx - 1, 8)
            left_ok = (((cx > 0) | (zx > 0))
                       & (int_s[zy, lidx] == 1))
            arow = jnp.maximum(zy - 1, 0)
            above_ok = (zy > 0) & (int_s[arow, zx] == 1)
            dmx = jnp.where(left_ok, mvx_s[zy, lidx],
                            jnp.where(above_ok, mvx_s[arow, zx], 0))
            dmy = jnp.where(left_ok, mvy_s[zy, lidx],
                            jnp.where(above_ok, mvy_s[arow, zx], 0))
            return dmx, dmy

        def z_body(z, carry):
            a = attr_ref[0, cx, z]
            active = (a & 1) == 1
            code = (a >> 1) & 3
            mts = (a >> 3) & 7
            mode = (a >> 6) & 127
            zx = (z & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
            zy = (((z >> 1) & 1) | (((z >> 3) & 1) << 1)
                  | (((z >> 5) & 1) << 2))
            for si, s in enumerate(sizes):
                @pl.when(active & (code == si))
                def _(s=s):
                    cmts = jnp.zeros((), I32)
                    if not inter:
                        tu(s, winY, colY, topY, dY_ref,
                           cfY_ref if encode else None,
                           zx * 8, zy * 8, mode, mts, luma=True)
                        tu(s // 2, winCb, colCb, topCb, dCb_ref,
                           cfCb_ref if encode else None,
                           zx * 4, zy * 4, mode, cmts)
                        tu(s // 2, winCr, colCr, topCr, dCr_ref,
                           cfCr_ref if encode else None,
                           zx * 4, zy * 4, mode, cmts)
                        return
                    a2 = attr2_ref[0, cx, z]
                    kind = a2 & 7
                    amvx = ((a2 >> 3) & 1023) - 512
                    amvy = ((a2 >> 13) & 1023) - 512
                    skip = kind == PRED_SKIP
                    is_inter = kind != PRED_INTRA
                    dmx, dmy = derive_mv(zx, zy)
                    if cfg.merge_cands and encode:
                        # merge candidate 1 (above rule); merge_idx
                        # arrives in the skip CU's mvx attr slot
                        arow = jnp.maximum(zy - 1, 0)
                        a_ok = (zy > 0) & (int_s[arow, zx] == 1)
                        ax = jnp.where(a_ok, mvx_s[arow, zx], 0)
                        ay = jnp.where(a_ok, mvy_s[arow, zx], 0)
                        use1 = amvx == 1
                        dmx = jnp.where(use1, ax, dmx)
                        dmy = jnp.where(use1, ay, dmy)
                    elif cfg.merge_cands:
                        # decode: the walker resolved the candidate
                        # into the MV maps already
                        dmx, dmy = amvx, amvy
                    mvx = jnp.where(skip, dmx, amvx)
                    mvy = jnp.where(skip, dmy, amvy)
                    if b_mode:
                        a3 = attr3_ref[0, cx, z]
                        is_l1 = kind == PRED_L1
                        is_bi = kind == PRED_BI
                        m1x = jnp.where(is_bi,
                                        ((a3 >> 0) & 1023) - 512, mvx)
                        m1y = jnp.where(is_bi,
                                        ((a3 >> 10) & 1023) - 512, mvy)
                        byl = (is_l1, is_bi, m1x, m1y, pyr1Y_ref)
                        bcb = (is_l1, is_bi, m1x >> 1, m1y >> 1,
                               pyr1Cb_ref)
                        bcr = (is_l1, is_bi, m1x >> 1, m1y >> 1,
                               pyr1Cr_ref)
                    else:
                        byl = bcb = bcr = None
                    tu(s, winY, colY, topY, dY_ref,
                       cfY_ref if encode else None,
                       zx * 8, zy * 8, mode, mts,
                       iargs=(is_inter, skip, mvx, mvy, pyrY_ref,
                              cx * 64, cy * 64, byl), luma=True)
                    cmx = mvx >> 1
                    cmy = mvy >> 1
                    tu(s // 2, winCb, colCb, topCb, dCb_ref,
                       cfCb_ref if encode else None,
                       zx * 4, zy * 4, mode, cmts,
                       iargs=(is_inter, skip, cmx, cmy, pyrCb_ref,
                              cx * 32, cy * 32, bcb))
                    tu(s // 2, winCr, colCr, topCr, dCr_ref,
                       cfCr_ref if encode else None,
                       zx * 4, zy * 4, mode, cmts,
                       iargs=(is_inter, skip, cmx, cmy, pyrCr_ref,
                              cx * 32, cy * 32, bcr))
                    # record the CU's final MV + predictor-eligibility
                    # flag (coded-MV inter: NOT skip) over its units
                    u = s // 8
                    flag = (is_inter & ~skip).astype(I32)
                    for i in range(u):
                        for j in range(u):
                            mvx_s[zy + i, zx + j] = mvx
                            mvy_s[zy + i, zx + j] = mvy
                            int_s[zy + i, zx + j] = flag
                    row = _row_iota(8, 128)
                    lane = _lane_iota(8, 128)
                    m = ((row >= zy) & (row < zy + u)
                         & (lane >= zx) & (lane < zx + u))
                    mvxV[:] = jnp.where(m, jnp.full((8, 128), mvx, I32),
                                        mvxV[:])
                    mvyV[:] = jnp.where(m, jnp.full((8, 128), mvy, I32),
                                        mvyV[:])
            return carry

        jax.lax.fori_loop(0, 64, z_body, 0)

        # ---- emit recon blocks, update row/col buffers ----
        recY_ref[:] = winY[0:64, :]
        recCb_ref[:] = winCb[0:32, :]
        recCr_ref[:] = winCr[0:32, :]
        if inter:
            mvxO_ref[:] = mvxV[:]
            mvyO_ref[:] = mvyV[:]

        def rowbuf_update(win_, row0, row1, bs, rw):
            bottom = win_[bs - 1:bs, :]
            placed = pltpu.roll(
                jnp.concatenate(
                    [bottom, jnp.zeros((1, rw - 128), I32)], axis=1),
                cx * bs + 1, 1)
            lane = _lane_iota(1, rw)
            m = (lane >= cx * bs + 1) & (lane < cx * bs + 1 + bs)

            @pl.when(even)
            def _():
                row0[:] = jnp.where(m, placed, row0[:])

            @pl.when(jnp.logical_not(even))
            def _():
                row1[:] = jnp.where(m, placed, row1[:])

        rowbuf_update(winY, rowY0, rowY1, 64, rwy)
        rowbuf_update(winCb, rowCb0, rowCb1, 32, rwc)
        rowbuf_update(winCr, rowCr0, rowCr1, 32, rwc)

        def colbuf_update(win_, col, bs):
            # col[r] = plane(x0_next - 1, y0 + r): the window's right-edge
            # column of the CTU slot, incl. the 128s below the CTU.
            col[:, 0:1] = win_[0:col.shape[0], bs - 1:bs]

        colbuf_update(winY, colY, 64)
        colbuf_update(winCb, colCb, 32)
        colbuf_update(winCr, colCr, 32)

    # ---- pallas_call assembly ----
    smem = pltpu.SMEM
    vmem = pltpu.VMEM

    attr_spec = pl.BlockSpec((1, cx_n, 64), lambda i, j: (i, 0, 0),
                             memory_space=smem)
    in_specs = [attr_spec]
    if inter:
        in_specs.append(attr_spec)
    if b_mode:
        in_specs.append(attr_spec)
    in_specs += [pl.BlockSpec((64, 128), lambda i, j: (i, j),
                              memory_space=vmem),
                 pl.BlockSpec((32, 128), lambda i, j: (i, j),
                              memory_space=vmem),
                 pl.BlockSpec((32, 128), lambda i, j: (i, j),
                              memory_space=vmem)]
    if inter:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3  # pyramids
    if b_mode:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3  # L1 pyrs

    def const_spec():
        return pl.BlockSpec(memory_space=vmem)

    tables = [jnp.asarray(wtabs[4].reshape(-1, 128)),
              jnp.asarray(wtabs[8].reshape(-1, 128)),
              jnp.asarray(wtabs[16].reshape(-1, 256))]
    in_specs += [const_spec(), const_spec(), const_spec()]
    if has32:
        tables.append(jnp.asarray(w32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    for s in sorted(smtabs):
        a, b = smtabs[s]
        tables.append(jnp.asarray(a))
        tables.append(jnp.asarray(b))
        in_specs += [const_spec(), const_spec()]
    for s in sorted(txtabs):
        tables.append(jnp.asarray(txtabs[s]))
        in_specs.append(const_spec())

    outs = [jax.ShapeDtypeStruct((cy_n * 64, cx_n * 128), jnp.int32),
            jax.ShapeDtypeStruct((cy_n * 32, cx_n * 128), jnp.int32),
            jax.ShapeDtypeStruct((cy_n * 32, cx_n * 128), jnp.int32)]
    out_specs = [pl.BlockSpec((64, 128), lambda i, j: (i, j),
                              memory_space=vmem),
                 pl.BlockSpec((32, 128), lambda i, j: (i, j),
                              memory_space=vmem),
                 pl.BlockSpec((32, 128), lambda i, j: (i, j),
                              memory_space=vmem)]
    if encode:
        outs = outs + list(outs)
        out_specs = out_specs + [
            pl.BlockSpec((64, 128), lambda i, j: (i, j),
                         memory_space=vmem),
            pl.BlockSpec((32, 128), lambda i, j: (i, j),
                         memory_space=vmem),
            pl.BlockSpec((32, 128), lambda i, j: (i, j),
                         memory_space=vmem)]
    if inter:
        outs += [jax.ShapeDtypeStruct((cy_n * 8, cx_n * 128), jnp.int32),
                 jax.ShapeDtypeStruct((cy_n * 8, cx_n * 128), jnp.int32)]
        out_specs += [pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                   memory_space=vmem)] * 2

    scratch = [pltpu.VMEM((128, 128), jnp.int32),   # winY
               pltpu.VMEM((64, 128), jnp.int32),    # winCb
               pltpu.VMEM((64, 128), jnp.int32),    # winCr
               pltpu.VMEM((1, 128), jnp.int32),     # topY
               pltpu.VMEM((1, 128), jnp.int32),     # topCb
               pltpu.VMEM((1, 128), jnp.int32),     # topCr
               pltpu.VMEM((1, rwy), jnp.int32),     # rowY0
               pltpu.VMEM((1, rwy), jnp.int32),     # rowY1
               pltpu.VMEM((1, rwc), jnp.int32),
               pltpu.VMEM((1, rwc), jnp.int32),
               pltpu.VMEM((1, rwc), jnp.int32),
               pltpu.VMEM((1, rwc), jnp.int32),
               pltpu.VMEM((112, 128), jnp.int32),   # colY
               pltpu.VMEM((64, 128), jnp.int32),    # colCb
               pltpu.VMEM((64, 128), jnp.int32)]    # colCr
    if inter:
        scratch += [pltpu.VMEM((32, 128), jnp.int32),    # predbuf
                    pltpu.VMEM((40, 256), jnp.uint8),    # mcwin
                    pltpu.SemaphoreType.DMA,             # mcsem
                    pltpu.SMEM((8, 16), jnp.int32),      # mvx_s
                    pltpu.SMEM((8, 16), jnp.int32),      # mvy_s
                    pltpu.SMEM((8, 16), jnp.int32),      # int_s
                    pltpu.VMEM((8, 128), jnp.int32),     # mvxV
                    pltpu.VMEM((8, 128), jnp.int32)]     # mvyV
    if has32:
        slot32 = _wgeom(32)[3]
        scratch += [pltpu.VMEM((slot32, 1024), jnp.int8),
                    pltpu.SemaphoreType.DMA]

    call = pl.pallas_call(
        kernel,
        grid=(cy_n, cx_n),
        out_shape=tuple(outs),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    return call, tables


# ---- XLA-side packing -------------------------------------------------------

def _slot_pack(img, cyn: int, cxn: int, bs: int, fill: int):
    h, w = img.shape
    p = jnp.full((cyn * bs, cxn * 128), fill, jnp.int32)
    blocks = jnp.pad(img.astype(jnp.int32),
                     ((0, cyn * bs - h), (0, cxn * bs - w)),
                     constant_values=fill)
    blocks = blocks.reshape(cyn * bs, cxn, bs)
    p = p.reshape(cyn * bs, cxn, 128).at[:, :, :bs].set(blocks)
    return p.reshape(cyn * bs, cxn * 128)


def _slot_unpack(arr, cyn: int, cxn: int, bs: int, h: int, w: int):
    a = arr.reshape(cyn * bs, cxn, 128)[:, :, :bs]
    return a.reshape(cyn * bs, cxn * bs)[:h, :w]


@functools.cache
def _attr_geom(cfg: CodecConfig):
    z = np.arange(64)
    zx = (z & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
    zy = ((z >> 1) & 1) | (((z >> 3) & 1) << 1) | (((z >> 5) & 1) << 2)
    cyy, cxx = np.mgrid[0:cfg.ctus_y, 0:cfg.ctus_x]
    ux = cxx[:, :, None] * 8 + zx[None, None, :]
    uy = cyy[:, :, None] * 8 + zy[None, None, :]
    inb = (ux < cfg.units_x) & (uy < cfg.units_y)
    uxc = np.minimum(ux, cfg.units_x - 1).astype(np.int32)
    uyc = np.minimum(uy, cfg.units_y - 1).astype(np.int32)
    return (ux.astype(np.int32), uy.astype(np.int32), inb, uxc, uyc)


def _pack_attrs(cfg: CodecConfig, size_map, mode_map, mts_map):
    ux, uy, inb, uxc, uyc = _attr_geom(cfg)
    sz = size_map[uyc, uxc]
    units = sz >> 3
    origin = (((ux & (units - 1)) == 0) & ((uy & (units - 1)) == 0))
    active = (jnp.asarray(inb) & origin).astype(jnp.int32)
    code = ((sz == 16).astype(jnp.int32)
            + 2 * (sz == 32).astype(jnp.int32))
    mode = mode_map[uyc, uxc]
    mts = (mts_map[uyc, uxc] if (cfg.mts or cfg.transform_skip)
           else jnp.zeros_like(mode))
    return active | (code << 1) | (mts << 3) | (mode << 6)


# ---- public API -------------------------------------------------------------

@functools.cache
def make_recon_pallas_raw(cfg: CodecConfig, encode: bool,
                          interpret: bool | None = None):
    """Pallas implementation of engine.recon.make_recon_pass_raw —
    same signature, bit-exact (tests/test_recon_pallas.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call, tables = _build_pallas(cfg, encode, interpret)
    h, w = cfg.height, cfg.width
    ch, cw = h // 2, w // 2
    cyn, cxn = cfg.ctus_y, cfg.ctus_x

    def run(a, b, c, size_map, mode_map, mts_map):
        attr = _pack_attrs(cfg, size_map.astype(jnp.int32),
                           mode_map.astype(jnp.int32),
                           mts_map.astype(jnp.int32))
        if encode:
            # a/b/c are padded planes; image at (+1, +1).
            dy = _slot_pack(a[1:1 + h, 1:1 + w], cyn, cxn, 64, 128)
            db = _slot_pack(b[1:1 + ch, 1:1 + cw], cyn, cxn, 32, 128)
            dc = _slot_pack(c[1:1 + ch, 1:1 + cw], cyn, cxn, 32, 128)
        else:
            dy = _slot_pack(a, cyn, cxn, 64, 0)
            db = _slot_pack(b, cyn, cxn, 32, 0)
            dc = _slot_pack(c, cyn, cxn, 32, 0)
        res = call(attr, dy, db, dc, *tables)
        y8 = _slot_unpack(res[0], cyn, cxn, 64, h, w).astype(jnp.uint8)
        cb8 = _slot_unpack(res[1], cyn, cxn, 32, ch, cw).astype(jnp.uint8)
        cr8 = _slot_unpack(res[2], cyn, cxn, 32, ch, cw).astype(jnp.uint8)
        if encode:
            cY = _slot_unpack(res[3], cyn, cxn, 64, h, w).astype(jnp.int16)
            cCb = _slot_unpack(res[4], cyn, cxn, 32, ch, cw
                               ).astype(jnp.int16)
            cCr = _slot_unpack(res[5], cyn, cxn, 32, ch, cw
                               ).astype(jnp.int16)
        else:
            cY = a.astype(jnp.int16)
            cCb = b.astype(jnp.int16)
            cCr = c.astype(jnp.int16)
        return (y8, cb8, cr8, cY, cCb, cCr)

    return run


def _pack_attrs2(cfg: CodecConfig, pred_map, mvx_map, mvy_map):
    """Second attr word: CU kind (3 bits, engine.inter.PRED_*) +
    explicit primary MV (|mv| <= 288 < 512)."""
    _, _, _, uxc, uyc = _attr_geom(cfg)
    kind = pred_map[uyc, uxc]
    mvx = mvx_map[uyc, uxc] + 512
    mvy = mvy_map[uyc, uxc] + 512
    return kind | (mvx << 3) | (mvy << 13)


def _pack_attrs3(cfg: CodecConfig, mvx1_map, mvy1_map):
    """Third attr word (B slices): bi-prediction's L1 MV."""
    _, _, _, uxc, uyc = _attr_geom(cfg)
    return ((mvx1_map[uyc, uxc] + 512)
            | ((mvy1_map[uyc, uxc] + 512) << 10))


def _pad_pyr(pyr, rpad: int, wneed: int):
    """Zero-pad a (16, Hp, Wp) pyramid on the far sides so every MC
    window DMA (8-aligned rows x 40, 128-aligned lanes x 256) stays in
    bounds; the padding is never consumed (rolls discard it)."""
    wpad = max(0, wneed - pyr.shape[2])
    return jnp.pad(pyr, ((0, 0), (0, rpad), (0, wpad)))


@functools.cache
def make_recon_inter_pallas_raw(cfg: CodecConfig, encode: bool,
                                b_mode: bool = False,
                                interpret: bool | None = None):
    """Pallas implementation of engine.inter.make_recon_inter_raw —
    same signature and bit-exact results (tests/test_recon_pallas.py).

    Adds to the intra kernel: per-CU kind/MV attributes, skip-MV
    derivation through an SMEM unit-MV state (left column of the
    previous CTU carried in column 8), motion compensation as an
    aligned-window DMA from the uint8 quarter-pel pyramids, and final
    per-unit MV map outputs for the entropy walker.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call, tables = _build_pallas(cfg, encode, interpret, inter=True,
                                 b_mode=b_mode)
    h, w = cfg.height, cfg.width
    ch, cw = h // 2, w // 2
    cyn, cxn = cfg.ctus_y, cfg.ctus_x
    uyn, uxn = cfg.units_y, cfg.units_x
    # luma gather offset bound: pos + REF_PAD + 72; window reads 40 rows
    # from an 8-aligned base and 256 lanes from a 128-aligned base.
    wneed_y = _pad_to(w + REF_PAD + 72, 128) + 256
    wneed_c = _pad_to(cw + REF_PAD + 40, 128) + 256
    rpad = 40

    def run(a, b, c, size_map, mode_map, mts_map, pred_map, mvx_map,
            mvy_map, pyr_y, pyr_cb, pyr_cr, pyr1_y=None, pyr1_cb=None,
            pyr1_cr=None, mvx1_map=None, mvy1_map=None):
        attr = _pack_attrs(cfg, size_map.astype(jnp.int32),
                           mode_map.astype(jnp.int32),
                           mts_map.astype(jnp.int32))
        attr2 = _pack_attrs2(cfg, pred_map.astype(jnp.int32),
                             mvx_map.astype(jnp.int32),
                             mvy_map.astype(jnp.int32))
        if encode:
            dy = _slot_pack(a[1:1 + h, 1:1 + w], cyn, cxn, 64, 128)
            db = _slot_pack(b[1:1 + ch, 1:1 + cw], cyn, cxn, 32, 128)
            dc = _slot_pack(c[1:1 + ch, 1:1 + cw], cyn, cxn, 32, 128)
        else:
            dy = _slot_pack(a, cyn, cxn, 64, 0)
            db = _slot_pack(b, cyn, cxn, 32, 0)
            dc = _slot_pack(c, cyn, cxn, 32, 0)
        py = _pad_pyr(pyr_y, rpad, wneed_y)
        pcb = _pad_pyr(pyr_cb, rpad, wneed_c)
        pcr = _pad_pyr(pyr_cr, rpad, wneed_c)
        args = [attr, attr2]
        if b_mode:
            args.append(_pack_attrs3(cfg, mvx1_map.astype(jnp.int32),
                                     mvy1_map.astype(jnp.int32)))
        args += [dy, db, dc, py, pcb, pcr]
        if b_mode:
            args += [_pad_pyr(pyr1_y, rpad, wneed_y),
                     _pad_pyr(pyr1_cb, rpad, wneed_c),
                     _pad_pyr(pyr1_cr, rpad, wneed_c)]
        res = call(*args, *tables)
        y8 = _slot_unpack(res[0], cyn, cxn, 64, h, w).astype(jnp.uint8)
        cb8 = _slot_unpack(res[1], cyn, cxn, 32, ch, cw).astype(jnp.uint8)
        cr8 = _slot_unpack(res[2], cyn, cxn, 32, ch, cw).astype(jnp.uint8)
        if encode:
            cY = _slot_unpack(res[3], cyn, cxn, 64, h, w).astype(jnp.int16)
            cCb = _slot_unpack(res[4], cyn, cxn, 32, ch, cw
                               ).astype(jnp.int16)
            cCr = _slot_unpack(res[5], cyn, cxn, 32, ch, cw
                               ).astype(jnp.int16)
            mvx_o, mvy_o = res[6], res[7]
        else:
            cY = a.astype(jnp.int16)
            cCb = b.astype(jnp.int16)
            cCr = c.astype(jnp.int16)
            mvx_o, mvy_o = res[3], res[4]
        mvx_f = _slot_unpack(mvx_o, cyn, cxn, 8, uyn, uxn
                             ).astype(jnp.int16)
        mvy_f = _slot_unpack(mvy_o, cyn, cxn, 8, uyn, uxn
                             ).astype(jnp.int16)
        return (y8, cb8, cr8, cY, cCb, cCr, mvx_f, mvy_f)

    return run
