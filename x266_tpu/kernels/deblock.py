"""Deblocking filter (C13) [STD-shaped], TPU-first formulation.

HEVC-style two-pass design: all vertical edges filtered in one fully
vectorized step, then all horizontal edges on the vertically-filtered
samples [STD order] — each pass is pure element-wise/gather math, ideal
for the VPU, instead of the reference's per-edge scalar loops.

Edge geometry: luma edges on the 8-sample grid where a CU boundary exists
(v1: TU==PU==CU); chroma edges on its 8-sample grid (16 luma).  beta/tc
thresholds are x266t constants shaped like the HEVC tables
(self-consistent encoder/decoder; HEVC-table conformance is unverifiable
here, SURVEY.md §0).

Boundary strength (C13 derivation, HEVC-shaped [STD]): per 8x8-unit edge
  BS=2  either side intra;
  BS=1  either side has non-zero luma coefficients, the prediction kinds
        differ (the ref-picture-difference proxy: L0/L1/BI mismatch), or
        the MV components differ by >= 1 full pel (4 quarter-pel);
  BS=0  otherwise -> edge not filtered; chroma filters only at BS=2.
tc indexes the table at qp + 2*(BS-1) per edge [STD shape].  Both sides
of the codec compute BS from the SAME inputs: parsed/coded pred kinds,
the recon scan's FINAL MV planes (skip MVs are derived identically in
encoder and decoder), and the coded luma levels — so filtered recon
stays bit-exact across encode/decode (the MD5 gate covers it).
Intra pictures (pred info absent) keep the constant-BS=2 fast path.

The same code runs under NumPy (oracle/spec) and jax.numpy (device): all
ops are arithmetic-shift/clip/where, bit-exact in both.  Normative: the
decoder applies exactly this filter; the encoder applies it to its recon
before output/DPB, so the MD5 gate covers it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# x266t threshold tables (HEVC-shaped [STD]); index = clipped QP.
BETA_TABLE = np.array(
    [0] * 16 + [6 + q for q in range(13)]               # qp 16..28
    + [20 + 2 * q for q in range(23)], dtype=np.int32)  # qp 29..51
TC_TABLE = np.array(
    [0] * 18
    + [1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5,
       6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24, 24, 24],
    dtype=np.int32)


def beta_of(qp: int) -> int:
    return int(BETA_TABLE[min(max(qp, 0), 51)])


def tc_of(qp: int, bs: int = 2) -> int:
    return int(TC_TABLE[min(max(qp + 2 * (bs - 1), 0), 53)])


def bs_units(pred, mvx, mvy, cbf, xp, axis: int = 1):
    """(Uy, Ux) boundary strength of the edge between each 8x8 unit and
    its neighbor at -1 along `axis` (left for axis=1, above for axis=0).
    pred: prediction kinds (0 = intra, engine.inter.PRED_*); mvx/mvy:
    FINAL quarter-pel MV planes (incl. derived skip MVs); cbf: per-unit
    non-zero-luma-level flags.  Index 0 along `axis` is never an edge
    (masked by the caller)."""
    def shift(a):
        if axis == 1:
            return xp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        return xp.concatenate([a[:1], a[:-1]], axis=0)

    intra = (shift(pred) == 0) | (pred == 0)
    bs1 = ((shift(cbf) | cbf)
           | (shift(pred) != pred)
           | (xp.abs(shift(mvx) - mvx) >= 4)
           | (xp.abs(shift(mvy) - mvy) >= 4))
    return xp.where(intra, 2, xp.where(bs1, 1, 0)).astype(xp.int32)


def cbf_units(coef_y, xp):
    """(H, W) luma level plane -> (H/8, W/8) non-zero flags (int32)."""
    h, w = coef_y.shape
    blk = xp.reshape(xp.abs(coef_y), (h // 8, 8, w // 8, 8))
    return (blk.max(axis=(1, 3)) > 0).astype(xp.int32)


def luma_edge_mask(size_map: np.ndarray) -> np.ndarray:
    """(Uy, Ux) bool: vertical CU-boundary edge at the left side of each
    8x8 unit (column 0 excluded — picture boundary is never filtered)."""
    uy, ux = size_map.shape
    k = np.arange(ux)[None, :]
    mask = (k % (size_map // 8)) == 0
    mask[:, 0] = False
    return mask


def _filter_luma_dir(y, edge_mask_units, beta, tc, xp, maxv=255):
    """One direction of luma deblocking over vertical edges.

    y: (H, W) int32; edge_mask_units: (H//8, W//8) bool (True = edge at
    column 8*k); tc: scalar, or a per-unit (H//8, W//8) int array (BS-
    derived) broadcast to edge lines here.  Returns filtered (H, W).
    For horizontal edges call with transposed arguments.
    """
    h, w = y.shape
    ux = w // 8
    ecols = np.arange(1, ux) * 8                       # candidate columns
    if len(ecols) == 0 or beta == 0:
        return y
    em = edge_mask_units[:, 1:]                        # (Uy, E)
    if not np.isscalar(tc):
        tc = xp.repeat(tc[:, 1:], 8, axis=0)           # (H, E) per edge

    def col(off):
        return y[:, ecols + off]                       # (H, E)

    p3, p2, p1, p0 = col(-4), col(-3), col(-2), col(-1)
    q0, q1, q2, q3 = col(0), col(1), col(2), col(3)

    # per-4-line-segment decisions from lines 0 and 3 [STD]
    def seg(a):                                        # (H, E) -> (H//4, E)
        return a.reshape(h // 4, 4, -1)

    dp = xp.abs(p2 - 2 * p1 + p0)
    dq = xp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = seg(dp)[:, 0], seg(dp)[:, 3]
    dq0, dq3 = seg(dq)[:, 0], seg(dq)[:, 3]
    d = dp0 + dp3 + dq0 + dq3
    filter_on = d < beta

    sgap = xp.abs(p3 - p0) + xp.abs(q3 - q0)
    pq = xp.abs(p0 - q0)
    strong_line = ((sgap < (beta >> 3)) &
                   (pq < ((5 * tc + 1) >> 1)))
    strong = (filter_on
              & (2 * (dp0 + dq0) < (beta >> 2))
              & (2 * (dp3 + dq3) < (beta >> 2))
              & seg(strong_line)[:, 0] & seg(strong_line)[:, 3])
    side_p = filter_on & ((dp0 + dp3) < ((beta + (beta >> 1)) >> 3))
    side_q = filter_on & ((dq0 + dq3) < ((beta + (beta >> 1)) >> 3))

    # broadcast segment decisions to lines, then mask by CU-edge existence
    def up(a):                                         # (H//4, E) -> (H, E)
        return xp.repeat(a, 4, axis=0)

    edge_lines = xp.repeat(xp.asarray(em), 8, axis=0)  # (H, E)
    filter_on_l = up(filter_on) & edge_lines
    strong_l = up(strong) & edge_lines
    normal_l = filter_on_l & ~strong_l
    side_p_l = up(side_p) & edge_lines
    side_q_l = up(side_q) & edge_lines

    # ---- strong filter [STD equations], clipped to +-2tc ----
    def cl2(x0, v):
        return xp.clip(v, x0 - 2 * tc, x0 + 2 * tc)

    sp0 = cl2(p0, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = cl2(p1, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = cl2(p2, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = cl2(q0, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
    sq1 = cl2(q1, (q2 + q1 + q0 + p0 + 2) >> 2)
    sq2 = cl2(q2, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)

    # ---- normal filter [STD] ----
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    mag_ok = xp.abs(delta0) < 10 * tc
    delta = xp.clip(delta0, -tc, tc)
    np0 = xp.clip(p0 + delta, 0, maxv)
    nq0 = xp.clip(q0 - delta, 0, maxv)
    half = tc >> 1
    dp1 = xp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -half, half)
    dq1 = xp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -half, half)
    np1 = xp.clip(p1 + dp1, 0, maxv)
    nq1 = xp.clip(q1 + dq1, 0, maxv)

    norm_app = normal_l & mag_ok
    out_p0 = xp.where(strong_l, sp0, xp.where(norm_app, np0, p0))
    out_q0 = xp.where(strong_l, sq0, xp.where(norm_app, nq0, q0))
    out_p1 = xp.where(strong_l, sp1,
                      xp.where(norm_app & side_p_l, np1, p1))
    out_q1 = xp.where(strong_l, sq1,
                      xp.where(norm_app & side_q_l, nq1, q1))
    out_p2 = xp.where(strong_l, sp2, p2)
    out_q2 = xp.where(strong_l, sq2, q2)

    if xp is np:
        y = y.copy()
        for off, v in ((-3, out_p2), (-2, out_p1), (-1, out_p0),
                       (0, out_q0), (1, out_q1), (2, out_q2)):
            y[:, ecols + off] = v
        return y
    for off, v in ((-3, out_p2), (-2, out_p1), (-1, out_p0),
                   (0, out_q0), (1, out_q1), (2, out_q2)):
        y = y.at[:, ecols + off].set(v)
    return y


def _filter_chroma_dir(c, edge_mask_units, tc, xp, maxv=255):
    """Chroma deblocking, vertical edges on the 8-chroma-sample grid.
    edge_mask_units indexed by luma units; chroma edge at chroma column
    8*m corresponds to luma unit column 2*m (16 luma samples)."""
    h, w = c.shape
    n_edge = w // 8
    ecols = np.arange(1, n_edge) * 8
    if len(ecols) == 0 or tc == 0:
        return c
    em = edge_mask_units[:, 2 * np.arange(1, n_edge)]   # (Uy, E)
    # luma unit rows cover 8 luma = 4 chroma lines
    edge_lines = xp.repeat(xp.asarray(em), 4, axis=0)   # (H, E)

    p1, p0 = c[:, ecols - 2], c[:, ecols - 1]
    q0, q1 = c[:, ecols], c[:, ecols + 1]
    delta = xp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    np0 = xp.clip(p0 + delta, 0, maxv)
    nq0 = xp.clip(q0 - delta, 0, maxv)
    out_p0 = xp.where(edge_lines, np0, p0)
    out_q0 = xp.where(edge_lines, nq0, q0)
    if xp is np:
        c = c.copy()
        c[:, ecols - 1] = out_p0
        c[:, ecols] = out_q0
        return c
    c = c.at[:, ecols - 1].set(out_p0)
    c = c.at[:, ecols].set(out_q0)
    return c


def deblock_picture(y, cb, cr, size_map, qp: int, xp=jnp,
                    pred_map=None, mvx=None, mvy=None, coef_y=None,
                    bit_depth: int = 8):
    """Full normative deblock: vertical then horizontal, luma + chroma.

    y: (H, W) int32, cb/cr: (H/2, W/2) int32, size_map: (Uy, Ux).
    Inter pictures pass (pred_map, mvx, mvy, coef_y) — the coded kinds,
    the recon scan's FINAL MV planes and the luma level plane — and get
    per-edge boundary strengths (module docstring); without them every
    edge is BS=2 (the all-intra case, where that is exact).
    """
    if xp is not np:
        y, cb, cr = (xp.asarray(a, dtype=xp.int32) for a in (y, cb, cr))
        size_map = xp.asarray(size_map)
    # HEVC-shaped depth scaling [STD]: thresholds grow with the sample
    # range (beta/tc tables are defined at 8-bit)
    dsh = bit_depth - 8
    maxv = (1 << bit_depth) - 1
    beta = beta_of(qp) << dsh
    tc_c = tc_of(qp, bs=2) << dsh

    def vmask_of(sm):
        uy, ux = sm.shape
        k = xp.asarray(np.arange(ux))[None, :]
        m = (k % (sm // 8)) == 0
        if isinstance(m, np.ndarray):   # concrete geometry path
            m[:, 0] = False
            return m
        return m.at[:, 0].set(False)

    smT = size_map.T
    vm = vmask_of(size_map)
    hm = vmask_of(smT)

    if pred_map is None:
        tc_v = tc_h = tc_of(qp) << dsh   # BS=2 everywhere (all-intra)
        vm_c, hm_c = vm, hm
    else:
        cbf = cbf_units(coef_y, xp)
        bs_v = bs_units(pred_map, mvx, mvy, cbf, xp, axis=1)
        bs_hT = bs_units(pred_map.T, mvx.T, mvy.T, cbf.T, xp, axis=1)
        tct = xp.asarray(TC_TABLE)

        def tc_of_bs(bs):
            return xp.where(bs > 0,
                            tct[xp.clip(qp + 2 * (bs - 1), 0, 53)]
                            << dsh, 0)

        tc_v, tc_h = tc_of_bs(bs_v), tc_of_bs(bs_hT)
        vm = vm & (bs_v > 0)
        hm = hm & (bs_hT > 0)
        vm_c = vm & (bs_v == 2)          # chroma filters at BS=2 only
        hm_c = hm & (bs_hT == 2)

    y = _filter_luma_dir(y, vm, beta, tc_v, xp, maxv)
    y = _filter_luma_dir(y.T, hm, beta, tc_h, xp, maxv).T
    cb = _filter_chroma_dir(cb, vm_c, tc_c, xp, maxv)
    cb = _filter_chroma_dir(cb.T, hm_c, tc_c, xp, maxv).T
    cr = _filter_chroma_dir(cr, vm_c, tc_c, xp, maxv)
    cr = _filter_chroma_dir(cr.T, hm_c, tc_c, xp, maxv).T
    return y, cb, cr


@functools.cache
def make_deblock(cfg):
    """jitted deblock for a config: (y, cb, cr, size_map) -> filtered."""

    def run(y, cb, cr, size_map):
        return deblock_picture(y, cb, cr, size_map, cfg.qp, xp=jnp)

    return jax.jit(run)
