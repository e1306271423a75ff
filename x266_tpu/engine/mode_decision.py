"""Pass A: parallel intra mode decision + quadtree partitioning (C5/C8/C9).

TPU-first restructuring of the reference's serial recursive RDO
(SURVEY.md §3.3): every block of every CU size is evaluated for all 35
modes *simultaneously* — prediction is one stacked matmul, the full
residual chain (transform, quant, rate estimate, dequant, inverse, SSE)
runs batched over (blocks x modes) — then the quadtree is decided
bottom-up with vectorized min-reductions.  References come from ORIGINAL
pixels with the exact decode-order availability mask
(engine.availability), the standard hardware-encoder decoupling: Pass B
recomputes the normative coefficients against reconstructed pixels.

Cost model: D + lambda*R with SSE distortion and the surrogate rate of
kernels.cost; lossless mode costs rate only (distortion is zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.engine import availability as avail
from x266_tpu.kernels import cost as kcost
from x266_tpu.kernels import intra as kintra
from x266_tpu.kernels import quant as kquant
from x266_tpu.kernels import transforms as ktx

PAD = 72  # right/bottom plane padding (>= 2*32 ref overhang + slack)

MODE_SIGNAL_BITS = 6.0   # flat estimate for coding one luma mode
SPLIT_BITS = 2.0         # estimate for quadtree split signalling


def pad_plane(img: np.ndarray, mid: int = 128) -> np.ndarray:
    """(H, W) samples -> (1+H+PAD, 1+W+PAD) plane, border = mid-gray.

    uint8/uint16 keeps the host->device upload small (vs int32 —
    transfers dominate on remote-attached chips); device passes upcast
    to int32 on entry.  Layout: image pixel (y, x) lives at
    plane[y+1, x+1]; row/col 0 are the out-of-picture reference
    positions (always mid-gray per the x266t availability rule).
    """
    h, w = img.shape
    dt = np.uint8 if mid <= 128 else np.uint16
    plane = np.full((1 + h + PAD, 1 + w + PAD), mid, dtype=dt)
    plane[1:1 + h, 1:1 + w] = img
    return plane


def _block_positions(width: int, height: int, size: int):
    gy, gx = -(-height // size), -(-width // size)
    iy, ix = np.mgrid[0:gy, 0:gx]
    xs = (ix * size).ravel().astype(np.int32)
    ys = (iy * size).ravel().astype(np.int32)
    return xs, ys, gy, gx


def _gather_refs(plane: jnp.ndarray, gy: int, gx: int,
                 size: int) -> jnp.ndarray:
    """Batched reference vectors [corner, top 2s, left 2s] per block.

    Block positions form the full aligned grid, so the gather is pure
    strided slicing (the vmapped dynamic_slice this replaces lowers to
    an XLA gather: ~120 ms at 1080p s=8 vs ~2 ms for the slices).
    Layout matches engine.recon._gather_ref: plane[y, x:x+2s+1] then
    plane[y+1:y+1+2s, x] with (x, y) = block origin in plane coords.
    """
    s = size
    # top row incl. corner: R[iy, ix*s + t], t in [0, 2s]
    rows = plane[0:gy * s:s, :]                       # (gy, Wp)
    # the top-right overhang of the LAST (possibly partial) block can
    # reach past the plane pad for large s on small pictures; pad the
    # gather source — the extra positions are out-of-picture, so the
    # availability mask replaces them before any use (value-neutral)
    need_w = (gx - 1) * s + 2 * s + 1
    if rows.shape[1] < need_w:
        rows = jnp.pad(rows, ((0, 0), (0, need_w - rows.shape[1])))
    top = jnp.stack([rows[:, t:t + gx * s:s]
                     for t in range(2 * s + 1)], axis=-1)
    # left column: plane[iy*s + 1 + r, ix*s], r in [0, 2s)
    cols = plane[:, 0:gx * s:s]                       # (Hp, gx)
    need_h = (gy - 1) * s + 2 * s + 1
    if cols.shape[0] < need_h:
        cols = jnp.pad(cols, ((0, need_h - cols.shape[0]), (0, 0)))
    left = jnp.stack([cols[1 + r:1 + r + gy * s:s, :]
                      for r in range(2 * s)], axis=-1)
    refs = jnp.concatenate([top, left], axis=-1)      # (gy, gx, 4s+1)
    return refs.reshape(gy * gx, 4 * s + 1)


def _block_gather(plane: jnp.ndarray, gy: int, gx: int,
                  size: int) -> jnp.ndarray:
    """All aligned (s, s) blocks as one reshape/transpose (no gather)."""
    s = size
    blk = plane[1:1 + gy * s, 1:1 + gx * s]
    blk = blk.reshape(gy, s, gx, s).transpose(0, 2, 1, 3)
    return blk.reshape(gy * gx, s, s)


def _mask_refs(refs, mask, cfg):
    """Apply the availability rule to gathered reference vectors:
    constant mid-gray (the x266t v1 rule) or, with cfg.ref_substitute,
    the HEVC-style propagation fill (kernels.intra.substitute_refs)."""
    if cfg.ref_substitute:
        return kintra.substitute_refs(refs, mask, cfg.mid_val)
    return jnp.where(mask, refs, cfg.mid_val)


def _passa_pdpc() -> bool:
    """Measurement switch (X266T_PDPC_PASSA=0): score Pass-A candidates
    WITHOUT the PDPC blend while Pass B still applies it normatively —
    isolates whether the blend's original-pixel scoring misleads the
    decoupled search (FORMAT.md §9.8)."""
    import os

    return os.environ.get("X266T_PDPC_PASSA", "1") != "0"


def _rd_modes(inter_slice: bool = False) -> int:
    """Modes surviving the SAD preselect into full RD (0 = all).

    Two-stage search is the HM/VTM (and hardware-encoder) convention:
    a cheap absolute-residual ranking prunes the 35/67 candidates to a
    short list, then the full transform/quant/rate/recon RD chain runs
    only on those.  Encoder-only freedom [STD]: any choice yields a
    conforming stream; measured at K=8: -0.05 dB / -2.3% bits (416x240
    qp32 synthetic) for a 3x Pass-A speedup (114 -> 37 ms at 1080p).
    On P/B slices intra is the minority mode, so a shorter list (K=4)
    pays for itself: the intra eval is 156 ms of the 4K B-picture mode
    decision at K=8; RD delta is gated by tests/test_rd.py.
    """
    import os

    if inter_slice:
        return int(os.environ.get("X266T_RD_MODES_INTER", "4"))
    return int(os.environ.get("X266T_RD_MODES", "8"))


def _eval_size(plane: jnp.ndarray, size: int, cfg: CodecConfig,
               inter_slice: bool = False, want_res: bool = False):
    """Best mode + RD cost for every size-aligned block.

    Returns (cost (gy, gx) float32, mode (gy, gx) int32), plus the
    winning mode's residual (nb, s, s) int32 when want_res (consumed
    by make_mts_select_raw so the MTS stage need not re-run the
    67-mode prediction matmul — it was ~half that stage's time at
    1080p).  Invalid (partially outside) blocks get cost = +inf.
    """
    w, h, s = cfg.width, cfg.height, size
    lam = np.float32(cfg.lambda_mode)
    xs_np, ys_np, gy, gx = _block_positions(w, h, s)
    nb = xs_np.shape[0]

    refs = _gather_refs(plane, gy, gx, s)                     # (B, R)
    mask = jnp.asarray(
        avail.ref_availability_masks(w, h, s).reshape(nb, -1))
    refs = _mask_refs(refs, mask, cfg)

    preds = kintra.predict_all_modes(
        refs, s, cfg.n_pred_modes, pdpc=kintra._pdpc_on(cfg.pdpc, s) and _passa_pdpc(),
        left_ok=jnp.asarray((xs_np > 0).astype(np.int32)),
        top_ok=jnp.asarray((ys_np > 0).astype(np.int32)))
    orig = _block_gather(plane, gy, gx, s)[:, None]           # (B, 1, s, s)
    res = orig - preds                                        # (B, nm, s, s)
    nm = preds.shape[1]

    k = _rd_modes(inter_slice)
    if 0 < k < nm:
        # Stage 1: SAD ranking; stage 2 selects the K best residual
        # blocks via a one-hot MXU matmul (a take_along_axis gather on
        # (B, nm, s, s) is the slow path this avoids).
        sad = jnp.sum(jnp.abs(res), axis=(2, 3)).astype(jnp.float32)
        top = jax.lax.top_k(-sad, k)[1].astype(jnp.int32)     # (B, K)
        onehot = (top[:, :, None]
                  == jnp.arange(nm)[None, None, :]).astype(jnp.float32)
        res_k = jnp.einsum("bkm,bmp->bkp", onehot,
                           res.reshape(nb, nm, s * s).astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
        res_k = res_k.astype(jnp.int32).reshape(nb, k, s, s)
        pred_k = orig - res_k
    else:
        k = nm
        top = None
        res_k = res
        pred_k = preds

    if cfg.lossless:
        rate = kcost.rate_estimate_levels(res_k)
        cost = lam * (rate + MODE_SIGNAL_BITS)
    else:
        bd = cfg.bit_depth
        coefs = ktx.forward_transform(res_k.reshape(nb * k, s, s), s,
                                      bit_depth=bd)
        levels = kquant.quantize(coefs, cfg.qp, s, bd)
        rate = kcost.rate_estimate_levels(levels).reshape(nb, k)
        deq = kquant.dequantize(levels, cfg.qp, s, bd)
        rres = ktx.inverse_transform(deq, s, bit_depth=bd
                                     ).reshape(nb, k, s, s)
        recon = jnp.clip(pred_k + rres, 0, cfg.max_val)
        dist = kcost.sse(recon, orig)
        cost = dist + lam * (rate + MODE_SIGNAL_BITS)

    best_k = jnp.argmin(cost, axis=1).astype(jnp.int32)
    if top is not None:
        best_mode = jnp.take_along_axis(top, best_k[:, None],
                                        axis=1)[:, 0]
    else:
        best_mode = best_k
    best_cost = jnp.min(cost, axis=1)
    valid = jnp.asarray(avail.valid_block_grid(w, h, s).reshape(nb))
    best_cost = jnp.where(valid, best_cost, jnp.inf)
    if want_res:
        res_best = jnp.take_along_axis(
            res_k, best_k[:, None, None, None], axis=1)[:, 0]
        return (best_cost.reshape(gy, gx), best_mode.reshape(gy, gx),
                res_best)
    return best_cost.reshape(gy, gx), best_mode.reshape(gy, gx)


def _eval_pair(plane: jnp.ndarray, t: int, cfg: CodecConfig,
               vertical: bool):
    """Shared-mode RD cost of rectangular CUs (C5 MTT): each CU is a
    pair of adjacent t-sized TUs coding ONE intra mode.

    vertical=False: pairs along x (CU h=t, w=2t — the BT-H leaf half);
    vertical=True:  pairs along y (CU h=2t, w=t — BT-V).
    Mode preselection ranks the JOINT SAD of the pair (the shared mode
    must suit both TUs), then the full RD chain runs on the K
    survivors for both TUs.  XLA CSEs the prediction/residual prefix
    with _eval_size at the same t inside one jit.

    Returns (cost (py, px) float32, mode (py, px) int32) on the pair
    grid: (gy, gx/2) horizontal, (gy/2, gx) vertical.
    """
    w, h = cfg.width, cfg.height
    lam = np.float32(cfg.lambda_mode)
    xs_np, ys_np, gy, gx = _block_positions(w, h, t)
    nb = xs_np.shape[0]

    refs = _gather_refs(plane, gy, gx, t)
    mask = jnp.asarray(
        avail.ref_availability_masks(w, h, t).reshape(nb, -1))
    refs = _mask_refs(refs, mask, cfg)
    preds = kintra.predict_all_modes(
        refs, t, cfg.n_pred_modes, pdpc=kintra._pdpc_on(cfg.pdpc, t) and _passa_pdpc(),
        left_ok=jnp.asarray((xs_np > 0).astype(np.int32)),
        top_ok=jnp.asarray((ys_np > 0).astype(np.int32)))
    orig = _block_gather(plane, gy, gx, t)[:, None]
    res = orig - preds                                # (B, nm, t, t)
    nm = preds.shape[1]
    sad = jnp.sum(jnp.abs(res), axis=(2, 3)).astype(jnp.float32)
    sad = sad.reshape(gy, gx, nm)

    rf = res.reshape(gy, gx, nm, t * t).astype(jnp.float32)
    og = orig[:, 0].reshape(gy, gx, t * t)
    # odd trailing blocks (picture not a multiple of 2t) pair with
    # nothing: drop them — the enclosing leaf is boundary-split anyway
    ge_y, ge_x = (gy // 2) * 2, (gx // 2) * 2
    if vertical:
        jsad = sad[0:ge_y:2] + sad[1:ge_y:2]          # (gy/2, gx, nm)
        r0, r1 = rf[0:ge_y:2], rf[1:ge_y:2]
        o0, o1 = og[0:ge_y:2], og[1:ge_y:2]
    else:
        jsad = sad[:, 0:ge_x:2] + sad[:, 1:ge_x:2]    # (gy, gx/2, nm)
        r0, r1 = rf[:, 0:ge_x:2], rf[:, 1:ge_x:2]
        o0, o1 = og[:, 0:ge_x:2], og[:, 1:ge_x:2]
    py, px = jsad.shape[:2]
    np_ = py * px
    jsad = jsad.reshape(np_, nm)
    r0 = r0.reshape(np_, nm, t * t)
    r1 = r1.reshape(np_, nm, t * t)
    o0 = o0.reshape(np_, 1, t * t)
    o1 = o1.reshape(np_, 1, t * t)

    k = min(_rd_modes() or nm, nm)
    top = jax.lax.top_k(-jsad, k)[1].astype(jnp.int32)   # (P, K)
    onehot = (top[:, :, None]
              == jnp.arange(nm)[None, None, :]).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def rd(rk, ob):
        """residuals (P, K, t*t) + originals (P, 1, t*t) -> (P, K)
        D + lam*R with the same clipped-recon distortion as
        _eval_size."""
        rk = rk.astype(jnp.int32).reshape(np_ * k, t, t)
        bd = cfg.bit_depth
        coefs = ktx.forward_transform(rk, t, bit_depth=bd)
        levels = kquant.quantize(coefs, cfg.qp, t, bd)
        rate = kcost.rate_estimate_levels(levels).reshape(np_, k)
        deq = kquant.dequantize(levels, cfg.qp, t, bd)
        rres = ktx.inverse_transform(deq, t, bit_depth=bd)
        ob = jnp.broadcast_to(ob, (np_, k, t * t)).reshape(
            np_ * k, t, t)
        recon = jnp.clip(ob - rk + rres, 0, cfg.max_val)
        dist = kcost.sse(recon, ob).reshape(np_, k)
        return dist + lam * rate

    cost = (rd(jnp.einsum("bkm,bmp->bkp", onehot, r0, precision=hp), o0)
            + rd(jnp.einsum("bkm,bmp->bkp", onehot, r1, precision=hp),
                 o1)
            + lam * (MODE_SIGNAL_BITS + 2.0))
    best_k = jnp.argmin(cost, axis=1).astype(jnp.int32)
    best_mode = jnp.take_along_axis(top, best_k[:, None], axis=1)[:, 0]
    best_cost = jnp.min(cost, axis=1)
    return (best_cost.reshape(py, px), best_mode.reshape(py, px))


def _pad_to(a: jnp.ndarray, shape, fill) -> jnp.ndarray:
    return jnp.pad(a, ((0, shape[0] - a.shape[0]),
                       (0, shape[1] - a.shape[1])), constant_values=fill)


def _sum_children(cost: jnp.ndarray, gy2: int, gx2: int) -> jnp.ndarray:
    """2x2 window sums of the child grid; missing children count 0."""
    c = _pad_to(jnp.where(jnp.isfinite(cost), cost, 1e18),
                (2 * gy2, 2 * gx2), 0.0)
    return (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])


def _upsample(a: jnp.ndarray, f: int, gy: int, gx: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(a, f, axis=0), f, axis=1)[:gy, :gx]


@functools.cache
def make_mode_decision_raw(cfg: CodecConfig, want_res: bool = False):
    """Un-jitted Pass A (for composition under outer jit/shard_map):
    padded orig luma plane -> (size_map, mode_map), (units_y, units_x)
    int32.  With cfg.mtt also returns bt_map (0 none / 1 BT-H / 2 BT-V
    per unit): each 16/32 leaf additionally competes against its two
    binary splits (shared-mode rectangular CUs, _eval_pair).
    want_res (non-mtt only): additionally return {size: winner
    residual (nb, s, s)} for make_mts_select_raw (saves re-running the
    full prediction matmul in the MTS stage)."""
    uy, ux = cfg.units_y, cfg.units_x
    lam = np.float32(cfg.lambda_mode)
    assert not (want_res and cfg.mtt), "want_res is the non-mtt path"

    def run(plane: jnp.ndarray):
        plane = plane.astype(jnp.int32)
        res_by_size = {}
        if want_res:
            cost8, mode8, res8 = _eval_size(plane, 8, cfg,
                                            want_res=True)
            res_by_size[8] = res8
        else:
            cost8, mode8 = _eval_size(plane, 8, cfg)
        size_map = jnp.full((uy, ux), 8, dtype=jnp.int32)
        mode_map = mode8.astype(jnp.int32)
        bt_map = jnp.zeros((uy, ux), dtype=jnp.int32)
        best = cost8

        for s in (16, 32, 64):
            if cfg.max_cu_size < s:
                continue
            if want_res:
                cost_s, mode_s, res_s = _eval_size(plane, s, cfg,
                                                   want_res=True)
                res_by_size[s] = res_s
            else:
                cost_s, mode_s = _eval_size(plane, s, cfg)
            gs = cost_s.shape
            child = _sum_children(best, *gs) + lam * SPLIT_BITS
            f = s // 8
            if cfg.mtt:
                t = s // 2
                ph_c, ph_m = _eval_pair(plane, t, cfg, vertical=False)
                pv_c, pv_m = _eval_pair(plane, t, cfg, vertical=True)
                # normalize pair grids to the leaf grid (boundary
                # leaves never binary-split, so pads stay unselected)
                ph_c = _pad_to(ph_c, (2 * gs[0], gs[1]), 1e18)
                ph_m = _pad_to(ph_m, (2 * gs[0], gs[1]), 0)
                pv_c = _pad_to(pv_c, (gs[0], 2 * gs[1]), 1e18)
                pv_m = _pad_to(pv_m, (gs[0], 2 * gs[1]), 0)
                # leaf BT costs: two stacked H-halves / two side-by-side
                # V-halves (+ ~2 bins of bt signalling); only leaves
                # fully inside the picture may binary-split (the walker
                # force-splits boundary leaves)
                valid = jnp.isfinite(cost_s)
                bt_bits = lam * 2.0
                bth = jnp.where(valid,
                                ph_c[0::2] + ph_c[1::2] + bt_bits,
                                jnp.inf)
                btv = jnp.where(valid,
                                pv_c[:, 0::2] + pv_c[:, 1::2] + bt_bits,
                                jnp.inf)
                best_s = jnp.minimum(jnp.minimum(cost_s, child),
                                     jnp.minimum(bth, btv))
                # choice: 0 square, 1 children, 2 BT-H, 3 BT-V
                choice = jnp.where(
                    cost_s <= best_s, 0,
                    jnp.where(bth <= jnp.minimum(child, btv), 2,
                              jnp.where(btv <= child, 3, 1)))
                sel = _upsample(choice != 1, f, uy, ux)
                chc = _upsample(choice, f, uy, ux)
                size_map = jnp.where(sel, s, size_map)
                bt_map = jnp.where(sel, jnp.where(chc == 2, 1,
                                                  jnp.where(chc == 3,
                                                            2, 0)),
                                   bt_map)
                # per-unit mode: square leaf -> mode_s; BT -> the
                # winning half's shared mode (pair grids upsample with
                # the split's anisotropy)
                m_sq = _upsample(mode_s, f, uy, ux)
                m_h = jnp.repeat(jnp.repeat(ph_m, f // 2, axis=0),
                                 f, axis=1)[:uy, :ux]
                m_v = jnp.repeat(jnp.repeat(pv_m, f, axis=0),
                                 f // 2, axis=1)[:uy, :ux]
                m_new = jnp.where(chc == 0, m_sq,
                                  jnp.where(chc == 2, m_h, m_v))
                mode_map = jnp.where(sel, m_new, mode_map)
                best = best_s
            else:
                use = cost_s <= child                  # inf own -> split
                sel = _upsample(use, f, uy, ux)
                size_map = jnp.where(sel, s, size_map)
                mode_map = jnp.where(sel, _upsample(mode_s, f, uy, ux),
                                     mode_map)
                best = jnp.where(use, cost_s, child)

        if cfg.mtt:
            return size_map, mode_map, bt_map
        if want_res:
            return size_map, mode_map, res_by_size
        return size_map, mode_map

    return run


@functools.cache
def make_mode_decision(cfg: CodecConfig):
    """jit-compiled Pass A."""
    return jax.jit(make_mode_decision_raw(cfg))


# ---- MTS candidate selection (C10, VVC) -----------------------------------

@functools.cache
def make_mts_select_raw(cfg: CodecConfig):
    """Per-CU transform choice (encoder-only, staged after the mode
    decision as in VTM: the winning mode is fixed, the transform
    candidates compete on the same RD surrogate).  Candidates are the
    5 MTS pairs (cfg.mts) and/or transform skip (cfg.transform_skip,
    mts_map value TS_IDX=5).  Returns the un-jitted
    f(plane, size_map, mode_map[, res_by_size]) -> mts_map (units,
    int32).  res_by_size: the winner residuals from
    make_mode_decision_raw(want_res=True) — when present, this stage
    skips the 67-mode prediction matmul entirely (pred = orig - res;
    identical values by construction, same inputs/masks)."""
    uy, ux = cfg.units_y, cfg.units_x
    lam = np.float32(cfg.lambda_mode)
    n_modes = cfg.n_pred_modes
    combos = ktx.MTS_COMBOS if cfg.mts else ktx.MTS_COMBOS[:1]
    # choice index -> signalled mts_map value
    vals = list(range(len(combos)))
    if cfg.transform_skip:
        vals.append(5)                       # engine.recon.TS_IDX
    if cfg.lfnst:
        vals += [1 << 6, 2 << 6]             # lfnst_idx rides bits 6-7

    def eval_size(plane, size_map, mode_map, s, res_pre=None):
        w, h = cfg.width, cfg.height
        xs_np, ys_np, gy, gx = _block_positions(w, h, s)
        xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
        nb = xs_np.shape[0]
        u = s // 8
        oy = (ys_np // 8).astype(np.int32)
        ox = (xs_np // 8).astype(np.int32)

        modes = mode_map[oy, ox]                        # (B,)
        orig = _block_gather(plane, gy, gx, s)
        if res_pre is not None:
            res = res_pre                               # (B, s, s)
            pred = orig - res
        else:
            refs = _gather_refs(plane, gy, gx, s)
            mask = jnp.asarray(
                avail.ref_availability_masks(w, h, s).reshape(nb, -1))
            refs = _mask_refs(refs, mask, cfg)
            preds = kintra.predict_all_modes(
                refs, s, n_modes, pdpc=kintra._pdpc_on(cfg.pdpc, s) and _passa_pdpc(),
                left_ok=jnp.asarray((xs_np > 0).astype(np.int32)),
                top_ok=jnp.asarray((ys_np > 0).astype(np.int32)))
            pred = jnp.take_along_axis(
                preds, modes[:, None, None, None], axis=1)[:, 0]
            res = orig - pred                           # (B, s, s)

        costs = []
        bd = cfg.bit_depth
        for (tv, th) in combos:
            coefs = ktx.forward_transform(res, s, tv, th, bd)
            levels = kquant.quantize(coefs, cfg.qp, s, bd)
            rate = kcost.rate_estimate_levels(levels)
            deq = kquant.dequantize(levels, cfg.qp, s, bd)
            rres = ktx.inverse_transform(deq, s, tv, th, bd)
            recon = jnp.clip(pred + rres, 0, cfg.max_val)
            costs.append(kcost.sse(recon, orig) + lam * (rate + 2.0))
        if cfg.transform_skip:
            tsh = 15 - bd - (s.bit_length() - 1)
            levels = kquant.quantize(res << tsh, cfg.qp, s, bd)
            rate = kcost.rate_estimate_levels(levels)
            deq = kquant.dequantize(levels, cfg.qp, s, bd)
            rres = (deq + ((1 << (tsh - 1)) if tsh > 0 else 0)) >> tsh
            recon = jnp.clip(pred + rres, 0, cfg.max_val)
            costs.append(kcost.sse(recon, orig) + lam * (rate + 1.0))
        if cfg.lfnst:
            from x266_tpu.kernels.lfnst import lfnst_fwd, lfnst_inv

            # DCT2 primary (XLA CSEs this with the combo-0 candidate)
            c0 = ktx.forward_transform(res, s, bit_depth=bd)
            for kk in (1, 2):
                li = jnp.full((nb,), kk, jnp.int32)
                c2 = lfnst_fwd(c0, modes, li, n_modes)
                levels = kquant.quantize(c2, cfg.qp, s, bd)
                rate = kcost.rate_estimate_levels(levels)
                deq = kquant.dequantize(levels, cfg.qp, s, bd)
                d2 = lfnst_inv(deq, modes, li, n_modes)
                rres = ktx.inverse_transform(d2, s, bit_depth=bd)
                recon = jnp.clip(pred + rres, 0, cfg.max_val)
                costs.append(kcost.sse(recon, orig)
                             + lam * (rate + 2.0))
        choice = jnp.argmin(jnp.stack(costs, axis=1), axis=1)
        choice = jnp.asarray(np.asarray(vals, np.int32))[choice]
        return choice.reshape(gy, gx).astype(jnp.int32)

    def run(plane, size_map, mode_map, bt_map=None, res_by_size=None):
        plane = plane.astype(jnp.int32)
        mts_map = jnp.zeros((uy, ux), jnp.int32)
        # MTT leaves tile as square s/2 TUs: the transform choice is
        # made at the EFFECTIVE TU size (all TU origins are t-aligned)
        eff = (jnp.where(bt_map > 0, size_map >> 1, size_map)
               if bt_map is not None else size_map)
        for s in (8, 16, 32):
            if s > cfg.max_cu_size:
                continue
            res_pre = (res_by_size.get(s)
                       if res_by_size is not None else None)
            choice = eval_size(plane, size_map, mode_map, s, res_pre)
            up = _upsample(choice, s // 8, uy, ux)
            mts_map = jnp.where(eff == s, up, mts_map)
        return mts_map

    return run


@functools.cache
def make_mts_select(cfg: CodecConfig):
    return jax.jit(make_mts_select_raw(cfg))
