"""Wavefront reconstruction pass (P6 on-device): batched anti-diagonals.

Semantically identical to engine.recon's sequential scan (tests pin
bit-exact equality), but processes all CTUs on an anti-diagonal
d = cx + 2*cy simultaneously — the classic WPP dependency shape [STD]:
a CTU's left (d-1), top (d-2) and top-right (d-1) neighbors are all on
earlier diagonals.  Sequential depth drops from ctus*64 z-steps to
(ctus_x + 2*ctus_y - 1)*64, an ~8x cut at 1080p, with lane-parallel
compute inside each step.

Mechanics per (diagonal, z) step:
- gather per-lane reference rows/columns and source/level tiles,
- compute every CU size's prediction + residual chain vectorized over
  lanes (sizes select via masks; under vmap the MTS switch becomes a
  select — fine, the flops are trivial),
- merge the per-lane windows into the shared planes with one scatter;
  inactive lanes write their unmodified window back to a dedicated
  trash region so duplicate scatter indices stay deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.engine.recon import _fwd_mts, _inv_mts
from x266_tpu.kernels import intra as kintra


def _diag_tables(cx_n: int, cy_n: int):
    """Static (n_d, L) table of lane cy values (-1 = no lane)."""
    n_d = cx_n + 2 * (cy_n - 1)
    lanes = []
    for d in range(n_d):
        row = [cy for cy in range(cy_n) if 0 <= d - 2 * cy < cx_n]
        lanes.append(row)
    l_max = max(len(r) for r in lanes)
    table = np.full((n_d, l_max), -1, dtype=np.int32)
    for d, row in enumerate(lanes):
        table[d, :len(row)] = row
    return table, n_d, l_max


def _win_iota(window: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    return r, c


def _process_component(plane, src, coefp, xs, ys, modes, szs, mtss,
                       active, sizes, window, qp, encode, lossless,
                       n_modes, use_mts, trash_plane_y, trash_coef_y):
    """One component's TUs for all lanes of a (d, z) step.

    plane: padded recon plane (image at +1,+1); coefp: padded coef plane
    (image at 0,0); xs/ys: per-lane pixel coords (clamped, valid reads);
    returns updated (plane, coefp)."""
    l = xs.shape[0]
    w2 = 2 * window

    def g_row(x, y):
        return jax.lax.dynamic_slice(plane, (y, x), (1, w2 + 1))[0]

    def g_col(x, y):
        return jax.lax.dynamic_slice(plane, (y + 1, x), (w2, 1))[:, 0]

    rows = jax.vmap(g_row)(xs, ys)           # (L, 2W+1) corner+top
    cols = jax.vmap(g_col)(xs, ys)           # (L, 2W)   left

    if encode:
        def g_src(x, y):
            return jax.lax.dynamic_slice(src, (y + 1, x + 1),
                                         (window, window))
        src_t = jax.vmap(g_src)(xs, ys)      # (L, W, W)
    else:
        def g_lev(x, y):
            return jax.lax.dynamic_slice(coefp, (y, x), (window, window))
        lev_t = jax.vmap(g_lev)(xs, ys)

    ir, ic = _win_iota(window)
    rec_w = jnp.zeros((l, window, window), jnp.int32)
    coef_w = jnp.zeros((l, window, window), jnp.int32)

    for s in sizes:
        ref = jnp.concatenate([rows[:, :1], rows[:, 1:2 * s + 1],
                               cols[:, :2 * s]], axis=1)
        pred = jax.vmap(
            lambda r, m: kintra.predict_mode(r, m, s, n_modes))(
                ref, modes)                  # (L, s, s)
        if encode:
            orig = src_t[:, :s, :s]
            if lossless:
                rec_s = orig
                lev_s = orig - pred
            else:
                res = orig - pred
                lev_s = jax.vmap(
                    lambda rr, mi: _fwd_mts(rr, s, qp, mi, use_mts))(
                        res, mtss)
                rres = jax.vmap(
                    lambda lv, mi: _inv_mts(lv, s, qp, mi, use_mts))(
                        lev_s, mtss)
                rec_s = jnp.clip(pred + rres, 0, 255)
        else:
            lev_s = lev_t[:, :s, :s]
            if lossless:
                rec_s = jnp.clip(pred + lev_s, 0, 255)
            else:
                rres = jax.vmap(
                    lambda lv, mi: _inv_mts(lv, s, qp, mi, use_mts))(
                        lev_s, mtss)
                rec_s = jnp.clip(pred + rres, 0, 255)
        sel = (szs == s)[:, None, None] & (ir < s) & (ic < s)
        pad_rec = jnp.zeros((l, window, window), jnp.int32)
        pad_rec = pad_rec.at[:, :s, :s].set(rec_s)
        pad_lev = jnp.zeros((l, window, window), jnp.int32)
        pad_lev = pad_lev.at[:, :s, :s].set(lev_s)
        rec_w = jnp.where(sel, pad_rec, rec_w)
        coef_w = jnp.where(sel, pad_lev, coef_w)

    rmask = (ir[None] < szs[:, None, None]) & \
        (ic[None] < szs[:, None, None]) & active[:, None, None]

    # ---- scatter recon windows ----
    # trash rows sit beyond the readable reference envelope (left refs
    # reach 2*window rows below a block), so inactive-lane writebacks can
    # never be observed as 128-padding reads
    wy = jnp.where(active, ys + 1, trash_plane_y)
    wx = jnp.where(active, xs + 1, 0)

    def g_win(x, y):
        return jax.lax.dynamic_slice(plane, (y, x), (window, window))

    old = jax.vmap(g_win)(wx, wy)
    val = jnp.where(rmask, rec_w, old)
    ridx = wy[:, None, None] + ir[None]
    cidx = wx[:, None, None] + ic[None]
    plane = plane.at[ridx, cidx].set(val)

    # ---- scatter level windows (encode only; decode returns input) ----
    if encode:
        cyw = jnp.where(active, ys, trash_coef_y)
        cxw = jnp.where(active, xs, 0)

        def g_cwin(x, y):
            return jax.lax.dynamic_slice(coefp, (y, x), (window, window))

        oldc = jax.vmap(g_cwin)(cxw, cyw)
        valc = jnp.where(rmask, coef_w, oldc)
        ridc = cyw[:, None, None] + ir[None]
        cidc = cxw[:, None, None] + ic[None]
        coefp = coefp.at[ridc, cidc].set(valc)
    return plane, coefp


@functools.cache
def make_recon_wave_raw(cfg: CodecConfig, encode: bool):
    """Wavefront implementation of make_recon_pass_raw (same signature
    and bit-identical results; see engine.recon)."""
    if cfg.pdpc or cfg.rdoq or cfg.transform_skip:
        raise NotImplementedError(
            "the wavefront recon study implementation predates "
            "PDPC/RDOQ/transform-skip; use the scan or Pallas paths "
            "(X266T_WAVE_RECON unset)")
    w, h = cfg.width, cfg.height
    cw, ch = w // 2, h // 2
    ux_n, uy_n = cfg.units_x, cfg.units_y
    cx_n, cy_n = cfg.ctus_x, cfg.ctus_y
    qp = cfg.qp
    lossless = cfg.lossless
    n_modes = cfg.n_intra_modes
    use_mts = cfg.mts
    table_np, n_d, l_max = _diag_tables(cx_n, cy_n)

    # Wavefront-specific padding: reference reads extend 2*window past a
    # block (rows <= h+57 in plane coords); the 32-row trash region must
    # start beyond that and still fit -> WPAD=128.
    WPAD = 128
    CPAD = 72   # coef planes: 32-window overhang (<= +24) + trash at +36

    def run(a, b, c, size_map, mode_map, mts_map):
        a = a.astype(jnp.int32)
        b = b.astype(jnp.int32)
        c = c.astype(jnp.int32)
        table = jnp.asarray(table_np)
        if encode:
            src_y, src_cb, src_cr = a, b, c
            coef_y = jnp.zeros((h + CPAD, w + CPAD), jnp.int32)
            coef_cb = jnp.zeros((ch + CPAD, cw + CPAD), jnp.int32)
            coef_cr = jnp.zeros((ch + CPAD, cw + CPAD), jnp.int32)
        else:
            src_y = src_cb = src_cr = None
            coef_y = jnp.zeros((h + CPAD, w + CPAD), jnp.int32)
            coef_y = coef_y.at[:h, :w].set(a)
            coef_cb = jnp.zeros((ch + CPAD, cw + CPAD), jnp.int32)
            coef_cb = coef_cb.at[:ch, :cw].set(b)
            coef_cr = jnp.zeros((ch + CPAD, cw + CPAD), jnp.int32)
            coef_cr = coef_cr.at[:ch, :cw].set(c)
        y_p = jnp.full((1 + h + WPAD, 1 + w + WPAD), 128, jnp.int32)
        cb_p = jnp.full((1 + ch + WPAD, 1 + cw + WPAD), 128, jnp.int32)
        cr_p = jnp.full((1 + ch + WPAD, 1 + cw + WPAD), 128, jnp.int32)

        def z_body(dz, carry):
            y_p, cb_p, cr_p, c_y, c_cb, c_cr = carry
            d = dz // 64
            z = dz % 64
            zx = (z & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
            zy = ((z >> 1) & 1) | (((z >> 3) & 1) << 1) \
                | (((z >> 5) & 1) << 2)
            cys = table[d]                       # (L,)
            cxs = d - 2 * cys
            lane_ok = cys >= 0
            uxs = cxs * 8 + zx
            uys = cys * 8 + zy
            inb = lane_ok & (uxs < ux_n) & (uys < uy_n)
            uxc = jnp.clip(uxs, 0, ux_n - 1)
            uyc = jnp.clip(uys, 0, uy_n - 1)
            sz = size_map[uyc, uxc]
            modes = mode_map[uyc, uxc]
            mtss = mts_map[uyc, uxc]
            units = sz >> 3
            origin = ((uxc & (units - 1)) == 0) \
                & ((uyc & (units - 1)) == 0)
            active = inb & origin
            xs = uxc * 8
            ys = uyc * 8

            y_p, c_y = _process_component(
                y_p, src_y, c_y, xs, ys, modes, sz, mtss, active,
                (8, 16, 32), 32, qp, encode, lossless, n_modes, use_mts,
                trash_plane_y=1 + h + 64, trash_coef_y=h + 36)
            csz = sz // 2
            xc = xs // 2
            yc = ys // 2
            cb_p, c_cb = _process_component(
                cb_p, src_cb, c_cb, xc, yc, modes, csz, jnp.zeros_like(
                    mtss), active, (4, 8, 16), 16, qp, encode, lossless,
                n_modes, False, trash_plane_y=1 + ch + 32,
                trash_coef_y=ch + 20)
            cr_p, c_cr = _process_component(
                cr_p, src_cr, c_cr, xc, yc, modes, csz, jnp.zeros_like(
                    mtss), active, (4, 8, 16), 16, qp, encode, lossless,
                n_modes, False, trash_plane_y=1 + ch + 32,
                trash_coef_y=ch + 20)
            return (y_p, cb_p, cr_p, c_y, c_cb, c_cr)

        carry = (y_p, cb_p, cr_p, coef_y, coef_cb, coef_cr)
        carry = jax.lax.fori_loop(0, n_d * 64, z_body, carry)

        y8 = carry[0][1:1 + h, 1:1 + w].astype(jnp.uint8)
        cb8 = carry[1][1:1 + ch, 1:1 + cw].astype(jnp.uint8)
        cr8 = carry[2][1:1 + ch, 1:1 + cw].astype(jnp.uint8)
        return (y8, cb8, cr8,
                carry[3][:h, :w].astype(jnp.int16),
                carry[4][:ch, :cw].astype(jnp.int16),
                carry[5][:ch, :cw].astype(jnp.int16))

    return run
