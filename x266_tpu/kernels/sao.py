"""Sample-adaptive offset (C14) [STD-shaped], luma, TPU-first.

Per-CTB parameters: type (off / edge class 0-3 / band), 4 offsets, band
position.  Edge offsets use HEVC's inferred signs (+ for local valleys /
concave, - for peaks / convex); band offsets are signed over 4 consecutive
8-wide bands [STD].

TPU-first formulation: the *apply* step computes all four edge-class
category maps for the whole picture at once and selects per pixel through
upsampled parameter planes — no per-CTB control flow.  The *estimate*
step (encoder-only, float allowed) reduces (orig - recon) statistics per
(CTB, class, category) with blocked reshapes and picks argmin-RD
parameters, all batched.

Normative: decoder applies exactly this; encoder applies it to recon, so
the MD5 gate covers it.  v1 scope: luma only (chroma SAO staged later).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAO_OFF = 0
SAO_EO0 = 1          # 1..4 = edge classes 0..3
SAO_BAND = 5
MAX_OFFSET = 7

# neighbor offsets per edge class: (dy0,dx0),(dy1,dx1) [STD]
_EDGE_NEIGHBORS = [((0, -1), (0, 1)),      # horizontal
                   ((-1, 0), (1, 0)),      # vertical
                   ((-1, -1), (1, 1)),     # 135 diagonal
                   ((-1, 1), (1, -1))]     # 45 diagonal


def _category_maps(y, xp):
    """(4, H, W) int32 edge categories 0..4 (0 = none) with picture-border
    samples forced to category 0 [STD border rule]."""
    h, w = y.shape
    cats = []
    yi = y.astype(xp.int32)
    for (d0, d1) in _EDGE_NEIGHBORS:
        n0 = xp.roll(xp.roll(yi, -d0[0], axis=0), -d0[1], axis=1)
        n1 = xp.roll(xp.roll(yi, -d1[0], axis=0), -d1[1], axis=1)
        s = xp.sign(yi - n0) + xp.sign(yi - n1)
        cat = xp.where(s == -2, 1,
                       xp.where(s == -1, 2,
                                xp.where(s == 1, 3,
                                         xp.where(s == 2, 4, 0))))
        # invalidate where a neighbor crosses the picture border
        ys = np.arange(h)[:, None]
        xs = np.arange(w)[None, :]
        valid = np.ones((h, w), dtype=bool)
        for (dy, dx) in (d0, d1):
            valid &= ((ys + dy >= 0) & (ys + dy < h)
                      & (xs + dx >= 0) & (xs + dx < w))
        cat = xp.where(xp.asarray(valid), cat, 0)
        cats.append(cat)
    return xp.stack(cats)


def _upsample_ctb(param, h, w, xp, ctb=64):
    """(Cy, Cx) -> (H, W) by ctb-x repetition, cropped."""
    return xp.repeat(xp.repeat(param, ctb, axis=0), ctb, axis=1)[:h, :w]


def apply_sao(y, sao_type, sao_band, sao_off, xp=jnp, ctb=64,
              bit_depth: int = 8):
    """Apply per-CTB SAO to one plane (luma ctb=64, 4:2:0 chroma ctb=32
    — the parameter grid is the LUMA CTU grid either way).

    y: (H, W) int32; sao_type: (Cy, Cx) in {0..5}; sao_band: (Cy, Cx);
    sao_off: (Cy, Cx, 4) signed offsets.  Edge types store the inferred
    signs applied: +magnitude for categories 1,2 and -magnitude for 3,4
    (the bitstream carries magnitudes only for edge offsets [STD]).
    """
    if xp is not np:
        y = xp.asarray(y, dtype=xp.int32)
        sao_type = xp.asarray(sao_type)
        sao_band = xp.asarray(sao_band)
        sao_off = xp.asarray(sao_off)
    h, w = y.shape
    cats = _category_maps(y, xp)                       # (4, H, W)
    type_p = _upsample_ctb(sao_type, h, w, xp, ctb)    # (H, W)
    band_p = _upsample_ctb(sao_band, h, w, xp, ctb)
    offs_p = [_upsample_ctb(sao_off[..., i], h, w, xp, ctb)
              for i in range(4)]

    # edge: select this pixel's class's category, then its offset.
    # 4-way select instead of take_along_axis: the (4, H, W) gather is
    # an XLA-gather cliff on TPU (measured 207 ms of a 4K apply).
    is_edge = (type_p >= SAO_EO0) & (type_p <= SAO_EO0 + 3)
    cls = xp.clip(type_p - SAO_EO0, 0, 3)
    cat = xp.zeros_like(y)
    for c in range(4):
        cat = xp.where(cls == c, cats[c], cat)
    edge_off = xp.zeros_like(y)
    for i in range(4):
        edge_off = xp.where(cat == i + 1, offs_p[i], edge_off)
    edge_off = xp.where(is_edge & (cat > 0), edge_off, 0)

    # band: 4 consecutive of 32 bands over the sample range
    band = y >> (bit_depth - 5)
    rel = band - band_p
    band_off = xp.zeros_like(y)
    for i in range(4):
        band_off = xp.where(rel == i, offs_p[i], band_off)
    band_off = xp.where(type_p == SAO_BAND, band_off, 0)

    return xp.clip(y + edge_off + band_off, 0, (1 << bit_depth) - 1)


# ---- encoder-side estimation (non-normative, float allowed) ---------------

def _ctb_block_sum(a, cy, cx, ctb=64):
    """(H, W) -> (Cy, Cx) sums over (padded) ctb x ctb blocks."""
    h, w = a.shape
    pad_h, pad_w = cy * ctb - h, cx * ctb - w
    a = jnp.pad(a, ((0, pad_h), (0, pad_w)))
    return a.reshape(cy, ctb, cx, ctb).sum(axis=(1, 3))


def estimate_sao(orig, recon, lam: float, ctb=64,
                 bit_depth: int = 8):
    """Pick per-CTB SAO params minimizing D + lambda*R (jnp, batched).

    Returns (sao_type, sao_band, sao_off) as int32 arrays.
    """
    orig = jnp.asarray(orig, jnp.int32)
    recon = jnp.asarray(recon, jnp.int32)
    h, w = orig.shape
    cy, cx = -(-h // ctb), -(-w // ctb)
    diff = (orig - recon).astype(jnp.float32)
    cats = _category_maps(recon, jnp)                  # (4, H, W)

    def stats_for(mask):
        e = _ctb_block_sum(jnp.where(mask, diff, 0.0), cy, cx, ctb)
        n = _ctb_block_sum(mask.astype(jnp.float32), cy, cx, ctb)
        return e, n

    # ---- edge candidates: (4 classes, 4 categories) ----
    SIGN = jnp.asarray([1.0, 1.0, -1.0, -1.0])        # inferred signs
    edge_costs = []
    edge_offsets = []
    for c in range(4):
        offs = []
        gain = jnp.zeros((cy, cx), jnp.float32)
        for cat in range(1, 5):
            e, n = stats_for(cats[c] == cat)
            mean = jnp.where(n > 0, e / jnp.maximum(n, 1), 0.0)
            sgn = SIGN[cat - 1]
            mag = jnp.clip(jnp.round(mean * sgn), 0, MAX_OFFSET)
            off = mag * sgn
            # dDist for adding offset h: n*h^2 - 2*h*e
            gain = gain + (n * off * off - 2.0 * off * e)
            offs.append(off.astype(jnp.int32))
        edge_costs.append(gain + lam * 12.0)           # ~param bits
        edge_offsets.append(jnp.stack(offs, axis=-1))  # (Cy, Cx, 4)

    # ---- band candidate: best 4 consecutive of 32 bands ----
    band = recon >> (bit_depth - 5)
    e_b, n_b = [], []
    for b in range(32):
        e, n = stats_for(band == b)
        e_b.append(e)
        n_b.append(n)
    e_b = jnp.stack(e_b)                               # (32, Cy, Cx)
    n_b = jnp.stack(n_b)
    mean_b = jnp.where(n_b > 0, e_b / jnp.maximum(n_b, 1), 0.0)
    off_b = jnp.clip(jnp.round(mean_b), -MAX_OFFSET, MAX_OFFSET)
    gain_b = n_b * off_b * off_b - 2.0 * off_b * e_b   # (32, Cy, Cx)
    win = jnp.stack([gain_b[p:p + 4].sum(0) for p in range(29)])
    best_pos = jnp.argmin(win, axis=0)                 # (Cy, Cx)
    band_cost = jnp.min(win, axis=0) + lam * 16.0
    band_offs = jnp.stack(
        [jnp.take_along_axis(
            off_b, (best_pos + i)[None], axis=0)[0] for i in range(4)],
        axis=-1).astype(jnp.int32)                     # (Cy, Cx, 4)

    # ---- choose: off (cost 0) vs 4 edges vs band ----
    all_costs = jnp.stack([jnp.full((cy, cx), lam * 2.0)]
                          + edge_costs + [band_cost])  # (6, Cy, Cx)
    choice = jnp.argmin(all_costs, axis=0)             # 0 off,1..4 edge,5 band
    sao_type = choice.astype(jnp.int32)
    sao_band = jnp.where(choice == 5, best_pos, 0).astype(jnp.int32)
    all_offs = jnp.stack([jnp.zeros((cy, cx, 4), jnp.int32)]
                         + edge_offsets + [band_offs])  # (6, Cy, Cx, 4)
    sao_off = jnp.take_along_axis(
        all_offs, choice[None, ..., None], axis=0)[0]
    return sao_type, sao_band, sao_off


@functools.cache
def make_sao_apply(cfg):
    def run(y, sao_type, sao_band, sao_off):
        return apply_sao(y, sao_type, sao_band, sao_off, xp=jnp)

    return jax.jit(run)


@functools.cache
def make_sao_estimate(cfg):
    lam = float(cfg.lambda_mode)

    def run(orig, recon):
        return estimate_sao(orig, recon, lam)

    return jax.jit(run)
