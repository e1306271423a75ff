"""Adaptive loop filter (C15) [STD-shaped], luma, TPU-first.

VVC-shaped design: 4x4 blocks are classified by gradient
direction/activity into 25 classes; each class gets a 7x7 point-symmetric
diamond Wiener filter (12 unique pair coefficients, difference form with
unit DC gain); filtering is signalled per CTB.  x266t v1 deviations
(documented, self-consistent): linear (no clipping nonlinearity), no
geometric transposes, luma only, integer-exact classification so encoder
and decoder classify identically.

TPU-first formulation:
- classification: whole-picture integer Laplacians + blocked reductions
  (no per-block loops);
- application: 12 shifted-difference planes x per-pixel class-gathered
  coefficients — dense VPU work;
- estimation (encoder-only, float allowed): per-class normal equations
  accumulated with one einsum over a class one-hot, solved batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 12 unique offsets of the 7x7 diamond (the other 12 are the negations;
# tap 13 is the center, constrained to unit DC gain) [STD-shaped].
DIAMOND = np.array([
    (0, 1), (0, 2), (0, 3),
    (1, -2), (1, -1), (1, 0), (1, 1), (1, 2),
    (2, -1), (2, 0), (2, 1),
    (3, 0),
], dtype=np.int32)

NUM_CLASSES = 25
COEF_BITS = 7                 # filter gain scale: 1 << 7
COEF_MAX = 511                # coefficient clamp (10-bit signed)
ACT_THRESHOLDS = (64, 256, 1024, 4096)   # activity quantizer (x266t)


def _shift2(p, dy, dx, xp):
    return xp.roll(xp.roll(p, -dy, axis=0), -dx, axis=1)


def classify(y, xp=jnp):
    """(H, W) int32 luma -> (H//4, W//4) int32 class map (0..24).

    Integer-exact: both codec sides compute this on the identical
    (post-SAO) reconstruction, so no signalling is needed [STD-shaped].
    """
    y = y.astype(xp.int32) if xp is not np else y.astype(np.int64)
    h, w = y.shape
    lh = xp.abs(2 * y - _shift2(y, 0, -1, xp) - _shift2(y, 0, 1, xp))
    lv = xp.abs(2 * y - _shift2(y, -1, 0, xp) - _shift2(y, 1, 0, xp))
    ld0 = xp.abs(2 * y - _shift2(y, -1, -1, xp) - _shift2(y, 1, 1, xp))
    ld1 = xp.abs(2 * y - _shift2(y, -1, 1, xp) - _shift2(y, 1, -1, xp))

    def blk(a):
        return a.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3))

    gh, gv, g0, g1 = blk(lh), blk(lv), blk(ld0), blk(ld1)

    # direction: 0 = none, 1 = vertical, 2 = horizontal, 3 = diag \\,
    # 4 = diag / — division-free ratio tests (threshold 2:1)
    hv_hi = xp.maximum(gh, gv)
    hv_lo = xp.minimum(gh, gv)
    d_hi = xp.maximum(g0, g1)
    d_lo = xp.minimum(g0, g1)
    hv_strong = hv_hi > 2 * hv_lo
    d_strong = d_hi > 2 * d_lo
    hv_wins = hv_hi * d_lo >= d_hi * hv_lo
    dir_hv = xp.where(gv > gh, 1, 2)
    dir_d = xp.where(g0 > g1, 3, 4)
    direction = xp.where(
        hv_wins, xp.where(hv_strong, dir_hv, 0),
        xp.where(d_strong, dir_d, 0))

    act = gh + gv
    a = sum((act > t).astype(act.dtype) for t in ACT_THRESHOLDS)
    return (5 * a + direction).astype(xp.int32)


def _diff_planes(y, xp=jnp):
    """(12, H, W) symmetric difference features: (s_i - c) + (s_-i - c)."""
    feats = []
    for dy, dx in DIAMOND:
        a = _shift2(y, int(dy), int(dx), xp)
        b = _shift2(y, -int(dy), -int(dx), xp)
        feats.append(a + b - 2 * y)
    return xp.stack(feats)


def apply_alf(y, class_map, coeffs, ctb_flags, xp=jnp,
              bit_depth: int = 8):
    """Normative ALF application.

    y (H, W) int32 (post-SAO recon); class_map (H/4, W/4); coeffs
    (25, 12) int32; ctb_flags (Cy, Cx) int32 (1 = filter this CTB).
    out = clip(y + (sum c_i * d_i + 64) >> 7) on filtered CTBs [STD-ish].
    """
    if xp is not np:
        y = xp.asarray(y, xp.int32)
        class_map = xp.asarray(class_map)
        coeffs = xp.asarray(coeffs, xp.int32)
        ctb_flags = xp.asarray(ctb_flags)
    h, w = y.shape
    feats = _diff_planes(y, xp)                       # (12, H, W)
    if xp is np:
        cls_px = np.repeat(np.repeat(class_map, 4, axis=0), 4, axis=1)
        cpx = coeffs[cls_px]                          # (H, W, 12)
        acc = np.sum(cpx.transpose(2, 0, 1) * feats, axis=0)
    else:
        # per-4x4-block coefficient lookup as a one-hot MXU matmul
        # (a (H, W) gather into (25, 12) is the XLA-gather cliff);
        # exact: one-hot rows select single int entries <= 511.
        onehot = jax.nn.one_hot(class_map, NUM_CLASSES,
                                dtype=jnp.float32)   # (H/4, W/4, 25)
        cblk = jnp.einsum("hwc,ck->khw", onehot,
                          coeffs.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(jnp.int32)        # (12, H/4, W/4)
        cpx = jnp.repeat(jnp.repeat(cblk, 4, axis=1), 4, axis=2)
        acc = jnp.sum(cpx * feats, axis=0)
    filt = xp.clip(y + ((acc + 64) >> COEF_BITS), 0,
                   (1 << bit_depth) - 1)
    on = xp.repeat(xp.repeat(ctb_flags, 64, axis=0), 64, axis=1)[:h, :w]
    return xp.where(on > 0, filt, y)


# ---- chroma ALF (C15, VVC-shaped) ------------------------------------------
#
# VVC chroma ALF: a 5x5 point-symmetric diamond with NO classification
# (one filter per plane; VVC's alternative-filter signalling is not
# implemented).  Same difference form / unit DC gain / 1<<7 scale as
# luma; per-CTB on/off flags per chroma plane; coefficients ride the
# slice header next to the luma set.

CHROMA_DIAMOND = np.array([
    (0, 1), (0, 2),
    (1, -1), (1, 0), (1, 1),
    (2, 0),
], dtype=np.int32)


def _diff_planes_chroma(c, xp=jnp):
    """(6, H, W) symmetric 5x5-diamond difference features."""
    feats = []
    for dy, dx in CHROMA_DIAMOND:
        a = _shift2(c, int(dy), int(dx), xp)
        b = _shift2(c, -int(dy), -int(dx), xp)
        feats.append(a + b - 2 * c)
    return xp.stack(feats)


def apply_alf_chroma(c, coeffs, ctb_flags, xp=jnp,
                     bit_depth: int = 8):
    """Normative chroma ALF: c (H, W) int32 chroma plane (post-SAO),
    coeffs (6,) int32, ctb_flags (Cy, Cx) over the luma CTU grid
    (32x32 chroma samples per CTB at 4:2:0)."""
    if xp is not np:
        c = xp.asarray(c, xp.int32)
        coeffs = xp.asarray(coeffs, xp.int32)
        ctb_flags = xp.asarray(ctb_flags)
    h, w = c.shape
    feats = _diff_planes_chroma(c, xp)                # (6, H, W)
    acc = xp.sum(coeffs[:, None, None] * feats, axis=0)
    filt = xp.clip(c + ((acc + 64) >> COEF_BITS), 0,
                   (1 << bit_depth) - 1)
    on = xp.repeat(xp.repeat(ctb_flags, 32, axis=0), 32, axis=1)[:h, :w]
    return xp.where(on > 0, filt, c)


def estimate_alf_chroma(orig, recon, lam: float,
                        bit_depth: int = 8):
    """Encoder: Wiener 5x5 diamond for one chroma plane + per-CTB flags.

    Returns (coeffs (6,) int32, flags (Cy, Cx) int32, filtered int32).
    """
    orig = jnp.asarray(orig, jnp.int32)
    recon = jnp.asarray(recon, jnp.int32)
    h, w = orig.shape
    feats = _diff_planes_chroma(recon).astype(jnp.float32)
    err = (orig - recon).astype(jnp.float32)
    f = feats.reshape(6, -1)
    gram = f @ f.T
    rhs = (f @ err.reshape(-1)) * float(1 << COEF_BITS)
    reg = 64.0 * jnp.eye(6)
    sol = jnp.linalg.solve(gram + reg, rhs)
    coeffs = jnp.clip(jnp.round(sol), -COEF_MAX, COEF_MAX
                      ).astype(jnp.int32)

    cy, cx = -(-h // 32), -(-w // 32)
    all_on = jnp.ones((cy, cx), jnp.int32)
    filt = apply_alf_chroma(recon, coeffs, all_on,
                            bit_depth=bit_depth)

    def ctb_sse(a):
        d = (a - orig).astype(jnp.float32) ** 2
        pad = jnp.pad(d, ((0, cy * 32 - h), (0, cx * 32 - w)))
        return pad.reshape(cy, 32, cx, 32).sum(axis=(1, 3))

    gain = ctb_sse(filt) - ctb_sse(recon)
    flags = (gain + lam * 1.5 < 0).astype(jnp.int32)
    final = apply_alf_chroma(recon, coeffs, flags,
                             bit_depth=bit_depth)
    return coeffs, flags, final


def estimate_alf(orig, recon, lam: float, bit_depth: int = 8):
    """Encoder: derive per-class Wiener filters + per-CTB on/off flags.

    Returns (coeffs (25, 12) int32, ctb_flags (Cy, Cx) int32,
    filtered (H, W) int32).
    """
    orig = jnp.asarray(orig, jnp.int32)
    recon = jnp.asarray(recon, jnp.int32)
    h, w = orig.shape
    cls = classify(recon)                             # (H/4, W/4)
    feats = _diff_planes(recon).astype(jnp.float32)   # (12, H, W)
    err = (orig - recon).astype(jnp.float32)

    cls_px = jnp.repeat(jnp.repeat(cls, 4, axis=0), 4, axis=1)
    onehot = jax.nn.one_hot(cls_px, NUM_CLASSES, axis=0,
                            dtype=jnp.float32)        # (25, H, W)
    f = feats.reshape(12, -1)
    o = onehot.reshape(NUM_CLASSES, -1)
    e = err.reshape(-1)
    # normal equations per class: (F^T F) c = (1<<7) F^T e
    gram = jnp.einsum("cn,in,jn->cij", o, f, f)
    rhs = jnp.einsum("cn,in,n->ci", o, f, e) * float(1 << COEF_BITS)
    reg = 64.0 * jnp.eye(12)[None]
    sol = jnp.linalg.solve(gram + reg, rhs[..., None])[..., 0]
    coeffs = jnp.clip(jnp.round(sol), -COEF_MAX, COEF_MAX
                      ).astype(jnp.int32)

    all_on = jnp.ones(((h + 63) // 64, (w + 63) // 64), jnp.int32)
    filt = apply_alf(recon, cls, coeffs, all_on, bit_depth=bit_depth)
    # per-CTB RD: filter iff it reduces SSE (+ flag cost)
    cy, cx = all_on.shape

    def ctb_sse(a):
        d = (a - orig).astype(jnp.float32) ** 2
        pad = jnp.pad(d, ((0, cy * 64 - h), (0, cx * 64 - w)))
        return pad.reshape(cy, 64, cx, 64).sum(axis=(1, 3))

    gain = ctb_sse(filt) - ctb_sse(recon)
    flags = (gain + lam * 1.5 < 0).astype(jnp.int32)
    final = apply_alf(recon, cls, coeffs, flags, bit_depth=bit_depth)
    return coeffs, flags, final
