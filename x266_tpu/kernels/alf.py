"""Adaptive loop filter (C15) [STD-shaped], TPU-first.

VVC-shaped design: 4x4 blocks are classified by gradient
direction/activity into 25 classes; each class gets a 7x7 point-symmetric
diamond Wiener filter (12 unique pair coefficients, difference form with
unit DC gain); filtering is signalled per CTB.  The full C15 tool set is
covered: luma + chroma (5x5 diamond) planes, geometric TRANSPOSES (4
orientations derived per 4x4 block from the same gradients as the class,
so one filter serves all orientations of a structure), nonlinear
CLIPPING (per-class clip level applied to every neighbor difference),
and CC-ALF (cross-component: chroma corrected from collocated SAO-stage
luma through a 7-tap diamond).  Deviation from VVC [documented,
self-consistent]: the clip level is one 2-bit index per class (VVC
signals one per tap) and CC-ALF coefficients are plain se(v) integers.

TPU-first formulation:
- classification: whole-picture integer Laplacians + blocked reductions
  (no per-block loops);
- application: 12 shifted-difference planes x per-pixel class-gathered
  coefficients — dense VPU work; transposes permute the COEFFICIENT
  table (a (25,4,12) take), never the pixel planes;
- estimation (encoder-only, float allowed): per-class normal equations
  accumulated with one einsum over a class one-hot, solved batched;
  transposes fold in by permuting the feature planes per block BEFORE
  the accumulation (4 selects), keeping the gram at 25 groups.
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

# Geometric transposes (C15): per-4x4-block orientation index in 0..3
# (0 identity, 1 diagonal flip, 2 horizontal flip, 3 both), derived from
# the classification gradients — no signalling.  PERMS[t] maps canonical
# feature index i to the index whose OFFSET is T_t(offset_i); the
# symmetric-pair features make every T_t a permutation of the 12.
TRANSPOSE_PERMS = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],       # identity
    [5, 9, 11, 8, 4, 0, 6, 10, 3, 1, 7, 2],       # swap (dy,dx)->(dx,dy)
    [0, 1, 2, 7, 6, 5, 4, 3, 10, 9, 8, 11],       # flip dx -> -dx
    [5, 9, 11, 10, 6, 0, 4, 8, 7, 1, 3, 2],       # both
], dtype=np.int32)


def clip_levels(bit_depth: int = 8) -> tuple[int, int, int, int]:
    """Nonlinear-ALF clip values per 2-bit level [STD-shaped]: level 0
    exceeds the sample range, so it is exactly the linear filter."""
    b = bit_depth
    return (1 << b, 1 << (b - 3), 1 << (b - 5), 1 << (b - 7))


def _shift2(p, dy, dx, xp):
    return xp.roll(xp.roll(p, -dy, axis=0), -dx, axis=1)


def classify_full(y, xp=jnp):
    """(H, W) int32 luma -> (class (H//4, W//4), transpose (H//4, W//4)).

    Integer-exact: both codec sides compute this on the identical
    (post-SAO) reconstruction, so no signalling is needed [STD-shaped].
    The transpose index canonicalizes the block's orientation (which of
    gh/gv and which diagonal dominates) so one per-class filter serves
    all four orientations.
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
    cls = (5 * a + direction).astype(xp.int32)
    transpose = ((gh > gv).astype(xp.int32)
                 + 2 * (g1 > g0).astype(xp.int32))
    return cls, transpose


def classify(y, xp=jnp):
    """Class map only (linear-ALF path); see classify_full."""
    return classify_full(y, xp)[0]


def _diff_planes(y, xp=jnp):
    """(12, H, W) symmetric difference features: (s_i - c) + (s_-i - c)."""
    feats = []
    for dy, dx in DIAMOND:
        a = _shift2(y, int(dy), int(dx), xp)
        b = _shift2(y, -int(dy), -int(dx), xp)
        feats.append(a + b - 2 * y)
    return xp.stack(feats)


def _clipped_diff_planes(y, v_px, xp=jnp):
    """(12, H, W) features with per-PIXEL clip bound v_px: each of the
    symmetric pair's differences is clipped before summing
    (clip(a-y, +-v) + clip(b-y, +-v)) [STD-shaped nonlinearity]."""
    feats = []
    for dy, dx in DIAMOND:
        a = _shift2(y, int(dy), int(dx), xp) - y
        b = _shift2(y, -int(dy), -int(dx), xp) - y
        feats.append(xp.clip(a, -v_px, v_px) + xp.clip(b, -v_px, v_px))
    return xp.stack(feats)


def apply_alf(y, class_map, coeffs, ctb_flags, xp=jnp,
              bit_depth: int = 8, transpose_map=None, clip_idx=None):
    """Normative ALF application.

    y (H, W) int32 (post-SAO recon); class_map (H/4, W/4); coeffs
    (25, 12) int32; ctb_flags (Cy, Cx) int32 (1 = filter this CTB).
    out = clip(y + (sum c_i * d_i + 64) >> 7) on filtered CTBs [STD-ish].

    Nonlinear/transposed mode (both present or both absent):
    transpose_map (H/4, W/4) in 0..3 permutes the coefficient lookup
    (coeffs[c, PERMS[t]]); clip_idx (25,) selects the per-class clip
    level applied to every neighbor difference.  With clip level 0 and
    transpose 0 everywhere this reduces exactly to the linear filter.
    """
    if xp is not np:
        y = xp.asarray(y, xp.int32)
        class_map = xp.asarray(class_map)
        coeffs = xp.asarray(coeffs, xp.int32)
        ctb_flags = xp.asarray(ctb_flags)
    h, w = y.shape
    nonlin = transpose_map is not None
    if nonlin:
        # per-pixel clip bound from the block's class
        lv = clip_idx[class_map] if xp is np else xp.take(
            clip_idx, class_map)                      # (H/4, W/4)
        vals = clip_levels(bit_depth)
        vblk = sum((lv == i) * v for i, v in enumerate(vals))
        v_px = xp.repeat(xp.repeat(vblk, 4, axis=0), 4, axis=1)
        feats = _clipped_diff_planes(y, v_px, xp)     # (12, H, W)
        # transpose = a permutation of the coefficient table: the
        # effective per-block table is coeffs[c, PERMS[t]]
        group = class_map * 4 + transpose_map         # (H/4, W/4)
        table = (coeffs[:, TRANSPOSE_PERMS] if xp is np
                 else xp.take(coeffs, xp.asarray(TRANSPOSE_PERMS),
                              axis=1))                # (25, 4, 12)
        table = table.reshape(NUM_CLASSES * 4, 12)
        ngroups = NUM_CLASSES * 4
    else:
        feats = _diff_planes(y, xp)                   # (12, H, W)
        group = class_map
        table = coeffs
        ngroups = NUM_CLASSES
    if xp is np:
        grp_px = np.repeat(np.repeat(group, 4, axis=0), 4, axis=1)
        cpx = table[grp_px]                           # (H, W, 12)
        acc = np.sum(cpx.transpose(2, 0, 1) * feats, axis=0)
    else:
        # per-4x4-block coefficient lookup as a one-hot MXU matmul
        # (a (H, W) gather into the table is the XLA-gather cliff);
        # exact: one-hot rows select single int entries <= 511.
        onehot = jax.nn.one_hot(group, ngroups,
                                dtype=jnp.float32)   # (H/4, W/4, G)
        cblk = jnp.einsum("hwc,ck->khw", onehot,
                          table.astype(jnp.float32),
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


def _clipped_diff_planes_chroma(c, v, xp=jnp):
    """(6, H, W) 5x5-diamond features, each difference clipped to +-v."""
    feats = []
    for dy, dx in CHROMA_DIAMOND:
        a = _shift2(c, int(dy), int(dx), xp) - c
        b = _shift2(c, -int(dy), -int(dx), xp) - c
        feats.append(xp.clip(a, -v, v) + xp.clip(b, -v, v))
    return xp.stack(feats)


def apply_alf_chroma(c, coeffs, ctb_flags, xp=jnp,
                     bit_depth: int = 8, clip_lvl=None):
    """Normative chroma ALF: c (H, W) int32 chroma plane (post-SAO),
    coeffs (6,) int32, ctb_flags (Cy, Cx) over the luma CTU grid
    (32x32 chroma samples per CTB at 4:2:0).  clip_lvl (scalar 0..3,
    nonlinear mode): one clip level for the whole plane."""
    if xp is not np:
        c = xp.asarray(c, xp.int32)
        coeffs = xp.asarray(coeffs, xp.int32)
        ctb_flags = xp.asarray(ctb_flags)
    h, w = c.shape
    if clip_lvl is not None:
        vals = clip_levels(bit_depth)
        v = sum((clip_lvl == i) * v_ for i, v_ in enumerate(vals))
        feats = _clipped_diff_planes_chroma(c, v, xp)
    else:
        feats = _diff_planes_chroma(c, xp)            # (6, H, W)
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


def estimate_alf_chroma_nl(orig, recon, lam: float,
                           bit_depth: int = 8):
    """Nonlinear chroma estimation: Wiener solve at each of the 4 clip
    levels, keep the plane-global level with least SSE.

    Returns (coeffs (6,) int32, clip_lvl () int32, flags, filtered)."""
    orig = jnp.asarray(orig, jnp.int32)
    recon = jnp.asarray(recon, jnp.int32)
    h, w = orig.shape
    err = (orig - recon).astype(jnp.float32)
    e = err.reshape(-1)
    reg = 64.0 * jnp.eye(6)
    coeffs_l, sse_l = [], []
    for v in clip_levels(bit_depth):
        feats = _clipped_diff_planes_chroma(recon, v)   # int32 (6,H,W)
        f = feats.astype(jnp.float32).reshape(6, -1)
        sol = jnp.linalg.solve(f @ f.T + reg,
                               (f @ e) * float(1 << COEF_BITS))
        cf = jnp.clip(jnp.round(sol), -COEF_MAX, COEF_MAX
                      ).astype(jnp.int32)
        coeffs_l.append(cf)
        acc = jnp.sum(cf[:, None, None] * feats, axis=0)
        filt = jnp.clip(recon + ((acc + 64) >> COEF_BITS), 0,
                        (1 << bit_depth) - 1)
        sse_l.append(jnp.sum((filt - orig).astype(jnp.float32) ** 2))
    lvl = jnp.argmin(jnp.stack(sse_l)).astype(jnp.int32)
    coeffs = jnp.stack(coeffs_l)[lvl]

    cy, cx = -(-h // 32), -(-w // 32)
    all_on = jnp.ones((cy, cx), jnp.int32)
    filt = apply_alf_chroma(recon, coeffs, all_on, bit_depth=bit_depth,
                            clip_lvl=lvl)

    def ctb_sse(a):
        d = (a - orig).astype(jnp.float32) ** 2
        pad = jnp.pad(d, ((0, cy * 32 - h), (0, cx * 32 - w)))
        return pad.reshape(cy, 32, cx, 32).sum(axis=(1, 3))

    gain = ctb_sse(filt) - ctb_sse(recon)
    flags = (gain + lam * 1.5 < 0).astype(jnp.int32)
    final = apply_alf_chroma(recon, coeffs, flags, bit_depth=bit_depth,
                             clip_lvl=lvl)
    return coeffs, lvl, flags, final


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


def _aligned_feats(feats, tr_px, xp=jnp):
    """Permute the 12 feature planes per pixel by the block transpose:
    fa[i] = feats[PERMS[t, i]] where t is the pixel's transpose.  Four
    selects per tap (dense VPU work; no gathers)."""
    sel = [(tr_px == t) for t in range(4)]
    out = []
    for i in range(12):
        acc = None
        for t in range(4):
            term = xp.where(sel[t], feats[TRANSPOSE_PERMS[t, i]], 0)
            acc = term if acc is None else acc + term
        out.append(acc)
    return xp.stack(out)


def estimate_alf_nonlinear(orig, recon, lam: float, bit_depth: int = 8):
    """Nonlinear + transposed luma estimation (C15 full tool).

    Per clip level: features are clipped, aligned to the block's
    canonical orientation (coefficient-side at apply time; feature-side
    here — equivalent because every transpose permutation is an
    involution), then per-class Wiener-solved.  The clip level is chosen
    per class by filtered SSE; the final application runs through the
    shared normative apply_alf path.

    Returns (coeffs (25, 12) int32, clip_idx (25,) int32,
    ctb_flags (Cy, Cx) int32, filtered (H, W) int32)."""
    orig = jnp.asarray(orig, jnp.int32)
    recon = jnp.asarray(recon, jnp.int32)
    h, w = orig.shape
    cls, tr = classify_full(recon)                    # (H/4, W/4)
    tr_px = jnp.repeat(jnp.repeat(tr, 4, axis=0), 4, axis=1)
    err = (orig - recon).astype(jnp.float32)
    e = err.reshape(-1)

    cls_px = jnp.repeat(jnp.repeat(cls, 4, axis=0), 4, axis=1)
    onehot = jax.nn.one_hot(cls_px, NUM_CLASSES, axis=0,
                            dtype=jnp.float32)        # (25, H, W)
    o = onehot.reshape(NUM_CLASSES, -1)
    reg = 64.0 * jnp.eye(12)[None]

    coeffs_l, blocksse_l = [], []
    for v in clip_levels(bit_depth):
        feats = _clipped_diff_planes(recon, v)        # int32 (12,H,W)
        fa = _aligned_feats(feats, tr_px)             # aligned
        f = fa.astype(jnp.float32).reshape(12, -1)
        gram = jnp.einsum("cn,in,jn->cij", o, f, f)
        rhs = jnp.einsum("cn,in,n->ci", o, f, e) * float(1 << COEF_BITS)
        sol = jnp.linalg.solve(gram + reg, rhs[..., None])[..., 0]
        cf = jnp.clip(jnp.round(sol), -COEF_MAX, COEF_MAX
                      ).astype(jnp.int32)
        coeffs_l.append(cf)
        # filtered output at this level (aligned-feature form)
        oh_blk = jax.nn.one_hot(cls, NUM_CLASSES, dtype=jnp.float32)
        cblk = jnp.einsum("hwc,ck->khw", oh_blk, cf.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(jnp.int32)         # (12, H/4, W/4)
        cpx = jnp.repeat(jnp.repeat(cblk, 4, axis=1), 4, axis=2)
        acc = jnp.sum(cpx * fa, axis=0)
        filt = jnp.clip(recon + ((acc + 64) >> COEF_BITS), 0,
                        (1 << bit_depth) - 1)
        d = (filt - orig).astype(jnp.float32) ** 2
        dblk = d.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3))
        # per-class SSE of this level
        blocksse_l.append(jnp.einsum(
            "hwc,hw->c", jax.nn.one_hot(cls, NUM_CLASSES,
                                        dtype=jnp.float32), dblk))
    clip_idx = jnp.argmin(jnp.stack(blocksse_l), axis=0
                          ).astype(jnp.int32)         # (25,)
    coeffs = jnp.take_along_axis(
        jnp.stack(coeffs_l), clip_idx[None, :, None], axis=0)[0]

    cy, cx = -(-h // 64), -(-w // 64)
    all_on = jnp.ones((cy, cx), jnp.int32)
    filt = apply_alf(recon, cls, coeffs, all_on, bit_depth=bit_depth,
                     transpose_map=tr, clip_idx=clip_idx)

    def ctb_sse(a):
        d = (a - orig).astype(jnp.float32) ** 2
        pad = jnp.pad(d, ((0, cy * 64 - h), (0, cx * 64 - w)))
        return pad.reshape(cy, 64, cx, 64).sum(axis=(1, 3))

    gain = ctb_sse(filt) - ctb_sse(recon)
    flags = (gain + lam * 1.5 < 0).astype(jnp.int32)
    final = apply_alf(recon, cls, coeffs, flags, bit_depth=bit_depth,
                      transpose_map=tr, clip_idx=clip_idx)
    return coeffs, clip_idx, flags, final


# ---- CC-ALF (C15, VVC-shaped cross-component filter) ------------------------
#
# Each chroma plane receives a correction derived from the collocated
# SAO-stage luma through a 7-tap diamond (the VVC 3x4 shape) in
# difference form against the collocated luma sample: out_c = clip(c +
# (sum c_i * (L[2y+dy, 2x+dx] - L[2y, 2x]) + 64) >> 7) on enabled CTBs.
# Coefficients are plain se(v) integers in the slice header (VVC
# constrains them to powers of two; x266t deviation, documented).

CC_OFFSETS = np.array([
    (-1, 0),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
    (2, 0),
], dtype=np.int32)


def _cc_feats(luma, ch: int, cw: int, xp=jnp):
    """(7, ch, cw) luma-difference features at chroma resolution."""
    center = luma[0::2, 0::2][:ch, :cw]
    feats = []
    for dy, dx in CC_OFFSETS:
        s = _shift2(luma, int(dy), int(dx), xp)[0::2, 0::2][:ch, :cw]
        feats.append(s - center)
    return xp.stack(feats)


def apply_ccalf(c, luma, coeffs, ctb_flags, xp=jnp, bit_depth: int = 8):
    """Normative CC-ALF for one chroma plane.

    c (ch, cw) int32 (post chroma-ALF), luma (H, W) int32 (post-SAO,
    pre-ALF), coeffs (7,) int32, ctb_flags (Cy, Cx) on the CTU grid."""
    if xp is not np:
        c = xp.asarray(c, xp.int32)
        luma = xp.asarray(luma, xp.int32)
        coeffs = xp.asarray(coeffs, xp.int32)
        ctb_flags = xp.asarray(ctb_flags)
    ch, cw = c.shape
    feats = _cc_feats(luma, ch, cw, xp)
    acc = xp.sum(coeffs[:, None, None] * feats, axis=0)
    filt = xp.clip(c + ((acc + 64) >> COEF_BITS), 0,
                   (1 << bit_depth) - 1)
    on = xp.repeat(xp.repeat(ctb_flags, 32, axis=0),
                   32, axis=1)[:ch, :cw]
    return xp.where(on > 0, filt, c)


def estimate_ccalf(orig_c, c, luma, lam: float, bit_depth: int = 8):
    """Encoder: Wiener CC-ALF for one chroma plane + per-CTB flags.

    Returns (coeffs (7,) int32, flags (Cy, Cx) int32, filtered)."""
    orig_c = jnp.asarray(orig_c, jnp.int32)
    c = jnp.asarray(c, jnp.int32)
    luma = jnp.asarray(luma, jnp.int32)
    ch, cw = orig_c.shape
    feats = _cc_feats(luma, ch, cw)
    f = feats.astype(jnp.float32).reshape(7, -1)
    e = (orig_c - c).astype(jnp.float32).reshape(-1)
    reg = 64.0 * jnp.eye(7)
    sol = jnp.linalg.solve(f @ f.T + reg,
                           (f @ e) * float(1 << COEF_BITS))
    coeffs = jnp.clip(jnp.round(sol), -COEF_MAX, COEF_MAX
                      ).astype(jnp.int32)

    cy, cx = -(-ch // 32), -(-cw // 32)
    all_on = jnp.ones((cy, cx), jnp.int32)
    filt = apply_ccalf(c, luma, coeffs, all_on, bit_depth=bit_depth)

    def ctb_sse(a):
        d = (a - orig_c).astype(jnp.float32) ** 2
        pad = jnp.pad(d, ((0, cy * 32 - ch), (0, cx * 32 - cw)))
        return pad.reshape(cy, 32, cx, 32).sum(axis=(1, 3))

    gain = ctb_sse(filt) - ctb_sse(c)
    flags = (gain + lam * 1.5 < 0).astype(jnp.int32)
    # whole-filter RD gate: the coefficients (~14 se bits each) and the
    # per-CTB flag bits are paid whenever any CTB enables; zero the
    # filter out unless the total SSE gain beats that header cost
    # (all-zero coefficients make apply_ccalf the identity).
    total_gain = jnp.sum(jnp.where(flags > 0, gain, 0.0))
    worth = total_gain + lam * (112.0 + cy * cx) < 0
    coeffs = jnp.where(worth, coeffs, 0)
    flags = jnp.where(worth, flags, 0)
    final = apply_ccalf(c, luma, coeffs, flags, bit_depth=bit_depth)
    return coeffs, flags, final
