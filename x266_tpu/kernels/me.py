"""Motion estimation (C8), encoder-only, TPU-first.

Hierarchical bounded-window search (the hardware-encoder shape the
reference's RTL implies [PK]): a dense 4x-subsampled cost volume covers
the +-SEARCH_R window (one lax.scan step per dy; all dx shifts are
static slices — dense VPU work), then a combined refinement evaluates
+-REFINE_R full-pel and +-FRAC_D quarter-pel candidates around the
winner by gathers into the interpolation pyramid (kernels.interp), so
ME sees exactly the normative MC samples.  A small center-bias
approximates the MV-rate term.  The Pallas and XLA refine paths
implement the identical candidate order (kernels.me_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.kernels import interp

ME_BLOCK = 16          # ME grid granularity (16x16 luma blocks)
SEARCH_R = 16          # integer search radius (full-pel)
FRAC_D = 2             # quarter-pel refinement radius


def _block_sums(diff: jnp.ndarray, by: int, bx: int) -> jnp.ndarray:
    return diff.reshape(by, ME_BLOCK, bx, ME_BLOCK).sum(
        axis=(1, 3), dtype=jnp.int32)


def _ceil_pad(img: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad a picture to ME_BLOCK multiples (1080p is 67.5 blocks
    tall; boundary blocks search with replicated edge content)."""
    h, w = img.shape
    ph = -(-h // ME_BLOCK) * ME_BLOCK - h
    pw = -(-w // ME_BLOCK) * ME_BLOCK - w
    if ph == 0 and pw == 0:
        return img
    return jnp.pad(img, ((0, ph), (0, pw)), mode="edge")


def integer_search(cur: jnp.ndarray, ref_pad: jnp.ndarray,
                   lam: float, radius: int = SEARCH_R,
                   pad: int = interp.REF_PAD, blk: int = ME_BLOCK,
                   pen_scale: float = 2.0, pred=None,
                   lam_rate: float = 0.0) -> jnp.ndarray:
    """cur: (H, W) int32 picture (blk multiples); ref_pad: pad-padded
    reference.  Returns (H/blk, W/blk, 2) int32 full-pel MVs.

    pred None: center bias lam*pen_scale*(|dx|+|dy|) (field
    regularizer).  pred (By, Bx, 2): predictor-relative rate term
    lam_rate * (mvd_rate(|dx-px|) + mvd_rate(|dy-py|)) instead — the
    AMVP-shaped cost (C8) used by the second coarse pass.
    """
    h, w = cur.shape
    by, bx = h // blk, w // blk
    r = radius
    n = 2 * r + 1

    # One scan step per dy; all 2r+1 dx shifts come from STATIC slices
    # of one (h, w+2r) row window.  The previous per-(dy,dx) scan was
    # 1089 sequential steps of tiny kernels — per-step dispatch
    # dominated (~300 ms at 1080p); this shape is 2r+1 steps of dense
    # VPU work.
    dys = jnp.arange(-r, r + 1, dtype=jnp.int32)

    def bsum(diff):
        return diff.reshape(by, blk, bx, blk).sum(axis=(1, 3),
                                                  dtype=jnp.int32)

    def body(carry, dy):
        best_cost, best_mv = carry
        row = jax.lax.dynamic_slice(
            ref_pad, (pad + dy, pad - r), (h, w + 2 * r))
        sads = jnp.stack(
            [bsum(jnp.abs(cur - row[:, k:k + w]))
             for k in range(n)])                       # (n, By, Bx)
        dxs = jnp.arange(-r, r + 1, dtype=jnp.int32)
        if pred is None:
            pen = (jnp.abs(dxs) + jnp.abs(dy)).astype(jnp.float32)
            cost = (sads.astype(jnp.float32)
                    + lam * pen_scale * pen[:, None, None])
        else:
            rx = mvd_rate(jnp.abs(dxs[:, None, None]
                                  - pred[None, :, :, 0]))
            ry = mvd_rate(jnp.abs(dy - pred[:, :, 1]))[None]
            cost = (sads.astype(jnp.float32)
                    + lam_rate * (rx + ry).astype(jnp.float32))
        k = jnp.argmin(cost, axis=0)                   # (By, Bx)
        c = jnp.min(cost, axis=0)
        better = c < best_cost
        best_cost = jnp.where(better, c, best_cost)
        mv = jnp.stack([k.astype(jnp.int32) - r,
                        jnp.broadcast_to(dy, (by, bx))], axis=-1)
        best_mv = jnp.where(better[..., None], mv, best_mv)
        return (best_cost, best_mv), None

    init = (jnp.full((by, bx), jnp.inf, jnp.float32),
            jnp.zeros((by, bx, 2), jnp.int32))
    (cost, mv), _ = jax.lax.scan(body, init, dys)
    return mv                                  # (..., [x, y]) full-pel


# ---- hierarchical search (coarse 4x + combined refine) ---------------------

REFINE_R = 3       # full-pel refinement reach around the coarse MV

# Two-step full-pel pattern instead of the exhaustive (2R+1)^2 grid:
# a stride-2 3x3 picks a quadrant, a stride-1 3x3 lands on the pel —
# 18 SADs for the same +-3 reach (every |d| <= 3 position remains
# reachable: stride-2 winner w in {-2,0,2}^2, then w + {-1,0,1}^2).
# Greedy vs exhaustive costs ~0 RD on the regression clips (the gate
# in tests/test_rd.py watches it) and halves the refine kernel's
# dominant per-block SAD chain at 4K.
_REF_DELTAS_A = [(dx, dy) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]
_REF_DELTAS_B = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_QP_DELTAS = [(dx, dy) for dy in range(-FRAC_D, FRAC_D + 1)
              for dx in range(-FRAC_D, FRAC_D + 1)]


def mvd_rate(v):
    """Integer-exact MVD-component rate model (C8): 1 + 2*ceil(log2(v+1))
    bits for magnitude v, via threshold counts — identical scalar int
    math in the XLA oracle and the Pallas kernel (bit-equality gate).
    Tracks the exp-Golomb MVD length of the entropy layer."""
    r = (v >= 1).astype(jnp.int32)
    for k in range(1, 8):
        r = r + (v >= (1 << k)).astype(jnp.int32)
    return 1 + 2 * r


def coarse_search(cur: jnp.ndarray, pyramid: jnp.ndarray,
                  lam: float) -> jnp.ndarray:
    """4x-downsampled dense search covering +-SEARCH_R full-pel.

    Two passes (C8 "AMVP-shaped rate" — VERDICT round-1 item 10):
    pass 1 ranks with the center-bias regularizer; pass 2 re-searches
    with each block's cost measured against its LEFT neighbor's pass-1
    MV using the integer mvd_rate model — the derivable predictor
    proxy, available without sequential dependencies once pass 1 is
    complete.  Fully vectorized (the penalty broadcasts over the
    (dx, By, Bx) cost volume); the subsampled search is cheap, so the
    second pass costs ~1 ms at 4K.  Returns (By, Bx, 2) int32 full-pel
    MVs (multiples of 4) that seed the refine kernel.
    """
    cur4 = cur[::4, ::4]
    ref4 = pyramid[0][::4, ::4].astype(jnp.int32)
    mv4 = integer_search(cur4, ref4, lam, radius=SEARCH_R // 4,
                         pad=interp.REF_PAD // 4, blk=ME_BLOCK // 4,
                         pen_scale=8.0)
    bx = mv4.shape[1]
    pred = mv4[:, np.maximum(np.arange(bx) - 1, 0), :]
    # SADs here are 1/16-scale (4x-subsampled 4x4 blocks); the rate is
    # paid once per full-resolution block -> lam_sad / 16, and the
    # quarter-pel MVD magnitude is 16x the subsampled units, which
    # mvd_rate absorbs as +8 bits/component for both candidates (a
    # constant offset that cancels in the argmin).
    # lam_rate swept on the RD harness: 2*sqrt(lam) is rate-neutral on
    # the low-delay clip and -3.8% bits on the RA clip (weaker weights
    # leave rate on the table, stronger ones start costing PSNR)
    mv4 = integer_search(cur4, ref4, lam, radius=SEARCH_R // 4,
                         pad=interp.REF_PAD // 4, blk=ME_BLOCK // 4,
                         pred=pred, lam_rate=float(lam) ** 0.5 * 2.0)
    return mv4 * 4


def refine_search_ref(cur: jnp.ndarray, pyramid: jnp.ndarray,
                      base: jnp.ndarray) -> jnp.ndarray:
    """XLA reference of the combined refine (oracle for the Pallas
    kernel): two-step full-pel pattern (stride-2 then stride-1 3x3)
    around `base` on the integer plane, then +-FRAC_D quarter-pel
    around the winner.  First minimum wins in list order.

    cur (H, W) int32 (ME_BLOCK multiples); base (By, Bx, 2) full-pel.
    Returns (By, Bx, 2) quarter-pel MVs.
    """
    h, w = cur.shape
    by, bx = h // ME_BLOCK, w // ME_BLOCK
    ys = (np.arange(by) * ME_BLOCK).astype(np.int32)
    xs = (np.arange(bx) * ME_BLOCK).astype(np.int32)
    gx, gy = np.meshgrid(xs, ys)
    gx = jnp.asarray(gx.ravel())
    gy = jnp.asarray(gy.ravel())
    b = base.reshape(-1, 2)

    cur_blocks = jax.vmap(
        lambda x, y: jax.lax.dynamic_slice(cur, (y, x),
                                           (ME_BLOCK, ME_BLOCK)))(gx, gy)

    def sad_at(mvx, mvy):
        pred = jax.vmap(lambda x, y, mx, my: interp.mc_block(
            pyramid, x, y, mx, my, ME_BLOCK))(gx, gy, mvx, mvy)
        return jnp.sum(jnp.abs(cur_blocks - pred), axis=(1, 2))

    # stage 1a/1b: full-pel (quarter-pel units = *4, plane 0)
    costs = jnp.stack([sad_at((b[:, 0] + dx) * 4, (b[:, 1] + dy) * 4)
                       for (dx, dy) in _REF_DELTAS_A])
    k = jnp.argmin(costs, axis=0)
    b = b + jnp.asarray(_REF_DELTAS_A, jnp.int32)[k]   # (B, 2)
    costs = jnp.stack([sad_at((b[:, 0] + dx) * 4, (b[:, 1] + dy) * 4)
                       for (dx, dy) in _REF_DELTAS_B])
    k = jnp.argmin(costs, axis=0)
    dd = jnp.asarray(_REF_DELTAS_B, jnp.int32)[k]
    ib = (b + dd) * 4
    # stage 2: quarter-pel
    costs2 = jnp.stack([sad_at(ib[:, 0] + dx, ib[:, 1] + dy)
                        for (dx, dy) in _QP_DELTAS])
    k2 = jnp.argmin(costs2, axis=0)
    dq = jnp.asarray(_QP_DELTAS, jnp.int32)[k2]
    return (ib + dq).reshape(by, bx, 2)


def use_pallas_me(flag: bool | None = None) -> bool:
    """Pallas ME kernels on TPU unless X266T_PALLAS=0 (or flag given)."""
    import os

    if flag is not None:
        return flag
    env = os.environ.get("X266T_PALLAS")
    return jax.default_backend() == "tpu" if env is None else env != "0"


def me_search(cur, pyramid, cfg, lam: float,
              use_pallas: bool | None = None):
    """(H, W) current + (16, Hp, Wp) pyramid -> (By, Bx, 2) quarter MVs
    with By/Bx = ceil(H/16)/ceil(W/16).  pyramid[0] is exactly the
    padded integer reference plane.

    Hierarchical (the hardware-encoder shape): a 4x-subsampled dense
    search covers +-SEARCH_R, then ONE combined kernel refines +-3
    full-pel and +-2 quarter-pel around the winner — ~20x less work
    than the dense full-pel scan at 4K.  Pallas and XLA implement the
    identical candidate order, so decisions match bit-for-bit.
    """
    cur = _ceil_pad(cur.astype(jnp.int32))
    base = coarse_search(cur, pyramid, lam)
    bound = interp.mv_bounds(cfg, ME_BLOCK) - 8
    if use_pallas_me(use_pallas):
        from x266_tpu.kernels.me_pallas import refine_search
        mv = refine_search(cur, pyramid, base)
    else:
        mv = refine_search_ref(cur, pyramid, base)
    return jnp.clip(mv, -bound, bound)


@functools.cache
def make_me(cfg, lam: float):
    """jit-compiled me_search."""
    return jax.jit(lambda cur, pyr: me_search(cur, pyr, cfg, lam))
