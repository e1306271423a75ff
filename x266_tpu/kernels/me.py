"""Motion estimation (C8), encoder-only, TPU-first.

Integer search: an exhaustive +-SEARCH_R full-pel window evaluated as a
cost volume — one lax.scan over offsets, each step computing the whole
picture's absolute differences and reducing them to per-16x16-block SADs
(dense VPU work, the hardware-friendly bounded-window search the
reference's RTL implies [PK]).  Fractional refinement: +-2 quarter-pel
deltas around the integer winner, evaluated by gathers into the
interpolation pyramid (kernels.interp) so ME sees exactly the normative
MC samples.  A small center-bias approximates the MV-rate term.
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
                   lam: float) -> jnp.ndarray:
    """cur: (H, W) int32 picture (ME_BLOCK multiples); ref_pad:
    REF_PAD-padded reference.

    Returns (By, Bx, 2) int32 full-pel MVs.
    """
    h, w = cur.shape
    by, bx = h // ME_BLOCK, w // ME_BLOCK
    r = SEARCH_R
    n = 2 * r + 1

    # One scan step per dy; all 2r+1 dx shifts come from STATIC slices
    # of one (h, w+2r) row window.  The previous per-(dy,dx) scan was
    # 1089 sequential steps of tiny kernels — per-step dispatch
    # dominated (~300 ms at 1080p); this shape is 33 steps of dense
    # VPU work.
    dys = jnp.arange(-r, r + 1, dtype=jnp.int32)

    def body(carry, dy):
        best_cost, best_mv = carry
        row = jax.lax.dynamic_slice(
            ref_pad, (interp.REF_PAD + dy, interp.REF_PAD - r),
            (h, w + 2 * r))
        sads = jnp.stack(
            [_block_sums(jnp.abs(cur - row[:, k:k + w]), by, bx)
             for k in range(n)])                       # (n, By, Bx)
        dxs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        pen = (jnp.abs(dxs) + jnp.abs(dy).astype(jnp.float32)
               )[:, None, None]
        cost = sads.astype(jnp.float32) + lam * 2.0 * pen
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


def fractional_refine(cur: jnp.ndarray, pyramid: jnp.ndarray,
                      int_mv: jnp.ndarray) -> jnp.ndarray:
    """Quarter-pel refinement via pyramid gathers.

    cur (H, W) int32; pyramid (16, Hp, Wp) uint8; int_mv (By, Bx, 2)
    full-pel.  Returns (By, Bx, 2) quarter-pel MVs.
    """
    h, w = cur.shape
    by, bx = h // ME_BLOCK, w // ME_BLOCK
    ys = (np.arange(by) * ME_BLOCK).astype(np.int32)
    xs = (np.arange(bx) * ME_BLOCK).astype(np.int32)
    gx, gy = np.meshgrid(xs, ys)               # (By, Bx)
    gx = jnp.asarray(gx.ravel())
    gy = jnp.asarray(gy.ravel())
    base = int_mv.reshape(-1, 2) * 4           # quarter-pel

    cur_blocks = jax.vmap(
        lambda x, y: jax.lax.dynamic_slice(cur, (y, x),
                                           (ME_BLOCK, ME_BLOCK)))(gx, gy)

    deltas = jnp.asarray(
        [(dx, dy) for dy in range(-FRAC_D, FRAC_D + 1)
         for dx in range(-FRAC_D, FRAC_D + 1)], dtype=jnp.int32)

    def eval_delta(d):
        mvx = base[:, 0] + d[0]
        mvy = base[:, 1] + d[1]
        pred = jax.vmap(lambda x, y, mx, my: interp.mc_block(
            pyramid, x, y, mx, my, ME_BLOCK))(gx, gy, mvx, mvy)
        return jnp.sum(jnp.abs(cur_blocks - pred), axis=(1, 2))

    costs = jax.vmap(eval_delta)(deltas)        # (25, B)
    best = jnp.argmin(costs, axis=0)            # (B,)
    d = deltas[best]                            # (B, 2)
    mv = base + d
    return mv.reshape(by, bx, 2)


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
    padded integer reference plane."""
    cur = _ceil_pad(cur.astype(jnp.int32))
    ref_pad = pyramid[0].astype(jnp.int32)
    imv = integer_search(cur, ref_pad, lam)
    bound = interp.mv_bounds(cfg, ME_BLOCK) - 8
    if use_pallas_me(use_pallas):
        from x266_tpu.kernels.me_pallas import frac_refine
        mv = frac_refine(cur, pyramid, imv)
    else:
        mv = fractional_refine(cur, pyramid, imv)
    return jnp.clip(mv, -bound, bound)


@functools.cache
def make_me(cfg, lam: float):
    """jit-compiled me_search."""
    return jax.jit(lambda cur, pyr: me_search(cur, pyr, cfg, lam))
