"""Pallas TPU kernels for the motion path (C7/C8) hot gathers.

Two kernels replace the vmapped-dynamic_slice gathers that dominate the
P-picture mode decision (XLA lowers them to serialized gathers; measured
~500 ms of the 650 ms Pass-A cost at 1080p):

- warp_frames: per 16x16 ME block, gather its (16,16) motion-compensated
  prediction from the quarter-pel pyramid (kernels.interp layout) — ONE
  aligned-window DMA per block, lane-roll + static row-select extraction.
  T independent MV fields produce T full MC frames in one call; Pass A
  then reads per-CU predictions as pure reshapes of these frames.
- refine_search: hierarchical ME's combined refinement. Per block ONE
  3D DMA fetches the (16, 40, 256) window spanning all 16 subplanes;
  49 (+-3 full-pel)^2 then 25 (+-2 qpel)^2 candidates evaluate in
  VMEM; bit-identical to kernels.me.refine_search_ref (same candidate
  order and strict-< tie-breaks).

Both are exact gathers (uint8 pyramid -> int32), so all consumers are
bit-exact vs the XLA reference paths (tests/test_me_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x266_tpu.kernels.interp import REF_PAD
from x266_tpu.kernels.me import (FRAC_D, ME_BLOCK, REFINE_R,
                                 _QP_DELTAS, _REF_DELTAS)

I32 = jnp.int32


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _row_select(v, rem, nrows: int, out_rows: int):
    """v[rem : rem+out_rows] for dynamic rem in [0, 8) via static selects."""
    out = v[0:out_rows]
    for k in range(1, 8):
        out = jnp.where(rem == k, v[k:k + out_rows], out)
    return out


# ---- warp kernel -------------------------------------------------------------

def _build_warp(t_n: int, by: int, bxp: int, interpret: bool):
    gx = bxp // 8    # grid steps per block row (8 ME blocks per step)

    def kernel(mv_ref, pyr_ref, out_ref, win, sem):
        t = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        for k in range(8):
            bxi = j * 8 + k
            mvx = mv_ref[0, 0, bxi, 0]
            mvy = mv_ref[0, 0, bxi, 1]
            f = (mvy & 3) * 4 + (mvx & 3)
            ix = bxi * ME_BLOCK + REF_PAD + (mvx >> 2)
            iy = i * ME_BLOCK + REF_PAD + (mvy >> 2)
            iyb = (iy // 8) * 8
            ixb = (ix // 128) * 128
            cp = pltpu.make_async_copy(
                pyr_ref.at[f, pl.ds(pl.multiple_of(iyb, 8), 24),
                           pl.ds(pl.multiple_of(ixb, 128), 256)],
                win, sem)
            cp.start()
            cp.wait()
            v = win[:].astype(I32)
            v = pltpu.roll(v, (256 - (ix - ixb)) % 256, 1)[:, 0:ME_BLOCK]
            blk = _row_select(v, iy - iyb, 24, ME_BLOCK)
            out_ref[0, :, k * ME_BLOCK:(k + 1) * ME_BLOCK] = blk

    return pl.pallas_call(
        kernel,
        grid=(t_n, by, gx),
        out_shape=jax.ShapeDtypeStruct(
            (t_n, by * ME_BLOCK, bxp * ME_BLOCK), jnp.int32),
        in_specs=[pl.BlockSpec((1, 1, bxp, 2),
                               lambda t, i, j: (t, i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, ME_BLOCK, 128),
                               lambda t, i, j: (t, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((24, 256), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3),
    )


@functools.cache
def _warp_call(t_n, by, bxp, hp, wneed, interpret):
    call = _build_warp(t_n, by, bxp, interpret)

    def run(mvs, pyramid):
        mvp = jnp.zeros((t_n, by, bxp, 2), jnp.int32)
        mvp = mvp.at[:, :, :mvs.shape[2], :].set(mvs)
        pyr = jnp.pad(pyramid,
                      ((0, 0), (0, max(0, hp - pyramid.shape[1])),
                       (0, max(0, wneed - pyramid.shape[2]))))
        return call(mvp, pyr)

    return jax.jit(run)


def warp_frames(pyramid, mvs, h: int, w: int,
                interpret: bool | None = None):
    """(T, By, Bx, 2) quarter-pel MVs -> (T, H16, W16) int32 MC frames
    (H16/W16 = ME-block-padded picture dims; slice [:h, :w] yourself).
    Block (by, bx) of frame t is pyramid-gathered at mvs[t, by, bx] —
    exactly kernels.interp.mc_block per 16x16 block."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_n, by, bx = mvs.shape[:3]
    bxp = _pad_to(bx, 8)
    # window bound: ix <= (bx*16-16) + REF_PAD + mv_int_max + 255 lanes
    wneed = _pad_to(bxp * ME_BLOCK + REF_PAD + (REF_PAD - 8), 128) + 256
    hp = by * ME_BLOCK + 2 * REF_PAD + 32
    out = _warp_call(t_n, by, bxp, hp, wneed, interpret)(mvs, pyramid)
    return out


# ---- combined full-pel + quarter-pel refinement ------------------------------

def _build_refine2(by: int, bxp: int, interpret: bool):
    """Stage-1 (+-REFINE_R full-pel, integer plane) and stage-2
    (+-FRAC_D quarter-pel) refinement around a per-block base MV, ONE
    3D DMA per block; bit-identical to kernels.me.refine_search_ref
    (same candidate order and strict-< tie-breaks)."""
    gx = bxp // 8
    B = ME_BLOCK
    R = REFINE_R

    def kernel(mv_ref, cur_ref, pyr_ref, out_ref, win, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        for k in range(8):
            bxi = j * 8 + k
            basex = mv_ref[0, bxi, 0]
            basey = mv_ref[0, bxi, 1]
            cur = cur_ref[:, k * B:(k + 1) * B].astype(I32)
            # window origin: one pel beyond the widest candidate reach
            ibx = bxi * B + REF_PAD + basex - (R + 1)
            iby = i * B + REF_PAD + basey - (R + 1)
            iyb = (iby // 8) * 8
            ixb = (ibx // 128) * 128
            cp = pltpu.make_async_copy(
                pyr_ref.at[pl.ds(0, 16),
                           pl.ds(pl.multiple_of(iyb, 8), 40),
                           pl.ds(pl.multiple_of(ixb, 128), 256)],
                win, sem)
            cp.start()
            cp.wait()
            remy = iby - iyb                          # 0..7
            remx = ibx - ixb

            # ---- stage 1: 49 full-pel SADs on the integer plane ----
            v0 = win[0].astype(I32)
            v0 = pltpu.roll(v0, (256 - remx) % 256, 1)
            u0 = _row_select(v0, remy, 40, 2 * R + 2 + B)   # rows [iby..]
            best_cost = None
            best_idx = None
            for di, (dx, dy) in enumerate(_REF_DELTAS):
                p = u0[R + 1 + dy:R + 1 + dy + B,
                       R + 1 + dx:R + 1 + dx + B]
                sad = jnp.sum(jnp.abs(cur - p))
                if best_cost is None:
                    best_cost, best_idx = sad, jnp.zeros((), I32)
                else:
                    better = sad < best_cost
                    best_cost = jnp.where(better, sad, best_cost)
                    best_idx = jnp.where(better, di, best_idx)
            bix = jnp.zeros((), I32)
            biy = jnp.zeros((), I32)
            for di, (dx, dy) in enumerate(_REF_DELTAS):
                bix = jnp.where(best_idx == di, dx, bix)
                biy = jnp.where(best_idx == di, dy, biy)

            # ---- stage 2: 25 quarter-pel SADs around the winner ----
            planes = {}
            rowsh = remy + R + biy                    # in [remy, remy+2R]
            for f in range(16):
                v = win[f].astype(I32)
                v = pltpu.roll(v, (256 - remx) % 256, 1)
                v = pltpu.roll(v, (256 - ((R + bix) % 256)) % 256, 1)
                u = v[0:2 * R + 8 + B + 2]
                sel = u[0:B + 2]
                for r in range(1, 2 * R + 8):
                    sel = jnp.where(rowsh == r, u[r:r + B + 2], sel)
                planes[f] = sel                       # rows [iby+R+biy..]
            best2 = None
            bq = None
            for di, (dx, dy) in enumerate(_QP_DELTAS):
                f = (dy & 3) * 4 + (dx & 3)
                oy = 1 + (dy >> 2)
                ox = 1 + (dx >> 2)
                p = planes[f][oy:oy + B, ox:ox + B]
                sad = jnp.sum(jnp.abs(cur - p))
                if best2 is None:
                    best2, bq = sad, jnp.zeros((), I32)
                else:
                    better = sad < best2
                    best2 = jnp.where(better, sad, best2)
                    bq = jnp.where(better, di, bq)
            dqx = jnp.zeros((), I32)
            dqy = jnp.zeros((), I32)
            for di, (dx, dy) in enumerate(_QP_DELTAS):
                dqx = jnp.where(bq == di, dx, dqx)
                dqy = jnp.where(bq == di, dy, dqy)
            mvx = (basex + bix) * 4 + dqx
            mvy = (basey + biy) * 4 + dqy

            sub = jax.lax.broadcasted_iota(I32, (bxp, 2), 0)
            lane = jax.lax.broadcasted_iota(I32, (bxp, 2), 1)
            val = jnp.where(lane == 0, jnp.full((bxp, 2), mvx, I32),
                            jnp.full((bxp, 2), mvy, I32))
            out_ref[0] = jnp.where(sub == bxi, val, out_ref[0])

    return pl.pallas_call(
        kernel,
        grid=(by, gx),
        out_shape=jax.ShapeDtypeStruct((by, bxp, 2), jnp.int32),
        in_specs=[pl.BlockSpec((1, bxp, 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((ME_BLOCK, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bxp, 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 40, 256), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 2),
    )


@functools.cache
def _refine2_call(by, bxp, hp, wneed, interpret):
    call = _build_refine2(by, bxp, interpret)

    def run(cur, base, pyramid):
        curp = jnp.zeros((by * ME_BLOCK, bxp * ME_BLOCK), jnp.int32)
        curp = curp.at[:cur.shape[0], :cur.shape[1]].set(
            cur.astype(jnp.int32))
        mvp = jnp.zeros((by, bxp, 2), jnp.int32)
        mvp = mvp.at[:, :base.shape[1], :].set(base)
        pyr = jnp.pad(pyramid,
                      ((0, 0), (0, max(0, hp - pyramid.shape[1])),
                       (0, max(0, wneed - pyramid.shape[2]))))
        return call(mvp, curp, pyr)

    return jax.jit(run)


def refine_search(cur, pyramid, base, interpret: bool | None = None):
    """Pallas implementation of kernels.me.refine_search_ref.

    cur: (H, W) int (ME_BLOCK multiples); pyramid (16, Hp, Wp) uint8;
    base (By, Bx, 2) full-pel.  Returns (By, Bx, 2) quarter-pel MVs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = cur.shape
    by, bx = h // ME_BLOCK, w // ME_BLOCK
    bxp = _pad_to(bx, 8)
    wneed = _pad_to(bxp * ME_BLOCK + REF_PAD + (REF_PAD - 8), 128) + 256
    hp = by * ME_BLOCK + 2 * REF_PAD + 48
    out = _refine2_call(by, bxp, hp, wneed, interpret)(cur, base,
                                                       pyramid)
    return out[:, :bx, :]
