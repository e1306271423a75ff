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
  3D DMA fetches the (16, WROWS, 256) window spanning all 16
  subplanes; the two-step full-pel pattern (stride-2 then stride-1
  3x3, +-3 reach) then 25 (+-2 qpel)^2 candidates evaluate in VMEM;
  bit-identical to kernels.me.refine_search_ref (same candidate order
  and strict-< tie-breaks).

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
                                 _QP_DELTAS, _REF_DELTAS_A,
                                 _REF_DELTAS_B)

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

    def kernel(mv_ref, pyr_ref, out_ref, *scratch):
        wins, sems = scratch[:8], scratch[8:]
        i = pl.program_id(1)
        j = pl.program_id(2)

        def window(k):
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
                wins[k], sems[k])
            return cp, iy - iyb, ix - ixb

        # issue all 8 block DMAs up front so HBM latency overlaps the
        # roll/select extraction of earlier blocks (see refine kernel)
        cps = [window(k) for k in range(8)]
        for cp, _, _ in cps:
            cp.start()
        for k in range(8):
            cp, remy, remx = cps[k]
            cp.wait()
            v = wins[k][:].astype(I32)
            v = pltpu.roll(v, (256 - remx) % 256, 1)[:, 0:ME_BLOCK]
            blk = _row_select(v, remy, 24, ME_BLOCK)
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
        scratch_shapes=([pltpu.VMEM((24, 256), jnp.uint8)] * 8
                        + [pltpu.SemaphoreType.DMA] * 8),
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

REFINE_NB = 32   # ME blocks per refine grid step: all NB windows DMA
                 # concurrently, so the per-step HBM latency wall
                 # amortizes over 4x more compute than the 8-block shape


def _build_refine2(by: int, bxp: int, interpret: bool):
    """Stage-1 (two-step full-pel, integer plane) and stage-2
    (+-FRAC_D quarter-pel) refinement around a per-block base MV, ONE
    3D DMA per block; bit-identical to kernels.me.refine_search_ref
    (same candidate order and strict-< tie-breaks)."""
    NB = REFINE_NB
    gx = bxp // NB
    B = ME_BLOCK
    R = REFINE_R
    # window rows: origin base-(R+1) .. widest read base+R+B+2 quarter
    # rows, +8 for sublane alignment slack
    WROWS = _pad_to(3 * R + B + 3 + 8, 8)

    def kernel(mv_ref, cur_ref, pyr_ref, out_ref, *scratch):
        wins, sems = scratch[:NB], scratch[NB:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        def window(k):
            """Aligned (16, 40, 256) pyramid window around block k's
            base MV (origin one pel beyond the widest candidate)."""
            bxi = j * NB + k
            ibx = bxi * B + REF_PAD + mv_ref[0, bxi, 0] - (R + 1)
            iby = i * B + REF_PAD + mv_ref[0, bxi, 1] - (R + 1)
            iyb = (iby // 8) * 8
            ixb = (ibx // 128) * 128
            cp = pltpu.make_async_copy(
                pyr_ref.at[pl.ds(0, 16),
                           pl.ds(pl.multiple_of(iyb, 8), WROWS),
                           pl.ds(pl.multiple_of(ixb, 128), 256)],
                wins[k], sems[k])
            return cp, iby - iyb, ibx - ixb

        # issue ALL 8 block DMAs up front: per-block HBM->VMEM latency
        # (the kernel's dominant cost — 32k blocks at 4K) overlaps the
        # SAD compute of earlier blocks instead of serializing with it
        cps = [window(k) for k in range(NB)]
        for cp, _, _ in cps:
            cp.start()
        for k in range(NB):
            bxi = j * NB + k
            basex = mv_ref[0, bxi, 0]
            basey = mv_ref[0, bxi, 1]
            cur = cur_ref[:, k * B:(k + 1) * B].astype(I32)
            cp, remy, remx = cps[k]
            cp.wait()
            win = wins[k]

            # ---- stage 1: two-step full-pel on the integer plane ----
            # mirrors kernels.me.refine_search_ref: a stride-2 3x3 then
            # a stride-1 3x3 (18 SADs for the +-3 reach; same candidate
            # order and strict-< tie-breaks as the oracle)
            v0 = win[0].astype(I32)
            v0 = pltpu.roll(v0, (256 - remx) % 256, 1)
            u0 = _row_select(v0, remy, WROWS, 2 * R + 2 + B)  # rows iby..

            def argmin_deltas(deltas, sad_of):
                best = None
                idx = None
                for di, (dx, dy) in enumerate(deltas):
                    sad = sad_of(dx, dy)
                    if best is None:
                        best, idx = sad, jnp.zeros((), I32)
                    else:
                        better = sad < best
                        best = jnp.where(better, sad, best)
                        idx = jnp.where(better, di, idx)
                ax = jnp.zeros((), I32)
                ay = jnp.zeros((), I32)
                for di, (dx, dy) in enumerate(deltas):
                    ax = jnp.where(idx == di, dx, ax)
                    ay = jnp.where(idx == di, dy, ay)
                return ax, ay

            bixA, biyA = argmin_deltas(
                _REF_DELTAS_A,
                lambda dx, dy: jnp.sum(jnp.abs(
                    cur - u0[R + 1 + dy:R + 1 + dy + B,
                             R + 1 + dx:R + 1 + dx + B])))
            # stage 1b window: rows [R+biyA ..) by 3-way select, cols
            # left-shifted by bixA+2 so the 3x3 slices become static
            uB = u0[R - 2:R - 2 + B + 2]
            for v in (0, 2):
                uB = jnp.where(biyA == v, u0[R + v:R + v + B + 2], uB)
            uB = pltpu.roll(uB, (256 - (bixA + 2) % 256) % 256, 1)
            bxB, byB = argmin_deltas(
                _REF_DELTAS_B,
                lambda dx, dy: jnp.sum(jnp.abs(
                    cur - uB[1 + dy:1 + dy + B,
                             R - 1 + dx:R - 1 + dx + B])))
            bix = bixA + bxB
            biy = biyA + byB

            # ---- stage 2: 25 quarter-pel SADs around the winner ----
            # all 16 subplanes share remx/remy/biy: roll and row-select
            # the (16, rows, 256) stack JOINTLY — 2 rolls + 13 selects
            # total instead of per-plane loops (the kernel is bound by
            # per-block instruction count, not DMA bytes)
            rowsh = remy + R + biy                    # in [remy, remy+2R]
            v3 = win[:].astype(I32)                   # (16, WROWS, 256)
            v3 = pltpu.roll(v3, (256 - remx) % 256, 2)
            v3 = pltpu.roll(v3, (256 - ((R + bix) % 256)) % 256, 2)
            u3 = v3[:, 0:2 * R + 8 + B + 2, :]
            sel3 = u3[:, 0:B + 2, :]
            for r in range(1, 2 * R + 8):
                sel3 = jnp.where(rowsh == r, u3[:, r:r + B + 2, :],
                                 sel3)                # rows [iby+R+biy..]
            best2 = None
            bq = None
            for di, (dx, dy) in enumerate(_QP_DELTAS):
                f = (dy & 3) * 4 + (dx & 3)
                oy = 1 + (dy >> 2)
                ox = 1 + (dx >> 2)
                p = sel3[f, oy:oy + B, ox:ox + B]
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
                  pl.BlockSpec((ME_BLOCK, NB * ME_BLOCK),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bxp, 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((16, WROWS, 256), jnp.uint8)] * NB
                        + [pltpu.SemaphoreType.DMA] * NB),
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
    bxp = _pad_to(bx, REFINE_NB)
    wneed = _pad_to(bxp * ME_BLOCK + REF_PAD + (REF_PAD - 8), 128) + 256
    hp = by * ME_BLOCK + 2 * REF_PAD + 48
    out = _refine2_call(by, bxp, hp, wneed, interpret)(cur, base,
                                                       pyramid)
    return out[:, :bx, :]
