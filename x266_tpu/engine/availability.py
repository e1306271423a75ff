"""Coding-order geometry: z-order, reference availability masks (C5/C6).

x266t rule (see specmodel.intra): a reference sample is *unavailable* iff
out of picture or not yet reconstructed in coding order (raster CTUs,
z-order 8x8 units inside a CTU); unavailable samples read 128.  In the
reconstruction scan this is emergent (plane initialized to 128, written in
coding order); for the parallel mode-decision pass the same predicate is
computed here, statically, so RD search sees exactly what the decoder will
reconstruct from.
"""

from __future__ import annotations

import functools

import numpy as np

CTU = 64
UNIT = 8


def z_index(ux: np.ndarray, uy: np.ndarray) -> np.ndarray:
    """Morton index of 8x8 units within a CTU (3 bits each axis)."""
    ux = np.asarray(ux)
    uy = np.asarray(uy)
    z = np.zeros_like(ux)
    for b in range(3):
        z |= ((ux >> b) & 1) << (2 * b)
        z |= ((uy >> b) & 1) << (2 * b + 1)
    return z


def z_deinterleave(z: int) -> tuple[int, int]:
    """z -> (ux, uy) within-CTU unit coords."""
    ux = ((z >> 0) & 1) | (((z >> 2) & 1) << 1) | (((z >> 4) & 1) << 2)
    uy = ((z >> 1) & 1) | (((z >> 3) & 1) << 1) | (((z >> 5) & 1) << 2)
    return ux, uy


def decoded_before(px: np.ndarray, py: np.ndarray,
                   bx: int | np.ndarray, by: int | np.ndarray,
                   width: int, height: int) -> np.ndarray:
    """Is sample (px, py) reconstructed before the block at origin (bx, by)
    begins decoding?  Vectorized over sample arrays."""
    px, py = np.asarray(px), np.asarray(py)
    bx, by = np.asarray(bx), np.asarray(by)
    inside = (px >= 0) & (py >= 0) & (px < width) & (py < height)
    c_p = (py // CTU) * (1 << 20) + (px // CTU)
    c_b = (by // CTU) * (1 << 20) + (bx // CTU)
    zp = z_index((px % CTU) // UNIT, (py % CTU) // UNIT)
    zb = z_index((bx % CTU) // UNIT, (by % CTU) // UNIT)
    return inside & ((c_p < c_b) | ((c_p == c_b) & (zp < zb)))


def _decoded_before_gen(px, py, bx: int, by: int, width: int,
                        height: int, scale: int,
                        btv_leaf: int) -> np.ndarray:
    """Generalized coding-order predicate for reference masks.

    scale=2 evaluates chroma-plane coords against the LUMA coding
    order (chroma TUs ride the same z-scan as their luma CU, coded
    within the same unit).  btv_leaf > 0: the block's enclosing
    btv_leaf-sized (plane-coords) leaf is a BT-V MTT leaf whose
    t-blocks code in x-half-first order (left CU's two stacked TUs,
    then the right CU's) instead of z-order; samples inside that leaf
    compare by the BT-V order, samples outside by the z predicate at
    unit granularity (z-order is hierarchical, so whole-leaf
    comparisons agree with it).
    """
    px, py = np.asarray(px), np.asarray(py)
    base = decoded_before(px * scale, py * scale, bx * scale,
                          by * scale, width, height)
    if not btv_leaf:
        return base
    lf = btv_leaf
    lx, ly = (bx // lf) * lf, (by // lf) * lf
    inside = ((px >= lx) & (px < lx + lf) & (py >= ly) & (py < ly + lf)
              & (px >= 0) & (py >= 0))
    t = lf // 2
    # BT-V order id: left half's TUs top->bottom, then right half's
    oid = 2 * ((px - lx) // t) + ((py - ly) // t)
    bid = 2 * ((bx - lx) // t) + ((by - ly) // t)
    return np.where(inside, oid < bid, base)


@functools.cache
def ref_masks(width: int, height: int, size: int, scale: int = 1,
              btv_leaf: int = 0) -> np.ndarray:
    """(grid_y, grid_x, R) bool: availability of each reference-vector
    entry for every size-aligned block of the (width//scale,
    height//scale) plane (True = really-reconstructed sample, False =
    reads mid-gray / substituted).  Grid dims are
    ceil(plane_h/size) x ceil(plane_w/size).  See _decoded_before_gen
    for scale (chroma) and btv_leaf (MTT BT-V order) semantics.
    """
    s = size
    pw, ph = width // scale, height // scale
    gy = -(-ph // s)
    gx = -(-pw // s)
    r = 4 * s + 1
    masks = np.zeros((gy, gx, r), dtype=bool)
    ks = np.arange(2 * s)
    for iy in range(gy):
        for ix in range(gx):
            x, y = ix * s, iy * s
            masks[iy, ix, 0] = _decoded_before_gen(
                x - 1, y - 1, x, y, width, height, scale, btv_leaf)
            masks[iy, ix, 1:1 + 2 * s] = _decoded_before_gen(
                x + ks, np.full(2 * s, y - 1), x, y, width, height,
                scale, btv_leaf)
            masks[iy, ix, 1 + 2 * s:] = _decoded_before_gen(
                np.full(2 * s, x - 1), y + ks, x, y, width, height,
                scale, btv_leaf)
    return masks


def ref_availability_masks(width: int, height: int, size: int
                           ) -> np.ndarray:
    """Luma z-order masks (the Pass-A / square-CU tables)."""
    return ref_masks(width, height, size)


@functools.cache
def valid_block_grid(width: int, height: int, size: int) -> np.ndarray:
    """(gy, gx) bool: block fully inside the picture."""
    gy = -(-height // size)
    gx = -(-width // size)
    iy, ix = np.mgrid[0:gy, 0:gx]
    return ((ix + 1) * size <= width) & ((iy + 1) * size <= height)
