"""Reference-frame halo exchange (P4; SURVEY.md §2.2 P4, BASELINE.json:5).

Tile bands own disjoint CTU-row ranges of one picture.  Intra prediction,
entropy and loop filters are band-local by tile semantics, but INTER
prediction reads the previous pictures' reconstruction beyond the band:
the hierarchical ME window reaches +-(SEARCH_R + REFINE_R) full-pel plus
one quarter-pel step, and the 8-tap interpolation adds 4 rows of
support, so a band's reference region is its own rows +- HALO_Y.

Two halo sources, guaranteed to produce identical extended planes:

  * ``exchange_bands`` — jax.lax.ppermute strips between tile-band
    neighbors inside shard_map (ICI collectives on real hardware);
  * ``extend_band`` — clamped row slices of the full reference frame
    (the serial oracle, and the single-device tiled path).

Geometry invariant that keeps every MC/ME kernel unchanged:
``kernels.interp.mc_block`` gathers at (y0 + REF_PAD + (mv >> 2)) into a
pyramid built from a REF_PAD-edge-padded plane.  ``build_ext_pyramids``
pads the halo-extended band by (REF_PAD - HALO) instead of REF_PAD, so
band row 0 sits at padded row REF_PAD exactly — the geometry of a
whole-frame pyramid for a frame of the band's height — with real
neighbor pixels where a band-only pyramid would carry replicated edges.
Every gather a bounded MV can reach therefore returns the same samples
as a full-frame pyramid, which is what makes sharded-tiled and
serial-tiled encodes bit-identical (tests/test_halo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from x266_tpu.kernels.interp import REF_PAD

# Luma halo rows carried per band side.  Lower bound (see min_halo):
# SEARCH_R(16) + REFINE_R(3) + 1 quarter-pel + 4 filter-support = 24.
HALO_Y = 32
HALO_C = HALO_Y // 2


def min_halo() -> int:
    """Smallest luma halo that covers every reference gather."""
    from x266_tpu.kernels import me as kme

    return kme.SEARCH_R + kme.REFINE_R + 1 + 4


def extend_band(plane, y0, bh: int, halo: int):
    """Full-frame plane -> (halo + bh + halo, W) extended band.

    y0 may be a traced scalar (one compiled band step serves every band
    of the same height).  Row indices clamp to the frame, so frame-edge
    bands replicate the outermost row — exactly what exchange_bands
    produces there.
    """
    h = plane.shape[0]
    rows = jnp.clip(y0 + jnp.arange(-halo, bh + halo), 0, h - 1)
    return jnp.take(plane, rows, axis=0)


def exchange_bands(plane, halo: int, axis_name: str, n: int):
    """Band plane (bh, W) -> extended (halo + bh + halo, W).

    Neighbor strips travel as two ppermute shifts along the tile axis
    (down-shift for the rows above the band, up-shift for the rows
    below); the picture's first/last band replicate their own edge row,
    matching extend_band's clamping.
    """
    w = plane.shape[1]
    top_fill = jnp.broadcast_to(plane[0:1], (halo, w))
    bot_fill = jnp.broadcast_to(plane[-1:], (halo, w))
    if n == 1:
        return jnp.concatenate([top_fill, plane, bot_fill], axis=0)
    idx = jax.lax.axis_index(axis_name)
    from_above = jax.lax.ppermute(
        plane[-halo:], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        plane[:halo], axis_name, [(i + 1, i) for i in range(n - 1)])
    above = jnp.where(idx > 0, from_above, top_fill)
    below = jnp.where(idx < n - 1, from_below, bot_fill)
    return jnp.concatenate([above, plane, below], axis=0)


def extend_rect(plane, y0, x0, bh: int, bw: int, halo_y: int,
                halo_x: int):
    """Full-frame plane -> 2-D halo-extended rect
    (halo_y + bh + halo_y, halo_x + bw + halo_x).

    The 2-D analog of extend_band: row AND column indices clamp to the
    frame, so frame-edge rects replicate the outermost samples exactly
    like the ppermute exchange does (exchange_rect)."""
    h, w = plane.shape
    rows = jnp.clip(y0 + jnp.arange(-halo_y, bh + halo_y), 0, h - 1)
    cols = jnp.clip(x0 + jnp.arange(-halo_x, bw + halo_x), 0, w - 1)
    return jnp.take(jnp.take(plane, rows, axis=0), cols, axis=1)


def exchange_cols(plane, halo: int, axis_name: str, n: int):
    """Column analog of exchange_bands: rect plane (H, bw) ->
    (H, halo + bw + halo) with real left/right neighbor strips."""
    h = plane.shape[0]
    left_fill = jnp.broadcast_to(plane[:, 0:1], (h, halo))
    right_fill = jnp.broadcast_to(plane[:, -1:], (h, halo))
    if n == 1:
        return jnp.concatenate([left_fill, plane, right_fill], axis=1)
    idx = jax.lax.axis_index(axis_name)
    from_left = jax.lax.ppermute(
        plane[:, -halo:], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        plane[:, :halo], axis_name, [(i + 1, i) for i in range(n - 1)])
    left = jnp.where(idx > 0, from_left, left_fill)
    right = jnp.where(idx < n - 1, from_right, right_fill)
    return jnp.concatenate([left, plane, right], axis=1)


def exchange_rect(plane, halo_y: int, halo_x: int, axis_y: str,
                  axis_x: str, ny: int, nx: int):
    """Rect plane (bh, bw) on a 2-D (axis_y, axis_x) mesh ->
    (halo_y + bh + halo_y, halo_x + bw + halo_x) extension.

    Two phases: rows travel along axis_y first, then COLUMNS OF THE
    ROW-EXTENDED plane travel along axis_x — the second hop carries the
    diagonal corner blocks for free (each left/right strip already
    contains its sender's up/down halo rows).  Identical to
    extend_rect's clamped slices (tests/test_tiles2d.py)."""
    ext_rows = exchange_bands(plane, halo_y, axis_y, ny)
    return exchange_cols(ext_rows, halo_x, axis_x, nx)


def build_ext_pyramids(ext_y, ext_cb, ext_cr,
                       halo_y: int = HALO_Y, halo_c: int = HALO_C,
                       halo_x: int = 0, halo_xc: int | None = None):
    """Halo-extended band planes -> (pyr_y, pyr_cb, pyr_cr).

    Output shapes equal fused._build_pyramids_device's for the bare
    band (the REF_PAD budget absorbs the halo), so the fused P/B steps
    and the Pallas MC/ME kernels consume them unchanged.  halo_x > 0
    is the 2-D tile-rect case: the same geometry invariant holds per
    axis (rect sample (0, 0) sits at padded (REF_PAD, REF_PAD))."""
    from x266_tpu.engine.fused import _pyr_target
    from x266_tpu.kernels import interp as kinterp

    if halo_xc is None:
        halo_xc = halo_x // 2
    bh = ext_y.shape[0] - 2 * halo_y
    w = ext_y.shape[1] - 2 * halo_x

    def one(ext, halo, hx, chroma, h, ww):
        v = REF_PAD - halo
        vx = REF_PAD - hx
        padded = jnp.pad(ext.astype(jnp.int32),
                         ((v, v), (vx, vx)), mode="edge")
        p = kinterp.build_pyramid(padded, chroma)
        hp, wp = _pyr_target(h, ww)
        return jnp.pad(p, ((0, 0), (0, max(0, hp - p.shape[1])),
                           (0, max(0, wp - p.shape[2]))))

    return (one(ext_y, halo_y, halo_x, False, bh, w),
            one(ext_cb, halo_c, halo_xc, True, bh // 2, w // 2),
            one(ext_cr, halo_c, halo_xc, True, bh // 2, w // 2))
