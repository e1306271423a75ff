"""Motion-compensation interpolation (C7) [STD-shaped], TPU-first.

Quarter-pel prediction as a PRECOMPUTED 16-plane pyramid: the reference
picture is edge-padded and filtered once per frame with the separable
8-tap (luma) / 4-tap (chroma) filters into planes indexed by
(frac_y*4 + frac_x); motion compensation and fractional motion estimation
then become integer-offset gathers into the pyramid — dense separable
convolutions once per frame instead of per-block filtering, the natural
TPU formulation.  The pyramid IS the normative interpolation: encoder MC,
decoder MC and encoder ME all read the same planes, so inter prediction
is bit-exact by construction.

Filters are the HEVC 8-tap luma / 4-tap chroma sets [STD]; x266t uses
quarter-pel for chroma as well (luma MV / 2 rounded to quarter units —
documented deviation from HEVC's eighth-pel chroma).

Scaling: out = clip((f_v . (f_h . p)) + 2048) >> 12, 0..255) — one
rounding stage, exact int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# HEVC luma 8-tap interpolation filters, fracs 0..3 (quarter-pel) [STD].
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# HEVC chroma 4-tap filters at eighth-pel positions 0,2,4,6 [STD]
# (x266t chroma MVs are quarter-pel, so only even eighth positions).
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-4, 54, 16, -2],
    [-4, 36, 36, -4],
    [-2, 16, 54, -4],
], dtype=np.int32)

REF_PAD = 80    # edge-replication padding of reference planes


def pad_ref(plane: np.ndarray | jnp.ndarray, xp=jnp) -> jnp.ndarray:
    """Edge-replicate pad a picture plane by REF_PAD on all sides."""
    return xp.pad(plane, ((REF_PAD, REF_PAD), (REF_PAD, REF_PAD)),
                  mode="edge")


def _filter_axis(p: jnp.ndarray, taps: np.ndarray, axis: int
                 ) -> jnp.ndarray:
    """Apply an n-tap FIR along axis (int32, no shift).  Tap k reads
    offset k - (n//2 - 1), i.e. taps[n//2-1] is the zero-phase tap."""
    n = len(taps)
    c = n // 2 - 1
    acc = jnp.zeros_like(p)
    for k in range(n):
        acc = acc + int(taps[k]) * jnp.roll(p, c - k, axis=axis)
    return acc


def build_pyramid(plane: jnp.ndarray, chroma: bool = False,
                  max_val: int = 255) -> jnp.ndarray:
    """Padded reference plane (int32) -> (16, H', W') uint8/uint16
    pyramid (dtype follows max_val).

    Index f = frac_y*4 + frac_x; plane 0 is the (clipped) integer plane.
    """
    filters = CHROMA_FILTERS if chroma else LUMA_FILTERS
    dt = jnp.uint8 if max_val <= 255 else jnp.uint16
    p = plane.astype(jnp.int32)
    planes = []
    for fy in range(4):
        v = _filter_axis(p, filters[fy], axis=0)      # scale 64
        for fx in range(4):
            hv = _filter_axis(v, filters[fx], axis=1)  # scale 4096
            out = jnp.clip((hv + 2048) >> 12, 0, max_val)
            planes.append(out.astype(dt))
    return jnp.stack(planes)


def mc_block(pyramid: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
             mv_x: jnp.ndarray, mv_y: jnp.ndarray, size: int
             ) -> jnp.ndarray:
    """Motion-compensated (size, size) int32 prediction.

    x0, y0: block position in picture coords; mv in quarter-pel units.
    The pyramid is over the REF_PAD-padded plane, so the gather offset is
    x0 + REF_PAD + (mv >> 2) with plane (mv & 3).
    """
    fx = mv_x & 3
    fy = mv_y & 3
    ix = x0 + REF_PAD + (mv_x >> 2)
    iy = y0 + REF_PAD + (mv_y >> 2)
    f = fy * 4 + fx
    blk = jax.lax.dynamic_slice(pyramid, (f, iy, ix), (1, size, size))[0]
    return blk.astype(jnp.int32)


@functools.cache
def make_pyramids(cfg):
    """jit: (recon_y u8, recon_cb u8, recon_cr u8) -> pyramids (device-
    resident DPB entry): luma (16, H+2P, W+2P), chroma 2x (16, ...)."""

    mv = cfg.max_val

    def run(y, cb, cr):
        py = build_pyramid(pad_ref(y.astype(jnp.int32)), False, mv)
        pcb = build_pyramid(pad_ref(cb.astype(jnp.int32)), True, mv)
        pcr = build_pyramid(pad_ref(cr.astype(jnp.int32)), True, mv)
        return py, pcb, pcr

    return jax.jit(run)


def mv_bounds(cfg, size: int) -> int:
    """Max |mv| in quarter-pel units such that every gather (including
    the implicit filter support already baked into the pyramid) stays
    inside the padded plane."""
    return 4 * (REF_PAD - 8)
