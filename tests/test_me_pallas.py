"""Pallas ME kernels vs the XLA reference paths (bit-exact).

warp_frames must equal per-block mc_block gathers; frac_refine must
equal me.fractional_refine (same candidate order/tie-breaks); and the
P-picture mode decision must be IDENTICAL with and without the Pallas
warp path (it only changes how predictions are fetched).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from x266_tpu.config import CodecConfig
from x266_tpu.engine import fused
from x266_tpu.engine.inter import make_mode_decision_p_raw
from x266_tpu.engine.mode_decision import pad_plane
from x266_tpu.kernels import interp, me
from x266_tpu.kernels.me_pallas import refine_search, warp_frames


def _pyr(w, h, seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    return jax.jit(lambda p: interp.build_pyramid(interp.pad_ref(p)))(
        jnp.asarray(y)), y


def test_warp_frames_match_mc_block():
    w, h = 160, 96
    pyr, _ = _pyr(w, h, 1)
    by, bx = h // 16, w // 16
    rng = np.random.default_rng(2)
    mvs = rng.integers(-64, 65, (3, by, bx, 2)).astype(np.int32)

    frames = np.asarray(warp_frames(pyr, jnp.asarray(mvs), h, w))
    for t in range(3):
        for i in range(by):
            for j in range(bx):
                ref = np.asarray(interp.mc_block(
                    pyr, j * 16, i * 16, int(mvs[t, i, j, 0]),
                    int(mvs[t, i, j, 1]), 16))
                got = frames[t, i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
                assert (got == ref).all(), (t, i, j)


def test_refine_search_matches_reference():
    """Combined +-3 full-pel / +-2 qpel refinement: Pallas == XLA
    (same candidate order and tie-breaks)."""
    w, h = 160, 96
    pyr, ref_y = _pyr(w, h, 3)
    rng = np.random.default_rng(4)
    cur = jnp.asarray(np.clip(
        np.roll(ref_y, (1, -2), (0, 1))
        + rng.integers(-9, 10, (h, w)), 0, 255).astype(np.int32))
    by, bx = h // 16, w // 16
    base = jnp.asarray(rng.integers(-10, 11, (by, bx, 2))
                       .astype(np.int32))

    a = np.asarray(me.refine_search_ref(cur, pyr, base))
    b = np.asarray(refine_search(cur, pyr, base))
    assert (a == b).all(), np.argwhere(a != b)[:5]


@pytest.mark.parametrize("maxcu", [16, 32])
def test_mode_decision_p_warp_identical(maxcu):
    cfg = CodecConfig(width=112, height=80, qp=31, intra_period=8,
                      max_cu_size=maxcu)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:80, 0:112]
    y0 = np.clip((xx * 2 + yy) % 256
                 + rng.integers(-15, 16, (80, 112)), 0, 255
                 ).astype(np.uint8)
    yr = np.roll(y0, (2, -3), (0, 1))
    pyr = jax.jit(lambda p: interp.build_pyramid(
        interp.pad_ref(p.astype(jnp.int32))))(jnp.asarray(yr))
    yP = pad_plane(y0).astype(np.int32)

    a = jax.jit(make_mode_decision_p_raw(cfg, use_pallas=False))(yP, pyr)
    b = jax.jit(make_mode_decision_p_raw(cfg, use_pallas=True))(yP, pyr)
    for n, x, z in zip(["size", "mode", "pred", "mvx", "mvy"], a, b):
        assert (np.asarray(x) == np.asarray(z)).all(), n
