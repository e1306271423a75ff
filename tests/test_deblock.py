"""C13 unit + integration tests for the deblocking filter."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.kernels import deblock as db


def _rand_maps(uy, ux, seed=0):
    rng = np.random.default_rng(seed)
    sm = np.full((uy, ux), 8, dtype=np.int32)
    # drop some aligned 16/32 blocks in
    for y in range(0, uy - 1, 2):
        for x in range(0, ux - 1, 2):
            if rng.random() < 0.4:
                sm[y:y + 2, x:x + 2] = 16
    for y in range(0, uy - 3, 4):
        for x in range(0, ux - 3, 4):
            if rng.random() < 0.3:
                sm[y:y + 4, x:x + 4] = 32
    return sm


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_jax_matches_numpy(qp):
    rng = np.random.default_rng(qp)
    h, w = 64, 96
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    sm = _rand_maps(h // 8, w // 8, qp)
    want = db.deblock_picture(y, cb, cr, sm, qp, xp=np)
    got = db.deblock_picture(*(a for a in (y, cb, cr)), sm, qp)
    for a, b in zip(want, got):
        assert (np.asarray(b) == a).all()


def test_flat_image_unchanged():
    h, w = 64, 64
    y = np.full((h, w), 77, dtype=np.int32)
    cb = np.full((h // 2, w // 2), 128, dtype=np.int32)
    cr = cb.copy()
    sm = np.full((h // 8, w // 8), 8, dtype=np.int32)
    yf, cbf, crf = db.deblock_picture(y, cb, cr, sm, 37, xp=np)
    assert (yf == 77).all() and (cbf == 128).all()


def test_blocking_edge_smoothed():
    # hard step at a CU boundary gets attenuated at moderate QP
    h, w = 64, 64
    y = np.zeros((h, w), dtype=np.int32)
    y[:, :32] = 100
    y[:, 32:] = 108
    sm = np.full((h // 8, w // 8), 32, dtype=np.int32)
    yf, _, _ = db.deblock_picture(
        y, np.full((32, 32), 128), np.full((32, 32), 128), sm, 37, xp=np)
    step_before = abs(int(y[5, 32]) - int(y[5, 31]))
    step_after = abs(int(yf[5, 32]) - int(yf[5, 31]))
    assert step_after < step_before
    # interior of CUs untouched away from edges
    assert (yf[:, :28] == 100).all()


def test_interior_tu_lines_not_filtered():
    # inside a 32x32 CU the 8-aligned lines are NOT CU boundaries
    h, w = 64, 64
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    sm = np.full((h // 8, w // 8), 32, dtype=np.int32)
    mask = db.luma_edge_mask(sm)
    assert mask[:, 4].all() and not mask[:, 1].any() \
        and not mask[:, 2].any() and not mask[:, 3].any()


def test_roundtrip_with_deblock():
    cfg = CodecConfig(width=96, height=64, qp=35, deblock=True)
    fr = synthetic_frame(96, 64, kind="mixed", seed=9)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.deblock
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])
    # deblocking must actually change the output vs deblock=off
    res2 = Encoder(cfg.replace(deblock=False)).encode([fr])
    assert frame_md5(res.recon[0]) != frame_md5(res2.recon[0])
