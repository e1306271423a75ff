"""10-bit depth support (SURVEY.md §8; C2 bit_depth).

The XLA scan paths carry the full depth (HM-style shift schedule:
transform_shift = 15 - bd - log2 s, deblock beta/tc << (bd-8), SAO
bands over the sample range); the Pallas kernels are 8-bit and the
implementation selectors fall back to the scans for bd > 8.
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, to_bit_depth

W, H = 96, 64


def _frames(n=3, seed=21):
    return [to_bit_depth(f, 10)
            for f in synthetic_clip(W, H, n, kind="mixed", seed=seed)]


def _roundtrip(cfg, frames):
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.bit_depth == 10
    for a, b in zip(res.recon, dec):
        assert frame_md5(a) == frame_md5(b)
        assert b.y.dtype == np.uint16
    return res, dec


def test_10bit_all_intra_roundtrip():
    frames = _frames(2)
    res, dec = _roundtrip(CodecConfig(width=W, height=H, qp=32,
                                      bit_depth=10), frames)
    # recon must actually use the 10-bit range
    assert max(int(f.y.max()) for f in dec) > 255
    psnr = float(np.mean(res.psnr_y(W, H, 1023)))
    assert psnr > 38.0


def test_10bit_full_toolchain_roundtrip():
    frames = _frames(2)
    _roundtrip(CodecConfig(width=W, height=H, qp=32, bit_depth=10,
                           profile=Profile.VVC, mts=True, pdpc=True,
                           rdoq=True, transform_skip=True,
                           deblock=True, sao=True, sao_chroma=True,
                           alf=True, alf_chroma=True), frames)


def test_10bit_ra_b_roundtrip():
    frames = _frames(5)
    _roundtrip(CodecConfig(width=W, height=H, qp=32, bit_depth=10,
                           intra_period=4, gop_size=4, deblock=True,
                           sao=True, rdoq=True), frames)


def test_10bit_lossless_exact():
    frames = _frames(2)
    cfg = CodecConfig(width=W, height=H, bit_depth=10, lossless=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for a, b in zip(frames, dec):
        assert (a.y == b.y).all() and (a.cb == b.cb).all() \
            and (a.cr == b.cr).all()


def test_10bit_vs_8bit_quality():
    """Same content at both depths: the 10-bit encode must beat the
    8-bit one on 10-bit-referenced PSNR (it carries the extra 2 LSBs)."""
    f8 = synthetic_clip(W, H, 1, kind="gradient", seed=3)
    f10 = [to_bit_depth(f, 10) for f in f8]
    r8 = Encoder(CodecConfig(width=W, height=H, qp=22)).encode(f8)
    r10 = Encoder(CodecConfig(width=W, height=H, qp=22,
                              bit_depth=10)).encode(f10)
    # compare both recons against the 10-bit source
    up = to_bit_depth(r8.recon[0], 10)
    e8 = np.mean((up.y.astype(np.int64)
                  - f10[0].y.astype(np.int64)) ** 2)
    e10 = np.mean((r10.recon[0].y.astype(np.int64)
                   - f10[0].y.astype(np.int64)) ** 2)
    assert e10 < e8


def test_bit_depth_rejected_values():
    with pytest.raises(ValueError):
        CodecConfig(width=W, height=H, bit_depth=12)
