"""Integration gates (SURVEY.md §4, BASELINE.json:7 config 1):

1. encode -> decode round trip is BIT-EXACT (encoder recon == decoder out)
2. lossless mode: decoded picture == input exactly
3. wavefront entropy segments produce identical reconstruction
4. RD sanity: PSNR behaves monotonically with QP
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, preset_cfg1
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, synthetic_frame


def _roundtrip(cfg, frames):
    res = Encoder(cfg).encode(frames)
    cfg2, dec_frames = Decoder().decode(res.bitstream)
    assert len(dec_frames) == len(frames)
    for r, d in zip(res.recon, dec_frames):
        assert frame_md5(r) == frame_md5(d), "encode/decode recon mismatch"
    return res, dec_frames


def test_roundtrip_bit_exact_small():
    cfg = CodecConfig(width=96, height=64, qp=32)
    frames = synthetic_clip(96, 64, 2, kind="mixed")
    res, dec = _roundtrip(cfg, frames)
    p = dec[0].psnr(frames[0])
    assert p[0] > 30.0


def test_roundtrip_noise_content():
    cfg = CodecConfig(width=96, height=64, qp=37)
    frames = [synthetic_frame(96, 64, kind="noise", seed=5)]
    _roundtrip(cfg, frames)


def test_lossless_exact():
    cfg = CodecConfig(width=96, height=64, lossless=True)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=3)]
    res, dec = _roundtrip(cfg, frames)
    assert frame_md5(dec[0]) == frame_md5(frames[0])


def test_segments_identical_recon():
    base = CodecConfig(width=96, height=64, qp=32)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=1)]
    _, dec1 = _roundtrip(base, frames)
    _, dec2 = _roundtrip(base.replace(rows_per_segment=1), frames)
    assert frame_md5(dec1[0]) == frame_md5(dec2[0])


def test_config1_416x240():
    cfg = preset_cfg1()
    frames = [synthetic_frame(416, 240, kind="mixed")]
    res, dec = _roundtrip(cfg, frames)
    p = dec[0].psnr(frames[0])
    assert p[0] > 33.0
    # and lossless at the driver config-1 size
    resL, decL = _roundtrip(cfg.replace(lossless=True), frames)
    assert frame_md5(decL[0]) == frame_md5(frames[0])


def test_qp_monotonic():
    frames = [synthetic_frame(96, 64, kind="mixed", seed=2)]
    stats = []
    for qp in (22, 32, 42):
        cfg = CodecConfig(width=96, height=64, qp=qp)
        res, dec = _roundtrip(cfg, frames)
        stats.append((len(res.bitstream), dec[0].psnr(frames[0])[0]))
    bits = [s[0] for s in stats]
    psnr = [s[1] for s in stats]
    assert bits[0] > bits[1] > bits[2]
    assert psnr[0] > psnr[1] > psnr[2]


def test_batched_equals_serial():
    # vmapped frame batching must not change a single bit
    cfg = CodecConfig(width=96, height=64, qp=32)
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=60)
    a = Encoder(cfg, batch_frames=4).encode(frames)
    b = Encoder(cfg, batch_frames=1).encode(frames)
    assert a.bitstream == b.bitstream
