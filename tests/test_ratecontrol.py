"""C17 gates: rate control steers bitrate toward a target; streams stay
decodable and bit-exact."""

import numpy as np

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.utils.ratecontrol import RateControlState, make_controller


def test_controller_dynamics():
    rc = RateControlState(target_bits_per_frame=1000, qp=32,
                          qp_min=26, qp_max=38)
    # consistently too many bits -> qp rises
    for _ in range(6):
        rc.update(4000)
    assert rc.qp > 32
    # consistently too few -> qp falls back
    for _ in range(12):
        rc.update(100)
    assert rc.qp < 38


def test_rc_end_to_end():
    frames = synthetic_clip(96, 64, 6, kind="mixed", seed=55)
    cfg = CodecConfig(width=96, height=64, qp=30, intra_period=3)
    ref = Encoder(cfg).encode(frames)
    ref_bits = sum(ref.frame_bits) / len(frames)

    rc = make_controller(cfg, bitrate_kbps=ref_bits * 0.5 * 30 / 1000,
                         fps=30.0)
    res = Encoder(cfg, rate_control=rc).encode(frames)
    got_bits = sum(res.frame_bits) / len(frames)
    # rc run lands meaningfully below the fixed-qp run
    assert got_bits < ref_bits * 0.9
    # and the adaptive-QP stream decodes bit-exactly
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
