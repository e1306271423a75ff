"""Weighted prediction (C7) gates: fade content gains, bit-exact decode
across P / GPB / RA-B paths, header round-trip."""

import numpy as np

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import Frame, synthetic_clip


def _fade(frames, g0=1.0, g1=0.45, off=0.0):
    """Apply a linear luma gain ramp (a fade) to a clip."""
    out = []
    n = len(frames)
    for i, f in enumerate(frames):
        g = g0 + (g1 - g0) * i / max(n - 1, 1)
        y = np.clip(f.y.astype(np.float64) * g + off, 0, 255)
        out.append(Frame(y.astype(np.uint8), f.cb, f.cr))
    return out


def test_wp_fit():
    from x266_tpu.api.encoder import fit_weight

    base = synthetic_clip(64, 64, 2, kind="mixed", seed=3)
    faded = _fade([base[0], base[0]], g0=1.0, g1=0.5)
    wy, oy, wc, oc = fit_weight(faded[1], faded[0])
    assert 28 <= wy <= 36          # ~0.5 gain -> w ~= 32
    ident = fit_weight(base[0], base[0])
    assert ident[0] == 64 and ident[1] == 0


def test_wp_lowdelay_p_gain_and_decode():
    frames = _fade(synthetic_clip(96, 64, 6, kind="mixed", seed=9))
    cfg = CodecConfig(width=96, height=64, qp=30, intra_period=6)
    base = Encoder(cfg).encode(frames)
    wcfg = cfg.replace(weighted_pred=True)
    res = Encoder(wcfg).encode(frames)
    # fades are WP's home turf: fewer bits at >= equal PSNR-never-worse
    # is too strict frame-by-frame, so gate the aggregate
    assert res.total_bits < base.total_bits
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_wp_ra_and_gpb_decode():
    frames = _fade(synthetic_clip(96, 64, 9, kind="mixed", seed=2))
    ra = CodecConfig(width=96, height=64, qp=32, intra_period=8,
                     gop_size=4, weighted_pred=True)
    res = Encoder(ra).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)

    gpb = CodecConfig(width=96, height=64, qp=32, intra_period=9,
                      multi_ref=True, weighted_pred=True)
    res = Encoder(gpb).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_wp_header_roundtrip():
    from x266_tpu.config import SliceType
    from x266_tpu.core.headers import (SliceHeader, parse_slice_header,
                                       parse_sps, write_slice_header,
                                       write_sps)

    cfg = CodecConfig(width=96, height=64, weighted_pred=True)
    assert parse_sps(write_sps(cfg)).weighted_pred is True
    sh = SliceHeader(SliceType.B, poc=3, qp=30, entry_points=[],
                     wp=[70, -3, 64, 2, 58, 0, 64, -1])
    got, _ = parse_slice_header(write_slice_header(sh), has_wp=True)
    assert got.wp == sh.wp
    shp = SliceHeader(SliceType.P, poc=1, qp=30, entry_points=[],
                      wp=[40, 10, 64, 0])
    got, _ = parse_slice_header(write_slice_header(shp), has_wp=True)
    assert got.wp == shp.wp
