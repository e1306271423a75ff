"""C1/C2 unit tests: bit I/O, Exp-Golomb, RBSP emulation, headers."""

import random

from x266_tpu.config import CodecConfig, Profile, SliceType
from x266_tpu.core.bitio import BitReader, BitWriter
from x266_tpu.core.headers import (SliceHeader, parse_pps, parse_slice_header,
                                   parse_sps, write_pps, write_slice_header,
                                   write_sps)
from x266_tpu.core.nal import (NalType, escape_rbsp, split_nals,
                               unescape_rbsp, write_nal)


def test_u_roundtrip():
    rng = random.Random(0)
    fields = [(rng.randrange(1 << n), n) for n in range(1, 25)
              for _ in range(8)]
    w = BitWriter()
    for v, n in fields:
        w.u(v, n)
    w.align()
    r = BitReader(w.bytes_value())
    for v, n in fields:
        assert r.u(n) == v
    r.align()


def test_ue_se_roundtrip():
    rng = random.Random(1)
    ues = [rng.randrange(0, 100000) for _ in range(500)] + [0, 1, 2, 255]
    ses = [rng.randrange(-50000, 50000) for _ in range(500)] + [0, -1, 1]
    w = BitWriter()
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.align()
    r = BitReader(w.bytes_value())
    for v in ues:
        assert r.ue() == v
    for v in ses:
        assert r.se() == v


def test_rbsp_emulation():
    cases = [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x04", b"\x00\x00\x00\x00\x00", b"",
        bytes(range(256)) * 3,
    ]
    rng = random.Random(2)
    for _ in range(200):
        n = rng.randrange(0, 64)
        cases.append(bytes(rng.choice([0, 0, 0, 1, 2, 3, 255])
                           for _ in range(n)))
    for payload in cases:
        esc = escape_rbsp(payload)
        # No emulation pattern survives in the escaped stream.
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2)
        assert unescape_rbsp(esc) == payload


def test_nal_stream_roundtrip():
    rng = random.Random(3)
    payloads = [
        (NalType.SPS,
         bytes([rng.randrange(256) for _ in range(39)]) + b"\x80"),
        (NalType.PPS, b"\x00\x00\x01\x00\x00\x00\x80"),
        (NalType.IDR, bytes(1000) + b"\x80"),
    ]
    stream = b"".join(write_nal(t, p) for t, p in payloads)
    out = split_nals(stream)
    assert out == payloads
    # RBSPs ending in 0x00 are rejected (ambiguous vs start codes) [STD].
    import pytest
    with pytest.raises(ValueError):
        write_nal(NalType.IDR, b"\x12\x00")


def test_sps_roundtrip():
    for profile in (Profile.HEVC_SUBSET, Profile.VVC):
        cfg = CodecConfig(width=416, height=240, profile=profile,
                          lossless=True, deblock=True, sao=True,
                          mts=(profile == Profile.VVC), rows_per_segment=2)
        cfg2 = parse_sps(write_sps(cfg))
        for f in ("width", "height", "bit_depth", "profile", "ctu_size",
                  "max_cu_size", "lossless", "deblock", "sao", "alf", "mts",
                  "rows_per_segment"):
            assert getattr(cfg2, f) == getattr(cfg, f), f


def test_pps_and_slice_header_roundtrip():
    cfg = CodecConfig(width=416, height=240, qp=37)
    assert parse_pps(write_pps(cfg))["qp"] == 37
    sh = SliceHeader(SliceType.I, poc=5, qp=37, entry_points=[123, 4567])
    rbsp = write_slice_header(sh) + b"payload"
    sh2, off = parse_slice_header(rbsp)
    assert sh2 == sh
    assert rbsp[off:] == b"payload"


def test_y4m_roundtrip(tmp_path):
    from x266_tpu.core.yuv import read_y4m, synthetic_clip, write_y4m

    frames = synthetic_clip(64, 48, 3, kind="mixed", seed=5)
    p = str(tmp_path / "clip.y4m")
    write_y4m(p, frames, fps_num=24, fps_den=1)
    got, params = read_y4m(p)
    assert params == {"width": 64, "height": 48,
                      "fps_num": 24, "fps_den": 1}
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert (a.y == b.y).all() and (a.cb == b.cb).all() \
            and (a.cr == b.cr).all()


def test_vps_roundtrip_and_level():
    from x266_tpu.config import CodecConfig, Profile
    from x266_tpu.core import headers

    cfg = CodecConfig(width=1920, height=1080, profile=Profile.VVC,
                      mts=True, rdoq=True)
    v = headers.parse_vps(headers.write_vps(cfg))
    assert v["profile_idc"] == headers.PROFILE_IDS[Profile.VVC]
    assert v["level_idc"] == 40          # 1080p class
    assert v["max_dpb_pictures"] == 2
    cfg4k = CodecConfig(width=3840, height=2160, rpl=True)
    v4 = headers.parse_vps(headers.write_vps(cfg4k))
    assert v4["level_idc"] == 50 and v4["max_dpb_pictures"] == 4
