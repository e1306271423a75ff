"""M2/config-2 gates: VVC profile — 67 intra modes + MTS (C6/C10)."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.specmodel import intra as sintra
from tests.test_syntax import random_maps


def test_67mode_geometry_anchors():
    # anchor modes coincide with the 35-mode family: diagonals and pure
    # H/V (the intermediate ladder differs by design in VVC [STD])
    for m35, m67 in ((2, 2), (10, 18), (18, 34), (26, 50), (34, 66)):
        assert sintra.mode_geometry(m35, 35) \
            == sintra.mode_geometry(m67, 67), (m35, m67)
    # the 67-mode ladder is monotone within each quadrant
    angles = [sintra.mode_geometry(m, 67)[1] for m in range(2, 19)]
    assert angles == sorted(angles, reverse=True)     # 32 ... 0
    angles = [sintra.mode_geometry(m, 67)[1] for m in range(34, 51)]
    assert angles == sorted(angles)                   # -32 ... 0
    # odd modes interleave with intermediate angles
    v, a = sintra.mode_geometry(3, 67)
    assert not v and 26 < a < 32


def test_67mode_weight_invariants():
    for size in (4, 8, 32):
        for mode in (0, 1, 2, 17, 18, 33, 34, 35, 49, 50, 51, 66):
            w = sintra.weight_matrix(size, mode, 67)
            assert (w.sum(axis=1)
                    == (1 << sintra.mode_shift(size, mode))).all()


def test_vvc_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=32, profile=Profile.VVC)
    fr = synthetic_frame(96, 64, kind="mixed", seed=6)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.profile == Profile.VVC
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_vvc_mts_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=30, profile=Profile.VVC,
                      mts=True, deblock=True, sao=True)
    fr = synthetic_frame(96, 64, kind="noise", seed=7)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.mts
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_mts_syntax_native_parity():
    if not native_bind.available():
        pytest.skip("no native toolchain")
    cfg = CodecConfig(width=96, height=64, profile=Profile.VVC, mts=True)
    rng = np.random.default_rng(8)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.25, 20)
    mm = (mm * 66 // 34).astype(np.int32)      # spread over 0..66
    mts = rng.integers(0, 5, size=sm.shape).astype(np.int32)
    # make mts quadtree-consistent (constant per CU like the encoder)
    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr,
                       mts_map=mts).encode_segment(0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr, 0,
                                     cfg.ctus_y, None, mts)
    assert nat == py
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, nat,
                               mts_map=dec.mts_map)
    assert (dec.mode_map == mm).all()
    assert (dec.coef["y"] == cy).all()
