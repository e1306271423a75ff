"""Sign-data hiding (C11) gates: device parity enforcement, walker
round-trips in both languages, end-to-end bit-exact decode, bits win."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder, tu_scan
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from tests.test_syntax import random_maps


def _enforce_parity(cfg, sm, cy, ccb, ccr):
    """Apply kernels.quant.sdh_adjust per aligned TU so random maps
    satisfy the parity invariant the device quantizer guarantees."""
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import sdh_adjust

    for uy in range(cfg.units_y):
        for ux in range(cfg.units_x):
            s = int(sm[uy, ux])
            if (ux % (s // 8)) or (uy % (s // 8)):
                continue
            x, y = ux * 8, uy * 8
            cy[y:y + s, x:x + s] = np.asarray(sdh_adjust(
                jnp.asarray(cy[y:y + s, x:x + s]), s))
            cs = s // 2
            xc, yc = x // 2, y // 2
            ccb[yc:yc + cs, xc:xc + cs] = np.asarray(sdh_adjust(
                jnp.asarray(ccb[yc:yc + cs, xc:xc + cs]), cs))
            ccr[yc:yc + cs, xc:xc + cs] = np.asarray(sdh_adjust(
                jnp.asarray(ccr[yc:yc + cs, xc:xc + cs]), cs))
    return cy, ccb, ccr


def test_sdh_walker_roundtrip_python():
    cfg = CodecConfig(width=128, height=64, sign_data_hiding=True)
    rng = np.random.default_rng(11)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.35, 40)
    cy, ccb, ccr = _enforce_parity(cfg, sm, cy, ccb, ccr)
    data = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr).encode_segment(
        0, cfg.ctus_y)
    dec = SyntaxDecoder(cfg)
    dec.decode_segment(data, 0, cfg.ctus_y)
    assert (dec.coef["y"] == cy).all()
    assert (dec.coef["cb"] == ccb).all()
    assert (dec.coef["cr"] == ccr).all()
    # hiding saves bits vs the same maps without SDH
    plain = SyntaxEncoder(cfg.replace(sign_data_hiding=False),
                          sm, mm, cy, ccb, ccr).encode_segment(
        0, cfg.ctus_y)
    assert len(data) < len(plain)


@pytest.mark.skipif(not native_bind.available(),
                    reason="no native toolchain")
def test_sdh_native_matches_python():
    cfg = CodecConfig(width=128, height=64, sign_data_hiding=True)
    rng = np.random.default_rng(5)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.25, 30)
    cy, ccb, ccr = _enforce_parity(cfg, sm, cy, ccb, ccr)
    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr).encode_segment(
        0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr,
                                     0, cfg.ctus_y)
    assert nat == py
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, nat)
    assert (dec.coef["y"] == cy).all()
    assert (dec.coef["cb"] == ccb).all()
    assert (dec.coef["cr"] == ccr).all()


def test_sdh_end_to_end_intra():
    frames = synthetic_clip(96, 64, 3, kind="mixed", seed=21)
    cfg = CodecConfig(width=96, height=64, qp=28,
                      sign_data_hiding=True, rdoq=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    assert len(dec) == len(frames)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    base = Encoder(cfg.replace(sign_data_hiding=False)).encode(frames)
    assert res.total_bits <= base.total_bits


def test_sdh_end_to_end_inter():
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=8)
    cfg = CodecConfig(width=96, height=64, qp=30, intra_period=3,
                      sign_data_hiding=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_sdh_rejects_lossless():
    with pytest.raises(ValueError):
        CodecConfig(width=64, height=64, lossless=True,
                    sign_data_hiding=True)


def test_sdh_sps_roundtrip():
    from x266_tpu.core.headers import parse_sps, write_sps

    cfg = CodecConfig(width=128, height=64, sign_data_hiding=True)
    assert parse_sps(write_sps(cfg)).sign_data_hiding is True
    cfg2 = CodecConfig(width=128, height=64)
    assert parse_sps(write_sps(cfg2)).sign_data_hiding is False
