"""C14 unit + integration tests for SAO."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.kernels import sao
from tests.test_syntax import random_maps


def _params(cy, cx, seed=0):
    rng = np.random.default_rng(seed)
    st = rng.integers(0, 6, (cy, cx)).astype(np.int32)
    sb = rng.integers(0, 29, (cy, cx)).astype(np.int32)
    so = rng.integers(0, 8, (cy, cx, 4)).astype(np.int32)
    # edge rows: inferred signs; band rows: random signs
    sign = np.where(np.arange(4)[None, None] < 2, 1, -1)
    so_edge = so * sign
    so_band = so * rng.choice([-1, 1], (cy, cx, 4))
    so = np.where((st[..., None] >= 1) & (st[..., None] <= 4),
                  so_edge, so_band).astype(np.int32)
    return st, sb, so


def test_apply_jax_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (128, 192)).astype(np.int32)
    st, sb, so = _params(2, 3)
    want = sao.apply_sao(y, st, sb, so, xp=np)
    got = np.asarray(sao.apply_sao(y, st, sb, so))
    assert (want == got).all()


def test_estimate_reduces_error():
    rng = np.random.default_rng(1)
    orig = rng.integers(0, 256, (128, 128)).astype(np.int32)
    noise = rng.integers(-4, 5, (128, 128))
    recon = np.clip(orig + noise, 0, 255).astype(np.int32)
    st, sb, so = sao.estimate_sao(orig, recon, lam=10.0)
    filtered = np.asarray(sao.apply_sao(recon, np.asarray(st),
                                        np.asarray(sb), np.asarray(so),
                                        xp=np))
    mse_before = np.mean((orig - recon) ** 2.0)
    mse_after = np.mean((orig - filtered) ** 2.0)
    assert mse_after <= mse_before


def test_syntax_roundtrip_with_sao():
    cfg = CodecConfig(width=96, height=64, sao=True)
    rng = np.random.default_rng(2)
    sm, mm, cy_, ccb, ccr = random_maps(cfg, rng, 0.2, 10)
    params = _params(cfg.ctus_y, cfg.ctus_x, 3)
    enc = SyntaxEncoder(cfg, sm, mm, cy_, ccb, ccr, params)
    data = enc.encode_segment(0, cfg.ctus_y)
    dec = SyntaxDecoder(cfg)
    dec.decode_segment(data, 0, cfg.ctus_y)
    assert (dec.sao[0][0] == params[0]).all()
    # band pos only meaningful for band type; offsets always compared
    band = params[0] == 5
    assert (dec.sao[1][0][band] == params[1][band]).all()
    assert (dec.sao[2][0][params[0] > 0]
            == params[2][params[0] > 0]).all()
    assert (dec.coef["y"] == cy_).all()

    if native_bind.available():
        nat = native_bind.encode_segment(cfg, sm, mm, cy_, ccb, ccr,
                                         0, cfg.ctus_y, params)
        assert nat == data
        dec2 = SyntaxDecoder(cfg)
        native_bind.decode_segment(cfg, dec2.size_map, dec2.mode_map,
                                   dec2.coef["y"], dec2.coef["cb"],
                                   dec2.coef["cr"], 0, cfg.ctus_y, nat,
                                   sao_params=dec2.sao)
        assert (dec2.sao[0][0] == params[0]).all()
        assert (dec2.sao[2][0][params[0] > 0]
                == params[2][params[0] > 0]).all()


def test_syntax_roundtrip_with_chroma_sao():
    """3-plane SAO signalling (cfg.sao_chroma), Python and native."""
    cfg = CodecConfig(width=96, height=64, sao=True, sao_chroma=True)
    rng = np.random.default_rng(5)
    sm, mm, cy_, ccb, ccr = random_maps(cfg, rng, 0.2, 10)
    planes = [_params(cfg.ctus_y, cfg.ctus_x, 30 + p) for p in range(3)]
    params = tuple(np.stack([pl[i] for pl in planes]) for i in range(3))
    enc = SyntaxEncoder(cfg, sm, mm, cy_, ccb, ccr, params)
    data = enc.encode_segment(0, cfg.ctus_y)
    dec = SyntaxDecoder(cfg)
    dec.decode_segment(data, 0, cfg.ctus_y)
    assert (dec.sao[0] == params[0]).all()
    on = params[0] > 0
    assert (dec.sao[2][on] == params[2][on]).all()

    if native_bind.available():
        nat = native_bind.encode_segment(cfg, sm, mm, cy_, ccb, ccr,
                                         0, cfg.ctus_y, params)
        assert nat == data
        dec2 = SyntaxDecoder(cfg)
        native_bind.decode_segment(cfg, dec2.size_map, dec2.mode_map,
                                   dec2.coef["y"], dec2.coef["cb"],
                                   dec2.coef["cr"], 0, cfg.ctus_y, nat,
                                   sao_params=dec2.sao)
        assert (dec2.sao[0] == params[0]).all()
        assert (dec2.sao[2][on] == params[2][on]).all()


def test_roundtrip_with_sao_and_deblock():
    cfg = CodecConfig(width=96, height=64, qp=37, deblock=True, sao=True)
    fr = synthetic_frame(96, 64, kind="noise", seed=4)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.sao and cfg2.deblock
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_roundtrip_with_chroma_sao():
    """End-to-end chroma SAO: MD5 gate + the chroma planes actually
    improve vs luma-only SAO on a noisy clip."""
    fr = synthetic_frame(96, 64, kind="noise", seed=4)

    def run(**kw):
        cfg = CodecConfig(width=96, height=64, qp=37, deblock=True,
                          sao=True, **kw)
        res = Encoder(cfg).encode([fr])
        cfg2, dec = Decoder().decode(res.bitstream)
        assert frame_md5(res.recon[0]) == frame_md5(dec[0])
        return res, cfg2

    res_c, cfg2 = run(sao_chroma=True)
    assert cfg2.sao_chroma
    res_l, _ = run()
    sse_c = (np.sum((res_c.recon[0].cb.astype(np.int64)
                     - fr.cb.astype(np.int64)) ** 2)
             + np.sum((res_c.recon[0].cr.astype(np.int64)
                       - fr.cr.astype(np.int64)) ** 2))
    sse_l = (np.sum((res_l.recon[0].cb.astype(np.int64)
                     - fr.cb.astype(np.int64)) ** 2)
             + np.sum((res_l.recon[0].cr.astype(np.int64)
                       - fr.cr.astype(np.int64)) ** 2))
    assert sse_c <= sse_l
