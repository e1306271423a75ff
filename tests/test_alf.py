"""C15 gates: ALF classification, application, end-to-end round trip."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, synthetic_frame
from x266_tpu.kernels import alf


def test_classify_deterministic_and_bounded():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (64, 96)).astype(np.int32)
    c1 = np.asarray(alf.classify(y))
    c2 = alf.classify(y, xp=np)
    assert (c1 == c2).all()
    assert c1.min() >= 0 and c1.max() < alf.NUM_CLASSES
    # flat area -> activity class 0, direction 0
    flat = np.full((64, 64), 100, np.int32)
    assert (alf.classify(flat, xp=np) == 0).all()


def test_apply_matches_numpy_and_identity():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 64)).astype(np.int32)
    cls = np.asarray(alf.classify(y))
    coeffs = rng.integers(-30, 31, (25, 12)).astype(np.int32)
    flags = np.ones((1, 1), np.int32)
    a = alf.apply_alf(y, cls, coeffs, flags, xp=np)
    b = np.asarray(alf.apply_alf(y, cls, coeffs, flags))
    assert (a == b).all()
    # zero coefficients = identity; flags off = identity
    z = np.zeros((25, 12), np.int32)
    assert (alf.apply_alf(y, cls, z, flags, xp=np) == y).all()
    off = np.zeros((1, 1), np.int32)
    assert (alf.apply_alf(y, cls, coeffs, off, xp=np) == y).all()


def test_estimate_improves_or_neutral():
    rng = np.random.default_rng(2)
    orig = rng.integers(0, 256, (128, 128)).astype(np.int32)
    noise = rng.integers(-3, 4, (128, 128))
    recon = np.clip(orig + noise, 0, 255).astype(np.int32)
    coeffs, flags, filt = alf.estimate_alf(orig, recon, lam=20.0)
    mse0 = np.mean((orig - recon) ** 2.0)
    mse1 = np.mean((orig - np.asarray(filt)) ** 2.0)
    assert mse1 <= mse0 + 1e-6


def test_alf_roundtrip_all_intra():
    fr = synthetic_frame(128, 96, kind="noise", seed=40)
    cfg = CodecConfig(width=128, height=96, qp=37, deblock=True,
                      sao=True, alf=True)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.alf
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_alf_roundtrip_p_gop():
    frames = synthetic_clip(96, 64, 3, kind="mixed", seed=41)
    cfg = CodecConfig(width=96, height=64, qp=32, intra_period=4,
                      deblock=True, sao=True, alf=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_alf_tiles_composes():
    """ALF + tiles composed in round 4 (band-local filter sets; the
    full gates live in tests/test_cfg4_composed.py) — the config must
    construct and the intra tiled encode must decode bit-exactly."""
    fr = synthetic_frame(128, 128, kind="mixed")
    cfg = CodecConfig(width=128, height=128, alf=True, tile_rows=1)
    res = Encoder(cfg).encode([fr])
    _, dec = Decoder().decode(res.bitstream)
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_alf_chroma_estimate_reduces_error():
    rng = np.random.default_rng(50)
    orig = rng.integers(0, 256, (64, 96)).astype(np.int32)
    noise = rng.integers(-5, 6, (64, 96))
    recon = np.clip(orig + noise, 0, 255).astype(np.int32)
    coeffs, flags, filt = alf.estimate_alf_chroma(orig, recon, lam=10.0)
    mse0 = np.mean((orig - recon) ** 2.0)
    mse1 = np.mean((orig - np.asarray(filt)) ** 2.0)
    assert mse1 <= mse0 + 1e-6
    # normative apply reproduces the estimator's filtered plane
    again = np.asarray(alf.apply_alf_chroma(recon, np.asarray(coeffs),
                                            np.asarray(flags), xp=np))
    assert (again == np.asarray(filt)).all()


def test_alf_chroma_roundtrip():
    """Chroma ALF end-to-end: slice-header round-trip + MD5 gate +
    the chroma planes improve vs luma-only ALF."""
    fr = synthetic_frame(128, 96, kind="noise", seed=42)

    def run(**kw):
        cfg = CodecConfig(width=128, height=96, qp=37, deblock=True,
                          sao=True, alf=True, **kw)
        res = Encoder(cfg).encode([fr])
        cfg2, dec = Decoder().decode(res.bitstream)
        assert frame_md5(res.recon[0]) == frame_md5(dec[0])
        return res, cfg2

    res_c, cfg2 = run(alf_chroma=True)
    assert cfg2.alf_chroma
    res_l, _ = run()

    def csse(res):
        return (np.sum((res.recon[0].cb.astype(np.int64)
                        - fr.cb.astype(np.int64)) ** 2)
                + np.sum((res.recon[0].cr.astype(np.int64)
                          - fr.cr.astype(np.int64)) ** 2))

    assert csse(res_c) <= csse(res_l)


def test_alf_chroma_roundtrip_b_gop():
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=43)
    cfg = CodecConfig(width=96, height=64, qp=32, intra_period=4,
                      gop_size=4, deblock=True, sao=True,
                      sao_chroma=True, alf=True, alf_chroma=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
