"""Dependent quantization (C11) gates: state machine vs a sequential
reference, encoder/decoder consistency, end-to-end bit-exact decode."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip


def _cfg(**kw):
    base = dict(width=96, height=64, qp=30, profile=Profile.VVC,
                dep_quant=True)
    base.update(kw)
    return CodecConfig(**base)


def test_dq_dequant_matches_sequential_reference():
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import (DQ_TRANS, _dq_perm,
                                        dq_dequantize)
    from x266_tpu.specmodel.quant import DEQUANT_SCALES, transform_shift

    rng = np.random.default_rng(4)
    for s in (8, 16, 32):
        for qp in (22, 37):
            lev = (rng.integers(-6, 7, (s, s))
                   * (rng.random((s, s)) < 0.35)).astype(np.int32)
            got = np.asarray(dq_dequantize(jnp.asarray(lev), qp, s))
            tsh = transform_shift(s, 8)
            ishift = 6 - tsh
            dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
            ys, xs = _dq_perm(s)
            v = lev[ys, xs]
            st = 0
            ref = np.zeros_like(v)
            for j in range(len(v)):
                q1 = 1 if st >= 2 else 0
                a = abs(int(v[j]))
                mag = ((2 * a - (q1 if a > 0 else 0)) * dscale
                       + (1 << ishift)) >> (ishift + 1)
                ref[j] = np.sign(v[j]) * min(mag, 32767)
                st = DQ_TRANS[st][a & 1]
            want = np.zeros((s, s), np.int32)
            want[ys, xs] = ref
            assert np.array_equal(got, want), (s, qp)


def test_dq_quantize_dequantize_beats_plain_distortion():
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import (dequantize, dq_dequantize,
                                        dq_quantize, quantize)

    rng = np.random.default_rng(1)
    c = rng.integers(-2000, 2000, (4, 16, 16)).astype(np.int32)
    lam = 40.0
    lev = dq_quantize(jnp.asarray(c), 30, 16, lam)
    deq = np.asarray(dq_dequantize(lev, 30, 16))
    dp = np.asarray(dequantize(quantize(jnp.asarray(c), 30, 16), 30, 16))
    assert np.abs(deq - c).mean() <= np.abs(dp - c).mean() * 1.05


def test_dq_end_to_end_intra():
    frames = synthetic_clip(96, 64, 3, kind="mixed", seed=13)
    cfg = _cfg()
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    assert len(dec) == len(frames)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_dq_end_to_end_inter_mts():
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=17)
    cfg = _cfg(intra_period=3, mts=True, rdoq=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_dq_validation():
    with pytest.raises(ValueError):
        _cfg(profile=Profile.HEVC_SUBSET)
    with pytest.raises(ValueError):
        _cfg(lossless=True)
    with pytest.raises(ValueError):
        _cfg(sign_data_hiding=True)


def test_dq_sps_roundtrip():
    from x266_tpu.core.headers import parse_sps, write_sps

    assert parse_sps(write_sps(_cfg())).dep_quant is True
    assert parse_sps(write_sps(CodecConfig(
        width=96, height=64))).dep_quant is False
