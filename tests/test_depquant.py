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


# ---- Viterbi trellis (round-5, VERDICT r04 item 2) -------------------------

def _trellis_cost_tables(a, qp, s, lam):
    """Per-(quantizer, parity) best-level costs, mirroring
    dq_quantize_trellis's candidate set, in numpy."""
    from x266_tpu.specmodel.quant import (DEQUANT_SCALES, QUANT_SCALES,
                                          transform_shift)

    tsh = transform_shift(s, 8)
    qbits = 14 + qp // 6 + tsh
    scale = int(QUANT_SCALES[qp % 6])
    ishift = 6 - tsh
    dscale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    err_scale = 2.0 ** (-2 * tsh)

    def cost(k, q1):
        dq = ((2 * k - (q1 if k > 0 else 0)) * dscale
              + (1 << ishift)) >> (ishift + 1)
        e = float(a - dq)
        rate = (3.0 + 2.0 * np.log2(k + 1.0)) if k > 0 else 0.0625
        return e * e * err_scale + lam * rate

    out = {}
    for q1 in (0, 1):
        u = (a * scale + (1 << (qbits - 2))) >> (qbits - 1)
        kup = min(max((u + q1 + 1) >> 1, 0), 32767)
        kdn = max(kup - 1, 0)
        for p in (0, 1):
            cands = [k for k in {kup, kdn} if (k & 1) == p]
            if p == 0:
                cands.append(0)
            if not cands:                  # kup == kdn == 0, p == 1
                out[(q1, p)] = (0, float("inf"))
                continue
            best = min(cands, key=lambda k: cost(k, q1))
            out[(q1, p)] = (best, cost(best, q1))
    return out


def _viterbi_oracle(avec, qp, s, lam):
    """Sequential exact Viterbi over the same candidate set; returns
    the minimal total cost."""
    from x266_tpu.kernels.quant import DQ_TRANS

    INF = float("inf")
    costs = [0.0, INF, INF, INF]
    for a in avec:
        tab = _trellis_cost_tables(int(a), qp, s, lam)
        nxt = [INF] * 4
        for st in range(4):
            if costs[st] == INF:
                continue
            q1 = 1 if st >= 2 else 0
            for p in (0, 1):
                b = int(DQ_TRANS[st][p])
                c = costs[st] + tab[(q1, p)][1]
                if c < nxt[b]:
                    nxt[b] = c
        costs = nxt
    return min(costs)


def _eval_levels(lev2d, coef2d, qp, s, lam):
    """Independent cost of an emitted level field under the
    parity-derived states (what the decoder reconstructs)."""
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import dq_dequantize
    from x266_tpu.specmodel.quant import transform_shift

    deq = np.asarray(dq_dequantize(jnp.asarray(lev2d), qp, s))
    err_scale = 2.0 ** (-2 * transform_shift(s, 8))
    d = float(((deq - coef2d).astype(np.float64) ** 2).sum()) * err_scale
    k = np.abs(lev2d)
    rate = np.where(k > 0, 3.0 + 2.0 * np.log2(k + 1.0), 0.0625).sum()
    return d + lam * rate


def test_trellis_matches_sequential_viterbi_cost():
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import _dq_perm, dq_quantize_trellis

    rng = np.random.default_rng(11)
    s, qp, lam = 8, 30, 40.0
    for trial in range(6):
        c = (rng.integers(-1500, 1500, (s, s))
             * (rng.random((s, s)) < 0.5)).astype(np.int32)
        lev = np.asarray(dq_quantize_trellis(jnp.asarray(c), qp, s, lam))
        got = _eval_levels(lev, c, qp, s, lam)
        ys, xs = _dq_perm(s)
        want = _viterbi_oracle(np.abs(c[ys, xs]), qp, s, lam)
        assert got <= want * (1 + 1e-6) + 1e-6, (trial, got, want)


def test_trellis_not_worse_than_greedy():
    import jax.numpy as jnp

    from x266_tpu.kernels.quant import dq_quantize, dq_quantize_trellis

    rng = np.random.default_rng(5)
    s, qp, lam = 16, 32, 64.0
    worse = 0
    for trial in range(8):
        c = (rng.integers(-3000, 3000, (s, s))
             * (rng.random((s, s)) < 0.4)).astype(np.int32)
        lt = np.asarray(dq_quantize_trellis(jnp.asarray(c), qp, s, lam))
        lg = np.asarray(dq_quantize(jnp.asarray(c), qp, s, lam))
        ct = _eval_levels(lt, c, qp, s, lam)
        cg = _eval_levels(lg, c, qp, s, lam)
        if ct > cg + 1e-6:
            worse += 1
    assert worse == 0, f"trellis worse than greedy on {worse}/8 TUs"


def test_trellis_end_to_end_roundtrip():
    frames = synthetic_clip(96, 64, 2, kind="mixed", seed=21)
    cfg = _cfg(rdoq=True)
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
