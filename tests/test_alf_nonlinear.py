"""C15 completion gates: nonlinear ALF (clipping + geometric
transposes) and CC-ALF (cross-component)."""

import numpy as np

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, synthetic_frame
from x266_tpu.kernels import alf


def test_transpose_perms_are_involutions():
    for t in range(4):
        p = alf.TRANSPOSE_PERMS[t]
        assert sorted(p) == list(range(12))
        assert (p[p] == np.arange(12)).all()      # involution


def test_classify_full_matches_numpy():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (64, 96)).astype(np.int32)
    c1, t1 = map(np.asarray, alf.classify_full(y))
    c2, t2 = alf.classify_full(y, xp=np)
    assert (c1 == c2).all() and (t1 == t2).all()
    assert t1.min() >= 0 and t1.max() < 4
    # class map unchanged vs the linear-path classify
    assert (c1 == np.asarray(alf.classify(y))).all()


def test_nonlinear_apply_matches_numpy_and_reduces_to_linear():
    rng = np.random.default_rng(8)
    y = rng.integers(0, 256, (64, 64)).astype(np.int32)
    cls, tr = alf.classify_full(y, xp=np)
    coeffs = rng.integers(-30, 31, (25, 12)).astype(np.int32)
    flags = np.ones((1, 1), np.int32)
    clips = rng.integers(0, 4, 25).astype(np.int32)
    a = alf.apply_alf(y, cls, coeffs, flags, xp=np,
                      transpose_map=tr, clip_idx=clips)
    b = np.asarray(alf.apply_alf(y, cls, coeffs, flags,
                                 transpose_map=tr, clip_idx=clips))
    assert (a == b).all()
    # clip level 0 + transpose 0 everywhere == the linear filter
    lin = alf.apply_alf(y, cls, coeffs, flags, xp=np)
    same = alf.apply_alf(y, cls, coeffs, flags, xp=np,
                         transpose_map=np.zeros_like(tr),
                         clip_idx=np.zeros(25, np.int32))
    assert (lin == same).all()


def test_nonlinear_estimate_beats_or_matches_linear():
    rng = np.random.default_rng(9)
    # directional content: noise is what ALF corrects
    xx, yy = np.meshgrid(np.arange(128), np.arange(128))
    orig = ((xx + 2 * yy) % 97 * 2 + 30).astype(np.int32)
    noise = rng.integers(-6, 7, (128, 128))
    recon = np.clip(orig + noise, 0, 255).astype(np.int32)
    _, fl, filt_l = alf.estimate_alf(orig, recon, lam=20.0)
    _, _, fn, filt_n = alf.estimate_alf_nonlinear(orig, recon, lam=20.0)
    mse_l = np.mean((orig - np.asarray(filt_l)) ** 2.0)
    mse_n = np.mean((orig - np.asarray(filt_n)) ** 2.0)
    mse_0 = np.mean((orig - recon) ** 2.0)
    assert mse_n <= mse_0 + 1e-6
    assert mse_n <= mse_l * 1.05   # at worst ~level-0 == linear


def test_nonlinear_estimator_matches_normative_apply():
    rng = np.random.default_rng(10)
    orig = rng.integers(0, 256, (64, 128)).astype(np.int32)
    recon = np.clip(orig + rng.integers(-4, 5, orig.shape),
                    0, 255).astype(np.int32)
    coeffs, clips, flags, filt = alf.estimate_alf_nonlinear(
        orig, recon, lam=15.0)
    cls, tr = alf.classify_full(recon, xp=np)
    again = alf.apply_alf(recon, cls, np.asarray(coeffs),
                          np.asarray(flags), xp=np, transpose_map=tr,
                          clip_idx=np.asarray(clips))
    assert (again == np.asarray(filt)).all()


def test_ccalf_apply_and_estimate():
    rng = np.random.default_rng(11)
    luma = rng.integers(0, 256, (128, 128)).astype(np.int32)
    # chroma error correlated with luma structure: CC-ALF's target
    orig_c = rng.integers(20, 230, (64, 64)).astype(np.int32)
    hf = (luma - np.roll(luma, 1, 0))[0::2, 0::2] // 8
    c = np.clip(orig_c - hf, 0, 255).astype(np.int32)
    coeffs, flags, filt = alf.estimate_ccalf(orig_c, c, luma, lam=10.0)
    mse0 = np.mean((orig_c - c) ** 2.0)
    mse1 = np.mean((orig_c - np.asarray(filt)) ** 2.0)
    assert mse1 < mse0
    # np/jnp application parity
    a = alf.apply_ccalf(c, luma, np.asarray(coeffs), np.asarray(flags),
                        xp=np)
    assert (a == np.asarray(filt)).all()
    # zero coefficients = identity
    z = np.zeros(7, np.int32)
    assert (alf.apply_ccalf(c, luma, z, np.asarray(flags), xp=np)
            == c).all()


def test_nonlinear_ccalf_roundtrip_all_intra():
    fr = synthetic_frame(128, 96, kind="noise", seed=44)
    cfg = CodecConfig(width=128, height=96, qp=37, deblock=True,
                      sao=True, sao_chroma=True, alf=True,
                      alf_chroma=True, alf_nonlinear=True, ccalf=True)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.alf_nonlinear and cfg2.ccalf
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_nonlinear_ccalf_roundtrip_b_gop():
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=45)
    cfg = CodecConfig(width=96, height=64, qp=32, intra_period=4,
                      gop_size=4, deblock=True, sao=True,
                      sao_chroma=True, alf=True, alf_chroma=True,
                      alf_nonlinear=True, ccalf=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
