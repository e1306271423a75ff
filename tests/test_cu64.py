"""64x64 CUs with the 64-pt DCT-II + high-frequency zero-out (C10/C5,
round-5 — VERDICT r04 item 7).

Gates: transform exactness vs the scalar spec model, encode->decode
bit-exact round trips (native and Python entropy agree via the usual
differential suite), zero-out actually zeroes the coded band, and the
64 leaf wins on smooth content (the point of large CUs).
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import Frame, synthetic_frame


def _cfg(**kw):
    base = dict(width=128, height=64, qp=32, rdoq=True,
                profile=Profile.VVC, max_cu_size=64)
    base.update(kw)
    return CodecConfig(**base)


def test_transform64_matches_spec_and_zero_out():
    import jax.numpy as jnp

    from x266_tpu.kernels import transforms as kt
    from x266_tpu.specmodel import transforms as st

    rng = np.random.default_rng(3)
    r = rng.integers(-255, 256, (2, 64, 64)).astype(np.int32)
    ck = np.asarray(kt.forward_transform(jnp.asarray(r), 64))
    cs = np.stack([st.forward_transform(r[i]) for i in range(2)])
    np.testing.assert_array_equal(ck, cs)
    assert not ck[:, 32:, :].any() and not ck[:, :, 32:].any()
    rk = np.asarray(kt.inverse_transform(jnp.asarray(ck), 64))
    rs = np.stack([st.inverse_transform(cs[i]) for i in range(2)])
    np.testing.assert_array_equal(rk, rs)


def test_roundtrip_cu64_smooth():
    cfg = _cfg()
    frames = [synthetic_frame(128, 64, kind="gradient")]
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.max_cu_size == 64
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    assert dec[0].psnr(frames[0])[0] > 32.0


def test_roundtrip_cu64_mixed_with_mts_and_subst():
    cfg = _cfg(mts=True, ref_substitute=True)
    frames = [synthetic_frame(128, 64, kind="mixed", seed=5)]
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_cu64_wins_on_flat_content():
    """A flat picture should code 64-CUs (cheaper tree + one DC) and
    cost fewer bits than the 32-capped tree."""
    flat = Frame(np.full((64, 128), 100, np.uint8),
                 np.full((32, 64), 120, np.uint8),
                 np.full((32, 64), 130, np.uint8))
    r64 = Encoder(_cfg(), with_recon=False).encode([flat])
    r32 = Encoder(_cfg(max_cu_size=32), with_recon=False).encode([flat])
    assert r64.total_bits <= r32.total_bits


def test_cu64_constraints():
    with pytest.raises(ValueError):
        _cfg(profile=Profile.HEVC_SUBSET)
    with pytest.raises(ValueError):
        _cfg(intra_period=8)
    with pytest.raises(ValueError):
        _cfg(mtt=True)
    with pytest.raises(ValueError):
        _cfg(dep_quant=True)
