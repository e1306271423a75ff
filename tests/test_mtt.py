"""C5 MTT gates: binary-split rectangular CUs end to end."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import Frame, synthetic_frame


def _cfg(w, h, **kw):
    return CodecConfig(width=w, height=h, profile=Profile.VVC,
                       mtt=True, **kw)


def _striped_frame(w, h, seed=0):
    """Content that favors rectangular CUs: horizontal bands whose
    texture changes mid-leaf, plus vertical edges mid-leaf."""
    rng = np.random.default_rng(seed)
    y = np.zeros((h, w), np.uint8)
    for r in range(0, h, 8):
        base = 40 + (r // 8 % 2) * 120 + rng.integers(0, 20)
        y[r:r + 8] = base
    y[:, ::16] = 220            # vertical edges off the 32-grid
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    return Frame(y, cb, cr)


def test_mtt_requires_vvc():
    with pytest.raises(ValueError, match="VVC"):
        CodecConfig(width=64, height=64, mtt=True)


def test_mtt_roundtrip_and_bt_used():
    fr = _striped_frame(128, 128, seed=5)
    cfg = _cfg(128, 128, qp=30)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.mtt
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])
    # the striped content must actually select binary splits
    from x266_tpu.engine import fused
    from x266_tpu.engine.mode_decision import make_mode_decision_raw

    yP, _, _ = fused._unpack_padded(cfg, fused.pack_input(cfg, fr))
    _, _, bt_map = make_mode_decision_raw(cfg)(yP)
    assert int((np.asarray(bt_map) > 0).sum()) > 50


def test_mtt_python_native_walkers_identical():
    """The C++ walker must code MTT streams bit-for-bit like Python."""
    import os

    from x266_tpu.cabac import native_bind

    if not native_bind.available():
        pytest.skip("no native toolchain")
    fr = _striped_frame(128, 64, seed=6)
    cfg = _cfg(128, 64, qp=30)
    res_native = Encoder(cfg).encode([fr])
    os.environ["X266T_NO_NATIVE"] = "1"
    try:
        import importlib

        import x266_tpu.cabac.native_bind as nb
        importlib.reload(nb)
        import x266_tpu.engine.picture as pic
        importlib.reload(pic)
        res_py = Encoder(cfg).encode([fr])
    finally:
        del os.environ["X266T_NO_NATIVE"]
        import importlib

        import x266_tpu.cabac.native_bind as nb
        importlib.reload(nb)
        import x266_tpu.engine.picture as pic
        importlib.reload(pic)
    assert res_native.bitstream == res_py.bitstream


def test_mtt_improves_or_matches_rd_on_striped_content():
    fr = _striped_frame(128, 128, seed=7)
    res_q = Encoder(CodecConfig(width=128, height=128, qp=30,
                                profile=Profile.VVC)).encode([fr])
    res_m = Encoder(_cfg(128, 128, qp=30)).encode([fr])
    bits_q, bits_m = res_q.total_bits, res_m.total_bits
    p_q = res_q.psnr_y(128, 128)[0]
    p_m = res_m.psnr_y(128, 128)[0]
    # MTT adds one flag per 16/32 leaf; it must pay for itself here
    cost_q = bits_q * 2.0 ** (-p_q / 3)
    cost_m = bits_m * 2.0 ** (-p_m / 3)
    assert cost_m <= cost_q * 1.01


def test_mtt_with_mts_and_filters_roundtrip():
    fr = synthetic_frame(96, 96, kind="noise", seed=8)
    cfg = _cfg(96, 96, qp=34, mts=True, transform_skip=True,
               deblock=True, sao=True, rdoq=True)
    res = Encoder(cfg).encode([fr])
    _, dec = Decoder().decode(res.bitstream)
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_mtt_gop_with_i_and_p_roundtrip():
    """MTT streams with inter pictures: bt codes only in I slices."""
    from x266_tpu.core.yuv import synthetic_clip

    frames = synthetic_clip(96, 64, 3, kind="mixed", seed=9)
    cfg = _cfg(96, 64, qp=32, intra_period=4, deblock=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_mtt_nonaligned_dims_roundtrip():
    fr = synthetic_frame(104, 72, kind="mixed", seed=10)
    cfg = _cfg(104, 72, qp=32)
    res = Encoder(cfg).encode([fr])
    _, dec = Decoder().decode(res.bitstream)
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])
