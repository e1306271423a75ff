"""C10 LFNST gates: trained secondary transform end to end."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.kernels import lfnst
from x266_tpu.kernels.lfnst_tables import TABLES


def test_tables_shape_and_near_orthogonal():
    assert TABLES.shape == (8, 16, 16)
    assert np.abs(TABLES).max() <= 127
    for k in range(8):
        m = TABLES[k].astype(np.float64) / 128.0
        g = m @ m.T
        assert np.abs(np.diag(g) - 1).max() < 0.05
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() < 0.05


def test_mode_class_consistent_and_bounded():
    for n_modes in (35, 67):
        modes = np.arange(n_modes)
        s, t = lfnst.mode_class(modes, n_modes, xp=np)
        assert s.min() >= 0 and s.max() <= 3
        assert s[0] == 0 and s[1] == 0
        # symmetry: mirrored angular modes share the set
        diag = 18 if n_modes == 35 else 34
        for m in range(2, diag):
            mm = 2 * diag - m
            if mm < n_modes:
                assert s[m] == s[mm], (m, mm)


def test_fwd_inv_near_identity():
    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    coef = jnp.asarray(rng.integers(-500, 501, (32, 8, 8)), jnp.int32)
    modes = jnp.asarray(rng.integers(0, 67, 32), jnp.int32)
    idx = jnp.asarray(rng.integers(1, 3, 32), jnp.int32)
    c2 = lfnst.lfnst_fwd(coef, modes, idx, 67)
    back = lfnst.lfnst_inv(c2, modes, idx, 67)
    # quantized-orthogonal round trip: small bounded error on the low
    # band, untouched elsewhere
    d = np.asarray(back) - np.asarray(coef)
    assert np.abs(d[:, :4, :4]).max() <= 16
    assert (d[:, 4:, :] == 0).all() and (d[:, :4, 4:] == 0).all()
    # idx = 0 is the identity
    z = lfnst.lfnst_fwd(coef, modes, jnp.zeros(32, jnp.int32), 67)
    assert (np.asarray(z) == np.asarray(coef)).all()


def test_lfnst_requires_vvc():
    with pytest.raises(ValueError, match="VVC"):
        CodecConfig(width=64, height=64, lfnst=True)


def _roundtrip(cfg, fr):
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])
    return res, cfg2


def test_lfnst_roundtrip():
    fr = synthetic_frame(128, 96, kind="mixed", seed=21)
    cfg = CodecConfig(width=128, height=96, qp=32, profile=Profile.VVC,
                      lfnst=True, rdoq=True)
    res, cfg2 = _roundtrip(cfg, fr)
    assert cfg2.lfnst


def test_lfnst_with_mts_ts_mtt_roundtrip():
    fr = synthetic_frame(96, 96, kind="noise", seed=22)
    cfg = CodecConfig(width=96, height=96, qp=34, profile=Profile.VVC,
                      lfnst=True, mts=True, transform_skip=True,
                      mtt=True, deblock=True, sao=True, rdoq=True)
    _roundtrip(cfg, fr)


def test_lfnst_actually_selected():
    """On smooth directional content the trained kernels must win on
    some TUs (otherwise the tool is dead weight)."""
    import jax.numpy as jnp

    from x266_tpu.engine import fused
    from x266_tpu.engine.mode_decision import (make_mode_decision_raw,
                                               make_mts_select_raw)

    xx, yy = np.meshgrid(np.arange(128), np.arange(128))
    from x266_tpu.core.yuv import Frame
    rng = np.random.default_rng(23)
    y = ((np.sin(xx / 9.0 + yy / 17.0) * 70 + 120)
         + rng.normal(0, 2, xx.shape)).clip(0, 255).astype(np.uint8)
    fr = Frame(y, np.full((64, 64), 120, np.uint8),
               np.full((64, 64), 130, np.uint8))
    cfg = CodecConfig(width=128, height=128, qp=32,
                      profile=Profile.VVC, lfnst=True)
    yP, _, _ = fused._unpack_padded(cfg, fused.pack_input(cfg, fr))
    yP = yP.astype(jnp.int32)
    size_map, mode_map = make_mode_decision_raw(cfg)(yP)
    mts_map = make_mts_select_raw(cfg)(yP, size_map, mode_map)
    lf = (np.asarray(mts_map) >> 6) & 3
    assert (lf > 0).sum() > 0
