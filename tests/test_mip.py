"""MIP (matrix intra prediction, C6) tests.

Covers: the trained-table weight-stack extension (exact flat-field
reproduction, kernel == NumPy oracle), encode->decode bit-exactness
with MIP on (both entropy engines), and MIP actually being selected.
"""

import numpy as np
import pytest

from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.specmodel import intra as spec


def _cfg(**kw):
    return CodecConfig(width=128, height=64, qp=32,
                       profile=Profile.VVC, mip=True, **kw)


def test_mip_flat_field_exact():
    # rows sum to 2^shift: a constant boundary must reproduce exactly
    for s in (4, 8, 16, 32):
        for k in range(spec.MIP_K):
            mode = spec.NUM_MODES_VVC + k
            ref = np.full(spec.ref_len(s), 131, np.int32)
            p = spec.predict(ref, s, mode, n_modes=spec.NUM_MODES_VVC
                             + spec.MIP_K)
            assert (p == 131).all(), (s, k)


def test_mip_kernel_matches_oracle():
    from x266_tpu.kernels import intra as kintra
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_total = spec.NUM_MODES_VVC + spec.MIP_K
    for s in (8, 16):
        refs = rng.integers(0, 256, (5, spec.ref_len(s))).astype(
            np.int32)
        preds = np.asarray(kintra.predict_all_modes(
            jnp.asarray(refs), s, n_total))
        for b in range(5):
            for mode in (0, 40, spec.NUM_MODES_VVC,
                         spec.NUM_MODES_VVC + spec.MIP_K - 1):
                want = spec.predict(refs[b], s, mode, n_modes=n_total)
                assert (preds[b, mode] == want).all(), (s, b, mode)


def test_mip_mode_selected():
    """The trained matrices must win at least somewhere on content."""
    from x266_tpu.engine import fused, picture

    cfg = _cfg()
    f = synthetic_clip(128, 64, 1, kind="noise", seed=2)[0]
    td = picture.tile_compute(cfg, f, with_recon=False)
    assert (td.mode_map >= spec.NUM_MODES_VVC).any(), \
        "no MIP mode selected on the noise clip"


@pytest.mark.parametrize("native", [True, False])
def test_mip_roundtrip_bitexact(native, monkeypatch):
    if not native:
        monkeypatch.setenv("X266T_NO_NATIVE", "1")
    from x266_tpu.api import Decoder, Encoder

    cfg = _cfg(mts=True, rdoq=True)
    frames = [synthetic_clip(128, 64, 1, kind="mixed", seed=5)[0],
              synthetic_clip(128, 64, 1, kind="noise", seed=5)[0]]
    res = Encoder(cfg, with_recon=True).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    assert len(dec) == 2
    for i, (r, d) in enumerate(zip(res.recon, dec)):
        assert frame_md5(r) == frame_md5(d), f"frame {i}"


def test_mip_entropy_parity():
    """Native C++ and Python walkers produce identical payloads."""
    import os

    from x266_tpu.cabac import native_bind
    from x266_tpu.cabac.syntax import SyntaxEncoder
    from x266_tpu.engine import picture

    if not native_bind.available() or os.environ.get("X266T_NO_NATIVE"):
        pytest.skip("native coder unavailable")
    cfg = _cfg()
    f = synthetic_clip(128, 64, 1, kind="noise", seed=7)[0]
    td = picture.tile_compute(cfg, f, with_recon=False)
    rows = cfg.segment_ctu_rows()
    nat = [native_bind.encode_segment(
        cfg, td.size_map, td.mode_map, td.coef_y, td.coef_cb,
        td.coef_cr, r0, r1, td.sao_params, td.mts_map)
        for (r0, r1) in rows]
    enc = SyntaxEncoder(cfg, td.size_map, td.mode_map, td.coef_y,
                        td.coef_cb, td.coef_cr, td.sao_params,
                        td.mts_map)
    py = [enc.encode_segment(r0, r1) for (r0, r1) in rows]
    assert nat == py
