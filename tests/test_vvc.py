"""M2/config-2 gates: VVC profile — 67 intra modes + MTS (C6/C10)."""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.specmodel import intra as sintra
from tests.test_syntax import random_maps


def test_67mode_geometry_anchors():
    # anchor modes coincide with the 35-mode family: diagonals and pure
    # H/V (the intermediate ladder differs by design in VVC [STD])
    for m35, m67 in ((2, 2), (10, 18), (18, 34), (26, 50), (34, 66)):
        assert sintra.mode_geometry(m35, 35) \
            == sintra.mode_geometry(m67, 67), (m35, m67)
    # the 67-mode ladder is monotone within each quadrant
    angles = [sintra.mode_geometry(m, 67)[1] for m in range(2, 19)]
    assert angles == sorted(angles, reverse=True)     # 32 ... 0
    angles = [sintra.mode_geometry(m, 67)[1] for m in range(34, 51)]
    assert angles == sorted(angles)                   # -32 ... 0
    # odd modes interleave with intermediate angles
    v, a = sintra.mode_geometry(3, 67)
    assert not v and 26 < a < 32


def test_67mode_weight_invariants():
    for size in (4, 8, 32):
        for mode in (0, 1, 2, 17, 18, 33, 34, 35, 49, 50, 51, 66):
            w = sintra.weight_matrix(size, mode, 67)
            assert (w.sum(axis=1)
                    == (1 << sintra.mode_shift(size, mode))).all()


def test_vvc_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=32, profile=Profile.VVC)
    fr = synthetic_frame(96, 64, kind="mixed", seed=6)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.profile == Profile.VVC
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_vvc_mts_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=30, profile=Profile.VVC,
                      mts=True, deblock=True, sao=True)
    fr = synthetic_frame(96, 64, kind="noise", seed=7)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.mts
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_pdpc_oracle_kernel_parity():
    """Batched + single-mode PDPC paths == NumPy oracle, incl. the
    availability gates (C6 PDPC, FORMAT.md §8)."""
    import jax.numpy as jnp

    from x266_tpu.kernels import intra as kintra

    rng = np.random.default_rng(3)
    for n_modes in (35, 67):
        for s in (4, 8, 16):
            refs = rng.integers(0, 256, (4, 4 * s + 1)).astype(np.int32)
            lok = np.array([1, 0, 1, 0], np.int32)
            tok = np.array([1, 1, 0, 0], np.int32)
            preds = np.asarray(kintra.predict_all_modes(
                jnp.asarray(refs), s, n_modes, pdpc=True,
                left_ok=jnp.asarray(lok), top_ok=jnp.asarray(tok)))
            for b in range(4):
                for m in (0, 1, 2, 9, 10, 18, 26, 34, n_modes - 1):
                    o = sintra.predict(refs[b], s, m, n_modes, pdpc=True,
                                       left_ok=bool(lok[b]),
                                       top_ok=bool(tok[b]))
                    assert (preds[b, m] == o).all(), (n_modes, s, b, m)
    # single-block (recon-scan) path
    s, n_modes = 8, 67
    refs = rng.integers(0, 256, (4 * s + 1,)).astype(np.int32)
    for m in (0, 1, 18, 50, 66):
        p = np.asarray(kintra.predict_mode(
            jnp.asarray(refs), jnp.int32(m), s, n_modes, pdpc=True,
            left_ok=jnp.int32(1), top_ok=jnp.int32(0)))
        o = sintra.predict(refs, s, m, n_modes, pdpc=True,
                           left_ok=True, top_ok=False)
        assert (p == o).all(), m


def test_pdpc_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=30, profile=Profile.VVC,
                      mts=True, pdpc=True)
    fr = synthetic_frame(96, 64, kind="mixed", seed=9)
    res = Encoder(cfg).encode([fr])
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.pdpc
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])


def test_rdoq_roundtrip_and_gain():
    """RDOQ (C11, encoder-only): stream still decodes bit-exactly and the
    rate strictly improves on the reference clip at ~equal quality
    (measured -2.6% bits / -0.03 dB on the RD harness clip)."""
    from x266_tpu.core.yuv import synthetic_clip

    W, H = 96, 64
    frames = synthetic_clip(W, H, 2, kind="mixed", seed=17)
    base = Encoder(CodecConfig(width=W, height=H, qp=32),
                   with_recon=False).encode(frames)
    cfg = CodecConfig(width=W, height=H, qp=32, rdoq=True)
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert all(frame_md5(a) == frame_md5(b)
               for a, b in zip(res.recon, dec))
    assert sum(res.frame_bits) < sum(base.frame_bits)
    assert (np.mean(res.psnr_y(W, H))
            > np.mean(base.psnr_y(W, H)) - 0.15)


def test_transform_skip_roundtrip_and_selection():
    """C10 transform skip: screen-like content selects TS for most CUs,
    the stream round-trips bit-exactly, and TS wins rate there."""
    from x266_tpu.core.yuv import Frame

    rng = np.random.default_rng(12)
    W, H = 128, 96
    y = np.full((H, W), 200, np.uint8)
    for _ in range(40):   # text-like strokes on a flat background
        x0, y0 = rng.integers(0, W - 10), rng.integers(0, H - 10)
        y[y0:y0 + 8, x0:x0 + 2] = 20
        y[y0:y0 + 2, x0:x0 + 8] = 20
    fr = Frame(y, np.full((H // 2, W // 2), 128, np.uint8),
               np.full((H // 2, W // 2), 128, np.uint8))

    def run(**kw):
        cfg = CodecConfig(width=W, height=H, qp=30, **kw)
        res = Encoder(cfg).encode([fr])
        cfg2, dec = Decoder().decode(res.bitstream)
        assert frame_md5(res.recon[0]) == frame_md5(dec[0])
        return res, cfg2

    res_ts, cfg2 = run(transform_skip=True)
    assert cfg2.transform_skip
    res_base, _ = run()
    # TS must strictly help on this content in RD terms: lower cost
    # D + lambda*R at the coding lambda (it trades PSNR for a large
    # rate cut on sparse stroke residuals; both moves are on the
    # encoder's own objective)
    lam = CodecConfig(width=W, height=H, qp=30).lambda_mode

    def rd(res):
        d = np.sum((res.recon[0].y.astype(np.int64)
                    - fr.y.astype(np.int64)) ** 2)
        return float(d) + lam * sum(res.frame_bits)

    assert sum(res_ts.frame_bits) < sum(res_base.frame_bits)
    assert rd(res_ts) < rd(res_base)


def test_transform_skip_syntax_native_parity():
    if not native_bind.available():
        pytest.skip("no native toolchain")
    cfg = CodecConfig(width=96, height=64, profile=Profile.VVC,
                      mts=True, transform_skip=True)
    rng = np.random.default_rng(13)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.25, 20)
    mm = (mm * 66 // 34).astype(np.int32)
    # values 0..5: MTS combos and transform skip
    mts = rng.integers(0, 6, size=sm.shape).astype(np.int32)
    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr,
                       mts_map=mts).encode_segment(0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr, 0,
                                     cfg.ctus_y, None, mts)
    assert nat == py
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, nat,
                               mts_map=dec.mts_map)
    assert (dec.coef["y"] == cy).all()


def test_mts_syntax_native_parity():
    if not native_bind.available():
        pytest.skip("no native toolchain")
    cfg = CodecConfig(width=96, height=64, profile=Profile.VVC, mts=True)
    rng = np.random.default_rng(8)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.25, 20)
    mm = (mm * 66 // 34).astype(np.int32)      # spread over 0..66
    mts = rng.integers(0, 5, size=sm.shape).astype(np.int32)
    # make mts quadtree-consistent (constant per CU like the encoder)
    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr,
                       mts_map=mts).encode_segment(0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr, 0,
                                     cfg.ctus_y, None, mts)
    assert nat == py
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, nat,
                               mts_map=dec.mts_map)
    assert (dec.mode_map == mm).all()
    assert (dec.coef["y"] == cy).all()


def test_cclm_roundtrip_and_gain():
    """C6 CCLM: per-CU chroma linear-model prediction.  On colorized-
    luminance content (chroma = linear in luma) it must win both rate
    and chroma quality; streams round-trip bit-exactly incl. with MTS
    and in GOPs (I-slice CUs only)."""
    from x266_tpu.core.yuv import Frame, synthetic_clip

    W, H = 128, 96
    base = synthetic_frame(W, H, kind="mixed", seed=7)
    yd = base.y.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    cb = np.clip(40 + 0.6 * yd, 0, 255).astype(np.uint8)
    cr = np.clip(200 - 0.5 * yd, 0, 255).astype(np.uint8)
    fr = Frame(base.y, cb, cr)

    def run(**kw):
        cfg = CodecConfig(width=W, height=H, qp=32,
                          profile=Profile.VVC, rdoq=True, **kw)
        res = Encoder(cfg).encode([fr])
        cfg2, dec = Decoder().decode(res.bitstream)
        assert frame_md5(res.recon[0]) == frame_md5(dec[0])
        return res, cfg2

    res_d, _ = run()
    res_c, cfg2 = run(cclm=True)
    assert cfg2.cclm

    def csse(res):
        return (np.sum((res.recon[0].cb.astype(np.int64)
                        - cb.astype(np.int64)) ** 2)
                + np.sum((res.recon[0].cr.astype(np.int64)
                          - cr.astype(np.int64)) ** 2))

    assert sum(res_c.frame_bits) < sum(res_d.frame_bits)
    assert csse(res_c) < csse(res_d)
    run(cclm=True, mts=True, transform_skip=True)

    # GOP stream: CCLM on the I pictures, P pictures untouched
    frames = synthetic_clip(W, H, 3, kind="mixed", seed=7)
    cfg = CodecConfig(width=W, height=H, qp=32, profile=Profile.VVC,
                      cclm=True, intra_period=2, deblock=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for a, b in zip(res.recon, dec):
        assert frame_md5(a) == frame_md5(b)
