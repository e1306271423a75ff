"""WPP context inheritance (P6, round-5 — VERDICT r04 missing #7).

Gates:
1. bit-exact encode->decode round trip with cfg.ctx_inherit across
   slice types and with tiles (chain restarts per tile);
2. native and Python walkers emit IDENTICAL chained segment bytes
   (the snapshot layouts agree);
3. the point of the feature: at rows_per_segment=1 the inherited
   chain costs fewer bits than trained-init-only restarts.
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, synthetic_frame
from tests.test_syntax import random_maps


def _roundtrip(cfg, frames):
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.ctx_inherit == cfg.ctx_inherit
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    return res


def test_inherit_roundtrip_intra():
    cfg = CodecConfig(width=128, height=128, qp=32, rdoq=True,
                      rows_per_segment=1, ctx_inherit=True)
    _roundtrip(cfg, [synthetic_frame(128, 128, kind="mixed", seed=3)])


def test_inherit_roundtrip_lowdelay_p():
    cfg = CodecConfig(width=128, height=128, qp=32, rdoq=True,
                      intra_period=4, rows_per_segment=1,
                      ctx_inherit=True)
    _roundtrip(cfg, synthetic_clip(128, 128, 3, kind="motion", seed=5))


def test_inherit_roundtrip_tiled():
    cfg = CodecConfig(width=128, height=128, qp=32, rdoq=True,
                      tile_rows=1, rows_per_segment=1,
                      ctx_inherit=True)
    _roundtrip(cfg, [synthetic_frame(128, 128, kind="mixed", seed=7)])


@pytest.mark.skipif(not native_bind.available(),
                    reason="no native toolchain")
def test_native_matches_python_chained():
    from x266_tpu.cabac.contexts import NUM_CONTEXTS

    cfg = CodecConfig(width=128, height=192, rows_per_segment=1,
                      ctx_inherit=True)
    rng = np.random.default_rng(4)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.3, 48)
    rows = cfg.segment_ctu_rows()
    assert len(rows) == 3
    # python chain
    enc = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr)
    py, prev = [], None
    for i, (r0, r1) in enumerate(rows):
        py.append(enc.encode_segment(r0, r1, init_states=prev,
                                     snapshot=i < len(rows) - 1))
        prev = enc.snapshot
    # native chain
    nat, prevn = [], None
    for i, (r0, r1) in enumerate(rows):
        snap = (np.zeros(2 * NUM_CONTEXTS, np.int32)
                if i < len(rows) - 1 else None)
        nat.append(native_bind.encode_segment(
            cfg, sm, mm, cy, ccb, ccr, r0, r1,
            init_states=prevn, snapshot=snap))
        prevn = snap
    assert nat == py
    # cross-decode: python decoder consumes the native chain
    dec = SyntaxDecoder(cfg)
    prev = None
    for i, ((r0, r1), data) in enumerate(zip(rows, nat)):
        dec.decode_segment(data, r0, r1, init_states=prev,
                           snapshot=i < len(rows) - 1)
        prev = dec.snapshot
    assert (dec.coef["y"] == cy).all()


def test_inherit_saves_bits():
    cfg0 = CodecConfig(width=256, height=256, qp=32, rdoq=True,
                       rows_per_segment=1)
    frames = [synthetic_frame(256, 256, kind="mixed", seed=11)]
    base = Encoder(cfg0, with_recon=False).encode(frames)
    inh = Encoder(cfg0.replace(ctx_inherit=True),
                  with_recon=False).encode(frames)
    one = Encoder(cfg0.replace(rows_per_segment=0),
                  with_recon=False).encode(frames)
    # inheritance must close most of the per-segment restart cost:
    # bits(inherit) - bits(1 segment) <= half of bits(init) - bits(1)
    gap_init = base.total_bits - one.total_bits
    gap_inh = inh.total_bits - one.total_bits
    assert inh.total_bits < base.total_bits, (
        inh.total_bits, base.total_bits)
    assert gap_inh <= 0.5 * gap_init + 64, (gap_inh, gap_init)
