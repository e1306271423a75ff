"""Multi-reference low-delay GPB (C16 multi_ref) tests."""

import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip


def _cfg(**kw):
    return CodecConfig(width=128, height=64, qp=32, intra_period=8,
                       multi_ref=True, rdoq=True, **kw)


def test_gpb_roundtrip_bitexact():
    from x266_tpu.api import Decoder, Encoder

    cfg = _cfg(deblock=True, sao=True)
    frames = synthetic_clip(128, 64, 6, kind="mixed", seed=13)
    res = Encoder(cfg, with_recon=True).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    assert len(dec) == 6
    for i, (r, d) in enumerate(zip(res.recon, dec)):
        assert frame_md5(r) == frame_md5(d), f"frame {i}"


def test_gpb_uses_l1_or_bi():
    """The second reference must actually be used somewhere."""
    from x266_tpu.core.nal import NalType, split_nals
    from x266_tpu.api import Encoder
    from x266_tpu.cabac import syntax as sx
    from x266_tpu.config import SliceType
    from x266_tpu.core import headers
    from x266_tpu.engine.picture import _parse_segments

    cfg = _cfg()
    frames = synthetic_clip(128, 64, 6, kind="mixed", seed=13)
    res = Encoder(cfg, with_recon=False).encode(frames)
    kinds = []
    for nal_type, rbsp in split_nals(res.bitstream):
        if nal_type not in (NalType.IDR, NalType.TRAIL):
            continue
        sh, off = headers.parse_slice_header(rbsp)
        if sh.slice_type != SliceType.B:
            continue
        payload = rbsp[off:]
        bounds = [0] + [int(e) for e in sh.entry_points] \
            + [len(payload) - 1]
        segs = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
        dec = _parse_segments(cfg, segs, is_p=True, is_b=True)
        kinds.append(dec.pred_map.copy())
    assert kinds, "no B slices in the GPB stream"
    allk = np.concatenate([k.ravel() for k in kinds])
    assert ((allk == sx.PRED_L1) | (allk == sx.PRED_BI)).any(), \
        "second reference never selected"


def test_gpb_rd_not_worse_than_p_chain():
    """Two references must not lose to the single-ref chain (same
    content, same QP): Pareto check with small tolerance."""
    from x266_tpu.api import Encoder

    frames = synthetic_clip(128, 64, 8, kind="mixed", seed=17)
    single = CodecConfig(width=128, height=64, qp=32, intra_period=8,
                         rdoq=True)
    r1 = Encoder(single, with_recon=False).encode(frames)
    r2 = Encoder(_cfg(), with_recon=False).encode(frames)
    b1, p1 = sum(r1.frame_bits), float(np.mean(r1.psnr_y(128, 64)))
    b2, p2 = sum(r2.frame_bits), float(np.mean(r2.psnr_y(128, 64)))
    assert not (b2 > b1 * 1.02 and p2 < p1 + 0.02), \
        f"GPB worse than P chain: {b1}/{p1:.2f} -> {b2}/{p2:.2f}"
