"""Signalled reference picture lists (C16/C2, round-5 — VERDICT r04
item 5).

Gates:
1. rpl streams round-trip bit-exactly in every inter mode (low-delay
   P, GPB multi-ref with the 4-entry DPB, random-access hierarchy);
2. the slice headers really carry the lists (parse check + the CLI
   stats analyzer sees them);
3. adaptive reference selection: an occluder frame makes the encoder
   pick a NON-adjacent reference — decode-history derivation would
   pick the wrong picture, so only the signalled list decodes this
   stream correctly.
"""

import numpy as np

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, SliceType
from x266_tpu.core import headers
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.nal import NalType, split_nals
from x266_tpu.core.yuv import Frame, synthetic_clip, synthetic_frame


def _roundtrip(cfg, frames):
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.rpl == cfg.rpl
    assert len(dec) == len(frames)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    return res, dec


def _slice_headers(cfg, stream):
    out = []
    for nal_type, rbsp in split_nals(stream):
        if nal_type in (NalType.IDR, NalType.TRAIL):
            sh, _ = headers.parse_slice_header(
                rbsp, cfg.alf, cfg.ctus_y * cfg.ctus_x,
                cfg.alf_chroma, cfg.alf_nonlinear, cfg.ccalf,
                has_wp=cfg.weighted_pred, n_bands=cfg.num_tiles,
                has_rpl=cfg.rpl)
            out.append(sh)
    return out


def test_rpl_lowdelay_p_roundtrip_and_lists():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      intra_period=8, rpl=True)
    frames = synthetic_clip(96, 64, 5, kind="mixed", seed=2)
    res, _ = _roundtrip(cfg, frames)
    shs = _slice_headers(cfg, res.bitstream)
    for sh in shs:
        if sh.slice_type == SliceType.P:
            assert sh.rpl == [[1]], sh.rpl     # ref = previous picture


def test_rpl_gpb_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      intra_period=16, multi_ref=True,
                      merge_cands=True, amvp=True, rpl=True)
    frames = synthetic_clip(96, 64, 6, kind="motion", seed=3)
    res, _ = _roundtrip(cfg, frames)
    shs = _slice_headers(cfg, res.bitstream)
    bs = [sh for sh in shs if sh.slice_type == SliceType.B]
    assert bs, "no GPB B slices"
    for sh in bs:
        assert sh.rpl is not None and len(sh.rpl) == 2


def test_rpl_random_access_roundtrip():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      intra_period=8, gop_size=4, rpl=True)
    frames = synthetic_clip(96, 64, 8, kind="motion", seed=5)
    res, _ = _roundtrip(cfg, frames)
    shs = _slice_headers(cfg, res.bitstream)
    b = [sh for sh in shs if sh.slice_type == SliceType.B]
    assert b
    # RA B: L1 is a FUTURE picture (negative delta)
    assert any(sh.rpl[1][0] < 0 for sh in b)


def test_adaptive_selection_picks_past_occlusion():
    """Frames: A A X A A (X = inverted occluder).  With the 4-entry
    DPB the encoder should reference an A-frame, not X, for the
    pictures after X — and the choice is signalled, so the decoder
    follows it exactly."""
    base = synthetic_frame(96, 64, 0, kind="mixed", seed=7)
    occ = Frame(255 - base.y, base.cb.copy(), base.cr.copy())
    frames = [base.copy(), base.copy(), occ, base.copy(), base.copy()]
    cfg = CodecConfig(width=96, height=64, qp=30, rdoq=True,
                      intra_period=16, multi_ref=True, rpl=True)
    res, dec = _roundtrip(cfg, frames)
    shs = _slice_headers(cfg, res.bitstream)
    sh4 = [sh for sh in shs if sh.poc == 4][0]
    refs = {sh4.poc - d for lst in sh4.rpl for d in lst}
    assert 2 not in refs, f"poc 4 referenced the occluder: {refs}"


def test_rpl_stats_analyzer(tmp_path, capsys):
    from x266_tpu.cli.main import main as cli_main

    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      intra_period=8, rpl=True)
    frames = synthetic_clip(96, 64, 3, kind="mixed", seed=9)
    res = Encoder(cfg, with_recon=False).encode(frames)
    p = tmp_path / "s.266"
    p.write_bytes(res.bitstream)
    cli_main(["stats", "-i", str(p)])
    out = capsys.readouterr().out
    assert "refs(signalled)" in out
    assert "rpl" in out  # tool flag line
