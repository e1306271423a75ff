"""Per-picture encode/decode orchestration (SURVEY.md §3.1/§3.2).

encode_picture: Pass A (parallel mode decision, TPU) -> Pass B (normative
recon scan, TPU) -> per-segment entropy coding (host, serial layer) ->
slice RBSP with entry points.  decode_picture mirrors it: parse segments
-> Pass B -> output picture.  The host/device boundary crossings match
SURVEY.md §3.4: pixels down, decision maps + coefficient planes back, NAL
bytes assembled on host.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig, SliceType
from x266_tpu.core.headers import SliceHeader, write_slice_header
from x266_tpu.core.yuv import Frame
from x266_tpu.engine.mode_decision import make_mode_decision, pad_plane
from x266_tpu.engine.recon import extract_frame, make_recon_pass
from x266_tpu.kernels.deblock import make_deblock
from x266_tpu.kernels.sao import make_sao_apply, make_sao_estimate


def _deblock_stage(cfg: CodecConfig, out, size_map):
    """(y, cb, cr) int arrays after the deblocking filter (C13)."""
    y, cb, cr = (np.asarray(p).astype(np.int32)
                 for p in extract_frame(cfg, out))
    if cfg.deblock:
        y, cb, cr = (np.asarray(p) for p in make_deblock(cfg)(
            y, cb, cr, size_map))
    return y, cb, cr


def _to_frame(y, cb, cr) -> Frame:
    return Frame(np.asarray(y).astype(np.uint8),
                 np.asarray(cb).astype(np.uint8),
                 np.asarray(cr).astype(np.uint8))


@dataclass
class PictureStats:
    bits: int
    psnr_y: float
    psnr_cb: float
    psnr_cr: float
    size_histogram: dict


def encode_picture(cfg: CodecConfig, frame: Frame, poc: int
                   ) -> tuple[bytes, Frame]:
    """Returns (slice RBSP, reconstructed picture)."""
    y_plane = pad_plane(frame.y.astype(np.int32))
    cb_plane = pad_plane(frame.cb.astype(np.int32))
    cr_plane = pad_plane(frame.cr.astype(np.int32))

    size_map, mode_map = make_mode_decision(cfg)(y_plane)

    out = make_recon_pass(cfg, encode=True)(
        y_plane, cb_plane, cr_plane, size_map, mode_map)
    coef_y, coef_cb, coef_cr = (np.asarray(p) for p in out[3:6])

    y, cb, cr = _deblock_stage(cfg, out, size_map)
    sao_params = None
    if cfg.sao:
        st, sb, so = make_sao_estimate(cfg)(
            frame.y.astype(np.int32), y)
        sao_params = (np.asarray(st), np.asarray(sb), np.asarray(so))
        y = make_sao_apply(cfg)(y, *sao_params)
    recon = _to_frame(y, cb, cr)

    sm, mm = np.asarray(size_map), np.asarray(mode_map)
    if native_bind.available():
        segments = [native_bind.encode_segment(
            cfg, sm, mm, coef_y, coef_cb, coef_cr, r0, r1, sao_params)
            for (r0, r1) in cfg.segment_ctu_rows()]
    else:
        enc = SyntaxEncoder(cfg, sm, mm, coef_y, coef_cb, coef_cr,
                            sao_params)
        segments = [enc.encode_segment(r0, r1)
                    for (r0, r1) in cfg.segment_ctu_rows()]
    entry_points = list(np.cumsum([len(s) for s in segments[:-1]]))
    payload = b"".join(segments) + b"\x80"   # stop byte: RBSP can't end 00

    sh = SliceHeader(SliceType.I, poc=poc, qp=cfg.qp,
                     entry_points=[int(e) for e in entry_points])
    return write_slice_header(sh) + payload, recon


def decode_picture(cfg: CodecConfig, sh: SliceHeader,
                   payload: bytes) -> Frame:
    """payload: slice RBSP after the header (incl. trailing stop byte)."""
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    rows = cfg.segment_ctu_rows()
    assert len(bounds) - 1 == len(rows), "segment count mismatch"

    dec = SyntaxDecoder(cfg)
    if native_bind.available():
        for (r0, r1), b0, b1 in zip(rows, bounds[:-1], bounds[1:]):
            native_bind.decode_segment(
                cfg, dec.size_map, dec.mode_map, dec.coef["y"],
                dec.coef["cb"], dec.coef["cr"], r0, r1, payload[b0:b1],
                sao_params=dec.sao)
    else:
        for (r0, r1), b0, b1 in zip(rows, bounds[:-1], bounds[1:]):
            dec.decode_segment(payload[b0:b1], r0, r1)

    out = make_recon_pass(cfg, encode=False)(
        dec.coef["y"], dec.coef["cb"], dec.coef["cr"],
        dec.size_map, dec.mode_map)
    y, cb, cr = _deblock_stage(cfg, out, dec.size_map)
    if cfg.sao:
        y = make_sao_apply(cfg)(y, *dec.sao)
    return _to_frame(y, cb, cr)
