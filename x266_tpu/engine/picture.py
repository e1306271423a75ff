"""Per-picture encode/decode orchestration (SURVEY.md §3.1/§3.2).

Pipeline per tile band (tiles are independent sub-pictures, P2):
  encode: Pass A (parallel mode decision, TPU) -> Pass B (normative recon
  scan, TPU) -> loop filters (deblock C13, SAO C14) -> per-segment entropy
  coding (native/host) -> slice RBSP with entry points.
  decode mirrors it.
The host/device boundary crossings match SURVEY.md §3.4: pixels down,
decision maps + coefficient planes back, NAL bytes assembled on host.
Tile bands make the serial reconstruction scan parallel across chips
(shard/parallel_encode) with bit-identical output vs one device.
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


@dataclass
class TileData:
    """Device-pass outputs for one tile band (pre-entropy)."""
    cfg: CodecConfig               # band-local config
    size_map: np.ndarray
    mode_map: np.ndarray
    coef_y: np.ndarray
    coef_cb: np.ndarray
    coef_cr: np.ndarray
    recon: Frame                   # filtered reconstruction of the band
    sao_params: tuple | None


def _to_frame(y, cb, cr) -> Frame:
    return Frame(np.asarray(y).astype(np.uint8),
                 np.asarray(cb).astype(np.uint8),
                 np.asarray(cr).astype(np.uint8))


def tile_compute(cfg: CodecConfig, band: Frame) -> TileData:
    """Device passes for one tile band: mode decision, recon, filters,
    SAO estimation.  cfg must be the band-local config."""
    y_plane = pad_plane(band.y.astype(np.int32))
    cb_plane = pad_plane(band.cb.astype(np.int32))
    cr_plane = pad_plane(band.cr.astype(np.int32))

    size_map, mode_map = make_mode_decision(cfg)(y_plane)
    out = make_recon_pass(cfg, encode=True)(
        y_plane, cb_plane, cr_plane, size_map, mode_map)
    coef_y, coef_cb, coef_cr = (np.asarray(p) for p in out[3:6])

    y, cb, cr = (np.asarray(p).astype(np.int32)
                 for p in extract_frame(cfg, out))
    if cfg.deblock:
        y, cb, cr = (np.asarray(p)
                     for p in make_deblock(cfg)(y, cb, cr, size_map))
    sao_params = None
    if cfg.sao:
        st, sb, so = make_sao_estimate(cfg)(band.y.astype(np.int32), y)
        sao_params = (np.asarray(st), np.asarray(sb), np.asarray(so))
        y = make_sao_apply(cfg)(y, *sao_params)

    return TileData(cfg, np.asarray(size_map), np.asarray(mode_map),
                    coef_y, coef_cb, coef_cr, _to_frame(y, cb, cr),
                    sao_params)


def tile_entropy(td: TileData) -> list[bytes]:
    """Entropy-code one tile band -> its segment payloads (host/native)."""
    cfg = td.cfg
    if native_bind.available():
        return [native_bind.encode_segment(
            cfg, td.size_map, td.mode_map, td.coef_y, td.coef_cb,
            td.coef_cr, r0, r1, td.sao_params)
            for (r0, r1) in cfg.segment_ctu_rows()]
    enc = SyntaxEncoder(cfg, td.size_map, td.mode_map, td.coef_y,
                        td.coef_cb, td.coef_cr, td.sao_params)
    return [enc.encode_segment(r0, r1)
            for (r0, r1) in cfg.segment_ctu_rows()]


def split_bands(cfg: CodecConfig, frame: Frame) -> list[Frame]:
    return [Frame(frame.y[y0:y1], frame.cb[y0 // 2:y1 // 2],
                  frame.cr[y0 // 2:y1 // 2])
            for (y0, y1) in cfg.tile_bands()]


def assemble_slice(cfg: CodecConfig, poc: int,
                   segments: list[bytes]) -> bytes:
    entry_points = list(np.cumsum([len(s) for s in segments[:-1]]))
    payload = b"".join(segments) + b"\x80"   # stop byte: RBSP can't end 00
    sh = SliceHeader(SliceType.I, poc=poc, qp=cfg.qp,
                     entry_points=[int(e) for e in entry_points])
    return write_slice_header(sh) + payload


def encode_picture(cfg: CodecConfig, frame: Frame, poc: int
                   ) -> tuple[bytes, Frame]:
    """Returns (slice RBSP, reconstructed picture)."""
    tiles = [tile_compute(cfg.tile_cfg(b), band)
             for b, band in zip(cfg.tile_bands(),
                                split_bands(cfg, frame))]
    segments = [seg for td in tiles for seg in tile_entropy(td)]
    recon = Frame(np.concatenate([t.recon.y for t in tiles]),
                  np.concatenate([t.recon.cb for t in tiles]),
                  np.concatenate([t.recon.cr for t in tiles]))
    return assemble_slice(cfg, poc, segments), recon


def tile_decode(cfg: CodecConfig, segments: list[bytes]) -> Frame:
    """Decode one tile band from its segment payloads (band-local cfg)."""
    dec = SyntaxDecoder(cfg)
    rows = cfg.segment_ctu_rows()
    assert len(segments) == len(rows)
    if native_bind.available():
        for (r0, r1), data in zip(rows, segments):
            native_bind.decode_segment(
                cfg, dec.size_map, dec.mode_map, dec.coef["y"],
                dec.coef["cb"], dec.coef["cr"], r0, r1, data,
                sao_params=dec.sao)
    else:
        for (r0, r1), data in zip(rows, segments):
            dec.decode_segment(data, r0, r1)

    out = make_recon_pass(cfg, encode=False)(
        dec.coef["y"], dec.coef["cb"], dec.coef["cr"],
        dec.size_map, dec.mode_map)
    y, cb, cr = (np.asarray(p).astype(np.int32)
                 for p in extract_frame(cfg, out))
    if cfg.deblock:
        y, cb, cr = (np.asarray(p)
                     for p in make_deblock(cfg)(y, cb, cr, dec.size_map))
    if cfg.sao:
        y = make_sao_apply(cfg)(y, *dec.sao)
    return _to_frame(y, cb, cr)


def decode_picture(cfg: CodecConfig, sh: SliceHeader,
                   payload: bytes) -> Frame:
    """payload: slice RBSP after the header (incl. trailing stop byte)."""
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    segments = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
    bands = cfg.tile_bands()
    # distribute segments to tiles: each tile has its band-local count
    tiles: list[Frame] = []
    idx = 0
    for band in bands:
        bcfg = cfg.tile_cfg(band)
        n = bcfg.num_segments
        tiles.append(tile_decode(bcfg, segments[idx:idx + n]))
        idx += n
    if idx != len(segments):
        raise ValueError("segment count mismatch")
    return Frame(np.concatenate([t.y for t in tiles]),
                 np.concatenate([t.cb for t in tiles]),
                 np.concatenate([t.cr for t in tiles]))
