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
from x266_tpu.engine import fused


@dataclass
class TileData:
    """Device-pass outputs for one tile band (pre-entropy)."""
    cfg: CodecConfig               # band-local config
    size_map: np.ndarray
    mode_map: np.ndarray
    coef_y: np.ndarray
    coef_cb: np.ndarray
    coef_cr: np.ndarray
    recon: Frame | None            # filtered recon (None if not fetched)
    sao_params: tuple | None
    mts_map: np.ndarray | None = None
    sse: np.ndarray | None = None  # device-computed (3,) SSE vs source
    alf: tuple | None = None       # (flags (Cy,Cx), coeffs (25,12))


def _to_frame(y, cb, cr) -> Frame:
    return Frame(np.asarray(y).astype(np.uint8),
                 np.asarray(cb).astype(np.uint8),
                 np.asarray(cr).astype(np.uint8))


def tile_compute_async(cfg: CodecConfig, band: Frame,
                       with_recon: bool = True, device=None):
    """Dispatch one tile band's fused device step (mode decision, MTS,
    recon, deblock, SAO, distortion — ONE jit call) WITHOUT blocking;
    returns a zero-arg finalize() -> TileData that downloads the
    results.  Dispatching every band/frame before finalizing any lets
    device compute overlap host downloads and entropy coding (critical
    on high-latency remote-attached chips)."""
    import jax

    packed = fused.pack_input(cfg, band)
    if device is not None:
        packed = jax.device_put(packed, device)
    out = fused.make_encode_step(cfg, with_recon)(packed)

    def finalize() -> TileData:
        stats = np.asarray(out[2])
        sse = stats[:3]
        full = fused.fetch_coefs(cfg, out[0], stats)
        cy, ccb, ccr = fused.unpack_coefs(cfg, full)
        maps = fused.unpack_maps(cfg, np.asarray(out[1]), inter=False)
        recon = (fused.unpack_recon(cfg, np.asarray(out[3]))
                 if with_recon else None)
        sao_params = ((maps["sao_type"], maps["sao_band"],
                       maps["sao_off"]) if cfg.sao else None)
        alf = ((maps["alf_flag"], maps["alf_coef"],
                maps["alf_cflag"], maps["alf_ccoef"],
                maps["alf_clip"], maps["alf_cclip"],
                maps["ccalf_coef"], maps["ccalf_flag"])
               if cfg.alf else None)
        return TileData(cfg, maps["size"], maps["mode"], cy, ccb, ccr,
                        recon, sao_params, maps["mts"], sse, alf)

    return finalize


def tile_compute(cfg: CodecConfig, band: Frame, with_recon: bool = True,
                 device=None) -> TileData:
    """Blocking convenience wrapper over tile_compute_async."""
    return tile_compute_async(cfg, band, with_recon, device)()


def _finalize_one(cfg, out, with_recon) -> TileData:
    """Unpack one frame's (full coef plane, flat, sse[, recon]) group
    -> TileData.  Everything is already host-side numpy here: the
    batched caller downloads whole-batch arrays in one transfer each,
    reconstructs coef planes and slices per frame."""
    full, flat, stats = out[0], out[1], out[2]
    cy, ccb, ccr = fused.unpack_coefs(
        cfg, full.astype(np.int32, copy=False))
    sse = stats[:3]
    maps = fused.unpack_maps(cfg, np.asarray(flat), inter=False)
    recon = (fused.unpack_recon(cfg, np.asarray(out[3]))
             if with_recon else None)
    sao_params = ((maps["sao_type"], maps["sao_band"], maps["sao_off"])
                  if cfg.sao else None)
    alf = ((maps["alf_flag"], maps["alf_coef"],
            maps["alf_cflag"], maps["alf_ccoef"], maps["alf_clip"],
            maps["alf_cclip"], maps["ccalf_coef"],
            maps["ccalf_flag"]) if cfg.alf else None)
    return TileData(cfg, maps["size"], maps["mode"], cy, ccb, ccr,
                    recon, sao_params, maps["mts"], sse, alf)


def tiles_compute_batched_async(cfg: CodecConfig, frames: list[Frame],
                                with_recon: bool = True):
    """Dispatch a CHUNK of all-intra single-tile frames as ONE vmapped
    device call; returns finalize() -> list[TileData] (one per frame).
    F frames share the reconstruction scan's sequential latency."""
    import jax

    packed = np.stack([fused.pack_input(cfg, f) for f in frames])
    out = fused.make_encode_step_i_batched(cfg, with_recon)(packed)
    blob_dev = None
    if not cfg.lossless:
        # one-buffer wire: nib+esc+flat+stats concatenated on device so
        # the host pays ONE tunnel round trip for the whole chunk
        blob_dev = fused.make_wire_blob_batched(cfg)(
            out[0][0], out[0][1][0], out[0][1][1], out[1], out[2])

    def finalize() -> list[TileData]:
        if cfg.lossless:
            fulls = np.asarray(out[0])
            stats = np.asarray(out[2])
            flat = np.asarray(out[1])
        else:
            blob = np.asarray(blob_dev)
            per_frame = [fused.unpack_blob(cfg, blob[i])
                         for i in range(len(frames))]
            stats = np.stack([p[4] for p in per_frame])
            flat = np.stack([p[3] for p in per_frame])
            fulls = []
            for i, (nib, vals, cols, _f, st) in enumerate(per_frame):
                if st[3] == 0:
                    fulls.append(fused.reconstruct_coefs_nib(
                        nib, vals, cols))
                else:
                    # rare overflow: fetch this frame's byte planes
                    hi = (np.asarray(out[0][3][i])
                          if st[4] > 0 else None)
                    fulls.append(fused.reconstruct_coefs(
                        np.asarray(out[0][2][i]), hi))
        rec = np.asarray(out[3]) if with_recon else None
        tds = []
        for i in range(len(frames)):
            per = (fulls[i], flat[i], stats[i]) + (
                (rec[i],) if with_recon else ())
            tds.append(_finalize_one(cfg, per, with_recon))
        return tds

    return finalize


def code_segments(cfg: CodecConfig, size_map, mode_map, cy, ccb, ccr,
                  sao_params=None, mts_map=None,
                  inter_maps=None) -> list[bytes]:
    """Entropy-code a tile's segments in order, chaining WPP context
    inheritance when cfg.ctx_inherit (P6 round-5): segment i > 0
    initializes from the snapshot of segment i-1's states after its
    first min(2, ctus_x) CTUs; segment 0 uses the trained init."""
    from x266_tpu.cabac.contexts import NUM_CONTEXTS

    rows = cfg.segment_ctu_rows()
    inherit = cfg.ctx_inherit and len(rows) > 1
    segs: list[bytes] = []
    prev = None
    if native_bind.available():
        for i, (r0, r1) in enumerate(rows):
            snap = (np.zeros(2 * NUM_CONTEXTS, np.int32)
                    if inherit and i < len(rows) - 1 else None)
            segs.append(native_bind.encode_segment(
                cfg, size_map, mode_map, cy, ccb, ccr, r0, r1,
                sao_params, mts_map, inter_maps,
                init_states=prev, snapshot=snap))
            prev = snap
        return segs
    is_p = inter_maps is not None and len(inter_maps) == 3
    is_b = inter_maps is not None and len(inter_maps) == 5
    enc = SyntaxEncoder(
        cfg, size_map, mode_map, cy, ccb, ccr, sao_params, mts_map,
        is_p=is_p, is_b=is_b,
        pred_map=inter_maps[0] if inter_maps else None,
        mvx_map=inter_maps[1] if inter_maps else None,
        mvy_map=inter_maps[2] if inter_maps else None,
        mvx1_map=inter_maps[3] if is_b else None,
        mvy1_map=inter_maps[4] if is_b else None)
    for i, (r0, r1) in enumerate(rows):
        segs.append(enc.encode_segment(
            r0, r1, init_states=prev,
            snapshot=inherit and i < len(rows) - 1))
        prev = enc.snapshot
    return segs


def tile_entropy(td: TileData) -> list[bytes]:
    """Entropy-code one tile band -> its segment payloads (host/native)."""
    return code_segments(td.cfg, td.size_map, td.mode_map, td.coef_y,
                         td.coef_cb, td.coef_cr, td.sao_params,
                         td.mts_map)


def split_bands(cfg: CodecConfig, frame: Frame) -> list[Frame]:
    return [Frame(frame.y[y0:y1], frame.cb[y0 // 2:y1 // 2],
                  frame.cr[y0 // 2:y1 // 2])
            for (y0, y1) in cfg.tile_bands()]


def split_rects(cfg: CodecConfig, frame: Frame) -> list[Frame]:
    """Row-major rect crops for the 2-D tile grid (== split_bands when
    tile_cols is 0)."""
    return [Frame(frame.y[y0:y1, x0:x1],
                  frame.cb[y0 // 2:y1 // 2, x0 // 2:x1 // 2],
                  frame.cr[y0 // 2:y1 // 2, x0 // 2:x1 // 2])
            for (y0, y1, x0, x1) in cfg.tile_rects()]


def stitch_rects(cfg: CodecConfig, parts: list[Frame]) -> Frame:
    """Row-major per-rect Frames -> whole picture (2-D inverse of
    split_rects)."""
    nx = cfg.num_tile_cols
    rows_y, rows_cb, rows_cr = [], [], []
    for i in range(0, len(parts), nx):
        row = parts[i:i + nx]
        rows_y.append(np.concatenate([p.y for p in row], axis=1))
        rows_cb.append(np.concatenate([p.cb for p in row], axis=1))
        rows_cr.append(np.concatenate([p.cr for p in row], axis=1))
    return Frame(np.concatenate(rows_y), np.concatenate(rows_cb),
                 np.concatenate(rows_cr))


def band_alf_tuple(maps: dict) -> tuple:
    """A band's unpacked maps -> the TileData.alf parameter tuple."""
    return (maps["alf_flag"], maps["alf_coef"], maps["alf_cflag"],
            maps["alf_ccoef"], maps["alf_clip"], maps["alf_cclip"],
            maps["ccalf_coef"], maps["ccalf_flag"])


def assemble_slice(cfg: CodecConfig, poc: int, segments: list[bytes],
                   slice_type: SliceType = SliceType.I,
                   alf: tuple | list | None = None,
                   wp: list[int] | None = None,
                   ref_pocs: list[list[int]] | None = None) -> bytes:
    """alf: the per-band ALF parameter tuples — a list with one tuple
    per tile band (band-major header layout, SliceHeader docstring), or
    a bare tuple for the common single-band case.  ref_pocs: the
    active reference POCs per list ([[L0], [L1]] for B) — signalled as
    POC deltas when cfg.rpl (C16 signalled RPL, round-5)."""
    entry_points = list(np.cumsum([len(s) for s in segments[:-1]]))
    payload = b"".join(segments) + b"\x80"   # stop byte: RBSP can't end 00
    coeffs = flags = ccoeffs = cflags = None
    clips = cclips = cc_coeffs = cc_flags = None
    if cfg.alf:
        bands = cfg.tile_rects()
        if alf is None:
            def zeros_band(b):
                bcfg = cfg.tile_cfg(b)
                zf = np.zeros((bcfg.ctus_y, bcfg.ctus_x), np.int32)
                return (zf, np.zeros((25, 12), np.int32),
                        np.zeros((2,) + zf.shape, np.int32),
                        np.zeros((2, 6), np.int32),
                        np.zeros(25, np.int32), np.zeros(2, np.int32),
                        np.zeros((2, 7), np.int32),
                        np.zeros((2,) + zf.shape, np.int32))
            alf = [zeros_band(b) for b in bands]
        elif isinstance(alf, tuple):
            alf = [alf]
        assert len(alf) == len(bands), (len(alf), len(bands))
        coeffs, flags, clips = [], [], []
        ccoeffs, cflags, cclips = [], [], []
        cc_coeffs, cc_flags = [], []
        for a in alf:
            coeffs += [int(v) for v in np.asarray(a[1]).ravel()]
            flags += [int(v) for v in np.asarray(a[0]).ravel()]
            if cfg.alf_nonlinear:
                clips += [int(v) for v in np.asarray(a[4]).ravel()]
            if cfg.alf_chroma:
                ccoeffs += [int(v) for v in np.asarray(a[3]).ravel()]
                cflags += [int(v) for v in np.asarray(a[2]).ravel()]
                if cfg.alf_nonlinear:
                    cclips += [int(v) for v in np.asarray(a[5]).ravel()]
            if cfg.ccalf:
                cc_coeffs += [int(v) for v in np.asarray(a[6]).ravel()]
                cc_flags += [int(v) for v in np.asarray(a[7]).ravel()]
        if not cfg.alf_nonlinear:
            clips = cclips = None
        if not cfg.alf_chroma:
            ccoeffs = cflags = cclips = None
        if not cfg.ccalf:
            cc_coeffs = cc_flags = None
    rpl = None
    if cfg.rpl and slice_type != SliceType.I and ref_pocs is not None:
        rpl = [[poc - rp for rp in lst] for lst in ref_pocs]
    sh = SliceHeader(slice_type, poc=poc, qp=cfg.qp,
                     entry_points=[int(e) for e in entry_points],
                     alf_coeffs=coeffs, alf_flags=flags,
                     alf_ccoeffs=ccoeffs, alf_cflags=cflags,
                     alf_clips=clips, alf_cclips=cclips,
                     ccalf_coeffs=cc_coeffs, ccalf_flags=cc_flags,
                     wp=(None if slice_type == SliceType.I else wp),
                     rpl=rpl,
                     rpl_expected=(cfg.rpl
                                   and slice_type != SliceType.I))
    return write_slice_header(sh) + payload


def encode_picture(cfg: CodecConfig, frame: Frame, poc: int,
                   with_recon: bool = True
                   ) -> tuple[bytes, Frame | None, np.ndarray]:
    """Returns (slice RBSP, reconstructed picture or None, sse (3,))."""
    tiles = [tile_compute(cfg.tile_cfg(r), part, with_recon)
             for r, part in zip(cfg.tile_rects(),
                                split_rects(cfg, frame))]
    segments = [seg for td in tiles for seg in tile_entropy(td)]
    recon = None
    if with_recon:
        recon = stitch_rects(cfg, [t.recon for t in tiles])
    sse = np.sum([t.sse for t in tiles], axis=0)
    return assemble_slice(cfg, poc, segments,
                          alf=([t.alf for t in tiles]
                               if cfg.alf else None)), recon, sse


def _parse_segments(cfg: CodecConfig, segments: list[bytes],
                    is_p: bool, is_b: bool = False) -> SyntaxDecoder:
    from x266_tpu.cabac.contexts import NUM_CONTEXTS

    dec = SyntaxDecoder(cfg)
    dec.is_p = is_p or is_b
    dec.is_b = is_b
    rows = cfg.segment_ctu_rows()
    assert len(segments) == len(rows)
    inherit = cfg.ctx_inherit and len(rows) > 1
    prev = None
    if native_bind.available():
        if is_b:
            imaps = (dec.pred_map, dec.mvx_map, dec.mvy_map,
                     dec.mvx1_map, dec.mvy1_map)
        elif is_p:
            imaps = (dec.pred_map, dec.mvx_map, dec.mvy_map)
        else:
            imaps = None
        for i, ((r0, r1), data) in enumerate(zip(rows, segments)):
            snap = (np.zeros(2 * NUM_CONTEXTS, np.int32)
                    if inherit and i < len(rows) - 1 else None)
            native_bind.decode_segment(
                cfg, dec.size_map, dec.mode_map, dec.coef["y"],
                dec.coef["cb"], dec.coef["cr"], r0, r1, data,
                sao_params=dec.sao, mts_map=dec.mts_map,
                inter_maps=imaps, init_states=prev, snapshot=snap)
            prev = snap
    else:
        for i, ((r0, r1), data) in enumerate(zip(rows, segments)):
            dec.decode_segment(data, r0, r1, init_states=prev,
                               snapshot=inherit and i < len(rows) - 1)
            prev = dec.snapshot
    return dec


def _alf_maps_from_header(cfg: CodecConfig, sh, bi: int = 0,
                          ctb_off: int = 0) -> dict:
    """Band bi's ALF maps from the band-major slice-header fields.

    cfg is the BAND config; ctb_off the number of CTBs in the bands
    before this one (0 for the single-band/whole-picture case, where
    this degenerates to the flat per-picture layout)."""
    n = cfg.ctus_y * cfg.ctus_x
    out = {"alf_flag": np.zeros((cfg.ctus_y, cfg.ctus_x), np.int32),
           "alf_coef": np.zeros((25, 12), np.int32),
           "alf_cflag": np.zeros((2, cfg.ctus_y, cfg.ctus_x), np.int32),
           "alf_ccoef": np.zeros((2, 6), np.int32),
           "alf_clip": np.zeros(25, np.int32),
           "alf_cclip": np.zeros(2, np.int32),
           "ccalf_coef": np.zeros((2, 7), np.int32),
           "ccalf_flag": np.zeros((2, cfg.ctus_y, cfg.ctus_x),
                                  np.int32)}
    if cfg.alf and sh is not None and sh.alf_coeffs is not None:
        out["alf_flag"] = np.asarray(
            sh.alf_flags[ctb_off:ctb_off + n], np.int32).reshape(
            cfg.ctus_y, cfg.ctus_x)
        out["alf_coef"] = np.asarray(
            sh.alf_coeffs[bi * 300:bi * 300 + 300], np.int32).reshape(
            25, 12)
        if cfg.alf_nonlinear and sh.alf_clips is not None:
            out["alf_clip"] = np.asarray(
                sh.alf_clips[bi * 25:bi * 25 + 25], np.int32)
    if cfg.alf_chroma and sh is not None and sh.alf_ccoeffs is not None:
        out["alf_cflag"] = np.asarray(
            sh.alf_cflags[2 * ctb_off:2 * ctb_off + 2 * n],
            np.int32).reshape(2, cfg.ctus_y, cfg.ctus_x)
        out["alf_ccoef"] = np.asarray(
            sh.alf_ccoeffs[bi * 12:bi * 12 + 12], np.int32).reshape(
            2, 6)
        if cfg.alf_nonlinear and sh.alf_cclips is not None:
            out["alf_cclip"] = np.asarray(
                sh.alf_cclips[bi * 2:bi * 2 + 2], np.int32)
    if cfg.ccalf and sh is not None and sh.ccalf_coeffs is not None:
        out["ccalf_coef"] = np.asarray(
            sh.ccalf_coeffs[bi * 14:bi * 14 + 14], np.int32).reshape(
            2, 7)
        out["ccalf_flag"] = np.asarray(
            sh.ccalf_flags[2 * ctb_off:2 * ctb_off + 2 * n],
            np.int32).reshape(2, cfg.ctus_y, cfg.ctus_x)
    return out


def tile_decode(cfg: CodecConfig, segments: list[bytes],
                sh=None, bi: int = 0, ctb_off: int = 0) -> Frame:
    """Decode one tile band from its segment payloads (band-local cfg):
    host entropy parse, then one fused device call.  bi/ctb_off locate
    the band's ALF section in the slice header (band-major layout)."""
    dec = _parse_segments(cfg, segments, is_p=False)

    coef = fused.pack_coefs_host(cfg, dec.coef["y"], dec.coef["cb"],
                                 dec.coef["cr"])
    flat = fused.pack_maps_host(cfg, {
        "size": dec.size_map, "mode": dec.mode_map, "mts": dec.mts_map,
        "sao_type": dec.sao[0], "sao_band": dec.sao[1],
        "sao_off": dec.sao[2], "pred": dec.pred_map,
        "mvx": dec.mvx_map, "mvy": dec.mvy_map,
        "mvx1": dec.mvx1_map, "mvy1": dec.mvy1_map,
        **_alf_maps_from_header(cfg, sh, bi, ctb_off)})
    rec = np.asarray(fused.make_decode_step(cfg)(coef, flat))
    return fused.unpack_recon(cfg, rec)


def decode_picture(cfg: CodecConfig, sh: SliceHeader,
                   payload: bytes) -> Frame:
    """payload: slice RBSP after the header (incl. trailing stop byte)."""
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    segments = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
    rects = cfg.tile_rects()
    # distribute segments to tiles: each tile has its tile-local count
    tiles: list[Frame] = []
    idx = 0
    ctb_off = 0
    for bi, rect in enumerate(rects):
        bcfg = cfg.tile_cfg(rect)
        n = bcfg.num_segments
        tiles.append(tile_decode(bcfg, segments[idx:idx + n], sh,
                                 bi, ctb_off))
        idx += n
        ctb_off += bcfg.ctus_y * bcfg.ctus_x
    if idx != len(segments):
        raise ValueError("segment count mismatch")
    return stitch_rects(cfg, tiles)


# ---- tiled inter decode (P2 + P4 mirror) -----------------------------------

def refs_from_frame(frame: Frame):
    """Host Frame -> device (Y, Cb, Cr) reference planes (tiled DPB)."""
    import jax.numpy as jnp

    return (jnp.asarray(frame.y), jnp.asarray(frame.cb),
            jnp.asarray(frame.cr))


def decode_picture_inter_tiled(cfg: CodecConfig, sh: SliceHeader,
                               payload: bytes, refs0, refs1=None):
    """Tile-band P/B decode with halo-extended references (the decoder
    mirror of shard/tiled_gop).  refs = full (Y, Cb, Cr) device planes.
    Returns (Frame, new_refs)."""
    import jax.numpy as jnp

    from x266_tpu.engine.fused import (make_decode_step_b_band,
                                       make_decode_step_b_rect,
                                       make_decode_step_p_band,
                                       make_decode_step_p_rect)

    two_d = cfg.num_tile_cols > 1
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    segments = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
    idx = 0
    ctb_off = 0
    rec_tiles = []
    bcfgs = []
    for bi, rect in enumerate(cfg.tile_rects()):
        bcfg = cfg.tile_cfg(rect)
        bcfgs.append(bcfg)
        n = bcfg.num_segments
        dec = _parse_segments(bcfg, segments[idx:idx + n], is_p=True,
                              is_b=refs1 is not None)
        idx += n
        coef = fused.pack_coefs_host(bcfg, dec.coef["y"],
                                     dec.coef["cb"], dec.coef["cr"])
        flat = fused.pack_maps_host(bcfg, {
            "size": dec.size_map, "mode": dec.mode_map,
            "mts": dec.mts_map, "sao_type": dec.sao[0],
            "sao_band": dec.sao[1], "sao_off": dec.sao[2],
            "pred": dec.pred_map, "mvx": dec.mvx_map,
            "mvy": dec.mvy_map, "mvx1": dec.mvx1_map,
            "mvy1": dec.mvy1_map,
            **_alf_maps_from_header(bcfg, sh, bi, ctb_off)})
        ctb_off += bcfg.ctus_y * bcfg.ctus_x
        y0, x0 = np.int32(rect[0]), np.int32(rect[2])
        wp_args = ()
        if cfg.weighted_pred:
            ident = [64, 0, 64, 0] * (2 if refs1 is not None else 1)
            wpa = np.asarray(sh.wp if sh.wp is not None else ident,
                             np.int32)
            wp_args = ((wpa.reshape(2, 4),) if refs1 is not None
                       else (wpa,))
        if two_d:
            if refs1 is None:
                rec = make_decode_step_p_rect(bcfg)(
                    coef, flat, y0, x0, *refs0, *wp_args)
            else:
                rec = make_decode_step_b_rect(bcfg)(
                    coef, flat, y0, x0, *refs0, *refs1, *wp_args)
        elif refs1 is None:
            rec = make_decode_step_p_band(bcfg)(coef, flat, y0,
                                                *refs0, *wp_args)
        else:
            rec = make_decode_step_b_band(bcfg)(coef, flat, y0,
                                                *refs0, *refs1,
                                                *wp_args)
        rec_tiles.append(rec)
    if idx != len(segments):
        raise ValueError("segment count mismatch")

    def stitch(parts):
        nx = cfg.num_tile_cols
        return jnp.concatenate(
            [jnp.concatenate(parts[i:i + nx], axis=1)
             for i in range(0, len(parts), nx)], axis=0)

    new_refs = (
        stitch([r[:b.height] for b, r in zip(bcfgs, rec_tiles)]),
        stitch([r[b.height:, :b.width // 2]
                for b, r in zip(bcfgs, rec_tiles)]),
        stitch([r[b.height:, b.width // 2:]
                for b, r in zip(bcfgs, rec_tiles)]))
    parts = [fused.unpack_recon(b, np.asarray(r))
             for b, r in zip(bcfgs, rec_tiles)]
    return stitch_rects(cfg, parts), new_refs


# ---- GOP / P-picture pipeline (M3, low-delay P, single tile v1) -----------

def _finalize_common(cfg, out, with_recon, n_fixed=3, inter=True):
    """Shared unpack of a fused encode step's outputs."""
    stats = np.asarray(out[2])
    sse = stats[:3]
    full = fused.fetch_coefs(cfg, out[0], stats)
    cy, ccb, ccr = fused.unpack_coefs(cfg, full)
    maps = fused.unpack_maps(cfg, np.asarray(out[1]), inter=inter)
    recon = (fused.unpack_recon(cfg, np.asarray(out[n_fixed]))
             if with_recon else None)
    return cy, ccb, ccr, maps, sse, recon


def encode_picture_gop_async(cfg: CodecConfig, frame: Frame, poc: int,
                             pyramids, with_recon: bool = True,
                             device=None, wp=None, ref_poc=None):
    """Dispatch one GOP picture's device step WITHOUT blocking.

    Returns (finalize, new_pyramids, slice_type): new_pyramids are
    device-resident immediately (the only dependency of the NEXT
    frame's dispatch), so callers can pipeline device compute against
    the host downloads + entropy coding that finalize() performs
    (finalize() -> (rbsp, recon|None, sse)).
    """
    assert cfg.num_tiles == 1, "P pictures support single tile in v1"
    is_p = (pyramids is not None and cfg.intra_period > 1
            and poc % cfg.intra_period != 0)
    packed = fused.pack_input(cfg, frame)
    if device is not None:
        import jax
        packed = jax.device_put(packed, device)
    if is_p:
        step = fused.make_encode_step_p(cfg, with_recon)
        if cfg.weighted_pred:
            import jax.numpy as jnp
            wp = list(wp) if wp is not None else [64, 0, 64, 0]
            out = step(packed, *pyramids,
                       jnp.asarray(wp, jnp.int32))
        else:
            out = step(packed, *pyramids)
    else:
        out = fused.make_encode_step_i(cfg, with_recon, True)(packed)
    new_pyr = out[-1]
    st = SliceType.P if is_p else SliceType.I

    def finalize():
        cy, ccb, ccr, maps, sse, recon = _finalize_common(
            cfg, out, with_recon, inter=is_p)
        sao_params = ((maps["sao_type"], maps["sao_band"],
                       maps["sao_off"]) if cfg.sao else None)
        inter_maps = ((maps["pred"], maps["mvx"], maps["mvy"])
                      if is_p else None)
        segments = code_segments(cfg, maps["size"], maps["mode"], cy,
                                 ccb, ccr, sao_params, maps["mts"],
                                 inter_maps)
        alf = ((maps["alf_flag"], maps["alf_coef"],
                maps["alf_cflag"], maps["alf_ccoef"], maps["alf_clip"],
                maps["alf_cclip"], maps["ccalf_coef"],
                maps["ccalf_flag"]) if cfg.alf else None)
        rbsp = assemble_slice(
            cfg, poc, segments, st, alf,
            wp=(wp if (is_p and cfg.weighted_pred) else None),
            ref_pocs=([[ref_poc]] if (is_p and ref_poc is not None)
                      else None))
        return rbsp, recon, sse

    return finalize, new_pyr, st


def encode_picture_gop(cfg: CodecConfig, frame: Frame, poc: int,
                       pyramids, with_recon: bool = True, device=None):
    """Encode one picture of a GOP stream (intra_period > 1).

    pyramids: previous picture's device pyramids or None (forces IDR).
    device: optional placement target (the GOP's DPB then lives there).
    Returns (rbsp, recon|None, sse, new_pyramids, slice_type).
    """
    fin, new_pyr, st = encode_picture_gop_async(
        cfg, frame, poc, pyramids, with_recon, device)
    rbsp, recon, sse = fin()
    return rbsp, recon, sse, new_pyr, st


def b_qp_offset(cfg: CodecConfig, poc: int) -> int:
    """Temporal-layer QP offset for an RA B picture (C17, HM-shaped):
    referenced (even-POC) Bs code at QP+1, hierarchy leaves at QP+3.
    Two tiers instead of per-depth offsets keeps the compiled step
    variants at the existing ref/leaf pair (4K compiles are minutes on
    a remote chip).  The slice header carries the QP, so decoding needs
    nothing new."""
    if cfg.lossless:
        return 0
    return 1 if poc % 2 == 0 else 3


def gop_coding_order(n: int, intra_period: int, gop: int
                     ) -> list[tuple[int, str]]:
    """Random-access coding order (C16): [(poc, kind)] with kind in
    "I"/"P"/"B".  Anchors sit at gop multiples — IDR when poc is an
    intra_period multiple, else P referencing the previous anchor —
    and the pocs between consecutive anchors code as hierarchical-B
    midpoints (each B references the nearest coded pictures below and
    above its POC).  A tail after the last anchor codes low-delay P.
    """
    order: list[tuple[int, str]] = []

    def mids(lo, hi):
        if hi - lo <= 1:
            return
        m = (lo + hi) // 2
        order.append((m, "B"))
        mids(lo, m)
        mids(m, hi)

    g = max(gop, 1)
    anchors = list(range(0, n, g))
    prev = None
    for a in anchors:
        kind = "I" if (intra_period <= 0 or a % intra_period == 0) \
            else "P"
        order.append((a, kind))
        if prev is not None:
            mids(prev, a)
        prev = a
    for p in range(anchors[-1] + 1, n):
        order.append((p, "P"))
    return order


def encode_picture_b_async(cfg: CodecConfig, frame: Frame, poc: int,
                           pyr0, pyr1, with_recon: bool = True,
                           with_pyramids: bool = True, wp=None,
                           ref_pocs=None):
    """Dispatch one B picture's device step WITHOUT blocking; see
    encode_picture_gop_async.  Returns (finalize, new_pyramids|None);
    finalize() -> (rbsp, recon|None, sse)."""
    assert cfg.num_tiles == 1, "B pictures support single tile in v1"
    packed = fused.pack_input(cfg, frame)
    stepb = fused.make_encode_step_b(cfg, with_recon, with_pyramids)
    if cfg.weighted_pred:
        import jax.numpy as jnp
        wp = ([list(wp[0]), list(wp[1])] if wp is not None
              else [[64, 0, 64, 0], [64, 0, 64, 0]])
        out = stepb(packed, *pyr0, *pyr1, jnp.asarray(wp, jnp.int32))
    else:
        out = stepb(packed, *pyr0, *pyr1)
    new_pyr = out[-1] if with_pyramids else None

    def finalize():
        cy, ccb, ccr, maps, sse, recon = _finalize_common(
            cfg, out, with_recon)
        sao_params = ((maps["sao_type"], maps["sao_band"],
                       maps["sao_off"]) if cfg.sao else None)
        inter_maps = (maps["pred"], maps["mvx"], maps["mvy"],
                      maps["mvx1"], maps["mvy1"])
        segments = code_segments(cfg, maps["size"], maps["mode"], cy,
                                 ccb, ccr, sao_params, maps["mts"],
                                 inter_maps)
        alf = ((maps["alf_flag"], maps["alf_coef"],
                maps["alf_cflag"], maps["alf_ccoef"], maps["alf_clip"],
                maps["alf_cclip"], maps["ccalf_coef"],
                maps["ccalf_flag"]) if cfg.alf else None)
        rbsp = assemble_slice(
            cfg, poc, segments, SliceType.B, alf,
            wp=([*wp[0], *wp[1]] if cfg.weighted_pred else None),
            ref_pocs=ref_pocs)
        return rbsp, recon, sse

    return finalize, new_pyr


def encode_picture_b(cfg: CodecConfig, frame: Frame, poc: int,
                     pyr0, pyr1, with_recon: bool = True,
                     with_pyramids: bool = True):
    """Encode one B picture against the L0/L1 DPB entries.

    Returns (rbsp, recon|None, sse, new_pyramids|None).  Leaf (odd-POC)
    B pictures are never referenced: with_pyramids=False skips their
    pyramid build and DPB entry (halves RA HBM at 4K)."""
    fin, new_pyr = encode_picture_b_async(cfg, frame, poc, pyr0, pyr1,
                                          with_recon, with_pyramids)
    rbsp, recon, sse = fin()
    return rbsp, recon, sse, new_pyr


def decode_picture_b(cfg: CodecConfig, sh: SliceHeader, payload: bytes,
                     pyr0, pyr1, with_pyramids: bool = True):
    """Decode one B picture; returns (Frame, new_pyramids|None)."""
    assert cfg.num_tiles == 1
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    segments = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
    dec = _parse_segments(cfg, segments, is_p=True, is_b=True)
    coef = fused.pack_coefs_host(cfg, dec.coef["y"], dec.coef["cb"],
                                 dec.coef["cr"])
    flat = fused.pack_maps_host(cfg, {
        "size": dec.size_map, "mode": dec.mode_map, "mts": dec.mts_map,
        "sao_type": dec.sao[0], "sao_band": dec.sao[1],
        "sao_off": dec.sao[2], "pred": dec.pred_map,
        "mvx": dec.mvx_map, "mvy": dec.mvy_map,
        "mvx1": dec.mvx1_map, "mvy1": dec.mvy1_map,
        **_alf_maps_from_header(cfg, sh)})
    stepb = fused.make_decode_step_b(cfg, with_pyramids)
    if cfg.weighted_pred:
        import jax.numpy as jnp
        wpv = (sh.wp if sh.wp is not None else [64, 0, 64, 0] * 2)
        out = stepb(coef, flat, *pyr0, *pyr1,
                    jnp.asarray(wpv, jnp.int32).reshape(2, 4))
    else:
        out = stepb(coef, flat, *pyr0, *pyr1)
    new_pyr = out[1] if with_pyramids else None
    return fused.unpack_recon(cfg, np.asarray(out[0])), new_pyr


def decode_picture_gop(cfg: CodecConfig, sh: SliceHeader,
                       payload: bytes, pyramids):
    """Decode one GOP picture; returns (Frame, new_pyramids)."""
    assert cfg.num_tiles == 1
    bounds = [0] + [int(e) for e in sh.entry_points] + [len(payload) - 1]
    segments = [payload[b0:b1]
                for b0, b1 in zip(bounds[:-1], bounds[1:])]
    is_p = sh.slice_type == SliceType.P
    dec = _parse_segments(cfg, segments, is_p)
    coef = fused.pack_coefs_host(cfg, dec.coef["y"], dec.coef["cb"],
                                 dec.coef["cr"])
    flat = fused.pack_maps_host(cfg, {
        "size": dec.size_map, "mode": dec.mode_map, "mts": dec.mts_map,
        "sao_type": dec.sao[0], "sao_band": dec.sao[1],
        "sao_off": dec.sao[2], "pred": dec.pred_map,
        "mvx": dec.mvx_map, "mvy": dec.mvy_map,
        "mvx1": dec.mvx1_map, "mvy1": dec.mvy1_map,
        **_alf_maps_from_header(cfg, sh)})
    if is_p:
        if pyramids is None:
            raise ValueError("P slice before any reference picture")
        stepp = fused.make_decode_step_p(cfg, True)
        if cfg.weighted_pred:
            import jax.numpy as jnp
            wpv = sh.wp if sh.wp is not None else [64, 0, 64, 0]
            rec, new_pyr = stepp(coef, flat, *pyramids,
                                 jnp.asarray(wpv, jnp.int32))
        else:
            rec, new_pyr = stepp(coef, flat, *pyramids)
    else:
        rec, new_pyr = fused.make_decode_step_i(cfg, True)(coef, flat)
    return fused.unpack_recon(cfg, np.asarray(rec)), new_pyr
