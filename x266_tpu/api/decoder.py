"""Decoder front-end (C18): bytestream -> pictures (normative path).

DPB rule for B slices (C16, mirrors the encoder's gop_coding_order):
L0 = the nearest decoded POC below the slice's POC, L1 = the nearest
above — derived from decode history, so no reference signalling is
needed beyond the POC already in the slice header.  Output frames are
reordered to display (POC) order.
"""

from __future__ import annotations

from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, split_nals
from x266_tpu.core.yuv import Frame
from x266_tpu.engine.picture import decode_picture


class Decoder:
    def decode(self, stream: bytes) -> tuple[CodecConfig, list[Frame]]:
        from x266_tpu.config import SliceType
        from x266_tpu.engine.picture import (decode_picture_b,
                                             decode_picture_gop)

        cfg: CodecConfig | None = None
        qp: int | None = None
        frames: dict[int, Frame] = {}
        dpb: dict[int, tuple] = {}    # poc -> device pyramids (C16)
        last_ref = None               # low-delay chain reference
        vps = None
        for nal_type, rbsp in split_nals(stream):
            if nal_type == NalType.VPS:
                vps = headers.parse_vps(rbsp)
            elif nal_type == NalType.SPS:
                cfg = headers.parse_sps(rbsp)
                if vps is not None:
                    want = headers.PROFILE_IDS[cfg.profile]
                    if vps["profile_idc"] != want:
                        raise ValueError(
                            f"VPS profile {vps['profile_idc']} != SPS "
                            f"profile {want}")
                    if vps["level_idc"] < headers.level_for(cfg):
                        raise ValueError(
                            f"stream exceeds its signalled level "
                            f"{vps['level_idc']}")
            elif nal_type == NalType.PPS:
                qp = headers.parse_pps(rbsp)["qp"]
            elif nal_type in (NalType.IDR, NalType.TRAIL):
                if cfg is None or qp is None:
                    raise ValueError("slice before parameter sets")
                sh, off = headers.parse_slice_header(
                    rbsp, cfg.alf, cfg.ctus_y * cfg.ctus_x,
                    cfg.alf_chroma, cfg.alf_nonlinear, cfg.ccalf,
                    has_wp=cfg.weighted_pred,
                    n_bands=cfg.num_tiles, has_rpl=cfg.rpl)
                use = cfg if sh.qp == cfg.qp else cfg.replace(qp=sh.qp)
                poc = sh.poc
                if (cfg.tile_rows or cfg.tile_cols) \
                        and (cfg.intra_period != 1
                             or cfg.gop_size > 1):
                    # tiled inter stream: DPB = full filtered planes,
                    # band decode with halo extension (P4 mirror)
                    from x266_tpu.engine.picture import (
                        decode_picture_inter_tiled, refs_from_frame)
                    if sh.slice_type == SliceType.B:
                        if sh.rpl is not None:
                            l0 = poc - sh.rpl[0][0]
                            l1 = poc - sh.rpl[1][0]
                        else:
                            l0 = max(p for p in dpb if p < poc)
                            l1 = min(p for p in dpb if p > poc)
                        frame, refs = decode_picture_inter_tiled(
                            use, sh, rbsp[off:], dpb[l0], dpb[l1])
                        if poc % 2 == 0:
                            dpb[poc] = refs
                    elif sh.slice_type == SliceType.P:
                        rp = (poc - sh.rpl[0][0]
                              if sh.rpl is not None
                              else max(p for p in dpb if p < poc))
                        ref = dpb[rp]
                        frame, refs = decode_picture_inter_tiled(
                            use, sh, rbsp[off:], ref)
                        dpb[poc] = refs
                    else:
                        frame = decode_picture(use, sh, rbsp[off:])
                        dpb[poc] = refs_from_frame(frame)
                    frames[poc] = frame
                    if sh.slice_type != SliceType.B and poc > 0:
                        if cfg.gop_size > 1:
                            for p in [p for p in dpb
                                      if p < poc - cfg.gop_size]:
                                del dpb[p]
                        else:
                            dpb = {poc: dpb[poc]}
                    continue
                if sh.slice_type == SliceType.B:
                    if sh.rpl is not None:
                        # signalled RPL (C16, round-5): the header
                        # names the active references directly
                        l0 = poc - sh.rpl[0][0]
                        l1 = poc - sh.rpl[1][0]
                        is_ref = (poc % 2 == 0 if l1 > poc else True)
                    else:
                        below = sorted(p for p in dpb if p < poc)
                        above = [p for p in dpb if p > poc]
                        l0 = below[-1]
                        if above:
                            # random-access: nearest future ref
                            l1 = min(above)
                            is_ref = poc % 2 == 0   # leaf-B mirror
                        else:
                            # low-delay GPB (cfg.multi_ref): L1 = the
                            # second-nearest PAST picture; every
                            # picture stays referenceable
                            l1 = below[-2]
                            is_ref = True
                    frame, pyr = decode_picture_b(
                        use, sh, rbsp[off:], dpb[l0], dpb[l1],
                        with_pyramids=is_ref)
                    if pyr is not None:
                        dpb[poc] = pyr
                elif (sh.slice_type == SliceType.P
                      or nal_type == NalType.TRAIL):
                    if sh.rpl is not None and dpb:
                        ref = dpb[poc - sh.rpl[0][0]]
                    else:
                        ref = (dpb[max(p for p in dpb if p < poc)]
                               if dpb else last_ref)
                    frame, pyr = decode_picture_gop(
                        use, sh, rbsp[off:], ref)
                    dpb[poc] = pyr
                    last_ref = pyr
                elif use.intra_period != 1 or use.gop_size > 1:
                    # I picture that will be referenced: keep the DPB
                    frame, pyr = decode_picture_gop(
                        use, sh, rbsp[off:], None)
                    dpb[poc] = pyr
                    last_ref = pyr
                else:
                    frame = decode_picture(use, sh, rbsp[off:])
                frames[poc] = frame
                if cfg.gop_size > 1:
                    if sh.slice_type != SliceType.B and poc > 0:
                        # new span: evict pyramids older than the
                        # previous anchor (no longer referenced)
                        for p in [p for p in dpb
                                  if p < poc - cfg.gop_size]:
                            del dpb[p]
                elif poc in dpb:
                    # low-delay chain: the latest picture (GPB: the
                    # latest two; signalled-RPL GPB: four) stays
                    # referenceable
                    n_keep = (4 if (cfg.rpl and cfg.multi_ref)
                              else 2 if cfg.multi_ref else 1)
                    keep = sorted(dpb)[-n_keep:]
                    dpb = {p: dpb[p] for p in keep}
            elif nal_type == NalType.EOS:
                break
        if cfg is None:
            raise ValueError("no SPS in stream")
        return cfg, [frames[p] for p in sorted(frames)]
