"""Decoder front-end (C18): bytestream -> pictures (normative path)."""

from __future__ import annotations

from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, split_nals
from x266_tpu.core.yuv import Frame
from x266_tpu.engine.picture import decode_picture


class Decoder:
    def decode(self, stream: bytes) -> tuple[CodecConfig, list[Frame]]:
        from x266_tpu.config import SliceType
        from x266_tpu.engine.picture import decode_picture_gop

        cfg: CodecConfig | None = None
        qp: int | None = None
        frames: list[Frame] = []
        pyramids = None          # device-resident DPB entry (C16)
        for nal_type, rbsp in split_nals(stream):
            if nal_type == NalType.SPS:
                cfg = headers.parse_sps(rbsp)
            elif nal_type == NalType.PPS:
                qp = headers.parse_pps(rbsp)["qp"]
            elif nal_type in (NalType.IDR, NalType.TRAIL):
                if cfg is None or qp is None:
                    raise ValueError("slice before parameter sets")
                sh, off = headers.parse_slice_header(
                    rbsp, cfg.alf, cfg.ctus_y * cfg.ctus_x)
                use = cfg if sh.qp == cfg.qp else cfg.replace(qp=sh.qp)
                if (sh.slice_type == SliceType.P
                        or nal_type == NalType.TRAIL):
                    frame, pyramids = decode_picture_gop(
                        use, sh, rbsp[off:], pyramids)
                    frames.append(frame)
                elif use.intra_period != 1:
                    # I picture that will be referenced: keep the DPB
                    frame, pyramids = decode_picture_gop(
                        use, sh, rbsp[off:], None)
                    frames.append(frame)
                else:
                    frames.append(decode_picture(use, sh, rbsp[off:]))
            elif nal_type == NalType.EOS:
                break
        if cfg is None:
            raise ValueError("no SPS in stream")
        return cfg, frames

