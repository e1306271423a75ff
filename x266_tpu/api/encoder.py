"""Encoder front-end (C19-analog): frames -> Annex-B style bytestream."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, write_nal
from x266_tpu.core.yuv import Frame
from x266_tpu.engine.picture import encode_picture


@dataclass
class EncodeResult:
    bitstream: bytes
    recon: list[Frame]
    frame_bits: list[int] = field(default_factory=list)

    @property
    def total_bits(self) -> int:
        return 8 * len(self.bitstream)


class Encoder:
    """All-intra v1 encoder: every picture is an IDR slice.

    >>> enc = Encoder(CodecConfig(width=416, height=240, qp=32))
    >>> result = enc.encode(frames)
    """

    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg

    def encode(self, frames: list[Frame]) -> EncodeResult:
        cfg = self.cfg
        out = [write_nal(NalType.SPS, headers.write_sps(cfg)),
               write_nal(NalType.PPS, headers.write_pps(cfg))]
        recons: list[Frame] = []
        frame_bits: list[int] = []
        for poc, frame in enumerate(frames):
            if (frame.height, frame.width) != (cfg.height, cfg.width):
                raise ValueError("frame size does not match config")
            rbsp, recon = encode_picture(cfg, frame, poc)
            nal = write_nal(NalType.IDR, rbsp)
            out.append(nal)
            recons.append(recon)
            frame_bits.append(8 * len(nal))
        return EncodeResult(b"".join(out), recons, frame_bits)
