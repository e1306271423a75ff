"""Distributed tile/frame-parallel encoder (P1 + P2 + P6).

Work unit = (frame, tile band).  Bands are placed round-robin onto
devices; JAX's async dispatch runs all devices' Pass A/Pass B/filters
concurrently, then the host entropy-codes every band's segments in a
thread pool (the native C++ coder releases the GIL during the call) and
stitches NALs in POC order — exactly the BASELINE.json:5 shape
("CTU tiles sharded over chips ... wavefront segments stitched on host").

Output is BIT-IDENTICAL to the serial api.Encoder for the same config:
tiles are independent sub-pictures, so placement cannot change a single
coded bit (test_sharded.py pins this).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from x266_tpu.api.encoder import EncodeResult
from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, write_nal
from x266_tpu.core.yuv import Frame
from x266_tpu.engine.picture import (TileData, assemble_slice,
                                     split_rects, stitch_rects,
                                     tile_compute, tile_entropy)


class ShardedEncoder:
    """Multi-device all-intra encoder.

    devices: list of jax devices to spread (frame, band) work over;
    defaults to all local devices.
    """

    def __init__(self, cfg: CodecConfig, devices=None,
                 entropy_threads: int = 8, with_recon: bool = True):
        self.cfg = cfg
        self.devices = list(devices) if devices else jax.devices()
        self.entropy_threads = entropy_threads
        self.with_recon = with_recon

    # -- device side --------------------------------------------------------
    def _band_compute(self, bcfg: CodecConfig, band: Frame, device):
        """One band through the fused device step on `device`."""
        return tile_compute(bcfg, band, with_recon=self.with_recon,
                            device=device)

    # -- front-end ----------------------------------------------------------
    def encode(self, frames: list[Frame]) -> EncodeResult:
        cfg = self.cfg
        rects = cfg.tile_rects()        # row-major; 1-D bands included
        ndev = len(self.devices)

        # device passes: round-robin placement, async dispatch
        tiles: dict[tuple[int, int], TileData] = {}
        for fi, frame in enumerate(frames):
            for bi, part in enumerate(split_rects(cfg, frame)):
                dev = self.devices[(fi * len(rects) + bi) % ndev]
                tiles[(fi, bi)] = self._band_compute(
                    cfg.tile_cfg(rects[bi]), part, dev)

        # host entropy: every (frame, tile) in parallel threads
        keys = sorted(tiles.keys())
        with ThreadPoolExecutor(self.entropy_threads) as pool:
            segs = dict(zip(keys, pool.map(
                lambda k: tile_entropy(tiles[k]), keys)))

        # stitch in POC order
        out = [write_nal(NalType.VPS, headers.write_vps(cfg)),
           write_nal(NalType.SPS, headers.write_sps(cfg)),
               write_nal(NalType.PPS, headers.write_pps(cfg))]
        recons: list[Frame] = []
        frame_bits: list[int] = []
        sses: list = []
        for fi in range(len(frames)):
            per_tile = [tiles[(fi, bi)] for bi in range(len(rects))]
            segments = [s for bi in range(len(rects))
                        for s in segs[(fi, bi)]]
            rbsp = assemble_slice(cfg, fi, segments,
                                  alf=([t.alf for t in per_tile]
                                       if cfg.alf else None))
            nal = write_nal(NalType.IDR, rbsp)
            out.append(nal)
            frame_bits.append(8 * len(nal))
            if self.with_recon:
                recons.append(stitch_rects(
                    cfg, [t.recon for t in per_tile]))
            sses.append(np.sum([t.sse for t in per_tile], axis=0))
        return EncodeResult(b"".join(out), recons, frame_bits, sse=sses)
