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
from x266_tpu.engine.mode_decision import make_mode_decision, pad_plane
from x266_tpu.engine.picture import (TileData, assemble_slice,
                                     split_bands, tile_entropy)
from x266_tpu.engine.recon import make_recon_pass
from x266_tpu.kernels.deblock import make_deblock
from x266_tpu.kernels.sao import make_sao_apply, make_sao_estimate


class ShardedEncoder:
    """Multi-device all-intra encoder.

    devices: list of jax devices to spread (frame, band) work over;
    defaults to all local devices.
    """

    def __init__(self, cfg: CodecConfig, devices=None,
                 entropy_threads: int = 8):
        self.cfg = cfg
        self.devices = list(devices) if devices else jax.devices()
        self.entropy_threads = entropy_threads

    # -- device side --------------------------------------------------------
    def _band_compute(self, bcfg: CodecConfig, band: Frame, device):
        """Launch one band's device passes on `device`; returns lazy
        (jax arrays stay on device until consumed)."""
        planes = [jax.device_put(pad_plane(p.astype(np.int32)), device)
                  for p in (band.y, band.cb, band.cr)]
        size_map, mode_map = make_mode_decision(bcfg)(planes[0])
        out = make_recon_pass(bcfg, encode=True)(
            *planes, size_map, mode_map)
        # slice the picture out of the padded planes ON DEVICE (async;
        # avoids a host sync between bands)
        h, w = bcfg.height, bcfg.width
        y = out[0][1:1 + h, 1:1 + w]
        cb = out[1][1:1 + h // 2, 1:1 + w // 2]
        cr = out[2][1:1 + h // 2, 1:1 + w // 2]
        if bcfg.deblock:
            y, cb, cr = make_deblock(bcfg)(y, cb, cr, size_map)
        sao_params = None
        if bcfg.sao:
            orig_y = jax.device_put(band.y.astype(np.int32), device)
            st, sb, so = make_sao_estimate(bcfg)(orig_y, y)
            sao_params = (np.asarray(st), np.asarray(sb), np.asarray(so))
            y = make_sao_apply(bcfg)(y, *sao_params)
        return TileData(
            bcfg, np.asarray(size_map), np.asarray(mode_map),
            np.asarray(out[3]), np.asarray(out[4]), np.asarray(out[5]),
            Frame(np.asarray(y).astype(np.uint8),
                  np.asarray(cb).astype(np.uint8),
                  np.asarray(cr).astype(np.uint8)),
            sao_params)

    # -- front-end ----------------------------------------------------------
    def encode(self, frames: list[Frame]) -> EncodeResult:
        cfg = self.cfg
        bands = cfg.tile_bands()
        ndev = len(self.devices)

        # device passes: round-robin placement, async dispatch
        tiles: dict[tuple[int, int], TileData] = {}
        for fi, frame in enumerate(frames):
            for bi, band in enumerate(split_bands(cfg, frame)):
                dev = self.devices[(fi * len(bands) + bi) % ndev]
                tiles[(fi, bi)] = self._band_compute(
                    cfg.tile_cfg(bands[bi]), band, dev)

        # host entropy: every (frame, band) in parallel threads
        keys = sorted(tiles.keys())
        with ThreadPoolExecutor(self.entropy_threads) as pool:
            segs = dict(zip(keys, pool.map(
                lambda k: tile_entropy(tiles[k]), keys)))

        # stitch in POC order
        out = [write_nal(NalType.SPS, headers.write_sps(cfg)),
               write_nal(NalType.PPS, headers.write_pps(cfg))]
        recons: list[Frame] = []
        frame_bits: list[int] = []
        for fi in range(len(frames)):
            segments = [s for bi in range(len(bands))
                        for s in segs[(fi, bi)]]
            rbsp = assemble_slice(cfg, fi, segments)
            nal = write_nal(NalType.IDR, rbsp)
            out.append(nal)
            frame_bits.append(8 * len(nal))
            recons.append(Frame(
                np.concatenate([tiles[(fi, bi)].recon.y
                                for bi in range(len(bands))]),
                np.concatenate([tiles[(fi, bi)].recon.cb
                                for bi in range(len(bands))]),
                np.concatenate([tiles[(fi, bi)].recon.cr
                                for bi in range(len(bands))])))
        return EncodeResult(b"".join(out), recons, frame_bits)
