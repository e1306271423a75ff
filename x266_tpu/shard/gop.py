"""GOP-level distribution + elastic recovery (P1, SURVEY.md §2.2/§5).

GOPs are closed (IDR-started) units [STD], so they are the natural
data-parallel grain across hosts/devices (BASELINE.json:5 "frames/GOPs
sharded over hosts") and the natural recovery grain: a failed worker's
GOP is simply re-dispatched to a survivor, and bitstream assembly in POC
order is idempotent — the final stream is bit-identical no matter which
worker encoded what or how many retries happened (tests pin this).

Checkpoint/resume rides the same boundaries (utils.checkpoint): after
each in-order GOP the partial stream + JSON state are durable; resume
re-encodes nothing before the checkpoint.
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
from x266_tpu.utils.checkpoint import (CheckpointWriter, resume_state,
                                       truncate_to_checkpoint)


class GopScheduler:
    """Distributes closed GOPs over devices with retry-on-failure.

    fault_hook(gop_index, attempt): test seam — called before a GOP is
    encoded; raising simulates a worker failure (the GOP is then retried
    on the next device, up to max_retries).
    """

    def __init__(self, cfg: CodecConfig, devices=None,
                 max_retries: int = 2, fault_hook=None):
        if cfg.tile_rows or cfg.tile_cols:
            raise ValueError("GOP scheduler expects single-tile configs")
        self.cfg = cfg
        self.devices = list(devices) if devices else jax.devices()
        self.max_retries = max_retries
        self.fault_hook = fault_hook

    def _gops(self, frames: list[Frame], poc_base: int = 0
              ) -> list[tuple[int, list[Frame]]]:
        n = self.cfg.intra_period if self.cfg.intra_period > 1 else 1
        return [(poc_base + i, frames[i:i + n])
                for i in range(0, len(frames), n)]

    def _encode_gop(self, gop_idx: int, poc0: int, gop: list[Frame],
                    device) -> list[tuple[bytes, Frame | None, np.ndarray]]:
        from x266_tpu.engine.picture import encode_picture_gop_async

        # Pipelined GOP loop (round-4): frame k+1's dispatch depends
        # only on the device-resident pyramids, so it goes up BEFORE
        # frame k's downloads + host entropy run — device compute on
        # this worker overlaps host finalize exactly like the
        # single-device api.Encoder loop.
        out = []
        pyramids = None
        pending: list[tuple] = []

        def drain():
            fin, st = pending.pop(0)
            rbsp, recon, sse = fin()
            nal_type = NalType.IDR if st.name == "I" else NalType.TRAIL
            out.append((write_nal(nal_type, rbsp), recon, sse))

        for k, frame in enumerate(gop):
            # placement: move the packed input to the worker's device;
            # the DPB pyramids then live there for the whole GOP
            fin, pyramids, st = encode_picture_gop_async(
                self.cfg, frame, poc0 + k, pyramids,
                with_recon=True, device=device)
            pending.append((fin, st))
            while len(pending) > 1:
                drain()
        while pending:
            drain()
        return out

    def encode(self, frames: list[Frame],
               checkpoint_path: str | None = None,
               poc_base: int = 0) -> EncodeResult:
        """poc_base: first frame's global POC (multi-host GOP shares
        must write GLOBAL POCs into their slice headers)."""
        cfg = self.cfg
        gops = self._gops(frames, poc_base)

        start_poc = 0
        writer = None
        if checkpoint_path is not None:
            resumed = resume_state(checkpoint_path, cfg)
            if resumed is not None:
                start_poc, byte_off = resumed
                truncate_to_checkpoint(checkpoint_path, byte_off)
                writer = CheckpointWriter.__new__(CheckpointWriter)
                writer.path = checkpoint_path
                writer.ckpt_path = checkpoint_path + ".ckpt"
                writer.cfg = cfg
                writer._fp = open(checkpoint_path, "ab")
                writer._bytes = byte_off
            else:
                writer = CheckpointWriter(checkpoint_path, cfg)
                writer.append_nal(write_nal(NalType.VPS,
                                            headers.write_vps(cfg)))
                writer.append_nal(write_nal(NalType.SPS,
                                            headers.write_sps(cfg)))
                writer.append_nal(write_nal(NalType.PPS,
                                            headers.write_pps(cfg)))
                writer.mark_gop_boundary(0)

        todo = [(gi, poc0, gop) for gi, (poc0, gop) in enumerate(gops)
                if poc0 >= start_poc]

        def run_one(item):
            gi, poc0, gop = item
            last_err = None
            for attempt in range(self.max_retries + 1):
                device = self.devices[(gi + attempt) % len(self.devices)]
                try:
                    if self.fault_hook is not None:
                        self.fault_hook(gi, attempt)
                    return gi, self._encode_gop(gi, poc0, gop, device)
                except Exception as e:  # worker failure: re-dispatch
                    last_err = e
            raise RuntimeError(
                f"GOP {gi} failed after {self.max_retries + 1} "
                f"attempts") from last_err

        # one worker thread per device: with fewer threads than
        # devices, idle chips can never be fed (round-3's 8-device
        # efficiency collapse was partly this cap at 4)
        with ThreadPoolExecutor(max(1, len(self.devices))) as pool:
            done = dict(pool.map(run_one, todo))

        out = [write_nal(NalType.VPS, headers.write_vps(cfg)),
           write_nal(NalType.SPS, headers.write_sps(cfg)),
               write_nal(NalType.PPS, headers.write_pps(cfg))]
        recons: list[Frame] = []
        frame_bits: list[int] = []
        sses: list = []
        for gi, (poc0, gop) in enumerate(gops):
            if poc0 < start_poc:
                continue
            for nal, recon, sse in done[gi]:
                out.append(nal)
                if writer is not None:
                    writer.append_nal(nal)
                recons.append(recon)
                frame_bits.append(8 * len(nal))
                sses.append(sse)
            if writer is not None:
                writer.mark_gop_boundary(poc0 + len(gop))
        if writer is not None:
            writer.close()
        return EncodeResult(b"".join(out), recons, frame_bits, sse=sses)
