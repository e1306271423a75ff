"""Encoder front-end (C19-analog): frames -> Annex-B style bytestream."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, write_nal
from x266_tpu.core.yuv import Frame


@dataclass
class EncodeResult:
    bitstream: bytes
    recon: list[Frame]
    frame_bits: list[int] = field(default_factory=list)
    sse: list = field(default_factory=list)   # per-frame (3,) SSE

    def psnr_y(self, width: int, height: int,
               max_val: int = 255) -> list[float]:
        """Device-accounted luma PSNR per frame (no recon download)."""
        import numpy as np
        n = float(width * height)
        return [float(10 * np.log10(float(max_val) ** 2 * n
                                    / max(s[0], 1e-9)))
                for s in self.sse]

    @property
    def total_bits(self) -> int:
        return 8 * len(self.bitstream)


def fit_weight(cur: Frame, ref: Frame) -> list[int]:
    """Least-squares explicit-WP fit [wy, oy, wc, oc] (denom 64).

    Non-normative: the encoder fits against the reference's SOURCE
    frame as a proxy for its reconstruction (zero device round-trips);
    the decoder applies whatever the slice header says.  Falls back to
    identity (64, 0) when the fit is degenerate or near-identity."""
    cy = cur.y.astype(np.float64)
    ry = ref.y.astype(np.float64)
    var = ry.var()
    if var < 1.0:
        wy, oy = 64, int(round(cy.mean() - ry.mean()))
    else:
        w = 64.0 * ((cy * ry).mean() - cy.mean() * ry.mean()) / var
        wy = int(round(min(max(w, 16.0), 192.0)))
        oy = int(round(cy.mean() - wy * ry.mean() / 64.0))
    oy = min(max(oy, -128), 127)
    mc = (cur.cb.astype(np.float64).mean()
          + cur.cr.astype(np.float64).mean()) / 2.0
    mr = (ref.cb.astype(np.float64).mean()
          + ref.cr.astype(np.float64).mean()) / 2.0
    oc = min(max(int(round(mc - mr)), -128), 127)
    if abs(wy - 64) <= 1 and abs(oy) <= 1:
        wy, oy = 64, 0
    if abs(oc) <= 1:
        oc = 0
    return [wy, oy, 64, oc]


class Encoder:
    """All-intra v1 encoder: every picture is an IDR slice.

    with_recon=False skips downloading reconstructions from the device
    (the serving configuration: only bitstream bytes leave the chip;
    distortion still arrives via device-computed SSE).

    >>> enc = Encoder(CodecConfig(width=416, height=240, qp=32))
    >>> result = enc.encode(frames)
    """

    def __init__(self, cfg: CodecConfig, with_recon: bool = True,
                 rate_control=None, batch_frames: int = 1):
        """rate_control: utils.ratecontrol.RateControlState for bitrate-
        targeted encoding (per-frame QP in the slice header); None =
        fixed QP.  batch_frames: all-intra single-tile frames per
        vmapped device call (they share the recon scan's sequential
        latency; ~2x throughput at 4 on TPU); default 1 = unbatched."""
        self.cfg = cfg
        self.with_recon = with_recon
        self.rate_control = rate_control
        self.batch_frames = max(1, batch_frames)

    def encode(self, frames: list[Frame]) -> EncodeResult:
        cfg = self.cfg
        for frame in frames:
            if (frame.height, frame.width) != (cfg.height, cfg.width):
                raise ValueError("frame size does not match config")
        out = [write_nal(NalType.VPS, headers.write_vps(cfg)),
               write_nal(NalType.SPS, headers.write_sps(cfg)),
               write_nal(NalType.PPS, headers.write_pps(cfg))]
        if cfg.intra_period != 1 or self.rate_control is not None:
            return self._encode_gop(cfg, frames, out)

        # Phase 1: dispatch every (frame, band) device step (async);
        # Phase 2: finalize + entropy-code in POC order.  Device compute
        # of later frames overlaps downloads/entropy of earlier ones;
        # the bitstream is identical to the fully serial loop.  For the
        # common single-tile case, frames go up in vmapped chunks so the
        # sequential recon scan is amortized across the batch.
        from x266_tpu.engine.picture import (assemble_slice, split_rects,
                                             stitch_rects,
                                             tile_compute_async,
                                             tile_entropy,
                                             tiles_compute_batched_async)
        bands = cfg.tile_rects()
        bf = self.batch_frames
        if len(bands) == 1 and bf > 1 and len(frames) > 1:
            chunks = [frames[i:i + bf]
                      for i in range(0, len(frames), bf)]
            fins = [tiles_compute_batched_async(cfg, ch,
                                                self.with_recon)
                    for ch in chunks]
            pending = []
            for fin, ch in zip(fins, chunks):
                done = {"tds": None, "fin": fin}

                def mk(done, idx):
                    def get():
                        if done["tds"] is None:
                            done["tds"] = done["fin"]()
                        return done["tds"][idx]
                    return get

                pending += [[mk(done, i)] for i in range(len(ch))]
        else:
            pending = [[tile_compute_async(cfg.tile_cfg(b), part,
                                           self.with_recon)
                        for b, part in zip(bands,
                                           split_rects(cfg, frame))]
                       for frame in frames]

        results = []
        for poc, fin_list in enumerate(pending):
            tiles = [fin() for fin in fin_list]
            segments = [seg for td in tiles for seg in tile_entropy(td)]
            rbsp = assemble_slice(cfg, poc, segments,
                                  alf=([t.alf for t in tiles]
                                       if cfg.alf else None))
            recon = None
            if self.with_recon:
                recon = stitch_rects(cfg, [t.recon for t in tiles])
            sse = np.sum([t.sse for t in tiles], axis=0)
            results.append((rbsp, recon, sse))

        recons: list[Frame] = []
        frame_bits: list[int] = []
        sses: list = []
        for rbsp, recon, sse in results:
            nal = write_nal(NalType.IDR, rbsp)
            out.append(nal)
            if recon is not None:
                recons.append(recon)
            frame_bits.append(8 * len(nal))
            sses.append(sse)
        return EncodeResult(b"".join(out), recons, frame_bits,
                            sse=sses)

    def _encode_gop(self, cfg: CodecConfig, frames: list[Frame],
                    out: list[bytes]) -> EncodeResult:
        """Low-delay GOP stream: IDR every intra_period, P otherwise;
        the reference pyramids stay device-resident between frames
        (C16 DPB).  gop_size > 1 selects the random-access hierarchy
        (_encode_ra)."""
        from x266_tpu.core.nal import NalType as NT

        if cfg.tile_rows or cfg.tile_cols:
            # tile band/rect inter path with reference-halo exchange
            from x266_tpu.shard.tiled_gop import encode_inter_tiled
            return encode_inter_tiled(cfg, frames, self.with_recon,
                                      rate_control=self.rate_control)
        if cfg.gop_size > 1:
            return self._encode_ra(cfg, frames, out)
        if cfg.multi_ref:
            if self.rate_control is not None:
                raise ValueError("rate control + multi_ref is not "
                                 "supported in v1")
            return self._encode_gpb(cfg, frames, out)
        from x266_tpu.engine.picture import encode_picture_gop_async
        recons: list[Frame] = []
        frame_bits: list[int] = []
        sses: list = []
        pyramids = None
        rc = self.rate_control
        # Pipeline (rc off): dispatch frame i+1 (its only dependency is
        # the device-resident pyramids) before finalizing frame i, so
        # downloads + host entropy overlap the next device step.  With
        # rate control the loop stays serial (frame i's bits set frame
        # i+1's QP).
        pending: list[tuple] = []

        def drain():
            fin, st = pending.pop(0)
            rbsp, recon, sse = fin()
            nal = write_nal(NT.IDR if st.name == "I" else NT.TRAIL,
                            rbsp)
            out.append(nal)
            if recon is not None:
                recons.append(recon)
            frame_bits.append(8 * len(nal))
            sses.append(sse)
            if rc is not None:
                rc.update(8 * len(nal))

        for poc, frame in enumerate(frames):
            fcfg = cfg if rc is None else cfg.replace(qp=rc.qp)
            wp = (fit_weight(frame, frames[poc - 1])
                  if (cfg.weighted_pred and poc % cfg.intra_period)
                  else None)
            fin, pyramids, st = encode_picture_gop_async(
                fcfg, frame, poc, pyramids, self.with_recon, wp=wp,
                ref_poc=poc - 1)
            pending.append((fin, st))
            while len(pending) > (1 if rc is None else 0):
                drain()
        while pending:
            drain()
        return EncodeResult(b"".join(out), recons, frame_bits,
                            sse=sses)

    def _encode_gpb(self, cfg: CodecConfig, frames: list[Frame],
                    out: list[bytes]) -> EncodeResult:
        """Low-delay multi-reference chain (C16 multi_ref): IDR every
        intra_period; the first inter picture after an IDR is plain P
        (one reference); every later one codes as a GPB B slice with
        L0 = previous picture, L1 = the one before it (both past) —
        two references + bi averaging via the unmodified B machinery.
        Pipelined like _encode_gop."""
        from x266_tpu.core.nal import NalType as NT
        from x266_tpu.engine.picture import (encode_picture_b_async,
                                             encode_picture_gop_async)

        recons: list[Frame] = []
        frame_bits: list[int] = []
        sses: list = []
        # 4-entry DPB, newest last: [(poc, pyramids)].  Without
        # cfg.rpl the active pair is fixed {t-1, t-2} (the decoder's
        # decode-history derivation); with cfg.rpl the encoder picks
        # the best two of up to four by decimated-SAD against the
        # source and SIGNALS them (C16 signalled RPL + adaptive
        # reference selection, round-5).
        dpb_n = 4 if cfg.rpl else 2
        refs: list[tuple] = []
        pending: list[tuple] = []

        def drain():
            fin, nt = pending.pop(0)
            rbsp, recon, sse = fin()
            nal = write_nal(nt, rbsp)
            out.append(nal)
            if recon is not None:
                recons.append(recon)
            frame_bits.append(8 * len(nal))
            sses.append(sse)

        def pick_refs(frame):
            if not cfg.rpl or len(refs) == 2:
                return refs[-1], refs[-2]
            cur = frame.y[::4, ::4].astype(np.int32)
            scored = sorted(
                refs, key=lambda e: int(np.abs(
                    frames[e[0]].y[::4, ::4].astype(np.int32)
                    - cur).sum()))
            a, b = scored[0], scored[1]
            return a, b

        for poc, frame in enumerate(frames):
            if poc % cfg.intra_period == 0:
                fin, pyr, _ = encode_picture_gop_async(
                    cfg, frame, poc, None, self.with_recon)
                refs = [(poc, pyr)]
                nt = NalType.IDR
            elif len(refs) < 2:
                wp = (fit_weight(frame, frames[poc - 1])
                      if cfg.weighted_pred else None)
                fin, pyr, _ = encode_picture_gop_async(
                    cfg, frame, poc, refs[-1][1], self.with_recon,
                    wp=wp, ref_poc=refs[-1][0])
                refs.append((poc, pyr))
                nt = NT.TRAIL
            else:
                (p0, r0), (p1, r1) = pick_refs(frame)
                wp = ([fit_weight(frame, frames[p0]),
                       fit_weight(frame, frames[p1])]
                      if cfg.weighted_pred else None)
                fin, pyr = encode_picture_b_async(
                    cfg, frame, poc, r0, r1,
                    self.with_recon, with_pyramids=True, wp=wp,
                    ref_pocs=[[p0], [p1]])
                refs = (refs + [(poc, pyr)])[-dpb_n:]
                nt = NT.TRAIL
            pending.append((fin, nt))
            while len(pending) > 1:
                drain()
        while pending:
            drain()
        return EncodeResult(b"".join(out), recons, frame_bits,
                            sse=sses)

    def _encode_ra(self, cfg: CodecConfig, frames: list[Frame],
                   out: list[bytes]) -> EncodeResult:
        """Random-access hierarchy (C16): anchors every gop_size (IDR
        at intra_period multiples, else P), hierarchical B midpoints
        between them.  NALs leave in CODING order (the decoder reorders
        by POC); recon/bits/sse come back in DISPLAY order.  The DPB
        keeps pyramids for the active span only (pocs >= the previous
        anchor)."""
        from x266_tpu.core.nal import NalType as NT
        from x266_tpu.engine.picture import (b_qp_offset,
                                             gop_coding_order)

        from x266_tpu.engine.picture import (encode_picture_b_async,
                                             encode_picture_gop_async)

        if self.rate_control is not None:
            raise ValueError("rate control supports low-delay in v1")
        order = gop_coding_order(len(frames), cfg.intra_period,
                                 cfg.gop_size)
        dpb: dict[int, tuple] = {}
        per_poc: dict[int, tuple] = {}
        nal_slot: dict[int, int] = {}
        # Pipeline: the next picture's dispatch depends only on device-
        # resident DPB pyramids, so finalize (downloads + host entropy)
        # trails one picture behind the device compute.
        pending: list[tuple] = []

        def drain():
            poc, fin = pending.pop(0)
            rbsp, recon, sse = fin()
            nal = write_nal(nal_slot.pop(poc), rbsp)
            out.append(nal)
            per_poc[poc] = (nal, recon, sse)

        for poc, kind in order:
            if kind == "B":
                l0 = max(p for p in dpb if p < poc)
                l1 = min(p for p in dpb if p > poc)
                # odd-POC Bs are hierarchy leaves (gop_size is a power
                # of two): never referenced, so no pyramids/DPB entry
                is_ref = poc % 2 == 0
                bc = cfg.replace(qp=cfg.qp + b_qp_offset(cfg, poc))
                wp = ([fit_weight(frames[poc], frames[l0]),
                       fit_weight(frames[poc], frames[l1])]
                      if cfg.weighted_pred else None)
                fin, pyr = encode_picture_b_async(
                    bc, frames[poc], poc, dpb[l0], dpb[l1],
                    self.with_recon, with_pyramids=is_ref, wp=wp,
                    ref_pocs=[[l0], [l1]])
                nal_slot[poc] = NalType.TRAIL
            else:
                rpoc = (None if kind == "I"
                        else max(p for p in dpb if p < poc))
                ref = None if rpoc is None else dpb[rpoc]
                wp = (fit_weight(frames[poc], frames[rpoc])
                      if (cfg.weighted_pred and rpoc is not None)
                      else None)
                fin, pyr, st = encode_picture_gop_async(
                    cfg, frames[poc], poc, ref, self.with_recon, wp=wp,
                    ref_poc=rpoc)
                nal_slot[poc] = (NT.IDR if st.name == "I"
                                 else NT.TRAIL)
            if pyr is not None:
                dpb[poc] = pyr
            pending.append((poc, fin))
            while len(pending) > 1:
                drain()
            if kind != "B" and poc > 0:
                # span (prev_anchor, poc] starts: evict older pyramids
                for p in [p for p in dpb if p < poc - cfg.gop_size]:
                    del dpb[p]
        while pending:
            drain()
        recons = [per_poc[p][1] for p in sorted(per_poc)
                  if per_poc[p][1] is not None]
        frame_bits = [8 * len(per_poc[p][0]) for p in sorted(per_poc)]
        sses = [per_poc[p][2] for p in sorted(per_poc)]
        return EncodeResult(b"".join(out), recons, frame_bits,
                            sse=sses)
