"""Rate control (C17): per-frame QP adaptation toward a target bitrate.

Lambda-domain-flavored controller in its simplest robust form: a
proportional-integral loop on the bits error, stepping the slice QP
within [qp0 - span, qp0 + span].  The x266t slice header already carries
an independent QP, so the decoder needs nothing new; on the encoder each
distinct QP lazily compiles its device step once (persisted by the
compilation cache), which bounds compile cost to the small QP set.

This is the "matched bitrate" instrument (BASELINE.json:2,5): encode a
clip at a target and compare PSNR against a fixed-QP reference run.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class RateControlState:
    target_bits_per_frame: float
    qp: int
    qp_min: int
    qp_max: int
    error_acc: float = 0.0       # integral of (actual - target)

    def update(self, actual_bits: int) -> int:
        """Record a coded frame; returns the QP for the next frame.

        ~6 QP steps double the bitrate [STD lambda model], so the
        proportional term maps log2(bits ratio) to QP steps.
        """
        import math

        err = actual_bits - self.target_bits_per_frame
        self.error_acc += err
        ratio = max(actual_bits, 1.0) / self.target_bits_per_frame
        p_term = 3.0 * math.log2(ratio)
        i_term = 2.0 * self.error_acc / max(
            self.target_bits_per_frame * 8.0, 1.0)
        new_qp = self.qp + int(round(
            max(-2.0, min(2.0, p_term * 0.5 + i_term))))
        self.qp = max(self.qp_min, min(self.qp_max, new_qp))
        return self.qp


def make_controller(cfg, bitrate_kbps: float, fps: float,
                    span: int = 6) -> RateControlState:
    target = bitrate_kbps * 1000.0 / max(fps, 1e-9)
    return RateControlState(
        target_bits_per_frame=target, qp=cfg.qp,
        qp_min=max(0, cfg.qp - span), qp_max=min(51, cfg.qp + span))
