"""RD regression harness (SURVEY.md §4 "RD regression" row).

Fixed synthetic clips per driver-config shape; (bits, PSNR-Y) tracked
against stored baselines (tests/rd_baselines.json).  A change fails the
gate when it makes a config Pareto-WORSE (more bits without quality, or
less quality without rate savings); strictly-better results prompt a
baseline refresh via tools/update_rd_baselines.py.
"""

from __future__ import annotations

import json

import numpy as np

from x266_tpu.config import CodecConfig, Profile

W, H, N = 128, 192, 6


def rd_configs() -> dict[str, CodecConfig]:
    """Small-clip stand-ins for the five driver config shapes."""
    return {
        "ai_hevc": CodecConfig(width=W, height=H, qp=32, rdoq=True),
        "ai_vvc_mts": CodecConfig(width=W, height=H, qp=32,
                                  profile=Profile.VVC, mts=True,
                                  rdoq=True),
        "lowdelay_p": CodecConfig(width=W, height=H, qp=32,
                                  intra_period=8, deblock=True,
                                  sao=True, rdoq=True),
        "ra_gop4": CodecConfig(width=W, height=H, qp=32,
                               intra_period=8, gop_size=4,
                               deblock=True, sao=True, rdoq=True),
        "ra_gop4_tiled": CodecConfig(width=W, height=H, qp=32,
                                     intra_period=8, gop_size=4,
                                     deblock=True, sao=True,
                                     tile_rows=1, rdoq=True),
    }


def measure(name: str, cfg: CodecConfig) -> dict:
    from x266_tpu.api import Encoder
    from x266_tpu.core.yuv import synthetic_clip

    frames = synthetic_clip(W, H, N, kind="mixed", seed=17)
    res = Encoder(cfg, with_recon=False).encode(frames)
    return {"bits": int(sum(res.frame_bits)),
            "psnr_y": round(float(np.mean(res.psnr_y(W, H))), 3)}


def check(current: dict, base: dict) -> str | None:
    """None if acceptable; otherwise a failure description.

    Pareto rule with small tolerances: worse rate without a quality
    gain, or worse quality without a rate gain, is a regression.
    """
    b0, p0 = base["bits"], base["psnr_y"]
    b1, p1 = current["bits"], current["psnr_y"]
    if b1 > b0 * 1.02 and p1 < p0 + 0.02:
        return (f"rate regression: {b0} -> {b1} bits "
                f"({100 * (b1 / b0 - 1):+.1f}%) at psnr "
                f"{p0:.2f} -> {p1:.2f} dB")
    if p1 < p0 - 0.10 and b1 > b0 * 0.98:
        return (f"quality regression: {p0:.2f} -> {p1:.2f} dB at bits "
                f"{b0} -> {b1}")
    return None


def baselines_path() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "tests", "rd_baselines.json")


def load_baselines() -> dict:
    with open(baselines_path()) as f:
        return json.load(f)
