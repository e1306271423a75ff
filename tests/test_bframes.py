"""Random-access B-picture pipeline (C16 hierarchy, config-4 core).

Gates: coding-order schedule sanity, encode->decode bit-exactness of
the full RA stream (the SURVEY.md §4 integration bar), display-order
output, and that the hierarchy actually codes B slices cheaper than
the all-intra equivalent.
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine.picture import gop_coding_order


def test_coding_order():
    order = gop_coding_order(9, intra_period=8, gop=4)
    assert order == [(0, "I"), (4, "P"), (2, "B"), (1, "B"), (3, "B"),
                     (8, "I"), (6, "B"), (5, "B"), (7, "B")]
    pocs = sorted(p for p, _ in order)
    assert pocs == list(range(9))
    # every B's bracketing references are coded before it
    coded = set()
    for p, k in order:
        if k == "B":
            assert any(c < p for c in coded) and any(c > p for c in coded)
        coded.add(p)


@pytest.mark.parametrize("native", [True, False],
                         ids=["native", "python"])
def test_ra_roundtrip(native, monkeypatch):
    if not native:
        monkeypatch.setenv("X266T_NO_NATIVE", "1")
        import x266_tpu.cabac.native_bind as nb
        monkeypatch.setattr(nb, "_tried", False)
        monkeypatch.setattr(nb, "_lib", None)
    cfg = CodecConfig(width=128, height=64, qp=32, intra_period=8,
                      gop_size=4)
    frames = synthetic_clip(128, 64, 9, kind="mixed")
    res = Encoder(cfg, with_recon=True).encode(frames)
    dcfg, dec = Decoder().decode(res.bitstream)
    assert len(dec) == 9
    for i, (r, d, s) in enumerate(zip(res.recon, dec, frames)):
        assert frame_md5(r) == frame_md5(d), f"poc {i}: recon != decode"
        assert d.psnr(s)[0] > 28, f"poc {i}"


def test_ra_beats_all_intra():
    cfg_ra = CodecConfig(width=128, height=64, qp=32, intra_period=8,
                         gop_size=4)
    cfg_ai = CodecConfig(width=128, height=64, qp=32)
    frames = synthetic_clip(128, 64, 8, kind="mixed")
    bits_ra = Encoder(cfg_ra, with_recon=False).encode(frames).total_bits
    bits_ai = Encoder(cfg_ai, with_recon=False).encode(frames).total_bits
    assert bits_ra < bits_ai, (bits_ra, bits_ai)


def test_ra_with_filters():
    """RA + deblock/SAO/ALF chain (the config-4 toolset together)."""
    cfg = CodecConfig(width=128, height=64, qp=34, intra_period=8,
                      gop_size=4, deblock=True, sao=True, alf=True)
    frames = synthetic_clip(128, 64, 5, kind="mixed")
    res = Encoder(cfg, with_recon=True).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    for i, (r, d) in enumerate(zip(res.recon, dec)):
        assert frame_md5(r) == frame_md5(d), f"poc {i}"
