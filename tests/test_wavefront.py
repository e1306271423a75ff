"""Wavefront-vs-sequential recon equality (SURVEY.md §4: the parallel
schedule must be bit-identical to the serial one) + full-pipeline gates.
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.engine.mode_decision import (make_mode_decision,
                                           pad_plane)
from x266_tpu.engine.recon import make_recon_pass_raw
from x266_tpu.engine.recon_wave import make_recon_wave_raw


@pytest.mark.parametrize("kw", [
    dict(),
    dict(lossless=True),
    dict(profile=Profile.VVC, mts=True),
])
def test_wave_equals_serial_encode(kw):
    import jax

    cfg = CodecConfig(width=128, height=96, qp=33, **kw)
    fr = synthetic_frame(128, 96, kind="mixed", seed=13)
    yP = pad_plane(fr.y)
    cbP = pad_plane(fr.cb)
    crP = pad_plane(fr.cr)
    sm, mm = make_mode_decision(cfg)(yP)
    mts = np.zeros((cfg.units_y, cfg.units_x), np.int32)

    serial = jax.jit(make_recon_pass_raw(cfg, True))(
        yP, cbP, crP, sm, mm, mts)
    wave = jax.jit(make_recon_wave_raw(cfg, True))(
        yP, cbP, crP, sm, mm, mts)
    for i, (a, b) in enumerate(zip(serial, wave)):
        assert (np.asarray(a) == np.asarray(b)).all(), f"output {i}"

    # decode side too
    serial_d = jax.jit(make_recon_pass_raw(cfg, False))(
        serial[3], serial[4], serial[5], sm, mm, mts)
    wave_d = jax.jit(make_recon_wave_raw(cfg, False))(
        serial[3], serial[4], serial[5], sm, mm, mts)
    for i, (a, b) in enumerate(zip(serial_d[:3], wave_d[:3])):
        assert (np.asarray(a) == np.asarray(b)).all(), f"dec output {i}"


def test_full_pipeline_with_wavefront():
    # the default pipeline (wavefront selected) stays MD5 bit-exact
    cfg = CodecConfig(width=128, height=96, qp=30, deblock=True, sao=True)
    fr = synthetic_frame(128, 96, kind="noise", seed=14)
    res = Encoder(cfg).encode([fr])
    _, dec = Decoder().decode(res.bitstream)
    assert frame_md5(res.recon[0]) == frame_md5(dec[0])
