"""Differential tests: native C++ entropy engine == Python reference,
bit-for-bit (SURVEY.md §4 "Unit (CABAC)" row).
"""

import numpy as np
import pytest

from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder
from x266_tpu.config import CodecConfig
from tests.test_syntax import random_maps

pytestmark = pytest.mark.skipif(not native_bind.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("seed,density,mag", [
    (0, 0.15, 12), (1, 0.02, 4), (2, 0.6, 300), (3, 0.0, 1), (4, 0.9, 255),
])
def test_native_matches_python_encode(seed, density, mag):
    cfg = CodecConfig(width=128, height=64)
    rng = np.random.default_rng(seed)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, density, mag)

    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr).encode_segment(
        0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr,
                                     0, cfg.ctus_y)
    assert nat == py, (len(nat), len(py))


def test_native_matches_python_cu64():
    """64-CU trees (low-band 64-TU coding, round-5): native == Python
    byte-for-byte, and both decoders reproduce the maps."""
    from x266_tpu.config import Profile

    cfg = CodecConfig(width=128, height=128, profile=Profile.VVC,
                      max_cu_size=64)
    rng = np.random.default_rng(8)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.2, 40)
    assert (sm == 64).any(), "no 64-CU in the random tree"
    py = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr).encode_segment(
        0, cfg.ctus_y)
    nat = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr,
                                     0, cfg.ctus_y)
    assert nat == py
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, nat)
    assert (dec.size_map == sm).all()
    assert (dec.coef["y"] == cy).all()
    dec2 = SyntaxDecoder(cfg)
    dec2.decode_segment(py, 0, cfg.ctus_y)
    assert (dec2.coef["y"] == cy).all()


@pytest.mark.parametrize("seed", [0, 2, 4])
def test_native_decode_roundtrip(seed):
    cfg = CodecConfig(width=128, height=64)
    rng = np.random.default_rng(seed)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.3, 64)
    data = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr,
                                      0, cfg.ctus_y)
    dec = SyntaxDecoder(cfg)
    native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                               dec.coef["y"], dec.coef["cb"],
                               dec.coef["cr"], 0, cfg.ctus_y, data)
    assert (dec.size_map == sm).all()
    assert (dec.mode_map == mm).all()
    assert (dec.coef["y"] == cy).all()
    assert (dec.coef["cb"] == ccb).all()
    assert (dec.coef["cr"] == ccr).all()
    # and the python decoder agrees on the same bytes
    dec2 = SyntaxDecoder(cfg)
    dec2.decode_segment(data, 0, cfg.ctus_y)
    assert (dec2.coef["y"] == cy).all()


def test_native_truncation_clean():
    cfg = CodecConfig(width=64, height=64)
    rng = np.random.default_rng(1)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.4, 100)
    data = native_bind.encode_segment(cfg, sm, mm, cy, ccb, ccr, 0, 1)
    dec = SyntaxDecoder(cfg)
    with pytest.raises(ValueError):
        native_bind.decode_segment(cfg, dec.size_map, dec.mode_map,
                                   dec.coef["y"], dec.coef["cb"],
                                   dec.coef["cr"], 0, 1,
                                   data[:max(1, len(data) // 3)])
