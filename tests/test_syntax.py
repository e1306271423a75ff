"""C3/C4 differential tests: entropy syntax layer round-trips exactly.

Random (but quadtree-realizable) partition/mode/coefficient data ->
SyntaxEncoder -> bytes -> SyntaxDecoder -> identical arrays.  Pure host
code (no JAX) so it also pins the layer the C++ engine must mirror.
"""

import numpy as np
import pytest

from x266_tpu.cabac.syntax import SyntaxDecoder, SyntaxEncoder, tu_scan
from x266_tpu.config import CodecConfig


def random_maps(cfg: CodecConfig, rng, coef_density=0.2, coef_mag=12):
    """Generate a valid random quadtree + modes + coefficients."""
    uy, ux = cfg.units_y, cfg.units_x
    size_map = np.zeros((uy, ux), dtype=np.int32)
    mode_map = np.zeros((uy, ux), dtype=np.int32)

    def fill(x, y, s):
        if x >= cfg.width or y >= cfg.height:
            return
        if s > cfg.max_cu_size or x + s > cfg.width or y + s > cfg.height \
                or (s > 8 and rng.random() < 0.5):
            for dx, dy in ((0, 0), (s // 2, 0), (0, s // 2),
                           (s // 2, s // 2)):
                fill(x + dx, y + dy, s // 2)
            return
        u = s // 8
        size_map[y // 8:y // 8 + u, x // 8:x // 8 + u] = s
        mode_map[y // 8:y // 8 + u, x // 8:x // 8 + u] = \
            rng.integers(0, 35)

    for cy in range(cfg.ctus_y):
        for cx in range(cfg.ctus_x):
            fill(cx * 64, cy * 64, 64)

    def coef_plane(h, w, mag):
        mask = rng.random((h, w)) < coef_density
        v = rng.integers(-mag, mag + 1, size=(h, w))
        return (v * mask).astype(np.int32)

    cy_ = coef_plane(cfg.height, cfg.width, coef_mag)
    ccb = coef_plane(cfg.height // 2, cfg.width // 2, coef_mag)
    ccr = coef_plane(cfg.height // 2, cfg.width // 2, coef_mag)
    if cfg.max_cu_size >= 64:
        # 64-TUs carry only the low 32x32 band (zero-out rule)
        for (yy, xx) in zip(*np.nonzero(size_map == 64)):
            y0, x0 = int(yy) * 8, int(xx) * 8
            if y0 % 64 == 0 and x0 % 64 == 0:
                cy_[y0:y0 + 64, x0 + 32:x0 + 64] = 0
                cy_[y0 + 32:y0 + 64, x0:x0 + 64] = 0
    return size_map, mode_map, cy_, ccb, ccr


@pytest.mark.parametrize("seed,density,mag", [
    (0, 0.15, 12), (1, 0.02, 4), (2, 0.6, 300), (3, 0.0, 1),
])
def test_syntax_roundtrip(seed, density, mag):
    cfg = CodecConfig(width=96, height=64)
    rng = np.random.default_rng(seed)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, density, mag)
    enc = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr)
    data = enc.encode_segment(0, cfg.ctus_y)
    dec = SyntaxDecoder(cfg)
    dec.decode_segment(data, 0, cfg.ctus_y)
    assert (dec.size_map == sm).all()
    assert (dec.mode_map == mm).all()
    assert (dec.coef["y"] == cy).all()
    assert (dec.coef["cb"] == ccb).all()
    assert (dec.coef["cr"] == ccr).all()


def test_scan_orders():
    for s in (4, 8, 16, 32):
        scan = tu_scan(s)
        # a permutation of all positions
        assert len({(int(x), int(y)) for x, y in scan}) == s * s
        # CG-contiguous: every run of 16 stays within one 4x4 CG
        for cg in range(s * s // 16):
            block = scan[cg * 16:(cg + 1) * 16]
            assert len({(int(x) // 4, int(y) // 4)
                        for x, y in block}) == 1


def test_extreme_levels():
    # lossless-scale magnitudes (up to +-255 residuals) survive the
    # Golomb-Rice escape path
    cfg = CodecConfig(width=64, height=64)
    rng = np.random.default_rng(7)
    sm, mm, cy, ccb, ccr = random_maps(cfg, rng, 0.9, 255)
    enc = SyntaxEncoder(cfg, sm, mm, cy, ccb, ccr)
    data = enc.encode_segment(0, 1)
    dec = SyntaxDecoder(cfg)
    dec.decode_segment(data, 0, 1)
    assert (dec.coef["y"] == cy).all()
