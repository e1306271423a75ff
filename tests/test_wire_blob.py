"""One-buffer wire blob unit gates (round-4 download path).

The batched-I finalize downloads ONE uint8 blob (nib + escapes + maps
+ stats); these pin the device pack <-> host unpack round trip
bit-exactly, independent of the e2e tests that exercise it implicitly.
"""

import numpy as np
import pytest

from x266_tpu.config import CodecConfig
from x266_tpu.engine import fused


@pytest.mark.parametrize("seed", [0, 3])
def test_blob_roundtrip(seed):
    import jax.numpy as jnp

    cfg = CodecConfig(width=128, height=64, qp=30)
    h, w = cfg.height, cfg.width
    hc = h + h // 2
    k = fused._esc_capacity(w)
    rng = np.random.default_rng(seed)
    nib = rng.integers(0, 256, (hc, w // 2)).astype(np.uint8)
    vals = rng.integers(-3000, 3000, (hc, k)).astype(np.int16)
    cols = rng.integers(0, w, (hc, k)).astype(np.int16)
    _, flat_len = fused._wire_spec(cfg, False)
    flat = rng.integers(0, 256, (flat_len,)).astype(np.uint8)
    stats = rng.random(5).astype(np.float32) * 1e6

    blob = np.asarray(fused._pack_blob_device(
        jnp.asarray(nib), jnp.asarray(vals), jnp.asarray(cols),
        jnp.asarray(flat), jnp.asarray(stats)))
    n2, v2, c2, f2, s2 = fused.unpack_blob(cfg, blob, inter=False)
    np.testing.assert_array_equal(n2, nib)
    np.testing.assert_array_equal(v2, vals)
    np.testing.assert_array_equal(c2, cols)
    np.testing.assert_array_equal(f2, flat)
    np.testing.assert_array_equal(s2, stats)


def test_blob_layout_total():
    cfg = CodecConfig(width=256, height=128, qp=30)
    layout, total = fused._blob_layout(cfg, inter=False)
    assert total == sum(ln for _, _, ln in layout)
    offs = [a for _, a, _ in layout]
    assert offs == sorted(offs)


def test_expand_nib_matches_lut():
    from x266_tpu.cabac import native_bind

    rng = np.random.default_rng(9)
    nib = rng.integers(0, 256, (96, 64)).astype(np.uint8)
    lut = fused._NIB_LUT[nib].reshape(96, -1)
    nat = native_bind.expand_nib(nib)
    if nat is None:
        pytest.skip("no native toolchain")
    np.testing.assert_array_equal(nat, lut)
