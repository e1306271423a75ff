"""C6 unit tests: intra prediction weight matrices + TPU kernels."""

import numpy as np
import pytest

from x266_tpu.kernels import intra as kintra
from x266_tpu.specmodel import intra as spec


def _random_refs(size, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, spec.ref_len(size))).astype(np.int32)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_weight_row_sums(size):
    for mode in range(spec.NUM_MODES):
        w = spec.weight_matrix(size, mode)
        assert (w.sum(axis=1) == (1 << spec.mode_shift(size, mode))).all()
        assert w.min() >= 0 and w.max() <= 127


@pytest.mark.parametrize("size", [8, 16])
def test_pure_directional_modes(size):
    ref = np.arange(spec.ref_len(size)).astype(np.int32) * 3 % 251
    # mode 26 = pure vertical: every row equals top[x] (no smoothing at
    # dist 0); mode 10 = pure horizontal: every column equals left[y].
    pv = spec.predict(ref, size, 26)
    top = ref[1:1 + size]
    assert (pv == np.tile(top, (size, 1))).all()
    ph = spec.predict(ref, size, 10)
    left = ref[1 + 2 * size:1 + 3 * size]
    assert (ph == np.tile(left[:, None], (1, size))).all()


def test_dc_constant():
    size = 8
    ref = np.full(spec.ref_len(size), 200, dtype=np.int32)
    p = spec.predict(ref, size, spec.DC)
    assert (p == 200).all()
    p = spec.predict(ref, size, spec.PLANAR)
    assert (p == 200).all()


def test_mode2_diagonal():
    # mode 2, 4x4 (no smoothing at size 4), angle +32 horizontal family:
    # prediction comes purely from the left reference line.
    size = 4
    ref = np.zeros(spec.ref_len(size), dtype=np.int32)
    ref[1 + 2 * size:] = np.arange(2 * size) * 7 + 3   # left samples
    p = spec.predict(ref, size, 2)
    left = ref[1 + 2 * size:]
    # pred[x][y] for mode 2: refMain[x + y + 2 - 1] = left[x + y + 1]
    for y in range(size):
        for x in range(size):
            assert p[y, x] == left[x + y + 1]


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_kernel_matches_spec(size):
    refs = _random_refs(size, 9, seed=size)
    got = np.asarray(kintra.predict_all_modes(refs, size))
    for b in range(refs.shape[0]):
        for mode in range(spec.NUM_MODES):
            want = spec.predict(refs[b], size, mode)
            assert (got[b, mode] == want).all(), (b, mode)


@pytest.mark.parametrize("size", [8, 32])
def test_predict_mode_matches(size):
    import jax.numpy as jnp
    refs = _random_refs(size, 3, seed=99)
    for mode in (0, 1, 2, 10, 18, 26, 34, 13, 27):
        for b in range(3):
            got = np.asarray(kintra.predict_mode(
                jnp.asarray(refs[b]), jnp.int32(mode), size))
            want = spec.predict(refs[b], size, mode)
            assert (got == want).all(), (b, mode)


def test_prediction_range():
    # predictions of 8-bit refs stay within 8-bit range for every mode
    for size in (4, 8, 16, 32):
        refs = _random_refs(size, 4, seed=7)
        refs[0] = 0
        refs[1] = 255
        got = np.asarray(kintra.predict_all_modes(refs, size))
        assert got.min() >= 0 and got.max() <= 255
