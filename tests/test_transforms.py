"""C10/C11 unit tests: integer transforms and quantization.

- generated matrices match the well-known HEVC T4/T8 tables exactly
- near-orthogonality of every matrix family
- JAX kernels are bit-identical to the NumPy spec model
- fwd∘inv round-trip error stays within the rounding budget
- quant∘dequant gain ~1 and lossless bypass is exact by construction
"""

import numpy as np
import pytest

from x266_tpu.kernels import quant as kquant
from x266_tpu.kernels import transforms as ktx
from x266_tpu.specmodel import quant as squant
from x266_tpu.specmodel import transforms as stx

T4_EXPECTED = np.array([
    [64, 64, 64, 64],
    [83, 36, -36, -83],
    [64, -64, -64, 64],
    [36, -83, 83, -36],
])

T8_ODD_ROWS = np.array([
    [89, 75, 50, 18, -18, -50, -75, -89],
    [75, -18, -89, -50, 50, 89, 18, -75],
    [50, -89, 18, 75, -75, -18, 89, -50],
    [18, -50, 75, -89, 89, -75, 50, -18],
])

DST7_4_EXPECTED = np.array([
    [29, 55, 74, 84],
    [74, 74, 0, -74],
    [84, -29, -74, 55],
    [55, -84, 74, -29],
])


def test_dct2_known_tables():
    assert (stx.dct2_matrix(4) == T4_EXPECTED).all()
    t8 = stx.dct2_matrix(8)
    assert (t8[1::2] == T8_ODD_ROWS).all()
    # even rows of T8 interleave T4 symmetrically
    assert (t8[0] == 64).all()
    assert (t8[4] == [64, -64, -64, 64, 64, -64, -64, 64]).all()
    t32 = stx.dct2_matrix(32)
    assert (t32[0] == 64).all()
    assert t32[1, 0] == 90 and t32[1, 15] == 4 and t32[1, 16] == -4


def test_dst7_table():
    assert (stx.dst7_matrix(4) == DST7_4_EXPECTED).all()


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_dct2_orthogonality(size):
    t = stx.dct2_matrix(size).astype(np.float64)
    g = t @ t.T
    norm = np.mean(np.diag(g))
    off = g - np.diag(np.diag(g))
    assert np.abs(off).max() / norm < 0.02
    assert abs(norm - size * 64 * 64) / (size * 64 * 64) < 0.01


@pytest.mark.parametrize("tx", [stx.TX_DST7, stx.TX_DCT8])
@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_mts_orthogonality(tx, size):
    t = stx.matrix_for(tx, size).astype(np.float64)
    g = t @ t.T
    norm = np.mean(np.diag(g))
    off = g - np.diag(np.diag(g))
    assert np.abs(off).max() / norm < 0.04


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("tx", [stx.TX_DCT2, stx.TX_DST7, stx.TX_DCT8])
def test_jax_matches_spec(size, tx):
    rng = np.random.default_rng(size * 10 + tx)
    blocks = rng.integers(-255, 256, size=(17, size, size)).astype(np.int32)
    want_f = np.stack([stx.forward_transform(b, tx, tx) for b in blocks])
    got_f = np.asarray(ktx.forward_transform_jit(size, tx, tx)(blocks))
    assert (want_f == got_f).all()
    want_i = np.stack([stx.inverse_transform(c, tx, tx) for c in want_f])
    got_i = np.asarray(ktx.inverse_transform_jit(size, tx, tx)(want_f))
    assert (want_i == got_i).all()


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_fwd_inv_roundtrip_error(size):
    rng = np.random.default_rng(99 + size)
    x = rng.integers(-255, 256, size=(size, size)).astype(np.int32)
    c = stx.forward_transform(x)
    y = stx.inverse_transform(c)
    # fwd∘inv is identity up to integer rounding of the two stages.
    assert np.abs(y - x).max() <= 4


@pytest.mark.parametrize("qp", [10, 22, 32, 45, 51])
@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_quant_dequant(qp, size, subtests=None):
    rng = np.random.default_rng(qp * size)
    x = rng.integers(-200, 201, size=(size, size)).astype(np.int32)
    c = stx.forward_transform(x)
    lv = squant.quantize(c, qp, size)
    cq = squant.dequantize(lv, qp, size)
    # JAX kernels bit-match the spec model.
    lv_j = np.asarray(kquant.quantize(c[None], qp, size)[0])
    cq_j = np.asarray(kquant.dequantize(lv[None], qp, size)[0])
    assert (lv_j == lv).all()
    assert (cq_j == cq).all()
    # quant∘dequant gain ~1: reconstruction error bounded by the step size.
    qstep = 2 ** ((qp - 4) / 6.0) * (2 ** squant.transform_shift(size))
    err = np.abs(cq - c).max()
    assert err <= qstep * 0.75 + 1
    # decode path of the quantized signal stays close to the original block
    y = stx.inverse_transform(cq)
    mse = float(np.mean((y - x) ** 2))
    assert mse <= (2 ** ((qp - 4) / 3.0)) / 3 + 2
