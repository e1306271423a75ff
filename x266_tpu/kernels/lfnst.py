"""LFNST (C10, VVC-shaped low-frequency non-separable transform).

A secondary transform on the top-left 4x4 of a luma TU's primary
(DCT2/DCT2) coefficients: forward on the encoder between the primary
transform and quantization, inverse on the decoder between
dequantization and the primary inverse.  x266t design [STD-shaped,
self-consistent deviations documented in FORMAT.md]:

- 4 transform sets selected by the intra mode's angular class (planar/
  DC, near-horizontal, diagonal, near-vertical-mirrored), 2 kernels per
  set, signalled lfnst_idx in {0, 1, 2} per TU; modes past the diagonal
  transpose the 4x4 region (the VVC symmetry trick).
- Kernels are 16x16 integer matrices at 1<<7 scale, TRAINED as KLTs of
  the primary-coefficient statistics of the synthetic corpus
  (tools/train_lfnst.py) — the same derivation VVC's constants came
  from, regenerated here rather than copied.
- Applies only to the 4x4 low band; higher-frequency primary
  coefficients pass through (x266t-lite; VVC zeroes them).
- Inverse is the transpose at the same scale; encoder and decoder share
  these functions, so reconstruction is bit-exact by construction.

TPU-first: the per-TU kernel select is a one-hot (B, 8) x (8, 256)
matmul, the transform an exact-int batched matvec via f32 limbs
(kernels.transforms._exact_mm rationale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.kernels.lfnst_tables import TABLES  # (8, 16, 16) int32

LFNST_SCALE_BITS = 7
N_SETS = 4


def mode_class(mode, n_modes: int, xp=jnp):
    """intra mode -> (set 0..3, transpose flag).

    Planar/DC -> set 0.  Angular modes fold across the main diagonal
    (transpose), then split the [2, diag] range into three equal
    classes.  Pure arithmetic: identical on device (traced), numpy and
    scalars.
    """
    diag = 18 if n_modes == 35 else 34
    # MIP-extended alphabets (n_modes > 67): MIP modes use the planar
    # kernel class, consistently on both coder sides
    mode = xp.where(mode >= 67, 0, mode) if n_modes > 67 else mode
    t = mode > diag
    a = xp.where(t, 2 * diag - mode, mode)
    a = xp.clip(a, 2, diag)
    s = 1 + xp.minimum(2, (3 * (a - 2)) // (diag - 1))
    s = xp.where(mode <= 1, 0, s)
    t = xp.where(mode <= 1, False, t)
    return s.astype(xp.int32) if xp is jnp else s, t


def _exact_matvec(mats: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """(B, 16, 16) int (|m| <= 127) x (B, 16) int (|v| < 2^16) exact."""
    mf = mats.astype(jnp.float32)
    lo = (vecs & 2047).astype(jnp.float32)
    hi = (vecs >> 11).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    rlo = jnp.einsum("bij,bj->bi", mf, lo, precision=hp
                     ).astype(jnp.int32)
    rhi = jnp.einsum("bij,bj->bi", mf, hi, precision=hp
                     ).astype(jnp.int32)
    return (rhi << 11) + rlo


def _select_mats(modes, lfnst_idx, n_modes: int,
                 inverse: bool) -> jnp.ndarray:
    """Per-block kernel: (B,) modes + (B,) idx (1/2) -> (B, 16, 16)."""
    s, _ = mode_class(modes, n_modes)
    kidx = s * 2 + (jnp.maximum(lfnst_idx, 1) - 1)       # (B,)
    tabs = jnp.asarray(TABLES, jnp.int32)                # (8, 16, 16)
    if inverse:
        tabs = jnp.swapaxes(tabs, 1, 2)
    onehot = jax.nn.one_hot(kidx, TABLES.shape[0], dtype=jnp.float32)
    m = jnp.einsum("bk,kij->bij", onehot, tabs.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return m.astype(jnp.int32)


def _apply(coef: jnp.ndarray, modes, lfnst_idx, n_modes: int,
           inverse: bool) -> jnp.ndarray:
    """(B, s, s) coefs: transform the top-left 4x4 where lfnst_idx > 0."""
    if coef.ndim == 2:
        return _apply(coef[None], jnp.atleast_1d(modes),
                      jnp.atleast_1d(lfnst_idx), n_modes, inverse)[0]
    b = coef.shape[0]
    _, t = mode_class(modes, n_modes)
    low = coef[:, :4, :4]
    lowt = jnp.where(t[:, None, None], jnp.swapaxes(low, 1, 2), low)
    vec = lowt.reshape(b, 16)
    mats = _select_mats(modes, lfnst_idx, n_modes, inverse)
    out = _exact_matvec(mats, vec)
    out = (out + (1 << (LFNST_SCALE_BITS - 1))) >> LFNST_SCALE_BITS
    out = jnp.clip(out, -32768, 32767).reshape(b, 4, 4)
    out = jnp.where(t[:, None, None], jnp.swapaxes(out, 1, 2), out)
    on = (lfnst_idx > 0)[:, None, None]
    new_low = jnp.where(on, out, low)
    return coef.at[:, :4, :4].set(new_low)


def lfnst_fwd(coef, modes, lfnst_idx, n_modes: int):
    """Encoder: primary coefficients -> secondary, where idx > 0."""
    return _apply(coef, modes, lfnst_idx, n_modes, inverse=False)


def lfnst_inv(coef, modes, lfnst_idx, n_modes: int):
    """Decoder/encoder-recon: dequantized -> primary-domain coefs."""
    return _apply(coef, modes, lfnst_idx, n_modes, inverse=True)
