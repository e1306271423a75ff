"""Batched integer transforms on TPU (C10).

Design (TPU-first, SURVEY.md §1.2 T1): a transform of a batch of B blocks
of size s is two int32 matmuls of shape (B*s, s) x (s, s) — dense, static,
MXU/VPU-tileable — instead of the reference's scalar partial butterflies.
Exactness: int32 dot has exact XLA semantics; operand magnitudes stay below
2^31 by the HEVC shift schedule (see specmodel.transforms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.specmodel import transforms as spec


@functools.cache
def _mat(tx_type: int, size: int) -> np.ndarray:
    return spec.matrix_for(tx_type, size).astype(np.int32)


# MTS candidate set (C10, VVC-shaped): index -> (vertical, horizontal).
# 0 is the default DCT-II pair; 1..4 are the DST-VII/DCT-VIII combos.
MTS_COMBOS = ((spec.TX_DCT2, spec.TX_DCT2),
              (spec.TX_DST7, spec.TX_DST7),
              (spec.TX_DCT8, spec.TX_DST7),
              (spec.TX_DST7, spec.TX_DCT8),
              (spec.TX_DCT8, spec.TX_DCT8))


def _rshift_round(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


def forward_transform(residual: jnp.ndarray, size: int,
                      tx_v: int = spec.TX_DCT2,
                      tx_h: int = spec.TX_DCT2) -> jnp.ndarray:
    """(B, s, s) int32 residual -> (B, s, s) int32 coefficients."""
    log2s = size.bit_length() - 1
    tv = jnp.asarray(_mat(tx_v, size))
    th = jnp.asarray(_mat(tx_h, size))
    x = residual.astype(jnp.int32)
    # Vertical: T @ X  ==  einsum over rows of each block.
    tmp = jnp.einsum("kn,bnm->bkm", tv, x,
                     preferred_element_type=jnp.int32)
    tmp = _rshift_round(tmp, log2s - 1)
    coef = jnp.einsum("bkm,lm->bkl", tmp, th,
                      preferred_element_type=jnp.int32)
    coef = _rshift_round(coef, log2s + 6)
    return jnp.clip(coef, -32768, 32767)


def inverse_transform(coef: jnp.ndarray, size: int,
                      tx_v: int = spec.TX_DCT2,
                      tx_h: int = spec.TX_DCT2) -> jnp.ndarray:
    """Normative inverse: (B, s, s) int32 coefs -> int32 residual [STD]."""
    tv = jnp.asarray(_mat(tx_v, size))
    th = jnp.asarray(_mat(tx_h, size))
    c = coef.astype(jnp.int32)
    tmp = jnp.einsum("kn,bkm->bnm", tv, c,
                     preferred_element_type=jnp.int32)  # T^T @ C
    tmp = jnp.clip(_rshift_round(tmp, 7), -32768, 32767)
    res = jnp.einsum("bnm,ml->bnl", tmp, th,
                     preferred_element_type=jnp.int32)  # tmp @ T
    res = _rshift_round(res, 12)
    return jnp.clip(res, -32768, 32767)


def forward_transform_jit(size: int, tx_v: int = spec.TX_DCT2,
                          tx_h: int = spec.TX_DCT2):
    return jax.jit(lambda r: forward_transform(r, size, tx_v, tx_h))


def inverse_transform_jit(size: int, tx_v: int = spec.TX_DCT2,
                          tx_h: int = spec.TX_DCT2):
    return jax.jit(lambda c: inverse_transform(c, size, tx_v, tx_h))
