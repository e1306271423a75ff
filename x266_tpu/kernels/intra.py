"""Batched intra prediction on TPU (C6).

TPU-first design: all 35 modes for B blocks are ONE int8xint32 matmul
against the stacked weight matrices from ``specmodel.intra`` — the MXU does
intra prediction (SURVEY.md §1.2 T1), instead of the reference's per-mode
scalar loops.  The same matrices drive the single-block path used inside
the normative reconstruction scan, so RD search and decode agree exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.specmodel import intra as spec


@functools.cache
def _consts(size: int, n_modes: int = spec.NUM_MODES):
    # NumPy (not jnp) so the cache never holds trace-scoped constants.
    w, shifts = spec.stacked_weights(size, n_modes)
    s = spec.smoothing_matrix(size)
    return (w.astype(np.int8), shifts.astype(np.int32),
            s.astype(np.int8))


_HIGHEST = jax.lax.Precision.HIGHEST


def extend_refs(refs: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, R) int32 raw refs -> (B, 2R) [raw, smoothed].

    f32 MXU matmul, exact: refs <= 255 and smoothing rows sum to 4, so
    every partial sum is an exact integer < 2^24.
    """
    _, _, s = _consts(size)[:3]
    sm = jnp.einsum("br,nr->bn", refs.astype(jnp.float32),
                    s.astype(jnp.float32),
                    precision=_HIGHEST).astype(jnp.int32)
    sm = (sm + 2) >> 2
    return jnp.concatenate([refs, sm], axis=-1)


def predict_all_modes(refs: jnp.ndarray, size: int,
                      n_modes: int = spec.NUM_MODES) -> jnp.ndarray:
    """(B, R) int32 reference vectors -> (B, n_modes, s, s) int32.

    Exact-integer f32 matmul on the MXU (refs <= 255 are 8-bit, weights
    int8, per-mode row sums <= 2^6 -> partial sums < 2^24, exact); the
    int32 einsum this replaces lowers to VPU loops and was the encoder's
    single hottest op (~30x slower) at 1080p.
    """
    w, shifts, _ = _consts(size, n_modes)
    ext = extend_refs(refs.astype(jnp.int32), size)
    p = jnp.einsum("bn,mkn->bmk", ext.astype(jnp.float32),
                   w.astype(jnp.float32),
                   precision=_HIGHEST).astype(jnp.int32)
    sh = shifts[None, :, None]
    p = (p + (1 << (sh - 1))) >> sh
    b = refs.shape[0]
    return p.reshape(b, n_modes, size, size)


def predict_mode(ref: jnp.ndarray, mode: jnp.ndarray, size: int,
                 n_modes: int = spec.NUM_MODES) -> jnp.ndarray:
    """One (R,) ref vector + scalar mode -> (s, s) int32 prediction.

    Used inside the reconstruction scan (batch=1, mode is a traced
    scalar); weights are gathered by dynamic index.
    """
    w, shifts, _ = _consts(size, n_modes)
    ext = extend_refs(ref.astype(jnp.int32)[None], size)[0]
    wm = jax.lax.dynamic_index_in_dim(jnp.asarray(w), mode, axis=0,
                                      keepdims=False)
    p = jnp.matmul(wm.astype(jnp.float32), ext.astype(jnp.float32),
                   precision=_HIGHEST).astype(jnp.int32)
    sh = jnp.asarray(shifts)[mode]
    p = (p + (1 << (sh - 1))) >> sh
    return p.reshape(size, size)
