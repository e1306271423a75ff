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


# ---- reference-sample substitution (C6 [STD-shaped], round-5) --------------

@functools.cache
def _subst_perm(size: int):
    """Substitution scan permutation for the [corner, top 2s, left 2s]
    reference layout (engine.recon._gather_ref): HEVC's scan runs left
    column bottom->top, then corner, then top row left->right."""
    s = size
    perm = np.concatenate([np.arange(4 * s, 2 * s, -1), [0],
                           np.arange(1, 2 * s + 1)]).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


def substitute_refs(refs: jnp.ndarray, mask: jnp.ndarray,
                    mid: int) -> jnp.ndarray:
    """HEVC-style reference substitution (C6 [STD], the 8.4.4.2.2
    propagation scan; replaces the x266t constant-mid-gray deviation
    when cfg.ref_substitute — FORMAT.md §9.2).

    refs: (..., 4s+1) int32 gathered reference vectors; mask: same
    shape bool, True = sample really reconstructed.  Each unavailable
    entry takes the value of the nearest preceding available entry in
    the scan order (left bottom->top, corner, top left->right);
    entries before the first available one take the first available
    value; a fully unavailable vector reads mid.  Pure VPU math: one
    cummax + two gathers, batched over any leading dims.
    """
    s = (refs.shape[-1] - 1) // 4
    perm, inv = _subst_perm(s)
    v = refs[..., perm]
    m = mask[..., perm]
    n = v.shape[-1]
    j = jnp.arange(n, dtype=jnp.int32)
    last_av = jax.lax.cummax(jnp.where(m, j, -1), axis=v.ndim - 1)
    first_av = jnp.argmax(m, axis=-1).astype(jnp.int32)[..., None]
    src = jnp.where(last_av >= 0, last_av, first_av)
    filled = jnp.take_along_axis(v, src, axis=-1)
    any_av = jnp.any(m, axis=-1, keepdims=True)
    filled = jnp.where(any_av, filled, mid)
    return filled[..., inv]


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


@functools.cache
def _pdpc_consts(size: int, n_modes: int):
    """(cls (nm,), wL (s,), wT (s,)) numpy constants for the PDPC blend."""
    cls = np.array([spec.pdpc_mode_class(m, n_modes)
                    for m in range(n_modes)], dtype=np.int32)
    wl, wt = spec.pdpc_weights(size)
    return cls, wl, wt


def _apply_pdpc_batched(preds: jnp.ndarray, refs: jnp.ndarray,
                        size: int, n_modes: int,
                        left_ok=None, top_ok=None) -> jnp.ndarray:
    """PDPC blend over (B, nm, s, s) preds with RAW refs (B, R) int32.

    Mirrors specmodel.intra.apply_pdpc: pure int32 VPU element-wise math
    (terms bounded by 64*2^15), selected per mode by class masks.
    left_ok/top_ok: (B,) int32/bool availability gates (None = all on).
    """
    s = size
    b = preds.shape[0]
    cls_np, wl_np, wt_np = _pdpc_consts(s, n_modes)
    lok = (jnp.ones((b,), jnp.int32) if left_ok is None
           else left_ok.astype(jnp.int32))[:, None, None, None]
    tok = (jnp.ones((b,), jnp.int32) if top_ok is None
           else top_ok.astype(jnp.int32))[:, None, None, None]
    cls = jnp.asarray(cls_np)[None, :, None, None]        # (1, nm, 1, 1)
    wl = jnp.asarray(wl_np)[None, None, None, :] * lok    # by column x
    wt = jnp.asarray(wt_np)[None, None, :, None] * tok    # by row y
    corner = refs[:, 0][:, None, None, None]
    top = refs[:, 1:1 + s][:, None, None, :]              # (B, 1, 1, s)
    left = refs[:, 2 * s + 1:2 * s + 1 + s][:, None, :, None]
    both = (lok & tok) == 1
    pd = (wl * left + wt * top + (64 - wl - wt) * preds + 32) >> 6
    ver = (64 * preds + wl * (left - corner) + 32) >> 6
    hor = (64 * preds + wt * (top - corner) + 32) >> 6
    out = jnp.where(cls == spec.PDPC_PD, pd, preds)
    out = jnp.where(both & (cls == spec.PDPC_VER), ver, out)
    return jnp.where(both & (cls == spec.PDPC_HOR), hor, out)


def _pdpc_on(pdpc: bool, size: int) -> bool:
    """PDPC application rule per TU size.  X266T_PDPC_MIN_SIZE=N
    restricts the blend to TUs >= N (measurement switch: the decoupled
    Pass-A search misvalues the boundary-weighted blend most on small
    blocks, round-5 experiment)."""
    import os

    return pdpc and size >= int(os.environ.get(
        "X266T_PDPC_MIN_SIZE", "0"))


def predict_all_modes(refs: jnp.ndarray, size: int,
                      n_modes: int = spec.NUM_MODES,
                      pdpc: bool = False,
                      left_ok=None, top_ok=None) -> jnp.ndarray:
    """(B, R) int32 reference vectors -> (B, n_modes, s, s) int32.

    Exact-integer f32 matmul on the MXU (refs <= 255 are 8-bit, weights
    int8, per-mode row sums <= 2^6 -> partial sums < 2^24, exact); the
    int32 einsum this replaces lowers to VPU loops and was the encoder's
    single hottest op (~30x slower) at 1080p.
    """
    w, shifts, _ = _consts(size, n_modes)
    refs = refs.astype(jnp.int32)
    ext = extend_refs(refs, size)
    p = jnp.einsum("bn,mkn->bmk", ext.astype(jnp.float32),
                   w.astype(jnp.float32),
                   precision=_HIGHEST).astype(jnp.int32)
    sh = shifts[None, :, None]
    p = (p + (1 << (sh - 1))) >> sh
    b = refs.shape[0]
    p = p.reshape(b, n_modes, size, size)
    if pdpc:
        p = _apply_pdpc_batched(p, refs, size, n_modes, left_ok, top_ok)
    return p


def predict_mode(ref: jnp.ndarray, mode: jnp.ndarray, size: int,
                 n_modes: int = spec.NUM_MODES,
                 pdpc: bool = False,
                 left_ok=None, top_ok=None) -> jnp.ndarray:
    """One (R,) ref vector + scalar mode -> (s, s) int32 prediction.

    Used inside the reconstruction scan (batch=1, mode is a traced
    scalar); weights are gathered by dynamic index.
    """
    w, shifts, _ = _consts(size, n_modes)
    ref = ref.astype(jnp.int32)
    ext = extend_refs(ref[None], size)[0]
    wm = jax.lax.dynamic_index_in_dim(jnp.asarray(w), mode, axis=0,
                                      keepdims=False)
    p = jnp.matmul(wm.astype(jnp.float32), ext.astype(jnp.float32),
                   precision=_HIGHEST).astype(jnp.int32)
    sh = jnp.asarray(shifts)[mode]
    p = (p + (1 << (sh - 1))) >> sh
    p = p.reshape(size, size)
    if pdpc:
        s = size
        cls_np, wl_np, wt_np = _pdpc_consts(s, n_modes)
        lok = (jnp.int32(1) if left_ok is None
               else left_ok.astype(jnp.int32))
        tok = (jnp.int32(1) if top_ok is None
               else top_ok.astype(jnp.int32))
        cls = jnp.asarray(cls_np)[mode]                   # traced scalar
        wl = jnp.asarray(wl_np)[None, :] * lok            # by column x
        wt = jnp.asarray(wt_np)[:, None] * tok            # by row y
        corner = ref[0]
        top = ref[1:1 + s][None, :]
        left = ref[2 * s + 1:2 * s + 1 + s][:, None]
        both = (lok & tok) == 1
        pd = (wl * left + wt * top + (64 - wl - wt) * p + 32) >> 6
        ver = (64 * p + wl * (left - corner) + 32) >> 6
        hor = (64 * p + wt * (top - corner) + 32) >> 6
        p = jnp.where(cls == spec.PDPC_PD, pd, p)
        p = jnp.where(both & (cls == spec.PDPC_VER), ver, p)
        p = jnp.where(both & (cls == spec.PDPC_HOR), hor, p)
    return p
