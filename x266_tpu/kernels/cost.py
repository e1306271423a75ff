"""Encoder cost metrics (C9): SSE, SATD, rate estimation.

Encoder-side only (non-normative), so float32 is allowed here — unlike the
exact-int normative path.  RD cost = D + lambda * R with HM-style lambda
(config.lambda_mode) [STD convention].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared errors over trailing 2 dims."""
    d = (a - b).astype(jnp.float32)
    return jnp.sum(d * d, axis=(-2, -1))


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def satd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute Hadamard-transformed differences over the trailing
    (8x8) dims (HM-style SATD8) — ME/mode preselection metric."""
    h = jnp.asarray(_hadamard(8))
    d = (a - b).astype(jnp.float32)
    t = jnp.einsum("ij,...jk,kl->...il", h, d, h)
    return jnp.sum(jnp.abs(t), axis=(-2, -1)) / 4.0


def rate_estimate_levels(levels: jnp.ndarray) -> jnp.ndarray:
    """Approximate entropy-coded bits for quantized levels over trailing 2
    dims.  Surrogate model: each nonzero costs ~3 bits of flags plus
    2*log2(|l|+1) magnitude bits; zeros in the significance map cost a
    small fraction.  Tracks the real coder closely enough for RD ranking.
    """
    al = jnp.abs(levels).astype(jnp.float32)
    nz = al > 0
    bits = jnp.where(nz, 3.0 + 2.0 * jnp.log2(al + 1.0), 0.0625)
    return jnp.sum(bits, axis=(-2, -1))
