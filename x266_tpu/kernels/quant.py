"""Batched quantization on TPU (C11), mirroring specmodel.quant.

Pure VPU element-wise integer math; fuses into the surrounding transform
matmuls under jit.  Shifts are Python ints (static per (size, qp) trace),
so no dynamic shapes reach XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from x266_tpu.specmodel.quant import (DEQUANT_SCALES, QUANT_SCALES,
                                      transform_shift)


def quantize(coef: jnp.ndarray, qp: int, size: int) -> jnp.ndarray:
    qbits = 14 + qp // 6 + transform_shift(size)
    add = 171 << (qbits - 9)
    scale = int(QUANT_SCALES[qp % 6])
    # |coef| <= 32768, fQ <= 26214, add < 2^26  =>  fits int32 exactly.
    c = coef.astype(jnp.int32)
    level = (jnp.abs(c) * scale + add) >> qbits
    level = jnp.clip(level, 0, 32767)
    return (jnp.sign(c) * level).astype(jnp.int32)


def dequantize(level: jnp.ndarray, qp: int, size: int) -> jnp.ndarray:
    ishift = 6 - transform_shift(size)
    scale = int(DEQUANT_SCALES[qp % 6]) << (qp // 6)
    c = (level.astype(jnp.int32) * scale + (1 << (ishift - 1))) >> ishift
    return jnp.clip(c, -32768, 32767)
