"""Per-kernel roofline accounting (SURVEY §5 tracing; VERDICT r03 #9).

Uses XLA's own compiled-module cost analysis (flops + bytes accessed)
rather than hand math, so the numbers track the kernels as compiled.
`measure(fn, args, name)` compiles, reads the cost analysis, times the
execution with a real device sync, and returns a roofline record:
achieved GFLOP/s and GB/s plus the fraction of the chip's peaks.

Peaks default to TPU v5e (the attached chip): 197 TFLOP/s bf16 and
819 GB/s HBM [public spec].  The codec's hot kernels are integer-heavy
(MXU int matmuls + VPU int ops), so `frac_flops` is a lower bound on
MXU utilization; `frac_bw` is the operative ceiling for the
element-wise filter/pack stages.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12          # bf16 FLOP/s per chip
V5E_PEAK_BYTES = 819e9           # HBM GB/s per chip


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.int32)))


def cost_of(compiled) -> tuple[float, float]:
    """(flops, bytes_accessed) from a compiled executable's XLA cost
    analysis; zeros when the backend does not report them."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        return flops, bts
    except Exception:                       # noqa: BLE001
        return 0.0, 0.0


def measure(fn, args, name: str, iters: int = 3,
            peak_flops: float = V5E_PEAK_FLOPS,
            peak_bytes: float = V5E_PEAK_BYTES) -> dict:
    """Compile fn(*args), read its cost analysis, time it, and return
    the roofline record."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    flops, bts = cost_of(compiled)
    out = compiled(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
        _sync(out)
    dt = (time.time() - t0) / iters
    rec = {
        "metric": "roofline", "kernel": name, "ms": round(dt * 1e3, 2),
        "gflops": round(flops / dt / 1e9, 1) if flops else None,
        "gbps": round(bts / dt / 1e9, 1) if bts else None,
        "flops": flops, "bytes": bts,
        "frac_flops_peak": (round(flops / dt / peak_flops, 4)
                            if flops else None),
        "frac_bw_peak": (round(bts / dt / peak_bytes, 4)
                         if bts else None),
        "ts": time.time(),
    }
    return rec


def append_metrics(records, path: str | None = None) -> None:
    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "METRICS.jsonl")
    with open(path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
