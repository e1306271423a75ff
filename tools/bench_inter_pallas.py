"""P-picture recon: XLA scan vs Pallas kernel on TPU, 1080p."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from x266_tpu.config import CodecConfig
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine import fused
from x266_tpu.engine.mode_decision import pad_plane
from x266_tpu.engine.inter import (make_mode_decision_p_raw,
                                   make_recon_inter_raw)
from x266_tpu.engine.recon_pallas import make_recon_inter_pallas_raw

cfg = CodecConfig(width=1920, height=1080, qp=32, intra_period=8)
f0, f1 = synthetic_clip(1920, 1080, 2, kind="mixed")
pyr = jax.jit(lambda a, b, c: fused._build_pyramids_device(
    a.astype(jnp.int32), b.astype(jnp.int32), c.astype(jnp.int32)))(
        f0.y, f0.cb, f0.cr)
pyr = jax.block_until_ready(pyr)

yP = jax.device_put(pad_plane(f1.y).astype(np.int32))
cbP = jax.device_put(pad_plane(f1.cb).astype(np.int32))
crP = jax.device_put(pad_plane(f1.cr).astype(np.int32))
mdp = jax.jit(make_mode_decision_p_raw(cfg))
t0 = time.time()
maps = jax.block_until_ready(mdp(yP, pyr[0]))
print(f"mode_decision_p compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(5):
    maps = mdp(yP, pyr[0])
jax.block_until_ready(maps)
print(f"mode_decision_p: {(time.time()-t0)/5*1000:.1f} ms")
size_map, mode_map, pred_map, mvx_map, mvy_map = maps
kinds = np.asarray(pred_map)
print("CU kind mix: intra/inter/skip =",
      [(kinds == k).mean().round(3) for k in (0, 1, 2)])
mts_map = jnp.zeros_like(size_map)
args = (yP, cbP, crP, size_map, mode_map, mts_map, pred_map,
        mvx_map, mvy_map, *pyr)

for name, fn in [("xla-scan", make_recon_inter_raw(cfg, True)),
                 ("pallas", make_recon_inter_pallas_raw(cfg, True))]:
    j = jax.jit(fn)
    t0 = time.time()
    r = jax.block_until_ready(j(*args))
    print(f"{name} compile+run1: {time.time()-t0:.1f}s")
    t0 = time.time()
    n = 5
    for _ in range(n):
        r = j(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms/frame")
    if name == "xla-scan":
        ref = r
    else:
        for i, nm in enumerate(["recY", "recCb", "recCr", "cY", "cCb",
                                "cCr", "mvx", "mvy"]):
            ok = (np.asarray(ref[i]) == np.asarray(r[i])).all()
            print(f"  {nm}: {'BIT-EXACT' if ok else 'MISMATCH!!'}")
