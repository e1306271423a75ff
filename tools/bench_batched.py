"""Vmapped (multi-frame) fused step with the Pallas recon on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from x266_tpu.config import CodecConfig
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine import fused

cfg = CodecConfig(width=1920, height=1080, qp=32, rows_per_segment=1)
N = 4
frames = synthetic_clip(1920, 1080, N, kind="mixed")
packed = np.stack([fused.pack_input(cfg, f) for f in frames])

single = fused.make_encode_step(cfg, with_recon=False)
o1 = single(packed[0])
jax.block_until_ready(o1)
t0 = time.time()
for i in range(N):
    o1 = single(packed[i])
jax.block_until_ready(o1)
t_single = (time.time() - t0) / N
print(f"single-frame step: {t_single*1000:.1f} ms/frame (device+upload)")

t0 = time.time()
batched = fused.make_encode_step_i_batched(cfg, with_recon=False)
ob = batched(packed)
jax.block_until_ready(ob)
print(f"batched compile+run1: {time.time()-t0:.1f}s")
t0 = time.time()
n = 3
for _ in range(n):
    ob = batched(packed)
jax.block_until_ready(ob)
t_b = (time.time() - t0) / n / N
print(f"batched step: {t_b*1000:.1f} ms/frame ({t_single/t_b:.2f}x)")

# equality vs single
for i in range(N):
    oi = single(packed[i])
    a_low, a_high = oi[0]
    b_low, b_high = ob[0][0][i], ob[0][1][i]
    ok = ((np.asarray(a_low) == np.asarray(b_low)).all()
          and (np.asarray(a_high) == np.asarray(b_high)).all()
          and (np.asarray(oi[1]) == np.asarray(ob[1][i])).all())
    print(f"frame {i}: {'BIT-EXACT' if ok else 'MISMATCH!!'}")
