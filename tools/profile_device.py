"""Device-side stage timing at 1080p (inputs device-resident)."""
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
from x266_tpu.engine.mode_decision import (make_mode_decision,
                                           make_mts_select)
from x266_tpu.engine.recon import select_recon_impl

cfg = CodecConfig(width=1920, height=1080, qp=32, rows_per_segment=1)
f = synthetic_clip(1920, 1080, 1, kind="mixed")[0]
packed = jax.device_put(fused.pack_input(cfg, f))
yP, cbP, crP = jax.jit(lambda p: fused._unpack_padded(cfg, p))(packed)
yP = yP.astype(jnp.int32)
cbP = cbP.astype(jnp.int32)
crP = crP.astype(jnp.int32)

md = make_mode_decision(cfg)
size_map, mode_map = md(yP)
mts_map = jnp.zeros_like(size_map)
rp = jax.jit(select_recon_impl(cfg, True))
out = rp(yP, cbP, crP, size_map, mode_map, mts_map)
jax.block_until_ready(out)
step = fused.make_encode_step(cfg, with_recon=False)
o = step(packed)
jax.block_until_ready(o)


def bench(name, fn, n=5):
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:24s}: {(time.time()-t0)/n*1000:8.1f} ms")
    return r


bench("mode_decision", lambda: md(yP))
bench("recon_pallas", lambda: rp(yP, cbP, crP, size_map, mode_map,
                                 mts_map))
bench("fused_step(total)", lambda: step(packed))

# upload cost
pk = fused.pack_input(cfg, f)
t0 = time.time()
n = 5
for _ in range(n):
    d = jax.device_put(pk)
jax.block_until_ready(d)
print(f"{'upload(packed 4.6MB)':24s}: {(time.time()-t0)/n*1000:8.1f} ms")

# download cost of coef low plane
low = o[0][0]
t0 = time.time()
for _ in range(n):
    _ = np.asarray(low)
print(f"{'download(coef low)':24s}: {(time.time()-t0)/n*1000:8.1f} ms")
t0 = time.time()
for _ in range(n):
    _ = np.asarray(o[1])
print(f"{'download(maps flat)':24s}: {(time.time()-t0)/n*1000:8.1f} ms")
