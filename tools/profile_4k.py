"""4K RA step timing on the attached TPU (config 4 shape).

Times the fused I / P / B encode steps device-side (forced download
per step to defeat the tunnel enqueue-ack) using preset_cfg4 minus the
flags given on the command line, e.g.:

    python tools/profile_4k.py            # full cfg4 (all filters, rdoq)
    python tools/profile_4k.py --no-alf
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from x266_tpu.config import preset_cfg4
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine import fused

kw = {}
for a in sys.argv[1:]:
    if a.startswith("--no-"):
        kw[a[5:].replace("-", "_")] = False
cfg = preset_cfg4().replace(**kw)
print("cfg:", {k: getattr(cfg, k) for k in
               ("deblock", "sao", "sao_chroma", "alf", "alf_chroma",
                "rdoq", "gop_size")})

frames = synthetic_clip(cfg.width, cfg.height, 3, kind="mixed")
packed = [jax.device_put(fused.pack_input(cfg, f)) for f in frames]

step_i = fused.make_encode_step_i(cfg, False, True)
step_p = fused.make_encode_step_p(cfg, False)
step_b = fused.make_encode_step_b(cfg, False, False)


def run_i(p):
    return step_i(p)


def sync(out):
    f = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(f.astype(jnp.float32)))


def timeit(name, fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    print(f"{name:10s} {(time.time() - t0) / n * 1000:8.0f} ms")
    return out

out_i = timeit("I step", step_i, packed[0])
pyr0 = out_i[-1]
out_p = timeit("P step", step_p, packed[2], *pyr0)
pyr1 = out_p[-1]
timeit("B step", step_b, packed[1], *pyr0, *pyr1)
