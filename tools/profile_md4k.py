"""4K B-picture mode-decision breakdown on the attached TPU."""
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
from x266_tpu.engine import mode_decision as mdm
from x266_tpu.engine.inter import (make_mode_decision_b_raw,
                                   make_mode_decision_p_raw)
from x266_tpu.kernels import me as kme

cfg = preset_cfg4()
frames = synthetic_clip(cfg.width, cfg.height, 3, kind="mixed")
packed = [jax.device_put(fused.pack_input(cfg, f)) for f in frames]
step_i = fused.make_encode_step_i(cfg, False, True)
out_i = step_i(packed[0])
pyr0 = out_i[-1]
step_p = fused.make_encode_step_p(cfg, False)
out_p = step_p(packed[2], *pyr0)
pyr1 = out_p[-1]


def sync(o):
    f = jax.tree_util.tree_leaves(o)[0]
    float(jnp.sum(f.astype(jnp.float32)))


def timeit(name, fn, *args, n=4):
    o = fn(*args)
    jax.block_until_ready(o)
    sync(o)
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    print(f"{name:24s} {(time.time() - t0) / n * 1000:8.0f} ms")
    return o


yP, cbP, crP = jax.jit(lambda p: fused._unpack_padded(cfg, p))(packed[1])
yP = jax.device_put(np.asarray(yP))
p0y = pyr0[0]
p1y = pyr1[0]

mdb = jax.jit(make_mode_decision_b_raw(cfg))
timeit("B mode decision total", mdb, yP, p0y, p1y)

cur = jax.jit(lambda p: p.astype(jnp.int32)[1:1 + cfg.height,
                                            1:1 + cfg.width])(yP)
me_j = jax.jit(lambda c, p: kme.me_search(c, p, cfg,
                                          float(cfg.lambda_mode)))
timeit("me_search (one list)", me_j, cur, p0y)

md_i = jax.jit(lambda p: mdm._eval_size(p.astype(jnp.int32), 8, cfg,
                                        inter_slice=True))
timeit("intra eval s=8", md_i, yP)
md_i16 = jax.jit(lambda p: mdm._eval_size(p.astype(jnp.int32), 16, cfg,
                                          inter_slice=True))
timeit("intra eval s=16", md_i16, yP)
md_i32 = jax.jit(lambda p: mdm._eval_size(p.astype(jnp.int32), 32, cfg,
                                          inter_slice=True))
timeit("intra eval s=32", md_i32, yP)

from x266_tpu.kernels import me_pallas
mv = me_j(cur, p0y)
warp_j = jax.jit(lambda p, m: me_pallas.warp_frames(
    p, jnp.stack([m, m, m]), cfg.height, cfg.width))
timeit("warp_frames x3", warp_j, p0y, mv)
