"""Filter-chain stage timing at 4K on the attached TPU.

Times deblock / SAO estimate+apply / ALF estimate+apply / chroma
variants separately (each jitted standalone), plus the fused
_filters_and_stats, on device-resident int32 planes.  Forces a tiny
download per timing to defeat the tunnel's enqueue-ack (ROADMAP
"measurement gotcha").
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
from x266_tpu.core.yuv import synthetic_frame
from x266_tpu.engine import fused
from x266_tpu.kernels import alf as kalf
from x266_tpu.kernels.deblock import deblock_picture
from x266_tpu.kernels.sao import apply_sao, estimate_sao

W, H = 3840, 2160
cfg = preset_cfg4(W, H)
fr = synthetic_frame(W, H, kind="mixed", seed=3)
lam = float(cfg.lambda_mode)

y = jax.device_put(jnp.asarray(fr.y, jnp.int32))
cb = jax.device_put(jnp.asarray(fr.cb, jnp.int32))
cr = jax.device_put(jnp.asarray(fr.cr, jnp.int32))
orig_y = y + 1  # stand-in original
orig_cb = cb + 1
orig_cr = cr + 1
size_map = jax.device_put(jnp.full((cfg.units_y, cfg.units_x), 16,
                                   jnp.int32))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real download to measure completion, not enqueue
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:28s} {dt:8.1f} ms")
    return out


deblock_j = jax.jit(lambda a, b, c: deblock_picture(
    a, b, c, size_map, cfg.qp, xp=jnp))
timeit("deblock (y+cb+cr)", deblock_j, y, cb, cr)

sao_est_j = jax.jit(lambda o, r: estimate_sao(o, r, lam))
st, sb, so = timeit("sao estimate (luma)", sao_est_j, orig_y, y)
sao_app_j = jax.jit(lambda r, a, b, c: apply_sao(r, a, b, c, xp=jnp))
timeit("sao apply (luma)", sao_app_j, y, st, sb, so)

sao_est_c = jax.jit(lambda o, r: estimate_sao(o, r, lam, ctb=32))
stc, sbc, soc = timeit("sao estimate (1 chroma)", sao_est_c, orig_cb, cb)
sao_app_c = jax.jit(lambda r, a, b, c: apply_sao(r, a, b, c, xp=jnp,
                                                 ctb=32))
timeit("sao apply (1 chroma)", sao_app_c, cb, stc, sbc, soc)

alf_est_j = jax.jit(lambda o, r: kalf.estimate_alf(o, r, lam))
coeffs, flags, _ = timeit("alf estimate (luma)", alf_est_j, orig_y, y)
alf_cls_j = jax.jit(kalf.classify)
cls = timeit("alf classify", alf_cls_j, y)
alf_app_j = jax.jit(kalf.apply_alf)
timeit("alf apply (luma)", alf_app_j, y, cls, coeffs, flags)

alf_est_c = jax.jit(lambda o, r: kalf.estimate_alf_chroma(o, r, lam))
cc, fc, _ = timeit("alf-chroma estimate (1)", alf_est_c, orig_cb, cb)
alf_app_c = jax.jit(kalf.apply_alf_chroma)
timeit("alf-chroma apply (1)", alf_app_c, cb, cc, fc)
