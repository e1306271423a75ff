"""P-step stage timing at 1080p."""
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
from x266_tpu.engine.mode_decision import pad_plane, _eval_size
from x266_tpu.engine.inter import (make_mode_decision_p_raw, _inter_cost)
from x266_tpu.kernels import me as kme
from x266_tpu.kernels import interp

cfg = CodecConfig(width=1920, height=1080, qp=32, intra_period=8)
f0, f1 = synthetic_clip(1920, 1080, 2, kind="mixed")
pyr = jax.jit(lambda a, b, c: fused._build_pyramids_device(
    a.astype(jnp.int32), b.astype(jnp.int32), c.astype(jnp.int32)))(
        f0.y, f0.cb, f0.cr)
pyr = jax.block_until_ready(pyr)
yP = jax.device_put(pad_plane(f1.y).astype(np.int32))


def bench(name, fn, n=3):
    r = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:26s}: {(time.time()-t0)/n*1000:8.1f} ms")
    return r


pyr_b = bench("build_pyramids", lambda: jax.jit(
    lambda a, b, c: fused._build_pyramids_device(
        a.astype(jnp.int32), b.astype(jnp.int32),
        c.astype(jnp.int32)))(f0.y, f0.cb, f0.cr))

cur = yP[1:1 + 1080, 1:1 + 1920].astype(jnp.int32)
isearch = jax.jit(lambda c, r: kme.integer_search(
    kme._ceil_pad(c), r.astype(jnp.int32), float(cfg.lambda_mode)))
imv = bench("me_integer(+-16 full)", lambda: isearch(cur, pyr[0][0]))
frefine = jax.jit(lambda c, p, m: kme.fractional_refine(
    kme._ceil_pad(c), p, m))
bench("me_frac_refine", lambda: frefine(cur, pyr[0], imv))

mdp = jax.jit(make_mode_decision_p_raw(cfg))
bench("mode_decision_p(total)", lambda: mdp(yP, pyr[0]))

step = fused.make_encode_step_p(cfg, with_recon=False)
packed = jax.device_put(fused.pack_input(cfg, f1))
bench("fused_step_p(total)", lambda: step(packed, *pyr))
