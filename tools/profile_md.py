"""What inside mode decision costs 360 ms at 1080p?"""
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
from x266_tpu.engine import mode_decision as mdm
from x266_tpu.kernels import cost as kcost
from x266_tpu.kernels import intra as kintra
from x266_tpu.kernels import quant as kquant
from x266_tpu.kernels import transforms as ktx
from x266_tpu.engine import availability as avail

cfg = CodecConfig(width=1920, height=1080, qp=32)
f = synthetic_clip(1920, 1080, 1, kind="mixed")[0]
packed = jax.device_put(fused.pack_input(cfg, f))
h, w, hp_y, wp_y, hp_c, wp_c = fused._geom(cfg)
yP = packed[:hp_y].astype(jnp.int32)


def bench(name, fn, n=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:28s}: {(time.time()-t0)/n*1000:8.1f} ms")
    return r


for s in (8, 16, 32):
    xs_np, ys_np, gy, gx = mdm._block_positions(w, h, s)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    nb = xs_np.shape[0]
    mask = jnp.asarray(avail.ref_availability_masks(w, h, s
                                                    ).reshape(nb, -1))

    g_refs = jax.jit(lambda p: mdm._gather_refs(p, xs, ys, s))
    refs = bench(f"s{s}: gather_refs (B={nb})", lambda: g_refs(yP))
    refs = jnp.where(mask, refs, 128)

    pam = jax.jit(lambda r: kintra.predict_all_modes(r, s,
                                                     cfg.n_intra_modes))
    preds = bench(f"s{s}: predict_all_modes", lambda: pam(refs))

    g_blk = jax.jit(lambda p: mdm._block_gather(p, xs, ys, s))
    orig = bench(f"s{s}: block_gather", lambda: g_blk(yP))

    nm = preds.shape[1]
    res = (orig[:, None] - preds).reshape(nb * nm, s, s)

    fwd = jax.jit(lambda r: ktx.forward_transform(r, s))
    coefs = bench(f"s{s}: fwd_transform (B={nb*nm})", lambda: fwd(res))
    qz = jax.jit(lambda c: kquant.quantize(c, cfg.qp, s))
    lev = bench(f"s{s}: quantize", lambda: qz(coefs))
    rt = jax.jit(kcost.rate_estimate_levels)
    bench(f"s{s}: rate_estimate", lambda: rt(lev))
    dq = jax.jit(lambda l: kquant.dequantize(l, cfg.qp, s))
    deq = bench(f"s{s}: dequantize", lambda: dq(lev))
    inv = jax.jit(lambda d: ktx.inverse_transform(d, s))
    bench(f"s{s}: inv_transform", lambda: inv(deq))
