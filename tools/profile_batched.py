"""Per-stage attribution of the BENCH device step (round-5, VERDICT
r04 weak #3: "which kernel burns the 119 ms/frame device step?").

Times each stage of the batch-4 1080p all-intra VVC+MTS step (the
exact bench.py path) as its own jitted+vmapped function, inputs
device-resident, with a tiny device->host download after each timed
region (block_until_ready returns at ENQUEUE over the axon tunnel —
ROADMAP measurement gotchas).  Prints a ms/frame table.

    python tools/profile_batched.py [--n 5]
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

from x266_tpu.config import preset_cfg2
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine import fused
from x266_tpu.engine.mode_decision import (make_mode_decision_raw,
                                           make_mts_select_raw)
from x266_tpu.engine.recon import select_recon_impl

B = 4
N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 5

cfg = preset_cfg2(1920, 1080).replace(rows_per_segment=1)
frames = synthetic_clip(1920, 1080, B, kind="mixed")
packed = jax.device_put(np.stack([fused.pack_input(cfg, f)
                                  for f in frames]))

unpack = jax.jit(jax.vmap(lambda p: fused._unpack_padded(cfg, p)))
md_raw = make_mode_decision_raw(cfg, want_res=True)
md = jax.jit(jax.vmap(lambda yP: md_raw(yP.astype(jnp.int32))))
mts_raw = make_mts_select_raw(cfg)
mts = jax.jit(jax.vmap(
    lambda yP, sm, mm, res: mts_raw(yP.astype(jnp.int32), sm, mm,
                                    None, res)))
rp_raw = select_recon_impl(cfg, encode=True)
rp = jax.jit(jax.vmap(lambda a, b, c, sm, mm, mmap: rp_raw(
    a, b, c, sm, mm, mmap)))
step = fused.make_encode_step_i_batched(cfg, False)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real download so the tunnel enqueue can't lie
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:4])
    ts = []
    for _i in range(N):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        ts.append(time.time() - t0)
    ms = 1000 * np.median(ts) / B
    print(f"{name:28s}: {ms:8.2f} ms/frame "
          f"(med of {N}, spread {1000*min(ts)/B:.1f}-"
          f"{1000*max(ts)/B:.1f})")
    return out, ms


planes, _ = timeit("unpack_padded", unpack, packed)
yP, cbP, crP = planes
yPi = yP.astype(jnp.int32)
(md_out, t_md) = timeit("pass_a_mode_decision", md, yP)
size_map, mode_map, res_by = md_out
(mts_map, t_mts) = timeit("mts_select", mts, yP, size_map, mode_map,
                          res_by)
(rp_out, t_rp) = timeit("recon_scan(pallas)", rp, yP, cbP, crP,
                        size_map, mode_map, mts_map)
blob = fused.make_wire_blob_batched(cfg)
(full, t_step) = timeit("fused_step_total", step, packed)
o = step(packed)
(wb, t_blob) = timeit(
    "wire_blob(pack)", blob, o[0][0], o[0][1][0], o[0][1][1], o[1], o[2])

# host side: blob download + unpack + entropy for the 4 frames
bl = blob(o[0][0], o[0][1][0], o[0][1][1], o[1], o[2])
jax.block_until_ready(bl)
t0 = time.time()
for _ in range(N):
    hb = np.asarray(bl)
dl = 1000 * (time.time() - t0) / N / B
print(f"{'blob_download(host)':28s}: {dl:8.2f} ms/frame "
      f"({hb.nbytes/1e6:.1f} MB)")

t0 = time.time()
for _ in range(N):
    for i in range(B):
        nib, vals, cols, _f, st2 = fused.unpack_blob(cfg, hb[i])
        if st2[3] == 0:
            fused.reconstruct_coefs_nib(nib, vals, cols)
unp = 1000 * (time.time() - t0) / N / B
print(f"{'blob_unpack(host)':28s}: {unp:8.2f} ms/frame")

print(f"\nstage sum (md+mts+recon)    : "
      f"{t_md + t_mts + t_rp:8.2f} ms/frame vs step total "
      f"{t_step:8.2f}")
