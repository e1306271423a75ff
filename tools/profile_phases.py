"""Round-4: host-phase breakdown of the 1080p batch-4 encode loop.

The round-3 1080p e2e regression (5.66 -> 4.4 fps) is NOT the device
step (r02 batched step replays SLOWER than r03: 127 vs 119 ms/frame),
so this times every host phase of the bench path explicitly:

    python tools/profile_phases.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from x266_tpu.config import preset_cfg2
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.engine import fused, picture

    cfg = preset_cfg2(1920, 1080).replace(rows_per_segment=1)
    frames = synthetic_clip(1920, 1080, 8, kind="mixed")

    t = {}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = t.setdefault(name, 0.0) + time.time() - t0
        return r

    # warm-up: one full chunk
    fin = picture.tiles_compute_batched_async(cfg, frames[:4], False)
    fin()

    step4 = fused.make_encode_step_i_batched(cfg, False)

    t0_all = time.time()
    chunks = [frames[0:4], frames[4:8]]
    outs = []
    for ch in chunks:
        packed = clock("pack_input", lambda ch=ch: np.stack(
            [fused.pack_input(cfg, f) for f in ch]))
        outs.append(clock("dispatch", lambda p=packed: step4(p)))

    tds_all = []
    for out in outs:
        stats = clock("dl_stats", lambda o=out: np.asarray(o[2]))
        nib = clock("dl_nib", lambda o=out: np.asarray(o[0][0]))
        vals = clock("dl_vals", lambda o=out: np.asarray(o[0][1][0]))
        cols = clock("dl_cols", lambda o=out: np.asarray(o[0][1][1]))
        flat = clock("dl_flat", lambda o=out: np.asarray(o[1]))
        fulls = clock("nib_reconstruct", lambda: [
            fused.reconstruct_coefs_nib(nib[i], vals[i], cols[i])
            for i in range(4)])
        for i in range(4):
            td = clock("finalize_one", lambda i=i: picture._finalize_one(
                cfg, (fulls[i], flat[i], stats[i]), False))
            tds_all.append(td)

    rbsp = []
    for poc, td in enumerate(tds_all):
        segs = clock("entropy", lambda td=td: picture.tile_entropy(td))
        rbsp.append(clock("assemble", lambda s=segs, p=poc:
                          picture.assemble_slice(cfg, p, s)))
    total = time.time() - t0_all
    for k, v in t.items():
        print(f"{k:18s}: {v*1e3:7.1f} ms total ({v/8*1e3:6.1f} /frame)")
    acct = sum(t.values())
    print(f"{'accounted':18s}: {acct*1e3:7.1f} ms")
    print(f"{'WALL':18s}: {total*1e3:7.1f} ms -> {8/total:.2f} fps")


if __name__ == "__main__":
    main()
