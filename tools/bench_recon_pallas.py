"""Compare XLA recon scan vs Pallas kernel on the real TPU, 1080p."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from x266_tpu.config import preset_cfg2, preset_cfg1
from x266_tpu.engine.mode_decision import (make_mode_decision,
                                           make_mts_select, pad_plane)
from x266_tpu.engine.recon import make_recon_pass
from x266_tpu.engine.recon_pallas import make_recon_pallas_raw

print("backend:", jax.default_backend(), jax.devices())

for cfg, label in [(preset_cfg1(), "416x240-hevc"),
                   (preset_cfg2(), "1080p-vvc-mts")]:
    w, h = cfg.width, cfg.height
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy * 2) // 4 % 256)
                + rng.integers(-24, 25, (h, w)), 0, 255).astype(np.uint8)
    cb = np.clip(128 + rng.integers(-30, 31, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    cr = np.clip(128 + rng.integers(-30, 31, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    yP = jax.device_put(pad_plane(y).astype(np.int32))
    cbP = jax.device_put(pad_plane(cb).astype(np.int32))
    crP = jax.device_put(pad_plane(cr).astype(np.int32))

    md = make_mode_decision(cfg)
    size_map, mode_map = md(yP)
    if cfg.mts:
        mts_map = make_mts_select(cfg)(yP, size_map, mode_map)
    else:
        mts_map = jax.numpy.zeros_like(size_map)
    size_map.block_until_ready()

    t0 = time.time()
    scan = make_recon_pass(cfg, encode=True)
    r_ref = scan(yP, cbP, crP, size_map, mode_map, mts_map)
    jax.block_until_ready(r_ref)
    print(f"[{label}] scan compile+run1: {time.time()-t0:.1f}s")
    t0 = time.time()
    n = 5
    for _ in range(n):
        r_ref = scan(yP, cbP, crP, size_map, mode_map, mts_map)
    jax.block_until_ready(r_ref)
    t_scan = (time.time() - t0) / n
    print(f"[{label}] scan steady: {t_scan*1000:.1f} ms/frame")

    t0 = time.time()
    pk = jax.jit(make_recon_pallas_raw(cfg, encode=True))
    r_new = pk(yP, cbP, crP, size_map, mode_map, mts_map)
    jax.block_until_ready(r_new)
    print(f"[{label}] pallas compile+run1: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(n):
        r_new = pk(yP, cbP, crP, size_map, mode_map, mts_map)
    jax.block_until_ready(r_new)
    t_pal = (time.time() - t0) / n
    print(f"[{label}] pallas steady: {t_pal*1000:.1f} ms/frame "
          f"({t_scan/t_pal:.1f}x vs scan)")

    for i, nm in enumerate(["reconY", "reconCb", "reconCr",
                            "coefY", "coefCb", "coefCr"]):
        a = np.asarray(r_ref[i])
        b = np.asarray(r_new[i])
        n_bad = int((a != b).sum())
        print(f"  {nm}: {'BIT-EXACT' if n_bad == 0 else f'{n_bad} DIFF!'}")
