"""Round-3 profiling: where does the e2e time go on the real chip?

Breaks down 1080p all-intra (bench headline) and 4K RA (fps_4k_ra)
into device compute / download / host entropy, and the 4K B-step
mode decision into its sub-stages.  Run on the TPU-attached host:

    python tools/profile_e2e.py [--1080p] [--4k] [--bstep]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _sync(x):
    """Force a real device->host sync (block_until_ready returns at
    enqueue over the axon tunnel; ROADMAP measurement gotcha)."""
    import jax.numpy as jnp

    return np.asarray(jnp.sum(x.astype(jnp.int32) if hasattr(x, "astype")
                              else x))


def prof_1080p():
    _setup()
    from x266_tpu.config import preset_cfg2
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.engine import fused, picture

    cfg = preset_cfg2(1920, 1080).replace(rows_per_segment=1)
    frames = synthetic_clip(1920, 1080, 4, kind="mixed")

    # --- single-frame fused step, unbatched
    packed = fused.pack_input(cfg, frames[0])
    step = fused.make_encode_step(cfg, False)
    out = step(packed)
    _sync(out[1])
    t0 = time.time()
    for _ in range(3):
        out = step(packed)
        _sync(out[1])
    t_dev = (time.time() - t0) / 3
    print(f"1080p AI device step (incl 1 sync): {t_dev*1e3:.1f} ms")

    # --- batched-4 step
    packed4 = np.stack([fused.pack_input(cfg, f) for f in frames])
    step4 = fused.make_encode_step_i_batched(cfg, False)
    out = step4(packed4)
    _sync(out[1])
    t0 = time.time()
    for _ in range(3):
        out = step4(packed4)
        _sync(out[1])
    t_dev4 = (time.time() - t0) / 3
    print(f"1080p AI batched-4 step: {t_dev4*1e3:.1f} ms "
          f"({t_dev4/4*1e3:.1f} ms/frame)")

    # --- download cost
    t0 = time.time()
    low = np.asarray(out[0][0])
    flat = np.asarray(out[1])
    stats = np.asarray(out[2])
    t_dl = time.time() - t0
    nbytes = low.nbytes + flat.nbytes + stats.nbytes
    print(f"download (batch-4): {t_dl*1e3:.1f} ms, {nbytes/1e6:.2f} MB "
          f"-> {nbytes/max(t_dl,1e-9)/1e6:.0f} MB/s")

    # --- host entropy per frame
    fin = picture.tiles_compute_batched_async(cfg, frames, False)
    tds = fin()
    t0 = time.time()
    segs = picture.tile_entropy(tds[0])
    t_ent = time.time() - t0
    print(f"host entropy 1 frame ({len(segs)} segments): "
          f"{t_ent*1e3:.1f} ms")

    # threaded entropy
    from concurrent.futures import ThreadPoolExecutor
    from x266_tpu.cabac import native_bind
    td = tds[0]
    rows = cfg.segment_ctu_rows()
    with ThreadPoolExecutor(max_workers=8) as ex:
        t0 = time.time()
        segs2 = list(ex.map(
            lambda rr: native_bind.encode_segment(
                cfg, td.size_map, td.mode_map, td.coef_y, td.coef_cb,
                td.coef_cr, rr[0], rr[1], td.sao_params, td.mts_map),
            rows))
        t_ent8 = time.time() - t0
    assert segs2 == segs
    print(f"host entropy threaded x8: {t_ent8*1e3:.1f} ms")


def prof_4k_bstep():
    _setup()
    import jax

    from x266_tpu.config import preset_cfg4
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.engine import fused, inter
    from x266_tpu.kernels import me as kme
    from x266_tpu.engine.mode_decision import pad_plane

    cfg0 = preset_cfg4(3840, 2160)
    cfg = cfg0.replace(qp=cfg0.qp + 1)       # the B-ref variant
    frames = synthetic_clip(3840, 2160, 3, kind="mixed")

    packed0 = fused.pack_input(cfg, frames[0])
    stepi = fused.make_encode_step_i(cfg, False, True)
    outi = stepi(packed0)
    pyr = outi[-1]
    _sync(outi[1])

    packed = fused.pack_input(cfg, frames[1])

    # full B step
    stepb = fused.make_encode_step_b(cfg, False, True)
    out = stepb(packed, *pyr, *pyr)
    _sync(out[1])
    t0 = time.time()
    for _ in range(3):
        out = stepb(packed, *pyr, *pyr)
        _sync(out[1])
    t_b = (time.time() - t0) / 3
    print(f"4K B step (ref variant): {t_b*1e3:.0f} ms")

    # P step
    stepp = fused.make_encode_step_p(cfg0, False)
    outp = stepp(packed, *pyr)
    _sync(outp[1])
    t0 = time.time()
    for _ in range(3):
        outp = stepp(packed, *pyr)
        _sync(outp[1])
    print(f"4K P step: {(time.time()-t0)/3*1e3:.0f} ms")

    # mode decision B alone
    md = jax.jit(inter.make_mode_decision_b_raw(cfg))
    plane = pad_plane(frames[1].y, cfg.mid_val)
    o = md(plane, pyr[0], pyr[0])
    _sync(o[0])
    t0 = time.time()
    for _ in range(3):
        o = md(plane, pyr[0], pyr[0])
        _sync(o[0])
    t_md = (time.time() - t0) / 3
    print(f"  mode decision B: {t_md*1e3:.0f} ms")

    # ME alone (both lists)
    mej = jax.jit(lambda c, p: (
        kme.me_search(c, p, cfg, float(cfg.lambda_mode)),
        kme.me_search(c, p, cfg, float(cfg.lambda_mode))))
    cur = jax.numpy.asarray(frames[1].y).astype(jax.numpy.int32)
    o = mej(cur, pyr[0])
    _sync(o[0])
    t0 = time.time()
    for _ in range(3):
        o = mej(cur, pyr[0])
        _sync(o[0])
    print(f"  ME x2 lists: {(time.time()-t0)/3*1e3:.0f} ms")

    # intra eval alone (the 3 sizes, K=4)
    from x266_tpu.engine.mode_decision import _eval_size

    def intra3(pl):
        pl = pl.astype(jax.numpy.int32)
        outs = [_eval_size(pl, s, cfg, inter_slice=True)
                for s in (8, 16, 32)]
        return outs[0][0]

    ij = jax.jit(intra3)
    o = ij(plane)
    _sync(o)
    t0 = time.time()
    for _ in range(3):
        o = ij(plane)
        _sync(o)
    print(f"  intra eval x3 sizes: {(time.time()-t0)/3*1e3:.0f} ms")


if __name__ == "__main__":
    if "--4k" in sys.argv or "--bstep" in sys.argv:
        prof_4k_bstep()
    else:
        prof_1080p()
