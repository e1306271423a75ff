"""Config 5 scaling curve (BASELINE.json:11): frames/s of the
GOP-parallel encoder over 1/2/4/8 devices.

On real multi-chip hardware this measures ICI/DCN scaling; in this
environment it runs on the virtual CPU mesh (8 forced host devices), so
the absolute numbers are CPU-bound but the curve demonstrates the
scheduler's device-scaling path end-to-end (placement, async dispatch,
POC-ordered stitch).  Writes SCALING.json at the repo root and appends
one JSONL record per point to METRICS.jsonl.

Usage: python tools/scaling_curve.py [--frames N] [--size WxH]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from x266_tpu.config import CodecConfig
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.shard.gop import GopScheduler

    size = "256x128"
    n_frames = 16
    for i, a in enumerate(sys.argv):
        if a == "--frames":
            n_frames = int(sys.argv[i + 1])
        if a == "--size":
            size = sys.argv[i + 1]
    w, h = (int(v) for v in size.split("x"))

    cfg = CodecConfig(width=w, height=h, qp=32, intra_period=4)
    frames = synthetic_clip(w, h, n_frames, kind="mixed", seed=13)
    devs = jax.devices()
    points = []
    ref = None
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        sched = GopScheduler(cfg, devices=devs[:n])
        sched.encode(frames)             # warm-up / compile
        t0 = time.time()
        res = sched.encode(frames)
        dt = time.time() - t0
        if ref is None:
            ref = res.bitstream
        assert res.bitstream == ref, "placement changed the bitstream"
        fps = n_frames / dt
        base = points[0]["fps"] if points else fps
        points.append({"devices": n, "fps": round(fps, 3),
                       "efficiency": round(fps / (base * n), 3)})
        print(points[-1])

    out = {"config": {"width": w, "height": h, "frames": n_frames,
                      "intra_period": cfg.intra_period,
                      "backend": jax.default_backend()},
           "points": points,
           "note": "virtual CPU mesh unless run on real multi-chip; "
                   "bitstream asserted identical across device counts"}
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    with open(os.path.join(ROOT, "METRICS.jsonl"), "a") as f:
        for p in points:
            f.write(json.dumps({"metric": "gop_scaling_fps",
                                "ts": time.time(), **p}) + "\n")
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
