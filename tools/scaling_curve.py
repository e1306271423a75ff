"""Config 5 scaling curve (BASELINE.json:11): frames/s of the
GOP-parallel encoder over 1/2/4/8 devices.

On real multi-chip hardware this measures ICI/DCN scaling; in this
environment it runs on the virtual CPU mesh (8 forced host devices)
**on a 2-physical-core box**, so real-compute throughput saturates at
~2 devices no matter what the scheduler does — the real-compute curve
is a CORE-LIMIT measurement, not a scheduler measurement.  To separate
the two, `--sched-only` replaces each GOP's device work with a fixed-
latency surrogate (sleep + trivial host stitch): that curve isolates
the scheduling machinery (placement, thread fan-out, POC-ordered
stitch, retry path) and is the software quantity a real multi-chip
slice would see.  Both curves land in SCALING.json.

Usage: python tools/scaling_curve.py [--frames N] [--size WxH]
                                     [--sched-only-ms M]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_curve(cfg, frames, devs, sched_factory):
    from x266_tpu.shard.gop import GopScheduler  # noqa: F401

    points = []
    ref = None
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        sched = sched_factory(cfg, devs[:n])
        sched.encode(frames)             # warm-up / compile
        t0 = time.time()
        res = sched.encode(frames)
        dt = time.time() - t0
        if ref is None:
            ref = res.bitstream
        assert res.bitstream == ref, "placement changed the bitstream"
        fps = len(frames) / dt
        base = points[0]["fps"] if points else fps
        points.append({"devices": n, "fps": round(fps, 3),
                       "efficiency": round(fps / (base * n), 3)})
        print(points[-1])
    return points


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
    from x266_tpu.core.nal import NalType, write_nal
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.shard.gop import GopScheduler

    size = "512x256"
    n_frames = 16
    sim_ms = 40.0
    for i, a in enumerate(sys.argv):
        if a == "--frames":
            n_frames = int(sys.argv[i + 1])
        if a == "--size":
            size = sys.argv[i + 1]
        if a == "--sched-only-ms":
            sim_ms = float(sys.argv[i + 1])
    w, h = (int(v) for v in size.split("x"))

    cfg = CodecConfig(width=w, height=h, qp=32, intra_period=4)
    frames = synthetic_clip(w, h, n_frames, kind="mixed", seed=13)
    devs = jax.devices()
    n_cores = len(os.sched_getaffinity(0))

    print(f"== real-compute curve ({w}x{h}, {n_cores} host cores) ==")
    real_points = run_curve(cfg, frames, devs, GopScheduler)

    print(f"== scheduler-isolated curve (surrogate {sim_ms} ms/frame) ==")

    class _SimScheduler(GopScheduler):
        """Device work replaced by a fixed-latency surrogate: measures
        the scheduler itself (fan-out, placement, ordered stitch)."""

        def _encode_gop(self, gop_idx, poc0, gop, device):
            out = []
            for k, _frame in enumerate(gop):
                time.sleep(sim_ms / 1e3)   # the 'device' latency
                # deterministic payload; 0x80 tail keeps the RBSP
                # rule (must not end 0x00) for any (gop_idx, k)
                payload = bytes([gop_idx & 0xFF, k]) * 64 + b"\x80"
                nal = write_nal(
                    NalType.IDR if k == 0 else NalType.TRAIL, payload)
                out.append((nal, None, None))
            return out

    sim_points = run_curve(cfg, frames, devs, _SimScheduler)

    out = {"config": {"width": w, "height": h, "frames": n_frames,
                      "intra_period": cfg.intra_period,
                      "backend": jax.default_backend(),
                      "host_cores": n_cores,
                      "surrogate_ms": sim_ms},
           "points": real_points,
           "scheduler_isolated_points": sim_points,
           "note": "virtual CPU mesh on a {}-core host: the real-"
                   "compute curve saturates at the core count (a "
                   "hardware ceiling of this box, not a scheduler "
                   "property); scheduler_isolated_points replace "
                   "device work with a fixed-latency surrogate and "
                   "measure the scheduling machinery alone. Bitstream "
                   "asserted identical across device counts in both "
                   "modes.".format(n_cores)}
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    with open(os.path.join(ROOT, "METRICS.jsonl"), "a") as f:
        for p in real_points:
            f.write(json.dumps({"metric": "gop_scaling_fps",
                                "ts": time.time(), **p}) + "\n")
        for p in sim_points:
            f.write(json.dumps({"metric": "gop_scaling_sched_only_fps",
                                "ts": time.time(), **p}) + "\n")
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
