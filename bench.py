"""Driver benchmark: prints ONE JSON line.

Headline metric (BASELINE.json:8, config 2 AS SPECIFIED): frames/sec/chip
for all-intra 1080p **VVC profile with full MTS** encode, end-to-end
(device compute + entropy coding + NAL assembly) on whatever accelerator
jax selects (the real TPU chip under the driver).

detail.fps_4k_ra: config 4's shape (BASELINE.json:10) — 4K random-access
GOP-16 with deblock/SAO/ALF — measured in a SUBPROCESS so a tunnel-side
worker crash under sustained 4K load (seen in round 1) cannot take down
the headline number; null if the subprocess fails.

vs_baseline: the reference has no published numbers (BASELINE.json:13
"published": {}); we normalize against the project's real-time target of
60 fps (BASELINE.json:5, stated for 4K on a v5p-16 — used as the fixed
yardstick so the number is comparable across rounds).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _jax_setup():
    import jax

    # persistent compile cache: 1080p/4K pipeline compiles take minutes
    # on the remote compile service; cache them across bench runs
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def bench_1080p_vvc(samples: int = 2) -> dict:
    """Config 2 exactly as spec'd: all-intra 1080p VVC + MTS + CABAC.

    Returns `samples` independently-timed encode passes (the ambient
    tunnel variance is ±35% on single samples — ROADMAP round-4 log —
    so the headline is computed as a median over many samples by
    main(), which interleaves 1080p/4K subprocess legs over time).
    """
    _jax_setup()
    from x266_tpu.api import Decoder, Encoder
    from x266_tpu.config import preset_cfg2
    from x266_tpu.core.hashing import frame_md5
    from x266_tpu.core.yuv import synthetic_clip

    width, height = 1920, 1080
    cfg = preset_cfg2(width, height).replace(rows_per_segment=1,
                                             ctx_inherit=True)
    # 16 frames (round-5; was 8): with 4-frame device chunks the LAST
    # chunk's download+entropy tail cannot overlap anything, so an
    # 8-frame stream spends ~1/2 its wall time in tails — 16 frames
    # measures the steady-state pipeline the serving path actually
    # runs (the 4K leg codes 17 for the same reason)
    frames = synthetic_clip(width, height, 16, kind="mixed")

    # serving path: bitstream leaves the chip, recon stays on device;
    # frames batch 4-per-device-call (vmapped over the Pallas recon
    # kernel) to amortize the per-call dispatch/transfer latency
    enc = Encoder(cfg, with_recon=False, batch_frames=4)
    t_c0 = time.time()
    enc.encode(frames)                  # warm-up: compile + FULL pass
    compile_s = time.time() - t_c0      # (both timed samples run warm,
                                        # mirroring the 4K leg)

    fps_samples = []
    for _ in range(max(1, samples)):
        t0 = time.time()
        res = enc.encode(frames)
        dt = time.time() - t0
        fps_samples.append(len(frames) / dt)
    fps = fps_samples[-1]

    # correctness gate (untimed): the stream must decode, twice,
    # identically (encoder-recon equality is covered by tests/)
    _, dec = Decoder().decode(res.bitstream)
    _, dec2 = Decoder().decode(res.bitstream)
    assert len(dec) == len(frames)
    assert frame_md5(dec[0]) == frame_md5(dec2[0]), \
        "non-deterministic decode in bench"
    host_psnr = dec[0].psnr(frames[0])[0]
    psnrs = res.psnr_y(width, height)
    psnr_y = float(np.mean(psnrs))
    assert abs(host_psnr - psnrs[0]) < 0.05

    # structured metrics + roofline records (SURVEY §5, untimed):
    # per-frame bits/PSNR and the batched step's XLA cost analysis
    try:
        from x266_tpu.engine import fused
        from x266_tpu.utils import roofline
        recs = [{"metric": "bench_frame", "config": "cfg2_1080p_ai",
                 "poc": i, "bits": int(b), "psnr_y": round(p, 3),
                 "ts": time.time()}
                for i, (b, p) in enumerate(zip(res.frame_bits, psnrs))]
        recs.append({"metric": "bench_fps",
                     "config": "cfg2_1080p_ai", "fps": round(fps, 3),
                     "ts": time.time()})
        import jax.numpy as jnp  # noqa: F401
        packed4 = np.stack([fused.pack_input(cfg, f)
                            for f in frames[:4]])
        comp = fused.make_encode_step_i_batched(cfg, False).lower(
            packed4).compile()
        fl, bts = roofline.cost_of(comp)
        step_s = dt / len(frames) * 4          # rough batched-step share
        recs.append({
            "metric": "roofline", "kernel": "1080p_ai_step_batch4",
            "flops": fl, "bytes": bts,
            "gflops_e2e": round(fl / max(step_s, 1e-9) / 1e9, 1),
            "note": "cost analysis of the batched device step; "
                    "gflops_e2e uses e2e frame time (lower bound)",
            "ts": time.time()})
        roofline.append_metrics(recs)
    except Exception:               # noqa: BLE001 — never lose headline
        pass
    return {"fps": fps, "fps_samples": [round(f, 3) for f in fps_samples],
            "compile_s": round(compile_s, 1), "qp": cfg.qp,
            "bits_per_frame": int(res.total_bits / len(frames)),
            "psnr_y_db": round(psnr_y, 2), "frames": len(frames)}


def bench_4k_ra(samples: int = 2) -> dict:
    """Config 4's shape: 4K RA GOP-16, deblock+SAO+ALF, single chip."""
    _jax_setup()
    from x266_tpu.api import Encoder
    from x266_tpu.config import preset_cfg4
    from x266_tpu.core.yuv import synthetic_clip

    width, height = 3840, 2160
    cfg = preset_cfg4(width, height)
    n = 17                              # one full GOP-16 + its anchor
    frames = synthetic_clip(width, height, n, kind="mixed")
    enc = Encoder(cfg, with_recon=False)
    # warm-up: a full pass so every step variant (I, P anchor, B ref,
    # B leaf) is compiled before the timed window
    t_c0 = time.time()
    enc.encode(frames)
    compile_s = time.time() - t_c0

    fps_samples = []
    for _ in range(max(1, samples)):
        t0 = time.time()
        res = enc.encode(frames)
        dt = time.time() - t0
        fps_samples.append(n / dt)
    return {"fps_4k_ra": round(fps_samples[-1], 3),
            "fps_4k_samples": [round(f, 3) for f in fps_samples],
            "compile_4k_s": round(compile_s, 1),
            "bits_per_frame_4k": int(res.total_bits / n),
            "psnr_y_4k_db": round(float(np.mean(
                res.psnr_y(width, height))), 2)}


def _run_leg(flag: str, timeout: float):
    """One bench leg in its own process.  The parent never touches jax:
    a parent holding device buffers/executables halves the next leg's
    throughput on the shared chip (measured: 4K 1.46 fps solo vs 0.74
    with the 1080p parent still attached, round-4)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        return None, proc.stderr[-300:]
    return json.loads(proc.stdout.strip().split("\n")[-1]), None


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main() -> None:
    if "--4k" in sys.argv:              # subprocess entry
        print(json.dumps(bench_4k_ra()))
        return
    if "--1080p" in sys.argv:           # subprocess entry
        print(json.dumps(bench_1080p_vvc()))
        return

    # The ambient tunnel variance is ±35% on single samples (four
    # identical-code runs spread 3.59-6.90 fps, ROADMAP round-4 log), so
    # the headline is a MEDIAN over >=5 samples, gathered from subprocess
    # legs interleaved 1080p/4K over the bench's wall time.  Each leg is
    # fail-soft: a dead subprocess costs its samples, never the headline.
    t_start = time.time()
    budget_s = float(os.environ.get("X266_BENCH_BUDGET_S", "2100"))
    fps1080, fps4k = [], []
    detail: dict = {}
    errors = []
    for rnd in range(3):                 # 3 x (1080p + 4K) = 6+6 samples
        elapsed = time.time() - t_start
        if rnd > 0 and fps1080 and elapsed > budget_s:
            break
        try:
            d, err = _run_leg("--1080p", 2400 if rnd == 0 else 900)
        except Exception as e:          # noqa: BLE001
            d, err = None, str(e)[:300]
        if d is not None:
            fps1080.extend(d.pop("fps_samples", [d["fps"]]))
            d.pop("fps", None)
            detail.update(d)
        else:
            errors.append(f"1080p[{rnd}]: {err}")
        elapsed = time.time() - t_start
        if rnd > 0 and fps4k and elapsed > budget_s:
            break
        try:
            leg, err = _run_leg("--4k", 1800 if rnd == 0 else 900)
        except Exception as e:          # noqa: BLE001
            leg, err = None, str(e)[:300]
        if leg is not None:
            fps4k.extend(leg.pop("fps_4k_samples", [leg["fps_4k_ra"]]))
            leg.pop("fps_4k_ra", None)
            detail.update(leg)
        else:
            errors.append(f"4k[{rnd}]: {err}")

    if not fps1080:
        # never lose the headline: fall back to in-process
        sys.stderr.write(f"all 1080p subprocesses failed ({errors}); "
                         "running in-process\n")
        d = bench_1080p_vvc()
        fps1080 = d.pop("fps_samples", [d.pop("fps")])
        detail.update(d)

    med = _median(fps1080)
    detail["fps_samples_1080p"] = [round(f, 3) for f in fps1080]
    detail["fps_1080p_min_max"] = [round(min(fps1080), 3),
                                   round(max(fps1080), 3)]
    detail["fps_4k_ra"] = round(_median(fps4k), 3) if fps4k else None
    if fps4k:
        detail["fps_samples_4k"] = [round(f, 3) for f in fps4k]
    if errors:
        detail["leg_errors"] = errors[:4]
    detail["bench_wall_s"] = round(time.time() - t_start, 1)

    print(json.dumps({
        "metric": "1080p_allintra_vvc_mts_encode_fps_chip",
        "value": round(med, 3),
        "unit": "frames/s",
        "vs_baseline": round(med / 60.0, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
