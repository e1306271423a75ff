"""Roofline sweep over the hot device steps (VERDICT r03 #9).

Measures flops/bytes (XLA cost analysis) + achieved fraction of the
v5e peaks for the bench-relevant kernels, appends records to
METRICS.jsonl and prints a table:

    python tools/roofline_report.py [--4k]
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from x266_tpu.config import preset_cfg2, preset_cfg4
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.engine import fused
    from x266_tpu.utils import roofline

    records = []

    # 1080p all-intra (bench headline): unbatched + batched-4
    cfg = preset_cfg2(1920, 1080).replace(rows_per_segment=1)
    frames = synthetic_clip(1920, 1080, 4, kind="mixed")
    packed = fused.pack_input(cfg, frames[0])
    records.append(roofline.measure(
        fused.make_encode_step(cfg, False), (packed,),
        "1080p_ai_step"))
    packed4 = np.stack([fused.pack_input(cfg, f) for f in frames])
    rec4 = roofline.measure(
        fused.make_encode_step_i_batched(cfg, False), (packed4,),
        "1080p_ai_step_batch4")
    records.append(rec4)

    if "--4k" in sys.argv:
        cfg4 = preset_cfg4(3840, 2160)
        f4 = synthetic_clip(3840, 2160, 2, kind="mixed")
        p0 = fused.pack_input(cfg4, f4[0])
        stepi = fused.make_encode_step_i(cfg4, False, True)
        reci = roofline.measure(stepi, (p0,), "4k_i_step")
        records.append(reci)
        pyr = stepi(p0)[-1]
        p1 = fused.pack_input(cfg4, f4[1])
        records.append(roofline.measure(
            fused.make_encode_step_p(cfg4, False), (p1, *pyr),
            "4k_p_step"))
        records.append(roofline.measure(
            fused.make_encode_step_b(cfg4, False, True),
            (p1, *pyr, *pyr), "4k_b_step"))

    roofline.append_metrics(records)
    hdr = (f"{'kernel':24s} {'ms':>8s} {'GFLOP/s':>9s} {'GB/s':>7s} "
           f"{'%flops':>7s} {'%bw':>6s}")
    print(hdr)
    for r in records:
        print(f"{r['kernel']:24s} {r['ms']:8.1f} "
              f"{(r['gflops'] or 0):9.1f} {(r['gbps'] or 0):7.1f} "
              f"{100 * (r['frac_flops_peak'] or 0):6.2f}% "
              f"{100 * (r['frac_bw_peak'] or 0):5.2f}%")
    print("appended to METRICS.jsonl")


if __name__ == "__main__":
    main()
