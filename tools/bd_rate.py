"""Multi-QP BD-rate measurement for the coding tools (round-4,
VERDICT r03 item 3: "a multi-QP BD-rate table checked into the RD
gate"; round-5, VERDICT r04 item 4: class-D-sized corpus).

For each tool, encodes an anchor (tool off) and a test (tool on) at
four QPs on EVERY corpus clip (416x240 class-D shape, 8 frames, three
content kinds: mixed / motion / text), and reports the per-clip
Bjontegaard delta rate plus their mean (piecewise-cubic integration
over the overlapping PSNR range — the standard BD-rate definition
[STD, VCEG-M33 method]).  Negative BD-rate = the tool saves bits at
equal quality.

Writes tests/bd_rates.json (consumed by tests/test_bd_rate.py).

    python tools/bd_rate.py [--tools sdh,dq,...] [--qps 24,28,32,36]
                            [--clips mixed,motion,text]
Env: X266T_BD_TPU=1 runs the encodes on the attached TPU chip
(bit-identical output by the recon-pallas/XLA equality gates, ~20x
faster than the 2-core CPU host at this size); X266T_BD_OUT redirects
the output file for experiments.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def bd_rate(anchor: list[tuple[float, float]],
            test: list[tuple[float, float]]) -> float:
    """BD-rate %% of test vs anchor from [(bits, psnr)] points.

    Cubic fit of log-rate over PSNR, integrated over the overlapping
    PSNR interval (VCEG-M33)."""
    a = sorted(anchor, key=lambda p: p[1])
    t = sorted(test, key=lambda p: p[1])
    pa = np.polyfit([p[1] for p in a], [np.log(p[0]) for p in a], 3)
    pt = np.polyfit([p[1] for p in t], [np.log(p[0]) for p in t], 3)
    lo = max(min(p[1] for p in a), min(p[1] for p in t))
    hi = min(max(p[1] for p in a), max(p[1] for p in t))
    if hi <= lo:
        return float("nan")
    ia = np.polyint(pa)
    it = np.polyint(pt)
    va = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    vt = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float((np.exp(vt - va) - 1.0) * 100.0)


# tool key -> (anchor overrides, test overrides).
# pdpc/cclm/mip are measured ON TOP of reference substitution (their
# shipping form: round-4 falsification proved the mid-gray rule is what
# made the PDPC blend lose, VERDICT r04 item 3), so the anchor carries
# ref_substitute too and the row isolates the tool itself.
_RS = dict(ref_substitute=True)
TOOLS = {
    "refsubst": (dict(), dict(ref_substitute=True)),
    "sdh": (dict(), dict(sign_data_hiding=True)),
    "dq": (dict(), dict(dep_quant=True)),
    "lfnst": (dict(), dict(lfnst=True)),
    "mip": (_RS, dict(mip=True, **_RS)),
    "pdpc": (_RS, dict(pdpc=True, **_RS)),
    "mtt": (dict(), dict(mtt=True)),
    "ts": (dict(), dict(transform_skip=True)),
    "cclm": (_RS, dict(cclm=True, **_RS)),
    "refsubst_inter": (dict(intra_period=8),
                       dict(intra_period=8, ref_substitute=True)),
    "sdh_inter": (dict(intra_period=8),
                  dict(intra_period=8, sign_data_hiding=True)),
    "dq_inter": (dict(intra_period=8),
                 dict(intra_period=8, dep_quant=True)),
}

# class-D-shaped corpus (VERDICT r04 item 4): 416x240, 8 frames each
CORPUS = ("mixed", "motion", "text")
W, H, NFRAMES = 416, 240, 8


def run_points(cfg_base, overrides, qps, frames):
    from x266_tpu.api import Encoder

    pts = []
    for qp in qps:
        cfg = cfg_base.replace(qp=qp, **overrides)
        res = Encoder(cfg, with_recon=False).encode(frames)
        psnr = float(np.mean(res.psnr_y(cfg.width, cfg.height)))
        pts.append((res.total_bits, psnr))
    return pts


def main() -> None:
    import jax

    use_tpu = os.environ.get("X266T_BD_TPU") == "1"
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from x266_tpu.config import CodecConfig
    from x266_tpu.core.yuv import synthetic_clip

    qps = [24, 28, 32, 36]
    tools = list(TOOLS)
    clips = list(CORPUS)
    for i, a in enumerate(sys.argv):
        if a == "--tools":
            tools = sys.argv[i + 1].split(",")
        if a == "--qps":
            qps = [int(q) for q in sys.argv[i + 1].split(",")]
        if a == "--clips":
            clips = sys.argv[i + 1].split(",")

    # Per-tool subprocess isolation: one CPU process accumulating the
    # full sweep's compiled graphs reproducibly SIGSEGVs XLA-CPU (the
    # same failure tests/isolation.py guards); each tool runs alone.
    if len(tools) > 1 and "--no-isolate" not in sys.argv:
        import subprocess
        for key in tools:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tools",
                 key, "--qps", ",".join(str(q) for q in qps),
                 "--clips", ",".join(clips), "--no-isolate"]).returncode
            if rc != 0:
                print(f"{key}: FAILED rc={rc}")
        return

    from x266_tpu.config import Profile

    results: dict[str, dict] = {}
    # X266T_BD_OUT: write elsewhere (experiments must not clobber the
    # canonical table consumed by tests/test_bd_rate.py)
    path = os.environ.get(
        "X266T_BD_OUT", os.path.join(ROOT, "tests", "bd_rates.json"))
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)

    anchors: dict = {}               # (base_kw, kind) -> points
    for key in tools:
        base_kw, test_kw = TOOLS[key]
        t0 = time.time()
        per_clip: dict[str, float] = {}
        detail: dict[str, dict] = {}
        for kind in clips:
            frames = synthetic_clip(W, H, NFRAMES, kind=kind, seed=31)
            cfg0 = CodecConfig(width=W, height=H, qp=32, rdoq=True,
                               profile=Profile.VVC, **base_kw)
            akey = (tuple(sorted(base_kw.items())), kind)
            if akey not in anchors:
                anchors[akey] = run_points(cfg0, {}, qps, frames)
            anchor = anchors[akey]
            test = run_points(cfg0, test_kw, qps, frames)
            bd = bd_rate(anchor, test)
            per_clip[kind] = round(bd, 3)
            detail[kind] = {
                "anchor": [[b, round(p, 3)] for b, p in anchor],
                "test": [[b, round(p, 3)] for b, p in test],
            }
            print(f"  {key:10s} {kind:8s}: BD-rate {bd:+.2f}%")
        mean_bd = float(np.mean(list(per_clip.values())))
        results[key] = {
            "bd_rate_pct": round(mean_bd, 3),
            "per_clip": per_clip,
            "points": detail,
            "qps": qps, "clip": f"corpus {W}x{H} x{NFRAMES}",
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{key:10s}: BD-rate {mean_bd:+.2f}% (mean of "
              f"{len(per_clip)})  ({results[key]['wall_s']}s)")
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
