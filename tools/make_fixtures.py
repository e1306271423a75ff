"""Generate the golden-bitstream fixture corpus (SURVEY.md §4
conformance row; VERDICT r04 item 9 / FORMAT.md §10).

Encodes ~8 tiny deterministic streams covering every SPS flag
combination the presets use, and stores bitstream + decoded-recon MD5s
under tests/fixtures/.  tests/test_fixtures.py decodes the checked-in
bytes and compares MD5s — a format change that silently breaks decode
of previously-written streams fails the suite (regenerate DELIBERATELY
with this tool and commit the diff when the format version moves).

    python tools/make_fixtures.py
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip

W, H = 96, 64

# name -> (config kwargs, frames, clip kind)
FIXTURES = {
    "ai_hevc": (dict(), 1, "mixed"),
    "ai_hevc_lossless": (dict(lossless=True, rdoq=False), 1, "mixed"),
    "ai_vvc_tools": (dict(profile=Profile.VVC, mts=True,
                          transform_skip=True, ref_substitute=True,
                          sign_data_hiding=True, rows_per_segment=1),
                     1, "text"),
    "ai_vvc_mtt_lfnst": (dict(profile=Profile.VVC, mts=True, mtt=True,
                              lfnst=True, ref_substitute=True),
                         1, "mixed"),
    "ai_vvc_cu64": (dict(profile=Profile.VVC, max_cu_size=64,
                         mts=True), 1, "gradient"),
    "lowdelay_p_filters": (dict(intra_period=4, deblock=True, sao=True,
                                sao_chroma=True, rpl=True,
                                merge_cands=True, amvp=True),
                           4, "motion"),
    "gpb_rpl_wp": (dict(intra_period=16, multi_ref=True, rpl=True,
                        weighted_pred=True), 4, "motion"),
    "ra_alf": (dict(intra_period=8, gop_size=4, deblock=True, sao=True,
                    alf=True, alf_chroma=True, alf_nonlinear=True,
                    ccalf=True, rpl=True), 5, "mixed"),
}


def main() -> None:
    outdir = os.path.join(ROOT, "tests", "fixtures")
    os.makedirs(outdir, exist_ok=True)
    manifest = {}
    for name, (kw, n, kind) in FIXTURES.items():
        cfg = CodecConfig(width=W, height=H, qp=32,
                          rdoq=kw.pop("rdoq", True), **kw)
        frames = synthetic_clip(W, H, n, kind=kind, seed=77)
        res = Encoder(cfg, with_recon=False).encode(frames)
        _, dec = Decoder().decode(res.bitstream)
        path = os.path.join(outdir, f"{name}.266t")
        with open(path, "wb") as f:
            f.write(res.bitstream)
        manifest[name] = {
            "bytes": len(res.bitstream),
            "frames": len(dec),
            "md5": [frame_md5(d) for d in dec],
        }
        print(f"{name:22s}: {len(res.bitstream):6d} bytes, "
              f"{len(dec)} frames")
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print("wrote", outdir)


if __name__ == "__main__":
    main()
