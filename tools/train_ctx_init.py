"""Derive cabac/ctx_init.py tables from the synthetic training set.

Encodes a spread of clips/QPs/GOP shapes with FRESH contexts on the
pure-Python entropy path, captures every segment's final context
states per slice type, and writes the element-wise mean back into
``x266_tpu/cabac/ctx_init.py``.  Rerun whenever the context layout or
the syntax walkers change; follow with tools/update_rd_baselines.py.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ["X266T_NO_NATIVE"] = "1"       # capture via the Python walker


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import numpy as np

    from x266_tpu.api import Encoder
    from x266_tpu.cabac import contexts as cx
    from x266_tpu.cabac.syntax import SyntaxEncoder
    from x266_tpu.config import CodecConfig
    from x266_tpu.core.yuv import synthetic_clip

    captures: dict[str, list] = {"I": [], "P": [], "B": []}
    orig = SyntaxEncoder.encode_segment

    def capture(self, r0, r1):
        out = orig(self, r0, r1)
        key = "B" if self.is_b else ("P" if self.is_p else "I")
        captures[key].append(self.ctxs.p.astype(np.int64).copy())
        return out

    SyntaxEncoder.encode_segment = capture
    try:
        for kind in ("mixed", "gradient", "noise"):
            for qp in (27, 32, 37):
                frames = synthetic_clip(192, 192, 6, kind=kind,
                                        seed=qp)
                base = dict(width=192, height=192, qp=qp,
                            ctx_init=False, deblock=True, sao=True)
                Encoder(CodecConfig(**base)).encode(frames[:2])
                Encoder(CodecConfig(**base, intra_period=8)
                        ).encode(frames)
                Encoder(CodecConfig(**base, intra_period=8,
                                    gop_size=4)).encode(frames[:5])
    finally:
        SyntaxEncoder.encode_segment = orig

    lines = []
    for key in ("I", "P", "B"):
        arr = np.stack(captures[key])          # (n, NUM_CONTEXTS, 2)
        mean = np.rint(arr.mean(axis=0)).astype(int)
        print(f"{key}: {len(captures[key])} segments")
        rows = [f"    [{a}, {b}]," for a, b in mean]
        lines.append(f"TABLE_{key} = [\n" + "\n".join(rows) + "\n]")
        assert mean.shape == (cx.NUM_CONTEXTS, 2)

    path = os.path.join(ROOT, "x266_tpu", "cabac", "ctx_init.py")
    src = open(path).read()
    head, _, _ = src.partition("TABLE_I = ")
    tail_marker = "\nassert len(TABLE_I)"
    tail = src[src.index(tail_marker):]
    body = head + "\n\n".join(lines) + "\n" + tail
    # drop the stale placeholder comment if present
    body = body.replace(
        "# Placeholder (= fresh p=0.5) until tools/train_ctx_init.py "
        "bakes real\n# tables; the flag plumbing stays exact either "
        "way.\n", "# Trained by tools/train_ctx_init.py.\n")
    with open(path, "w") as f:
        f.write(body)
    print("wrote", path)


if __name__ == "__main__":
    main()
