"""Phase breakdown of the all-intra 1080p encode loop."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from x266_tpu.config import CodecConfig
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.engine import fused
from x266_tpu.engine.picture import tile_entropy, tile_compute_async

cfg = CodecConfig(width=1920, height=1080, qp=32, rows_per_segment=1)
frames = synthetic_clip(1920, 1080, 4, kind="mixed")

step = fused.make_encode_step(cfg, with_recon=False)

# warm
packed = fused.pack_input(cfg, frames[0])
out = step(packed)
jax.block_until_ready(out)

# 1. pack
t0 = time.time()
for f in frames:
    packed = fused.pack_input(cfg, f)
t_pack = (time.time() - t0) / len(frames)

# 2. upload + device step + sync
t0 = time.time()
outs = []
for f in frames:
    packed = fused.pack_input(cfg, f)
    outs.append(step(packed))
jax.block_until_ready(outs)
t_dev = (time.time() - t0) / len(frames) - t_pack

# 3. downloads (finalize)
fins = [tile_compute_async(cfg, f, with_recon=False) for f in frames]
jax.block_until_ready(None)
time.sleep(0.5)
t0 = time.time()
tds = [fin() for fin in fins]
t_dl = (time.time() - t0) / len(frames)

# 4. entropy
t0 = time.time()
segs = [tile_entropy(td) for td in tds]
t_ent = (time.time() - t0) / len(frames)

print(f"pack_input     : {t_pack*1000:8.1f} ms/frame")
print(f"upload+device  : {t_dev*1000:8.1f} ms/frame")
print(f"download/unpack: {t_dl*1000:8.1f} ms/frame")
print(f"entropy (native): {t_ent*1000:7.1f} ms/frame")
print(f"sum            : {(t_pack+t_dev+t_dl+t_ent)*1000:8.1f} ms/frame")
