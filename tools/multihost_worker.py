"""One process of a fake-DCN multi-host encode (config 5 exercise).

Usage: python tools/multihost_worker.py PROC_ID NUM_PROCS PORT OUT_PATH

Each process initializes jax.distributed against a localhost
coordinator (the DCN stand-in), encodes its GOP partition via
shard.multihost.encode_multihost, and writes the GATHERED full
bitstream to OUT_PATH.  Every process must produce identical bytes,
equal to a single-process encode of the same clip
(tests/test_multihost.py pins both).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    pid, n, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n, process_id=pid)

    from x266_tpu.config import CodecConfig
    from x266_tpu.core.yuv import synthetic_clip
    from x266_tpu.shard.multihost import encode_multihost

    cfg = CodecConfig(width=128, height=128, qp=32, intra_period=4)
    frames = synthetic_clip(128, 128, 8, kind="mixed", seed=21)
    bs = encode_multihost(cfg, frames)
    if not isinstance(bs, bytes):
        bs = bs.bitstream
    with open(out_path, "wb") as f:
        f.write(bs)
    print(f"proc {pid}/{n}: {len(bs)} bytes")


if __name__ == "__main__":
    main()
