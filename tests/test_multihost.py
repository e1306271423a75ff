"""Config 5 multi-host gate (BASELINE.json:11, SURVEY.md §2.2 P7).

Real multi-PROCESS exercise: 2 local processes under jax.distributed
(localhost coordinator = fake DCN), GOPs partitioned across them,
NAL payloads allgathered — every process's gathered stream must be
bit-identical to the single-process encode.
"""

import os
import socket
import subprocess
import sys

import pytest

from x266_tpu.config import CodecConfig
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.shard.multihost import partition_gops


def test_partition_balanced():
    parts = partition_gops(12, 4, 2)
    assert parts == [[(0, 4), (8, 4)], [(4, 4)]]
    parts3 = partition_gops(10, 4, 3)
    assert sum(len(p) for p in parts3) == 3
    assert sorted(g for p in parts3 for g in p) == [(0, 4), (4, 4),
                                                    (8, 2)]


@pytest.mark.slow
def test_multihost_two_processes(tmp_path):
    """2 jax.distributed processes -> identical gathered bitstreams ==
    the single-process stream."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    outs = [tmp_path / f"mh_{i}.bin" for i in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(root, "tools",
                                      "multihost_worker.py"),
         str(i), "2", str(port), str(outs[i])],
        cwd=root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    streams = [o.read_bytes() for o in outs]
    assert streams[0] == streams[1]

    # single-process reference (same clip/cfg as the worker)
    from x266_tpu.shard.gop import GopScheduler
    cfg = CodecConfig(width=128, height=128, qp=32, intra_period=4)
    frames = synthetic_clip(128, 128, 8, kind="mixed", seed=21)
    ref = GopScheduler(cfg).encode(frames).bitstream
    assert streams[0] == ref
