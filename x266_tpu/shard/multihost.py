"""Multi-host distribution scaffolding (P7, SURVEY.md §2.2/§5).

The multi-host shape from BASELINE.json:5: GOPs scatter across hosts
over DCN, every host encodes its GOPs locally (chips under it handle
tile/frame parallelism), and host 0 gathers the NAL spans in POC order.
Bitstream bytes are tiny relative to pixels, so the gather uses the JAX
process-allgather utility (rides the coordination service) rather than a
bespoke transport.

This module is structured for real `jax.distributed` deployments but
degrades to a single process (process_count == 1) where it simply wraps
GopScheduler — which is what this environment can exercise; the
partitioning logic itself is pure and unit-tested.
"""

from __future__ import annotations

import numpy as np

from x266_tpu.config import CodecConfig
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, write_nal
from x266_tpu.core.yuv import Frame


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_index, process_count)."""
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def partition_gops(num_frames: int, intra_period: int,
                   process_count: int) -> list[list[tuple[int, int]]]:
    """Round-robin assignment of GOP (poc0, length) spans to processes.

    Deterministic and balanced; every process can compute the full
    schedule locally (no coordination needed).
    """
    n = intra_period if intra_period > 1 else 1
    gops = [(p, min(n, num_frames - p)) for p in range(0, num_frames, n)]
    out: list[list[tuple[int, int]]] = [[] for _ in range(process_count)]
    for i, g in enumerate(gops):
        out[i % process_count].append(g)
    return out


def encode_multihost(cfg: CodecConfig, frames: list[Frame]):
    """Encode this process's GOP share and gather the full stream.

    Single-process environments collapse to the local GopScheduler.
    Multi-process: each host encodes its partition, then NAL payloads
    are allgathered and stitched in POC order on every host.
    """
    import jax

    pi, pc = jax.process_index(), jax.process_count()
    from x266_tpu.shard.gop import GopScheduler

    if pc == 1:
        return GopScheduler(cfg).encode(frames)

    from jax.experimental import multihost_utils

    # establish the cross-process collective context NOW, while every
    # process is still in lockstep: the backend's context rendezvous has
    # a short timeout, and local encode times diverge across processes
    # (unequal GOP shares, compile skew), so a first-contact collective
    # after encoding can time out spuriously.
    multihost_utils.process_allgather(np.zeros(8, np.uint8))

    mine = partition_gops(len(frames), cfg.intra_period, pc)[pi]
    # each process drives only the chips under it (addressable devices)
    sched = GopScheduler(cfg, devices=jax.local_devices())
    local_nals: dict[int, bytes] = {}
    for poc0, length in mine:
        res = sched.encode(frames[poc0:poc0 + length], poc_base=poc0)
        # strip SPS/PPS; keep the slice NALs with their POCs
        from x266_tpu.core.nal import split_nals
        slices = [n for n in split_nals(res.bitstream)
                  if n[0] in (NalType.IDR, NalType.TRAIL)]
        for k, (t, rbsp) in enumerate(slices):
            local_nals[poc0 + k] = write_nal(t, rbsp)

    # exchange (poc, payload) pairs; payloads are padded u8 tensors.
    # every process contributes the same ROW COUNT (allgather needs
    # uniform shapes): pad with empty rows up to the max share.
    max_len = max((len(v) for v in local_nals.values()), default=0)
    limits = multihost_utils.process_allgather(
        np.array([max_len, len(local_nals)]))
    max_len = int(np.max(limits[..., 0]))
    rows = int(np.max(limits[..., 1]))
    packed = np.zeros((rows, max_len + 8), np.uint8)
    for i, poc in enumerate(sorted(local_nals)):
        b = local_nals[poc]
        packed[i, 0:4] = np.frombuffer(
            np.uint32(poc).tobytes(), np.uint8)
        packed[i, 4:8] = np.frombuffer(
            np.uint32(len(b)).tobytes(), np.uint8)
        packed[i, 8:8 + len(b)] = np.frombuffer(b, np.uint8)
    gathered = multihost_utils.process_allgather(packed, tiled=True)

    by_poc: dict[int, bytes] = {}
    for row in np.asarray(gathered):
        ln = int(np.frombuffer(row[4:8].tobytes(), np.uint32)[0])
        if ln:
            poc = int(np.frombuffer(row[0:4].tobytes(), np.uint32)[0])
            by_poc[poc] = row[8:8 + ln].tobytes()
    out = [write_nal(NalType.VPS, headers.write_vps(cfg)),
           write_nal(NalType.SPS, headers.write_sps(cfg)),
           write_nal(NalType.PPS, headers.write_pps(cfg))]
    out += [by_poc[p] for p in sorted(by_poc)]
    return b"".join(out)
