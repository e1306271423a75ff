"""Aux subsystems (SURVEY.md §5): GOP scheduler, fault recovery,
checkpoint/resume, metrics, tracing."""

import os

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.shard.gop import GopScheduler
from x266_tpu.utils.metrics import MetricsLog, FrameRecord, \
    decision_histograms
from x266_tpu.utils.tracing import StageTimers


@pytest.fixture(scope="module")
def clip():
    return synthetic_clip(96, 64, 6, kind="mixed", seed=31)


@pytest.fixture(scope="module")
def cfg():
    return CodecConfig(width=96, height=64, qp=32, intra_period=3)


def test_gop_scheduler_equals_serial(clip, cfg):
    serial = Encoder(cfg).encode(clip)
    sched = GopScheduler(cfg).encode(clip)
    assert sched.bitstream == serial.bitstream


def test_fault_recovery_identical_bitstream(clip, cfg):
    serial = Encoder(cfg).encode(clip)
    failures = {"count": 0}

    def chaos(gop_idx, attempt):
        # first attempt of GOP 1 dies (simulated worker loss)
        if gop_idx == 1 and attempt == 0:
            failures["count"] += 1
            raise RuntimeError("injected worker failure")

    sched = GopScheduler(cfg, fault_hook=chaos).encode(clip)
    assert failures["count"] == 1
    assert sched.bitstream == serial.bitstream


def test_fault_exhaustion_raises(clip, cfg):
    def always_die(gop_idx, attempt):
        if gop_idx == 0:
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="failed after"):
        GopScheduler(cfg, max_retries=1,
                     fault_hook=always_die).encode(clip)


def test_checkpoint_resume_bit_exact(tmp_path, clip, cfg):
    one_shot = str(tmp_path / "oneshot.266t")
    GopScheduler(cfg).encode(clip, checkpoint_path=one_shot)

    # crash after the first GOP: encode only frames of GOP 0, checkpoint,
    # then resume with the full clip
    crashed = str(tmp_path / "crashed.266t")
    GopScheduler(cfg).encode(clip[:3], checkpoint_path=crashed)
    GopScheduler(cfg).encode(clip, checkpoint_path=crashed)

    with open(one_shot, "rb") as f:
        a = f.read()
    with open(crashed, "rb") as f:
        b = f.read()
    assert a == b and len(a) > 0
    # and the file decodes bit-exactly
    _, dec = Decoder().decode(a)
    assert len(dec) == len(clip)


def test_metrics_log(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLog(path)
    log.add(FrameRecord(0, "I", 1000, 40.0, 45.0, 45.0, 0.1))
    log.add(FrameRecord(1, "P", 300, 39.0, 44.0, 44.0, 0.05))
    s = log.summary()
    assert s["frames"] == 2 and s["mean_bits_p"] == 300
    assert os.path.getsize(path) > 0
    sm = np.array([[8, 16], [16, 32]])
    pm = np.array([[0, 1], [2, 2]])
    sh, ph = decision_histograms(sm, pm)
    assert sh == {8: 1, 16: 2, 32: 1}
    assert ph == {"intra": 1, "inter": 1, "skip": 2}


def test_stage_timers():
    t = StageTimers()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    r = t.report()
    assert r["a"]["calls"] == 2


def test_partition_gops():
    from x266_tpu.shard.multihost import partition_gops
    parts = partition_gops(10, 3, 2)
    # gops: (0,3)(3,3)(6,3)(9,1) round-robin over 2 processes
    assert parts[0] == [(0, 3), (6, 3)]
    assert parts[1] == [(3, 3), (9, 1)]
    flat = sorted(g for p in parts for g in p)
    assert sum(l for _, l in flat) == 10


def test_multihost_single_process(clip, cfg):
    from x266_tpu.shard.multihost import encode_multihost
    res = encode_multihost(cfg, clip)
    serial = Encoder(cfg).encode(clip)
    assert res.bitstream == serial.bitstream
