"""Distributed gates (SURVEY.md §4 "Distributed" row):

- tile-sharded multi-device encode produces a bitstream IDENTICAL to the
  single-device serial encoder (tiles are deterministic [STD-analog])
- works with loop filters + wavefront segments on
- recon equality across placements
"""

import jax
import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.shard import ShardedEncoder


@pytest.fixture(scope="module")
def frames():
    return synthetic_clip(128, 192, 3, kind="mixed", seed=11)


def test_sharded_equals_serial(frames):
    cfg = CodecConfig(width=128, height=192, qp=32, tile_rows=1)
    serial = Encoder(cfg).encode(frames)
    sharded = ShardedEncoder(cfg).encode(frames)
    assert sharded.bitstream == serial.bitstream
    for a, b in zip(serial.recon, sharded.recon):
        assert frame_md5(a) == frame_md5(b)


def test_sharded_with_filters_and_segments(frames):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = CodecConfig(width=128, height=192, qp=35, tile_rows=1,
                      deblock=True, sao=True, rows_per_segment=1)
    serial = Encoder(cfg).encode(frames)
    sharded = ShardedEncoder(cfg).encode(frames)
    assert sharded.bitstream == serial.bitstream
    # and the stream decodes bit-exactly
    _, dec = Decoder().decode(sharded.bitstream)
    for r, d in zip(sharded.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_placement_invariance(frames):
    # two devices vs all devices: identical bits
    cfg = CodecConfig(width=128, height=192, qp=30, tile_rows=1)
    two = ShardedEncoder(cfg, devices=jax.devices()[:2]).encode(frames[:2])
    alld = ShardedEncoder(cfg).encode(frames[:2])
    assert two.bitstream == alld.bitstream


def test_sharded_2d_grid_and_alf_equals_serial(frames):
    """Round-4 regression (review finding): ShardedEncoder must honor
    tile_cols (2-D rect grid) and carry the per-tile ALF sections —
    it previously split 1-D bands and dropped ALF params, emitting
    undecodable/mis-filtered streams."""
    cfg = CodecConfig(width=128, height=192, qp=33, tile_rows=1,
                      tile_cols=1, deblock=True, sao=True,
                      sao_chroma=True, alf=True, alf_chroma=True)
    serial = Encoder(cfg).encode(frames[:2])
    sharded = ShardedEncoder(cfg).encode(frames[:2])
    assert sharded.bitstream == serial.bitstream
    _, dec = Decoder().decode(sharded.bitstream)
    for a, d in zip(sharded.recon, dec):
        assert frame_md5(a) == frame_md5(d)
