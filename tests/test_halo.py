"""P4 halo-exchange gates (SURVEY.md §2.2 P4, BASELINE.json:5).

- ppermute band exchange == clamped full-frame slices (the two halo
  sources used by the sharded and serial tiled paths)
- tiled inter encode (P and RA-B) decodes bit-exactly
- shard_map + ppermute tiled encode is BIT-IDENTICAL to the serial
  extend_band oracle on the virtual CPU mesh
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.shard import halo
from x266_tpu.shard.tiled_gop import encode_inter_tiled

W, H = 128, 256          # 4 uniform bands of 64 rows


@pytest.fixture(scope="module")
def frames():
    return synthetic_clip(W, H, 5, kind="mixed", seed=7)


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh
    devs = jax.devices()[:4]
    return Mesh(np.array(devs), ("tile",))


def test_exchange_equals_extend(mesh):
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (H, W)).astype(np.uint8)
    n, bh, hl = 4, H // 4, halo.HALO_Y

    def fn(band):
        return halo.exchange_bands(band, hl, "tile", n)

    sharded = shard_map(fn, mesh=mesh, in_specs=P("tile"),
                        out_specs=P("tile"), check_vma=False)
    got = np.asarray(jax.jit(sharded)(
        jax.device_put(plane, NamedSharding(mesh, P("tile")))))
    for i in range(n):
        want = np.asarray(halo.extend_band(jnp.asarray(plane),
                                           np.int32(i * bh), bh, hl))
        np.testing.assert_array_equal(
            got[i * (bh + 2 * hl):(i + 1) * (bh + 2 * hl)], want)


def test_min_halo_budget():
    assert halo.min_halo() <= halo.HALO_Y
    assert halo.min_halo() // 2 + 1 <= halo.HALO_C


def test_tiled_p_roundtrip(frames):
    cfg = CodecConfig(width=W, height=H, qp=32, intra_period=8,
                      tile_rows=1, deblock=True, sao=True,
                      rows_per_segment=1)
    res = Encoder(cfg).encode(frames[:3])
    dcfg, dec = Decoder().decode(res.bitstream)
    assert dcfg.tile_rows == 1
    assert len(dec) == 3
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_tiled_p_sharded_equals_serial(frames, mesh):
    cfg = CodecConfig(width=W, height=H, qp=30, intra_period=8,
                      tile_rows=1, deblock=True, sao=True)
    serial = Encoder(cfg).encode(frames[:3])
    sharded = encode_inter_tiled(cfg, frames[:3], mesh=mesh)
    assert sharded.bitstream == serial.bitstream
    for a, b in zip(serial.recon, sharded.recon):
        assert frame_md5(a) == frame_md5(b)


def test_tiled_ra_roundtrip_and_sharded(frames, mesh):
    cfg = CodecConfig(width=W, height=H, qp=33, intra_period=8,
                      gop_size=4, tile_rows=1, deblock=True, sao=True)
    serial = Encoder(cfg).encode(frames)
    sharded = encode_inter_tiled(cfg, frames, mesh=mesh)
    assert sharded.bitstream == serial.bitstream
    dcfg, dec = Decoder().decode(serial.bitstream)
    assert len(dec) == len(frames)
    for r, d in zip(serial.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_tiled_p_crosses_band_boundary(frames):
    """Vertical motion beyond a band boundary must be representable:
    encode a clip translating by +8 rows/frame and require inter CUs
    with MVs reaching into the halo (|mvy| >= 4 px) in band interiors."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (H + 64, W)).astype(np.uint8)
    from x266_tpu.core.yuv import Frame
    clip = []
    for t in range(2):
        y = base[t * 8:t * 8 + H]
        clip.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                          np.full((H // 2, W // 2), 120, np.uint8)))
    cfg = CodecConfig(width=W, height=H, qp=32, intra_period=8,
                      tile_rows=1)
    res = Encoder(cfg).encode(clip)
    # decoded must round-trip bit-exactly even with cross-band motion
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    # P frame must be much cheaper than the intra frame (real MC hits)
    assert res.frame_bits[1] < res.frame_bits[0] * 0.5
