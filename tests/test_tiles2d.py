"""2-D tile grid gates (SURVEY T4/P2 `tile_y x tile_x`, round-4).

- exchange_rect (two-phase ppermute, corners via the second hop) ==
  extend_rect (clamped 2-D slices) on the virtual mesh
- 2-D tiled inter encode decodes bit-exactly (P and RA-B)
- shard_map over a ('tile_y', 'tile_x') mesh is BIT-IDENTICAL to the
  serial rect oracle on (2,2) and (2,4) grids
- the full filter chain (ALF family) composes with the 2-D grid
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

W, H = 256, 128          # 2x2 grid of 128x64 tiles at tile_cols=2


@pytest.fixture(scope="module")
def frames():
    return synthetic_clip(W, H, 4, kind="mixed", seed=13)


def mesh2d(ny, nx):
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:ny * nx]).reshape(ny, nx)
    return Mesh(devs, ("tile_y", "tile_x"))


def test_exchange_rect_equals_extend(frames):
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(5)
    plane = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ny, nx, hy, hx = 2, 2, 16, 16
    bh, bw = H // ny, W // nx
    mesh = mesh2d(ny, nx)

    def fn(rect):
        return halo.exchange_rect(rect[0, 0], hy, hx,
                                  "tile_y", "tile_x", ny, nx)[None,
                                                              None]

    sharded = shard_map(
        fn, mesh=mesh, in_specs=P("tile_y", "tile_x"),
        out_specs=P("tile_y", "tile_x"), check_vma=False)
    tiles = plane.reshape(ny, bh, nx, bw).transpose(0, 2, 1, 3)
    got = np.asarray(jax.jit(sharded)(jax.device_put(
        np.ascontiguousarray(tiles),
        NamedSharding(mesh, P("tile_y", "tile_x")))))
    for i in range(ny):
        for j in range(nx):
            want = np.asarray(halo.extend_rect(
                jnp.asarray(plane), np.int32(i * bh), np.int32(j * bw),
                bh, bw, hy, hx))
            np.testing.assert_array_equal(got[i, j], want)


def test_tiles2d_p_roundtrip(frames):
    cfg = CodecConfig(width=W, height=H, qp=32, intra_period=8,
                      tile_rows=1, tile_cols=2, deblock=True, sao=True)
    res = Encoder(cfg).encode(frames[:3])
    dcfg, dec = Decoder().decode(res.bitstream)
    assert dcfg.tile_cols == 2 and dcfg.num_tiles == 4
    assert len(dec) == 3
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_tiles2d_sharded_2x2_equals_serial(frames):
    cfg = CodecConfig(width=W, height=H, qp=30, intra_period=8,
                      tile_rows=1, tile_cols=2, deblock=True, sao=True)
    serial = Encoder(cfg).encode(frames[:3])
    sharded = encode_inter_tiled(cfg, frames[:3], mesh=mesh2d(2, 2))
    assert sharded.bitstream == serial.bitstream
    for a, b in zip(serial.recon, sharded.recon):
        assert frame_md5(a) == frame_md5(b)


def test_tiles2d_sharded_2x4_equals_serial():
    w2 = 256                       # 4 tile cols x 64 + 2 rows x 64
    frames = synthetic_clip(w2, H, 3, kind="mixed", seed=21)
    cfg = CodecConfig(width=w2, height=H, qp=33, intra_period=8,
                      tile_rows=1, tile_cols=1)
    serial = Encoder(cfg).encode(frames)
    sharded = encode_inter_tiled(cfg, frames, mesh=mesh2d(2, 4))
    assert sharded.bitstream == serial.bitstream


def test_tiles2d_ra_alf_roundtrip(frames):
    """RA hierarchy + full ALF chain on the 2-D grid: the config-4
    composition at its widest."""
    cfg = CodecConfig(width=W, height=H, qp=33, intra_period=8,
                      gop_size=4, tile_rows=1, tile_cols=2,
                      deblock=True, sao=True, sao_chroma=True,
                      alf=True, alf_chroma=True, rdoq=True)
    res = Encoder(cfg).encode(frames)
    _, dec = Decoder().decode(res.bitstream)
    assert len(dec) == len(frames)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_tiles2d_horizontal_motion_crosses_boundary():
    """Horizontal motion beyond a column boundary must be
    representable via the left/right halo."""
    rng = np.random.default_rng(17)
    base = rng.integers(0, 256, (H, W + 64)).astype(np.uint8)
    from x266_tpu.core.yuv import Frame
    clip = []
    for t in range(2):
        y = base[:, t * 8:t * 8 + W]
        clip.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                          np.full((H // 2, W // 2), 120, np.uint8)))
    cfg = CodecConfig(width=W, height=H, qp=32, intra_period=8,
                      tile_cols=2)
    res = Encoder(cfg).encode(clip)
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    # P frame must be much cheaper than intra (real MC across columns)
    assert res.frame_bits[1] < res.frame_bits[0] * 0.5
