"""Config-4 composition gates (BASELINE.json:10, round-4).

The round-3 verdict's item 4: "4K RA with deblock/SAO/ALF, CTU tiles"
must be ONE expressible configuration.  These tests pin the full
composition at test scale:

- ALF (incl. chroma / nonlinear / CC-ALF) under tile bands: band-local
  filter derivation with per-band filter sets in the slice header
  (band-major layout, headers.SliceHeader), bit-exact decode.
- weighted prediction under tiles (reweighted halo-extended refs).
- rate control under tiles (low-delay).
- shard_map/ppermute sharded encode stays BIT-IDENTICAL to the serial
  oracle with the full filter chain on.
"""

import jax
import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip
from x266_tpu.shard.tiled_gop import encode_inter_tiled

W, H = 128, 256          # 4 uniform bands of 64 rows


@pytest.fixture(scope="module")
def frames():
    return synthetic_clip(W, H, 5, kind="mixed", seed=11)


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:4]), ("tile",))


def _full_cfg(**kw):
    base = dict(width=W, height=H, qp=32, intra_period=8,
                deblock=True, sao=True, sao_chroma=True, alf=True,
                alf_chroma=True, alf_nonlinear=True, ccalf=True,
                rdoq=True, tile_rows=1)
    base.update(kw)
    return CodecConfig(**base)


def test_alf_tiles_ra_roundtrip(frames):
    """RA GOP + full filter chain + tiles: the config-4 AND, decoded
    bit-exactly (per-band ALF sections in the slice header)."""
    cfg = _full_cfg(gop_size=4)
    res = Encoder(cfg).encode(frames)
    dcfg, dec = Decoder().decode(res.bitstream)
    assert dcfg.alf and dcfg.ccalf and dcfg.tile_rows == 1
    assert len(dec) == len(frames)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)


def test_alf_tiles_improves_quality(frames):
    """Band-local ALF must actually engage: the filtered tiled encode
    beats the same config with ALF off on SSE at equal QP."""
    cfg = _full_cfg()
    res = Encoder(cfg).encode(frames[:2])
    base = Encoder(cfg.replace(alf=False, alf_chroma=False,
                               alf_nonlinear=False,
                               ccalf=False)).encode(frames[:2])
    assert sum(s[0] for s in res.sse) <= sum(s[0] for s in base.sse)


def test_alf_tiles_sharded_equals_serial(frames, mesh):
    cfg = _full_cfg()
    serial = Encoder(cfg).encode(frames[:3])
    sharded = encode_inter_tiled(cfg, frames[:3], mesh=mesh)
    assert sharded.bitstream == serial.bitstream
    for a, b in zip(serial.recon, sharded.recon):
        assert frame_md5(a) == frame_md5(b)


def test_wp_tiles_roundtrip_and_sharded(mesh):
    """Weighted prediction under tiles: a synthetic fade decodes
    bit-exactly and sharded == serial."""
    base = synthetic_clip(W, H, 3, kind="mixed", seed=4)
    from x266_tpu.core.yuv import Frame
    fade = [Frame((f.y * (1.0 - 0.18 * i)).astype(np.uint8),
                  f.cb, f.cr) for i, f in enumerate(base)]
    cfg = CodecConfig(width=W, height=H, qp=32, intra_period=8,
                      tile_rows=1, deblock=True, sao=True,
                      weighted_pred=True)
    serial = Encoder(cfg).encode(fade)
    _, dec = Decoder().decode(serial.bitstream)
    for r, d in zip(serial.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    sharded = encode_inter_tiled(cfg, fade, mesh=mesh)
    assert sharded.bitstream == serial.bitstream


def test_rc_tiles_tracks_target(frames):
    """Rate control under tiles: the controller engages and the
    adaptive-QP tiled stream decodes bit-exactly."""
    from x266_tpu.utils.ratecontrol import make_controller

    cfg = CodecConfig(width=W, height=H, qp=30, intra_period=4,
                      tile_rows=1)
    ref = Encoder(cfg).encode(frames)
    ref_bits = sum(ref.frame_bits) / len(frames)
    rc = make_controller(cfg, bitrate_kbps=ref_bits * 0.5 * 30 / 1000,
                         fps=30.0)
    res = Encoder(cfg, rate_control=rc).encode(frames)
    got_bits = sum(res.frame_bits) / len(frames)
    assert got_bits < ref_bits * 0.9
    _, dec = Decoder().decode(res.bitstream)
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
