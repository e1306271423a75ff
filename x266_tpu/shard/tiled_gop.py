"""Tile-band INTER encoding with reference-halo exchange (P2 + P4).

BASELINE.json:5 requires "reference-frame regions and tile-boundary
halos exchanged via ICI collectives (ppermute / all-gather)".  This
module provides the two implementations, guaranteed bit-identical:

  * _SerialBands — every band stepped on one device; each band's
    reference pyramids come from ``halo.extend_band`` slices of the
    full previous reconstruction (the oracle, and the single-chip
    multi-tile path);
  * _ShardedBands — uniform bands laid out over a 1-D ``tile`` mesh
    axis with ``shard_map``; each device keeps only its band of the
    reference picture and receives the +-HALO neighbor strips via
    ``jax.lax.ppermute`` (ICI on real hardware, shard.halo).

Both feed the same GOP loop (low-delay P chain and the random-access
hierarchical-B order, mirroring api.Encoder), and both produce the
same bitstream as each other (tests/test_halo.py pins this).  Tiles
are independent sub-pictures for intra/entropy/filters; only INTER
prediction reads across the band boundary, which is exactly what the
halo carries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x266_tpu.api.encoder import EncodeResult
from x266_tpu.cabac import native_bind
from x266_tpu.cabac.syntax import SyntaxEncoder
from x266_tpu.config import CodecConfig, SliceType
from x266_tpu.core import headers
from x266_tpu.core.nal import NalType, write_nal
from x266_tpu.core.yuv import Frame
from x266_tpu.engine import fused
from x266_tpu.engine.picture import (assemble_slice, b_qp_offset,
                                     gop_coding_order, split_bands)
from x266_tpu.shard import halo


# ---- per-band host finalize + entropy --------------------------------------

class BandOut:
    """Host-side band outputs (post device step, pre entropy)."""

    __slots__ = ("bcfg", "cy", "ccb", "ccr", "maps", "sse", "recon")

    def __init__(self, bcfg, cy, ccb, ccr, maps, sse, recon):
        self.bcfg = bcfg
        self.cy, self.ccb, self.ccr = cy, ccb, ccr
        self.maps = maps
        self.sse = sse
        self.recon = recon


def _finalize_band(bcfg: CodecConfig, coef, flat, sse, rec,
                   with_recon: bool, inter: bool = True) -> BandOut:
    """Device (or already-downloaded numpy) step outputs -> BandOut."""
    stats = np.asarray(sse)
    sse_np = stats[:3]
    full = fused.fetch_coefs(bcfg, coef, stats)
    cy, ccb, ccr = fused.unpack_coefs(bcfg, full)
    maps = fused.unpack_maps(bcfg, np.asarray(flat), inter=inter)
    recon = (fused.unpack_recon(bcfg, np.asarray(rec))
             if with_recon else None)
    return BandOut(bcfg, cy, ccb, ccr, maps, sse_np, recon)


def _band_alf(b: BandOut):
    """Band's ALF parameter tuple (for the band-major slice header)."""
    from x266_tpu.engine.picture import band_alf_tuple
    return band_alf_tuple(b.maps) if b.bcfg.alf else None


def _band_segments(b: BandOut, st: SliceType) -> list[bytes]:
    """Entropy-code one band -> its segment payloads."""
    bcfg, maps = b.bcfg, b.maps
    sao_params = ((maps["sao_type"], maps["sao_band"], maps["sao_off"])
                  if bcfg.sao else None)
    if st == SliceType.B:
        imaps = (maps["pred"], maps["mvx"], maps["mvy"],
                 maps["mvx1"], maps["mvy1"])
    elif st == SliceType.P:
        imaps = (maps["pred"], maps["mvx"], maps["mvy"])
    else:
        imaps = None
    from x266_tpu.engine.picture import code_segments
    return code_segments(bcfg, maps["size"], maps["mode"], b.cy,
                         b.ccb, b.ccr, sao_params, maps["mts"], imaps)


def _bands_to_slice(cfg: CodecConfig, bands: list[BandOut], poc: int,
                    st: SliceType, with_recon: bool,
                    wp: list[int] | None = None):
    """Bands -> (rbsp, recon Frame|None, frame sse (3,))."""
    segments = [seg for b in bands for seg in _band_segments(b, st)]
    alf = ([_band_alf(b) for b in bands] if cfg.alf else None)
    rbsp = assemble_slice(cfg, poc, segments, st, alf=alf, wp=wp)
    recon = None
    if with_recon:
        from x266_tpu.engine.picture import stitch_rects
        recon = stitch_rects(cfg, [b.recon for b in bands])
    sse = np.sum([b.sse[:3] for b in bands], axis=0)
    return rbsp, recon, sse


# ---- serial backend: extend_band slices of the full reference --------------

class _SerialBands:
    """One device; per-band jits; refs = full filtered planes (device)."""

    def __init__(self, cfg: CodecConfig, with_recon: bool):
        self.cfg = cfg
        self.with_recon = with_recon
        self.bands = cfg.tile_bands()
        self.bcfgs = [cfg.tile_cfg(b) for b in self.bands]

    def _refs_from(self, recs):
        """Per-band packed rec (device u8) -> full (Y, Cb, Cr) planes."""
        w = self.cfg.width
        ys, cbs, crs = [], [], []
        for bcfg, rec in zip(self.bcfgs, recs):
            bh = bcfg.height
            ys.append(rec[:bh])
            cbs.append(rec[bh:, :w // 2])
            crs.append(rec[bh:, w // 2:])
        return (jnp.concatenate(ys), jnp.concatenate(cbs),
                jnp.concatenate(crs))

    def _run(self, frame, stepper, qp: int | None = None,
             inter: bool = True):
        bcfgs = (self.bcfgs if qp is None
                 else [b.replace(qp=qp) for b in self.bcfgs])
        outs = [stepper(bcfg, fused.pack_input(bcfg, band), y0)
                for bcfg, (y0, _), band in zip(
                    bcfgs, self.bands, split_bands(self.cfg, frame))]
        refs = self._refs_from([o[3] for o in outs])
        bands = [_finalize_band(bcfg, o[0], o[1], o[2], o[3],
                                self.with_recon, inter)
                 for bcfg, o in zip(bcfgs, outs)]
        return bands, refs

    @staticmethod
    def _wp_args(bcfg, wp):
        if not bcfg.weighted_pred:
            return ()
        return (np.asarray(wp, np.int32),)

    def encode_i(self, frame, qp: int | None = None):
        return self._run(frame, lambda bcfg, packed, y0:
                         fused.make_encode_step_i(bcfg, True, False)(
                             packed), qp, inter=False)

    def encode_p(self, frame, refs, qp: int | None = None, wp=None):
        return self._run(frame, lambda bcfg, packed, y0:
                         fused.make_encode_step_p_band(bcfg)(
                             packed, np.int32(y0), *refs,
                             *self._wp_args(bcfg, wp)), qp)

    def encode_b(self, frame, refs0, refs1, qp: int | None = None,
                 wp=None):
        return self._run(frame, lambda bcfg, packed, y0:
                         fused.make_encode_step_b_band(bcfg)(
                             packed, np.int32(y0), *refs0, *refs1,
                             *self._wp_args(bcfg, wp)), qp)


# ---- serial 2-D rect backend (SURVEY T4/P2 tile_y x tile_x) ----------------

class _SerialRects:
    """One device; per-rect jits; refs = full filtered planes.  The
    serial oracle for the 2-D tile grid: each rect's references come
    from extend_rect's clamped 2-D slices of the full previous
    reconstruction (bit-identical to _ShardedRects' ppermute path)."""

    def __init__(self, cfg: CodecConfig, with_recon: bool):
        self.cfg = cfg
        self.with_recon = with_recon
        self.rects = cfg.tile_rects()
        self.bcfgs = [cfg.tile_cfg(r) for r in self.rects]

    def _stitch(self, parts):
        nx = self.cfg.num_tile_cols
        return jnp.concatenate(
            [jnp.concatenate(parts[i:i + nx], axis=1)
             for i in range(0, len(parts), nx)], axis=0)

    def _refs_from(self, recs):
        ys, cbs, crs = [], [], []
        for bcfg, rec in zip(self.bcfgs, recs):
            bh, bw = bcfg.height, bcfg.width
            ys.append(rec[:bh])
            cbs.append(rec[bh:, :bw // 2])
            crs.append(rec[bh:, bw // 2:])
        return (self._stitch(ys), self._stitch(cbs),
                self._stitch(crs))

    def _run(self, frame, stepper, qp: int | None = None,
             inter: bool = True):
        from x266_tpu.engine.picture import split_rects
        bcfgs = (self.bcfgs if qp is None
                 else [b.replace(qp=qp) for b in self.bcfgs])
        outs = [stepper(bcfg, fused.pack_input(bcfg, part),
                        rect[0], rect[2])
                for bcfg, rect, part in zip(
                    bcfgs, self.rects, split_rects(self.cfg, frame))]
        refs = self._refs_from([o[3] for o in outs])
        bands = [_finalize_band(bcfg, o[0], o[1], o[2], o[3],
                                self.with_recon, inter)
                 for bcfg, o in zip(bcfgs, outs)]
        return bands, refs

    @staticmethod
    def _wp_args(bcfg, wp):
        if not bcfg.weighted_pred:
            return ()
        return (np.asarray(wp, np.int32),)

    def encode_i(self, frame, qp: int | None = None):
        return self._run(frame, lambda bcfg, packed, y0, x0:
                         fused.make_encode_step_i(bcfg, True, False)(
                             packed), qp, inter=False)

    def encode_p(self, frame, refs, qp: int | None = None, wp=None):
        return self._run(frame, lambda bcfg, packed, y0, x0:
                         fused.make_encode_step_p_rect(bcfg)(
                             packed, np.int32(y0), np.int32(x0), *refs,
                             *self._wp_args(bcfg, wp)), qp)

    def encode_b(self, frame, refs0, refs1, qp: int | None = None,
                 wp=None):
        return self._run(frame, lambda bcfg, packed, y0, x0:
                         fused.make_encode_step_b_rect(bcfg)(
                             packed, np.int32(y0), np.int32(x0),
                             *refs0, *refs1,
                             *self._wp_args(bcfg, wp)), qp)


# ---- sharded backend: shard_map + ppermute halo exchange -------------------

def uniform_bands(cfg: CodecConfig) -> tuple[int, CodecConfig] | None:
    """(n_bands, band cfg) when every band has equal height, else None
    (shard_map needs identical per-shard shapes)."""
    bands = cfg.tile_bands()
    bh = bands[0][1] - bands[0][0]
    if any(b1 - b0 != bh for b0, b1 in bands):
        return None
    return len(bands), cfg.tile_cfg(bands[0])


class _ShardedBands:
    """Bands over a 1-D 'tile' mesh; halos via jax.lax.ppermute."""

    def __init__(self, cfg: CodecConfig, mesh, with_recon: bool):
        from jax.sharding import NamedSharding, PartitionSpec as P

        u = uniform_bands(cfg)
        if u is None:
            raise ValueError("sharded tiles need uniform band heights")
        self.n, self.bcfg = u
        if self.n != mesh.shape["tile"]:
            raise ValueError(
                f"{self.n} bands vs mesh tile={mesh.shape['tile']}")
        if self.bcfg.height < halo.HALO_Y:
            raise ValueError("band height below the halo width")
        self.cfg = cfg
        self.mesh = mesh
        self.with_recon = with_recon
        self.sharding = NamedSharding(mesh, P("tile"))
        self.bcfgs = [self.bcfg] * self.n
        self._steps: dict[str, object] = {}

    def _pack(self, frame):
        stacked = np.stack([fused.pack_input(self.bcfg, band)
                            for band in split_bands(self.cfg, frame)])
        return jax.device_put(stacked, self.sharding)

    def _exchange_pyrs(self, ry, rcb, rcr):
        n = self.n
        return halo.build_ext_pyramids(
            halo.exchange_bands(ry, halo.HALO_Y, "tile", n),
            halo.exchange_bands(rcb, halo.HALO_C, "tile", n),
            halo.exchange_bands(rcr, halo.HALO_C, "tile", n))

    def _split_rec(self, rec):
        bh, w = self.bcfg.height, self.bcfg.width
        return rec[:bh], rec[bh:, :w // 2], rec[bh:, w // 2:]

    def _make(self, kind: str, bcfg: CodecConfig):
        """Build the jitted shard_map step for kind in {'i','p','b'}."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        has_wp = bcfg.weighted_pred and kind != "i"
        if kind == "i":
            from x266_tpu.engine.fused import _make_encode_step_i_raw
            body = _make_encode_step_i_raw(bcfg, True, False)

            def band_fn(packed):
                out = body(packed[0])
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None], out)
        elif kind == "p":
            from x266_tpu.engine.fused import _p_body
            from x266_tpu.engine.inter import (
                make_mode_decision_p_raw, select_recon_inter_impl)
            mdp = make_mode_decision_p_raw(bcfg)
            rp = select_recon_inter_impl(bcfg, encode=True)

            def band_fn(packed, ry, rcb, rcr, *wp):
                pyrs = self._exchange_pyrs(ry[0], rcb[0], rcr[0])
                out = _p_body(bcfg, mdp, rp, packed[0], *pyrs, True,
                              False, wp[0] if wp else None)
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None], out)
        else:
            from x266_tpu.engine.fused import _b_body
            from x266_tpu.engine.inter import (
                make_mode_decision_b_raw, select_recon_inter_impl)
            mdb = make_mode_decision_b_raw(bcfg)
            rp = select_recon_inter_impl(bcfg, encode=True, b_mode=True)

            def band_fn(packed, r0y, r0cb, r0cr, r1y, r1cb, r1cr, *wp):
                p0 = self._exchange_pyrs(r0y[0], r0cb[0], r0cr[0])
                p1 = self._exchange_pyrs(r1y[0], r1cb[0], r1cr[0])
                out = _b_body(bcfg, mdb, rp, packed[0], p0, p1, True,
                              False, wp[0] if wp else None)
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None], out)

        n_in = {"i": 1, "p": 4, "b": 7}[kind]
        # output structure: trace once abstractly to build out_specs
        spec = P("tile")
        in_specs = (spec,) * n_in
        if has_wp:
            in_specs = in_specs + (P(),)     # wp table: replicated
        fn = shard_map(band_fn, mesh=self.mesh,
                       in_specs=in_specs,
                       out_specs=jax.tree.map(
                           lambda _: spec,
                           self._out_template(bcfg, kind != "i")),
                       check_vma=False)
        return jax.jit(fn)

    def _out_template(self, bcfg: CodecConfig, inter: bool):
        """Abstract output pytree (for out_specs): structure only."""
        from x266_tpu.engine.fused import _esc_capacity, _wire_spec
        bh, w = bcfg.height, bcfg.width
        hc = bh + bh // 2
        if bcfg.lossless:
            coef = jax.ShapeDtypeStruct((hc, w), jnp.int16)
            nsse = 3
        else:
            k = _esc_capacity(w)
            coef = (jax.ShapeDtypeStruct((hc, w // 2), jnp.uint8),
                    (jax.ShapeDtypeStruct((hc, k), jnp.int16),
                     jax.ShapeDtypeStruct((hc, k), jnp.int16)),
                    jax.ShapeDtypeStruct((hc, w), jnp.uint8),
                    jax.ShapeDtypeStruct((hc, w), jnp.int8))
            nsse = 5
        _, flat_len = _wire_spec(bcfg, inter)
        return (coef,
                jax.ShapeDtypeStruct((flat_len,), jnp.uint8),
                jax.ShapeDtypeStruct((nsse,), jnp.float32),
                jax.ShapeDtypeStruct((hc, w), jnp.uint8),
                jax.ShapeDtypeStruct((bh, w), jnp.uint8),
                jax.ShapeDtypeStruct((bh // 2, w // 2), jnp.uint8),
                jax.ShapeDtypeStruct((bh // 2, w // 2), jnp.uint8))

    def _step(self, kind: str, qp: int | None = None):
        key = (kind, qp)
        if key not in self._steps:
            bcfg = (self.bcfg if qp is None
                    else self.bcfg.replace(qp=qp))
            self._steps[key] = self._make(kind, bcfg)
        return self._steps[key]

    def _finish(self, out, bcfg: CodecConfig, inter: bool):
        """Sharded step output -> (list[BandOut], refs)."""
        coef, flat, sse, rec, ry, rcb, rcr = out
        refs = (ry, rcb, rcr)            # stay sharded on the mesh
        # one download per array, sliced per band on host
        if bcfg.lossless:
            coef_np = np.asarray(coef)
            fulls = [coef_np[i].astype(np.int32)
                     for i in range(self.n)]
        else:
            stats = np.asarray(sse)
            nib = np.asarray(coef[0])
            vals = np.asarray(coef[1][0])
            cols = np.asarray(coef[1][1])
            fulls = []
            for i in range(self.n):
                if stats[i, 3] == 0:
                    fulls.append(fused.reconstruct_coefs_nib(
                        nib[i], vals[i], cols[i]))
                else:
                    hi = (np.asarray(coef[3][i])
                          if stats[i, 4] > 0 else None)
                    fulls.append(fused.reconstruct_coefs(
                        np.asarray(coef[2][i]), hi))
        flat_np = np.asarray(flat)
        sse_np = np.asarray(sse)
        rec_np = np.asarray(rec) if self.with_recon else [None] * self.n
        bands = []
        for i in range(self.n):
            cy, ccb, ccr = fused.unpack_coefs(bcfg, fulls[i])
            maps = fused.unpack_maps(bcfg, flat_np[i], inter=inter)
            recon = (fused.unpack_recon(bcfg, rec_np[i])
                     if self.with_recon else None)
            bands.append(BandOut(bcfg, cy, ccb, ccr, maps,
                                 sse_np[i][:3], recon))
        return bands, refs

    def _wp_args(self, wp):
        if not self.bcfg.weighted_pred or wp is None:
            return ()
        return (jax.device_put(np.asarray(wp, np.int32)),)

    def encode_i(self, frame, qp: int | None = None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("i", qp)(self._pack(frame)),
                            bcfg, False)

    def encode_p(self, frame, refs, qp: int | None = None, wp=None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("p", qp)(
            self._pack(frame), *refs, *self._wp_args(wp)), bcfg, True)

    def encode_b(self, frame, refs0, refs1, qp: int | None = None,
                 wp=None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("b", qp)(
            self._pack(frame), *refs0, *refs1, *self._wp_args(wp)),
            bcfg, True)


def uniform_rects(cfg: CodecConfig):
    """(ny, nx, rect cfg) when every rect has equal shape, else None."""
    rects = cfg.tile_rects()
    bh = rects[0][1] - rects[0][0]
    bw = rects[0][3] - rects[0][2]
    if any(r[1] - r[0] != bh or r[3] - r[2] != bw for r in rects):
        return None
    return cfg.num_tile_rows, cfg.num_tile_cols, cfg.tile_cfg(rects[0])


class _ShardedRects:
    """2-D rect grid over a ('tile_y', 'tile_x') mesh; halos via the
    two-phase ppermute exchange (rows then columns of the row-extended
    plane, which carries the diagonal corners — shard/halo.py)."""

    def __init__(self, cfg: CodecConfig, mesh, with_recon: bool):
        from jax.sharding import NamedSharding, PartitionSpec as P

        u = uniform_rects(cfg)
        if u is None:
            raise ValueError("sharded rects need uniform tile shapes")
        self.ny, self.nx, self.bcfg = u
        if (self.ny != mesh.shape.get("tile_y")
                or self.nx != mesh.shape.get("tile_x")):
            raise ValueError(
                f"({self.ny}x{self.nx}) rects vs mesh {dict(mesh.shape)}")
        if self.bcfg.height < halo.HALO_Y or self.bcfg.width < halo.HALO_Y:
            raise ValueError("tile shape below the halo width")
        self.cfg = cfg
        self.mesh = mesh
        self.with_recon = with_recon
        self.sharding = NamedSharding(mesh, P("tile_y", "tile_x"))
        self._steps: dict[tuple, object] = {}

    def _pack(self, frame):
        from x266_tpu.engine.picture import split_rects
        parts = split_rects(self.cfg, frame)
        stacked = np.stack([fused.pack_input(self.bcfg, p)
                            for p in parts])
        stacked = stacked.reshape((self.ny, self.nx)
                                  + stacked.shape[1:])
        return jax.device_put(stacked, self.sharding)

    def _exchange_pyrs(self, ry, rcb, rcr):
        ny, nx = self.ny, self.nx
        hy, hc = halo.HALO_Y, halo.HALO_C
        return halo.build_ext_pyramids(
            halo.exchange_rect(ry, hy, hy, "tile_y", "tile_x", ny, nx),
            halo.exchange_rect(rcb, hc, hc, "tile_y", "tile_x", ny, nx),
            halo.exchange_rect(rcr, hc, hc, "tile_y", "tile_x", ny, nx),
            halo_x=hy, halo_xc=hc)

    def _split_rec(self, rec):
        bh, bw = self.bcfg.height, self.bcfg.width
        return rec[:bh], rec[bh:, :bw // 2], rec[bh:, bw // 2:]

    def _out_template(self, bcfg: CodecConfig, inter: bool):
        from x266_tpu.engine.fused import _esc_capacity, _wire_spec
        bh, w = bcfg.height, bcfg.width
        hc = bh + bh // 2
        if bcfg.lossless:
            coef = jax.ShapeDtypeStruct((hc, w), jnp.int16)
            nsse = 3
        else:
            k = _esc_capacity(w)
            coef = (jax.ShapeDtypeStruct((hc, w // 2), jnp.uint8),
                    (jax.ShapeDtypeStruct((hc, k), jnp.int16),
                     jax.ShapeDtypeStruct((hc, k), jnp.int16)),
                    jax.ShapeDtypeStruct((hc, w), jnp.uint8),
                    jax.ShapeDtypeStruct((hc, w), jnp.int8))
            nsse = 5
        _, flat_len = _wire_spec(bcfg, inter)
        return (coef,
                jax.ShapeDtypeStruct((flat_len,), jnp.uint8),
                jax.ShapeDtypeStruct((nsse,), jnp.float32),
                jax.ShapeDtypeStruct((hc, w), jnp.uint8),
                jax.ShapeDtypeStruct((bh, w), jnp.uint8),
                jax.ShapeDtypeStruct((bh // 2, w // 2), jnp.uint8),
                jax.ShapeDtypeStruct((bh // 2, w // 2), jnp.uint8))

    def _make(self, kind: str, bcfg: CodecConfig):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        has_wp = bcfg.weighted_pred and kind != "i"
        if kind == "i":
            from x266_tpu.engine.fused import _make_encode_step_i_raw
            body = _make_encode_step_i_raw(bcfg, True, False)

            def rect_fn(packed):
                out = body(packed[0, 0])
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None, None], out)
        elif kind == "p":
            from x266_tpu.engine.fused import _p_body
            from x266_tpu.engine.inter import (
                make_mode_decision_p_raw, select_recon_inter_impl)
            mdp = make_mode_decision_p_raw(bcfg)
            rp = select_recon_inter_impl(bcfg, encode=True)

            def rect_fn(packed, ry, rcb, rcr, *wp):
                pyrs = self._exchange_pyrs(ry[0, 0], rcb[0, 0],
                                           rcr[0, 0])
                out = _p_body(bcfg, mdp, rp, packed[0, 0], *pyrs,
                              True, False, wp[0] if wp else None)
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None, None], out)
        else:
            from x266_tpu.engine.fused import _b_body
            from x266_tpu.engine.inter import (
                make_mode_decision_b_raw, select_recon_inter_impl)
            mdb = make_mode_decision_b_raw(bcfg)
            rp = select_recon_inter_impl(bcfg, encode=True,
                                         b_mode=True)

            def rect_fn(packed, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
                        *wp):
                p0 = self._exchange_pyrs(r0y[0, 0], r0cb[0, 0],
                                         r0cr[0, 0])
                p1 = self._exchange_pyrs(r1y[0, 0], r1cb[0, 0],
                                         r1cr[0, 0])
                out = _b_body(bcfg, mdb, rp, packed[0, 0], p0, p1,
                              True, False, wp[0] if wp else None)
                out = out + self._split_rec(out[3])
                return jax.tree.map(lambda a: a[None, None], out)

        n_in = {"i": 1, "p": 4, "b": 7}[kind]
        spec = P("tile_y", "tile_x")
        in_specs = (spec,) * n_in
        if has_wp:
            in_specs = in_specs + (P(),)     # wp table: replicated
        fn = shard_map(rect_fn, mesh=self.mesh,
                       in_specs=in_specs,
                       out_specs=jax.tree.map(
                           lambda _: spec,
                           self._out_template(bcfg, kind != "i")),
                       check_vma=False)
        return jax.jit(fn)

    def _step(self, kind: str, qp: int | None = None):
        key = (kind, qp)
        if key not in self._steps:
            bcfg = (self.bcfg if qp is None
                    else self.bcfg.replace(qp=qp))
            self._steps[key] = self._make(kind, bcfg)
        return self._steps[key]

    def _finish(self, out, bcfg: CodecConfig, inter: bool):
        """Sharded step output -> (row-major list[BandOut], refs)."""
        coef, flat, sse, rec, ry, rcb, rcr = out
        refs = (ry, rcb, rcr)            # stay sharded on the mesh
        n = self.ny * self.nx

        def flat2(a):
            a = np.asarray(a)
            return a.reshape((n,) + a.shape[2:])

        if bcfg.lossless:
            coef_np = flat2(coef)
            fulls = [coef_np[i].astype(np.int32) for i in range(n)]
            stats = flat2(sse)
        else:
            stats = flat2(sse)
            nib = flat2(coef[0])
            vals = flat2(coef[1][0])
            cols = flat2(coef[1][1])
            fulls = []
            for i in range(n):
                if stats[i, 3] == 0:
                    fulls.append(fused.reconstruct_coefs_nib(
                        nib[i], vals[i], cols[i]))
                else:
                    hi = (flat2(coef[3])[i]
                          if stats[i, 4] > 0 else None)
                    fulls.append(fused.reconstruct_coefs(
                        flat2(coef[2])[i], hi))
        flat_np = flat2(flat)
        rec_np = flat2(rec) if self.with_recon else [None] * n
        bands = []
        for i in range(n):
            cy, ccb, ccr = fused.unpack_coefs(bcfg, fulls[i])
            maps = fused.unpack_maps(bcfg, flat_np[i], inter=inter)
            recon = (fused.unpack_recon(bcfg, rec_np[i])
                     if self.with_recon else None)
            bands.append(BandOut(bcfg, cy, ccb, ccr, maps,
                                 stats[i][:3], recon))
        return bands, refs

    def _wp_args(self, wp):
        if not self.bcfg.weighted_pred or wp is None:
            return ()
        return (jax.device_put(np.asarray(wp, np.int32)),)

    def encode_i(self, frame, qp: int | None = None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("i", qp)(self._pack(frame)),
                            bcfg, False)

    def encode_p(self, frame, refs, qp: int | None = None, wp=None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("p", qp)(
            self._pack(frame), *refs, *self._wp_args(wp)), bcfg, True)

    def encode_b(self, frame, refs0, refs1, qp: int | None = None,
                 wp=None):
        bcfg = self.bcfg if qp is None else self.bcfg.replace(qp=qp)
        return self._finish(self._step("b", qp)(
            self._pack(frame), *refs0, *refs1, *self._wp_args(wp)),
            bcfg, True)


# ---- the shared GOP loop ----------------------------------------------------

def encode_inter_tiled(cfg: CodecConfig, frames: list[Frame],
                       with_recon: bool = True, mesh=None,
                       rate_control=None) -> EncodeResult:
    """Tile-band GOP encoder: low-delay P (intra_period) and the RA
    hierarchical-B order (gop_size), with halo-extended references.
    mesh=None -> serial oracle; a Mesh with a 'tile' axis -> shard_map
    with ppermute halo exchange (bit-identical streams).  Composes the
    full config-4 toolset: ALF runs band-locally (per-band filter sets
    in the slice header), weighted prediction reweights the halo-
    extended references, and rate_control steers the low-delay QP
    (BASELINE.json:10 composition)."""
    from x266_tpu.api.encoder import fit_weight

    if rate_control is not None and cfg.gop_size > 1:
        raise ValueError("rate control supports low-delay in v1")
    two_d = cfg.num_tile_cols > 1
    if mesh is not None:
        be = (_ShardedRects(cfg, mesh, with_recon) if two_d
              else _ShardedBands(cfg, mesh, with_recon))
    elif two_d:
        be = _SerialRects(cfg, with_recon)
    else:
        be = _SerialBands(cfg, with_recon)
    out = [write_nal(NalType.VPS, headers.write_vps(cfg)),
           write_nal(NalType.SPS, headers.write_sps(cfg)),
           write_nal(NalType.PPS, headers.write_pps(cfg))]
    order = gop_coding_order(len(frames), cfg.intra_period,
                             max(cfg.gop_size, 1))
    dpb: dict[int, tuple] = {}
    per_poc: dict[int, tuple] = {}
    rc = rate_control
    fcfg = cfg
    for poc, kind in order:
        fcfg = cfg
        wp = None
        if kind == "B":
            l0 = max(p for p in dpb if p < poc)
            l1 = min(p for p in dpb if p > poc)
            off = b_qp_offset(cfg, poc)
            qp_b = (cfg.qp + off) if off else None
            if qp_b is not None:
                fcfg = cfg.replace(qp=qp_b)
            if cfg.weighted_pred:
                wp = [fit_weight(frames[poc], frames[l0]),
                      fit_weight(frames[poc], frames[l1])]
            bands, refs = be.encode_b(frames[poc], dpb[l0], dpb[l1],
                                      qp=qp_b, wp=wp)
            st = SliceType.B
            if poc % 2 == 0:             # leaf-B rule (never referenced)
                dpb[poc] = refs
        elif kind == "P":
            rp = max(p for p in dpb if p < poc)
            qp_p = rc.qp if rc is not None else None
            if qp_p is not None:
                fcfg = cfg.replace(qp=qp_p)
            if cfg.weighted_pred:
                wp = fit_weight(frames[poc], frames[rp])
            bands, refs = be.encode_p(frames[poc], dpb[rp], qp=qp_p,
                                      wp=wp)
            st = SliceType.P
            dpb[poc] = refs
        else:
            qp_i = rc.qp if rc is not None else None
            if qp_i is not None:
                fcfg = cfg.replace(qp=qp_i)
            bands, refs = be.encode_i(frames[poc], qp=qp_i)
            st = SliceType.I
            dpb[poc] = refs
        rbsp, recon, sse = _bands_to_slice(fcfg, bands, poc, st,
                                           with_recon,
                                           wp=(np.asarray(wp).ravel()
                                               .tolist()
                                               if wp is not None
                                               else None))
        nal = write_nal(NalType.IDR if st == SliceType.I
                        else NalType.TRAIL, rbsp)
        out.append(nal)
        if rc is not None:
            rc.update(8 * len(nal))
        per_poc[poc] = (nal, recon, sse)
        if kind != "B" and poc > 0:
            if cfg.gop_size > 1:
                for p in [p for p in dpb if p < poc - cfg.gop_size]:
                    del dpb[p]
            else:
                dpb = {poc: dpb[poc]}    # low-delay chain: latest only
    recons = [per_poc[p][1] for p in sorted(per_poc)
              if per_poc[p][1] is not None]
    frame_bits = [8 * len(per_poc[p][0]) for p in sorted(per_poc)]
    sses = [per_poc[p][2] for p in sorted(per_poc)]
    return EncodeResult(b"".join(out), recons, frame_bits, sse=sses)
