"""Bit-exactness of the Pallas recon kernel vs the XLA scan (C6/C10-C12).

engine.recon_pallas must reproduce engine.recon.make_recon_pass_raw
EXACTLY (recon planes and coefficient planes) for every profile/tool
combination — it is a normative-path implementation swap, so equality is
the whole contract.  Runs in interpret mode on the CPU backend.
"""

import numpy as np
import pytest

from x266_tpu.config import CodecConfig, Profile
from x266_tpu.engine.mode_decision import (make_mode_decision,
                                           make_mts_select, pad_plane)
from x266_tpu.engine.recon import make_recon_pass
from x266_tpu.engine.recon_pallas import make_recon_pallas_raw

import jax


def _frame(w, h, seed):
    rng = np.random.default_rng(seed)
    # Mix of gradient + noise so mode decision picks varied sizes/modes.
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2) // 4 % 256).astype(np.uint8)
    y = np.clip(y.astype(np.int32)
                + rng.integers(-24, 25, (h, w)), 0, 255).astype(np.uint8)
    cb = np.clip(128 + (xx[::2, ::2] % 64) - 32
                 + rng.integers(-10, 11, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] % 48) + 24
                 + rng.integers(-10, 11, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    return y, cb, cr


CFGS = [
    CodecConfig(width=104, height=72, qp=30),
    CodecConfig(width=128, height=64, qp=37, profile=Profile.VVC, mts=True),
    CodecConfig(width=104, height=72, qp=30, lossless=True),
    CodecConfig(width=64, height=64, qp=22, max_cu_size=16),
    CodecConfig(width=128, height=64, qp=30, profile=Profile.VVC,
                mts=True, pdpc=True, rdoq=True),
    CodecConfig(width=104, height=72, qp=30, transform_skip=True),
    CodecConfig(width=128, height=64, qp=30, profile=Profile.VVC,
                mts=True, pdpc=True, rdoq=True, ref_substitute=True),
    CodecConfig(width=104, height=72, qp=30, ref_substitute=True),
]


@pytest.mark.parametrize("cfg", CFGS, ids=lambda c: (
    f"{c.width}x{c.height}-qp{c.qp}"
    f"{'-mts' if c.mts else ''}{'-ll' if c.lossless else ''}"
    f"{'-pdpc' if c.pdpc else ''}{'-rdoq' if c.rdoq else ''}"
    f"{'-ts' if c.transform_skip else ''}"
    f"{'-subst' if c.ref_substitute else ''}"
    f"-cu{c.max_cu_size}"))
def test_encode_matches_scan(cfg):
    y, cb, cr = _frame(cfg.width, cfg.height, seed=7)
    yP = pad_plane(y).astype(np.int32)
    cbP = pad_plane(cb).astype(np.int32)
    crP = pad_plane(cr).astype(np.int32)
    size_map, mode_map = make_mode_decision(cfg)(yP)
    if cfg.mts:
        mts_map = make_mts_select(cfg)(yP, size_map, mode_map)
    else:
        mts_map = np.zeros_like(np.asarray(size_map))

    ref = make_recon_pass(cfg, encode=True)(yP, cbP, crP, size_map,
                                            mode_map, mts_map)
    got = jax.jit(make_recon_pallas_raw(cfg, encode=True))(
        yP, cbP, crP, size_map, mode_map, mts_map)

    names = ["reconY", "reconCb", "reconCr", "coefY", "coefCb", "coefCr"]
    for n, r, g in zip(names, ref, got):
        r = np.asarray(r)
        g = np.asarray(g)
        bad = np.argwhere(r != g)
        assert bad.size == 0, (
            f"{n}: {bad.shape[0]} mismatches, first at {bad[:5].tolist()} "
            f"ref={r[tuple(bad[0])]}, got={g[tuple(bad[0])]}")


PCFGS = [
    CodecConfig(width=112, height=80, qp=30, intra_period=8),
    CodecConfig(width=128, height=64, qp=35, intra_period=8,
                lossless=False, max_cu_size=16),
    CodecConfig(width=112, height=80, qp=30, intra_period=8,
                merge_cands=True),
    CodecConfig(width=112, height=80, qp=30, intra_period=8,
                ref_substitute=True),
]


@pytest.mark.parametrize("cfg", PCFGS, ids=lambda c: (
    f"{c.width}x{c.height}-qp{c.qp}-cu{c.max_cu_size}"
    f"{'-merge' if c.merge_cands else ''}"
    f"{'-subst' if c.ref_substitute else ''}"))
def test_inter_matches_scan(cfg):
    """P-picture recon: Pallas kernel == XLA scan (incl. derived skip
    MVs, MC, and the final MV map outputs)."""
    from x266_tpu.engine import fused
    from x266_tpu.engine.inter import (make_mode_decision_p_raw,
                                       make_recon_inter_raw)
    from x266_tpu.engine.recon_pallas import make_recon_inter_pallas_raw

    w, h = cfg.width, cfg.height
    y0, cb0, cr0 = _frame(w, h, seed=3)
    # reference pyramids from a shifted variant of the frame (gives ME
    # real motion to find -> a mix of intra/inter/skip CUs)
    yr = np.roll(y0, (2, -3), axis=(0, 1))
    cbr = np.roll(cb0, (1, -1), axis=(0, 1))
    crr = np.roll(cr0, (1, -1), axis=(0, 1))
    import jax.numpy as jnp
    pyr_y, pyr_cb, pyr_cr = jax.jit(
        lambda a, b, c: fused._build_pyramids_device(
            a.astype(jnp.int32), b.astype(jnp.int32),
            c.astype(jnp.int32)))(yr, cbr, crr)

    yP = pad_plane(y0).astype(np.int32)
    cbP = pad_plane(cb0).astype(np.int32)
    crP = pad_plane(cr0).astype(np.int32)
    maps = jax.jit(make_mode_decision_p_raw(cfg))(yP, pyr_y)
    size_map, mode_map, pred_map, mvx_map, mvy_map = [
        np.asarray(m) for m in maps]
    assert (pred_map > 0).any(), "test setup: no inter CUs chosen"
    mts_map = np.zeros_like(size_map)

    args = (yP, cbP, crP, size_map, mode_map, mts_map, pred_map,
            mvx_map, mvy_map, pyr_y, pyr_cb, pyr_cr)
    ref = jax.jit(make_recon_inter_raw(cfg, True))(*args)
    got = jax.jit(make_recon_inter_pallas_raw(cfg, True))(*args)
    names = ["reconY", "reconCb", "reconCr", "coefY", "coefCb",
             "coefCr", "mvx_fin", "mvy_fin"]
    for n, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        bad = np.argwhere(r != g)
        assert bad.size == 0, (
            f"{n}: {bad.shape[0]} diffs, first {bad[:4].tolist()} "
            f"ref={r[tuple(bad[0])]} got={g[tuple(bad[0])]}")

    # decode side: feed the encoder's coefficients back
    dargs = (np.asarray(ref[3]).astype(np.int32),
             np.asarray(ref[4]).astype(np.int32),
             np.asarray(ref[5]).astype(np.int32),
             size_map, mode_map, mts_map, pred_map,
             np.asarray(ref[6]).astype(np.int32),
             np.asarray(ref[7]).astype(np.int32),
             pyr_y, pyr_cb, pyr_cr)
    dref = jax.jit(make_recon_inter_raw(cfg, False))(*dargs)
    dgot = jax.jit(make_recon_inter_pallas_raw(cfg, False))(*dargs)
    for n, r, g in zip(names[:3], dref[:3], dgot[:3]):
        assert (np.asarray(r) == np.asarray(g)).all(), f"decode {n}"


def test_inter_b_matches_scan():
    """B-picture recon (L0/L1/bi/skip): Pallas kernel == XLA scan."""
    from x266_tpu.engine import fused
    from x266_tpu.engine.inter import (make_mode_decision_b_raw,
                                       make_recon_inter_raw)
    from x266_tpu.engine.recon_pallas import make_recon_inter_pallas_raw
    import jax.numpy as jnp

    cfg = CodecConfig(width=112, height=80, qp=30, intra_period=8,
                      gop_size=4)
    w, h = cfg.width, cfg.height
    y0, cb0, cr0 = _frame(w, h, seed=21)

    def pyrs(y, cb, cr):
        return jax.jit(lambda a, b, c: fused._build_pyramids_device(
            a.astype(jnp.int32), b.astype(jnp.int32),
            c.astype(jnp.int32)))(y, cb, cr)

    p0 = pyrs(np.roll(y0, (2, -3), (0, 1)), np.roll(cb0, 1, 0),
              np.roll(cr0, 1, 0))
    p1 = pyrs(np.roll(y0, (-1, 2), (0, 1)), np.roll(cb0, -1, 1),
              np.roll(cr0, -1, 1))

    yP = pad_plane(y0).astype(np.int32)
    cbP = pad_plane(cb0).astype(np.int32)
    crP = pad_plane(cr0).astype(np.int32)
    maps = jax.jit(make_mode_decision_b_raw(cfg))(yP, p0[0], p1[0])
    maps = [np.asarray(m) for m in maps]
    kinds = maps[2]
    assert (kinds == 3).any() or (kinds == 4).any(), \
        "test setup: no L1/bi CUs chosen"
    mts_map = np.zeros_like(maps[0])

    args = (yP, cbP, crP, maps[0], maps[1], mts_map, maps[2], maps[3],
            maps[4], *p0, *p1, maps[5], maps[6])
    ref = jax.jit(make_recon_inter_raw(cfg, True, b_mode=True))(*args)
    got = jax.jit(make_recon_inter_pallas_raw(cfg, True, b_mode=True)
                  )(*args)
    names = ["reconY", "reconCb", "reconCr", "coefY", "coefCb",
             "coefCr", "mvx_fin", "mvy_fin"]
    for n, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        bad = np.argwhere(r != g)
        assert bad.size == 0, (
            f"{n}: {bad.shape[0]} diffs, first {bad[:4].tolist()} "
            f"ref={r[tuple(bad[0])]} got={g[tuple(bad[0])]}")

    # decode side
    dargs = (np.asarray(ref[3]).astype(np.int32),
             np.asarray(ref[4]).astype(np.int32),
             np.asarray(ref[5]).astype(np.int32),
             maps[0], maps[1], mts_map, maps[2],
             np.asarray(ref[6]).astype(np.int32),
             np.asarray(ref[7]).astype(np.int32),
             *p0, *p1, maps[5], maps[6])
    dref = jax.jit(make_recon_inter_raw(cfg, False, b_mode=True))(*dargs)
    dgot = jax.jit(make_recon_inter_pallas_raw(cfg, False, b_mode=True)
                   )(*dargs)
    for n, r, g in zip(names[:3], dref[:3], dgot[:3]):
        assert (np.asarray(r) == np.asarray(g)).all(), f"decode {n}"


@pytest.mark.parametrize("cfg", CFGS[:3], ids=lambda c: (
    f"{c.width}x{c.height}{'-mts' if c.mts else ''}"
    f"{'-ll' if c.lossless else ''}"))
def test_decode_matches_scan(cfg):
    y, cb, cr = _frame(cfg.width, cfg.height, seed=11)
    yP = pad_plane(y).astype(np.int32)
    cbP = pad_plane(cb).astype(np.int32)
    crP = pad_plane(cr).astype(np.int32)
    size_map, mode_map = make_mode_decision(cfg)(yP)
    if cfg.mts:
        mts_map = make_mts_select(cfg)(yP, size_map, mode_map)
    else:
        mts_map = np.zeros_like(np.asarray(size_map))
    enc = make_recon_pass(cfg, encode=True)(yP, cbP, crP, size_map,
                                            mode_map, mts_map)
    cY = np.asarray(enc[3]).astype(np.int32)
    cCb = np.asarray(enc[4]).astype(np.int32)
    cCr = np.asarray(enc[5]).astype(np.int32)

    ref = make_recon_pass(cfg, encode=False)(cY, cCb, cCr, size_map,
                                             mode_map, mts_map)
    got = jax.jit(make_recon_pallas_raw(cfg, encode=False))(
        cY, cCb, cCr, size_map, mode_map, mts_map)
    for n, r, g in zip(["reconY", "reconCb", "reconCr"], ref[:3], got[:3]):
        assert (np.asarray(r) == np.asarray(g)).all(), f"{n} mismatch"


def test_subst_availability_is_contiguous():
    """The Pallas substitution relies on availability being ONE
    contiguous run along the substitution scan (left bottom->top,
    corner, top left->right) — property-check the z-order tables."""
    from x266_tpu.engine.availability import ref_masks
    from x266_tpu.kernels.intra import _subst_perm

    for (w, h) in ((104, 72), (128, 64), (192, 192)):
        for s in (4, 8, 16, 32):
            for scale in (1, 2):
                if scale == 2 and s == 32:
                    continue
                m = ref_masks(w, h, s, scale=scale)
                perm, _ = _subst_perm(s)
                scan = m.reshape(-1, m.shape[-1])[:, perm]
                # one contiguous run per block: at most one 0->1 edge
                edges = (scan[:, 1:].astype(int)
                         - scan[:, :-1].astype(int) == 1).sum(axis=1)
                assert (edges <= 1).all(), (w, h, s, scale)
