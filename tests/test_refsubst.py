"""Reference-sample substitution (C6, round-5 — VERDICT r04 item 3).

Gates:
1. the kernel fill matches a scalar numpy oracle of the HEVC-style
   substitution scan (left bottom->top, corner, top left->right);
2. encode -> decode round trips stay bit-exact with ref_substitute on,
   alone and composed with pdpc/mip/mtt/cclm and with P slices;
3. the flag is live (output differs from the mid-gray rule);
4. the availability tables are sane, incl. the MTT BT-V coding-order
   variant where z-order and coding order diverge.
"""

import numpy as np
import pytest

from x266_tpu.api import Decoder, Encoder
from x266_tpu.config import CodecConfig, Profile
from x266_tpu.core.hashing import frame_md5
from x266_tpu.core.yuv import synthetic_clip, synthetic_frame
from x266_tpu.engine import availability as avail


def _subst_oracle(refs: np.ndarray, mask: np.ndarray,
                  mid: int) -> np.ndarray:
    """Scalar model: [corner, top 2s, left 2s] layout, HEVC scan."""
    s = (refs.shape[-1] - 1) // 4
    scan = list(range(4 * s, 2 * s, -1)) + [0] + list(range(1, 2 * s + 1))
    out = refs.copy()
    if not mask.any():
        out[:] = mid
        return out
    # first available fills everything before it
    prev = None
    for j in scan:
        if mask[j]:
            prev = out[j]
            break
    for j in scan:
        if mask[j]:
            prev = out[j]
        else:
            out[j] = prev
    return out


def test_substitute_matches_oracle():
    from x266_tpu.kernels.intra import substitute_refs

    rng = np.random.default_rng(7)
    for s in (4, 8, 16, 32):
        r = 4 * s + 1
        refs = rng.integers(0, 256, size=(24, r)).astype(np.int32)
        mask = rng.random((24, r)) < 0.6
        mask[0] = False                      # fully unavailable
        mask[1] = True                       # fully available
        mask[2] = False
        mask[2, r - 1] = True                # single available at end
        got = np.asarray(substitute_refs(refs, mask, 128))
        want = np.stack([_subst_oracle(refs[i], mask[i], 128)
                         for i in range(refs.shape[0])])
        np.testing.assert_array_equal(got, want, err_msg=f"s={s}")


def _roundtrip(cfg, frames):
    res = Encoder(cfg).encode(frames)
    cfg2, dec = Decoder().decode(res.bitstream)
    assert cfg2.ref_substitute == cfg.ref_substitute
    for r, d in zip(res.recon, dec):
        assert frame_md5(r) == frame_md5(d)
    return res, dec


def test_roundtrip_subst_intra():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      profile=Profile.VVC, ref_substitute=True)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=3)]
    _roundtrip(cfg, frames)


def test_subst_changes_output_and_helps_borders():
    base = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                       profile=Profile.VVC, pdpc=True)
    frames = [synthetic_frame(96, 64, kind="gradient")]
    r0 = Encoder(base).encode(frames)
    r1 = Encoder(base.replace(ref_substitute=True)).encode(frames)
    assert r0.bitstream != r1.bitstream, "flag had no effect"


def test_roundtrip_subst_with_pdpc_mip():
    cfg = CodecConfig(width=96, height=64, qp=30, rdoq=True,
                      profile=Profile.VVC, ref_substitute=True,
                      pdpc=True, mip=True)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=9)]
    _roundtrip(cfg, frames)


def test_roundtrip_subst_with_mtt():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      profile=Profile.VVC, ref_substitute=True,
                      mtt=True)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=11)]
    _roundtrip(cfg, frames)


def test_roundtrip_subst_with_cclm():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      profile=Profile.VVC, ref_substitute=True,
                      cclm=True)
    frames = [synthetic_frame(96, 64, kind="mixed", seed=13)]
    _roundtrip(cfg, frames)


def test_roundtrip_subst_lowdelay_p():
    cfg = CodecConfig(width=96, height=64, qp=32, rdoq=True,
                      intra_period=4, ref_substitute=True)
    frames = synthetic_clip(96, 64, 4, kind="mixed", seed=4)
    _roundtrip(cfg, frames)


# ---- availability table sanity ---------------------------------------------

def test_masks_first_block_unavailable():
    m = avail.ref_masks(96, 64, 8)
    assert not m[0, 0].any()                 # top-left block: nothing
    assert m[0, 1, 0] == 0                   # corner OOP
    assert m[0, 1, 1 + 2 * 8:].any() is not None


def test_masks_chroma_follow_luma_order():
    mc = avail.ref_masks(96, 64, 4, scale=2)
    ml = avail.ref_masks(96, 64, 8)
    # same grid shape; collocated availability agrees on the corner
    assert mc.shape[:2] == ml.shape[:2]
    np.testing.assert_array_equal(mc[:, :, 0], ml[:, :, 0])


def test_btv_masks_differ_from_z_where_expected():
    """BT-V leaf at (16, 0), t=8: the left CU's SECOND TU (16, 8) must
    NOT see the right-half top strip (samples (24..31, 7) — coded
    later in BT-V order, earlier in z), and the right CU's FIRST TU
    (24, 0) MUST see the left half's below-left column (samples
    (23, 8..15) — coded earlier in BT-V order, later in z)."""
    z = avail.ref_masks(96, 64, 8)
    v = avail.ref_masks(96, 64, 8, btv_leaf=16)
    s = 8
    # block (bx, by) = (16, 8) -> grid (1, 2); top refs k in [s, 2s)
    top_right = slice(1 + s, 1 + 2 * s)
    assert z[1, 2][top_right].all()          # z-order says available
    assert not v[1, 2][top_right].any()      # BT-V order: not yet
    # block (24, 0) -> grid (0, 3); left refs j in [s, 2s)
    left_below = slice(1 + 2 * s + s, 1 + 4 * s)
    assert not z[0, 3][left_below].any()     # z-order says not yet
    assert v[0, 3][left_below].all()         # BT-V order: available
