"""Driver-config presets (BASELINE.json:6-12) instantiate and are
internally consistent."""

from x266_tpu.config import (CodecConfig, Profile, preset_cfg1,
                             preset_cfg2, preset_cfg3, preset_cfg4,
                             preset_cfg5)


def test_presets():
    c1 = preset_cfg1()
    assert (c1.width, c1.height) == (416, 240) and c1.intra_period == 1
    c2 = preset_cfg2()
    assert c2.profile == Profile.VVC and c2.mts
    assert c2.n_intra_modes == 67
    c3 = preset_cfg3()
    assert c3.intra_period > 1
    c4 = preset_cfg4()
    assert c4.deblock and c4.sao and c4.alf and c4.width == 3840
    assert c4.gop_size == 16    # random-access GOP-16 (BASELINE.json:10)
    c5 = preset_cfg5()
    assert c5.rows_per_segment == 1


def test_geometry_props():
    cfg = CodecConfig(width=416, height=240)
    assert cfg.ctus_x == 7 and cfg.ctus_y == 4
    assert cfg.units_x == 52 and cfg.units_y == 30
    cfg2 = CodecConfig(width=128, height=192, tile_rows=1)
    assert cfg2.num_tiles == 3
    assert cfg2.tile_bands() == [(0, 64), (64, 128), (128, 192)]
    assert cfg2.tile_cfg((0, 64)).height == 64
