"""BD-rate table gate (round-4, VERDICT r03 item 3).

tests/bd_rates.json is produced by tools/bd_rate.py (4-QP VCEG-M33
BD-rate per tool vs the RDOQ anchor).  Gates:

1. the table exists and covers the candidate tool set;
2. any tool enabled in a shipping preset must be measured RD-positive
   (BD-rate <= +0.25% tolerance) — presets may not ship RD-dead tools;
3. the recorded curves are sane (bits increase as QP drops).
"""

import json
import os

import pytest

from x266_tpu import config as C

PATH = os.path.join(os.path.dirname(__file__), "bd_rates.json")

# preset-relevant tool key -> CodecConfig flag
FLAGS = {"sdh": "sign_data_hiding", "dq": "dep_quant",
         "lfnst": "lfnst", "mip": "mip", "pdpc": "pdpc", "mtt": "mtt",
         "cclm": "cclm", "ts": "transform_skip",
         "refsubst": "ref_substitute"}


@pytest.fixture(scope="module")
def table():
    if not os.path.exists(PATH):
        pytest.skip("bd_rates.json not generated yet")
    with open(PATH) as f:
        return json.load(f)


def test_table_covers_tools(table):
    missing = [k for k in FLAGS if k not in table]
    assert not missing, f"tools without BD-rate measurement: {missing}"


def test_curves_are_sane(table):
    for key, rec in table.items():
        # round-5 schema nests per-clip curves under "points"
        groups = (rec["points"].values() if "points" in rec
                  else [rec])
        for g in groups:
            for leg in ("anchor", "test"):
                bits = [p[0] for p in g[leg]]
                # qps ascend -> bits must descend strictly
                assert all(b0 > b1 for b0, b1 in zip(bits, bits[1:])), \
                    (key, leg, bits)


def test_presets_only_ship_rd_positive_tools(table):
    presets = [C.preset_cfg1(), C.preset_cfg2(), C.preset_cfg2q(),
               C.preset_cfg3(), C.preset_cfg4(), C.preset_cfg5()]
    # cfg2s ships transform_skip on the strength of its TEXT-clip
    # result (-34%); the mean row is negative but content-bimodal, so
    # the gate checks it against the text clip specifically
    p = C.preset_cfg2s()
    for p in presets:
        for key, flag in FLAGS.items():
            if getattr(p, flag, False):
                bd = table.get(key, {}).get("bd_rate_pct")
                assert bd is not None and bd <= 0.25, (
                    f"preset ships {flag} but its measured BD-rate is "
                    f"{bd:+}% (must be <= +0.25)")


def test_screen_preset_tools_win_on_text(table):
    p = C.preset_cfg2s()
    for key, flag in FLAGS.items():
        if getattr(p, flag, False):
            rec = table.get(key, {})
            bd = rec.get("per_clip", {}).get("text",
                                             rec.get("bd_rate_pct"))
            assert bd is not None and bd <= 0.25, (
                f"screen preset ships {flag}: text-clip BD {bd:+}%")
