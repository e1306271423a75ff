"""RD regression gate (SURVEY.md §4): every config shape must stay on
or above its stored (bits, PSNR) baseline — Pareto rule in utils.rd.

On an intentional improvement, refresh the stored numbers with
tools/update_rd_baselines.py and commit the diff (it documents the
gain)."""

import pytest

from x266_tpu.utils import rd


@pytest.mark.parametrize("name", sorted(rd.rd_configs()))
def test_rd_no_regression(name):
    base = rd.load_baselines()
    assert name in base, (
        f"no baseline for {name}: run tools/update_rd_baselines.py")
    cur = rd.measure(name, rd.rd_configs()[name])
    msg = rd.check(cur, base[name])
    assert msg is None, f"{name}: {msg}"
    # surface strictly-better results so baselines get ratcheted
    if (cur["bits"] < base[name]["bits"] * 0.98
            and cur["psnr_y"] > base[name]["psnr_y"] - 0.02):
        print(f"{name}: improved vs baseline {base[name]} -> {cur}; "
              "consider tools/update_rd_baselines.py")
