"""Golden-bitstream decode gate (SURVEY.md §4 conformance row;
FORMAT.md §10: the internal decoder is the normative oracle, so the
format's stability is guarded by decoding CHECKED-IN streams).

Each fixture under tests/fixtures/ was written by tools/make_fixtures.py
at a known-good commit; decoding it must keep producing the recorded
per-frame MD5s.  A normative change that breaks old streams fails here
— regenerate deliberately (and say so in the commit) when the format
version moves.  Part of the smoke tier.
"""

import json
import os

import pytest

from x266_tpu.api import Decoder
from x266_tpu.core.hashing import frame_md5

DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _manifest():
    p = os.path.join(DIR, "manifest.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(_manifest()) or ["__none__"])
def test_golden_stream_decodes_identically(name):
    man = _manifest()
    if not man:
        pytest.skip("fixture corpus not generated "
                    "(tools/make_fixtures.py)")
    rec = man[name]
    with open(os.path.join(DIR, f"{name}.266t"), "rb") as f:
        stream = f.read()
    assert len(stream) == rec["bytes"], "fixture file corrupted"
    _, frames = Decoder().decode(stream)
    assert len(frames) == rec["frames"]
    got = [frame_md5(fr) for fr in frames]
    assert got == rec["md5"], (
        f"golden stream {name} no longer decodes to its recorded "
        "reconstruction — a normative format change broke old "
        "streams.  If intentional, regenerate via "
        "tools/make_fixtures.py and commit the new corpus.")
