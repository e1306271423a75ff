"""Subprocess isolation for compile-storm tests (SURVEY §4 harness).

A handful of tests compile many distinct XLA graphs in one process (the
rate-control tests trace a fresh device step per QP).  After enough
executables accumulate, XLA-CPU can SIGSEGV inside the compilation-cache
read path (observed reproducibly in round 3: `pytest
tests/test_ratecontrol.py` alone crashed on the 4th test while the same
test passed in isolation).  Rather than let one jax/XLA bug kill every
full-suite run, those tests re-execute themselves in a fresh
interpreter: the parent pytest process never accumulates their graphs.

Usage, first line of the test body::

    def test_heavy():
        if run_isolated("tests/test_file.py::test_heavy"):
            return
        ...real body...

The child runs the SAME test (env guard breaks the recursion) and shares
the persistent compilation cache, so the isolated run costs one process
start, not a recompile.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_GUARD = "X266T_ISOLATED"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_isolated(test_id: str, timeout: float = 1200.0) -> bool:
    """Run `test_id` in a fresh interpreter unless we already are one.

    Returns True in the parent (body must be skipped; failure in the
    child is re-raised as a pytest failure here), False in the child
    (body must run normally).
    """
    if os.environ.get(_GUARD) == "1":
        return False
    env = dict(os.environ, **{_GUARD: "1"})
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", test_id],
        env=env, capture_output=True, text=True, cwd=_REPO,
        timeout=timeout)
    if proc.returncode != 0:
        pytest.fail(
            f"isolated run of {test_id} failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-3000:]}\n{proc.stderr[-1500:]}",
            pytrace=False)
    return True
