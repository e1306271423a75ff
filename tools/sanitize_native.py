"""Sanitizer job for the native entropy engine (SURVEY.md §5
"sanitizers" row).

Builds ``cabac/native/rangecoder.cpp`` with UBSan (and ASan when the
runtime is preloadable) via the X266T_SANITIZE hook in
``cabac.native_bind``, then drives the differential entropy tests —
the highest-coverage exercise of the C++ walker (random maps, biased
bin streams, truncated payloads, every slice type) — and fails on any
sanitizer report.

Usage:  python tools/sanitize_native.py            # ubsan (+asan if found)
        python tools/sanitize_native.py ubsan      # one mode only
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TESTS = [
    "tests/test_native_entropy.py",
    "tests/test_sao.py::test_syntax_roundtrip_with_sao",
    "tests/test_sao.py::test_syntax_roundtrip_with_chroma_sao",
    "tests/test_vvc.py::test_mts_syntax_native_parity",
]


def _libasan() -> str | None:
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, check=True)
        path = out.stdout.strip()
        return path if os.path.sep in path and os.path.exists(path) \
            else None
    except subprocess.SubprocessError:
        return None


def run_mode(mode: str) -> bool:
    env = dict(os.environ, X266T_SANITIZE=mode, PYTHONPATH=REPO)
    if mode == "asan":
        lib = _libasan()
        if lib is None:
            print("asan: libasan.so not found, skipping")
            return True
        env["LD_PRELOAD"] = lib
        # the leak checker reports python's own allocations; we want
        # memory-error detection, not leak accounting of the host
        env["ASAN_OPTIONS"] = "detect_leaks=0"
    env["UBSAN_OPTIONS"] = "print_stacktrace=1"
    print(f"== sanitizer mode: {mode} ==", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", *TESTS],
        cwd=REPO, env=env)
    ok = r.returncode == 0
    print(f"== {mode}: {'PASS' if ok else 'FAIL'} ==", flush=True)
    return ok


def main() -> int:
    modes = sys.argv[1:] or ["ubsan", "asan"]
    return 0 if all(run_mode(m) for m in modes) else 1


if __name__ == "__main__":
    sys.exit(main())
