#!/bin/bash
# Prime the persistent XLA compile cache (.jax_cache) by running the test
# suite file-by-file in SEPARATE processes.  Rationale: the XLA CPU
# compiler in this image segfaults after ~130 compilations accumulate in
# one process; per-file processes stay below that, and once every graph
# is cached the normal single-process `pytest tests/` run compiles
# nothing and is immune.  Safe to re-run; cached entries are skipped.
set -u
cd "$(dirname "$0")/.."
for f in tests/test_*.py; do
    echo "=== priming $f"
    timeout 1500 python -m pytest "$f" -q 2>&1 | tail -1
done
echo "cache entries: $(ls .jax_cache | wc -l)"
