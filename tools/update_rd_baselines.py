"""Regenerate tests/rd_baselines.json from the current encoder.

Run after an INTENTIONAL RD improvement; the diff shows the gains.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from x266_tpu.utils import rd

    out = {}
    for name, cfg in rd.rd_configs().items():
        out[name] = rd.measure(name, cfg)
        print(name, out[name])
    with open(rd.baselines_path(), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote", rd.baselines_path())


if __name__ == "__main__":
    main()
