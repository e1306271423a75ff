"""Test harness config (SURVEY.md §4).

Forces the CPU backend with an 8-device virtual mesh BEFORE any test code
touches jax, so distributed/sharding tests run without TPU hardware (the
driver separately dry-runs the multi-chip path via __graft_entry__).

NOTE: the JAX_PLATFORMS *environment variable* is ignored in this image
(the 'axon' TPU plugin still registers); only the config API works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles >100 distinct graphs;
# caching them (a) cuts repeat-run time from ~15 min to ~2 min and
# (b) sidesteps a rare XLA-CPU compiler segfault seen after many
# compilations accumulate in one process.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


# In-process defense against the XLA-CPU accumulation segfault: drop
# live executables periodically (disk cache makes re-loads cheap).
import pytest  # noqa: E402

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 5 == 0:
        jax.clear_caches()


# Smoke tier (`pytest -m smoke`, <5 min warm-cache): the bit-exactness
# gates every commit must keep green — encode->decode round trip, halo
# exchange == clamped-slice oracle, native/Python entropy differential,
# golden-bitstream decode, and one sharded-tiles==serial identity.
_SMOKE_MODULES = {
    "test_roundtrip", "test_halo", "test_native_entropy", "test_bitio",
    "test_fixtures",
}
_SMOKE_TESTS = {
    "test_tiles2d_sharded_2x2_equals_serial",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SMOKE_MODULES
                or item.name.split("[")[0] in _SMOKE_TESTS):
            item.add_marker(pytest.mark.smoke)
