import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. The environment may pre-register a TPU
# plugin that overrides JAX_PLATFORMS, so we also force the platform through
# jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is dominated by XLA:CPU compiles of
# full-model fixtures (~40 min cold); re-runs hit the cache and drop to
# minutes. The cache dir is local and gitignored; a cold machine just pays
# the normal compile. Opt out with PROSIM_TPU_NO_TEST_CACHE=1.
if not os.environ.get("PROSIM_TPU_NO_TEST_CACHE"):
    _cache = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
