"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
without a pod (the pattern SURVEY.md §4(e) prescribes).

The ambient environment may pin JAX to a tunneled TPU (JAX_PLATFORMS=axon)
*and* import jax at interpreter startup via sitecustomize, so setting env vars
here is not enough — we must also update jax.config before any backend use.
The TPU is the bench target (bench.py), never the test target.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the 2-core host spends most of the tier's wall
# time in XLA:CPU compiles; cached executables make re-runs warm. Must go
# through jax.config (sitecustomize pre-imports jax, so env is too late).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults in backend_compile after ~60+ accumulated compiled
    executables in one process (reproducible at tests/test_sha256.py when the
    full tier runs, absent in isolation). Dropping the jit caches between
    modules bounds the accumulation; each module mostly compiles its own
    shapes, so the recompile cost is small."""
    yield
    jax.clear_caches()
