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
