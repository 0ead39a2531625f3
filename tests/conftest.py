"""Test configuration: force JAX onto a virtual 8-device CPU mesh so tests
run anywhere (the multi-chip sharding analogue of the reference's
single-machine functional tests, SURVEY.md §4).

The runtime environment pins jax.config.jax_platforms to the tunneled
real-TPU platform ("axon,cpu") in a way that ignores JAX_PLATFORMS, so the
config must be updated explicitly after import. Benchmarks (bench.py) use
the real chip; tests use the virtual CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
