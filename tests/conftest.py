"""Test environment: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a host-platform mesh (the
reference has no distributed story; ours is tested per SURVEY.md §4d).

NOTE: this container's site hook imports jax at interpreter start and the
environment pins ``JAX_PLATFORMS`` to the real TPU (axon), so env vars set
here are too late — the platform must be overridden through
``jax.config.update``. ``XLA_FLAGS`` still works because the CPU backend is
not initialized until first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
