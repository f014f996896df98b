"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and pins ``JAX_PLATFORMS=axon`` in the environment, so
plain env-var overrides here are too late.  Backend *resolution* is lazy,
though: updating ``jax_platforms`` via the config API before any device is
touched reliably lands the tests on CPU.  XLA_FLAGS must be set before the
CPU client is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
