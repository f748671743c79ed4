"""Test env: force CPU with 8 virtual devices so Mesh/sharding paths are
exercised without TPU hardware (SURVEY.md §4 item 6). Must run before the
first `import jax` in the test process.

Note: this image's sitecustomize registers an 'axon' TPU PJRT plugin and
pins JAX_PLATFORMS=axon via jax.config, so the env var alone is not enough
— we must override through jax.config after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
