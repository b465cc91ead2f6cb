"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip logic is testable without a TPU pod via
xla_force_host_platform_device_count (SURVEY.md §4). NOTE: this machine's
sitecustomize pre-imports jax with the axon TPU platform selected, so env
vars alone are too late — the platform must be overridden through
jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() >= 8, (
    "tests require the 8-device CPU mesh; got "
    f"{jax.device_count()} {jax.devices()[:2]}"
)
