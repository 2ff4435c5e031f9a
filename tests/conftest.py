"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initialises its backends, which conftest
import order guarantees.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform via
# jax.config.jax_platforms = "axon,cpu"; override it back to cpu for tests
# (must happen before any backend is initialised).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
