"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests follow SURVEY.md section 4's implication (c):
sharded output must equal single-device output, runnable on CPU with
``--xla_force_host_platform_device_count=N``.  The container's sitecustomize
force-registers the axon TPU platform and overrides JAX_PLATFORMS, so we
re-update the config here before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
