"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the `axon` TPU-tunnel platform and
sets JAX_PLATFORMS=axon, so plain env vars are not enough — we override the
platform via jax.config before any backend initializes. Tests therefore
always run on CPU with 8 virtual devices, which exercises the same mesh /
collective code paths as a real 8-chip slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
