"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU pod.

This environment registers the TPU plugin from a sitecustomize module at
interpreter startup, so JAX_PLATFORMS set here comes too late; force the
platform through jax.config before any backend is initialized instead.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
