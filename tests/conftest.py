import os
import sys

# The container's sitecustomize imports jax and registers the axon TPU
# backend before conftest runs, so JAX_PLATFORMS in os.environ is already
# baked.  Route tests to a virtual 8-device CPU mesh via the live config
# instead: the CPU client is created lazily at the first jax op, so the
# platform override and XLA_FLAGS below still take effect.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
