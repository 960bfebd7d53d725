"""Test configuration: force CPU JAX with a virtual 8-device mesh so
multi-chip sharding tests run on any host (SURVEY.md §4 takeaway).

Note: this environment may export JAX_PLATFORMS=axon (a tunneled TPU);
env-var overrides are unreliable there, so we use jax.config directly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.pop("JAX_PLATFORMS", None)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
