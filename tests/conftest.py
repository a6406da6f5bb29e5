"""Test configuration: run JAX on a virtual 8-device CPU mesh so that
multi-chip sharding tests work without TPU hardware (the real-TPU path is
identical code under `jax.jit` + `Mesh`).

Note: pytest plugins (jaxtyping) import jax before this conftest runs, and
the axon TPU-tunnel sitecustomize has already set jax_platforms to the remote
TPU. Backends initialize lazily, so overriding the config here — before any
test touches a device — still wins.
"""

import os
import sys
from pathlib import Path

os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by pytest plugins anyway)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
