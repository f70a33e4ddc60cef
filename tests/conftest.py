"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  This must be
set before jax initializes, hence the env mutation at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
