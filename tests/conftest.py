"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  The platform
override must go through ``jax.config`` (not just the env var): the axon
TPU plugin's sitecustomize re-registers itself into ``jax_platforms`` and
would otherwise win.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Cache compiled executables across test runs; the fused-step compiles
# dominate suite wall-time otherwise.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
