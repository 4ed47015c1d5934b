"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding tests follow SURVEY.md §4's recommended distributed strategy:
`--xla_force_host_platform_device_count=8` fakes an 8-chip slice on CPU so
`shard_map`/`pjit` programs compile and execute without TPU hardware.

Note: this environment's sitecustomize registers an external TPU backend and
forces `jax_platforms` at interpreter start, so we override via jax.config
(env vars alone are ignored by then).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
