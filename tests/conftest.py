"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run without TPU pods (SURVEY.md section 4 test plan (d)).

Note: the env var JAX_PLATFORMS alone is not enough on hosts with a
tunneled TPU plugin; jax.config.update must run before device init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
