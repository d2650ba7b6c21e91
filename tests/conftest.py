"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware, and so
unit tests don't pay TPU compile latency.

Note: some environments pre-register a TPU backend via sitecustomize and
pin jax.config.jax_platforms; overriding the config (not just the env var)
is required.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
