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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices share ONE host core here: a collective's slowest
    # "device" can miss the default rendezvous deadline under load, and
    # XLA:CPU then ABORTS the process ("Fatal Python error: Aborted",
    # observed on the scene-shard all_gather whenever another process
    # competed for the core).  Ten minutes makes the abort unreachable.
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
