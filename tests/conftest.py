"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip).

NOTE: this environment's sitecustomize registers the 'axon' TPU platform and
forces ``jax_platforms`` via jax.config.update, which overrides the
JAX_PLATFORMS env var — so we must counter-update the config here (conftest
imports before any test imports jax arrays).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
