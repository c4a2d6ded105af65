"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip)."""
import os

# Force CPU regardless of ambient JAX_PLATFORMS (the session exports
# JAX_PLATFORMS=axon for the real chip; tests must be deterministic f32).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
