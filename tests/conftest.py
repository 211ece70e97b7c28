"""Test env: force JAX onto CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware. Must run before any jax import."""
import os

# Blank PALLAS_AXON_POOL_IPS so the axon sitecustomize skips TPU
# registration; otherwise JAX_PLATFORMS=cpu is overridden.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
