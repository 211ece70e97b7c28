"""Test env: force JAX onto CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware, and exact fp32 matmuls so golden comparisons
against torch/numpy hold.

The axon sitecustomize registers the TPU plugin at interpreter start —
before this conftest runs — so env vars alone are NOT enough here: the
backend and precision must be forced through jax.config (backend init is
lazy, so this still lands in time).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
