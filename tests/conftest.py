"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

The container's sitecustomize registers the TPU PJRT plugin and pins
`jax_platforms` via jax.config (which takes precedence over the env var), so
we must override through jax.config as well.  Unit tests must be
deterministic float32 CPU — TPU matmuls default to bfloat16 precision, which
breaks the numerical parity assertions.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("DSS_TPU_INTERPRET", "1")  # Pallas kernels in interpret mode on CPU

import jax

jax.config.update("jax_platforms", "cpu")
