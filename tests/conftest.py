"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the standard way to exercise jax.sharding/pjit code paths without TPU
hardware (SURVEY.md §4). The axon sitecustomize imports jax before pytest
loads this file, so the platform must be switched via jax.config (env vars
were already consumed).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
