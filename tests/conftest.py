"""Test harness: run on CPU with 8 virtual devices.

The suite is hardware-independent: Pallas kernels run in interpret mode,
the quantized compute paths use the XLA backend (identical semantics), and
sharding tests use an 8-device virtual CPU mesh — the driver separately
dry-run-compiles the multi-chip path and benches on real TPU.

NOTE: this host pre-imports jax via a sitecustomize that registers a remote
TPU platform, so env vars alone are too late — we must flip the platform via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1234)
