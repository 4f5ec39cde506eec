"""bench_scaling harness mechanics on the CPU 8-virtual-device mesh.

The real scaling-efficiency measurement needs N>=2 TPU chips (north star:
>=0.8); here we validate that the harness shards, runs, and produces finite
throughput at N=1 vs N=8 on virtual devices (absolute numbers meaningless).
"""

import sys

import jax
import pytest


def test_run_scaling_cpu_mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device conftest environment")
    sys.path.insert(0, "/root/repo")
    from bench_scaling import run_scaling

    results = run_scaling("lenet", per_device_batch=4, n_list=[1, 8],
                          k_short=1, k_long=3)
    assert set(results) == {1, 8}
    assert all(v > 0 for v in results.values())
