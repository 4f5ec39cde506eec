"""Weak-scaling data-parallel efficiency benchmark (north-star: >=0.8 at N>=2).

The reference has nothing distributed (SURVEY.md §2.4); this framework's DP
story is batch sharding over the mesh's ``data`` axis.  This harness measures
weak-scaling efficiency: per-device batch held constant, throughput at N
devices vs N x the 1-device throughput.

    efficiency(N) = images_per_s(N) / (N * images_per_s(1))

On this development host only ONE real TPU chip is reachable, so the real
measurement runs when multi-chip hardware lands.  The harness itself is
validated on the CPU 8-virtual-device mesh (tests/test_scaling_bench.py):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py --model lenet --per-device-batch 8

Timing uses the same chained-scan + scalar-fetch + two-length-delta method
as bench.py (see its docstring for why naive timing lies on this host).
Prints ONE JSON line: {"metric": "dp_scaling_efficiency", "value": eff,
"unit": "fraction", "n_devices": N, ...}.
"""

from __future__ import annotations

import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure_sharded(model, x0, batch, k_short=2, k_long=10, tag=""):
    """img/s of a sharded model via bench.py's shared chained-scan timing."""
    from bench import measure_fwd
    from int8inferenceengine_tpu.parallel.sharding import sharded_forward

    return measure_fwd(sharded_forward(model), model._gather_params(),
                       x0, batch, tag, k_short=k_short, k_long=k_long)


def run_scaling(model_name="alexnet", per_device_batch=64, n_list=None,
                k_short=2, k_long=10):
    """Measure img/s at each device count; return {n: img_per_s}."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    from __graft_entry__ import _calibrated

    devs = jax.devices()
    if n_list is None:
        n_list = sorted({1, len(devs)})
    results = {}
    for n in n_list:
        mesh = make_mesh((n, 1), devices=devs[:n])
        model = models.build(model_name)
        model = _calibrated(model, model.INPUT_SHAPE)
        model.shard(mesh)
        batch = per_device_batch * n
        shape = (batch,) + tuple(model.INPUT_SHAPE)
        x = np.random.default_rng(0).uniform(-1, 1, shape).astype(np.float32)
        x0 = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        results[n] = _measure_sharded(model, x0, batch, k_short, k_long,
                                      tag=f"N={n}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="alexnet")
    ap.add_argument("--per-device-batch", type=int, default=64)
    args = ap.parse_args()

    import os

    import jax
    # This host pre-imports jax on the remote TPU platform, so the env var
    # alone is too late — honor JAX_PLATFORMS=cpu the documented way.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")

    n = len(jax.devices())
    log(f"backend: {jax.default_backend()}, {n} device(s)")
    if n < 2:
        log("only one device reachable — scaling needs N>=2; "
            "reporting the trivial N=1 point")
    results = run_scaling(args.model, args.per_device_batch)
    n_max = max(results)
    eff = results[n_max] / (n_max * results[1])
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction",
        "n_devices": n_max,
        "model": args.model,
        "per_device_batch": args.per_device_batch,
        "img_per_s": {str(k): round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
