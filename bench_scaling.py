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
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure_sharded(model, x0, batch, k_short=2, k_long=10):
    """img/s of a sharded model via chained-scan delta timing."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from int8inferenceengine_tpu.parallel.sharding import sharded_forward

    fwd = sharded_forward(model)
    params = model._gather_params()

    def make_loop(k):
        @jax.jit
        def loop(params, x):
            def body(carry, _):
                out = fwd(params, carry)
                nxt = carry + 1e-12 * jnp.sum(out.astype(jnp.float32))
                return nxt, ()
            final, _ = lax.scan(body, x, None, length=k)
            return jnp.sum(final)
        return loop

    times = {}
    for k in (k_short, k_long):
        loop = make_loop(k)
        float(loop(params, x0))                      # compile + first run
        best = float("inf")
        for trial in range(2):
            x = x0 * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(loop(params, x))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per_batch = (times[k_long] - times[k_short]) / (k_long - k_short)
    if per_batch <= 0:
        # dispatch noise swamped the delta (shapes too small for this
        # device count) — fall back to the long-scan average
        log(f"  warning: non-positive scan delta ({per_batch:.2e}s); "
            f"using K={k_long} average instead")
        per_batch = times[k_long] / k_long
    return batch / per_batch


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
        model = _calibrated(models.build(model_name),
                            models.build(model_name).INPUT_SHAPE)
        model.shard(mesh)
        batch = per_device_batch * n
        shape = (batch,) + tuple(model.INPUT_SHAPE)
        x = np.random.default_rng(0).uniform(-1, 1, shape).astype(np.float32)
        x0 = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        img_s = _measure_sharded(model, x0, batch, k_short, k_long)
        log(f"N={n}: {img_s:.0f} img/s (batch {batch})")
        results[n] = img_s
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
