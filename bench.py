"""Headline benchmark: AlexNet/CIFAR10-224 INT8 inference throughput.

Reproduces the reference's headline workload (README.md:26-41: 10,000
224x224 images through AlexNet, batched) on one TPU chip and reports
images/s. Baseline: the reference engine's best INT8 number, 10,000 images
in 36.6 s on an i9-9900K = 273.2 img/s (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N}
Extra detail (FP32 throughput, per-batch latency) goes to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_IMG_S = 10_000 / 36.6  # reference engine INT8, batch 100 (README.md:40)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from __graft_entry__ import _calibrated

    log("backend:", jax.default_backend(), jax.devices())

    batch = 256
    n_images = 10_000
    n_batches = (n_images + batch - 1) // batch

    model = _calibrated(models.build("alexnet"), models.AlexNet.INPUT_SHAPE)

    rng = np.random.default_rng(0)
    x_host = rng.uniform(-1, 1, (batch, 3, 224, 224)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_host))

    def step(data):
        return model(q.Tensor(data)).data

    # Warm up / compile.
    out = step(x)
    out.block_until_ready()
    log("compiled; output shape", out.shape)

    # Timed: n_batches dispatches of the same device-resident batch
    # (the reference times pure inference over pre-loaded batches,
    # AlexNet notebook cell 5).
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = step(x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs = n_batches * batch
    img_s = imgs / dt
    log(f"INT8: {imgs} images in {dt:.3f}s -> {img_s:.1f} img/s "
        f"({dt / n_batches * 1e3:.2f} ms/batch @ batch={batch})")

    print(json.dumps({
        "metric": "alexnet_cifar10_224_int8_throughput_1chip",
        "value": round(img_s, 1),
        "unit": "images/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
