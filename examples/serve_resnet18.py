"""Quantize-once, serve-forever: ResNet-18 + checkpoint + continuous batching.

The production deployment shape the reference can't do (it re-calibrates
every process and serves nothing — SURVEY.md §5): calibrate offline, persist
the quantized artifact, then serve concurrent variable-size requests through
the continuous-batching engine.

Run:  python examples/serve_resnet18.py
"""

import sys
import functools
print = functools.partial(print, flush=True)
import threading
import time

import numpy as np

sys.path.insert(0, ".")
import int8inferenceengine_tpu as q  # noqa: E402
from int8inferenceengine_tpu import QuantConfig, models, utils  # noqa: E402
from int8inferenceengine_tpu.serve import InferenceEngine  # noqa: E402

CKPT = "/tmp/resnet18_int8.npz"
CFG = QuantConfig(weight_per_channel=True)


def quantize_offline():
    print("== offline: load -> calibrate -> convert -> save ==")
    tnet = models.torch_twin("resnet18")
    net = models.build("resnet18", config=CFG)
    net.load(tnet.state_dict())
    net.prepare()
    net(q.tensor(np.random.default_rng(0).uniform(
        -1, 1, (32, 3, 64, 64)).astype(np.float32)))
    net.convert()
    utils.save(net, CKPT)
    print(f"   saved quantized artifact -> {CKPT}")


def serve():
    print("== serving: load quantized artifact, no calibration ==")
    net = models.build("resnet18", config=CFG)
    utils.load(net, CKPT)
    # quantize_ingest: batches are quantized (and first-conv space-to-depth
    # pre-laid-out) on the host — 1/4 host->device bytes per step.
    engine = InferenceEngine(net, max_batch=32, batch_timeout_s=0.005,
                             quantize_ingest=True)

    def client(cid, n_requests=4):
        rng = np.random.default_rng(cid)
        for _ in range(n_requests):
            n = int(rng.integers(1, 9))
            x = rng.uniform(-1, 1, (n, 3, 64, 64)).astype(np.float32)
            out = engine.infer(x)
            assert out.shape == (n, 10)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    s = engine.stats
    pct = s.latency_percentiles()
    print(f"   {s.requests} requests / {s.images} images in {dt:.2f}s "
          f"({s.images/dt:.0f} img/s) over {s.steps} device steps; "
          f"mean batch fill {s.mean_batch_fill:.0%}; request latency "
          f"p50 {pct['p50']:.1f} / p99 {pct['p99']:.1f} ms")
    engine.shutdown()


if __name__ == "__main__":
    quantize_offline()
    serve()
