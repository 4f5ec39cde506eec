"""Sharded inference on a device mesh (DP x TP).

On a real multi-chip TPU slice this runs as-is. To simulate on a CPU host,
launch with JAX_PLATFORMS=cpu — the script then creates 8 virtual devices
(note: it must flip the platform via jax.config BEFORE any backend use,
because this environment pre-imports jax with a remote TPU platform).

Run:  python examples/multichip_tp.py              # real devices
      JAX_PLATFORMS=cpu python examples/multichip_tp.py   # 8-device CPU sim
"""

import os
import sys

_want_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
if _want_cpu:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _want_cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
import int8inferenceengine_tpu as q  # noqa: E402
from int8inferenceengine_tpu import models  # noqa: E402
from int8inferenceengine_tpu.parallel.mesh import make_mesh  # noqa: E402


def main():
    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].platform}")

    tnet = models.torch_twin("lenet")
    net = models.build("lenet")
    net.load(tnet.state_dict())
    net.prepare()
    net(q.tensor(np.random.default_rng(0).uniform(
        -1, 1, (32, 1, 28, 28)).astype(np.float32)))
    net.convert()

    x = np.random.default_rng(1).uniform(
        -1, 1, (32, 1, 28, 28)).astype(np.float32)
    base = net(q.tensor(x)).numpy()

    model_par = 2 if n % 2 == 0 and n >= 4 else 1
    mesh = make_mesh((n // model_par, model_par))
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    net.shard(mesh, overlap=True)   # ring TP where Linears chain

    out = net(q.tensor(x)).numpy()
    assert np.array_equal(out, base), "sharded run must be bit-identical"
    print("sharded (ring overlap) == unsharded: OK")


if __name__ == "__main__":
    main()
