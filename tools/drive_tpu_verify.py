"""Verify drive (TPU): FC lifecycle on chip + qgemm pallas-vs-xla exact."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import int8inferenceengine_tpu as q
from int8inferenceengine_tpu.ops import gemm_int8 as G

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

# op-level: qgemm pallas vs xla bit-exact on chip
for (m, k, n) in ((128, 768, 768), (100, 9216, 4096), (8, 768, 3072),
                  (7, 100, 10)):
    a = jnp.asarray(rng.integers(0, 256, (m, k)), jnp.uint8)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    oc = jnp.asarray(rng.integers(-5000, 5000, (n,)), jnp.int32)
    kw = dict(scale_a=0.02, zp_a=128, scale_w=0.01, scale_c=0.05, zp_c=128)
    op = np.asarray(G.qgemm_pallas(a, w, oc, **kw))
    ox = np.asarray(G.qgemm_xla(a, w, oc, **kw))
    ok = np.array_equal(op, ox)
    print(f"qgemm {m}x{k}x{n}: pallas==xla {ok}", flush=True)
    assert ok

# small FC lifecycle on chip
import torch, torch.nn as nn
torch.manual_seed(0)
t = nn.Linear(784, 10).eval()


class Net(q.Module):
    def __init__(self):
        super().__init__()
        self.fc = q.Linear(784, 10)

    def forward(self, x):
        return self.fc(x)


mm = Net(); mm.load({"fc.weight": t.weight, "fc.bias": t.bias})
x = rng.uniform(-1, 1, (100, 784)).astype(np.float32)
with torch.no_grad():
    want = t(torch.tensor(x)).numpy()
mm.prepare(); mm(q.tensor(x)); mm.convert()
out = mm(q.tensor(x)).numpy()
agree = (out.argmax(1) == want.argmax(1)).mean()
print(f"FC INT8 argmax agreement on chip: {agree:.2f}", flush=True)
assert agree >= 0.9
print("TPU VERIFY OK", flush=True)
