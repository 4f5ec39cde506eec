"""Verify drive (CPU): reference-notebook user workflow end-to-end."""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import torch
import torch.nn as nn
import int8inferenceengine_tpu as q

torch.manual_seed(0)
rng = np.random.default_rng(0)


class TorchNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 8, 5)
        self.fc1 = nn.Linear(8 * 12 * 12, 32)
        self.fc2 = nn.Linear(32, 10)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.max_pool2d(x, 2, 2)
        x = x.reshape(-1, 8 * 12 * 12)
        return self.fc2(torch.relu(self.fc1(x)))


class MyNet(q.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = q.Conv2d(1, 8, 5)
        self.fc1 = q.Linear(8 * 12 * 12, 32)
        self.fc2 = q.Linear(32, 10)

    def forward(self, x):
        x = q.relu(self.conv1(x))
        x = q.max_pool2d(x, 2, 2)
        x = x.reshape(-1, 8 * 12 * 12)
        return self.fc2(q.relu(self.fc1(x)))


tnet = TorchNet().eval()
mm = MyNet()
mm.load(tnet.state_dict())

x = rng.uniform(-1, 1, (64, 1, 28, 28)).astype(np.float32)
with torch.no_grad():
    want = tnet(torch.tensor(x)).numpy()
got = mm(q.tensor(x)).numpy()
d = np.abs(got - want).max()
print(f"FP32 parity max diff: {d:.2e}")
assert d < 1e-5

mm.prepare()
mm(q.tensor(x))
mm.convert()
out = mm(q.tensor(x))
agree = (out.numpy().argmax(1) == want.argmax(1)).mean()
print(f"INT8 argmax agreement: {agree:.2f}")
assert agree >= 0.9

# notebook accuracy flow
labels = q.tensor(want.argmax(1).astype(np.float32))
acc = float((q.argmax(out, 1) == labels).sum()) / 64
print(f"notebook-flow accuracy vs torch labels: {acc:.2f}")

# probes
try:
    mm.conv1._forward_fp32  # attr exists
    mm(q.tensor(x))  # quantized __call__ quantizes input itself: fine
except Exception as e:
    print("unexpected:", e); raise
import warnings
with warnings.catch_warnings(record=True):
    mm.convert()  # second convert -> warning, not corruption
out2 = mm(q.tensor(x))
assert np.array_equal(out2.numpy(), out.numpy())
print("double-convert: stable")

try:
    mm2 = MyNet(); mm2.conv1.load_weight(np.zeros((3, 3), np.float32))
    print("FAIL: wrong-shape load accepted"); sys.exit(1)
except ValueError as e:
    print("wrong-shape load raises:", str(e)[:70])

big = q.quantize(q.tensor(np.array([[1e9, -1e9]], np.float32)), 0.025, 127)
v = big.numpy()
assert v.min() >= 0 and v.max() <= 255, v
print("quantize at +-1e9 clamps:", v.tolist())

# multi-device: shard on 2x4 CPU mesh, exact equality
from int8inferenceengine_tpu.parallel import make_mesh
m3 = MyNet(); m3.load(tnet.state_dict())
m3.prepare(); m3(q.tensor(x)); m3.convert()
ref_out = m3(q.tensor(x)).numpy()
m3.shard(make_mesh((2, 4)))
sh_out = m3(q.tensor(x)).numpy()
assert np.array_equal(ref_out, sh_out)
print("sharded == unsharded: exact")
print("DRIVE OK")
