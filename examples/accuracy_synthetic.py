"""True accuracy-delta measurement on a learnable synthetic task.

No image dataset ships in this environment, so the accuracy tables measure
FP32-vs-INT8 *agreement*.  This example closes the loop the way the
reference's README does (README.md:31-35: FP32 77.8% vs engine-INT8 76.1%,
Δ=1.7%): it trains a real classifier (the LeNet torch twin, CPU, seconds)
on a procedurally generated shape-classification task, then runs the full
PTQ lifecycle and reports *labelled test accuracy* for torch-FP32,
engine-FP32, engine-INT8 per-tensor, and engine-INT8 per-channel.

    python examples/accuracy_synthetic.py [--n-train 10000] [--n-test 2000]

The task: 28x28 images, 4 shape classes (horizontal bar, vertical bar,
cross, hollow box) at random positions/sizes over Gaussian noise — easy
enough to train in seconds, hard enough that accuracy is not saturated at
100% (noise + small shapes), so quantization deltas are visible.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_shapes(n: int, rng: np.random.Generator):
    """n noisy 28x28 images in 4 shape classes."""
    imgs = rng.normal(0.0, 0.35, size=(n, 1, 28, 28)).astype(np.float32)
    labels = rng.integers(0, 4, size=n)
    for i, cls in enumerate(labels):
        r = int(rng.integers(6, 20))
        c = int(rng.integers(6, 20))
        half = int(rng.integers(4, 8))
        lo_r, hi_r = max(0, r - half), min(28, r + half)
        lo_c, hi_c = max(0, c - half), min(28, c + half)
        amp = float(rng.uniform(0.8, 1.2))
        im = imgs[i, 0]
        if cls == 0:      # horizontal bar
            im[r - 1:r + 1, lo_c:hi_c] += amp
        elif cls == 1:    # vertical bar
            im[lo_r:hi_r, c - 1:c + 1] += amp
        elif cls == 2:    # cross
            im[r - 1:r + 1, lo_c:hi_c] += amp
            im[lo_r:hi_r, c - 1:c + 1] += amp
        else:             # hollow box
            im[lo_r:hi_r, lo_c:lo_c + 2] += amp
            im[lo_r:hi_r, hi_c - 2:hi_c] += amp
            im[lo_r:lo_r + 2, lo_c:hi_c] += amp
            im[hi_r - 2:hi_r, lo_c:hi_c] += amp
    return imgs, labels.astype(np.int64)


def train_torch_lenet(x, y, epochs=2, batch=128, seed=0, log=print):
    import torch
    import torch.nn as nn

    from int8inferenceengine_tpu import models

    torch.manual_seed(seed)
    net = models.torch_twin("lenet")
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    loss_fn = nn.CrossEntropyLoss()
    xt, yt = torch.tensor(x), torch.tensor(y)
    for ep in range(epochs):
        perm = torch.randperm(len(xt))
        tot = 0.0
        for i in range(0, len(xt), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            loss = loss_fn(net(xt[idx]), yt[idx])
            loss.backward()
            opt.step()
            tot += float(loss.detach()) * len(idx)
        log(f"  epoch {ep + 1}: train loss {tot / len(xt):.4f}")
    net.eval()
    return net


def accuracy_report(net, x_test, y_test, calib):
    """Returns dict of labelled accuracies across the four paths."""
    import torch

    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import QuantConfig, models

    with torch.no_grad():
        torch_acc = float((net(torch.tensor(x_test)).argmax(1).numpy()
                           == y_test).mean())
    accs = {"torch_fp32": torch_acc}

    mm = models.build("lenet")
    mm.load(net.state_dict())
    accs["engine_fp32"] = float(
        (mm(q.tensor(x_test)).numpy().argmax(1) == y_test).mean())

    for tag, cfg, cle, ada in (
            ("engine_int8", QuantConfig(), False, False),
            ("engine_int8_cle", QuantConfig(), True, False),
            ("engine_int8_per_channel", QuantConfig(weight_per_channel=True),
             False, False),
            ("engine_int8_nearest", QuantConfig(rounding="nearest"), False,
             False),
            ("engine_int8_biascorr", QuantConfig(bias_correction=True),
             False, False),
            ("engine_int8_adaround", QuantConfig(), False, True),
            ("engine_int8_all_levers",
             QuantConfig(weight_per_channel=True, rounding="nearest",
                         bias_correction=True), True, False),
    ):
        mq = models.build("lenet", config=cfg)
        mq.load(net.state_dict())
        if cle:   # data-free cross-layer equalization before calibration
            from int8inferenceengine_tpu.utils import cross_layer_equalize
            cross_layer_equalize(mq, [("conv1", "conv2"), ("fc1", "fc2")])
        mq.prepare()
        mq(q.tensor(calib))
        if ada:   # data-driven rounding optimization before convert
            from int8inferenceengine_tpu.utils import adaround
            adaround(mq, calib, iters=200)
        mq.convert()
        accs[tag] = float(
            (mq(q.tensor(x_test)).numpy().argmax(1) == y_test).mean())
    return accs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=10_000)
    ap.add_argument("--n-test", type=int, default=2_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch
    torch.set_num_threads(4)
    rng = np.random.default_rng(args.seed)
    x_train, y_train = make_shapes(args.n_train, rng)
    x_test, y_test = make_shapes(args.n_test, rng)
    calib = x_train[:100]

    t0 = time.time()
    net = train_torch_lenet(x_train, y_train, epochs=args.epochs,
                            seed=args.seed)
    print(f"trained in {time.time() - t0:.1f}s")

    accs = accuracy_report(net, x_test, y_test, calib)
    print(f"\nLabelled test accuracy ({args.n_test} images, 4 classes):")
    for k, v in accs.items():
        delta = accs["torch_fp32"] - v
        print(f"  {k:24s} {v * 100:6.2f}%   (drop vs torch FP32: "
              f"{delta * 100:+.2f} pts; negative = better)")
    print("\nReference's headline delta for comparison: 1.7 pts "
          "(README.md:31-35).")


if __name__ == "__main__":
    main()
