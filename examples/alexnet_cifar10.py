"""AlexNet CIFAR10-224 — the reference's headline workflow as a script.

Mirrors sample/notebooks/AlexNet_cifar10_resize224.ipynb (reference): build
the torch Net and the engine MyNet side by side, load the torch weights,
time torch-FP32 / engine-FP32 / calibrate / engine-INT8 over the test set,
and count argmax agreement.  This environment has no CIFAR10 download, so
"test set" is a fixed random dataset and "labels" are the torch model's own
argmax — measuring engine-vs-oracle agreement, the same comparison the
notebook's accuracy delta captures.

Run:  python examples/alexnet_cifar10.py [--images 2000] [--batch 100]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import int8inferenceengine_tpu as q  # noqa: E402
from int8inferenceengine_tpu import models  # noqa: E402
from int8inferenceengine_tpu.data import DataLoader  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--model", default="alexnet",
                    help="any zoo model: fc_mnist simple_conv lenet alexnet "
                         "vgg11 resnet18 resnet34 resnet50 mobilenet_v1 "
                         "squeezenet googlenet")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(1)

    print("== build twin models, load torch weights ==")
    tnet = models.torch_twin(args.model)
    net = models.build(args.model)
    net.load(tnet.state_dict())

    rng = np.random.default_rng(0)
    shape = (args.images,) + net.INPUT_SHAPE
    images = rng.uniform(-1, 1, shape).astype(np.float32)

    print("== torch FP32 oracle ==")
    t0 = time.perf_counter()
    labels = []
    with torch.no_grad():
        for i in range(0, args.images, args.batch):
            labels.append(tnet(torch.tensor(images[i:i + args.batch]))
                          .numpy().argmax(1))
    labels = np.concatenate(labels)
    print(f"   torch: {time.perf_counter() - t0:.2f}s")

    def run_engine(tag):
        t0 = time.perf_counter()
        correct = 0
        for batch, lab in DataLoader(images, args.batch, labels=labels):
            out = net(batch)
            correct += int((q.argmax(out, 1) == q.tensor(np.float32(lab))).sum())
        dt = time.perf_counter() - t0
        print(f"   {tag}: {dt:.2f}s  ({args.images/dt:.0f} img/s)  "
              f"agreement {correct}/{args.images} = {correct/args.images:.1%}")

    print("== engine FP32 ==")
    run_engine("engine FP32")

    print("== calibrate (1 batch) + convert ==")
    t0 = time.perf_counter()
    net.prepare()
    net(q.tensor(images[:args.batch]))
    net.convert()
    print(f"   calibration: {time.perf_counter() - t0:.2f}s")

    print("== engine INT8 ==")
    run_engine("engine INT8")

    print("== engine INT8, host-quantized u8 ingest + first-conv pre-layout ==")
    t0 = time.perf_counter()
    correct = 0
    dl = DataLoader(images, args.batch, labels=labels,
                    quantize_to=(net.config.input_scale,
                                 net.config.input_zero_point),
                    layout_for=net)
    for batch, lab in dl:
        out = net(batch)
        correct += int((q.argmax(out, 1) == q.tensor(np.float32(lab))).sum())
    dt = time.perf_counter() - t0
    print(f"   engine INT8 (u8 ingest): {dt:.2f}s  ({args.images/dt:.0f} "
          f"img/s)  agreement {correct}/{args.images} = "
          f"{correct/args.images:.1%}")

    from int8inferenceengine_tpu.utils import log_quantization_report
    print("== per-layer quantization report ==")
    log_quantization_report(net, stream=sys.stdout)


if __name__ == "__main__":
    main()
