"""AlexNet CIFAR10-224 — the reference's headline workflow as a script.

Mirrors sample/notebooks/AlexNet_cifar10_resize224.ipynb (reference): build
the torch Net and the engine MyNet side by side, load the torch weights,
time torch-FP32 / engine-FP32 / calibrate / engine-INT8 over the test set,
and count argmax agreement.

Two data modes:

* default (no ``--data``): this environment has no CIFAR10 download, so
  "test set" is a fixed random dataset and "labels" are the torch model's
  own argmax — measuring engine-vs-oracle agreement, the same comparison
  the notebook's accuracy delta captures.
* ``--data DIR``: a real ``cifar-10-batches-py`` directory (or an .npz
  with ``images`` [N,3,32,32] u8/f32 + ``labels``) — images are resized
  to 224 and ImageNet-normalized exactly like the reference notebook.
  Add ``--weights alex_cifar10_224.pt`` (a trained torch state_dict, the
  reference's own checkpoint format) and the printed numbers become TRUE
  labelled accuracy — the 76.1%-vs-77.8% parity claim is then one
  download away (reference README.md:31-35).

Run:  python examples/alexnet_cifar10.py [--images 2000] [--batch 100]
      [--data cifar-10-batches-py/ [--weights alex_cifar10_224.pt]]
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import int8inferenceengine_tpu as q  # noqa: E402
from int8inferenceengine_tpu import models  # noqa: E402
from int8inferenceengine_tpu.data import DataLoader  # noqa: E402

# the reference notebook's transforms: Resize(224) + ImageNet normalize
# (AlexNet_cifar10_resize224.ipynb cell 1)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_cifar10(data_dir: str, n: int, size: int = 224):
    """Real CIFAR-10 test images -> ([n,3,size,size] f32, [n] labels).

    Accepts the standard ``cifar-10-batches-py`` directory (test_batch
    pickle) or any ``.npz`` with ``images``/``labels``.  Bilinear resize
    via torch (no torchvision dependency), then ImageNet normalization —
    the reference notebook's exact input pipeline.
    """
    import torch
    import torch.nn.functional as tF

    npz = [f for f in os.listdir(data_dir)] if os.path.isdir(data_dir) \
        else []
    if os.path.isfile(data_dir) and data_dir.endswith(".npz"):
        d = np.load(data_dir)
        images, labels = d["images"], d["labels"]
    elif "test_batch" in npz:
        with open(os.path.join(data_dir, "test_batch"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        images = d[b"data"].reshape(-1, 3, 32, 32)
        labels = np.asarray(d[b"labels"])
    else:
        raise FileNotFoundError(
            f"{data_dir}: expected a cifar-10-batches-py dir (with "
            f"test_batch) or an .npz with images/labels")
    images, labels = images[:n], labels[:n].astype(np.int64)
    x = images.astype(np.float32)
    if x.max() > 1.5:          # u8 [0,255] -> [0,1]
        x = x / 255.0
    x = tF.interpolate(torch.tensor(x), size=(size, size), mode="bilinear",
                       align_corners=False).numpy()
    x = (x - _IMAGENET_MEAN.reshape(1, 3, 1, 1)) \
        / _IMAGENET_STD.reshape(1, 3, 1, 1)
    return x.astype(np.float32), labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--model", default="alexnet",
                    help="any zoo model: fc_mnist simple_conv lenet alexnet "
                         "vgg11 resnet18 resnet34 resnet50 mobilenet_v1 "
                         "squeezenet googlenet")
    ap.add_argument("--data", default=None,
                    help="real CIFAR-10: cifar-10-batches-py dir or .npz")
    ap.add_argument("--weights", default=None,
                    help="trained torch state_dict (.pt); with --data the "
                         "numbers become TRUE labelled accuracy")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(1)

    print("== build twin models, load torch weights ==")
    tnet = models.torch_twin(args.model)
    if args.weights:
        tnet.load_state_dict(torch.load(args.weights, map_location="cpu"))
        tnet.eval()
    net = models.build(args.model)
    net.load(tnet.state_dict())

    true_labels = None
    if args.data:
        size = net.INPUT_SHAPE[-1]
        images, true_labels = load_cifar10(args.data, args.images, size)
        args.images = len(images)
        print(f"   real CIFAR-10: {args.images} images resized to {size}")
    else:
        rng = np.random.default_rng(0)
        shape = (args.images,) + net.INPUT_SHAPE
        images = rng.uniform(-1, 1, shape).astype(np.float32)

    print("== torch FP32 oracle ==")
    t0 = time.perf_counter()
    preds = []
    with torch.no_grad():
        for i in range(0, args.images, args.batch):
            preds.append(tnet(torch.tensor(images[i:i + args.batch]))
                         .numpy().argmax(1))
    preds = np.concatenate(preds)
    print(f"   torch: {time.perf_counter() - t0:.2f}s")
    if true_labels is not None and args.weights:
        print(f"   torch TRUE accuracy: "
              f"{(preds == true_labels).mean():.1%} "
              f"(reference FP32: 77.8%, README.md:31)")
        labels = true_labels
        metric = "accuracy"
    else:
        labels = preds
        metric = "agreement"

    def run_engine(tag):
        t0 = time.perf_counter()
        correct = 0
        for batch, lab in DataLoader(images, args.batch, labels=labels):
            out = net(batch)
            correct += int((q.argmax(out, 1) == q.tensor(np.float32(lab))).sum())
        dt = time.perf_counter() - t0
        print(f"   {tag}: {dt:.2f}s  ({args.images/dt:.0f} img/s)  "
              f"{metric} {correct}/{args.images} = {correct/args.images:.1%}")

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
