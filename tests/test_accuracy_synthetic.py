"""True labelled-accuracy delta through the PTQ pipeline (synthetic task).

The accuracy tables elsewhere measure FP32-vs-INT8 agreement (no dataset in
this environment); this trains a real classifier on the procedural shape
task (examples/accuracy_synthetic.py) and asserts the INT8 accuracy drop
stays inside the reference's 1.7-pt headline budget (README.md:31-35).
"""

import sys

import numpy as np
import torch


def test_labelled_accuracy_delta():
    sys.path.insert(0, "/root/repo")
    from examples.accuracy_synthetic import (accuracy_report, make_shapes,
                                             train_torch_lenet)

    torch.set_num_threads(2)
    rng = np.random.default_rng(0)
    x_train, y_train = make_shapes(4000, rng)
    x_test, y_test = make_shapes(800, rng)

    net = train_torch_lenet(x_train, y_train, epochs=3,
                            log=lambda *a: None)
    accs = accuracy_report(net, x_test, y_test, x_train[:100])

    assert accs["torch_fp32"] > 0.80, accs       # the task is learnable
    # engine FP32 matches the torch oracle
    assert abs(accs["engine_fp32"] - accs["torch_fp32"]) <= 0.005, accs
    # INT8 drop stays inside the reference's 1.7-pt headline budget
    for tag in ("engine_int8", "engine_int8_per_channel"):
        drop = accs["torch_fp32"] - accs[tag]
        assert drop <= 0.017, (tag, accs)


def test_labelled_accuracy_delta_depth8():
    """The ≤1.7-pt budget at HEADLINE depth: 8 compute layers (6 conv +
    2 fc — the reference's AlexNet is also 8, README.md:31-35), where
    requant noise compounds per layer.

    Measured finding this pins: plain trunc rounding (the reference's
    C-cast parity mode) compounds a DC bias at depth — at 8 layers it
    overdraws the budget (~5 pts on this task) — while
    rounding='nearest' (+ per-channel/bias-correction) recovers to
    within the budget or better.  The default stays reference-parity
    trunc; the levers exist exactly for this regime.
    """
    sys.path.insert(0, "/root/repo")
    from examples.accuracy_synthetic import (accuracy_report, build_deep8,
                                             make_shapes, torch_deep8,
                                             train_torch)

    torch.set_num_threads(2)
    rng = np.random.default_rng(0)
    x_train, y_train = make_shapes(4000, rng, size=32)
    x_test, y_test = make_shapes(800, rng, size=32)

    net = train_torch(torch_deep8(0), x_train, y_train, epochs=2,
                      log=lambda *a: None)
    accs = accuracy_report(
        net, x_test, y_test, x_train[:100], build=build_deep8,
        tags=("engine_int8", "engine_int8_nearest",
              "engine_int8_all_levers"))

    assert accs["torch_fp32"] > 0.70, accs       # the task is learnable
    assert abs(accs["engine_fp32"] - accs["torch_fp32"]) <= 0.005, accs
    # the Δ assertion at depth: nearest-rounding INT8 stays inside the
    # reference's 1.7-pt headline budget
    for tag in ("engine_int8_nearest", "engine_int8_all_levers"):
        drop = accs["torch_fp32"] - accs[tag]
        assert drop <= 0.017, (tag, accs)
