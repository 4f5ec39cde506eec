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
