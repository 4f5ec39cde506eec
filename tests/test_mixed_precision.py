"""Mixed precision (Module.convert(skip=...)): FP32 fallback islands keep
the u8 interface so the rest of the graph is unchanged, and improve
accuracy on the skipped layer."""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models


def _built():
    tw = models.torch_twin("lenet")
    m = models.build("lenet")
    m.load(tw.state_dict())
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (64, 1, 28, 28)).astype(np.float32)
    want = tw(torch.tensor(x)).detach().numpy()
    return m, x, want


def test_skip_improves_over_full_int8():
    m, x, want = _built()
    m.prepare()
    m(q.tensor(x))
    m.convert(skip=("conv1", "fc2"))
    got = m(q.tensor(x)).numpy()
    assert np.isfinite(got).all()

    m8, _, _ = _built()
    m8.prepare()
    m8(q.tensor(x))
    m8.convert()
    full = m8(q.tensor(x)).numpy()

    # fallback islands remove two layers' weight+arithmetic quantization;
    # logit error must shrink (output grids identical in both runs)
    assert np.mean((got - want) ** 2) < np.mean((full - want) ** 2), (
        np.mean((got - want) ** 2), np.mean((full - want) ** 2))
    # interface check: still serves quantized u8 inputs end to end
    layers = dict(m.named_layers())
    assert "w_hwio" in layers["conv1"].params      # stayed float
    assert "qw_hwio" in layers["conv2"].params      # still quantized


def test_unknown_skip_raises():
    m, x, _ = _built()
    m.prepare()
    m(q.tensor(x))
    try:
        m.convert(skip=("nope",))
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_skip_with_weight_only():
    """FP32 islands compose with weight_only: the skipped layer keeps its
    float weights and the float forward uses them."""
    m, x, want = _built()
    m.config = m.config  # lenet built with default config; rebuild W8-float
    from int8inferenceengine_tpu import QuantConfig, models
    tw = models.torch_twin("lenet")
    mw = models.build("lenet", config=QuantConfig(weight_only=True))
    mw.load(tw.state_dict())
    mw.convert(skip=("fc2",))
    got = mw(q.tensor(x)).numpy()
    assert np.isfinite(got).all()
    layers = dict(mw.named_layers())
    assert "weight" in layers["fc2"].params        # stayed float
    assert "q_weight" in layers["fc1"].params      # W8 stored


def test_skip_unsupported_layer_type_raises():
    from int8inferenceengine_tpu import QuantConfig, models
    import numpy as _np
    m = models.build("gpt_tiny")
    m.load(models.torch_twin("gpt_tiny").state_dict())
    m.prepare()
    ids = _np.random.default_rng(0).integers(0, 1000, (4, 16)).astype(
        _np.int32)
    m(q.tensor(ids))
    try:
        m.convert(skip=("smax1",))
        assert False, "expected TypeError for non-Linear/Conv skip"
    except TypeError:
        pass
