"""AdaRound (utils.adaround): layer-wise optimized weight rounding must
beat round-to-nearest on the layer-output objective, and plug into the
standard prepare -> adaround -> convert lifecycle."""

import numpy as np
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models, utils
from int8inferenceengine_tpu.layers import Linear
from int8inferenceengine_tpu.utils.adaround import _h, _layer_out, \
    _weight_scale


def _correlated_inputs(n, k, rank, seed):
    """Low-rank inputs couple the per-weight rounding decisions — the
    regime where nearest is measurably sub-optimal."""
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 1, (n, rank)).astype(np.float32)
    a = rng.normal(0, 1, (rank, k)).astype(np.float32)
    return z @ a


def test_linear_beats_nearest():
    rng = np.random.default_rng(0)
    k, n_out = 64, 32
    w = rng.normal(0, 0.1, (n_out, k)).astype(np.float32)
    b = rng.normal(0, 0.05, n_out).astype(np.float32)
    x = _correlated_inputs(512, k, rank=4, seed=1)

    layer = Linear(k, n_out)
    layer.load_weight(w)
    layer.load_bias(b)
    layer.prepare()
    layer(q.tensor(x))

    class Net:
        is_quant = False

        def named_layers(self):
            return [("lin", layer)]

        def forward(self, t):
            return layer(t)

    utils.adaround(Net(), x, iters=300)
    assert getattr(layer, "_adaround_qw", None) is not None

    wj, s, _, _ = _weight_scale(layer)
    nearest = jnp.clip(jnp.round(wj / s), -127, 127).astype(jnp.int8)
    ada = layer._adaround_qw
    assert (np.asarray(ada) != np.asarray(nearest)).sum() > 0  # re-rounded
    xj = jnp.asarray(x)
    ref = _layer_out(layer, wj, xj)
    e_near = float(jnp.mean(jnp.square(
        _layer_out(layer, s * nearest.astype(jnp.float32), xj) - ref)))
    e_ada = float(jnp.mean(jnp.square(
        _layer_out(layer, s * ada.astype(jnp.float32), xj) - ref)))
    assert e_ada < e_near * 0.95, (e_ada, e_near)


def test_lifecycle_lenet():
    """prepare -> calibrate -> adaround -> convert on a conv+fc model; the
    optimized rounding must not hurt the model-level INT8 agreement."""
    tw = models.torch_twin("lenet")
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (64, 1, 28, 28)).astype(np.float32)

    outs = {}
    for use_ada in (False, True):
        m = models.build("lenet", config=QuantConfig())
        m.load(tw.state_dict())
        m.prepare()
        m(q.tensor(x))
        if use_ada:
            utils.adaround(m, x, iters=100)
        m.convert()
        outs[use_ada] = m(q.tensor(x)).numpy()
        assert np.isfinite(outs[use_ada]).all()

    import torch
    want = tw(torch.tensor(x)).detach().numpy()
    mse = {k: float(np.mean((v - want) ** 2)) for k, v in outs.items()}
    # adaround optimizes per-layer output error on this very batch — the
    # model-level logit error must not regress meaningfully
    assert mse[True] <= mse[False] * 1.25, mse


def test_requires_unconverted():
    m = models.build("lenet")
    m.load(models.torch_twin("lenet").state_dict())
    m.prepare()
    x = np.zeros((4, 1, 28, 28), np.float32)
    m(q.tensor(x))
    m.convert()
    try:
        utils.adaround(m, x)
        assert False, "expected RuntimeError after convert()"
    except RuntimeError:
        pass


def test_h_init_recovers_fraction():
    v = jnp.asarray([-3.0, 0.0, 3.0])
    h = _h(v)
    assert ((h >= 0) & (h <= 1)).all()


def test_w4_adaround_beats_default_pack():
    """AdaRound on the 4-bit grid (weight_only, weight_bits=4): optimized
    group-scale rounding beats the default MSE-scaled pack on correlated
    inputs, flowing through convert() into the packed nibbles."""
    rng = np.random.default_rng(4)
    k, n_out = 128, 32
    w = rng.normal(0, 0.1, (n_out, k)).astype(np.float32)
    b = rng.normal(0, 0.05, n_out).astype(np.float32)
    x = _correlated_inputs(512, k, rank=4, seed=5)
    cfg = QuantConfig(weight_only=True, weight_bits=4, w4_group=64)

    outs = {}
    for use_ada in (False, True):
        layer = Linear(k, n_out, config=cfg)
        layer.load_weight(w)
        layer.load_bias(b)

        class Net:
            is_quant = False

            def named_layers(self):
                return [("lin", layer)]

            def forward(self, t):
                return layer(t)

        if use_ada:
            utils.adaround(Net(), x, iters=300)
        layer.convert()
        outs[use_ada] = layer(q.tensor(x)).numpy()

    ref = x @ w.T + b
    e = {k2: float(np.mean((v - ref) ** 2)) for k2, v in outs.items()}
    assert e[True] < e[False] * 0.9, e
