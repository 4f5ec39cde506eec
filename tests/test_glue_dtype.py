"""glue_dtype=bfloat16: the pointwise-requant precision lever.

Checks the bf16 glue path stays within +-2 output codes of the f32 path on
every calibrated pointwise boundary (QuantAct / QuantAdd / QuantMul /
QuantConcat) and end-to-end on a SE-gated model.
"""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig
from int8inferenceengine_tpu.layers import QuantAct, QuantAdd, QuantMul
from int8inferenceengine_tpu.ops import functional as F


def _rand(shape, seed=0, lo=-2.0, hi=2.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


BF16 = QuantConfig(glue_dtype="bfloat16")


def _pair(cls, *ctor, x_calib):
    f32l, bf16l = cls(*ctor), cls(*ctor, config=BF16)
    for l in (f32l, bf16l):
        l.prepare()
        l(*x_calib)
        l.convert()
    return f32l, bf16l


def test_quantact_bf16_within_2_codes():
    x = _rand((4, 257), 1)
    a32, a16 = _pair(QuantAct, "hardswish", x_calib=(q.tensor(x),))
    qx = F.quantize(q.tensor(x), 0.03, 128)
    d = (np.asarray(a16(qx).data).astype(int)
         - np.asarray(a32(qx).data).astype(int))
    assert np.abs(d).max() <= 2, np.abs(d).max()


def test_quantadd_mul_bf16_within_2_codes():
    a, b = _rand((2, 16, 5, 5), 1), _rand((2, 16, 5, 5), 2)
    for cls, args in ((QuantAdd, ()), (QuantMul, ())):
        l32, l16 = _pair(cls, *args, x_calib=(q.tensor(a), q.tensor(b)))
        qa = F.quantize(q.tensor(a), 0.02, 128)
        qb = F.quantize(q.tensor(b), 0.02, 128)
        d = (np.asarray(l16(qa, qb).data).astype(int)
             - np.asarray(l32(qa, qb).data).astype(int))
        assert np.abs(d).max() <= 2, (cls.__name__, np.abs(d).max())


def test_model_end_to_end_bf16_glue():
    """MobileNetV3-small with bf16 glue: logits stay close to f32 glue."""
    from int8inferenceengine_tpu import models
    torch.set_num_threads(1)
    tm = models.torch_twin("mobilenet_v3_small")
    cal = _rand((2, 3, 64, 64), 7, lo=-1, hi=1)
    x = _rand((8, 3, 64, 64), 8, lo=-1, hi=1)
    outs = {}
    for tag, cfg in (("f32", None), ("bf16", BF16)):
        mm = (models.build("mobilenet_v3_small") if cfg is None
              else models.build("mobilenet_v3_small", config=cfg))
        mm.load(tm.state_dict())
        mm.prepare()
        mm(q.tensor(cal))
        mm.convert()
        outs[tag] = mm(q.tensor(x)).numpy()
    assert np.isfinite(outs["bf16"]).all()
    # identical calibration -> same scales; bf16 only perturbs codes a hair
    err = np.abs(outs["bf16"] - outs["f32"]).mean()
    spread = outs["f32"].std()
    assert err < 0.25 * spread, (err, spread)
