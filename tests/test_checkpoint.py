"""Checkpoint round-trip + observability report tests.

New capability vs the reference, which re-runs convert() every process
because quantized weights are never persisted (SURVEY.md §5).
"""

import json

import numpy as np
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models, utils


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


def _calibrated(name="lenet", batch=16):
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    shape = (batch,) + mm.INPUT_SHAPE
    mm.prepare()
    mm(q.tensor(_rand(shape)))
    mm.convert()
    return mm, shape


def test_quantized_roundtrip(tmp_path):
    mm, shape = _calibrated()
    x = _rand(shape)
    base = mm(q.tensor(x)).numpy()

    path = str(tmp_path / "lenet_int8.npz")
    utils.save(mm, path)

    fresh = models.build("lenet")
    utils.load(fresh, path)
    assert fresh.is_quant
    out = fresh(q.tensor(x)).numpy()
    np.testing.assert_array_equal(out, base)


def test_fp32_roundtrip(tmp_path):
    tm = models.torch_twin("fc_mnist")
    mm = models.build("fc_mnist")
    mm.load(tm.state_dict())
    x = _rand((8, 1, 28, 28))
    base = mm(q.tensor(x)).numpy()

    path = str(tmp_path / "fc_fp32.npz")
    utils.save(mm, path)
    fresh = models.build("fc_mnist")
    utils.load(fresh, path)
    assert not fresh.is_quant
    np.testing.assert_array_equal(fresh(q.tensor(x)).numpy(), base)


def test_quantized_roundtrip_safetensors(tmp_path):
    """Same artifact through the .safetensors container: bit-exact restore."""
    mm, shape = _calibrated()
    x = _rand(shape)
    base = mm(q.tensor(x)).numpy()

    path = str(tmp_path / "lenet_int8.safetensors")
    utils.save(mm, path)
    fresh = models.build("lenet")
    utils.load(fresh, path)
    assert fresh.is_quant
    np.testing.assert_array_equal(fresh(q.tensor(x)).numpy(), base)


def test_read_state_dict_formats(tmp_path):
    """Module.load ingests from .pt / .npz / .safetensors files alike."""
    import torch
    from safetensors.numpy import save_file

    tm = models.torch_twin("fc_mnist")
    sd_np = {k: v.numpy() for k, v in tm.state_dict().items()}
    pt = str(tmp_path / "w.pt")
    npz = str(tmp_path / "w.npz")
    st = str(tmp_path / "w.safetensors")
    torch.save(tm.state_dict(), pt)
    np.savez(npz, **sd_np)
    save_file(sd_np, st)

    x = _rand((4, 1, 28, 28))
    outs = []
    for path in (pt, npz, st):
        mm = models.build("fc_mnist")
        mm.load(utils.read_state_dict(path))
        outs.append(mm(q.tensor(x)).numpy())
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_safetensors_without_header_rejected(tmp_path):
    """A plain (non-i8ie) safetensors file gets a clear format error."""
    from safetensors.numpy import save_file
    path = str(tmp_path / "plain.safetensors")
    save_file({"fc1.weight": np.zeros((10, 784), np.float32)}, path)
    with pytest.raises(ValueError, match="not an i8ie checkpoint"):
        utils.load(models.build("fc_mnist"), path)


def test_read_state_dict_unknown_extension(tmp_path):
    with pytest.raises(ValueError, match="unsupported extension"):
        utils.read_state_dict(str(tmp_path / "w.npy"))


def test_architecture_mismatch(tmp_path):
    mm, _ = _calibrated("fc_mnist", batch=4)
    path = str(tmp_path / "fc.npz")
    utils.save(mm, path)
    with pytest.raises(ValueError, match="architecture mismatch"):
        utils.load(models.build("lenet"), path)


def test_state_dict_flat_view():
    mm, _ = _calibrated("fc_mnist", batch=4)
    sd = utils.state_dict(mm)
    assert "fc1.qw_kn" in sd and sd["fc1.qw_kn"].dtype == np.int8


def test_quantization_report():
    mm, _ = _calibrated()
    rep = utils.quantization_report(mm)
    assert set(rep) == {"conv1", "conv2", "fc1", "fc2"}
    for rec in rep.values():
        assert rec["is_quantized"]
        assert rec["scale"] > 0
        assert 0 <= rec["zero_point"] <= 255
        assert rec["calib"]["count"] > 0
        assert rec["calib"]["min"] <= 0 or rec["calib"]["min"] is not None
    # JSON-serializable end to end
    json.dumps(rep)


def test_log_report_json_lines():
    import io
    mm, _ = _calibrated("fc_mnist", batch=4)
    buf = io.StringIO()
    utils.log_quantization_report(mm, stream=buf)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(lines) == 1 and lines[0]["layer"] == "fc1"


def test_roofline_collect():
    from int8inferenceengine_tpu.utils import roofline
    mm, _ = _calibrated("lenet", batch=4)
    rep = roofline.collect(mm, (1, 28, 28), batch=8)
    # LeNet conv1: 2*8*24*24*20*(1*5*5) ; conv2: 2*8*8*8*50*(20*5*5)
    want_c1 = 2 * 8 * 24 * 24 * 20 * 25
    want_c2 = 2 * 8 * 8 * 8 * 50 * 20 * 25
    assert rep["per_layer"]["conv1"]["flops"] == want_c1
    assert rep["per_layer"]["conv2"]["flops"] == want_c2
    assert rep["per_layer"]["fc1"]["flops"] == 2 * 8 * 800 * 500
    assert rep["total_flops"] > 0 and rep["total_bytes"] > 0

    full = roofline.report(mm, (1, 28, 28), batch=8, measured_s=1e-3)
    assert full["precision"] == "int8"
    assert 0 < full["percent_of_peak"] < 100
    assert full["sol_compute_s"] > 0


def test_validate_clean_and_dirty():
    from int8inferenceengine_tpu.utils import validate
    mm, shape = _calibrated("lenet", batch=4)
    assert validate.validate(mm, _rand(shape)) == []

    # corrupt a scale -> finding
    mm.fc1.scale = -1.0
    finds = validate.validate(mm)
    assert any("bad output scale" in f for f in finds)
    mm.fc1.scale = 0.1

    # un-converted model mid-prepare -> finding
    fresh = models.build("fc_mnist")
    fresh.prepare()
    finds = validate.validate(fresh)
    assert any("still preparing" in f for f in finds)


def test_quantized_roundtrip_branching_models(tmp_path):
    """QuantConcat/QuantAdd/QuantAct/QuantMul layers (weightless,
    calibrated) must persist their (scale, zp) through the artifact too."""
    import torch
    torch.set_num_threads(1)
    for name in ("squeezenet", "googlenet", "mobilenet_v3_small"):
        tm = models.torch_twin(name)
        mm = models.build(name)
        mm.load(tm.state_dict())
        x = _rand((2, 3, 64, 64))
        mm.prepare()
        mm(q.tensor(x))
        mm.convert()
        base = mm(q.tensor(x)).numpy()
        path = str(tmp_path / f"{name}_int8.npz")
        utils.save(mm, path)
        fresh = models.build(name)
        utils.load(fresh, path)
        np.testing.assert_array_equal(fresh(q.tensor(x)).numpy(), base)


def test_roundtrip_new_families():
    """Quantized-artifact checkpoints cover the decoder and weight-only
    modes: reload reproduces outputs bit-for-bit."""
    import tempfile

    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import QuantConfig, models, utils

    rng = np.random.default_rng(0)
    for cfg in (QuantConfig(), QuantConfig(weight_only=True)):
        m = models.build("gpt_tiny", config=cfg)
        m.load(models.torch_twin("gpt_tiny").state_dict())
        ids = rng.integers(0, 1000, (4, 64)).astype(np.int32)
        if not cfg.weight_only:
            m.prepare()
            m(q.tensor(ids))
        m.convert()
        want = m(q.tensor(ids)).numpy()
        gen_want = m.generate(ids[:, :8], 5)
        with tempfile.TemporaryDirectory() as d:
            utils.save(m, f"{d}/ck.npz")
            m2 = models.build("gpt_tiny", config=cfg)
            utils.load(m2, f"{d}/ck.npz")
            np.testing.assert_array_equal(m2(q.tensor(ids)).numpy(), want)
            np.testing.assert_array_equal(m2.generate(ids[:, :8], 5),
                                          gen_want)
