"""DataLoader: prefetch correctness, preprocessing parity, quantized ingest."""

import numpy as np
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models, native
from int8inferenceengine_tpu.data import DataLoader


def test_float_batches_cover_all_rows():
    x = np.random.uniform(-1, 1, (25, 1, 4, 4)).astype(np.float32)
    dl = DataLoader(x, batch_size=8)
    batches = list(dl)
    assert [b.shape[0] for b in batches] == [8, 8, 8, 1]
    assert len(dl) == 4
    got = np.concatenate([b.numpy() for b in batches])
    np.testing.assert_array_equal(got, x)


def test_drop_remainder():
    x = np.random.uniform(-1, 1, (25, 1, 4, 4)).astype(np.float32)
    dl = DataLoader(x, batch_size=8, drop_remainder=True)
    assert [b.shape[0] for b in dl] == [8, 8, 8]
    assert len(dl) == 3


def test_u8_pipeline_matches_manual():
    img = np.random.randint(0, 256, (10, 8, 8, 3), dtype=np.uint8)
    mean, std = [0.5, 0.4, 0.3], [0.2, 0.2, 0.2]
    dl = DataLoader(img, batch_size=4, mean=mean, std=std)
    got = np.concatenate([b.numpy() for b in dl])
    want = native.normalize_nchw(img, mean, std)
    np.testing.assert_array_equal(got, want)


def test_u8_resize_and_quantize_ingest():
    img = np.random.randint(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    mean, std = [0.5] * 3, [0.25] * 3
    dl = DataLoader(img, batch_size=3, mean=mean, std=std,
                    resize_to=(16, 16), quantize_to=(0.025, 127))
    batches = list(dl)
    assert all(b.quantized for b in batches)
    assert batches[0].shape == (3, 3, 16, 16)
    resized = native.resize_bilinear(img, 16, 16)
    want = native.preprocess_quantize(resized, mean, std, 0.025, 127)
    got = np.concatenate([np.asarray(b.data) for b in batches])
    np.testing.assert_array_equal(got, want)


def test_u8_requires_mean_std():
    img = np.zeros((2, 4, 4, 1), np.uint8)
    with pytest.raises(ValueError, match="mean/std"):
        DataLoader(img, batch_size=2)


def test_labels_pairing():
    x = np.random.uniform(-1, 1, (10, 1, 4, 4)).astype(np.float32)
    y = np.arange(10)
    pairs = list(DataLoader(x, batch_size=4, labels=y))
    assert [p[1].tolist() for p in pairs] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_producer_error_propagates():
    class Bad:
        shape = (8, 1, 4, 4)
        dtype = np.float32

        def __getitem__(self, s):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Bad(), batch_size=4))


def test_end_to_end_model_loop():
    """The reference notebook loop: loader -> model -> argmax accuracy."""
    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(np.random.uniform(-1, 1, (16, 1, 28, 28)).astype(np.float32)))
    mm.convert()

    x = np.random.uniform(-1, 1, (20, 1, 28, 28)).astype(np.float32)
    import torch
    labels = tm(torch.tensor(x)).detach().numpy().argmax(1)
    correct = 0
    for batch, lab in DataLoader(x, batch_size=8, labels=labels):
        out = mm(batch)
        correct += (q.argmax(out, 1) == q.tensor(np.float32(lab))).sum()
    assert correct >= 0.75 * len(x)


def test_quantized_ingest_feeds_module_call():
    """Pre-quantized u8 loader batches go straight through Module.__call__."""
    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(np.random.uniform(-1, 1, (16, 1, 28, 28)).astype(np.float32)))
    mm.convert()

    x = np.random.uniform(-1, 1, (8, 1, 28, 28)).astype(np.float32)
    cfg = mm.config
    base = mm(q.tensor(x)).numpy()   # float path (quantizes at cfg scale)

    dl = DataLoader(x, batch_size=8,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert batch.quantized
    out = mm(batch).numpy()
    np.testing.assert_array_equal(out, base)


def test_abandoned_iteration_does_not_leak_producer():
    """Breaking out of iteration early must unblock the producer thread."""
    import threading
    before = threading.active_count()
    x = np.random.uniform(-1, 1, (64, 1, 4, 4)).astype(np.float32)
    for _ in range(5):
        it = iter(DataLoader(x, batch_size=4, prefetch=1))
        next(it)
        it.close()   # abandon mid-stream
    import time
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_resize_on_float_rejected():
    x = np.zeros((4, 1, 8, 8), np.float32)
    with pytest.raises(ValueError, match="resize_to"):
        DataLoader(x, batch_size=2, resize_to=(16, 16))


class _StridedNet(q.Module):
    """First conv qualifies for host space-to-depth (stride 2, 3 channels)."""

    def __init__(self):
        super().__init__()
        self.conv1 = q.Conv2d(3, 16, 5, stride=2, padding=2)
        self.fc = q.Linear(16 * 8 * 8, 10)

    def forward(self, x):
        x = q.relu(self.conv1(x))
        return self.fc(x.reshape(-1, 16 * 8 * 8))


def _converted_strided():
    m = _StridedNet()
    rng = np.random.default_rng(3)
    m.conv1.load_weight(rng.normal(0, 0.2, (16, 3, 5, 5)).astype(np.float32))
    m.conv1.load_bias(rng.normal(0, 0.1, (16,)).astype(np.float32))
    m.fc.load_weight(rng.normal(0, 0.05, (10, 1024)).astype(np.float32))
    m.fc.load_bias(rng.normal(0, 0.05, (10,)).astype(np.float32))
    m.prepare()
    m(q.tensor(rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)))
    m.convert()
    return m


def test_host_prelayout_matches_device_path():
    """layout_for ingest (host zp-pad + space-to-depth) is bit-identical to
    plain quantized ingest (device-side s2d)."""
    m = _converted_strided()
    assert m.ingest_descriptor() == ("s2d", 5, 2, 2, 3)
    x = np.random.default_rng(4).uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)
    cfg = m.config
    dl_plain = DataLoader(x, batch_size=8,
                          quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (plain,) = list(dl_plain)
    base = m(plain).numpy()
    dl = DataLoader(x, batch_size=8, layout_for=m,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert batch._ingest == ("s2d", 5, 2, 2, 3)
    np.testing.assert_array_equal(m(batch).numpy(), base)


def test_host_prelayout_u8_image_pipeline():
    """Full u8 image ingest: preprocess + quantize + pre-layout on the host."""
    m = _converted_strided()
    img = np.random.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    mean, std = [0.5] * 3, [0.25] * 3
    cfg = m.config
    dl_plain = DataLoader(img, batch_size=8, mean=mean, std=std,
                          quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (plain,) = list(dl_plain)
    base = m(plain).numpy()
    dl = DataLoader(img, batch_size=8, mean=mean, std=std, layout_for=m,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    np.testing.assert_array_equal(m(batch).numpy(), base)


def test_prelayout_mismatch_raises():
    m = _converted_strided()
    x = np.random.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    cfg = m.config
    dl = DataLoader(x, batch_size=4, layout_for=m,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    other = models.build("lenet")  # conv1: k5 s1 c1 -> no/different layout
    with pytest.raises(ValueError):
        other.conv1(batch)


def test_layout_for_requires_quantize_to():
    m = _converted_strided()
    x = np.random.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="quantize_to"):
        DataLoader(x, batch_size=4, layout_for=m)


def test_layout_for_noop_on_stride1_model():
    """Models whose first conv doesn't qualify silently skip pre-layout."""
    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(np.random.uniform(-1, 1, (8, 1, 28, 28)).astype(np.float32)))
    mm.convert()
    x = np.random.uniform(-1, 1, (8, 1, 28, 28)).astype(np.float32)
    cfg = mm.config
    base = mm(q.tensor(x)).numpy()
    dl = DataLoader(x, batch_size=8, layout_for=mm,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert batch._ingest is None
    np.testing.assert_array_equal(mm(batch).numpy(), base)


def test_ingest_tensor_repr_and_guards():
    """repr() must never raise; ops that can't consume the pre-layout must
    fail with the diagnostic, not a downstream shape error."""
    from int8inferenceengine_tpu.ops import functional as F

    m = _converted_strided()
    x = np.random.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    cfg = m.config
    dl = DataLoader(x, batch_size=4, layout_for=m,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert "pre-layout" in repr(batch)
    for op in (lambda: F.relu(batch),
               lambda: F.max_pool2d(batch, 2, 2),
               lambda: F.dequantize(batch),
               lambda: batch.reshape(-1, 4)):
        with pytest.raises(ValueError, match="pre-layout"):
            op()
