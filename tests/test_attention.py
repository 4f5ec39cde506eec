"""Fused INT8 attention (ops/attention.py): the composed-XLA oracle
must be bit-identical to the per-layer QuantMatmul/QuantSoftmax chain;
models gated by QuantConfig.fused_attention must produce identical
results either way.  (The prefill Pallas kernel was deleted in round 2
after losing to composed XLA at every measured shape.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.ops import attention as A
from int8inferenceengine_tpu.ops import quant as quant_ops
from int8inferenceengine_tpu.ops.qmatmul import qmatmul_act


def _codes(shape, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=shape, dtype=np.uint8)


_SCALES = dict(scale_q=0.031, zp_q=121, scale_k=0.028, zp_k=134,
               scale_v=0.05, zp_v=97, scale_s=0.04, zp_s=128,
               scale_p=1 / 255.0, zp_p=0, scale_c=0.045, zp_c=110)


def test_oracle_matches_layer_chain():
    """attention_xla == QuantMatmul -> QuantSoftmax -> QuantMatmul math."""
    b, h, t, d = 2, 3, 37, 16
    qh, kh, vh = (jnp.asarray(_codes((b, h, t, d), s)) for s in (0, 1, 2))
    kw = _SCALES
    alpha = d ** -0.5
    s = qmatmul_act(qh, kh, scale_a=kw["scale_q"], zp_a=kw["zp_q"],
                    scale_b=kw["scale_k"], zp_b=kw["zp_k"],
                    scale_c=kw["scale_s"], zp_c=kw["zp_s"], alpha=alpha,
                    transpose_b=True)
    f = quant_ops.dequantize_u8(s, kw["scale_s"], kw["zp_s"])
    p = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1),
                              kw["scale_p"], kw["zp_p"])
    want = qmatmul_act(p, vh, scale_a=kw["scale_p"], zp_a=kw["zp_p"],
                       scale_b=kw["scale_v"], zp_b=kw["zp_v"],
                       scale_c=kw["scale_c"], zp_c=kw["zp_c"])
    got = A.attention_xla(qh, kh, vh, alpha=alpha, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name", ["text_tiny"])
def test_model_fused_flag_equivalent(name):
    """fused_attention='xla' must equal 'off' bit-for-bit on any backend
    (same composed math, different code path)."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, size=(8, 64)).astype(np.int32)
    outs = {}
    for mode in ("off", "xla"):
        m = models.build(name, config=QuantConfig(fused_attention=mode))
        m.load(models.torch_twin(name).state_dict())
        m.prepare()
        m(q.tensor(x))
        m.convert()
        outs[mode] = m(q.tensor(x)).numpy()
    np.testing.assert_array_equal(outs["off"], outs["xla"])


def test_fused_attention_pallas_removed():
    """The prefill Pallas attention kernel was deleted after losing to
    the composed XLA path at every measured shape (round 2; see
    ops/attention.attention's docstring) — forcing it now raises with
    the citation instead of silently running something else."""
    qh = jnp.zeros((1, 1, 8, 8), jnp.uint8)
    with pytest.raises(ValueError, match="removed"):
        A.attention(qh, qh, qh, backend="pallas",
                    alpha=1.0, **_SCALES)


def test_causal_softmax_multirow_requires_per_row_valid():
    """Non-square causal scores with a SCALAR valid_len must raise (a
    scalar there would silently break causality between the m rows —
    round-3 review); the per-row form is accepted."""
    import jax.numpy as jnp
    import pytest
    from int8inferenceengine_tpu.layers import QuantSoftmax

    sm = QuantSoftmax(causal=True)
    scores = jnp.zeros((2, 3, 4, 16), jnp.float32)   # m=4 rows, T=16
    with pytest.raises(ValueError):
        sm(q_tensor_like(scores), valid_len=jnp.int32(8))
    ok = sm(q_tensor_like(scores),
            valid_len=jnp.arange(5, 9).reshape(1, 1, 4, 1))
    assert ok.shape == (2, 3, 4, 16)


def q_tensor_like(arr):
    from int8inferenceengine_tpu.tensor import Tensor
    return Tensor(arr)
