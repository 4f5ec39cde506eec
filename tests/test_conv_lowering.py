"""Conv lowering equivalence: space-to-depth and im2col paths vs plain conv.

All integer arithmetic — every lowering must be bit-exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from int8inferenceengine_tpu.ops import conv as conv_ops
from int8inferenceengine_tpu.ops.gemm_int8 import compute_offset


def _setup(h, ci, co, k, rng):
    x = jnp.asarray(rng.integers(0, 256, (2, h, h, ci), dtype=np.uint8))
    w = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co), dtype=np.int8))
    qb = jnp.asarray(rng.integers(-127, 128, (co,), dtype=np.int8))
    oc = compute_offset(qb, w.astype(jnp.int32).sum(axis=(0, 1, 2)),
                        scale_a=0.02, zp_a=127, recentered=True)
    kw = dict(scale_a=0.02, zp_a=127, scale_w=0.01, scale_c=0.05, zp_c=120)
    return x, w, oc, kw


def _plain_conv(x, w, oc, stride, padding, **kw):
    """conv2d_int8_xla with the space-to-depth rewrite disabled."""
    from jax import lax
    from int8inferenceengine_tpu.ops.quant import down_scale
    xs = (x.astype(jnp.int32) - 128).astype(jnp.int8)
    if padding:
        xs = jnp.pad(xs, ((0, 0), (padding, padding), (padding, padding),
                          (0, 0)), constant_values=int(kw["zp_a"]) - 128)
    acc = lax.conv_general_dilated(
        xs, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    acc = acc + oc.reshape(1, 1, 1, -1)
    return down_scale(acc, kw["scale_a"], kw["scale_w"], kw["scale_c"],
                      kw["zp_c"])


@pytest.mark.parametrize("h,ci,co,k,s,p", [
    (224, 3, 96, 11, 4, 2),   # AlexNet conv1 (space-to-depth fires)
    (28, 3, 16, 5, 2, 1),     # stride 2, odd remainder
    (16, 4, 8, 3, 3, 0),      # stride > padding, k == s
    (15, 2, 8, 4, 2, 2),      # even k, odd h
    (32, 8, 16, 5, 4, 0),     # k > s, no padding
])
def test_space_to_depth_bit_exact(h, ci, co, k, s, p):
    rng = np.random.default_rng(h + ci + k)
    x, w, oc, kw = _setup(h, ci, co, k, rng)
    want = np.asarray(_plain_conv(x, w, oc, s, p, **kw))
    got = np.asarray(conv_ops.conv2d_int8_xla(
        x, w, oc, stride=s, padding=p, relu=False, **kw))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_space_to_depth_only_fires_for_small_channel_counts():
    rng = np.random.default_rng(0)
    x, w, oc, kw = _setup(16, 64, 32, 3, rng)   # ci=64 >= 32: no rewrite
    want = np.asarray(_plain_conv(x, w, oc, 2, 1, **kw))
    got = np.asarray(conv_ops.conv2d_int8_xla(
        x, w, oc, stride=2, padding=1, relu=False, **kw))
    np.testing.assert_array_equal(got, want)


def test_im2col_gemm_matches_plain():
    """im2col+GEMM vs native conv: the integer accumulators are identical;
    the requant epilogues differ in float association (fused single multiply
    vs down_scale's two-step), so codes may differ by at most 1 on exact
    truncation boundaries."""
    rng = np.random.default_rng(7)
    x, w, oc, kw = _setup(14, 8, 16, 3, rng)
    want = np.asarray(_plain_conv(x, w, oc, 1, 1, **kw)).astype(np.int32)
    qw_kn = w.reshape(3 * 3 * 8, 16)
    got = np.asarray(conv_ops.conv2d_int8_gemm(
        x, qw_kn, oc, kh=3, kw=3, stride=1, padding=1, backend="xla",
        relu=False, **kw)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3
