"""Ring TP GEMM: bit-exact vs gather-then-GEMM on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from int8inferenceengine_tpu.ops.gemm_int8 import compute_offset
from int8inferenceengine_tpu.parallel.mesh import make_mesh
from int8inferenceengine_tpu.parallel.overlap import (
    ring_linear_reference, ring_qgemm)

KW = dict(scale_a=0.025, zp_a=127, scale_w=0.01, scale_c=0.05, zp_c=93)


@pytest.mark.parametrize("p", [2, 4, 8])
@pytest.mark.parametrize("relu", [False, True])
def test_ring_qgemm_matches_gathered(p, relu):
    rng = np.random.default_rng(p)
    m, k, n = 32, 64 * p, 16 * p
    a = rng.integers(0, 256, (m, k), dtype=np.uint8)
    w = rng.integers(-127, 128, (k, n), dtype=np.int8)
    qb = rng.integers(-127, 128, (n,), dtype=np.int8)
    oc = np.asarray(compute_offset(
        jnp.asarray(qb), jnp.asarray(w.astype(np.int32).sum(axis=0)),
        scale_a=KW["scale_a"], zp_a=KW["zp_a"], recentered=True))

    want = np.asarray(ring_linear_reference(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(oc), relu=relu, **KW))

    import jax as _jax
    mesh = make_mesh((1, p), devices=_jax.devices()[:p])

    def local_fn(a_chunk, w_local, oc_local):
        return ring_qgemm(a_chunk, w_local, oc_local,
                          axis_name="model", axis_size=p, relu=relu, **KW)

    got = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P("model")),
        out_specs=P(None, "model"),
        check_vma=False,
    ))(jnp.asarray(a), jnp.asarray(w), jnp.asarray(oc))

    np.testing.assert_array_equal(np.asarray(got), want)


def test_ring_qgemm_batch_sharded_too():
    """DP x TP: batch over 'data', ring over 'model'."""
    p, d = 4, 2
    rng = np.random.default_rng(0)
    m, k, n = 16 * d, 32 * p, 8 * p
    a = rng.integers(0, 256, (m, k), dtype=np.uint8)
    w = rng.integers(-127, 128, (k, n), dtype=np.int8)
    qb = rng.integers(-127, 128, (n,), dtype=np.int8)
    oc = np.asarray(compute_offset(
        jnp.asarray(qb), jnp.asarray(w.astype(np.int32).sum(axis=0)),
        scale_a=KW["scale_a"], zp_a=KW["zp_a"], recentered=True))
    want = np.asarray(ring_linear_reference(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(oc), relu=False, **KW))

    mesh = make_mesh((d, p))

    def local_fn(a_chunk, w_local, oc_local):
        return ring_qgemm(a_chunk, w_local, oc_local,
                          axis_name="model", axis_size=p, relu=False, **KW)

    got = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("data", "model"), P(None, "model"), P("model")),
        out_specs=P("data", "model"),
        check_vma=False,
    ))(jnp.asarray(a), jnp.asarray(w), jnp.asarray(oc))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("name,batch", [("lenet", 16), ("fc_mnist", 32)])
def test_module_overlap_equals_gather_mode(name, batch):
    """shard(overlap=True) must be bit-identical to gather mode and to the
    unsharded run (integer partial sums are exact)."""
    import torch
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models

    torch.set_num_threads(1)
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    shape = (batch,) + mm.INPUT_SHAPE
    rng = np.random.default_rng(1)
    mm.prepare()
    mm(q.tensor(np.float32(rng.uniform(-1, 1, shape))))
    mm.convert()
    x = np.float32(rng.uniform(-1, 1, shape))
    base = mm(q.tensor(x)).numpy()

    mm.shard(make_mesh((2, 4)), overlap=True)
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)


def test_module_overlap_alexnet_fc_chain():
    """AlexNet's fc1->fc2->fc3 chain under overlap: fc2 ring-consumes fc1's
    sharded output; fc3 (10 outputs, replicated) gathers lazily."""
    import torch
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models

    torch.set_num_threads(1)
    tm = models.torch_twin("alexnet")
    mm = models.build("alexnet")
    mm.load(tm.state_dict())
    x = np.float32(np.random.default_rng(0).uniform(-1, 1, (2, 3, 224, 224)))
    mm.prepare()
    mm(q.tensor(x))
    mm.convert()
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((1, 8)), overlap=True)
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)
