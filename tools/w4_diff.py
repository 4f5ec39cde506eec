"""Quantify on-chip W4 pallas-vs-xla numeric difference at the op level."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu.ops import w4 as W

rng = np.random.default_rng(0)
m, k, n, g = 8, 768, 768, 64
wf = rng.normal(0, 0.05, (n, k)).astype(np.float32)
packed, scales = W.pack_w4(jnp.asarray(wf), group=g)
x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
b = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)

o_x = np.asarray(W.w4_matmul_xla(x, packed, scales, b, k, g))
o_p = np.asarray(W.w4_matmul_pallas(x, packed, scales, b, k, g))
# float64 numpy oracle on the dequantized weights
wdq = np.asarray(W.dequant_w4(packed, scales, k, g), np.float64)
o_ref = np.asarray(x, np.float64) @ wdq.T + np.asarray(b, np.float64)

for name, o in (("xla", o_x), ("pallas", o_p)):
    err = np.abs(o - o_ref)
    rel = err / (np.abs(o_ref) + 1e-6)
    print(f"{name}: max abs err vs f64 {err.max():.3e}, "
          f"median rel {np.median(rel):.3e}", flush=True)
print("pallas vs xla max abs diff:", np.abs(o_p - o_x).max(), flush=True)
