"""Parallelism: device meshes, param sharding, shard_map execution.

Scope (SURVEY.md §2.4): the reference's only parallelism is single-node
OpenMP + MKL threads; its TPU-native equivalents here are

* **DP** — batch sharding over the ``data`` mesh axis (what
  OpenMP-over-batch becomes),
* **TP** — conv/fc output-channel sharding over the ``model`` axis,
  activations all-gathered over ICI; transformer Megatron roles
  (col_local / row) with bit-exact integer psums, incl. head-sharded
  KV-cache decode under shard_map,
* **EP** — expert parallelism for MoE models (sharding role 'expert':
  stacked [E, ...] expert weights split over the ``model`` axis, local
  dense compute + one psum combine; bit-exact at top_k <= 2 on the INT8
  path — layers.QuantMoE),
* **multi-host** — ``initialize_distributed()`` + a mesh spanning all
  devices; GSPMD routes collectives over ICI within a slice and DCN across
  hosts.

**PP and SP/CP are intentionally out of scope**, with reasons:

* *SP/CP (sequence/context parallelism)* targets attention over
  sequences too long for one chip's HBM.  This engine's u8 KV cache is
  already 4x smaller than f32 (a 2048-context gpt2-small cache is
  ~75 MB against 16 GB HBM), and the flat decode kernel's cost scales
  with the LIVE length — the memory wall SP answers is orders of
  magnitude away at the model sizes this framework targets.
* *PP (pipeline parallelism)* pays when a model's WEIGHTS exceed one
  chip (cross-host serving of 70B+ models).  At single-host scale,
  TP + EP cover the same chips with strictly better latency (no
  pipeline bubble, no microbatch scheduling) and keep the framework's
  bit-exactness story (integer partial sums; a pp implementation would
  add stage-boundary requant decisions for no capacity need).  The
  natural implementation here — stages as a stacked leading axis over
  same-shaped blocks, ppermute between stages — additionally requires
  per-block calibration scales to become traced arrays (today they are
  static Python floats baked into the program, deliberately: XLA
  constant-folds them into the requant multipliers).

The mesh machinery is axis-name-generic, so adding a ``pipe`` or ``seq``
axis later is a mesh-shape change, not a redesign.
"""

from .mesh import initialize_distributed, make_mesh

__all__ = ["make_mesh", "initialize_distributed"]
