"""Parallelism: device meshes, param sharding, shard_map execution.

Scope (SURVEY.md §2.4): the reference's only parallelism is single-node
OpenMP + MKL threads; its TPU-native equivalents here are

* **DP** — batch sharding over the ``data`` mesh axis (what
  OpenMP-over-batch becomes),
* **TP** — conv/fc output-channel sharding over the ``model`` axis,
  activations all-gathered over ICI,
* **multi-host** — ``initialize_distributed()`` + a mesh spanning all
  devices; GSPMD routes collectives over ICI within a slice and DCN across
  hosts.

**PP, EP, and SP/CP are intentionally out of scope** for these CNN inference
workloads: there are no pipeline stages worth cutting at CNN depth, no
experts, and no sequence dimension (the scaling axes are batch and
channels).  The mesh machinery is axis-name-generic, so adding a ``pipe``
or ``seq`` axis later is a mesh-shape change, not a redesign.
"""

from .mesh import initialize_distributed, make_mesh

__all__ = ["make_mesh", "initialize_distributed"]
