"""Device mesh construction helpers.

The reference's entire parallelism story is single-node OpenMP + MKL threads
(reference: conv2d.cc:78,125; fully_connected.cc:31; CMakeLists.txt:17-30).
Its TPU-native equivalent is a named device mesh with a ``data`` axis (batch
sharding — what OpenMP-over-batch becomes) and a ``model`` axis (output-
channel sharding of conv/fc weights, activations all-gathered over ICI).
GSPMD/shard_map insert the collectives; multi-host runs ride DCN after
``jax.distributed.initialize()``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("data", "model"), devices=None) -> Mesh:
    """Build a (data, model) mesh.

    ``shape=None`` puts all devices on the data axis — pure DP, always valid.
    Pass e.g. ``(2, 4)`` for 2-way DP x 4-way TP.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry point: call before any jax op on each host.

    Thin wrapper over ``jax.distributed.initialize`` so serving scripts have
    one import; no-op if already initialized.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
