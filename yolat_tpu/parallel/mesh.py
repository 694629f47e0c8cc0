"""Device-mesh helpers.

The framework's parallelism story (SURVEY.md section 2.5): the reference is
single-GPU with a broken DataParallel vestige; the TPU-native first-class
axes are (a) data parallelism over a 1-D ('data',) mesh — shard_map with
psum'd gradients and synced BatchNorm moments (train/loop.py) — and (b)
host data-pipeline parallelism. TP/PP/EP have no counterpart at this model
scale (~1-2M params) and are deliberately out of scope.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis,))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "data"):
    """Shard every array's leading axis across the mesh axis (scalars
    replicated)."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim > 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)
