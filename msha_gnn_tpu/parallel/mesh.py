"""Device mesh construction and sharding helpers.

The reference has no distributed support at all (SURVEY §2.4: no
torch.distributed/NCCL/MPI anywhere; single hard-coded ``cuda:2``).  The
TPU-native design scales through ``jax.sharding``: a 2-D logical mesh

* ``data``  — batch / node-partition axis (the GNN analog of DP+SP: edge
  minibatches and node-feature rows are sharded here; boundary features move
  via XLA-inserted all-gathers over ICI),
* ``model`` — feature/tensor-parallel axis (hidden dims of projections).

Collectives are never hand-rolled: shardings are declared and XLA inserts
``psum`` / ``all_gather`` / ``reduce_scatter`` over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data_axis: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over ``n_devices`` (default: all).

    ``data_axis`` fixes the data-parallel degree; by default the mesh is
    (n, 1) — pure data/graph partitioning, the right default for GNNs whose
    hidden dims (64-128) are too small to shard profitably.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data_axis is None:
        data_axis = n
    assert n % data_axis == 0, (n, data_axis)
    arr = np.asarray(devices).reshape(data_axis, n // data_axis)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """First axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def model_sharded_cols(mesh: Mesh) -> NamedSharding:
    """Last axis of a 2-D param over 'model' (tensor parallel)."""
    return NamedSharding(mesh, P(None, "model"))


def row_and_col_sharded(mesh: Mesh) -> NamedSharding:
    """2-D array: rows over 'data' (node partition), cols over 'model'."""
    return NamedSharding(mesh, P("data", "model"))
