"""Parallelism layer — SURVEY.md §3 C23 / §6.

The reference is single-process, single-GPU with no distributed support; the
TPU rebuild provides data parallelism (batch sharding) over a v5e slice via
`jax.sharding.Mesh` + jit-with-shardings. XLA emits the collectives (psum
grad all-reduce in training) over ICI; multi-host would ride DCN via
jax.distributed.initialize without code changes here.

TP/PP/EP/CP are deliberately out of scope: the model is a ~25M-param CNN +
geometry pipeline with no attention — DP over the batch/frame axis is the
only strategy the workload can use (SURVEY.md §3 C23). The vertex axis stays
per-chip (the (B,K)x(K,3N) synthesis matmul fits easily in HBM); if 512x512
rendering pressures memory, the rasterizer's image-tile grid shards instead.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the visible (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place host arrays on the mesh, leading axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_axis1(mesh: Mesh, batch: Any) -> Any:
    """Place host arrays on the mesh with axis 1 sharded (chunked training:
    (steps, batch, ...) stacks keep the step axis whole per device)."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
