"""Device-mesh + sharding helpers (DP over batch, SP over image height).

The reference is single-process single-GPU (SURVEY.md §2.7) — parallelism
here is a new, first-class subsystem: a ('data', 'spatial') mesh where
  - 'data'    shards the batch dimension (data parallelism; gradient
    psums ride ICI via GSPMD),
  - 'spatial' shards the image H dimension (the image analog of sequence
    parallelism; XLA inserts halo exchanges for convolutions
    automatically under GSPMD spatial partitioning).
Model/optimizer state is replicated — DeepLabv2-scale models fit
comfortably per chip, so TP/PP would only add latency. All collective
placement is left to GSPMD by jit-ing with NamedShardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    devs = np.asarray(devices[:n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(devs, ('data', 'spatial'))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 1) -> NamedSharding:
    """(B, H, W, C) arrays: batch on 'data', optionally H on 'spatial'."""
    if spatial_axis is None or mesh.shape['spatial'] == 1:
        return NamedSharding(mesh, P('data'))
    spec = [None] * 4
    spec[0] = 'data'
    spec[spatial_axis] = 'spatial'
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, spatial: bool = False):
    """Device-put a batch pytree with batch(+spatial) sharding; rank-3 labels
    (B, H, W) shard on the same axes."""

    def put(x):
        if not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        if x.ndim >= 3 and spatial and mesh.shape['spatial'] > 1:
            spec = ['data', 'spatial'] + [None] * (x.ndim - 2)
            sh = NamedSharding(mesh, P(*spec))
        else:
            sh = NamedSharding(mesh, P('data'))
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)
