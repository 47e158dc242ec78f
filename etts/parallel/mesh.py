"""Device mesh + sharding helpers (the `dist` module the reference lacks).

The reference has no multi-device code at all (SURVEY §2.5). Here the
TPU-native story: a 1-D (or 2-D) `jax.sharding.Mesh`, batches sharded over the
'data' axis, parameters replicated; under `jit`, XLA GSPMD inserts the psum
for gradient reduction over ICI automatically. Multi-host: call
`jax.distributed.initialize()` before `make_mesh` and feed each host its
`local_batch_slice`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_jit",
           "local_batch_slice"]


def make_mesh(axis_names: Sequence[str] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D data-parallel mesh over every device. For model parallelism
    pass e.g. axis_names=('data', 'model'), axis_sizes=(-1, 4).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) if len(axis_names) == 1 else None
    if axis_sizes is None:
        raise ValueError("axis_sizes required for multi-axis meshes")
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, tuple(axis_names))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with the leading dim sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(fn, mesh: Mesh, donate_argnums=(), **jit_kwargs):
    """jit a train step for data parallelism: caller shards batches with
    `shard_batch` and replicates states with `replicate`; GSPMD handles the
    gradient all-reduce."""
    return jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-sharded batch (multi-host DP)."""
    per = global_batch_size // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
