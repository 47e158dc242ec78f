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
           "local_batch_slice", "init_multihost", "add_multihost_args",
           "maybe_init_multihost"]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Join the multi-host training job (SPMD over ICI/DCN).

    On Cloud TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly for manual/DCN clusters
    (``coordinator_address='host0:1234'``). Every host then sees the global
    device set in ``jax.devices()`` and runs the SAME program; GSPMD routes
    collectives over ICI within a slice and DCN across slices. Returns True
    if distributed mode is active (process_count > 1)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def add_multihost_args(parser):
    """argparse flags shared by every training driver."""
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize before device "
                             "use (multi-host SPMD training)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host0 address for manual clusters, e.g. "
                             "10.0.0.1:8476 (auto-detected on TPU pods)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def maybe_init_multihost(args) -> bool:
    """Driver entry: honor --multihost before any jax device call."""
    if getattr(args, "multihost", False):
        return init_multihost(args.coordinator_address, args.num_processes,
                              args.process_id)
    return False


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
    """Place a host batch with the leading dim sharded over ``axis``.

    Multi-host: pass each host its LOCAL slice (``local_batch_slice``); the
    global array is assembled across processes without any data transfer."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding,
                                                          np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def put(x):
        if multiproc:
            return jax.make_array_from_process_local_data(sharding,
                                                          np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, tree)


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


def local_shard(batch):
    """Slice a global batch down to this host's rows (no-op single-process).

    Multi-host drivers run the SAME deterministic dataset stream on every
    host (same seed) and keep only their slice; ``shard_batch`` then stitches
    the global array from the per-process pieces."""
    if jax.process_count() == 1:
        return batch

    def f(x):
        return x[local_batch_slice(np.shape(x)[0])]
    return jax.tree.map(f, batch)
