"""Tensor parallelism by parameter-sharding rules.

The reference is single-GPU (SURVEY §2.5); this module provides the TPU-native
scale-up story beyond data parallelism: megatron-style sharding of the
transformer's matmuls over a 'model' mesh axis, expressed purely as
NamedShardings on the parameter pytree — XLA GSPMD propagates the layouts and
inserts the all-reduces, so the flax modules stay unchanged.

Rules (column-parallel then row-parallel, so each block needs one psum):
  - FFN: d1 kernel (d, ffn) -> P(None, 'model'); d2 kernel (ffn, d) ->
    P('model', None)
  - attention: wq/wk/wv kernels -> P(None, 'model'); the output `dense`
    kernel (d + d_attn, d) -> P('model', None) would be wrong here because the
    reference concatenates the raw query input before the projection
    (layers.py:144) — only the attention half of its input is head-sharded —
    so it stays replicated.
  - embeddings (vocab, d) shard the vocab axis (row-sharded lookup table)
  - FinalProj (d, mel*max_r) is column-parallel (the r-slice touches a prefix
    of shards; GSPMD gathers only what the slice needs)
  - WaveRNN: the I/fc1/fc2/fc3 projections are column-parallel; the GRU gate
    matrices stay replicated (the r/z/n gate slicing crosses shard boundaries
    of the 3d axis and would force per-gate resharding)
  - biases of column-parallel layers shard on their output axis.
Everything unmatched is replicated.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_specs", "apply_tp_sharding", "shard_train_state"]

_COLUMN_PARALLEL = re.compile(
    r"(ffn/d1|mha/wq|mha/wk|mha/wv|FinalProj|(^|/)(I|fc1|fc2|fc3))$")
_ROW_PARALLEL = re.compile(r"(ffn/d2)$")


def tp_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for megatron-style TP over ``model_axis``."""

    def spec_for(path, leaf):
        pathstr = "/".join(str(getattr(p, "key", p)) for p in path[:-1])
        name = str(getattr(path[-1], "key", path[-1]))
        if leaf.ndim == 0:
            return P()
        if name == "embedding" and leaf.ndim == 2:
            return P(model_axis, None)
        if _COLUMN_PARALLEL.search(pathstr):
            if name == "kernel" and leaf.ndim == 2:
                return P(None, model_axis)
            if name == "bias" and leaf.ndim == 1:
                return P(model_axis)
        if _ROW_PARALLEL.search(pathstr):
            if name == "kernel" and leaf.ndim == 2:
                return P(model_axis, None)
            return P()  # row-parallel bias replicated (added after psum)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_tp_sharding(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place params with TP shardings over ``mesh`` (others replicated)."""
    specs = tp_param_specs(params, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_train_state(state, mesh: Mesh, model_axis: str = "model",
                      data_axis: str = "data"):
    """Shard a TrainState: params + matching opt-state moments by TP rules,
    everything else replicated."""
    del data_axis
    specs = tp_param_specs(state.params, model_axis)

    def put_like(tree):
        """Shard any subtree that mirrors the param structure (Adam mu/nu)."""
        try:
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                tree, specs)
        except ValueError:
            return jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)

    params = put_like(state.params)

    def map_opt(node):
        # optax states are namedtuples/pytrees; shard param-shaped leaves
        if hasattr(node, "_fields"):
            return type(node)(*[map_opt(getattr(node, f))
                                for f in node._fields])
        if isinstance(node, (list, tuple)):
            return type(node)(map_opt(x) for x in node)
        if isinstance(node, dict):
            return {k: map_opt(v) for k, v in node.items()}
        return put_like(node) if _same_structure(node, state.params) else \
            jax.device_put(node, NamedSharding(mesh, P()))

    def _same_structure(a, b):
        try:
            return (jax.tree_util.tree_structure(a)
                    == jax.tree_util.tree_structure(b))
        except Exception:  # noqa: BLE001
            return False

    opt_state = map_opt(state.opt_state)
    rest = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        {"batch_stats": state.batch_stats, "step": state.step})
    return state.replace(params=params, opt_state=opt_state,
                         batch_stats=rest["batch_stats"], step=rest["step"])
