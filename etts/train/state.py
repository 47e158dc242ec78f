"""Train state + optimizer factory.

Optimizer parity with the reference: Adam(beta1=0.9, beta2=0.98, eps=1e-9)
(`config_manager.py:171-176`) with the learning rate driven by the
piecewise-linear schedule arrays *inside* the jitted step (jnp.interp), so lr
changes never retrace. Optional parameter freezing (the pretrained text-encoder
transplant freeze, `train_autoregressive.py:136-169`) via optax.masked.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["TrainState", "make_optimizer", "interp_schedule"]


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(params=params, opt_state=tx.init(params),
                   batch_stats=variables.get("batch_stats", {}),
                   step=jnp.zeros((), jnp.int32))

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def interp_schedule(schedule) -> Callable:
    """[[step, value], ...] -> jnp schedule fn (piecewise-linear, clamped)."""
    arr = np.asarray(schedule, np.float32)
    xs, ys = jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1])
    return lambda step: jnp.interp(jnp.asarray(step, jnp.float32), xs, ys)


def make_optimizer(lr_schedule, b1=0.9, b2=0.98, eps=1e-9,
                   clip_norm: Optional[float] = None,
                   frozen_mask: Optional[Any] = None) -> optax.GradientTransformation:
    """Adam with optional global-norm clip (Tacotron uses 1.0,
    `gst_tacotron/models/tacotron.py:197`) and optional freeze mask
    (True = frozen)."""
    if isinstance(lr_schedule, (list, tuple, np.ndarray)):
        lr_schedule = interp_schedule(lr_schedule)
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.adam(lr_schedule, b1=b1, b2=b2, eps=eps))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask), tx)
    return tx
