"""Masked losses (parity with `TransformerTTS/utils/losses.py`).

Reduction convention matters: the reference uses Keras losses with
``sample_weight``, whose default reduction divides by the TOTAL number of
positions (masked included), not by the mask sum. The golden values in
`TransformerTTS/tests/test_loss.py` pin this down and are reproduced in
``tests/test_losses.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "new_scaled_crossentropy", "masked_crossentropy",
    "masked_mean_squared_error", "masked_mean_absolute_error",
    "l1_loss", "l2_loss", "weighted_sum_losses",
]


def _weighted_mean(per_pos_loss, weights):
    """sum(loss * w) / total_positions — the Keras sample_weight reduction."""
    return jnp.sum(per_pos_loss * weights) / per_pos_loss.size


def _sparse_ce(targets, logits):
    """Per-position sparse categorical crossentropy from logits."""
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    return -jnp.sum(onehot * logz, axis=-1)


def new_scaled_crossentropy(index: int = 2, scaling: float = 1.0):
    """Masked CE upweighting the stop class ``index`` by ``scaling``
    (`utils/losses.py:4-21`; stop class 2 scaled x8 in training)."""

    def loss_fn(targets, logits):
        ce = _sparse_ce(targets, logits)
        padding = (targets != 0).astype(jnp.float32)
        stop = (targets == index).astype(jnp.float32) * (scaling - 1.0)
        return _weighted_mean(ce, padding + stop)

    return loss_fn


def masked_crossentropy(targets, logits):
    ce = _sparse_ce(targets, logits)
    mask = (targets != 0).astype(jnp.float32)
    return _weighted_mean(ce, mask)


def _channel_mask(targets):
    """(b, t, c) -> (b, t) mask: position is real iff any channel != 0."""
    return jnp.max((targets != 0).astype(jnp.float32), axis=-1)


def masked_mean_squared_error(targets, logits):
    diff = targets.astype(jnp.float32) - logits.astype(jnp.float32)
    per_pos = jnp.mean(jnp.square(diff), axis=-1)
    return _weighted_mean(per_pos, _channel_mask(targets))


def masked_mean_absolute_error(targets, logits):
    diff = targets.astype(jnp.float32) - logits.astype(jnp.float32)
    per_pos = jnp.mean(jnp.abs(diff), axis=-1)
    return _weighted_mean(per_pos, _channel_mask(targets))


def l1_loss(targets, logits):
    return jnp.mean(jnp.abs(targets - logits))


def l2_loss(targets, logits):
    return jnp.mean(jnp.square(targets - logits))


def weighted_sum_losses(targets, pred, loss_functions, coeffs):
    """(total, [losses]) over parallel target/pred/loss triples
    (`utils/losses.py:71-78`)."""
    loss_vals = [loss_functions[i](targets[i], pred[i])
                 for i in range(len(loss_functions))]
    total = sum(c * l for c, l in zip(coeffs, loss_vals))
    return total, loss_vals
