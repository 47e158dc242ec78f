"""MINE / CLUB mutual-information estimators.

Functional re-design of `TransformerTTS/model/MINE.py`: MINE with KL and
Rényi-β divergences and EMA smoothing of the exponential terms (:40-97), joint
vs marginal construction by shuffling one random text character across the
batch and shuffling speaker embeddings (:99-127); CLUB gives an MI upper bound
via a Gaussian conditional (:157-202).

State that the reference kept in a mutable ``mi_holder`` dict (smoothed exp
terms, MI loss, weight factor) lives in an explicit ``MIState`` pytree carried
through the jitted train step — deterministic and checkpointable.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .layers import (MineNetFirstOrder, MineNetSecondOrder, MineNetLinear,
                     MineNetLinearQ, CLUBNet)

PAIR_TYPES = ("style_text", "style_speaker", "text_speaker",
              "style_text_speaker")


@flax.struct.dataclass
class MIState:
    """Carried MI-estimation state (was `mi_holder`, train_autoregressive.py:103-108)."""
    exp_terms: jnp.ndarray      # (n_beta, 2) smoothed exp terms
    mi_loss: jnp.ndarray        # scalar, last total MI estimate
    smoothing_factor: float = flax.struct.field(pytree_node=False, default=1.0)
    weight_factor: float = flax.struct.field(pytree_node=False, default=0.1)

    @classmethod
    def create(cls, n_beta: int, smoothing_factor: float = 1.0,
               weight_factor: float = 0.1):
        return cls(exp_terms=jnp.ones((max(n_beta, 1), 2), jnp.float32),
                   mi_loss=jnp.zeros((), jnp.float32),
                   smoothing_factor=smoothing_factor,
                   weight_factor=weight_factor)


def measure_mi(joint, marginal, exp_terms, smoothing_factor: float,
               divergence_type: str, beta_values: Sequence[float]):
    """Donsker-Varadhan (KL) or Rényi-β MI lower bound with EMA-smoothed
    exponential terms and max-subtraction stabilization (MINE.py:40-97).

    Returns (mi, new_exp_terms)."""
    curr, prev = smoothing_factor, 1.0 - smoothing_factor
    joint = joint.astype(jnp.float32)
    marginal = marginal.astype(jnp.float32)
    if divergence_type == "KL":
        term1 = jnp.mean(joint)
        t2 = jnp.mean(jnp.exp(marginal))
        t2 = curr * t2 + prev * exp_terms[0, 1]
        mi = term1 - jnp.log(t2)
        return mi, exp_terms.at[0].set(jnp.stack([jnp.zeros(()), t2]))
    if divergence_type != "reyni":
        raise ValueError(f"divergence_type must be KL|reyni, got {divergence_type}")

    mi = jnp.zeros((), jnp.float32)
    new_rows = []
    for i, beta in enumerate(beta_values):
        p1, p2 = exp_terms[i, 0], exp_terms[i, 1]
        if beta == 0:
            max2 = jnp.max((1 - beta) * marginal)
            term1 = jnp.mean(joint)
            t2 = jnp.mean(jnp.exp((1 - beta) * marginal - max2))
            t2 = curr * t2 + prev * p2
            term2 = (1.0 / (1 - beta)) * (jnp.log(t2) + max2)
            t1 = jnp.zeros(())
        elif beta == 1:
            max1 = jnp.max(-beta * joint)
            t1 = jnp.mean(jnp.exp(-beta * joint - max1))
            t1 = curr * t1 + prev * p1
            term1 = -(1.0 / beta) * (jnp.log(t1) + max1)
            term2 = jnp.mean(marginal)
            t2 = jnp.zeros(())
        else:
            max1 = jnp.max(-beta * joint)
            max2 = jnp.max((1 - beta) * marginal)
            t1 = jnp.mean(jnp.exp(-beta * joint - max1))
            t1 = curr * t1 + prev * p1
            term1 = -(1.0 / beta) * (jnp.log(t1) + max1)
            t2 = jnp.mean(jnp.exp((1 - beta) * marginal - max2))
            t2 = curr * t2 + prev * p2
            term2 = (1.0 / (1 - beta)) * (jnp.log(t2) + max2)
        mi = mi + (term1 - term2)
        new_rows.append(jnp.stack([t1, t2]))
    return mi, jnp.stack(new_rows)


def _pick_random_char(text_embed, key):
    """Select one random character position: (b, n, d) -> (b, 1, d) (MINE.py:104-105)."""
    idx = jax.random.randint(key, (), 0, text_embed.shape[1])
    return jax.lax.dynamic_slice_in_dim(text_embed, idx, 1, axis=1)


def _shuffle_batch(x, key):
    return jax.random.permutation(key, x, axis=0)


def build_pairs(pair_type: str, text_embed, style_embed, speaker_embed, key):
    """Joint/marginal concat pairs by shuffling across the batch (MINE.py:99-127)."""
    k_char, k_text, k_spk = jax.random.split(key, 3)
    text_embed = _pick_random_char(text_embed, k_char)
    text_shuf = _shuffle_batch(text_embed, k_text)
    if pair_type == "style_text":
        joint = jnp.concatenate([style_embed, text_embed], -1)
        marginal = jnp.concatenate([style_embed, text_shuf], -1)
    elif pair_type == "style_speaker":
        joint = jnp.concatenate([style_embed, speaker_embed], -1)
        marginal = jnp.concatenate([style_embed, _shuffle_batch(speaker_embed, k_spk)], -1)
    elif pair_type == "text_speaker":
        joint = jnp.concatenate([text_embed, speaker_embed], -1)
        marginal = jnp.concatenate([text_embed, _shuffle_batch(speaker_embed, k_spk)], -1)
    elif pair_type == "style_text_speaker":
        joint = jnp.concatenate([style_embed, text_embed, speaker_embed], -1)
        marginal = jnp.concatenate(
            [style_embed, text_shuf, _shuffle_batch(speaker_embed, k_spk)], -1)
    else:
        raise ValueError(f"pair_type {pair_type!r} not supported")
    return joint, marginal


_CRITICS = {"first_order": MineNetFirstOrder, "linear": MineNetLinear,
            "linear_q": MineNetLinearQ, "second_order": MineNetSecondOrder}


class MINE(nn.Module):
    """MI lower-bound estimator over one embedding pair (MINE.py:15-154)."""
    pair_type: str
    divergence_type: str = "KL"
    beta_values: Sequence[float] = (0.0, 0.5, 1.0)
    dense_hidden_units: Sequence[int] = (512, 64)
    conv_filters: Sequence[int] = (2,)
    conv_kernel: int = 5
    critic: str = "first_order"
    dtype: Any = jnp.float32

    @property
    def n_beta(self) -> int:
        return len(self.beta_values) if self.divergence_type == "reyni" else 1

    @nn.compact
    def __call__(self, text_embed, style_embed, speaker_embed, state: MIState,
                 key):
        joint, marginal = build_pairs(self.pair_type, text_embed, style_embed,
                                      speaker_embed, key)
        if self.critic == "second_order":
            net = MineNetSecondOrder(filters=self.conv_filters,
                                     kernel_size=self.conv_kernel,
                                     dense_hidden_units=self.dense_hidden_units,
                                     dtype=self.dtype, name="MineNet")
        else:
            net = _CRITICS[self.critic](
                dense_hidden_units=self.dense_hidden_units,
                dtype=self.dtype, name="MineNet")
        mi, new_terms = measure_mi(net(joint), net(marginal), state.exp_terms,
                                   state.smoothing_factor,
                                   self.divergence_type, self.beta_values)
        return mi, new_terms


class CLUB(nn.Module):
    """Contrastive log-ratio upper bound of MI (MINE.py:157-202).

    Returns (lld, bound): maximize lld to train the variational net
    (gradient ascent, like MINE); ``bound`` is the MI upper bound."""
    pair_type: str
    dense_hidden_units: Sequence[int] = (512, 64)
    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embed, style_embed, speaker_embed, state: MIState,
                 key):
        k_char, k_text, k_spk = jax.random.split(key, 3)
        text_embed = _pick_random_char(text_embed, k_char)
        text_shuf = _shuffle_batch(text_embed, k_text)
        spk_shuf = (_shuffle_batch(speaker_embed, k_spk)
                    if speaker_embed is not None else None)
        net_mu = CLUBNet(self.dense_hidden_units, log_var=False,
                         out_dim=self.out_dim, dtype=self.dtype,
                         name="ClubNet_mu")
        net_lv = CLUBNet(self.dense_hidden_units, log_var=True,
                         out_dim=self.out_dim, dtype=self.dtype,
                         name="ClubNet_log_var")
        if self.pair_type == "style_text":
            cond, pos, neg = style_embed, text_embed, text_shuf
        elif self.pair_type == "style_speaker":
            cond, pos, neg = style_embed, speaker_embed, spk_shuf
        elif self.pair_type == "text_speaker":
            cond, pos, neg = text_embed, speaker_embed, spk_shuf
        else:
            raise ValueError(f"pair_type {self.pair_type!r} not supported")
        mu, log_var = net_mu(cond), net_lv(cond)
        positive = -(mu - pos) ** 2 / 2.0 / jnp.exp(log_var)
        negative = -(mu - neg) ** 2 / 2.0 / jnp.exp(log_var)
        lld = jnp.mean(jnp.sum(positive, -1))
        bound = jnp.mean(jnp.sum(positive, -1) - jnp.sum(negative, -1))
        return lld, bound
