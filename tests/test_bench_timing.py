"""Regression tests for bench.py's two-point device timer.

Pins the round-5i fix: a stage whose output ignores the rng key (every
inference path with dropout off) is loop-invariant inside `_device_time`'s
chained fori_loop, XLA's loop-invariant code motion hoists it out of the
while loop, and the N-vs-2N delta measures 0.0 — the flat
`forward_tts_sec`/`tts_encode_sec` readings in the round-4/5 records.
`_key_dependent_tokens` routes the key into a consumed input through a
select XLA cannot constant-fold, making the stage loop-variant while
keeping numerics bit-identical.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _deterministic_stage_parts():
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(jax.random.PRNGKey(1), (64, 128))
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 128))
    tok = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 1, 63)
    return key, emb, w, tok


def _compute(emb, w, tok):
    x = emb[tok].mean(axis=1)
    for _ in range(6):
        x = jnp.tanh(x @ w)
    return x


class TestKeyDependentTokens:
    def test_numerically_identity(self):
        key, _, _, tok = _deterministic_stage_parts()
        out = bench._key_dependent_tokens(tok, key)
        assert out.dtype == tok.dtype
        assert (out == tok).all()

    def test_defeats_loop_invariant_hoisting(self):
        """The key-routed variant of a deterministic stage must time nonzero
        where the raw stage times ~0 (hoisted)."""
        key, emb, w, tok = _deterministic_stage_parts()

        hoisted = bench._device_time(
            lambda k: _compute(emb, w, tok), key, iters=32, n_trials=2)
        routed = bench._device_time(
            lambda k: _compute(emb, w, bench._key_dependent_tokens(tok, k)),
            key, iters=32, n_trials=2)

        # the hoisted stage's loop body is a scalar add: per-call "time"
        # collapses to the 1e-9 clamp / iters region, orders of magnitude
        # under the real compute cost the routed variant sees
        assert routed > 1e-7, f"routed stage still hoists: {routed}"
        assert routed > 50 * hoisted, (hoisted, routed)


class TestDeviceTimeKeyConsumingStage:
    def test_key_consuming_stage_times_nonzero(self):
        """Stages that already consume the key (sampling/dropout paths) keep
        working through the carry-threaded key construction."""
        key = jax.random.PRNGKey(7)
        w = jax.random.normal(jax.random.PRNGKey(8), (256, 256))

        def stage(k):
            x = jax.random.normal(k, (16, 256))
            for _ in range(12):
                x = jnp.tanh(x @ w)
            return x

        t = bench._device_time(stage, key, iters=32, n_trials=4)
        assert t > 1e-6


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
