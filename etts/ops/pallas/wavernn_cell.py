"""Fused WaveRNN sampling loop as a Pallas TPU kernel.

The reference's generation bottleneck is the per-sample sequential cell
(`WaveRNN/models/fatchord_version.py:180-220`): at 16 kHz each emitted sample
needs 2 GRU-hidden matmuls + 2 FC matmuls on the sample path. Under `lax.scan`
XLA re-streams the ~14 MB of weights from HBM every step, so generation is
HBM-bandwidth-bound. This kernel keeps ALL recurrent weights resident in VMEM
for the whole waveform, pipelines the per-timestep conditioning streams
(precomputed by big batched matmuls outside the kernel) through Pallas'
block pipeline, and runs the mixture-of-logistics / categorical sampling with
the on-core PRNG — HBM traffic drops to just the conditioning streams.

Inputs (all conditioning projections precomputed, see
`etts.models.wavernn.generate`):
  i_static   (T, B, d)    I(cond) + b_I per step
  gi2_static (T, B, 3d)   a2 @ W2_a + b_i2
  f1_static  (T, B, fc)   a3 @ Wf1_a + b_f1
  f2_static  (T, B, fc)   a4 @ Wf2_a + b_f2
weights: I_x (1, d), rnn1 wi/wh/bi/bh, rnn2 wx/wh/bh, fc1_x (d, fc),
fc2_x (fc, fc), fc3 (fc, n_out_padded) + bias.

Output: samples (T, B) float32 in [-1, 1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pallas_available = True
except ImportError:  # pragma: no cover
    pallas_available = False

LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _uniform_from_bits(bits):
    """uint32 random bits -> float32 uniform in (eps, 1-eps).

    Mosaic has no uint32->float32 convert; use the mantissa/exponent bitcast
    trick: (bits >> 9) | 0x3F800000 reinterpreted as float32 is uniform in
    [1, 2)."""
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    fbits = jax.lax.bitwise_or(mant, jnp.uint32(0x3F800000))
    u = pltpu.bitcast(fbits, jnp.float32) - 1.0
    return jnp.clip(u, 1e-5, 1.0 - 1e-5)


def _make_kernel(T, B, d, fc, n_out, chunk, mode, nr_mix, n_classes,
                 log_scale_min):
    gate = 3 * d

    def kernel(seed_ref,  # SMEM (1,)
               i_ref, gi2_ref, f1_ref, f2_ref,  # VMEM blocks (chunk, B, .)
               ix_ref, wi1_ref, wh1_ref, bi1_ref, bh1_ref,
               w2x_ref, wh2_ref, bh2_ref,
               wf1x_ref, wf2x_ref, wf3_ref, bf3_ref,
               out_ref,  # VMEM (chunk, B)
               h1_ref, h2_ref, x_ref):  # scratch carries (B, d)/(B, LANE)
        ci = pl.program_id(0)

        @pl.when(ci == 0)
        def _init():
            pltpu.prng_seed(seed_ref[0])
            h1_ref[:] = jnp.zeros((B, d), jnp.float32)
            h2_ref[:] = jnp.zeros((B, d), jnp.float32)
            x_ref[:] = jnp.zeros((B, LANE), jnp.float32)

        def step(t, _):
            x_prev = x_ref[:, :1]  # (B, 1)
            inp = i_ref[t].astype(jnp.float32) + x_prev * ix_ref[0][None, :]
            h1 = h1_ref[:]
            wdt = wi1_ref.dtype
            gi1 = jnp.dot(inp.astype(wdt), wi1_ref[:],
                          preferred_element_type=jnp.float32) + bi1_ref[0]
            gh1 = jnp.dot(h1.astype(wdt), wh1_ref[:],
                          preferred_element_type=jnp.float32) + bh1_ref[0]
            r = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
            z = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
            n = jnp.tanh(gi1[:, 2 * d:] + r * gh1[:, 2 * d:])
            h1 = (1.0 - z) * n + z * h1
            h1_ref[:] = h1
            x = inp + h1
            gi2 = jnp.dot(x.astype(wdt), w2x_ref[:],
                          preferred_element_type=jnp.float32) \
                + gi2_ref[t].astype(jnp.float32)
            h2 = h2_ref[:]
            gh2 = jnp.dot(h2.astype(wdt), wh2_ref[:],
                          preferred_element_type=jnp.float32) + bh2_ref[0]
            r = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
            z = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
            n = jnp.tanh(gi2[:, 2 * d:] + r * gh2[:, 2 * d:])
            h2 = (1.0 - z) * n + z * h2
            h2_ref[:] = h2
            x = x + h2
            y = jnp.maximum(jnp.dot(x.astype(wdt), wf1x_ref[:],
                                    preferred_element_type=jnp.float32)
                            + f1_ref[t].astype(jnp.float32), 0.0)
            y = jnp.maximum(jnp.dot(y.astype(wdt), wf2x_ref[:],
                                    preferred_element_type=jnp.float32)
                            + f2_ref[t].astype(jnp.float32), 0.0)
            logits = jnp.dot(y.astype(wdt), wf3_ref[:],
                             preferred_element_type=jnp.float32) + bf3_ref[0]
            # ---- sampling ----
            bits = pltpu.prng_random_bits((B, n_out))
            u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
            col = jax.lax.broadcasted_iota(jnp.int32, (B, n_out), 1)
            if mode == "MOL":
                logit_probs = jnp.where(col < nr_mix, logits, -1e9)
                gumbel = logit_probs - jnp.log(-jnp.log(u))
                gumbel = jnp.where(col < nr_mix, gumbel, -jnp.inf)
                kmax = jnp.argmax(gumbel, axis=-1)  # (B,)
                onehot = (col == kmax[:, None]).astype(jnp.float32)
                means = jnp.sum(
                    jnp.where((col >= nr_mix) & (col < 2 * nr_mix), logits, 0.0)
                    * pltpu.roll(onehot, nr_mix, 1), axis=-1)
                log_s = jnp.sum(
                    jnp.where((col >= 2 * nr_mix) & (col < 3 * nr_mix),
                              logits, 0.0)
                    * pltpu.roll(onehot, 2 * nr_mix, 1), axis=-1)
                log_s = jnp.maximum(log_s, log_scale_min)
                u2 = _uniform_from_bits(pltpu.bitcast(
                    pltpu.prng_random_bits((B, LANE)), jnp.uint32))[:, 0]
                sample = means + jnp.exp(log_s) * (jnp.log(u2)
                                                   - jnp.log1p(-u2))
                sample = jnp.clip(sample, -1.0, 1.0)
            else:  # RAW categorical over n_classes
                logit_probs = jnp.where(col < n_classes, logits, -1e9)
                gumbel = logit_probs - jnp.log(-jnp.log(u))
                gumbel = jnp.where(col < n_classes, gumbel, -jnp.inf)
                cls = jnp.argmax(gumbel, axis=-1).astype(jnp.float32)
                sample = 2.0 * cls / (n_classes - 1.0) - 1.0
            out_ref[t, :] = sample
            x_ref[:] = jnp.broadcast_to(sample[:, None], (B, LANE))
            return 0

        jax.lax.fori_loop(0, chunk, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "n_classes",
                                             "log_scale_min", "chunk",
                                             "interpret", "weight_dtype"))
def wavernn_sample_loop(i_static, gi2_static, f1_static, f2_static,
                        ix, wi1, wh1, bi1, bh1, w2x, wh2, bh2,
                        wf1x, wf2x, wf3, bf3, seed, *,
                        mode: str = "MOL", n_classes: int = 30,
                        log_scale_min: float = float(np.log(1e-14)),
                        chunk: int = 32, interpret: bool = False,
                        weight_dtype=jnp.bfloat16):
    """Run the fused sampling loop. Stream args are (T, B, .), weights 2-D.

    Returns samples (T, B) float32.
    """
    T, B, d = i_static.shape
    fc = wf1x.shape[1]
    nr_mix = wf3.shape[1] // 3 if mode == "MOL" else 0
    n_out = _round_up(max(wf3.shape[1], 8), LANE)

    # auto-shrink the stream chunk so double-buffered blocks + VMEM-resident
    # weights stay under the ~16MB VMEM budget for any fold count B
    stream_bytes_per_step = B * (3 * d + d + 2 * fc) * 2  # bf16
    budget = 6 * 1024 * 1024  # streams' share of VMEM (2 buffers)
    max_chunk = max(8, (budget // (2 * stream_bytes_per_step)) // 8 * 8)
    chunk = min(chunk, max_chunk)

    # pad time to a chunk multiple, outputs trimmed after
    T_pad = _round_up(T, chunk)
    pad_t = T_pad - T
    stream_dtype = jnp.bfloat16
    streams = [jnp.pad(s, ((0, pad_t), (0, 0), (0, 0))).astype(stream_dtype)
               for s in (i_static, gi2_static, f1_static, f2_static)]
    wf3_p = jnp.pad(wf3, ((0, 0), (0, n_out - wf3.shape[1])))
    bf3_p = jnp.pad(bf3.reshape(1, -1),
                    ((0, 0), (0, n_out - wf3.shape[1])),
                    constant_values=-1e9 if mode != "MOL" else 0.0)

    kernel = _make_kernel(T_pad, B, d, fc, n_out, chunk, mode, nr_mix,
                          n_classes, log_scale_min)
    grid = (T_pad // chunk,)
    stream_spec = lambda dim: pl.BlockSpec(
        (chunk, B, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed
            stream_spec(d), stream_spec(3 * d), stream_spec(fc),
            stream_spec(fc),
            wspec((1, d)),                                    # I_x
            wspec((d, 3 * d)), wspec((d, 3 * d)),             # wi1, wh1
            wspec((1, 3 * d)), wspec((1, 3 * d)),             # bi1, bh1
            wspec((d, 3 * d)), wspec((d, 3 * d)),             # w2x, wh2
            wspec((1, 3 * d)),                                # bh2
            wspec((d, fc)), wspec((fc, fc)),                  # wf1x, wf2x
            wspec((fc, n_out)), wspec((1, n_out)),            # wf3, bf3
        ],
        out_specs=pl.BlockSpec((chunk, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),    # h1
            pltpu.VMEM((B, d), jnp.float32),    # h2
            pltpu.VMEM((B, LANE), jnp.float32),  # x carry
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(jnp.asarray([seed], jnp.int32),
      *streams,
      ix.reshape(1, d).astype(jnp.float32),
      wi1.astype(weight_dtype), wh1.astype(weight_dtype),
      bi1.reshape(1, -1).astype(jnp.float32),
      bh1.reshape(1, -1).astype(jnp.float32),
      w2x.astype(weight_dtype), wh2.astype(weight_dtype),
      bh2.reshape(1, -1).astype(jnp.float32),
      wf1x.astype(weight_dtype), wf2x.astype(weight_dtype),
      wf3_p.astype(weight_dtype), bf3_p.astype(jnp.float32))
    return out[:T]
