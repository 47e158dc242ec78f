"""Fused WaveRNN sampling loop as a Pallas TPU kernel.

The reference's generation bottleneck is the per-sample sequential cell
(`WaveRNN/models/fatchord_version.py:180-220`): every emitted sample needs two
GRU-hidden matmuls + FC matmuls on the sample path. Under `lax.scan` XLA
re-streams the ~14 MB of weights from HBM each step, so generation is
HBM-bandwidth-bound. This kernel:

  - keeps ALL weights (bf16, ~8 MB) resident in VMEM for the entire waveform;
  - streams the RAW per-step conditioning (mel + 4 aux splits, ~208 columns)
    through the Pallas block pipeline and applies the conditioning projections
    *in-kernel* — 15x less stream memory/HBM traffic than streaming the
    projected activations, which keeps the pipeline chunk large even at high
    fold counts (multi-utterance serving);
  - samples (mixture-of-logistics gumbel pick + logistic inverse-CDF, or
    categorical) with the on-core PRNG.

Stream layout: cond (T, B, feat + 4*aux) = [mels_up | a1 | a2 | a3 | a4].
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


def _make_kernel(B, d, fc, feat, adim, n_out, chunk, mode, nr_mix, n_classes,
                 log_scale_min, T_real, quant=False, quant_mxu=False):
    def kernel(seed_ref,            # SMEM (1,)
               cond_ref,            # VMEM block (chunk, B, feat + 4*adim)
               ix_ref, wic_ref, bi_ref,          # I: x row, cond kernel, bias
               wi1_ref, wh1_ref, bi1_ref, bh1_ref,
               w2x_ref, w2a_ref, wh2_ref, bi2_ref, bh2_ref,
               wf1x_ref, wf1a_ref, bf1_ref,
               wf2x_ref, wf2a_ref, bf2_ref,
               wf3_ref, bf3_ref, clsv_ref,
               h10_ref, h20_ref, x0_ref,         # initial state (streaming)
               *rest):
        if quant or quant_mxu:
            # 11 per-column scale rows follow the state inputs (int8 modes)
            (s_wic_ref, s_wi1_ref, s_wh1_ref, s_w2x_ref, s_w2a_ref,
             s_wh2_ref, s_wf1x_ref, s_wf1a_ref, s_wf2x_ref, s_wf2a_ref,
             s_wf3_ref, out_ref, h1o_ref, h2o_ref, xo_ref,
             h1_ref, h2_ref, x_ref) = rest
        else:
            (out_ref, h1o_ref, h2o_ref, xo_ref,
             h1_ref, h2_ref, x_ref) = rest
            s_wic_ref = s_wi1_ref = s_wh1_ref = s_w2x_ref = s_w2a_ref = None
            s_wh2_ref = s_wf1x_ref = s_wf1a_ref = s_wf2x_ref = None
            s_wf2a_ref = s_wf3_ref = None

        def wdot(act, w_ref, s_ref):
            """act @ weights with optional int8 weights (per-column scales).

            ``quant`` (dequant path): the VMEM read streams HALF the bytes of
            bf16 — the row-count-independent floor of the step time — but the
            i8->bf16 convert touches every weight element on the VPU each
            step, which round-4 measured as a net LOSS at B=8.
            ``quant_mxu``: int8 x int8 dots run NATIVELY on the MXU (int32
            accumulate) with per-step per-row dynamic activation quantization
            — the convert work drops from O(weights) to O(activations),
            keeping the halved weight stream as pure win."""
            if quant_mxu:
                act = act.astype(jnp.float32)
                sa = jnp.maximum(jnp.max(jnp.abs(act), axis=-1,
                                         keepdims=True), 1e-9) / 127.0
                q = jnp.clip(jnp.round(act / sa), -127.0, 127.0
                             ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    q, w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32) * sa * s_ref[0]
            if quant:
                out = jnp.dot(act, w_ref[:].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                return out * s_ref[0]
            return jnp.dot(act, w_ref[:],
                           preferred_element_type=jnp.float32)

        ci = pl.program_id(0)
        n_chunks = pl.num_programs(0)

        @pl.when(ci == 0)
        def _init():
            pltpu.prng_seed(seed_ref[0])
            h1_ref[:] = h10_ref[:]
            h2_ref[:] = h20_ref[:]
            x_ref[:] = x0_ref[:]

        def step_masked(t, _):
            # padded tail steps (>= T_real) must not advance the carried
            # state (streaming chunks depend on the exact final state)
            @pl.when(ci * chunk + t < T_real)
            def _():
                step(t, 0)
            return 0

        def step(t, _):
            wdt = (jnp.float32 if quant_mxu
                   else jnp.bfloat16 if quant else wi1_ref.dtype)
            cond = cond_ref[t].astype(wdt)  # (B, feat+4*adim)
            mel_a1 = cond[:, :feat + adim]
            a2 = cond[:, feat + adim:feat + 2 * adim]
            a3 = cond[:, feat + 2 * adim:feat + 3 * adim]
            a4 = cond[:, feat + 3 * adim:feat + 4 * adim]
            x_prev = x_ref[:, :1]
            inp = (wdot(mel_a1, wic_ref, s_wic_ref)
                   + bi_ref[0] + x_prev * ix_ref[0][None, :])
            h1 = h1_ref[:]
            gi1 = wdot(inp.astype(wdt), wi1_ref, s_wi1_ref) + bi1_ref[0]
            gh1 = wdot(h1.astype(wdt), wh1_ref, s_wh1_ref) + bh1_ref[0]
            r = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
            z = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
            n = jnp.tanh(gi1[:, 2 * d:] + r * gh1[:, 2 * d:])
            h1 = (1.0 - z) * n + z * h1
            h1_ref[:] = h1
            x = inp + h1
            gi2 = (wdot(x.astype(wdt), w2x_ref, s_w2x_ref)
                   + wdot(a2, w2a_ref, s_w2a_ref)
                   + bi2_ref[0])
            h2 = h2_ref[:]
            gh2 = wdot(h2.astype(wdt), wh2_ref, s_wh2_ref) + bh2_ref[0]
            r = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
            z = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
            n = jnp.tanh(gi2[:, 2 * d:] + r * gh2[:, 2 * d:])
            h2 = (1.0 - z) * n + z * h2
            h2_ref[:] = h2
            x = x + h2
            y = jnp.maximum(
                wdot(x.astype(wdt), wf1x_ref, s_wf1x_ref)
                + wdot(a3, wf1a_ref, s_wf1a_ref)
                + bf1_ref[0], 0.0)
            y = jnp.maximum(
                wdot(y.astype(wdt), wf2x_ref, s_wf2x_ref)
                + wdot(a4, wf2a_ref, s_wf2a_ref)
                + bf2_ref[0], 0.0)
            logits = wdot(y.astype(wdt), wf3_ref, s_wf3_ref) + bf3_ref[0]
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
                kmax = jnp.argmax(gumbel, axis=-1)
                # Mosaic legalizes neither i32->f32 converts (sitofp) nor
                # float iota; select from a host-precomputed class-value row
                sample = jnp.sum(
                    jnp.where(col == kmax[:, None],
                              clsv_ref[0][None, :], 0.0), axis=-1)
            out_ref[t, :] = sample
            x_ref[:] = jnp.broadcast_to(sample[:, None], (B, LANE))
            return 0

        jax.lax.fori_loop(0, chunk, step_masked, 0)

        @pl.when(ci == n_chunks - 1)
        def _emit_state():
            h1o_ref[:] = h1_ref[:]
            h2o_ref[:] = h2_ref[:]
            xo_ref[:] = x_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("feat", "adim", "mode",
                                             "n_classes", "log_scale_min",
                                             "chunk", "interpret",
                                             "weight_dtype", "return_state"))
def wavernn_sample_loop(cond, W_I, b_I, wi1, wh1, bi1, bh1,
                        w2x, w2a, wh2, bi2, bh2,
                        wf1x, wf1a, bf1, wf2x, wf2a, bf2, wf3, bf3, seed, *,
                        feat: int, adim: int, mode: str = "MOL",
                        n_classes: int = 30,
                        log_scale_min: float = float(np.log(1e-14)),
                        chunk: int = 128, interpret: bool = False,
                        weight_dtype=jnp.bfloat16,
                        state=None, return_state: bool = False):
    """Run the fused sampling loop.

    cond: (T, B, feat + 4*adim) raw conditioning [mels_up | a1..a4];
    W_I: (1 + feat + adim, d) — row 0 is the sample path. Returns (T, B), or
    ((T, B), state) with ``return_state`` — ``state`` carries the GRU hiddens
    and feedback sample across streaming chunks (padded tail steps past T do
    not advance it)."""
    T, B, C = cond.shape
    # Mosaic sublane alignment: the (B, d)/(B, LANE) state buffers and the
    # (chunk, B) output block want the row count padded to a multiple of 8
    # once it exceeds one sublane tile. Empirically on v5e: B in {1..8} and
    # multiples of 8 up to 56 run fine, but B=11 hard-crashes the TPU worker
    # (round-4 `regimes` job). Dead rows ride along ~free (the loop is
    # weight-stream-bound) and are sliced off below.
    B_real = B
    B = _round_up(B, 8) if B > 1 else B
    if B != B_real:
        cond = jnp.pad(cond, ((0, 0), (0, B - B_real), (0, 0)))
        if state is not None:
            state = {k: jnp.pad(v, ((0, B - B_real), (0, 0)))
                     for k, v in state.items()}
    d = wi1.shape[0]
    fc = wf1x.shape[1]
    nr_mix = wf3.shape[1] // 3 if mode == "MOL" else 0
    n_out = _round_up(max(wf3.shape[1], 8), LANE)
    quant = weight_dtype in ("int8", jnp.int8)
    quant_mxu = weight_dtype == "int8_mxu"

    # stream dtype: bf16 normally; full f32 when verifying with f32 weights
    # (the --verify feedback phase needs an f32-everywhere kernel to compare
    # against an f32 scan without cast-induced divergence)
    stream_dt = jnp.float32 if weight_dtype == jnp.float32 else jnp.bfloat16
    # auto-size the stream chunk against the VMEM budget (2 pipeline buffers)
    stream_bytes_per_step = B * C * jnp.dtype(stream_dt).itemsize
    budget = 5 * 1024 * 1024
    max_chunk = max(8, (budget // (2 * stream_bytes_per_step)) // 8 * 8)
    chunk = min(chunk, max_chunk)
    chunk = max(8, (chunk // 8) * 8)  # Mosaic: block sublane dim % 8 == 0

    T_pad = _round_up(T, chunk)
    cond = jnp.pad(cond, ((0, T_pad - T), (0, 0), (0, 0))).astype(stream_dt)
    wf3_p = jnp.pad(wf3, ((0, 0), (0, n_out - wf3.shape[1])))
    bf3_p = jnp.pad(bf3.reshape(1, -1), ((0, 0), (0, n_out - wf3.shape[1])),
                    constant_values=-1e9 if mode != "MOL" else 0.0)
    # RAW sampling: sample value per class, computed on host (no in-kernel
    # int->float conversion, which Mosaic cannot legalize)
    cls_vals = (2.0 * jnp.arange(n_out, dtype=jnp.float32)
                / max(n_classes - 1.0, 1.0) - 1.0).reshape(1, n_out)

    kernel = _make_kernel(B, d, fc, feat, adim, n_out, chunk, mode, nr_mix,
                          n_classes, log_scale_min, T_real=T, quant=quant,
                          quant_mxu=quant_mxu)
    if state is None:
        state = {"h1": jnp.zeros((B, d), jnp.float32),
                 "h2": jnp.zeros((B, d), jnp.float32),
                 "x": jnp.zeros((B, LANE), jnp.float32)}
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    f32 = jnp.float32

    def prep(w):
        """Weight prep: plain cast, or in-jit per-column symmetric int8
        quantization (returns (int8 weights, (1, cols) f32 inverse scales);
        one cheap pass over the weights per call, amortized across the whole
        sample loop)."""
        if not (quant or quant_mxu):
            return w.astype(weight_dtype), None
        s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s.astype(f32)

    wic_q, s_wic = prep(W_I[1:])
    wi1_q, s_wi1 = prep(wi1)
    wh1_q, s_wh1 = prep(wh1)
    w2x_q, s_w2x = prep(w2x)
    w2a_q, s_w2a = prep(w2a)
    wh2_q, s_wh2 = prep(wh2)
    wf1x_q, s_wf1x = prep(wf1x)
    wf1a_q, s_wf1a = prep(wf1a)
    wf2x_q, s_wf2x = prep(wf2x)
    wf2a_q, s_wf2a = prep(wf2a)
    wf3_q, s_wf3 = prep(wf3_p)

    sspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
        pl.BlockSpec((chunk, B, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),             # cond stream
        wspec((1, d)), wspec((feat + adim, d)), wspec((1, d)),   # I
        wspec((d, 3 * d)), wspec((d, 3 * d)),              # wi1, wh1
        wspec((1, 3 * d)), wspec((1, 3 * d)),              # bi1, bh1
        wspec((d, 3 * d)), wspec((adim, 3 * d)),           # w2x, w2a
        wspec((d, 3 * d)),                                 # wh2
        wspec((1, 3 * d)), wspec((1, 3 * d)),              # bi2, bh2
        wspec((d, fc)), wspec((adim, fc)), wspec((1, fc)),  # fc1
        wspec((fc, fc)), wspec((adim, fc)), wspec((1, fc)),  # fc2
        wspec((fc, n_out)), wspec((1, n_out)),             # fc3
        wspec((1, n_out)),                                 # class values
        sspec((B, d)), sspec((B, d)), sspec((B, LANE)),    # state in
    ]
    operands = [
        jnp.asarray([seed], jnp.int32),
        cond,
        W_I[:1].astype(f32), wic_q, b_I.reshape(1, -1).astype(f32),
        wi1_q, wh1_q,
        bi1.reshape(1, -1).astype(f32), bh1.reshape(1, -1).astype(f32),
        w2x_q, w2a_q, wh2_q,
        bi2.reshape(1, -1).astype(f32), bh2.reshape(1, -1).astype(f32),
        wf1x_q, wf1a_q, bf1.reshape(1, -1).astype(f32),
        wf2x_q, wf2a_q, bf2.reshape(1, -1).astype(f32),
        wf3_q, bf3_p.astype(f32), cls_vals,
        state["h1"].astype(f32), state["h2"].astype(f32),
        state["x"].astype(f32),
    ]
    if quant or quant_mxu:
        in_specs += [wspec((1, d)), wspec((1, 3 * d)), wspec((1, 3 * d)),
                     wspec((1, 3 * d)), wspec((1, 3 * d)), wspec((1, 3 * d)),
                     wspec((1, fc)), wspec((1, fc)), wspec((1, fc)),
                     wspec((1, fc)), wspec((1, n_out))]
        operands += [s_wic, s_wi1, s_wh1, s_w2x, s_w2a, s_wh2,
                     s_wf1x, s_wf1a, s_wf2x, s_wf2a, s_wf3]

    out, h1o, h2o, xo = pl.pallas_call(
        kernel,
        grid=(T_pad // chunk,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((chunk, B), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   sspec((B, d)), sspec((B, d)), sspec((B, LANE))),
        out_shape=(jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
                   jax.ShapeDtypeStruct((B, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANE), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),     # h1
            pltpu.VMEM((B, d), jnp.float32),     # h2
            pltpu.VMEM((B, LANE), jnp.float32),  # x carry
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*operands)
    if return_state:
        return out[:T, :B_real], {"h1": h1o[:B_real], "h2": h2o[:B_real],
                                  "x": xo[:B_real]}
    return out[:T, :B_real]
