"""Fused AR TransformerTTS decode loop as ONE Pallas TPU kernel.

Single-stream AR decode is latency-bound: the `lax.while_loop` path
(`etts/models/autoregressive.py:autoregressive_predict`) dispatches dozens of
small XLA ops per step (~115 us/step at d=256), each re-reading weights from
HBM. This kernel runs the ENTIRE decode — prenet (with the reference's
always-on dropout, `TransformerTTS/model/layers.py:398-401`, via the on-core
PRNG), positional encoding, every decoder block (self-attention against a
VMEM-resident KV cache, cross-attention against precomputed encoder K/V, FFN),
FinalProj, the causal postnet as incremental ring buffers with BatchNorm
folded to scale/shift, the 3-class stop head, and the sample feedback — inside
one kernel invocation with all weights held in VMEM as bf16.

Supported shape: batch 1, r = 1, all-dense decoder blocks with a uniform head
count (the flagship `autoregressive_config.yaml` geometry). Other shapes fall
back to the while_loop path (`etts/api.py` picks automatically).

Numerics: matmul inputs bf16 / f32 accumulate (same contract as the vocoder
kernel); layernorm/softmax in f32. With prenet_dropout == 0 the kernel is
deterministic and must match the while_loop decode (tested in
`tests/test_pallas_decoder.py`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.lru import LRU

# bounded: long-lived serving processes must not retain every model variant's
# params + compiled decoder forever (ADVICE r3)
_FUSED_CACHE = LRU(8)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pallas_available = True
except ImportError:  # pragma: no cover
    pallas_available = False

LANE = 128
NEG = -1e9


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _uniform_from_bits(bits):
    """uint32 bits -> f32 uniform in [0, 1) (mantissa bitcast trick)."""
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    fbits = jax.lax.bitwise_or(mant, jnp.uint32(0x3F800000))
    return pltpu.bitcast(fbits, jnp.float32) - 1.0


def _make_kernel(cfg):
    compute_dtype = jnp.dtype(cfg["compute_dtype"])
    r = cfg["r"]
    d = cfg["d"]
    mel = cfg["mel"]
    nb = cfg["n_blocks"]
    nh = cfg["n_heads"]
    depth = d // nh
    ffn = cfg["ffn"]
    T = cfg["t_max"]
    n_enc = cfg["n_enc"]
    n_enc_real = cfg["n_enc_real"]
    kp = cfg["k_post"]
    npost = cfg["n_post"]
    cf = cfg["cf"]
    stop_index = cfg["stop_index"]
    stop_enabled = cfg["stop_enabled"]
    # decode-time runaway guards (mirror autoregressive_predict, ROADMAP
    # r5 #3): attention-completion stop + static per-text frame cap
    attn_patience = cfg.get("attn_stop_patience")
    frame_cap = cfg.get("frame_cap")
    sqrt_d = float(np.sqrt(d))
    inv_sqrt_depth = float(1.0 / np.sqrt(depth))

    def kernel(seed_ref, rate_ref,                     # SMEM
               pe_ref,                                 # (T, d) f32
               pw1_ref, pb1_ref, pw2_ref, pb2_ref,     # prenet
               wqkv_ref, bqkv_ref, wos_ref, bos_ref,   # self-attn
               wqc_ref, bqc_ref, woc_ref, boc_ref,     # cross-attn
               ck_ref, cv_ref,                         # enc K/V (nb,n_enc,d)
               f1_ref, bf1_ref, f2_ref, bf2_ref,       # ffn
               lns_ref, lnb_ref,                       # (nb, 5, d)
               fpw_ref, fpb_ref,                       # final proj (d, LANE)
               pconv0_ref, pconv_mid_ref, pconv_last_ref,  # postnet convs
               ps_ref, psh_ref,                        # (npost, 1?, ...) folded
               outs_ref, outb_ref,                     # final norm_out (1,LANE)
               stopw_ref, stopb_ref,                   # stop head
               out_ref,                                # (T, LANE) f32
               len_ref,                                # SMEM (2,) int32 out
               *scratch):
        # per-block rank-2 KV caches (Mosaic crashes on dynamic stores into
        # rank-3 refs), then postnet ring buffers, feedback frame, SMEM state
        kc_refs = scratch[:nb]
        vc_refs = scratch[nb:2 * nb]
        h0_ref, hmid_ref, hlast_ref, frame_ref, state_ref = scratch[2 * nb:]
        bf = compute_dtype
        f32 = jnp.float32

        def dot(a, m):
            return jnp.dot(a.astype(bf), m.astype(bf),
                           preferred_element_type=f32)

        def layer_norm(x, blk, which):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - mu * mu
            y = (x - mu) * jax.lax.rsqrt(var + 1e-6)
            return y * lns_ref[blk, which:which + 1, :] \
                + lnb_ref[blk, which:which + 1, :]

        pltpu.prng_seed(seed_ref[0])
        # zero state
        out_ref[:] = jnp.zeros((T * r, LANE), f32)
        for blk in range(nb):
            # f32 caches: Mosaic can mask single-row dynamic stores for f32
            # (8-sublane tiles) but not for packed bf16 (16-sublane) tiles
            kc_refs[blk][:] = jnp.zeros((T, d), f32)
            vc_refs[blk][:] = jnp.zeros((T, d), f32)
        h0_ref[:] = jnp.zeros((kp, LANE), f32)
        hmid_ref[:] = jnp.zeros((max((npost - 2) * kp, 1), cf), f32)
        hlast_ref[:] = jnp.zeros((kp, cf), f32)
        frame_ref[:] = jnp.full((1, LANE), cfg["start_value"], f32)
        state_ref[0] = 0   # stopped flag
        state_ref[1] = 0   # length in frames
        state_ref[2] = 0   # attention-completion counter
        len_ref[0] = 0
        len_ref[1] = 0

        rows_T = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        rows_E = jax.lax.broadcasted_iota(jnp.int32, (n_enc, 1), 0)
        rate = rate_ref[0]
        keep = 1.0 - rate

        def dropout(x):
            bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            u = _uniform_from_bits(bits)
            return jnp.where(u < keep, x / jnp.maximum(keep, 1e-8), 0.0)

        def attend(q, K, V, row_ids, valid_upto, want_p=False):
            """q (1,d) pre-scaled; K/V (T_kv, d) head-concat; softmax over
            rows <= valid_upto. Returns (1, d) head-concat output, plus the
            head-summed attention column (T_kv, 1) when ``want_p`` (feeds the
            attention-completion stop).

            Broadcast-multiply-reduce on the VPU (q broadcasts over rows):
            Mosaic mis-legalizes the (T,64)x(1,64) dot_general for this shape
            (fused cast+broadcast verification error), and with one query the
            VPU form costs the same T*depth MACs anyway."""
            Kf = K[:].astype(f32)
            Vf = V[:].astype(f32)
            outs = []
            psum = jnp.zeros((Kf.shape[0], 1), f32)
            for h in range(nh):
                sl = slice(h * depth, (h + 1) * depth)
                qh = q[:, sl] * inv_sqrt_depth          # (1, depth) f32
                sc = jnp.sum(Kf[:, sl] * qh, axis=1,
                             keepdims=True)             # (T_kv, 1)
                sc = jnp.where(row_ids <= valid_upto, sc, NEG)
                m = jnp.max(sc, axis=0, keepdims=True)
                p = jnp.exp(sc - m)
                p = p / jnp.sum(p, axis=0, keepdims=True)
                if want_p:
                    psum = psum + p
                oh = jnp.sum(p * Vf[:, sl], axis=0,
                             keepdims=True)             # (1, depth)
                outs.append(oh)
            out = jnp.concatenate(outs, axis=1)
            return (out, psum) if want_p else out

        def step(t, _):
            running = jnp.logical_and(state_ref[0] == 0, True)

            @pl.when(running)
            def _():
                frame = frame_ref[0:1, :mel]
                # ---- prenet (always-on dropout, traced rate) ----
                h = jnp.maximum(dot(frame, pw1_ref[:]) + pb1_ref[:], 0.0)
                h = dropout(h)
                h = jnp.maximum(dot(h, pw2_ref[:]) + pb2_ref[:], 0.0)
                h = dropout(h)
                x = h * sqrt_d + pe_ref[t, :][None, :]
                # ---- decoder blocks ----
                for blk in range(nb):
                    # self-attention with KV cache
                    qkv = dot(x, wqkv_ref[blk]) + bqkv_ref[blk]
                    q = qkv[:, :d]
                    kc_refs[blk][t, :] = qkv[0, d:2 * d]
                    vc_refs[blk][t, :] = qkv[0, 2 * d:]
                    attn = attend(q, kc_refs[blk], vc_refs[blk], rows_T, t)
                    so = (dot(x, wos_ref[blk][:d]) + dot(attn, wos_ref[blk][d:])
                          + bos_ref[blk])
                    so = layer_norm(so, blk, 0)
                    x1 = layer_norm(so + x, blk, 1)
                    # cross-attention (precomputed encoder K/V)
                    q2 = dot(x1, wqc_ref[blk]) + bqc_ref[blk]
                    want_p = (attn_patience is not None and blk == nb - 1)
                    if want_p:
                        attn2, p_cross = attend(q2, ck_ref[blk], cv_ref[blk],
                                                rows_E, n_enc_real - 1,
                                                want_p=True)
                        # attention-completion: focus (argmax row) on the
                        # final real token for `attn_patience` consecutive
                        # steps => text consumed, stop (the same last-block
                        # cross-attention signal duration extraction trusts)
                        pm = jnp.max(p_cross, axis=0, keepdims=True)
                        focus = jnp.min(jnp.where(p_cross >= pm, rows_E,
                                                  jnp.int32(2 ** 30)))
                        complete = focus >= n_enc_real - 2
                        state_ref[2] = jnp.where(complete,
                                                 state_ref[2] + 1, 0)
                    else:
                        attn2 = attend(q2, ck_ref[blk], cv_ref[blk], rows_E,
                                       n_enc_real - 1)
                    co = (dot(x1, woc_ref[blk][:d])
                          + dot(attn2, woc_ref[blk][d:]) + boc_ref[blk])
                    x2 = layer_norm(co + x1, blk, 2)
                    # ffn
                    y = dot(x2, f1_ref[blk]) + bf1_ref[blk]
                    y = dot(y, f2_ref[blk]) + bf2_ref[blk]
                    y = jnp.maximum(layer_norm(y, blk, 3), 0.0)
                    x = layer_norm(x2 + y, blk, 4)
                # ---- final projection: r frames packed at LANE offsets ---
                mel_lin_r = dot(x, fpw_ref[:]) + fpb_ref[:]  # (1, r*LANE)

                def postnet_frame(mel_lin):
                    """One causal-postnet frame via the ring buffers."""
                    h0_ref[0:kp - 1, :] = h0_ref[1:kp, :]
                    h0_ref[kp - 1:kp, :] = mel_lin
                    y = jnp.zeros((1, cf), f32)
                    for j in range(kp):
                        y = y + dot(h0_ref[j:j + 1, :], pconv0_ref[j])
                    y = jnp.tanh(y * ps_ref[0:1, :cf] + psh_ref[0:1, :cf])
                    for li in range(npost - 2):
                        base = li * kp
                        hmid_ref[base:base + kp - 1, :] = \
                            hmid_ref[base + 1:base + kp, :]
                        hmid_ref[base + kp - 1:base + kp, :] = y
                        y = jnp.zeros((1, cf), f32)
                        for j in range(kp):
                            y = y + dot(hmid_ref[base + j:base + j + 1, :],
                                        pconv_mid_ref[li * kp + j])
                        y = jnp.tanh(y * ps_ref[li + 1:li + 2, :cf]
                                     + psh_ref[li + 1:li + 2, :cf])
                    hlast_ref[0:kp - 1, :] = hlast_ref[1:kp, :]
                    hlast_ref[kp - 1:kp, :] = y
                    y = jnp.zeros((1, LANE), f32)
                    for j in range(kp):
                        y = y + dot(hlast_ref[j:j + 1, :], pconv_last_ref[j])
                    y = y * ps_ref[npost - 1:npost, :LANE] \
                        + psh_ref[npost - 1:npost, :LANE]   # linear last conv
                    return (mel_lin + y) * outs_ref[:] + outb_ref[:]

                # default length: the whole group (overwritten below when the
                # stop class fires on an interior frame — a last-frame-only
                # check misses even-parity utterance ends at r>1 and decodes
                # to max_length)
                state_ref[1] = (t + 1) * r
                final = None
                for fj in range(r):
                    fr = mel_lin_r[:, fj * LANE:(fj + 1) * LANE]
                    final = postnet_frame(fr)
                    out_ref[t * r + fj, :] = final[0]
                    if stop_enabled:
                        # stop head on this mel_linear frame (model applies
                        # stop_linear to the pre-postnet frame, layers.py
                        # Postnet); first firing frame wins the length
                        stop_logits = dot(fr, stopw_ref[:]) + stopb_ref[:]
                        cls = jnp.argmax(stop_logits, axis=-1)[0]

                        @pl.when(jnp.logical_and(cls == stop_index,
                                                 state_ref[0] == 0))
                        def _(fj=fj):
                            state_ref[0] = 1
                            state_ref[1] = t * r + fj + 1
                # ---- decode-time runaway guards ----
                if attn_patience is not None:
                    @pl.when(jnp.logical_and(state_ref[2] >= attn_patience,
                                             state_ref[0] == 0))
                    def _():
                        state_ref[0] = 1   # length stays (t+1)*r
                if frame_cap is not None:
                    @pl.when(jnp.logical_and((t + 1) * r >= frame_cap,
                                             state_ref[0] == 0))
                    def _():
                        state_ref[0] = 1
                        state_ref[1] = jnp.minimum(state_ref[1],
                                                   jnp.int32(frame_cap))
                # ---- feedback ----
                frame_ref[:] = final

            return 0

        jax.lax.fori_loop(0, T, step, 0)
        len_ref[0] = state_ref[1]
        len_ref[1] = state_ref[1]

    return kernel


def build_decode_inputs(model, variables, enc_output, r: int = 1):
    """Stack/transform flax params into the kernel's input arrays.

    enc_output: (1, n_enc, dim_enc) conditioning from ``model.encode``.
    Returns (arrays dict, static cfg dict). Cited layout contracts:
    concat-query out projection `layers.py:144`; BatchNorm folded to
    per-channel scale/shift from batch_stats (inference semantics). ``r``:
    the reduction factor — FinalProj's r*mel outputs are repacked so frame j
    sits at lane offset j*LANE (legal 128-aligned slices in the kernel).
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    d = model.decoder_model_dimension
    mel = model.mel_channels
    nb = model.decoder_dense_blocks
    assert nb == len(model.decoder_num_heads), \
        "fused decode supports all-dense decoder stacks"
    heads = set(model.decoder_num_heads)
    assert len(heads) == 1, "fused decode needs a uniform head count"
    nh = heads.pop()
    dec = p["Decoder"]

    def stack(getter):
        return jnp.stack([getter(dec[f"CADB_{i}"]) for i in range(nb)])

    arrays = {
        "pw1": p["DecoderPrenet"]["d1"]["kernel"],
        "pb1": p["DecoderPrenet"]["d1"]["bias"][None, :],
        "pw2": p["DecoderPrenet"]["d2"]["kernel"],
        "pb2": p["DecoderPrenet"]["d2"]["bias"][None, :],
        "wqkv": stack(lambda b: jnp.concatenate(
            [b["sarn"]["mha"][k]["kernel"] for k in ("wq", "wk", "wv")], 1)),
        "bqkv": stack(lambda b: jnp.concatenate(
            [b["sarn"]["mha"][k]["bias"] for k in ("wq", "wk", "wv")])[None]),
        "wos": stack(lambda b: b["sarn"]["mha"]["dense"]["kernel"]),
        "bos": stack(lambda b: b["sarn"]["mha"]["dense"]["bias"][None]),
        "wqc": stack(lambda b: b["carn"]["mha"]["wq"]["kernel"]),
        "bqc": stack(lambda b: b["carn"]["mha"]["wq"]["bias"][None]),
        "woc": stack(lambda b: b["carn"]["mha"]["dense"]["kernel"]),
        "boc": stack(lambda b: b["carn"]["mha"]["dense"]["bias"][None]),
        "f1": stack(lambda b: b["ffn"]["d1"]["kernel"]),
        "bf1": stack(lambda b: b["ffn"]["d1"]["bias"][None]),
        "f2": stack(lambda b: b["ffn"]["d2"]["kernel"]),
        "bf2": stack(lambda b: b["ffn"]["d2"]["bias"][None]),
        "lns": stack(lambda b: jnp.stack(
            [b["sarn"]["ln"]["scale"], b["sarn"]["last_ln"]["scale"],
             b["carn"]["layernorm"]["scale"], b["ffn"]["ln"]["scale"],
             b["ffn"]["last_ln"]["scale"]])),
        "lnb": stack(lambda b: jnp.stack(
            [b["sarn"]["ln"]["bias"], b["sarn"]["last_ln"]["bias"],
             b["carn"]["layernorm"]["bias"], b["ffn"]["ln"]["bias"],
             b["ffn"]["last_ln"]["bias"]])),
    }
    # cross-attention K/V, heads-in-lanes layout (n_enc, d)
    n_enc_real = enc_output.shape[1]
    n_enc = _round_up(n_enc_real, 8)
    cks, cvs = [], []
    for i in range(nb):
        mha = dec[f"CADB_{i}"]["carn"]["mha"]
        e = enc_output[0]
        ck = e @ mha["wk"]["kernel"] + mha["wk"]["bias"]
        cv = e @ mha["wv"]["kernel"] + mha["wv"]["bias"]
        pad = ((0, n_enc - n_enc_real), (0, 0))
        cks.append(jnp.pad(ck, pad))
        cvs.append(jnp.pad(cv, pad))
    arrays["ck"] = jnp.stack(cks)
    arrays["cv"] = jnp.stack(cvs)

    # final projection: r frames repacked at LANE-aligned lane offsets
    fpw = p["FinalProj"]["kernel"][:, :r * mel].reshape(d, r, mel)
    fpb = p["FinalProj"]["bias"][:r * mel].reshape(r, mel)
    arrays["fpw"] = jnp.pad(fpw, ((0, 0), (0, 0), (0, LANE - mel))
                            ).reshape(d, r * LANE)
    arrays["fpb"] = jnp.pad(fpb, ((0, 0), (0, LANE - mel))
                            ).reshape(1, r * LANE)

    # postnet: fold conv bias + BatchNorm (inference) into scale/shift
    post = p["Postnet"]["conv_blocks"]
    post_bs = bs["Postnet"]["conv_blocks"]
    kp = model.postnet_kernel_size
    npost = model.postnet_conv_layers
    cf = model.postnet_conv_filters

    def fold(conv, norm, norm_stats):
        g, b = norm["scale"], norm["bias"]
        mu, var = norm_stats["mean"], norm_stats["var"]
        s = g / jnp.sqrt(var + 1e-3)
        return s, (conv["bias"] - mu) * s + b

    scales, shifts = [], []
    w0 = post["conv_0"]["kernel"]                      # (kp, mel, cf)
    arrays["pconv0"] = jnp.pad(w0, ((0, 0), (0, LANE - mel), (0, 0)))
    s, sh = fold(post["conv_0"], post["norm_0"], post_bs["norm_0"])
    scales.append(jnp.pad(s, (0, LANE - cf)) if cf < LANE else s)
    shifts.append(jnp.pad(sh, (0, LANE - cf)) if cf < LANE else sh)
    mids = []
    for li in range(npost - 2):
        mids.append(post[f"conv_{li + 1}"]["kernel"])  # (kp, cf, cf)
        s, sh = fold(post[f"conv_{li + 1}"], post[f"norm_{li + 1}"],
                     post_bs[f"norm_{li + 1}"])
        scales.append(jnp.pad(s, (0, LANE - cf)) if cf < LANE else s)
        shifts.append(jnp.pad(sh, (0, LANE - cf)) if cf < LANE else sh)
    arrays["pconv_mid"] = jnp.concatenate(mids, 0) if mids else \
        jnp.zeros((0, cf, cf))
    wl = post["last_conv"]["kernel"]                   # (kp, cf, mel)
    arrays["pconv_last"] = jnp.pad(wl, ((0, 0), (0, 0), (0, LANE - mel)))
    s, sh = fold(post["last_conv"], post["norm_last"], post_bs["norm_last"])
    scales.append(jnp.pad(s, (0, LANE - mel)))
    shifts.append(jnp.pad(sh, (0, LANE - mel)))
    pad_cols = max(LANE, cf)
    arrays["ps"] = jnp.stack([jnp.pad(x, (0, pad_cols - x.shape[0]))
                              for x in scales])
    arrays["psh"] = jnp.stack([jnp.pad(x, (0, pad_cols - x.shape[0]))
                               for x in shifts])
    # final norm_out BN over (inputs + conv_out); no conv bias here
    g = p["Postnet"]["conv_blocks"]["norm_out"]["scale"]
    b = p["Postnet"]["conv_blocks"]["norm_out"]["bias"]
    mu = bs["Postnet"]["conv_blocks"]["norm_out"]["mean"]
    var = bs["Postnet"]["conv_blocks"]["norm_out"]["var"]
    s_out = g / jnp.sqrt(var + 1e-3)
    arrays["outs"] = jnp.pad(s_out, (0, LANE - mel))[None]
    arrays["outb"] = jnp.pad(b - mu * s_out, (0, LANE - mel))[None]

    # stop head: logits only over the 3 real classes (pad bias -1e9)
    sw = p["Postnet"]["stop_linear"]["kernel"]         # (mel, 3)
    sb = p["Postnet"]["stop_linear"]["bias"]
    arrays["stopw"] = jnp.pad(sw, ((0, LANE - mel), (0, LANE - 3)))
    arrays["stopb"] = jnp.pad(sb, (0, LANE - 3), constant_values=NEG)[None]

    cfg = dict(d=d, prenet_dim=model.decoder_prenet_dimension, mel=mel,
               r=r, n_blocks=nb, n_heads=nh,
               ffn=model.decoder_feed_forward_dimension,
               n_enc=n_enc, n_enc_real=n_enc_real, k_post=kp, n_post=npost,
               cf=cf, stop_index=model.stop_prob_index,
               start_value=float(model.mel_start_value))
    return arrays, cfg


@functools.partial(jax.jit, static_argnames=("t_max", "stop_enabled",
                                             "interpret", "cfg_key"))
def _fused_decode_call(arrays, pe, seed, rate, *, t_max, stop_enabled,
                       interpret, cfg_key):
    cfg = dict(cfg_key)
    cfg.update(t_max=t_max, stop_enabled=stop_enabled)
    d, nb, r = cfg["d"], cfg["n_blocks"], cfg["r"]
    kp, npost, cf = cfg["k_post"], cfg["n_post"], cfg["cf"]
    kernel = _make_kernel(cfg)
    bf = jnp.dtype(cfg["compute_dtype"])
    f32 = jnp.float32

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def cast_w(x):
        return x.astype(bf)

    a = arrays
    out, length = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [vmem()] * 32,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((t_max * r, LANE), f32),
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((t_max, d), f32)
                        for _ in range(2 * nb)]       # per-block K, V caches
        + [
            pltpu.VMEM((kp, LANE), f32),              # postnet ring L0
            pltpu.VMEM((max((npost - 2) * kp, 1), cf), f32),  # rings L1..
            pltpu.VMEM((kp, cf), f32),                # ring last
            pltpu.VMEM((1, LANE), f32),               # feedback frame
            pltpu.SMEM((3,), jnp.int32),              # stopped, length, attn
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(jnp.asarray([seed], jnp.int32),
      jnp.asarray([rate], f32),
      pe.astype(f32),
      cast_w(a["pw1"]), a["pb1"].astype(f32),
      cast_w(a["pw2"]), a["pb2"].astype(f32),
      cast_w(a["wqkv"]), a["bqkv"].astype(f32),
      cast_w(a["wos"]), a["bos"].astype(f32),
      cast_w(a["wqc"]), a["bqc"].astype(f32),
      cast_w(a["woc"]), a["boc"].astype(f32),
      cast_w(a["ck"]), cast_w(a["cv"]),
      cast_w(a["f1"]), a["bf1"].astype(f32),
      cast_w(a["f2"]), a["bf2"].astype(f32),
      a["lns"].astype(f32), a["lnb"].astype(f32),
      cast_w(a["fpw"]), a["fpb"].astype(f32),
      cast_w(a["pconv0"]), cast_w(a["pconv_mid"]), cast_w(a["pconv_last"]),
      a["ps"].astype(f32), a["psh"].astype(f32),
      a["outs"].astype(f32), a["outb"].astype(f32),
      cast_w(a["stopw"]), a["stopb"].astype(f32))
    return out, length


def make_fused_decoder(model, *, max_steps: int, r: int = 1,
                       stop_enabled: bool = True,
                       interpret: bool = False, compute_dtype="bfloat16",
                       attn_stop_patience=None, max_frames_per_token=None):
    """One jitted program: weight stacking + cross-KV precompute + kernel.

    The weight stacking (``build_decode_inputs``) traces into the SAME XLA
    program as the kernel — calling it eagerly per decode costs ~100 ms of
    host dispatch, ~10x the kernel itself. Returns
    ``decode(variables, enc_output, key, prenet_dropout) ->
    (mel (1,T,mel), length, steps)``.

    ``attn_stop_patience`` / ``max_frames_per_token``: the decode-time
    runaway guards of ``autoregressive_predict`` (single-stream decode has
    no token padding, so the frame cap is static per text length).
    """
    t_max = _round_up(max_steps, 8)
    # decode_step adds pe[step * r] (r-strided positional encoding,
    # `layers.py:245`); pre-stride the table so the kernel reads pe[t]
    pe_full = np.asarray(_positional_encoding(
        model.decoder_maximum_position_encoding,
        model.decoder_model_dimension))[0, ::r, :][:t_max, :]

    @jax.jit
    def decode(variables, enc_output, key, prenet_dropout):
        arrays, cfg = build_decode_inputs(model, variables, enc_output, r)
        cfg["compute_dtype"] = str(compute_dtype)
        cfg["attn_stop_patience"] = attn_stop_patience
        cfg["frame_cap"] = (
            None if max_frames_per_token is None
            else max(int(cfg["n_enc_real"] * max_frames_per_token), r))
        cfg_key = tuple(sorted(cfg.items()))
        seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
        out, length = _fused_decode_call(
            arrays, jnp.asarray(pe_full), seed,
            jnp.asarray(prenet_dropout, jnp.float32),
            t_max=t_max, stop_enabled=stop_enabled, interpret=interpret,
            cfg_key=cfg_key)
        return out[None, :, :cfg["mel"]], length[0], length[1]

    return decode


def fused_decode(model, variables, enc_output, *, max_steps: int,
                 r: int = 1, key=None, prenet_dropout: float = 0.5,
                 stop_enabled: bool = True, interpret: bool = False,
                 compute_dtype="bfloat16", attn_stop_patience=None,
                 max_frames_per_token=None, _cache=None):
    """Run the fused decode kernel. Returns (mel (1, T*r, mel), length,
    steps); length counts FRAMES.

    enc_output from ``model.encode``; batch 1. Caches the jitted decoder per
    (model, max_steps, r, flags).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if _cache is None:
        _cache = _FUSED_CACHE
    ck = (id(model), _round_up(max_steps, 8), r, stop_enabled, interpret,
          str(compute_dtype), attn_stop_patience, max_frames_per_token)
    if ck not in _cache:
        # value holds a strong model ref so a recycled id() can never alias
        # a stale compiled decoder
        _cache[ck] = (model, make_fused_decoder(
            model, max_steps=max_steps, r=r, stop_enabled=stop_enabled,
            interpret=interpret, compute_dtype=compute_dtype,
            attn_stop_patience=attn_stop_patience,
            max_frames_per_token=max_frames_per_token))
    return _cache[ck][1](variables, enc_output, key, prenet_dropout)


def _positional_encoding(max_len, d):
    from ...ops.masking import positional_encoding
    return positional_encoding(max_len, d)
