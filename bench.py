"""Benchmark: end-to-end text->wav real-time factor on one chip.

Runs the flagship pipeline at reference scale — AR GST-TransformerTTS decode
(256-dim, 4+4 layers, KV-cached while_loop, r=1) into the 512-dim WaveRNN MoL
vocoder with batch folding (target 11000 / overlap 550, `WaveRNN/hparams.py:
52-54`) — on randomly-initialized weights (compute cost is weight-independent;
stop-token early exit disabled so the decode length is fixed).

Prints ONE json line:
  {"metric": "rtf_text_to_wav", "value": RTF, "unit": ..., "vs_baseline": ...}
vs_baseline = RTF / 0.1 (the v4-8 north-star from BASELINE.md; < 1.0 beats it).
Extras: wavernn samples/sec, mel frames/sec, per-path MFU (train step fp32 and
bf16 mixed-precision, AR decode, vocoder kernel) against the chip's bf16 peak.

``python bench.py --verify`` instead runs the Pallas-kernel-vs-scan numerical
parity check at PRODUCTION shape (d=512, B=8/56) on the live backend.
"""
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# CPU runs get a host-fingerprinted cache dir: XLA:CPU AOT entries embed
# host machine features and go stale when the host changes (TPU entries
# don't) — see etts.utils.xla_cache
from etts.utils.xla_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.dirname(os.path.abspath(__file__)),
                        "cpu" in os.environ.get("JAX_PLATFORMS", "").lower())


def _peak_flops() -> float:
    """bf16 peak FLOP/s of one chip (MFU denominator for every path)."""
    kind = jax.devices()[0].device_kind.lower()
    for pat, peak in (("v5 lite", 197e12), ("v5e", 197e12), ("v5litepod", 197e12),
                      ("v4", 275e12), ("v5p", 459e12), ("v5", 459e12),
                      ("v6", 918e12), ("trillium", 918e12)):
        if pat in kind:
            return peak
    return 197e12


def _cost_flops(jitted, *args, **kwargs) -> float:
    """XLA's own FLOP estimate for one call of a jitted function."""
    try:
        c = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0) or 0.0)
    except Exception:
        return 0.0


def _mfu(flops_per_call: float, sec_per_call: float) -> float:
    if flops_per_call <= 0 or sec_per_call <= 0:
        return 0.0
    return flops_per_call / sec_per_call / _peak_flops()


def _decode_step_flops(model, n_enc: int, t_avg: int, r: int = 1) -> float:
    """Analytic matmul FLOPs of ONE incremental AR decode step (b=1)."""
    d = model.decoder_model_dimension
    ffn = model.decoder_feed_forward_dimension
    mel = model.mel_channels
    blocks = len(model.decoder_num_heads)
    f = 2 * (mel * model.decoder_prenet_dimension
             + model.decoder_prenet_dimension * d)          # prenet
    per_block = (2 * 3 * d * d                              # wq/wk/wv
                 + 2 * 2 * t_avg * d                        # self-attn qk + av
                 + 2 * 2 * d * d                            # concat out proj
                 + 2 * d * d                                # cross wq
                 + 2 * 2 * n_enc * d                        # cross-attn
                 + 2 * 2 * d * d                            # cross out proj
                 + 2 * 2 * d * ffn)                         # ffn d1+d2
    f += blocks * per_block
    f += 2 * d * mel * model.max_r                          # FinalProj
    W = model.postnet_conv_layers * (model.postnet_kernel_size - 1) + r
    k, cf = model.postnet_kernel_size, model.postnet_conv_filters
    f += 2 * W * k * (mel * cf
                      + max(model.postnet_conv_layers - 2, 0) * cf * cf
                      + cf * mel)                           # causal postnet
    f += 2 * W * d * 3                                      # stop head
    return float(f)


def _vocoder_step_flops(voc) -> float:
    """Analytic matmul FLOPs of ONE kernel sample step for ONE fold row."""
    d, fc = voc.rnn_dims, voc.fc_dims
    feat, adim, n_out = voc.feat_dims, voc.aux_dims, voc.n_classes
    return float(2 * ((feat + adim) * d            # in-kernel cond projection
                      + 2 * d * 3 * d              # GRU1 gi + gh
                      + (2 * d + adim) * 3 * d     # GRU2 x/a2/gh
                      + (d + adim) * fc            # fc1
                      + (fc + adim) * fc           # fc2
                      + fc * n_out))               # fc3


def _num_folds(wave_len: int, target: int, overlap: int) -> int:
    n = (wave_len - overlap) // (target + overlap)
    if wave_len - (n * (overlap + target) + overlap) != 0:
        n += 1
    return n


def _mxu_int8_supported() -> bool:
    """True when the committed Mosaic op-probe record shows every op the
    int8-MXU vocoder mode needs legalizes on this toolchain
    (scripts/probe_mosaic_ops.py). Gating on the probe file keeps a
    speculative Mosaic fault out of the bench run: nothing unproven
    executes on the worker here."""
    try:
        rec = json.loads(
            (Path(__file__).parent / "artifacts" / "soak"
             / "mosaic_ops_probe.json").read_text())
        return all(rec[k]["ok"]
                   for k in ("f32_to_i8", "i8_dot_i32", "i32_to_f32"))
    except (OSError, KeyError, ValueError):
        return False


def _dispatch_floor_sec(n: int = 15) -> float:
    """Round-trip cost of one null jitted dispatch+sync on this backend.

    The axon TPU tunnel's per-dispatch latency varies ~1000x between windows
    (measured 0.02 ms .. 25+ ms for the SAME null program). Any wall-clock
    per-call timing is bounded below by this floor, so the bench (a) reports
    it as window_health and (b) measures every hot path with `_device_time`,
    which amortizes ONE round trip over many chained device-side iterations.
    """
    null = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 128))
    jax.block_until_ready(null(x))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(null(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _device_time(stage, key, iters: int, n_trials: int = 4) -> float:
    """Per-call device time of ``stage(key)->pytree``, tunnel-proof.

    Chains calls of the stage inside ONE jitted lax.fori_loop (each with a
    distinct folded key; a scalar accumulator forces every iteration's full
    computation) and times the loop at N and 2N iterations: per-call time =
    (T_2N - T_N) / N. The two-point difference cancels ANY fixed per-call
    cost — the tunnel's round-trip floor flips between ~0.02 ms and ~27 ms
    on a minutes timescale (measured), so subtracting a floor sampled once
    is not safe; the difference of two best-of minima is.
    """
    def make(n):
        def chained(k):
            def body(i, acc):
                # HOISTING HAZARD: a stage whose OUTPUT ignores the key
                # entirely (inference paths with dropout off) is
                # loop-invariant, and XLA's LICM lifts it out of the while
                # loop — T_2N == T_N and the stage times as 0.0 (the
                # round-4/5 forward_tts/tts_encode records). Such stages
                # must route the key into a consumed input — see
                # _key_dependent_tokens. Key-consuming stages are naturally
                # loop-variant through fold_in(k, i).
                out = stage(jax.random.fold_in(k, i))
                # force EVERY leaf: independently-computed outputs (e.g. the
                # per-utterance finalize calls of a batched serve) would
                # otherwise be dead-code-eliminated and under-timed
                return acc + sum(
                    jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        return jax.jit(chained)

    f1, f2 = make(iters), make(2 * iters)
    jax.block_until_ready(f1(key))  # compile
    jax.block_until_ready(f2(key))
    b1 = b2 = float("inf")
    for i in range(n_trials):  # interleave so both see the same weather
        k = jax.random.fold_in(key, 1000 + i)
        t0 = time.perf_counter()
        jax.block_until_ready(f1(k))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2(k))
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / iters


def _key_dependent_tokens(tokens, k):
    """Key-dependent copy of an int token array, numerically identical.

    For timing stages whose compute ignores the rng key (inference, dropout
    off): `uniform(k) < 2.0` is always true but XLA cannot constant-fold a
    comparison on runtime random bits, so the selected tokens — and every op
    downstream — become loop-variant inside _device_time's fori_loop instead
    of being hoisted (the cause of the flat-0.0 forward_tts/tts_encode
    readings in the round-4/5 records). Cost: one tiny uniform + select.
    """
    live = jax.random.uniform(k, tokens.shape) < 2.0
    return jnp.where(live, tokens, tokens + 1)


def _two_point_carry_time(step1, carry, key, N=8, trials=3):
    """Per-step device time of a carry-threading step fn, tunnel-proof:
    `step1(carry, key_i) -> carry` chained N vs 2N times inside one jitted
    fori_loop; per-step time = (T_2N - T_N)/N (see _device_time)."""
    def make(n):
        def steps_n(c, k):
            def body(i, cc):
                return step1(cc, jax.random.fold_in(k, i))
            return jax.lax.fori_loop(0, n, body, c)
        return jax.jit(steps_n)

    f1, f2 = make(N), make(2 * N)
    jax.block_until_ready(jax.tree_util.tree_leaves(f1(carry, key))[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(f2(carry, key))[0])
    b1 = b2 = float("inf")
    for trial in range(trials):  # interleave so both see the same weather
        k = jax.random.fold_in(key, trial)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree_util.tree_leaves(f1(carry, k))[0])
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree_util.tree_leaves(f2(carry, k))[0])
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / N


def _bench_train(dtype, b=8):
    """Per-step device time + MFU of the reference-scale AR train step at
    batch ``b``: steps chained inside ONE jitted fori_loop (state carried on
    device), timed at N and 2N steps — the two-point difference cancels the
    tunnel round trip, so per-step time is device truth regardless of tunnel
    weather (see _device_time)."""
    from etts.models.autoregressive import AutoregressiveTransformer
    from etts.train import (TrainState, make_optimizer,
                            make_autoregressive_train_step)
    MEL_C = 80
    m = AutoregressiveTransformer(system_type="speaker_style_text",
                                  mel_channels=MEL_C, vocab_size=130,
                                  max_r=10, dtype=dtype)
    t_mel, t_txt = 384, 64
    kb = jax.random.PRNGKey(7)
    tmel = jax.random.normal(kb, (b, t_mel, MEL_C)) * 0.5
    tmel = tmel.at[:, 0].set(0.5).at[:, -1].set(-0.5)
    phon = jax.random.randint(kb, (b, t_txt), 1, 130)
    stop = jnp.ones((b, t_mel), jnp.int32).at[:, -1].set(2)
    spk_b = jax.random.normal(kb, (b, 256))
    variables = m.init({"params": kb, "dropout": kb, "prenet": kb},
                       phon, tmel, spk_b[:, None, :], r=1)
    tx = make_optimizer([[0, 1e-4]])
    state = TrainState.create(variables, tx)
    step = make_autoregressive_train_step(m, tx)
    batch = (tmel, phon, stop, spk_b)
    kwargs = dict(r=1, prenet_dropout=0.5, drop_n_heads=0)
    for _ in range(3):
        state, mtr, _ = step(state, batch, jnp.zeros(()), kb, **kwargs)
    jax.block_until_ready(mtr["loss"])

    dt = _two_point_carry_time(
        lambda s, k: step(s, batch, jnp.zeros(()), k, **kwargs)[0],
        state, kb)
    flops = _cost_flops(step, state, batch, jnp.zeros(()), kb, **kwargs)
    return dt, _mfu(flops, dt)


def _bench_train_mine(b=8):
    """Device time of the FULL reference recipe step at batch ``b``: the
    TTS update plus the fused MINE_CLUB zoo (6 nets over 3 pairs,
    make_mine_zoo_update) in one chained program — the cost the reference
    pays as 1 TTS dispatch + 6 eager per-net tapes per step
    (`traning_steps.py:16-95`)."""
    from etts.models.autoregressive import AutoregressiveTransformer
    from etts.models.mine import MINE, CLUB, MIState
    from etts.train import (TrainState, make_optimizer,
                            make_autoregressive_train_step,
                            make_mine_zoo_update)
    MEL_C, D, SPK = 80, 256, 256
    m = AutoregressiveTransformer(system_type="speaker_style_text",
                                  mel_channels=MEL_C, vocab_size=130,
                                  max_r=10, dtype=jnp.bfloat16)
    t_mel, t_txt = 384, 64
    kb = jax.random.PRNGKey(17)
    tmel = jax.random.normal(kb, (b, t_mel, MEL_C)) * 0.5
    tmel = tmel.at[:, 0].set(0.5).at[:, -1].set(-0.5)
    phon = jax.random.randint(kb, (b, t_txt), 1, 130)
    stop = jnp.ones((b, t_mel), jnp.int32).at[:, -1].set(2)
    spk_b = jax.random.normal(kb, (b, SPK))
    variables = m.init({"params": kb, "dropout": kb, "prenet": kb},
                       phon, tmel, spk_b[:, None, :], r=1)
    tx = make_optimizer([[0, 1e-4]])
    state = TrainState.create(variables, tx)
    step = make_autoregressive_train_step(m, tx)
    batch = (tmel, phon, stop, spk_b)
    kwargs = dict(r=1, prenet_dropout=0.5, drop_n_heads=0)

    nets = []
    for pair in ("style_text", "style_speaker", "text_speaker"):
        nets.append(("MINE", MINE(pair_type=pair, divergence_type="KL",
                                  beta_values=(0, 0.5, 1))))
        nets.append(("CLUB", CLUB(pair_type=pair,
                                  out_dim=D if pair == "style_text"
                                  else SPK)))
    mi_state = MIState.create(3)
    mine_tx = make_optimizer([[0, 1e-5]])
    dummy_t = jnp.zeros((b, 8, D))
    dummy_s = jnp.zeros((b, 1, D))
    dummy_k = jnp.zeros((b, 1, SPK))
    mstates = tuple(
        TrainState.create(net.init(jax.random.fold_in(kb, 100 + i), dummy_t,
                                   dummy_s, dummy_k, mi_state, kb), mine_tx)
        for i, (_, net) in enumerate(nets))
    zoo = make_mine_zoo_update(nets, mine_tx)

    def joint(carry, k):
        st, ms, mist = carry
        st, _, aux = step(st, batch, mist.mi_loss, k, **kwargs)
        rngs = tuple(jax.random.fold_in(k, i) for i in range(len(nets)))
        ms, mis, terms = zoo(ms, aux["text_enc_output"], aux["gst_output"],
                             spk_b[:, None, :], mist, rngs)
        return st, tuple(ms), mist.replace(mi_loss=jnp.sum(mis),
                                           exp_terms=terms)

    carry = (state, mstates, mi_state)
    for _ in range(2):
        carry = joint(carry, kb)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    return _two_point_carry_time(joint, carry, kb)


def train_curve():
    """bf16 train-step throughput scaling curve over batch size (ROADMAP #6:
    find the MFU knee now that per-step truth is ~3 ms). One JSON line."""
    g = _Guard()
    points = {}
    for b in (8, 16, 32, 64, 128):
        res = g(f"b{b}", lambda b=b: _bench_train(jnp.bfloat16, b=b))
        if res is not None:
            dt, mfu = res
            points[f"b{b}"] = {"step_ms": round(dt * 1e3, 2),
                               "samples_per_sec": round(b / dt, 1),
                               "mfu": round(mfu, 4)}
    dt_mine = g("b8_with_mine_zoo", lambda: _bench_train_mine(b=8))
    if dt_mine is not None:
        points["b8_with_mine_zoo"] = {
            "step_ms": round(dt_mine * 1e3, 2),
            "samples_per_sec": round(8 / dt_mine, 1)}
    # best over the TTS-only curve points (the mine point carries no mfu)
    curve = [p for p in points.values() if "mfu" in p]
    best = (max(curve, key=lambda p: p["samples_per_sec"])
            if curve else {"samples_per_sec": None, "mfu": None})
    print(json.dumps({"metric": "train_samples_per_sec_best",
                      "value": best["samples_per_sec"],
                      "unit": "samples/s", "vs_baseline": best["mfu"],
                      "extras": {**points, "stage_errors": g.errors,
                                 "backend": jax.default_backend()}}))


def serve():
    """Batched-serving benchmark: 8 concurrent 5 s utterances through the
    b=8 while_loop AR decode and the shared-sample-loop ``generate_batch``
    (int8 kernel weights on TPU, bf16 elsewhere). Two-point device timing
    (`_device_time`), one JSON line. RTF here is device-seconds per second
    of DELIVERED audio across the batch — the serving-throughput figure,
    vs. main()'s single-stream latency figure."""
    from etts.models.autoregressive import (AutoregressiveTransformer,
                                            autoregressive_predict)
    from etts.models.wavernn import WaveRNN, generate_batch

    g = _Guard()
    key = jax.random.PRNGKey(0)
    SR, HOP, MEL_C = 16000, 200, 80
    B, n_frames = 8, 400
    tts = AutoregressiveTransformer(system_type="speaker_style_text",
                                    mel_channels=MEL_C, vocab_size=130,
                                    max_r=10)
    phonemes = jnp.ones((B, 64), jnp.int32)

    def _setup():
        ref_mel = jax.random.normal(key, (B, 60, MEL_C))
        spk = jax.random.normal(key, (B, 1, 256))
        tts_vars = tts.init({"params": key, "dropout": key, "prenet": key},
                            phonemes[:1], ref_mel[:1], spk[:1], r=1)
        return ref_mel, spk, tts_vars

    setup = g("setup", _setup)
    if setup is None:
        print(json.dumps({"metric": "serve_rtf_batch8", "value": None,
                          "unit": "ratio", "vs_baseline": None,
                          "error": "setup_failed",
                          "extras": {"stage_errors": g.errors,
                                     "backend": jax.default_backend()}}))
        return
    ref_mel, spk, tts_vars = setup

    def tts_decode(k):
        return autoregressive_predict(tts, tts_vars, phonemes, ref_mel, spk,
                                      r=1, max_length=n_frames - 1, key=k,
                                      stop_enabled=False)["mel"]

    def _tts_stage():
        mel = jax.jit(tts_decode)(key)
        jax.block_until_ready(mel)
        return mel, _device_time(tts_decode, key, iters=4)

    mel, tts_time = g("tts_b8", _tts_stage, default=(None, None))
    if mel is None:
        mel = g("standin_mel",
                lambda: jax.random.normal(key, (B, n_frames, MEL_C)))

    voc = WaveRNN(feat_dims=MEL_C, hop_length=HOP, sample_rate=SR,
                  mode="MOL")
    voc_bf16 = voc_int8 = voc_int8_mxu = None
    if mel is not None:
        voc_vars = g("voc_init",
                     lambda: voc.init(key, jnp.zeros((1, 8 * HOP)),
                                      jnp.zeros((1, 12, MEL_C)), False))
    else:
        voc_vars = None
    if voc_vars is not None:
        mels01 = [(mel[i] + 4.0) / 8.0 for i in range(B)]

        def vocode(k, int8):
            return generate_batch(voc, voc_vars, mels01, mu_law=False, key=k,
                                  int8_weights=int8)

        def _voc_stage(flag):
            jax.block_until_ready(jax.jit(lambda k: vocode(k, flag))(key))
            return _device_time(lambda k: vocode(k, flag), key, iters=4)

        voc_bf16 = g("vocoder_b8_bf16", lambda: _voc_stage(False))
        if jax.default_backend() == "tpu":
            voc_int8 = g("vocoder_b8_int8", lambda: _voc_stage(True))
            if _mxu_int8_supported():
                voc_int8_mxu = g("vocoder_b8_int8_mxu",
                                 lambda: _voc_stage("mxu"))
    voc_times = [t for t in (voc_bf16, voc_int8, voc_int8_mxu) if t]
    voc_time = min(voc_times) if voc_times else None

    audio_sec = B * (n_frames - 1) * HOP / SR
    total_samples = B * (n_frames - 1) * HOP
    rtf = ((tts_time + voc_time) / audio_sec
           if tts_time is not None and voc_time is not None else None)
    floor = g("dispatch_floor", _dispatch_floor_sec)

    def _r(x, nd=4):
        return None if x is None else round(x, nd)

    print(json.dumps({
        "metric": "serve_rtf_batch8", "value": _r(rtf, 5),
        "unit": "device_sec_per_audio_sec",
        "vs_baseline": _r(rtf / 0.1 if rtf is not None else None),
        "extras": {
            "tts_b8_sec": _r(tts_time),
            "vocoder_b8_bf16_sec": _r(voc_bf16),
            "vocoder_b8_int8_sec": _r(voc_int8),
            "vocoder_b8_int8_mxu_sec": _r(voc_int8_mxu),
            "wavernn_samples_per_sec": (_r(total_samples / voc_time, 1)
                                        if voc_time else None),
            "audio_sec": round(audio_sec, 2),
            "x_realtime": _r(1.0 / rtf if rtf else None, 1),
            "dispatch_floor_ms": _r(floor * 1e3 if floor is not None
                                    else None, 3),
            "stage_errors": g.errors,
            "backend": jax.default_backend()}}))


def _transient(e: Exception) -> bool:
    """True for tunnel-weather faults worth one retry: the axon HTTP proxy
    drops bodies / times out under load (BENCH_r04: `read body: response
    body closed before all bytes were read` at minute ~N of an otherwise
    healthy run), while the device + this process's arrays stay valid."""
    s = repr(e)
    return any(tok in s for tok in (
        "read body", "remote_compile", "INTERNAL", "UNAVAILABLE",
        "DEADLINE_EXCEEDED", "connection", "Connection", "EOF"))


def _wait_backend(max_wait: int = 240, poll: int = 20) -> bool:
    """After a transient fault, poll (subprocess probe, hard timeout — PJRT
    blocks inside a C call when the tunnel is down, see _probe_backend)
    until one trivial dispatch round-trips, or give up after ``max_wait``s."""
    import subprocess
    probe_src = ("import jax, jax.numpy as jnp;"
                 "jax.jit(lambda a: a + 1)(jnp.zeros(())).block_until_ready()")
    deadline = time.monotonic() + max_wait
    while time.monotonic() < deadline:
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               capture_output=True, timeout=90)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(poll)
    return False


class _Guard:
    """Per-stage fault isolation for the measurement pipeline.

    VERDICT r4 weak #1: two consecutive rounds lost the ENTIRE official perf
    record to one mid-run tunnel fault because main() ran ~10 stages with no
    per-stage recovery. Every stage now runs under this guard: a transient
    fault gets ONE retry after the backend re-probes healthy; a persistent
    failure records ``{stage: error}`` and the run continues, so the final
    JSON line always carries whatever WAS measured (and the driver sees
    rc=0)."""

    def __init__(self):
        self.errors = {}

    def __call__(self, name, fn, default=None):
        for attempt in (0, 1):
            try:
                return fn()
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:  # noqa: BLE001 — the record IS the handler
                msg = f"{type(e).__name__}: {str(e)[:280]}"
                if attempt == 0 and _transient(e) and _wait_backend():
                    continue
                self.errors[name] = msg
                return default


def main():
    from etts.models.autoregressive import (AutoregressiveTransformer,
                                            autoregressive_predict)
    from etts.models.wavernn import WaveRNN, generate

    g = _Guard()

    key = jax.random.PRNGKey(0)
    SR, HOP, MEL_C = 16000, 200, 80

    # flagship AR model at reference scale (autoregressive_config.yaml)
    tts = AutoregressiveTransformer(system_type="speaker_style_text",
                                    mel_channels=MEL_C, vocab_size=130,
                                    max_r=10)
    t_text = 64
    phonemes = jnp.ones((1, t_text), jnp.int32)
    n_frames = 400  # 5.0 s of audio at hop 200 / 16 kHz
    decode_steps = n_frames  # r=1
    voc = WaveRNN(feat_dims=MEL_C, hop_length=HOP, sample_rate=SR, mode="MOL")

    def _setup():
        ref_mel = jax.random.normal(key, (1, 60, MEL_C))
        spk = jax.random.normal(key, (1, 1, 256))
        tts_vars = tts.init({"params": key, "dropout": key, "prenet": key},
                            phonemes, ref_mel, spk, r=1)
        # vocoder at reference scale (WaveRNN/hparams.py)
        voc_vars = voc.init(key, jnp.zeros((1, 8 * HOP)),
                            jnp.zeros((1, 12, MEL_C)), False)
        return ref_mel, spk, tts_vars, voc_vars

    setup = g("setup", _setup)
    if setup is None:
        # nothing downstream can run without weights on device: emit the
        # structured no-measurement record (rc=0 keeps it archived)
        print(json.dumps({
            "metric": "rtf_text_to_wav", "value": None, "unit": "ratio",
            "vs_baseline": None, "error": "setup_failed",
            "extras": {"stage_errors": g.errors,
                       "backend": jax.default_backend()}}))
        return
    ref_mel, spk, tts_vars, voc_vars = setup

    def tts_decode(k):
        out = autoregressive_predict(tts, tts_vars, phonemes, ref_mel, spk,
                                     r=1, max_length=decode_steps - 1, key=k,
                                     stop_enabled=False)
        return out["mel"]

    # tunnel health: every hot path below is timed with _device_time (chained
    # device-side iterations), so the headline reflects device truth even
    # when the tunnel's per-dispatch round trip degrades to tens of ms
    floor = g("dispatch_floor", _dispatch_floor_sec)
    window_health = ("unknown" if floor is None
                     else "healthy" if floor < 2e-3 else "degraded")

    def _while_loop_stage():
        mel = jax.jit(tts_decode)(key)  # compile + output for later stages
        mel.block_until_ready()
        return mel, _device_time(tts_decode, key, iters=4)

    mel, tts_while_loop_time = g("tts_while_loop", _while_loop_stage,
                                 default=(None, None))
    tts_time = tts_while_loop_time

    # fused Pallas decode-step megakernel (single-stream serving path)
    on_tpu = jax.default_backend() == "tpu"
    encode_time = None
    if on_tpu:
        def _fused_stage():
            from etts.ops.pallas.decoder_step import make_fused_decoder
            fused = make_fused_decoder(tts, max_steps=decode_steps,
                                       stop_enabled=False)

            def tts_fused(k):
                ekey, dkey = jax.random.split(k)
                enc_out, *_ = tts.apply(
                    tts_vars, phonemes, ref_mel, spk, False, False, 0,
                    method=AutoregressiveTransformer.encode,
                    rngs={"dropout": ekey, "prenet": ekey})
                m, length, _ = fused(tts_vars, enc_out, dkey, 0.5)
                return m

            mel_f = jax.jit(tts_fused)(key)
            mel_f.block_until_ready()
            return mel_f[:, :decode_steps, :], _device_time(tts_fused, key,
                                                            iters=8)

        fused_res = g("tts_fused", _fused_stage)
        if fused_res is not None:
            mel, tts_time = fused_res

        def _enc_stage():
            def enc_only(k):
                ekey, _ = jax.random.split(k)
                phon_k = _key_dependent_tokens(phonemes, k)
                return tts.apply(
                    tts_vars, phon_k, ref_mel, spk, False, False, 0,
                    method=AutoregressiveTransformer.encode,
                    rngs={"dropout": ekey, "prenet": ekey})[0]

            return _device_time(enc_only, key, iters=16)

        encode_time = g("tts_encode", _enc_stage)

    if mel is None:  # both decode paths failed: a fixed-length stand-in mel
        mel = g("standin_mel",
                lambda: jax.random.normal(key, (1, decode_steps, MEL_C)))
    voc_mel = (mel[0] + 4.0) / 8.0 if mel is not None else None

    def vocode(m, k):
        return generate(voc, voc_vars, m[None], batched=True, target=11000,
                        overlap=550, mu_law=False, key=k)

    def _voc_stage():
        wav = jax.jit(vocode)(voc_mel, key)
        wav.block_until_ready()
        return wav, _device_time(lambda k: vocode(voc_mel, k), key, iters=4)

    wav, voc_time_bf16 = ((None, None) if voc_mel is None
                          else g("vocoder_bf16", _voc_stage,
                                 default=(None, None)))
    voc_time = voc_time_bf16
    voc_int8 = False
    voc_time_int8 = None
    voc_time_int8_mxu = None
    if on_tpu and voc_time_bf16 is not None:
        # int8 kernel weights (per-column scales, f32 accumulate): halves
        # the VMEM weight stream that floors the per-step time; gated by the
        # --verify int8 parity/quality phase. "mxu" = native int8 MXU dots
        # (ROADMAP r5 #4), only tried once probe_mosaic_ops proved the ops.
        flags = [True] + (["mxu"] if _mxu_int8_supported() else [])
        times = {}
        for flag in flags:
            def _i8_stage(flag=flag):
                def vocode_i8(m, k):
                    return generate(voc, voc_vars, m[None], batched=True,
                                    target=11000, overlap=550, mu_law=False,
                                    key=k, int8_weights=flag)

                jax.block_until_ready(jax.jit(vocode_i8)(voc_mel, key))
                return _device_time(lambda k: vocode_i8(voc_mel, k), key,
                                    iters=4)

            t = g(f"vocoder_int8_{flag}", _i8_stage)
            if t is not None:
                times[flag] = t
        voc_time_int8 = times.get(True)
        voc_time_int8_mxu = times.get("mxu")
        if times and min(times.values()) < voc_time_bf16:
            voc_time = min(times.values())
            voc_int8 = [f for f, t in times.items() if t == voc_time][0]

    # DSP frontend speed (BASELINE config 1: mel extraction + Griffin-Lim)
    def _mel_extract_stage():
        from etts.ops.audio import AudioProcessor
        ap = AudioProcessor(dict(sampling_rate=SR, n_fft=2048, hop_length=HOP,
                                 win_length=800, mel_channels=MEL_C, f_min=40,
                                 f_max=None, normalizer="WaveRNN"))
        wav5 = jnp.asarray(
            np.random.default_rng(0).standard_normal(5 * SR), jnp.float32)
        jax.block_until_ready(ap.mel_spectrogram(wav5))
        return _device_time(
            lambda k: ap.mel_spectrogram(wav5 * jax.random.uniform(k)),
            key, iters=8)

    mel_extract_sec = g("mel_extraction", _mel_extract_stage)

    # --- streamed synthesis: first-audio latency ----------------------------
    def _stream_stage():
        from etts.streaming import stream_synthesize

        def first_audio_sec():
            gen = stream_synthesize(tts, tts_vars, voc, voc_vars, phonemes,
                                    ref_mel, spk, r=1,
                                    max_length=decode_steps - 1,
                                    mel_chunk=40, stop_enabled=False,
                                    mu_law=False, key=key)
            t0 = time.perf_counter()
            first = next(gen)
            jax.block_until_ready(first)
            dt = time.perf_counter() - t0
            gen.close()
            return dt, first.shape[0] / SR

        first_audio_sec()  # compile
        return min((first_audio_sec() for _ in range(5)), key=lambda t: t[0])

    fa, chunk_audio = g("first_audio", _stream_stage, default=(None, None))

    # --- training-step throughput + MFU, fp32 vs bf16 mixed precision -------
    train_fp32 = g("train_fp32", lambda: _bench_train(jnp.float32),
                   default=(None, None))
    train_bf16 = g("train_bf16", lambda: _bench_train(jnp.bfloat16),
                   default=(None, None))
    # the step is dispatch-bound at batch 8; per-chip throughput scales
    # nearly free with batch (b=32 runs at ~the same wall time)
    train_b32 = g("train_bf16_b32",
                  lambda: _bench_train(jnp.bfloat16, b=32),
                  default=(None, None))
    # b=16 was the round-4 MFU peak (30.6%) — keep it in the record so the
    # batch sweep brackets the knee
    train_b16 = g("train_bf16_b16",
                  lambda: _bench_train(jnp.bfloat16, b=16),
                  default=(None, None))
    train_fp32_sec, mfu_train_fp32 = train_fp32
    train_bf16_sec, mfu_train_bf16 = train_bf16
    train_b32_sec, mfu_train_b32 = train_b32
    train_b16_sec, mfu_train_b16 = train_b16

    # --- forward (duration-based) acoustic model: one-shot MXU decode -------
    # the non-AR synthesis path (SURVEY §2.1 ForwardTransformer): the whole
    # mel comes out of ONE jitted call (encoder + duration regulation +
    # decoder + postnet), so text->mel is pure batched MXU work with no
    # sequential decode at all
    def _forward_stage():
        from etts.models.forward import ForwardTransformer
        fm = ForwardTransformer(mel_channels=MEL_C, vocab_size=130)
        fvars = fm.init({"params": key, "dropout": key, "prenet": key},
                        phonemes, jnp.full((1, t_text, 1), 2.0),
                        max_frames=512)

        def fwd_mel(k):
            phon_k = _key_dependent_tokens(phonemes, k)
            return fm.apply(fvars, phon_k, None, max_frames=512,
                            rngs={"dropout": k, "prenet": k})["mel"]

        jax.block_until_ready(jax.jit(fwd_mel)(key))
        # the one-shot forward pass is ~100 us: it needs far more chained
        # iterations than the ms-scale paths for the two-point difference
        # to rise above tunnel jitter (round-4 recorded a flat 0.0; round-5
        # at iters=64 STILL did — the N-vs-2N delta of ~6 ms sat inside the
        # best-of-minima noise. 512 extra iterations make the delta ~50 ms.)
        return _device_time(fwd_mel, key, iters=512, n_trials=8)

    fwd_sec = g("forward_tts", _forward_stage)
    fwd_extras = {}
    if fwd_sec is not None:
        fwd_extras["forward_tts_sec"] = round(fwd_sec, 7)  # sub-µs visible
        if voc_time is not None:
            # text -> 5 s of audio with the measured vocoder: the forward
            # path's end-to-end serving RTF (mel cost ~0 next to vocoding)
            fwd_extras["forward_rtf_text_to_wav"] = round(
                (fwd_sec + voc_time) / ((n_frames - 1) * HOP / SR), 5)

    # per-path MFU (bf16 chip peak as denominator everywhere)
    mfu_decode = None
    if tts_time is not None:
        dec_flops = _decode_step_flops(tts, n_enc=t_text,
                                       t_avg=decode_steps // 2)
        mfu_decode = _mfu(dec_flops * decode_steps, tts_time)
    mfu_vocoder = None
    if voc_time is not None:
        wave_len = (n_frames - 1) * HOP
        n_folds = _num_folds(wave_len, 11000, 550)
        voc_flops = _vocoder_step_flops(voc) * n_folds * (11000 + 2 * 550)
        mfu_vocoder = _mfu(voc_flops, voc_time)

    def _r(x, nd=4):
        return None if x is None else round(x, nd)

    rtf = None
    audio_sec = None
    if wav is not None and tts_time is not None and voc_time is not None:
        audio_sec = wav.shape[0] / SR
        rtf = (tts_time + voc_time) / audio_sec
    result = {
        "metric": "rtf_text_to_wav",
        "value": _r(rtf, 5),
        # device compute time per audio second, measured via chained
        # device-side iteration loops (one tunnel round trip amortized over
        # all iterations) — see _device_time; this is what a production host
        # without the development tunnel pays (plus one ~100 us local
        # dispatch per request)
        "unit": "device_sec_per_audio_sec",
        "vs_baseline": _r(rtf / 0.1 if rtf is not None else None),
        "extras": {
            "tts_sec": _r(tts_time),
            "tts_encode_sec": _r(encode_time, 5),
            "tts_while_loop_sec": _r(tts_while_loop_time),
            "tts_fused_kernel": bool(on_tpu and "tts_fused" not in g.errors),
            "vocoder_sec": _r(voc_time),
            "vocoder_bf16_sec": _r(voc_time_bf16),
            "vocoder_int8_sec": _r(voc_time_int8),
            "vocoder_int8_mxu_sec": _r(voc_time_int8_mxu),
            "vocoder_int8": voc_int8,
            "dispatch_floor_ms": _r(floor * 1e3 if floor is not None
                                    else None, 3),
            "window_health": window_health,
            "audio_sec": _r(audio_sec, 3),
            "wavernn_samples_per_sec":
                (_r(wav.shape[0] / voc_time, 1)
                 if wav is not None and voc_time else None),
            "mel_frames_per_sec":
                (_r(mel.shape[1] / tts_time, 1)
                 if mel is not None and tts_time else None),
            "mel_extraction_x_realtime":
                _r(5.0 / mel_extract_sec if mel_extract_sec else None, 1),
            "first_audio_ms": _r(fa * 1e3 if fa is not None else None, 1),
            "first_audio_chunk_sec": _r(chunk_audio, 3),
            "train_step_fp32_ms": _r(train_fp32_sec * 1e3
                                     if train_fp32_sec else None, 2),
            "train_step_bf16_ms": _r(train_bf16_sec * 1e3
                                     if train_bf16_sec else None, 2),
            "bf16_train_speedup":
                (_r(train_fp32_sec / train_bf16_sec, 2)
                 if train_fp32_sec and train_bf16_sec else None),
            "mfu_train_fp32": _r(mfu_train_fp32),
            "mfu_train_bf16": _r(mfu_train_bf16),
            "train_step_bf16_b32_ms": _r(train_b32_sec * 1e3
                                         if train_b32_sec else None, 2),
            "mfu_train_bf16_b32": _r(mfu_train_b32),
            "train_samples_per_sec_b32": _r(32 / train_b32_sec
                                            if train_b32_sec else None, 1),
            "train_step_bf16_b16_ms": _r(train_b16_sec * 1e3
                                         if train_b16_sec else None, 2),
            "mfu_train_bf16_b16": _r(mfu_train_b16),
            "mfu_ar_decode": _r(mfu_decode),
            "mfu_vocoder_kernel": _r(mfu_vocoder),
            **fwd_extras,
            "stage_errors": g.errors,
            "peak_flops": _peak_flops(),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


def verify():
    """Pallas-kernel-vs-scan numerical parity at PRODUCTION shape on the live
    backend (VERDICT r1: commit an on-hardware check, not just interpret mode).

    RAW mode with peaky logits makes sampling deterministic (argmax), so the
    kernel's recurrence (in-kernel cond projection, both GRUs, FCs, sampling
    select) must match a lax.scan reference that mirrors the kernel's
    bf16-at-matmul-input casts. The sample-feedback weight is zeroed for this
    check so a single borderline argmax flip cannot cascade down the
    autoregressive chain (feedback itself is covered by the same-seed
    determinism check below and the interpret-mode tests). Also checks MoL
    concentrated-means sampling. Prints one JSON line."""
    from etts.ops.pallas.wavernn_cell import wavernn_sample_loop
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    D = FC = 512
    FEAT, ADIM = 80, 32
    T = 256
    results = {}
    for B in (8, 56):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 20)
        s = 0.08
        n_classes = 512
        w = dict(
            W_I=jax.random.normal(ks[0], (1 + FEAT + ADIM, D)) * s,
            b_I=jax.random.normal(ks[1], (D,)) * s,
            wi1=jax.random.normal(ks[2], (D, 3 * D)) * s,
            wh1=jax.random.normal(ks[3], (D, 3 * D)) * s,
            bi1=jax.random.normal(ks[4], (3 * D,)) * s,
            bh1=jax.random.normal(ks[5], (3 * D,)) * s,
            w2x=jax.random.normal(ks[6], (D, 3 * D)) * s,
            w2a=jax.random.normal(ks[7], (ADIM, 3 * D)) * s,
            wh2=jax.random.normal(ks[8], (D, 3 * D)) * s,
            bi2=jax.random.normal(ks[9], (3 * D,)) * s,
            bh2=jax.random.normal(ks[10], (3 * D,)) * s,
            wf1x=jax.random.normal(ks[11], (D, FC)) * s,
            wf1a=jax.random.normal(ks[12], (ADIM, FC)) * s,
            bf1=jnp.zeros((FC,)),
            wf2x=jax.random.normal(ks[13], (FC, FC)) * s,
            wf2a=jax.random.normal(ks[14], (ADIM, FC)) * s,
            bf2=jnp.zeros((FC,)),
            wf3=jax.random.normal(ks[15], (FC, n_classes)) * 100.0,  # peaky
            bf3=jnp.zeros((n_classes,)),
        )
        # zero the sample-feedback row so one borderline argmax flip cannot
        # cascade; everything else in the recurrence is exercised
        w["W_I"] = w["W_I"].at[0].set(0.0)
        cond = jax.random.normal(ks[16], (T, B, FEAT + 4 * ADIM)) * 0.1

        def scan_ref(cond, w):
            d = D
            bf = jnp.bfloat16

            def dot(a, m):  # mirror the kernel: bf16 inputs, f32 accumulation
                return jnp.dot(a.astype(bf), m.astype(bf),
                               preferred_element_type=jnp.float32)

            def step(carry, c):
                h1, h2, x_prev = carry
                c = c.astype(bf).astype(jnp.float32)
                mel_a1 = c[:, :FEAT + ADIM]
                a2 = c[:, FEAT + ADIM:FEAT + 2 * ADIM]
                a3 = c[:, FEAT + 2 * ADIM:FEAT + 3 * ADIM]
                a4 = c[:, FEAT + 3 * ADIM:]
                inp = (dot(mel_a1, w["W_I"][1:]) + w["b_I"]
                       + x_prev * w["W_I"][0][None, :])
                gi1 = dot(inp, w["wi1"]) + w["bi1"]
                gh1 = dot(h1, w["wh1"]) + w["bh1"]
                r = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
                z = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
                n = jnp.tanh(gi1[:, 2 * d:] + r * gh1[:, 2 * d:])
                h1 = (1 - z) * n + z * h1
                x = inp + h1
                gi2 = dot(x, w["w2x"]) + dot(a2, w["w2a"]) + w["bi2"]
                gh2 = dot(h2, w["wh2"]) + w["bh2"]
                r = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
                z = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
                n = jnp.tanh(gi2[:, 2 * d:] + r * gh2[:, 2 * d:])
                h2 = (1 - z) * n + z * h2
                x = x + h2
                y = jax.nn.relu(dot(x, w["wf1x"]) + dot(a3, w["wf1a"])
                                + w["bf1"])
                y = jax.nn.relu(dot(y, w["wf2x"]) + dot(a4, w["wf2a"])
                                + w["bf2"])
                logits = dot(y, w["wf3"]) + w["bf3"]
                cls = jnp.argmax(logits, -1).astype(jnp.float32)
                smp = 2.0 * cls / (n_classes - 1.0) - 1.0
                return (h1, h2, smp[:, None]), smp

            init = (jnp.zeros((B, d)), jnp.zeros((B, d)), jnp.zeros((B, 1)))
            return jax.lax.scan(step, init, cond)[1]

        want = np.asarray(jax.jit(scan_ref)(cond, w))

        def run_kernel(seed):
            return np.asarray(wavernn_sample_loop(
                cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"],
                w["bh1"], w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
                w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"],
                w["bf2"], w["wf3"], w["bf3"], seed, feat=FEAT, adim=ADIM,
                mode="RAW", n_classes=n_classes, interpret=interpret))

        got = run_kernel(3)
        agree = float(np.mean(got == want))
        results[f"raw_agreement_B{B}"] = round(agree, 5)
        # borderline argmax flips from Mosaic-vs-XLA f32 accumulation order
        # cost ~0.5%; a real recurrence bug collapses agreement to ~1/512
        assert agree > 0.98, f"B={B}: kernel/scan agreement {agree}"
        # same-seed determinism (covers the sample-feedback path end to end)
        assert np.array_equal(got, run_kernel(3)), "kernel nondeterministic"

        # int8-weight parity/quality gate (VERDICT r2 #2): per-column
        # symmetric quantization shifts borderline argmax decisions, so the
        # bar is high agreement, not equality; a broken quantization path
        # collapses to ~1/512
        got8 = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"],
            w["bh1"], w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"],
            w["bf2"], w["wf3"], w["bf3"], 3, feat=FEAT, adim=ADIM,
            mode="RAW", n_classes=n_classes, interpret=interpret,
            weight_dtype="int8"))
        agree8 = float(np.mean(got8 == want))
        val_err8 = float(np.mean(np.abs(got8 - want)))
        results[f"int8_agreement_B{B}"] = round(agree8, 5)
        results[f"int8_value_err_B{B}"] = round(val_err8, 5)
        assert agree8 > 0.85, f"B={B}: int8/scan agreement {agree8}"
        assert val_err8 < 0.05, f"B={B}: int8 value error {val_err8}"

        # int8-MXU mode (native i8 dots + dynamic activation quantization):
        # same bars; only run once the op probe proved the toolchain
        if interpret or _mxu_int8_supported():
            got8m = np.asarray(wavernn_sample_loop(
                cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"],
                w["bh1"], w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
                w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"],
                w["bf2"], w["wf3"], w["bf3"], 3, feat=FEAT, adim=ADIM,
                mode="RAW", n_classes=n_classes, interpret=interpret,
                weight_dtype="int8_mxu"))
            agree8m = float(np.mean(got8m == want))
            val_err8m = float(np.mean(np.abs(got8m - want)))
            results[f"int8_mxu_agreement_B{B}"] = round(agree8m, 5)
            results[f"int8_mxu_value_err_B{B}"] = round(val_err8m, 5)
            assert agree8m > 0.85, \
                f"B={B}: int8_mxu/scan agreement {agree8m}"
            assert val_err8m < 0.05, f"B={B}: int8_mxu value err {val_err8m}"

        # MoL concentrated-means: all samples must land on the forced mean
        w["wf3"] = jnp.zeros((FC, 30))
        bf3 = np.zeros(30, np.float32)
        bf3[10:20] = 0.5
        bf3[20:30] = -8.0
        w["bf3"] = jnp.asarray(bf3)
        got = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
            w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
            w["wf3"], w["bf3"], 5, feat=FEAT, adim=ADIM, mode="MOL",
            interpret=interpret))
        err = float(np.abs(got - 0.5).max())
        results[f"mol_mean_err_B{B}"] = round(err, 5)
        assert err < 0.02, f"B={B}: MoL mean error {err}"
        got8 = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
            w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
            w["wf3"], w["bf3"], 5, feat=FEAT, adim=ADIM, mode="MOL",
            interpret=interpret, weight_dtype="int8"))
        err8 = float(np.abs(got8 - 0.5).max())
        results[f"mol_int8_mean_err_B{B}"] = round(err8, 5)
        assert err8 < 0.03, f"B={B}: int8 MoL mean error {err8}"

    # ---- feedback-path phase (VERDICT r2 #8): NONZERO sample-feedback at
    # production shape, f32 weights in the kernel vs an f32 scan. Exact
    # equality is impossible (Mosaic and XLA order f32 accumulations
    # differently), so the check is attribution: trajectories must agree on
    # a long prefix, and the FIRST diverging step (if any) must be a
    # borderline argmax decision (tiny top-2 logit gap in the scan), never a
    # confident one — a real recurrence/feedback bug diverges confidently.
    D = FC = 512
    T = 512
    B = 8
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 20)
    s = 0.08
    n_classes = 512
    w = dict(
        W_I=jax.random.normal(ks[0], (1 + FEAT + ADIM, D)) * s,  # row 0 LIVE
        b_I=jax.random.normal(ks[1], (D,)) * s,
        wi1=jax.random.normal(ks[2], (D, 3 * D)) * s,
        wh1=jax.random.normal(ks[3], (D, 3 * D)) * s,
        bi1=jax.random.normal(ks[4], (3 * D,)) * s,
        bh1=jax.random.normal(ks[5], (3 * D,)) * s,
        w2x=jax.random.normal(ks[6], (D, 3 * D)) * s,
        w2a=jax.random.normal(ks[7], (ADIM, 3 * D)) * s,
        wh2=jax.random.normal(ks[8], (D, 3 * D)) * s,
        bi2=jax.random.normal(ks[9], (3 * D,)) * s,
        bh2=jax.random.normal(ks[10], (3 * D,)) * s,
        wf1x=jax.random.normal(ks[11], (D, FC)) * s,
        wf1a=jax.random.normal(ks[12], (ADIM, FC)) * s,
        bf1=jnp.zeros((FC,)),
        wf2x=jax.random.normal(ks[13], (FC, FC)) * s,
        wf2a=jax.random.normal(ks[14], (ADIM, FC)) * s,
        bf2=jnp.zeros((FC,)),
        wf3=jax.random.normal(ks[15], (FC, n_classes)) * 100.0,  # peaky
        bf3=jnp.zeros((n_classes,)),
    )
    cond = jax.random.normal(ks[16], (T, B, FEAT + 4 * ADIM)) * 0.1

    def scan_f32(cond, w):
        d = D

        def step(carry, c):
            h1, h2, x_prev = carry
            mel_a1 = c[:, :FEAT + ADIM]
            a2 = c[:, FEAT + ADIM:FEAT + 2 * ADIM]
            a3 = c[:, FEAT + 2 * ADIM:FEAT + 3 * ADIM]
            a4 = c[:, FEAT + 3 * ADIM:]
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            inp = (dot(mel_a1, w["W_I"][1:]) + w["b_I"]
                   + x_prev * w["W_I"][0][None, :])
            gi1 = dot(inp, w["wi1"]) + w["bi1"]
            gh1 = dot(h1, w["wh1"]) + w["bh1"]
            r = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
            z = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
            n = jnp.tanh(gi1[:, 2 * d:] + r * gh1[:, 2 * d:])
            h1 = (1 - z) * n + z * h1
            x = inp + h1
            gi2 = dot(x, w["w2x"]) + dot(a2, w["w2a"]) + w["bi2"]
            gh2 = dot(h2, w["wh2"]) + w["bh2"]
            r = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
            z = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
            n = jnp.tanh(gi2[:, 2 * d:] + r * gh2[:, 2 * d:])
            h2 = (1 - z) * n + z * h2
            x = x + h2
            y = jax.nn.relu(dot(x, w["wf1x"]) + dot(a3, w["wf1a"])
                            + w["bf1"])
            y = jax.nn.relu(dot(y, w["wf2x"]) + dot(a4, w["wf2a"])
                            + w["bf2"])
            logits = dot(y, w["wf3"]) + w["bf3"]
            top2 = jax.lax.top_k(logits, 2)[0]
            gap = top2[:, 0] - top2[:, 1]
            cls = jnp.argmax(logits, -1).astype(jnp.float32)
            smp = 2.0 * cls / (n_classes - 1.0) - 1.0
            return (h1, h2, smp[:, None]), (smp, gap)

        init = (jnp.zeros((B, D)), jnp.zeros((B, D)), jnp.zeros((B, 1)))
        _, (samples, gaps) = jax.lax.scan(step, init, cond)
        return samples, gaps

    want, gaps = jax.jit(scan_f32)(cond, w)
    want, gaps = np.asarray(want), np.asarray(gaps)
    got = np.asarray(wavernn_sample_loop(
        cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
        w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
        w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
        w["wf3"], w["bf3"], 7, feat=FEAT, adim=ADIM, mode="RAW",
        n_classes=n_classes, interpret=interpret,
        weight_dtype=jnp.float32))
    # Per-stream prefix agreement + attribution of the first divergence.
    # Borderline attribution is only sound in the pre-chaos window: the GRU
    # recurrence here is chaotic (random weights, recurrent spectral norm
    # >> 1), so Mosaic-vs-XLA f32 accumulation-order differences amplify by
    # a few x per step and can flip a CONFIDENT argmax after ~30+ identical
    # steps on a perfectly correct kernel (observed: 61 identical steps,
    # then a gap-10 flip). A real feedback/recurrence bug fires within a
    # few steps of the first feedback use, so the confident-divergence
    # check applies only below the chaos horizon.
    min_prefix = T
    div = []
    for bi in range(B):
        mism = np.nonzero(got[:, bi] != want[:, bi])[0]
        if mism.size:
            m = int(mism[0])
            min_prefix = min(min_prefix, m)
            div.append((m, round(float(gaps[m, bi]), 2)))
            if m < 32:
                assert gaps[m, bi] < 1.0, (
                    f"stream {bi}: diverged at step {m} on a CONFIDENT "
                    f"decision (top-2 gap {gaps[m, bi]:.2f}) — "
                    f"feedback-path bug")
    results["feedback_min_prefix"] = int(min_prefix)
    results["feedback_exact"] = bool(min_prefix == T)
    results["feedback_divergences"] = div  # (first step, scan top-2 gap)
    assert min_prefix >= 32, f"immediate divergence at step {min_prefix}"

    print(json.dumps({"metric": "pallas_parity", "value": 1.0,
                      "unit": "pass", "vs_baseline": 1.0,
                      "extras": {**results,
                                 "backend": jax.default_backend(),
                                 "compiled": on_tpu}}))


def _probe_backend() -> None:
    """Fail fast (and loudly structured) if the device backend is dead.

    VERDICT r3 weak #1: when the axon tunnel died mid-round, bench.py
    archived a 40-line traceback as the round's official perf record.
    A perf harness that measures tunnel weather should also catch
    backend-init failure and emit ONE self-describing JSON line.
    """
    # The probe runs in a SUBPROCESS with a hard timeout: a dead tunnel
    # does not raise — PJRT init blocks indefinitely inside a C call, so
    # neither try/except nor signal.alarm in-process can bound it.
    import subprocess
    probe_src = ("import jax, jax.numpy as jnp;"
                 "jax.jit(lambda a: a + 1)(jnp.zeros(())).block_until_ready()")
    budget = int(os.environ.get("ETTS_BENCH_PROBE_TIMEOUT", "300"))
    try:
        r = subprocess.run([sys.executable, "-c", probe_src],
                           capture_output=True, text=True, timeout=budget)
        err = None if r.returncode == 0 else (
            f"probe rc={r.returncode}: {r.stderr.strip()[-400:]}")
    except subprocess.TimeoutExpired:
        err = f"probe hung > {budget}s (backend init blocked)"
    if err is not None:
        # carry the last driver-captured GOOD record forward so an outage
        # round's archive still states the best-known device truth
        last_good = None
        for rec in ("BENCH_r04.json", "BENCH_r03.json",
                    "BENCH_r02.json", "BENCH_r01.json"):
            try:
                with open(os.path.join(os.path.dirname(__file__), rec)) as f:
                    parsed = json.load(f).get("parsed")
                if parsed and parsed.get("value") is not None:
                    last_good = {"record": rec, "metric": parsed["metric"],
                                 "value": parsed["value"],
                                 "vs_baseline": parsed.get("vs_baseline")}
                    break
            except (OSError, ValueError):
                continue
        print(json.dumps({
            "metric": "rtf_text_to_wav", "value": None, "unit": "ratio",
            "vs_baseline": None,
            "error": "backend_unavailable",
            "extras": {"requested_platforms":
                       os.environ.get("JAX_PLATFORMS", ""),
                       "detail": err,
                       "last_good": last_good}}))
        sys.exit(0)  # the JSON line IS the record; rc=0 keeps it archived


if __name__ == "__main__":
    _probe_backend()
    if "--verify" in sys.argv:
        verify()
    elif "--train_curve" in sys.argv:
        train_curve()
    elif "--serve" in sys.argv:
        serve()
    else:
        main()
