"""WaveRNN vocoder — sample-level autoregressive dual-GRU.

Re-design of `WaveRNN/models/fatchord_version.py`:
  - MelResNet conditioning (:28-45) + Stretch2d/smoothing-conv upsampling
    (:48-86), aux split into 4 streams (:126-130)
  - training forward as full-sequence compute with the recurrent input
    projections hoisted into batched MXU matmuls (I/rnn1/rnn2/fc1/fc2/fc3,
    :119-148)
  - batched generation via fold_with_overlap (:272-319) + equal-power
    xfade_and_unfold (:321-383), RAW (softmax over 2^bits classes + mu-law) or
    MOL output (:96-101)
  - generation loop as a `lax.scan` over samples with all conditioning-
    dependent matmuls precomputed per timestep, so the per-step work is just
    the two GRU hidden matmuls + two FC matmuls on the sample path. A fused
    Pallas TPU kernel for the same cell lives in
    `etts.ops.pallas.wavernn_cell` and is used when available.

The mixture-of-logistics loss/sampling reproduce
`WaveRNN/utility/distribution.py` semantics in jnp.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.gru import gru_scan
from ..ops.normalizers import mu_law_decode

Dtype = Any


# ---------------------------------------------------------------------------
# Mixture of logistics (distribution.py parity)
# ---------------------------------------------------------------------------

def log_sum_exp(x):
    axis = x.ndim - 1
    m = jnp.max(x, axis=axis)
    m2 = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=axis))


def discretized_mix_logistic_loss(y_hat, y, num_classes=65536,
                                  log_scale_min=None, reduce=True):
    """y_hat (B, T, 3*nr_mix) logits/means/log_scales; y (B, T, 1) in [-1, 1].

    Parity with `WaveRNN/utility/distribution.py:16-84` (which permutes from
    (B, T, C); here y_hat is already (B, T, C))."""
    if log_scale_min is None:
        log_scale_min = float(np.log(1e-14))
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[:, :, :nr_mix]
    means = y_hat[:, :, nr_mix:2 * nr_mix]
    log_scales = jnp.clip(y_hat[:, :, 2 * nr_mix:3 * nr_mix],
                          min=log_scale_min)
    y = jnp.broadcast_to(y, means.shape)
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2.0))
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    if reduce:
        return -jnp.mean(log_sum_exp(log_probs))
    return -log_sum_exp(log_probs)[..., None]


def sample_from_discretized_mix_logistic(y, key, log_scale_min=None):
    """y (B, 3*nr_mix) per-step params -> sample in [-1, 1]
    (`distribution.py:87-123` with T folded out)."""
    if log_scale_min is None:
        log_scale_min = float(np.log(1e-14))
    nr_mix = y.shape[-1] // 3
    logit_probs = y[:, :nr_mix]
    k1, k2 = jax.random.split(key)
    # Gumbel-max mixture indicator
    u = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    onehot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)
    means = jnp.sum(y[:, nr_mix:2 * nr_mix] * onehot, axis=-1)
    log_scales = jnp.clip(jnp.sum(y[:, 2 * nr_mix:3 * nr_mix] * onehot, -1),
                          min=log_scale_min)
    u2 = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u2) - jnp.log1p(-u2))
    return jnp.clip(x, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Conditioning network
# ---------------------------------------------------------------------------

class ResBlock(nn.Module):
    dims: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        res = x
        x = nn.Conv(self.dims, (1,), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.dims, (1,), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return x + res


class MelResNet(nn.Module):
    res_blocks: int
    compute_dims: int
    res_out_dims: int
    pad: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mels, train: bool):
        """mels (b, t, n_mels) -> (b, t - 2*pad, res_out_dims)."""
        k = self.pad * 2 + 1
        x = nn.Conv(self.compute_dims, (k,), padding="VALID", use_bias=False,
                    dtype=self.dtype)(mels)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        for i in range(self.res_blocks):
            x = ResBlock(self.compute_dims, self.dtype, name=f"res_{i}")(x, train)
        return nn.Conv(self.res_out_dims, (1,), dtype=self.dtype)(x)


def _stretch_time(x, scale: int):
    return jnp.repeat(x, scale, axis=1)


class UpsampleNetwork(nn.Module):
    """Stretch + smoothing convs for mel; stretched resnet output for aux
    (fatchord_version.py:61-86)."""
    upsample_scales: Sequence[int]
    res_blocks: int
    compute_dims: int
    res_out_dims: int
    pad: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mels, train: bool):
        """mels (b, t, n_mels) -> (mels_up (b, (t-2*pad)*hop, n_mels),
        aux (b, (t-2*pad)*hop, res_out_dims))."""
        total = int(np.prod(self.upsample_scales))
        indent = self.pad * total
        aux = MelResNet(self.res_blocks, self.compute_dims, self.res_out_dims,
                        self.pad, self.dtype, name="resnet")(mels, train)
        aux = _stretch_time(aux, total)
        x = mels
        for i, scale in enumerate(self.upsample_scales):
            x = _stretch_time(x, scale)
            # single shared smoothing filter along time (per mel channel)
            k = scale * 2 + 1
            img = x.transpose(0, 2, 1)[..., None]  # (b, mel, T, 1)
            img = nn.Conv(1, (1, k), padding=((0, 0), (scale, scale)),
                          use_bias=False,
                          kernel_init=nn.initializers.constant(1.0 / k),
                          dtype=self.dtype, name=f"smooth_{i}")(img)
            x = img[..., 0].transpose(0, 2, 1)
        x = x[:, indent:x.shape[1] - indent, :]
        return x, aux


# ---------------------------------------------------------------------------
# WaveRNN
# ---------------------------------------------------------------------------

class WaveRNN(nn.Module):
    rnn_dims: int = 512
    fc_dims: int = 512
    bits: int = 9
    pad: int = 2
    upsample_factors: Sequence[int] = (5, 5, 8)
    feat_dims: int = 80
    compute_dims: int = 128
    res_out_dims: int = 128
    res_blocks: int = 10
    hop_length: int = 200
    sample_rate: int = 16000
    mode: str = "MOL"
    dtype: Dtype = jnp.float32

    @property
    def n_classes(self) -> int:
        if self.mode == "RAW":
            return 2 ** self.bits
        if self.mode == "MOL":
            return 30
        raise ValueError(f"Unknown mode {self.mode!r}")

    @property
    def aux_dims(self) -> int:
        return self.res_out_dims // 4

    def setup(self):
        assert int(np.prod(self.upsample_factors)) == self.hop_length, \
            "upsample factors must factorise hop_length (train_wavernn.py:101)"
        self.upsample = UpsampleNetwork(self.upsample_factors, self.res_blocks,
                                        self.compute_dims, self.res_out_dims,
                                        self.pad, self.dtype)
        self.I = nn.Dense(self.rnn_dims, dtype=self.dtype)
        d = self.rnn_dims
        mk = lambda name, shape, init: self.param(name, init, shape, self.dtype)
        lec, orth, zer = (nn.initializers.lecun_normal(),
                          nn.initializers.orthogonal(), nn.initializers.zeros)
        self.rnn1 = {"wi": mk("rnn1_wi", (d, 3 * d), lec),
                     "wh": mk("rnn1_wh", (d, 3 * d), orth),
                     "bi": mk("rnn1_bi", (3 * d,), zer),
                     "bh": mk("rnn1_bh", (3 * d,), zer)}
        self.rnn2 = {"wi": mk("rnn2_wi", (d + self.aux_dims, 3 * d), lec),
                     "wh": mk("rnn2_wh", (d, 3 * d), orth),
                     "bi": mk("rnn2_bi", (3 * d,), zer),
                     "bh": mk("rnn2_bh", (3 * d,), zer)}
        self.fc1 = nn.Dense(self.fc_dims, dtype=self.dtype)
        self.fc2 = nn.Dense(self.fc_dims, dtype=self.dtype)
        self.fc3 = nn.Dense(self.n_classes, dtype=self.dtype)

    def _aux_split(self, aux):
        d = self.aux_dims
        return [aux[..., d * i: d * (i + 1)] for i in range(4)]

    def __call__(self, x, mels, train: bool = True):
        """Training forward: x (b, T) previous samples, mels (b, t_mel, n_mels)
        padded by `pad` on both sides. Returns logits (b, T, n_classes)."""
        mels_up, aux = self.upsample(mels, train)
        a1, a2, a3, a4 = self._aux_split(aux)
        h = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = self.I(h)
        res = h
        h, _ = gru_scan(self.rnn1, h)
        h = h + res
        res = h
        h, _ = gru_scan(self.rnn2, jnp.concatenate([h, a2], axis=-1))
        h = h + res
        h = jax.nn.relu(self.fc1(jnp.concatenate([h, a3], axis=-1)))
        h = jax.nn.relu(self.fc2(jnp.concatenate([h, a4], axis=-1)))
        return self.fc3(h)

    def upsample_cond(self, mels, train: bool = False):
        return self.upsample(mels, train)


# ---------------------------------------------------------------------------
# Batched generation: fold / crossfade-unfold
# ---------------------------------------------------------------------------

def fold_with_overlap(x, target: int, overlap: int):
    """(1, total_len, f) -> (num_folds, target + 2*overlap, f)
    (fatchord_version.py:272-319)."""
    _, total_len, features = x.shape
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = jnp.pad(x, ((0, 0), (0, padding), (0, 0)))
    idx = (jnp.arange(num_folds)[:, None] * (target + overlap)
           + jnp.arange(target + 2 * overlap)[None, :])
    return x[0][idx]


def xfade_and_unfold(y, overlap: int):
    """(num_folds, target + 2*overlap) -> (total_len,) with equal-power
    crossfade (fatchord_version.py:321-383)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap
    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = jnp.linspace(-1.0, 1.0, fade_len, dtype=y.dtype)
    fade_in = jnp.concatenate([jnp.zeros(silence_len, y.dtype),
                               jnp.sqrt(0.5 * (1.0 + t))])
    fade_out = jnp.concatenate([jnp.sqrt(0.5 * (1.0 - t)),
                                jnp.zeros(silence_len, y.dtype)])
    y = y.at[:, :overlap].multiply(fade_in)
    y = y.at[:, -overlap:].multiply(fade_out)
    starts = jnp.arange(num_folds) * (target + overlap)
    idx = (starts[:, None] + jnp.arange(length)[None, :]).reshape(-1)
    return jnp.zeros(total_len, y.dtype).at[idx].add(y.reshape(-1))


def _split_gates(w, d):
    return w[:, :d], w[:, d:2 * d], w[:, 2 * d:]


@functools.partial(jax.jit, static_argnames=("model", "target", "overlap",
                                              "batched"))
def _upsample_and_fold(model: WaveRNN, variables, mels, target, overlap,
                       batched):
    """Jitted: pad -> upsample conditioning -> (optionally) fold."""
    mels = jnp.pad(mels, ((0, 0), (model.pad, model.pad), (0, 0)))
    mels_up, aux = model.apply(variables, mels, False,
                               method=WaveRNN.upsample_cond)
    if batched:
        mels_up = fold_with_overlap(mels_up, target, overlap)
        aux = fold_with_overlap(aux, target, overlap)
    return mels_up, aux


@functools.partial(jax.jit, static_argnames=("model", "batched", "overlap",
                                             "mu_law"))
def _finalize_jit(model: WaveRNN, output, batched, overlap, mu_law, wave_len):
    """wave_len is TRACED: one compile serves every utterance length (serving
    shape discipline — callers slice host-side)."""
    return _finalize(output, batched, overlap, mu_law, model, wave_len)


def _live_folds(total_len: int, target: int, overlap: int,
                num_folds: int) -> int:
    """Fold count UNBUCKETED folding would produce for ``total_len`` samples.

    Bucketing (`_bucket_len`) pads the mel, so fold_with_overlap emits extra
    rows that lie wholly past the real waveform; their sequential
    sample-steps are pure waste, and they matter whenever they push the row
    count across an 8-row TPU sublane boundary. Slicing the fold rows to
    this count makes the pruned bucketed path produce EXACTLY the rows (and
    rng chain) of the unbucketed path, so output below wave_len is identical
    and bucketing adds zero sample-loop cost. Mirrors fold_with_overlap's
    count (`fatchord_version.py:272-319`).
    """
    n = (total_len - overlap) // (target + overlap)
    if total_len - (n * (overlap + target) + overlap) != 0:
        n += 1
    return max(1, min(int(n), int(num_folds)))


def _bucket_len(t: int, lo: int = 32, ratio: float = 2.0) -> int:
    """Round a mel length up to a small geometric bucket set so a serving mix
    of arbitrary lengths hits a BOUNDED number of XLA compiles (the reference
    recompiles nothing because it is eager — `fatchord_version.py:150-243` —
    but pays eager dispatch every call instead)."""
    b = lo
    while b < t:
        b = int(b * ratio)
    return b


def _conditioning_streams(model: WaveRNN, params, mels_up, aux):
    """Hoist every conditioning-dependent projection into batched matmuls.

    Returns (streams, weights): streams are (B, T, .) arrays consumed one
    timestep per loop iteration; weights are the sample-path matrices."""
    d = model.rnn_dims
    adim = model.aux_dims
    a1, a2, a3, a4 = (aux[..., adim * i: adim * (i + 1)] for i in range(4))
    W_I, b_I = params["I"]["kernel"], params["I"]["bias"]
    I_x, I_cond = W_I[:1], W_I[1:]
    r1 = {k: params[f"rnn1_{k}"] for k in ("wi", "wh", "bi", "bh")}
    r2 = {k: params[f"rnn2_{k}"] for k in ("wi", "wh", "bi", "bh")}
    W2_x, W2_a = r2["wi"][:d], r2["wi"][d:]
    Wf1, bf1 = params["fc1"]["kernel"], params["fc1"]["bias"]
    Wf2, bf2 = params["fc2"]["kernel"], params["fc2"]["bias"]
    Wf3, bf3 = params["fc3"]["kernel"], params["fc3"]["bias"]
    streams = {
        "i": (jnp.concatenate([mels_up, a1], -1) @ I_cond) + b_I,
        "gi2": a2 @ W2_a + r2["bi"],
        "f1": a3 @ Wf1[d:] + bf1,
        "f2": a4 @ Wf2[model.fc_dims:] + bf2,
    }
    weights = {"I_x": I_x, "r1": r1, "r2": r2, "W2_x": W2_x,
               "Wf1x": Wf1[:d], "Wf2x": Wf2[:model.fc_dims],
               "Wf3": Wf3, "bf3": bf3}
    return streams, weights




def _int8_dtype(int8_weights):
    """Map the int8_weights flag to a kernel weight_dtype: True -> the
    dequant-on-VPU path; "mxu" -> native int8 MXU dots with dynamic
    activation quantization (ROADMAP r5 #4); falsy -> full precision."""
    if int8_weights == "mxu":
        return "int8_mxu"
    return "int8" if int8_weights else None




def _clamp_mels(mels):
    """Serving input contract: the vocoder is trained on mels in [0, 1]
    (the (mel+4)/8 store convention); free-running TTS decodes can run away
    far outside it (r5 forensics captured a trigger mel spanning [0.42, 2.93],
    i.e. raw mel ~19 vs the [-4, 4] training range). OOD conditioning must
    degrade audio, never the worker (VERDICT r4 #3) — clip at the model
    boundary, a no-op for every in-contract caller. ``ETTS_VOC_NO_CLAMP=1``
    disables it for fault forensics (scripts/voc_fault_matrix.py)."""
    if os.environ.get("ETTS_VOC_NO_CLAMP"):
        return mels
    if not isinstance(mels, jax.core.Tracer):
        # concrete (eager serving) input: clamp on the HOST. The jnp version
        # enqueues extra tiny device programs before the vocoder chain, and
        # multi-program residency is the live suspect for the long-mel
        # worker fault (the fault matrix's passing cells all ran with
        # ETTS_VOC_NO_CLAMP=1 + host-side numpy clamping; production with
        # the in-graph clamp faults at the same mel/geometry)
        return np.clip(np.nan_to_num(np.asarray(mels, dtype=np.float32),
                                     nan=0.0, posinf=1.0, neginf=0.0),
                       0.0, 1.0)
    return jnp.clip(jnp.nan_to_num(mels, nan=0.0, posinf=1.0, neginf=0.0),
                    0.0, 1.0)


def _sanitize_cond(cond):
    """Serving robustness: hostile conditioning (NaN/Inf or huge values from
    runaway free-running mels through the upsampler) must degrade audio,
    never the worker. One elementwise pass, invisible next to the sample
    loop; a no-op on any finite in-range tensor (trained activations are
    O(10), the clamp is ±1e4)."""
    return jnp.clip(jnp.nan_to_num(cond, nan=0.0, posinf=1e4, neginf=-1e4),
                    -1e4, 1e4)


def _run_pallas_loop(model: WaveRNN, params, mels_up, aux, key,
                     weight_dtype=None):
    """Fused-kernel path: stream RAW conditioning, project in-kernel.

    ``weight_dtype="int8"`` streams per-column-quantized int8 weights through
    the MXU (f32 accumulation via per-column scales): ~half the VMEM weight
    traffic, which is the row-count-independent floor of the step time."""
    from ..ops.pallas import wavernn_sample_loop
    d = model.rnn_dims
    r1 = {k: params[f"rnn1_{k}"] for k in ("wi", "wh", "bi", "bh")}
    r2 = {k: params[f"rnn2_{k}"] for k in ("wi", "wh", "bi", "bh")}
    Wf1, bf1 = params["fc1"]["kernel"], params["fc1"]["bias"]
    Wf2, bf2 = params["fc2"]["kernel"], params["fc2"]["bias"]
    Wf3, bf3 = params["fc3"]["kernel"], params["fc3"]["bias"]
    cond = jnp.swapaxes(jnp.concatenate([mels_up, aux], -1), 0, 1)  # (T,B,C)
    cond = _sanitize_cond(cond)
    if os.environ.get("ETTS_VOC_SYNC") and not isinstance(
            cond, jax.core.Tracer):
        # forensics: separate the eager cond-construction programs
        # (concat/transpose/sanitize on a ~100 MB tensor) from the Pallas
        # kernel itself — a fault here exonerates the kernel
        cond = jax.block_until_ready(cond)
    dump_dir = os.environ.get("ETTS_DUMP_COND")
    if dump_dir and not isinstance(cond, jax.core.Tracer):
        # (skipped under an outer jit trace: there is no concrete tensor to
        # save there, and the eval CLIs this hook serves call in eagerly)
        # kernel-fault forensics (VERDICT r4 #3): persist the EXACT tensor
        # entering the kernel so a worker crash leaves the trigger on disk.
        # Keeps the last 4 calls; host round-trip is diagnosis-only cost.
        import numpy as _np
        from pathlib import Path as _Path
        dd = _Path(dump_dir)
        dd.mkdir(parents=True, exist_ok=True)
        idx = int((dd / "counter").read_text()) if (dd / "counter").exists() \
            else 0
        # sliced device_get: one ~100 MB transfer through the axon tunnel is
        # itself a fault vector (r4 bench died on a dropped HTTP body mid-
        # transfer); ~16 MB slices bound each message
        step_rows = max(1, (16 << 20) // max(1, cond.shape[1]
                                             * cond.shape[2] * 4))
        c_np = _np.concatenate(
            [_np.asarray(jax.device_get(cond[i:i + step_rows]))
             for i in range(0, cond.shape[0], step_rows)], axis=0)
        # uncompressed: these are ~100 MB tensors and the 1-core host pays
        # ~a minute per compressed write; rotation bounds the disk use
        _np.savez(dd / f"cond_{idx % 4}.npz", cond=c_np,
                  idx=idx, mode=model.mode)
        (dd / "counter").write_text(str(idx + 1))
    seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
    kw = {} if weight_dtype is None else {"weight_dtype": weight_dtype}
    samples_tb = wavernn_sample_loop(
        cond, params["I"]["kernel"], params["I"]["bias"],
        r1["wi"], r1["wh"], r1["bi"], r1["bh"],
        r2["wi"][:d], r2["wi"][d:], r2["wh"], r2["bi"], r2["bh"],
        Wf1[:d], Wf1[d:], bf1, Wf2[:model.fc_dims], Wf2[model.fc_dims:], bf2,
        Wf3, bf3, seed, feat=model.feat_dims, adim=model.aux_dims,
        mode=model.mode, n_classes=model.n_classes, **kw)
    return jnp.swapaxes(samples_tb, 0, 1)


def _run_sample_loop(model: WaveRNN, streams, w, key, use_pallas=False,
                     state=None, return_state=False):
    """Sequential sample loop over (B, T) streams -> samples (B, T).

    ``state``/``return_state`` carry the GRU hiddens, feedback sample and rng
    across calls — the streaming path vocodes chunk by chunk with EXACTLY the
    same sample sequence as one long scan (same key chain)."""
    del use_pallas  # the pallas path takes raw streams, see _run_pallas_loop
    d = model.rnn_dims
    B, T, _ = streams["i"].shape

    r1, r2 = w["r1"], w["r2"]

    def step(carry, xs):
        h1, h2, x_prev, k = carry
        i_t, gi2_t, f1_t, f2_t = xs
        k, sk = jax.random.split(k)
        inp = i_t + x_prev @ w["I_x"]  # (B, d)
        gi1 = inp @ r1["wi"] + r1["bi"]
        gh1 = h1 @ r1["wh"] + r1["bh"]
        r_ = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
        z_ = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
        n_ = jnp.tanh(gi1[:, 2 * d:] + r_ * gh1[:, 2 * d:])
        h1 = (1 - z_) * n_ + z_ * h1
        x = inp + h1
        gi2 = x @ w["W2_x"] + gi2_t
        gh2 = h2 @ r2["wh"] + r2["bh"]
        r_ = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
        z_ = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
        n_ = jnp.tanh(gi2[:, 2 * d:] + r_ * gh2[:, 2 * d:])
        h2 = (1 - z_) * n_ + z_ * h2
        x = x + h2
        y = jax.nn.relu(x @ w["Wf1x"] + f1_t)
        y = jax.nn.relu(y @ w["Wf2x"] + f2_t)
        logits = y @ w["Wf3"] + w["bf3"]
        if model.mode == "MOL":
            sample = sample_from_discretized_mix_logistic(logits, sk)
        else:
            cls = jax.random.categorical(sk, logits, axis=-1)
            sample = 2.0 * cls.astype(jnp.float32) / (model.n_classes - 1.0) - 1.0
        return (h1, h2, sample[:, None], k), sample

    if state is None:
        init = (jnp.zeros((B, d)), jnp.zeros((B, d)), jnp.zeros((B, 1)), key)
    else:
        init = (state["h1"], state["h2"], state["x"], state["key"])
    xs = tuple(jnp.swapaxes(streams[k], 0, 1)
               for k in ("i", "gi2", "f1", "f2"))
    carry, samples = jax.lax.scan(step, init, xs)
    out = jnp.swapaxes(samples, 0, 1)
    if return_state:
        h1, h2, x_prev, k = carry
        return out, {"h1": h1, "h2": h2, "x": x_prev, "key": k}
    return out


def generate(model: WaveRNN, variables, mels, *, batched: bool = True,
             target: int = 11000, overlap: int = 550, mu_law: bool = True,
             key=None, use_pallas: bool | None = None,
             bucket: bool = False, int8_weights: bool = False):
    """Full generation path (fatchord_version.py:150-243): upsample -> fold ->
    sequential sample loop -> unfold -> mu-law decode -> 20-hop fade-out.

    Conditioning projections run as big batched matmuls before the loop; the
    sequential core is either a lax.scan or the fused Pallas kernel. Returns a
    1-D waveform of length (t_mel-1)*hop. ``bucket=True`` pads the mel length
    up to a geometric bucket so a serving mix of lengths causes a bounded
    number of compiles (zero-padding is output-equivalent in the real region:
    the upsampler already zero-pads the mel tail).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mu_law = mu_law if model.mode == "RAW" else False
    if mels.ndim == 2:
        mels = mels[None]
    mels = _clamp_mels(mels)
    b0, t_mel, _ = mels.shape
    assert b0 == 1, "generate() vocodes one utterance; see generate_batch()"
    dump_dir = os.environ.get("ETTS_DUMP_COND")
    if dump_dir and not isinstance(mels, jax.core.Tracer):
        # kernel-fault forensics, phase 0 (VERDICT r4 #3): the round-5a crash
        # surfaced at the COND dump's own device_get — the worker died in
        # device work enqueued before it, so nothing was ever captured. The
        # input mel is host-known here (callers pass host arrays through
        # jnp.asarray), so this write cannot be lost to the fault it records.
        import numpy as _np
        from pathlib import Path as _Path
        dd = _Path(dump_dir)
        dd.mkdir(parents=True, exist_ok=True)
        midx = int((dd / "mel_counter").read_text()) \
            if (dd / "mel_counter").exists() else 0
        _np.savez(dd / f"mel_{midx % 4}.npz", mel=_np.asarray(mels),
                  idx=midx, target=target, overlap=overlap,
                  batched=batched, bucket=bucket)
        (dd / "mel_counter").write_text(str(midx + 1))
    # ETTS_VOC_SYNC=1: block between vocoder phases so a worker fault's
    # traceback names the phase that enqueued the faulting program
    # (upsample/fold vs conditioning vs sample kernel) instead of whichever
    # later sync happens to observe the dead worker.
    _sync = (jax.block_until_ready
             if os.environ.get("ETTS_VOC_SYNC") else (lambda x: x))
    wave_len = (t_mel - 1) * model.hop_length
    if bucket:
        t_pad = _bucket_len(t_mel)
        mels = jnp.pad(mels, ((0, 0), (0, t_pad - t_mel), (0, 0)))
    mels_up, aux = _sync(_upsample_and_fold(model, variables, mels, target,
                                            overlap, batched))
    full = mels_up.shape[0]
    if batched and bucket:
        # bucketing appends fold rows wholly past wave_len; drop them before
        # the sequential loop (wave_len is host-known -> static slice). The
        # live count equals the fold count unbucketed folding would produce,
        # so bucketing adds ZERO sample-loop waste.
        live = _live_folds(t_mel * model.hop_length, target,
                           overlap, full)
        mels_up, aux = mels_up[:live], aux[:live]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from ..ops.pallas import pallas_available
    if use_pallas and pallas_available:
        output = _sync(_run_pallas_loop(model, variables["params"], mels_up,
                                        aux, key,
                                        weight_dtype=_int8_dtype(int8_weights)))
    else:
        streams, w = _conditioning_streams(model, variables["params"],
                                           mels_up, aux)
        output = _sync(_run_sample_loop(model, streams, w, key))
    if batched and output.shape[0] < full:
        # restore the bucketed row count for finalize (cheap, elementwise) so
        # its compile count stays one-per-bucket; zero rows only touch
        # positions past wave_len, which finalize zeroes anyway
        output = jnp.pad(output, ((0, full - output.shape[0]), (0, 0)))
    out = _finalize_jit(model, output, batched, overlap, mu_law,
                        jnp.int32(wave_len))
    return out[:wave_len]


def generate_batch(model: WaveRNN, variables, mels_list, *,
                   target: int = 11000, overlap: int = 550,
                   mu_law: bool = True, key=None,
                   use_pallas: bool | None = None, bucket: bool = True,
                   int8_weights: bool = False):
    """Vocode MANY utterances in one sample loop (serving throughput).

    Each utterance is folded independently (fold rows all share the same
    length target + 2*overlap); the rows of all utterances concatenate into
    one batch for a single sequential pass, then split and crossfade-unfold
    per utterance. Throughput scales with total fold count until the MXU
    saturates. Returns a list of 1-D waveforms.

    Serving shape discipline (``bucket=True``): mel lengths are zero-padded up
    to geometric buckets and the total fold count is padded to a multiple of 8
    (the TPU sublane), so a mix of arbitrary utterance lengths triggers a
    BOUNDED number of XLA compiles (upsample: one per bucket; sample loop: one
    per padded fold count; finalize: one per fold count, length is traced).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mu_law = mu_law if model.mode == "RAW" else False
    dump_dir = os.environ.get("ETTS_DUMP_COND")
    if dump_dir:
        # same phase-0 forensics as generate(): persist the host-side mels
        # BEFORE any vocoder device work (see comment there)
        import numpy as _np
        from pathlib import Path as _Path
        dd = _Path(dump_dir)
        dd.mkdir(parents=True, exist_ok=True)
        midx = int((dd / "mel_counter").read_text()) \
            if (dd / "mel_counter").exists() else 0
        _np.savez(dd / f"mel_{midx % 4}.npz",
                  idx=midx, target=target, overlap=overlap, bucket=bucket,
                  **{f"mel{j}": _np.asarray(m)
                     for j, m in enumerate(mels_list)})
        (dd / "mel_counter").write_text(str(midx + 1))
    _sync = (jax.block_until_ready
             if os.environ.get("ETTS_VOC_SYNC") else (lambda x: x))
    ups, auxs, counts, fulls, wave_lens = [], [], [], [], []
    for mel in mels_list:
        if mel.ndim == 2:
            mel = mel[None]
        mel = _clamp_mels(mel)
        wave_lens.append((mel.shape[1] - 1) * model.hop_length)
        if bucket:
            t_pad = _bucket_len(mel.shape[1])
            mel = jnp.pad(mel, ((0, 0), (0, t_pad - mel.shape[1]), (0, 0)))
        mu, au = _sync(_upsample_and_fold(model, variables, mel, target,
                                          overlap, True))
        fulls.append(mu.shape[0])
        if bucket:
            live = _live_folds(wave_lens[-1] + model.hop_length,
                               target, overlap, mu.shape[0])
            mu, au = mu[:live], au[:live]
        counts.append(mu.shape[0])
        ups.append(mu)
        auxs.append(au)
    mels_up = jnp.concatenate(ups, axis=0)
    aux = jnp.concatenate(auxs, axis=0)
    if bucket and mels_up.shape[0] % 8:
        pad_rows = 8 - mels_up.shape[0] % 8
        mels_up = jnp.pad(mels_up, ((0, pad_rows), (0, 0), (0, 0)))
        aux = jnp.pad(aux, ((0, pad_rows), (0, 0), (0, 0)))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from ..ops.pallas import pallas_available
    if use_pallas and pallas_available:
        output = _sync(_run_pallas_loop(model, variables["params"], mels_up,
                                        aux, key,
                                        weight_dtype=_int8_dtype(int8_weights)))
    else:
        streams, w = _conditioning_streams(model, variables["params"],
                                           mels_up, aux)
        output = _sync(_run_sample_loop(model, streams, w, key))
    wavs, ofs = [], 0
    for count, full, wave_len in zip(counts, fulls, wave_lens):
        rows = output[ofs:ofs + count]
        ofs += count
        if full > count:
            # pad pruned rows back so finalize keeps one compile per bucket
            rows = jnp.pad(rows, ((0, full - count), (0, 0)))
        wavs.append(_finalize_jit(model, rows, True, overlap, mu_law,
                                  jnp.int32(wave_len))[:wave_len])
    return wavs


def generate_batch_sharded(model: WaveRNN, variables, mels_list, *, mesh,
                           axis: str = "data", target: int = 11000,
                           overlap: int = 550, mu_law: bool = True, key=None,
                           use_pallas: bool | None = None):
    """Fold-parallel vocoding across CHIPS: every utterance's fold rows are
    independent sequential chains, so the concatenated row batch shards over
    the mesh's data axis and each chip runs its own sample loop (Pallas kernel
    on TPU, scan elsewhere) — throughput scales with chip count with zero
    collectives in the loop. SURVEY §2.5 'fold-parallel across cores'.

    Row count pads to lcm(8, n_devices); per-shard rng is folded by device
    index so chips draw independent noise. Returns a list of waveforms.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    if key is None:
        key = jax.random.PRNGKey(0)
    mu_law = mu_law if model.mode == "RAW" else False
    n_dev = mesh.shape[axis]
    ups, auxs, counts, fulls, wave_lens = [], [], [], [], []
    for mel in mels_list:
        if mel.ndim == 2:
            mel = mel[None]
        mel = _clamp_mels(mel)
        wave_lens.append((mel.shape[1] - 1) * model.hop_length)
        t_pad = _bucket_len(mel.shape[1])
        mel = jnp.pad(mel, ((0, 0), (0, t_pad - mel.shape[1]), (0, 0)))
        mu, au = _upsample_and_fold(model, variables, mel, target, overlap,
                                    True)
        fulls.append(mu.shape[0])
        live = _live_folds(wave_lens[-1] + model.hop_length,
                           target, overlap, mu.shape[0])
        mu, au = mu[:live], au[:live]
        counts.append(mu.shape[0])
        ups.append(mu)
        auxs.append(au)
    mels_up = jnp.concatenate(ups, axis=0)
    aux = jnp.concatenate(auxs, axis=0)
    quantum = int(np.lcm(8, n_dev))
    if mels_up.shape[0] % quantum:
        pad_rows = quantum - mels_up.shape[0] % quantum
        mels_up = jnp.pad(mels_up, ((0, pad_rows), (0, 0), (0, 0)))
        aux = jnp.pad(aux, ((0, pad_rows), (0, 0), (0, 0)))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from ..ops.pallas import pallas_available
    use_pallas = use_pallas and pallas_available
    params = variables["params"]

    def rowwise(params, mels_up_l, aux_l, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        if use_pallas:
            return _run_pallas_loop(model, params, mels_up_l, aux_l, key)
        streams, w = _conditioning_streams(model, params, mels_up_l, aux_l)
        return _run_sample_loop(model, streams, w, key)

    row_sharding = NamedSharding(mesh, P(axis))
    mels_up = jax.device_put(mels_up, row_sharding)
    aux = jax.device_put(aux, row_sharding)
    output = shard_map(rowwise, mesh=mesh,
                       in_specs=(P(), P(axis), P(axis), P()),
                       out_specs=P(axis), check_vma=False)(
        params, mels_up, aux, key)
    wavs, ofs = [], 0
    for count, full, wave_len in zip(counts, fulls, wave_lens):
        rows = output[ofs:ofs + count]
        ofs += count
        if full > count:
            # pad pruned rows back so finalize keeps one compile per bucket
            rows = jnp.pad(rows, ((0, full - count), (0, 0)))
        wavs.append(_finalize_jit(model, rows, True, overlap, mu_law,
                                  jnp.int32(wave_len))[:wave_len])
    return wavs


def _finalize(output, batched, overlap, mu_law, model, wave_len):
    """Unfold + mu-law decode + 20-hop fade-out (fatchord :226-237).

    ``wave_len`` may be a traced scalar: the fade ramp is computed positionally
    (identical to ``linspace(1, 0, N)[-n_fade:]`` over ``output[:wave_len]``)
    and samples past wave_len are zeroed; callers slice to wave_len host-side.
    """
    if batched:
        output = xfade_and_unfold(output, overlap)
    else:
        output = output[0]
    if mu_law:
        output = mu_law_decode(output, model.n_classes, from_labels=False)
    N = 20 * model.hop_length
    idx = jnp.arange(output.shape[0])
    # linspace(1,0,N)[j] = 1 - j/(N-1) at j = N - wave_len + idx, clipped to
    # [0, 1]: ==1 before the ramp (j<0 when wave_len>=N), ==0 at wave_len-1
    j = (N - wave_len + idx).astype(output.dtype)
    factor = jnp.clip(1.0 - j / (N - 1), 0.0, 1.0)
    return jnp.where(idx < wave_len, output * factor, 0.0)
