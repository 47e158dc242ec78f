"""Tiny trainable character-CTC transcriber — an ASR backend that can run in
THIS (zero-egress) environment, so the WER-syn/WER-ori columns of
`objective_measure.py:101-137` need not stay permanently empty when no
pretrained wav2vec2 weights or network recognizer exist.

Honesty note: this is a smoke-level transcriber. Trained on a user-provided
(possibly synthetic) corpus it validates the WER *pipeline* end to end and
tracks gross intelligibility regressions; its absolute WER values are NOT
comparable to the reference's Google-ASR numbers. It registers as backend
(3) of `etts.evalsuite.wer.transcribe` via `ETTS_CTC_ASR=<ckpt.npz>` or
`set_default_model(path)`.

Model: log-mel frontend -> 2x stride-2 Conv1D -> 2x bidirectional GRU
(`etts.ops.gru.gru_scan`, input matmuls hoisted to the MXU) -> char logits,
optax CTC loss, greedy collapse decode. Checkpoints are a flat .npz so
loading needs no orbax session.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.gru import gru_scan

__all__ = ["CTC_VOCAB", "CTCAsrModel", "CTCTranscriber", "train_ctc_asr",
           "encode_text", "greedy_decode", "set_default_model"]

# index 0 is the CTC blank
CTC_VOCAB = "_ abcdefghijklmnopqrstuvwxyz'"
_CHAR_TO_ID = {c: i for i, c in enumerate(CTC_VOCAB)}


def encode_text(text: str) -> np.ndarray:
    """Normalized text -> label ids (unknown chars dropped)."""
    text = " ".join(text.lower().split())
    return np.asarray([_CHAR_TO_ID[c] for c in text if c in _CHAR_TO_ID
                       and c != "_"], np.int32)


class CTCAsrModel(nn.Module):
    n_mels: int = 40
    hidden: int = 96
    conv_filters: int = 96

    def _gru_params(self, name, in_dim, hd):
        return {
            "wi": self.param(f"{name}_wi", nn.initializers.lecun_normal(),
                             (in_dim, 3 * hd), jnp.float32),
            "wh": self.param(f"{name}_wh", nn.initializers.orthogonal(),
                             (hd, 3 * hd), jnp.float32),
            "bi": self.param(f"{name}_bi", nn.initializers.zeros,
                             (3 * hd,), jnp.float32),
            "bh": self.param(f"{name}_bh", nn.initializers.zeros,
                             (3 * hd,), jnp.float32),
        }

    @nn.compact
    def __call__(self, mels):
        """mels (b, t, n_mels) -> logits (b, ceil(t/4), len(CTC_VOCAB))."""
        x = mels
        for i in range(2):  # 4x time downsample, conv stacks ride the MXU
            x = nn.Conv(self.conv_filters, (5,), strides=(2,), padding="SAME",
                        name=f"conv_{i}")(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = jax.nn.relu(x)
        hd = self.hidden
        for i in range(2):
            fwd = self._gru_params(f"gru{i}_f", x.shape[-1], hd)
            bwd = self._gru_params(f"gru{i}_b", x.shape[-1], hd)
            yf, _ = gru_scan(fwd, x)
            yb, _ = gru_scan(bwd, x, reverse=True)
            x = jnp.concatenate([yf, yb], axis=-1)
        return nn.Dense(len(CTC_VOCAB), name="out")(x)


def _log_mel(wav, sr, n_mels=40, stat_frames=None):
    """Lightweight log-mel frontend (25 ms / 10 ms at any sr) -> (t, mels).

    ``stat_frames`` restricts the per-utterance normalization statistics to
    the leading real frames so bucket padding (trailing silence) cannot
    skew them."""
    from ..ops.stft import stft, mel_filterbank, linear_to_mel
    n_fft = 512
    hop = max(1, int(sr * 0.010))
    win = min(n_fft, int(sr * 0.025))
    mag = jnp.abs(stft(jnp.asarray(wav, jnp.float32), n_fft=n_fft,
                       hop_length=hop, win_length=win))
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2))
    mel = jnp.log(jnp.maximum(linear_to_mel(mag, fb), 1e-5)).T
    stat = mel if stat_frames is None else mel[:stat_frames]
    return (mel - stat.mean()) / (stat.std() + 1e-5)


def greedy_decode(logits: np.ndarray) -> str:
    """(t, vocab) -> text via CTC collapse (repeats merged, blanks dropped)."""
    ids = np.asarray(logits).argmax(-1)
    out, prev = [], -1
    for i in ids:
        if i != prev and i != 0:
            out.append(CTC_VOCAB[i])
        prev = i
    return "".join(out).strip()


def _pad_batch(seqs, pad_val=0.0):
    t = max(s.shape[0] for s in seqs)
    out = np.full((len(seqs), t) + seqs[0].shape[1:], pad_val, np.float32)
    pads = np.zeros((len(seqs), t), np.float32)
    for i, s in enumerate(seqs):
        out[i, :s.shape[0]] = s
        pads[i, s.shape[0]:] = 1.0
    return jnp.asarray(out), jnp.asarray(pads)


def train_ctc_asr(pairs: Sequence[tuple], sr: int, *, steps: int = 600,
                  lr: float = 3e-3, n_mels: int = 40, hidden: int = 96,
                  seed: int = 0, log_every: int = 0):
    """Train on [(wav, text), ...]; returns (model, params, final_loss).

    Small corpora train full-batch in minutes on CPU; this is the smoke-level
    recipe `scripts/train_ctc_asr.py` drives.
    """
    import optax

    model = CTCAsrModel(n_mels=n_mels, hidden=hidden)
    # Mel prep mirrors CTCTranscriber.transcribe_wav: pin the tiny frontend
    # to the host CPU backend and bucket wav lengths to powers of two. The
    # naive per-utterance jit compiled ONE stft PER DISTINCT LENGTH through
    # the remote-TPU tunnel (~300 compiles on a cold cache — the round-4c
    # bootstrap sat in this loop for 85+ minutes before this fix).
    from ..ops.stft import n_frames
    cpu = jax.devices("cpu")[0]
    hop = max(1, int(sr * 0.010))
    mels = []
    with jax.default_device(cpu):
        for w, _ in pairs:
            w = np.asarray(w, np.float32)
            n_real = len(w)
            bucket = 1 << max(12, int(n_real - 1).bit_length())
            real_frames = n_frames(n_real, n_fft=512, hop_length=hop)
            m = _log_mel(np.pad(w, (0, bucket - n_real)), sr, n_mels,
                         stat_frames=real_frames)
            mels.append(np.asarray(m)[:real_frames])
    labels = [encode_text(t) for _, t in pairs]
    assert all(len(l) > 0 for l in labels), "empty transcript"
    # CTC feasibility: the 4x-downsampled frame count must cover the label
    # (plus one blank per adjacent repeat) or the loss saturates at its
    # clamp value and nothing trains — drop such pairs loudly
    keep = []
    for i, (m, l) in enumerate(zip(mels, labels)):
        need = len(l) + int(np.sum(l[1:] == l[:-1]))
        if m.shape[0] // 4 >= need:
            keep.append(i)
        else:
            print(f"! ctc_asr: dropping utterance {i}: "
                  f"{m.shape[0] // 4} output frames < {need} needed for "
                  f"{len(l)}-char transcript (audio too short)")
    if not keep:
        raise ValueError("no CTC-feasible (audio, text) pairs: every "
                         "transcript is longer than its audio's frame count")
    mels = [mels[i] for i in keep]
    labels = [labels[i] for i in keep]
    x, xpad = _pad_batch(mels)
    lmax = max(len(l) for l in labels)
    y = np.zeros((len(labels), lmax), np.int32)
    ypad = np.zeros((len(labels), lmax), np.float32)
    for i, l in enumerate(labels):
        y[i, :len(l)] = l
        ypad[i, len(l):] = 1.0
    y, ypad = jnp.asarray(y), jnp.asarray(ypad)
    # logit paddings after the 4x conv downsample
    t_out = model.apply(
        model.init(jax.random.PRNGKey(seed), x[:1]), x[:1]).shape[1]
    frames = jnp.asarray([m.shape[0] for m in mels], jnp.float32)
    out_lens = jnp.ceil(frames / (x.shape[1] / t_out))
    lpad = (jnp.arange(t_out)[None, :] >= out_lens[:, None]).astype(
        jnp.float32)

    params = model.init(jax.random.PRNGKey(seed), x)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x)
            per = optax.ctc_loss(logits, lpad, y, ypad)
            return jnp.mean(per)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.inf
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if log_every and (i + 1) % log_every == 0:
            print(f"ctc step {i + 1}: loss {float(loss):.4f}", flush=True)
    return model, params, float(loss)


class CTCTranscriber:
    """Load-once transcriber over a flat .npz checkpoint."""

    def __init__(self, ckpt_path: str):
        data = np.load(ckpt_path, allow_pickle=False)
        self.sr = int(data["__sr__"])
        self.n_mels = int(data["__n_mels__"])
        hidden = int(data["__hidden__"])
        self.model = CTCAsrModel(n_mels=self.n_mels, hidden=hidden)
        # pin to the host CPU backend: the model is tiny, and compiling the
        # BiGRU scans through a remote-TPU tunnel costs minutes per shape
        self._cpu = jax.devices("cpu")[0]
        flat = {k: jax.device_put(jnp.asarray(v), self._cpu)
                for k, v in data.items() if not k.startswith("__")}
        self.params = {"params": _unflatten(flat)}
        self._jit = jax.jit(lambda m: self.model.apply(self.params, m),
                            device=self._cpu)

    def transcribe_wav(self, wav, sr_hz) -> str:
        if sr_hz != self.sr:
            from scipy.signal import resample_poly
            wav = resample_poly(np.asarray(wav, np.float64), self.sr, sr_hz)
        # pad to a power-of-two sample count: trailing silence decodes to
        # blanks, and arbitrary utterance lengths hit a BOUNDED number of
        # XLA compiles (one per bucket) instead of one per length; the
        # normalization stats come from the REAL frames only
        wav = np.asarray(wav, np.float32)
        n_real = len(wav)
        bucket = 1 << max(12, int(n_real - 1).bit_length())
        wav = np.pad(wav, (0, bucket - n_real))
        # frame count of the UNPADDED utterance, from the stft module's own
        # framing formula (the count the trainer's out_lens see via
        # m.shape[0]) — not a hand-derived duplicate that could drift
        from ..ops.stft import n_frames
        hop = max(1, int(self.sr * 0.010))
        real_frames = n_frames(n_real, n_fft=512, hop_length=hop)
        with jax.default_device(self._cpu):
            mel = _log_mel(wav, self.sr, self.n_mels,
                           stat_frames=real_frames)
            logits = self._jit(mel[None])[0]
        # decode only the real-frame region: training masks the pad tail out
        # of the CTC loss, so the model's outputs there are untrained and
        # would append garbage to the hypothesis (same out_lens formula as
        # the trainer's logit paddings)
        out_frames = int(np.ceil(real_frames
                                 / (mel.shape[0] / logits.shape[0])))
        return greedy_decode(np.asarray(logits[:out_frames]))


def save_ckpt(path: str, params, sr: int, n_mels: int, hidden: int):
    flat = _flatten(params["params"] if "params" in params else params)
    np.savez(path, __sr__=sr, __n_mels__=n_mels, __hidden__=hidden,
             **{k: np.asarray(v) for k, v in flat.items()})


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, kk))
        else:
            out[kk] = v
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_DEFAULT: dict = {}


def set_default_model(path: Optional[str]):
    """Register (or clear) the checkpoint `wer.transcribe` falls back to."""
    _DEFAULT.clear()
    if path:
        _DEFAULT["path"] = path


def default_transcriber() -> Optional[CTCTranscriber]:
    path = _DEFAULT.get("path") or os.environ.get("ETTS_CTC_ASR")
    if not path or not os.path.exists(path):
        return None
    if _DEFAULT.get("loaded_from") != path:
        _DEFAULT["tr"] = CTCTranscriber(path)
        _DEFAULT["loaded_from"] = path
    return _DEFAULT["tr"]
