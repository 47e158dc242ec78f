"""Objective metrics: MCD, frame disturbance, F0-RMSE, STOI.

Re-implementation of the metric suite of `objective_measure.py:25-176` without
its C-extension dependencies (pysptk/pyworld/pystoi/pesq are not available):
  - mel-cepstra via DCT of log-mel-filterbank energies (order 20, c0 dropped)
    standing in for pysptk mgcep(order=20, alpha=0.41)
  - F0 by autocorrelation with parabolic interpolation + voicing decision,
    standing in for pyworld harvest
  - STOI implemented from the Taal et al. 2011 definition (1/3-octave bands,
    384 ms segments, clipped correlation) — same metric pystoi computes
  - PESQ: `pesq_score` is the true ITU-T P.862 score via the optional `pesq`
    package, or None when unavailable; `pesq_proxy` is a pure-numpy
    PESQ-structured perceptual score (bark loudness, masked symmetric +
    asymmetric disturbance -> MOS scale) always reported under the distinct
    PESQ_proxy key — NOT interchangeable with true P.862 values.
All comparisons are DTW-aligned first, as in the reference (:34-98).
"""
from __future__ import annotations

import numpy as np
from scipy.fft import dct
from scipy.signal import stft as _scipy_stft

from .dtw import dtw_path

__all__ = ["mel_cepstrum", "mcd", "frame_disturbance", "f0_autocorr",
           "f0_rmse", "stoi", "pesq_score", "pesq_proxy", "compute_all_metrics"]

_LOG_SPEC_FLOOR = 1e-10


def _mel_filterbank_htk(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    fmax = fmax or sr / 2

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        fb[i] = np.clip(np.minimum((freqs - lo) / (c - lo + 1e-9),
                                   (hi - freqs) / (hi - c + 1e-9)), 0, None)
    return fb


def mel_cepstrum(wav, sr=16000, order=20, n_fft=1024, hop=256, n_mels=40):
    """Frame-wise mel-cepstral coefficients (c1..c_order; c0 excluded as in
    the reference's MCD which drops the energy coefficient)."""
    f, t, Z = _scipy_stft(wav, fs=sr, nperseg=n_fft, noverlap=n_fft - hop,
                          boundary=None, padded=False)
    power = np.abs(Z) ** 2  # (bins, frames)
    fb = _mel_filterbank_htk(sr, n_fft, n_mels)
    logmel = np.log(np.maximum(fb @ power, _LOG_SPEC_FLOOR))  # (mels, frames)
    cep = dct(logmel, axis=0, type=2, norm="ortho")  # (mels, frames)
    return cep[1:order + 1].T  # (frames, order)


_MCD_CONST = 10.0 / np.log(10.0) * np.sqrt(2.0)


def mcd(ref_wav, syn_wav, sr=16000, order=20):
    """Mel-cepstral distortion (dB) over the DTW-aligned path
    (objective_measure.py:43-85 semantics). Returns (mcd_db, fd, path_len)."""
    c_ref = mel_cepstrum(ref_wav, sr, order)
    c_syn = mel_cepstrum(syn_wav, sr, order)
    _, path = dtw_path(c_ref, c_syn)
    ref_al = np.array([c_ref[i] for i, _ in path])
    syn_al = np.array([c_syn[j] for _, j in path])
    diff = ref_al - syn_al
    frame_dist = np.sqrt(np.sum(diff ** 2, axis=1))
    mcd_db = float(_MCD_CONST * np.mean(frame_dist))
    fd = frame_disturbance(ref_al, syn_al)
    return mcd_db, fd, len(path)


def frame_disturbance(ref_aligned, syn_aligned):
    """RMSE of aligned frame feature distances (the reference's FD)."""
    diff = np.asarray(ref_aligned) - np.asarray(syn_aligned)
    return float(np.sqrt(np.mean(np.sum(diff ** 2, axis=1))))


def f0_autocorr(wav, sr=16000, fmin=70.0, fmax=400.0, frame_ms=40.0,
                hop_ms=10.0, voicing_threshold=0.45):
    """Frame-wise F0 via normalized autocorrelation with parabolic refinement;
    0 for unvoiced frames (stands in for pyworld harvest)."""
    frame = int(sr * frame_ms / 1000)
    hop = int(sr * hop_ms / 1000)
    lo = int(sr / fmax)
    hi = min(int(sr / fmin), frame - 1)
    wav = np.asarray(wav, np.float64)
    n_frames = max(0, 1 + (len(wav) - frame) // hop)
    f0 = np.zeros(n_frames)
    for t in range(n_frames):
        seg = wav[t * hop:t * hop + frame]
        seg = seg - seg.mean()
        energy = np.sum(seg ** 2)
        if energy < 1e-8:
            continue
        ac = np.correlate(seg, seg, mode="full")[frame - 1:]
        ac = ac / (ac[0] + 1e-12)
        window = ac[lo:hi]
        if window.size == 0:
            continue
        peak = int(np.argmax(window)) + lo
        if ac[peak] < voicing_threshold:
            continue
        # parabolic interpolation around the peak
        if 1 <= peak < len(ac) - 1:
            a, b, c = ac[peak - 1], ac[peak], ac[peak + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            peak = peak + np.clip(shift, -1, 1)
        f0[t] = sr / peak
    return f0


def f0_rmse(ref_wav, syn_wav, sr=16000):
    """RMSE of log-F0 over frames voiced in both, after DTW alignment of the
    F0 tracks (objective_measure.py:88-98). Returns (rmse_hz, voiced_overlap)."""
    f0_ref = f0_autocorr(ref_wav, sr)
    f0_syn = f0_autocorr(syn_wav, sr)
    if len(f0_ref) == 0 or len(f0_syn) == 0:
        return float("nan"), 0.0
    _, path = dtw_path(f0_ref[:, None], f0_syn[:, None])
    r = np.array([f0_ref[i] for i, _ in path])
    s = np.array([f0_syn[j] for _, j in path])
    voiced = (r > 0) & (s > 0)
    if voiced.sum() == 0:
        return float("nan"), 0.0
    rmse = float(np.sqrt(np.mean((r[voiced] - s[voiced]) ** 2)))
    return rmse, float(voiced.mean())


# ---------------------------------------------------------------------------
# STOI (Taal et al. 2011)
# ---------------------------------------------------------------------------

def _thirdoct(fs, n_fft, num_bands=15, min_freq=150.0):
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    lo = cf * 2 ** (-1.0 / 6.0)
    hi = cf * 2 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        lo_idx = np.argmin((f - lo[i]) ** 2)
        hi_idx = np.argmin((f - hi[i]) ** 2)
        obm[i, lo_idx:hi_idx] = 1.0
    return obm


def _stoi_frames(x, frame_len, hop):
    n = 1 + (len(x) - frame_len) // hop
    w = np.hanning(frame_len + 2)[1:-1]
    idx = np.arange(n)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[idx] * w


def _remove_silent_frames(x, y, dyn_range=40, frame_len=256, hop=128):
    xf = _stoi_frames(x, frame_len, hop)
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energies > (np.max(energies) - dyn_range)
    yf = _stoi_frames(y, frame_len, hop)
    xf, yf = xf[mask], yf[mask]

    def ola(frames):
        total = frame_len + hop * (len(frames) - 1)
        out = np.zeros(total)
        for i, fr in enumerate(frames):
            out[i * hop:i * hop + frame_len] += fr
        return out

    if len(xf) == 0:
        return x, y
    return ola(xf), ola(yf)


def stoi(ref_wav, syn_wav, sr=16000):
    """Short-time objective intelligibility in [~0, 1] (pystoi-compatible
    definition; resamples to 10 kHz internally)."""
    from scipy.signal import resample_poly
    fs = 10000
    x = resample_poly(np.asarray(ref_wav, np.float64), fs, sr)
    y = resample_poly(np.asarray(syn_wav, np.float64), fs, sr)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    frame_len, hop, n_fft = 256, 128, 512
    x, y = _remove_silent_frames(x, y, 40, frame_len, hop)
    if len(x) < frame_len * 2:
        return float("nan")
    w = np.hanning(frame_len + 2)[1:-1]
    nf = 1 + (len(x) - frame_len) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(frame_len)[None, :]
    X = np.abs(np.fft.rfft(x[idx] * w, n_fft, axis=1)) ** 2
    Y = np.abs(np.fft.rfft(y[idx] * w, n_fft, axis=1)) ** 2
    obm = _thirdoct(fs, n_fft)
    Xb = np.sqrt(X @ obm.T)  # (frames, bands)
    Yb = np.sqrt(Y @ obm.T)
    N = 30  # 384 ms segments
    if Xb.shape[0] < N:
        return float("nan")
    beta = 10 ** (-15.0 / 20.0)
    scores = []
    for m in range(N, Xb.shape[0] + 1):
        Xs = Xb[m - N:m]  # (N, bands)
        Ys = Yb[m - N:m]
        alpha = np.sqrt(np.sum(Xs ** 2, axis=0) / (np.sum(Ys ** 2, axis=0)
                                                   + 1e-12))
        Yn = np.minimum(Ys * alpha, Xs * (1 + beta))
        xm = Xs - Xs.mean(0)
        ym = Yn - Yn.mean(0)
        corr = np.sum(xm * ym, axis=0) / (
            np.linalg.norm(xm, axis=0) * np.linalg.norm(ym, axis=0) + 1e-12)
        scores.append(corr)
    return float(np.mean(scores))


_BARK_EDGES_HZ = np.array([
    0, 100, 200, 300, 400, 510, 630, 770, 920, 1080, 1270, 1480, 1720,
    2000, 2320, 2700, 3150, 3700, 4400, 5300, 6400, 7700])


def _bark_loudness(wav, sr, frame=512, hop=256):
    """Frames -> bark-band Zwicker loudness (pure numpy).

    32 ms hann frames, power spectrum grouped into the 21 critical bands
    below 7.7 kHz, then intensity -> loudness via the Zwicker power law
    (exponent 0.23 above a hearing threshold proportional to the band floor).
    """
    wav = np.asarray(wav, np.float64)
    if len(wav) < frame:
        wav = np.pad(wav, (0, frame - len(wav)))
    nf = 1 + (len(wav) - frame) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(frame)[None, :]
    w = np.hanning(frame)
    spec = np.abs(np.fft.rfft(wav[idx] * w, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, 1.0 / sr)
    bands = np.zeros((nf, len(_BARK_EDGES_HZ) - 1))
    for b in range(len(_BARK_EDGES_HZ) - 1):
        sel = (freqs >= _BARK_EDGES_HZ[b]) & (freqs < _BARK_EDGES_HZ[b + 1])
        if sel.any():
            bands[:, b] = spec[:, sel].mean(axis=1)
    p0 = 1e-8 * max(np.mean(bands), 1e-30)   # threshold relative to level
    return (np.maximum(bands / p0, 1.0)) ** 0.23 - 1.0


def pesq_proxy(ref_wav, syn_wav, sr=16000):
    """PESQ-structured perceptual proxy (pure numpy) on a 1.0-4.5 MOS scale.

    NOT ITU-T P.862 (the `pesq` C package is unavailable in this environment
    and P.862 cannot be validated without it); this follows its skeleton so
    the score moves the same way: level alignment, bark-band Zwicker
    loudness, DTW time alignment (instead of P.862 utterance alignment — TTS
    pairs are tempo-shifted), masked symmetric disturbance (L3 over bands,
    L6 over time) plus an asymmetry penalty for additive distortions, mapped
    linearly to MOS. Monotonic under noise/distortion (tested); absolute
    values are NOT interchangeable with true PESQ MOS.
    Reference obligation: `objective_measure.py:34-40` PESQ column.
    """
    x = np.asarray(ref_wav, np.float64)
    y = np.asarray(syn_wav, np.float64)
    # active-level alignment
    x = x / (np.sqrt(np.mean(x ** 2)) + 1e-12)
    y = y / (np.sqrt(np.mean(y ** 2)) + 1e-12)
    Lx = _bark_loudness(x, sr)
    Ly = _bark_loudness(y, sr)
    _, path = dtw_path(Lx.astype(np.float32), Ly.astype(np.float32))
    Lx, Ly = Lx[[i for i, _ in path]], Ly[[j for _, j in path]]
    # masked disturbance: a deadzone of 0.25*min absorbs small differences
    diff = Ly - Lx
    dead = 0.25 * np.minimum(Lx, Ly)
    d = np.sign(diff) * np.maximum(np.abs(diff) - dead, 0.0)
    # symmetric: L3 over bands, L6 over time
    d_frame = np.mean(np.abs(d) ** 3, axis=1) ** (1 / 3)
    D = np.mean(d_frame ** 6) ** (1 / 6)
    # asymmetric: additive components (deg louder than ref) penalized
    asym = np.clip(((Ly + 0.5) / (Lx + 0.5)) ** 1.2, 0.0, 12.0)
    asym[asym < 3.0] = 0.0
    da_frame = np.mean(np.abs(d) * asym, axis=1)
    DA = np.mean(da_frame ** 6) ** (1 / 6)
    # coefficients calibrated on a white-noise SNR sweep so the scale spreads
    # like PESQ MOS (~4.1 @ 40 dB SNR, ~3.0 @ 20 dB, ~1 @ 0 dB)
    mos = 4.5 - 0.08 * D - 0.0025 * DA
    return float(np.clip(mos, 1.0, 4.5))


def pesq_score(ref_wav, syn_wav, sr=16000):
    """True ITU-T P.862 PESQ via the optional `pesq` package, or None when it
    is not installed. Proxy values are deliberately NOT returned under this
    name — they are not comparable to P.862 MOS; use `pesq_proxy` (reported
    as the separate PESQ_proxy metric key) instead."""
    try:
        from pesq import pesq as _pesq
    except ImportError:
        return None
    from scipy.signal import resample_poly
    x = resample_poly(ref_wav, 16000, sr)
    y = resample_poly(syn_wav, 16000, sr)
    return float(_pesq(16000, x, y, "wb"))


def compute_all_metrics(ref_wav, syn_wav, sr=16000):
    """One-call metric bundle (DTW-aligned), the per-pair worker of
    `objective_measure.py:140-176`."""
    mcd_db, fd, _ = mcd(ref_wav, syn_wav, sr)
    rmse, voiced = f0_rmse(ref_wav, syn_wav, sr)
    return {
        "MCD": mcd_db,
        "FD": fd,
        "RMSE_F0": rmse,
        "voiced_overlap": voiced,
        "STOI": stoi(ref_wav, syn_wav, sr),
        # distinct keys so consumers can always tell which backend produced a
        # number: PESQ is real P.862 or None; PESQ_proxy is always the
        # pure-numpy proxy (not comparable to P.862 absolute values)
        "PESQ": pesq_score(ref_wav, syn_wav, sr),
        "PESQ_proxy": pesq_proxy(ref_wav, syn_wav, sr),
    }
