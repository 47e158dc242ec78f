"""Golden-value tests for the DSP ops against independent numpy implementations.

The numpy goldens below re-derive librosa's documented conventions from scratch
(periodic hann, centered reflect padding, Slaney mel scale) so the JAX ops are
checked against an implementation that shares no code with them.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from etts.ops import (stft, istft, mel_filterbank, MelSpectrogram, griffin_lim,
                      nnls, mu_law_encode, mu_law_decode, preemphasis,
                      deemphasis, MelGAN, WaveRNNNorm, amp_to_db,
                      float_to_label, label_to_float, spectrogram_db)

SR, NFFT, HOP, WIN, NMEL, FMIN = 16000, 2048, 200, 800, 80, 40


def np_hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def np_stft(y, n_fft=NFFT, hop=HOP, win=WIN):
    w = np.zeros(n_fft)
    lp = (n_fft - win) // 2
    w[lp:lp + win] = np_hann(win)
    y = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames), np.complex128)
    for t in range(n_frames):
        seg = y[t * hop:t * hop + n_fft] * w
        out[:, t] = np.fft.rfft(seg)
    return out


def np_slaney_mel(sr=SR, n_fft=NFFT, n_mels=NMEL, fmin=FMIN, fmax=None):
    fmax = fmax or sr / 2
    def hz2mel(f):
        f = np.atleast_1d(np.asarray(f, float))
        m = f / (200.0 / 3)
        lg = f >= 1000.0
        m[lg] = 1000.0 / (200.0 / 3) + np.log(f[lg] / 1000.0) / (np.log(6.4) / 27.0)
        return m
    def mel2hz(m):
        m = np.atleast_1d(np.asarray(m, float))
        f = m * (200.0 / 3)
        lg = m >= 1000.0 / (200.0 / 3)
        f[lg] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[lg] - 1000.0 / (200.0 / 3)))
        return f
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    pts = mel2hz(np.linspace(hz2mel(fmin)[0], hz2mel(fmax)[0], n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / (c - lo)
        down = (hi - freqs) / (hi - c)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)
    return fb


@pytest.fixture
def wav(rng):
    t = np.arange(SR // 2) / SR  # 0.5 s
    y = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 733 * t)
         + 0.05 * rng.standard_normal(len(t)))
    return y.astype(np.float32)


class TestSTFT:
    def test_matches_numpy_golden(self, wav):
        got = np.asarray(stft(jnp.asarray(wav), NFFT, HOP, WIN))
        want = np_stft(wav.astype(np.float64))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-3, atol=1e-3)

    def test_istft_roundtrip(self, wav):
        spec = stft(jnp.asarray(wav), NFFT, HOP, WIN)
        rec = np.asarray(istft(spec, NFFT, HOP, WIN, length=len(wav)))
        # edges lose a partial frame of context; compare the interior
        sl = slice(NFFT, len(wav) - NFFT)
        np.testing.assert_allclose(rec[sl], wav[sl], atol=5e-4)

    def test_jit_and_shapes(self, wav):
        f = jax.jit(lambda y: stft(y, NFFT, HOP, WIN))
        s = f(jnp.asarray(wav))
        assert s.shape == (NFFT // 2 + 1, 1 + len(wav) // HOP)


class TestMelFilterbank:
    def test_matches_slaney_golden(self):
        got = mel_filterbank(SR, NFFT, NMEL, FMIN)
        want = np_slaney_mel()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_every_filter_nonempty(self):
        fb = mel_filterbank(SR, NFFT, NMEL, FMIN)
        assert (fb.sum(axis=1) > 0).all()

    def test_mel_spectrogram_pipeline(self, wav):
        mel = MelSpectrogram(SR, NFFT, HOP, WIN, NMEL, FMIN)(jnp.asarray(wav))
        assert mel.shape == (NMEL, 1 + len(wav) // HOP)
        want = np_slaney_mel() @ np.abs(np_stft(wav.astype(np.float64)))
        np.testing.assert_allclose(np.asarray(mel), want, rtol=5e-3, atol=1e-4)


class TestNormalizers:
    def test_wavernn_range_and_roundtrip(self, rng):
        S = np.abs(rng.standard_normal((NMEL, 50))).astype(np.float32) * 10
        norm = WaveRNNNorm()
        normed = np.asarray(norm.normalize(jnp.asarray(S)))
        assert normed.min() >= -4.0 - 1e-5 and normed.max() <= 4.0 + 1e-5
        rec = np.asarray(norm.denormalize(jnp.asarray(normed)))
        # representable range is dB in [min_level_db, 0] <=> amp in [1e-5, 1]
        mask = (S > 1e-4) & (S < 1.0)
        np.testing.assert_allclose(rec[mask], S[mask], rtol=1e-3)

    def test_melgan_roundtrip(self, rng):
        S = np.abs(rng.standard_normal((NMEL, 30))).astype(np.float32)
        norm = MelGAN()
        rec = np.asarray(norm.denormalize(norm.normalize(jnp.asarray(S))))
        np.testing.assert_allclose(rec, np.maximum(S, 1e-5), rtol=1e-5)

    def test_amp_to_db_golden(self):
        np.testing.assert_allclose(np.asarray(amp_to_db(jnp.asarray([1.0]))), [0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(amp_to_db(jnp.asarray([10.0]))), [20.0], atol=1e-5)

    def test_spectrogram_db_in_unit_range(self, rng):
        mag = np.abs(rng.standard_normal((100, 20))).astype(np.float32)
        s = np.asarray(spectrogram_db(jnp.asarray(mag)))
        assert s.min() >= 0.0 and s.max() <= 1.0


class TestMuLaw:
    def test_encode_golden(self):
        # independent formula check
        x = np.linspace(-1, 1, 101).astype(np.float32)
        mu = 512
        got = np.asarray(mu_law_encode(jnp.asarray(x), mu))
        fx = np.sign(x) * np.log1p((mu - 1) * np.abs(x)) / np.log1p(mu - 1)
        want = np.floor((fx + 1) / 2 * (mu - 1) + 0.5)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_roundtrip(self):
        x = np.linspace(-0.99, 0.99, 201).astype(np.float32)
        enc = mu_law_encode(jnp.asarray(x), 512)
        dec = np.asarray(mu_law_decode(enc, 512, from_labels=True))
        np.testing.assert_allclose(dec, x, atol=2e-2)

    def test_label_float_roundtrip(self):
        labels = np.arange(0, 512, dtype=np.float32)
        f = label_to_float(jnp.asarray(labels), 9)
        back = np.asarray(float_to_label(f, 9))
        np.testing.assert_allclose(back, labels, atol=1e-3)


class TestPreemphasis:
    def test_roundtrip(self, wav):
        y = preemphasis(jnp.asarray(wav), 0.97)
        rec = np.asarray(deemphasis(y, 0.97))
        np.testing.assert_allclose(rec, wav, atol=1e-4)

    def test_matches_lfilter_semantics(self, wav):
        got = np.asarray(preemphasis(jnp.asarray(wav), 0.97))
        want = np.empty_like(wav)
        want[0] = wav[0]
        want[1:] = wav[1:] - 0.97 * wav[:-1]
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestGriffinLim:
    def test_reconstruction_preserves_spectrum(self, wav):
        mag = jnp.abs(stft(jnp.asarray(wav), NFFT, HOP, WIN))
        rec = griffin_lim(mag, NFFT, HOP, WIN, n_iter=8,
                          key=jax.random.PRNGKey(0), length=len(wav))
        assert rec.shape == (len(wav),)
        mag2 = jnp.abs(stft(rec, NFFT, HOP, WIN))
        # spectral convergence should be decent even at 8 iters
        sc = float(jnp.linalg.norm(mag[:, :mag2.shape[1]] - mag2) / jnp.linalg.norm(mag))
        assert sc < 0.5, sc

    def test_nnls_recovers_nonnegative_solution(self, rng):
        A = np.abs(rng.standard_normal((40, 20))).astype(np.float32)
        x_true = np.abs(rng.standard_normal((20, 7))).astype(np.float32)
        B = A @ x_true
        x = np.asarray(nnls(jnp.asarray(A), jnp.asarray(B), n_iter=200))
        assert x.min() >= 0
        np.testing.assert_allclose(A @ x, B, rtol=0.05, atol=0.05)


class TestAudioProcessor:
    def test_end_to_end(self, wav):
        from etts.ops import AudioProcessor
        cfg = dict(sampling_rate=SR, n_fft=NFFT, hop_length=HOP, win_length=WIN,
                   mel_channels=NMEL, f_min=FMIN, f_max=None, normalizer="WaveRNN")
        ap = AudioProcessor(cfg)
        mel = ap.mel_spectrogram(wav)
        assert mel.shape[0] == NMEL
        assert float(mel.min()) >= -4.0 - 1e-4 and float(mel.max()) <= 4.0 + 1e-4
        rec = ap.reconstruct_waveform(mel, n_iter=4)
        assert rec.ndim == 1 and rec.shape[0] > 0
        assert np.isfinite(np.asarray(rec)).all()


class TestGoldenMelFixtures:
    """Committed fixtures pin the full mel pipeline (STFT conventions, mel
    filterbank, normalizers) against silent regressions — BASELINE north-star
    #2's pipeline contract. Regenerate deliberately (see tests/fixtures/)."""

    def test_pipeline_matches_committed_fixture(self):
        import pathlib
        from etts.ops.audio import AudioProcessor
        fx = np.load(pathlib.Path(__file__).parent / "fixtures"
                     / "mel_golden.npz")
        wav = fx["wav"]
        sr = 16000
        cfgs = {
            "melgan": dict(sampling_rate=sr, n_fft=1024, hop_length=256,
                           win_length=1024, mel_channels=80, f_min=0,
                           f_max=None, normalizer="MelGAN"),
            "wavernn": dict(sampling_rate=sr, n_fft=2048, hop_length=200,
                            win_length=800, mel_channels=80, f_min=40,
                            f_max=None, normalizer="WaveRNN"),
        }
        for name, cfg in cfgs.items():
            got = np.asarray(AudioProcessor(cfg).mel_spectrogram(wav))
            want = fx[f"mel_{name}"]
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=5e-4,
                                       err_msg=f"{name} mel drifted from "
                                               f"the committed golden")
