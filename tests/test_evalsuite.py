"""Evaluation metric sanity: identical signals score perfectly, degraded ones
score worse; DTW properties; WER golden values."""
import numpy as np
import pytest

from etts.evalsuite import (dtw_path, dtw_distance, mcd, f0_autocorr, f0_rmse,
                            stoi, wer, normalize_for_wer, compute_all_metrics)


def _tone(freq, dur=1.0, sr=16000, noise=0.0, rng=None):
    t = np.arange(int(sr * dur)) / sr
    y = 0.5 * np.sin(2 * np.pi * freq * t)
    # amplitude modulation so the signal has temporal structure for STOI
    y = y * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
    if noise:
        rng = rng or np.random.default_rng(0)
        y = y + noise * rng.standard_normal(len(y))
    return y.astype(np.float64)


class TestDTW:
    def test_identical_zero_distance(self):
        x = np.random.default_rng(0).standard_normal((20, 3))
        d, path = dtw_path(x, x)
        assert d < 1e-6
        assert path[0] == (0, 0) and path[-1] == (19, 19)

    def test_shifted_alignment(self):
        x = np.sin(np.linspace(0, 6, 50))[:, None]
        y = np.sin(np.linspace(0, 6, 70))[:, None]  # time-stretched
        d_aligned = dtw_distance(x, y)
        assert d_aligned < np.abs(x[:50] - y[:50]).sum()

    def test_path_monotonic(self):
        rng = np.random.default_rng(1)
        _, path = dtw_path(rng.standard_normal((15, 2)),
                           rng.standard_normal((12, 2)))
        ii = [p[0] for p in path]
        jj = [p[1] for p in path]
        assert all(a <= b for a, b in zip(ii, ii[1:]))
        assert all(a <= b for a, b in zip(jj, jj[1:]))


class TestMCD:
    def test_identical_is_zero(self):
        y = _tone(220)
        m, fd, _ = mcd(y, y)
        assert m < 1e-6 and fd < 1e-6

    def test_noise_increases_mcd(self):
        y = _tone(220)
        m1, _, _ = mcd(y, _tone(220, noise=0.01))
        m2, _, _ = mcd(y, _tone(220, noise=0.2))
        assert m2 > m1 > 0


class TestF0:
    def test_detects_tone_frequency(self):
        f0 = f0_autocorr(_tone(220), 16000)
        voiced = f0[f0 > 0]
        assert len(voiced) > 10
        assert abs(np.median(voiced) - 220) < 5

    def test_f0_rmse_same_vs_different(self):
        same, _ = f0_rmse(_tone(220), _tone(220))
        diff, _ = f0_rmse(_tone(220), _tone(180))
        assert same < 2.0
        assert diff > 20.0

    def test_silence_is_unvoiced(self):
        f0 = f0_autocorr(np.zeros(16000))
        assert (f0 == 0).all()


class TestSTOI:
    def test_clean_speechlike_high(self):
        y = _tone(150, dur=1.5)
        s = stoi(y, y)
        assert s > 0.95

    def test_noisy_lower(self):
        y = _tone(150, dur=1.5)
        s_clean = stoi(y, y)
        s_noisy = stoi(y, _tone(150, dur=1.5, noise=0.5))
        assert s_noisy < s_clean


class TestWER:
    def test_exact_match(self):
        assert wer("hello world", "hello world") == 0.0

    def test_substitution(self):
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_number_normalization(self):
        assert wer("I have 2 cats", "i have two cats!") == 0.0

    def test_normalize(self):
        assert normalize_for_wer("It's 3 PM.") == ["it's", "three", "pm"]


class TestBundle:
    def test_compute_all_metrics(self):
        y = _tone(200, dur=1.2)
        out = compute_all_metrics(y, _tone(200, dur=1.2, noise=0.05))
        assert set(out) == {"MCD", "FD", "RMSE_F0", "voiced_overlap", "STOI",
                            "PESQ", "PESQ_proxy"}
        assert out["MCD"] > 0 and np.isfinite(out["MCD"])
        # distinct keys: PESQ is real P.862 or None (package absent here);
        # PESQ_proxy is always the documented numpy proxy
        assert out["PESQ"] is None or (isinstance(out["PESQ"], float)
                                       and np.isfinite(out["PESQ"]))
        assert isinstance(out["PESQ_proxy"], float)
        assert np.isfinite(out["PESQ_proxy"])


class TestPesqProxy:
    """PESQ column (reference `objective_measure.py:34-40`): real P.862 when
    the optional package exists, else the documented pure-numpy proxy."""

    def _clean(self, sr=16000, sec=2.0):
        t = np.arange(int(sr * sec)) / sr
        return (0.4 * np.sin(2 * np.pi * 220 * t)
                * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                + 0.05 * np.sin(2 * np.pi * 800 * t))

    def test_identical_is_max(self):
        from etts.evalsuite.metrics import pesq_proxy
        x = self._clean()
        assert pesq_proxy(x, x) == 4.5

    def test_monotonic_under_noise(self):
        from etts.evalsuite.metrics import pesq_proxy
        rng = np.random.default_rng(0)
        x = self._clean()
        scores = []
        for snr_db in (40, 25, 10):
            n = rng.standard_normal(len(x))
            n *= np.sqrt(np.mean(x ** 2) / 10 ** (snr_db / 10)) \
                / np.sqrt(np.mean(n ** 2))
            scores.append(pesq_proxy(x, x + n))
        assert scores[0] > scores[1] > scores[2], scores
        assert 1.0 <= min(scores) and max(scores) <= 4.5

    def test_compute_all_metrics_proxy_key(self):
        from etts.evalsuite.metrics import compute_all_metrics
        rng = np.random.default_rng(1)
        x = self._clean()
        m = compute_all_metrics(x, x + 0.01 * rng.standard_normal(len(x)))
        assert isinstance(m["PESQ_proxy"], float)
        assert np.isfinite(m["PESQ_proxy"])
        # the PESQ key never silently holds proxy values
        try:
            import pesq  # noqa: F401
            assert isinstance(m["PESQ"], float)
        except ImportError:
            assert m["PESQ"] is None
