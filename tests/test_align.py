"""Property tests for duration extraction: sum(durations) == mel_len - 2."""
import numpy as np
import pytest

from etts.align import (duration_to_alignment_matrix, weight_mask,
                        binary_attention, fill_zeros, clean_attention,
                        get_durations_from_alignment)


class TestPrimitives:
    def test_duration_to_alignment_matrix(self):
        m = duration_to_alignment_matrix([1, 3, 2])
        want = np.array([[1, 0, 0, 0, 0, 0],
                         [0, 1, 1, 1, 0, 0],
                         [0, 0, 0, 0, 1, 1]])
        np.testing.assert_array_equal(m, want)

    def test_weight_mask_zero_diagonal(self):
        w = weight_mask(np.zeros((10, 10)))
        assert np.allclose(np.diag(w), 0)
        assert w[0, 9] > w[0, 1]

    def test_binary_attention_single_peak(self):
        a = np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1], [0.2, 0.3, 0.5]])
        b, score = binary_attention(a)
        np.testing.assert_array_equal(b, np.eye(3))
        assert abs(score - 2.0) < 1e-9

    def test_fill_zeros_borrows(self):
        d = fill_zeros(np.array([0, 5, 2]), take_from="max")
        assert d.sum() == 7 and (d > 0).all()

    def test_clean_attention_limits_jumps(self):
        b = np.zeros((4, 10))
        b[0, 0] = b[1, 1] = b[2, 9] = b[3, 2] = 1  # jump of 8 at frame 2
        cleaned = clean_attention(b, jump_threshold=3)
        assert np.argmax(cleaned[2]) == 1  # jump suppressed


def _make_batch(rng, b=2, heads=3, t_mel=24, t_phon=9, mel_c=6):
    mels = rng.standard_normal((b, t_mel, mel_c)).astype(np.float32)
    mel_lens = [t_mel, t_mel - 5]
    phon_lens = [t_phon, t_phon - 2]
    phonemes = np.zeros((b, t_phon), np.int32)
    for i in range(b):
        mels[i, mel_lens[i]:] = 0.0
        phonemes[i, :phon_lens[i]] = rng.integers(1, 20, phon_lens[i])
    # roughly diagonal attentions
    attn = np.zeros((b, heads, t_mel, t_phon))
    for i in range(b):
        for h in range(heads):
            for t in range(mel_lens[i]):
                p = min(int(t / mel_lens[i] * phon_lens[i]), phon_lens[i] - 1)
                attn[i, h, t, p] = 1.0
            attn[i, h] += rng.random((t_mel, t_phon)) * 0.05
            attn[i, h] /= attn[i, h].sum(-1, keepdims=True)
    return attn, mels, phonemes, mel_lens


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("binary,fix_jumps", [(False, False), (True, False),
                                              (True, True)])
def test_duration_sum_invariant(rng, weighted, binary, fix_jumps):
    attn, mels, phonemes, mel_lens = _make_batch(rng)
    durs, un_mels, un_phons, aligns = get_durations_from_alignment(
        attn, mels, phonemes, weighted=weighted, binary=binary,
        fix_jumps=fix_jumps, fill_gaps=True)
    for i, d in enumerate(durs):
        assert np.sum(d) == mel_lens[i] - 2
        assert un_mels[i].shape[0] == mel_lens[i] - 2
        assert (d >= 0).all()
