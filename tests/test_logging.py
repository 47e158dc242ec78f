"""SummaryManager smoke tests: event files written, exceptions swallowed."""
import os

import numpy as np

from etts.utils.logging import SummaryManager
from etts.utils.display import ValueWindow, tight_grid, buffer_image


class FakeModel:
    step = 7


def test_summary_manager_writes_events(tmp_path):
    config = dict(sampling_rate=16000, n_fft=2048, hop_length=200,
                  win_length=800, mel_channels=8, f_min=40, f_max=None,
                  normalizer="WaveRNN")
    sm = SummaryManager(FakeModel(), tmp_path, config)
    sm.add_scalar("train/loss", 1.23)
    sm.add_scalars("losses", {"a": 1.0, "b": 2.0}, step=1)
    sm.add_image("img", np.random.rand(16, 16), step=1)
    sm.add_histogram("hist", np.random.randn(100), step=1)
    sm.display_mel(np.random.rand(8, 30), tag="mel", step=1)
    sm.display_attention_heads(
        {"decoder_attention": {"layer1": np.random.rand(1, 2, 5, 7)}},
        tag="attn", step=1)
    sm.add_audio("audio", np.random.randn(1600).astype(np.float32), 16000,
                 step=1)
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert any("tfevents" in f for f in files)


def test_ignore_exception_on_bad_input(tmp_path):
    sm = SummaryManager(FakeModel(), tmp_path, {})
    # display_audio needs audio config keys; must not raise (ignore_exception)
    sm.display_audio("audio", np.random.rand(8, 30), step=1)


def test_value_window():
    w = ValueWindow(3)
    for v in (1, 2, 3, 4):
        w.append(v)
    assert w.count == 3
    assert w.average == 3.0


def test_tight_grid_and_buffer_image():
    g = tight_grid(np.random.rand(5, 4, 6))
    assert g.shape == (12, 18) or g.shape == (8, 24) or g.ndim == 2
    img = buffer_image(np.random.rand(10, 10))
    assert img.shape == (10, 10, 3) and img.dtype == np.uint8
