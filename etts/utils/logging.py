"""SummaryManager — TensorBoard observability.

Parity with `TransformerTTS/utils/logging.py:24-131`: per-tag scalar writers,
attention-head image grids, mel images, Griffin-Lim audio; plus the TF1-style
extras (gradient-norm scalars) from `gst_tacotron/train.py:26-39`. Backed by
tensorboardX (no TF dependency). All display methods are wrapped in
``ignore_exception`` so logging can never kill a training run
(`utils/decorators.py:5-15` behavior).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .decorators import ignore_exception
from .display import buffer_image, tight_grid

__all__ = ["SummaryManager"]


def control_frequency(freq_attr: str):
    def decorator(func):
        def wrapper(self, *args, **kwargs):
            freq = getattr(self, freq_attr, 1) or 1
            step = kwargs.get("step", 0)
            if step % freq == 0:
                return func(self, *args, **kwargs)
            return None

        return wrapper

    return decorator


class SummaryManager:
    def __init__(self, model, log_dir, config, max_plot_frequency=10,
                 default_writer="log_dir"):
        self.model = model
        self.log_dir = Path(log_dir)
        self.config = config or {}
        self.max_plot_frequency = max_plot_frequency
        self.default_writer = default_writer
        self.writers = {}
        # multihost logging discipline: only the primary process materializes
        # writers/event files; every add_*/display_* is a no-op elsewhere, so
        # drivers can log unconditionally without duplicate TB event files
        import jax
        self._primary = jax.process_index() == 0
        if self._primary:
            self.add_writer(tag=default_writer, path=self.log_dir,
                            default=True)
        self.audio = None  # lazily built AudioProcessor for display_audio

    def add_writer(self, path, tag=None, default=False):
        from tensorboardX import SummaryWriter
        tag = tag or str(path)
        if tag not in self.writers:
            self.writers[tag] = SummaryWriter(str(path))
        if default:
            self.default_writer = tag
        return self.writers[tag]

    @property
    def global_step(self):
        try:
            return int(self.model.step)
        except Exception:  # noqa: BLE001
            return 0

    def _get_writer(self, tag=None):
        return self.writers[tag or self.default_writer]

    @ignore_exception
    def add_scalar(self, tag, scalar_value, step=None):
        if not self._primary:
            return
        step = self.global_step if step is None else step
        self._get_writer().add_scalar(tag, float(scalar_value), step)

    @ignore_exception
    def add_scalars(self, tag, dictionary, step=None):
        if not self._primary:
            return
        step = self.global_step if step is None else step
        for k, v in dictionary.items():
            # per-key writers, as the reference's multi-writer scalars
            w = self.add_writer(self.log_dir / str(k), tag=str(k))
            w.add_scalar(tag, float(v), step)

    @ignore_exception
    def add_image(self, tag, image, step=None):
        """image: 2-D map or (h, w, 3) uint8."""
        if not self._primary:
            return
        step = self.global_step if step is None else step
        image = np.asarray(image)
        if image.ndim == 2:
            image = buffer_image(image)
        self._get_writer().add_image(tag, image, step, dataformats="HWC")

    @ignore_exception
    def add_audio(self, tag, wav, sr, step=None):
        if not self._primary:
            return
        step = self.global_step if step is None else step
        wav = np.asarray(wav, np.float32).reshape(-1)
        self._get_writer().add_audio(tag, wav[:, None], step, sample_rate=sr)

    @ignore_exception
    def add_histogram(self, tag, values, step=None):
        if not self._primary:
            return
        step = self.global_step if step is None else step
        self._get_writer().add_histogram(tag, np.asarray(values), step)

    # -- composite displays (reference logging.py:66-131) ---------------------

    @ignore_exception
    def display_loss(self, output, tag="train", plot_all=False, step=None):
        self.add_scalars(tag=f"{tag}/losses", step=step,
                         dictionary={"loss": output["loss"], **(
                             {k: v for k, v in output.get("losses", {}).items()}
                             if plot_all else {})})

    @ignore_exception
    def display_attention_heads(self, outputs, tag="", step=None):
        for layer, attn in outputs.get("decoder_attention", {}).items():
            attn = np.asarray(attn)
            # (b, heads, q, k) -> grid over heads of sample 0
            self.add_image(f"{tag}/{layer}", tight_grid(attn[0]), step=step)

    @ignore_exception
    def display_mel(self, mel, tag="", step=None, config=None):
        """mel: (t, n_mels) or (n_mels, t) normalized mel."""
        mel = np.asarray(mel)
        if mel.shape[0] > mel.shape[-1]:
            mel = mel.T
        self.add_image(tag, mel[::-1], step=step)

    @ignore_exception
    def display_audio(self, tag, mel, step=None):
        """Griffin-Lim the mel and log playable audio (logging.py:124-131)."""
        if not self._primary:  # skip the GL compute too, not just the write
            return
        from ..ops.audio import AudioProcessor
        if self.audio is None:
            self.audio = AudioProcessor(self.config)
        mel = np.asarray(mel)
        if mel.shape[0] > mel.shape[-1]:
            mel = mel.T
        wav = np.asarray(self.audio.reconstruct_waveform(mel))
        self.add_audio(tag, wav, int(self.config["sampling_rate"]), step=step)

    @ignore_exception
    def display_gradient_norms(self, grads_flat_dict, step=None):
        for name, g in grads_flat_dict.items():
            self.add_scalar(f"gradient_norms/{name}",
                            float(np.linalg.norm(np.asarray(g))), step=step)
