"""Jittable DSP + compute ops (the TPU replacement for librosa / TF ragged / cuDNN)."""
from .stft import (hann_window, frame, stft, istft, mel_filterbank,
                   linear_to_mel, MelSpectrogram)
from .normalizers import (amp_to_db, db_to_amp, MelGAN, WaveRNNNorm,
                          get_normalizer, normalize_db, denormalize_db,
                          spectrogram_db, mu_law_encode, mu_law_decode,
                          label_to_float, float_to_label, preemphasis,
                          deemphasis)
from .griffin_lim import griffin_lim, mel_to_linear, nnls
from .audio import AudioProcessor
from .masking import (positional_encoding, encoder_padding_mask,
                      mel_padding_mask, look_ahead_mask)
from .attention import scaled_dot_product_attention
from .expand import regulate_lengths
from .gru import gru_init, gru_cell, gru_scan
