from .dtw import dtw_path, dtw_distance
from .metrics import (mel_cepstrum, mcd, frame_disturbance, f0_autocorr,
                      f0_rmse, stoi, compute_all_metrics)
from .wer import wer, normalize_for_wer
