"""Benchmark: end-to-end text->wav real-time factor on one chip.

Runs the flagship pipeline at reference scale — AR GST-TransformerTTS decode
(256-dim, 4+4 layers, KV-cached while_loop, r=1) into the 512-dim WaveRNN MoL
vocoder with batch folding (target 11000 / overlap 550, `WaveRNN/hparams.py:
52-54`) — on randomly-initialized weights (compute cost is weight-independent;
stop-token early exit disabled so the decode length is fixed).

Prints ONE json line:
  {"metric": "rtf_text_to_wav", "value": RTF, "unit": ..., "vs_baseline": ...}
vs_baseline = RTF / 0.1 (the v4-8 north-star from BASELINE.md; < 1.0 beats it).
Also reports wavernn samples/sec and mel frames/sec as extra fields.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def main():
    from etts.models.autoregressive import (AutoregressiveTransformer,
                                            autoregressive_predict)
    from etts.models.wavernn import WaveRNN, generate

    key = jax.random.PRNGKey(0)
    SR, HOP, MEL_C = 16000, 200, 80

    # flagship AR model at reference scale (autoregressive_config.yaml)
    tts = AutoregressiveTransformer(system_type="speaker_style_text",
                                    mel_channels=MEL_C, vocab_size=130,
                                    max_r=10)
    t_text = 64
    phonemes = jnp.ones((1, t_text), jnp.int32)
    ref_mel = jax.random.normal(key, (1, 60, MEL_C))
    spk = jax.random.normal(key, (1, 1, 256))
    tts_vars = tts.init({"params": key, "dropout": key, "prenet": key},
                        phonemes, ref_mel, spk, r=1)

    # vocoder at reference scale (WaveRNN/hparams.py)
    voc = WaveRNN(feat_dims=MEL_C, hop_length=HOP, sample_rate=SR, mode="MOL")
    mel_dummy = jnp.zeros((1, 12, MEL_C))
    voc_vars = voc.init(key, jnp.zeros((1, 8 * HOP)), mel_dummy, False)

    n_frames = 400  # 5.0 s of audio at hop 200 / 16 kHz
    decode_steps = n_frames  # r=1

    def tts_decode(k):
        out = autoregressive_predict(tts, tts_vars, phonemes, ref_mel, spk,
                                     r=1, max_length=decode_steps - 1, key=k,
                                     stop_enabled=False)
        return out["mel"]

    tts_decode_j = jax.jit(tts_decode)
    mel = tts_decode_j(key)  # compile
    mel.block_until_ready()
    t0 = time.perf_counter()
    N_TTS = 3
    for i in range(N_TTS):
        mel = tts_decode_j(jax.random.fold_in(key, i))
    mel.block_until_ready()
    tts_time = (time.perf_counter() - t0) / N_TTS

    voc_mel = (mel[0] + 4.0) / 8.0

    def vocode(m, k):
        return generate(voc, voc_vars, m[None], batched=True, target=11000,
                        overlap=550, mu_law=False, key=k)

    vocode_j = jax.jit(vocode)
    wav = vocode_j(voc_mel, key)
    wav.block_until_ready()
    t0 = time.perf_counter()
    N_VOC = 3
    for i in range(N_VOC):
        wav = vocode_j(voc_mel, jax.random.fold_in(key, 100 + i))
    wav.block_until_ready()
    voc_time = (time.perf_counter() - t0) / N_VOC

    # DSP frontend speed (BASELINE config 1: mel extraction + Griffin-Lim)
    from etts.ops.audio import AudioProcessor
    ap = AudioProcessor(dict(sampling_rate=SR, n_fft=2048, hop_length=HOP,
                             win_length=800, mel_channels=MEL_C, f_min=40,
                             f_max=None, normalizer="WaveRNN"))
    wav5 = jnp.asarray(np.random.default_rng(0).standard_normal(5 * SR),
                       jnp.float32)
    m = ap.mel_spectrogram(wav5)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(5):
        m = ap.mel_spectrogram(wav5)
    jax.block_until_ready(m)
    mel_extract_sec = (time.perf_counter() - t0) / 5

    audio_sec = wav.shape[0] / SR
    rtf = (tts_time + voc_time) / audio_sec
    result = {
        "metric": "rtf_text_to_wav",
        "value": round(rtf, 5),
        "unit": "wall_sec_per_audio_sec",
        "vs_baseline": round(rtf / 0.1, 4),
        "extras": {
            "tts_sec": round(tts_time, 4),
            "vocoder_sec": round(voc_time, 4),
            "audio_sec": round(audio_sec, 3),
            "wavernn_samples_per_sec": round(wav.shape[0] / voc_time, 1),
            "mel_frames_per_sec": round(mel.shape[1] / tts_time, 1),
            "mel_extraction_x_realtime": round(5.0 / mel_extract_sec, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
