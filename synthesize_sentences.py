"""End-to-end single-style synthesis: text + reference-style audio -> wav.

Public entry-point parity with the reference `synthesize_sentences.py:14-73`:
loads the AR GST-TransformerTTS checkpoint and the WaveRNN vocoder, then for
each ref_type (sarcasm / commanding / question) encodes the reference wav to a
mel, predicts the output mel, rescales (mel + 4) / 8 into the vocoder's [0, 1]
convention (:54), and vocodes in batched-fold mode. Configurable via CLI
instead of in-source path edits.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tts_config", type=str, required=True,
                        help="config dir of the trained AR model")
    parser.add_argument("--tts_session", type=str, default=None)
    parser.add_argument("--voc_config", type=str, default=None,
                        help="config dir of the trained WaveRNN (omit for Griffin-Lim)")
    parser.add_argument("--voc_session", type=str, default=None)
    parser.add_argument("--sentences", type=str, nargs="*", default=None,
                        help="sentences to synthesize (default: config text_path file)")
    parser.add_argument("--ref_audio_dir", type=str, default=None)
    parser.add_argument("--ref_types", type=str, nargs="*", default=None)
    parser.add_argument("--out_dir", type=str, default="synth_out")
    parser.add_argument("--max_length", type=int, default=1000)
    parser.add_argument("--spk_embed", type=str, default=None,
                        help="speaker d-vector .npy (required for "
                             "speaker-conditioned system_types)")
    parser.add_argument("--model_kind", type=str, default="autoregressive",
                        choices=["autoregressive", "forward"],
                        help="acoustic model family of --tts_session")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--attn_stop_patience", type=int, default=None,
                        help="decode-time runaway guard: stop after N steps "
                        "of cross-attention focus on the final token")
    parser.add_argument("--frames_per_token", type=float, default=None,
                        help="decode-time runaway guard: cap output at F "
                        "frames per input token")
    parser.add_argument("--int8", action="store_true",
                        help="int8 vocoder kernel weights (halves the VMEM weight stream)")
    args = parser.parse_args()

    from etts.utils.xla_cache import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    from etts.api import TTSSynthesizer, VocoderSynthesizer
    from etts.data.audio_io import load_wav, save_wav

    tts = TTSSynthesizer(args.tts_config, args.tts_session,
                         model_kind=args.model_kind)
    config = tts.config
    voc = VocoderSynthesizer(args.voc_config, args.voc_session) \
        if args.voc_config else None

    sentences = args.sentences
    if not sentences:
        text_path = Path(config.get("text_path", ""))
        if text_path.exists():
            sentences = [ln.strip() for ln in open(text_path) if ln.strip()]
        else:
            sentences = ["Scientists at the CERN laboratory say they have "
                         "discovered a new particle."]
    ref_types = args.ref_types or config.get("style_types",
                                             ["sarcasm", "commanding"])
    ref_dir = Path(args.ref_audio_dir or config.get("style_audio_path", "."))
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sr = config["sampling_rate"]

    for ref_type in ref_types:
        ref_mel = None
        # forward models have no style encoder (reference forward config)
        if getattr(tts.model, "has_style", False):
            ref_wav_path = ref_dir / f"{ref_type}.wav"
            if not ref_wav_path.exists():
                print(f"! missing reference audio {ref_wav_path}, skipping "
                      f"{ref_type}")
                continue
            y, _ = load_wav(str(ref_wav_path), sr)
            ref_mel = tts.mel_from_wav(y)
        spk_embed = np.load(args.spk_embed) if args.spk_embed else None
        for i, sentence in enumerate(sentences):
            print(f"[{ref_type}] {sentence!r}")
            out = tts.predict(sentence, ref_mel=ref_mel, spk_embed=spk_embed,
                              max_length=args.max_length,
                              key=jax.random.PRNGKey(args.seed + i),
                              attn_stop_patience=args.attn_stop_patience,
                              max_frames_per_token=args.frames_per_token)
            mel = out["mel"]  # (t, n_mels) in [-4, 4]
            if voc is not None:
                voc_mel = (mel + 4.0) / 8.0  # vocoder contract (:54)
                wav = voc.generate(voc_mel, int8_weights=args.int8 or None)
            else:
                wav = np.asarray(
                    tts.audio.reconstruct_waveform(mel.T, n_iter=32))
            save_wav(wav, out_dir / f"{ref_type}_{i}.wav", sr)
            np.save(out_dir / f"{ref_type}_{i}_mel.npy", mel)
    print(f"Wrote outputs to {out_dir}")


if __name__ == "__main__":
    main()
