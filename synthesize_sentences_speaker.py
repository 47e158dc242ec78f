"""Multi-speaker multi-regime E2E synthesis.

Parity with the reference `synthesize_sentences_speaker.py:11-161`: iterates
experiment sessions, and for each runs the four synthesis regimes —
  - matched      (syn_norm: each test sentence with its own style + speaker)
  - rand         (random text x style x speaker combos from a combo file)
  - text_rand    (random text, matched style/speaker)
  - style_rand   (random style, matched text/speaker)
reading combo files of `text_id|style_id|speaker_id` and speaker-embedding
npys, vocoding with batched WaveRNN. One framework, CLI-configured sessions
instead of sys.path-swapped checkouts.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REGIMES = ("syn_norm", "rand", "text_rand", "style_rand")


def read_combos(path):
    combos = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 3:
                combos.append(tuple(parts[:3]))
    return combos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tts_config", type=str, required=True)
    parser.add_argument("--sessions", type=str, nargs="+", default=[None],
                        help="session names to iterate (reference: S23..S37)")
    parser.add_argument("--voc_config", type=str, default=None)
    parser.add_argument("--voc_session", type=str, default=None)
    parser.add_argument("--test_sentences", type=str, required=True,
                        help="metafile id|text|phonemes of test sentences")
    parser.add_argument("--combo_file", type=str, default=None,
                        help="text_id|style_id|speaker_id combos for the "
                             "random regimes")
    parser.add_argument("--ref_audio_dir", type=str, required=True,
                        help="dir with <style_id>.wav reference audio")
    parser.add_argument("--spk_embed_dir", type=str, required=True,
                        help="dir with <speaker_id>.npy d-vectors")
    parser.add_argument("--regimes", type=str, nargs="*", default=["syn_norm"],
                        choices=list(REGIMES))
    parser.add_argument("--out_dir", type=str, default="synth_speaker_out")
    parser.add_argument("--max_length", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--attn_stop_patience", type=int, default=None,
                        help="decode-time runaway guard: stop after N steps "
                        "of cross-attention focus on the final token")
    parser.add_argument("--frames_per_token", type=float, default=None,
                        help="decode-time runaway guard: cap output at F "
                        "frames per input token")
    parser.add_argument("--int8", action="store_true",
                        help="int8 vocoder kernel weights (halves the VMEM weight stream)")
    parser.add_argument("--voc_scan", action="store_true",
                        help="force the lax.scan vocoder sample loop (skip "
                             "the fused Pallas kernel; slower but "
                             "geometry-independent — long-mel fold counts "
                             "can still fault the kernel, see ROADMAP)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="restore this weights step dir instead of the "
                             "latest (exposure bias: free-running quality "
                             "peaks before train loss does, SOAK_NOTES.md)")
    parser.add_argument("--save_mels", action="store_true",
                        help="save each synthesized mel as <name>.npy (TTS "
                             "[-4,4] layout) instead of vocoding, for a "
                             "separate vocoder-only process "
                             "(scripts/vocode_dir.py). Round-5 forensics: "
                             "the long-mel worker fault needs the TTS model "
                             "co-resident with the vocoder, so the serving "
                             "protocol splits them across processes")
    args = parser.parse_args()

    from etts.utils.xla_cache import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    from etts.api import TTSSynthesizer, VocoderSynthesizer
    from etts.data.audio_io import load_wav, save_wav

    voc = (VocoderSynthesizer(args.voc_config, args.voc_session)
           if args.voc_config and not args.save_mels else None)

    sentences = {}
    with open(args.test_sentences, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                sentences[parts[0]] = parts[1]

    combos = read_combos(args.combo_file) if args.combo_file else \
        [(k, k, k) for k in sentences]

    rng = np.random.default_rng(args.seed)
    for session in args.sessions:
        tts = TTSSynthesizer(args.tts_config, session,
                             checkpoint=args.checkpoint)
        sr = tts.config["sampling_rate"]
        for regime in args.regimes:
            out_dir = Path(args.out_dir) / (session or "default") / regime
            out_dir.mkdir(parents=True, exist_ok=True)
            for i, (text_id, style_id, spk_id) in enumerate(combos):
                if regime == "syn_norm":
                    # matched regime: the sentence's own reference audio and
                    # speaker embedding (reference objective_measure.py
                    # "syn_norm" = normal synthesis, all conditioning from
                    # the target utterance itself)
                    style_id = spk_id = text_id
                elif regime == "rand":
                    pass  # combo file already holds random triples
                elif regime == "text_rand":
                    text_id = combos[rng.integers(len(combos))][0]
                elif regime == "style_rand":
                    style_id = combos[rng.integers(len(combos))][1]
                text = sentences.get(text_id)
                if text is None:
                    continue
                ref_mel = None
                if tts.model.has_style:
                    wav_path = Path(args.ref_audio_dir) / f"{style_id}.wav"
                    if not wav_path.exists():
                        continue
                    y, _ = load_wav(str(wav_path), sr)
                    ref_mel = tts.mel_from_wav(y)
                spk = None
                if tts.model.has_speaker:
                    spk_path = Path(args.spk_embed_dir) / f"{spk_id}.npy"
                    if not spk_path.exists():
                        continue
                    spk = np.load(spk_path)
                out = tts.predict(text, ref_mel=ref_mel, spk_embed=spk,
                                  max_length=args.max_length,
                                  key=jax.random.PRNGKey(args.seed + i),
                                  attn_stop_patience=args.attn_stop_patience,
                                  max_frames_per_token=args.frames_per_token)
                mel = out["mel"]
                name = f"{text_id}__{style_id}__{spk_id}"
                if args.save_mels:
                    np.save(out_dir / f"{name}.npy", np.asarray(mel))
                    print(f"[{session}/{regime}] {name} "
                          f"({mel.shape[0]}f, mel saved)", flush=True)
                    continue
                if voc is not None:
                    wav = voc.generate((mel + 4.0) / 8.0,
                                       int8_weights=args.int8 or None,
                                       use_pallas=False if args.voc_scan
                                       else None)
                else:
                    wav = np.asarray(tts.audio.reconstruct_waveform(mel.T))
                save_wav(wav, out_dir / f"{name}.wav", sr)
                print(f"[{session}/{regime}] {name}")
    print("Done.")


if __name__ == "__main__":
    main()
