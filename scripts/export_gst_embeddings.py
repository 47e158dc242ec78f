"""Export per-utterance GST style embeddings.

Reference parity with `gst_tacotron/get_only_gst_embeddings.py` /
`synthesizer_only_embd.py`: run every utterance's mel through the trained
style encoder (AR model's ReferenceEncoderGST or Tacotron's reference
encoder + style attention) and save one embedding npy per utterance — the
inputs for `plot_scripts/plot_speaker_embeddings.py`.
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp
import tqdm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--model_kind", type=str, default="autoregressive",
                        choices=["autoregressive", "tacotron"])
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--metafile", type=str, default=None)
    parser.add_argument("--mel_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="gst_embeddings")
    args = parser.parse_args()

    from etts.utils import ConfigManager
    from etts.data import load_files

    cm = ConfigManager(args.config, args.model_kind, args.session_name)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    metafile = args.metafile or (cm.train_datadir / "train_metafile.txt")
    mel_dir = args.mel_dir or (cm.train_datadir / "mels")
    samples, _ = load_files(metafile, mel_dir, None)

    if args.model_kind == "autoregressive":
        from etts.models.autoregressive import AutoregressiveTransformer
        model, variables, step, _ = cm.load_model()
        assert model.has_style, "system_type has no style encoder"

        @jax.jit
        def embed(mel):
            out, _, _ = model.apply(
                variables, mel, False, 0,
                method=AutoregressiveTransformer.encode_style,
                rngs={"dropout": jax.random.PRNGKey(0),
                      "prenet": jax.random.PRNGKey(0)})
            return out[:, 0, :]
    else:
        from etts.api import TacotronSynthesizer
        from etts.models.tacotron import Tacotron
        synth = TacotronSynthesizer(args.config, args.session_name)
        model, variables = synth.model, synth.variables

        @jax.jit
        def embed(mel):
            def fn(mdl, m):
                ref = mdl.ref_encoder(m, False)
                if mdl.use_gst:
                    tokens = jnp.tanh(jnp.tile(mdl.gst_tokens_p[None],
                                               (m.shape[0], 1, 1)))
                    return mdl.style_attention(ref[:, None, :], tokens)[:, 0]
                return ref
            return model.apply(variables, mel, method=fn,
                               rngs={"prenet": jax.random.PRNGKey(0)})

    for phonemes, text, mel_path, _ in tqdm.tqdm(samples):
        mel = np.load(mel_path)[None]  # (1, t, n_mels)
        e = np.asarray(embed(jnp.asarray(mel)))[0]
        np.save(out_dir / Path(mel_path).name, e)
    print(f"wrote {len(samples)} embeddings to {out_dir}")


if __name__ == "__main__":
    main()
