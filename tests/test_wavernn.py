"""WaveRNN vocoder tests: training forward, MoL loss/sampling, fold/unfold,
generation loop, and consistency of the hoisted-matmul scan with the full
training forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.wavernn import (WaveRNN, discretized_mix_logistic_loss,
                                 sample_from_discretized_mix_logistic,
                                 fold_with_overlap, xfade_and_unfold, generate)

TINY = dict(rnn_dims=16, fc_dims=16, bits=4, pad=2, upsample_factors=(2, 5),
            feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=2,
            hop_length=10, sample_rate=100)


def _init(mode="MOL"):
    model = WaveRNN(mode=mode, **TINY)
    t_mel = 9
    x = jnp.zeros((2, (t_mel - 2 * 2) * 10))
    mels = jax.random.normal(jax.random.PRNGKey(0), (2, t_mel, 8))
    variables = model.init(jax.random.PRNGKey(1), x, mels, False)
    return model, variables, x, mels


class TestTrainingForward:
    @pytest.mark.parametrize("mode,classes", [("MOL", 30), ("RAW", 16)])
    def test_shapes(self, mode, classes):
        model, variables, x, mels = _init(mode)
        logits, _ = model.apply(variables, x, mels, True,
                                mutable=["batch_stats"])
        assert logits.shape == (2, x.shape[1], classes)

    def test_upsample_lengths(self):
        model, variables, x, mels = _init()
        up, aux = model.apply(variables, mels, False,
                              method=WaveRNN.upsample_cond)
        assert up.shape == (2, (9 - 4) * 10, 8)
        assert aux.shape == (2, (9 - 4) * 10, 8)


class TestMoL:
    def test_loss_finite_and_positive(self):
        k = jax.random.PRNGKey(0)
        y_hat = jax.random.normal(k, (2, 50, 30))
        y = jax.random.uniform(jax.random.fold_in(k, 1), (2, 50, 1),
                               minval=-1, maxval=1)
        loss = discretized_mix_logistic_loss(y_hat, y)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_loss_decreases_when_mean_matches(self):
        y = jnp.full((1, 20, 1), 0.3)
        nr = 10
        good = jnp.concatenate([jnp.zeros((1, 20, nr)),
                                jnp.full((1, 20, nr), 0.3),
                                jnp.full((1, 20, nr), -4.0)], -1)
        bad = good.at[:, :, nr:2 * nr].set(-0.9)
        assert float(discretized_mix_logistic_loss(good, y)) < \
            float(discretized_mix_logistic_loss(bad, y))

    def test_sampling_in_range_and_concentrated(self):
        nr = 10
        params = jnp.concatenate([jnp.zeros((64, nr)),
                                  jnp.full((64, nr), 0.5),
                                  jnp.full((64, nr), -6.0)], -1)
        s = sample_from_discretized_mix_logistic(params, jax.random.PRNGKey(0))
        assert s.shape == (64,)
        assert float(jnp.abs(s - 0.5).max()) < 0.05


class TestFolding:
    def test_fold_shape_and_content(self):
        # reference docstring example: target=2, overlap=1, len=10 -> 3 folds
        x = jnp.arange(10, dtype=jnp.float32)[None, :, None]
        folded = fold_with_overlap(x, target=2, overlap=1)
        assert folded.shape == (3, 4, 1)
        np.testing.assert_allclose(np.asarray(folded[:, :, 0]),
                                   [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]])

    def test_xfade_matches_numpy_golden(self):
        """Independent numpy re-derivation of the reference fade/overlap-add
        (fatchord_version.py:353-383)."""
        rng = np.random.default_rng(0)
        num_folds, target, overlap = 3, 40, 10
        y = rng.standard_normal((num_folds, target + 2 * overlap))

        def golden(y, overlap):
            y = y.copy()
            nf, length = y.shape
            tgt = length - 2 * overlap
            total = nf * (tgt + overlap) + overlap
            sil = overlap // 2
            fl = overlap - sil
            t = np.linspace(-1, 1, fl)
            fi = np.concatenate([np.zeros(sil), np.sqrt(0.5 * (1 + t))])
            fo = np.concatenate([np.sqrt(0.5 * (1 - t)), np.zeros(sil)])
            y[:, :overlap] *= fi
            y[:, -overlap:] *= fo
            out = np.zeros(total)
            for i in range(nf):
                s = i * (tgt + overlap)
                out[s:s + length] += y[i]
            return out

        got = np.asarray(xfade_and_unfold(jnp.asarray(y, jnp.float32), overlap))
        np.testing.assert_allclose(got, golden(y, overlap), atol=1e-5)


class TestGenerate:
    @pytest.mark.parametrize("mode", ["MOL", "RAW"])
    def test_generate_batched(self, mode):
        model, variables, _, _ = _init(mode)
        t_mel = 12
        mel = jax.random.normal(jax.random.PRNGKey(3), (t_mel, 8))
        wav = generate(model, variables, mel, batched=True, target=30,
                       overlap=10, mu_law=True, key=jax.random.PRNGKey(0))
        assert wav.shape == ((t_mel - 1) * 10,)
        assert np.isfinite(np.asarray(wav)).all()
        assert float(jnp.abs(wav).max()) <= 1.0 + 1e-6

    def test_generate_unbatched(self):
        model, variables, _, _ = _init("MOL")
        mel = jax.random.normal(jax.random.PRNGKey(3), (12, 8))
        wav = generate(model, variables, mel, batched=False,
                       key=jax.random.PRNGKey(0))
        assert wav.shape == (110,)

    def test_scan_cell_matches_training_forward(self):
        """The generation scan's hoisted projections must reproduce the
        training forward logits when fed the same sample sequence."""
        model, variables, x, mels = _init("MOL")
        # teacher-forced logits
        logits = model.apply(variables, x, mels, False)
        # replicate via the generation math: run upsample, then step the cell
        # with x_prev forced to the same zeros
        from etts.models.wavernn import WaveRNN as WR
        mels_up, aux = model.apply(variables, mels, False,
                                   method=WR.upsample_cond)
        params = variables["params"]
        d = model.rnn_dims
        adim = model.aux_dims
        a1, a2, a3, a4 = (aux[..., adim * i: adim * (i + 1)] for i in range(4))
        W_I, b_I = params["I"]["kernel"], params["I"]["bias"]
        inp = jnp.concatenate([x[..., None], mels_up, a1], -1) @ W_I + b_I
        from etts.ops.gru import gru_scan
        r1 = {k: params[f"rnn1_{k}"] for k in ("wi", "wh", "bi", "bh")}
        r2 = {k: params[f"rnn2_{k}"] for k in ("wi", "wh", "bi", "bh")}
        h, _ = gru_scan(r1, inp)
        h = h + inp
        res = h
        h, _ = gru_scan(r2, jnp.concatenate([h, a2], -1))
        h = h + res
        Wf1, bf1 = params["fc1"]["kernel"], params["fc1"]["bias"]
        h = jax.nn.relu(jnp.concatenate([h, a3], -1) @ Wf1 + bf1)
        Wf2, bf2 = params["fc2"]["kernel"], params["fc2"]["bias"]
        h = jax.nn.relu(jnp.concatenate([h, a4], -1) @ Wf2 + bf2)
        manual = h @ params["fc3"]["kernel"] + params["fc3"]["bias"]
        np.testing.assert_allclose(np.asarray(manual), np.asarray(logits),
                                   atol=1e-4)


class TestGenerateBatch:
    def test_multi_utterance(self):
        from etts.models.wavernn import generate_batch
        model, variables, _, _ = _init("MOL")
        import jax
        mels = [jax.random.normal(jax.random.PRNGKey(i), (10 + 2 * i, 8))
                for i in range(3)]
        wavs = generate_batch(model, variables, mels, target=30, overlap=10,
                              key=jax.random.PRNGKey(0))
        assert len(wavs) == 3
        for i, w in enumerate(wavs):
            assert w.shape == ((10 + 2 * i - 1) * 10,)
            assert np.isfinite(np.asarray(w)).all()


class TestServingShapeDiscipline:
    """Serving shape discipline (VERDICT r1 #4): mel-length bucketing + traced
    wave_len keep the XLA compile count bounded across a length mix, and
    bucket padding is output-equivalent in the real region."""

    def test_bucket_padding_is_output_equivalent(self):
        # unbatched: same rng chain step-by-step, so the real-region samples
        # must be EXACTLY equal with and without bucket padding
        model, variables, _, _ = _init("MOL")
        mel = jax.random.normal(jax.random.PRNGKey(3), (12, 8)) * 0.3
        k = jax.random.PRNGKey(0)
        plain = generate(model, variables, mel, batched=False, key=k,
                         bucket=False)
        padded = generate(model, variables, mel, batched=False, key=k,
                          bucket=True)
        assert plain.shape == padded.shape == (110,)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(padded),
                                   atol=1e-6)

    def test_bounded_compiles_over_length_mix(self):
        from etts.models.wavernn import (_upsample_and_fold, _finalize_jit,
                                         generate_batch, _bucket_len)
        model, variables, _, _ = _init("MOL")
        key = jax.random.PRNGKey(1)
        lengths = [11, 13, 17, 19, 22, 25, 28, 30, 33, 38]
        mels = [jax.random.normal(jax.random.fold_in(key, t), (t, 8)) * 0.3
                for t in lengths]
        up_before = _upsample_and_fold._cache_size()
        fin_before = _finalize_jit._cache_size()
        wavs = generate_batch(model, variables, mels, target=30, overlap=10,
                              key=key)
        n_buckets = len({_bucket_len(t) for t in lengths})
        assert n_buckets <= 2
        assert _upsample_and_fold._cache_size() - up_before <= n_buckets
        # finalize length is traced -> one compile per fold-count bucket
        assert _finalize_jit._cache_size() - fin_before <= n_buckets
        for t, w in zip(lengths, wavs):
            assert w.shape == ((t - 1) * 10,)
            assert np.isfinite(np.asarray(w)).all()


class TestFoldPruning:
    """Dead fold rows (wholly past wave_len, introduced by bucket padding)
    are dropped BEFORE the sequential sample loop (VERDICT r2 #6)."""

    def test_live_folds_math(self):
        from etts.models.wavernn import _live_folds, fold_with_overlap
        # mirrors fold_with_overlap's count for the unbucketed total length
        assert _live_folds(120, 30, 10, 8) == 3
        assert _live_folds(50, 30, 10, 8) == 1
        assert _live_folds(90, 30, 10, 8) == 2
        assert _live_folds(5, 30, 10, 8) == 1      # never zero rows
        assert _live_folds(10**9, 30, 10, 8) == 8  # capped at available
        # exhaustive parity with the folding op itself
        for total in range(41, 600, 3):
            x = jnp.zeros((1, total, 2))
            want = fold_with_overlap(x, 30, 10).shape[0]
            assert _live_folds(total, 30, 10, 10**9) == want, total

    def test_pruned_rows_enter_sample_loop(self, monkeypatch):
        import etts.models.wavernn as wr
        model, variables, _, _ = _init("MOL")
        seen = {}
        orig = wr._run_sample_loop

        def spy(model, streams, w, key, **kw):
            seen["rows"] = streams["i"].shape[0]
            return orig(model, streams, w, key, **kw)

        monkeypatch.setattr(wr, "_run_sample_loop", spy)
        mel = jax.random.normal(jax.random.PRNGKey(3), (12, 8)) * 0.3
        # bucket pads 12 -> 32 frames (320 samples): 8 folds at 30/10, but
        # only ceil(110/40)=3 intersect the real 110-sample waveform
        generate(model, variables, mel, batched=True, target=30, overlap=10,
                 key=jax.random.PRNGKey(0), bucket=True, use_pallas=False)
        assert seen["rows"] == 3

    @pytest.mark.parametrize("t_mel", [12, 17, 23])
    def test_bucketed_batched_output_equals_unbucketed(self, t_mel):
        # pruning restores the unbucketed fold count for EVERY length, so
        # the rng chains line up and outputs must match exactly
        model, variables, _, _ = _init("MOL")
        mel = jax.random.normal(jax.random.PRNGKey(3), (t_mel, 8)) * 0.3
        k = jax.random.PRNGKey(0)
        plain = generate(model, variables, mel, batched=True, target=30,
                         overlap=10, key=k, bucket=False, use_pallas=False)
        pruned = generate(model, variables, mel, batched=True, target=30,
                          overlap=10, key=k, bucket=True, use_pallas=False)
        assert plain.shape == pruned.shape == ((t_mel - 1) * 10,)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(pruned),
                                   atol=1e-6)


class TestShardedVocoding:
    """Fold-parallel vocoding across chips (SURVEY §2.5): rows shard over an
    8-device mesh, each device runs its own sequential sample loop."""

    def test_sharded_matches_shape_and_is_deterministic(self):
        from etts.models.wavernn import generate_batch_sharded
        from etts.parallel import make_mesh
        assert len(jax.devices()) == 8
        mesh = make_mesh(("data",))
        model, variables, _, _ = _init("MOL")
        key = jax.random.PRNGKey(0)
        lengths = [11, 17, 23]
        mels = [jax.random.normal(jax.random.fold_in(key, t), (t, 8)) * 0.3
                for t in lengths]
        wavs = generate_batch_sharded(model, variables, mels, mesh=mesh,
                                      target=30, overlap=10, key=key)
        for t, w in zip(lengths, wavs):
            assert w.shape == ((t - 1) * 10,)
            arr = np.asarray(w)
            assert np.isfinite(arr).all() and np.abs(arr).max() <= 1 + 1e-6
        wavs2 = generate_batch_sharded(model, variables, mels, mesh=mesh,
                                       target=30, overlap=10, key=key)
        for a, b in zip(wavs, wavs2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestCondSanitize:
    def test_hostile_conditioning_is_clamped_finite(self):
        # VERDICT r4 #3: hostile conditioning (runaway AR mels -> NaN/Inf
        # through the upsampler) must never reach the fused kernel raw
        from etts.models.wavernn import _sanitize_cond
        c = jnp.array([[jnp.nan, jnp.inf, -jnp.inf, 1e30, -1e30, 3.5]])
        out = np.asarray(_sanitize_cond(c))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0], [0.0, 1e4, -1e4, 1e4, -1e4, 3.5])

    def test_in_range_tensor_is_untouched(self):
        from etts.models.wavernn import _sanitize_cond
        c = jax.random.normal(jax.random.PRNGKey(0), (7, 3, 11)) * 10.0
        np.testing.assert_array_equal(np.asarray(_sanitize_cond(c)),
                                      np.asarray(c))

    def test_dump_hook_writes_and_rotates(self, tmp_path, monkeypatch):
        # ETTS_DUMP_COND: the forensics hook persists the exact kernel input
        from etts.models import wavernn as wr
        monkeypatch.setenv("ETTS_DUMP_COND", str(tmp_path))
        captured = {}

        def fake_loop(cond, *a, **k):
            captured["shape"] = cond.shape
            return jnp.zeros((cond.shape[0], cond.shape[1]))

        monkeypatch.setattr("etts.ops.pallas.wavernn_sample_loop", fake_loop)
        model, variables, _, mels = _init("MOL")
        wr.generate(model, variables, mels[0][None], target=30, overlap=10,
                    mu_law=False, use_pallas=True)
        files = sorted(p.name for p in tmp_path.glob("cond_*.npz"))
        assert files == ["cond_0.npz"]
        rec = np.load(tmp_path / "cond_0.npz")
        assert tuple(rec["cond"].shape) == tuple(captured["shape"])
        assert (tmp_path / "counter").read_text() == "1"
