"""Pallas WaveRNN kernel validated in interpreter mode against the scan-path
math (deterministic cases) and for distributional sanity (sampling)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.ops.pallas.wavernn_cell import wavernn_sample_loop, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available,
                                reason="pallas not importable")

D, FC, B, T = 16, 16, 8, 12
FEAT, ADIM = 8, 4  # raw conditioning: mel cols + aux split width


def _weights(key, n_out):
    ks = jax.random.split(key, 16)
    s = 0.1
    return dict(
        W_I=jax.random.normal(ks[0], (1 + FEAT + ADIM, D)) * s,
        b_I=jax.random.normal(ks[12], (D,)) * s,
        wi1=jax.random.normal(ks[1], (D, 3 * D)) * s,
        wh1=jax.random.normal(ks[2], (D, 3 * D)) * s,
        bi1=jax.random.normal(ks[3], (3 * D,)) * s,
        bh1=jax.random.normal(ks[4], (3 * D,)) * s,
        w2x=jax.random.normal(ks[5], (D, 3 * D)) * s,
        w2a=jax.random.normal(ks[13], (ADIM, 3 * D)) * s,
        wh2=jax.random.normal(ks[6], (D, 3 * D)) * s,
        bi2=jax.random.normal(ks[14], (3 * D,)) * s,
        bh2=jax.random.normal(ks[7], (3 * D,)) * s,
        wf1x=jax.random.normal(ks[8], (D, FC)) * s,
        wf1a=jax.random.normal(ks[15], (ADIM, FC)) * s,
        bf1=jnp.zeros((FC,)),
        wf2x=jax.random.normal(ks[9], (FC, FC)) * s,
        wf2a=jax.random.normal(ks[10], (ADIM, FC)) * s,
        bf2=jnp.zeros((FC,)),
        wf3=jax.random.normal(ks[11], (FC, n_out)) * s,
        bf3=jnp.zeros((n_out,)),
    )


def _cond(key):
    return jax.random.normal(key, (T, B, FEAT + 4 * ADIM)) * 0.1


def _call_kernel(cond, w, **kw):
    return wavernn_sample_loop(
        cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
        w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
        w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
        w["wf3"], w["bf3"], feat=FEAT, adim=ADIM, chunk=4, interpret=True,
        weight_dtype=jnp.float32, **kw)


def _scan_reference(cond, w, sample_fn):
    """Pure-jnp replication of the kernel recurrence with injected sampling."""
    cond = cond.astype(jnp.float32)
    d = D
    b = cond.shape[1]
    h1 = jnp.zeros((b, d))
    h2 = jnp.zeros((b, d))
    x_prev = jnp.zeros((b, 1))
    logits_all = []
    for t in range(T):
        c = cond[t]
        mel_a1 = c[:, :FEAT + ADIM]
        a2 = c[:, FEAT + ADIM:FEAT + 2 * ADIM]
        a3 = c[:, FEAT + 2 * ADIM:FEAT + 3 * ADIM]
        a4 = c[:, FEAT + 3 * ADIM:]
        inp = mel_a1 @ w["W_I"][1:] + w["b_I"] + x_prev * w["W_I"][0][None, :]
        gi1 = inp @ w["wi1"] + w["bi1"]
        gh1 = h1 @ w["wh1"] + w["bh1"]
        r = jax.nn.sigmoid(gi1[:, :d] + gh1[:, :d])
        z = jax.nn.sigmoid(gi1[:, d:2 * d] + gh1[:, d:2 * d])
        n = jnp.tanh(gi1[:, 2 * d:] + r * gh1[:, 2 * d:])
        h1 = (1 - z) * n + z * h1
        x = inp + h1
        gi2 = x @ w["w2x"] + a2 @ w["w2a"] + w["bi2"]
        gh2 = h2 @ w["wh2"] + w["bh2"]
        r = jax.nn.sigmoid(gi2[:, :d] + gh2[:, :d])
        z = jax.nn.sigmoid(gi2[:, d:2 * d] + gh2[:, d:2 * d])
        n = jnp.tanh(gi2[:, 2 * d:] + r * gh2[:, 2 * d:])
        h2 = (1 - z) * n + z * h2
        x = x + h2
        y = jax.nn.relu(x @ w["wf1x"] + a3 @ w["wf1a"] + w["bf1"])
        y = jax.nn.relu(y @ w["wf2x"] + a4 @ w["wf2a"] + w["bf2"])
        logits = y @ w["wf3"] + w["bf3"]
        logits_all.append(logits)
        x_prev = sample_fn(logits)
    return jnp.stack(logits_all)


class TestKernelInterpret:
    def test_raw_mode_deterministic_path(self):
        """With a near-delta categorical (huge logit scale), sampling is
        deterministic, so kernel output must match the scan reference."""
        key = jax.random.PRNGKey(0)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0  # peaky logits -> argmax sampling
        cond = _cond(jax.random.fold_in(key, 1))

        def sample_fn(logits):
            cls = jnp.argmax(logits, -1).astype(jnp.float32)
            return (2.0 * cls / (n_classes - 1.0) - 1.0)[:, None]

        logits_ref = _scan_reference(cond, w, sample_fn)
        want = 2.0 * jnp.argmax(logits_ref, -1) / (n_classes - 1.0) - 1.0
        got = _call_kernel(cond, w, seed=3, mode="RAW", n_classes=n_classes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_raw_unaligned_row_count(self):
        """B=11 (not a sublane multiple) must pad internally and still match
        the scan reference row-for-row — regression for the round-4 `regimes`
        TPU crash (generate() hands the kernel unpadded fold counts)."""
        key = jax.random.PRNGKey(6)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0
        cond = jax.random.normal(jax.random.fold_in(key, 7),
                                 (T, 11, FEAT + 4 * ADIM)) * 0.1

        def sample_fn(logits):
            cls = jnp.argmax(logits, -1).astype(jnp.float32)
            return (2.0 * cls / (n_classes - 1.0) - 1.0)[:, None]

        logits_ref = _scan_reference(cond, w, sample_fn)
        want = 2.0 * jnp.argmax(logits_ref, -1) / (n_classes - 1.0) - 1.0
        got = _call_kernel(cond, w, seed=9, mode="RAW", n_classes=n_classes)
        assert got.shape == (T, 11)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_mol_mode_runs_and_bounded(self):
        key = jax.random.PRNGKey(2)
        w = _weights(key, 30)
        cond = _cond(jax.random.fold_in(key, 3))
        got = _call_kernel(cond, w, seed=5, mode="MOL")
        arr = np.asarray(got)
        assert arr.shape == (T, B)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() <= 1.0 + 1e-6

    def test_mol_concentrated_means(self):
        """Force all mixture means to a constant and tiny scales: samples must
        land on that constant regardless of mixture choice."""
        key = jax.random.PRNGKey(4)
        w = _weights(key, 30)
        w["wf3"] = jnp.zeros_like(w["wf3"])
        bf3 = np.zeros(30, np.float32)
        bf3[10:20] = 0.5     # means
        bf3[20:30] = -8.0    # log scales (tiny)
        w["bf3"] = jnp.asarray(bf3)
        cond = _cond(jax.random.fold_in(key, 5))
        got = _call_kernel(cond, w, seed=7, mode="MOL")
        np.testing.assert_allclose(np.asarray(got), 0.5, atol=0.02)


class TestStreamingState:
    def test_chunked_state_carry_matches_one_shot(self):
        """Deterministic (peaky RAW) sampling: running the kernel in two
        chunks with carried state must equal one full-length call."""
        key = jax.random.PRNGKey(7)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0
        cond = _cond(jax.random.fold_in(key, 1))

        full = _call_kernel(cond, w, seed=3, mode="RAW", n_classes=n_classes)

        def call(c, state):
            return wavernn_sample_loop(
                c, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"],
                w["bh1"], w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
                w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"],
                w["bf2"], w["wf3"], w["bf3"], 3, feat=FEAT, adim=ADIM,
                chunk=4, interpret=True, weight_dtype=jnp.float32,
                mode="RAW", n_classes=n_classes, state=state,
                return_state=True)

        out1, st = call(cond[:7], None)   # 7 steps: exercises tail masking
        out2, _ = call(cond[7:], st)
        got = np.concatenate([np.asarray(out1), np.asarray(out2)])
        np.testing.assert_allclose(got, np.asarray(full), atol=1e-5)


class TestInt8Weights:
    """int8 per-column weight quantization (VERDICT r2 #2): the sample value
    trajectory must track the f32 path closely — quantization may flip
    borderline argmax picks, but a broken scale/dequant path collapses the
    output entirely."""

    def test_raw_int8_tracks_f32(self):
        key = jax.random.PRNGKey(0)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0  # peaky -> near-deterministic sampling
        cond = _cond(jax.random.fold_in(key, 1))
        f32 = np.asarray(_call_kernel(cond, w, seed=3, mode="RAW",
                                      n_classes=n_classes))
        i8 = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
            w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
            w["wf3"], w["bf3"], seed=3, feat=FEAT, adim=ADIM, chunk=4,
            interpret=True, weight_dtype="int8", mode="RAW",
            n_classes=n_classes))
        assert np.mean(np.abs(i8 - f32)) < 0.1, np.mean(np.abs(i8 - f32))
        assert np.abs(i8).max() <= 1.0 + 1e-6

    def test_chunked_state_carry_int8(self):
        """int8 weights + carried GRU/feedback state — the combination
        `stream_vocode(int8_weights=True)` runs: two chunks with carried
        state must equal one full-length int8 call (deterministic peaky
        RAW sampling)."""
        key = jax.random.PRNGKey(7)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0
        cond = _cond(jax.random.fold_in(key, 1))

        def call(c, state):
            return wavernn_sample_loop(
                c, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"],
                w["bh1"], w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
                w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"],
                w["bf2"], w["wf3"], w["bf3"], 3, feat=FEAT, adim=ADIM,
                chunk=4, interpret=True, weight_dtype="int8",
                mode="RAW", n_classes=n_classes, state=state,
                return_state=True)

        full, _ = call(cond, None)
        out1, st = call(cond[:7], None)
        out2, _ = call(cond[7:], st)
        got = np.concatenate([np.asarray(out1), np.asarray(out2)])
        np.testing.assert_allclose(got, np.asarray(full), atol=1e-5)

    def test_raw_int8_mxu_tracks_f32(self):
        """int8_mxu (native int8 MXU dots + dynamic per-row activation
        quantization, ROADMAP r5 #4) must track the f32 trajectory as closely
        as the dequant path — the int32 accumulate is EXACT, so the only
        error sources are the weight/activation quantization grids."""
        key = jax.random.PRNGKey(0)
        n_classes = 16
        w = _weights(key, n_classes)
        w["wf3"] = w["wf3"] * 100.0
        cond = _cond(jax.random.fold_in(key, 1))
        f32 = np.asarray(_call_kernel(cond, w, seed=3, mode="RAW",
                                      n_classes=n_classes))
        i8 = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
            w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
            w["wf3"], w["bf3"], seed=3, feat=FEAT, adim=ADIM, chunk=4,
            interpret=True, weight_dtype="int8_mxu", mode="RAW",
            n_classes=n_classes))
        assert np.mean(np.abs(i8 - f32)) < 0.1, np.mean(np.abs(i8 - f32))
        assert np.abs(i8).max() <= 1.0 + 1e-6

    def test_mol_int8_concentrated_means(self):
        key = jax.random.PRNGKey(2)
        w = _weights(key, 30)
        w["wf3"] = jnp.zeros((FC, 30))
        bf3 = np.zeros(30, np.float32)
        bf3[10:20] = 0.7
        bf3[20:30] = -8.0
        w["bf3"] = jnp.asarray(bf3)
        cond = _cond(jax.random.fold_in(key, 1))
        got = np.asarray(wavernn_sample_loop(
            cond, w["W_I"], w["b_I"], w["wi1"], w["wh1"], w["bi1"], w["bh1"],
            w["w2x"], w["w2a"], w["wh2"], w["bi2"], w["bh2"],
            w["wf1x"], w["wf1a"], w["bf1"], w["wf2x"], w["wf2a"], w["bf2"],
            w["wf3"], w["bf3"], seed=5, feat=FEAT, adim=ADIM, chunk=4,
            interpret=True, weight_dtype="int8", mode="MOL"))
        assert np.abs(got - 0.7).max() < 0.05, np.abs(got - 0.7).max()
