"""Direct coverage for the small aux utilities: decorators (failure
containment + timing) and infolog (file logger, webhook best-effort)."""
import os

from etts.utils.decorators import ignore_exception, time_it
from etts.utils import infolog


class TestDecorators:
    def test_ignore_exception_swallows_and_returns_none(self, capsys):
        @ignore_exception
        def boom():
            raise ValueError("nope")

        assert boom() is None
        assert "Catched exception in boom" in capsys.readouterr().out

    def test_ignore_exception_passthrough(self):
        @ignore_exception
        def ok(a, b=1):
            return a + b

        assert ok(2, b=3) == 5

    def test_time_it_returns_result_and_elapsed(self):
        @time_it
        def work(x):
            return x * 2

        result, elapsed = work(21)
        assert result == 42
        assert elapsed >= 0.0


class TestInfolog:
    def test_file_logging_roundtrip(self, tmp_path, capsys):
        path = tmp_path / "train.log"
        infolog.init(str(path), "sess")
        infolog.log("hello from the run")
        infolog.close()
        text = path.read_text()
        assert "run sess opened" in text
        assert "hello from the run" in text
        assert "hello from the run" in capsys.readouterr().out

    def test_log_before_init_prints(self, capsys):
        infolog.close()
        infolog.log("pre-init line")  # must not raise with no active log
        assert "pre-init line" in capsys.readouterr().out

    def test_alert_flag_without_url_is_noop(self, tmp_path):
        path = tmp_path / "train2.log"
        infolog.init(str(path), "sess2", slack_url=None)
        infolog.log("alert!", slack=True)  # must not raise offline
        infolog.close()
        assert "alert!" in path.read_text()

    def test_webhook_post_never_raises(self, tmp_path):
        # webhook is best-effort: a bogus URL must be swallowed
        rl = infolog.RunLog(str(tmp_path / "t.log"), "x",
                            webhook_url="http://127.0.0.1:9/unreachable")
        rl._post("msg")  # no exception
        rl.close()


class TestXlaCacheWiring:
    def test_fingerprint_stable_and_short(self):
        from etts.utils.xla_cache import _host_fingerprint
        a, b = _host_fingerprint(), _host_fingerprint()
        assert a == b and len(a) == 8 and all(c in "0123456789abcdef"
                                              for c in a)

    def test_cpu_dir_is_fingerprinted_tpu_dir_is_shared(self, tmp_path):
        import jax
        from etts.utils.xla_cache import (_host_fingerprint,
                                          enable_persistent_cache)
        old = jax.config.jax_compilation_cache_dir
        try:
            # conftest forces jax_platforms=cpu, so even cpu=False resolves
            # to the fingerprinted dir (forced-CPU override path)
            enable_persistent_cache(str(tmp_path), cpu=True)
            assert jax.config.jax_compilation_cache_dir == str(
                tmp_path / f".jax_cache_cpu_{_host_fingerprint()}")
        finally:
            jax.config.update("jax_compilation_cache_dir", old)


class TestLRU:
    def test_bounded_eviction_lru_order(self):
        from etts.utils.lru import LRU
        c = LRU(2)
        c["a"], c["b"] = 1, 2
        _ = c["a"]          # refresh a; b is now LRU
        c["c"] = 3          # evicts b
        assert "a" in c and "c" in c and "b" not in c and len(c) == 2

    def test_compiled_program_caches_are_bounded(self):
        # ADVICE r3: serving caches hold strong model refs; they must be
        # bounded LRUs, not plain dict default args
        import inspect
        from etts.utils.lru import LRU
        from etts import streaming
        from etts.ops.pallas import decoder_step
        for fn, argname in ((streaming.stream_mel, "_decoder_cache"),
                            (streaming.stream_vocode, "_fn_cache")):
            d = inspect.signature(fn).parameters[argname].default
            assert isinstance(d, LRU), f"{fn.__name__}.{argname}"
        assert isinstance(decoder_step._FUSED_CACHE, LRU)


class TestForwardConditioningRejected:
    def test_reject_forward_conditioning(self):
        # forward family takes no ref_mel/spk_embed: silently ignoring a
        # caller's conditioning is a footgun (ADVICE r3)
        import numpy as np
        import pytest
        from etts.api import TTSSynthesizer
        rej = TTSSynthesizer._reject_forward_conditioning
        rej(None, None, None)  # no conditioning: fine
        with pytest.raises(ValueError, match="forward-family"):
            rej(None, np.zeros((10, 80)), None)
        with pytest.raises(ValueError, match="forward-family"):
            rej(None, None, np.zeros(64))
