"""Observability utilities (utils/profiling.py): Meter, SOL models, trace."""

import glob
import os

import pytest

from homomorph_tpu.utils import profiling


class TestMeter:
    def test_counters_accumulate(self):
        m = profiling.Meter()
        with m.measure("encrypt", items=100):
            pass
        with m.measure("encrypt", items=50):
            pass
        with m.measure("decrypt", items=7):
            pass
        rep = m.report()
        assert rep["encrypt"]["calls"] == 2
        assert rep["encrypt"]["items"] == 150
        assert rep["decrypt"]["items"] == 7
        assert rep["encrypt"]["items_per_s"] is None or rep["encrypt"]["items_per_s"] > 0
        m.reset()
        assert m.report() == {}

    def test_measure_propagates_exceptions_but_records(self):
        m = profiling.Meter()
        with pytest.raises(RuntimeError):
            with m.measure("op"):
                raise RuntimeError("boom")
        assert m.report()["op"]["calls"] == 1


class TestSolModels:
    def test_chip_peaks_has_required_keys(self):
        peaks = profiling.chip_peaks()
        assert {"mxu_flops", "hbm_bw", "vpu_ops"} <= set(peaks)
        assert all(v > 0 for v in peaks.values())

    def test_models_positive_and_monotonic_in_batch(self):
        for fn, args in [
            (profiling.clmul_sol, (9, 9)),
            (profiling.encrypt_sol, (128, 288)),
            (profiling.decrypt_sol, (9,)),
        ]:
            t1 = fn(1 << 10, *args)
            t2 = fn(1 << 12, *args)
            assert 0 < t1 < t2

    def test_encrypt_fused_model_is_cheaper_on_tpu_peaks(self):
        # the fused model drops the sel/counts HBM round-trips (PERF.md);
        # on v5e peaks the unfused pipeline is HBM-bound, the fused one
        # MXU-bound (on the CPU fallback peaks both are compute-bound,
        # hence the explicit fake device)
        from types import SimpleNamespace

        v5e = SimpleNamespace(device_kind="TPU v5e")
        slow = profiling.encrypt_sol(1 << 21, 128, 288, device=v5e, fused=False)
        fast = profiling.encrypt_sol(1 << 21, 128, 288, device=v5e, fused=True)
        assert fast < slow
        # the unfused v5e model should land near the measured 4.27 ms
        # device time at B=2^21 (PERF.md) - within 2x either way
        assert 2e-3 < slow < 9e-3, slow

    def test_clmul_model_scales_with_operands(self):
        small = profiling.clmul_sol(1 << 10, 9, 9)
        big = profiling.clmul_sol(1 << 10, 500, 17)
        assert big > small


class TestTrace:
    def test_trace_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        logdir = str(tmp_path / "trace")
        with profiling.trace(logdir) as d:
            jax.block_until_ready(jnp.arange(128) * 2)
        assert d == logdir
        files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
        assert files, "profiler wrote nothing"


class TestCompilationCache:
    def test_enable_is_idempotent_and_creates_dir(self, tmp_path):
        import homomorph_tpu as hm

        d = str(tmp_path / "xla_cache")
        got = hm.enable_compilation_cache(d)
        assert got == d and os.path.isdir(d)
        assert hm.enable_compilation_cache(d) == d  # second call is a no-op


class TestDeviceBusy:
    def test_device_busy_returns_sane_values_or_none(self):
        import jax
        import jax.numpy as jnp

        from homomorph_tpu.utils.profiling import device_busy

        @jax.jit
        def f():
            return jnp.zeros((128, 128)) + 1.0

        secs, ops = device_busy(f, reps=2)
        # CPU backends may or may not expose jit_ trace events; either a
        # positive measurement or a clean (None, {}) is acceptable - never
        # an exception, never a non-positive number
        assert (secs is None and ops == {}) or secs > 0
