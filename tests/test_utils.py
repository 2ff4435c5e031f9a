"""Meters, profiling helpers, distributed helpers."""

import time

import numpy as np
import pytest
import jax

from ldmae_tpu.utils.meters import MetricLogger, SmoothedValue, StepTimer, all_reduce_mean
from ldmae_tpu.utils.profiling import dit_forward_flops
from ldmae_tpu.parallel import get_rank, get_world_size, is_main_process, barrier


class TestSmoothedValue:
    def test_window_stats(self):
        v = SmoothedValue(window_size=3)
        for x in [1.0, 2.0, 3.0, 4.0]:
            v.update(x)
        assert v.median == 3.0  # window holds [2,3,4]
        assert v.avg == 3.0
        assert v.global_avg == 2.5
        assert v.max == 4.0
        assert v.value == 4.0
        assert "3.0" in str(v)

    def test_weighted(self):
        v = SmoothedValue()
        v.update(1.0, n=3)
        v.update(5.0, n=1)
        assert v.global_avg == (3 + 5) / 4


class TestMetricLogger:
    def test_update_and_str(self):
        m = MetricLogger()
        m.update(loss=1.0, lr=0.1)
        m.update(loss=2.0)
        assert m.loss.global_avg == 1.5
        assert "loss" in str(m) and "lr" in str(m)

    def test_log_every(self, capsys):
        m = MetricLogger()
        total = sum(m.log_every(range(5), print_freq=2, header="t"))
        assert total == 10
        out = capsys.readouterr().out
        assert "Total time" in out


class TestStepTimer:
    def test_mfu(self):
        t = StepTimer(flops_per_step=197e12, peak_flops=197e12)
        t.tick(10)
        time.sleep(0.01)
        assert t.steps_per_sec > 0
        assert t.mfu is not None

    def test_mfu_none_when_peak_unknown(self):
        # CPU backend resolves no peak: mfu must be None, never 0
        t = StepTimer(flops_per_step=197e12)
        t.tick(10)
        time.sleep(0.01)
        assert t.steps_per_sec > 0
        assert t.mfu is None


class TestMFUFormatting:
    def test_resolve_peak(self):
        from ldmae_tpu.utils.profiling import resolve_peak_flops

        # explicit value always wins (CLI --peak_tflops)
        assert resolve_peak_flops(197.0) == 197e12
        # tests run on the CPU backend: no table entry -> None
        assert resolve_peak_flops() is None

    def test_format_never_rounds_work_to_zero(self):
        from ldmae_tpu.utils.profiling import format_tflops_mfu

        # the r4 CPU soak regression: 0.026 TFLOP/s printed as "0.0 (0% MFU)"
        s = format_tflops_mfu(0.026e12 * 12, 12.0, None)
        assert "0.026" in s and "MFU n/a" in s and "0% MFU" not in s
        s = format_tflops_mfu(0.026e12 * 12, 12.0, 197e12)
        assert "0.026" in s and "0.0132% MFU" in s
        # a known peak renders a sane percent at realistic rates
        s = format_tflops_mfu(69e12, 1.0, 197e12)
        assert "35% MFU" in s


class TestProfiling:
    def test_flops_estimate_scales(self):
        from ldmae_tpu.models.lightningdit import dit_spec

        spec = dit_spec("LightningDiT-B/1", input_size=32, in_channels=16,
                        use_swiglu=True)
        f1 = dit_forward_flops(spec, 1)
        f2 = dit_forward_flops(spec, 2)
        assert abs(f2 / f1 - 2.0) < 1e-6
        # B/1 ballpark: ~0.3 TF per image forward
        assert 0.1e12 < f1 < 1e12
        assert dit_forward_flops(spec, 1, with_cfg=True) == 2 * f1


class TestDistributedHelpers:
    def test_single_process(self):
        assert get_world_size() == 1
        assert get_rank() == 0
        assert is_main_process()
        barrier()  # no-op single process
        assert all_reduce_mean(3.5) == 3.5


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
