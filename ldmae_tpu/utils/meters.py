"""Training meters and observability.

TPU-native equivalents of the reference's VMAE/util/misc.py logging stack:
  * SmoothedValue (misc.py:175-230): windowed median/avg + global avg
  * MetricLogger (misc.py:233-318): named meters, iteration/data timers,
    periodic log lines with memory; cross-process sync uses
    jax device arrays instead of dist.all_reduce — metric values computed
    inside the jitted step are already globally reduced by SPMD, so
    synchronize_between_processes is a no-op by construction on one host
    and a psum inside the step on many.
  * all_reduce_mean (misc.py:534-542) equivalent for host-side scalars via
    jax.experimental.multihost_utils when multiple processes exist.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def all_reduce_mean(value: float) -> float:
    """Host-scalar mean across processes (misc.py:534-542). Single-process
    returns the value; multi-process goes through multihost_utils."""
    import jax

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, np.float32))
    return float(np.mean(arr))


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        """Timed iteration with periodic log lines (misc.py:274-318)."""
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                print(
                    f"{header} [{i}]  {self}  time: {iter_time}  data: {data_time}"
                )
            i += 1
            end = time.time()
        total = time.time() - start
        print(f"{header} Total time: {total:.1f}s ({total / max(i, 1):.4f} s/it)")


class StepTimer:
    """Steps/sec + MFU tracking around a jitted step (the reference's
    cuda.synchronize + time() pattern, train_accum.py:255-259)."""

    def __init__(
        self,
        flops_per_step: Optional[float] = None,
        peak_flops: Optional[float] = None,
    ):
        self.flops_per_step = flops_per_step
        if peak_flops is None:
            from .profiling import resolve_peak_flops

            peak_flops = resolve_peak_flops()  # None on unknown backends
        self.peak_flops = peak_flops
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.time() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def mfu(self) -> Optional[float]:
        # None (not 0) whenever flops or the backend peak are unknown — a
        # reported 0 must always mean genuinely zero work
        if self.flops_per_step is None or not self.peak_flops:
            return None
        return self.steps_per_sec * self.flops_per_step / self.peak_flops
