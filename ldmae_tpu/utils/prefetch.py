"""Background-thread batch prefetcher.

Replaces the reference's DataLoader worker processes for host-side batch
assembly: a small thread pool keeps ``buffer_size`` ready batches ahead of
the training loop so safetensors reads / PNG decodes / augmentation overlap
with the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator


class Prefetcher:
    """Wrap an iterator; pull items on a background thread."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator[Any], buffer_size: int = 4):
        self._it = iterator
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except Exception as e:  # surface in the consumer thread
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
