"""Host->device prefetch pipeline.

The reference zoo overlaps its CUDA data loader with compute via
torch/jittor DataLoader worker processes; the TPU-native equivalent is a
bounded background thread that runs host decode (the native C++ loader)
AND the host->device transfer for batch i+1 while the device computes
batch i. On hosts where the upload link is the bottleneck (e.g. a
tunneled chip), this hides the entire decode cost inside the transfer;
on real TPU hosts (PCIe) it hides the transfer inside compute.

Ref: Yolact.jittor eval.py's DataLoader prefetch / detectron.jittor
data/build.py loader workers (SURVEY §2.2/§2.1 data pipeline rows).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class DevicePrefetcher:
    """Iterate device-resident batches with decode+upload run ahead.

    load_fn(i) -> host batch (numpy/pytree) for step i; the prefetch
    thread calls it then `jax.device_put`s the result, keeping up to
    ``depth`` uploaded batches ready. Exceptions in load_fn propagate to
    the consumer at the next __next__().
    """

    _END = object()

    def __init__(self, load_fn: Callable[[int], object], n_batches: int,
                 depth: int = 2, device=None):
        import jax

        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: list[BaseException] = []

        def worker():
            try:
                for i in range(n_batches):
                    host = load_fn(i)
                    dev = jax.device_put(host, device)
                    self._q.put(dev)
            except BaseException as e:  # surfaced in __next__
                self._err.append(e)
            finally:
                self._q.put(self._END)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            self._thread.join()
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item
