"""Device input prefetch: stage host->device transfers ahead of the step.

The reference kept the device fed with a threaded ``tf.PaddingFIFOQueue``
pipeline (audio_reader.py ≈:130-172): enqueue threads decode ahead so
``sess.run`` never waits on input. The TPU-native equivalent has TWO
stages — the AudioReader's worker threads already decode ahead on the
host, but the host->device transfer (``shard_batch``'s ``device_put``)
and the dispatch still ran inline in the train loop, serializing a
tunnel round-trip into every step (round-3 soak: ~53 ms/step against
~14 ms device compute).

``DevicePrefetcher`` moves dequeue + device_put into a daemon thread
with a small bounded queue of DEVICE-RESIDENT batches: the transfer for
batch N+1 overlaps step N's compute, so the loop's steady state is
max(compute, transfer) instead of their sum. JAX's device_put is
thread-safe; arrays are futures, so ``get()`` returns immediately and
any transfer latency is absorbed by the device work queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional

_SENTINEL = object()


class DevicePrefetcher:
    """Run ``fill_fn`` (dequeue + device_put) in a worker, ``depth`` deep.

    ``fill_fn() -> Any`` produces one device-resident batch. Exceptions in
    the worker are re-raised from ``get()`` so reader failures surface in
    the train loop, not silently in a daemon thread.

    ``max_items`` bounds how many batches the worker will EVER produce.
    The train loop passes its exact full-dispatch count so the worker
    never steals reader batches that belong to the inline remainder
    steps — without the bound, whether an in-flight fill() had consumed
    the next reader items when stop() arrived was a scheduler race, and
    prefetch-on vs prefetch-off runs could train on different data
    (caught by tests/test_round4_fixes.py's bitwise parity test).
    """

    def __init__(self, fill_fn: Callable[[], Any], depth: int = 2,
                 max_items: Optional[int] = None):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._fill = fill_fn
        self._max_items = max_items
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def _run(self) -> None:
        produced = 0
        while not self._stop.is_set():
            if self._max_items is not None and produced >= self._max_items:
                return
            try:
                item = self._fill()
            except BaseException as e:  # noqa: BLE001 — surfaced via get()
                self._err = e
                item = _SENTINEL
            produced += 1
            # Bounded put that still honors stop() while the queue is full.
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if item is _SENTINEL:
                return

    def get(self, timeout: Optional[float] = None) -> Any:
        """Next device-resident batch (raises the worker's exception)."""
        item = self._q.get(timeout=timeout)
        if item is _SENTINEL:
            assert self._err is not None
            raise self._err
        return item

    def stop(self) -> None:
        """Stop the worker and drop any staged batches."""
        self._stop.set()
        # Unblock a worker stuck in fill() -> put() by draining.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
