"""Background-thread input prefetching (double buffering).

The reference parallelizes its data generator with worker processes
(GeneratorEnqueuer/OrderedEnqueuer, keras_train.py:133-150). The TPU-first
equivalent is a small bounded-queue prefetcher: vectorization of the next
batches runs on a host thread while the device is busy with the current
step, so the accelerator never waits for one-hot encoding or file I/O.
"""

import queue
import threading

_SENTINEL = object()


class Prefetcher:
    """Wrap an iterator; a daemon thread keeps up to `depth` items ready."""

    def __init__(self, iterator, depth=2):
        self._queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
            except BaseException as err:  # propagate into the consumer
                self._err = err
            finally:
                self._queue.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterator, depth=2):
    return Prefetcher(iterator, depth=depth)
