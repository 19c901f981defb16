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
    """Wrap an iterator; a daemon thread keeps up to `depth` items ready.

    Call `close()` (or use as a context manager) when abandoning the
    iterator early — otherwise the worker stays blocked on the bounded
    queue, pinning the generator and anything it holds open."""

    def __init__(self, iterator, depth=2):
        self._queue = queue.Queue(maxsize=depth)
        self._err = None
        self._closed = False

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
                    if self._closed:
                        return
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
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Release the worker thread after an early consumer exit."""
        if getattr(self, '_done', False):
            return  # iteration already finished; sentinel consumed
        self._closed = True
        while True:  # drain until the worker posts the sentinel
            item = self._queue.get()
            if item is _SENTINEL:
                break
        self._done = True
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def prefetch(iterator, depth=2):
    return Prefetcher(iterator, depth=depth)
