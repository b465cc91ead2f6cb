"""Background-thread prefetch for host-side data iterators.

The predict path interleaves two serial resources: host batch assembly
(NIfTI load + normalization + box derivation; the reference hides this in
torch DataLoader workers, datasets.py:141) and device inference. On a
single-core host talking to a tunneled TPU those phases strictly alternate
— prefetching the next batch on a daemon thread while the device runs the
current one overlaps them (bounded queue, so memory stays at
``depth + 1`` batches).

This is the TPU-native analog of the reference's ``num_workers`` loader
parallelism: one thread is enough because the heavy half of the work
(inference) releases the GIL inside jax dispatch, and host assembly is
numpy/C++ (the native NIfTI loader) which also releases it for the hot
parts.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_DONE = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    Order-preserving; exceptions raised by the producer re-raise at the
    consuming site. ``depth <= 0`` returns the iterable unchanged (off).
    """
    if depth <= 0:
        return iter(iterable)

    q: queue.Queue = queue.Queue(maxsize=depth)

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put((_DONE, e))
        else:
            q.put((_DONE, None))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    def consumer():
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _DONE:
                err = item[1]
                if err is not None:
                    raise err
                return
            yield item

    return consumer()
