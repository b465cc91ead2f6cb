"""Host->device batch prefetching.

The reference overlaps data loading with compute via DataLoader worker
processes (datasets.py:141). Here the equivalent is a small pipeline: a
background thread materializes host batches while the device computes, and
each batch is device_put one step ahead so the (potentially slow, e.g.
tunneled) host->HBM transfer overlaps the previous step's execution.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np

_SENTINEL = object()


def prefetch_batches(iterator, prefetch: int = 2, sharding=None):
    """Wrap a host-batch iterator with threaded prefetch + async device_put.

    Array leaves are transferred to the device (with ``sharding`` if given)
    as soon as a batch is produced; non-array entries pass through. Yields
    batches in order. Exceptions from the producer re-raise at the consumer.
    ``sharding`` may be a callable ``(key, value) -> sharding`` for per-leaf
    layouts (e.g. depth-sharded volumes + batch-sharded masks on a 2-D mesh).
    """
    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                s = sharding(k, v) if callable(sharding) else sharding
                out[k] = jax.device_put(v, s) if s is not None else jax.device_put(v)
            else:
                out[k] = v
        return out

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except Exception as e:  # surface in consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, Exception):
            raise item
        yield item
