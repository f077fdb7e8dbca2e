"""Host->device double buffering for video batch drivers.

The TPU tunnel's host->HBM bandwidth fluctuates 10-20x with shared-pool
contention (see bench.py), and ``jax.device_put`` of a big host array BLOCKS
the producing Python thread while the transfer is in flight even though the
consuming computation is dispatched asynchronously.  Relying on dispatch
order alone therefore leaves the chip idle whenever a transfer lands in a
slow window: the end-to-end fps *floor* — not the median — is set by
transfer/compute overlap.

:func:`prefetch_to_device` makes the overlap explicit: a daemon thread runs
``jax.device_put`` for up to ``size`` items ahead of the consumer, so video
i+1 (and i+2) stream through the tunnel while the chip computes on video i.
Equivalent to the double-buffered DMA pattern inside a Pallas kernel, lifted
to the host->HBM edge of the pipeline (the reference has no analog: it copies
per frame, synchronously, utils.py:218-241).
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Callable, Iterable, Iterator

import jax
import numpy as np


def adaptive_depth(bytes_per_item: float, bandwidth_bps: float,
                   compute_s: float, min_depth: int = 2,
                   max_depth: int = 6) -> int:
    """Prefetch depth matched to the measured tunnel bandwidth.

    Fixed double-buffering (depth 2) only hides ONE transfer behind one
    compute; when a transfer takes N x the compute time (the shared relay's
    h2d bandwidth swings 0.03-2 GB/s), the pipe needs ceil(transfer /
    compute) + 1 items in flight to keep the chip fed at the transfer-bound
    rate.  Clamped to [min_depth, max_depth]: each queued item pins a full
    device buffer, so depth is HBM, and past the bandwidth-bound steady
    state extra depth only adds memory.  (The physics cap itself —
    ``bandwidth / bytes_per_frame`` — is what bench.py emits as
    ``e2e_bound_fps``; no depth can beat it.)
    """
    transfer_s = bytes_per_item / max(bandwidth_bps, 1.0)
    depth = math.ceil(transfer_s / max(compute_s, 1e-9)) + 1
    return max(min_depth, min(max_depth, depth))


def prefetch_to_device(items: Iterable, size: int = 2,
                       put: Callable | None = None) -> Iterator:
    """Yield ``put(item)`` for each item, transferring ``size`` ahead.

    ``put`` defaults to ``jax.device_put`` on a contiguous array; pass a
    custom function for sharded placement (e.g. a NamedSharding device_put)
    or structured items.  Exceptions in the producer re-raise at the
    consuming ``next()``.
    """
    if put is None:
        def put(x):
            return jax.device_put(np.ascontiguousarray(x))

    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    _END = object()
    stop = threading.Event()  # consumer abandoned the generator

    def _put(item) -> bool:
        # bounded put + stop polling: if the consumer breaks out of the
        # loop, a blocking q.put would wedge this thread forever and pin
        # up to ``size`` transferred device buffers for the process life
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for it in items:
                if not _put(put(it)):
                    return
        except BaseException as e:  # surface in consumer
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    try:
        while True:
            got = q.get()
            if got is _END:
                return
            if isinstance(got, BaseException):
                raise got
            yield got
    finally:
        stop.set()  # unblock + retire the producer on early exit too
