"""Retry-on-transient-error helper for TPU-relay-facing drivers.

The axon TPU relay occasionally drops a remote_compile / execute request
mid-flight (observed: ``jax.errors.JaxRuntimeError: INTERNAL:
http://127.0.0.1:8113/remote_compile: read body: response body closed before
all bytes were read`` — exactly this killed the round-4 driver bench,
BENCH_r04.json rc=1, VERDICT.md "What's missing" #1).  Such errors are
transient network flakes, not program bugs: the same call succeeds on the
next attempt (the compile cache even makes the retry cheaper).

:func:`retry_transient` retries a thunk on that error class with a short
backoff, so a single relay flake cannot erase a round's measurement evidence
(bench.py) or kill a 20-minute selftest at minute 19 (selftest_e2e.py).
It deliberately retries on ANY ``Exception`` by default: callers are
measurement/validation harnesses where a deterministic bug fails all
attempts identically (wasting seconds, still surfacing the error), while a
misclassified transient would erase real results.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")


def retry_transient(fn: Callable[[], T], attempts: int = 3,
                    backoff_s: float = 3.0,
                    on_error: Callable[[int, BaseException], None] | None = None,
                    sleep: Callable[[float], None] = time.sleep) -> T:
    """Run ``fn()`` with up to ``attempts`` tries; linear backoff between.

    ``on_error(attempt_index, exc)`` is called after each failed attempt
    (for logging).  The final failure re-raises.  ``sleep`` is injectable
    for tests.
    """
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — see module docstring
            last = e
            if on_error is not None:
                on_error(i, e)
            if i + 1 < attempts:
                sleep(backoff_s * (i + 1))
    assert last is not None
    raise last
