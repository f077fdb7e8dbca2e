"""Host->device prefetch (double buffering) and multi-host init helpers."""

import numpy as np
import jax
import pytest

from openglottal_tpu.data.prefetch import prefetch_to_device
from openglottal_tpu.parallel import (
    initialize_distributed,
    is_primary,
    process_index,
)


def test_prefetch_order_and_values():
    items = [np.full((16, 16), i, np.float32) for i in range(7)]
    out = list(prefetch_to_device(items, size=2))
    assert len(out) == 7
    for i, a in enumerate(out):
        assert isinstance(a, jax.Array)
        np.testing.assert_array_equal(np.asarray(a), items[i])


def test_prefetch_overlaps_ahead_of_consumer():
    """The producer thread must run ahead: after pulling the first item, at
    least one more is already transferred (queue filled in the background)."""
    import time

    puts = []

    def put(x):
        puts.append(time.perf_counter())
        return jax.device_put(x)

    items = [np.zeros((8, 8), np.float32) for _ in range(4)]
    gen = prefetch_to_device(items, size=2, put=put)
    next(gen)
    time.sleep(0.2)  # consumer stalls; producer keeps transferring
    assert len(puts) >= 3  # first + two buffered ahead
    list(gen)


def test_prefetch_custom_put_and_exception():
    def boom(x):
        raise RuntimeError("decode failed")

    gen = prefetch_to_device([1, 2], put=boom)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(gen)


def test_prefetch_abandoned_generator_retires_producer():
    """Breaking out of the consumer loop must not wedge the producer thread
    on a full queue (it would pin transferred device buffers forever)."""
    import threading
    import time

    n_before = threading.active_count()
    items = [np.zeros((8, 8), np.float32) for _ in range(10)]
    gen = prefetch_to_device(items, size=1)
    next(gen)
    gen.close()  # GeneratorExit mid-iteration
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before, "producer thread leaked"


def test_initialize_distributed_single_host_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert process_index() == 0
    assert is_primary() is True


def test_pipelines_prepare_prefetched_matches_prepare():
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.pipelines import GlottalPipelines

    pipe = GlottalPipelines()
    vids = [synthetic_video(t=4, size=64, seed=s)[0] for s in range(3)]
    got = list(pipe.prepare_prefetched(vids, size=2))
    assert len(got) == 3
    for v, (fdev, gray) in zip(vids, got):
        f2, g2 = pipe.prepare(v)
        np.testing.assert_array_equal(np.asarray(gray), np.asarray(g2))
        assert (fdev is None) == (f2 is None)
        if fdev is not None:
            np.testing.assert_array_equal(np.asarray(fdev), np.asarray(f2))
