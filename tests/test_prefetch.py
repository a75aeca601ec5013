"""Prefetch wrapper semantics."""
import time

import numpy as np
import pytest

from synt_isic_tpu.train.data import prefetch


def test_prefetch_yields_all_in_order():
    items = list(prefetch(iter(range(20)), depth=3))
    assert items == list(range(20))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_overlaps_producer_and_consumer():
    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            yield i

    t0 = time.time()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.02)  # consumer work overlaps producer work
    elapsed = time.time() - t0
    # serial would be ~0.2s; overlapped should be meaningfully less
    assert elapsed < 0.18


def test_prefetch_worker_exits_when_consumer_abandons():
    """Closing the generator mid-iteration (consumer raised / broke out)
    must release the worker thread — a worker blocked forever on q.put
    would pin depth+1 batches for the life of the process."""
    import threading
    import time

    def source():
        for i in range(1000):
            yield [i] * 1000

    before = set(threading.enumerate())
    it = prefetch(source(), depth=2)
    assert next(it) == [0] * 1000
    it.close()  # abandon mid-iteration while the queue is full
    deadline = time.time() + 5.0
    while True:
        extra = [t for t in threading.enumerate() if t not in before]
        if not extra:
            break
        assert time.time() < deadline, f"prefetch worker leaked: {extra}"
        time.sleep(0.05)
