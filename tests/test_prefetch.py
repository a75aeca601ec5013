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
