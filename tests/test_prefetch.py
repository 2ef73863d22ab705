"""DevicePrefetcher: ordering, completeness, error propagation."""
import numpy as np
import pytest

from tpuseg.data.prefetch import DevicePrefetcher


def test_prefetcher_yields_all_batches_in_order():
    def load(i):
        return np.full((4, 3), i, np.int32)

    got = [int(np.asarray(b)[0, 0]) for b in DevicePrefetcher(load, 7)]
    assert got == list(range(7))


def test_prefetcher_propagates_load_errors():
    def load(i):
        if i == 2:
            raise ValueError("decode failed")
        return np.zeros((2,), np.float32)

    pf = DevicePrefetcher(load, 5)
    out = []
    with pytest.raises(ValueError, match="decode failed"):
        for b in pf:
            out.append(b)
    assert len(out) == 2


def test_prefetcher_zero_batches():
    assert list(DevicePrefetcher(lambda i: np.zeros(1), 0)) == []
