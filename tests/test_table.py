"""DeviceTable (on-device accumulator) tests."""

import numpy as np

from krust_tpu.ops.count import count_unique
from krust_tpu.ops.table import DeviceTable
from krust_tpu.models.engines import _HostAccumulator


def _batch(rng, n, key_space):
    hi = rng.integers(0, 2, size=n, dtype=np.uint32)
    lo = rng.integers(0, key_space, size=n, dtype=np.uint32)
    valid = rng.random(n) < 0.9
    return hi, lo, valid


def test_table_matches_host_merge():
    rng = np.random.default_rng(0)
    table = DeviceTable(max_parts=3)
    expected: dict[int, int] = {}
    for _ in range(10):
        hi, lo, valid = _batch(rng, 1000, 50)
        u_hi, u_lo, u_cnt, _ = count_unique(hi, lo, valid)
        table.add(u_hi, u_lo, u_cnt, 1000)
        for h, l, v in zip(hi.tolist(), lo.tolist(), valid.tolist()):
            if v:
                key = (h << 32) | l
                expected[key] = expected.get(key, 0) + 1
    codes, counts = table.finalize()
    got = dict(zip(codes.tolist(), counts.tolist()))
    assert got == expected


def test_table_empty():
    table = DeviceTable()
    codes, counts = table.finalize()
    assert codes.shape[0] == 0 and counts.shape[0] == 0


def test_table_epoch_flush_merges_in_host_acc():
    """Simulates the engine's epoch flush: two epochs merge exactly."""
    rng = np.random.default_rng(1)
    acc = _HostAccumulator()
    expected: dict[int, int] = {}
    for _epoch in range(2):
        table = DeviceTable(max_parts=2)
        for _ in range(4):
            hi, lo, valid = _batch(rng, 500, 20)
            u_hi, u_lo, u_cnt, _ = count_unique(hi, lo, valid)
            table.add(u_hi, u_lo, u_cnt, 500)
            for h, l, v in zip(hi.tolist(), lo.tolist(), valid.tolist()):
                if v:
                    key = (h << 32) | l
                    expected[key] = expected.get(key, 0) + 1
        acc.add(*table.finalize())
    codes, counts = acc.result()
    got = dict(zip(codes.tolist(), counts.tolist()))
    assert got == expected
