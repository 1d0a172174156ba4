"""Merge-path Pallas kernel: correctness in interpret mode (CPU mesh).

The TPU-compiled path is exercised on real hardware by bench/engine runs;
here the same kernel logic runs through the Pallas interpreter.
"""

import numpy as np
import pytest

from krust_tpu.ops.pallas_merge import CH, SENT, merge_sorted


def _merge(a, b):
    import jax.numpy as jnp

    return np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b), interpret=True))


@pytest.mark.parametrize("m", [CH, 2 * CH, 3 * CH + 64, 10_000])
def test_random_merge(m):
    rng = np.random.default_rng(m)
    a = np.sort(rng.integers(0, 1 << 32, m, np.int64).astype(np.uint32))
    b = np.sort(rng.integers(0, 1 << 32, m, np.int64).astype(np.uint32))
    got = _merge(a, b)
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_skewed_merge():
    """All of a sorts before b (maximal split skew: chunks all-a then all-b)."""
    m = 4 * CH
    a = np.arange(m, dtype=np.uint32)
    b = np.arange(m, dtype=np.uint32) + np.uint32(1 << 20)
    got = _merge(a, b)
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))
    got = _merge(b, a)
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_interleaved_and_duplicates():
    m = 2 * CH
    rng = np.random.default_rng(7)
    a = np.sort(rng.integers(0, 50, m, np.int64).astype(np.uint32))
    b = np.sort(rng.integers(0, 50, m, np.int64).astype(np.uint32))
    got = _merge(a, b)
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_sentinel_padding_tail():
    """SENT-padded tails merge to the back like +inf."""
    m = CH
    rng = np.random.default_rng(3)
    a = np.sort(rng.integers(0, 1 << 30, m, np.int64).astype(np.uint32))
    b = np.full(m, SENT, np.uint32)
    b[: m // 2] = np.sort(rng.integers(0, 1 << 30, m // 2, np.int64)).astype(
        np.uint32
    )
    got = _merge(a, b)
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


class TestKeyedMerge:
    """(hi, lo, cnt) merge: exact multiset of entries under any duplication."""

    def _case(self, m, key_space, seed):
        import collections

        import jax.numpy as jnp

        from krust_tpu.ops.pallas_merge import merge_sorted_kv

        r = np.random.default_rng(seed)

        def gen():
            k = np.sort(r.integers(0, key_space, m, np.int64).astype(np.uint64))
            h = (k >> 32).astype(np.uint32)
            lo = k.astype(np.uint32)
            c = r.integers(1, 100, m, np.int64).astype(np.uint32)
            return k, h, lo, c

        ka, ha, la, ca = gen()
        kb, hb, lb, cb = gen()
        oh, ol, oc = merge_sorted_kv(
            *map(jnp.asarray, (ha, la, ca, hb, lb, cb)), interpret=True
        )
        ok64 = (np.asarray(oh).astype(np.uint64) << 32) | np.asarray(ol).astype(
            np.uint64
        )
        assert np.all(ok64[:-1] <= ok64[1:])
        exp = collections.Counter(
            zip(np.concatenate([ka, kb]).tolist(), np.concatenate([ca, cb]).tolist())
        )
        got = collections.Counter(zip(ok64.tolist(), np.asarray(oc).tolist()))
        assert got == exp  # no count lost or cloned across chunk boundaries

    def test_sparse_keys(self):
        self._case(CH, 1 << 40, 2)

    def test_dense_duplicates(self):
        self._case(2 * CH, 50, 3)

    def test_partial_tail(self):
        self._case(3 * CH + 64, 1 << 20, 4)

    def test_extreme_duplication(self):
        self._case(4 * CH, 8, 5)

    def test_single_key(self):
        self._case(2 * CH, 1, 6)


def test_unequal_shapes_rejected():
    import jax.numpy as jnp

    from krust_tpu.ops.pallas_merge import merge_sorted, merge_sorted_kv

    with pytest.raises(ValueError):
        merge_sorted(jnp.zeros(300, jnp.uint32), jnp.zeros(500, jnp.uint32),
                     interpret=True)
    z = jnp.zeros(256, jnp.uint32)
    with pytest.raises(ValueError):
        merge_sorted_kv(z, z, z, z, z, jnp.zeros(128, jnp.uint32),
                        interpret=True)


def test_empty_inputs():
    import jax.numpy as jnp

    from krust_tpu.ops.pallas_merge import merge_sorted, merge_sorted_kv

    z = jnp.zeros(0, jnp.uint32)
    assert merge_sorted(z, z, interpret=True).shape == (0,)
    oh, ol, oc = merge_sorted_kv(z, z, z, z, z, z, interpret=True)
    assert oh.shape == ol.shape == oc.shape == (0,)


def test_sent_saturated_input():
    """One side entirely SENT: splits must stay in range, output exact."""
    import jax.numpy as jnp

    from krust_tpu.ops.pallas_merge import merge_sorted

    m = 2 * CH
    rng = np.random.default_rng(8)
    a = np.sort(rng.integers(0, 1 << 30, m, np.int64).astype(np.uint32))
    b = np.full(m, SENT, np.uint32)
    got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b), interpret=True))
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_kv_unequal_lengths():
    """The engine merges a small table run into a large batch run."""
    import collections

    import jax.numpy as jnp

    from krust_tpu.ops.pallas_merge import merge_sorted_kv

    r = np.random.default_rng(11)
    for ma, mb in [(CH, 7 * CH), (5 * CH + 100, 300), (1, 2 * CH)]:
        def gen(m):
            k = np.sort(r.integers(0, 1 << 20, m, np.int64).astype(np.uint64))
            return (
                k,
                (k >> 32).astype(np.uint32),
                k.astype(np.uint32),
                r.integers(1, 100, m, np.int64).astype(np.uint32),
            )

        ka, ha, la, ca = gen(ma)
        kb, hb, lb, cb = gen(mb)
        oh, ol, oc = merge_sorted_kv(
            *map(jnp.asarray, (ha, la, ca, hb, lb, cb)), interpret=True
        )
        ok64 = (np.asarray(oh).astype(np.uint64) << 32) | np.asarray(ol).astype(
            np.uint64
        )
        assert ok64.shape[0] == ma + mb
        assert np.all(ok64[:-1] <= ok64[1:])
        exp = collections.Counter(
            zip(np.concatenate([ka, kb]).tolist(), np.concatenate([ca, cb]).tolist())
        )
        got = collections.Counter(zip(ok64.tolist(), np.asarray(oc).tolist()))
        assert got == exp, (ma, mb)


class TestMergeSortedLV:
    """One-key (k<=16) merge: no hi plane (round 4). Differential vs the
    kv kernel with zero hi planes and vs numpy."""

    def _both(self, al, ac, bl, bc):
        import jax.numpy as jnp

        from krust_tpu.ops.pallas_merge import merge_sorted_kv, merge_sorted_lv

        ol, oc = merge_sorted_lv(
            jnp.asarray(al), jnp.asarray(ac), jnp.asarray(bl), jnp.asarray(bc),
            interpret=True,
        )
        zh_a = jnp.zeros(al.shape[0], jnp.uint32)
        zh_b = jnp.zeros(bl.shape[0], jnp.uint32)
        kh, kl, kc = merge_sorted_kv(
            zh_a, jnp.asarray(al), jnp.asarray(ac),
            zh_b, jnp.asarray(bl), jnp.asarray(bc),
            interpret=True,
        )
        return (np.asarray(ol), np.asarray(oc)), (np.asarray(kl), np.asarray(kc))

    @pytest.mark.parametrize("seed", range(3))
    def test_random_matches_kv_and_numpy(self, seed):
        rng = np.random.default_rng(seed + 7)
        ma, mb = int(rng.integers(1, 4000)), int(rng.integers(1, 4000))
        al = np.sort(rng.integers(0, 500, ma).astype(np.uint32))
        bl = np.sort(rng.integers(0, 500, mb).astype(np.uint32))
        ac = rng.integers(1, 100, ma).astype(np.uint32)
        bc = rng.integers(1, 100, mb).astype(np.uint32)
        (ol, oc), (kl, kc) = self._both(al, ac, bl, bc)
        assert np.array_equal(ol, kl)
        # per-key count totals match numpy (intra-key order may differ
        # between kernels; totals are the contract)
        keys = np.concatenate([al, bl])
        cnts = np.concatenate([ac, bc])
        uq = np.unique(keys)
        exp = {int(u): int(cnts[keys == u].sum()) for u in uq}
        got = {}
        for k_, c_ in zip(ol.tolist(), oc.tolist()):
            got[k_] = got.get(k_, 0) + c_
        assert got == exp
        got_kv = {}
        for k_, c_ in zip(kl.tolist(), kc.tolist()):
            got_kv[k_] = got_kv.get(k_, 0) + c_
        assert got_kv == exp

    def test_sentinel_tail_and_near_sentinel(self):
        al = np.array([1, 5, 0xFFFFFFFE, SENT, SENT], np.uint32)
        ac = np.array([2, 3, 4, 0, 0], np.uint32)
        bl = np.array([5, 0xFFFFFFFD], np.uint32)
        bc = np.array([7, 9], np.uint32)
        (ol, oc), (kl, kc) = self._both(al, ac, bl, bc)
        assert np.array_equal(ol, kl)
        real = ol[oc > 0]
        assert real.tolist() == [1, 5, 5, 0xFFFFFFFD, 0xFFFFFFFE]

    def test_empty_sides(self):
        import jax.numpy as jnp

        from krust_tpu.ops.pallas_merge import merge_sorted_lv

        a = np.array([3, 4], np.uint32)
        c = np.array([1, 1], np.uint32)
        z = np.zeros(0, np.uint32)
        ol, oc = merge_sorted_lv(
            jnp.asarray(a), jnp.asarray(c), jnp.asarray(z), jnp.asarray(z),
            interpret=True,
        )
        assert np.array_equal(np.asarray(ol), a)
        ol, oc = merge_sorted_lv(
            jnp.asarray(z), jnp.asarray(z), jnp.asarray(a), jnp.asarray(c),
            interpret=True,
        )
        assert np.array_equal(np.asarray(ol), a)
