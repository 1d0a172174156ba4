"""rle_compact kernel: differential + edge-case tests (interpret mode).

Runs with KRUST_RLE_CHUNK=1024 via a subprocess-free reload so chunk
boundaries, carries, and multi-chunk runs are exercised at test sizes.
"""

import importlib
import os

import numpy as np
import pytest

os.environ.setdefault("KRUST_RLE_CHUNK", "1024")

import jax.numpy as jnp  # noqa: E402

from krust_tpu.ops import pallas_rle  # noqa: E402

if pallas_rle.CH != 1024:  # pragma: no cover - depends on import order
    importlib.reload(pallas_rle)

SENT = pallas_rle.SENT


def _split(keys):
    return (
        (keys >> 32).astype(np.uint32),
        (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def _run(keys, cnt=None, pad=0):
    hi, lo = _split(keys)
    if pad:
        hi = np.concatenate([hi, np.full(pad, SENT, np.uint32)])
        lo = np.concatenate([lo, np.full(pad, SENT, np.uint32)])
        if cnt is not None:
            cnt = np.concatenate([cnt, np.zeros(pad, np.uint32)])
    args = [jnp.asarray(hi), jnp.asarray(lo)]
    if cnt is not None:
        args.append(jnp.asarray(cnt))
    o_hi, o_lo, o_cnt, nu = pallas_rle.rle_compact(*args, interpret=True)
    nu = int(nu)
    got_k = (np.asarray(o_hi[:nu]).astype(np.uint64) << np.uint64(32)) | np.asarray(
        o_lo[:nu]
    ).astype(np.uint64)
    return got_k, np.asarray(o_cnt[:nu]), nu, (np.asarray(o_hi), np.asarray(o_cnt))


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n", [1, 7, 1023, 1024, 1025, 5000])
def test_unit_matches_numpy(seed, n):
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.integers(0, max(n // 2, 2), n).astype(np.uint64))
    got_k, got_c, nu, (full_hi, full_c) = _run(keys, pad=int(rng.integers(0, 300)))
    uq, cn = np.unique(keys, return_counts=True)
    assert nu == uq.shape[0]
    assert np.array_equal(got_k, uq)
    assert np.array_equal(got_c, cn.astype(np.uint32))
    # tail contract: sentinel keys, zero counts
    assert np.all(full_hi[nu:] == SENT)
    assert np.all(full_c[nu:] == 0)


@pytest.mark.parametrize("seed", range(3))
def test_weighted_matches_numpy(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 4000))
    keys = np.sort(rng.integers(0, max(n // 3, 2), n).astype(np.uint64))
    cnt = rng.integers(1, 1000, n).astype(np.uint32)
    got_k, got_c, nu, _ = _run(keys, cnt, pad=int(rng.integers(0, 2049)))
    uq = np.unique(keys)
    sums = np.zeros(uq.shape[0], np.uint64)
    np.add.at(sums, np.searchsorted(uq, keys), cnt)
    assert nu == uq.shape[0]
    assert np.array_equal(got_c.astype(np.uint64), sums)
    assert np.array_equal(got_k, uq)


def test_single_run_spanning_many_chunks():
    # one key repeated across 5+ chunks: carries must accumulate exactly
    n = 5 * 1024 + 17
    keys = np.full(n, 42, np.uint64)
    got_k, got_c, nu, _ = _run(keys)
    assert nu == 1 and got_k[0] == 42 and got_c[0] == n


def test_all_sentinels_and_empty():
    hi = np.full(2048, SENT, np.uint32)
    o = pallas_rle.rle_compact(jnp.asarray(hi), jnp.asarray(hi), interpret=True)
    assert int(o[3]) == 0
    z = jnp.zeros(0, jnp.uint32)
    o = pallas_rle.rle_compact(z, z, interpret=True)
    assert int(o[3]) == 0


def test_run_boundary_at_chunk_edge():
    # runs ending exactly at chunk boundaries (1024-multiples)
    keys = np.concatenate(
        [
            np.full(1024, 1, np.uint64),
            np.full(1024, 2, np.uint64),
            np.full(100, 3, np.uint64),
        ]
    )
    got_k, got_c, nu, _ = _run(keys)
    assert nu == 3
    assert got_k.tolist() == [1, 2, 3]
    assert got_c.tolist() == [1024, 1024, 100]


def test_all_distinct():
    keys = np.arange(3000, dtype=np.uint64)
    got_k, got_c, nu, _ = _run(keys)
    assert nu == 3000
    assert np.array_equal(got_k, keys)
    assert np.all(got_c == 1)


def test_matches_merge_runs_presorted():
    from krust_tpu.ops.count import merge_runs_presorted

    rng = np.random.default_rng(7)
    n = 6000
    keys = np.sort(rng.integers(0, 2000, n).astype(np.uint64))
    hi, lo = _split(keys)
    hi = np.concatenate([hi, np.full(200, SENT, np.uint32)])
    lo = np.concatenate([lo, np.full(200, SENT, np.uint32)])
    w = np.ones(hi.shape[0], np.uint32)
    w[n:] = 0
    m_hi, m_lo, m_cnt, m_n = merge_runs_presorted(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(w)
    )
    k_hi, k_lo, k_cnt, k_n = pallas_rle.rle_compact(
        jnp.asarray(hi), jnp.asarray(lo), interpret=True
    )
    assert int(m_n) == int(k_n)
    nu = int(m_n)
    assert np.array_equal(np.asarray(m_hi[:nu]), np.asarray(k_hi[:nu]))
    assert np.array_equal(np.asarray(m_lo[:nu]), np.asarray(k_lo[:nu]))
    assert np.array_equal(np.asarray(m_cnt[:nu]), np.asarray(k_cnt[:nu]))


def _run_1key(lo32, cnt=None, pad=0):
    lo = np.asarray(lo32, np.uint32)
    if pad:
        lo = np.concatenate([lo, np.full(pad, SENT, np.uint32)])
        if cnt is not None:
            cnt = np.concatenate([cnt, np.zeros(pad, np.uint32)])
    args = [None, jnp.asarray(lo)]
    if cnt is not None:
        args.append(jnp.asarray(cnt))
    return pallas_rle.rle_compact(*args, interpret=True, one_key=True)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("n", [1, 7, 1023, 1025, 5000])
def test_one_key_matches_two_plane(seed, n):
    """one_key (k<=16 fast path, no hi plane) must equal the 2-plane kernel
    and numpy on lo-only keys, incl. sentinel tails and chunk carries."""
    rng = np.random.default_rng(seed + 50)
    lo = np.sort(rng.integers(0, max(n // 2, 2), n).astype(np.uint32))
    pad = int(rng.integers(0, 300))
    o_hi1, o_lo1, o_cnt1, nu1 = _run_1key(lo, pad=pad)

    hi2 = np.zeros(lo.shape[0] + pad, np.uint32)
    lo2 = np.concatenate([lo, np.full(pad, SENT, np.uint32)])
    hi2[lo.shape[0]:] = SENT
    o_hi2, o_lo2, o_cnt2, nu2 = pallas_rle.rle_compact(
        jnp.asarray(hi2), jnp.asarray(lo2), interpret=True
    )
    assert int(nu1) == int(nu2)
    assert np.array_equal(np.asarray(o_lo1), np.asarray(o_lo2))
    assert np.array_equal(np.asarray(o_cnt1), np.asarray(o_cnt2))
    assert np.array_equal(np.asarray(o_hi1), np.asarray(o_hi2))
    uq, cn = np.unique(lo, return_counts=True)
    nu = int(nu1)
    assert np.array_equal(np.asarray(o_lo1[:nu]), uq)
    assert np.array_equal(np.asarray(o_cnt1[:nu]), cn.astype(np.uint32))


def test_one_key_weighted():
    rng = np.random.default_rng(99)
    lo = np.sort(rng.integers(0, 40, 3000).astype(np.uint32))
    w = rng.integers(1, 9, 3000).astype(np.uint32)
    o_hi, o_lo, o_cnt, nu = _run_1key(lo, cnt=w, pad=111)
    nu = int(nu)
    uq = np.unique(lo)
    exp = np.array([w[lo == u].sum() for u in uq], np.uint32)
    assert nu == uq.shape[0]
    assert np.array_equal(np.asarray(o_lo[:nu]), uq)
    assert np.array_equal(np.asarray(o_cnt[:nu]), exp)
    assert (np.asarray(o_hi[:nu]) == 0).all()
    assert (np.asarray(o_hi[nu:]) == SENT).all()


def test_one_key_near_sentinel_codes():
    """Real codes adjacent to the sentinel (0xFFFFFFFE etc.) stay distinct
    from the padding — the k=16 collision-freedom contract at kernel level."""
    lo = np.sort(
        np.array([0, 1, 0xFFFFFFFE, 0xFFFFFFFE, 0xFFFFFFFD], np.uint32)
    )
    o_hi, o_lo, o_cnt, nu = _run_1key(lo, pad=200)
    nu = int(nu)
    assert nu == 4
    assert np.asarray(o_lo[:nu]).tolist() == [0, 1, 0xFFFFFFFD, 0xFFFFFFFE]
    assert np.asarray(o_cnt[:nu]).tolist() == [1, 1, 1, 2]
