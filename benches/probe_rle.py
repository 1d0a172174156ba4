"""Device probe: rle_compact correctness + throughput at scale on TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from krust_tpu.ops.pallas_rle import rle_compact, SENT


def force(r):
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.ravel()[:1])


def main():
    rng = np.random.default_rng(0)

    # correctness at moderate scale on device
    n = 1 << 20
    keys = np.sort(rng.integers(0, n // 3, n).astype(np.uint64))
    hi = (keys >> 32).astype(np.uint32)
    lo = (keys & 0xFFFFFFFF).astype(np.uint32)
    pad = 4096
    hi_p = np.concatenate([hi, np.full(pad, SENT, np.uint32)])
    lo_p = np.concatenate([lo, np.full(pad, SENT, np.uint32)])
    o_hi, o_lo, o_cnt, nu = rle_compact(jnp.asarray(hi_p), jnp.asarray(lo_p))
    nu = int(nu)
    uq, cn = np.unique(keys, return_counts=True)
    got_k = (np.asarray(o_hi[:nu]).astype(np.uint64) << 32) | np.asarray(o_lo[:nu])
    assert nu == uq.shape[0], (nu, uq.shape[0])
    assert np.array_equal(got_k, uq), "keys mismatch"
    assert np.array_equal(np.asarray(o_cnt[:nu]), cn.astype(np.uint32)), "cnt"
    print("device correctness OK (1M, unit)", flush=True)

    w = rng.integers(1, 100, hi_p.shape[0]).astype(np.uint32)
    w[n:] = 0
    o_hi, o_lo, o_cnt, nu = rle_compact(
        jnp.asarray(hi_p), jnp.asarray(lo_p), jnp.asarray(w)
    )
    nu = int(nu)
    sums = np.zeros(uq.shape[0], np.uint64)
    np.add.at(sums, np.searchsorted(uq, keys), w[:n])
    assert nu == uq.shape[0]
    assert np.array_equal(np.asarray(o_cnt[:nu]).astype(np.uint64), sums)
    print("device correctness OK (1M, weighted)", flush=True)

    # throughput at 134M and 268M
    for nl in (27, 28):
        m = 1 << nl
        big = np.sort(rng.integers(0, m // 4, m).astype(np.uint64))
        bh = jnp.asarray((big >> 32).astype(np.uint32))
        bl = jnp.asarray((big & 0xFFFFFFFF).astype(np.uint32))
        r = rle_compact(bh, bl)
        force(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = rle_compact(bh, bl)
            force(r)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"rle_compact unit n={m}: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem "
            f"(n_unique={int(r[3])})",
            flush=True,
        )


if __name__ == "__main__":
    main()
