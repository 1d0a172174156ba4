"""Round-2 device probes: batched-row sorts, RTT-amortized timings.

The tunnel adds ~60 ms of round-trip latency to every forced readback, so
every op here is CHAINED inside one jit (op applied CH times to its own
output) and timed once — per-op cost = elapsed / CH. Sorting is a
comparison network (data-independent time), so re-sorting sorted data times
identically to a cold sort.

Hypothesis under test: `lax.sort` over the last axis of a [R, C] array
(R independent row sorts) is far cheaper per element than one flat sort
when C fits VMEM — giving cheap sorted runs for a merge tree without any
custom kernel.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CH = 4


def bench_chain(make_op, x, iters=2):
    @jax.jit
    def chained(x):
        for _ in range(CH):
            x = make_op(x)
        return x

    r = chained(x)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])  # warm + force
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = chained(x)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts) / CH


def main():
    n = 1 << 27  # 134M
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))

    t = bench_chain(lambda x: x + jnp.uint32(1), a)
    print(f"elementwise n={n}: {t*1e3:.1f} ms = {n*8/t/1e9:.0f} GB/s rw", flush=True)

    t = bench_chain(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False)[0], a)
    print(f"flat sort_1op n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=2, is_stable=False), (a, b)
    )
    print(f"flat sort_2op n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    for rows_log in (7, 9, 11, 13, 15):
        rows = 1 << rows_log
        cols = n // rows
        a2 = a.reshape(rows, cols)
        b2 = b.reshape(rows, cols)
        t = bench_chain(
            lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False, dimension=1)[0],
            a2,
        )
        print(
            f"row sort_1op [{rows}, {cols}]: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem",
            flush=True,
        )
        t = bench_chain(
            lambda xy: jax.lax.sort(xy, num_keys=2, is_stable=False, dimension=1),
            (a2, b2),
        )
        print(
            f"row sort_2op [{rows}, {cols}]: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem",
            flush=True,
        )

    # direct-address counting: bincount/scatter-add into a 4^12 table at 67M
    m = 1 << 26
    idx = jnp.asarray(rng.integers(0, 1 << 24, m, np.int32))

    def sc(t_):
        return t_.at[idx].add(jnp.uint32(1))

    t = bench_chain(sc, jnp.zeros(1 << 24, jnp.uint32))
    print(f"scatter_add n={m} into 16M: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)

    def bc(x):
        return (x + jnp.bincount(idx, length=1 << 24).astype(jnp.uint32))

    t = bench_chain(bc, jnp.zeros(1 << 24, jnp.uint32))
    print(f"bincount n={m} len=16M: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)

    # merge-path kernel single level at 134M (values + keyed)
    sys.path.insert(0, "/root/repo")
    from krust_tpu.ops.pallas_merge import merge_sorted_kv

    h1 = jnp.sort(a[: n // 2])
    l1 = b[: n // 2]
    h2 = jnp.sort(a[n // 2 :])
    l2 = b[n // 2 :]
    w = jnp.ones(n // 2, jnp.uint32)

    def mk(args):
        h1, l1, h2, l2 = args
        o_h, o_l, o_c = merge_sorted_kv(h1, l1, w, h2, l2, w)
        # feed halves back so the chain has a dependency
        return o_h[: n // 2], o_l[: n // 2], o_h[n // 2 :], o_l[n // 2 :]

    t = bench_chain(mk, (h1, l1, h2, l2))
    print(f"merge_sorted_kv n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
