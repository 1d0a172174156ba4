"""Device cost probes: the measurements that drive counting-core design.

Times the primitives the engine is built from (XLA sort at several operand
counts, the merge-path kernel, raw HBM copy bandwidth through a Pallas
kernel) so kernel-design decisions rest on measured numbers for THIS chip,
not datasheet guesses. Run on the TPU rig; prints one line per probe.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(r):
    """block_until_ready is a no-op on some remote backends (axon tunnel):
    force execution by pulling one element of every output buffer."""
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.ravel()[:1])


def bench(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 27  # 134M
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    b32 = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    c32 = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))

    copy = jax.jit(lambda x: x + jnp.uint32(1))
    t = bench(copy, a32)
    print(f"elementwise_u32 n={n}: {t*1e3:.1f} ms = {n*8/t/1e9:.0f} GB/s rw", flush=True)

    s1 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
    t = bench(s1, a32)
    print(f"sort_1op n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    s2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False))
    t = bench(s2, a32, b32)
    print(f"sort_2op n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    s3 = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2, is_stable=False))
    t = bench(s3, a32, b32, c32)
    print(f"sort_3op n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    # sort of 16-bit keys (does key width matter?)
    a16 = a32.astype(jnp.uint16)
    s16 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
    t = bench(s16, a16)
    print(f"sort_1op_u16 n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    # smaller sorts: per-element cost vs n (VMEM-resident sorts?)
    for m in (1 << 20, 1 << 22, 1 << 24):
        t = bench(s2, a32[:m], b32[:m])
        print(f"sort_2op n={m}: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)

    # cumsum (scan) cost
    cs = jax.jit(lambda x: jnp.cumsum(x, dtype=jnp.uint32))
    t = bench(cs, a32)
    print(f"cumsum n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    # merge_runs (the current compaction op)
    from krust_tpu.ops.count import merge_runs

    w32 = jnp.asarray(rng.integers(1, 5, n, np.uint32))
    mr = jax.jit(lambda h, l, w: merge_runs(h, l, w, 21))
    t = bench(mr, a32, b32, w32)
    print(f"merge_runs_k21 n={n}: {t*1e3:.1f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

    # XLA scatter-add into a 16M-bucket table (is scatter usable at all?)
    m = 1 << 22
    idx = jnp.asarray(rng.integers(0, 1 << 24, m, np.int32))
    tbl = jnp.zeros(1 << 24, jnp.uint32)
    sc = jax.jit(lambda t_, i: t_.at[i].add(jnp.uint32(1)))
    t = bench(sc, tbl, idx)
    print(f"scatter_add n={m} into 16M: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)

    # XLA gather from a 16M table
    ga = jax.jit(lambda t_, i: jnp.take(t_, i))
    t = bench(ga, tbl, idx)
    print(f"gather n={m} from 16M: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)

    # bincount-style segment sum via sorted ids (jnp.bincount lowering)
    bc = jax.jit(lambda i: jnp.bincount(i, length=1 << 24))
    t = bench(bc, idx)
    print(f"bincount n={m} len=16M: {t*1e3:.1f} ms = {t/m*1e9:.2f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
