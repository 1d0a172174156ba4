"""Round-3 device probes (TPU v5e, tunneled rig).

Measures, with the round-2 probe methodology (chained jits to amortize the
~60 ms tunnel RTT, 1-element readback to force execution):

1. The r3 kernels — `rle_compact` with hierarchical scans + trimmed
   butterfly, `merge_sorted_kv` on the tight 2*CH network — against the
   recorded r2 costs (0.97 ns/elem @268M and ~1.1 ns/elem @134M).
2. The `lax.sort` variant matrix at 134M that bounds the epoch sort:
   2-key (current k>15 path), 1-key + payload unstable/stable (the
   two-pass LSD route is viable only if 2x stable-1-key < unstable-2-key),
   and native u64 (expected to lose: 64-bit lanes are emulated).

Output lines are `key: value` so the run can be committed as an artifact.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 4


def force(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def bench_chain(make_op, x, iters=2):
    @jax.jit
    def chained(x):
        for _ in range(CHAIN):
            x = make_op(x)
        return x

    t0 = time.perf_counter()
    r = chained(x)
    force(r)
    print(f"  (warm+compile {time.perf_counter() - t0:.1f}s)", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = chained(x)
        force(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) / CHAIN


def bench_once(fn, iters=3):
    r = fn()
    force(r)
    extra = jax.tree_util.tree_leaves(r)
    n_u = int(extra[3]) if len(extra) > 3 else -1
    del r, extra  # don't hold a full result set across timed re-runs (HBM)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        force(r)
        del r
        ts.append(time.perf_counter() - t0)
    return min(ts), n_u


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # --- r3 rle_compact at 268M (r2 recorded 0.97 ns/elem incl. overhead) ---
    from krust_tpu.ops.pallas_rle import SENT, rle_compact

    m = 1 << 28
    big = np.sort(rng.integers(0, m // 4, m).astype(np.uint64))
    bh = jnp.asarray((big >> 32).astype(np.uint32))
    bl = jnp.asarray((big & 0xFFFFFFFF).astype(np.uint32))
    del big
    t, n_u = bench_once(lambda: rle_compact(bh, bl))
    print(f"rle_compact_unit_268M: {t/m*1e9:.3f} ns/elem ({t*1e3:.0f} ms, "
          f"n_unique={n_u})", flush=True)
    # weighted at 134M (weights + 4 outputs at 268M tip HBM over the edge)
    mh = m // 2
    bh_s, bl_s = bh[:mh], bl[:mh]
    del bh, bl
    w = jnp.asarray(rng.integers(1, 100, mh).astype(np.uint32))
    t, _ = bench_once(lambda: rle_compact(bh_s, bl_s, w))
    print(f"rle_compact_weighted_134M: {t/mh*1e9:.3f} ns/elem ({t*1e3:.0f} ms)",
          flush=True)
    del bh_s, bl_s, w

    # --- r3 merge_sorted_kv at 2x67M (r2 recorded ~1.1 ns/elem) ---
    from krust_tpu.ops.pallas_merge import merge_sorted_kv

    n = 1 << 27
    a = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    h1 = jnp.sort(a[: n // 2])
    l1 = b[: n // 2]
    h2 = jnp.sort(a[n // 2 :])
    l2 = b[n // 2 :]
    wc = jnp.ones(n // 2, jnp.uint32)

    def mk(args):
        h1, l1, h2, l2 = args
        o_h, o_l, o_c = merge_sorted_kv(h1, l1, wc, h2, l2, wc)
        return o_h[: n // 2], o_l[: n // 2], o_h[n // 2 :], o_l[n // 2 :]

    t = bench_chain(mk, (h1, l1, h2, l2))
    print(f"merge_sorted_kv_134M: {t/n*1e9:.3f} ns/elem ({t*1e3:.0f} ms)",
          flush=True)
    del h1, l1, h2, l2, wc

    # --- sort variant matrix at 134M ---
    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=2, is_stable=False), (a, b)
    )
    print(f"sort_2key_unstable_134M: {t/n*1e9:.3f} ns/elem", flush=True)

    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=1, is_stable=False), (a, b)
    )
    print(f"sort_1key_payload_unstable_134M: {t/n*1e9:.3f} ns/elem", flush=True)

    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=1, is_stable=True), (a, b)
    )
    print(f"sort_1key_payload_stable_134M: {t/n*1e9:.3f} ns/elem", flush=True)

    # BUG (kept for artifact continuity, see benches/probe_u64.py): without
    # jax_enable_x64 this asarray silently downcasts to uint32, so the line
    # below re-measures the 1-operand u32 sort, NOT u64. The real u64 sort
    # (probe_u64.py, x64 enabled) measures ~3.11 ns/elem incl pack/split —
    # indistinguishable from the 2-key u32 sort (3.07), so there is no u64
    # shortcut for the k>16 epoch sort on this chip.
    u64 = jnp.asarray(
        (np.asarray(a, np.uint64) << 32) | np.asarray(b, np.uint64)
    )
    t = bench_chain(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False)[0], u64)
    print(f"sort_u64_unstable_134M: {t/n*1e9:.3f} ns/elem (downcast: really 1-op u32)", flush=True)


if __name__ == "__main__":
    main()
