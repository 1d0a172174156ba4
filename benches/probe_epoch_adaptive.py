"""On-chip crossover probe: one big epoch sort vs small epochs + merges.

The epoch sort costs ~log n per element (measured 0.095 ns/elem/stage), so
splitting an epoch into S slices saves ~0.095 * log2(S) ns/elem on the raw
volume but pays the weighted merge + recompaction chain on the COMPACTED
volume (~1.45 ns/elem per merge level). The trade is governed by the
duplication ratio r = distinct/windows: compacted parts are ~r * slice, and
parts covering the same underlying genome barely grow when merged, so the
merge chain processes ~2 * r * n elements per level.

Closed form: split into S slices pays when

    0.095 * log2(S) * n  >  ~1.45 * 2 * r * n * log2(S)   =>   r < ~0.033

i.e. only when a slice deduplicates ~30x or more. This probe measures the
real kernels (k=21 u16-narrowed sort + rle_compact + merge_sorted_kv) at
duplication factors {2, 16, 64} on device-synthesized data to anchor that
prediction; the engine's adaptive epoch sizing (ops/table.EpochTable)
gates on the measured crossover.

Data is synthesized ON DEVICE (no tunnel transfer): lo = mix(u32 % D) gives
exactly-D-distinct uniform keys; hi uniform over the k=21 hi space (2^10).
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

K = 21
N = 1 << 27  # 134M raw windows


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(label, fn, iters=2):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        sync(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


@jax.jit
def _synth(key, dup):
    """~N/dup distinct (hi, lo) pairs, uniformly duplicated ~dup times."""
    k1, k2 = jax.random.split(key)
    d = N // dup
    ids = jax.random.randint(k1, (N,), 0, d, jnp.uint32)
    # mix so equal ids stay equal but spread over the space (odd multiplier
    # is a bijection on u32)
    lo = ids * jnp.uint32(2654435761)
    hi = (ids * jnp.uint32(40503)) % jnp.uint32(1 << (2 * K - 32))
    del k2
    return hi, lo


def main():
    from krust_tpu.ops.table import _epoch_sort_rle, _merge_compact

    print(f"devices: {jax.devices()}  N={N>>20}M  k={K}", flush=True)
    key = jax.random.PRNGKey(0)

    for dup in (2, 16, 64):
        hi, lo = _synth(key, dup)
        sync((hi, lo))
        print(f"dup={dup} (distinct ~{N//dup>>20}M):", flush=True)

        t_big = timed(
            f"  1 x {N>>20}M sort+rle",
            lambda: _epoch_sort_rle(hi, lo, K, False),
        )

        for s in (2, 4):
            sl = N // s

            def small():
                parts = []
                for i in range(s):
                    o_hi, o_lo, o_cnt, n_dev = _epoch_sort_rle(
                        hi[i * sl : (i + 1) * sl],
                        lo[i * sl : (i + 1) * sl],
                        K,
                        False,
                    )
                    # slice to the next pow2 >= distinct (mirrors the
                    # engine's _resolve_epoch keep logic; static here)
                    keep = 1 << int(np.ceil(np.log2(max(N // dup, 2))))
                    keep = min(keep, o_hi.shape[0])
                    parts.append((o_hi[:keep], o_lo[:keep], o_cnt[:keep]))
                while len(parts) > 1:
                    nxt = []
                    for i in range(0, len(parts) - 1, 2):
                        m_hi, m_lo, m_cnt, _ = _merge_compact(
                            parts[i], parts[i + 1], False
                        )
                        keep = min(
                            parts[i][0].shape[0] * 2, m_hi.shape[0]
                        )
                        nxt.append((m_hi[:keep], m_lo[:keep], m_cnt[:keep]))
                    if len(parts) % 2:
                        nxt.append(parts[-1])
                    parts = nxt
                return parts[0]

            t_s = timed(f"  {s} x {sl>>20}M sort+rle + merge tree", small)
            print(
                f"    -> vs big: {t_big/t_s:.2f}x "
                f"({'small wins' if t_s < t_big else 'big wins'})",
                flush=True,
            )


if __name__ == "__main__":
    main()
