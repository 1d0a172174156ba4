"""On-chip probe: k >= 24 epoch-sort routes (VERDICT r4 #6).

The k >= 25 regime pays the full (u32, u32) 2-key flat sort (measured 3.07
ns/elem at 128M). Candidate routes measured here against it, on
device-synthesized data (no tunnel transfer):

  A. MSD-partition-by-hi-byte: a 1-key u8 sort CARRYING (hi, lo) payloads
     is the distribution pass the route needs before per-bucket lo-only
     sorts. The candidate's total is >= partition + ~2.6 ns/elem of
     residual narrow sorts, so it pays only if the partition costs
     <= ~0.45 ns/elem. (Payload movement through a sort is what costs —
     the measured 1-key + ONE u32 payload row is already 2.87 ns/elem.)
  B. Narrow 3-operand decomposition (u16, u16, u32) = same 8 key bytes as
     the baseline: sort cost tracks operand BYTES, so this should measure
     ~equal (refutation of "more, narrower operands" as a win).
  C. (adopted in round 5, measured here in context) k=24 on the u16 hi
     operand via the pair-sentinel widening: _epoch_sort_rle(k=24) vs the
     k=25 (u32) path on identical volumes.

Run on a healthy tunnel: python benches/probe_k24plus.py
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

N = 1 << 27  # 134M


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
    t = min(ts)
    print(f"{label}: {t*1e3:.1f} ms = {t/N*1e9:.3f} ns/elem", flush=True)
    return t


@jax.jit
def _synth(key):
    k1, k2 = jax.random.split(key)
    hi = jax.random.bits(k1, (N,), jnp.uint32)
    lo = jax.random.bits(k2, (N,), jnp.uint32)
    return hi, lo


def main():
    from krust_tpu.ops.table import _epoch_sort_rle

    print(f"devices: {jax.devices()}  N={N>>20}M", flush=True)
    hi, lo = _synth(jax.random.PRNGKey(0))
    sync((hi, lo))

    # baseline: the k>=25 route. NOTE: the sort fns take the arrays as
    # ARGUMENTS — a zero-arg jit closing over 128M-element device arrays
    # embeds them as constants and XLA constant-folds the whole sort at
    # compile time (observed: the probe hangs in compilation).
    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    t_base = timed("2-key (u32,u32) flat sort", lambda: sort2(hi, lo))

    # A: the distribution pass alone (u8 key + 2 u32 payloads)
    hib = (hi >> 24).astype(jnp.uint8)
    sort1p2 = jax.jit(
        lambda b8, a, b: jax.lax.sort((b8, a, b), num_keys=1, is_stable=False)
    )
    t_part = timed(
        "A: 1-key u8 sort + (u32,u32) payloads (partition pass alone)",
        lambda: sort1p2(hib, hi, lo),
    )
    verdict_a = (
        "refuted" if t_part / N * 1e9 > (t_base / N * 1e9 - 2.4) else "viable?"
    )
    print(
        f"  -> A {verdict_a}: partition alone {t_part/N*1e9:.2f} ns/elem vs "
        f"{t_base/N*1e9 - 2.4:.2f} budget (baseline minus ~2.4 residual)",
        flush=True,
    )

    # B: same bytes, more operands
    hi16a = (hi >> 16).astype(jnp.uint16)
    hi16b = hi.astype(jnp.uint16)
    sort3 = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3, is_stable=False)
    )
    t_b = timed(
        "B: 3-key (u16,u16,u32) flat sort", lambda: sort3(hi16a, hi16b, lo)
    )
    print(
        f"  -> B {'refuted' if t_b >= 0.95 * t_base else 'viable?'}: "
        f"{t_b/t_base:.2f}x the baseline (bytes-track-cost prediction: ~1.0x)",
        flush=True,
    )

    # C: the adopted k=24-on-u16 route, in context (sort+RLE), vs k=25 (u32)
    hi24 = hi & jnp.uint32(0xFFFF)  # 16 significant hi bits (k=24)
    t_k25 = timed(
        "C: epoch sort+rle, k=25 (u32 hi)",
        lambda: _epoch_sort_rle(hi24, lo, 25, False),
    )
    t_k24 = timed(
        "C: epoch sort+rle, k=24 (u16 hi, pair-sentinel)",
        lambda: _epoch_sort_rle(hi24, lo, 24, False),
    )
    print(
        f"  -> C: k=24 narrowed route {t_k25/t_k24:.2f}x over its old u32 "
        "path (identical key volume)",
        flush=True,
    )


if __name__ == "__main__":
    main()
