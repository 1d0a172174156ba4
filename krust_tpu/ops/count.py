"""Device counting: sort-based unique+count with front compaction.

The TPU-native replacement for the reference's concurrent hash map
(reference: src/run.rs:489-583). A shared mutable dashmap has no good analog
under XLA's functional model; instead each batch of canonical codes is sorted
(`lax.sort` on the (hi, lo) uint32 pair), runs are length-encoded with
prefix-scan arithmetic, and the distinct (code, count) pairs are scattered to
the front of fixed-shape output buffers. Only ``n_unique`` leading entries are
meaningful, so the host (or the cross-chip merge) moves a fraction of the raw
window count.

Determinism: sorting is order-insensitive, so counts are bit-identical across
batch sizes and mesh shapes — the determinism-by-construction that replaces
the reference's data-race tooling (SURVEY.md §5).

Count dtype: uint32 per merge call. Per-batch window counts are < 2^32 by
construction; cross-batch totals are accumulated in uint64 on the host (or
chunked on device). Saturation at the u64 limit (reference: src/run.rs:569)
is unreachable in any physical input but preserved in the host accumulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def merge_weighted(hi: jax.Array, lo: jax.Array, weight: jax.Array, valid: jax.Array):
    """Sum weights per distinct (hi, lo) key, compacting results to the front.

    Args:
      hi, lo: uint32 arrays (any shape; flattened) forming 64-bit keys.
      weight: uint32 weights (counts) per entry.
      valid: bool; invalid entries are dropped.

    Returns:
      (u_hi, u_lo, u_cnt, n_unique): flat arrays of the input's total length
      with the distinct keys/counts in the first ``n_unique`` slots (the rest
      zero), plus the scalar count of distinct valid keys.
    """
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    weight = weight.reshape(-1).astype(jnp.uint32)
    invalid = (~valid.reshape(-1).astype(jnp.bool_)).astype(jnp.uint32)
    n = hi.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z, jnp.int32(0)

    s_inv, s_hi, s_lo, s_w = jax.lax.sort(
        (invalid, hi, lo, weight), num_keys=3, is_stable=False
    )

    pos = jnp.arange(n, dtype=jnp.int32)
    prev_differs = (
        (s_hi != jnp.roll(s_hi, 1))
        | (s_lo != jnp.roll(s_lo, 1))
        | (s_inv != jnp.roll(s_inv, 1))
    )
    is_start = prev_differs.at[0].set(True)
    is_end = jnp.roll(is_start, -1).at[n - 1].set(True)

    # index of the run start owning each position
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    prefix = jnp.cumsum(s_w, dtype=jnp.uint32)
    start_prefix = jnp.take(prefix, run_start) - jnp.take(s_w, run_start)
    run_sum = prefix - start_prefix  # at an end position: total weight of run

    emit = is_end & (s_inv == 0)
    dest = jnp.cumsum(emit.astype(jnp.int32)) - 1
    n_unique = dest[n - 1] + 1

    idx = jnp.where(emit, dest, n)  # out-of-range rows dropped
    u_hi = jnp.zeros(n, jnp.uint32).at[idx].set(s_hi, mode="drop")
    u_lo = jnp.zeros(n, jnp.uint32).at[idx].set(s_lo, mode="drop")
    u_cnt = jnp.zeros(n, jnp.uint32).at[idx].set(run_sum, mode="drop")
    return u_hi, u_lo, u_cnt, n_unique


@jax.jit
def count_unique(hi: jax.Array, lo: jax.Array, valid: jax.Array):
    """Count occurrences of each distinct valid (hi, lo) key.

    Equivalent to :func:`merge_weighted` with unit weights — the per-batch
    counting step.
    """
    ones = jnp.ones(hi.size, jnp.uint32)
    return merge_weighted(hi, lo, ones, valid)
