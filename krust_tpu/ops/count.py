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

import functools

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

    prev_differs = (
        (s_hi != jnp.roll(s_hi, 1))
        | (s_lo != jnp.roll(s_lo, 1))
        | (s_inv != jnp.roll(s_inv, 1))
    )
    is_start = prev_differs.at[0].set(True)
    is_end = jnp.roll(is_start, -1).at[n - 1].set(True)

    # segment sums without gathers: the weight-prefix just before each run's
    # start is nondecreasing across runs, so a masked cummax broadcasts it to
    # every position of its run (gathers cost ~2x a sort at scale on TPU)
    prefix = jnp.cumsum(s_w, dtype=jnp.uint32)
    prefix_before = jax.lax.cummax(jnp.where(is_start, prefix - s_w, 0))
    run_sum = prefix - prefix_before  # at an end position: run's total weight

    emit = is_end & (s_inv == 0)
    n_unique = jnp.sum(emit, dtype=jnp.int32)
    return _compact_emitted(emit, s_hi, s_lo, run_sum) + (n_unique,)


def _compact_emitted(emit, s_hi, s_lo, run_sum):
    """Move emitted entries to the front, KEY-SORTED (padding zeroed at the
    back) — one 3-key sort, cheaper than 3 scatters; key order is what lets
    the table's finalize pull reconstruct ``hi`` from a histogram."""
    pad_key = (~emit).astype(jnp.uint32)
    _, u_hi, u_lo, u_cnt = jax.lax.sort(
        (
            pad_key,
            jnp.where(emit, s_hi, 0),
            jnp.where(emit, s_lo, 0),
            jnp.where(emit, run_sum, 0),
        ),
        num_keys=3,
        is_stable=False,
    )
    return u_hi, u_lo, u_cnt


@jax.jit
def count_unique(hi: jax.Array, lo: jax.Array, valid: jax.Array):
    """Count occurrences of each distinct valid (hi, lo) key.

    Equivalent to :func:`merge_weighted` with unit weights, results compacted
    to the front (used where downstream needs ``entries[:n_unique]``, e.g.
    the hash-shard exchange).
    """
    ones = jnp.ones(hi.size, jnp.uint32)
    return merge_weighted(hi, lo, ones, valid)


@functools.partial(jax.jit, static_argnames=("k",))
def merge_runs(hi: jax.Array, lo: jax.Array, weight: jax.Array, k: int):
    """k-aware weighted merge with front compaction — the table-merge path.

    Semantics of :func:`merge_weighted` (entries with weight 0 are padding),
    but with the same k-dependent sort-operand savings as
    :func:`count_runs` and gather-free segment sums. Falls back to
    :func:`merge_weighted` for k == 32 where the sentinel is unsafe.
    """
    lo = lo.reshape(-1)
    weight = weight.reshape(-1).astype(jnp.uint32)
    n = lo.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z, jnp.int32(0)
    if k >= 32:
        return merge_weighted(hi, lo, weight, weight > 0)

    valid = weight > 0
    sentinel = jnp.uint32(0xFFFFFFFF)
    if k <= 16:
        key = jnp.where(valid, lo, sentinel)
        s_lo, s_w = jax.lax.sort((key, weight), num_keys=1)
        s_hi = jnp.zeros_like(s_lo)
        sorted_valid = s_lo != sentinel
        prev_differs = s_lo != jnp.roll(s_lo, 1)
        next_differs = s_lo != jnp.roll(s_lo, -1)
    else:
        hi = hi.reshape(-1)
        key_hi = jnp.where(valid, hi, sentinel)
        key_lo = jnp.where(valid, lo, sentinel)
        s_hi, s_lo, s_w = jax.lax.sort((key_hi, key_lo, weight), num_keys=2)
        sorted_valid = s_hi != sentinel
        prev_differs = (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
        next_differs = (s_hi != jnp.roll(s_hi, -1)) | (s_lo != jnp.roll(s_lo, -1))

    is_start = prev_differs.at[0].set(True)
    is_end = next_differs.at[n - 1].set(True)
    prefix = jnp.cumsum(s_w, dtype=jnp.uint32)
    prefix_before = jax.lax.cummax(jnp.where(is_start, prefix - s_w, 0))
    run_sum = prefix - prefix_before

    emit = is_end & sorted_valid
    n_unique = jnp.sum(emit, dtype=jnp.int32)

    # compaction with the pad flag FOLDED INTO the key (k < 32 keys never
    # reach the sentinel): one less sort operand than a separate pad key —
    # this sort is the single most expensive op in the merge
    if k <= 16:
        c_lo, c_cnt = jax.lax.sort(
            (
                jnp.where(emit, s_lo, sentinel),
                jnp.where(emit, run_sum, 0),
            ),
            num_keys=1,
            is_stable=False,
        )
        u_lo = jnp.where(c_cnt > 0, c_lo, 0)  # scrub sentinel padding
        return jnp.zeros_like(u_lo), u_lo, c_cnt, n_unique
    c_hi, c_lo, c_cnt = jax.lax.sort(
        (
            jnp.where(emit, s_hi, sentinel),
            jnp.where(emit, s_lo, 0),
            jnp.where(emit, run_sum, 0),
        ),
        num_keys=2,
        is_stable=False,
    )
    u_hi = jnp.where(c_cnt > 0, c_hi, 0)
    return u_hi, c_lo, c_cnt, n_unique


@jax.jit
def merge_runs_presorted(hi: jax.Array, lo: jax.Array, weight: jax.Array):
    """:func:`merge_runs` for an ALREADY key-sorted stream — skips the main
    sort (the expensive half), leaving run-length counting + compaction.

    Input: (hi, lo) keys ascending with invalid/padding marked by the
    (0xFFFFFFFF, 0xFFFFFFFF) sentinel PAIR at the back — safe for every k
    in 1..=32 (the all-ones key's reverse complement is 0, so it is never
    canonical). Output padding keeps the sentinel keys (so results feed
    further sorted merges directly), unlike merge_runs's zero-scrubbed pads.
    """
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    weight = weight.reshape(-1).astype(jnp.uint32)
    n = hi.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z, jnp.int32(0)
    sentinel = jnp.uint32(0xFFFFFFFF)
    sorted_valid = ~((hi == sentinel) & (lo == sentinel))
    prev_differs = (hi != jnp.roll(hi, 1)) | (lo != jnp.roll(lo, 1))
    next_differs = (hi != jnp.roll(hi, -1)) | (lo != jnp.roll(lo, -1))
    is_start = prev_differs.at[0].set(True)
    is_end = next_differs.at[n - 1].set(True)
    prefix = jnp.cumsum(weight, dtype=jnp.uint32)
    prefix_before = jax.lax.cummax(jnp.where(is_start, prefix - weight, 0))
    run_sum = prefix - prefix_before
    emit = is_end & sorted_valid & (run_sum > 0)
    n_unique = jnp.sum(emit, dtype=jnp.int32)
    c_hi, c_lo, c_cnt = jax.lax.sort(
        (
            jnp.where(emit, hi, sentinel),
            jnp.where(emit, lo, sentinel),
            jnp.where(emit, run_sum, 0),
        ),
        num_keys=2,
        is_stable=False,
    )
    return c_hi, c_lo, c_cnt, n_unique


@functools.partial(jax.jit, static_argnames=("k",))
def count_runs(hi: jax.Array, lo: jax.Array, valid: jax.Array, k: int):
    """Per-batch counting without compaction — the hot path.

    Returns (s_hi, s_lo, cnt) of the input's total length: keys sorted
    ascending with each run's total count at its last position and zeros
    elsewhere (zero-count entries are padding for downstream merges). Skips
    the compaction scatters of :func:`count_unique` and sorts the minimum
    number of operands for the given k:

    - k <= 16: codes fit 32 bits with hi identically zero, and 0xFFFFFFFF is
      a safe invalid sentinel even at k == 16 — the all-T k-mer is never
      canonical (its reverse complement is all-A == 0) — so one sort operand
      suffices;
    - k <= 31: hi <= 4^(k-16)-1 < 0xFFFFFFFF, so the sentinel pair is safe
      with two operands;
    - k == 32: T^32 == all-ones, sentinel unsafe; carry an invalid flag key.
    """
    lo = lo.reshape(-1)
    valid = valid.reshape(-1).astype(jnp.bool_)
    n = lo.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z

    sentinel = jnp.uint32(0xFFFFFFFF)
    if k <= 16:
        key = jnp.where(valid, lo, sentinel)
        (s_lo,) = jax.lax.sort((key,), num_keys=1)
        s_hi = jnp.zeros_like(s_lo)
        sorted_valid = s_lo != sentinel
        prev_differs = s_lo != jnp.roll(s_lo, 1)
        next_differs = s_lo != jnp.roll(s_lo, -1)
    elif k <= 31:
        hi = hi.reshape(-1)
        key_hi = jnp.where(valid, hi, sentinel)
        key_lo = jnp.where(valid, lo, sentinel)
        s_hi, s_lo = jax.lax.sort((key_hi, key_lo), num_keys=2)
        sorted_valid = s_hi != sentinel
        prev_differs = (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
        next_differs = (s_hi != jnp.roll(s_hi, -1)) | (s_lo != jnp.roll(s_lo, -1))
    else:
        hi = hi.reshape(-1)
        inv = (~valid).astype(jnp.uint32)
        s_inv, s_hi, s_lo = jax.lax.sort((inv, hi, lo), num_keys=3)
        sorted_valid = s_inv == 0
        prev_differs = (
            (s_hi != jnp.roll(s_hi, 1))
            | (s_lo != jnp.roll(s_lo, 1))
            | (s_inv != jnp.roll(s_inv, 1))
        )
        next_differs = (
            (s_hi != jnp.roll(s_hi, -1))
            | (s_lo != jnp.roll(s_lo, -1))
            | (s_inv != jnp.roll(s_inv, -1))
        )

    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = prev_differs.at[0].set(True)
    is_end = next_differs.at[n - 1].set(True)
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    cnt = jnp.where(
        is_end & sorted_valid, (pos - run_start + 1).astype(jnp.uint32), 0
    )
    # scrub sentinel keys so padding entries are (0, 0, 0)
    s_hi = jnp.where(cnt > 0, s_hi, 0)
    s_lo = jnp.where(cnt > 0, s_lo, 0)
    return s_hi, s_lo, cnt
