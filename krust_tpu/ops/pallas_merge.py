"""Merge-path Pallas kernel: merge two sorted uint32 arrays in O(n).

The building block for replacing the LSM table's O(n log^2 n) XLA re-sorts
with linear pairwise merges of presorted runs (ROADMAP.md step 1). Measured
on TPU v5e against a 1-operand `lax.sort` of the concatenation: 1.7x faster
at 2x16.8M elements, 2.7x at 2x64M (the gap grows with n).

How it works:

- **Merge path.** For every output chunk boundary d = c*CH a vectorized
  bisection finds the split (i, d - i): the first i elements of `a` plus the
  first d - i of `b` are exactly the first d merged elements. Chunks are
  therefore independent: chunk c consumes a[i0:i1] and b[j0:j1] with
  (i1-i0) + (j1-j0) = CH and emits merged[d : d+CH].
- **Complementary alignment.** Mosaic DMAs need 128-lane-aligned offsets but
  splits are arbitrary. Because CH is a multiple of 128, i0 + j0 = d = 0
  (mod 128): rounding window A down by off_a = i0 % 128 forces window B's
  offset off_b = (128 - off_a) % 128 to also be 128-aligned (after a
  128-zero front pad of b). The merged chunk then starts at flat slot
  off_a + off_b which is exactly 0 or 128 — row 0 or row 1 of the [rows,
  128] layout, a static two-way select instead of an unaligned dynamic
  slice.
- **Batcher odd-even merge** of the two sorted windows entirely in VMEM:
  compare (i, i + n/2) for i < n/2, then for s = n/4..1 compare (i, i + s)
  where (i mod 2s) >= s — all exchanges are +-s flat rolls (two jnp.rolls
  and a select), no reversal (`rev` does not lower) and no gathers.
- **Unsigned order via signed min/max**: `arith.minui` does not legalize on
  TPU, so values are XOR-biased by 0x80000000 and compared as int32.

Reference analog: none — the reference merges via dashmap shard locks
(reference: src/run.rs:489-583); this is new TPU-native machinery.
"""



import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = 0xFFFFFFFF
L = 128
CH = 2048  # output chunk (16 rows; block shapes need rows % 8 == 0)
WIN = CH + L  # aligned DMA window per input (17 rows)
HALF = 4096  # network half (window padded with SENT)
N = 2 * HALF  # merge network size
R = N // L  # rows of the network layout (64)


def _diagonal_splits(a, b, m, n_chunks):
    """Split i_c for each diagonal d = c*CH: first i_c of a + (d - i_c) of b
    form the first d merged elements (vectorized bisection)."""
    d = jnp.arange(n_chunks + 1, dtype=jnp.int32) * CH
    d = jnp.minimum(d, 2 * m)
    lo = jnp.maximum(0, d - m)
    hi = jnp.minimum(d, m)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        bj = jnp.where(d - mid - 1 >= 0, b[jnp.clip(d - mid - 1, 0, m - 1)], 0)
        bj = jnp.where(d - mid - 1 < m, bj, jnp.uint32(SENT))
        am = jnp.where(mid < m, a[jnp.clip(mid, 0, m - 1)], jnp.uint32(SENT))
        go_low = am > bj
        return jnp.where(go_low, lo, mid + 1), jnp.where(go_low, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _flat_roll(x, shift):
    """Roll x [R, L] as if flattened row-major by static `shift`."""
    if shift == 0:
        return x
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    def rrow(v, q):
        return jnp.roll(v, q, axis=0) if q % R else v

    if shift > 0:
        q, t = divmod(shift, L)
        rl = jnp.roll(x, t, axis=1) if t else x
        if t == 0:
            return rrow(rl, q)
        return jnp.where(lane_id >= t, rrow(rl, q), rrow(rl, q + 1))
    q, t = divmod(-shift, L)
    rl = jnp.roll(x, -t, axis=1) if t else x
    if t == 0:
        return rrow(rl, -q)
    return jnp.where(lane_id < L - t, rrow(rl, -q), rrow(rl, -(q + 1)))


def _oddeven_merge_2d(x):
    """Ascending Batcher odd-even merge of x [R, L] (two sorted halves).

    Verified flattening: compare (i, i + n/2) for i < n/2, then for
    s = n/4..1 compare (i, i + s) where (i mod 2s) >= s and i + s < n.
    """
    n = R * L
    row_id = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    flat = row_id * L + lane_id
    s = n // 2
    while s >= 1:
        if s == n // 2:
            is_low = flat < s
            is_high = flat >= s
        else:
            is_low = ((flat % (2 * s)) >= s) & (flat + s < n)
            is_high = (((flat - s) % (2 * s)) >= s) & (flat - s >= 0)
        y_fwd = _flat_roll(x, -s)  # value at i + s
        y_bwd = _flat_roll(x, s)  # value at i - s
        x = jnp.where(
            is_low,
            jnp.minimum(x, y_fwd),
            jnp.where(is_high, jnp.maximum(x, y_bwd), x),
        )
        s //= 2
    return x


WROWS = WIN // L  # window rows (17)
HROWS = HALF // L  # half rows (32)


def _merge_kernel(meta_ref, a_ref, b_ref, out_ref, sa, sb, sems):
    pa = meta_ref[0, 0, 0]  # window start ROW in a (128-aligned offsets / L)
    pb = meta_ref[0, 0, 1]
    ea = meta_ref[0, 0, 2]  # off_a + la: first masked flat slot of window a
    eb = meta_ref[0, 0, 3]
    r0 = meta_ref[0, 0, 4]  # off_a (0 -> chunk starts at row 0, else row 1)
    dma_a = pltpu.make_async_copy(
        a_ref.at[pl.ds(pa, WROWS), :], sa.at[:WROWS], sems.at[0]
    )
    dma_b = pltpu.make_async_copy(
        b_ref.at[pl.ds(pb, WROWS), :], sb.at[:WROWS], sems.at[1]
    )
    dma_a.start()
    dma_b.start()
    dma_a.wait()
    dma_b.wait()
    row_id = jax.lax.broadcasted_iota(jnp.int32, (HROWS, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (HROWS, L), 1)
    idx = row_id * L + lane_id
    av = jnp.where(idx < ea, sa[:], jnp.uint32(SENT))
    bv = jnp.where(idx < eb, sb[:], jnp.uint32(SENT))
    x = jnp.concatenate([av, bv], axis=0)  # [R, L]
    # unsigned min/max (arith.minui) does not legalize on TPU: XOR-bias to
    # int32, compare signed, un-bias at the end (order-preserving bijection)
    xi = pltpu.bitcast(x ^ jnp.uint32(0x80000000), jnp.int32)
    mi = _oddeven_merge_2d(xi)
    merged = pltpu.bitcast(mi, jnp.uint32) ^ jnp.uint32(0x80000000)
    rows = CH // L
    out_ref[:] = jnp.where(r0 == 0, merged[:rows], merged[1 : rows + 1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted(a, b, interpret=False):
    """Merge two equal-length sorted uint32 arrays (SENT = +inf padding ok)."""
    m = a.shape[0]
    n_chunks = -(-2 * m // CH)
    splits = _diagonal_splits(a, b, m, n_chunks).astype(jnp.int32)
    i0 = splits[:-1]
    i1 = splits[1:]
    d = jnp.minimum(jnp.arange(n_chunks, dtype=jnp.int32) * CH, 2 * m)
    d1 = jnp.minimum(d + CH, 2 * m)
    j0 = d - i0
    j1 = d1 - i1
    off_a = i0 % L
    pa = i0 - off_a
    off_b = (L - off_a) % L
    pb = j0 + L - off_b  # 128-aligned because (i0 + j0) % 128 == 0
    meta = jnp.stack(
        [pa // L, pb // L, off_a + (i1 - i0), off_b + (j1 - j0), off_a], axis=1
    ).astype(jnp.int32)[:, None, :]  # [n_chunks, 1, 5] so the SMEM
    # block (1, 1, 5) satisfies the last-two-dims rule
    # pad to row multiples and shape [rows, L] (2-D end to end for Mosaic)
    a_pad = (-(len(a) + WIN + L) % L) + WIN + L
    a_p = jnp.concatenate([a, jnp.full(a_pad, SENT, jnp.uint32)]).reshape(-1, L)
    b_pad = (-(len(b) + L + WIN + L) % L) + WIN + L
    b_p = jnp.concatenate(
        [jnp.zeros(L, jnp.uint32), b, jnp.full(b_pad, SENT, jnp.uint32)]
    ).reshape(-1, L)
    rows = CH // L
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            # per-chunk metadata streams through SMEM one row at a time
            # (scalar-prefetch would need the whole table resident in SMEM,
            # which overflows beyond ~2k chunks)
            pl.BlockSpec((1, 1, 5), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (rows, L), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((HROWS, L), jnp.uint32),
            pltpu.VMEM((HROWS, L), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks * rows, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, a_p, b_p)
    return out.reshape(-1)[: 2 * m]
