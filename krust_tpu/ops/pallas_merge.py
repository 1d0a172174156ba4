"""Merge-path Pallas kernel: merge two sorted uint32 arrays in O(n).

The building block for replacing the LSM table's O(n log^2 n) XLA re-sorts
with linear pairwise merges of presorted runs (ROADMAP.md step 1). Measured
on TPU v5e against a 1-operand `lax.sort` of the concatenation: 1.7x faster
at 2x16.8M elements, 2.7x at 2x64M (the gap grows with n).

How it works:

- **Merge path.** For every output chunk boundary d = c*OUT a vectorized
  bisection finds the split (i, d - i): the first i elements of `a` plus the
  first d - i of `b` are exactly the first d merged elements. Chunks are
  therefore independent: chunk c consumes a[i0:i1] and b[j0:j1] with
  (i1-i0) + (j1-j0) = OUT and emits merged[d : d+OUT].
- **Complementary alignment.** Mosaic DMAs need 128-lane-aligned offsets but
  splits are arbitrary. Because OUT is a multiple of 128, i0 + j0 = d = 0
  (mod 128): rounding window A down by off_a = i0 % 128 forces window B's
  offset off_b = (128 - off_a) % 128 to also be 128-aligned (after a
  128-zero front pad of b). The merged chunk then starts at flat slot
  off_a + off_b which is exactly 0 or 128 — row 0 or row 1 of the [rows,
  128] layout, a static two-way select instead of an unaligned dynamic
  slice.
- **Tight network.** The output chunk OUT = CH - 1024 is deliberately
  smaller than the power-of-two window CH, so each window (junk front +
  OUT useful elements <= CH) fits a pow2 network half exactly: the merge
  network is 2*CH wide for OUT outputs (~2.1x inflation), versus 4x when
  the window itself must be rounded up to the next power of two. OUT
  stays a multiple of 1024 so output blocks keep sublane counts that are
  multiples of 8 (odd sublane tiles crash Mosaic at runtime).
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = 0xFFFFFFFF
L = 128

#: Window (= network half) per grid program, power of two. Bigger windows
#: amortize DMA latency (the kernel is DMA-bound at small sizes): measured
#: 134M-element merges on v5e ran 168/124/91/74/68 ms at window = 4k/8k/
#: 16k/32k/64k (pre-r3 layout). 16384 is the default (comfortably inside
#: VMEM for the keyed variant); tests shrink it via KRUST_MERGE_CHUNK for
#: fast interpret-mode runs.
CH = int(os.environ.get("KRUST_MERGE_CHUNK", 16384))
if CH < 2048 or (CH & (CH - 1)) != 0:
    raise ValueError(
        f"KRUST_MERGE_CHUNK={CH}: since the 2*CH merge-network rework the "
        "value is the DMA window and must be a power of two >= 2048 "
        "(merged output per chunk is KRUST_MERGE_CHUNK - 1024); earlier "
        "releases accepted any multiple of 1024"
    )
OUT = CH - 8 * L  # merged elements emitted per chunk (multiple of 1024)
HALF = CH  # network half = the whole DMA window
N = 2 * HALF  # merge network size
R = N // L  # rows of the network layout


def _diagonal_splits(a, b, m, n_chunks):
    """Split i_c for each diagonal d = c*OUT: first i_c of a + (d - i_c) of b
    form the first d merged elements (vectorized bisection)."""
    d = jnp.arange(n_chunks + 1, dtype=jnp.int32) * OUT
    d = jnp.minimum(d, 2 * m)
    lo = jnp.maximum(0, d - m)
    hi = jnp.minimum(d, m)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        bi = d - mid - 1
        bj = jnp.where(bi >= 0, b[jnp.clip(bi, 0, m - 1)], 0)
        bj = jnp.where(bi < m, bj, jnp.uint32(SENT))
        am = jnp.where(mid < m, a[jnp.clip(mid, 0, m - 1)], jnp.uint32(SENT))
        # a value of 0 ties with the bi < 0 "-inf"; the sentinel must lose
        go_low = jnp.where(bi < 0, True, am > bj)
        # freeze once converged: SENT-vs-SENT ties could push lo past hi
        done = lo >= hi
        new_lo = jnp.where(go_low, lo, mid + 1)
        new_hi = jnp.where(go_low, mid, hi)
        return jnp.where(done, lo, new_lo), jnp.where(done, hi, new_hi)

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
    """Single-operand odd-even merge (the n_keys=1 case of the multi-operand
    network below)."""
    return _oddeven_merge_multi((x,), n_keys=1)[0]


def _oddeven_merge_multi(ops, n_keys):
    """Odd-even merge of operand tuple ``ops`` ([R, L] each, two sorted
    halves), ordered lexicographically by the first ``n_keys`` operands.

    All key operands must be int32 in an order-preserving encoding (unsigned
    values XOR-biased by the caller). Non-key operands are payload. The last
    key operand should make entries totally ordered (e.g. a position iota)
    so chunk boundaries cut ties deterministically.
    """
    n = R * L
    row_id = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    flat = row_id * L + lane_id

    def lt(u, v):  # u < v lexicographically on key operands
        r = None
        eq = None
        for i in range(n_keys):
            li = u[i] < v[i]
            if r is None:
                r, eq = li, u[i] == v[i]
            else:
                r = r | (eq & li)
                eq = eq & (u[i] == v[i])
        return r

    s = n // 2
    while s >= 1:
        if s == n // 2:
            is_low = flat < s
            is_high = flat >= s
        else:
            is_low = ((flat % (2 * s)) >= s) & (flat + s < n)
            is_high = (((flat - s) % (2 * s)) >= s) & (flat - s >= 0)
        fwd = tuple(_flat_roll(o, -s) for o in ops)  # value at i + s
        bwd = tuple(_flat_roll(o, s) for o in ops)  # value at i - s
        take_fwd = is_low & lt(fwd, ops)  # low slot: partner is smaller
        take_bwd = is_high & lt(ops, bwd)  # high slot: partner is larger
        ops = tuple(
            jnp.where(take_fwd, f, jnp.where(take_bwd, b, o))
            for o, f, b in zip(ops, fwd, bwd)
        )
        s //= 2
    return ops


WROWS = HALF // L  # window rows (the full network half is DMA'd)
OROWS = OUT // L  # output rows per chunk


def _merge_kernel(meta_ref, a_ref, b_ref, out_ref, sa, sb, sems):
    pa = meta_ref[0, 0, 0]  # window start ROW in a (128-aligned offsets / L)
    pb = meta_ref[0, 0, 1]
    ea = meta_ref[0, 0, 2]  # off_a + la: first masked flat slot of window a
    eb = meta_ref[0, 0, 3]
    r0 = meta_ref[0, 0, 4]  # off_a (0 -> chunk starts at row 0, else row 1)
    dma_a = pltpu.make_async_copy(
        a_ref.at[pl.ds(pa, WROWS), :], sa, sems.at[0]
    )
    dma_b = pltpu.make_async_copy(
        b_ref.at[pl.ds(pb, WROWS), :], sb, sems.at[1]
    )
    dma_a.start()
    dma_b.start()
    dma_a.wait()
    dma_b.wait()
    row_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
    idx = row_id * L + lane_id
    av = jnp.where(idx < ea, sa[:], jnp.uint32(SENT))
    bv = jnp.where(idx < eb, sb[:], jnp.uint32(SENT))
    x = jnp.concatenate([av, bv], axis=0)  # [R, L]
    # unsigned min/max (arith.minui) does not legalize on TPU: XOR-bias to
    # int32, compare signed, un-bias at the end (order-preserving bijection)
    xi = pltpu.bitcast(x ^ jnp.uint32(0x80000000), jnp.int32)
    mi = _oddeven_merge_2d(xi)
    merged = pltpu.bitcast(mi, jnp.uint32) ^ jnp.uint32(0x80000000)
    out_ref[:] = jnp.where(r0 == 0, merged[:OROWS], merged[1 : OROWS + 1])


def _chunk_meta(splits, total):
    """Per-chunk (pa_row, pb_row, end_a, end_b, off_a) from diagonal splits.

    The complementary-alignment bookkeeping shared by both kernels; see the
    module docstring. ``total`` is the merged length (len(a) + len(b)).
    """
    n_chunks = splits.shape[0] - 1
    i0 = splits[:-1]
    i1 = splits[1:]
    d = jnp.minimum(jnp.arange(n_chunks, dtype=jnp.int32) * OUT, total)
    d1 = jnp.minimum(d + OUT, total)
    j0 = d - i0
    j1 = d1 - i1
    off_a = i0 % L
    pa = i0 - off_a
    off_b = (L - off_a) % L
    pb = j0 + L - off_b  # 128-aligned because (i0 + j0) % 128 == 0
    # [n_chunks, 1, 5] so the SMEM block (1, 1, 5) satisfies the
    # last-two-dims rule
    return jnp.stack(
        [pa // L, pb // L, off_a + (i1 - i0), off_b + (j1 - j0), off_a], axis=1
    ).astype(jnp.int32)[:, None, :]


def _pad_a(x, fill):
    """Pad side-a input to row multiples + window slack, shaped [rows, L]."""
    pad = (-(x.shape[0] + HALF + L) % L) + HALF + L
    return jnp.concatenate([x, jnp.full(pad, fill, x.dtype)]).reshape(-1, L)


def _pad_b(x, fill, front):
    """Side-b input with the 128-element front pad enabling alignment."""
    pad = (-(x.shape[0] + L + HALF + L) % L) + HALF + L
    return jnp.concatenate(
        [jnp.full(L, front, x.dtype), x, jnp.full(pad, fill, x.dtype)]
    ).reshape(-1, L)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted(a, b, interpret=False):
    """Merge two equal-length sorted uint32 arrays (SENT = +inf padding ok)."""
    if a.shape != b.shape:
        raise ValueError(f"inputs must have equal shape, got {a.shape} vs {b.shape}")
    m = a.shape[0]
    if m == 0:
        return jnp.zeros(0, jnp.uint32)
    n_chunks = -(-2 * m // OUT)
    splits = _diagonal_splits(a, b, m, n_chunks).astype(jnp.int32)
    meta = _chunk_meta(splits, 2 * m)
    a_p = _pad_a(a, SENT)
    b_p = _pad_b(b, SENT, 0)
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
            (OROWS, L), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((WROWS, L), jnp.uint32),
            pltpu.VMEM((WROWS, L), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks * OROWS, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, a_p, b_p)
    return out.reshape(-1)[: 2 * m]


# --- keyed merge: 64-bit (hi, lo) keys with uint32 count payload -------------------


def _diagonal_splits_kv(ah, al, bh, bl, ma, mb, n_chunks):
    """64-bit lexicographic variant of :func:`_diagonal_splits` (a wins ties,
    matching the in-kernel position tiebreak where a-half positions sort
    first). Supports unequal input lengths ma / mb."""
    d = jnp.arange(n_chunks + 1, dtype=jnp.int32) * OUT
    d = jnp.minimum(d, ma + mb)
    lo = jnp.maximum(0, d - mb)
    hi = jnp.minimum(d, ma)

    def key_at(h, l, i, m):
        # i < 0 acts as -inf (0,0), i >= m as +inf (SENT,SENT)
        v = jnp.clip(i, 0, m - 1)
        kh = jnp.where(i >= m, jnp.uint32(SENT), jnp.where(i < 0, 0, h[v]))
        kl = jnp.where(i >= m, jnp.uint32(SENT), jnp.where(i < 0, 0, l[v]))
        return kh, kl

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        bi = d - mid - 1
        bjh, bjl = key_at(bh, bl, bi, mb)
        amh, aml = key_at(ah, al, mid, ma)
        gt = (amh > bjh) | ((amh == bjh) & (aml > bjl))
        # a real (0,0) key ties with the bi < 0 "-inf"; the sentinel loses
        gt = jnp.where(bi < 0, True, gt)
        # freeze once converged: SENT-vs-SENT ties could push lo past hi
        done = lo >= hi
        new_lo = jnp.where(gt, lo, mid + 1)
        new_hi = jnp.where(gt, mid, hi)
        return jnp.where(done, lo, new_lo), jnp.where(done, hi, new_hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _diagonal_splits_lv(al, bl, ma, mb, n_chunks):
    """Single-plane (lo-only key) variant of :func:`_diagonal_splits_kv`
    for k <= 16 merges, where hi is identically zero for real keys and the
    sentinel is the all-ones lo. Same a-wins-ties convention."""
    d = jnp.arange(n_chunks + 1, dtype=jnp.int32) * OUT
    d = jnp.minimum(d, ma + mb)
    lo = jnp.maximum(0, d - mb)
    hi = jnp.minimum(d, ma)

    def key_at(l, i, m):
        v = jnp.clip(i, 0, m - 1)
        return jnp.where(i >= m, jnp.uint32(SENT), jnp.where(i < 0, 0, l[v]))

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        bi = d - mid - 1
        bjl = key_at(bl, bi, mb)
        aml = key_at(al, mid, ma)
        gt = aml > bjl
        gt = jnp.where(bi < 0, True, gt)  # real 0 key beats the -inf stand-in
        done = lo >= hi
        new_lo = jnp.where(gt, lo, mid + 1)
        new_hi = jnp.where(gt, mid, hi)
        return jnp.where(done, lo, new_lo), jnp.where(done, hi, new_hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _merge_lv_kernel(
    meta_ref, al_ref, ac_ref, bl_ref, bc_ref,
    ol_ref, oc_ref, sl, sc, tl, tc, sems,
):
    """One-key (k <= 16) twin of :func:`_merge_kv_kernel`: no hi plane —
    2 DMA planes per side instead of 3 and a 3-operand merge network
    (lo, pos, cnt) instead of 4."""
    pa = meta_ref[0, 0, 0]
    pb = meta_ref[0, 0, 1]
    ea = meta_ref[0, 0, 2]
    eb = meta_ref[0, 0, 3]
    r0 = meta_ref[0, 0, 4]
    copies = [
        pltpu.make_async_copy(r.at[pl.ds(p, WROWS), :], s, sems.at[i])
        for i, (r, s, p) in enumerate(
            [
                (al_ref, sl, pa), (ac_ref, sc, pa),
                (bl_ref, tl, pb), (bc_ref, tc, pb),
            ]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    row_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
    idx = row_id * L + lane_id
    bias = jnp.uint32(0x80000000)

    def mask_half(l_s, c_s, end):
        good = idx < end
        l = pltpu.bitcast(
            jnp.where(good, l_s[:], jnp.uint32(SENT)) ^ bias, jnp.int32
        )
        c = jnp.where(good, c_s[:], jnp.uint32(0))
        return l, c

    a_l, a_c = mask_half(sl, sc, ea)
    b_l, b_c = mask_half(tl, tc, eb)
    xl = jnp.concatenate([a_l, b_l], axis=0)
    xc = pltpu.bitcast(jnp.concatenate([a_c, b_c], axis=0), jnp.int32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    xp = rr * L + ll  # position tiebreak (see _merge_kv_kernel)
    ml, mp, mc = _oddeven_merge_multi((xl, xp, xc), n_keys=2)
    del mp
    sel = r0 == 0

    def pick(v):
        return jnp.where(sel, v[:OROWS], v[1 : OROWS + 1])

    ol_ref[:] = pltpu.bitcast(pick(ml), jnp.uint32) ^ bias
    oc_ref[:] = pltpu.bitcast(pick(mc), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted_lv(al, ac, bl, bc, interpret=False):
    """Merge two key-sorted (lo, cnt) pairs — the k <= 16 fast path.

    Same contract as :func:`merge_sorted_kv` with the hi plane dropped:
    keys are single uint32 values (hi is identically zero for real k <= 16
    codes; SENT = 0xFFFFFFFF acts as +inf padding and never collides with
    a canonical code — the all-T k-mer's RC is all-A). Unequal input
    lengths allowed.
    """
    if al.shape != ac.shape or bl.shape != bc.shape:
        raise ValueError("per-side operands must have equal shapes")
    ma = al.shape[0]
    mb = bl.shape[0]
    total = ma + mb
    if total == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z
    if ma == 0 or mb == 0:
        return (bl, bc) if ma == 0 else (al, ac)
    n_chunks = -(-total // OUT)
    splits = _diagonal_splits_lv(al, bl, ma, mb, n_chunks).astype(jnp.int32)
    meta = _chunk_meta(splits, total)
    ins = (
        _pad_a(al, SENT), _pad_a(ac, 0),
        _pad_b(bl, SENT, 0), _pad_b(bc, 0, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, 5), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            pl.BlockSpec((OROWS, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        )
        * 2,
        scratch_shapes=[pltpu.VMEM((WROWS, L), jnp.uint32)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
    )
    shape = jax.ShapeDtypeStruct((n_chunks * OROWS, L), jnp.uint32)
    ol, oc = pl.pallas_call(
        _merge_lv_kernel,
        out_shape=(shape, shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, *ins)
    return ol.reshape(-1)[:total], oc.reshape(-1)[:total]


def _merge_kv_kernel(
    meta_ref, ah_ref, al_ref, ac_ref, bh_ref, bl_ref, bc_ref,
    oh_ref, ol_ref, oc_ref, sh, sl, sc, th, tl, tc, sems,
):
    pa = meta_ref[0, 0, 0]
    pb = meta_ref[0, 0, 1]
    ea = meta_ref[0, 0, 2]
    eb = meta_ref[0, 0, 3]
    r0 = meta_ref[0, 0, 4]
    copies = [
        pltpu.make_async_copy(r.at[pl.ds(p, WROWS), :], s, sems.at[i])
        for i, (r, s, p) in enumerate(
            [
                (ah_ref, sh, pa), (al_ref, sl, pa), (ac_ref, sc, pa),
                (bh_ref, th, pb), (bl_ref, tl, pb), (bc_ref, tc, pb),
            ]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    row_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
    idx = row_id * L + lane_id
    bias = jnp.uint32(0x80000000)

    def mask_half(h_s, l_s, c_s, end):
        good = idx < end
        h = pltpu.bitcast(jnp.where(good, h_s[:], jnp.uint32(SENT)) ^ bias, jnp.int32)
        l = pltpu.bitcast(jnp.where(good, l_s[:], jnp.uint32(SENT)) ^ bias, jnp.int32)
        c = jnp.where(good, c_s[:], jnp.uint32(0))
        return h, l, c

    a_h, a_l, a_c = mask_half(sh, sl, sc, ea)
    b_h, b_l, b_c = mask_half(th, tl, tc, eb)
    xh = jnp.concatenate([a_h, b_h], axis=0)
    xl = jnp.concatenate([a_l, b_l], axis=0)
    xc = pltpu.bitcast(jnp.concatenate([a_c, b_c], axis=0), jnp.int32)
    # position tiebreak: totally orders duplicate keys so every entry lands
    # in exactly one chunk (counts must be neither lost nor cloned across
    # chunk boundaries); matches the bisection's a-wins-ties convention
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    xp = rr * L + ll
    mh, ml, mp, mc = _oddeven_merge_multi((xh, xl, xp, xc), n_keys=3)
    del mp
    sel = r0 == 0

    def pick(v):
        return jnp.where(sel, v[:OROWS], v[1 : OROWS + 1])

    oh_ref[:] = pltpu.bitcast(pick(mh), jnp.uint32) ^ bias
    ol_ref[:] = pltpu.bitcast(pick(ml), jnp.uint32) ^ bias
    oc_ref[:] = pltpu.bitcast(pick(mc), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted_kv(ah, al, ac, bh, bl, bc, interpret=False):
    """Merge two equal-length key-sorted (hi, lo, cnt) triples.

    Keys are 64-bit (hi, lo) uint32 pairs sorted ascending within each
    input; (SENT, SENT) acts as +inf padding. Counts travel untouched; when
    both inputs contain the same key, all copies appear adjacently in the
    output (summing them is the caller's run-length pass). The two inputs
    may have different lengths.
    """
    if not (ah.shape == al.shape == ac.shape) or not (
        bh.shape == bl.shape == bc.shape
    ):
        raise ValueError("per-side operands must have equal shapes")
    ma = ah.shape[0]
    mb = bh.shape[0]
    total = ma + mb
    if total == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z
    if ma == 0 or mb == 0:
        side = (bh, bl, bc) if ma == 0 else (ah, al, ac)
        return side
    n_chunks = -(-total // OUT)
    splits = _diagonal_splits_kv(ah, al, bh, bl, ma, mb, n_chunks).astype(jnp.int32)
    meta = _chunk_meta(splits, total)
    ins = (
        _pad_a(ah, SENT), _pad_a(al, SENT), _pad_a(ac, 0),
        _pad_b(bh, SENT, 0), _pad_b(bl, SENT, 0), _pad_b(bc, 0, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, 5), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(
            pl.BlockSpec((OROWS, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        )
        * 3,
        scratch_shapes=[pltpu.VMEM((WROWS, L), jnp.uint32)] * 6
        + [pltpu.SemaphoreType.DMA((6,))],
    )
    shape = jax.ShapeDtypeStruct((n_chunks * OROWS, L), jnp.uint32)
    oh, ol, oc = pl.pallas_call(
        _merge_kv_kernel,
        out_shape=(shape, shape, shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, *ins)
    return (
        oh.reshape(-1)[:total],
        ol.reshape(-1)[:total],
        oc.reshape(-1)[:total],
    )
