"""Fused run-length + stream-compaction Pallas kernel.

The counting core's missing half (round-1 VERDICT #1/#2): turns a KEY-SORTED
(hi, lo[, cnt]) stream with (SENT, SENT) sentinel padding into the compacted
distinct table — (key, summed count) pairs packed to the front — in a single
O(n) pass, replacing `merge_runs`' two full XLA sorts (measured 12 ns/elem at
134M on v5e) with ~0.3-0.6 ns/elem of VPU work.

Pipeline per chunk (sequential grid; all cross-chunk state lives in scratch,
which persists across TPU grid steps):

1. **Windowed DMA with lookahead.** Each chunk loads CH elements plus one
   128-lane lookahead row, so every element's "next differs?" flag is local
   — runs never need a completion fix-up from the following chunk.
2. **Run-length via scans.** Run starts/ends from neighbor compares; per-run
   count = position arithmetic (unit weights) or a Hillis-Steele cumsum plus
   the cummax trick from ops/count.py (weighted). A run crossing the chunk
   boundary carries (key, partial sum) forward in SMEM and merges into the
   next chunk's first run.
3. **Butterfly stream compaction.** Emitted entries (run ends, non-sentinel)
   move to the chunk front through log2(W) conditional-roll stages routed by
   each element's displacement ``i - rank_i`` — the inverse-butterfly
   compress routing (conflict-free for the monotone displacements compaction
   produces; same network hardware PEXT uses).
4. **Dynamic-offset emission.** The compacted block shifts by the running
   output offset mod 128 (7 conditional rolls), blends with the carried
   partial output row, and DMAs to the output at the 128-aligned row of the
   running offset. Trailing garbage is overwritten by later chunks and
   masked past ``n`` by the wrapper.

Reference analog: the drain side of the dashmap engine
(reference: src/run.rs:573-583); the design is TPU-native, no counterpart.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = 0xFFFFFFFF
L = 128

#: elements per grid chunk; multiple of 1024, VMEM use ~ 14 * CH bytes
CH = int(os.environ.get("KRUST_RLE_CHUNK", 16384))
assert CH % (8 * L) == 0
ROWS = CH // L
#: window rows: chunk + 8 lookahead rows (sublane-tiling needs multiples of
#: 8; only the first lookahead element is semantically used)
WROWS = ROWS + 8
WN = WROWS * L  # scan/compress width


def _iota():
    row = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
    return row * L + lane


def _flat_roll(x, shift):
    """Roll [WROWS, L] as if flattened row-major by static ``shift``
    (same construction as ops/pallas_merge._flat_roll)."""
    if shift == 0:
        return x
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)

    def rrow(v, q):
        return jnp.roll(v, q, axis=0) if q % WROWS else v

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


def _from_below(x, s, idx, fill):
    """x shifted s positions toward higher index, ``fill`` entering."""
    return jnp.where(idx >= s, _flat_roll(x, s), fill)


def _from_above(x, s, idx, fill):
    """x shifted s positions toward lower index, ``fill`` entering."""
    return jnp.where(idx < WN - s, _flat_roll(x, -s), fill)


def _hier_scan(x, combine):
    """Inclusive scan over the flat row-major order, hierarchically: a
    7-step within-row (lane) Hillis-Steele, then a tiny scan over the
    [WROWS, 1] row aggregates, then one broadcast combine. ~2x cheaper than
    the flat ``_flat_roll`` ladder: the sub-128 strides cost one lane roll
    each instead of a two-roll blend, and the cross-row strides collapse to
    a 1-lane column scan. The combine identity must be 0 (true for the
    non-negative sums/maxima this kernel scans).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
    s = 1
    while s < L:
        x = combine(x, jnp.where(lane >= s, jnp.roll(x, s, axis=1), 0))
        s *= 2
    agg = x[:, L - 1 : L]  # inclusive per-row aggregate, [WROWS, 1]
    row = jax.lax.broadcasted_iota(jnp.int32, (WROWS, 1), 0)
    s = 1
    while s < WROWS:
        agg = combine(agg, jnp.where(row >= s, jnp.roll(agg, s, axis=0), 0))
        s *= 2
    # exclusive row prefix: shift the inclusive scan down one row
    excl = jnp.where(row >= 1, jnp.roll(agg, 1, axis=0), 0)
    return combine(x, excl)


def _cumsum_i32(x, idx):
    del idx
    return _hier_scan(x, jnp.add)


def _cummax_i32(x, idx):
    del idx
    return _hier_scan(x, jnp.maximum)


def _compress(arrs, emit, idx):
    """Pack entries where ``emit`` to the front (inverse-butterfly routing).

    Returns (packed arrays, n_emit). Surviving entries keep their relative
    order; slots >= n_emit hold stale garbage.
    """
    e32 = emit.astype(jnp.int32)
    rank = _cumsum_i32(e32, idx) - e32  # exclusive rank among emits
    d = jnp.where(emit, idx - rank, 0)
    outs = list(arrs)
    # Strides stop at CH: emits only occur at idx < CH, so displacements
    # are < CH and the top WN-stride stage of the full ladder is dead.
    b = 1
    while b < CH:
        # masks stay int32 (0/1): rolling i1 vectors does not lower on Mosaic
        move = jnp.where((d & b) != 0, 1, 0)
        mv_dst = _from_above(move, b, idx, 0)
        take = mv_dst != 0
        outs = [
            jnp.where(take, _from_above(o, b, idx, o.dtype.type(0)), o)
            for o in outs
        ]
        # a slot that moved out and took nothing goes dead: clearing its
        # displacement (instead of tracking a separate `alive` operand)
        # guarantees it never routes again
        d = jnp.where(take, _from_above(d, b, idx, 0) - b,
                      jnp.where(move != 0, 0, d))
        b *= 2
    n_emit = jnp.sum(e32)
    return outs, n_emit


def _dyn_shift_up(x, t):
    """Roll [WROWS, L] flat by a TRACED t in [0, 128) (7 conditional rolls)."""
    b = 1
    while b < L:
        x = jnp.where((t & b) != 0, _flat_roll(x, b), x)
        b *= 2
    return x


def _rle_kernel(unit, one_key, *refs):
    """RLE/compaction kernel body.

    ``one_key``: k <= 16 — the hi plane is identically zero for real codes
    and SENT for sentinels, i.e. fully determined by lo, so it is neither
    read, routed, nor written (the wrapper synthesizes output hi from lo);
    saves one input DMA plane, one output plane, and a third of the
    compare/route work on the all-windows epoch-flush volume.
    """
    if one_key:
        hi_ref = None
        if unit:
            (lo_ref, olo_ref, ocnt_ref, n_ref,
             st_lo, st_cnt, carry_row, state_u, state_i, sems) = refs
            cnt_ref = None
        else:
            (lo_ref, cnt_ref, olo_ref, ocnt_ref, n_ref,
             st_lo, st_cnt, carry_row, state_u, state_i, sems) = refs
        st_hi = ohi_ref = None
    elif unit:
        (hi_ref, lo_ref, ohi_ref, olo_ref, ocnt_ref, n_ref,
         st_hi, st_lo, st_cnt, carry_row, state_u, state_i, sems) = refs
        cnt_ref = None
    else:
        (hi_ref, lo_ref, cnt_ref, ohi_ref, olo_ref, ocnt_ref, n_ref,
         st_hi, st_lo, st_cnt, carry_row, state_u, state_i, sems) = refs

    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        state_i[0] = 0  # output offset (elements)
        state_u[0] = jnp.uint32(0)  # carry count
        state_u[1] = jnp.uint32(SENT)  # carry hi
        state_u[2] = jnp.uint32(SENT)  # carry lo

    def run(whi, wlo, wcnt):
        idx = _iota()
        if one_key:
            sent = wlo == jnp.uint32(SENT)
        else:
            sent = (whi == jnp.uint32(SENT)) & (wlo == jnp.uint32(SENT))

        carry_cnt = state_u[0]
        carry_hi = state_u[1]
        carry_lo = state_u[2]

        p_lo = _from_below(wlo, 1, idx, jnp.uint32(0))
        n_lo = _from_above(wlo, 1, idx, jnp.uint32(SENT))
        if one_key:
            first_matches = wlo[0, 0] == carry_lo
            is_start = (wlo != p_lo) | (idx == 0)
            next_differs = wlo != n_lo
        else:
            p_hi = _from_below(whi, 1, idx, jnp.uint32(0))
            n_hi = _from_above(whi, 1, idx, jnp.uint32(SENT))
            first_matches = (whi[0, 0] == carry_hi) & (wlo[0, 0] == carry_lo)
            is_start = (whi != p_hi) | (wlo != p_lo) | (idx == 0)
            next_differs = (whi != n_hi) | (wlo != n_lo)

        if wcnt is None:
            run_start = _cummax_i32(jnp.where(is_start, idx, 0), idx)
            run_sum = (idx - run_start + 1).astype(jnp.uint32)
            run_sum = jnp.where(
                (run_start == 0) & first_matches, run_sum + carry_cnt, run_sum
            )
        else:
            w = wcnt
            w = jnp.where(
                (idx == 0) & first_matches, w + carry_cnt, w
            )
            prefix = _cumsum_i32(pltpu.bitcast(w, jnp.int32), idx)
            before = _cummax_i32(
                jnp.where(is_start, prefix - pltpu.bitcast(w, jnp.int32), 0), idx
            )
            run_sum = pltpu.bitcast(prefix - before, jnp.uint32)

        emit = (idx < CH) & next_differs & ~sent

        if one_key:
            (e_lo, e_cnt), n_emit = _compress((wlo, run_sum), emit, idx)
            staged = [(st_lo, e_lo, 1), (st_cnt, e_cnt, 2)]
            outs = [(st_lo, olo_ref), (st_cnt, ocnt_ref)]
        else:
            (e_hi, e_lo, e_cnt), n_emit = _compress(
                (whi, wlo, run_sum), emit, idx
            )
            staged = [(st_hi, e_hi, 0), (st_lo, e_lo, 1), (st_cnt, e_cnt, 2)]
            outs = [(st_hi, ohi_ref), (st_lo, olo_ref), (st_cnt, ocnt_ref)]

        # carry the chunk's trailing (possibly incomplete) run forward
        # (scalar compares on uint32 lanes: bool lanes can't be extracted)
        ll = wlo[ROWS - 1, L - 1]
        if one_key:
            last_is_sent = ll == jnp.uint32(SENT)
            last_continues = (ll == wlo[ROWS, 0]) & ~last_is_sent
        else:
            lh = whi[ROWS - 1, L - 1]
            last_is_sent = (lh == jnp.uint32(SENT)) & (ll == jnp.uint32(SENT))
            last_continues = (
                (lh == whi[ROWS, 0]) & (ll == wlo[ROWS, 0]) & ~last_is_sent
            )
        new_carry_cnt = jnp.where(
            last_continues, run_sum[ROWS - 1, L - 1], jnp.uint32(0)
        )
        state_u[0] = new_carry_cnt
        if not one_key:
            state_u[1] = whi[ROWS - 1, L - 1]
        state_u[2] = wlo[ROWS - 1, L - 1]

        # shift by offset % 128, blend the carried partial output row
        off = state_i[0]
        t = off % L
        lane = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (WROWS, L), 0)
        for ref, arr, cri in staged:
            shifted = _dyn_shift_up(arr, t)
            blend = (row == 0) & (lane < t)
            ref[:] = jnp.where(blend, carry_row[cri, :][None, :], shifted)

        o_row = off // L
        out_copies = [
            pltpu.make_async_copy(st, o.at[pl.ds(o_row, WROWS), :], sems.at[i])
            for i, (st, o) in enumerate(outs)
        ]
        for cp in out_copies:
            cp.start()

        new_off = off + n_emit
        state_i[0] = new_off
        # next chunk's partial row = staged row holding element new_off
        r_last = (t + n_emit) // L
        for st, _, cri in staged:
            carry_row[cri, :] = st[pl.ds(r_last, 1), :][0]
        for cp in out_copies:
            cp.wait()

        @pl.when(c == nc - 1)
        def _():
            n_ref[0] = new_off

    # window DMA: chunk rows + 1 lookahead row
    def body(whi_s, wlo_s, wcnt_s, dsem):
        r0 = c * ROWS
        copies = [
            pltpu.make_async_copy(
                lo_ref.at[pl.ds(r0, WROWS), :], wlo_s, dsem.at[1]
            ),
        ]
        if hi_ref is not None:
            copies.append(
                pltpu.make_async_copy(
                    hi_ref.at[pl.ds(r0, WROWS), :], whi_s, dsem.at[0]
                )
            )
        if cnt_ref is not None:
            copies.append(
                pltpu.make_async_copy(
                    cnt_ref.at[pl.ds(r0, WROWS), :], wcnt_s, dsem.at[2]
                )
            )
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        run(
            whi_s[:] if hi_ref is not None else None,
            wlo_s[:],
            None if cnt_ref is None else wcnt_s[:],
        )

    pl.run_scoped(
        body,
        # the hi window is allocated (keeps the scoped shapes static) but
        # never DMA'd or read in one_key mode
        pltpu.VMEM((WROWS, L), jnp.uint32),
        pltpu.VMEM((WROWS, L), jnp.uint32),
        pltpu.VMEM((WROWS, L), jnp.uint32),
        pltpu.SemaphoreType.DMA((3,)),
    )


def _pad_to_chunks(x, fill):
    n = x.shape[0]
    # >= 1 extra sentinel chunk plus the final chunk's 8 lookahead rows
    padded = (-(-max(n, 1) // CH)) * CH + CH + 8 * L
    return jnp.concatenate([x, jnp.full(padded - n, fill, x.dtype)]).reshape(
        -1, L
    )


@functools.partial(jax.jit, static_argnames=("interpret", "one_key"))
def rle_compact(hi, lo, cnt=None, interpret=False, one_key=False):
    """Distinct (key, count) table from a key-sorted sentinel-padded stream.

    Args:
      hi, lo: uint32 [n] key halves, sorted ascending as 64-bit (hi, lo)
        pairs with (SENT, SENT) sentinel padding anywhere at the back.
      cnt: optional uint32 weights (None = every entry counts 1).
      one_key: k <= 16 fast path — keys live entirely in ``lo`` (hi is
        identically zero for real codes; pass ``hi=None``). The hi plane
        is neither read nor written by the kernel; output hi is
        synthesized from lo. Saves ~8 bytes/elem of HBM traffic and a
        third of the compare/route work.

    Returns:
      (o_hi, o_lo, o_cnt, n_unique): distinct keys with summed counts
      compacted to the front, sentinel keys / zero counts past n_unique
      (same contract as ops/count.merge_runs_presorted, ~20x cheaper).
    """
    n = lo.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.uint32)
        return z, z, z, jnp.int32(0)
    ins = [] if one_key else [_pad_to_chunks(hi, SENT)]
    ins.append(_pad_to_chunks(lo, SENT))
    if cnt is not None:
        ins.append(_pad_to_chunks(cnt, 0))
    rows_padded = ins[0].shape[0]
    n_chunks = (rows_padded - 8) // ROWS  # trailing rows are lookahead-only

    out_rows = rows_padded + WROWS  # slack for the final chunk's full write
    shape = jax.ShapeDtypeStruct((out_rows, L), jnp.uint32)
    n_out_planes = 2 if one_key else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=(
            (pl.BlockSpec(memory_space=pl.ANY),) * n_out_planes
            + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        ),
        scratch_shapes=(
            [pltpu.VMEM((WROWS, L), jnp.uint32)] * n_out_planes  # staged outs
            + [
                pltpu.VMEM((8, L), jnp.uint32),  # carried partial rows
                pltpu.SMEM((8,), jnp.uint32),  # carry cnt / hi / lo
                pltpu.SMEM((8,), jnp.int32),  # output offset
                pltpu.SemaphoreType.DMA((3,)),
            ]
        ),
    )
    outs = pl.pallas_call(
        functools.partial(_rle_kernel, cnt is None, one_key),
        out_shape=(shape,) * n_out_planes
        + (jax.ShapeDtypeStruct((1,), jnp.int32),),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*ins)
    n_u = outs[-1][0]
    idx = jnp.arange(n, dtype=jnp.int32)
    keep = idx < n_u
    if one_key:
        o_lo, o_cnt = outs[0], outs[1]
        o_lo = jnp.where(keep, o_lo.reshape(-1)[:n], jnp.uint32(SENT))
        o_cnt = jnp.where(keep, o_cnt.reshape(-1)[:n], jnp.uint32(0))
        o_hi = jnp.where(keep, jnp.uint32(0), jnp.uint32(SENT))
        return o_hi, o_lo, o_cnt, n_u
    o_hi, o_lo, o_cnt = outs[0], outs[1], outs[2]
    o_hi = jnp.where(keep, o_hi.reshape(-1)[:n], jnp.uint32(SENT))
    o_lo = jnp.where(keep, o_lo.reshape(-1)[:n], jnp.uint32(SENT))
    o_cnt = jnp.where(keep, o_cnt.reshape(-1)[:n], jnp.uint32(0))
    return o_hi, o_lo, o_cnt, n_u
