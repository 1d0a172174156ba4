"""Fused Pallas codec: packed 2-bit bytes -> canonical k-mer codes, one kernel.

Round-5 fusion of the flat path's two device stages (VERDICT r4 weak #2):
``unpack_flat_blocks`` materialized a [rows, W + k - 1] uint8 block tensor in
HBM that ``encode_blocks_pallas`` immediately re-read — two full HBM round
trips over the all-windows volume. This kernel consumes the packed 2-bit
byte stream directly (0.25 B/base in, codes out), so the only HBM traffic is
the unavoidable 8x-smaller packed input and the (hi, lo) output.

Key idea — residue planes: position p = 4q + r of the base stream lives in
byte q at bit offset 2r. Processing the four residues r = 0..3 as separate
width-W/4 planes makes every pack/rc partial a *byte-aligned* shift/mask
over a 16-bit sliding byte-pair window:

    pack_m(4q + r) = (pair16[q] >> (16 - 2*(r + m))) & (4^m - 1)   (m <= 4)

and the pack-doubling combines stay plane-local whenever the segment
length m is a multiple of 4:

    pack_2m(4q + r) = pack_m(4q + r) << 2m | pack_m(4q + r + m)
                    = P_m[r][q]     << 2m | P_m[r][q + m/4]

(cross-plane hops — offset j + L with L not a multiple of 4 lands in
plane (r + L) % 4 at q + (r + L) // 4 — are all static slicing). The byte
atom starts the doubling at m = 4 for free (the byte IS pack_4), and
reverse complements derive arithmetically: complement of a packed field
is all-ones minus it, so rc_4 = field-reverse(0xFF - pack_4).

The 64-bit code is assembled as two INDEPENDENT <= 16-base plane packs —
fwd_hi = pack(first k-16 bases), fwd_lo = pack(last 16); rc_hi = rc(last
k-16), rc_lo = rc(first 16) — so every combine is a sub-32-bit uint32
shift/or with no cross-plane carry chains. (The first formulation carried
a (hi, lo) pair through the final combines; Mosaic miscompiled its pair
shifts for k >= 25 — compiled-vs-interpret divergence isolated on chip,
see benches/probe_fused_codec.py — and the independent-plane form is
both immune and cheaper.)

The kernel computes NO validity: garbage codes at invalid/padding positions
produce garbage (hi, lo) for windows the caller poisons afterwards from the
sparse invalid-position list (engines._count_flat_step does the window
dilation + covered mask + sentinel keying outside, on bool/where ops XLA
fuses). Dropping the per-window validity chain removes ~1/3 of the combine
work the unfused kernel paid.

Output layout is PLANE-SEPARATED: out[:, r * W/4 + q] is window 4q + r of
the row. Counting is order-insensitive (the epoch sort orders everything),
so no consumer ever needs the interleaved order back; tests compare against
the jnp oracle through :func:`plane_permute`.

Reference analog: the per-window scan of src/run.rs:526-563 + the 2-bit
LUT pack of src/kmer.rs:467-471, as one device pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

#: rows per kernel tile. uint8 inputs tile at 32 sublanes on TPU, so tiles
#: narrower than 32 rows waste vector-register occupancy; geometry is
#: env-tunable for probing (benches/probe_fused_tile.py).
TILE_ROWS = int(os.environ.get("KRUST_FUSED_TILE_ROWS", "8"))
_LANES = 128

#: halo bytes appended per row (covers k <= 32: the last window of a row
#: needs ceil((k + 2) / 4) + 1 <= 10 bytes past the row's W/4 main bytes)
HALO_BYTES = _LANES


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rc4(p4):
    """rc of a 4-base pack: complement (0xFF - x), reverse the 2-bit fields."""
    c = jnp.uint32(0xFF) - p4
    return (
        ((c & 3) << 6)
        | ((c & 0xC) << 2)
        | ((c >> 2) & 0xC)
        | (c >> 6)
    )


def _rc2(p2):
    c = jnp.uint32(0xF) - p2
    return ((c & 3) << 2) | (c >> 2)


def _bits_of(m: int) -> list[int]:
    """m (1..16) as powers of two, most significant first."""
    return [1 << i for i in range(m.bit_length() - 1, -1, -1) if m & (1 << i)]


def _compose_fwd(P, r: int, off: int, mbits: list[int], need_w: int):
    """Forward pack of segment [j + off, j + off + sum(mbits)) per window
    j = 4q + r, as one uint32 plane (sum(mbits) <= 16). All slices static."""
    acc = None
    L = 0
    for b in mbits:
        p = off + L  # absolute base offset of this sub-segment
        seg = P[b][(r + p) % 4][:, (r + p) // 4 :]
        if acc is None:
            acc = seg[:, :need_w]
        else:
            acc = (acc << (2 * b)) | seg[:, :need_w]
        L += b
    return acc


def _compose_rc(R, r: int, off: int, mbits: list[int], need_w: int):
    """Reverse-complement pack of the same segment: rc(concat(A, B)) =
    rc(B) << 2*len(A) | rc(A), so later sub-segments shift by the length
    already consumed. Single uint32 plane, shifts < 32."""
    acc = None
    L = 0
    for b in mbits:
        p = off + L
        seg = R[b][(r + p) % 4][:, (r + p) // 4 :][:, :need_w]
        acc = seg if acc is None else (seg << (2 * L)) | acc
        L += b
    return acc


def _fused_body(bts, k: int, w4: int):
    """Kernel math: int32 packed bytes [TB, W4H] -> (hi, lo) [TB, 4 * w4].

    ``bts`` rows hold W4H = w4 + HALO_BYTES byte values; output column
    r * w4 + q is window 4q + r (plane-separated order).
    """
    pair16 = ((bts[:, :-1] << 8) | bts[:, 1:]).astype(jnp.uint32)

    # the 64-bit code splits into two INDEPENDENT <= 16-base plane packs
    # (no cross-plane carries, all shifts < 32 — uint32 throughout):
    #   fwd_hi = pack(first k-16 bases), fwd_lo = pack(last 16 bases)
    #   rc_hi  = rc(last k-16 bases),    rc_lo  = rc(first 16 bases)
    if k <= 16:
        hi_bits, hi_off_f = [], 0
        lo_bits, lo_off_f = _bits_of(k), 0
        lo_off_r = 0
    else:
        hi_bits, hi_off_f = _bits_of(k - 16), 0
        lo_bits, lo_off_f = [16], k - 16
        lo_off_r = 0
    need = set(hi_bits) | set(lo_bits)
    top = max(need)
    if top > 4:
        need.add(4)  # doubling to 8/16 starts from the byte atom
        if top == 16:
            need.add(8)

    # base partials per plane from the byte-pair window (all widths W4H - 1)
    P: dict[int, list] = {}
    R: dict[int, list] = {}
    for mseg in (1, 2, 4):
        if mseg not in need:
            continue
        P[mseg] = []
        R[mseg] = []
        for r in range(4):
            shift = 16 - 2 * (r + mseg)
            mask = jnp.uint32((1 << (2 * mseg)) - 1)
            p = (pair16 >> shift) & mask
            P[mseg].append(p)
            if mseg == 1:
                R[mseg].append(jnp.uint32(3) - p)
            elif mseg == 2:
                R[mseg].append(_rc2(p))
            else:
                R[mseg].append(_rc4(p))

    # plane-local doubling for m = 8, 16
    for m in (4, 8):
        if 2 * m not in need:
            continue
        step = m // 4
        P[2 * m] = [
            (P[m][r][:, :-step] << (2 * m)) | P[m][r][:, step:]
            for r in range(4)
        ]
        R[2 * m] = [
            (R[m][r][:, step:] << (2 * m)) | R[m][r][:, :-step]
            for r in range(4)
        ]

    his, los = [], []
    for r in range(4):
        fwd_lo = _compose_fwd(P, r, lo_off_f, lo_bits, w4)
        rc_lo = _compose_rc(R, r, lo_off_r, lo_bits, w4)
        if hi_bits:
            fwd_hi = _compose_fwd(P, r, hi_off_f, hi_bits, w4)
            rc_hi = _compose_rc(R, r, 16, hi_bits, w4)
            use_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
            hi = jnp.where(use_rc, rc_hi, fwd_hi)
        else:
            use_rc = rc_lo < fwd_lo
            hi = jnp.zeros(fwd_lo.shape, jnp.uint32)
        lo = jnp.where(use_rc, rc_lo, fwd_lo)
        his.append(hi)
        los.append(lo)

    return jnp.concatenate(his, axis=1), jnp.concatenate(los, axis=1)


def _make_kernel(k: int, w4: int, with_mask: bool, emit_hi: bool):
    if with_mask and emit_hi:

        def kernel(main_ref, halo_ref, bad_ref, hi_ref, lo_ref):
            bts = jnp.concatenate(
                [main_ref[:, :], halo_ref[:, :]], axis=1
            ).astype(jnp.int32)
            hi, lo = _fused_body(bts, k, w4)
            bad = bad_ref[:, :] != 0
            sent = jnp.uint32(0xFFFFFFFF)
            hi_ref[:, :] = jnp.where(bad, sent, hi)
            lo_ref[:, :] = jnp.where(bad, sent, lo)

    elif with_mask:

        def kernel(main_ref, halo_ref, bad_ref, lo_ref):
            bts = jnp.concatenate(
                [main_ref[:, :], halo_ref[:, :]], axis=1
            ).astype(jnp.int32)
            _, lo = _fused_body(bts, k, w4)
            lo_ref[:, :] = jnp.where(
                bad_ref[:, :] != 0, jnp.uint32(0xFFFFFFFF), lo
            )

    elif emit_hi:

        def kernel(main_ref, halo_ref, hi_ref, lo_ref):
            bts = jnp.concatenate(
                [main_ref[:, :], halo_ref[:, :]], axis=1
            ).astype(jnp.int32)
            hi, lo = _fused_body(bts, k, w4)
            hi_ref[:, :] = hi
            lo_ref[:, :] = lo

    else:

        def kernel(main_ref, halo_ref, lo_ref):
            bts = jnp.concatenate(
                [main_ref[:, :], halo_ref[:, :]], axis=1
            ).astype(jnp.int32)
            _, lo = _fused_body(bts, k, w4)
            lo_ref[:, :] = lo

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret", "emit_hi"))
def encode_packed_pallas(
    main: jax.Array,
    halo: jax.Array,
    k: int,
    interpret: bool = False,
    bad: jax.Array | None = None,
    emit_hi: bool = True,
):
    """Packed bytes -> plane-separated canonical (hi, lo) codes.

    Args:
      main: [rows, W/4] uint8 — row i's packed bases (4/byte, first base in
        the high bits), covering stream positions [i*W, (i+1)*W).
      halo: [rows, HALO_BYTES] uint8 — the next HALO_BYTES packed bytes after
        each row's main span (row i's halo = main row i+1's head; the caller
        builds this view, see engines._count_flat_step).
      k: static k-mer length, 1..32.
      bad: optional [rows, W] uint8 bad-window mask in the SAME
        plane-separated order as the outputs; nonzero windows are written
        as the (SENT, SENT) pair directly by the kernel, saving the
        full-volume sentinel `where` pass outside.

    Returns:
      (hi, lo): uint32 [rows, W] in plane-separated order — column
      r * W/4 + q is the canonical code of window 4q + r. Without ``bad``
      no validity is applied; callers poison invalid/padding windows
      afterwards. With ``emit_hi=False`` (k <= 16, where hi is identically
      zero) only ``lo`` is returned — half the kernel's output HBM writes
      and no dead hi plane downstream.

    Geometry: W/4 must be a multiple of 128 lanes and rows a multiple of
    TILE_ROWS (engines gates the fused path on this; the default
    block_windows=4096 / row_multiple=8 always qualifies).
    """
    rows, w4 = main.shape
    assert w4 % _LANES == 0 and rows % TILE_ROWS == 0, (rows, w4)
    assert halo.shape == (rows, HALO_BYTES), halo.shape
    assert 1 <= k <= 32

    grid = (rows // TILE_ROWS,)
    main_spec = pl.BlockSpec(
        (TILE_ROWS, w4), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (TILE_ROWS, HALO_BYTES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (TILE_ROWS, 4 * w4), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    assert emit_hi or k <= 16, "emit_hi=False requires hi identically zero"
    plane = jax.ShapeDtypeStruct((rows, 4 * w4), jnp.uint32)
    out_shape = (plane, plane) if emit_hi else plane
    out_specs = (out_spec, out_spec) if emit_hi else out_spec
    in_specs = [main_spec, halo_spec]
    args = [main, halo]
    if bad is not None:
        assert bad.shape == (rows, 4 * w4), bad.shape
        in_specs.append(out_spec)
        args.append(bad)
    call = pl.pallas_call(
        _make_kernel(k, w4, bad is not None, emit_hi),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    return call(*args)


def plane_permute(x: jax.Array) -> jax.Array:
    """Window-order [rows, W] -> plane-separated order (test helper).

    out[:, r * W/4 + q] = x[:, 4q + r]; the permutation the fused kernel's
    output layout applies relative to ops.codec.encode_blocks.
    """
    rows, w = x.shape
    return x.reshape(rows, w // 4, 4).transpose(0, 2, 1).reshape(rows, w)
