"""Pallas TPU kernel for the rolling canonical k-mer codec.

Fuses the whole per-window pipeline — base validation, forward/RC 2-bit
encode, canonical min, validity AND — into one VMEM-resident kernel, so block
rows make exactly one HBM->VMEM trip. The encode uses pack-doubling
(O(log k + popcount k) combines instead of k rolling steps — ~3x fewer VPU
ops at k=21, ~4x at k=32; see _codec_body) with no HBM intermediates.

Semantics identical to :func:`krust_tpu.ops.codec.encode_blocks` (the jnp
implementation is the oracle; tests/test_pallas.py asserts bit-equality).

Layout: rows tile by ``TILE_ROWS``; the last dim is padded to a multiple of
128 lanes with invalid codes (padding windows self-invalidate). All slices
use static offsets, which Mosaic lowers to lane shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8 rows x ~4K lanes keeps the unrolled loop's live set well under the 16MB
# VMEM scoped limit (32 rows OOMed at 23MB with W=4096, k=21)
TILE_ROWS = 8
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _codec_body(c, k: int, w: int):
    """Kernel math: int32 codes [TB, WKP] -> (hi, lo, valid) [TB, w].

    Doubling formulation (round 4): instead of k rolling steps, partial
    packs over segment lengths 1, 2, 4, ... 16 are built by combining
    pairs —

        pack_{2m}(j) = pack_m(j) * 4^m + pack_m(j + m)
        rc_{2m}(j)   = rc_m(j + m) * 4^m + rc_m(j)
        valid_{2m}(j) = valid_m(j) & valid_m(j + m)

    — then (round 5) the 64-bit code is assembled as two INDEPENDENT
    <= 16-base plane packs: fwd_hi = pack(first k-16 bases), fwd_lo =
    pack(last 16); rc_hi = rc(last k-16), rc_lo = rc(first 16). Every
    combine is a sub-32-bit uint32 shift/or. The round-4 formulation
    instead carried a (fwd_hi, fwd_lo) pair through the final combines;
    Mosaic MISCOMPILED its pair shifts for k in 25..31 (compiled-vs-
    interpret divergence, isolated on chip round 5 —
    `benches/probe_fused_codec.py` and /tmp-bisect logs; k=24 and 32
    were unaffected because they need at most one final pair combine).
    Same restructure as ops/pallas_fused.

    No quality branch: the engine folds quality filtering into invalid-base
    masks on the host (quality bytes never cross the link), so the kernel
    only ever sees base codes (advisor/VERDICT r1: dead branch removed).
    """
    good_full = c < 4
    b_full = jnp.where(good_full, c, 0).astype(jnp.uint32)
    comp_full = jnp.where(good_full, 3 - c, 0).astype(jnp.uint32)

    # power-of-two partials up to 16 bases, each width WKP - (m - 1);
    # lo-plane only (m <= 16 => 2m bits <= 32, shifts stay < 32)
    partials = {1: (b_full, comp_full, good_full)}
    m = 1
    while 2 * m <= min(k, 16):
        p, r, v = partials[m]
        width = p.shape[1] - m
        partials[2 * m] = (
            (p[:, :width] << (2 * m)) | p[:, m:],
            (r[:, m:] << (2 * m)) | r[:, :width],
            jnp.logical_and(v[:, :width], v[:, m:]),
        )
        m *= 2

    # independent-plane assembly (round 5): each of hi/lo (and their rcs)
    # is a <= 16-base pack composed from the power-of-two partials at the
    # right offsets — all sub-32-bit uint32 shifts, no pair carries.
    def bits_of(m):
        return [
            1 << i for i in range(m.bit_length() - 1, -1, -1) if m & (1 << i)
        ]

    def fwd_at(mbits, off):
        acc, L = None, 0
        for b in mbits:
            seg = partials[b][0][:, off + L : off + L + w]
            acc = seg if acc is None else (acc << (2 * b)) | seg
            L += b
        return acc

    def rc_at(mbits, off):
        # rc(concat(A, B)) = rc(B) << 2*len(A) | rc(A)
        acc, L = None, 0
        for b in mbits:
            seg = partials[b][1][:, off + L : off + L + w]
            acc = seg if acc is None else (seg << (2 * L)) | acc
            L += b
        return acc

    def valid_at(mbits, off):
        acc, L = None, 0
        for b in mbits:
            seg = partials[b][2][:, off + L : off + L + w]
            acc = seg if acc is None else jnp.logical_and(acc, seg)
            L += b
        return acc

    if k <= 16:
        kb = bits_of(k)
        fwd_lo = fwd_at(kb, 0)
        rc_lo = rc_at(kb, 0)
        valid = valid_at(kb, 0)
        use_rc = rc_lo < fwd_lo
        hi = jnp.zeros(fwd_lo.shape, jnp.uint32)
    else:
        hb = bits_of(k - 16)
        fwd_hi = fwd_at(hb, 0)  # pack(first k-16 bases)
        fwd_lo = fwd_at([16], k - 16)  # pack(last 16)
        rc_hi = rc_at(hb, 16)  # rc(last k-16)
        rc_lo = rc_at([16], 0)  # rc(first 16)
        valid = jnp.logical_and(valid_at(hb, 0), valid_at([16], k - 16))
        use_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
        hi = jnp.where(use_rc, rc_hi, fwd_hi)
    lo = jnp.where(use_rc, rc_lo, fwd_lo)
    return hi, lo, valid.astype(jnp.uint8)


def _make_kernel(k: int, w: int):
    def kernel(codes_ref, hi_ref, lo_ref, valid_ref):
        c = codes_ref[:, :].astype(jnp.int32)
        hi, lo, valid = _codec_body(c, k, w)
        hi_ref[:, :] = hi
        lo_ref[:, :] = lo
        valid_ref[:, :] = valid

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def encode_blocks_pallas(
    codes: jax.Array,
    k: int,
    qual: None = None,
    quality_threshold: None = None,
    interpret: bool = False,
):
    """Pallas-accelerated :func:`~krust_tpu.ops.codec.encode_blocks`.

    Same contract: codes [B, W + k - 1] uint8 -> (hi, lo, valid) [B, W].
    ``valid`` is returned as uint8 0/1 (count ops coerce to bool). Quality
    args are rejected: filtering folds into host-side masks by design.
    """
    if qual is not None or quality_threshold is not None:
        raise ValueError(
            "quality filtering folds into host-side masks; the kernel has "
            "no quality branch (use ops.codec.encode_blocks if needed)"
        )
    b, wk = codes.shape
    w = wk - (k - 1)

    rows = _round_up(max(b, 1), TILE_ROWS)
    # pad the window dim to full lanes, and the input so every static slice
    # j : j + wp (j < k) stays in bounds; padding windows self-invalidate
    wp = _round_up(max(w, 1), _LANES)
    wkp = _round_up(wp + k - 1, _LANES)
    pad_cfg = ((0, rows - b), (0, wkp - wk))
    codes_p = jnp.pad(codes, pad_cfg, constant_values=4)

    grid = (rows // TILE_ROWS,)
    in_block = pl.BlockSpec(
        (TILE_ROWS, wkp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (TILE_ROWS, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = (
        jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        jax.ShapeDtypeStruct((rows, wp), jnp.uint8),
    )
    kernel = _make_kernel(k, wp)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_block],
        out_specs=(out_block, out_block, out_block),
        out_shape=out_shape,
        interpret=interpret,
    )
    hi, lo, valid = call(codes_p)
    return hi[:b, :w], lo[:b, :w], valid[:b, :w]
