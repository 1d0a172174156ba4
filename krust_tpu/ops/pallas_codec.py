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


def _shl64(lo, s: int):
    """(0, lo) << s as a (hi, lo) uint32 pair; 0 <= s < 64, static."""
    if s == 0:
        return jnp.zeros_like(lo), lo
    if s < 32:
        return lo >> (32 - s), lo << s
    if s == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (s - 32), jnp.zeros_like(lo)


def _codec_body(c, k: int, w: int):
    """Kernel math: int32 codes [TB, WKP] -> (hi, lo, valid) [TB, w].

    Doubling formulation (round 4): instead of k rolling steps, partial
    packs over segment lengths 1, 2, 4, ... 2^floor(log2 k) are built by
    combining pairs —

        pack_{2m}(j) = pack_m(j) * 4^m + pack_m(j + m)
        rc_{2m}(j)   = rc_m(j + m) * 4^m + rc_m(j)
        valid_{2m}(j) = valid_m(j) & valid_m(j + m)

    — then k's set bits combine most-significant-first. O(log k +
    popcount k) vector steps instead of O(k): ~3x fewer VPU ops at k=21,
    ~4x at k=32. Arrays shrink with each combine (all slices static), so
    no fills or concats are needed. Segments of <= 16 bases fit one
    uint32 plane; only the final combines touch the (hi, lo) pair.

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

    # combine k as a sum of <= 16-base segments, most significant first
    # (k == 32 decomposes as 16 + 16). Accumulated length L; fwd shifts the
    # accumulator pair by 2b (<= 32), rc shifts the incoming b-segment by
    # 2L (up to 62: the generic pair shift).
    if k == 32:
        bits = [16, 16]
    else:
        bits = [
            1 << i for i in range(k.bit_length() - 1, -1, -1) if k & (1 << i)
        ]
    top = bits[0]
    fwd_lo, rc_lo, valid = partials[top]
    fwd_hi = rc_hi = None  # top <= 16: everything fits the lo plane
    L = top
    for b in bits[1:]:
        pb, rb, vb = partials[b]
        width = valid.shape[1] - b  # positions where both segments exist
        pb_s = pb[:, L : L + width]
        rb_s = rb[:, L : L + width]
        vb_s = vb[:, L : L + width]
        wide_next = 2 * (L + b) > 32
        # fwd: (acc << 2b) | pb(+L); 2b <= 32, == 32 only for 16+16
        s = 2 * b
        if fwd_hi is not None:
            fwd_hi = (fwd_hi[:, :width] << s) | (fwd_lo[:, :width] >> (32 - s))
            fwd_lo = (fwd_lo[:, :width] << s) | pb_s
        elif not wide_next:
            fwd_lo = (fwd_lo[:, :width] << s) | pb_s
        elif s == 32:
            fwd_hi = fwd_lo[:, :width]
            fwd_lo = pb_s
        else:
            fwd_hi = fwd_lo[:, :width] >> (32 - s)
            fwd_lo = (fwd_lo[:, :width] << s) | pb_s
        # rc: (rb(+L) << 2L) | acc
        sh_hi, sh_lo = _shl64(rb_s, 2 * L)
        if rc_hi is not None:
            rc_hi = rc_hi[:, :width] | sh_hi
            rc_lo = rc_lo[:, :width] | sh_lo
        elif wide_next:
            rc_hi = sh_hi
            rc_lo = rc_lo[:, :width] | sh_lo
        else:
            # 2(L+b) <= 32 implies sh_hi == 0 identically
            rc_lo = rc_lo[:, :width] | sh_lo
        valid = jnp.logical_and(valid[:, :width], vb_s)
        L += b

    assert L == k and valid.shape[1] >= w, (L, valid.shape, w)
    fwd_lo = fwd_lo[:, :w]
    rc_lo = rc_lo[:, :w]
    valid = valid[:, :w]
    if fwd_hi is not None:
        fwd_hi = fwd_hi[:, :w]
        rc_hi = rc_hi[:, :w]
        use_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
        hi = jnp.where(use_rc, rc_hi, fwd_hi)
    else:
        use_rc = rc_lo < fwd_lo
        hi = jnp.zeros(fwd_lo.shape, jnp.uint32)
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
