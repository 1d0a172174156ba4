"""Pallas TPU kernel for the rolling canonical k-mer codec.

Fuses the whole per-window pipeline — base validation, forward/RC rolling
2-bit encode, canonical min, validity AND — into one VMEM-resident kernel, so
block rows make exactly one HBM->VMEM trip and the 2k unrolled shift/or steps
run on the VPU without materializing intermediates in HBM.

Semantics identical to :func:`krust_tpu.ops.codec.encode_blocks` (the jnp
implementation is the oracle; tests/test_pallas.py asserts bit-equality).

Layout: rows tile by ``TILE_ROWS``; the last dim is padded to a multiple of
128 lanes with invalid codes (padding windows self-invalidate). All slices in
the unrolled loop use static offsets, which Mosaic lowers to lane shifts.
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

    No quality branch: the engine folds quality filtering into invalid-base
    masks on the host (quality bytes never cross the link), so the kernel
    only ever sees base codes (advisor/VERDICT r1: dead branch removed).
    """
    good_full = c < 4
    b_full = jnp.where(good_full, c, 0).astype(jnp.uint32)
    comp_full = jnp.where(good_full, 3 - c, 0).astype(jnp.uint32)

    wide = k > 16
    shape = (c.shape[0], w)
    fwd_lo = jnp.zeros(shape, jnp.uint32)
    rc_lo = jnp.zeros(shape, jnp.uint32)
    fwd_hi = jnp.zeros(shape, jnp.uint32) if wide else None
    rc_hi = jnp.zeros(shape, jnp.uint32) if wide else None
    valid = jnp.ones(shape, jnp.bool_)

    for j in range(k):
        bj = b_full[:, j : j + w]
        cj = comp_full[:, k - 1 - j : k - 1 - j + w]
        gj = good_full[:, j : j + w]
        if wide:
            fwd_hi = (fwd_hi << 2) | (fwd_lo >> 30)
            rc_hi = (rc_hi << 2) | (rc_lo >> 30)
        fwd_lo = (fwd_lo << 2) | bj
        rc_lo = (rc_lo << 2) | cj
        valid = jnp.logical_and(valid, gj)

    if wide:
        use_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
        hi = jnp.where(use_rc, rc_hi, fwd_hi)
    else:
        use_rc = rc_lo < fwd_lo
        hi = jnp.zeros(shape, jnp.uint32)
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
