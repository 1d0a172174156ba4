"""Fused packed-bytes codec kernel: parity with the jnp oracle + the
unfused flat step (interpret mode on CPU).

The fused kernel (ops/pallas_fused.py) consumes packed 2-bit bytes and
emits plane-separated (hi, lo); validity is reconstructed outside from the
sparse invalid positions. These tests pin:

- kernel-level bit-equality with ops.codec.encode_blocks through the plane
  permutation, across k;
- step-level set-equality of _count_flat_step(fused=True) with the unfused
  step on streams with invalid bases (separators/Ns), both sentinel and
  weighted modes — i.e. the scatter + log-dilation window poisoning exactly
  reproduces the reference's skip semantics (src/run.rs:526-563) the way
  the unfused mask construction does.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from krust_tpu.io.packer import pack2_full
from krust_tpu.kmer import INVALID_CODE
from krust_tpu.models.engines import _count_flat_step
from krust_tpu.ops.codec import encode_blocks, unpack_flat_blocks
from krust_tpu.ops.pallas_fused import (
    HALO_BYTES,
    encode_packed_pallas,
    plane_permute,
)


def _kernel_parity(k: int, rows: int = 8, w: int = 512, seed: int = 0):
    rng = np.random.default_rng(seed + k)
    w4 = w // 4
    n = rows * w + k - 1
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    packed = pack2_full(codes)
    need = (rows + 1) * w4
    packed = np.concatenate(
        [packed, np.zeros(need - packed.shape[0], np.uint8)]
    )
    main = jnp.asarray(packed[: rows * w4].reshape(rows, w4))
    halo = jnp.asarray(packed[w4:].reshape(rows, w4)[:, :HALO_BYTES])
    hi, lo = encode_packed_pallas(main, halo, k, interpret=True)

    sent = np.full(8, n, np.int32)
    blocks = unpack_flat_blocks(
        jnp.asarray(pack2_full(codes)), jnp.asarray(sent), k, rows, w
    )
    ohi, olo, _ = encode_blocks(blocks, k)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(plane_permute(ohi)))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(plane_permute(olo)))


@pytest.mark.parametrize("k", [1, 3, 5, 16, 17, 21, 24, 32])
def test_fused_kernel_matches_oracle(k):
    _kernel_parity(k)


@pytest.mark.slow
@pytest.mark.parametrize("k", [2, 4, 7, 8, 11, 13, 15, 19, 20, 23, 25, 29, 31])
def test_fused_kernel_matches_oracle_all_k(k):
    _kernel_parity(k, seed=100)


def _flat_batch(stream: np.ndarray, k: int, rows: int, w: int):
    """Build one FlatBatch-shaped (packed2, invpos, covered) by hand."""
    seg_bases = rows * w + k - 1
    if stream.shape[0] < seg_bases:
        stream = np.concatenate(
            [stream, np.full(seg_bases - stream.shape[0], 0, np.uint8)]
        )
    t = max(stream.shape[0] - k + 1, 0)
    covered = min(rows * w, t)
    packed2 = pack2_full(stream)
    inv = np.flatnonzero(stream >= INVALID_CODE).astype(np.int32)
    p = max(8, int(2 ** np.ceil(np.log2(max(inv.shape[0], 1)))))
    invpos = np.full(p, seg_bases, np.int32)
    invpos[: inv.shape[0]] = inv
    return packed2, invpos, covered


@pytest.mark.parametrize("k", [5, 16, 21, 32])
@pytest.mark.parametrize("mode", ["raw_sent", "raw"])
def test_fused_step_matches_unfused(k, mode):
    """Step-level parity on a dirty stream (Ns + separators), as sets."""
    rng = np.random.default_rng(7 + k)
    rows, w = 8, 512
    stream = rng.integers(0, 4, size=rows * w + k - 1, dtype=np.uint8)
    # sprinkle invalid bases (separators / Ns)
    bad = rng.choice(stream.shape[0], size=25, replace=False)
    stream[bad] = INVALID_CODE
    packed2, invpos, covered = _flat_batch(stream, k, rows, w)

    def run(fused):
        return _count_flat_step(
            jnp.asarray(packed2), jnp.asarray(invpos), np.int32(covered),
            k, rows, w, False, mode, fused, True,
        )

    out_u = run(False)
    out_f = run(True)
    if mode == "raw_sent":

        def codes(out):
            if len(out) == 1:  # lo-only part (k <= 16)
                return np.sort(np.asarray(out[0]).astype(np.uint64))
            return np.sort(
                (np.asarray(out[0]).astype(np.uint64) << 32)
                | np.asarray(out[1]).astype(np.uint64)
            )

        assert (len(out_u) == 1) == (k <= 16)
        assert len(out_u) == len(out_f)
        np.testing.assert_array_equal(codes(out_u), codes(out_f))
    else:
        # weighted mode: compare the multiset of VALID (hi, lo) codes
        def valid_set(out):
            hi, lo, wgt = (np.asarray(x).reshape(-1) for x in out)
            keep = wgt != 0
            return np.sort(
                (hi[keep].astype(np.uint64) << 32) | lo[keep].astype(np.uint64)
            )

        np.testing.assert_array_equal(valid_set(out_u), valid_set(out_f))


def test_fused_step_covered_mask():
    """Windows at global index >= covered must be sentinel-keyed."""
    k, rows, w = 21, 8, 512
    rng = np.random.default_rng(3)
    stream = rng.integers(0, 4, size=rows * w + k - 1, dtype=np.uint8)
    packed2, invpos, _ = _flat_batch(stream, k, rows, w)
    covered = 100  # pretend the stream ends early
    hi, lo = _count_flat_step(
        jnp.asarray(packed2), jnp.asarray(invpos), np.int32(covered),
        k, rows, w, False, "raw_sent", True, True,
    )
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    n_valid = int(np.sum(~((hi == 0xFFFFFFFF) & (lo == 0xFFFFFFFF))))
    assert n_valid == covered


def test_fused_step_poisons_k_windows_per_invalid():
    """One interior invalid base must kill exactly k windows."""
    k, rows, w = 7, 8, 512
    stream = np.zeros(rows * w + k - 1, np.uint8)  # poly-A
    stream[1000] = INVALID_CODE
    packed2, invpos, covered = _flat_batch(stream, k, rows, w)
    (lo,) = _count_flat_step(
        jnp.asarray(packed2), jnp.asarray(invpos), np.int32(covered),
        k, rows, w, False, "raw_sent", True, True,
    )
    # k <= 16 parts are lo-only; valid 7-mer codes span 14 bits, so the
    # all-ones sentinel is unambiguous
    sentinels = int(np.sum(np.asarray(lo) == 0xFFFFFFFF))
    pad = rows * w - covered
    assert sentinels == pad + k
