"""Pallas codec kernel vs jnp codec: bit-equality (interpret mode on CPU)."""

import random

import numpy as np
import pytest

from krust_tpu.io.packer import blockize
from krust_tpu.io.reader import streams_from_sequences
from krust_tpu.ops.codec import encode_blocks
from krust_tpu.ops.pallas_codec import encode_blocks_pallas

import oracle


def _compare(codes, k, qual=None, thr=None):
    hi, lo, valid = encode_blocks(codes, k, qual, thr)
    phi, plo, pvalid = encode_blocks_pallas(codes, k, qual, thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(phi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(plo))
    np.testing.assert_array_equal(
        np.asarray(valid), np.asarray(pvalid).astype(bool)
    )


@pytest.mark.parametrize("k", [1, 3, 16, 17, 21, 32])
def test_pallas_matches_jnp(k):
    rng = random.Random(42 + k)
    seqs = [oracle.random_dna(rng, rng.randint(0, 300), "ACGTN") for _ in range(10)]
    streams = streams_from_sequences(seqs)
    batch = blockize(streams.codes, None, k, block_windows=128)
    _compare(np.asarray(batch.codes), k)


@pytest.mark.parametrize("w", [128, 256, 1000, 4096])
def test_pallas_widths(w):
    k = 21
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 5, size=(8, w + k - 1), dtype=np.uint8)
    _compare(codes, k)


def test_pallas_quality_rejected():
    # quality folds into host masks by design; the kernel refuses the args
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=(8, 40), dtype=np.uint8)
    qual = rng.integers(33, 80, size=codes.shape, dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_blocks_pallas(codes, 5, qual, 53, interpret=True)


def test_pallas_row_padding():
    # row count not a multiple of the tile
    k = 5
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 5, size=(3, 128 + k - 1), dtype=np.uint8)
    _compare(codes, k)


def test_pallas_doubling_all_k():
    """The doubling codec (round 4: O(log k) combines, see _codec_body)
    must stay bit-equal to the k-step jnp oracle for every k, including
    the segment-boundary cases (16, 17, 24, 31, 32 = 16+16)."""
    rng = np.random.default_rng(7)
    for k in range(1, 33):
        codes = rng.integers(0, 5, size=(2, 150 + k - 1), dtype=np.uint8)
        h1, l1, v1 = encode_blocks(codes, k)
        h2, l2, v2 = encode_blocks_pallas(codes, k, interpret=True)
        assert np.array_equal(np.asarray(h1), np.asarray(h2)), k
        assert np.array_equal(np.asarray(l1), np.asarray(l2)), k
        assert np.array_equal(
            np.asarray(v1), np.asarray(v2).astype(bool)
        ), k
