"""Multi-chip sharded counting tests on the 8-device virtual CPU mesh.

The SURVEY.md §4 implication: shard-merge results must exactly equal
single-device counts, across mesh shapes.
"""

import random

import jax
import numpy as np
import pytest

from krust_tpu.io.reader import streams_from_sequences
from krust_tpu.kmer import unpack_many
from krust_tpu.models.engines import NumpyEngine
from krust_tpu.parallel.mesh import make_mesh
from krust_tpu.parallel.sharded import count_sharded
from krust_tpu.utils.config import EngineConfig

import oracle


def small_cfg():
    return EngineConfig(block_windows=128, batch_rows=16)


def to_dict(pc):
    return dict(zip(unpack_many(pc.codes, pc.k), pc.counts.tolist()))


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


@pytest.mark.parametrize("k", [3, 5, 17, 21, 31])
def test_sharded_equals_oracle(eight_devices, k):
    rng = random.Random(123 + k)
    seqs = [oracle.random_dna(rng, rng.randint(0, 300), "ACGTN") for _ in range(30)]
    expected = oracle.count_sequences(seqs, k)
    streams = streams_from_sequences(seqs)
    mesh = make_mesh(8)
    got = count_sharded(streams, k, mesh=mesh, config=small_cfg())
    assert to_dict(got) == expected


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_mesh_shape_independence(eight_devices, n_dev):
    """Counts are bit-identical across mesh shapes (determinism contract)."""
    rng = random.Random(55)
    seqs = [oracle.random_dna(rng, 400) for _ in range(8)]
    streams = streams_from_sequences(seqs)
    k = 21
    single = NumpyEngine().count(streams, k)
    mesh = make_mesh(n_dev)
    sharded = count_sharded(streams, k, mesh=mesh, config=small_cfg())
    assert np.array_equal(sharded.codes, single.codes)
    assert np.array_equal(sharded.counts, single.counts)


def test_sharded_quality(eight_devices):
    rng = random.Random(77)
    records = []
    for _ in range(12):
        n = rng.randint(0, 150)
        seq = oracle.random_dna(rng, n)
        qual = "".join(chr(rng.randint(33, 73)) for _ in range(n))
        records.append((seq, qual))
    k, min_q = 7, 20
    expected = oracle.count_sequences(records, k, min_quality=min_q)
    streams = streams_from_sequences(
        [s for s, _ in records], [q.encode() for _, q in records]
    )
    got = count_sharded(
        streams, k, min_quality=min_q, mesh=make_mesh(8), config=small_cfg()
    )
    assert to_dict(got) == expected


def test_sharded_empty(eight_devices):
    streams = streams_from_sequences([])
    got = count_sharded(streams, 5, mesh=make_mesh(8), config=small_cfg())
    assert got.distinct == 0


def test_sharded_skew_homopolymer(eight_devices):
    """All windows identical — maximal hash skew; must still be exact."""
    streams = streams_from_sequences(["A" * 2000])
    got = count_sharded(streams, 21, mesh=make_mesh(8), config=small_cfg())
    assert to_dict(got) == {"A" * 21: 2000 - 21 + 1}


def test_multibatch_sharded(eight_devices):
    """Input spanning many batches merges exactly."""
    rng = random.Random(99)
    seqs = [oracle.random_dna(rng, 600) for _ in range(10)]
    streams = streams_from_sequences(seqs)
    k = 11
    expected = oracle.count_sequences(seqs, k)
    cfg = EngineConfig(block_windows=64, batch_rows=8)
    got = count_sharded(streams, k, mesh=make_mesh(8), config=cfg)
    assert to_dict(got) == expected
