"""Multi-chip counting: data-parallel encode + hash-sharded all-to-all merge.

The distributed design (new — the reference has no distributed layer; see
SURVEY.md §5 "Distributed communication backend"):

1. **Data-parallel encode/count.** Block rows shard across the ``data`` mesh
   axis. Each chip runs the rolling codec and a local sort-count, so the
   exchange below moves deduplicated (code, count) pairs, not raw windows.
2. **Hash-sharded all-to-all.** Each local unique key is assigned an owner
   chip ``hash(code) % n``; entries are bucketed per owner into a fixed
   per-destination capacity and exchanged with ``jax.lax.all_to_all`` over
   ICI. After the exchange every chip holds all partials for a disjoint hash
   range of the key space.
3. **Segment reduce.** A weighted sort-merge collapses the received partials
   into the chip's final table shard.

Capacity handling: bucket sizes are data-dependent, but keys are deduplicated
and the hash mixes well, so per-destination load concentrates at mean
``n_unique / n``. The kernel uses a safety factor and reports an overflow
flag; on overflow (pathological skew) the caller retries with a larger factor
— exactness is never silently compromised.

Determinism: sort-based dedup/merge is order-insensitive, so results are
bit-identical across mesh shapes (tested in tests/test_sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.packer import pack_buffer
from ..io.reader import ParsedStreams
from ..kmer import INVALID_CODE
from ..models.engines import (
    PackedCounts,
    _HostAccumulator,
    _quality_threshold,
)
from ..ops.codec import encode_blocks
from ..ops.count import count_runs, merge_runs
from ..utils.config import EngineConfig
from ..utils.tracing import span
from .mesh import DATA_AXIS, make_mesh

# multiplicative mixing constants (odd, high-entropy)
_MIX1 = np.uint32(0x9E3779B1)
_MIX2 = np.uint32(0x85EBCA77)


def _owner_of(hi: jax.Array, lo: jax.Array, n: int) -> jax.Array:
    """Owner chip of a 64-bit key: a multiplicative hash mod n (int32)."""
    h = (hi * _MIX1) ^ (lo * _MIX2)
    h = h ^ (h >> 16)
    h = h * _MIX1
    h = h ^ (h >> 13)
    return (h % jnp.uint32(n)).astype(jnp.int32)


def _exchange_and_merge(u_hi, u_lo, u_cnt, *, k: int, axis: str, n_dev: int, cap: int):
    """Bucket local uniques by owner, all-to-all, merge received partials.

    Runs inside shard_map. Inputs are the uncompacted run-length counts
    (zero count = padding). ``cap`` is the per-destination entry capacity.
    Returns (m_hi, m_lo, m_cnt, n_m, overflowed) where the m_* arrays hold
    this chip's final hash-range table compacted to the front.
    """
    n_loc = u_hi.shape[0]
    pos = jnp.arange(n_loc, dtype=jnp.int32)
    live = u_cnt > 0

    owner = jnp.where(live, _owner_of(u_hi, u_lo, n_dev), n_dev)
    # sort by owner so each destination's entries are contiguous
    s_owner, s_hi, s_lo, s_cnt = jax.lax.sort(
        (owner, u_hi, u_lo, u_cnt), num_keys=1, is_stable=False
    )
    is_start = (s_owner != jnp.roll(s_owner, 1)).at[0].set(True)
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = pos - run_start  # position within its destination bucket

    overflowed = jnp.any((rank >= cap) & (s_owner < n_dev))

    dest = jnp.where(
        (s_owner < n_dev) & (rank < cap), s_owner * cap + rank, n_dev * cap
    )
    send_hi = jnp.zeros(n_dev * cap, jnp.uint32).at[dest].set(s_hi, mode="drop")
    send_lo = jnp.zeros(n_dev * cap, jnp.uint32).at[dest].set(s_lo, mode="drop")
    send_cnt = jnp.zeros(n_dev * cap, jnp.uint32).at[dest].set(s_cnt, mode="drop")

    recv_hi = jax.lax.all_to_all(send_hi, axis, 0, 0, tiled=True)
    recv_lo = jax.lax.all_to_all(send_lo, axis, 0, 0, tiled=True)
    recv_cnt = jax.lax.all_to_all(send_cnt, axis, 0, 0, tiled=True)

    m_hi, m_lo, m_cnt, n_m = merge_runs(recv_hi, recv_lo, recv_cnt, k)
    return m_hi, m_lo, m_cnt, n_m, overflowed


@functools.partial(
    jax.jit,
    static_argnames=("k", "quality_threshold", "mesh", "capacity_factor"),
)
def sharded_count_step(
    codes: jax.Array,
    qual: jax.Array | None,
    k: int,
    quality_threshold: int | None,
    mesh: Mesh,
    capacity_factor: int = 4,
):
    """One full multi-chip counting step over a sharded block batch.

    Args:
      codes: [B, W + k - 1] uint8, B divisible by mesh size, sharded on rows.
      qual: optional aligned quality bytes.
      k / quality_threshold: static codec parameters.
      mesh: 1-D device mesh with axis ``data``.
      capacity_factor: per-destination capacity multiplier over the uniform
        load ``local_windows / n``.

    Returns per-chip-stacked arrays (leading dim = n_dev):
      (m_hi, m_lo, m_cnt, n_m, overflowed[1]) — chip d's rows hold its final
      hash-range table in the first n_m[d] slots.
    """
    n_dev = mesh.shape[DATA_AXIS]
    rows_local = codes.shape[0] // n_dev
    w = codes.shape[1] - (k - 1)
    n_loc = rows_local * w
    cap = min(max(64, (n_loc // n_dev) * capacity_factor), n_loc)

    def local_fn(codes_l, qual_l=None):
        hi, lo, valid = encode_blocks(codes_l, k, qual_l, quality_threshold)
        u_hi, u_lo, u_cnt = count_runs(hi, lo, valid, k)
        m_hi, m_lo, m_cnt, n_m, ovf = _exchange_and_merge(
            u_hi, u_lo, u_cnt, k=k, axis=DATA_AXIS, n_dev=n_dev, cap=cap
        )
        return (
            m_hi[None],
            m_lo[None],
            m_cnt[None],
            n_m[None],
            ovf[None],
        )

    out_spec = (
        P(DATA_AXIS, None),
        P(DATA_AXIS, None),
        P(DATA_AXIS, None),
        P(DATA_AXIS),
        P(DATA_AXIS),
    )
    row_spec = P(DATA_AXIS, None)
    if qual is None:
        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=(row_spec,), out_specs=out_spec,
            check_vma=False,
        )(codes)
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(row_spec, row_spec), out_specs=out_spec,
        check_vma=False,
    )(codes, qual)


class CapacityOverflow(RuntimeError):
    """Hash-shard destination capacity exceeded; retry with a larger factor."""


def count_sharded(
    streams: ParsedStreams,
    k: int,
    min_quality: int | None = None,
    mesh: Mesh | None = None,
    config: EngineConfig | None = None,
) -> PackedCounts:
    """Count a parsed input across all mesh devices; exact result.

    Shards block batches data-parallel, merges via hash-sharded all-to-all,
    gathers the per-chip table shards, and concatenates on host (shards are
    disjoint by construction).
    """
    cfg = config or EngineConfig()
    mesh = mesh or make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    thr = _quality_threshold(min_quality) if streams.qual is not None else None
    qual_stream = streams.qual if thr is not None else None

    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    acc = _HostAccumulator(cfg.host_compact_threshold)

    batches = pack_buffer(
        streams.codes,
        qual_stream,
        k,
        cfg.block_windows,
        cfg.batch_rows,
    )
    for batch in batches:
        codes, qual = batch.codes, batch.qual
        rows = codes.shape[0]
        if rows % n_dev:
            pad = n_dev - rows % n_dev
            codes = np.vstack(
                [codes, np.full((pad, codes.shape[1]), INVALID_CODE, np.uint8)]
            )
            if qual is not None:
                qual = np.vstack([qual, np.full((pad, qual.shape[1]), 0xFF, np.uint8)])

        codes_d = jax.device_put(codes, sharding)
        qual_d = jax.device_put(qual, sharding) if qual is not None else None

        for factor in (4, 16, 0):
            if factor == 0:
                raise CapacityOverflow(
                    "hash-shard capacity exceeded even at 16x uniform load"
                )
            with span("sharded_count_step", rows=codes.shape[0], devices=n_dev):
                m_hi, m_lo, m_cnt, n_m, ovf = sharded_count_step(
                    codes_d, qual_d, k, thr, mesh, factor
                )
            if not bool(np.asarray(ovf).any()):
                break

        n_m = np.asarray(n_m)
        m_hi = np.asarray(m_hi, dtype=np.uint64)
        m_lo = np.asarray(m_lo, dtype=np.uint64)
        m_cnt = np.asarray(m_cnt, dtype=np.uint64)
        for d in range(n_dev):
            nd = int(n_m[d])
            if nd:
                acc.add(
                    (m_hi[d, :nd] << np.uint64(32)) | m_lo[d, :nd], m_cnt[d, :nd]
                )

    codes64, counts64 = acc.result()
    return PackedCounts(k, codes64, counts64)
