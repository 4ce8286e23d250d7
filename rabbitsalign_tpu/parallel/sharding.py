"""Multi-chip scaling over a jax.sharding.Mesh.

The reference is single-node threads + one GPU (SURVEY.md §2.7: no
distributed backend). The TPU-native scaling design introduced here:

* **Data parallelism over reads** ('dp' mesh axis): each chip processes a
  shard of the extension batch — the analog of the reference's N worker
  threads over read chunks (src/main.cpp:453-592).
* **Replicated index** (small genomes): every chip holds the full
  hash-sorted randstrobe arrays, like the reference's per-NUMA-node index
  replicas (src/main.cpp:342-360); lookups are local gathers.
* **Sharded index** (whole-genome): the hash-sorted array is split into
  contiguous hash ranges, one per chip. A query hash belongs to exactly
  one shard; lookups evaluate on every chip against its local shard and
  combine with a psum (hits are zero off-shard), so candidate routing
  rides ICI collectives instead of host gathers.
* **Stats reduction**: per-chip AlignmentStatistics psum — the analog of
  summing per-thread stats at exit (src/main.cpp:597-615).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_index_by_hash(hashes: np.ndarray, positions: np.ndarray, packed: np.ndarray,
                        n_shards: int):
    """Split the hash-sorted randstrobe arrays into n contiguous,
    equal-size (padded) shards. Returns (hashes (n, m), positions (n, m),
    packed (n, m), shard_starts (n,)) with 0xFF..F hash padding."""
    n = hashes.shape[0]
    m = (n + n_shards - 1) // n_shards
    pad = n_shards * m - n
    h = np.pad(hashes, (0, pad), constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))
    p = np.pad(positions, (0, pad))
    k = np.pad(packed, (0, pad))
    starts = np.arange(n_shards) * m
    return (
        h.reshape(n_shards, m),
        p.reshape(n_shards, m),
        k.reshape(n_shards, m),
        starts.astype(np.int64),
    )


def sharded_find(mesh: Mesh, hash_shards, shard_starts, queries):
    """Distributed index lookup: every chip searches its hash-range shard
    for the (replicated) query hashes; exactly one shard can contain each
    hash, so a psum combines the per-shard answers.

    Returns global first-occurrence positions (int64, -1 if absent).
    """
    axis = mesh.axis_names[0]

    def local_find(h_shard, start, q):
        # h_shard arrives as (1, m) (local block of the sharded axis)
        h_shard = h_shard[0]
        pos = jnp.searchsorted(h_shard, q)
        in_range = pos < h_shard.shape[0]
        safe = jnp.where(in_range, pos, 0)
        found = in_range & (h_shard[safe] == q)
        local = jnp.where(found, pos + start[0], 0)
        hit = jnp.where(found, 1, 0)
        total = jax.lax.psum(local, axis)
        nhit = jax.lax.psum(hit, axis)
        return jnp.where(nhit > 0, total, -1)

    return jax.shard_map(
        local_find,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=P(),
    )(hash_shards, shard_starts, queries)


def data_parallel_extend(mesh: Mesh, params, q_codes, t_codes, qlen, tlen):
    """Data-parallel batched extension: batch dimension sharded over the
    mesh, each chip runs the wavefront DP on its shard, per-chip stats are
    psum'd. Uses the portable lax.scan kernel so it also executes on CPU
    meshes (the Pallas kernel is single-chip per shard in production).

    Returns (score, t_end, q_end, total_cells) with score/... sharded
    like the inputs and total_cells replicated.
    """
    from ..ops.sw_jax import sw_forward

    axis = mesh.axis_names[0]

    def step(q, t, ql, tl):
        score, t_end, q_end, _ = sw_forward(q, t, ql, tl, params, with_dirs=False)
        cells = jax.lax.psum(jnp.sum(ql.astype(jnp.int64) * tl.astype(jnp.int64)), axis)
        return score, t_end, q_end, cells

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
    )(q_codes, t_codes, qlen, tlen)
