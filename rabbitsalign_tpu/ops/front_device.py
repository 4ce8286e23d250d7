"""Composed device front end: seeding + index lookup + run walk + hit
compaction in ONE dispatch, feeding the device sweep-line NAM merge.

This composes the round-2 building blocks that previously ran separately
(ops/seed_device.seed_and_find collected hits on the HOST between the
device lookup and the device merge, ops/chain_device.py):

    randstrobes_query_vec  ->  index find ((hi32, lo32) split lookup)
    ->  repetitive filter  ->  equal-hash run walk with the
    min-length-diff keep rule (reference add_to_hits_per_ref,
    /root/reference/src/nam.cpp:68-85)  ->  on-device compaction of the
    kept hits into (B, MAXH) rows

all inside one jit. The host then only orders the downloaded hits
(robin_hood group order + introsort tie order — pure functions of the
hit values, no index access) and runs the device sweep-line merge
(ops/chain_device.merge_hits_device) — i.e. a complete `find_nams` twin
that NEVER touches host index arrays. Per-read fallbacks: seeding ties,
hit-table overflow (caller re-runs those reads on the host path).

The reference's equivalent is the fused CPU hot loop
randstrobes_query -> find_nams (/root/reference/src/nam.cpp:771-926).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .seed_device import (
    gary_iters,
    index_find_device_gary,
    randstrobes_query_vec,
)

I32MAX = jnp.int32(0x7FFFFFFF)

# sentinel rows appended to the uploaded index planes so the contiguous
# slice gathers (G-ary lookup final step, run walk) never hit
# dynamic_slice start-clamping; bounds PAD >= max(LOOKUP_G, run-walk cap)
PAD = 1024
LOOKUP_G = 16


@functools.partial(
    jax.jit,
    static_argnames=("k", "s", "t", "w_min", "w_max", "max_dist", "M",
                     "bits", "cutoff", "maxh", "cap", "iters"))
def seed_find_walk(codes, lengths, idx_hi, idx_lo, idx_pos, idx_packed,
                   bucket_starts, k: int, s: int, t: int, w_min: int,
                   w_max: int, q: int, max_dist: int, M: int, bits: int,
                   cutoff: int, maxh: int, cap: int, iters: int):
    """One-dispatch front end for a (B, L) read batch.

    idx_hi/idx_lo: split sorted hash planes PADDED with `PAD` sentinel
    rows (upload_index_split); idx_pos/idx_packed: the run records
    (same padding); cutoff: filter_cutoff (cap >= cutoff bounds the run
    walk — unfiltered runs are never longer, and cap <= PAD so the run
    walk reads contiguous slices); iters: gary_iters(bucket_starts).

    Returns (hits (B, maxh, 6) int32 rows [is_rc, ref_id, qs, qe, rs,
    re] in the host's exact processing order (strobes in qrs order, run
    entries ascending), n_hits (B,), total (B,), good (B,), tie (B,),
    overflow (B,))."""
    B, L = codes.shape
    h, st, en, nf, nr, tie = randstrobes_query_vec(
        codes, lengths, k, s, t, w_min, w_max, q, max_dist, M)
    S = h.shape[1]  # 2M strobe slots
    slot = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = (slot < nf[:, None]) | ((slot >= M) & (slot < M + nr[:, None]))

    khi = (h >> jnp.uint64(32)).astype(jnp.uint32)
    klo = h.astype(jnp.uint32)
    pos = index_find_device_gary(idx_hi, idx_lo, bucket_starts, bits,
                                 khi, klo, iters=iters, G=LOOKUP_G)
    found = valid & (pos >= 0)
    n = idx_hi.shape[0] - PAD  # logical length (sentinel pad rows)
    safe = jnp.where(found, pos, 0)
    # repetitive filter: hash at pos+cutoff equals hash at pos
    pc = jnp.minimum(safe + cutoff, n - 1)
    same = ((jnp.take(idx_hi, pc.reshape(-1)) == khi.reshape(-1))
            & (jnp.take(idx_lo, pc.reshape(-1)) == klo.reshape(-1))).reshape(B, S)
    filtered = found & same & (safe + cutoff < n)
    walk = found & ~filtered

    # run walk: rows j in [0, cap) valid while the hash still matches.
    # Runs are CONTIGUOUS in the sorted index, so each (read, strobe)
    # reads one cap-long slice — a vmapped dynamic_slice lowers to a
    # single gather with slice_sizes=(cap,) instead of cap scalar
    # gathers per strobe (sentinel padding keeps starts un-clamped)
    rows = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
    starts = safe.reshape(-1).astype(jnp.int32)

    def slc(arr, s0):
        return jax.lax.dynamic_slice(arr, (s0,), (cap,))

    rhi = jax.vmap(slc, in_axes=(None, 0))(idx_hi, starts).reshape(B, S, cap)
    rlo = jax.vmap(slc, in_axes=(None, 0))(idx_lo, starts).reshape(B, S, cap)
    in_run = (walk[:, :, None]
              & (rhi == khi[:, :, None]) & (rlo == klo[:, :, None])
              & (safe[:, :, None] + rows < n))
    rpos = jax.vmap(slc, in_axes=(None, 0))(idx_pos, starts).reshape(
        B, S, cap).astype(jnp.int32)
    rpacked = jax.vmap(slc, in_axes=(None, 0))(idx_packed, starts).reshape(
        B, S, cap)
    rs = rpos
    re = rs + (rpacked & jnp.uint32(0xFF)).astype(jnp.int32) + jnp.int32(k)
    ref_id = (rpacked >> jnp.uint32(8)).astype(jnp.int32)

    qspan = (en - st)[:, :, None]
    diff = jnp.abs(qspan - (re - rs))
    diff = jnp.where(in_run, diff, I32MAX)
    # keep rule: diff <= min of all previous diffs in this run
    # (exclusive cumulative minimum along the run axis)
    cmin = jax.lax.associative_scan(jnp.minimum, diff, axis=2)
    excl = jnp.concatenate(
        [jnp.full((B, S, 1), I32MAX, jnp.int32), cmin[:, :, :-1]], axis=2)
    keep = in_run & (diff <= excl)

    total = jnp.sum(found & valid, axis=1).astype(jnp.int32)
    good = jnp.sum(walk, axis=1).astype(jnp.int32)

    # compact kept hits (strobe-major, run-minor = host processing order)
    km = keep.reshape(B, S * cap)
    rank = jnp.cumsum(km.astype(jnp.int32), axis=1) - 1
    n_hits = jnp.sum(km, axis=1).astype(jnp.int32)
    overflow = n_hits > maxh
    target = jnp.where(km, jnp.minimum(rank, maxh - 1), maxh)
    bidx = jnp.arange(B)[:, None].astype(jnp.int64)

    is_rc = jnp.broadcast_to((slot >= M)[:, :, None], (B, S, cap))
    qs_b = jnp.broadcast_to(st[:, :, None], (B, S, cap))
    qe_b = jnp.broadcast_to(en[:, :, None], (B, S, cap))
    out = jnp.zeros((B, maxh + 1, 6), jnp.int32)
    ti = target.astype(jnp.int64)
    for f, arr in enumerate((
            is_rc.astype(jnp.int32).reshape(B, -1),
            ref_id.reshape(B, -1), qs_b.reshape(B, -1),
            qe_b.reshape(B, -1), rs.reshape(B, -1), re.reshape(B, -1))):
        out = out.at[bidx, ti, f].set(arr)
    return out[:, :maxh], jnp.minimum(n_hits, maxh), total, good, tie, overflow


def find_nams_composed_batch(seqs: List[bytes], index_dev, params,
                             filter_cutoff: int, L: int = 256,
                             maxh: int = 192, cap: int = 0,
                             merge_cap: int = 32):
    """Complete batched `find_nams` twin over the composed device front
    end: one seed_find_walk dispatch for the whole batch, host-side
    ordering of the downloaded hits (robin_hood group order + introsort
    tie order — no index arrays touched), device sweep-line merge per
    read. Returns a list of (nonrep_frac, List[Nam]) or None for reads
    needing the host path (too long, seeding tie, hit/NAM overflow).

    index_dev: (idx_hi, idx_lo, idx_pos, idx_packed, bucket_starts, bits,
    iters) device arrays from `upload_index_split`."""
    from ..chain.nams import Nam, _nam_score, _rh_items
    from ..utils.sorting import introsort
    from .chain_device import iter_merged_nam_rows, merge_stream_device_padded

    idx_hi, idx_lo, idx_pos, idx_packed, bucket_starts, bits, iters = index_dev
    sp = params.syncmer
    rp = params.randstrobe
    cap = cap or filter_cutoff
    if cap > PAD:  # pragma: no cover - deployment guard
        raise ValueError(f"run-walk cap {cap} exceeds slice pad {PAD}")
    B = len(seqs)
    codes_t = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    table = np.full(256, 4, dtype=np.uint8)
    for c, v in ((65, 0), (67, 1), (71, 2), (84, 3)):
        table[c] = v
        table[c + 32] = v
    for i, sq in enumerate(seqs):
        if len(sq) > L:
            lens[i] = -1  # host path
            continue
        a = table[np.frombuffer(sq, dtype=np.uint8)]
        codes_t[i, : len(a)] = a
        lens[i] = len(a)

    hits, n_hits, total, good, tie, overflow = seed_find_walk(
        jnp.asarray(codes_t), jnp.asarray(np.maximum(lens, 0)),
        idx_hi, idx_lo, idx_pos, idx_packed, bucket_starts,
        sp.k, sp.s, sp.t_syncmer, rp.w_min, rp.w_max, rp.q, rp.max_dist,
        L, int(bits), int(filter_cutoff), maxh, cap, int(iters))
    hits = np.asarray(hits)
    n_hits = np.asarray(n_hits)
    total = np.asarray(total)
    good = np.asarray(good)
    tie = np.asarray(tie)
    overflow = np.asarray(overflow)

    out = []
    for b in range(B):
        if lens[b] < 0 or tie[b] or overflow[b]:
            out.append(None)
            continue
        nh = int(n_hits[b])
        nonrep = (float(np.float32(good[b]) / np.float32(total[b]))
                  if total[b] > 0 else 1.0)
        if nh == 0:
            out.append((nonrep, []))
            continue
        rows = hits[b, :nh]
        # group per (orientation, ref_id) preserving first-touch
        # (insertion) order, then robin_hood iteration order
        nams: List[Nam] = []
        bad = False
        for rc in (0, 1):
            sub = rows[rows[:, 0] == rc]
            if not sub.size:
                continue
            groups = {}
            for r in sub:
                rid = int(r[1])
                if rid not in groups:
                    groups[rid] = []
                groups[rid].append((int(r[2]), int(r[3]), int(r[4]), int(r[5])))
            stream = []
            seg = []
            metas = []
            for rid, ghits in _rh_items(groups):
                introsort(ghits, [(x[0] << 32) | x[2] for x in ghits], False)
                for j, x in enumerate(ghits):
                    stream.append(x)
                    seg.append(j == 0)
                metas.append(rid)
            seg_arr = np.asarray(seg, dtype=bool)
            rws, mask, H, Hp, ovf = merge_stream_device_padded(
                stream, seg_arr, sp.k, merge_cap)
            if ovf:
                bad = True
                break
            for gi, qs, qe, rs_, re_, nhh in iter_merged_nam_rows(
                    rws, mask, seg_arr, H, Hp):
                nm = Nam(nam_id=len(nams), query_start=qs, query_end=qe,
                         ref_start=rs_, ref_end=re_, n_hits=nhh,
                         ref_id=metas[gi], is_rc=bool(rc))
                nm.score = _nam_score(nm)
                nams.append(nm)
        out.append(None if bad else (nonrep, nams))
    return out


def upload_index_split(index, device=None):
    """Upload the (hi32, lo32)-split index arrays + run records + bucket
    table for the composed front end, each padded with PAD sentinel rows
    (0xFFFFFFFF hashes / zero records) so the G-ary lookup's final slice
    and the run walk's contiguous slices never hit dynamic_slice
    start-clamping. Also returns the G-ary narrowing depth for this
    index's bucket profile. Requires n < 2^31 entries (a sharded
    deployment divides by n_shards; GRCh38-class whole indexes on one
    chip need the u64 path)."""
    import numpy as np

    from .seed_device import split_hash_u64

    n = index.hashes.shape[0]
    if n >= (1 << 31):  # pragma: no cover - deployment guard
        raise ValueError("split lookup needs n < 2^31 entries per shard")
    if n and int(index.positions.max()) >= (1 << 31):  # pragma: no cover
        # the run walk and hit rows carry genome positions as int32; a
        # >2 Gbp genome needs the sharded/paged deployment (the extend
        # path's pack_ref_pages is int32-safe, this front end is not)
        raise ValueError("composed front end needs genome positions < 2^31; "
                         "shard the index (--shard-index) for larger genomes")
    hi, lo = split_hash_u64(index.hashes)

    def pad(a, fill):
        a = np.asarray(a)
        return np.concatenate([a, np.full(PAD, fill, a.dtype)])

    put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
    return (
        put(jnp.asarray(pad(hi, 0xFFFFFFFF))),
        put(jnp.asarray(pad(lo, 0xFFFFFFFF))),
        put(jnp.asarray(pad(index.positions, 0))),
        put(jnp.asarray(pad(index.packed, 0))),
        put(jnp.asarray(index.randstrobe_start_indices)), int(index.bits),
        gary_iters(index.randstrobe_start_indices, LOOKUP_G),
    )
