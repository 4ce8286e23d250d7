"""On-device batched seeding vs the host implementations (bit-exact)."""

import random

import numpy as np
import pytest

from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.io.fasta import References
from rabbitsalign_tpu.ops.seed_device import (
    index_find_device,
    randstrobes_query_device,
    syncmers_device,
)
from rabbitsalign_tpu.seed.randstrobes import randstrobes_query
from rabbitsalign_tpu.seed.syncmers import syncmers
from rabbitsalign_tpu.utils.dna import encode


def _reads(n, rng):
    reads = []
    for i in range(n):
        ln = rng.choice([150, 150, 150, 100, 75, 40, 10])
        rd = "".join(rng.choice("ACGT") for _ in range(ln))
        if i % 4 == 1 and ln > 40:
            p = rng.randrange(10, ln - 10)
            rd = rd[:p] + "N" * rng.randrange(1, 6) + rd[p + 1 :]
        reads.append(rd.encode()[:ln])
    return reads


def _pad(reads, L):
    B = len(reads)
    codes = np.full((B, L), 4, np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c = encode(r)
        codes[i, : c.shape[0]] = c
        lengths[i] = c.shape[0]
    return codes, lengths


def test_syncmers_device_bit_exact():
    rng = random.Random(77)
    reads = _reads(64, rng)
    L = 150
    codes, lengths = _pad(reads, L)
    k, s, t = 20, 16, 3
    pos, h, counts = map(np.asarray, syncmers_device(codes, lengths, k, s, t, L))
    for i, r in enumerate(reads):
        gp, gh = syncmers(r, k, s, t)
        assert counts[i] == gp.shape[0], (i, r)
        assert np.array_equal(pos[i, : counts[i]], gp.astype(np.int32))
        assert np.array_equal(h[i, : counts[i]], gh)


def test_randstrobes_query_device_bit_exact():
    rng = random.Random(78)
    reads = _reads(48, rng)
    L = 150
    codes, lengths = _pad(reads, L)
    p = IndexParameters.from_read_length(150)
    sp, rp = p.syncmer, p.randstrobe
    out_hash, out_start, out_end, is_rc, n_fwd, n_rc = map(
        np.asarray,
        randstrobes_query_device(
            codes, lengths, sp.k, sp.s, sp.t_syncmer, rp.w_min, rp.w_max,
            rp.q, rp.max_dist, L,
        ),
    )
    M = out_hash.shape[1] // 2
    for i, r in enumerate(reads):
        g = randstrobes_query(r, p)
        nf = int(np.sum(~g.is_reverse))
        nr = int(np.sum(g.is_reverse))
        assert (n_fwd[i], n_rc[i]) == (nf, nr), (i, r)
        assert np.array_equal(out_hash[i, :nf], g.hash[:nf])
        assert np.array_equal(out_start[i, :nf], g.start[:nf])
        assert np.array_equal(out_end[i, :nf], g.end[:nf])
        assert np.array_equal(out_hash[i, M : M + nr], g.hash[nf:])
        assert np.array_equal(out_start[i, M : M + nr], g.start[nf:])
        assert np.array_equal(out_end[i, M : M + nr], g.end[nf:])


def test_index_find_device_matches_host():
    rng = random.Random(79)
    genome = "".join(rng.choice("ACGT") for _ in range(120_000))
    refs = References()
    refs.add("c", genome.encode())
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)

    queries = np.concatenate([
        index.hashes[:: max(1, len(index) // 500)],
        rng_hashes := np.array(
            [rng.getrandbits(63) for _ in range(200)], dtype=np.uint64
        ),
    ])
    import jax.numpy as jnp

    got = np.asarray(
        index_find_device(
            jnp.asarray(index.hashes), jnp.asarray(index.randstrobe_start_indices),
            jnp.int64(index.bits), jnp.asarray(queries),
        )
    )
    want = np.asarray(index.find(queries))
    assert np.array_equal(got, want)


def test_randstrobes_query_vec_matches_host():
    """The vectorized (scan-free) variant matches the host randstrobes
    exactly on every read it does not flag; ties (duplicated window
    minima, possible on repeats) are flagged for host fallback."""
    import random

    import jax.numpy as jnp

    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.ops.seed_device import randstrobes_query_vec
    from rabbitsalign_tpu.seed.randstrobes import randstrobes_query

    p = IndexParameters.from_read_length(150)
    sp, rp = p.syncmer, p.randstrobe
    r = random.Random(7)
    reads = []
    for i in range(120):
        L = r.choice([150, 150, 150, 100, 40, 11])  # incl. < w_max
        if i % 4 == 0:
            unit = "".join(r.choice("ACGT") for _ in range(r.choice([3, 8, 25])))
            sq = (unit * (L // len(unit) + 1))[:L]
        else:
            sq = "".join(r.choice("ACGT") for _ in range(L))
        if i % 9 == 2 and L > 20:
            sq = sq[:10] + "N" + sq[11:]
        reads.append(sq)
    M = 64
    Lmax = max(len(x) for x in reads)
    MP = {"A": 0, "C": 1, "G": 2, "T": 3}
    codes = np.full((len(reads), Lmax), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, sq in enumerate(reads):
        codes[i, : len(sq)] = [MP.get(c, 4) for c in sq]
        lens[i] = len(sq)
    h, st, en, nf, nr, tie = [
        np.asarray(x)
        for x in randstrobes_query_vec(
            jnp.asarray(codes), jnp.asarray(lens), sp.k, sp.s, sp.t_syncmer,
            rp.w_min, rp.w_max, rp.q, rp.max_dist, M,
        )
    ]
    checked = fallbacks = 0
    for i, sq in enumerate(reads):
        g = randstrobes_query(sq, p)
        if tie[i]:
            fallbacks += 1
            continue
        mh = list(h[i, : nf[i]]) + list(h[i, M : M + nr[i]])
        ms = list(st[i, : nf[i]]) + list(st[i, M : M + nr[i]])
        me = list(en[i, : nf[i]]) + list(en[i, M : M + nr[i]])
        assert mh == list(g.hash), f"read {i} hashes differ"
        assert ms == list(g.start) and me == list(g.end), f"read {i} coords"
        checked += 1
    assert checked > 80  # the vast majority is covered by the fast path


def test_randstrobes_query_vec_wide_window():
    """Strobe windows wider than 16 (custom -l/-u): the packed tie key
    must keep popcount classes disjoint — a low-popcount candidate at a
    high window offset must beat a higher-popcount one at offset 0
    (regression: the fixed *16 key multiplier collided them)."""
    import random

    import jax.numpy as jnp

    from rabbitsalign_tpu.ops.seed_device import randstrobes_query_vec
    from rabbitsalign_tpu.seed.randstrobes import randstrobes_query

    # -l 0 -u 19 gives a window width of 20 > 16; -m 255 lifts max_dist
    # so the far window offsets are actually reachable (the r150 default
    # max_dist ~80 masks them, which is what hid the key collision)
    p = IndexParameters.from_read_length(150, l=0, u=19, max_seed_len=255)
    sp, rp = p.syncmer, p.randstrobe
    assert rp.w_max - rp.w_min + 1 > 16
    r = random.Random(23)
    reads = []
    for i in range(96):
        if i % 2 == 0:
            # tandem repeats place an EQUAL-hash partner (popcount 0) at
            # a far window offset, where the old *16 key collided it
            # into the next popcount class
            unit = "".join(r.choice("ACGT")
                           for _ in range(r.choice([100, 110, 120, 130])))
            reads.append((unit * 2)[:150])
        else:
            reads.append("".join(r.choice("ACGT") for _ in range(150)))
    M = 64
    MP = {"A": 0, "C": 1, "G": 2, "T": 3}
    codes = np.full((len(reads), 150), 4, np.uint8)
    lens = np.full(len(reads), 150, np.int32)
    for i, sq in enumerate(reads):
        codes[i] = [MP[c] for c in sq]
    h, st, en, nf, nr, tie = [
        np.asarray(x)
        for x in randstrobes_query_vec(
            jnp.asarray(codes), jnp.asarray(lens), sp.k, sp.s, sp.t_syncmer,
            rp.w_min, rp.w_max, rp.q, rp.max_dist, M,
        )
    ]
    checked = 0
    for i, sq in enumerate(reads):
        if tie[i]:
            continue
        g = randstrobes_query(sq, p)
        mh = list(h[i, : nf[i]]) + list(h[i, M : M + nr[i]])
        ms = list(st[i, : nf[i]]) + list(st[i, M : M + nr[i]])
        me = list(en[i, : nf[i]]) + list(en[i, M : M + nr[i]])
        assert mh == list(g.hash), f"read {i} hashes differ"
        assert ms == list(g.start) and me == list(g.end), f"read {i} coords"
        checked += 1
    assert checked > 60


def test_index_find_device_split_matches_u64():
    """The 32-bit (hi, lo) split lookup must equal the u64 searchsorted
    lookup (and therefore StrobemerIndex.find) for hits, misses, empty
    buckets, and the first-run bucket quirk."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
    from rabbitsalign_tpu.io.fasta import References
    from rabbitsalign_tpu.ops.seed_device import (
        index_find_device,
        index_find_device_split,
        split_hash_u64,
    )
    from .util import random_dna

    r = random.Random(3)
    unit = random_dna(200, seed=77)
    genome = random_dna(30000, seed=7) + unit * 60 + random_dna(10000, seed=9)
    refs = References()
    refs.add("c", genome.encode())
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)

    n = index.hashes.shape[0]
    keys = [int(index.hashes[r.randrange(n)]) for _ in range(500)]
    keys += [int(index.hashes[0])]            # quirk run
    keys += [r.getrandbits(64) for _ in range(200)]  # misses
    keys = np.array(keys, dtype=np.uint64)

    ref_pos = np.asarray(index.find(keys))
    got64 = np.asarray(index_find_device(
        jnp.asarray(index.hashes), jnp.asarray(index.randstrobe_start_indices),
        jnp.uint64(index.bits), jnp.asarray(keys)))
    hi, lo = split_hash_u64(index.hashes)
    got32 = np.asarray(index_find_device_split(
        jnp.asarray(hi), jnp.asarray(lo),
        jnp.asarray(index.randstrobe_start_indices), index.bits,
        jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(keys.astype(np.uint32))))
    np.testing.assert_array_equal(got64, ref_pos)
    np.testing.assert_array_equal(got32, ref_pos)


def test_index_find_device_gary_matches_u64():
    """The G-ary slice-gather lookup (one strided probe gather per
    narrowing step + one contiguous G-slice) must equal the u64 lookup
    for hits, misses, empty buckets, the first-run quirk, long
    repetitive runs (forcing narrowing iterations), and with a pad
    larger than G (the production PAD=1024 upload)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
    from rabbitsalign_tpu.io.fasta import References
    from rabbitsalign_tpu.ops.seed_device import (
        gary_iters,
        index_find_device,
        index_find_device_gary,
        split_hash_u64,
    )
    from .util import random_dna

    r = random.Random(5)
    # unit repeats give long equal-hash runs -> long bucket runs
    unit = random_dna(180, seed=31)
    genome = (random_dna(25000, seed=11) + unit * 120
              + random_dna(8000, seed=13))
    refs = References()
    refs.add("c", genome.encode())
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)

    n = index.hashes.shape[0]
    keys = [int(index.hashes[r.randrange(n)]) for _ in range(500)]
    keys += [int(index.hashes[0])]            # quirk run
    keys += [r.getrandbits(64) for _ in range(202)]  # misses
    keys = np.array(keys, dtype=np.uint64)   # 703 = 37 * 19 for the 2-D case

    ref_pos = np.asarray(index.find(keys))
    got64 = np.asarray(index_find_device(
        jnp.asarray(index.hashes), jnp.asarray(index.randstrobe_start_indices),
        jnp.uint64(index.bits), jnp.asarray(keys)))
    np.testing.assert_array_equal(got64, ref_pos)

    hi, lo = split_hash_u64(index.hashes)
    khi = (keys >> np.uint64(32)).astype(np.uint32)
    klo = keys.astype(np.uint32)
    bstarts = jnp.asarray(index.randstrobe_start_indices)
    for G in (4, 16):
        iters = gary_iters(index.randstrobe_start_indices, G)
        assert iters >= 1  # the repeat run must actually force narrowing
        for pad in (G, 1024):
            hi_p = np.concatenate([hi, np.full(pad, 0xFFFFFFFF, np.uint32)])
            lo_p = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)])
            got = np.asarray(index_find_device_gary(
                jnp.asarray(hi_p), jnp.asarray(lo_p), bstarts, index.bits,
                jnp.asarray(khi), jnp.asarray(klo), iters=iters, G=G))
            np.testing.assert_array_equal(got, ref_pos)
            # extra narrowing steps must be harmless (stride-0 fixpoint)
            got2 = np.asarray(index_find_device_gary(
                jnp.asarray(hi_p), jnp.asarray(lo_p), bstarts, index.bits,
                jnp.asarray(khi), jnp.asarray(klo), iters=iters + 2, G=G))
            np.testing.assert_array_equal(got2, ref_pos)
    # 2-D query shape (the composed front end passes (B, S))
    iters = gary_iters(index.randstrobe_start_indices, 16)
    hi_p = np.concatenate([hi, np.full(16, 0xFFFFFFFF, np.uint32)])
    lo_p = np.concatenate([lo, np.full(16, 0xFFFFFFFF, np.uint32)])
    got2d = np.asarray(index_find_device_gary(
        jnp.asarray(hi_p), jnp.asarray(lo_p), bstarts, index.bits,
        jnp.asarray(khi.reshape(37, 19)), jnp.asarray(klo.reshape(37, 19)),
        iters=iters, G=16))
    np.testing.assert_array_equal(got2d, ref_pos.reshape(37, 19))
