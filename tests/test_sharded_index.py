"""Sharded (multi-chip) index lookup vs the host StrobemerIndex.

Runs on the virtual 8-device CPU mesh (conftest). Validates the full
reference lookup semantics — find / get_count / is_filtered / equal-hash
run records (src/index.hpp:57-147) — through the mesh-sharded path, and
that NAM construction from prefetched runs is identical to the host
find_nams / find_nams_rescue."""

import random

import numpy as np
import pytest

from rabbitsalign_tpu.align.aligner import AlignmentParameters  # noqa: F401 (import smoke)
from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.io.fasta import References

from .util import random_dna


def _repetitive_world(seed=11, n_shards=8):
    """Genome with heavy tandem repeats so the repetitive filter and
    long equal-hash runs are exercised."""
    r = random.Random(seed)
    unit = random_dna(300, seed=seed + 1)
    genome = (
        random_dna(20000, seed=seed)
        + unit * 120
        + random_dna(15000, seed=seed + 2)
        + unit * 70
        + random_dna(20000, seed=seed + 3)
    )
    refs = References()
    refs.add("chrR", genome.encode())
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    return genome, refs, params, index


@pytest.fixture(scope="module")
def world():
    return _repetitive_world()


@pytest.fixture(scope="module")
def sharded(world):
    import jax

    from rabbitsalign_tpu.parallel.sharding import ShardedIndex, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    _, _, _, index = world
    return ShardedIndex(make_mesh(8), index)


def test_find_runs_matches_host(world, sharded):
    genome, refs, params, index = world
    rng = np.random.RandomState(5)
    # queries: real hashes (incl. repetitive runs), plus misses
    picks = rng.randint(0, index.hashes.shape[0], 300)
    queries = np.concatenate([
        index.hashes[picks],
        rng.randint(0, 2**63, 50).astype(np.uint64),  # almost surely absent
    ])
    cap = max(1, index.filter_cutoff)
    res = sharded.find_runs(queries, cap)

    want_pos = index.find(queries)
    assert np.array_equal(res["position"], want_pos)
    found = want_pos >= 0
    assert found.any() and (~found).any()
    want_count = index.get_count(want_pos[found])
    assert np.array_equal(res["count"][found], np.atleast_1d(want_count))
    want_filt = np.atleast_1d(want_count) > index.filter_cutoff
    assert np.array_equal(res["filtered"][found], want_filt)
    assert res["filtered"].any(), "repeats must exercise the filter"
    # run records: for unfiltered hits the full run must be present
    for i in np.flatnonzero(found & ~res["filtered"]):
        pos = int(want_pos[i])
        cnt = int(res["count"][i])
        assert cnt <= cap
        assert np.array_equal(
            res["run_positions"][i, :cnt], index.positions[pos : pos + cnt]
        )
        assert np.array_equal(
            res["run_packed"][i, :cnt], index.packed[pos : pos + cnt]
        )
        assert (res["run_positions"][i, cnt:] == 0).all()


def test_find_runs_bucket_quirk_parity(world, sharded):
    """Keys the host find misses due to the bucket-table quirk (the run
    of the globally smallest hash) must also miss in the sharded path."""
    genome, refs, params, index = world
    smallest = index.hashes[:1]
    res = sharded.find_runs(smallest, 4)
    assert res["position"][0] == index.find(smallest)[0]


def test_find_nams_sharded_matches_host(world, sharded):
    from rabbitsalign_tpu.chain.nams import find_nams
    from rabbitsalign_tpu.chain.sharded_nams import find_nams_sharded
    from rabbitsalign_tpu.seed.randstrobes import randstrobes_query

    genome, refs, params, index = world
    r = random.Random(3)
    n_checked = 0
    for i in range(40):
        st = r.randrange(0, len(genome) - 200)
        read = genome[st : st + 150]
        if i % 3 == 1:  # land some reads in the repeat arrays
            st = 20000 + r.randrange(0, 300 * 110)
            read = genome[st : st + 150]
        qrs = randstrobes_query(read.encode(), params)
        frac_h, nams_h = find_nams(qrs, index)
        frac_s, nams_s = find_nams_sharded(qrs, sharded)
        assert frac_s == frac_h
        assert len(nams_s) == len(nams_h)
        for a, b in zip(nams_s, nams_h):
            assert (a.query_start, a.query_end, a.ref_start, a.ref_end,
                    a.ref_id, a.n_hits, a.score, a.is_rc) == (
                b.query_start, b.query_end, b.ref_start, b.ref_end,
                b.ref_id, b.n_hits, b.score, b.is_rc)
        n_checked += len(nams_h)
    assert n_checked > 50


def test_find_nams_rescue_sharded_matches_host(world, sharded):
    from rabbitsalign_tpu.chain.nams import find_nams_rescue
    from rabbitsalign_tpu.chain.sharded_nams import find_nams_rescue_sharded
    from rabbitsalign_tpu.seed.randstrobes import randstrobes_query

    genome, refs, params, index = world
    rescue_cutoff = min(2 * index.filter_cutoff, 1000)
    r = random.Random(9)
    total = 0
    for i in range(25):
        # bias into the repeats so rescue walks filtered (long) runs
        st = 20000 + r.randrange(0, 300 * 110)
        read = genome[st : st + 150]
        qrs = randstrobes_query(read.encode(), params)
        nams_h = find_nams_rescue(qrs, index, rescue_cutoff)
        nams_s = find_nams_rescue_sharded(qrs, sharded, rescue_cutoff)
        assert len(nams_s) == len(nams_h)
        for a, b in zip(nams_s, nams_h):
            assert (a.query_start, a.query_end, a.ref_start, a.ref_end,
                    a.ref_id, a.n_hits, a.score, a.is_rc) == (
                b.query_start, b.query_end, b.ref_start, b.ref_end,
                b.ref_id, b.n_hits, b.score, b.is_rc)
        total += len(nams_h)
    assert total > 20


def test_sharded_lookups_end_to_end_sam(world, sharded):
    """Whole-genome-sharding as a usable mapping path: run the Python
    SE mapping core with every index lookup served by the mesh-sharded
    index (find_nams/find_nams_rescue swapped for their sharded twins)
    and require byte-identical SAM against the host-indexed run."""
    from unittest import mock

    from rabbitsalign_tpu.align.aligner import Aligner, AlignmentParameters
    from rabbitsalign_tpu.chain.sharded_nams import (
        find_nams_rescue_sharded,
        find_nams_sharded,
    )
    from rabbitsalign_tpu.io.sam import Sam, SamRecord, CIGAR_OPS_M
    from rabbitsalign_tpu.map import se as se_mod
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.map.randomness import MinstdRand
    from rabbitsalign_tpu.map.stats import AlignmentStatistics

    genome, refs, params, index = world
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(2 * index.filter_cutoff, 1000)
    aligner = Aligner(ap)

    r = random.Random(23)
    records = []
    for i in range(120):
        if i % 3 == 1:  # repeat-array reads exercise filter + rescue
            st = 20000 + r.randrange(0, 300 * 110)
        else:
            st = r.randrange(0, len(genome) - 200)
        rd = list(genome[st : st + 150])
        for _ in range(r.randrange(0, 4)):
            rd[r.randrange(150)] = r.choice("ACGT")
        records.append(SamRecord(f"e{i}", "".join(rd).encode(), b"I" * 150))

    def run(patched):
        sam = Sam(refs, CIGAR_OPS_M, "", True, False)
        stats = AlignmentStatistics()
        eng = MinstdRand(0)
        eng.seed(0)
        ctx = (
            mock.patch.object(
                se_mod, "find_nams",
                lambda qrs, ix: find_nams_sharded(qrs, sharded))
            if patched else mock.patch.object(se_mod, "find_nams",
                                              se_mod.find_nams)
        )
        ctx2 = (
            mock.patch.object(
                se_mod, "find_nams_rescue",
                lambda qrs, ix, cutoff: find_nams_rescue_sharded(
                    qrs, sharded, cutoff))
            if patched else mock.patch.object(se_mod, "find_nams_rescue",
                                              se_mod.find_nams_rescue)
        )
        with ctx, ctx2:
            for rec in records:
                se_mod.align_SE_read(rec, sam, [], stats, aligner, mp,
                                     params, refs, index, eng)
        return sam.take()

    host_sam = run(False)
    sharded_sam = run(True)
    assert sharded_sam == host_sam
    assert host_sam.count("\n") >= 120


def test_shard_index_production_pipeline(world, sharded, tmp_path):
    """--shard-index PRODUCTION path: NativePipeline with every index
    lookup served by the mesh-sharded index (engine RunFeed injection)
    must be byte-identical to the host-lookup engine, SE and PE,
    including reads that trigger NAM rescue; the engine's feed_miss
    counter must stay zero (every run the take-rule walks was provided
    by the host preflight)."""
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    genome, refs, params, index = world
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(2 * index.filter_cutoff, 1000)

    r = random.Random(5)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    unit_region = (20000, 20000 + 300 * 120)  # the tandem-repeat block

    def read_at(st):
        s = list(genome[st : st + 150])
        s[r.randrange(150)] = r.choice("ACGT")
        return "".join(s)

    se_lines = []
    for i in range(260):
        if i % 4 == 0:
            # repeat-region read -> repetitive seeds -> rescue path
            st = r.randrange(*unit_region)
        elif i % 9 == 1:
            se_lines.append((f"j{i}", "".join(r.choice("ACGT") for _ in range(150))))
            continue
        else:
            st = r.randrange(0, len(genome) - 200)
        rd = read_at(st)
        if i % 3 == 2:
            rd = "".join(comp[c] for c in reversed(rd))
        se_lines.append((f"s{i}", rd))
    p_se = tmp_path / "shard_se.fq"
    p_se.write_bytes(b"".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n".encode() for n, s in se_lines))

    r1l, r2l = [], []
    for i in range(120):
        st = (r.randrange(*unit_region) if i % 5 == 0
              else r.randrange(0, len(genome) - 900))
        ins = max(180, min(600, int(r.gauss(300, 50))))
        a = read_at(st)
        b = "".join(comp[c] for c in reversed(genome[st + ins - 150 : st + ins]))
        if i % 11 == 3:
            b = "".join(r.choice("ACGT") for _ in range(150))
        r1l.append((f"p{i}/1", a))
        r2l.append((f"p{i}/2", b))
    p1 = tmp_path / "shard_r1.fq"
    p2 = tmp_path / "shard_r2.fq"
    p1.write_bytes(b"".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n".encode() for n, s in r1l))
    p2.write_bytes(b"".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n".encode() for n, s in r2l))

    def run(shard, f1, f2):
        out = []
        pipe = NativePipeline(index, params, refs, ap, mp, use_device=False,
                              shard_index=shard, sharded_index=sharded if shard else None)
        pipe.map_file(str(f1), str(f2) if f2 else "", False, 48, out.append)
        return b"".join(out), pipe.counters()

    se_host, _ = run(False, p_se, None)
    se_shard, c_se = run(True, p_se, None)
    assert se_shard == se_host
    assert c_se["feed_miss"] == 0
    assert c_se["nam_rescue"] > 0  # the rescue feed path actually ran

    pe_host, _ = run(False, p1, p2)
    pe_shard, c_pe = run(True, p1, p2)
    assert pe_shard == pe_host
    assert c_pe["feed_miss"] == 0


def test_shard_index_rescue_cutoff_above_run_cap(tmp_path):
    """-R can push rescue_cutoff past 1000 (runner matches reference
    main.cpp:415, no clamp). The engine's rescue walk hard-stops at
    count > 1000, so equal-hash runs in (1024, cutoff] are never
    consumed — but the host preflight used to PREFETCH them, overflowing
    the cap_r=1024 run packing and shifting every later strobe's run
    records (silent RunFeed corruption). Regression: byte-identity with
    runs of ~1060 and rescue_cutoff=1100."""
    import jax

    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.parallel.sharding import ShardedIndex, make_mesh
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    r = random.Random(77)
    unit = random_dna(300, seed=78)
    unit2 = random_dna(280, seed=79)
    genome = (
        random_dna(30000, seed=80)
        + unit * 1080          # equal-hash runs ~1060 > the 1024 run cap
        + random_dna(30000, seed=81)
        + unit2 * 60           # moderate runs the rescue DOES take
        + random_dna(30000, seed=82)
    )
    refs = References()
    refs.add("chrC", genome.encode())
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    assert int(np.max(np.diff(np.flatnonzero(
        np.concatenate(([True], index.hashes[1:] != index.hashes[:-1],
                        [True])))))) > 1024, "need runs past the cap"
    sharded = ShardedIndex(make_mesh(8), index)

    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = 1100  # e.g. -R 11 with filter_cutoff 100

    big = (30000, 30000 + 300 * 1080)
    mod = (big[1] + 30000, big[1] + 30000 + 280 * 60)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    lines = []
    for i in range(180):
        if i % 3 == 0:
            st = r.randrange(*big)
        elif i % 3 == 1:
            st = r.randrange(*mod)
        else:
            st = r.randrange(0, len(genome) - 200)
        s = list(genome[st : st + 150])
        s[r.randrange(150)] = r.choice("ACGT")
        s = "".join(s)
        if i % 5 == 4:
            s = "".join(comp[c] for c in reversed(s))
        lines.append((f"q{i}", s))
    fq = tmp_path / "bigrun.fq"
    fq.write_bytes(b"".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n".encode() for n, s in lines))

    def run(shard):
        out = []
        pipe = NativePipeline(index, params, refs, ap, mp, use_device=False,
                              shard_index=shard,
                              sharded_index=sharded if shard else None)
        pipe.map_file(str(fq), "", False, 60, out.append)
        return b"".join(out), pipe.counters()

    host, _ = run(False)
    shard, c = run(True)
    assert shard == host
    assert c["feed_miss"] == 0
    assert c["nam_rescue"] > 0


def test_find_runs_routed_sentinel_hash():
    """0xFFFF...F is a legal hash value but also the routing table's
    'empty shard' marker: a key at the very top of the hash space must
    still route to the shard that holds its run even when shard cuts
    collapse onto the top run's start and several shards come out empty
    (the route must not depend on the cut rule's no-trailing-empties
    detail)."""
    import jax

    from rabbitsalign_tpu.parallel.sharding import ShardedIndex, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    top = np.uint64(0xFFFFFFFFFFFFFFFF)
    # a few small runs, then a long run of the SENTINEL hash at the top
    # (long enough that shard cuts collapse onto its start and the last
    # shards come out empty)
    hashes = np.concatenate([
        np.repeat(np.uint64(5), 2),
        np.repeat(np.uint64(1) << np.uint64(40), 3),
        np.repeat(np.uint64(7) << np.uint64(60), 1),
        np.repeat(top, 10),
    ])
    n = hashes.shape[0]
    positions = np.arange(n, dtype=np.uint32)
    packed = (np.arange(n, dtype=np.uint32) << 8) | 1

    class _FakeIndex:
        bits = 4
        filter_cutoff = 30

        def __init__(self):
            self.hashes = hashes
            self.positions = positions
            self.packed = packed
            tops = (hashes >> np.uint64(64 - self.bits)).astype(np.int64)
            counts = np.bincount(tops + 1, minlength=(1 << self.bits) + 1)
            self.randstrobe_start_indices = np.cumsum(counts).astype(np.uint64)

        def k(self):
            return 20

    sharded = ShardedIndex(make_mesh(8), _FakeIndex())
    assert (sharded._start_hash == top).sum() > 1  # empty shards share it
    keys = np.array([5, 1 << 40, 7 << 60, 0xFFFFFFFFFFFFFFFF, 12345],
                    dtype=np.uint64)
    a = sharded.find_runs(keys, 30)
    b = sharded.find_runs_routed(keys, 30)
    for k in ("position", "count", "filtered"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # and the sentinel key is genuinely FOUND, with its full run
    assert a["position"][3] == 6 and a["count"][3] == 10


def test_find_runs_routed_matches_psum(world, sharded):
    """The host-routed lookup (zero-collective) must return exactly what
    the psum lookup returns for every key, including misses, repetitive
    runs, and the bucket quirk."""
    genome, refs, params, index = world
    r = random.Random(31)
    keys = []
    n = index.hashes.shape[0]
    for _ in range(400):
        keys.append(int(index.hashes[r.randrange(n)]))
    for _ in range(100):
        keys.append(r.getrandbits(64))  # almost surely absent
    keys = np.array(keys, dtype=np.uint64)
    cap = int(sharded.filter_cutoff)
    a = sharded.find_runs(keys, cap)
    b = sharded.find_runs_routed(keys, cap)
    for k in ("position", "count", "filtered"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_array_equal(a["run_positions"], b["run_positions"])
    np.testing.assert_array_equal(a["run_packed"], b["run_packed"])


def test_pod_sharded_index_empty_shard():
    """A run-aligned cut can leave shard 0 empty (the globally smallest
    hash's run spans past n/nprocs). Keys below the smallest indexed
    hash still route to that shard and must answer as misses — locally
    and over the wire — not crash (regression: IndexError indexing the
    0-length slice)."""
    import socket

    from rabbitsalign_tpu.parallel.multihost import PodShardedIndex

    class _Stub:
        hashes = np.array([5, 5, 5, 5, 5, 9], np.uint64)
        positions = np.arange(6, dtype=np.uint32)
        packed = np.arange(6, dtype=np.uint32)
        bits = 2
        randstrobe_start_indices = np.array([0, 6, 6, 6, 6], np.uint64)
        filter_cutoff = 30

        def k(self):
            return 20

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    peers = [f"127.0.0.1:{free_port()}", f"127.0.0.1:{free_port()}"]
    pod0 = PodShardedIndex(_Stub(), 0, 2, peers)
    pod1 = PodShardedIndex(_Stub(), 1, 2, peers)
    try:
        assert pod0._h.shape[0] == 0  # the cut rule left shard 0 empty
        assert pod1._h.shape[0] == 6
        queries = np.array([3, 5, 9, 2**60], np.uint64)
        for pod in (pod0, pod1):  # pod1 resolves key 3 over the wire
            res = pod.find_runs_routed(queries, 4)
            assert res["position"][0] == -1  # below smallest hash: miss
            assert res["position"][3] == -1
            assert res["count"][1] == 5 and res["count"][2] == 1
    finally:
        pod0.close()
        pod1.close()


def test_pod_sharded_index_matches_host(world):
    """PodShardedIndex (the index GENUINELY split across pod processes,
    remote-owned keys sent to the owner over the TCP side channel):
    two instances in one process, each holding only its slice, the
    full wire protocol exercised by routing instance 0's queries
    through instance 1's server — element-equal to the host index."""
    import socket

    from rabbitsalign_tpu.parallel.multihost import PodShardedIndex

    genome, refs, params, index = world

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    peers = [f"127.0.0.1:{free_port()}", f"127.0.0.1:{free_port()}"]
    pod0 = PodShardedIndex(index, 0, 2, peers)
    pod1 = PodShardedIndex(index, 1, 2, peers)
    try:
        # the two slices are disjoint and cover the index
        assert pod0._h.shape[0] + pod1._h.shape[0] == len(index)
        assert pod0._base == 0
        assert pod1._base == pod0._h.shape[0]
        # the slices must be GENUINE copies: a view would keep the full
        # index arrays alive and defeat the cross-host memory split
        for pod in (pod0, pod1):
            assert not np.shares_memory(pod._h, index.hashes)
            assert not np.shares_memory(pod._p, index.positions)
            assert not np.shares_memory(pod._k, index.packed)
        # and ownership must come from the same cut rule as the ICI tier
        from rabbitsalign_tpu.parallel.sharding import shard_bounds

        b = shard_bounds(index.hashes, 2)
        assert pod1._base == int(b[1])

        rng = np.random.RandomState(7)
        picks = rng.randint(0, index.hashes.shape[0], 400)
        queries = np.concatenate([
            index.hashes[picks],
            rng.randint(0, 2**63, 60).astype(np.uint64),
        ])
        cap = max(1, index.filter_cutoff)
        for pod in (pod0, pod1):  # each host resolves the same answer
            res = pod.find_runs_routed(queries, cap)
            want_pos = index.find(queries)
            assert np.array_equal(res["position"], want_pos)
            found = want_pos >= 0
            want_count = np.atleast_1d(index.get_count(want_pos[found]))
            assert np.array_equal(res["count"][found], want_count)
            assert np.array_equal(res["filtered"][found],
                                  want_count > index.filter_cutoff)
            for i in np.flatnonzero(found & ~res["filtered"])[:40]:
                pos = int(want_pos[i])
                cnt = int(res["count"][i])
                assert np.array_equal(
                    res["run_positions"][i, :cnt],
                    index.positions[pos : pos + cnt])
                assert np.array_equal(
                    res["run_packed"][i, :cnt],
                    index.packed[pos : pos + cnt])
        # both hosts had to serve remote keys for the test to mean
        # anything: each owns roughly half the key space
        owner = (np.searchsorted(pod0._start_hash, queries, side="right")
                 - 1).clip(0, 1)
        assert (owner == 0).any() and (owner == 1).any()
    finally:
        pod0.close()
        pod1.close()


def test_pod_lookup_sparse_fuzz():
    """Property fuzz for the round-5 bucket-bounded sparse lookup
    (PodShardedIndex._lookup_sparse + the sparse wire + densify): random
    synthetic indexes with skewed duplicate runs (incl. runs longer than
    cap), random bucket widths and pod sizes, keys planted at run
    heads/tails/one-off/misses — element-equal to a straightforward
    flat-searchsorted oracle that replicates the pre-round-5 dense
    logic (incl. the bucket-quirk reachability rule)."""
    import socket

    from rabbitsalign_tpu.parallel.multihost import PodShardedIndex
    from rabbitsalign_tpu.parallel.sharding import _bucket_reachable

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    rng = np.random.RandomState(0xF00D)
    for trial in range(12):
        bits = int(rng.randint(2, 12))
        n_runs = int(rng.randint(1, 200))
        # geometric-ish run lengths with occasional very long runs
        lens = rng.geometric(0.4, n_runs)
        long_ix = rng.rand(n_runs) < 0.05
        lens[long_ix] += rng.randint(30, 120, int(long_ix.sum()))
        vals = np.sort(rng.randint(0, 2**63, n_runs).astype(np.uint64))
        vals = np.unique(vals)
        lens = lens[: vals.shape[0]]
        hashes = np.repeat(vals, lens).astype(np.uint64)
        n = hashes.shape[0]

        class _Stub:
            pass

        stub = _Stub()
        stub.hashes = hashes
        stub.positions = rng.randint(0, 2**31, n).astype(np.uint32)
        stub.packed = rng.randint(0, 2**32, n).astype(np.uint32)
        stub.bits = bits
        stub.filter_cutoff = int(rng.randint(1, 40))
        stub.k = lambda self=None: 20
        # bucket table exactly as StrobemerIndex builds it: bucket b
        # covers hashes whose top `bits` equal b
        tops = (hashes >> np.uint64(64 - bits)).astype(np.int64)
        bt = np.searchsorted(tops, np.arange((1 << bits) + 1))
        stub.randstrobe_start_indices = bt.astype(np.uint64)
        reach = _bucket_reachable(stub)

        cap = int(rng.randint(1, 12))
        nprocs = int(rng.randint(1, 4))
        peers = [f"127.0.0.1:{free_port()}" for _ in range(nprocs)]
        pods = [PodShardedIndex(stub, p, nprocs, peers)
                for p in range(nprocs)]
        try:
            # query mix: run heads, tails, interior, off-by-one, misses
            qs = [rng.randint(0, 2**63, 40).astype(np.uint64)]
            picks = rng.randint(0, n, 80)
            qs.append(hashes[picks])
            qs.append(hashes[picks] + np.uint64(1))
            qs.append(hashes[picks] - np.uint64(1))
            qs.append(np.array([0, 2**64 - 1, hashes[0], hashes[-1]],
                               np.uint64))
            keys = np.concatenate(qs)

            # oracle: the pre-round-5 flat logic
            lo = np.searchsorted(hashes, keys, side="left")
            hi = np.searchsorted(hashes, keys, side="right")
            in_r = lo < n
            safe = np.where(in_r, lo, 0)
            found = in_r & (hashes[safe] == keys) & (reach[safe] > 0)
            count = np.where(found, hi - lo, 0).astype(np.int64)
            pos = np.where(found, lo, -1).astype(np.int64)

            for pod in pods:
                res = pod.find_runs_routed(keys, cap)
                assert np.array_equal(res["position"], pos), trial
                assert np.array_equal(res["count"], count), trial
                assert np.array_equal(res["filtered"],
                                      count > stub.filter_cutoff), trial
                cnt = np.minimum(count, cap)
                for i in np.flatnonzero(found):
                    c = int(cnt[i])
                    assert np.array_equal(
                        res["run_positions"][i, :c],
                        stub.positions[lo[i]: lo[i] + c]), (trial, i)
                    assert np.array_equal(
                        res["run_packed"][i, :c],
                        stub.packed[lo[i]: lo[i] + c]), (trial, i)
                    assert not res["run_positions"][i, c:].any(), (trial, i)
                miss = ~found
                assert not res["run_positions"][miss].any(), trial
        finally:
            for pod in pods:
                pod.close()
