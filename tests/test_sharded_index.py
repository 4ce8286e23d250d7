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
