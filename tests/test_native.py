"""Native (C++) seed+NAM accelerator vs the Python golden path."""

import random

import numpy as np
import pytest

from rabbitsalign_tpu.chain.nams import find_nams, find_nams_rescue
from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.io.fasta import References
from rabbitsalign_tpu.seed.randstrobes import randstrobes_query
from rabbitsalign_tpu.utils.dna import reverse_complement

from .util import random_dna

native = pytest.importorskip("rabbitsalign_tpu.chain.native_nams")


@pytest.mark.skipif(not native.native_available(), reason="native build unavailable")
def test_native_matches_python():
    random.seed(55)
    base = random_dna(150_000)
    rep = random_dna(400)
    genome = base[:40000] + rep * 30 + base[40000:]
    refs = References()
    refs.add("chr1", genome.encode())
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    rescue_cutoff = min(2 * idx.filter_cutoff, 1000)

    reads = []
    for i in range(120):
        st = random.randrange(0, len(genome) - 150)
        rd = genome[st : st + 150]
        if i % 3 == 1:
            chars = list(rd)
            for _ in range(4):
                chars[random.randrange(150)] = random.choice("ACGT")
            rd = "".join(chars)
        if i % 4 == 2:
            rd = reverse_complement(rd).decode()
        if i % 9 == 5:
            st2 = 40000 + random.randrange(0, 10000)
            rd = genome[st2 : st2 + 150]
        reads.append(rd.encode())
    reads += [b"ACGT", random_dna(150).encode(), b"N" * 150]

    nams_nat, nonrep, used_rescue = native.find_nams_chunk(
        reads, idx, params, rescue_cutoff, 2
    )
    for i, rd in enumerate(reads):
        qr = randstrobes_query(rd, params)
        frac, nams = find_nams(qr, idx)
        used = False
        if not nams or frac < 0.7:
            nams = find_nams_rescue(qr, idx, rescue_cutoff)
            used = True
        mine = [
            (n.nam_id, n.query_start, n.query_end, n.query_prev_hit_startpos,
             n.ref_start, n.ref_end, n.ref_prev_hit_startpos, n.n_hits, n.ref_id,
             round(n.score, 2), n.is_rc)
            for n in nams
        ]
        nat = [
            (n.nam_id, n.query_start, n.query_end, n.query_prev_hit_startpos,
             n.ref_start, n.ref_end, n.ref_prev_hit_startpos, n.n_hits, n.ref_id,
             round(n.score, 2), n.is_rc)
            for n in nams_nat[i]
        ]
        assert mine == nat, f"read {i}"
        assert bool(used_rescue[i]) == used, f"read {i} rescue flag"
        if not used:
            assert abs(float(nonrep[i]) - frac) < 1e-5


@pytest.mark.skipif(not native.native_available(), reason="native build unavailable")
def test_native_rescue_disabled():
    random.seed(66)
    genome = random_dna(60_000)
    refs = References()
    refs.add("c", genome.encode())
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    reads = [genome[100:250].encode(), random_dna(150).encode()]
    nams, _, used = native.find_nams_chunk(reads, idx, params, 100, 0)
    assert not used.any()
