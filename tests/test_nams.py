"""NAM chaining tests, cross-validated against the compiled reference."""

import random
import subprocess

import pytest

from rabbitsalign_tpu.chain.nams import Nam, find_nams, find_nams_rescue, sort_nams_by_score
from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.io.fasta import References
from rabbitsalign_tpu.seed.randstrobes import randstrobes_query
from rabbitsalign_tpu.utils.dna import reverse_complement

from .util import build_golden, have_reference, random_dna


@pytest.fixture(scope="module")
def genome_and_index(tmp_path_factory):
    random.seed(99)
    base = random_dna(120_000)
    rep = random_dna(500)
    genome = base[:30000] + rep * 30 + base[30000:]
    path = tmp_path_factory.mktemp("nam") / "ref.fa"
    with open(path, "w") as f:
        f.write(">chr1\n")
        for j in range(0, len(genome), 70):
            f.write(genome[j : j + 70] + "\n")
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    return genome, str(path), params, idx


def _make_reads(genome, n=40):
    reads = []
    for i in range(n):
        st = random.randrange(0, len(genome) - 150)
        rd = genome[st : st + 150]
        if i % 3 == 1:
            chars = list(rd)
            for _ in range(4):
                chars[random.randrange(150)] = random.choice("ACGT")
            rd = "".join(chars)
        if i % 4 == 2:
            rd = reverse_complement(rd).decode()
        reads.append((st, rd))
    return reads


def test_find_nams_basic(genome_and_index):
    genome, _, params, idx = genome_and_index
    random.seed(5)
    for st, read in _make_reads(genome, 20):
        qr = randstrobes_query(read, params)
        frac, nams = find_nams(qr, idx)
        assert 0.0 <= frac <= 1.0
        if nams:
            sort_nams_by_score(nams)
            top = nams[0]
            # the top NAM of a sampled read should cover its position
            # (unless from the repeat region)
            if frac > 0.9 and 0 <= st < 30000 or st > 50000:
                proj = top.ref_start - top.query_start
                assert abs(proj - st) < 200 or top.is_rc


def test_nam_score_floor():
    n = Nam(query_start=0, query_end=20, ref_start=0, ref_end=100, n_hits=1)
    from rabbitsalign_tpu.chain.nams import _nam_score

    assert _nam_score(n) == 1.0  # 2*20 - 100 < 0 -> floor at 1


@pytest.mark.skipif(not have_reference(), reason="reference tree not mounted")
def test_nams_bit_exact_with_reference(genome_and_index):
    binary = build_golden("nam_golden")
    genome, fasta_path, params, idx = genome_and_index
    random.seed(7)
    reads = [r for _, r in _make_reads(genome, 40)]
    # repeat-region reads exercise the rescue path
    for _ in range(8):
        st = 30000 + random.randrange(0, 10000 - 150)
        reads.append(genome[st : st + 150])
    reads.append(random_dna(150))
    out = subprocess.run(
        [str(binary), fasta_path, "0.0002", "150", "80"],
        input="\n".join(reads),
        capture_output=True,
        text=True,
    ).stdout
    for read, block in zip(reads, out.split("#\n")):
        gN, gR, gF = [], [], None
        for line in block.strip().splitlines():
            p = line.split()
            if p[0] == "F":
                gF = float(p[1])
            elif p[0] == "N":
                gN.append(tuple(int(x) for x in p[1:7]) + (float(p[7]), int(p[8])))
            elif p[0] == "RN":
                gR.append(tuple(int(x) for x in p[1:7]) + (float(p[7]), int(p[8])))
        qr = randstrobes_query(read, params)
        frac, nams = find_nams(qr, idx)
        mine = [
            (n.query_start, n.query_end, n.ref_start, n.ref_end, n.n_hits, n.ref_id,
             round(n.score, 2), int(n.is_rc))
            for n in nams
        ]
        assert abs(frac - gF) < 1e-5
        assert mine == gN
        rnams = find_nams_rescue(qr, idx, 80)
        mine_r = [
            (n.query_start, n.query_end, n.ref_start, n.ref_end, n.n_hits, n.ref_id,
             round(n.score, 2), int(n.is_rc))
            for n in rnams
        ]
        assert mine_r == gR
