"""Alignment layer tests: Cigar, hamming path, SSW port (vs compiled
reference ssw.c), and the Aligner facade with end-bonus extension."""

import random
import subprocess

import numpy as np
import pytest

from rabbitsalign_tpu.align.aligner import Aligner, AlignmentParameters
from rabbitsalign_tpu.align.cigar import Cigar, compress_cigar
from rabbitsalign_tpu.align.hamming import (
    hamming_align,
    hamming_distance,
    highest_scoring_segment,
)
from rabbitsalign_tpu.align.ssw import ssw_align
from rabbitsalign_tpu.utils.dna import encode

from .util import build_golden, have_reference, random_dna


def bseq(n, seed=None):
    return random_dna(n, seed=seed).encode()


def mutate(s: bytes, nsub=0, nins=0, ndel=0, seed=0):
    r = random.Random(seed)
    chars = list(s.decode())
    for _ in range(nsub):
        i = r.randrange(len(chars))
        chars[i] = r.choice("ACGT")
    for _ in range(nins):
        i = r.randrange(len(chars))
        chars.insert(i, r.choice("ACGT"))
    for _ in range(ndel):
        i = r.randrange(len(chars))
        del chars[i]
    return "".join(chars).encode()


class TestCigar:
    def test_push_merge(self):
        c = Cigar()
        c.push(7, 5)
        c.push(7, 3)
        c.push(8, 1)
        assert str(c) == "8=1X"

    def test_parse_roundtrip(self):
        c = Cigar("10S140=2X3I1D")
        assert str(c) == "10S140=2X3I1D"
        assert c.edit_distance() == 6

    def test_to_m_and_eqx(self):
        c = Cigar("5=1X4=")
        assert str(c.to_m()) == "10M"
        m = Cigar("10M")
        eqx = m.to_eqx(b"ACGTACGTAC", b"ACGTTCGTAC")
        assert str(eqx) == "4=1X5="

    def test_compress(self):
        assert compress_cigar("MMMXXM") == "3M2X1M"


class TestHamming:
    def test_distance(self):
        assert hamming_distance(b"ACGT", b"ACGA") == 1
        assert hamming_distance(b"AC", b"ACG") == -1

    def test_perfect(self):
        q = bseq(100, seed=1)
        info = hamming_align(q, q, 2, 8, 10)
        assert info.sw_score == 220
        assert str(info.cigar) == "100="
        assert info.edit_distance == 0

    def test_fuzz_against_direct_port(self):
        def hss_slow(query, ref, match, mismatch, end_bonus):
            n = len(query)
            start = 0
            score = end_bonus
            bs = be = bsc = 0
            for i in range(n):
                score += match if query[i] == ref[i] else -mismatch
                if score < 0:
                    start = i + 1
                    score = 0
                if score > bsc:
                    bs, bsc, be = start, score, i + 1
            if score + end_bonus > bsc:
                bsc = score + end_bonus
                be = n
                bs = start
            return bs, be, bsc

        r = random.Random(3)
        for _ in range(200):
            n = r.randint(1, 60)
            q = bseq(n)
            rr = bytearray(q)
            for _ in range(r.randint(0, n)):
                rr[r.randrange(n)] = ord(r.choice("ACGT"))
            rr = bytes(rr)
            assert highest_scoring_segment(q, rr, 2, 8, 10) == hss_slow(q, rr, 2, 8, 10)


class TestAligner:
    def setup_method(self):
        self.aligner = Aligner(AlignmentParameters())

    def test_perfect_with_end_bonuses(self):
        q = bseq(150, seed=2)
        ref = bseq(30, seed=3) + q + bseq(30, seed=4)
        a = self.aligner.align(q, ref)
        assert a.sw_score == 150 * 2 + 20
        assert str(a.cigar) == "150="
        assert a.ref_start == 30
        assert a.edit_distance == 0

    def test_indels(self):
        q = bseq(150, seed=5)
        ref = bseq(30, seed=6) + q + bseq(30, seed=7)
        q_del = q[:70] + q[73:]
        a = self.aligner.align(q_del, ref)
        assert "3D" in str(a.cigar)
        assert a.edit_distance == 3
        q_ins = q[:70] + b"ACG" + q[70:]
        a = self.aligner.align(q_ins, ref)
        assert "3I" in str(a.cigar)

    def test_long_ref_refused(self):
        a = self.aligner.align(bseq(100, seed=8), bseq(2500, seed=9))
        assert a.sw_score == -1000000
        assert a.edit_distance == 100000

    def test_junk_fails(self):
        a = self.aligner.align(b"A" * 100, b"T" * 200)
        assert a.sw_score == -100000


@pytest.mark.skipif(not have_reference(), reason="reference tree not mounted")
def test_ssw_bit_exact_with_reference():
    binary = build_golden("ssw_golden")
    r = random.Random(2024)
    pairs = []
    for i in range(80):
        core = random_dna(r.randint(100, 160), seed=1000 + i)
        q = mutate(core.encode(), nsub=r.randint(0, 8), nins=r.randint(0, 2),
                   ndel=r.randint(0, 2), seed=i)
        ref = (random_dna(r.randint(0, 60), seed=i) + core +
               random_dna(r.randint(0, 60), seed=i + 1)).encode()
        pairs.append((q, ref))
    for i in range(20):
        core = random_dna(150, seed=3000 + i)
        q = mutate(core.encode(), nsub=r.randint(0, 10), nins=r.randint(0, 3),
                   ndel=r.randint(0, 3), seed=i)
        ref = (random_dna(r.randint(100, 400), seed=i + 7) + core +
               random_dna(r.randint(100, 400), seed=i + 13)).encode()
        pairs.append((q, ref))
    pairs += [(bseq(150, seed=51), bseq(300, seed=52))]
    pairs += [(random_dna(60, "ACGTN", seed=61).encode(), random_dna(120, "ACGTN", seed=62).encode())]
    pairs += [(b"A" * 30, b"A" * 60), (b"ACGT", b"TTTT")]

    inp = "\n".join(f"{q.decode()}\t{ref.decode()}" for q, ref in pairs)
    out = subprocess.run(
        [str(binary), "2", "8", "12", "1"], input=inp, capture_output=True, text=True
    ).stdout.strip().splitlines()
    for (q, ref), line in zip(pairs, out):
        f = line.split()
        gold = (int(f[0]), int(f[1]), int(f[2]), int(f[3]), int(f[4]), int(f[5]),
                f[6] if len(f) > 6 else "")
        res = ssw_align(encode(q), encode(ref), 2, 8, 12, 1)
        mine = (res.score1, res.ref_begin, res.ref_end, res.read_begin,
                res.read_end, res.flag, str(res.cigar))
        assert mine == gold, (q, ref)
