"""End-to-end concordance against the REFERENCE implementation.

`tests/golden_gen/map_golden` compiles the reference's monolithic CPU
mapping path (/root/reference/src/aln.cpp align_SE_read/align_PE_read —
no GPU involved) into a standalone mapper. These tests run it and our
monolithic Python port over the same inputs with the same chunk-seeded
RNG and require byte-identical SAM/PAF records — the samdiff-style
regression of the reference's own CI (SURVEY.md §4), strengthened to
exact equality.
"""

import os
import random
import subprocess
from pathlib import Path

import pytest

from rabbitsalign_tpu.align.aligner import Aligner, AlignmentParameters
from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.io.fasta import References
from rabbitsalign_tpu.io.sam import CIGAR_OPS_EQX, CIGAR_OPS_M, Sam, SamRecord
from rabbitsalign_tpu.map.common import InsertSizeDistribution, MappingParameters
from rabbitsalign_tpu.map.pe import align_PE_read
from rabbitsalign_tpu.map.randomness import MinstdRand
from rabbitsalign_tpu.map.se import align_SE_read
from rabbitsalign_tpu.map.stats import AlignmentStatistics

GOLDEN = Path(__file__).parent / "golden_gen" / "map_golden"

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(), reason="map_golden not built (tests/golden_gen/build.sh)"
)

CHUNK = 100


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conc")
    rng = random.Random(424242)
    genome = "".join(rng.choice("ACGT") for _ in range(250_000))
    ref = tmp / "ref.fa"
    with open(ref, "w") as f:
        f.write(">chrA golden\n")
        for i in range(0, 150_000, 80):
            f.write(genome[i : i + 80] + "\n")
        f.write(">chrB second\n")
        for i in range(150_000, len(genome), 80):
            f.write(genome[i : i + 80] + "\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    return tmp, genome, str(ref), refs, params, index


def simulate_se(genome, n, seed=5):
    r = random.Random(seed)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    recs = []
    for i in range(n):
        st = r.randrange(0, len(genome) - 160)
        rd = genome[st : st + 150]
        kind = i % 23
        if kind == 0:
            rd = "".join(r.choice("ACGT") for _ in range(150))
        else:
            ch = list(rd)
            for _ in range(r.randrange(0, 5)):
                ch[r.randrange(150)] = r.choice("ACGT")
            rd = "".join(ch)
            if kind % 5 == 1:
                cut = r.randrange(40, 110)
                g = r.randrange(1, 7)
                rd = genome[st : st + cut] + genome[st + cut + g : st + 150 + g]
            if kind % 4 == 2:
                rd = "".join(comp[c] for c in reversed(rd))
            if kind == 7:
                rd = rd[:70] + "N" * 4 + rd[74:]
        recs.append((f"s{i}", rd))
    return recs


def simulate_pe(genome, n, seed=9):
    r = random.Random(seed)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    pairs = []
    for i in range(n):
        st = r.randrange(0, len(genome) - 900)
        ins = max(180, min(700, int(r.gauss(310, 60))))
        a = list(genome[st : st + 150])
        b = list(genome[st + ins - 150 : st + ins])
        for _ in range(r.randrange(0, 4)):
            a[r.randrange(150)] = r.choice("ACGT")
            b[r.randrange(150)] = r.choice("ACGT")
        a = "".join(a)
        b = "".join(comp[c] for c in reversed("".join(b)))
        if i % 19 == 3:
            b = "".join(r.choice("ACGT") for _ in range(150))
        if i % 23 == 5:
            a = "".join(r.choice("ACGT") for _ in range(150))
        if i % 29 == 7:
            a = genome[st : st + 60] + genome[st + 64 : st + 154]
        pairs.append((f"p{i}", a, b))
    return pairs


def write_fq(path, recs):
    with open(path, "w") as f:
        for name, seq in recs:
            f.write(f"@{name} c\n{seq}\n+\n{'I' * len(seq)}\n")


def run_golden(ref, r1, r2, mode, read_len=150):
    out = subprocess.run(
        [str(GOLDEN), str(ref), str(r1), str(r2) if r2 else "-", str(CHUNK),
         mode, str(read_len)],
        capture_output=True, check=True,
    )
    return out.stdout.decode()


def run_python_se(world, recs, mode, read_len=150):
    _, _, _, refs, params, index = world
    mp = MappingParameters(r=read_len)
    mp.rescue_cutoff = 2 * index.filter_cutoff
    if mode == "paf":
        mp.is_sam_out = False
    if mode == "details":
        mp.details = True
    if mode == "secondary":
        mp.max_secondary = 3
    cigar_ops = CIGAR_OPS_EQX if mode == "eqx" else CIGAR_OPS_M
    aligner = Aligner(AlignmentParameters())
    stats = AlignmentStatistics()
    sam = Sam(refs, cigar_ops, "", mp.output_unmapped, mp.details)
    paf = []
    engine = MinstdRand(0)
    n = 0
    chunk = 0
    for name, seq in recs:
        if n == 0:
            engine.seed(chunk)
        rec = SamRecord(name, seq.encode(), b"I" * len(seq))
        align_SE_read(rec, sam, paf, stats, aligner, mp, params, refs, index,
                      engine)
        n += 1
        if n >= CHUNK:
            n = 0
            chunk += 1
    return sam.take() + "".join(paf)


def run_python_pe(world, pairs, mode, read_len=150):
    _, _, _, refs, params, index = world
    mp = MappingParameters(r=read_len)
    mp.rescue_cutoff = 2 * index.filter_cutoff
    if mode == "paf":
        mp.is_sam_out = False
    if mode == "details":
        mp.details = True
    if mode == "secondary":
        mp.max_secondary = 3
    cigar_ops = CIGAR_OPS_EQX if mode == "eqx" else CIGAR_OPS_M
    aligner = Aligner(AlignmentParameters())
    stats = AlignmentStatistics()
    isize = InsertSizeDistribution()
    sam = Sam(refs, cigar_ops, "", mp.output_unmapped, mp.details)
    paf = []
    engine = MinstdRand(0)
    n = 0
    chunk = 0
    for name, a, b in pairs:
        if n == 0:
            engine.seed(chunk)
        r1 = SamRecord(name + "/1", a.encode(), b"I" * len(a))
        r2 = SamRecord(name + "/2", b.encode(), b"I" * len(b))
        align_PE_read(r1, r2, sam, paf, stats, isize, aligner, mp, params,
                      refs, index, engine)
        n += 2
        if n >= CHUNK:
            n = 0
            chunk += 1
    return sam.take() + "".join(paf)


def diff_head(a, b):
    for i, (x, y) in enumerate(zip(a.splitlines(), b.splitlines())):
        if x != y:
            return f"line {i}:\n ref: {x}\n our: {y}"
    return f"lengths differ: {len(a.splitlines())} vs {len(b.splitlines())}"


@pytest.mark.parametrize("mode", ["sam", "eqx", "paf", "details", "secondary"])
def test_se_concordance(world, mode):
    tmp, genome, ref, *_ = world
    recs = simulate_se(genome, 600)
    fq = tmp / f"se_{mode}.fq"
    write_fq(fq, recs)
    golden = run_golden(ref, fq, None, mode)
    ours = run_python_se(world, recs, mode)
    assert golden == ours, diff_head(golden, ours)


@pytest.mark.parametrize("mode", ["sam", "paf", "eqx", "details", "secondary"])
def test_pe_concordance(world, mode):
    tmp, genome, ref, *_ = world
    pairs = simulate_pe(genome, 400)
    fq1 = tmp / f"pe_{mode}.1.fq"
    fq2 = tmp / f"pe_{mode}.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden = run_golden(ref, fq1, fq2, mode)
    ours = run_python_pe(world, pairs, mode)
    assert golden == ours, diff_head(golden, ours)


def test_se_split_concordance_engine(world):
    """The production ENGINE path (phase A -> gapped fill -> phase B) vs
    the reference's own split-phase path (align_SE_read_part -> CPU fill
    exactly like the gasal_fail fallback -> align_SE_read_last), driven
    with the same chunk seeding: byte-identical SAM."""
    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available

    if not engine_available():
        pytest.skip("native engine unavailable")

    tmp, genome, ref, refs, params, index = world
    recs = simulate_se(genome, 600, seed=17)
    fq = tmp / "split.fq"
    write_fq(fq, recs)
    golden = run_golden(ref, fq, None, "split")

    mp = MappingParameters(r=150)
    mp.rescue_cutoff = 2 * index.filter_cutoff
    eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
    texts = []
    for ci in range(0, len(recs), CHUNK):
        chunk = [SamRecord(n, s.encode(), b"I" * len(s))
                 for n, s in recs[ci : ci + CHUNK]]
        texts.append(eng.chunk_b(eng.chunk_a(chunk, [], [], ci // CHUNK)))
    ours = "".join(texts)
    assert golden == ours, diff_head(golden, ours)


def test_pe_lowercase_concordance(world):
    """Lowercase PE reads: the reference uppercases PE sequences before
    mapping (src/pc.cpp:410-411) and, deliberately, not SE reads; our
    pipeline replicates both behaviors."""
    tmp, genome, ref, *_ = world
    pairs = [(n, a.lower(), b.lower()) for n, a, b in simulate_pe(genome, 150, seed=33)]
    fq1 = tmp / "lc.1.fq"
    fq2 = tmp / "lc.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden = run_golden(ref, fq1, fq2, "sam")
    ours = run_python_pe(world, pairs, "sam")
    assert golden == ours, diff_head(golden, ours)


COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def test_interleaved_concordance(world, tmp_path):
    """Interleaved input against the reference's OWN batching/pairing
    code (map_golden 'ilv' mode compiles pc.cpp's same_name +
    distribute_interleaved verbatim): chunks are 2*chunk_size RAW
    records, pairing is batch-local (a pair straddling the boundary
    becomes two singles), names pair on equality or a '/1'-'/2' suffix
    ONLY (A1/A2 without the separator stay single-end). Mixed input with
    orphans exercises all of it; Python layer and native engine must
    both match byte for byte."""
    tmp, genome, ref, refs, params, index = world
    r = random.Random(99)
    lines = []
    k = 0
    for i in range(420):
        st = r.randrange(0, len(genome) - 900)
        ins = max(180, min(600, int(r.gauss(300, 50))))
        a = list(genome[st : st + 150])
        a[r.randrange(150)] = r.choice("ACGT")
        a = "".join(a)
        b = "".join(COMP[c] for c in reversed(genome[st + ins - 150 : st + ins]))
        kind = i % 7
        if kind < 3:  # proper pair, /1 /2 names
            lines += [(f"p{k}/1", a), (f"p{k}/2", b)]
        elif kind == 3:  # pair via EQUAL names
            lines += [(f"e{k}", a), (f"e{k}", b)]
        elif kind == 4:  # orphan single
            lines += [(f"s{k}", a)]
        elif kind == 5:  # 1/2 suffix WITHOUT '/': reference treats as singles
            lines += [(f"n{k}x1", a), (f"n{k}x2", b)]
        else:  # two singles with different names
            lines += [(f"u{k}a", a), (f"u{k}b", b)]
        k += 1
    fq = tmp_path / "ilv.fq"
    write_fq(fq, lines)
    golden = run_golden(ref, fq, None, "ilv")

    from rabbitsalign_tpu.io.fastq import InputBuffer

    mp = MappingParameters(r=150)
    mp.rescue_cutoff = 2 * index.filter_cutoff
    aligner = Aligner(AlignmentParameters())
    stats = AlignmentStatistics()
    isize = InsertSizeDistribution()
    sam = Sam(refs, CIGAR_OPS_M, "", mp.output_unmapped, mp.details)
    engine = MinstdRand(0)
    for ci, r1, r2, r3 in InputBuffer(str(fq), "", CHUNK, True).chunks():
        engine.seed(ci)
        for rec1, rec2 in zip(r1, r2):
            a1 = SamRecord(rec1.name, rec1.seq.upper(), rec1.qual)
            a2 = SamRecord(rec2.name, rec2.seq.upper(), rec2.qual)
            align_PE_read(a1, a2, sam, [], stats, isize, aligner, mp,
                          params, refs, index, engine)
        for rec in r3:
            align_SE_read(rec, sam, [], stats, aligner, mp, params, refs,
                          index, engine)
    ours = sam.take()
    assert golden == ours, diff_head(golden, ours)

    # native engine through its own interleaved reader
    from rabbitsalign_tpu.native.engine import (
        NativeEngine,
        NativeReader,
        engine_available,
    )

    if engine_available():
        eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
        reader = NativeReader(str(fq), "", True, CHUNK)
        texts = []
        for ci, fx, _, _ in reader:
            ch = eng.chunk_a_fx(fx, ci)
            reader.free_chunk(fx)
            texts.append(eng.chunk_b(ch))
        reader.close()
        assert golden == "".join(texts), diff_head(golden, "".join(texts))


@pytest.mark.parametrize("read_len", [50, 100, 125, 250, 300, 400])
def test_profile_concordance(tmp_path, read_len):
    """Non-default read-length profiles: the reference picks (k, s, l, u)
    from its parameter table (/root/reference/src/indexparameters.cpp:
    37-45, from_read_length :51-83), changing syncmer and randstrobe
    geometry end to end. SE and PE SAM must stay byte-identical to the
    golden under those profiles, and the native engine must match on the
    same reads (a profile the r=150 engine suite never touches)."""
    rng = random.Random(read_len)
    genome = "".join(rng.choice("ACGT") for _ in range(160_000))
    ref = tmp_path / "ref.fa"
    ref.write_text(">c1 profile\n" + genome + "\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(read_len)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    world = (tmp_path, genome, str(ref), refs, params, index)

    recs = []
    for i in range(400):
        st = rng.randrange(0, len(genome) - read_len - 12)
        s = list(genome[st : st + read_len])
        for _ in range(read_len // 50):  # ~2% SNPs
            s[rng.randrange(read_len)] = rng.choice("ACGT")
        s = "".join(s)
        if i % 7 == 3:  # indel -> gapped extension
            cut = rng.randrange(read_len // 3, read_len - 15)
            g = rng.randrange(1, 6)
            s = genome[st : st + cut] + genome[st + cut + g : st + read_len + g]
        if i % 9 == 4:
            s = "".join(COMP[c] for c in reversed(s))
        if i % 31 == 11:  # unmappable
            s = "".join(rng.choice("ACGT") for _ in range(read_len))
        recs.append((f"r{i}", s))
    fq = tmp_path / "se.fq"
    write_fq(fq, recs)
    golden = run_golden(str(ref), fq, None, "sam", read_len)
    ours = run_python_se(world, recs, "sam", read_len)
    assert golden == ours, diff_head(golden, ours)

    pairs = []
    insert_mid = max(300, int(read_len * 2.5))
    for i in range(250):
        st = rng.randrange(0, len(genome) - insert_mid - 300)
        ins = max(2 * read_len + 20, int(rng.gauss(insert_mid, 40)))
        a = list(genome[st : st + read_len])
        b = list(genome[st + ins - read_len : st + ins])
        for _ in range(2):
            a[rng.randrange(read_len)] = rng.choice("ACGT")
            b[rng.randrange(read_len)] = rng.choice("ACGT")
        a = "".join(a)
        b = "".join(COMP[c] for c in reversed("".join(b)))
        if i % 23 == 5:  # unmappable mate -> rescue
            b = "".join(rng.choice("ACGT") for _ in range(read_len))
        pairs.append((f"p{i}", a, b))
    fq1 = tmp_path / "pe.1.fq"
    fq2 = tmp_path / "pe.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden_pe = run_golden(str(ref), fq1, fq2, "sam", read_len)
    ours_pe = run_python_pe(world, pairs, "sam", read_len)
    assert golden_pe == ours_pe, diff_head(golden_pe, ours_pe)

    # native engine at this profile: byte-identical to the Python layer
    # (and therefore to the golden) for SE through the split-phase path
    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available

    if engine_available():
        mp = MappingParameters(r=read_len)
        mp.rescue_cutoff = 2 * index.filter_cutoff
        eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
        texts = []
        for ci in range(0, len(recs), CHUNK):
            chunk = [SamRecord(n, s.encode(), b"I" * len(s))
                     for n, s in recs[ci : ci + CHUNK]]
            texts.append(eng.chunk_b(eng.chunk_a(chunk, [], [], ci // CHUNK)))
        golden_split = run_golden(str(ref), fq, None, "split", read_len)
        assert golden_split == "".join(texts), \
            diff_head(golden_split, "".join(texts))


def test_big_coordinate_concordance(tmp_path):
    """Reference positions past 2^24 bp: the reference computes every
    insert-size window (rescue mu+5s, pairing mu+10s, proper-pair mu+6s)
    and its coordinate compares in FLOAT32, so projected starts and
    window edges ROUND up there — and the insert-size estimator itself
    accumulates in float32. A double-precision twin diverges byte-wise
    on a 17 Mbp genome (this test fails against the pre-float32 port)."""
    import numpy as np

    n_bp = 17_500_000  # crosses 2^24 = 16.78 Mbp
    rng_np = np.random.RandomState(97)
    garr = rng_np.randint(0, 4, n_bp, dtype=np.uint8)
    # duplicated blocks, one copy below 2^24 and one above: reads from
    # them map ambiguously, producing near-tied pair scores and huge
    # inter-candidate distances whose float32 rounding is score-visible
    garr[16_900_000:16_903_000] = garr[1_000_000:1_003_000]
    garr[17_100_000:17_102_000] = garr[2_000_000:2_002_000]
    genome = (garr.tobytes().translate(
        bytes.maketrans(bytes(range(4)), b"ACGT"))).decode()
    ref = tmp_path / "big.fa"
    with open(ref, "w") as f:
        f.write(">cbig\n")
        f.write(genome)
        f.write("\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    world = (tmp_path, genome, str(ref), refs, params, index)

    # pairs in the >2^24 region, with junk mates to force mate rescue
    # (the float32 rescue window is where rounding bites first)
    r = random.Random(7)
    lo = 16_800_000
    pairs = []
    for i in range(1500):
        if i % 3 == 2:  # ambiguous: read from a duplicated block
            st = r.choice([16_900_000, 17_100_000]) + r.randrange(0, 1500)
        else:
            st = r.randrange(lo, n_bp - 900)
        ins = max(180, min(600, int(r.gauss(300, 50))))
        a = list(genome[st : st + 150])
        a[r.randrange(150)] = r.choice("ACGT")
        a = "".join(a)
        b = "".join(COMP[c] for c in reversed(genome[st + ins - 150 : st + ins]))
        if i % 5 == 1:  # junk mate -> rescue
            b = "".join(r.choice("ACGT") for _ in range(150))
        pairs.append((f"b{i}", a, b))
    fq1 = tmp_path / "big.1.fq"
    fq2 = tmp_path / "big.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden = run_golden(str(ref), fq1, fq2, "sam")
    ours = run_python_pe(world, pairs, "sam")
    assert golden == ours, diff_head(golden, ours)

    # the native engine's float32 window/score edits need the same
    # big-coordinate coverage (its other byte-identity tests use small
    # genomes). Compare against the Python SPLIT-PHASE twin — the RNG
    # draw order of the split paths differs from the monolithic path,
    # which matters on this test's deliberately tie-heavy data.
    from rabbitsalign_tpu.map.stats import AlignmentStatistics
    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available
    from rabbitsalign_tpu.ops.batch_extend import HostBatchAligner
    from rabbitsalign_tpu.pipeline.batched import phase_a_chunk, phase_b_chunk

    if engine_available():
        mp = MappingParameters(r=150)
        mp.rescue_cutoff = 2 * index.filter_cutoff
        eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
        aligner = Aligner(AlignmentParameters())
        batch = HostBatchAligner(AlignmentParameters())
        stats = AlignmentStatistics()
        isize = InsertSizeDistribution()
        rng_e = MinstdRand(0)
        py_sam = Sam(refs, CIGAR_OPS_M, "", mp.output_unmapped, mp.details)
        eng_texts = []
        pairs_per_chunk = CHUNK // 2
        for ci in range(0, len(pairs), pairs_per_chunk):
            part = pairs[ci : ci + pairs_per_chunk]
            r1 = [SamRecord(n + "/1", a.encode(), b"I" * len(a))
                  for n, a, _ in part]
            r2 = [SamRecord(n + "/2", b.encode(), b"I" * len(b))
                  for n, _, b in part]
            chunk_i = ci // pairs_per_chunk
            eng_texts.append(eng.chunk_b(eng.chunk_a(r1, r2, [], chunk_i)))
            rng_e.seed(chunk_i)
            work, _ = phase_a_chunk(r1, r2, [], [], isize, aligner, batch,
                                    mp, params, refs, index, rng_e)
            phase_b_chunk(work, batch.flush(), py_sam, stats, isize, aligner,
                          mp, params, refs, rng_e)
        assert "".join(eng_texts) == py_sam.take()


def test_repetitive_genome_concordance(tmp_path):
    """Tandem-repeat-heavy genome: exercises the repetitive-seed filter
    and the NAM-rescue take rules (count<=cutoff / first-5 / hard stop at
    1000, reference src/nam.cpp:955-1058) against the reference."""
    rng = random.Random(777)
    unit = "".join(rng.choice("ACGT") for _ in range(400))
    parts = []
    for i in range(120):
        u = list(unit)
        for _ in range(rng.randrange(0, 6)):  # slightly diverged copies
            u[rng.randrange(len(u))] = rng.choice("ACGT")
        parts.append("".join(u))
        if i % 10 == 3:
            parts.append("".join(rng.choice("ACGT") for _ in range(800)))
    genome = "".join(parts)
    ref = tmp_path / "rep.fa"
    with open(ref, "w") as f:
        f.write(">rep unit\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i : i + 80] + "\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    world = (tmp_path, genome, str(ref), refs, params, index)

    recs = simulate_se(genome, 400, seed=12)
    fq = tmp_path / "rep.fq"
    write_fq(fq, recs)
    golden = run_golden(str(ref), fq, None, "sam")
    ours = run_python_se(world, recs, "sam")
    assert golden == ours, diff_head(golden, ours)

    pairs = simulate_pe(genome, 250, seed=21)
    fq1 = tmp_path / "rep.1.fq"
    fq2 = tmp_path / "rep.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden = run_golden(str(ref), fq1, fq2, "sam")
    ours = run_python_pe(world, pairs, "sam")
    assert golden == ours, diff_head(golden, ours)


def test_multicontig_repetitive_concordance(tmp_path):
    """Shared repeats across SEVERAL contigs: reads hit multiple reference
    ids with equal scores, so the output depends on the iteration order of
    the reference's per-ref robin_hood map (simulated bit-exactly, see
    native.robinhood_order / reference ext/robin_hood.h) and on the
    float32 nonrepetitive-fraction rescue gate (reference src/nam.cpp:753,
    aln.cpp:2395)."""
    rng = random.Random(555)
    unit = "".join(rng.choice("ACGT") for _ in range(400))

    def contig(n_units):
        parts = []
        for i in range(n_units):
            u = list(unit)
            for _ in range(rng.randrange(0, 6)):  # diverged repeat copies
                u[rng.randrange(len(u))] = rng.choice("ACGT")
            parts.append("".join(u))
            if i % 7 == 2:
                parts.append("".join(rng.choice("ACGT") for _ in range(600)))
        return "".join(parts)

    c1, c2, c3 = contig(60), contig(60), contig(60)
    genome = c1 + c2 + c3
    ref = tmp_path / "mc.fa"
    with open(ref, "w") as f:
        for nm, seq in (("c1", c1), ("c2", c2), ("c3", c3)):
            f.write(f">{nm}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    world = (tmp_path, genome, str(ref), refs, params, index)

    recs = simulate_se(genome, 400, seed=66)
    fq = tmp_path / "mc.fq"
    write_fq(fq, recs)
    golden = run_golden(str(ref), fq, None, "sam")
    ours = run_python_se(world, recs, "sam")
    assert golden == ours, diff_head(golden, ours)

    pairs = simulate_pe(genome, 250, seed=67)
    fq1 = tmp_path / "mc.1.fq"
    fq2 = tmp_path / "mc.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden = run_golden(str(ref), fq1, fq2, "sam")
    ours = run_python_pe(world, pairs, "sam")
    assert golden == ours, diff_head(golden, ours)


def simulate_pe_regimes(genome, n, seed=21):
    """PE pairs whose insert-size regime alternates per 50-pair chunk
    (tight ~190 vs wide ~850) with rescue-needing pairs at chunk starts:
    the dataset where the reference's async-PE per-chunk estimator and
    gather-time rescue windows visibly diverge from the monolithic
    path's cumulative estimator."""
    r = random.Random(seed)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    pairs = []
    for i in range(n):
        chunk = i // 50
        st = r.randrange(0, len(genome) - 2500)
        if chunk % 2 == 1:
            ins = max(700, min(1000, int(r.gauss(850, 40))))
        else:
            ins = max(160, min(240, int(r.gauss(190, 12))))
        rescue = (i % 50) < 4 and i >= 50
        if rescue:
            ins = r.randrange(420, 620)
        a = list(genome[st : st + 150])
        for _ in range(r.randrange(0, 4)):
            a[r.randrange(150)] = r.choice("ACGT")
        b = "".join(comp[c] for c in reversed(genome[st + ins - 150 : st + ins]))
        if rescue:
            # destroy the mate's seeds but keep it alignable by SW
            bb = list(b)
            for p_ in range(0, 150, 11):
                bb[p_] = comp[bb[p_]]
            b = "".join(bb)
        pairs.append((f"p{i}", "".join(a), b))
    return pairs


def test_pe_async_concordance_engine(world):
    """The engine's --pe-ref-async mode vs the reference binary's
    PRODUCTION async-PE path (pe_split golden: per-chunk insert-size
    estimator + rescue windows recomputed at gather time with the
    end-of-phase-A estimate, /root/reference/src/pc.cpp:1100-1519):
    byte-identical SAM on a dataset engineered to expose the semantics
    (alternating insert regimes + chunk-start rescues), where the async
    and monolithic paths measurably differ."""
    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available

    if not engine_available():
        pytest.skip("native engine unavailable")

    tmp, genome, ref, refs, params, index = world
    pairs = simulate_pe_regimes(genome, 300)
    fq1 = tmp / "async.1.fq"
    fq2 = tmp / "async.2.fq"
    write_fq(fq1, [(n + "/1", a) for n, a, _ in pairs])
    write_fq(fq2, [(n + "/2", b) for n, _, b in pairs])
    golden_async = run_golden(ref, fq1, fq2, "pe_split")
    golden_mono = run_golden(ref, fq1, fq2, "sam")
    n_diff = sum(
        1 for x, y in zip(golden_async.splitlines(), golden_mono.splitlines())
        if x != y
    )
    assert n_diff > 0, "dataset must expose the async/mono divergence"

    def run_engine(pe_ref_async):
        mp = MappingParameters(r=150)
        mp.rescue_cutoff = 2 * index.filter_cutoff
        mp.pe_ref_async = pe_ref_async
        eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
        texts = []
        for ci in range(0, len(pairs), 50):
            part = pairs[ci : ci + 50]
            r1 = [SamRecord(n + "/1", a.encode(), b"I" * len(a))
                  for n, a, _ in part]
            r2 = [SamRecord(n + "/2", b.encode(), b"I" * len(b))
                  for n, _, b in part]
            texts.append(eng.chunk_b(eng.chunk_a(r1, r2, [], ci // 50)))
        return "".join(texts), eng

    ours_async, eng_async = run_engine(True)
    assert golden_async == ours_async, diff_head(golden_async, ours_async)
    ours_mono, eng_mono = run_engine(False)
    assert golden_mono == ours_mono, diff_head(golden_mono, ours_mono)

    # isize telemetry reports the ACTIVE estimator: per-chunk in async
    # mode (sample_size bounded by one 50-pair chunk's updates), the
    # cumulative one otherwise (all chunks' updates)
    assert eng_async.isize_per_chunk() and not eng_mono.isize_per_chunk()
    n_async = eng_async.isize()[2]
    n_mono = eng_mono.isize()[2]
    assert 0 < n_async <= 50 < n_mono


def test_mixed_read_length_concordance(tmp_path):
    """Reads whose lengths differ from (and exceed) the index profile's
    r: the reference maps whatever arrives with the r-chosen parameters
    (src/main.cpp estimates r once, reads vary freely). Lengths 60-400
    on the r=150 profile drive the engine's bucket FALL-THROUGH (qlen
    past the tight (152, 256) rectangle lands in the legacy buckets /
    host SSW) and the long-read rescue windows. SE SAM must be
    byte-identical to the golden in both layers."""
    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(220_000))
    ref = tmp_path / "ref.fa"
    ref.write_text(">c1 mixed\n" + genome + "\n")
    refs = References.from_fasta(str(ref))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    world = (tmp_path, genome, str(ref), refs, params, index)

    lengths = [60, 90, 120, 150, 151, 152, 153, 170, 200, 250, 300, 400]
    recs = []
    for i in range(480):
        ln = lengths[i % len(lengths)]
        st = rng.randrange(0, len(genome) - ln - 12)
        s = list(genome[st : st + ln])
        for _ in range(max(1, ln // 60)):
            s[rng.randrange(ln)] = rng.choice("ACGT")
        s = "".join(s)
        if i % 7 == 3:  # indel -> gapped extension at this length
            cut = rng.randrange(ln // 3, ln - 15)
            g = rng.randrange(1, 6)
            s = genome[st : st + cut] + genome[st + cut + g : st + ln + g]
        if i % 9 == 4:
            s = "".join(COMP[c] for c in reversed(s))
        recs.append((f"r{i}", s))
    fq = tmp_path / "mixed.fq"
    write_fq(fq, recs)

    golden = run_golden(str(ref), fq, None, "sam", 150)
    ours = run_python_se(world, recs, "sam", 150)
    assert golden == ours, diff_head(golden, ours)

    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available

    if not engine_available():
        pytest.skip("native engine unavailable")
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = 2 * index.filter_cutoff
    eng = NativeEngine(index, params, refs, AlignmentParameters(), mp, "")
    eng.MIN_DEVICE_JOBS = 1  # plan every job, even tiny chunks
    texts = []
    seen_buckets = set()
    for ci in range(0, len(recs), CHUNK):
        chunk = [SamRecord(n, s.encode(), b"I" * len(s))
                 for n, s in recs[ci : ci + CHUNK]]
        ch = eng.chunk_a(chunk, [], [], ci // CHUNK)
        # drive the BUCKET ASSIGNMENT itself (the device planner): every
        # planned job must fit its bucket rectangle — a long read
        # mis-assigned to the tight (152, 256) bucket would be truncated
        # on the device — and the mixed lengths must actually reach the
        # legacy fall-through buckets, not just the tight one
        for idxs, qcap, tcap, B, sub in eng.plan_batches(ch, 1024):
            seen_buckets.add((qcap, tcap))
            assert (ch.qlens[idxs] <= qcap).all(), (qcap, tcap)
            assert (ch.tlens[idxs] <= tcap).all(), (qcap, tcap)
        texts.append(eng.chunk_b(ch))
    assert len(seen_buckets) >= 2, (
        f"mixed lengths never left the first bucket: {seen_buckets}")
    golden_split = run_golden(str(ref), fq, None, "split", 150)
    assert golden_split == "".join(texts), \
        diff_head(golden_split, "".join(texts))
