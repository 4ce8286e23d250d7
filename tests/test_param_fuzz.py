"""Parameter-space concordance fuzzing against the reference.

The float32-window, -E>-O and interleaved-chunking divergences were all
found by WIDENING inputs; this makes that systematic: a seeded sweep of
random CLI-parameter combinations (-A -B -O -E -L -k -s -f -S -M -R -N,
the space /root/reference/src/cmdline.cpp:9-158 claims) plus adversarial
reads (N-runs, homopolymers, tie-heavy tandem repeats, read lengths off
the profile row), byte-diffed against `map_golden` (the reference's own
aln.cpp compiled with the same parameter overrides).

Oracle pairing matches execution model (split-phase vs monolithic RNG
draw order differs on tie-heavy data BY DESIGN — see CLAUDE.md): the
PRODUCTION C++ engine is byte-diffed against the reference's OWN
split-phase paths (map_golden "split" for SE; "pe_split" with the
engine in --pe-ref-async mode for PE), and every 7th combo also drives
the monolithic Python layer against the reference's monolithic path
("sam"/"eqx"), keeping the whole golden chain sampled across the
space, not just at the defaults. The planted tandem repeats make ties
dense enough that a WRONG pairing fails within a few combos — which is
how this test found the pairing rule in the first place.

RSB_FUZZ_N overrides the combo count (default 150, ~20 s; a
nightly-style run can pass 1000+).
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

N_COMBOS = int(os.environ.get("RSB_FUZZ_N", "150"))


def _genome(rng, n=60_000):
    """Random genome with planted adversarial structure: a tandem-repeated
    unit (tie-heavy NAMs, dense rescue), homopolymer runs, and a
    low-complexity dinucleotide stretch."""
    g = [rng.choice("ACGT") for _ in range(n)]
    unit = "".join(rng.choice("ACGT") for _ in range(311))
    for rep in range(6):  # 6 copies of the same unit scattered around
        at = rng.randrange(0, n - 400)
        g[at : at + len(unit)] = unit
    hp = rng.choice("ACGT") * 220
    at = rng.randrange(0, n - 300)
    g[at : at + len(hp)] = hp
    dn = "AT" * 150
    at = rng.randrange(0, n - 400)
    g[at : at + len(dn)] = dn
    return "".join(g)


def _reads_se(rng, genome, read_len, n):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    recs = []
    for i in range(n):
        st = rng.randrange(0, len(genome) - read_len - 12)
        rd = genome[st : st + read_len]
        kind = i % 17
        if kind == 0:  # unmappable
            rd = "".join(rng.choice("ACGT") for _ in range(read_len))
        else:
            ch = list(rd)
            for _ in range(rng.randrange(0, 1 + read_len // 40)):
                ch[rng.randrange(read_len)] = rng.choice("ACGT")
            rd = "".join(ch)
            if kind % 5 == 1:  # indel
                cut = rng.randrange(read_len // 4, 3 * read_len // 4)
                gsz = rng.randrange(1, 7)
                rd = (genome[st : st + cut]
                      + genome[st + cut + gsz : st + read_len + gsz])
            if kind % 4 == 2:
                rd = "".join(comp[c] for c in reversed(rd))
            if kind == 7:  # N-run in the middle
                mid = read_len // 2
                rd = rd[: mid] + "N" * rng.randrange(2, 8) + rd[mid + 6 :]
            if kind == 11:  # length off the profile row
                rd = rd[: rng.randrange(read_len // 2, read_len)]
        recs.append((f"s{i}", rd))
    return recs


def _reads_pe(rng, genome, read_len, n):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    span = max(3 * read_len, 600)
    pairs = []
    for i in range(n):
        st = rng.randrange(0, len(genome) - span - 10)
        ins = max(int(1.3 * read_len),
                  min(span, int(rng.gauss(2 * read_len, read_len // 2))))
        a = list(genome[st : st + read_len])
        b = list(genome[st + ins - read_len : st + ins])
        for _ in range(rng.randrange(0, 4)):
            a[rng.randrange(read_len)] = rng.choice("ACGT")
            b[rng.randrange(read_len)] = rng.choice("ACGT")
        a = "".join(a)
        b = "".join(comp[c] for c in reversed("".join(b)))
        if i % 13 == 3:  # rescue path
            b = "".join(rng.choice("ACGT") for _ in range(read_len))
        pairs.append((f"p{i}", a, b))
    return pairs


def _draw_combo(rng):
    """One random parameter combination; index-profile overrides only
    from known-valid (k, s) pairs so golden and ours reject in lockstep
    trivially."""
    read_len = rng.choice([50, 75, 100, 150, 250, 300])
    O = rng.randrange(4, 25)
    combo = {
        "read_len": read_len,
        "A": rng.randrange(1, 5),
        "B": rng.randrange(2, 13),
        "O": O,
        "E": rng.randrange(1, min(O, 5) + 1),  # CLI rejects E > O
        "L": rng.randrange(0, 31),
        "S": rng.choice([0.0, 0.2, 0.5, 0.78, 1.0]),
        "M": rng.randrange(5, 31),
        "R": rng.randrange(1, 6),
        "N": rng.choice([0, 1, 3]),
        "f": rng.choice([0.0002, 0.002]),
        "chunk": rng.choice([18, 100]),  # even: PE pairs per chunk
        "mode": rng.choice(["sam", "sam", "eqx"]),  # python-layer oracle
        "paired": rng.random() < 0.5,
    }
    if rng.random() < 0.3:
        k = rng.choice([18, 20, 22])
        combo["k"] = k
        combo["s"] = k - 4
    return combo


def _golden(ref, r1, r2, combo):
    """Run map_golden; returns None when the REFERENCE ITSELF crashes.

    An extended fuzz session (round 5, 3000 combos) found parameter
    corners where the reference's own code aborts: at e.g.
    A=1 B=12 O=4 E=4 the striped SSW can fail to produce an alignment
    and align_SE hands an is_unaligned Alignment to Sam::add, which
    asserts in debug builds (/root/reference/src/sam.cpp:127) and
    SEGFAULTS in -DNDEBUG release builds (reproduced on the exact
    inputs). There is no defined reference output for such combos —
    the harness instead asserts OUR side completes gracefully (we emit
    proper flag-4 unmapped records)."""
    args = [str(GOLDEN), str(ref), str(r1), str(r2) if r2 else "-",
            str(combo["chunk"]), combo["mode"], str(combo["read_len"])]
    for key in ("A", "B", "O", "E", "L", "S", "M", "R", "N", "f", "k", "s"):
        if key in combo:
            args.append(f"{key}={combo[key]}")
    out = subprocess.run(args, capture_output=True)
    if out.returncode != 0:
        # ONLY the known reference-crash signatures count: SIGABRT
        # (debug assert) / SIGSEGV (NDEBUG), or an explicit assertion
        # message. Anything else (OOM SIGKILL, bad usage, env trouble)
        # must fail the fuzz loudly, not hide in the crash slack.
        import signal

        crashed = (out.returncode in (-signal.SIGABRT, -signal.SIGSEGV)
                   or b"Assertion" in out.stderr)
        assert crashed, (
            f"map_golden failed non-crash (rc={out.returncode}): "
            f"{out.stderr[-500:]}")
        return None
    return out.stdout.decode()


def _build_world(tmp, genome, combo):
    ref = tmp / "ref.fa"
    with open(ref, "w") as f:
        f.write(">chrA fuzz\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i : i + 80] + "\n")
    refs = References.from_fasta(str(ref))
    from rabbitsalign_tpu.index.params import DEFAULT

    params = IndexParameters.from_read_length(
        combo["read_len"], combo.get("k", DEFAULT), combo.get("s", DEFAULT))
    index = StrobemerIndex(refs, params)
    index.populate(combo["f"])
    return ref, refs, params, index


def _mapping_params(combo, index, eqx=False, ref_async=False):
    mp = MappingParameters(r=combo["read_len"])
    mp.pe_ref_async = ref_async
    mp.dropoff_threshold = combo["S"]
    mp.max_tries = combo["M"]
    mp.rescue_level = combo["R"]
    mp.max_secondary = combo["N"]
    # exactly the reference's cutoff rule (no min() cap below 100)
    mp.rescue_cutoff = (mp.rescue_level * index.filter_cutoff
                        if mp.rescue_level < 100 else 1000)
    if eqx:
        mp.cigar_eqx = True
    return mp


def _run_engine(refs, params, index, combo, se_recs, pe_pairs):
    from rabbitsalign_tpu.native.engine import NativeEngine, engine_available

    if not engine_available():
        pytest.skip("native engine unavailable")
    # the engine is split-phase; its exact PE oracle is the reference's
    # production async path (pe_split golden), so PE runs in
    # --pe-ref-async mode here
    mp = _mapping_params(combo, index, ref_async=combo["paired"])
    ap = AlignmentParameters(combo["A"], combo["B"], combo["O"], combo["E"],
                             combo["L"])
    eng = NativeEngine(index, params, refs, ap, mp, "")
    texts = []
    if combo["paired"]:
        step = combo["chunk"] // 2
        for ci, at in enumerate(range(0, len(pe_pairs), step)):
            part = pe_pairs[at : at + step]
            r1 = [SamRecord(n + "/1", a.encode(), b"I" * len(a))
                  for n, a, _ in part]
            r2 = [SamRecord(n + "/2", b.encode(), b"I" * len(b))
                  for n, _, b in part]
            texts.append(eng.chunk_b(eng.chunk_a(r1, r2, [], ci)))
    else:
        step = combo["chunk"]
        for ci, at in enumerate(range(0, len(se_recs), step)):
            part = se_recs[at : at + step]
            rs = [SamRecord(n, s.encode(), b"I" * len(s)) for n, s in part]
            texts.append(eng.chunk_b(eng.chunk_a([], [], rs, ci)))
    return "".join(texts)


def _run_python(refs, params, index, combo, se_recs, pe_pairs):
    mp = _mapping_params(combo, index, eqx=(combo["mode"] == "eqx"))
    cigar_ops = CIGAR_OPS_EQX if combo["mode"] == "eqx" else CIGAR_OPS_M
    aligner = Aligner(AlignmentParameters(
        combo["A"], combo["B"], combo["O"], combo["E"], combo["L"]))
    stats = AlignmentStatistics()
    sam = Sam(refs, cigar_ops, "", mp.output_unmapped, mp.details)
    paf = []
    engine = MinstdRand(0)
    isize = InsertSizeDistribution()
    n = 0
    chunk = 0
    if combo["paired"]:
        for name, a, b in pe_pairs:
            if n == 0:
                engine.seed(chunk)
            r1 = SamRecord(name + "/1", a.encode(), b"I" * len(a))
            r2 = SamRecord(name + "/2", b.encode(), b"I" * len(b))
            align_PE_read(r1, r2, sam, paf, stats, isize, aligner, mp,
                          params, refs, index, engine)
            n += 2
            if n >= combo["chunk"]:
                n = 0
                chunk += 1
    else:
        for name, seq in se_recs:
            if n == 0:
                engine.seed(chunk)
            rec = SamRecord(name, seq.encode(), b"I" * len(seq))
            align_SE_read(rec, sam, paf, stats, aligner, mp, params, refs,
                          index, engine)
            n += 1
            if n >= combo["chunk"]:
                n = 0
                chunk += 1
    return sam.take() + "".join(paf)


def _diff_head(a, b):
    for i, (x, y) in enumerate(zip(a.splitlines(), b.splitlines())):
        if x != y:
            return f"line {i}:\n ref: {x[:220]}\n our: {y[:220]}"
    return f"lengths differ: {len(a.splitlines())} vs {len(b.splitlines())}"


def test_param_space_fuzz(tmp_path):
    rng = random.Random(20260819)
    genome = _genome(rng)
    n_eng = n_py = n_ref_crash = 0
    for trial in range(N_COMBOS):
        combo = _draw_combo(rng)
        ref, refs, params, index = _build_world(tmp_path, genome, combo)
        rl = combo["read_len"]
        se_recs = [] if combo["paired"] else _reads_se(rng, genome, rl, 68)
        pe_pairs = _reads_pe(rng, genome, rl, 34) if combo["paired"] else []
        r1p = tmp_path / "r1.fq"
        r2p = None
        if combo["paired"]:
            with open(r1p, "w") as f:
                for n, a, _ in pe_pairs:
                    f.write(f"@{n}/1 c\n{a}\n+\n{'I' * len(a)}\n")
            r2p = tmp_path / "r2.fq"
            with open(r2p, "w") as f:
                for n, _, b in pe_pairs:
                    f.write(f"@{n}/2 c\n{b}\n+\n{'I' * len(b)}\n")
        else:
            with open(r1p, "w") as f:
                for n, s in se_recs:
                    f.write(f"@{n} c\n{s}\n+\n{'I' * len(s)}\n")

        split_combo = dict(combo)
        split_combo["mode"] = "pe_split" if combo["paired"] else "split"
        golden_split = _golden(ref, r1p, r2p, split_combo)
        ours = _run_engine(refs, params, index, combo, se_recs, pe_pairs)
        if golden_split is None:
            # reference-crash combo (see _golden): no defined reference
            # output — OUR completing without raising IS the assertion
            n_ref_crash += 1
        else:
            assert golden_split == ours, (
                f"engine diverged at combo {trial}: {combo}\n"
                f"{_diff_head(golden_split, ours)}")
            n_eng += 1
        if trial % 7 == 0:
            golden_mono = _golden(ref, r1p, r2p, combo)
            py = _run_python(refs, params, index, combo, se_recs, pe_pairs)
            if golden_mono is None:
                n_ref_crash += 1
            else:
                assert golden_mono == py, (
                    f"python layer diverged at combo {trial}: {combo}\n"
                    f"{_diff_head(golden_mono, py)}")
                n_py += 1
    # crash combos are rare corners; the fuzz must still be comparing
    # real outputs for nearly every draw — and at ANY N, at least one
    # real engine comparison must have happened (small-N runs must not
    # pass green on crash-skips alone)
    assert n_eng >= max(1, N_COMBOS - max(2, N_COMBOS // 50))
    assert n_py >= max(0, N_COMBOS // 7 - max(1, N_COMBOS // 100))
    if n_ref_crash:
        print(f"param fuzz: {n_ref_crash} reference-crash combo(s) "
              f"(reference's own assert/segv; our side completed)")
