"""Structural SAM-spec validation of the engine's output.

The reference's CI validated its SAM with Picard ValidateSamFile
(SURVEY.md §4, reference .github/workflows/ci.yml:65-112); this is the
same class of check without the Java dependency: field count and types,
flag consistency, header/record agreement, CIGAR-vs-SEQ length, mate
cross-references, and TLEN antisymmetry for paired records.
"""

import re

from tests.test_engine import (
    AlignmentParameters,
    MappingParameters,
    NativeEngine,
    _pe_chunks,
    _se_chunks,
    run_native,
    world,  # noqa: F401  (fixture)
)

from rabbitsalign_tpu.io.sam import sam_header

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def _validate(header: str, body: str, paired: bool) -> None:
    sq = dict(
        (m.group(1), int(m.group(2)))
        for m in re.finditer(r"@SQ\tSN:(\S+)\tLN:(\d+)", header)
    )
    assert sq, "header must declare @SQ lines"
    # collect per-name records for mate cross-checks
    by_name = {}
    n = 0
    for line in body.splitlines():
        assert not line.startswith("@")
        f = line.split("\t")
        assert len(f) >= 11, f"fewer than 11 fields: {line[:80]}"
        name, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq, qual = f[:11]
        flag = int(flag)
        pos = int(pos)
        tlen = int(tlen)
        n += 1
        assert 0 <= int(mapq) <= 255
        if flag & 4:  # unmapped
            assert cigar == "*" and pos >= 0
        else:
            assert rname in sq, f"RNAME {rname} not in header"
            assert 1 <= pos <= sq[rname]
            ops = _CIG_RE.findall(cigar)
            assert "".join(f"{l}{o}" for l, o in ops) == cigar, cigar
            if seq != "*":
                qspan = sum(int(l) for l, o in ops if o in "MIS=X")
                assert qspan == len(seq), (cigar, len(seq))
            rspan = sum(int(l) for l, o in ops if o in "MDN=X")
            assert pos + rspan - 1 <= sq[rname], "alignment exceeds contig"
        if seq != "*" and qual != "*":
            assert len(seq) == len(qual)
        if paired:
            assert flag & 1, "paired run must set 0x1"
            assert (flag & 0x40) != (flag & 0x80) or (flag & 0xC0) in (0x40, 0x80)
            if not flag & 0x100:
                by_name.setdefault(name, []).append((flag, rname, pos, rnext,
                                                     int(pnext), tlen))
        else:
            assert not flag & 1
    assert n > 0
    if paired:
        for name, recs in by_name.items():
            assert len(recs) == 2, f"{name}: expected 2 primary records"
            (f1, rn1, p1, rx1, px1, t1), (f2, rn2, p2, rx2, px2, t2) = recs
            assert t1 == -t2, f"{name}: TLEN not antisymmetric"
            if not (f1 & 4) and not (f2 & 4):
                # mate pointers cross-reference each other
                assert px1 == p2 and px2 == p1, name
                assert rx1 in ("=", rn2) and rx2 in ("=", rn1), name
                # proper-pair flag agrees between mates
                assert (f1 & 2) == (f2 & 2), name


def test_sam_spec_se(world):  # noqa: F811
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    _, refs, params, index = world
    mp.rescue_cutoff = min(2 * index.filter_cutoff, 1000)
    body, _ = run_native(world, _se_chunks(world), mp, ap)
    _validate(sam_header(refs, "", [], ""), body, paired=False)


def test_sam_spec_pe(world):  # noqa: F811
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    _, refs, params, index = world
    mp.rescue_cutoff = min(2 * index.filter_cutoff, 1000)
    body, _ = run_native(world, _pe_chunks(world), mp, ap)
    _validate(sam_header(refs, "", [], ""), body, paired=True)


def test_sam_spec_pe_secondary(world):  # noqa: F811
    ap = AlignmentParameters()
    mp = MappingParameters(r=150, max_secondary=3)
    _, refs, params, index = world
    mp.rescue_cutoff = min(2 * index.filter_cutoff, 1000)
    body, _ = run_native(world, _pe_chunks(world, n=200, chunk=100), mp, ap)
    _validate(sam_header(refs, "", [], ""), body, paired=True)
