"""StrobemerIndex tests: build, lookup semantics, .sti byte-interop."""

import subprocess

import numpy as np
import pytest

from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex, pick_bits
from rabbitsalign_tpu.io.fasta import References

from .util import build_golden, have_reference, random_dna


def make_refs(tmp_path, contigs, name="ref.fa"):
    path = tmp_path / name
    with open(path, "w") as f:
        for i, seq in enumerate(contigs):
            f.write(f">c{i} desc here\n")
            for j in range(0, len(seq), 60):
                f.write(seq[j : j + 60] + "\n")
    return path


def test_fasta_parsing(tmp_path):
    path = make_refs(tmp_path, ["ACGTacgtNNN", "GGGG"])
    refs = References.from_fasta(str(path))
    assert refs.names == ["c0", "c1"]
    assert refs.sequences[0] == b"ACGTACGTNNN"
    assert refs.lengths == [11, 4]
    assert refs.total_length() == 15


def test_pick_bits():
    params = IndexParameters.from_read_length(150)
    assert pick_bits(10_000_000, params) >= 8
    assert pick_bits(100, params) == 8
    assert pick_bits(3_100_000_000, params) <= 31


def test_index_build_and_lookup(tmp_path):
    contigs = [random_dna(30000, seed=11), random_dna(5000, seed=12)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    assert len(idx) > 0
    assert np.all(np.diff(idx.hashes.astype(np.uint64)) >= np.uint64(0) )
    # every hash except those sharing the first run must be findable
    probe = idx.hashes[len(idx) // 2]
    pos = int(idx.find(probe))
    assert pos >= 0 and idx.hashes[pos] == probe
    # first occurrence semantics
    assert pos == int(np.searchsorted(idx.hashes, probe))
    # reference quirk: globally smallest hash is not reachable
    assert int(idx.find(idx.hashes[0])) == -1
    # missing hash
    assert int(idx.find(np.uint64(12345))) in (-1,) or idx.hashes[int(idx.find(np.uint64(12345)))] == np.uint64(12345)
    # counts
    c = int(idx.get_count(pos))
    assert c >= 1
    assert np.all(idx.hashes[pos : pos + c] == probe)


def test_sti_roundtrip(tmp_path):
    contigs = [random_dna(20000, seed=21)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    sti = tmp_path / "x.sti"
    idx.write(str(sti))
    idx2 = StrobemerIndex(refs, params)
    idx2.read(str(sti))
    np.testing.assert_array_equal(idx.hashes, idx2.hashes)
    np.testing.assert_array_equal(idx.positions, idx2.positions)
    np.testing.assert_array_equal(idx.packed, idx2.packed)
    np.testing.assert_array_equal(idx.randstrobe_start_indices, idx2.randstrobe_start_indices)
    assert idx.filter_cutoff == idx2.filter_cutoff


def test_sti_wrong_bucket_table_size_rejected(tmp_path):
    """A .sti whose start-index vector length differs from
    (1 << bits) + 1 must raise InvalidIndexFile, not load silently:
    the native engine's ix_find would read buckets[top + 1] past the
    end of a short table. (Regression: this check was stranded as dead
    code when the mmap sidecar landed.)"""
    import struct

    from rabbitsalign_tpu.index.strobemer_index import InvalidIndexFile

    contigs = [random_dna(20000, seed=31)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    sti = tmp_path / "x.sti"
    idx.write(str(sti))

    blob = bytearray(sti.read_bytes())
    m = idx.randstrobe_start_indices.shape[0]
    # the m field sits 8 * m + 8 bytes from the end; shrink the vector
    # by one entry and patch m to match (self-consistent, wrong size)
    off = len(blob) - 8 * m - 8
    assert struct.unpack_from("<Q", blob, off)[0] == m
    struct.pack_into("<Q", blob, off, m - 1)
    sti.write_bytes(bytes(blob[:-8]))

    idx2 = StrobemerIndex(refs, params)
    with pytest.raises(InvalidIndexFile):
        idx2.read(str(sti))


def test_columnar_mmap_sidecar(tmp_path):
    """write_columns/read_mmap: element-identical arrays + header fields,
    stale-sidecar invalidation on .sti change, and the parameter check
    read() would have performed."""
    import os

    from rabbitsalign_tpu.index.strobemer_index import InvalidIndexFile

    contigs = [random_dna(20000, seed=22), random_dna(5000, seed=23)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    sti = str(tmp_path / "x.sti")
    idx.write(sti)

    idx2 = StrobemerIndex(refs, params)
    assert not idx2.read_mmap(sti)  # no sidecar yet -> caller falls back
    idx.write_columns(sti)
    assert idx2.read_mmap(sti, warm=False)
    np.testing.assert_array_equal(idx.hashes, idx2.hashes)
    np.testing.assert_array_equal(idx.positions, idx2.positions)
    np.testing.assert_array_equal(idx.packed, idx2.packed)
    np.testing.assert_array_equal(
        idx.randstrobe_start_indices, idx2.randstrobe_start_indices)
    assert idx2.filter_cutoff == idx.filter_cutoff
    assert idx2.bits == idx.bits
    # lookup works on the memmapped columns
    probe = idx.hashes[len(idx) // 2]
    assert int(idx2.find(probe)) == int(idx.find(probe))

    # parameter mismatch must raise exactly like read()
    params300 = IndexParameters.from_read_length(300)
    idx3 = StrobemerIndex(refs, params300)
    with pytest.raises(InvalidIndexFile):
        idx3.read_mmap(sti, warm=False)

    # an mtime-only touch with identical bytes keeps the sidecar valid:
    # the content fingerprint, not mtime, is the key
    os.utime(sti, ns=(os.stat(sti).st_atime_ns,
                      os.stat(sti).st_mtime_ns + 1))
    idx4 = StrobemerIndex(refs, params)
    assert idx4.read_mmap(sti, warm=False)

    # ... but a same-size, mtime-preserved content swap (cp -p of a
    # stale .sti) IS detected by the fingerprint
    st = os.stat(sti)
    size = os.path.getsize(sti)
    with open(sti, "r+b") as f:
        f.seek(size - 9)
        b = f.read(1)
        f.seek(size - 9)
        f.write(bytes([b[0] ^ 0xFF]))
    os.utime(sti, ns=(st.st_atime_ns, st.st_mtime_ns))
    idx5 = StrobemerIndex(refs, params)
    assert not idx5.read_mmap(sti, warm=False)


@pytest.mark.skipif(not have_reference(), reason="reference tree not mounted")
def test_sti_byte_identical_with_reference(tmp_path):
    binary = build_golden("sti_golden")
    contigs = [
        random_dna(50000, seed=31)[:1000] + "N" * 300 + random_dna(30000, seed=32),
        random_dna(8000, seed=33),
        "ACGT" * 200,
    ]
    path = make_refs(tmp_path, contigs)
    golden_sti = tmp_path / "golden.sti"
    golden_csv = tmp_path / "golden.csv"
    subprocess.run(
        [str(binary), str(path), str(golden_sti), "0.0002", "150",
         str(golden_csv)],
        check=True,
        capture_output=True,
    )
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    mine_sti = tmp_path / "mine.sti"
    idx.write(str(mine_sti))
    assert golden_sti.read_bytes() == mine_sti.read_bytes()

    # --index-statistics CSV: byte-identical to the reference's
    # print_diagnostics (suffix get_count, integer-division e_count,
    # always-zero median — replicated bug-for-bug)
    from rabbitsalign_tpu.index.diagnostics import print_diagnostics

    mine_csv = tmp_path / "mine.csv"
    print_diagnostics(idx, str(mine_csv), params.syncmer.k)
    assert golden_csv.read_bytes() == mine_csv.read_bytes()

    # CRLF line endings: the reference's getline strips only '\n', so
    # '\r' bytes stay in names and sequences (junk bases at every line
    # break) — byte parity includes that quirk
    crlf = tmp_path / "crlf.fa"
    seq = random_dna(3000, seed=55)
    crlf.write_bytes(b">cr1 desc\r\n" + b"\r\n".join(
        seq[j : j + 60].encode() for j in range(0, len(seq), 60)) + b"\r\n")
    golden_crlf = tmp_path / "golden_crlf.sti"
    subprocess.run(
        [str(binary), str(crlf), str(golden_crlf), "0.0002", "150"],
        check=True, capture_output=True,
    )
    refs_c = References.from_fasta(str(crlf))
    assert refs_c.names[0] == "cr1"  # name cut at the space before '\r'
    assert b"\r" in refs_c.sequences[0] or b"\x0d" in refs_c.sequences[0]
    idx_c = StrobemerIndex(refs_c, params)
    idx_c.populate(0.0002)
    mine_crlf = tmp_path / "mine_crlf.sti"
    idx_c.write(str(mine_crlf))
    assert golden_crlf.read_bytes() == mine_crlf.read_bytes()

    # degenerate: one tiny contig whose index has a single hash value, so
    # the bucket pass sees zero hash changes (regression: the vectorized
    # bucket build crashed; the reference leaves every bucket at the end
    # guard)
    path2 = make_refs(tmp_path, [random_dna(50, seed=77)], name="tiny.fa")
    golden2 = tmp_path / "golden2.sti"
    subprocess.run(
        [str(binary), str(path2), str(golden2), "0.0002", "150"],
        check=True, capture_output=True,
    )
    refs2 = References.from_fasta(str(path2))
    idx2 = StrobemerIndex(refs2, params)
    idx2.populate(0.0002)
    mine2 = tmp_path / "mine2.sti"
    idx2.write(str(mine2))
    assert golden2.read_bytes() == mine2.read_bytes()


def test_columnar_sidecar_dense_probe_on_mtime_change(tmp_path):
    """An in-place same-size .sti rewrite (new mtime) is validated with
    the DENSE 64-probe fingerprint: a content change that the sparse
    3-probe (head/middle/tail) check cannot see must still invalidate
    the sidecar. Regression for the round-5 review finding that sti_sha
    alone ignored mtime entirely."""
    import os

    contigs = [random_dna(400_000, seed=41)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    sti = str(tmp_path / "big.sti")
    idx.write(sti)
    idx.write_columns(sti)
    size = os.path.getsize(sti)
    assert size > 600_000, "need a .sti big enough for probe gaps"
    # a byte outside all three sparse windows (head 64K, middle
    # size/2 +- 32K, tail 64K)
    off = 200_000
    assert off > 65536 and abs(off - size // 2) > 40000 \
        and off < size - 65536

    idx2 = StrobemerIndex(refs, params)
    assert idx2.read_mmap(sti, warm=False)  # fresh sidecar valid

    st = os.stat(sti)
    with open(sti, "r+b") as f:
        f.seek(off)
        b = f.read(1)
        f.seek(off)
        f.write(bytes([b[0] ^ 0xFF]))
    # keep the mtime: the sparse check (by design) cannot see this
    os.utime(sti, ns=(st.st_atime_ns, st.st_mtime_ns))
    idx3 = StrobemerIndex(refs, params)
    assert idx3.read_mmap(sti, warm=False), \
        "sparse-probe blind spot is accepted by design when mtime matches"
    # ... but with a NEW mtime (in-place rewrite) the dense probe runs
    # and must catch it
    os.utime(sti, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    idx4 = StrobemerIndex(refs, params)
    assert not idx4.read_mmap(sti, warm=False), \
        "mtime change must trigger the dense fingerprint"


def test_sti_corrupt_randstrobe_count_rejected(tmp_path):
    """A corrupted randstrobe-count field must raise InvalidIndexFile
    BEFORE allocating 16n bytes (the n-field sibling of the m-field
    validate-before-allocate fix): n is bounded by what the file can
    hold past the header."""
    import struct

    from rabbitsalign_tpu.index.strobemer_index import InvalidIndexFile

    contigs = [random_dna(20000, seed=37)]
    path = make_refs(tmp_path, contigs)
    refs = References.from_fasta(str(path))
    params = IndexParameters.from_read_length(150)
    idx = StrobemerIndex(refs, params)
    idx.populate(0.0002)
    sti = tmp_path / "x.sti"
    idx.write(str(sti))

    blob = bytearray(sti.read_bytes())
    n = idx.hashes.shape[0]
    m = idx.randstrobe_start_indices.shape[0]
    off = len(blob) - 8 * m - 8 - 16 * n - 8  # the n field
    assert struct.unpack_from("<Q", blob, off)[0] == n
    struct.pack_into("<Q", blob, off, 1 << 56)  # ~1 EB of records
    sti.write_bytes(bytes(blob))

    idx2 = StrobemerIndex(refs, params)
    with pytest.raises(InvalidIndexFile, match="exceeds file size"):
        idx2.read(str(sti))
