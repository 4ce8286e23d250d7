"""FASTQ/FASTA read input: chunked record reader for SE, PE and
interleaved inputs (role of reference src/fastq.{hpp,cpp} +
src/pc.cpp InputBuffer::read_records + RabbitFX chunking).

Records are parsed kseq-style: name is cut at the first whitespace.
"""

from __future__ import annotations

import gzip
from typing import Iterator, List, Optional, Tuple

from .sam import SamRecord


def _open(path: str):
    return gzip.open(path, "rb") if str(path).endswith(".gz") else open(path, "rb")


def parse_fastx(path: str) -> Iterator[SamRecord]:
    """Yield records from a FASTA or FASTQ file (optionally gzipped)."""
    with _open(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == b">":
            # FASTA
            name = f.readline().rstrip(b"\r\n")
            chunks: List[bytes] = []
            for raw in f:
                line = raw.rstrip(b"\r\n")
                if line.startswith(b">"):
                    yield _fasta_record(name, chunks)
                    name = line[1:]
                    chunks = []
                else:
                    chunks.append(line)
            yield _fasta_record(name, chunks)
        elif first == b"@":
            # FASTQ: 4 lines per record; the first '@' was already consumed
            name = f.readline().rstrip(b"\r\n")
            while True:
                seq = f.readline().rstrip(b"\r\n")
                plus = f.readline()
                qual = f.readline().rstrip(b"\r\n")
                if not plus:
                    break
                yield SamRecord(name.split()[0].decode() if name else "", seq, qual)
                header = f.readline()
                if not header:
                    break
                if not header.startswith(b"@"):
                    raise ValueError("malformed FASTQ record header")
                name = header[1:].rstrip(b"\r\n")
        else:
            raise ValueError(f"{path}: not a FASTA or FASTQ file")


def _fasta_record(name: bytes, chunks: List[bytes]) -> SamRecord:
    return SamRecord(name.split()[0].decode() if name else "", b"".join(chunks), b"")


def same_name(n1: str, n2: str) -> bool:
    """Names equal, or equal except for a trailing 1/2 after a separator
    (reference src/pc.cpp:23-36)."""
    if len(n1) != len(n2):
        return False
    if n1 == n2:
        return True
    if len(n1) < 2:
        return False
    if n1[:-1] != n2[:-1]:
        return False
    return n1[-1] == "1" and n2[-1] == "2"


class InputBuffer:
    """Chunked record supply for SE / PE / interleaved inputs."""

    def __init__(self, path1: str, path2: str = "", chunk_size: int = 10000,
                 is_interleaved: bool = False):
        self.path1 = path1
        self.path2 = path2
        self.chunk_size = chunk_size
        self.is_interleaved = is_interleaved

    def chunks(self) -> Iterator[Tuple[int, List[SamRecord], List[SamRecord], List[SamRecord]]]:
        """Yield (chunk_index, records1, records2, records3) where records3
        holds unpaired records from interleaved input."""
        if self.path2:
            it1 = parse_fastx(self.path1)
            it2 = parse_fastx(self.path2)
            idx = 0
            while True:
                r1 = []
                r2 = []
                for _ in range(self.chunk_size):
                    try:
                        r1.append(next(it1))
                    except StopIteration:
                        break
                    try:
                        r2.append(next(it2))
                    except StopIteration:
                        raise ValueError("paired input files have different lengths")
                if not r1:
                    break
                yield idx, r1, r2, []
                idx += 1
        elif self.is_interleaved:
            it = parse_fastx(self.path1)
            idx = 0
            pending: Optional[SamRecord] = None
            done = False
            while not done:
                r1: List[SamRecord] = []
                r2: List[SamRecord] = []
                r3: List[SamRecord] = []
                while len(r1) + len(r3) < self.chunk_size:
                    if pending is None:
                        try:
                            pending = next(it)
                        except StopIteration:
                            done = True
                            break
                    try:
                        nxt = next(it)
                    except StopIteration:
                        r3.append(pending)
                        pending = None
                        done = True
                        break
                    if same_name(pending.name, nxt.name):
                        r1.append(pending)
                        r2.append(nxt)
                        pending = None
                    else:
                        r3.append(pending)
                        pending = nxt
                if r1 or r3:
                    yield idx, r1, r2, r3
                    idx += 1
        else:
            it = parse_fastx(self.path1)
            idx = 0
            while True:
                r1 = []
                for _ in range(self.chunk_size):
                    try:
                        r1.append(next(it))
                    except StopIteration:
                        break
                if not r1:
                    break
                yield idx, r1, [], []
                idx += 1


def estimate_read_length(path1: str, path2: str = "") -> int:
    """Average length of the first 500 records (reference src/readlen.cpp)."""
    tot = 0
    n = 0
    for path in filter(None, [path1, path2]):
        for i, rec in enumerate(parse_fastx(path)):
            if i >= 500:
                break
            tot += len(rec.seq)
            n += 1
    if n == 0:
        return 150
    return tot // n
