"""Shared test helpers: golden generators built against /root/reference."""

import os
import random
import subprocess
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent / "golden_gen"
REFERENCE = Path("/root/reference")


def have_reference() -> bool:
    return REFERENCE.is_dir()


def build_golden(name: str) -> Path:
    """Build (once) and return the path of a golden generator binary."""
    binary = GOLDEN_DIR / name
    src = GOLDEN_DIR / f"{name}.cpp"
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["sh", str(GOLDEN_DIR / "build.sh")], check=True, capture_output=True)
    return binary


def random_dna(n: int, alphabet: str = "ACGT", seed=None) -> str:
    r = random.Random(seed) if seed is not None else random
    return "".join(r.choice(alphabet) for _ in range(n))


def free_port() -> int:
    """An OS-assigned free TCP port (for pod side-channel tests)."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def write_synthetic_se_fastq(path: str, genome: str, n_reads: int,
                             seed: int = 17, read_len: int = 150) -> None:
    """The shared SE workload of the pod/worker-scaling probes: ~0-3
    SNPs/read, every 4th reverse-complemented, every 50th unmappable
    (drives the rescue path). One definition so the probes measure the
    SAME input."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    r = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            st = r.randrange(0, len(genome) - read_len - 50)
            a = list(genome[st:st + read_len])
            for _ in range(r.randrange(0, 4)):
                a[r.randrange(read_len)] = r.choice("ACGT")
            rd = "".join(a)
            if i % 4 == 2:
                rd = "".join(comp[c] for c in reversed(rd))
            if i % 50 == 1:
                rd = "".join(r.choice("ACGT") for _ in range(read_len))
            f.write(f"@s{i}\n{rd}\n+\n{'I' * read_len}\n")
