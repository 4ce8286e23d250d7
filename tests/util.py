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
