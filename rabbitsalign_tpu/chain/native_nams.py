"""Chunk-level NAM finding through the native accelerator.

`find_nams_chunk` runs seeding + index lookup + NAM chaining (+ rescue)
for a whole list of reads in one C++ call and returns per-read NAM lists
identical to the Python path (seed/randstrobes.py + chain/nams.py).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from ..index.params import IndexParameters
from ..index.strobemer_index import StrobemerIndex
from ..native import load_seednam
from .nams import Nam


def native_available() -> bool:
    return load_seednam() is not None


def find_nams_chunk(
    seqs: List[bytes],
    index: StrobemerIndex,
    params: IndexParameters,
    rescue_cutoff: int,
    rescue_level: int,
) -> Tuple[List[List[Nam]], np.ndarray, np.ndarray]:
    """Returns (nams per read, nonrepetitive_fraction (n,), used_rescue (n,)).

    When rescue_level <= 1 no rescue is attempted (reference
    src/aln.cpp:2337-2344)."""
    lib = load_seednam()
    assert lib is not None

    n = len(seqs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    blob = b"".join(seqs)
    blob_arr = np.frombuffer(blob, dtype=np.uint8) if blob else np.zeros(1, np.uint8)

    sp = params.syncmer
    rp = params.randstrobe
    handle = lib.seednam_chunk(
        index.hashes.ctypes.data,
        index.positions.ctypes.data,
        index.packed.ctypes.data,
        index.randstrobe_start_indices.ctypes.data,
        ctypes.c_uint64(index.hashes.shape[0]),
        index.bits,
        ctypes.c_uint32(index.filter_cutoff),
        blob_arr.ctypes.data,
        offsets.ctypes.data,
        ctypes.c_int64(n),
        sp.k, sp.s, sp.t_syncmer,
        rp.w_min, rp.w_max,
        ctypes.c_uint64(rp.q), rp.max_dist,
        ctypes.c_uint32(rescue_cutoff), rescue_level,
    )
    try:
        total = lib.seednam_total_nams(handle)
        nam_offsets = np.zeros(n + 1, dtype=np.int64)
        flat_int = np.zeros((max(total, 1), 10), dtype=np.int32)
        flat_score = np.zeros(max(total, 1), dtype=np.float32)
        nonrep = np.zeros(n, dtype=np.float32)
        used_rescue = np.zeros(n, dtype=np.int32)
        lib.seednam_copy(
            handle,
            nam_offsets.ctypes.data,
            flat_int.ctypes.data,
            flat_score.ctypes.data,
            nonrep.ctypes.data,
            used_rescue.ctypes.data,
        )
    finally:
        lib.seednam_free(handle)

    out: List[List[Nam]] = []
    flat_rows = flat_int[:total].tolist() if total else []
    scores = flat_score[:total].tolist() if total else []
    for r in range(n):
        lo, hi = int(nam_offsets[r]), int(nam_offsets[r + 1])
        nams = [
            Nam(
                row[0], row[1], row[2], row[3], row[4], row[5], row[6],
                row[7], row[8], scores[j], bool(row[9]),
            )
            for j in range(lo, hi)
            for row in (flat_rows[j],)
        ]
        out.append(nams)
    return out, nonrep, used_rescue
