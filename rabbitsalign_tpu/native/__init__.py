"""Native (C++) runtime accelerators, loaded via ctypes.

Compiled on demand with g++ -O3 into a per-user cache; every accelerated
path has a pure-Python equivalent used as a fallback (and as the golden
implementation in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_CACHE = Path(
    os.environ.get(
        "RABBITSALIGN_TPU_CACHE", os.path.expanduser("~/.cache/rabbitsalign_tpu")
    )
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(name: str, deps: tuple = ()) -> Optional[Path]:
    src = _SRC_DIR / f"{name}.cpp"
    out = _CACHE / f"{name}.so"
    _CACHE.mkdir(parents=True, exist_ok=True)
    newest = max([src.stat().st_mtime]
                 + [(_SRC_DIR / d).stat().st_mtime for d in deps])
    if out.exists() and out.stat().st_mtime >= newest:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", str(src), "-o", str(out), "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"rabbitsalign_tpu: native build failed ({e}); "
              "falling back to Python host path", file=sys.stderr)
        return None
    return out


def load_seednam() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime (engine.cpp, which
    also exports the seed+NAM accelerator entry points), or None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("RABBITSALIGN_TPU_NO_NATIVE"):
        return None
    path = _build("engine", deps=("seednam.cpp",))
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.seednam_chunk.restype = ctypes.c_void_p
    lib.seednam_chunk.argtypes = [
        ctypes.c_void_p,  # hashes
        ctypes.c_void_p,  # positions
        ctypes.c_void_p,  # packed
        ctypes.c_void_p,  # buckets
        ctypes.c_uint64,  # n_index
        ctypes.c_int,     # bits
        ctypes.c_uint32,  # filter_cutoff
        ctypes.c_void_p,  # seqs
        ctypes.c_void_p,  # offsets
        ctypes.c_int64,   # n_reads
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # k s t
        ctypes.c_int, ctypes.c_int,                # wmin wmax
        ctypes.c_uint64, ctypes.c_int,             # qmask max_dist
        ctypes.c_uint32, ctypes.c_int,             # rescue_cutoff rescue_level
    ]
    lib.seednam_total_nams.restype = ctypes.c_int64
    lib.seednam_total_nams.argtypes = [ctypes.c_void_p]
    lib.seednam_copy.restype = None
    lib.seednam_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.seednam_free.restype = None
    lib.seednam_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _register_hamming(lib: ctypes.CDLL) -> None:
    lib.hamming_try.restype = ctypes.c_int
    lib.hamming_try.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]


_ham_vals = None
_ham_cigar = None
_ham_len = None


def hamming_try(query: bytes, ref: bytes, match: int, mismatch: int, end_bonus: int):
    """Native Hamming fast path: returns (score, seg_start, seg_end, edits,
    packed_cigar_ops list) when the <5% gate passes, else None. Falls back
    to None when the native library is unavailable (caller uses Python)."""
    global _ham_vals, _ham_cigar, _ham_len
    lib = load_seednam()
    if lib is None:
        return None  # no native library: caller uses the Python path
    if len(query) != len(ref) or len(query) == 0:
        return False  # gate cannot pass
    if _ham_vals is None:
        import numpy as np

        _ham_vals = np.zeros(4, dtype=np.int32)
        _ham_cigar = np.zeros(4096, dtype=np.uint32)
        _ham_len = np.zeros(1, dtype=np.int64)
    if not getattr(lib, "_hamming_configured", False):
        # per-CDLL: a test reset may hand out a fresh lib object whose
        # signatures (pointer widths!) must be registered again
        _register_hamming(lib)
        lib._hamming_configured = True
    ok = lib.hamming_try(
        query, ref, len(query), match, mismatch, end_bonus,
        _ham_vals.ctypes.data, _ham_cigar.ctypes.data, 4096, _ham_len.ctypes.data,
    )
    if not ok:
        return False  # gate failed: gapped alignment needed
    n = int(_ham_len[0])
    return (
        int(_ham_vals[0]), int(_ham_vals[1]), int(_ham_vals[2]), int(_ham_vals[3]),
        _ham_cigar[:n].tolist(),
    )


def robinhood_order(keys):
    """Iteration order of the reference's robin_hood::unordered_map after
    inserting `keys` (unique u32 ref_ids) in first-touch order — the tie
    order of equal-score NAMs on different contigs is downstream-observable
    (reference ext/robin_hood.h; simulated bit-exactly, fuzz-validated).
    Returns an int32 permutation, or None without the native library
    (callers then iterate in insertion order)."""
    import numpy as np

    lib = load_seednam()
    if lib is None:
        return None
    if not getattr(lib, "_rh_configured", False):
        lib.robinhood_iteration_order.restype = None
        lib.robinhood_iteration_order.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib._rh_configured = True
    arr = np.ascontiguousarray(keys, dtype=np.uint32)
    perm = np.empty(arr.shape[0], dtype=np.int32)
    # every reference construction site reserves 100 (src/nam.cpp:589 etc.)
    lib.robinhood_iteration_order(arr.ctypes.data, arr.shape[0], 100,
                                  perm.ctypes.data)
    return perm


def _register_sort(lib: ctypes.CDLL) -> None:
    lib.sort_perm_u64_asc.restype = None
    lib.sort_perm_u64_asc.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.sort_perm_f64_desc.restype = None
    lib.sort_perm_f64_desc.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib._sort_configured = True


def sort_perm(keys, descending: bool):
    """Permutation that sorts `keys` the way the reference's std::sort
    would (libstdc++ introsort — unstable, and its tie order is part of
    the reference's observable output). keys: uint64 array (ascending)
    or float64 array (descending). Returns an int32 index array, or None
    when the native library is unavailable (callers fall back to a
    stable sort; outputs then differ from the reference only in
    equal-key tie order)."""
    import numpy as np

    lib = load_seednam()
    if lib is None:
        return None
    if not getattr(lib, "_sort_configured", False):
        _register_sort(lib)
    n = keys.shape[0]
    perm = np.empty(n, dtype=np.int32)
    if descending:
        keys = np.ascontiguousarray(keys, dtype=np.float64)
        lib.sort_perm_f64_desc(keys.ctypes.data, n, perm.ctypes.data)
    else:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        lib.sort_perm_u64_asc(keys.ctypes.data, n, perm.ctypes.data)
    return perm
