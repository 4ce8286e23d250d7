"""Index diagnostics CSV (--index-statistics), mirroring
StrobemerIndex::print_diagnostics (reference src/index.cpp:311-390)."""

from __future__ import annotations

import numpy as np

from .strobemer_index import StrobemerIndex


def print_diagnostics(index: StrobemerIndex, logfile_name: str, k: int) -> None:
    max_size = 100000
    seed_lengths = (index.packed & 0xFF).astype(np.int64) + k
    # per-entry count of its hash
    _, inverse, counts = np.unique(index.hashes, return_inverse=True, return_counts=True)
    per_entry_count = counts[inverse]

    in_range = seed_lengths < max_size
    sl = seed_lengths[in_range]
    pc = per_entry_count[in_range]

    log_count = np.bincount(sl, minlength=max_size)
    log_count_squared = np.bincount(sl, weights=pc.astype(np.float64), minlength=max_size)
    tot_seed_count = int(sl.shape[0])
    tot_seed_count_sq = int(pc.sum())

    lim = pc <= 1000
    log_count_1000 = np.bincount(sl[lim], minlength=max_size)
    tot_seed_count_1000 = int(np.count_nonzero(lim))

    with open(logfile_name, "w") as f:
        for i in range(max_size):
            if log_count[i] > 0:
                e_count = log_count_squared[i] / log_count[i]
                f.write(f"{i},{log_count[i]},{e_count}\n")
        # median seed length
        n = 0
        median = 0
        for i in range(max_size):
            n += int(log_count[i])
            if n >= tot_seed_count // 2:
                median = i
                break
        f.write("E_size for total seeding wih max seed size m below (m, tot_seeds, E_hits)\n")
        e_hits = tot_seed_count_sq / tot_seed_count if tot_seed_count else 0.0
        fraction_masked = (
            1.0 - tot_seed_count_1000 / tot_seed_count if tot_seed_count else 0.0
        )
        f.write(f"{median},{tot_seed_count},{e_hits},{100 * fraction_masked}\n")
