"""Reference-ordered sorting.

The reference sorts NAMs, hits and alignment candidates with libstdc++'s
(unstable) std::sort; with equal keys the resulting order is an introsort
artifact that the downstream tie-breaking (dropoff iteration, reservoir
sampling, dedup-keep-first) then consumes — i.e. it is observable output.
`introsort` reorders a list with exactly that permutation via the native
helper (an index-array std::sort performs the same comparison/swap
sequence); without the native library it falls back to a stable sort,
which only differs in equal-key tie order.
"""

from __future__ import annotations


def introsort(lst: list, keys, descending: bool) -> None:
    import numpy as np

    if len(lst) < 2:
        return
    perm = None
    try:
        from ..native import sort_perm
    except Exception:  # pragma: no cover - native library unavailable
        perm = None
    else:
        # key-conversion errors (e.g. a packed key overflowing uint64)
        # must PROPAGATE: silently falling back to the stable sort would
        # lose the std::sort tie permutation this module exists for
        perm = sort_perm(
            np.asarray(keys, dtype=np.float64 if descending else np.uint64),
            descending,
        )
    if perm is None:
        perm = sorted(range(len(lst)),
                      key=(lambda i: -keys[i]) if descending else (lambda i: keys[i]))
    lst[:] = [lst[i] for i in perm]
