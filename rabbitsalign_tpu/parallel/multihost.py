"""Multi-host data-parallel mapping over jax.distributed.

The reference has no distributed layer (single process + one GPU,
/root/reference/src/pc.cpp); this is the TPU-native scale-out design
(SURVEY.md §2.7): every host runs the same binary, `jax.distributed`
forms the pod, read chunks are sharded across hosts by chunk index
(round-robin, so no coordination is needed beyond the deterministic
chunk numbering the ordered output already relies on), each host maps
its shard with its local chips through the normal NativePipeline /
ThreadedNativePipeline, writes a per-host output shard, and global
statistics reduce with a psum over the pod mesh.

Output merging: per-host files named ``<out>.part<P>of<N>`` interleave
by chunk index; `merge_output` concatenates them in chunk order (each
part records its chunk indices in a sidecar). For SAM the header is
written only by host 0.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Tuple

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op for a single process) and return
    (process_index, process_count)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()  # env-configured pod
    return jax.process_index(), jax.process_count()


def shard_chunks(
    chunks: Iterable, process_index: int, process_count: int
) -> Iterable:
    """Round-robin chunk sharding by chunk index: host p maps chunks with
    index % process_count == p. Every host reads the input stream (cheap
    relative to mapping; index parsing is sequential) but only seeds and
    aligns its own shard."""
    for item in chunks:
        chunk_index = item[0]
        if chunk_index % process_count == process_index:
            yield item


class ShardWriter:
    """Writes one host's output shard plus a chunk-index manifest so the
    shards can be merged back into global chunk order."""

    def __init__(self, base_path: str, process_index: int, process_count: int):
        self.process_count = process_count
        self.process_index = process_index
        if process_count == 1:
            self.path = base_path
        else:
            self.path = f"{base_path}.part{process_index}of{process_count}"
        self._f = open(self.path, "wb")
        self._manifest: List[Tuple[int, int]] = []  # (chunk_index, n_bytes)

    def write_chunk(self, chunk_index: int, text) -> None:
        data = text if isinstance(text, bytes) else text.encode()
        self._f.write(data)
        self._manifest.append((chunk_index, len(data)))

    def close(self) -> None:
        self._f.close()
        if self.process_count > 1:
            with open(self.path + ".manifest", "w") as m:
                json.dump(self._manifest, m)


def merge_output(base_path: str, process_count: int, header: str = "") -> None:
    """Merge per-host shards into `base_path` in global chunk order."""
    parts = []
    for p in range(process_count):
        path = f"{base_path}.part{p}of{process_count}"
        with open(path + ".manifest") as m:
            manifest = json.load(m)
        offsets = []
        off = 0
        for chunk_index, n in manifest:
            offsets.append((chunk_index, off, n))
            off += n
        parts.append((path, offsets))
    entries = []
    for path, offsets in parts:
        for chunk_index, off, n in offsets:
            entries.append((chunk_index, path, off, n))
    entries.sort()
    with open(base_path, "wb") as out:
        if header:
            out.write(header.encode())
        handles = {path: open(path, "rb") for path, _ in parts}
        try:
            for _, path, off, n in entries:
                f = handles[path]
                f.seek(off)
                out.write(f.read(n))
        finally:
            for f in handles.values():
                f.close()


def psum_statistics(values: dict) -> dict:
    """Reduce per-host statistics across the pod with a psum over the
    global device mesh (the analog of summing per-thread stats at exit,
    reference src/main.cpp:597-615)."""
    import jax

    keys = sorted(values)
    local = np.array([float(values[k]) for k in keys], dtype=np.float64)
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    total = np.asarray(gathered).reshape(jax.process_count(), -1).sum(axis=0)
    return {k: total[i] for i, k in enumerate(keys)}
