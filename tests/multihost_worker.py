"""Subprocess body for the two-process multi-host test.

Each invocation is one 'host': it joins the pod via jax.distributed
(local coordinator), maps its round-robin chunk shard through the
production NativePipeline, writes its output shard + manifest, reduces
statistics over the pod, and prints the reduced stats as JSON.

Usage: python multihost_worker.py <coord> <nprocs> <pid> <ref.fa>
       <r1.fq> <r2.fq> <out_base> [shard <peer0,peer1,...>]

With the optional "shard" mode the strobemer index is GENUINELY split
across the pod: this process keeps only its PodShardedIndex slice, the
full host arrays are replaced by empty ones (so any residual host-index
access would crash loudly), and every lookup routes by hash ownership —
remote-owned keys go to the owning process over the TCP side channel.
"""

import json
import os
import sys


def main() -> int:
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ref_fa, r1, r2, out_base = sys.argv[4:8]
    shard_mode = len(sys.argv) > 8 and sys.argv[8] == "shard"
    peers = sys.argv[9].split(",") if shard_mode else []

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rabbitsalign_tpu.parallel.multihost import (
        ShardWriter,
        init_distributed,
        psum_statistics,
    )

    process_index, process_count = init_distributed(coord, nprocs, pid)
    assert process_count == nprocs, (process_index, process_count)

    from rabbitsalign_tpu.align.aligner import AlignmentParameters
    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
    from rabbitsalign_tpu.io.fasta import References
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    refs = References.from_fasta(ref_fa)
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)

    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(mp.rescue_level * index.filter_cutoff, 1000)

    if shard_mode:
        import numpy as np

        from rabbitsalign_tpu.parallel.multihost import PodShardedIndex

        pod = PodShardedIndex(index, process_index, process_count, peers)
        # genuine split: drop the full host arrays — the RunFeed path
        # must never touch them (a stray access now fails loudly)
        index.hashes = np.zeros(0, dtype=np.uint64)
        index.positions = np.zeros(0, dtype=np.uint32)
        index.packed = np.zeros(0, dtype=np.uint32)
        pipe = NativePipeline(index, params, refs, ap, mp, use_device=False,
                              shard_index=True, sharded_index=pod)
    else:
        pipe = NativePipeline(index, params, refs, ap, mp, use_device=False)
    import time

    chunk = int(os.environ.get("RSB_POD_CHUNK", "100"))
    writer = ShardWriter(out_base, process_index, process_count)
    t0 = time.perf_counter()
    n_reads = pipe.map_file_sharded(
        r1, r2 or "", False, chunk, writer, process_index, process_count
    )
    wall = time.perf_counter() - t0
    writer.close()

    pod_stats = {}
    if shard_mode:
        pod_stats = {f"pod_{k}": float(v) for k, v in pod.stats.items()}
    print(f"WALL {wall:.3f}")  # this process's map wall (pre-reduce)
    stats = psum_statistics({"reads": float(n_reads), "wall": wall, **{
        k: float(v) for k, v in pipe.counters().items()
    }, **pod_stats})
    print("STATS " + json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
