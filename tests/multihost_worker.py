"""Subprocess body for the two-process multi-host test.

Each invocation is one 'host': it joins the pod via jax.distributed
(local coordinator), maps its round-robin chunk shard through the
production NativePipeline, writes its output shard + manifest, reduces
statistics over the pod, and prints the reduced stats as JSON.

Usage: python multihost_worker.py <coord> <nprocs> <pid> <ref.fa>
       <r1.fq> <r2.fq> <out_base>
"""

import json
import os
import sys


def main() -> int:
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ref_fa, r1, r2, out_base = sys.argv[4:8]

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

    pipe = NativePipeline(index, params, refs, ap, mp, use_device=False)
    writer = ShardWriter(out_base, process_index, process_count)
    n_reads = pipe.map_file_sharded(
        r1, r2 or "", False, 100, writer, process_index, process_count
    )
    writer.close()

    stats = psum_statistics({"reads": float(n_reads), **{
        k: float(v) for k, v in pipe.counters().items()
    }})
    print("STATS " + json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
