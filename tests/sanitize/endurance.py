"""Endurance / memory-stability probe: many chunks through the
production pipeline, RSS sampled per pass — a leak (pooled chunks,
engine scratch, sidecar mappings, pod sockets) shows as monotone RSS
growth across passes. Host-only by default (JAX_PLATFORMS honored) so
the number is pipeline memory, not jax arena noise.

Run: python tests/sanitize/endurance.py [n_passes] [reads_per_pass]
Exit code 1 if steady-state RSS grows more than 10% over the second
half of the run."""

import os
import sys
import time

sys.path.insert(0, ".")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import bench
    from tests.util import write_synthetic_se_fastq

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 48000

    genome = bench.np_genome(int(40e6), 4321)
    # bench.build_index caches the .sti (pe40 tag) — same world as the
    # PE bench and the other sanitize probes, no per-run rebuild
    refs, params, index = bench.build_index(genome, "chr21",
                                            cache_tag="pe40")
    from rabbitsalign_tpu.align.aligner import AlignmentParameters
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import (
        NativePipeline,
        ThreadedNativePipeline,
    )

    gs = genome.decode() if isinstance(genome, bytes) else genome
    d = "/tmp/endurance"
    os.makedirs(d, exist_ok=True)
    fq = os.path.join(d, f"reads_{n_reads}.fq")
    if not os.path.exists(fq):
        write_synthetic_se_fastq(fq, gs, n_reads)

    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(mp.rescue_level * index.filter_cutoff, 1000)

    # alternate plain and threaded pipelines, a FRESH instance per pass
    # (the leak-prone path: construction/teardown of engines, pools,
    # queues, worker threads)
    series = []
    total = 0
    t_all = time.perf_counter()
    for p in range(n_passes):
        if p % 2 == 0:
            pipe = NativePipeline(index, params, refs, ap, mp,
                                  use_device=False)
        else:
            pipe = ThreadedNativePipeline(index, params, refs, ap, mp,
                                          use_device=False, n_workers=2)
        sink = []
        total += pipe.map_file(fq, "", False, 8000, sink.append)
        del pipe, sink
        series.append(rss_mb())
        print(f"pass {p:3d}: RSS {series[-1]:8.1f} MB", file=sys.stderr)
    dt = time.perf_counter() - t_all
    # compare SAME-PARITY passes (plain vs plain, threaded vs threaded):
    # the two pipeline types have a steady RSS offset (worker arenas,
    # queues) that must not read as leak growth
    growth = 0.0
    for parity in (0, 1):
        lane = series[parity::2]
        half = lane[len(lane) // 2:]
        if len(half) >= 2 and half[0] > 0:
            growth = max(growth, (half[-1] - half[0]) / half[0])
    print(f"endurance: {total} reads in {dt:.1f}s "
          f"({total/dt:,.0f} reads/s incl. construction), "
          f"worst same-parity second-half RSS growth {growth*100:+.1f}% "
          f"(final {series[-1]:.0f} MB)")
    if growth > 0.10:
        print("FAIL: steady-state RSS grew >10%", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
