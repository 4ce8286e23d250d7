"""Attribute the pass0-after-warmup anomaly at 3 Gbp scale.

Round 4 observed (docs/PERF.md §4): after the warmup pass, the FIRST
timed pass at the 3 Gbp config is 2-8x slower than later passes —
repeatable, NOT tunnel reconnect (idle roundtrips <=47 ms), NOT an
async-dispatch drain (a sleep makes it worse). Remaining candidates:
(a) khugepaged / page migration against the freshly-touched ~12 GB of
index, (b) jax/axon client housekeeping after the warmup burst.

This probe runs the exact bench scale config but instruments EVERY pass
with deltas of:
  * getrusage: minflt / majflt / nvcsw / nivcsw / utime / stime
  * /proc/vmstat: thp_fault_alloc, thp_collapse_alloc,
    pgmigrate_success, compact_stall, numa_* (when present)
  * engine phase timers (per-pass)

Interpretation rule: if pass0's excess wall co-moves with
pgmigrate/compact/thp counters -> (a); if it shows as stime/involuntary
context switches with flat vm counters -> (b); if neither moves, the
time is outside this process (ambient).

Usage (needs the bench scale cache; build once with RSB_BENCH_SCALE=1):
    python tests/sanitize/pass0_probe.py [n_passes]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench  # noqa: E402


def vmstat():
    out = {}
    try:
        with open("/proc/vmstat") as f:
            for line in f:
                k, v = line.split()
                out[k] = int(v)
    except OSError:
        pass
    keys = [k for k in out if k.startswith(("thp_", "pgmigrate", "compact",
                                            "numa_pages"))]
    return {k: out[k] for k in keys}


def rusage():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return {"minflt": r.ru_minflt, "majflt": r.ru_majflt,
            "nvcsw": r.ru_nvcsw, "nivcsw": r.ru_nivcsw,
            "utime": r.ru_utime, "stime": r.ru_stime}


def thread_cpu():
    """Per-thread cumulative CPU seconds (utime+stime) from
    /proc/self/task/*/stat, keyed by '<name>:<tid>' — attributes which
    THREADS inside this process burn the pass0 excess (RUSAGE_SELF sums
    all threads; the mapping thread vs the jax/axon client threads is
    the question)."""
    tick = os.sysconf("SC_CLK_TCK")
    out = {}
    base = "/proc/self/task"
    try:
        tids = os.listdir(base)
    except OSError:
        return out
    for tid in tids:
        try:
            with open(f"{base}/{tid}/stat") as f:
                st = f.read()
            # comm may contain spaces — it is parenthesized
            rest = st.rsplit(")", 1)[1].split()
            name = st[st.index("(") + 1: st.rindex(")")]
            ut, stm = int(rest[11]), int(rest[12])  # fields 14,15
            out[f"{name}:{tid}"] = (ut + stm) / tick
        except (OSError, ValueError, IndexError):
            pass
    return out


def cpu_mhz():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("cpu MHz"):
                    return float(line.split(":")[1])
    except OSError:
        pass
    return 0.0


def delta(a, b):
    return {k: (round(b[k] - a[k], 3) if isinstance(b[k], float)
                else b[k] - a[k]) for k in b if k in a}


def main():
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"probe: platform={jax.devices()[0].platform}", file=sys.stderr)

    sti = bench._scale_sti_path()
    assert os.path.exists(sti), (
        "scale cache missing — run RSB_BENCH_SCALE=1 python bench.py once")
    cache_dir = os.path.dirname(sti)
    n_bp = int(bench.SCALE_GENOME_MB * 1e6)
    gpath = os.path.join(cache_dir, f"genome_{n_bp}_9999.bin")
    rkey = (f"{n_bp}_{bench.N_SCALE_PAIRS}x{bench.READ_LEN}"
            f"_v{bench.SIM_VERSION}_17")
    q1 = os.path.join(cache_dir, f"reads1_{rkey}.fq")
    q2 = os.path.join(cache_dir, f"reads2_{rkey}.fq")
    with open(gpath, "rb") as f:
        genome = f.read()
    refs, params, index = bench.build_index(genome, "grch38",
                                            cache_tag="scale3g")
    del genome

    from rabbitsalign_tpu.align.aligner import AlignmentParameters
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    aln_params = AlignmentParameters()
    map_param = MappingParameters(r=bench.READ_LEN)
    map_param.rescue_cutoff = min(
        map_param.rescue_level * index.filter_cutoff, 1000)
    sink = []
    chunk = 8000

    from rabbitsalign_tpu.utils.logger import logger
    logger.set_level("debug")

    warm = NativePipeline(index, params, refs, aln_params, map_param,
                          use_device=on_tpu)
    t0 = time.perf_counter()
    warm.map_file(q1, q2, False, chunk, sink.append)
    print(f"probe: warmup {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    warmer = getattr(index, "_warmer", None)
    if warmer is not None and warmer.is_alive():
        t0 = time.perf_counter()
        warmer.join(600)
        print(f"probe: waited {time.perf_counter()-t0:.1f}s more for the "
              f"warmer (stream + random-access warm)", file=sys.stderr)

    rows = []
    for i in range(n_passes):
        pipeline = NativePipeline(index, params, refs, aln_params, map_param,
                                  use_device=on_tpu)
        r0, v0, tc0 = rusage(), vmstat(), thread_cpu()
        mhz0 = cpu_mhz()
        t0 = time.perf_counter()
        n = pipeline.map_file(q1, q2, False, chunk, sink.append)
        wall = time.perf_counter() - t0
        dr, dv = delta(r0, rusage()), delta(v0, vmstat())
        tc1 = thread_cpu()
        dtc = {k: round(tc1[k] - tc0.get(k, 0.0), 3)
               for k in tc1 if tc1[k] - tc0.get(k, 0.0) > 0.02}
        t = pipeline.engine.timers()
        rows.append((wall, n, dr, dv, t))
        print(f"pass{i}: wall={wall:.2f}s ({n/wall:,.0f} r/s) "
              f"seed+nam={t['seed_nam_s']:.2f} phaseA={t['phase_a_s']:.2f} "
              f"phaseB={t['phase_b_s']:.2f} mhz={mhz0:.0f}->{cpu_mhz():.0f}",
              file=sys.stderr)
        print(f"  rusage: {dr}", file=sys.stderr)
        print(f"  thread cpu (>20ms): "
              f"{dict(sorted(dtc.items(), key=lambda kv: -kv[1]))}",
              file=sys.stderr)
        moved = {k: v for k, v in dv.items() if v}
        print(f"  vmstat moved: {moved}", file=sys.stderr)

    w0 = rows[0][0]
    wrest = min(r[0] for r in rows[1:]) if len(rows) > 1 else w0
    print(f"probe: pass0/best-of-rest wall ratio = {w0/wrest:.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
