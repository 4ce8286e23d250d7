"""Two real OS processes forming a jax.distributed pod (local
coordinator) and mapping a shared input — the multi-host path exercised
with actual process isolation, not in-process simulation:

* each process joins the pod (jax.distributed.initialize),
* maps its round-robin chunk shard with the production NativePipeline
  (SE reads: PE insert-size history is per-host cumulative state, so
  only SE output is byte-comparable across shardings — same contract
  as the reference's per-thread estimators),
* writes an output shard + manifest (ShardWriter),
* reduces statistics across the pod (psum_statistics),
* the merged shards (merge_output) must be byte-identical to a
  single-process run of the same input.

This converts parallel/multihost.py from "written" to "validated": the
pod handshake, the cross-process allgather reduction, and the manifest
merge all run for real.
"""

import json
import os
import random
import socket
import subprocess
import sys

import pytest

from .util import random_dna

try:
    from rabbitsalign_tpu.native.engine import engine_available

    HAVE_ENGINE = engine_available()
except Exception:  # pragma: no cover
    HAVE_ENGINE = False

pytestmark = pytest.mark.skipif(not HAVE_ENGINE, reason="native engine unavailable")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_matches_single(tmp_path):
    r = random.Random(17)
    genome = random_dna(150_000, seed=17)
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">chrM\n" + genome + "\n")

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    p1 = tmp_path / "se.fq"
    with open(p1, "w") as f1:
        for i in range(1600):
            st = r.randrange(0, len(genome) - 200)
            a = list(genome[st : st + 150])
            a[r.randrange(150)] = r.choice("ACGT")
            rd = "".join(a)
            if i % 4 == 2:
                rd = "".join(comp[c] for c in reversed(rd))
            f1.write(f"@s{i}\n{rd}\n+\n{'I'*150}\n")
    p2 = tmp_path / "none"  # SE: no mate file

    out_base = str(tmp_path / "pod.sam")
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device per process
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(ref_fa),
             str(p1), "", out_base],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    # pod-reduced statistics must be identical on every host and sum the
    # per-host read counts
    stats = [json.loads(o.split("STATS ", 1)[1]) for o in outs]
    assert stats[0] == stats[1]
    assert stats[0]["reads"] == 1600.0

    from rabbitsalign_tpu.parallel.multihost import merge_output

    merge_output(out_base, 2)

    # single-process golden over the same input
    from rabbitsalign_tpu.align.aligner import AlignmentParameters
    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
    from rabbitsalign_tpu.io.fasta import References
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    refs = References.from_fasta(str(ref_fa))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(mp.rescue_level * index.filter_cutoff, 1000)
    pipe = NativePipeline(index, params, refs, ap, mp, use_device=False)
    single = []
    n_single = pipe.map_file(str(p1), "", False, 100, single.append)
    assert n_single == 1600

    merged = open(out_base, "rb").read()
    assert merged == b"".join(single)


def test_two_process_pod_sharded_index(tmp_path):
    """BASELINE config 5's sharded-index clause for real: the index is
    GENUINELY split across two OS processes (each keeps only its
    PodShardedIndex hash-range slice; the full host arrays are replaced
    by empty ones so a stray host-index access crashes), remote-owned
    keys are exchanged over the TCP side channel, and the merged pod
    output must be byte-identical to a single-process full-index run."""
    r = random.Random(23)
    genome = random_dna(120_000, seed=23)
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">chrS\n" + genome + "\n")

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    p1 = tmp_path / "se.fq"
    with open(p1, "w") as f1:
        for i in range(1200):
            st = r.randrange(0, len(genome) - 200)
            a = list(genome[st : st + 150])
            for _ in range(r.randrange(0, 4)):
                a[r.randrange(150)] = r.choice("ACGT")
            rd = "".join(a)
            if i % 4 == 2:
                rd = "".join(comp[c] for c in reversed(rd))
            if i % 17 == 5:  # unmappable -> rescue lookups cross hosts too
                rd = "".join(r.choice("ACGT") for _ in range(150))
            f1.write(f"@s{i}\n{rd}\n+\n{'I'*150}\n")

    out_base = str(tmp_path / "podshard.sam")
    coord = f"127.0.0.1:{_free_port()}"
    peers = f"127.0.0.1:{_free_port()},127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(ref_fa),
             str(p1), "", out_base, "shard", peers],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())
    stats = [json.loads(o.split("STATS ", 1)[1]) for o in outs]
    assert stats[0] == stats[1]
    assert stats[0]["reads"] == 1200.0
    assert stats[0].get("feed_miss", 0) == 0.0  # RunFeed never missed

    from rabbitsalign_tpu.parallel.multihost import merge_output

    merge_output(out_base, 2)

    # single-process, full-index golden
    from rabbitsalign_tpu.align.aligner import AlignmentParameters
    from rabbitsalign_tpu.index.params import IndexParameters
    from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
    from rabbitsalign_tpu.io.fasta import References
    from rabbitsalign_tpu.map.common import MappingParameters
    from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

    refs = References.from_fasta(str(ref_fa))
    params = IndexParameters.from_read_length(150)
    index = StrobemerIndex(refs, params)
    index.populate(0.0002)
    ap = AlignmentParameters()
    mp = MappingParameters(r=150)
    mp.rescue_cutoff = min(mp.rescue_level * index.filter_cutoff, 1000)
    pipe = NativePipeline(index, params, refs, ap, mp, use_device=False)
    single = []
    n_single = pipe.map_file(str(p1), "", False, 100, single.append)
    assert n_single == 1200

    merged = open(out_base, "rb").read()
    assert merged == b"".join(single)


def test_pod_sharded_cli_end_to_end(tmp_path):
    """The --pod-index-peers CLI surface: two real `rabbitsalign-tpu`
    processes form the pod, each holding only its index slice, and the
    merged SAM equals a plain single-process CLI run (modulo @PG CL)."""
    r = random.Random(31)
    genome = random_dna(100_000, seed=31)
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">chrC\n" + genome + "\n")
    p1 = tmp_path / "se.fq"
    with open(p1, "w") as f1:
        for i in range(800):
            st = r.randrange(0, len(genome) - 200)
            a = list(genome[st : st + 150])
            for _ in range(r.randrange(0, 4)):
                a[r.randrange(150)] = r.choice("ACGT")
            f1.write(f"@s{i}\n{''.join(a)}\n+\n{'I'*150}\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    single = subprocess.run(
        ["rabbitsalign-tpu", "--no-tpu", str(ref_fa), str(p1)],
        capture_output=True, env=env, cwd="/root/repo")
    assert single.returncode == 0, single.stderr.decode()[-800:]

    out = str(tmp_path / "pod.sam")
    coord = f"127.0.0.1:{_free_port()}"
    peers = f"127.0.0.1:{_free_port()},127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            ["rabbitsalign-tpu", "--no-tpu", "-o", out,
             "--num-nodes", "2", "--node-id", str(pid),
             "--coordinator", coord, "--pod-index-peers", peers,
             str(ref_fa), str(p1)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd="/root/repo")
        for pid in (0, 1)
    ]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    merged = open(out).read().splitlines()
    want = single.stdout.decode().splitlines()
    merged = [l for l in merged if not l.startswith("@PG")]
    want = [l for l in want if not l.startswith("@PG")]
    assert merged == want
