"""Device-op tests on CPU: lax.scan wavefront SW vs the SSW port, host
traceback, and the multi-chip sharding helpers on a virtual mesh."""

import random

import numpy as np
import pytest

from rabbitsalign_tpu.align.ssw import ssw_align
from rabbitsalign_tpu.ops.sw_jax import SwParams, sw_forward
from rabbitsalign_tpu.ops.traceback import traceback_batch
from rabbitsalign_tpu.utils.dna import encode

from .util import random_dna

PARAMS = SwParams(2, 8, 12, 1)


def _pack(pairs, Q, T):
    B = len(pairs)
    qc = np.full((B, Q), 4, dtype=np.uint8)
    tc = np.full((B, T), 4, dtype=np.uint8)
    ql = np.zeros(B, dtype=np.int32)
    tl = np.zeros(B, dtype=np.int32)
    for i, (q, t) in enumerate(pairs):
        eq, et = encode(q), encode(t)
        qc[i, : eq.shape[0]] = eq
        tc[i, : et.shape[0]] = et
        ql[i] = eq.shape[0]
        tl[i] = et.shape[0]
    return qc, tc, ql, tl


def _mutate(s, r, nsub=0, nins=0, ndel=0):
    chars = list(s)
    for _ in range(nsub):
        chars[r.randrange(len(chars))] = r.choice("ACGT")
    for _ in range(nins):
        chars.insert(r.randrange(len(chars)), r.choice("ACGT"))
    for _ in range(ndel):
        del chars[r.randrange(len(chars))]
    return "".join(chars)


def test_sw_forward_matches_ssw():
    r = random.Random(31)
    Q, T = 64, 128
    pairs = []
    for i in range(24):
        core = random_dna(r.randint(30, 60), seed=500 + i)
        q = _mutate(core, r, r.randint(0, 4), r.randint(0, 1), r.randint(0, 1))[:Q]
        t = (random_dna(r.randint(0, 30), seed=i) + core + random_dna(r.randint(0, 30), seed=i + 1))[:T]
        pairs.append((q, t))
    pairs.append((random_dna(50, seed=1), random_dna(100, seed=2)))  # junk
    qc, tc, ql, tl = _pack(pairs, Q, T)
    score, t_end, q_end, dirs = map(np.asarray, sw_forward(qc, tc, ql, tl, PARAMS))
    res = traceback_batch(dirs, score, t_end, q_end, qc, tc)
    for i, (q, t) in enumerate(pairs):
        gold = ssw_align(encode(q), encode(t), 2, 8, 12, 1)
        if gold.score1 == 0:
            assert score[i] == 0
            continue
        assert (score[i], t_end[i], q_end[i]) == (gold.score1, gold.ref_end, gold.read_end), i
        tb = res[i]
        assert tb is not None
        assert (tb[0], tb[1]) == (gold.ref_begin, gold.read_begin), i
        assert str(tb[2].to_m()) == str(gold.cigar), i


def test_dryrun_multichip_cpu():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_find_matches_numpy():
    import jax

    from rabbitsalign_tpu.parallel.sharding import (
        make_mesh,
        shard_index_by_hash,
        sharded_find,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    rng = np.random.RandomState(3)
    n = 256
    hashes = np.sort(rng.randint(0, 2**62, n).astype(np.uint64))
    mesh = make_mesh(4)
    h_sh, _, _, starts = shard_index_by_hash(
        hashes, np.arange(n, dtype=np.uint32), np.zeros(n, np.uint32), 4
    )
    queries = np.concatenate([hashes[::5], np.array([7, 2**61], dtype=np.uint64)])
    got = np.asarray(sharded_find(mesh, h_sh, starts, queries))
    want_pos = np.searchsorted(hashes, queries)
    for i, q in enumerate(queries):
        w = int(want_pos[i])
        expected = w if w < n and hashes[w] == q else -1
        assert got[i] == expected


def test_dumpstrobes_tool(tmp_path):
    from rabbitsalign_tpu.tools.dumpstrobes import main as dump_main

    ref = tmp_path / "r.fa"
    ref.write_text(">c\n" + random_dna(5000, seed=4) + "\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert dump_main([str(ref)]) == 0
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) > 100
    f = lines[0].split("\t")
    assert f[0] == "c" and int(f[2]) > int(f[1])
