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


def test_shard_index_by_hash_run_alignment():
    """Shard cuts must move to equal-hash run starts so no run straddles
    two shards (what makes per-shard counts/runs globally exact)."""
    from rabbitsalign_tpu.parallel.sharding import SENTINEL, shard_index_by_hash

    rng = np.random.RandomState(3)
    # heavy duplication so naive equal-size cuts would split runs
    base = np.sort(rng.randint(0, 50, 997).astype(np.uint64))
    h, p, k, r, starts = shard_index_by_hash(
        base, np.arange(997, dtype=np.uint32), np.zeros(997, np.uint32), 4
    )
    flat = []
    for s_ in range(4):
        row = h[s_][h[s_] != SENTINEL]
        if len(flat) and row.size:
            assert flat[-1] != row[0], "run split across shards"
        flat.extend(row.tolist())
    assert np.array_equal(np.array(flat, dtype=np.uint64), base)
    assert starts[0] == 0 and np.all(np.diff(starts) >= 0)


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


def _extend_parity_pairs(Q, T):
    """Random extend pairs incl. junk, empty, and a >RLE_M-run overflow
    case — shared by the Pallas (TPU) and portable (CPU) parity tests."""
    r = random.Random(77)
    pairs = []
    for i in range(40):
        core = random_dna(r.randint(60, 200), seed=900 + i)
        q = _mutate(core, r, r.randint(0, 6), r.randint(0, 2), r.randint(0, 2))[:Q]
        t = (random_dna(r.randint(0, 100), seed=i) + core
             + random_dna(r.randint(0, 100), seed=i + 1))[:T]
        pairs.append((q, t))
    pairs.append((random_dna(150, seed=1), random_dna(400, seed=2)))  # junk
    pairs.append(("", random_dna(100, seed=3)))  # empty query
    pairs.append((random_dna(100, seed=5), ""))  # empty target
    # overflow: a mismatch every 7th base keeps the local score climbing
    # (+12 - 8 per period) while generating ~2 runs per period -> >64 runs
    t_ov = random_dna(480, seed=6)
    q_ov = "".join(
        ("A" if t_ov[i] != "A" else "C") if i % 7 == 3 else t_ov[i]
        for i in range(252)
    )
    pairs.append((q_ov, t_ov))
    # pad the batch to a lane-aligned width (the engine always dispatches
    # full 256/512-wide buckets; unaligned lane counts are unsupported)
    while len(pairs) % 128:
        pairs.append(("", ""))
    return pairs


def _check_extend_parity(pairs, Q, T, out, sw=PARAMS):
    """Compare a packed device/portable extend output against the
    sw_jax + host-traceback golden."""
    from rabbitsalign_tpu.ops.extend_device import (
        RLE_M,
        ops_to_cigars,
        unpack_output,
    )

    qc, tc, ql, tl = _pack(pairs, Q, T)
    score_g, t_end_g, q_end_g, dirs_g = map(
        np.asarray, sw_forward(qc, tc, ql, tl, sw)
    )
    golden_tb = traceback_batch(dirs_g, score_g, t_end_g, q_end_g, qc, tc)

    (op_runs, len_runs, n_runs, score, t_end, q_end, t_begin, q_begin,
     edits) = unpack_output(out)
    cigars = ops_to_cigars(op_runs, len_runs, n_runs, score)

    saw_overflow = False
    for b in range(len(pairs)):
        assert score[b] == score_g[b], (b, score[b], score_g[b])
        if score_g[b] == 0:
            assert golden_tb[b] is None
            continue
        assert t_end[b] == t_end_g[b] and q_end[b] == q_end_g[b], b
        gt_begin, gq_begin, gcigar, gedits = golden_tb[b]
        if int(n_runs[b]) == 0xFFFF:
            saw_overflow = True
            assert len(gcigar.ops) > RLE_M  # genuine overflow
            assert cigars[b] is None
            continue
        assert t_begin[b] == gt_begin and q_begin[b] == gq_begin, b
        assert edits[b] == gedits, b
        assert cigars[b] is not None, b
        assert str(cigars[b][0]) == str(gcigar), b
    if sw == PARAMS:
        assert saw_overflow, "overflow case must exercise the 0xFFFF marker"


@pytest.mark.parametrize("sw", [
    SwParams(2, 8, 12, 1),   # defaults
    SwParams(1, 1, 2, 1),    # flat scoring: dense score ties
    SwParams(3, 2, 3, 0),    # free gap extension
])
def test_portable_extend_matches_host_traceback(sw):
    """The portable (lax.scan) fused extend path — forward + in-walk RLE
    traceback + packed output — must match the host traceback golden on
    CPU, including degenerate scoring (dense ties, zero-cost gap
    extension). This is the cross-check that also validates the Pallas
    traceback *semantics* without a TPU (the kernels share the walk and
    slot layout)."""
    from rabbitsalign_tpu.ops.extend_device import pack_input
    from rabbitsalign_tpu.ops.extend_portable import extend_batch_packed_portable

    Q, T = 256, 512
    pairs = _extend_parity_pairs(Q, T)
    qc, tc, ql, tl = _pack(pairs, Q, T)
    buf = pack_input(
        np.ascontiguousarray(qc.T), np.ascontiguousarray(tc.T), ql, tl
    )
    out = np.asarray(extend_batch_packed_portable(buf, Q, T, sw))
    _check_extend_parity(pairs, Q, T, out, sw)


def test_pallas_extend_matches_sw_jax_tpu():
    """Fused Pallas extend (int32 DP forward + in-walk RLE traceback)
    must reproduce the portable sw_jax + host-traceback golden exactly:
    scores, end/begin coordinates, cigars, edit counts, and the >RLE_M
    overflow marker. Needs a real TPU (run with
    RABBITSALIGN_TPU_TEST_TPU=1)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("pallas extend path needs a TPU")

    from rabbitsalign_tpu.ops.extend_device import extend_batch_packed, pack_input

    Q, T = 256, 512  # the production high-volume bucket shape
    pairs = _extend_parity_pairs(Q, T)
    qc, tc, ql, tl = _pack(pairs, Q, T)
    buf = pack_input(
        np.ascontiguousarray(qc.T), np.ascontiguousarray(tc.T), ql, tl
    )
    out = np.asarray(extend_batch_packed(buf, Q, T, PARAMS))
    _check_extend_parity(pairs, Q, T, out)
    # degenerate scoring stresses the unmasked-DP argument (pad paths
    # must lose best-cell ties via the min-t/min-q tie-break, not via
    # penalties): flat scores make ties dense
    sw2 = SwParams(1, 1, 2, 1)
    out2 = np.asarray(extend_batch_packed(buf, Q, T, sw2))
    _check_extend_parity(pairs, Q, T, out2, sw2)


def test_pick_dtype_env_gate(monkeypatch):
    """RSB_SW16 is an opt-IN: unset AND '0' must both select int32
    (regression: string truthiness made RSB_SW16=0 enable the 0.86x
    int16 path), '1' selects int16 when the score span bounds hold."""
    import jax.numpy as jnp

    from rabbitsalign_tpu.ops.sw_jax import SwParams
    from rabbitsalign_tpu.ops.sw_pallas import _pick_dtype

    p = SwParams(2, 8, 12, 1)
    monkeypatch.delenv("RSB_SW16", raising=False)
    assert _pick_dtype(152, 256, p) == jnp.int32
    monkeypatch.setenv("RSB_SW16", "0")
    assert _pick_dtype(152, 256, p) == jnp.int32
    monkeypatch.setenv("RSB_SW16", "1")
    assert _pick_dtype(152, 256, p) == jnp.int16
    # span bound fails (worst H = 100*512 alone exceeds 2^15)
    assert _pick_dtype(512, 2048, SwParams(100, 8, 12, 1)) == jnp.int32


def test_pallas_forward_int16_bitexact_tpu():
    """The opt-in int16 DP path (RSB_SW16=1; synthesized sign-bit
    compares, see _pick_dtype) must be BIT-EXACT vs the production
    int32 kernel: same scores, end coordinates, and every direction
    byte. Keeps the dormant 2x lever from rotting until the toolchain
    lowers native i16 compares. Needs a real TPU."""
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "cpu":
        pytest.skip("pallas extend path needs a TPU")

    from rabbitsalign_tpu.ops import sw_pallas

    rng = np.random.RandomState(7)
    Q, T, B = 152, 256, 256
    q = rng.randint(0, 5, (Q, B)).astype(np.uint8)  # includes N=4
    t = rng.randint(0, 5, (T, B)).astype(np.uint8)
    for i in range(B):  # plant real alignments with mutations
        ln = rng.randint(20, Q)
        st = rng.randint(0, T - ln)
        t[st:st + ln, i] = q[:ln, i]
        for _ in range(ln // 12):
            t[st + rng.randint(ln), i] = rng.randint(0, 4)
    ql = rng.randint(10, Q + 1, B).astype(np.int32)
    tl = rng.randint(10, T + 1, B).astype(np.int32)

    def run(dtype):
        orig = sw_pallas._pick_dtype
        sw_pallas._pick_dtype = lambda _q, _t, _p: dtype
        try:
            with jax.enable_x64(False):
                fn = jax.jit(lambda a, b, c, d:
                             sw_pallas._sw_forward_pallas_core(
                                 a, b, c, d, PARAMS))
                out = fn(jnp.asarray(q), jnp.asarray(t),
                         jnp.asarray(ql), jnp.asarray(tl))
                return [np.asarray(x) for x in out[:4]]
        finally:
            sw_pallas._pick_dtype = orig

    s32, te32, qe32, d32 = run(jnp.int32)
    s16, te16, qe16, d16 = run(jnp.int16)
    assert np.array_equal(s32, s16)
    assert np.array_equal(te32, te16)
    assert np.array_equal(qe32, qe16)
    assert np.array_equal(d32, d16)


def test_portable_extend_matches_striped_ssw_default_scoring():
    """The device kernel keeps the TEXTBOOK recurrence while host SSW is
    striped-exact (ssw.c semantics); the two provably coincide only for
    gap_open > gap_extend (the pipeline gates device dispatch off at
    O == E). This pins the O > E equivalence empirically: adversarial
    pairs at default scoring, full coordinate + cigar agreement between
    the portable extend twin and ssw_align."""
    import re

    from rabbitsalign_tpu.ops.extend_device import (
        ops_to_cigars,
        pack_input,
        unpack_output,
    )
    from rabbitsalign_tpu.ops.extend_portable import extend_batch_packed_portable

    def norm(cig):
        runs = re.findall(r"(\d+)([A-Z=])", cig)
        out = []
        for ln, op in runs:
            op = "M" if op in "=XM" else op
            if out and out[-1][1] == op:
                out[-1][0] += int(ln)
            else:
                out.append([int(ln), op])
        return "".join(f"{l}{o}" for l, o in out)

    rng = np.random.RandomState(99)
    pyr = random.Random(5150)
    Q, T, B = 152, 256, 128
    qc = np.full((B, Q), 4, np.uint8)
    tc = np.full((B, T), 4, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for b in range(B):
        mode = b % 5
        m = pyr.randrange(30, 151)
        n = pyr.randrange(m, min(T, m + 120))
        if mode == 0:
            q = rng.randint(0, 4, m).astype(np.uint8)
            t = rng.randint(0, 4, n).astype(np.uint8)
            st = pyr.randrange(0, n - m + 1)
            t[st:st + m] = q
            for _ in range(m // 15):
                t[st + pyr.randrange(m)] = pyr.randrange(4)
        elif mode == 1:  # tandem repeats: tie-heavy
            u = pyr.randrange(3, 20)
            q = (np.arange(m) % u % 4).astype(np.uint8)
            t = (np.arange(n) % u % 4).astype(np.uint8)
        elif mode == 2:  # N runs
            q = rng.randint(0, 4, m).astype(np.uint8)
            p = pyr.randrange(0, max(1, m - 9))
            q[p:p + pyr.randrange(2, 8)] = 4
            t = rng.randint(0, 4, n).astype(np.uint8)
            st = pyr.randrange(0, n - m + 1)
            t[st:st + m] = np.where(q == 4, rng.randint(0, 4, m).astype(np.uint8), q)
        elif mode == 3:  # homopolymer
            q = np.zeros(m, np.uint8)
            t = np.zeros(n, np.uint8)
            for _ in range(4):
                t[pyr.randrange(n)] = pyr.randrange(4)
        else:
            q = rng.randint(0, 5, m).astype(np.uint8)
            t = rng.randint(0, 5, n).astype(np.uint8)
        qc[b, :m] = q
        tc[b, :n] = t
        ql[b] = m
        tl[b] = n
    buf = pack_input(np.ascontiguousarray(qc.T), np.ascontiguousarray(tc.T),
                     ql, tl)
    out = np.asarray(extend_batch_packed_portable(buf, Q, T, PARAMS))
    (op_runs, len_runs, n_runs, score, t_end, q_end, t_begin, q_begin,
     edits) = unpack_output(out)
    cigars = ops_to_cigars(op_runs, len_runs, n_runs, score)
    for b in range(B):
        res = ssw_align(qc[b, :ql[b]].astype(np.int8),
                        tc[b, :tl[b]].astype(np.int8), 2, 8, 12, 1)
        if res.score1 == 0:
            assert score[b] == 0, b
            continue
        assert (int(score[b]), int(t_begin[b]), int(t_end[b]),
                int(q_begin[b]), int(q_end[b])) == (
            res.score1, res.ref_begin, res.ref_end, res.read_begin,
            res.read_end), b
        if cigars[b] is not None:
            assert norm(str(cigars[b][0])) == norm(str(res.cigar)), b
