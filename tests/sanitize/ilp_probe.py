"""Cross-batch ILP probe for the Pallas extend kernel (docs/PERF.md §1a).

Hypothesis (the one lever the round-4 roofline left unprobed): the
forward kernel sits at ~1 vector instruction/cycle because each
diagonal's ~35 VPU ops form one dependent compare/select chain; giving
the scheduler TWO independent chains per unrolled step — the same batch
split into two (Q, B/2) lane halves whose diagonal recurrences are
interleaved inside one loop iteration — should let the second chain's
ops fill the first's dependency stalls IF Mosaic schedules across ops
(rather than emitting one vreg loop per op, where each (Q, B) op already
exposes ~128 independent vregs of ILP and the split changes nothing).

Method: a SPLIT=2 variant of ops/sw_pallas._kernel (int32 path only),
bit-exactness asserted vs the production kernel (score/t_end/q_end and
every dirs byte), then paired-slope chained timing at the production
tight-bucket geometry (152, 256) x B1024 — same harness discipline as
lookup_bench.py (device_get materialization; slope over two chained
iteration counts so tunnel RTT and dispatch overhead cancel).

Run: python tests/sanitize/ilp_probe.py     (needs the real TPU)
Result recorded in docs/PERF.md ("Cross-batch ILP" section).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_variant(SPLIT):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rabbitsalign_tpu.ops.sw_jax import SwParams  # noqa: F401
    from rabbitsalign_tpu.ops.sw_pallas import NEG

    def _kernel_split(q_ref, qs_ref, t_ref, dirs_ref, besth_ref, bestt_ref,
                      H1, H1S, E1, F1, revt, *, A, Bm, O, Eg, R):
        g = pl.program_id(0)
        Q, B = H1.shape
        acc = jnp.int32
        zero = acc(0)
        neg = acc(NEG)
        Bh = B // SPLIT

        @pl.when(g == 0)
        def _init():
            zeros = jnp.zeros((Q, B), acc)
            H1[:] = zeros
            H1S[:] = zeros
            E1[:] = jnp.full((Q, B), neg, acc)
            F1[:] = jnp.full((Q, B), neg, acc)
            revt[:] = jnp.full((Q, B), jnp.int32(4), jnp.int32)
            besth_ref[:] = zeros
            bestt_ref[:] = jnp.full((Q, B), acc(-1), acc)

        row_full = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
        is_row0_full = row_full == jnp.int32(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (Q, Bh), 0)

        def shift_down(x, fill):
            top = jnp.full((1, Bh), fill, x.dtype)
            return jnp.concatenate([top, x[: Q - 1]], axis=0)

        # the reversed-target window stays FULL-width (its roll/insert is
        # 2 ops/diagonal — sharing it keeps Mosaic off the unsupported
        # lane-offset broadcast); the ~30-op recurrence is per-half
        rv_full = revt[:]
        # per-half state tuples: (h1, h1s, e, f, bh, bt, qv, qsv)
        halves = []
        for s in range(SPLIT):
            sl = slice(s * Bh, (s + 1) * Bh)
            halves.append([
                H1[:, sl], H1S[:, sl], E1[:, sl], F1[:, sl],
                besth_ref[:, sl], bestt_ref[:, sl],
                q_ref[:, sl], qs_ref[:, sl],
            ])

        def step(st, rv32, d):
            h1, h1s, e_prev, f_prev, bh, bt, qv, qsv = st
            Hm1s = shift_down(h1, zero)
            Em1s = shift_down(e_prev, neg)
            e_open = Hm1s + acc(-O)
            e_ext_v = Em1s + acc(-Eg)
            e_is_ext = e_open <= e_ext_v
            E = jnp.where(e_is_ext, e_ext_v, e_open)
            f_open = h1 + acc(-O)
            f_ext_v = f_prev + acc(-Eg)
            f_is_ext = f_open <= f_ext_v
            F = jnp.where(f_is_ext, f_ext_v, f_open)
            rv = rv32
            sub = jnp.where(qsv == rv, acc(A), -acc(Bm))
            eq_bit = jnp.where(qv == rv, acc(16), zero)
            dsub = h1s + sub
            e1 = jnp.where(E <= zero, zero, E)
            f1 = jnp.where(F <= zero, zero, F)
            ef_le = e1 <= f1
            gap1 = jnp.where(ef_le, f1, e1)
            d_ge = gap1 <= dsub
            hm = jnp.where(d_ge, dsub, gap1)
            hm_le0 = hm <= zero
            H = jnp.where(hm_le0, zero, hm)
            h_src = jnp.where(
                hm_le0, zero,
                jnp.where(d_ge, acc(1), jnp.where(ef_le, acc(3), acc(2))))
            dirs = (h_src
                    | jnp.where(e_is_ext, acc(4), zero)
                    | jnp.where(f_is_ext, acc(8), zero)
                    | eq_bit)
            h_le_bh = H <= bh
            bh = jnp.where(h_le_bh, bh, H)
            bt = jnp.where(h_le_bh, bt, (d - row).astype(acc))
            return [H, Hm1s, E, F, bh, bt, qv, qsv], dirs

        for j in range(R):
            d = g * jnp.int32(R) + jnp.int32(j)
            tcol_full = t_ref[j: j + 1, :]
            rv_full = jnp.where(is_row0_full, tcol_full,
                                pltpu.roll(rv_full, shift=1, axis=0))
            dirs_halves = []
            for s in range(SPLIT):
                rv_s = rv_full[:, s * Bh:(s + 1) * Bh]
                halves[s], dirs_s = step(halves[s], rv_s, d)
                dirs_halves.append(dirs_s)
            dirs_ref[j] = jnp.concatenate(
                dirs_halves, axis=1).astype(jnp.uint8)

        revt[:] = rv_full
        for s in range(SPLIT):
            sl = slice(s * Bh, (s + 1) * Bh)
            h1, h1s, e_prev, f_prev, bh, bt, _, _ = halves[s]
            H1[:, sl] = h1
            H1S[:, sl] = h1s
            E1[:, sl] = e_prev
            F1[:, sl] = f_prev
            besth_ref[:, sl] = bh
            bestt_ref[:, sl] = bt

    def forward(q_t, t_t, qlen, tlen, params):
        Q, B = q_t.shape
        T = t_t.shape[0]
        D = Q + T - 1
        Dpad = ((D + 7) // 8) * 8
        acc = jnp.int32
        qi = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
        ti = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
        q_acc = jnp.where(qi < qlen.astype(jnp.int32)[None, :], q_t,
                          jnp.uint8(4)).astype(acc)
        q_score = jnp.where(q_acc == acc(4), acc(9), q_acc)
        t_i32 = jnp.where(ti < tlen.astype(jnp.int32)[None, :], t_t,
                          jnp.uint8(4)).astype(jnp.int32)
        t_pad = jnp.pad(t_i32, ((0, Dpad - T), (0, 0)), constant_values=4)
        R = 8
        kernel = functools.partial(
            _kernel_split, A=params.match, Bm=params.mismatch,
            O=params.gap_open, Eg=params.gap_extend, R=R)
        dirs, best_h, best_d = pl.pallas_call(
            kernel,
            grid=(Dpad // R,),
            in_specs=[
                pl.BlockSpec((Q, B), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, B), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, B), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, Q, B), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, B), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, B), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Dpad, Q, B), jnp.uint8),
                jax.ShapeDtypeStruct((Q, B), acc),
                jax.ShapeDtypeStruct((Q, B), acc),
            ],
            scratch_shapes=[
                pltpu.VMEM((Q, B), acc),
                pltpu.VMEM((Q, B), acc),
                pltpu.VMEM((Q, B), acc),
                pltpu.VMEM((Q, B), acc),
                pltpu.VMEM((Q, B), jnp.int32),
            ],
        )(q_acc, q_score, t_pad)
        best_h = best_h.astype(jnp.int32)
        best_t = best_d.astype(jnp.int32)
        score = jnp.max(best_h, axis=0)
        is_best = best_h == score[None, :]
        INT_MAX = jnp.int32(2 ** 30)
        t_cand = jnp.where(is_best, best_t, INT_MAX)
        t_end = jnp.min(t_cand, axis=0)
        q_end = jnp.argmax(is_best & (best_t == t_end[None, :]),
                           axis=0).astype(jnp.int32)
        return score, t_end, q_end, dirs

    return forward


def main():
    import jax
    import jax.numpy as jnp

    from rabbitsalign_tpu.ops.sw_jax import SwParams
    from rabbitsalign_tpu.ops.sw_pallas import sw_forward_pallas

    print(f"platform={jax.devices()[0].platform}", file=sys.stderr)
    Q, T, B = 152, 256, 1024  # production tight bucket
    params = SwParams(match=2, mismatch=8, gap_open=12, gap_extend=1)
    rng = np.random.RandomState(7)
    q = rng.randint(0, 4, (B, Q)).astype(np.uint8)
    t = rng.randint(0, 4, (B, T)).astype(np.uint8)
    # plant real alignments so the dirs planes aren't trivial
    for i in range(0, B, 3):
        ql = rng.randint(100, Q)
        off = rng.randint(0, 40)
        t[i, off:off + ql] = q[i, :ql]
    qlen = rng.randint(100, Q + 1, B).astype(np.int32)
    tlen = rng.randint(150, T + 1, B).astype(np.int32)

    qj = jnp.asarray(q)
    tj = jnp.asarray(t)
    qlj = jnp.asarray(qlen)
    tlj = jnp.asarray(tlen)

    variants = {}
    with jax.enable_x64(False):
        base = jax.jit(lambda a, b, c, d: sw_forward_pallas(
            a, b, c, d, params))
        s0, te0, qe0, d0 = [np.asarray(x) for x in base(qj, tj, qlj, tlj)]
        for SPLIT in (2, 4):
            fwd = make_variant(SPLIT)
            fn = jax.jit(lambda a, b, c, d, _f=fwd: _f(
                a.T, b.T, c, d, params))
            s1, te1, qe1, d1 = [np.asarray(x)
                                for x in fn(qj, tj, qlj, tlj)]
            assert np.array_equal(s0, s1), f"SPLIT={SPLIT} score diverged"
            assert np.array_equal(te0, te1), f"SPLIT={SPLIT} t_end diverged"
            assert np.array_equal(qe0, qe1), f"SPLIT={SPLIT} q_end diverged"
            assert np.array_equal(d0, d1), f"SPLIT={SPLIT} dirs diverged"
            print(f"SPLIT={SPLIT}: bit-exact vs production "
                  f"(score/t_end/q_end/dirs)", file=sys.stderr)
            variants[f"split{SPLIT}"] = fn
        variants["production"] = base

        # paired-slope chained timing: K dependent kernel invocations in
        # one jit program; the score sum perturbs the next query plane's
        # first element so XLA cannot hoist or parallelize iterations
        K_LO, K_HI = 2, 10

        def chained(fn):
            @functools.partial(jax.jit, static_argnums=0)
            def run(K, qa, ta, qla, tla):
                def it(i, acc):
                    qq = qa.at[0, 0].set(
                        (acc & jnp.int32(3)).astype(jnp.uint8))
                    s, te, qe, dirs = fn(qq, ta, qla, tla)
                    return jnp.sum(s) + jnp.sum(te)
                return jax.lax.fori_loop(0, K, it, jnp.int32(0))
            return run

        print(f"timing at ({Q},{T}) x B{B}, paired slope "
              f"K={K_LO}->{K_HI}, interleaved trials, median",
              file=sys.stderr)
        tags = ("production", "split2", "split4")
        runs = {tag: chained(variants[tag]) for tag in tags}
        slopes = {tag: [] for tag in tags}
        for tag in tags:  # compile
            jax.device_get(runs[tag](K_LO, qj, tj, qlj, tlj))
            jax.device_get(runs[tag](K_HI, qj, tj, qlj, tlj))
        # interleave variants within each trial so slow drift in the
        # tunnel/host affects all variants alike
        for _ in range(9):
            for tag in tags:
                tt = {}
                for K in (K_LO, K_HI):
                    t0 = time.perf_counter()
                    jax.device_get(runs[tag](K, qj, tj, qlj, tlj))
                    tt[K] = time.perf_counter() - t0
                slopes[tag].append((tt[K_HI] - tt[K_LO]) / (K_HI - K_LO))
        for tag in tags:
            p = sorted(slopes[tag])
            med = p[len(p) // 2]
            print(f"{tag}: {med * 1e3:.2f} ms/dispatch "
                  f"({med / B * 1e6:.2f} us/pair; paired slopes "
                  f"{[f'{x*1e3:.2f}' for x in p]})")


if __name__ == "__main__":
    main()
