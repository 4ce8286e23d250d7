"""Pallas TPU kernel: batched anti-diagonal affine-gap Smith-Waterman.

Same recurrence, direction-nibble encoding and tie-breaks as sw_jax.py
(the two are cross-checked in tests); this version runs the wavefront as
a Pallas grid over anti-diagonals with all DP state resident in VMEM.

Layout is (Q, B): query positions on sublanes, batch on lanes. This makes
the two hot data motions cheap:
  * the within-diagonal shift (q -> q-1) is a sublane roll,
  * the per-diagonal target base is a (1, B) sublane slice of the
    transposed target block, broadcast across sublanes.

Each grid step advances up to eight anti-diagonals (matching the
traceback kernel's blocking). Each diagonal does ~30 VPU ops plus three
sublane shifts on the (Q, B) plane and streams a (Q, B) uint8 direction
plane to HBM — the TPU-native replacement for GASAL2's
one-thread-per-pair CUDA kernel
(/root/reference/GASAL2/src/kernels/local_kernel_template.h).

The kernel body is dtype-complete for int32 AND int16: every ordered
comparison is canonicalized to `a <= b` (native cmpi sle for i32; a
sign-bit synthesis from add/xor/and/ne for i16, where Mosaic lowers no
ordered i16 compare at all), every max is compare+select, and the
compares double as direction bits. int16 is bit-exact but measured
SLOWER (the 5-op synthesized compare outweighs the 2x packing — see
`_pick_dtype` for the on-chip numbers), so production stays int32 with
i16 behind RSB_SW16=1 until the toolchain lowers i16 compares natively.

Out-of-range cells (q >= qlen, t >= tlen) are NOT masked: both
sequences are padded with code 4 which never matches (the substitution
rule requires code < 4), so every DP path that crosses the valid
boundary strictly loses score with each step and can never become the
running best — and the traceback only walks cells inside the valid
region, so garbage direction bits outside it are never read. Dropping
the per-cell validity test saves ~8 VPU ops/cell.

All in-kernel constants are explicit typed scalars: weak-typed Python
ints trigger a promotion recursion bug in pallas tracing under
jax_enable_x64.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_jax import SwParams

NEG = -(1 << 28)
NEG16 = -(1 << 14)


_INT16_PROBE: dict = {}


def probe_int16_lowering() -> bool:
    """Does THIS toolchain lower ordered 16-bit vector compares on the
    current accelerator? Probed once per jaxlib version (cached on disk
    under the package cache dir) so the ~2x int16-DP lever is claimed
    the day the toolchain allows it — a warning is logged when the
    probe starts passing while `_pick_dtype` still returns int32."""
    import jax as _jax

    key = getattr(_jax, "__version__", "?")
    if key in _INT16_PROBE:
        return _INT16_PROBE[key]
    import json
    import os

    cache_dir = os.environ.get(
        "RABBITSALIGN_TPU_CACHE", os.path.expanduser("~/.cache/rabbitsalign_tpu"))
    plat = _jax.devices()[0].platform
    path = os.path.join(cache_dir, f"int16_probe_{key}_{plat}.json")
    def _warn_unlocked():
        from ..utils.logger import logger

        logger.warning(
            "this toolchain now lowers ordered int16 vector compares — "
            "make int16 the _pick_dtype default (kernel body is already "
            "dtype-complete and bit-exact; native compares remove the "
            "5-op synthesis that made RSB_SW16 a loss — see docs/PERF.md)")

    try:
        with open(path) as f:
            ok = bool(json.load(f)["ordered_i16_compare"])
        _INT16_PROBE[key] = ok
        if ok:
            _warn_unlocked()  # keep warning every session until claimed
        return ok
    except Exception:
        pass
    ok = False
    try:
        def _k(a_ref, o_ref):
            a = a_ref[:]
            b = pltpu.roll(a, shift=1, axis=0)
            o_ref[:] = jnp.where(a < b, a, b)

        x = jnp.zeros((16, 128), jnp.int16)
        fn = pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(fn).lower(x).compile()
        ok = True
    except Exception:
        ok = False
    _INT16_PROBE[key] = ok
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"ordered_i16_compare": ok}, f)
    except Exception:
        pass
    if ok:
        _warn_unlocked()
    return ok


def _pick_dtype(Q: int, T: int, params: SwParams):
    """DP accumulator dtype: int32 (production), int16 opt-in.

    Round 2 found Mosaic on v5e cannot lower ANY ordered 16-bit vector
    comparison (re-probed per toolchain version by
    `probe_int16_lowering`) and closed the 16-bit door. Round 4 forced
    it open anyway: the i16 ops that DO legalize (add, xor/and/or, ne
    against a tensor, select, concat, astype) are enough to SYNTHESIZE
    the ordered compare from the sign bit — a <= b  ⇔  sign(a + ~b) —
    valid whenever |a - b| < 2^15, which the DP guarantees under the
    bounds checked below. The kernel body carries a complete,
    BIT-EXACT i16 path (validated against the i32 kernel and sw_jax on
    chip: identical score/t_end/q_end and every dirs byte).

    Measured 2026-08 (docs/PERF.md round 4) it is a REFUTATION, not a
    win: the 5-op synthesized compare on the ~8-compare/diagonal
    recurrence outweighs the 2x lane packing — 0.86x at (152,256)xB1024
    (4.23 vs 3.62 us/pair), 0.74x at (256,512)xB512; doubling B to 2048
    (halved VMEM allows it) reaches only ~1.07x, inside tunnel noise,
    and would complicate dispatch geometry. SWAR (2x16 packed in i32
    lanes by hand) is strictly dominated: its mask production costs 5
    ops per compare PLUS 3-op arithmetic selects where Mosaic's native
    i16 select is 1 op, so it lower-bounds above the measured i16 loss.

    Set RSB_SW16=1 to opt in (shapes that fail the range bounds fall
    back to int32). The day `probe_int16_lowering` starts passing —
    native i16 compares = 1 op — flip the default: the rest of the
    kernel is already dtype-complete.

    Bounds (NEG16 = -2^14 is the -inf analog): values live in
    [NEG16 - Eg - O, A*min(Q,T)], and every compare difference must
    stay under 2^15; the Eg*(Q+T) term is a conservative envelope for
    the init-transient decay."""
    import os

    if os.environ.get("RSB_SW16", "") in ("", "0"):
        return jnp.int32
    worst_h = params.match * min(Q, T)
    D = Q + T - 1
    span = (worst_h + (1 << 14) + params.gap_extend * D
            + params.gap_open + params.mismatch + 64)
    if span < (1 << 15):
        return jnp.int16
    return jnp.int32


def _kernel(
    q_ref,  # (Q, B) acc codes (0..4) — original codes, for the '='-bit
    qs_ref,  # (Q, B) acc scoring codes: N/pad (4) remapped to 9 so code
    #          equality IS the substitution rule (no separate q<4 mask —
    #          a hoisted mask shared across the unrolled diagonals gets a
    #          replicated layout Mosaic cannot legalize compares in)
    t_ref,  # (R, B) int32: rows of the transposed padded target for this block
    dirs_ref,  # out block (R, Q, B) uint8 — one plane per diagonal
    besth_ref,  # out (Q, B) acc
    bestt_ref,  # out (Q, B) acc: best target index per cell
    H1,
    H1S,
    E1,
    F1,
    revt,
    *,
    A: int,
    Bm: int,
    O: int,
    Eg: int,
    acc,
    R: int,
    SPLIT: int = 1,
):
    # R anti-diagonals per grid step (R=8 matches the traceback kernel's
    # blocking; fat shapes drop to R=1 so the double-buffered (R, Q, B)
    # direction block leaves VMEM for the DP scratch). Measured on v5e
    # the blocking is throughput-neutral — the kernel is bound by the
    # per-diagonal VPU work (recurrence + three sublane shifts), not by
    # grid-step overhead — but it keeps the target row index static for
    # the production shape and halves the number of output DMAs.
    #
    # SPLIT=2 (round 5, cross-batch ILP): the batch is split into two
    # (Q, B/2) lane halves whose diagonal recurrences are computed
    # independently inside each unrolled step — two independent
    # dependency chains per diagonal let Mosaic fill the single chain's
    # compare/select stalls. Measured 1.24x at the production tight
    # bucket, bit-exact (docs/PERF.md "Cross-batch ILP"). The reversed-
    # target window stays full-width (its roll/insert is 2 ops/diagonal,
    # and a lane-offset slice feeding a broadcast does not legalize).
    g = pl.program_id(0)
    Q, B = H1.shape
    Bh = B // SPLIT
    zero = acc(0)
    neg = acc(NEG16 if acc == jnp.int16 else NEG)
    cA = acc(A)
    cB = acc(Bm)
    cO = acc(O)
    cE = acc(Eg)

    @pl.when(g == 0)
    def _init():
        zeros = jnp.zeros((Q, B), acc)
        H1[:] = zeros
        H1S[:] = zeros
        E1[:] = jnp.full((Q, B), neg, acc)
        F1[:] = jnp.full((Q, B), neg, acc)
        # revt MUST start at 4 ('N', never matches): rows the wavefront
        # has not reached yet (t = d - q < 0) read their base from here,
        # and a matchable stale code would let H grow ahead of the front
        revt[:] = jnp.full((Q, B), jnp.int32(4), jnp.int32)
        besth_ref[:] = zeros
        bestt_ref[:] = jnp.full((Q, B), acc(-1), acc)

    row_full = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    is_row0 = row_full == jnp.int32(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Bh), 0)

    def shift_down(x, fill):
        # sublane shift by one via slice + concatenate (works for any
        # dtype — this Mosaic build has no 16-bit rotate; measured equal
        # to pltpu.roll+select for int32 on v5e)
        top = jnp.full((1, Bh), fill, x.dtype)
        return jnp.concatenate([top, x[: Q - 1]], axis=0)

    # DP state lives in registers across the 8 in-step diagonals; the
    # scratch planes are read once and written once per grid step.
    # Per-half state: (h1, h1s, e_prev, f_prev, bh, bt, qv, qsv) — each
    # a (Q, Bh) lane slice (the full plane when SPLIT=1)
    rv32 = revt[:]
    halves = []
    for s in range(SPLIT):
        sl = slice(s * Bh, (s + 1) * Bh)
        halves.append([
            H1[:, sl], H1S[:, sl], E1[:, sl], F1[:, sl],
            besth_ref[:, sl], bestt_ref[:, sl],
            q_ref[:, sl], qs_ref[:, sl],
        ])
    qv = halves[0][6]  # for the zerot idiom below (shape (Q, Bh))

    # Every ordered comparison in the recurrence is canonicalized to
    # `a <= b` so that ONE primitive covers both dtypes:
    #   * int32: native cmpi sle (boolean-identical to the previous
    #     `<`/`~` formulation — each rewrite just swaps where() arms)
    #   * int16: Mosaic cannot lower ANY ordered i16 compare, but
    #     a <= b  ⇔  a - b - 1 < 0  ⇔  sign(a + ~b), and xor/add/and/
    #     ne-against-a-tensor all legalize — `_pick_dtype` guarantees
    #     |a - b| < 2^15 so the sign bit is trustworthy. Constants used
    #     as where() operands are materialized as tensors (zerot + c):
    #     i16 selects with splat-immediate operands miscompile on this
    #     toolchain (probed 2026-08).
    zerot = qv ^ qv  # all-zeros tensor of the acc dtype
    if acc == jnp.int16:
        sign16 = jnp.int16(-32768)
        neg1_16 = jnp.int16(-1)

        def le(a, b):  # a <= b via the sign bit of a - b - 1
            return (((a + (b ^ neg1_16)) & sign16)) != zerot

        c_sub_match = zerot + cA
        c_sub_mis = zerot + acc(-Bm)
        c_one = zerot + acc(1)
        c_two = zerot + acc(2)
        c_three = zerot + acc(3)
        c_bit2 = zerot + acc(4)
        c_bit3 = zerot + acc(8)
        c_bit4 = zerot + acc(16)
    else:

        def le(a, b):
            return a <= b

        c_sub_match = cA
        c_sub_mis = -cB
        c_one = acc(1)
        c_two = acc(2)
        c_three = acc(3)
        c_bit2 = acc(4)
        c_bit3 = acc(8)
        c_bit4 = acc(16)

    c_zero = zerot if acc == jnp.int16 else zero

    def step(st, rv32_s, d):
        # one diagonal of the recurrence for one lane half. Every max is
        # compare+select, with every ordered comparison in `le` polarity
        # (see the le() definitions above) — the compare results double
        # as the direction bits the traceback needs. Subtractions of
        # constants are adds of negated constants (arith.subi does not
        # legalize on i16 either).
        h1, h1s, e_prev, f_prev, bh, bt, qv, qsv = st
        Hm1s = shift_down(h1, zero)
        Em1s = shift_down(e_prev, neg)
        e_open = Hm1s + acc(-O)
        e_ext_v = Em1s + acc(-Eg)
        # open strictly wins: extension is taken only when >= open
        e_is_ext = le(e_open, e_ext_v)
        E = jnp.where(e_is_ext, e_ext_v, e_open)

        f_open = h1 + acc(-O)
        f_ext_v = f_prev + acc(-Eg)
        f_is_ext = le(f_open, f_ext_v)
        F = jnp.where(f_is_ext, f_ext_v, f_open)

        # H(q-1, t-1) = diagonal d-2 shifted = the Hm1s computed at the
        # previous diagonal, carried in h1s — saves one shift per step
        rv = rv32_s.astype(acc) if acc != jnp.int32 else rv32_s
        if acc == jnp.int16:
            # only `ne` legalizes on packed i16 (eq does not — probed
            # 2026-08 at production shapes), so both equality tests are
            # xor + ne with every consumer's arms swapped. The scoring
            # test uses the remapped qs plane (9 never equals rv), so no
            # q<4 mask is needed.
            s_neq = (qsv ^ rv) != zerot
            sub = jnp.where(s_neq, c_sub_mis, c_sub_match)
            eq_neq = (qv ^ rv) != zerot
            eq_bit = jnp.where(eq_neq, c_zero, c_bit4)
        else:
            sub = jnp.where(qsv == rv, c_sub_match, c_sub_mis)
            eq_bit = jnp.where(qv == rv, c_bit4, c_zero)
        dsub = h1s + sub

        e1 = jnp.where(le(E, c_zero), c_zero, E)
        f1 = jnp.where(le(F, c_zero), c_zero, F)
        ef_le = le(e1, f1)  # ~(f1 < e1)
        gap1 = jnp.where(ef_le, f1, e1)
        d_ge = le(gap1, dsub)  # dsub >= gap1
        hm = jnp.where(d_ge, dsub, gap1)
        hm_le0 = le(hm, c_zero)  # ~(0 < hm)
        H = jnp.where(hm_le0, c_zero, hm)

        h_src = jnp.where(
            hm_le0,
            c_zero,
            jnp.where(d_ge, c_one, jnp.where(ef_le, c_three, c_two)),
        )
        dirs = (
            h_src
            | jnp.where(e_is_ext, c_bit2, c_zero)
            | jnp.where(f_is_ext, c_bit3, c_zero)
            # bit 4: plain code equality ('='/'X' for the cigar) so the
            # traceback never needs the sequence planes
            | eq_bit
        )

        h_le_bh = le(H, bh)  # ~(bh < H): strict > updates
        bh = jnp.where(h_le_bh, bh, H)
        # per-cell best target index t = d - q (fits int16: t < T <=
        # 2048); strict > keeps the smallest t per row on score ties,
        # matching the SSW tie-break
        bt = jnp.where(h_le_bh, bt, (d - row).astype(acc))
        return [H, Hm1s, E, F, bh, bt, qv, qsv], dirs

    for j in range(R):
        d = g * jnp.int32(R) + jnp.int32(j)
        # slide the reversed-target window; insert this diagonal's base
        # (the revt/q planes stay int32 — 32-bit keeps the rotate on the
        # supported path). t_ref is always an (8, B) block (TPU requires
        # sublane-divisible blocks): R=8 indexes rows statically; smaller
        # R addresses its sub-block of 8 dynamically
        if R == 8:
            tcol = t_ref[j : j + 1, :]  # (1, B)
        else:
            trow = (g * jnp.int32(R)) % jnp.int32(8) + jnp.int32(j)
            tcol = t_ref[pl.ds(trow, 1), :]
        rv32 = jnp.where(is_row0, tcol, pltpu.roll(rv32, shift=1, axis=0))

        dirs_halves = []
        for s in range(SPLIT):
            rv_s = rv32[:, s * Bh:(s + 1) * Bh] if SPLIT > 1 else rv32
            halves[s], dirs_s = step(halves[s], rv_s, d)
            dirs_halves.append(dirs_s)
        dirs = (jnp.concatenate(dirs_halves, axis=1)
                if SPLIT > 1 else dirs_halves[0])
        dirs_ref[j] = dirs.astype(jnp.uint8)

    revt[:] = rv32
    for s in range(SPLIT):
        sl = slice(s * Bh, (s + 1) * Bh)
        h1, h1s, e_prev, f_prev, bh, bt, _, _ = halves[s]
        H1[:, sl] = h1
        H1S[:, sl] = h1s
        E1[:, sl] = e_prev
        F1[:, sl] = f_prev
        besth_ref[:, sl] = bh
        bestt_ref[:, sl] = bt


def sw_forward_pallas(q_codes, t_codes, qlen, tlen, params: SwParams):
    """Same contract as sw_jax.sw_forward except dirs are returned in
    (D, Q, B) layout (use traceback_batch(..., layout="dqb")).

    Traced with x64 disabled — the kernel is pure 32-bit and pallas/mosaic
    reject 64-bit index maps."""
    with jax.enable_x64(False):
        return _sw_forward_pallas(q_codes, t_codes, qlen, tlen, params)


def _sw_forward_pallas_core(q_t, t_t, qlen, tlen, params: SwParams):
    """Core to be embedded in a larger jit. q_t (Q, B) uint8 codes,
    t_t (T, B) uint8 codes, qlen/tlen (B,) int32. Returns
    (score, t_end, q_end, dirs (D,Q,B) u8, q_i32 (Q,B), t_i32 (T,B))."""
    Q, B = q_t.shape
    T = t_t.shape[0]
    D = Q + T - 1
    Dpad = ((D + 7) // 8) * 8
    acc = _pick_dtype(Q, T, params)

    # enforce the never-matches padding the kernel's unmasked DP relies
    # on: one (Q,B)+(T,B) select per batch replaces a per-diagonal
    # validity mask inside the kernel (callers don't all pad with 4)
    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    qlen_i = qlen.astype(jnp.int32)
    tlen_i = tlen.astype(jnp.int32)
    q_acc = jnp.where(qi < qlen_i[None, :], q_t, jnp.uint8(4)).astype(acc)
    # scoring plane: N/pad (code 4) remapped to 9 so it can never equal
    # a target code — the kernel's substitution rule is then plain code
    # equality and needs no q<4 mask (see _kernel's qs_ref note)
    q_score = jnp.where(q_acc == acc(4), acc(9), q_acc)
    t_i32 = jnp.where(ti < tlen_i[None, :], t_t, jnp.uint8(4)).astype(jnp.int32)
    t_pad = jnp.pad(t_i32, ((0, Dpad - T), (0, 0)), constant_values=4)

    # R bounds the double-buffered (R, Q, B) direction block: past
    # 256x512 cells even a 4-plane block starves the DP scratch of VMEM
    # (the (512, 2048) bucket compiles only with single-diagonal steps)
    R = 8 if Q * B <= 256 * 512 else 1
    # cross-batch ILP (round 5): two independent per-half recurrence
    # chains per diagonal, 1.24x at the tight bucket (docs/PERF.md
    # "Cross-batch ILP"). int32 only (the i16 path's synthesized
    # compares were refuted anyway) and lane halves must be vreg-aligned
    SPLIT = 2 if (acc == jnp.int32 and B % 256 == 0) else 1
    kernel = functools.partial(
        _kernel,
        A=params.match,
        Bm=params.mismatch,
        O=params.gap_open,
        Eg=params.gap_extend,
        acc=acc,
        R=R,
        SPLIT=SPLIT,
    )
    dirs, best_h, best_d = pl.pallas_call(
        kernel,
        grid=(Dpad // R,),
        in_specs=[
            pl.BlockSpec((Q, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), (lambda g: (g, 0)) if R == 8 else
                         (lambda g: ((g * R) // 8, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, Q, B), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # padded to a multiple of 8 diagonals so the traceback kernel
            # can consume (8, Q, B) blocks without a pad copy; rows
            # D..Dpad-1 are never written nor stood on by walkers
            jax.ShapeDtypeStruct((Dpad, Q, B), jnp.uint8),
            jax.ShapeDtypeStruct((Q, B), acc),
            jax.ShapeDtypeStruct((Q, B), acc),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, B), acc),  # H1
            pltpu.VMEM((Q, B), acc),  # H1S (prev step's shifted H1)
            pltpu.VMEM((Q, B), acc),  # E1
            pltpu.VMEM((Q, B), acc),  # F1
            pltpu.VMEM((Q, B), jnp.int32),  # revt
        ],
    )(q_acc, q_score, t_pad)

    best_h = best_h.astype(jnp.int32)
    # the kernel stores t = d - q per cell (fits int16: t < T <= 2048);
    # -1 marks "never updated"
    best_t = best_d.astype(jnp.int32)

    # SSW global tie-break: max score, then min t, then min q
    score = jnp.max(best_h, axis=0)  # (B,)
    is_best = best_h == score[None, :]
    INT_MAX = jnp.int32(2**30)
    t_cand = jnp.where(is_best, best_t, INT_MAX)
    t_end = jnp.min(t_cand, axis=0)
    q_end = jnp.argmax(is_best & (best_t == t_end[None, :]), axis=0).astype(jnp.int32)
    # dirs stay in their native (D, Q, B) layout — transposing 50MB of
    # uint8 on-device costs more than the whole DP. The returned code
    # planes are the PAD-ENFORCED ones (code 4 past qlen/tlen) so a
    # consumer reading past the lengths can never see a fake match.
    return score, t_end, q_end, dirs, q_acc.astype(jnp.int32), t_i32


@functools.partial(jax.jit, static_argnames=("params",))
def _sw_forward_pallas(
    q_codes: jnp.ndarray,  # (B, Q) uint8
    t_codes: jnp.ndarray,  # (B, T) uint8
    qlen: jnp.ndarray,  # (B,) int32
    tlen: jnp.ndarray,  # (B,) int32
    params: SwParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    score, t_end, q_end, dirs, _, _ = _sw_forward_pallas_core(
        q_codes.T, t_codes.T, qlen, tlen, params
    )
    return score, t_end, q_end, dirs
