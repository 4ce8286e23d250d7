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

The kernel body is dtype-generic with every comparison canonicalized to
`<`/`==` and every max written as compare+select (the compares double
as direction bits), so a 16-bit DP drops in by changing `_pick_dtype` —
but the current Mosaic build cannot lower ordered 16-bit comparisons on
v5e at all (see `_pick_dtype`), so the accumulator stays int32.

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
            "flip ops/sw_pallas._pick_dtype to int16 for ~2x extend-kernel "
            "throughput (body is dtype-generic; see docs/PERF.md)")

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
    """DP accumulator dtype. Always int32 on the current toolchain.

    int16 DP (2x VPU lanes/cycle, half the VMEM) fits the score range
    easily — H in [0, A*min(Q,T)] peaks at 1024 under default scoring —
    but the Mosaic build in this image cannot lower ANY ordered 16-bit
    vector comparison on v5e (cmpi slt/sle/ult on i16, cmpf on bf16 and
    f16 all fail with "Target does not support this comparison" /
    "Unsupported type"; only eq legalizes, and arith.{maxsi,shrsi} on
    i16 fail too — probed 2026-08, and re-probed automatically once per
    toolchain version by `probe_int16_lowering`).
    A DP recurrence without ordered compares or max has no efficient
    encoding, so the kernel stays int32 until the toolchain catches up;
    the kernel body below is dtype-generic and already canonicalizes
    every compare to `<`/`==`, so flipping this function is the only
    change needed when 16-bit compares land. (The probe runs from the
    prewarm thread, not here — compiling a probe kernel inside another
    trace is asking for trouble.)"""
    return jnp.int32


def _kernel(
    q_ref,  # (Q, B) acc codes (0..4)
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
):
    # R anti-diagonals per grid step (R=8 matches the traceback kernel's
    # blocking; fat shapes drop to R=1 so the double-buffered (R, Q, B)
    # direction block leaves VMEM for the DP scratch). Measured on v5e
    # the blocking is throughput-neutral — the kernel is bound by the
    # per-diagonal VPU work (recurrence + three sublane shifts), not by
    # grid-step overhead — but it keeps the target row index static for
    # the production shape and halves the number of output DMAs.
    g = pl.program_id(0)
    Q, B = H1.shape
    zero = acc(0)
    one = acc(1)
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

    row = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    is_row0 = row == jnp.int32(0)

    def shift_down(x, fill):
        # sublane shift by one via slice + concatenate (works for any
        # dtype — this Mosaic build has no 16-bit rotate; measured equal
        # to pltpu.roll+select for int32 on v5e)
        top = jnp.full((1, B), fill, x.dtype)
        return jnp.concatenate([top, x[: Q - 1]], axis=0)

    # DP state lives in registers across the 8 in-step diagonals; the
    # scratch planes are read once and written once per grid step
    h1 = H1[:]
    h1s = H1S[:]
    e_prev = E1[:]
    f_prev = F1[:]
    rv32 = revt[:]
    bh = besth_ref[:]
    bt = bestt_ref[:]
    qv = q_ref[:]  # acc dtype
    qlt4 = qv < acc(4)

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

        # every max is compare+select (Mosaic has no 16-bit arith.maxsi)
        # and every acc-domain comparison is canonicalized to `<` or `==`
        # (only slt/eq legalize for i16 here) — the compare results
        # double as the direction bits the traceback needs anyway
        Hm1s = shift_down(h1, zero)
        Em1s = shift_down(e_prev, neg)
        e_open = Hm1s - cO
        e_ext_v = Em1s - cE
        e_opn_w = e_ext_v < e_open  # open strictly wins
        E = jnp.where(e_opn_w, e_open, e_ext_v)
        e_is_ext = ~e_opn_w

        f_open = h1 - cO
        f_ext_v = f_prev - cE
        f_opn_w = f_ext_v < f_open
        F = jnp.where(f_opn_w, f_open, f_ext_v)
        f_is_ext = ~f_opn_w

        # H(q-1, t-1) = diagonal d-2 shifted = the Hm1s computed at the
        # previous diagonal, carried in h1s — saves one shift per step
        rv = rv32.astype(acc) if acc != jnp.int32 else rv32
        is_eq = qv == rv
        sub = jnp.where(is_eq & qlt4, cA, -cB)
        dsub = h1s + sub

        e1 = jnp.where(zero < E, E, zero)
        f1 = jnp.where(zero < F, F, zero)
        ef_cmp = f1 < e1  # e1 > f1
        gap1 = jnp.where(ef_cmp, e1, f1)
        d_cmp = ~(dsub < gap1)  # dsub >= gap1
        hm = jnp.where(d_cmp, dsub, gap1)
        h_pos = zero < hm
        H = jnp.where(h_pos, hm, zero)

        h_src = jnp.where(
            ~h_pos,
            zero,
            jnp.where(d_cmp, one, jnp.where(ef_cmp, acc(2), acc(3))),
        )
        dirs = (
            h_src
            | (e_is_ext.astype(acc) << acc(2))
            | (f_is_ext.astype(acc) << acc(3))
            # bit 4: plain code equality ('='/'X' for the cigar) so the
            # traceback never needs the sequence planes
            | (is_eq.astype(acc) << acc(4))
        )
        dirs_ref[j] = dirs.astype(jnp.uint8)

        upd = bh < H
        bh = jnp.where(upd, H, bh)
        # per-cell best target index t = d - q (fits int16: t < T <=
        # 2048); strict > keeps the smallest t per row on score ties,
        # matching the SSW tie-break
        bt = jnp.where(upd, (d - row).astype(acc), bt)

        h1s = Hm1s
        h1 = H
        e_prev = E
        f_prev = F

    H1[:] = h1
    H1S[:] = h1s
    E1[:] = e_prev
    F1[:] = f_prev
    revt[:] = rv32
    besth_ref[:] = bh
    bestt_ref[:] = bt


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
    t_i32 = jnp.where(ti < tlen_i[None, :], t_t, jnp.uint8(4)).astype(jnp.int32)
    t_pad = jnp.pad(t_i32, ((0, Dpad - T), (0, 0)), constant_values=4)

    # R bounds the double-buffered (R, Q, B) direction block: past
    # 256x512 cells even a 4-plane block starves the DP scratch of VMEM
    # (the (512, 2048) bucket compiles only with single-diagonal steps)
    R = 8 if Q * B <= 256 * 512 else 1
    kernel = functools.partial(
        _kernel,
        A=params.match,
        Bm=params.mismatch,
        O=params.gap_open,
        Eg=params.gap_extend,
        acc=acc,
        R=R,
    )
    dirs, best_h, best_d = pl.pallas_call(
        kernel,
        grid=(Dpad // R,),
        in_specs=[
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
    )(q_acc, t_pad)

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
