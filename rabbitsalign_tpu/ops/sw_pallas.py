"""Pallas TPU kernel: batched anti-diagonal affine-gap Smith-Waterman.

Same recurrence, direction-nibble encoding and tie-breaks as sw_jax.py
(the two are cross-checked in tests); this version runs the wavefront as
a Pallas grid over anti-diagonals with all DP state resident in VMEM.

Layout is (Q, B): query positions on sublanes, batch on lanes. This makes
the two hot data motions cheap:
  * the within-diagonal shift (q -> q-1) is a sublane roll,
  * the per-diagonal target base is a (1, B) sublane slice of the
    transposed target block, broadcast across sublanes.

Each grid step does ~20 VPU ops on the (Q, B) plane and streams one
(Q, B) uint8 direction plane to HBM — the TPU-native replacement for
GASAL2's one-thread-per-pair CUDA kernel
(/root/reference/GASAL2/src/kernels/local_kernel_template.h).

All in-kernel constants are explicit int32: weak-typed Python ints
trigger a promotion recursion bug in pallas tracing under jax_enable_x64.
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


def _kernel(
    q_ref,  # (Q, B) int32 codes
    t_ref,  # (8, B) int32: rows d..d+7 of the transposed padded target
    qlen_ref,  # (1, B) int32
    tlen_ref,  # (1, B) int32
    dirs_ref,  # out block (1, Q, B) uint8 for this diagonal
    besth_ref,  # out (Q, B) int32
    bestt_ref,  # out (Q, B) int32
    H1,
    H2,
    E1,
    F1,
    revt,
    *,
    A: int,
    Bm: int,
    O: int,
    Eg: int,
):
    d = pl.program_id(0)
    Q, B = H1.shape
    zero = jnp.int32(0)
    one = jnp.int32(1)
    neg = jnp.int32(NEG)
    cA = jnp.int32(A)
    cB = jnp.int32(Bm)
    cO = jnp.int32(O)
    cE = jnp.int32(Eg)

    @pl.when(d == 0)
    def _init():
        zeros = jnp.zeros((Q, B), jnp.int32)
        H1[:] = zeros
        H2[:] = zeros
        E1[:] = jnp.full((Q, B), neg, jnp.int32)
        F1[:] = jnp.full((Q, B), neg, jnp.int32)
        revt[:] = zeros
        besth_ref[:] = zeros
        bestt_ref[:] = jnp.full((Q, B), jnp.int32(-1), jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    is_row0 = row == zero

    def shift_down(x, fill):
        rolled = pltpu.roll(x, shift=jnp.int32(1), axis=0)
        return jnp.where(is_row0, fill, rolled)

    # slide the reversed-target window and insert this diagonal's base
    tcol = t_ref[pl.ds(d % 8, 1), :]  # (1, B)
    revt_new = jnp.where(is_row0, tcol, pltpu.roll(revt[:], shift=jnp.int32(1), axis=0))
    revt[:] = revt_new

    h1 = H1[:]
    Hm1s = shift_down(h1, zero)
    Em1s = shift_down(E1[:], neg)
    e_open = Hm1s - cO
    e_ext_v = Em1s - cE
    E = jnp.maximum(e_open, e_ext_v)
    e_is_ext = e_open <= e_ext_v

    f_open = h1 - cO
    f_ext_v = F1[:] - cE
    F = jnp.maximum(f_open, f_ext_v)
    f_is_ext = f_open <= f_ext_v

    Hm2s = shift_down(H2[:], zero)
    qv = q_ref[:]
    sub = jnp.where((qv == revt_new) & (qv < jnp.int32(4)), cA, -cB)
    dsub = Hm2s + sub

    e1 = jnp.maximum(E, zero)
    f1 = jnp.maximum(F, zero)
    gap1 = jnp.maximum(e1, f1)
    H = jnp.maximum(jnp.maximum(dsub, gap1), zero)

    t_vec = d - row
    valid = (t_vec >= zero) & (t_vec < tlen_ref[:]) & (row < qlen_ref[:])
    H = jnp.where(valid, H, zero)
    E = jnp.where(valid, E, neg)
    F = jnp.where(valid, F, neg)

    h_src = jnp.where(
        H == zero,
        zero,
        jnp.where(dsub >= gap1, one, jnp.where(e1 > f1, jnp.int32(2), jnp.int32(3))),
    )
    dirs = (
        h_src
        | (e_is_ext.astype(jnp.int32) << jnp.int32(2))
        | (f_is_ext.astype(jnp.int32) << jnp.int32(3))
        # bit 4: plain code equality ('='/'X' for the cigar) so the
        # traceback never needs the sequence planes
        | ((qv == revt_new).astype(jnp.int32) << jnp.int32(4))
    )
    dirs = jnp.where(valid, dirs, zero)
    dirs_ref[0] = dirs.astype(jnp.uint8)

    upd = H > besth_ref[:]
    besth_ref[:] = jnp.where(upd, H, besth_ref[:])
    bestt_ref[:] = jnp.where(upd, t_vec, bestt_ref[:])

    H2[:] = h1
    H1[:] = H
    E1[:] = E
    F1[:] = F


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

    q_i32 = q_t.astype(jnp.int32)
    t_i32 = t_t.astype(jnp.int32)
    t_pad = jnp.pad(t_i32, ((0, Dpad - T), (0, 0)), constant_values=4)
    qlen2 = qlen.astype(jnp.int32).reshape(1, B)
    tlen2 = tlen.astype(jnp.int32).reshape(1, B)

    kernel = functools.partial(
        _kernel,
        A=params.match,
        Bm=params.mismatch,
        O=params.gap_open,
        Eg=params.gap_extend,
    )
    dirs, best_h, best_t = pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((Q, B), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda d: (d // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q, B), lambda d: (d, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B), lambda d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # padded to a multiple of 8 diagonals so the traceback kernel
            # can consume (8, Q, B) blocks without a pad copy; rows
            # D..Dpad-1 are never written nor stood on by walkers
            jax.ShapeDtypeStruct((Dpad, Q, B), jnp.uint8),
            jax.ShapeDtypeStruct((Q, B), jnp.int32),
            jax.ShapeDtypeStruct((Q, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, B), jnp.int32),  # H1
            pltpu.VMEM((Q, B), jnp.int32),  # H2
            pltpu.VMEM((Q, B), jnp.int32),  # E1
            pltpu.VMEM((Q, B), jnp.int32),  # F1
            pltpu.VMEM((Q, B), jnp.int32),  # revt
        ],
    )(q_i32, t_pad, qlen2, tlen2)

    # SSW global tie-break: max score, then min t, then min q
    score = jnp.max(best_h, axis=0)  # (B,)
    is_best = best_h == score[None, :]
    INT_MAX = jnp.int32(2**30)
    t_cand = jnp.where(is_best, best_t, INT_MAX)
    t_end = jnp.min(t_cand, axis=0)
    q_end = jnp.argmax(is_best & (best_t == t_end[None, :]), axis=0).astype(jnp.int32)
    # dirs stay in their native (D, Q, B) layout — transposing 50MB of
    # uint8 on-device costs more than the whole DP
    return score, t_end, q_end, dirs, q_i32, t_i32


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
