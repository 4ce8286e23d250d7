"""Pallas TPU kernel: on-device traceback + run-length encoding.

Second phase of the extend pipeline: sweeps the direction planes produced
by sw_pallas in *reverse* diagonal order while every pair's walker
descends from its alignment end toward its start. Each walker moves at
most one step per diagonal (every move decreases t+q), so one reverse
sweep retires all walkers.

Eight diagonals are processed per grid step (block (8, Q, B)): the
per-step DMA and grid overhead dominates the tiny per-diagonal walker
update, so blocking them 8x is ~the full win. The walker's cell read is
a sublane select; the '='/'X' classification comes from the match bit the
forward pass stored in the direction byte, so no sequence planes are
needed here at all.

The cigar is run-length encoded *inside the walk*: the walker keeps its
current (op, length) and each time the op changes (or the walk ends) the
completed run is stored into a (RLE_M, B) VMEM plane. Encoding here is
nearly free — a couple of (RLE_M, B) selects per diagonal next to the
forward DP's (Q, B) recurrence — whereas RLE-compressing a (D, B) op
stream afterwards in XLA cost as much as the DP itself (measured:
2-4 ms/batch, i.e. ~40% of the original fused kernel).

Because the walk discovers the cigar back-to-front, runs are written at
slot RLE_M-1 - i for the i-th completed run: ascending rows
[RLE_M - n_runs, RLE_M) then hold the runs in *forward* cigar order, so
consumers read them with an offset instead of reversing.

Outputs stay tiny — this exists because the host<->device link has
~25 ms latency and low bandwidth, so shipping the 50 MB direction tensor
to the host (the GPU-reference analog of downloading traceback matrices,
/root/reference/GASAL2/src/gasal_align.cu:266-304) is not viable here:

  * runs_op  (RLE_M, B) int32: cigar op per run slot (1='=' 2='X' 3=I
    4=D), forward order in rows [RLE_M - n_runs, RLE_M),
  * runs_len (RLE_M, B) int32: run lengths in the same slots,
  * meta (8, B) int32: rows [t_begin, q_begin, edits, n_runs, 0..];
    n_runs > RLE_M means the cigar overflowed the run slots and the
    pair must be re-aligned on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RLE_M = 32  # max cigar runs per pair (ungapped reads use the Hamming fast
# path on the host; device pairs are gapped, typically <20 runs; >M runs
# -> 0xFFFF overflow marker -> host re-align, byte-exact either way).
# 32 halves the download rows vs round 2's 64 — on the ~30 MB/s dev
# tunnel the RLE download was the largest remaining per-batch transfer.
# MUST match the `M` constant in native/engine.cpp chunk_set_device_results.

# walker layers
_H = 0
_E = 1
_F = 2
_DONE = 3

OP_NONE = 0
OP_EQ = 1
OP_X = 2
OP_I = 3
OP_D = 4


def _kernel(
    dirs_ref,  # in block (8, Q, B) uint8 — diagonals [8*(G-1-g), +8)
    start_ref,  # (8, B) int32: rows [score, t_end, q_end, ...]
    runs_op_ref,  # out (RLE_M, B) int32 — accumulated across steps
    runs_len_ref,  # out (RLE_M, B) int32
    meta_ref,  # out (8, B) int32
    cur_t,
    cur_q,
    layer,
    edits,
    cur_op,
    cur_len,
    nrun,
    *,
    D: int,
    Q: int,
    G: int,
):
    g = pl.program_id(0)
    base = (jnp.int32(G - 1) - g) * jnp.int32(8)
    B = cur_t.shape[1]
    zero = jnp.int32(0)

    @pl.when(g == 0)
    def _init():
        score = start_ref[pl.ds(0, 1), :]
        cur_t[:] = start_ref[pl.ds(1, 1), :]
        cur_q[:] = start_ref[pl.ds(2, 1), :]
        layer[:] = jnp.where(score > zero, jnp.int32(_H), jnp.int32(_DONE))
        edits[:] = jnp.zeros((1, B), jnp.int32)
        cur_op[:] = jnp.zeros((1, B), jnp.int32)
        cur_len[:] = jnp.zeros((1, B), jnp.int32)
        nrun[:] = jnp.zeros((1, B), jnp.int32)
        meta_ref[:] = jnp.zeros((8, B), jnp.int32)
        runs_op_ref[:] = jnp.zeros((RLE_M, B), jnp.int32)
        runs_len_ref[:] = jnp.zeros((RLE_M, B), jnp.int32)

    # skip blocks no walker can act in: walkers act when their t+q equals
    # the current diagonal, and t+q only decreases, so a block whose top
    # diagonal is above every live walker's t+q is pure padding (most of
    # the sweep for short alignments in a tall bucket)
    live_diag = jnp.where(layer[:] != jnp.int32(_DONE), cur_t[:] + cur_q[:],
                          jnp.int32(-1))

    @pl.when(jnp.max(live_diag) >= base)
    def _active_block():
        _run_block(dirs_ref, runs_op_ref, runs_len_ref, meta_ref, cur_t,
                   cur_q, layer, edits, cur_op, cur_len, nrun, base, Q)


def _run_block(dirs_ref, runs_op_ref, runs_len_ref, meta_ref, cur_t, cur_q,
               layer, edits, cur_op, cur_len, nrun, base, Q):
    B = cur_t.shape[1]
    zero = jnp.int32(0)
    one = jnp.int32(1)
    t_b = cur_t[:]  # (1, B)
    q_b = cur_q[:]
    lay = layer[:]
    ed = edits[:]
    c_op = cur_op[:]
    c_len = cur_len[:]
    n_r = nrun[:]
    rowq = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (RLE_M, B), 0)
    ro = runs_op_ref[:]
    rl = runs_len_ref[:]
    fin_t_acc = meta_ref[pl.ds(0, 1), :]
    fin_q_acc = meta_ref[pl.ds(1, 1), :]
    fin_e_acc = meta_ref[pl.ds(2, 1), :]

    for j in range(7, -1, -1):
        d = base + jnp.int32(j)
        on_diag = (lay != jnp.int32(_DONE)) & (t_b + q_b == d)

        selq = rowq == q_b  # (Q, B) — broadcasts (1, B)
        dir_cell = jnp.sum(
            jnp.where(selq, dirs_ref[j].astype(jnp.int32), zero),
            axis=0,
            keepdims=True,
        )  # (1, B)

        h_src = dir_cell & jnp.int32(3)
        e_ext = (dir_cell >> jnp.int32(2)) & one
        f_ext = (dir_cell >> jnp.int32(3)) & one
        is_match = ((dir_cell >> jnp.int32(4)) & one) == one

        in_h = on_diag & (lay == jnp.int32(_H))
        stop = in_h & (h_src == zero)
        do_m = in_h & (h_src == one)
        do_i = (in_h & (h_src == jnp.int32(2))) | (on_diag & (lay == jnp.int32(_E)))
        do_d = (in_h & (h_src == jnp.int32(3))) | (on_diag & (lay == jnp.int32(_F)))

        op = jnp.where(
            do_m,
            jnp.where(is_match, jnp.int32(OP_EQ), jnp.int32(OP_X)),
            jnp.where(do_i, jnp.int32(OP_I), jnp.where(do_d, jnp.int32(OP_D), zero)),
        )

        # --- in-walk RLE: close the current run when the op changes ----
        has_op = op > zero  # on_diag is implied (op stays 0 off-diagonal)
        change = has_op & (op != c_op)
        emit1 = change & (c_op > zero)
        sel1 = emit1 & (rowm == (jnp.int32(RLE_M - 1) - n_r))
        ro = jnp.where(sel1, c_op, ro)
        rl = jnp.where(sel1, c_len, rl)
        n_r = n_r + emit1.astype(jnp.int32)
        c_op = jnp.where(change, op, c_op)
        c_len = jnp.where(change, one, c_len + has_op.astype(jnp.int32))

        ed = ed + jnp.where(
            do_m & ~is_match, one, jnp.where(do_i | do_d, one, zero)
        )

        new_t = t_b - (do_m | do_d).astype(jnp.int32)
        new_q = q_b - (do_m | do_i).astype(jnp.int32)
        new_layer = jnp.where(
            do_m,
            jnp.int32(_H),
            jnp.where(
                do_i,
                jnp.where(e_ext == one, jnp.int32(_E), jnp.int32(_H)),
                jnp.where(f_ext == one, jnp.int32(_F), jnp.int32(_H)),
            ),
        )
        off = (~stop) & ((new_t < zero) | (new_q < zero))
        finish = on_diag & (stop | off)
        # --- flush the in-progress run when the walk ends ---------------
        flush = finish & (c_op > zero)
        sel2 = flush & (rowm == (jnp.int32(RLE_M - 1) - n_r))
        ro = jnp.where(sel2, c_op, ro)
        rl = jnp.where(sel2, c_len, rl)
        n_r = n_r + flush.astype(jnp.int32)
        c_op = jnp.where(finish, zero, c_op)

        # begins: stop -> current cell + 1; off-edge -> moved cell + 1
        fin_t = jnp.where(stop, t_b + one, new_t + one)
        fin_q = jnp.where(stop, q_b + one, new_q + one)

        t_b = jnp.where(on_diag & ~finish, new_t, t_b)
        q_b = jnp.where(on_diag & ~finish, new_q, q_b)
        lay = jnp.where(finish, jnp.int32(_DONE), jnp.where(on_diag, new_layer, lay))

        fin_t_acc = jnp.where(finish, fin_t, fin_t_acc)
        fin_q_acc = jnp.where(finish, fin_q, fin_q_acc)
        fin_e_acc = jnp.where(finish, ed, fin_e_acc)

    cur_t[:] = t_b
    cur_q[:] = q_b
    layer[:] = lay
    edits[:] = ed
    cur_op[:] = c_op
    cur_len[:] = c_len
    nrun[:] = n_r
    runs_op_ref[:] = ro
    runs_len_ref[:] = rl
    meta_ref[pl.ds(0, 1), :] = fin_t_acc
    meta_ref[pl.ds(1, 1), :] = fin_q_acc
    meta_ref[pl.ds(2, 1), :] = fin_e_acc
    meta_ref[pl.ds(3, 1), :] = n_r


def sw_traceback_pallas(dirs, score, t_end, q_end):
    """dirs (D or Dpad, Q, B) uint8 from sw_pallas (match bit included).
    Returns (runs_op (RLE_M, B) i32, runs_len (RLE_M, B) i32,
    meta (8, B) i32 with rows [t_begin, q_begin, edits, n_runs, 0..])."""
    with jax.enable_x64(False):
        return _sw_traceback_pallas_jit(dirs, score, t_end, q_end)


def _sw_traceback_pallas_core(dirs, score, t_end, q_end):
    Draw, Q, B = dirs.shape
    Dpad = ((Draw + 7) // 8) * 8
    if Draw != Dpad:
        # rows D..Dpad-1 are zero; walkers never stand on those diagonals
        dirs = jnp.pad(dirs, ((0, Dpad - Draw), (0, 0), (0, 0)))
    G = Dpad // 8

    start = jnp.zeros((8, B), jnp.int32)
    start = start.at[0].set(score.astype(jnp.int32))
    start = start.at[1].set(t_end.astype(jnp.int32))
    start = start.at[2].set(q_end.astype(jnp.int32))

    kernel = functools.partial(_kernel, D=Draw, Q=Q, G=G)
    runs_op, runs_len, meta = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, Q, B), lambda g: (G - 1 - g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RLE_M, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RLE_M, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RLE_M, B), jnp.int32),
            jax.ShapeDtypeStruct((RLE_M, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, B), jnp.int32),  # cur_t
            pltpu.VMEM((1, B), jnp.int32),  # cur_q
            pltpu.VMEM((1, B), jnp.int32),  # layer
            pltpu.VMEM((1, B), jnp.int32),  # edits
            pltpu.VMEM((1, B), jnp.int32),  # cur_op
            pltpu.VMEM((1, B), jnp.int32),  # cur_len
            pltpu.VMEM((1, B), jnp.int32),  # nrun
        ],
    )(dirs, start)
    return runs_op, runs_len, meta

_sw_traceback_pallas_jit = jax.jit(_sw_traceback_pallas_core)
