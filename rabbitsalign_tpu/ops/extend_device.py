"""Fused device-side batched extension: wavefront SW forward + on-device
traceback, one jit, compact host outputs.

The 50 MB direction tensor never leaves the device; the host receives
only (score, t_end, q_end) (B,), an op stream (Dpad, B) uint8 and meta
(8, B) int32 [t_begin, q_begin, edits]. This replaces the reference's
GPU flow of downloading packed traceback matrices + cigars
(/root/reference/GASAL2/src/gasal_align.cu:266-304,
/root/reference/src/gasal2_ssw.cpp:179-249).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..align.cigar import CIGAR_DEL, CIGAR_EQ, CIGAR_INS, CIGAR_X, Cigar
from .sw_jax import SwParams
from .sw_pallas import _sw_forward_pallas_core
from .tb_pallas import OP_D, OP_EQ, OP_I, OP_NONE, OP_X, _sw_traceback_pallas_core


def extend_batch_device(q_t, t_t, qlen, tlen, params: SwParams):
    """q_t (Q, B) uint8, t_t (T, B) uint8, qlen/tlen (B,) int32.
    Returns (score (B,), t_end, q_end, ops (Dpad, B) uint8, meta (8, B))."""
    with jax.enable_x64(False):
        return _extend_batch_device(q_t, t_t, qlen, tlen, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _extend_batch_device(q_t, t_t, qlen, tlen, params: SwParams):
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        q_t, t_t, qlen, tlen, params
    )
    ops, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)
    return score, t_end, q_end, ops, meta


# --- packed single-buffer interface -------------------------------------
#
# The host<->device link has ~25 ms per-transfer latency, so the batch
# aligner ships ONE uint8 array each way:
#   input  (Q + T + 4, B): q codes / t codes / qlen lo,hi / tlen lo,hi
#   output (Dpad + 24, B): op stream, then score, t_end, q_end, t_begin,
#                          q_begin, edits as u16 (lo,hi) row pairs

def pack_input(q_t: np.ndarray, t_t: np.ndarray, qlen: np.ndarray, tlen: np.ndarray) -> np.ndarray:
    Q, B = q_t.shape
    T = t_t.shape[0]
    buf = np.empty((Q + T + 4, B), dtype=np.uint8)
    buf[:Q] = q_t
    buf[Q : Q + T] = t_t
    buf[Q + T] = qlen & 0xFF
    buf[Q + T + 1] = (qlen >> 8) & 0xFF
    buf[Q + T + 2] = tlen & 0xFF
    buf[Q + T + 3] = (tlen >> 8) & 0xFF
    return buf


def unpack_output(out: np.ndarray, D: int):
    """Returns (ops (Dpad, B), score, t_end, q_end, t_begin, q_begin, edits)."""
    Dpad = ((D + 7) // 8) * 8
    ops = out[:Dpad]
    vals = []
    for i in range(6):
        lo = out[Dpad + 2 * i].astype(np.int32)
        hi = out[Dpad + 2 * i + 1].astype(np.int32)
        vals.append(lo | (hi << 8))
    return (ops, *vals)


def extend_batch_packed(buf, Q: int, T: int, params: SwParams):
    with jax.enable_x64(False):
        return _extend_batch_packed(buf, Q, T, params)


@functools.partial(jax.jit, static_argnames=("Q", "T", "params"))
def _extend_batch_packed(buf, Q: int, T: int, params: SwParams):
    B = buf.shape[1]
    q_t = buf[:Q]
    t_t = buf[Q : Q + T]
    qlen = buf[Q + T].astype(jnp.int32) | (buf[Q + T + 1].astype(jnp.int32) << 8)
    tlen = buf[Q + T + 2].astype(jnp.int32) | (buf[Q + T + 3].astype(jnp.int32) << 8)

    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        q_t, t_t, qlen, tlen, params
    )
    ops, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)

    def u16rows(v):
        v = v.astype(jnp.int32)
        return jnp.stack([(v & 0xFF).astype(jnp.uint8), ((v >> 8) & 0xFF).astype(jnp.uint8)])

    tail = jnp.concatenate(
        [
            u16rows(score),
            u16rows(t_end),
            u16rows(q_end),
            u16rows(meta[0]),  # t_begin
            u16rows(meta[1]),  # q_begin
            u16rows(meta[2]),  # edits
        ]
    )
    return jnp.concatenate([ops, tail], axis=0)


def ops_to_cigars(
    ops: np.ndarray,  # (Dpad, B) uint8, ascending diagonal order
    score: np.ndarray,
    D: int,
) -> List[Optional[Tuple[Cigar, int]]]:
    """Run-length encode each pair's op stream into an =/X/I/D cigar.
    Returns per pair (cigar, n_ops_consumed) or None for score<=0."""
    _MAP = {OP_EQ: CIGAR_EQ, OP_X: CIGAR_X, OP_I: CIGAR_INS, OP_D: CIGAR_DEL}
    B = ops.shape[1]
    out: List[Optional[Tuple[Cigar, int]]] = []
    opsT = np.ascontiguousarray(ops[:D].T)  # (B, D)
    for b in range(B):
        if score[b] <= 0:
            out.append(None)
            continue
        stream = opsT[b]
        nz = np.flatnonzero(stream)
        if nz.size == 0:
            out.append(None)
            continue
        vals = stream[nz]
        cigar = Cigar()
        boundaries = np.flatnonzero(vals[1:] != vals[:-1]) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [vals.shape[0]]])
        for rs, re in zip(starts, ends):
            cigar.push(_MAP[int(vals[rs])], int(re - rs))
        out.append((cigar, int(vals.shape[0])))
    return out


def extend_batch_packed_grouped(buf, Q: int, T: int, params: SwParams, sub: int):
    """Like extend_batch_packed but for a buffer whose B columns are a
    multiple of `sub`: runs the kernel per `sub`-column group inside ONE
    jit dispatch (one transfer each way). Cuts host<->device round trips
    when the link is latency-bound; per-kernel VMEM stays at the
    `sub`-sized footprint."""
    with jax.enable_x64(False):
        return _extend_batch_packed_grouped(buf, Q, T, params, sub)


@functools.partial(jax.jit, static_argnames=("Q", "T", "params", "sub"))
def _extend_batch_packed_grouped(buf, Q: int, T: int, params: SwParams, sub: int):
    B = buf.shape[1]
    if B == sub:
        return _extend_batch_packed_body(buf, Q, T, params)
    outs = [
        _extend_batch_packed_body(buf[:, i : i + sub], Q, T, params)
        for i in range(0, B, sub)
    ]
    return jnp.concatenate(outs, axis=1)


def _extend_batch_packed_body(buf, Q: int, T: int, params: SwParams):
    qlen = buf[Q + T].astype(jnp.int32) | (buf[Q + T + 1].astype(jnp.int32) << 8)
    tlen = buf[Q + T + 2].astype(jnp.int32) | (buf[Q + T + 3].astype(jnp.int32) << 8)
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        buf[:Q], buf[Q : Q + T], qlen, tlen, params
    )
    ops, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)

    def u16rows(v):
        v = v.astype(jnp.int32)
        return jnp.stack([(v & 0xFF).astype(jnp.uint8), ((v >> 8) & 0xFF).astype(jnp.uint8)])

    tail = jnp.concatenate(
        [u16rows(score), u16rows(t_end), u16rows(q_end),
         u16rows(meta[0]), u16rows(meta[1]), u16rows(meta[2])]
    )
    return jnp.concatenate([ops, tail], axis=0)
