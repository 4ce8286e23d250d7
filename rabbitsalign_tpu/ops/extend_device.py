"""Fused device-side batched extension: wavefront SW forward + on-device
traceback, one jit, compact host outputs.

The 50 MB direction tensor never leaves the device; the host receives
only a run-length-encoded cigar (RLE_M fixed run slots per pair) plus
score/coords/edits as u16 rows. This replaces the reference's
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
from .tb_pallas import (
    OP_D,
    OP_EQ,
    OP_I,
    OP_NONE,
    OP_X,
    RLE_M,
    _sw_traceback_pallas_core,
)


def extend_batch_device(q_t, t_t, qlen, tlen, params: SwParams):
    """q_t (Q, B) uint8, t_t (T, B) uint8, qlen/tlen (B,) int32.
    Returns (score (B,), t_end, q_end, runs_op (RLE_M, B) i32,
    runs_len (RLE_M, B) i32, meta (8, B) i32)."""
    with jax.enable_x64(False):
        return _extend_batch_device(q_t, t_t, qlen, tlen, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _extend_batch_device(q_t, t_t, qlen, tlen, params: SwParams):
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        q_t, t_t, qlen, tlen, params
    )
    runs_op, runs_len, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)
    return score, t_end, q_end, runs_op, runs_len, meta


# --- packed single-buffer interface -------------------------------------
#
# The host<->device link has ~25 ms per-transfer latency AND the host has
# one core, so the batch aligner ships ONE uint8 array each way and keeps
# it small — the cigar is run-length encoded ON DEVICE (inside the
# traceback walk, tb_pallas.py) into RLE_M fixed run slots per pair
# (~10-20x fewer bytes than raw ops; raw op-stream download dominated the
# single-core grpc serialization cost):
#   input  (Q + T + 4, B):    q codes / t codes / qlen lo,hi / tlen lo,hi
#   output (2*RLE_M + 14, B): 2-byte runs — rows [0,M) length lo byte,
#                             rows [M,2M) (op << 5) | (length >> 8)
#                             (op 3 bits, length 13 bits; lengths cap at
#                             T <= 2048 so 13 bits always fit) — then
#                             score, t_end, q_end, t_begin, q_begin,
#                             edits as u16 (lo,hi) row pairs, then
#                             n_runs u16 (0xFFFF = >M runs -> host
#                             fallback).
# Runs sit at slots [M - n_runs, M) in forward cigar order (the walker
# discovers them back-to-front and fills slots descending from M-1).

OUT_ROWS = 2 * RLE_M + 14

REF_PAGE_BITS = 30  # 1 GiB resident-reference pages (int32-safe offsets)
REF_PAGE_SIZE = 1 << REF_PAGE_BITS
REF_PAGE_OVERLAP = 4096  # >= max target window (T caps at 2048)


def pack_ref_pages(codes: np.ndarray) -> np.ndarray:
    """Reshape the flat nt4 code array into overlapped pages
    (P, PAGE + OVERLAP) so every target window [tstart, tstart+T) lives
    entirely inside the page tstart >> REF_PAGE_BITS. Pad value 4 ('N')."""
    n = codes.shape[0]
    n_pages = max(1, -(-n // REF_PAGE_SIZE))
    # a sub-page genome gets one page of its own size (page id is then
    # always 0 and the in-page offset equals tstart), so small references
    # don't pad to a full GiB
    width = min(REF_PAGE_SIZE, max(n, 1)) + REF_PAGE_OVERLAP
    pages = np.full((n_pages, width), 4, dtype=np.uint8)
    for p in range(n_pages):
        lo = p * REF_PAGE_SIZE
        hi = min(n, lo + width)
        pages[p, : hi - lo] = codes[lo:hi]
    return pages


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


def unpack_output(out: np.ndarray, D: int = 0):
    """Returns (op_runs (M, B), len_runs (M, B), n_runs (B,), score,
    t_end, q_end, t_begin, q_begin, edits). `D` is unused (kept for API
    stability); n_runs == 0xFFFF marks an overflowed (>M-run) pair that
    the caller must re-align on the host."""
    M = RLE_M
    hi = out[M : 2 * M].astype(np.int32)
    op_runs = (hi >> 5).astype(np.uint8)
    len_runs = out[:M].astype(np.int32) | ((hi & 0x1F) << 8)
    vals = []
    for i in range(7):
        lo = out[2 * M + 2 * i].astype(np.int32)
        hi = out[2 * M + 2 * i + 1].astype(np.int32)
        vals.append(lo | (hi << 8))
    score, t_end, q_end, t_begin, q_begin, edits, n_runs = vals
    return (op_runs, len_runs, n_runs, score, t_end, q_end, t_begin,
            q_begin, edits)


def extend_batch_packed(buf, Q: int, T: int, params: SwParams):
    with jax.enable_x64(False):
        return _extend_batch_packed(buf, Q, T, params)


def _pack_rle_output(runs_op, runs_len, score, t_end, q_end, meta):
    """Pack the walker-RLE'd traceback (tb_pallas) into the u8 transfer
    buffer. Runs stay at their descending slots: rows [M - n_runs, M)
    hold the forward-order cigar."""

    def u16rows(v):
        v = v.astype(jnp.int32)
        return jnp.stack([(v & 0xFF).astype(jnp.uint8), ((v >> 8) & 0xFF).astype(jnp.uint8)])

    n_runs = meta[3]
    nr = jnp.where(n_runs > RLE_M, 0xFFFF, n_runs)
    return jnp.concatenate(
        [
            (runs_len & 0xFF).astype(jnp.uint8),
            ((runs_op << 5) | ((runs_len >> 8) & 0x1F)).astype(jnp.uint8),
            u16rows(score),
            u16rows(t_end),
            u16rows(q_end),
            u16rows(meta[0]),  # t_begin
            u16rows(meta[1]),  # q_begin
            u16rows(meta[2]),  # edits
            u16rows(nr),
        ],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("Q", "T", "params"))
def _extend_batch_packed(buf, Q: int, T: int, params: SwParams):
    return _extend_batch_packed_body(buf, Q, T, params)


def ops_to_cigars(
    op_runs: np.ndarray,   # (M, B) uint8 run op codes
    len_runs: np.ndarray,  # (M, B) int32 run lengths
    n_runs: np.ndarray,    # (B,) int32; 0xFFFF = overflow
    score: np.ndarray,
) -> List[Optional[Tuple[Cigar, int]]]:
    """Decode the device-RLE runs into =/X/I/D cigars. Runs live at slots
    [M - n_runs, M) in forward cigar order (tb_pallas slot layout).
    Returns per pair (cigar, n_ops_consumed) or None for score<=0, empty
    streams, and >M-run overflows (caller re-aligns those on the host)."""
    _MAP = {OP_EQ: CIGAR_EQ, OP_X: CIGAR_X, OP_I: CIGAR_INS, OP_D: CIGAR_DEL}
    B = op_runs.shape[1]
    opsT = np.ascontiguousarray(op_runs.T)
    lensT = np.ascontiguousarray(len_runs.T)
    out: List[Optional[Tuple[Cigar, int]]] = []
    for b in range(B):
        nr = int(n_runs[b])
        if score[b] <= 0 or nr == 0 or nr > RLE_M:
            out.append(None)
            continue
        cigar = Cigar()
        total = 0
        ok = True
        off = RLE_M - nr
        for r in range(off, off + nr):
            op = int(opsT[b, r])
            ln = int(lensT[b, r])
            if not 1 <= op <= 4 or ln <= 0:
                ok = False
                break
            cigar.push(_MAP[op], ln)
            total += ln
        out.append((cigar, total) if ok else None)
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


# --- device-resident-reference variant -----------------------------------
#
# The reference genome (nt4 codes, uint8) lives in HBM for the whole run
# (GRCh38 = 3.1 GB, well under one chip's capacity); the host ships ONLY
# query codes + lengths + a u32 global target offset per pair (Q + 8 rows
# vs Q + T + 4), and the kernel gathers each pair's forward target window
# from the resident copy. Cuts per-batch upload ~4-7x on top of the RLE
# download cut; this is the production transfer layout.

def extend_batch_packed_resident(buf, ref_codes, Q: int, T: int,
                                 params: SwParams, sub: int):
    with jax.enable_x64(False):
        return _extend_batch_packed_resident(buf, ref_codes, Q, T, params, sub)


@functools.partial(jax.jit, static_argnames=("Q", "T", "params", "sub"))
def _extend_batch_packed_resident(buf, ref_codes, Q: int, T: int,
                                  params: SwParams, sub: int):
    B = buf.shape[1]
    outs = [
        _extend_resident_body(buf[:, i : i + sub], ref_codes, Q, T, params)
        for i in range(0, B, sub)
    ]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def extend_batch_packed_resident_q2(buf, ref_codes, Q: int, T: int,
                                    params: SwParams, sub: int):
    with jax.enable_x64(False):
        return _extend_batch_packed_resident_q2(buf, ref_codes, Q, T, params,
                                                sub)


@functools.partial(jax.jit, static_argnames=("Q", "T", "params", "sub"))
def _extend_batch_packed_resident_q2(buf, ref_codes, Q: int, T: int,
                                     params: SwParams, sub: int):
    B = buf.shape[1]
    outs = [
        _extend_resident_q2_body(buf[:, i : i + sub], ref_codes, Q, T, params)
        for i in range(0, B, sub)
    ]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def unpack_q2(buf, ref_codes, Q: int, T: int):
    """Decode the q2 upload layout into (q_t (Q,B) u8, t_t (T,B) u8,
    qlen (B,), tlen (B,)): 2-bit-packed queries (chunk_fill_batch_q2) —
    4 codes/byte + N-mask bitmap + u16 lengths + u32 target offset —
    with targets gathered from the device-resident paged reference.
    Shared by the Pallas and portable extend paths."""
    B = buf.shape[1]
    Qp = (Q + 3) // 4
    Qm = (Q + 7) // 8
    packed = buf[:Qp]
    nmask = buf[Qp : Qp + Qm]
    tail = buf[Qp + Qm :]
    r = jnp.arange(Q, dtype=jnp.int32)
    code = (packed[r >> 2] >> ((r & 3) << 1)[:, None].astype(jnp.uint8)) & 3
    nbit = (nmask[r >> 3] >> (r & 7)[:, None].astype(jnp.uint8)) & 1
    qlen = tail[0].astype(jnp.int32) | (tail[1].astype(jnp.int32) << 8)
    tlen = tail[2].astype(jnp.int32) | (tail[3].astype(jnp.int32) << 8)
    q_t = jnp.where((nbit != 0) | (r[:, None] >= qlen[None, :]),
                    jnp.uint8(4), code.astype(jnp.uint8))
    tstart = (
        tail[4].astype(jnp.uint32)
        | (tail[5].astype(jnp.uint32) << 8)
        | (tail[6].astype(jnp.uint32) << 16)
        | (tail[7].astype(jnp.uint32) << 24)
    )
    page = (tstart >> jnp.uint32(REF_PAGE_BITS)).astype(jnp.int32)
    off = (tstart & jnp.uint32(REF_PAGE_SIZE - 1)).astype(jnp.int32)
    page_w = ref_codes.shape[1]
    rows = jnp.arange(T, dtype=jnp.int32)[:, None]
    ridx = jnp.minimum(off[None, :] + rows, page_w - 1)
    t_t = jnp.where(rows < tlen[None, :],
                    ref_codes[page[None, :].repeat(T, axis=0), ridx],
                    jnp.uint8(4))
    return q_t, t_t, qlen, tlen


def _extend_resident_q2_body(buf, ref_codes, Q: int, T: int,
                             params: SwParams):
    q_t, t_t, qlen, tlen = unpack_q2(buf, ref_codes, Q, T)
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        q_t, t_t, qlen, tlen, params
    )
    runs_op, runs_len, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)
    return _pack_rle_output(runs_op, runs_len, score, t_end, q_end, meta)


def _extend_resident_body(buf, ref_codes, Q: int, T: int, params: SwParams):
    B = buf.shape[1]
    qlen = buf[Q].astype(jnp.int32) | (buf[Q + 1].astype(jnp.int32) << 8)
    tlen = buf[Q + 2].astype(jnp.int32) | (buf[Q + 3].astype(jnp.int32) << 8)
    # u32 offsets cover genomes up to 4.29 Gbp (the reference itself caps
    # positions at u32, randstrobes.hpp:23). XLA gather indices are int32
    # under the x64-disabled jit, so a flat >2^31-element gather would
    # wrap; ref_codes therefore arrives as PAGES (P, PAGE + OVERLAP) from
    # pack_ref_pages (1 GiB pages overlapped by the max target length) and
    # both the page id and in-page offset stay comfortably int32
    tstart = (
        buf[Q + 4].astype(jnp.uint32)
        | (buf[Q + 5].astype(jnp.uint32) << 8)
        | (buf[Q + 6].astype(jnp.uint32) << 16)
        | (buf[Q + 7].astype(jnp.uint32) << 24)
    )
    page = (tstart >> jnp.uint32(REF_PAGE_BITS)).astype(jnp.int32)
    off = (tstart & jnp.uint32(REF_PAGE_SIZE - 1)).astype(jnp.int32)
    page_w = ref_codes.shape[1]
    rows = jnp.arange(T, dtype=jnp.int32)[:, None]
    ridx = jnp.minimum(off[None, :] + rows, page_w - 1)
    t_t = jnp.where(rows < tlen[None, :],
                    ref_codes[page[None, :].repeat(T, axis=0), ridx],
                    jnp.uint8(4))
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        buf[:Q], t_t, qlen, tlen, params
    )
    runs_op, runs_len, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)
    return _pack_rle_output(runs_op, runs_len, score, t_end, q_end, meta)


def _extend_batch_packed_body(buf, Q: int, T: int, params: SwParams):
    qlen = buf[Q + T].astype(jnp.int32) | (buf[Q + T + 1].astype(jnp.int32) << 8)
    tlen = buf[Q + T + 2].astype(jnp.int32) | (buf[Q + T + 3].astype(jnp.int32) << 8)
    score, t_end, q_end, dirs, q_i32, t_i32 = _sw_forward_pallas_core(
        buf[:Q], buf[Q : Q + T], qlen, tlen, params
    )
    runs_op, runs_len, meta = _sw_traceback_pallas_core(dirs, score, t_end, q_end)
    return _pack_rle_output(runs_op, runs_len, score, t_end, q_end, meta)
