"""Exact reimplementation of the SSW (striped Smith-Waterman) library
semantics used by the reference aligner (/root/reference/ext/ssw/ssw.c):

* forward pass: local affine-gap DP; score1 = global max; ref_end = first
  reference column attaining it; read_end = first row in that column,
* reverse pass over the reversed prefix determines (ref_begin, read_begin)
  — ties resolve to the shortest alignment,
* cigar from `banded_sw` over the clipped region, band doubling until the
  banded score reaches score1, with its exact direction-code tie-breaks
  (diagonal preferred on H ties; F ("D") preferred over E ("I") on gap
  ties; gap-open preferred only when strictly greater than extension).

The forward/reverse passes are numpy-vectorized along the query dimension
(per reference column), using the prefix-max formulation of the in-column
gap recurrence — exact for gap_open >= gap_extend, which the CLI enforces
(probed: for O < E real ssw.c's lazy-F loop produces yet another
semantics that neither this form nor the engine's scalar recurrence
matches). `banded_sw` is a literal port — its band
is tiny (|refLen-readLen|+1 wide) so Python loops are fine; it is only
used as the host-side golden/fallback, the production extend path runs on
TPU (ops/sw_kernel.py).

Zero-score edge case: ssw returns (score1=0, ref_begin=-1, ref_end=-1,
read_begin=0, read_end=0, cigar="1M"); reproduced verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cigar import CIGAR_DEL, CIGAR_INS, CIGAR_MATCH, Cigar

NEG_INF = -(1 << 30)


@dataclass
class SswResult:
    score1: int
    ref_begin: int
    ref_end: int
    read_begin: int
    read_end: int
    flag: int
    cigar: Cigar  # M/I/D ops over the clipped region (no soft clips)


def _forward_pass(q: np.ndarray, r: np.ndarray, A: int, B: int, O: int, E: int):
    """Return (max_score, ref_end, read_end) with SSW tie-breaking.

    q, r: int8/uint8 code arrays (0..3 bases, 4=N). Matches the 5x5 SSW
    matrix: +A only for equal codes < 4, else -B.
    """
    m = q.shape[0]
    H = np.zeros(m, dtype=np.int64)
    F = np.full(m, NEG_INF, dtype=np.int64)
    best = 0
    best_i = -1
    best_col = None
    idx = np.arange(m, dtype=np.int64)
    qv = q.astype(np.int64)
    for i in range(r.shape[0]):
        sub = np.where((qv == r[i]) & (qv < 4), A, -B)
        Hdiag = np.empty(m, dtype=np.int64)
        Hdiag[0] = 0
        Hdiag[1:] = H[:-1]
        F = np.maximum(H - O, F - E)
        Hhat = np.maximum(np.maximum(Hdiag + sub, F), 0)
        # in-column gap (E) via prefix max: E[j] = max_{j'<j} Hhat[j'] - O - (j-1-j')*gapE
        P = np.maximum.accumulate(Hhat + idx * E)
        Ecol = np.empty(m, dtype=np.int64)
        Ecol[0] = NEG_INF
        Ecol[1:] = P[:-1] - O - (idx[1:] - 1) * E
        H = np.maximum(Hhat, Ecol)
        cmax = int(H.max())
        if cmax > best:
            best = cmax
            best_i = i
            best_col = H.copy()
    if best == 0:
        return 0, -1, 0
    read_end = int(np.argmax(best_col == best))
    return best, best_i, read_end


def banded_sw(
    r: np.ndarray, q: np.ndarray, score: int, O: int, E: int, band_width: int, A: int, B: int
) -> Cigar:
    """Literal port of banded_sw (reference ext/ssw/ssw.c:590-770).

    r/q are the clipped ref/read code arrays; returns the M/I/D cigar.
    """
    ref_len = r.shape[0]
    read_len = q.shape[0]
    length = max(ref_len, read_len)
    qv = q.astype(np.int64)
    rv = r.astype(np.int64)

    while True:
        width = band_width * 2 + 3
        width_d = band_width * 2 + 1
        h_b = np.zeros(width + 1, dtype=np.int64)
        e_b = np.zeros(width + 1, dtype=np.int64)
        h_c = np.zeros(width + 1, dtype=np.int64)
        direction = np.zeros((read_len, width_d, 3), dtype=np.int8)
        mx = 0
        for i in range(read_len):
            beg = max(0, i - band_width)
            end = min(ref_len - 1, i + band_width)
            u_final = 0
            edge = min(end + 1, width - 1)
            f = 0
            h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0
            for j in range(beg, end + 1):
                x = max(0, i - band_width)
                u = j - x + 1
                x1 = max(0, i - 1 - band_width)
                e_idx = j - x1 + 1
                b = j - 1 - x + 1
                d = j - 1 - x1 + 1
                # E (vertical, consumes read -> 'I')
                temp1 = -O if i == 0 else h_b[e_idx] - O
                temp2 = -E if i == 0 else e_b[e_idx] - E
                e_val = max(temp1, temp2)
                de = 3 if temp1 > temp2 else 2
                # F (horizontal, consumes ref -> 'D')
                temp1 = h_c[b] - O
                temp2 = f - E
                f = max(temp1, temp2)
                df = 5 if temp1 > temp2 else 4
                e1 = max(e_val, 0)
                f1 = max(f, 0)
                temp1 = max(e1, f1)
                sub = A if (qv[i] == rv[j] and qv[i] < 4) else -B
                temp2 = h_b[d] + sub
                h_val = max(temp1, temp2)
                if h_val > mx:
                    mx = h_val
                dh = 1 if temp1 <= temp2 else (de if e1 > f1 else df)
                e_b[u] = e_val
                h_c[u] = h_val
                direction[i, j - x, 0] = de
                direction[i, j - x, 1] = df
                direction[i, j - x, 2] = dh
                u_final = u
            h_b[1 : u_final + 1] = h_c[1 : u_final + 1]
        band_width *= 2
        if mx >= score or band_width > length:
            band_width //= 2
            break

    # traceback (reference ext/ssw/ssw.c:676-753)
    i = read_len - 1
    j = ref_len - 1
    e_count = 0
    ops = []  # packed (len<<4|op), to be reversed
    op = prev_op = "M"
    p = 2  # h-layer
    ok = True
    while i >= 0 and j > 0:
        x = max(0, i - band_width)
        d = direction[i, j - x, p]
        if d == 1:
            i -= 1
            j -= 1
            p = 2
            op = "M"
        elif d == 2:
            i -= 1
            p = 0
            op = "I"
        elif d == 3:
            i -= 1
            p = 2
            op = "I"
        elif d == 4:
            j -= 1
            p = 1
            op = "D"
        elif d == 5:
            j -= 1
            p = 2
            op = "D"
        else:
            ok = False
            break
        if op == prev_op:
            e_count += 1
        else:
            ops.append((e_count << 4) | "MIDNSHP=X".index(prev_op))
            prev_op = op
            e_count = 1
    if not ok:
        return Cigar()  # banded_sw failure marker (flag=1 upstream)
    if op == "M":
        ops.append(((e_count + 1) << 4) | CIGAR_MATCH)
    else:
        ops.append((e_count << 4) | "MIDNSHP=X".index(op))
        ops.append((1 << 4) | CIGAR_MATCH)
    ops.reverse()
    return Cigar(ops)


def ssw_align(
    q: np.ndarray, r: np.ndarray, A: int, B: int, O: int, E: int
) -> SswResult:
    """Port of ssw_align with flag=0x0f (begin + cigar always requested)."""
    score1, ref_end, read_end = _forward_pass(q, r, A, B, O, E)
    if score1 == 0:
        return SswResult(0, -1, -1, 0, 0, 0, Cigar([(1 << 4) | CIGAR_MATCH]))

    # reverse pass on reversed prefixes
    q_rev = q[read_end::-1]
    r_rev = r[ref_end::-1]
    score_r, rev_ref_end, rev_read_end = _forward_pass(q_rev, r_rev, A, B, O, E)
    ref_begin = ref_end - rev_ref_end
    read_begin = read_end - rev_read_end
    flag = 0
    if score1 > score_r:
        flag = 2  # alignment path may miss a small part

    ref_len = ref_end - ref_begin + 1
    read_len = read_end - read_begin + 1
    band_width = abs(ref_len - read_len) + 1
    cig = banded_sw(
        r[ref_begin : ref_end + 1], q[read_begin : read_end + 1],
        score1, O, E, band_width, A, B,
    )
    if cig.empty():
        flag = 1
    return SswResult(score1, ref_begin, ref_end, read_begin, read_end, flag, cig)
