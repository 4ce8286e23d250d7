// Native mapping engine: per-chunk phase A (seeding, NAM chaining,
// mapping decisions, Hamming fast path, job emission) and phase B
// (device-result post-processing, pairing/rescue replay, SAM/PAF
// formatting) in C++, with the batched gapped extension running on the
// TPU in between.
//
// This is the TPU framework's equivalent of the reference's worker core
// (/root/reference/src/aln.cpp align_{SE,PE}_read_part/_last,
// /root/reference/src/pc.cpp part2_* helpers, /root/reference/src/sam.cpp)
// — a fresh implementation of the same semantics as the validated Python
// layer (pipeline/batched.py, map/{se,pe,common}.py, io/sam.py,
// align/{ssw,aligner,hamming}.py), which this engine must match
// byte-for-byte (tests/test_engine.py).
//
// Exposed via ctypes; all numpy arrays are borrowed zero-copy. Calls
// release the GIL (ctypes default), so N Python threads running chunks
// through their own Engine instances scale like the reference's worker
// threads.

#include "seednam.cpp"

#include <cassert>
#include <cmath>
#include <cstdio>
#include <chrono>
#include <cstring>
#include <deque>
#include <string>
#include <tuple>
// SSE2 is baseline on x86-64 (the striped SSW port needs __m128i even
// in non-native builds like the sanitizer drivers); wider ISA paths
// keep their own __AVX2__/__AVX512BW__ guards. Non-x86 hosts get a
// clear diagnostic instead of a missing-header error: the auto-build
// catches the failure and the package degrades to the validated
// Python layer (native/__init__.py returns None -> engine_available()
// is False).
#if !defined(__x86_64__) && !defined(__SSE2__)
#error "engine.cpp targets x86-64 (SSE2 baseline); non-x86 hosts run the Python layer"
#endif
#include <immintrin.h>
#ifdef __linux__
#include <sys/resource.h>
#include <sys/syscall.h>
#include <unistd.h>
#endif

namespace engine {

using NamT = Nam;  // from seednam.cpp (anonymous namespace, same TU)

// ------------------------------------------------------------------
// CIGAR: packed (len<<4 | op) u32 ops. Ops: M I D N S H P = X -> 0..8
// (same layout as align/cigar.py / reference src/cigar.hpp).

enum { OP_M = 0, OP_I = 1, OP_D = 2, OP_S = 4, OP_EQ = 7, OP_X = 8 };
static const char OPS_STR[] = "MIDNSHP=X";

// write u backwards as decimal into the bytes before `end`; returns the
// first digit. Replaces snprintf in the SAM/PAF text hot paths.
static inline char* dec_rev(char* end, u64 u) {
    char* p = end;
    do {
        *--p = (char)('0' + (u % 10));
        u /= 10;
    } while (u);
    return p;
}

struct CigarC {
    std::vector<u32> ops;

    bool empty() const { return ops.empty(); }
    void clear() { ops.clear(); }
    void push(int op, i64 len) {
        if (len == 0) return;
        if (!ops.empty() && (int)(ops.back() & 0xF) == op)
            ops.back() += (u32)(len << 4);
        else
            ops.push_back((u32)((len << 4) | op));
    }
    void extend(const CigarC& other) {
        for (u32 ol : other.ops) push(ol & 0xF, ol >> 4);
    }
    // append as text; to_m merges =/X into M (io/sam.py _cigar_string)
    void append_str(std::string& out, bool eqx) const {
        if (ops.empty()) {
            out += '*';
            return;
        }
        // manual decimal formatting: snprintf dominated the phase-B
        // profile (SAM text is ~1.5 us/read); digits are byte-identical
        // to "%u" by construction
        char buf[16];
        char* endb = buf + 15;
        if (eqx) {
            for (u32 ol : ops) {
                char* p = dec_rev(endb, ol >> 4);
                *endb = OPS_STR[ol & 0xF];
                out.append(p, (size_t)(endb + 1 - p));
            }
        } else {
            u32 run_len = 0;
            int run_op = -1;
            for (u32 ol : ops) {
                int op = ol & 0xF;
                if (op == OP_EQ || op == OP_X) op = OP_M;
                if (op == run_op)
                    run_len += ol >> 4;
                else {
                    if (run_op >= 0) {
                        char* p = dec_rev(endb, run_len);
                        *endb = OPS_STR[run_op];
                        out.append(p, (size_t)(endb + 1 - p));
                    }
                    run_op = op;
                    run_len = ol >> 4;
                }
            }
            char* p = dec_rev(endb, run_len);
            *endb = OPS_STR[run_op];
            out.append(p, (size_t)(endb + 1 - p));
        }
    }
};

// ------------------------------------------------------------------
// std::minstd_rand + libstdc++ uniform_int_distribution + std::shuffle,
// bit-exact (map/randomness.py; validated against libstdc++ goldens).

struct MinstdRand {
    u64 state;
    static constexpr u64 M = 2147483647ULL;
    static constexpr u64 A = 48271ULL;
    static constexpr u64 URNGRANGE = 2147483645ULL;  // max-min

    explicit MinstdRand(u64 seed = 1) { reseed(seed); }
    void reseed(u64 value) {
        value %= M;
        state = value != 0 ? value : 1;
    }
    u64 next() {
        state = (state * A) % M;
        return state;
    }
};

static i64 uniform_int(MinstdRand& g, i64 a, i64 b) {
    u64 urange = (u64)(b - a);
    u64 uerange = urange + 1;
    u64 scaling = MinstdRand::URNGRANGE / uerange;
    u64 past = uerange * scaling;
    u64 ret;
    do {
        ret = g.next() - 1;  // minstd min() == 1
    } while (ret >= past);
    return (i64)(ret / scaling) + a;
}

template <class T>
static void shuffle_vec(std::vector<T>& seq, size_t n, MinstdRand& g) {
    // libstdc++ std::shuffle two-uniform-ints fast path (always taken for
    // minstd + small n); shuffles seq[0..n)
    if (n == 0) return;
    size_t i = 1;
    if (n % 2 == 0) {
        i64 j = uniform_int(g, 0, 1);
        std::swap(seq[1], seq[j]);
        i = 2;
    }
    while (i < n) {
        i64 swap_range = (i64)i + 1;
        i64 x = uniform_int(g, 0, swap_range * (swap_range + 1) - 1);
        i64 p0 = x / (swap_range + 1);
        i64 p1 = x % (swap_range + 1);
        std::swap(seq[i], seq[p0]);
        i += 1;
        std::swap(seq[i], seq[p1]);
        i += 1;
    }
}

// ------------------------------------------------------------------
// Alignment result types (align/hamming.py AlignmentInfo, io/sam.py
// Alignment / reference src/aligner.hpp:20-30, src/sam.hpp:12-25).

struct AlignmentInfoC {
    CigarC cigar;
    int edit_distance = 0;
    int ref_start = 0, ref_end = 0;
    int query_start = 0, query_end = 0;
    int sw_score = 0;
    int ref_span() const { return ref_end - ref_start; }
};

struct AlignmentC {
    int ref_id = 0;
    int ref_start = 0;
    CigarC cigar;
    int edit_distance = 0;
    int global_ed = 0;
    int score = 0;
    int length = 0;
    bool is_rc = false;
    bool is_unaligned = false;
    bool gapped = false;
};

// ------------------------------------------------------------------
// SSW forward passes: FAITHFUL simulation of the reference's striped
// library (/root/reference/ext/ssw/ssw.c sw_sse2_byte / sw_sse2_word)
// with ssw_init's score_size=2 adaptive flow (byte first, word rerun on
// saturation). ssw.c's Farrar formulation is NOT the textbook local
// affine DP — semantics this port preserves bug-for-bug (probed via
// tests/test_param_fuzz.py; minimal divergence case q=AGCNNCGT
// r=AGCCGT A3 B12 O4 E4: ssw 9, textbook 10):
//   * insertion gaps open only from pre-insertion H (SWPS3 "disallow
//     adjacent insertion then deletion": E never updated from
//     lazy-F-corrected H),
//   * deletion states update from the MAIN-pass H (in-lane F only),
//   * the lazy-F loop stops GLOBALLY at the first (round, stripe)
//     where no lane has vF > max(H - gapO, 0), cutting productive
//     pure extensions,
//   * lane geometry (segLen = ceil(readLen/lanes)) decides where
//     in-lane propagation ends, so the 16-lane byte and 8-lane word
//     kernels are semantically DIFFERENT programs — both implemented,
//     chosen adaptively like ssw.c. Padded lane positions carry
//     0-substitution cells exactly like qP_byte/qP_word build them.
// The python twin (align/ssw.py _striped_pass) simulates the same
// algorithm; tests/sanitize/ssw_simd_fuzz.cpp gates this port against
// the REAL ssw.c linked from the reference tree.

struct StripedEnd {
    i64 score;
    i64 ref_end;   // -1 when nothing scored (byte); 0-init quirk (word)
    i64 read_end;
    bool overflow;  // byte pass: max + bias >= 255 -> rerun in word
};

static StripedEnd sw_striped_byte(const u8* q, i64 m, const u8* r, i64 n,
                                  int A, int B, int O, int E, int terminate,
                                  std::vector<__m128i>& prof,
                                  std::vector<__m128i>& Hs,
                                  std::vector<__m128i>& Hl,
                                  std::vector<__m128i>& Ee,
                                  std::vector<__m128i>& Hmx) {
    if (m <= 0 || n <= 0) return {0, -1, m > 0 ? m - 1 : 0, false};
    const int bias = B;  // abs(min of the 5x5 matrix) = mismatch
    const i64 seg = (m + 15) / 16;
    prof.resize(5 * seg);
    {
        int8_t* t = (int8_t*)prof.data();
        for (int c = 0; c < 5; ++c)
            for (i64 j = 0; j < seg; ++j)
                for (int l = 0; l < 16; ++l) {
                    i64 p = j + l * seg;
                    int v = p >= m ? bias
                                   : ((q[p] == c && q[p] < 4) ? A + bias
                                                              : bias - B);
                    *t++ = (int8_t)v;
                }
    }
    Hs.assign(seg, _mm_setzero_si128());
    Hl.assign(seg, _mm_setzero_si128());
    Ee.assign(seg, _mm_setzero_si128());
    Hmx.assign(seg, _mm_setzero_si128());
    const __m128i vGapO = _mm_set1_epi8((char)(u8)O);
    const __m128i vGapE = _mm_set1_epi8((char)(u8)E);
    const __m128i vBias = _mm_set1_epi8((char)(u8)bias);
    const __m128i vZero = _mm_setzero_si128();
    __m128i* pvHStore = Hs.data();
    __m128i* pvHLoad = Hl.data();
    __m128i* pvE = Ee.data();
    int best = 0;
    i64 end_ref = -1, end_read = m - 1;
    bool overflow = false;
    for (i64 i = 0; i < n; ++i) {
        __m128i e, vF = vZero, vMaxColumn = vZero;
        __m128i vH = _mm_slli_si128(pvHStore[seg - 1], 1);
        const __m128i* vP = prof.data() + (i64)r[i] * seg;
        std::swap(pvHStore, pvHLoad);
        for (i64 j = 0; j < seg; ++j) {
            vH = _mm_adds_epu8(vH, vP[j]);
            vH = _mm_subs_epu8(vH, vBias);
            e = pvE[j];
            vH = _mm_max_epu8(vH, e);
            vH = _mm_max_epu8(vH, vF);
            vMaxColumn = _mm_max_epu8(vMaxColumn, vH);
            pvHStore[j] = vH;
            vH = _mm_subs_epu8(vH, vGapO);
            e = _mm_subs_epu8(e, vGapE);
            e = _mm_max_epu8(e, vH);
            pvE[j] = e;
            vF = _mm_subs_epu8(vF, vGapE);
            vF = _mm_max_epu8(vF, vH);
            vH = pvHLoad[j];
        }
        for (int k = 0; k < 16; ++k) {
            vF = _mm_slli_si128(vF, 1);
            bool stop = false;
            for (i64 j = 0; j < seg; ++j) {
                vH = _mm_max_epu8(pvHStore[j], vF);
                vMaxColumn = _mm_max_epu8(vMaxColumn, vH);
                pvHStore[j] = vH;
                vH = _mm_subs_epu8(vH, vGapO);
                vF = _mm_subs_epu8(vF, vGapE);
                __m128i t = _mm_cmpeq_epi8(_mm_subs_epu8(vF, vH), vZero);
                if (_mm_movemask_epi8(t) == 0xffff) {
                    stop = true;
                    break;
                }
            }
            if (stop) break;
        }
        __m128i vm = vMaxColumn;
        vm = _mm_max_epu8(vm, _mm_srli_si128(vm, 8));
        vm = _mm_max_epu8(vm, _mm_srli_si128(vm, 4));
        vm = _mm_max_epu8(vm, _mm_srli_si128(vm, 2));
        vm = _mm_max_epu8(vm, _mm_srli_si128(vm, 1));
        int colmax = _mm_extract_epi16(vm, 0) & 0xff;
        if (colmax > best) {
            best = colmax;
            if (best + bias >= 255) {
                overflow = true;
                break;
            }
            end_ref = i;
            for (i64 j = 0; j < seg; ++j) Hmx[j] = pvHStore[j];
        }
        if (colmax == terminate) break;
    }
    if (!overflow) {
        const u8* t = (const u8*)Hmx.data();
        for (i64 idx = 0; idx < seg * 16; ++idx)
            if ((int)t[idx] == best) {
                i64 p = idx / 16 + (idx % 16) * seg;
                if (p < end_read) end_read = p;
            }
    }
    return {(i64)best, end_ref, end_read, overflow};
}

static StripedEnd sw_striped_word(const u8* q, i64 m, const u8* r, i64 n,
                                  int A, int B, int O, int E, int terminate,
                                  std::vector<__m128i>& prof,
                                  std::vector<__m128i>& Hs,
                                  std::vector<__m128i>& Hl,
                                  std::vector<__m128i>& Ee,
                                  std::vector<__m128i>& Hmx) {
    if (m <= 0 || n <= 0) return {0, 0, m > 0 ? m - 1 : 0, false};
    const i64 seg = (m + 7) / 8;
    prof.resize(5 * seg);
    {
        int16_t* t = (int16_t*)prof.data();
        for (int c = 0; c < 5; ++c)
            for (i64 j = 0; j < seg; ++j)
                for (int l = 0; l < 8; ++l) {
                    i64 p = j + l * seg;
                    int v = p >= m ? 0 : ((q[p] == c && q[p] < 4) ? A : -B);
                    *t++ = (int16_t)v;
                }
    }
    Hs.assign(seg, _mm_setzero_si128());
    Hl.assign(seg, _mm_setzero_si128());
    Ee.assign(seg, _mm_setzero_si128());
    Hmx.assign(seg, _mm_setzero_si128());
    const __m128i vGapO = _mm_set1_epi16((short)O);
    const __m128i vGapE = _mm_set1_epi16((short)E);
    __m128i* pvHStore = Hs.data();
    __m128i* pvHLoad = Hl.data();
    __m128i* pvE = Ee.data();
    int best = 0;
    i64 end_ref = 0, end_read = m - 1;  // end_ref 0-init: ssw.c quirk
    for (i64 i = 0; i < n; ++i) {
        __m128i e, vF = _mm_setzero_si128();
        __m128i vMaxColumn = _mm_setzero_si128();
        __m128i vH = _mm_slli_si128(pvHStore[seg - 1], 2);
        const __m128i* vP = prof.data() + (i64)r[i] * seg;
        std::swap(pvHStore, pvHLoad);
        for (i64 j = 0; j < seg; ++j) {
            vH = _mm_adds_epi16(vH, vP[j]);
            e = pvE[j];
            vH = _mm_max_epi16(vH, e);
            vH = _mm_max_epi16(vH, vF);
            vMaxColumn = _mm_max_epi16(vMaxColumn, vH);
            pvHStore[j] = vH;
            vH = _mm_subs_epu16(vH, vGapO);
            e = _mm_subs_epu16(e, vGapE);
            e = _mm_max_epi16(e, vH);
            pvE[j] = e;
            vF = _mm_subs_epu16(vF, vGapE);
            vF = _mm_max_epi16(vF, vH);
            vH = pvHLoad[j];
        }
        for (int k = 0; k < 8; ++k) {
            vF = _mm_slli_si128(vF, 2);
            bool stop = false;
            for (i64 j = 0; j < seg; ++j) {
                vH = _mm_max_epi16(pvHStore[j], vF);
                vMaxColumn = _mm_max_epi16(vMaxColumn, vH);
                pvHStore[j] = vH;
                vH = _mm_subs_epu16(vH, vGapO);
                vF = _mm_subs_epu16(vF, vGapE);
                if (!_mm_movemask_epi8(_mm_cmpgt_epi16(vF, vH))) {
                    stop = true;
                    break;
                }
            }
            if (stop) break;
        }
        __m128i vm = vMaxColumn;
        vm = _mm_max_epi16(vm, _mm_srli_si128(vm, 8));
        vm = _mm_max_epi16(vm, _mm_srli_si128(vm, 4));
        vm = _mm_max_epi16(vm, _mm_srli_si128(vm, 2));
        int colmax = (int)(int16_t)_mm_extract_epi16(vm, 0);
        if (colmax > best) {
            best = colmax;
            end_ref = i;
            for (i64 j = 0; j < seg; ++j) Hmx[j] = pvHStore[j];
        }
        if (colmax == terminate) break;
    }
    {
        const uint16_t* t = (const uint16_t*)Hmx.data();
        for (i64 idx = 0; idx < seg * 8; ++idx)
            if ((int)t[idx] == best) {
                i64 p = idx / 8 + (idx % 8) * seg;
                if (p < end_read) end_read = p;
            }
    }
    return {(i64)best, end_ref, end_read, false};
}

// literal port of banded_sw (align/ssw.py:85-200 / ext/ssw/ssw.c:590-770)
static bool banded_sw(const u8* r, i64 ref_len, const u8* q, i64 read_len,
                      i64 score, int O, int E, i64 band_width, int A, int B,
                      CigarC& out) {
    i64 length = std::max(ref_len, read_len);
    std::vector<i64> h_b, e_b, h_c;
    std::vector<int8_t> direction;  // (read_len, width_d, 3)
    i64 width_d = 0;
    while (true) {
        i64 width = band_width * 2 + 3;
        width_d = band_width * 2 + 1;
        h_b.assign(width + 1, 0);
        e_b.assign(width + 1, 0);
        h_c.assign(width + 1, 0);
        direction.assign((size_t)(read_len * width_d * 3), 0);
        i64 mx = 0;
        for (i64 i = 0; i < read_len; ++i) {
            i64 beg = std::max((i64)0, i - band_width);
            i64 end = std::min(ref_len - 1, i + band_width);
            i64 u_final = 0;
            i64 edge = std::min(end + 1, width - 1);
            i64 f = 0;
            h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0;
            for (i64 j = beg; j <= end; ++j) {
                i64 x = std::max((i64)0, i - band_width);
                i64 u = j - x + 1;
                i64 x1 = std::max((i64)0, i - 1 - band_width);
                i64 e_idx = j - x1 + 1;
                i64 b = j - 1 - x + 1;
                i64 d = j - 1 - x1 + 1;
                i64 temp1 = (i == 0) ? -O : h_b[e_idx] - O;
                i64 temp2 = (i == 0) ? -E : e_b[e_idx] - E;
                i64 e_val = std::max(temp1, temp2);
                int de = temp1 > temp2 ? 3 : 2;
                temp1 = h_c[b] - O;
                temp2 = f - E;
                f = std::max(temp1, temp2);
                int df = temp1 > temp2 ? 5 : 4;
                i64 e1 = std::max(e_val, (i64)0);
                i64 f1 = std::max(f, (i64)0);
                temp1 = std::max(e1, f1);
                i64 sub = (q[i] == r[j] && q[i] < 4) ? A : -B;
                temp2 = h_b[d] + sub;
                i64 h_val = std::max(temp1, temp2);
                if (h_val > mx) mx = h_val;
                int dh = temp1 <= temp2 ? 1 : (e1 > f1 ? de : df);
                e_b[u] = e_val;
                h_c[u] = h_val;
                int8_t* dir = &direction[(size_t)((i * width_d + (j - x)) * 3)];
                dir[0] = (int8_t)de;
                dir[1] = (int8_t)df;
                dir[2] = (int8_t)dh;
                u_final = u;
            }
            for (i64 u = 1; u <= u_final; ++u) h_b[u] = h_c[u];
        }
        band_width *= 2;
        if (mx >= score || band_width > length) {
            band_width /= 2;
            break;
        }
    }

    // traceback
    i64 i = read_len - 1, j = ref_len - 1;
    i64 e_count = 0;
    std::vector<u32> ops;  // packed, reversed at the end
    char op = 'M', prev_op = 'M';
    int p = 2;
    bool ok = true;
    auto op_code = [](char c) -> int {
        switch (c) {
            case 'M': return 0;
            case 'I': return 1;
            case 'D': return 2;
            default: return 0;
        }
    };
    while (i >= 0 && j > 0) {
        i64 x = std::max((i64)0, i - band_width);
        int dgn = direction[(size_t)((i * width_d + (j - x)) * 3 + p)];
        switch (dgn) {
            case 1: i--; j--; p = 2; op = 'M'; break;
            case 2: i--; p = 0; op = 'I'; break;
            case 3: i--; p = 2; op = 'I'; break;
            case 4: j--; p = 1; op = 'D'; break;
            case 5: j--; p = 2; op = 'D'; break;
            default: ok = false; break;
        }
        if (!ok) break;
        if (op == prev_op)
            e_count += 1;
        else {
            ops.push_back((u32)((e_count << 4) | op_code(prev_op)));
            prev_op = op;
            e_count = 1;
        }
    }
    if (!ok) {
        out.clear();
        return false;
    }
    if (op == 'M') {
        ops.push_back((u32)(((e_count + 1) << 4) | OP_M));
    } else {
        ops.push_back((u32)((e_count << 4) | op_code(op)));
        ops.push_back((u32)((1 << 4) | OP_M));
    }
    std::reverse(ops.begin(), ops.end());
    out.ops = std::move(ops);
    return true;
}

struct SswResultC {
    i64 score1;
    i64 ref_begin, ref_end;
    i64 read_begin, read_end;
    int flag;
    CigarC cigar;  // M/I/D over the clipped region
};

struct SswScratch {
    std::vector<__m128i> prof, Hs, Hl, Ee, Hmx;
    std::vector<u8> qcodes, rcodes, qrev, rrev;
};

static void encode_codes(const u8* seq, i64 n, std::vector<u8>& out) {
    out.resize(n);
    for (i64 i = 0; i < n; ++i) out[i] = (u8)nt4(seq[i]);
}

static SswResultC ssw_align_c(const u8* q, i64 m, const u8* r, i64 n,
                              int A, int B, int O, int E, SswScratch& s) {
    // ssw_init score_size=2 flow: byte kernel first, word rerun when the
    // biased u8 arithmetic saturated (reference ext/ssw/ssw.c:843-857)
    StripedEnd fwd = sw_striped_byte(q, m, r, n, A, B, O, E, 255, s.prof,
                                     s.Hs, s.Hl, s.Ee, s.Hmx);
    bool word = false;
    if (fwd.overflow) {
        fwd = sw_striped_word(q, m, r, n, A, B, O, E, -1, s.prof, s.Hs, s.Hl,
                              s.Ee, s.Hmx);
        word = true;
    }
    SswResultC res;
    if (fwd.score == 0) {
        res = {0, -1, -1, 0, 0, 0, {}};
        res.cigar.ops.push_back((1 << 4) | OP_M);
        return res;
    }
    // reverse pass over reversed prefixes at the SAME lane width,
    // terminated at the known best score (ssw.c:875-886)
    s.qrev.assign(q, q + fwd.read_end + 1);
    std::reverse(s.qrev.begin(), s.qrev.end());
    s.rrev.assign(r, r + fwd.ref_end + 1);
    std::reverse(s.rrev.begin(), s.rrev.end());
    StripedEnd rev =
        word ? sw_striped_word(s.qrev.data(), (i64)s.qrev.size(),
                               s.rrev.data(), (i64)s.rrev.size(), A, B, O, E,
                               (int)fwd.score, s.prof, s.Hs, s.Hl, s.Ee,
                               s.Hmx)
             : sw_striped_byte(s.qrev.data(), (i64)s.qrev.size(),
                               s.rrev.data(), (i64)s.rrev.size(), A, B, O, E,
                               (int)fwd.score, s.prof, s.Hs, s.Hl, s.Ee,
                               s.Hmx);
    i64 ref_begin = fwd.ref_end - rev.ref_end;
    i64 read_begin = fwd.read_end - rev.read_end;
    int flag = fwd.score > rev.score ? 2 : 0;

    i64 ref_len = fwd.ref_end - ref_begin + 1;
    i64 read_len = fwd.read_end - read_begin + 1;
    i64 band_width = std::abs(ref_len - read_len) + 1;
    CigarC cig;
    bool ok = banded_sw(r + ref_begin, ref_len, q + read_begin, read_len,
                        fwd.score, O, E, band_width, A, B, cig);
    if (!ok || cig.empty()) flag = 1;
    return {fwd.score, ref_begin, fwd.ref_end, read_begin, fwd.read_end, flag,
            std::move(cig)};
}

// ------------------------------------------------------------------
// Aligner facade (align/aligner.py / reference src/aligner.cpp).

struct AlnParams {
    int match, mismatch, gap_open, gap_extend, end_bonus;
};

struct AlignerC {
    AlnParams p;
    i64 calls = 0;
    SswScratch scratch;

    void fail_info(AlignmentInfoC& aln, int score) {
        aln = AlignmentInfoC();
        aln.edit_distance = 100000;
        aln.ref_start = 0;
        aln.sw_score = score;
    }

    // greedy end-bonus extension (align/aligner.py _extend_to_ends)
    void extend_to_ends(AlignmentInfoC& aln, const u8* query, i64 qn,
                        const u8* ref, i64 rn) {
        // front
        i64 qstart = aln.query_start, rstart = aln.ref_start;
        i64 score = aln.sw_score, edits = aln.edit_distance;
        std::vector<int> front_ops;
        while (qstart > 0 && rstart > 0) {
            qstart--;
            rstart--;
            if (query[qstart] == ref[rstart]) {
                score += p.match;
                front_ops.push_back(OP_EQ);
            } else {
                score -= p.mismatch;
                front_ops.push_back(OP_X);
                edits++;
            }
        }
        if (qstart == 0 && score + p.end_bonus > aln.sw_score) {
            CigarC front;
            for (auto it = front_ops.rbegin(); it != front_ops.rend(); ++it)
                front.push(*it, 1);
            if (aln.query_start > 0) {
                // drop the leading softclip
                CigarC rest;
                rest.ops.assign(aln.cigar.ops.begin() + 1, aln.cigar.ops.end());
                front.extend(rest);
                aln.cigar = std::move(front);
            } else if (!front.ops.empty()) {
                front.extend(aln.cigar);
                aln.cigar = std::move(front);
            }
            aln.query_start = 0;
            aln.ref_start = (int)rstart;
            aln.sw_score = (int)(score + p.end_bonus);
            aln.edit_distance = (int)edits;
        }
        // back
        i64 qend = aln.query_end, rend = aln.ref_end;
        score = aln.sw_score;
        edits = aln.edit_distance;
        CigarC back;
        while (qend < qn && rend < rn) {
            if (query[qend] == ref[rend]) {
                score += p.match;
                back.push(OP_EQ, 1);
            } else {
                score -= p.mismatch;
                back.push(OP_X, 1);
                edits++;
            }
            qend++;
            rend++;
        }
        if (qend == qn && score + p.end_bonus > aln.sw_score) {
            if (aln.query_end < qn && !aln.cigar.ops.empty())
                aln.cigar.ops.pop_back();  // trailing softclip
            aln.cigar.extend(back);
            aln.query_end = (int)qn;
            aln.ref_end = (int)rend;
            aln.sw_score = (int)(score + p.end_bonus);
            aln.edit_distance = (int)edits;
        }
    }

    // full host alignment (align/aligner.py Aligner.align)
    void align(const u8* query, i64 qn, const u8* ref, i64 rn,
               AlignmentInfoC& aln) {
        calls++;
        if (rn > 2000) {
            fail_info(aln, -1000000);
            return;
        }
        encode_codes(query, qn, scratch.qcodes);
        encode_codes(ref, rn, scratch.rcodes);
        SswResultC res = ssw_align_c(scratch.qcodes.data(), qn,
                                     scratch.rcodes.data(), rn, p.match,
                                     p.mismatch, p.gap_open, p.gap_extend,
                                     scratch);
        if (res.score1 == 0 || res.flag != 0) {
            fail_info(aln, -100000);
            return;
        }
        // '='/'X' cigar + mismatch count on codes
        aln = AlignmentInfoC();
        CigarC& cigar = aln.cigar;
        if (res.read_begin > 0) cigar.push(OP_S, res.read_begin);
        i64 i = res.read_begin, j = res.ref_begin;
        i64 mismatches = 0;
        const u8* qc = scratch.qcodes.data();
        const u8* rc = scratch.rcodes.data();
        for (u32 ol : res.cigar.ops) {
            int op = ol & 0xF;
            i64 length = ol >> 4;
            if (op == OP_M) {
                i64 run_start = 0;
                bool run_eq = false;
                for (i64 t2 = 0; t2 < length; ++t2) {
                    bool eq = qc[i + t2] == rc[j + t2];
                    if (!eq) mismatches++;
                    if (t2 == 0) {
                        run_eq = eq;
                        run_start = 0;
                    } else if (eq != run_eq) {
                        cigar.push(run_eq ? OP_EQ : OP_X, t2 - run_start);
                        run_eq = eq;
                        run_start = t2;
                    }
                }
                if (length) cigar.push(run_eq ? OP_EQ : OP_X, length - run_start);
                i += length;
                j += length;
            } else if (op == OP_I) {
                mismatches += length;
                cigar.push(op, length);
                i += length;
            } else if (op == OP_D) {
                mismatches += length;
                cigar.push(op, length);
                j += length;
            }
        }
        i64 end_clip = qn - res.read_end - 1;
        if (end_clip > 0) cigar.push(OP_S, end_clip);
        aln.edit_distance = (int)mismatches;
        aln.sw_score = (int)res.score1;
        aln.ref_start = (int)res.ref_begin;
        aln.ref_end = (int)res.ref_end + 1;
        aln.query_start = (int)res.read_begin;
        aln.query_end = (int)res.read_end + 1;
        extend_to_ends(aln, query, qn, ref, rn);
    }

    // postprocess an externally computed alignment (BatchAligner._finish +
    // align_from_ends semantics)
    void align_from_ends(const u8* query, i64 qn, const u8* ref, i64 rn,
                         int score, i64 query_start, i64 query_end,
                         i64 ref_start, i64 ref_end, const CigarC& eqx_cigar,
                         int edit_distance, AlignmentInfoC& aln) {
        calls++;
        if (rn > 2000) {
            fail_info(aln, -1000000);
            return;
        }
        aln = AlignmentInfoC();
        CigarC cigar;
        if (query_start > 0) cigar.push(OP_S, query_start);
        cigar.extend(eqx_cigar);
        i64 end_clip = qn - query_end;
        if (end_clip > 0) cigar.push(OP_S, end_clip);
        aln.cigar = std::move(cigar);
        aln.edit_distance = edit_distance;
        aln.sw_score = score;
        aln.ref_start = (int)ref_start;
        aln.ref_end = (int)ref_end;
        aln.query_start = (int)query_start;
        aln.query_end = (int)query_end;
        extend_to_ends(aln, query, qn, ref, rn);
    }
};

// ------------------------------------------------------------------
// Hamming fast path (align/hamming.py hamming_align; the distance gate
// is applied by the caller via hamming_try-style logic).
//
// Sparse formulation: the <5% gate means a PASSING read has at most
// n/20 mismatches, so after one compare pass that records mismatch
// POSITIONS, the local-segment scan (Kadane with resets) and the =/X
// cigar replay run over match-runs instead of every base. Bit-exact
// with the dense per-base scan because for match >= 0 the score
// trajectory inside a run of matches is monotone non-decreasing: the
// reset (score < 0) can only fire right after a mismatch, and the
// running best can only improve up to the run's end (or, for
// match == 0, exactly once at the run's first position).

static bool hamming_fastpath_dense(const u8* query, const u8* ref, i64 n,
                                   int match, int mismatch, int end_bonus,
                                   AlignmentInfoC& out) {
    // kept for degenerate NEGATIVE scoring parameters, where a match
    // run's trajectory is not monotone and the sparse replay is invalid
    i64 dist = 0;
    for (i64 i = 0; i < n; ++i) dist += (query[i] != ref[i]);
    if (!(n > 0 && (double)dist / (double)n < 0.05)) return false;

    i64 start = 0, score = end_bonus;
    i64 best_start = 0, best_end = 0, best_score = 0;
    for (i64 i = 0; i < n; ++i) {
        score += (query[i] == ref[i]) ? match : -mismatch;
        if (score < 0) {
            start = i + 1;
            score = 0;
        }
        if (score > best_score) {
            best_start = start;
            best_score = score;
            best_end = i + 1;
        }
    }
    if (score + end_bonus > best_score) {
        best_score = score + end_bonus;
        best_end = n;
        best_start = start;
    }

    out = AlignmentInfoC();
    CigarC& cigar = out.cigar;
    if (best_start > 0) cigar.push(OP_S, best_start);
    i64 edits = 0, i = best_start;
    while (i < best_end) {
        bool m = query[i] == ref[i];
        i64 j = i;
        while (j < best_end && (query[j] == ref[j]) == m) j++;
        cigar.push(m ? OP_EQ : OP_X, j - i);
        if (!m) edits += j - i;
        i = j;
    }
    if (n - best_end > 0) cigar.push(OP_S, n - best_end);
    out.sw_score = (int)best_score;
    out.edit_distance = (int)edits;
    out.ref_start = (int)best_start;
    out.ref_end = (int)best_end;
    out.query_start = (int)best_start;
    out.query_end = (int)best_end;
    return true;
}

static bool hamming_fastpath(const u8* query, const u8* ref, i64 n, int match,
                             int mismatch, int end_bonus, AlignmentInfoC& out) {
    if (match < 0 || mismatch < 0)
        return hamming_fastpath_dense(query, ref, n, match, mismatch,
                                      end_bonus, out);

    // pass 1: mismatch positions (sparse for any read that passes the
    // gate; a failing read pays one extraction pass and then goes to
    // full SW anyway)
    static thread_local std::vector<i64> mm_pos;
    mm_pos.clear();
#if defined(__AVX512BW__)
    for (i64 i = 0; i < n; i += 64) {
        __mmask64 valid = n - i >= 64
                              ? ~(__mmask64)0
                              : (((__mmask64)1 << (n - i)) - 1);
        __m512i q = _mm512_maskz_loadu_epi8(valid, query + i);
        __m512i r = _mm512_maskz_loadu_epi8(valid, ref + i);
        u64 ne = (u64)_mm512_mask_cmpneq_epu8_mask(valid, q, r);
        while (ne) {
            mm_pos.push_back(i + (i64)_tzcnt_u64(ne));
            ne &= ne - 1;
        }
    }
#else
    for (i64 i = 0; i < n; ++i)
        if (query[i] != ref[i]) mm_pos.push_back(i);
#endif
    i64 dist = (i64)mm_pos.size();
    if (!(n > 0 && (double)dist / (double)n < 0.05)) return false;

    // pass 2: run-level Kadane replay
    i64 start = 0, score = end_bonus;
    i64 best_start = 0, best_end = 0, best_score = 0;
    i64 cur = 0;
    size_t k = 0;
    while (true) {
        i64 p = k < mm_pos.size() ? mm_pos[k] : n;
        if (p > cur) {  // match run [cur, p)
            score += (i64)match * (p - cur);
            if (score > best_score) {
                best_score = score;
                best_start = start;
                // match > 0: the per-base best advances to the run end;
                // match == 0: it fires once, at the run's first base
                best_end = match > 0 ? p : cur + 1;
            }
        }
        if (p == n) break;
        score -= mismatch;  // per-base best cannot improve on a drop
        if (score < 0) {
            start = p + 1;
            score = 0;
        }
        cur = p + 1;
        ++k;
    }
    if (score + end_bonus > best_score) {
        best_score = score + end_bonus;
        best_end = n;
        best_start = start;
    }

    // pass 3: cigar replay from the mismatch list
    out = AlignmentInfoC();
    CigarC& cigar = out.cigar;
    if (best_start > 0) cigar.push(OP_S, best_start);
    i64 edits = 0, i = best_start;
    size_t idx = 0;
    while (idx < mm_pos.size() && mm_pos[idx] < best_start) ++idx;
    while (i < best_end) {
        i64 next_mm =
            idx < mm_pos.size() && mm_pos[idx] < best_end ? mm_pos[idx]
                                                          : best_end;
        if (next_mm > i) {
            cigar.push(OP_EQ, next_mm - i);
            i = next_mm;
            continue;
        }
        i64 j = i;  // X run: consecutive mismatch positions
        while (j < best_end && idx < mm_pos.size() && mm_pos[idx] == j) {
            ++j;
            ++idx;
        }
        cigar.push(OP_X, j - i);
        edits += j - i;
        i = j;
    }
    if (n - best_end > 0) cigar.push(OP_S, n - best_end);
    out.sw_score = (int)best_score;
    out.edit_distance = (int)edits;
    out.ref_start = (int)best_start;
    out.ref_end = (int)best_end;
    out.query_start = (int)best_start;
    out.query_end = (int)best_end;
    return true;
}

}  // namespace engine
namespace engine {

// ------------------------------------------------------------------
// Borrowed references (io/fasta.py References): concatenated sequence
// bytes + offsets, names as std::string copies (small).

struct RefsView {
    const u8* seqs = nullptr;
    const i64* off = nullptr;
    i64 n = 0;
    std::vector<std::string> names;

    const u8* seq(i64 id) const { return seqs + off[id]; }
    i64 len(i64 id) const { return off[id + 1] - off[id]; }
};

// reverse complement (utils/dna.py REVCOMP_TABLE: ACGTU either case ->
// uppercase complement, everything else -> 'N')
static u8 REVCOMP[256];
static bool init_revcomp() {
    for (int i = 0; i < 256; ++i) REVCOMP[i] = 'N';
    REVCOMP['A'] = 'T'; REVCOMP['C'] = 'G'; REVCOMP['G'] = 'C';
    REVCOMP['T'] = 'A'; REVCOMP['U'] = 'A';
    REVCOMP['a'] = 'T'; REVCOMP['c'] = 'G'; REVCOMP['g'] = 'C';
    REVCOMP['t'] = 'A'; REVCOMP['u'] = 'A';
    return true;
}
static const bool _revcomp_init = init_revcomp();

struct ReadC {
    const u8* seq = nullptr;
    i64 n = 0;
    std::string rc;

    void set(const u8* s, i64 len) {
        seq = s;
        n = len;
        rc.resize(len);
        for (i64 i = 0; i < len; ++i) rc[(size_t)(len - 1 - i)] = (char)REVCOMP[s[i]];
    }
    const u8* rc_ptr() const { return (const u8*)rc.data(); }
};

// ------------------------------------------------------------------
// Insert-size estimator (map/common.py InsertSizeDistribution /
// reference src/aln.cpp:1880-1903). FLOAT state and arithmetic, exact
// op order, like the reference's `float` members: a double twin drifts
// ~1e-4 after a few hundred updates — enough to flip the int-truncated
// rescue/proper-pair windows built from mu + k*sigma. The two double
// promotions (V's and sample_size's `1.0` literals) are kept.

struct InsertSizeC {
    float sample_size = 1.0f;
    float mu = 300.0f;
    float sigma = 100.0f;
    float V = 10000.0f;
    float SSE = 10000.0f;

    void update(i64 dist) {
        if (dist >= 2000) return;
        const float e = (float)((int)dist) - mu;
        mu += e / sample_size;
        SSE += e * ((float)((int)dist) - mu);
        V = sample_size > 1
                ? (float)((double)SSE / ((double)sample_size - 1.0))
                : SSE;
        sigma = std::sqrt(V);
        sample_size = (float)((double)sample_size + 1.0);
    }
};

// mu + k*sigma with the reference's float32 arithmetic — every window
// comparison also converts its int distance/coordinate operand to
// float32 (observable past 2^24 bp)
static inline float f32_window(double mu, double sigma, int k) {
    return (float)mu + (float)k * (float)sigma;
}

// ------------------------------------------------------------------
// Details / statistics (io/sam.py Details, map/stats.py).

struct DetailsC {
    bool nam_rescue = false;
    i64 nams = 0;
    i64 nam_inconsistent = 0;
    i64 mate_rescue = 0;
    i64 tried_alignment = 0;
    i64 gapped = 0;
};

struct StatsC {
    i64 tot_rescued = 0;
    i64 tot_all_tried = 0;
    i64 inconsistent_nams = 0;
    i64 nam_rescue = 0;

    void add(const DetailsC& d) {
        nam_rescue += d.nam_rescue ? 1 : 0;
        tot_rescued += d.mate_rescue;
        tot_all_tried += d.tried_alignment;
        inconsistent_nams += d.nam_inconsistent;
    }
};

// ------------------------------------------------------------------
// SAM writer (io/sam.py Sam / reference src/sam.cpp). Appends to a
// chunk-owned std::string.

enum SamFlags {
    F_PAIRED = 1, F_PROPER_PAIR = 2, F_UNMAP = 4, F_MUNMAP = 8,
    F_REVERSE = 0x10, F_MREVERSE = 0x20, F_READ1 = 0x40, F_READ2 = 0x80,
    F_SECONDARY = 0x100,
};

struct RecordView {
    const u8* name; i64 name_len;
    const u8* seq; i64 seq_len;
    const u8* qual; i64 qual_len;
};

static void append_int(std::string& out, i64 v) {
    char buf[24];
    char* end = buf + 24;
    u64 u = v < 0 ? ~(u64)v + 1 : (u64)v;  // two's-complement abs
    char* p = dec_rev(end, u);
    if (v < 0) *--p = '-';
    out.append(p, (size_t)(end - p));
}

struct SamC {
    std::string* out = nullptr;
    const RefsView* refs = nullptr;
    bool eqx = false;
    bool output_unmapped = true;
    bool show_details = false;
    std::string tail = "\n";  // "\n" or "\tRG:Z:<id>\n"

    void append_name_stripped(const RecordView& r) {
        i64 n = r.name_len;
        if (n >= 2 && r.name[n - 2] == '/' &&
            (r.name[n - 1] == '1' || r.name[n - 1] == '2'))
            n -= 2;
        out->append((const char*)r.name, n);
    }

    void append_details(const DetailsC& d, bool paired) {
        out->append("\tna:i:");
        append_int(*out, d.nams);
        out->append("\tnr:i:");
        append_int(*out, d.nam_rescue ? 1 : 0);
        out->append("\tal:i:");
        append_int(*out, d.tried_alignment);
        out->append("\tga:i:");
        append_int(*out, d.gapped);
        if (paired) {
            out->append("\tmr:i:");
            append_int(*out, d.mate_rescue);
        }
    }

    void add_unmapped(const RecordView& r, int flags = F_UNMAP) {
        if (!output_unmapped) return;
        append_name_stripped(r);
        out->push_back('\t');
        append_int(*out, flags);
        out->append("\t*\t0\t0\t*\t*\t0\t0\t");
        if (r.seq_len)
            out->append((const char*)r.seq, r.seq_len);
        else
            out->push_back('*');
        out->push_back('\t');
        if (r.qual_len)
            out->append((const char*)r.qual, r.qual_len);
        else
            out->push_back('*');
        out->append(tail);
    }

    void add_unmapped_mate(const RecordView& r, int flags,
                           const std::string& mate_ref_name, i64 mate_pos) {
        append_name_stripped(r);
        out->push_back('\t');
        append_int(*out, flags);
        out->push_back('\t');
        out->append(mate_ref_name);
        out->push_back('\t');
        append_int(*out, mate_pos + 1);
        out->append("\t0\t*\t=\t");
        append_int(*out, mate_pos + 1);
        out->append("\t0\t");
        if (r.seq_len)
            out->append((const char*)r.seq, r.seq_len);
        else
            out->push_back('*');
        out->push_back('\t');
        if (r.qual_len)
            out->append((const char*)r.qual, r.qual_len);
        else
            out->push_back('*');
        out->append(tail);
    }

    void add_unmapped_pair(const RecordView& r1, const RecordView& r2) {
        add_unmapped(r1, F_PAIRED | F_UNMAP | F_MUNMAP | F_READ1);
        add_unmapped(r2, F_PAIRED | F_UNMAP | F_MUNMAP | F_READ2);
    }

    void add_record(const RecordView& r, int flags,
                    const std::string& reference_name, i64 pos, int mapq,
                    const CigarC& cigar, const std::string& mate_reference_name,
                    i64 mate_pos, i64 template_len, const u8* seq_rc, i64 ed,
                    i64 aln_score, const DetailsC& details) {
        append_name_stripped(r);
        out->push_back('\t');
        append_int(*out, flags);
        out->push_back('\t');
        out->append(reference_name);
        out->push_back('\t');
        append_int(*out, pos + 1);
        out->push_back('\t');
        append_int(*out, mapq);
        out->push_back('\t');
        cigar.append_str(*out, eqx);
        out->push_back('\t');
        out->append(mate_reference_name);
        out->push_back('\t');
        append_int(*out, mate_pos + 1);
        out->push_back('\t');
        append_int(*out, template_len);
        out->push_back('\t');

        // SEQ
        if (flags & F_SECONDARY) {
            out->push_back('*');
        } else if (flags & F_REVERSE) {
            if (r.seq_len)
                out->append((const char*)seq_rc, r.seq_len);
            else
                out->push_back('*');
        } else {
            if (r.seq_len)
                out->append((const char*)r.seq, r.seq_len);
            else
                out->push_back('*');
        }

        if (!(flags & F_UNMAP)) {
            out->push_back('\t');
            if (flags & F_SECONDARY) {
                out->push_back('*');
            } else if (flags & F_REVERSE) {
                if (r.qual_len) {
                    size_t base = out->size();
                    out->resize(base + r.qual_len);
                    for (i64 i = 0; i < r.qual_len; ++i)
                        (*out)[base + i] = (char)r.qual[r.qual_len - 1 - i];
                } else {
                    out->push_back('*');
                }
            } else {
                if (r.qual_len)
                    out->append((const char*)r.qual, r.qual_len);
                else
                    out->push_back('*');
            }
            out->append("\tNM:i:");
            append_int(*out, ed);
            out->append("\tAS:i:");
            append_int(*out, aln_score);
        } else {
            out->push_back('\t');
            if (r.qual_len)
                out->append((const char*)r.qual, r.qual_len);
            else
                out->push_back('*');
        }
        if (show_details) {
            append_details(details, (flags & F_PAIRED) != 0);
        }
        out->append(tail);
    }

    void add(const AlignmentC& alignment, const RecordView& r, const u8* seq_rc,
             int mapq, bool is_primary, const DetailsC& details) {
        if (alignment.is_unaligned) {
            add_unmapped(r);
            return;
        }
        int flags = 0;
        if (alignment.is_rc) flags |= F_REVERSE;
        if (!is_primary) {
            flags |= F_SECONDARY;
            mapq = 255;
        }
        add_record(r, flags, refs->names[alignment.ref_id], alignment.ref_start,
                   mapq, alignment.cigar, "*", -1, 0, seq_rc,
                   alignment.edit_distance, alignment.score, details);
    }

    void add_pair(const AlignmentC& a1, const AlignmentC& a2,
                  const RecordView& r1, const RecordView& r2, const u8* rc1,
                  const u8* rc2, int mapq1, int mapq2, bool is_proper,
                  bool is_primary, const DetailsC& d1, const DetailsC& d2) {
        int f1 = F_PAIRED | F_READ1;
        int f2 = F_PAIRED | F_READ2;
        if (!is_primary) {
            f1 |= F_SECONDARY;
            f2 |= F_SECONDARY;
        }
        i64 template_len1 = 0;
        bool both = !a1.is_unaligned && !a2.is_unaligned;
        if (both && a1.ref_id == a2.ref_id) {
            i64 dist = (i64)a2.ref_start - a1.ref_start;
            template_len1 = dist > 0 ? dist + a2.length : dist - a1.length;
        }
        if (is_proper) {
            f1 |= F_PROPER_PAIR;
            f2 |= F_PROPER_PAIR;
        }
        static const std::string STAR = "*";
        static const std::string EQ = "=";

        i64 pos1 = a1.ref_start;
        const std::string* reference_name1 = &STAR;
        if (a1.is_unaligned) {
            f1 |= F_UNMAP;
            f2 |= F_MUNMAP;
            pos1 = -1;
        } else {
            if (a1.is_rc) {
                f1 |= F_REVERSE;
                f2 |= F_MREVERSE;
            }
            reference_name1 = &refs->names[a1.ref_id];
        }
        i64 pos2 = a2.ref_start;
        const std::string* reference_name2 = &STAR;
        if (a2.is_unaligned) {
            f2 |= F_UNMAP;
            f1 |= F_MUNMAP;
            pos2 = -1;
        } else {
            if (a2.is_rc) {
                f1 |= F_MREVERSE;
                f2 |= F_REVERSE;
            }
            reference_name2 = &refs->names[a2.ref_id];
        }
        const std::string* mate_ref1 = reference_name1;
        const std::string* mate_ref2 = reference_name2;
        if ((!a1.is_unaligned && !a2.is_unaligned && a1.ref_id == a2.ref_id) ||
            (a1.is_unaligned != a2.is_unaligned)) {
            mate_ref1 = &EQ;
            mate_ref2 = &EQ;
        }
        if (a1.is_unaligned != a2.is_unaligned) {
            if (a1.is_unaligned)
                pos1 = pos2;
            else
                pos2 = pos1;
        }
        if (a1.is_unaligned)
            add_unmapped_mate(r1, f1, *reference_name2, pos2);
        else
            add_record(r1, f1, *reference_name1, a1.ref_start, mapq1, a1.cigar,
                       *mate_ref2, pos2, template_len1, rc1, a1.edit_distance,
                       a1.score, d1);
        if (a2.is_unaligned)
            add_unmapped_mate(r2, f2, *reference_name1, pos1);
        else
            add_record(r2, f2, *reference_name2, a2.ref_start, mapq2, a2.cigar,
                       *mate_ref1, pos1, -template_len1, rc2, a2.edit_distance,
                       a2.score, d2);
    }
};

static bool is_proper_pair_c(const AlignmentC& a1, const AlignmentC& a2,
                             double mu, double sigma) {
    i64 dist = (i64)a2.ref_start - a1.ref_start;
    bool same_ref = a1.ref_id == a2.ref_id;
    bool both = same_ref && !a1.is_unaligned && !a2.is_unaligned;
    bool r1_r2 = !a1.is_rc && a2.is_rc && dist >= 0;
    bool r2_r1 = !a2.is_rc && a1.is_rc && dist <= 0;
    bool orient = r1_r2 || r2_r1;
    bool insert_good = (float)std::abs(dist) <= f32_window(mu, sigma, 6);
    return both && insert_good && orient;
}

}  // namespace engine
namespace engine {

// ------------------------------------------------------------------
// NAM helpers (map/common.py).

// float32-precision normal pdf (map/common.py normal_pdf / reference
// src/aln.cpp:529-534)
static float normal_pdf_f32(float x, float mu, float sigma) {
    const float inv_sqrt_2pi = 0.3989422804014327f;
    float a = (x - mu) / sigma;
    return inv_sqrt_2pi / sigma * std::exp(-0.5f * a * a);
}

// check/fix NAM orientation; mutates nam when flipped
// (map/common.py reverse_nam_if_needed / reference src/aln.cpp:60-93)
static bool reverse_nam_if_needed(NamT& nam, const ReadC& read,
                                  const RefsView& refs, int k) {
    const u8* ref = refs.seq(nam.ref_id);
    const u8* seq;
    const u8* seq_rc;
    if (nam.is_rc) {
        seq = read.rc_ptr();
        seq_rc = read.seq;
    } else {
        seq = read.seq;
        seq_rc = read.rc_ptr();
    }
    bool ok_start = memcmp(ref + nam.ref_start, seq + nam.query_start, k) == 0;
    bool ok_end =
        ok_start && memcmp(ref + nam.ref_end - k, seq + nam.query_end - k, k) == 0;
    if (ok_start && ok_end) return true;

    i64 read_len = read.n;
    i64 q_start_tmp = read_len - nam.query_end;
    i64 q_end_tmp = read_len - nam.query_start;
    ok_start = memcmp(ref + nam.ref_start, seq_rc + q_start_tmp, k) == 0;
    ok_end = ok_start &&
             memcmp(ref + nam.ref_end - k, seq_rc + q_end_tmp - k, k) == 0;
    if (ok_start && ok_end) {
        nam.is_rc = nam.is_rc ? 0 : 1;
        nam.query_start = (int)q_start_tmp;
        nam.query_end = (int)q_end_tmp;
        return true;
    }
    return false;
}

// NAM-based mapq (map/common.py get_mapq / reference src/aln.cpp:493-503)
static int get_mapq(const std::vector<NamT>& nams, const NamT& n_max) {
    if (nams.size() <= 1) return 60;
    // reference: float s1/s2/min_matches and a FLOAT log(s1) (aln.cpp's
    // <math.h> float overload, probe-verified) — the whole product
    // chain is float32 before the int truncation
    float s1 = n_max.score;
    float s2 = nams[1].score;
    float min_matches = (float)std::min((double)n_max.n_hits / 10.0, 1.0);
    int uncapped = (int)(40 * (1 - s2 / s1) * min_matches * std::log(s1));
    return std::min(uncapped, 60);
}

// map/common.py top_dropoff / reference src/aln.cpp:1361-1370
static double top_dropoff(const std::vector<NamT>& nams) {
    const NamT& n_max = nams[0];
    if (n_max.n_hits <= 2) return 1.0;
    if (nams.size() > 1) return (double)nams[1].n_hits / (double)n_max.n_hits;
    return 0.0;
}

// shuffle the maximal-score prefix (map/common.py shuffle_top_nams)
static void shuffle_top_nams(std::vector<NamT>& nams, MinstdRand& g) {
    if (nams.empty()) return;
    float best_score = nams[0].score;
    size_t it = nams.size();
    for (size_t i = 0; i < nams.size(); ++i)
        if (nams[i].score != best_score) {
            it = i;
            break;
        }
    if (it != nams.size()) shuffle_vec(nams, it, g);
}

// ------------------------------------------------------------------
// PE pairing helpers (map/pe.py).

// Pairs reference the SHARED NamT objects in nams1/nams2 (like the Python
// NamPair holding references): reverse_nam_if_needed mutations made while
// processing one pair must be visible to later pairs using the same NAM.
struct NamPairC {
    i64 score;
    NamT* nam1;
    NamT* nam2;  // ref_start == -1 marks the dummy partner
};

// map/pe.py is_proper_nam_pair / reference src/aln.cpp:560-577
static bool is_proper_nam_pair(const NamT& nam1, const NamT& nam2, double mu,
                               double sigma) {
    if (nam1.ref_id != nam2.ref_id || nam1.is_rc == nam2.is_rc) return false;
    i64 a = std::max(0, nam1.ref_start - nam1.query_start);
    i64 b = std::max(0, nam2.ref_start - nam2.query_start);
    float window = f32_window(mu, sigma, 10);
    if (nam2.is_rc && a <= b && (float)(b - a) < window) return true;
    if (nam1.is_rc && b <= a && (float)(a - b) < window) return true;
    return false;
}

// Projected reference start of a NAM: where the read would begin on the
// reference if the NAM's query offset is backed out (floored at 0).
static inline i64 projected_start(const NamT& n) {
    return std::max(0, n.ref_start - n.query_start);
}

// First position in `lst` (sorted by projected start) whose projection
// clears the window's left edge: strictly past it when `left_open`, at
// or past it otherwise. Plain lower-bound over the projection. The
// compares are FLOAT32 like the reference's (int vs float promotes the
// coordinate to float, rounding past 2^24 bp).
static i64 first_past_left_edge(const std::vector<NamT*>& lst, float left,
                                bool left_open) {
    i64 lo = 0, hi = (i64)lst.size();
    while (lo < hi) {
        i64 mid = (lo + hi) / 2;
        float proj = (float)projected_start(*lst[mid]);
        bool cleared = left_open ? proj > left : proj >= left;
        if (cleared)
            hi = mid;
        else
            lo = mid + 1;
    }
    return lo;
}

// map/pe.py get_best_scoring_nam_pairs ("fast_loop3" variant of reference
// src/aln.cpp:591-996): proper pairs via per-orientation projected-start
// sort + binary-searched insert window, then unpaired high-scoring singles
static void get_best_scoring_nam_pairs(std::vector<NamT>& nams1,
                                       std::vector<NamT>& nams2,
                                       double mu, double sigma,
                                       std::vector<NamPairC>& joint,
                                       std::deque<NamT>& dummy_pool) {
    joint.clear();
    if (nams1.empty() && nams2.empty()) return;

    auto make_dummy = [&dummy_pool]() -> NamT* {
        dummy_pool.emplace_back();
        dummy_pool.back() = NamT{};
        dummy_pool.back().ref_start = -1;
        return &dummy_pool.back();
    };

    std::vector<char> added_n1, added_n2;  // indexed by nam_id
    i64 max_id1 = 0, max_id2 = 0;
    for (const auto& n : nams1) max_id1 = std::max(max_id1, (i64)n.nam_id);
    for (const auto& n : nams2) max_id2 = std::max(max_id2, (i64)n.nam_id);
    added_n1.assign(max_id1 + 1, 0);
    added_n2.assign(max_id2 + 1, 0);
    i64 best_joint_hits = 0;

    std::vector<NamT*> nams2_sorted[2];
    for (auto& n : nams2) nams2_sorted[n.is_rc ? 1 : 0].push_back(&n);
    for (auto& lst : nams2_sorted)
        std::sort(lst.begin(), lst.end(), [](const NamT* x, const NamT* y) {
            return std::max(0, x->ref_start - x->query_start) <
                   std::max(0, y->ref_start - y->query_start);
        });

    // windows and edges are FLOAT32 like the reference's `float L_val /
    // R_val` (aln.cpp:651-653, 712-713): projections past 2^24 bp round
    // in every compare; only the right-edge 1e-6 epsilon break promotes
    // back to double (the reference's double literal).
    float window = f32_window(mu, sigma, 10);
    // For an rc nam1 the mate must project UPSTREAM of it (within
    // `window` before its projection, window left-open); for a fw nam1
    // the mate projects DOWNSTREAM (at-or-after, closed left edge, and
    // the scan stops one epsilon earlier at the right edge — both edge
    // asymmetries are part of the reference's float-compare contract).
    for (auto& nam1 : nams1) {
        bool mate_upstream = nam1.is_rc != 0;
        const auto& lst = nams2_sorted[mate_upstream ? 0 : 1];
        float proj1 = (float)projected_start(nam1);
        float left = mate_upstream ? proj1 - window : proj1;
        float right = mate_upstream ? proj1 : proj1 + window;
        i64 at = first_past_left_edge(lst, left, mate_upstream);
        for (; at < (i64)lst.size(); ++at) {
            NamT* nam2 = lst[at];
            i64 joint_hits = nam1.n_hits + nam2->n_hits;
            // other-ref entries inside the scan range are skipped, not
            // a stop condition (they share the projection ordering)
            if (nam1.ref_id != nam2->ref_id) continue;
            i64 p1 = projected_start(nam1);
            i64 p2 = projected_start(*nam2);
            if (mate_upstream ? (double)p2 > (double)right - 1e-6
                              : (double)p2 >= (double)right - 1e-6)
                break;
            i64 gap = mate_upstream ? p1 - p2 : p2 - p1;
            if (gap >= 0 && (float)gap < window) {
                joint.push_back({joint_hits, &nam1, nam2});
                added_n1[nam1.nam_id] = 1;
                added_n2[nam2->nam_id] = 1;
            }
        }
    }

    if (!nams1.empty()) {
        i64 best1 = best_joint_hits > 0 ? best_joint_hits : nams1[0].n_hits;
        for (auto& nam1 : nams1) {
            if (nam1.n_hits < best1 / 2) break;
            if (added_n1[nam1.nam_id]) continue;
            joint.push_back({nam1.n_hits, &nam1, make_dummy()});
        }
    }
    if (!nams2.empty()) {
        i64 best2 = best_joint_hits > 0 ? best_joint_hits : nams2[0].n_hits;
        for (auto& nam2 : nams2) {
            if (nam2.n_hits < best2 / 2) break;
            if (added_n2[nam2.nam_id]) continue;
            joint.push_back({nam2.n_hits, make_dummy(), &nam2});
        }
    }
    std::sort(joint.begin(), joint.end(),
              [](const NamPairC& a, const NamPairC& b) {
                  return a.score > b.score;
              });
}

// map/pe.py has_shared_substring / reference src/aln.cpp:1002-1013
static bool has_shared_substring(const u8* read_seq, i64 read_len,
                                 const u8* ref_seq, i64 ref_len, int k) {
    i64 sub_size = 2 * k / 3;
    i64 step_size = k / 3;
    i64 i = 0;
    while (i + sub_size < read_len) {
        const void* found =
            memmem(ref_seq, (size_t)ref_len, read_seq + i, (size_t)sub_size);
        if (found != nullptr) return true;
        i += step_size;
    }
    return false;
}

}  // namespace engine
namespace engine {

// ------------------------------------------------------------------
// Engine and chunk state.

struct MapParams {
    double dropoff_threshold = 0.5;
    i64 max_tries = 20;
    i64 max_secondary = 0;
    int rescue_level = 2;
    u32 rescue_cutoff = 0;
    bool is_sam_out = true;
};

struct SeedParams {
    int k, s, t, wmin, wmax, max_dist;
    u64 qmask;
};

struct EngineC {
    IndexView ix;
    SeedParams sp;
    RefsView refs;
    AlnParams ap;
    MapParams mp;
    AlignerC aligner;
    InsertSizeC isize;
    StatsC stats;
    // SAM options
    bool cigar_eqx = false;
    bool output_unmapped = true;
    bool show_details = false;
    std::string rg_tail = "\n";
    // PE insert-size semantics: 0 = monolithic (cumulative estimator,
    // rescue windows fixed at decision time — matches the reference's
    // align_PE_read and this repo's Python layer); 1 = the reference
    // binary's PRODUCTION async path (per-chunk estimator reset,
    // windows recomputed at gather time with the end-of-phase-A
    // estimate — see /root/reference/src/pc.cpp:1100-1519 and the
    // pe_split golden). cur_isize points at the active estimator.
    int pe_ref_async = 0;
    InsertSizeC* cur_isize = nullptr;
    // final estimator of the most recent chunk (pe_ref_async mode):
    // the ACTIVE estimator is per-chunk there, so telemetry must not
    // report the never-updated cumulative prior
    InsertSizeC last_chunk_isize;
    i64 fallbacks = 0;  // device results rejected by validation
    i64 feed_miss = 0;  // sharded-run feed rows missing (host bug if >0)
    // phase wall-clock aggregates (reference AlignmentStatistics timers,
    // src/aln.hpp:13-56, dumped at exit src/main.cpp:602-615)
    double t_seed_nam = 0, t_phase_a = 0, t_host_align = 0, t_phase_b = 0;
};

// active insert-size estimator (per-chunk in pe_ref_async mode)
static inline InsertSizeC& isz(EngineC& e) {
    return e.cur_isize ? *e.cur_isize : e.isize;
}

struct JobC {
    const u8* q;
    i64 qn;
    const u8* t;
    i64 tn;
};

// the reference's AlignTmpRes (src/sam.hpp:27-45 / pipeline/batched.py)
struct TmpResC {
    int type = 0;
    int mapq1 = 0, mapq2 = 0;
    i64 type4_loop_size = 0;
    std::vector<char> is_extend_seed, consistent_nam, is_read1, done_align;
    std::vector<NamT> type4_nams, todo_nams;
    std::vector<AlignmentC> align_res;
    std::vector<i64> job_ids;       // -1 when resolved inline
    std::vector<i64> job_ref_start;
    std::vector<i64> job_qlen;
};

struct WorkItem {
    int kind = 0;  // 0 = paf/none, 1 = SE, 2 = PE
    i64 rec1 = -1, rec2 = -1;
    TmpResC tmp;
    DetailsC det1, det2;
};

struct ChunkC {
    EngineC* eng = nullptr;
    MinstdRand rng{0};
    std::string seqs, names, quals;  // owned copies of the record blobs
    std::vector<RecordView> records;
    std::vector<ReadC> reads;  // rc materialized on demand
    std::vector<char> read_ready;
    std::vector<JobC> jobs;
    std::vector<AlignmentInfoC> job_results;
    std::vector<char> job_done;
    std::vector<WorkItem> work;
    std::string out;
    i64 n_pairs = 0, n_singles = 0;
    // pe_ref_async mode: per-chunk estimator + rescue jobs whose target
    // windows are recomputed after phase A with the final mu/sigma (the
    // reference's E1 gather, pc.cpp:1228-1229 + part2_rescue_mate_get_str)
    InsertSizeC isize;
    struct PendRescueC { i64 work_idx; size_t j; const ReadC* read; };
    std::vector<PendRescueC> pend_rescue;

    const ReadC& read(i64 i) {
        if (!read_ready[i]) {
            reads[i].set(records[i].seq, records[i].seq_len);
            read_ready[i] = 1;
        }
        return reads[i];
    }
};

// ------------------------------------------------------------------
// Seeding + NAM finding + sort + tie shuffle for one read
// (map/se.py get_nams_for_read; seeding via seednam.cpp internals).

struct SeedScratch {
    std::vector<Syncmer> sync, sync_rc;
    std::vector<QueryRandstrobe> qrs;
    NamScratch nsc;
    ReadResult rr;
};

// Preseeded strobe batch for one chunk (--device-seed): per-read counts
// (-1 = fall back to host seeding for that read) + flat per-strobe
// arrays in the exact host emission order (forward then reverse), plus
// the index-find result for each strobe.
struct PreSeed {
    const int32_t* counts = nullptr;  // per record
    const i64* offsets = nullptr;     // per record, into the flat arrays
    const u64* hashes = nullptr;
    const int32_t* starts = nullptr;
    const int32_t* ends = nullptr;
    const u8* is_rev = nullptr;
    const i64* positions = nullptr;   // ix_find result, -1 = absent
};

// nams_for_read with device-precomputed seeding + lookups: identical
// RNG/detail/ordering semantics, but phase 1 (syncmers, randstrobes,
// index find) is replaced by the preseed arrays; NAM rescue re-runs its
// own host lookups (it needs counts and full runs, and fires rarely).
static void nams_for_read_pre(EngineC& eng, const PreSeed& pre, i64 rec,
                              SeedScratch& ss, MinstdRand& rng,
                              DetailsC& details, std::vector<NamT>& nams) {
    auto t0 = std::chrono::steady_clock::now();
    i64 n = pre.counts[rec];
    i64 off = pre.offsets[rec];
    ss.qrs.clear();
    ss.nsc.found.resize((size_t)n);
    for (i64 i = 0; i < n; ++i) {
        ss.qrs.push_back({pre.hashes[off + i], (int)pre.starts[off + i],
                          (int)pre.ends[off + i], pre.is_rev[off + i] != 0});
        ss.nsc.found[(size_t)i] = pre.positions[off + i];
    }
    ReadResult& rr = ss.rr;
    rr.nams.clear();
    rr.nonrep_frac = 1.0f;
    rr.used_rescue = 0;
    find_nams_phase2(eng.ix, ss.qrs, ss.nsc.found, rr, ss.nsc);
    if (eng.mp.rescue_level > 1 && (rr.nams.empty() || rr.nonrep_frac < 0.7f)) {
        find_nams_rescue_one(eng.ix, ss.qrs, eng.mp.rescue_cutoff, rr, ss.nsc);
        details.nam_rescue = true;
    }
    details.nams = (i64)rr.nams.size();
    nams.clear();
    std::swap(nams, rr.nams);
    std::sort(nams.begin(), nams.end(),
              [](const NamT& a, const NamT& b) { return a.score > b.score; });
    shuffle_top_nams(nams, rng);
    eng.t_seed_nam +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
}

// Run-prefetched strobe batch for one chunk (--shard-index): like
// PreSeed, but instead of index POSITIONS every strobe carries its
// distributed-lookup RESULT — run length, repetitive flag and the run's
// (position, packed) records (what the sharded index's find_runs
// returns, parallel/sharding.py). NAM building then never touches the
// host index arrays at all: this is the injection point that lets the
// production engine map against an index sharded across a device mesh
// (the whole-genome scale-out the reference lacks; its analog is the
// per-NUMA-node index replica, /root/reference/src/main.cpp:342-360).
struct RunFeed {
    const int32_t* counts = nullptr;   // per record, -1 = host seeding
    const i64* offsets = nullptr;      // per record, into per-strobe rows
    const u64* hashes = nullptr;
    const int32_t* starts = nullptr;
    const int32_t* ends = nullptr;
    const u8* is_rev = nullptr;
    // per-strobe lookup results
    const i64* count = nullptr;        // equal-hash run length, 0 = absent
    const u8* filtered = nullptr;      // count > filter_cutoff
    const i64* run_off = nullptr;      // into run_pos/run_packed, -1 = none
    const u32* run_pos = nullptr;
    const u32* run_packed = nullptr;
    // rescue runs (cap-1000 fetch; provided only for strobes the host
    // preflight proved reachable by the rescue take-rule)
    const i64* resc_off = nullptr;     // -1 = none
    const u32* resc_pos = nullptr;
    const u32* resc_packed = nullptr;
};

// add_to_hits_per_ref (reference src/nam.cpp:68-85) over prefetched run
// records instead of the index arrays
static void add_to_hits_feed(HitsPerRef& hpr, int qs, int qe, int k,
                             const u32* rpos, const u32* rpacked, i64 m) {
    int min_diff = INT32_MAX;
    int qspan = qe - qs;
    for (i64 p = 0; p < m; ++p) {
        int rs = (int)rpos[p];
        int re = rs + (int)(rpacked[p] & 0xFF) + k;
        int diff = std::abs(qspan - (re - rs));
        if (diff <= min_diff) {
            hpr.get((int)(rpacked[p] >> 8)).push_back({qs, qe, rs, re});
            min_diff = diff;
        }
    }
}

static void pre_create_keys_feed(HitsPerRef& hpr, int qs, int qe, int k,
                                 const u32* rpos, const u32* rpacked, i64 m) {
    int min_diff = INT32_MAX;
    int qspan = qe - qs;
    for (i64 p = 0; p < m; ++p) {
        int rs = (int)rpos[p];
        int re = rs + (int)(rpacked[p] & 0xFF) + k;
        int diff = std::abs(qspan - (re - rs));
        if (diff <= min_diff) {
            hpr.touch((int)(rpacked[p] >> 8));
            min_diff = diff;
        }
    }
}

// find_nams over prefetched runs (find_nams_phase2 semantics: the
// repetitive filter `hashes[pos] == hashes[pos+cutoff]` is exactly
// `count > cutoff` on a hash-sorted array)
static void find_nams_runs(int k, const std::vector<QueryRandstrobe>& qrs,
                           const RunFeed& rf, i64 off, ReadResult& rr,
                           NamScratch& scratch, i64* feed_miss) {
    HitsPerRef* hpr = scratch.hpr;
    hpr[0].clear();
    hpr[1].clear();
    int total_hits = 0, good_hits = 0;
    const i64 nq = (i64)qrs.size();
    for (i64 qi = 0; qi < nq; ++qi) {
        i64 gi = off + qi;
        if (rf.count[gi] <= 0) continue;
        total_hits++;
        if (rf.filtered[gi]) continue;
        good_hits++;
        i64 ro = rf.run_off[gi];
        if (ro < 0) {
            (*feed_miss)++;  // host must provide runs for unfiltered hits
            continue;
        }
        const auto& q = qrs[qi];
        add_to_hits_feed(hpr[q.is_reverse ? 1 : 0], q.start, q.end, k,
                         rf.run_pos + ro, rf.run_packed + ro, rf.count[gi]);
    }
    rr.nonrep_frac =
        total_hits > 0 ? (float)good_hits / (float)total_hits : 1.0f;
    for (int rc = 0; rc < 2; ++rc)
        merge_hits(hpr[rc], k, true, rc != 0, rr.nams);
}

// find_nams_rescue over prefetched runs (find_nams_rescue_one semantics;
// RescueHit.position carries the strobe's feed row instead of an index
// position — it never participates in the sort key)
static void find_nams_rescue_runs(int k, u32 rescue_cutoff,
                                  const std::vector<QueryRandstrobe>& qrs,
                                  const RunFeed& rf, i64 off, ReadResult& rr,
                                  NamScratch& scratch, i64* feed_miss) {
    rr.nams.clear();
    HitsPerRef* hpr = scratch.hpr;
    hpr[0].clear();
    hpr[1].clear();
    std::vector<RescueHit>& hits_fw = scratch.hits_fw;
    std::vector<RescueHit>& hits_rc = scratch.hits_rc;
    hits_fw.clear();
    hits_rc.clear();
    const i64 nq = (i64)qrs.size();
    for (i64 qi = 0; qi < nq; ++qi) {
        i64 gi = off + qi;
        if (rf.count[gi] <= 0) continue;
        const auto& q = qrs[qi];
        RescueHit rh{(u64)gi, (u32)rf.count[gi], q.start, q.end};
        (q.is_reverse ? hits_rc : hits_fw).push_back(rh);
    }
    auto cmp1 = [](const RescueHit& a, const RescueHit& b) {
        if (a.count != b.count) return a.count < b.count;
        if (a.query_start != b.query_start) return a.query_start < b.query_start;
        return a.query_end < b.query_end;
    };
    std::sort(hits_fw.begin(), hits_fw.end(), cmp1);
    std::sort(hits_rc.begin(), hits_rc.end(), cmp1);
    std::vector<RescueHit>* rhs = scratch.rhs;
    rhs[0].clear();
    rhs[1].clear();
    int is_rc_i = 0;
    for (auto* rescue_hits : {&hits_fw, &hits_rc}) {
        int cnt = 0;
        for (auto& rh : *rescue_hits) {
            if ((rh.count > rescue_cutoff && cnt >= 5) || rh.count > 1000) break;
            i64 ro = rf.resc_off[(i64)rh.position];
            if (ro < 0) {
                (*feed_miss)++;
                cnt++;
                continue;
            }
            rhs[is_rc_i].push_back(rh);
            pre_create_keys_feed(hpr[is_rc_i], rh.query_start, rh.query_end, k,
                                 rf.resc_pos + ro, rf.resc_packed + ro,
                                 (i64)rh.count);
            cnt++;
        }
        is_rc_i++;
    }
    for (int i = 0; i < 2; ++i) {
        std::sort(rhs[i].begin(), rhs[i].end(),
                  [](const RescueHit& a, const RescueHit& b) {
                      return a.query_start < b.query_start;
                  });
        for (auto& rh : rhs[i]) {
            i64 ro = rf.resc_off[(i64)rh.position];
            add_to_hits_feed(hpr[i], rh.query_start, rh.query_end, k,
                             rf.resc_pos + ro, rf.resc_packed + ro,
                             (i64)rh.count);
        }
    }
    for (int rc = 0; rc < 2; ++rc)
        merge_hits_fast(hpr[rc], k, false, rc != 0, rr.nams);
    rr.used_rescue = 1;
}

static void nams_for_read_runs(EngineC& eng, const RunFeed& rf, i64 rec,
                               SeedScratch& ss, MinstdRand& rng,
                               DetailsC& details, std::vector<NamT>& nams) {
    auto t0 = std::chrono::steady_clock::now();
    i64 n = rf.counts[rec];
    i64 off = rf.offsets[rec];
    ss.qrs.clear();
    for (i64 i = 0; i < n; ++i)
        ss.qrs.push_back({rf.hashes[off + i], (int)rf.starts[off + i],
                          (int)rf.ends[off + i], rf.is_rev[off + i] != 0});
    ReadResult& rr = ss.rr;
    rr.nams.clear();
    rr.nonrep_frac = 1.0f;
    rr.used_rescue = 0;
    find_nams_runs(eng.ix.k, ss.qrs, rf, off, rr, ss.nsc, &eng.feed_miss);
    if (eng.mp.rescue_level > 1 && (rr.nams.empty() || rr.nonrep_frac < 0.7f)) {
        find_nams_rescue_runs(eng.ix.k, eng.mp.rescue_cutoff, ss.qrs, rf, off,
                              rr, ss.nsc, &eng.feed_miss);
        details.nam_rescue = true;
    }
    details.nams = (i64)rr.nams.size();
    nams.clear();
    std::swap(nams, rr.nams);
    std::sort(nams.begin(), nams.end(),
              [](const NamT& a, const NamT& b) { return a.score > b.score; });
    shuffle_top_nams(nams, rng);
    eng.t_seed_nam +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
}

// Chunk-level syncmer pre-pass: records taking the host seeding path are
// seeded 8 at a time through the AVX-512 lockstep automaton
// (seednam.cpp syncmers_of_batch, bit-exact with the scalar automaton),
// stored flat; nams_for_read then links/chains from the precomputed
// spans. start[rec] = -1 means "not precomputed" (record covered by a
// RunFeed/PreSeed, or too short to seed).
struct SyncPre {
    std::vector<Syncmer> flat;
    std::vector<i64> start, count;  // per record; start -1 = absent
};

static void presync_records(const RecordView* records, i64 n_records,
                            const char* need, const SeedParams& sp,
                            SyncPre& out) {
    out.start.assign(n_records, -1);
    out.count.assign(n_records, 0);
    out.flat.clear();
    std::vector<Syncmer> g[8];
    std::vector<Syncmer>* outs[8];
    for (int l = 0; l < 8; ++l) outs[l] = &g[l];
    i64 idx[8];
    int nb = 0;
    const u8* seqs[8];
    i64 lens[8];
    auto flush = [&]() {
        for (int l = nb; l < 8; ++l) {
            seqs[l] = seqs[0];
            lens[l] = 0;
        }
        syncmers_of_batch(seqs, lens, sp.k, sp.s, sp.t, outs);
        for (int l = 0; l < nb; ++l) {
            out.start[idx[l]] = (i64)out.flat.size();
            out.count[idx[l]] = (i64)g[l].size();
            out.flat.insert(out.flat.end(), g[l].begin(), g[l].end());
        }
        nb = 0;
    };
    for (i64 i = 0; i < n_records; ++i) {
        if (!need[i] || records[i].seq_len < sp.wmax) continue;
        seqs[nb] = records[i].seq;
        lens[nb] = records[i].seq_len;
        idx[nb] = i;
        if (++nb == 8) flush();
    }
    if (nb) flush();
    // LINK_PAD readable rows past the last record's span (interior
    // records borrow the next record's rows — masked, only need to be
    // dereferenceable) -> every span satisfies the 8-lane linker's
    // padding contract
    pad_syncmers(out.flat);
}

static void nams_for_read(EngineC& eng, const u8* seq, i64 len,
                          SeedScratch& ss, MinstdRand& rng, DetailsC& details,
                          std::vector<NamT>& nams,
                          const Syncmer* psy = nullptr, i64 n_psy = -1) {
    auto t0 = std::chrono::steady_clock::now();
    const SeedParams& sp = eng.sp;
    ss.qrs.clear();
    if (len >= sp.wmax) {
        const Syncmer* sy;
        i64 nsy;
        if (n_psy >= 0) {
            sy = psy;
            nsy = n_psy;
        } else {
            syncmers_of(seq, len, sp.k, sp.s, sp.t, ss.sync);
            nsy = (i64)ss.sync.size();
            pad_syncmers(ss.sync);  // LINK_PAD readable rows past nsy
            sy = ss.sync.data();
        }
        if (nsy > 0) {
            // both the pre-pass flat array and ss.sync satisfy the
            // LINK_PAD contract -> 8-lane linker
            link_query_both(sy, nsy, len, sp.wmin, sp.wmax, sp.qmask,
                            sp.max_dist, sp.k, ss.sync_rc, ss.qrs);
        }
    }
    ReadResult& rr = ss.rr;
    rr.nams.clear();
    rr.nonrep_frac = 1.0f;
    rr.used_rescue = 0;
    find_nams_one(eng.ix, ss.qrs, rr, ss.nsc);
    if (eng.mp.rescue_level > 1 && (rr.nams.empty() || rr.nonrep_frac < 0.7f)) {
        find_nams_rescue_one(eng.ix, ss.qrs, eng.mp.rescue_cutoff, rr, ss.nsc);
        details.nam_rescue = true;
    }
    details.nams = (i64)rr.nams.size();
    nams.clear();
    std::swap(nams, rr.nams);  // keep both buffers alive for reuse
    // reference by_score + std::sort: the unstable tie order feeds the
    // dropoff/reservoir logic and is part of the observable output
    std::sort(nams.begin(), nams.end(),
              [](const NamT& a, const NamT& b) { return a.score > b.score; });
    shuffle_top_nams(nams, rng);
    eng.t_seed_nam +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
}

// ------------------------------------------------------------------
// Phase A decision recording (pipeline/batched.py extend_seed_part /
// rescue_mate_part / align_SE_part / rescue_read_part / align_PE_part).

// returns true when a gapped job was emitted
static bool extend_seed_part(EngineC& eng, ChunkC& ch, TmpResC& tmp,
                             const NamT& nam, const ReadC& read,
                             bool consistent_nam) {
    const u8* query = nam.is_rc ? read.rc_ptr() : read.seq;
    const u8* ref = eng.refs.seq(nam.ref_id);
    i64 ref_len = eng.refs.len(nam.ref_id);
    i64 qn = read.n;

    i64 projected_ref_start = std::max((i64)0, (i64)nam.ref_start - nam.query_start);
    i64 projected_ref_end =
        std::min((i64)nam.ref_end + qn - nam.query_end, ref_len);

    tmp.todo_nams.push_back(nam);
    tmp.is_extend_seed.push_back(1);
    if (projected_ref_end - projected_ref_start == qn && consistent_nam) {
        AlignmentInfoC info;
        if (hamming_fastpath(query, ref + projected_ref_start, qn, eng.ap.match,
                             eng.ap.mismatch, eng.ap.end_bonus, info)) {
            i64 softclipped = info.query_start + (qn - info.query_end);
            tmp.done_align.push_back(1);
            tmp.job_ids.push_back(-1);
            tmp.job_ref_start.push_back(0);
            tmp.job_qlen.push_back(qn);
            AlignmentC a;
            a.cigar = std::move(info.cigar);
            a.edit_distance = info.edit_distance;
            a.global_ed = info.edit_distance + (int)softclipped;
            a.score = info.sw_score;
            a.ref_start = (int)(projected_ref_start + info.query_start);
            a.length = info.query_end - info.query_start;
            a.is_rc = nam.is_rc != 0;
            a.is_unaligned = false;
            a.ref_id = nam.ref_id;
            a.gapped = false;
            tmp.align_res.push_back(std::move(a));
            return false;
        }
    }
    i64 diff = std::abs((i64)(nam.ref_end - nam.ref_start) -
                        (i64)(nam.query_end - nam.query_start));
    i64 ext_left = std::min((i64)50, projected_ref_start);
    i64 ref_start = projected_ref_start - ext_left;
    i64 ext_right = std::min((i64)50, ref_len - nam.ref_end);
    i64 ref_segm_size = qn + diff + ext_left + ext_right;
    if (ref_start + ref_segm_size > ref_len) ref_segm_size = ref_len - ref_start;
    tmp.done_align.push_back(0);
    tmp.job_ids.push_back((i64)ch.jobs.size());
    ch.jobs.push_back({query, qn, ref + ref_start, ref_segm_size});
    tmp.job_ref_start.push_back(ref_start);
    tmp.job_qlen.push_back(qn);
    tmp.align_res.emplace_back();
    return true;
}

// returns true when the mate is (already known) unaligned
// The mu+5*sigma rescue window around a NAM (reference rescue_mate_part
// aln.cpp:1015-1078 and part2_rescue_mate_get_str pc.cpp:333-368 — the
// same formula is evaluated at decision time AND, in pe_ref_async mode,
// re-evaluated at gather time with the end-of-phase-A estimate, so both
// sites must share this one implementation).
static void rescue_window(const EngineC& eng, const NamT& nam, i64 read_len,
                          double mu, double sigma, i64& ref_start,
                          i64& ref_end) {
    i64 a, b;
    float w5 = f32_window(mu, sigma, 5);  // float32 like the reference
    if (nam.is_rc) {
        a = (i64)((float)(nam.ref_start - nam.query_start) - w5);
        b = (i64)nam.ref_start - nam.query_start + read_len / 2;
    } else {
        a = (i64)nam.ref_end + (read_len - nam.query_end) - read_len / 2;
        b = (i64)((float)(nam.ref_end + (read_len - nam.query_end)) + w5);
    }
    i64 ref_len = eng.refs.len(nam.ref_id);
    ref_start = std::max((i64)0, std::min(a, ref_len));
    ref_end = std::min(ref_len, std::max((i64)0, b));
}

static bool rescue_mate_part(EngineC& eng, ChunkC& ch, TmpResC& tmp,
                             const NamT& nam, const ReadC& read, double mu,
                             double sigma, int k) {
    i64 read_len = read.n;
    const u8* r_tmp = nam.is_rc ? read.seq : read.rc_ptr();
    i64 ref_start, ref_end;
    rescue_window(eng, nam, read_len, mu, sigma, ref_start, ref_end);

    tmp.todo_nams.push_back(nam);
    tmp.is_extend_seed.push_back(0);
    auto push_unaligned = [&]() {
        tmp.done_align.push_back(1);
        tmp.job_ids.push_back(-1);
        tmp.job_ref_start.push_back(0);
        tmp.job_qlen.push_back(read_len);
        AlignmentC al;
        al.edit_distance = (int)read_len;
        al.score = 0;
        al.ref_start = 0;
        al.is_rc = nam.is_rc != 0;
        al.ref_id = nam.ref_id;
        al.is_unaligned = true;
        tmp.align_res.push_back(std::move(al));
    };
    if (ref_end < ref_start + k) {
        push_unaligned();
        return true;
    }
    const u8* ref_segm = eng.refs.seq(nam.ref_id) + ref_start;
    i64 seg_len = ref_end - ref_start;
    if (!has_shared_substring(r_tmp, read_len, ref_segm, seg_len, k)) {
        push_unaligned();
        return true;
    }
    tmp.done_align.push_back(0);
    tmp.job_ids.push_back((i64)ch.jobs.size());
    ch.jobs.push_back({r_tmp, read_len, ref_segm, seg_len});
    tmp.job_ref_start.push_back(ref_start);
    tmp.job_qlen.push_back(read_len);
    tmp.align_res.emplace_back();
    if (eng.pe_ref_async) {
        // gate ran with the decision-time estimate (above); the window
        // is recomputed after phase A with the end-of-chunk estimate
        ch.pend_rescue.push_back(
            {(i64)ch.work.size() - 1, tmp.todo_nams.size() - 1, &read});
    }
    return false;
}

static void align_SE_part(EngineC& eng, ChunkC& ch, WorkItem& w,
                          std::vector<NamT>& nams, const ReadC& read) {
    TmpResC& tmp = w.tmp;
    if (nams.empty()) {
        tmp.type = 0;
        return;
    }
    i64 tries = 0;
    const NamT n_max = nams[0];
    tmp.type = 4;
    for (auto& nam : nams) {
        double score_dropoff = (double)nam.n_hits / (double)n_max.n_hits;
        if (tries >= eng.mp.max_tries || score_dropoff < eng.mp.dropoff_threshold)
            break;
        bool consistent_nam = reverse_nam_if_needed(nam, read, eng.refs, eng.sp.k);
        tmp.consistent_nam.push_back(consistent_nam ? 1 : 0);
        tmp.is_read1.push_back(1);
        extend_seed_part(eng, ch, tmp, nam, read, consistent_nam);
        tries++;
    }
}

static void rescue_read_part(EngineC& eng, ChunkC& ch, WorkItem& w, int flag,
                             const ReadC& read2, const ReadC& read1,
                             std::vector<NamT>& nams1, double mu, double sigma) {
    TmpResC& tmp = w.tmp;
    tmp.type = flag;
    const NamT n_max1 = nams1[0];
    i64 tries = 0;
    for (auto& nam : nams1) {
        double score_dropoff1 = (double)nam.n_hits / (double)n_max1.n_hits;
        if (tries >= eng.mp.max_tries ||
            score_dropoff1 < eng.mp.dropoff_threshold)
            break;
        bool consistent_nam = reverse_nam_if_needed(nam, read1, eng.refs, eng.sp.k);
        w.det1.nam_inconsistent += consistent_nam ? 0 : 1;
        tmp.is_read1.push_back(flag == 1 ? 1 : 0);
        tmp.consistent_nam.push_back(consistent_nam ? 1 : 0);
        bool gapped = extend_seed_part(eng, ch, tmp, nam, read1, consistent_nam);
        w.det1.gapped += gapped ? 1 : 0;
        w.det1.tried_alignment += 1;

        tmp.is_read1.push_back(flag != 1 ? 1 : 0);
        rescue_mate_part(eng, ch, tmp, nam, read2, mu, sigma, eng.sp.k);
        tries++;
    }
}

static void align_PE_part(EngineC& eng, ChunkC& ch, WorkItem& w,
                          std::vector<NamT>& nams1, std::vector<NamT>& nams2,
                          const ReadC& read1, const ReadC& read2) {
    TmpResC& tmp = w.tmp;
    double mu = isz(eng).mu, sigma = isz(eng).sigma;
    int k = eng.sp.k;

    if (nams1.empty() && nams2.empty()) {
        tmp.type = 0;
        return;
    }
    if (!nams1.empty() && nams2.empty()) {
        rescue_read_part(eng, ch, w, 1, read2, read1, nams1, mu, sigma);
        return;
    }
    if (nams1.empty() && !nams2.empty()) {
        // note: like the reference, the detail counters land on det1
        // (details[0]) even though the mapped read is read2
        rescue_read_part(eng, ch, w, 2, read1, read2, nams2, mu, sigma);
        return;
    }

    if (top_dropoff(nams1) < eng.mp.dropoff_threshold &&
        top_dropoff(nams2) < eng.mp.dropoff_threshold &&
        is_proper_nam_pair(nams1[0], nams2[0], mu, sigma)) {
        tmp.type = 3;
        NamT& n_max1 = nams1[0];
        NamT& n_max2 = nams2[0];
        bool c1 = reverse_nam_if_needed(n_max1, read1, eng.refs, k);
        w.det1.nam_inconsistent += c1 ? 0 : 1;
        bool c2 = reverse_nam_if_needed(n_max2, read2, eng.refs, k);
        w.det2.nam_inconsistent += c2 ? 0 : 1;

        tmp.is_read1.push_back(1);
        tmp.consistent_nam.push_back(c1 ? 1 : 0);
        bool gapped1 = extend_seed_part(eng, ch, tmp, n_max1, read1, c1);
        w.det1.tried_alignment += 1;
        w.det1.gapped += gapped1 ? 1 : 0;

        tmp.is_read1.push_back(0);
        tmp.consistent_nam.push_back(c2 ? 1 : 0);
        bool gapped2 = extend_seed_part(eng, ch, tmp, n_max2, read2, c2);
        w.det2.tried_alignment += 1;
        w.det2.gapped += gapped2 ? 1 : 0;

        tmp.mapq1 = get_mapq(nams1, n_max1);
        tmp.mapq2 = get_mapq(nams2, n_max2);

        if (!gapped1 && !gapped2) {
            const AlignmentC& a1 = tmp.align_res[tmp.align_res.size() - 2];
            const AlignmentC& a2 = tmp.align_res[tmp.align_res.size() - 1];
            bool is_proper = is_proper_pair_c(a1, a2, mu, sigma);
            if (isz(eng).sample_size < 400 &&
                a1.edit_distance + a2.edit_distance < 3 && is_proper)
                isz(eng).update(std::abs((i64)a1.ref_start - a2.ref_start));
        }
        return;
    }

    tmp.type = 4;
    std::deque<NamT> dummy_pool;
    std::vector<NamPairC> joint;
    get_best_scoring_nam_pairs(nams1, nams2, mu, sigma, joint, dummy_pool);
    std::vector<char> is_aligned1, is_aligned2;
    i64 max_id1 = 0, max_id2 = 0;
    for (const auto& n : nams1) max_id1 = std::max(max_id1, (i64)n.nam_id);
    for (const auto& n : nams2) max_id2 = std::max(max_id2, (i64)n.nam_id);
    is_aligned1.assign(max_id1 + 1, 0);
    is_aligned2.assign(max_id2 + 1, 0);

    NamT& n1_max = nams1[0];
    bool c1 = reverse_nam_if_needed(n1_max, read1, eng.refs, k);
    w.det1.nam_inconsistent += c1 ? 0 : 1;
    tmp.is_read1.push_back(1);
    tmp.consistent_nam.push_back(c1 ? 1 : 0);
    bool gapped1 = extend_seed_part(eng, ch, tmp, n1_max, read1, c1);
    is_aligned1[n1_max.nam_id] = 1;
    w.det1.tried_alignment += 1;
    w.det1.gapped += gapped1 ? 1 : 0;

    NamT& n2_max = nams2[0];
    bool c2 = reverse_nam_if_needed(n2_max, read2, eng.refs, k);
    w.det2.nam_inconsistent += c2 ? 0 : 1;
    tmp.is_read1.push_back(0);
    tmp.consistent_nam.push_back(c2 ? 1 : 0);
    bool gapped2 = extend_seed_part(eng, ch, tmp, n2_max, read2, c2);
    is_aligned2[n2_max.nam_id] = 1;
    w.det2.tried_alignment += 1;
    w.det2.gapped += gapped2 ? 1 : 0;

    tmp.type4_loop_size = 0;
    i64 n_high_scores = 0;
    i64 max_score = joint.empty() ? 1 : joint[0].score;
    for (auto& pair : joint) {
        double score_dropoff = (double)pair.score / (double)max_score;
        if (n_high_scores >= eng.mp.max_tries ||
            score_dropoff < eng.mp.dropoff_threshold)
            break;
        NamT& n1 = *pair.nam1;  // shared objects: mutations persist
        NamT& n2 = *pair.nam2;
        // only (ref_start, nam_id) of these copies are read in phase B;
        // both are immutable under reverse_nam_if_needed
        tmp.type4_nams.push_back(n1);
        tmp.type4_nams.push_back(n2);
        tmp.type4_loop_size += 1;

        if (n1.ref_start >= 0) {
            if (!is_aligned1[n1.nam_id]) {
                bool cn = reverse_nam_if_needed(n1, read1, eng.refs, k);
                w.det1.nam_inconsistent += cn ? 0 : 1;
                tmp.is_read1.push_back(1);
                tmp.consistent_nam.push_back(cn ? 1 : 0);
                bool g = extend_seed_part(eng, ch, tmp, n1, read1, cn);
                is_aligned1[n1.nam_id] = 1;
                w.det1.tried_alignment += 1;
                w.det1.gapped += g ? 1 : 0;
            }
        } else {
            bool cn = reverse_nam_if_needed(n2, read2, eng.refs, k);
            w.det2.nam_inconsistent += cn ? 0 : 1;
            tmp.is_read1.push_back(1);
            tmp.consistent_nam.push_back(1);
            rescue_mate_part(eng, ch, tmp, n2, read1, mu, sigma, k);
            w.det1.tried_alignment += 1;
        }

        if (n2.ref_start >= 0) {
            if (!is_aligned2[n2.nam_id]) {
                bool cn = reverse_nam_if_needed(n2, read2, eng.refs, k);
                w.det2.nam_inconsistent += cn ? 0 : 1;
                tmp.is_read1.push_back(0);
                tmp.consistent_nam.push_back(cn ? 1 : 0);
                bool g = extend_seed_part(eng, ch, tmp, n2, read2, cn);
                is_aligned2[n2.nam_id] = 1;
                w.det2.tried_alignment += 1;
                w.det2.gapped += g ? 1 : 0;
            }
        } else {
            bool cn = reverse_nam_if_needed(n1, read1, eng.refs, k);
            w.det1.nam_inconsistent += cn ? 0 : 1;
            tmp.is_read1.push_back(0);
            tmp.consistent_nam.push_back(1);
            rescue_mate_part(eng, ch, tmp, n1, read2, mu, sigma, k);
            w.det2.tried_alignment += 1;
        }
        n_high_scores++;
    }
}

}  // namespace engine
namespace engine {

// ------------------------------------------------------------------
// Phase B: result conversion + last-stage scoring/pairing + SAM
// (pipeline/batched.py fill_results / align_SE_last / rescue_read_last /
// align_PE_last).

static constexpr i64 INT_MAX_C = 2147483647LL;

// resolve all jobs that have no device result with the host aligner
static void resolve_host_jobs(EngineC& eng, ChunkC& ch) {
    for (size_t j = 0; j < ch.jobs.size(); ++j) {
        if (ch.job_done[j]) continue;
        const JobC& job = ch.jobs[j];
        eng.aligner.align(job.q, job.qn, job.t, job.tn, ch.job_results[j]);
        ch.job_done[j] = 1;
    }
}

// AlignmentInfo -> Alignment (pipeline/batched.py fill_results)
static void fill_results(ChunkC& ch, TmpResC& tmp) {
    for (size_t j = 0; j < tmp.todo_nams.size(); ++j) {
        if (tmp.done_align[j]) continue;
        const AlignmentInfoC& info = ch.job_results[tmp.job_ids[j]];
        const NamT& nam = tmp.todo_nams[j];
        i64 ref_start = tmp.job_ref_start[j];
        AlignmentC& a = tmp.align_res[j];
        if (tmp.is_extend_seed[j]) {
            i64 softclipped = info.query_start + (tmp.job_qlen[j] - info.query_end);
            a.cigar = info.cigar;
            a.edit_distance = info.edit_distance;
            a.global_ed = info.edit_distance + (int)softclipped;
            a.score = info.sw_score;
            a.ref_start = (int)(ref_start + info.ref_start);
            a.length = info.ref_span();
            a.is_rc = nam.is_rc != 0;
            a.is_unaligned = false;
            a.ref_id = nam.ref_id;
            a.gapped = true;
        } else {
            a.cigar = info.cigar;
            a.edit_distance = info.edit_distance;
            a.score = info.sw_score;
            a.ref_start = (int)(ref_start + info.ref_start);
            a.is_rc = nam.is_rc == 0;
            a.ref_id = nam.ref_id;
            a.is_unaligned = info.cigar.empty();
            a.length = info.ref_span();
        }
    }
}

static void align_SE_last(EngineC& eng, ChunkC& ch, WorkItem& w, SamC& sam) {
    TmpResC& tmp = w.tmp;
    const RecordView& rec = ch.records[w.rec1];
    const ReadC& read = ch.read(w.rec1);
    DetailsC details;  // phase-B-local; merged into w.det1 by caller
    if (tmp.type == 0) {
        sam.add_unmapped(rec);
        w.det2 = details;
        return;
    }
    std::vector<const AlignmentC*> alignments;
    i64 tries = 0;
    const NamT& n_max = tmp.todo_nams[0];
    i64 max_tries = eng.mp.max_tries;
    i64 max_secondary = eng.mp.max_secondary;

    i64 best_edit_distance = INT_MAX_C;
    i64 best_score = 0, second_best_score = 0;
    i64 alignments_with_best_score = 0;
    i64 best_index = 0;
    static const AlignmentC UNALIGNED = [] {
        AlignmentC a;
        a.is_unaligned = true;
        return a;
    }();
    const AlignmentC* best_alignment = &UNALIGNED;

    for (size_t i = 0; i < tmp.todo_nams.size(); ++i) {
        const NamT& nam = tmp.todo_nams[i];
        double score_dropoff = (double)nam.n_hits / (double)n_max.n_hits;
        if (tries >= max_tries || (tries > 1 && best_edit_distance == 0) ||
            score_dropoff < eng.mp.dropoff_threshold) {
            // uncount pre-aligned jobs the break skips (reference
            // aln.cpp:175-180): keeps 'Total calls to ssw' comparable
            // between the split and monolithic paths
            for (size_t j = i; j < tmp.todo_nams.size(); ++j)
                if (!tmp.done_align[j]) eng.aligner.calls--;
            break;
        }
        details.nam_inconsistent += tmp.consistent_nam[i] ? 0 : 1;
        const AlignmentC& alignment = tmp.align_res[i];
        details.tried_alignment += 1;
        details.gapped += alignment.gapped ? 1 : 0;

        if (max_secondary > 0) alignments.push_back(&alignment);
        if (alignment.score >= best_score) {
            second_best_score = best_score;
            bool update_best = false;
            if (alignment.score > best_score) {
                alignments_with_best_score = 1;
                update_best = true;
            } else {
                alignments_with_best_score += 1;
                if (uniform_int(ch.rng, 1, alignments_with_best_score) == 1)
                    update_best = true;
            }
            if (update_best) {
                best_score = alignment.score;
                best_alignment = &alignment;
                best_index = tries;
                if (max_secondary == 0) best_edit_distance = alignment.global_ed;
            }
        } else if (alignment.score > second_best_score) {
            second_best_score = alignment.score;
        }
        tries++;
    }
    int mapq = 0;
    if (best_score > 0)
        mapq = (int)((60.0 * (double)(best_score - second_best_score) +
                      (double)best_score - 1.0) /
                     (double)best_score) &
               0xFF;
    sam.add(*best_alignment, rec, (const u8*)read.rc.data(), mapq, true, details);
    w.det2 = details;  // stash phase-B details for the caller to merge

    if (max_secondary == 0) return;
    if (alignments.size() > 1)
        std::swap(alignments[best_index], alignments.back());
    if (!alignments.empty()) alignments.pop_back();
    std::sort(alignments.begin(), alignments.end(),
              [](const AlignmentC* a, const AlignmentC* b) {
                  return a->score > b->score;
              });
    i64 n = 0;
    for (const AlignmentC* alignment : alignments) {
        if (n >= max_secondary ||
            alignment->score - best_score >
                2 * eng.ap.mismatch + eng.ap.gap_open)
            break;
        sam.add(*alignment, rec, (const u8*)read.rc.data(), mapq, false, details);
        n++;
    }
}

// map/pe.py get_best_scoring_pairs / reference src/aln.cpp:536-558
struct ScoredPairC {
    double score;
    const AlignmentC* a1;
    const AlignmentC* a2;
};

static void get_best_scoring_pairs(const std::vector<const AlignmentC*>& as1,
                                   const std::vector<const AlignmentC*>& as2,
                                   double mu, double sigma,
                                   std::vector<ScoredPairC>& pairs) {
    pairs.clear();
    for (const AlignmentC* a1 : as1)
        for (const AlignmentC* a2 : as2) {
            i64 dist = std::abs((i64)a1->ref_start - a2->ref_start);
            double score = (double)(a1->score + a2->score);
            // float32 distance + window; FLOAT log of the float pdf
            // (aln.cpp's <math.h> float overload, probe-verified)
            if ((a1->is_rc != a2->is_rc) &&
                ((float)dist < f32_window(mu, sigma, 4)))
                score += (double)std::log(normal_pdf_f32(
                    (float)dist, (float)mu, (float)sigma));
            else
                score -= 10.0;
            pairs.push_back({score, a1, a2});
        }
}

// reference src/aln.cpp:1149-1171 (in place, keeps first of each run)
static void deduplicate_scored_pairs(std::vector<ScoredPairC>& pairs) {
    if (pairs.empty()) return;
    auto key = [](const ScoredPairC& p) {
        return std::make_tuple(p.a1->ref_start, p.a2->ref_start, p.a1->ref_id,
                               p.a2->ref_id);
    };
    auto prev = key(pairs[0]);
    size_t j = 1;
    for (size_t i = 1; i < pairs.size(); ++i) {
        auto cur = key(pairs[i]);
        if (cur != prev) {
            prev = cur;
            pairs[j++] = pairs[i];
        }
    }
    pairs.resize(j);
}

// reference src/aln.cpp:1177-1193
static void pick_random_top_pair(std::vector<ScoredPairC>& high_scores,
                                 MinstdRand& g) {
    size_t i = 1;
    while (i < high_scores.size() && high_scores[i].score == high_scores[0].score)
        i++;
    if (i > 1) {
        i64 random_index = uniform_int(g, 0, (i64)i - 1);
        if (random_index != 0) std::swap(high_scores[0], high_scores[random_index]);
    }
}

// reference src/aln.cpp:506-527
static std::pair<int, int> joint_mapq_from_high_scores(
    const std::vector<ScoredPairC>& pairs) {
    if (pairs.size() <= 1) return {60, 60};
    double score1 = pairs[0].score;
    double score2 = pairs[1].score;
    if (score1 == score2) return {0, 0};
    int diff = (int)(score1 - score2);
    int mapq;
    if (score1 > 0 && score2 > 0)
        mapq = std::min(60, diff);
    else if (score1 > 0 && score2 <= 0)
        mapq = 60;
    else
        mapq = 1;
    return {mapq, mapq};
}

static void sort_alignment_ptrs(std::vector<const AlignmentC*>& v) {
    std::sort(v.begin(), v.end(), [](const AlignmentC* a, const AlignmentC* b) {
        return a->score > b->score;
    });
}

// pipeline/batched.py rescue_read_last (reference src/aln.cpp:1983-2080)
static void rescue_read_last(EngineC& eng, ChunkC& ch, WorkItem& w, SamC& sam,
                             bool swap_r1r2) {
    TmpResC& tmp = w.tmp;
    double mu = isz(eng).mu, sigma = isz(eng).sigma;
    // record/read roles: read1 = the read that had NAMs
    i64 rec1i = swap_r1r2 ? w.rec2 : w.rec1;
    i64 rec2i = swap_r1r2 ? w.rec1 : w.rec2;
    const RecordView& record1 = ch.records[rec1i];
    const RecordView& record2 = ch.records[rec2i];
    const ReadC& read1 = ch.read(rec1i);
    const ReadC& read2 = ch.read(rec2i);
    std::vector<const AlignmentC*> alignments1, alignments2;
    size_t res_num = tmp.todo_nams.size();
    for (size_t i = 0; i + 1 < res_num; i += 2) {
        alignments1.push_back(&tmp.align_res[i]);
        alignments2.push_back(&tmp.align_res[i + 1]);
        // always details[1] — the reference does not swap the details array
        // in the rescue path (see map/pe.py rescue_read note)
        w.det2.mate_rescue += tmp.align_res[i + 1].is_unaligned ? 0 : 1;
    }
    sort_alignment_ptrs(alignments1);
    sort_alignment_ptrs(alignments2);

    std::vector<ScoredPairC> high_scores;
    get_best_scoring_pairs(alignments1, alignments2, mu, sigma, high_scores);
    std::sort(high_scores.begin(), high_scores.end(),
              [](const ScoredPairC& a, const ScoredPairC& b) {
                  return a.score > b.score;
              });
    deduplicate_scored_pairs(high_scores);
    pick_random_top_pair(high_scores, ch.rng);
    auto [mapq1, mapq2] = joint_mapq_from_high_scores(high_scores);
    double secondary_dropoff = 2.0 * eng.ap.mismatch + eng.ap.gap_open;

    if (eng.mp.max_secondary == 0) {
        const ScoredPairC& best = high_scores[0];
        if (swap_r1r2)
            sam.add_pair(*best.a2, *best.a1, record2, record1,
                         (const u8*)read2.rc.data(), (const u8*)read1.rc.data(),
                         mapq2, mapq1, is_proper_pair_c(*best.a2, *best.a1, mu, sigma),
                         true, w.det1, w.det2);
        else
            sam.add_pair(*best.a1, *best.a2, record1, record2,
                         (const u8*)read1.rc.data(), (const u8*)read2.rc.data(),
                         mapq1, mapq2, is_proper_pair_c(*best.a1, *best.a2, mu, sigma),
                         true, w.det1, w.det2);
        return;
    }
    i64 max_out = std::min((i64)high_scores.size(), eng.mp.max_secondary);
    bool is_primary = true;
    // rescue_read keeps DOUBLE scores here (reference aln.cpp:1327/2049
    // `auto s_max`), unlike align_PE's explicit `float s_max`
    double s_max = high_scores[0].score;
    for (i64 i = 0; i < max_out; ++i) {
        if (i > 0) {
            is_primary = false;
            mapq1 = 0;
            mapq2 = 0;
        }
        const ScoredPairC& pair = high_scores[i];
        if (s_max - pair.score < secondary_dropoff) {
            if (swap_r1r2)
                sam.add_pair(*pair.a2, *pair.a1, record2, record1,
                             (const u8*)read2.rc.data(),
                             (const u8*)read1.rc.data(), mapq2, mapq1,
                             is_proper_pair_c(*pair.a2, *pair.a1, mu, sigma),
                             is_primary, w.det2, w.det1);
            else
                sam.add_pair(*pair.a1, *pair.a2, record1, record2,
                             (const u8*)read1.rc.data(),
                             (const u8*)read2.rc.data(), mapq1, mapq2,
                             is_proper_pair_c(*pair.a1, *pair.a2, mu, sigma),
                             is_primary, w.det1, w.det2);
        } else {
            break;
        }
    }
}

// pipeline/batched.py align_PE_last (reference src/aln.cpp:2083-2306)
static void align_PE_last(EngineC& eng, ChunkC& ch, WorkItem& w, SamC& sam) {
    TmpResC& tmp = w.tmp;
    double mu = isz(eng).mu, sigma = isz(eng).sigma;
    double secondary_dropoff = 2.0 * eng.ap.mismatch + eng.ap.gap_open;
    i64 max_secondary = eng.mp.max_secondary;
    const RecordView& record1 = ch.records[w.rec1];
    const RecordView& record2 = ch.records[w.rec2];
    const ReadC& read1 = ch.read(w.rec1);
    const ReadC& read2 = ch.read(w.rec2);

    if (tmp.type == 0) {
        sam.add_unmapped_pair(record1, record2);
        return;
    }
    if (tmp.type == 1) {
        rescue_read_last(eng, ch, w, sam, false);
        return;
    }
    if (tmp.type == 2) {
        rescue_read_last(eng, ch, w, sam, true);
        return;
    }
    if (tmp.type == 3) {
        const AlignmentC& a1 = tmp.align_res[0];
        const AlignmentC& a2 = tmp.align_res[1];
        bool is_proper = is_proper_pair_c(a1, a2, mu, sigma);
        sam.add_pair(a1, a2, record1, record2, (const u8*)read1.rc.data(),
                     (const u8*)read2.rc.data(), tmp.mapq1, tmp.mapq2, is_proper,
                     true, w.det1, w.det2);
        return;
    }

    // type 4
    size_t pos = 0;
    // nam_id -> alignment cache, replayed in phase-A order
    std::vector<const AlignmentC*> is_aligned1, is_aligned2;
    i64 max_id = 0;
    for (const auto& n : tmp.type4_nams) max_id = std::max(max_id, (i64)n.nam_id);
    for (const auto& n : tmp.todo_nams) max_id = std::max(max_id, (i64)n.nam_id);
    is_aligned1.assign(max_id + 1, nullptr);
    is_aligned2.assign(max_id + 1, nullptr);

    const NamT& n1_max = tmp.todo_nams[pos];
    const AlignmentC* a1_indv_max = &tmp.align_res[pos];
    is_aligned1[n1_max.nam_id] = a1_indv_max;
    pos++;
    const NamT& n2_max = tmp.todo_nams[pos];
    const AlignmentC* a2_indv_max = &tmp.align_res[pos];
    is_aligned2[n2_max.nam_id] = a2_indv_max;
    pos++;

    std::vector<ScoredPairC> high_scores;
    for (i64 i = 0; i < tmp.type4_loop_size; ++i) {
        const NamT& n1 = tmp.type4_nams[2 * i];
        const NamT& n2 = tmp.type4_nams[2 * i + 1];
        const AlignmentC* a1;
        const AlignmentC* a2;
        if (n1.ref_start >= 0) {
            if (is_aligned1[n1.nam_id]) {
                a1 = is_aligned1[n1.nam_id];
            } else {
                a1 = &tmp.align_res[pos++];
                is_aligned1[n1.nam_id] = a1;
            }
        } else {
            a1 = &tmp.align_res[pos++];
            w.det1.mate_rescue += a1->is_unaligned ? 0 : 1;
        }
        if (a1->score > a1_indv_max->score) a1_indv_max = a1;

        if (n2.ref_start >= 0) {
            if (is_aligned2[n2.nam_id]) {
                a2 = is_aligned2[n2.nam_id];
            } else {
                a2 = &tmp.align_res[pos++];
                is_aligned2[n2.nam_id] = a2;
            }
        } else {
            a2 = &tmp.align_res[pos++];
            w.det2.mate_rescue += a2->is_unaligned ? 0 : 1;
        }
        if (a2->score > a2_indv_max->score) a2_indv_max = a2;

        float w10 = f32_window(mu, sigma, 10);
        bool r1_r2 = a2->is_rc && (a1->ref_start <= a2->ref_start) &&
                     ((float)(a2->ref_start - a1->ref_start) < w10);
        bool r2_r1 = a1->is_rc && (a2->ref_start <= a1->ref_start) &&
                     ((float)(a1->ref_start - a2->ref_start) < w10);
        double combined_score;
        if (r1_r2 || r2_r1) {
            i64 x = std::abs((i64)a1->ref_start - a2->ref_start);
            // FLOAT log of the float pdf: aln.cpp includes <math.h>,
            // whose C++ global float overload makes its unqualified
            // log(float) a float log (probe-verified)
            double lp = (double)std::log(
                normal_pdf_f32((float)x, (float)mu, (float)sigma));
            combined_score = (double)a1->score + (double)a2->score +
                             std::max((double)(-20.0f + 0.001f), lp);
        } else {
            combined_score = (double)a1->score + (double)a2->score - 20.0;
        }
        high_scores.push_back({combined_score, a1, a2});
    }
    double combined_score =
        (double)a1_indv_max->score + (double)a2_indv_max->score - 20.0;
    high_scores.push_back({combined_score, a1_indv_max, a2_indv_max});

    std::sort(high_scores.begin(), high_scores.end(),
              [](const ScoredPairC& a, const ScoredPairC& b) {
                  return a.score > b.score;
              });
    deduplicate_scored_pairs(high_scores);
    pick_random_top_pair(high_scores, ch.rng);

    auto [mapq1, mapq2] = joint_mapq_from_high_scores(high_scores);
    const ScoredPairC& best = high_scores[0];
    if (max_secondary == 0) {
        bool is_proper = is_proper_pair_c(*best.a1, *best.a2, mu, sigma);
        sam.add_pair(*best.a1, *best.a2, record1, record2,
                     (const u8*)read1.rc.data(), (const u8*)read2.rc.data(),
                     mapq1, mapq2, is_proper, true, w.det1, w.det2);
    } else {
        i64 max_out = std::min((i64)high_scores.size(), max_secondary);
        float s_max = (float)best.score;  // reference: float s_max/s_score
        bool is_primary = true;
        for (i64 i = 0; i < max_out; ++i) {
            const ScoredPairC& pair = high_scores[i];
            if (i > 0) {
                is_primary = false;
                mapq1 = 255;
                mapq2 = 255;
            }
            if ((double)(s_max - (float)pair.score) < secondary_dropoff) {
                bool is_proper = is_proper_pair_c(*pair.a1, *pair.a2, mu, sigma);
                sam.add_pair(*pair.a1, *pair.a2, record1, record2,
                             (const u8*)read1.rc.data(),
                             (const u8*)read2.rc.data(), mapq1, mapq2, is_proper,
                             is_primary, w.det1, w.det2);
            } else {
                break;
            }
        }
    }
}

}  // namespace engine
namespace engine {

// ------------------------------------------------------------------
// PAF output (io/paf.py / reference src/paf.cpp) and the PE PAF
// location pick (map/pe.py get_best_map_location).

static void output_hits_paf_one(std::string& out, const NamT& n,
                                const RecordView& rec, const RefsView& refs,
                                i64 read_len) {
    if (n.ref_start < 0) return;
    out.append((const char*)rec.name, rec.name_len);
    out.push_back('\t');
    append_int(out, read_len);
    out.push_back('\t');
    append_int(out, n.query_start);
    out.push_back('\t');
    append_int(out, n.query_end);
    out.push_back('\t');
    out.push_back(n.is_rc ? '-' : '+');
    out.push_back('\t');
    out.append(refs.names[n.ref_id]);
    out.push_back('\t');
    append_int(out, refs.len(n.ref_id));
    out.push_back('\t');
    append_int(out, n.ref_start);
    out.push_back('\t');
    append_int(out, n.ref_end);
    out.push_back('\t');
    append_int(out, n.n_hits);
    out.push_back('\t');
    append_int(out, n.ref_end - n.ref_start);
    out.append("\t255\n");
}

static void get_best_map_location(EngineC& eng, std::vector<NamT>& nams1,
                                  std::vector<NamT>& nams2, NamT& best1,
                                  NamT& best2) {
    std::deque<NamT> dummy_pool;
    std::vector<NamPairC> joint;
    get_best_scoring_nam_pairs(nams1, nams2, isz(eng).mu, isz(eng).sigma,
                               joint, dummy_pool);
    best1 = NamT{};
    best1.ref_start = -1;
    best2 = NamT{};
    best2.ref_start = -1;
    if (joint.empty()) return;

    const NamT* n1_joint_max = nullptr;
    const NamT* n2_joint_max = nullptr;
    double score_joint = 0.0, score_indiv = 0.0;
    for (const auto& t : joint) {
        if (t.nam1->ref_start >= 0 && t.nam2->ref_start >= 0) {
            score_joint = (double)t.nam1->score + (double)t.nam2->score;
            n1_joint_max = t.nam1;
            n2_joint_max = t.nam2;
            break;
        }
    }
    if (!nams1.empty()) {
        score_indiv += (double)nams1[0].score - (double)nams1[0].score / 2.0;
        best1 = nams1[0];
    }
    if (!nams2.empty()) {
        score_indiv += (double)nams2[0].score - (double)nams2[0].score / 2.0;
        best2 = nams2[0];
    }
    if (score_joint > score_indiv) {
        best1 = *n1_joint_max;
        best2 = *n2_joint_max;
    }
    if (isz(eng).sample_size < 400 && score_joint > score_indiv)
        isz(eng).update(
            std::abs((i64)n1_joint_max->ref_start - n2_joint_max->ref_start));
}

}  // namespace engine

// ------------------------------------------------------------------
// ctypes API.

extern "C" {

void* engine_create(
    // index view
    const u64* hashes, const u32* positions, const u32* packed,
    const u64* buckets, u64 n_index, int bits, u32 filter_cutoff,
    // seeding params
    int k, int s, int t, int wmin, int wmax, u64 qmask, int max_dist,
    u32 rescue_cutoff, int rescue_level,
    // references
    const u8* ref_seqs, const i64* ref_offsets, const u8* ref_names,
    const i64* ref_name_offsets, i64 n_refs,
    // alignment params
    int match, int mismatch, int gap_open, int gap_extend, int end_bonus,
    // mapping params
    double dropoff, i64 max_tries, i64 max_secondary, int is_sam_out,
    // output options
    int cigar_eqx, int output_unmapped, int show_details, const char* rg_tail,
    // PE insert-size semantics (see EngineC::pe_ref_async)
    int pe_ref_async) {
    auto* eng = new engine::EngineC();
    eng->ix = IndexView{hashes, positions, packed, buckets,
                        n_index, bits,      filter_cutoff, k};
    eng->sp = engine::SeedParams{k, s, t, wmin, wmax, max_dist, qmask};
    eng->refs.seqs = ref_seqs;
    eng->refs.off = ref_offsets;
    eng->refs.n = n_refs;
    eng->refs.names.reserve(n_refs);
    for (i64 i = 0; i < n_refs; ++i)
        eng->refs.names.emplace_back((const char*)ref_names + ref_name_offsets[i],
                                     ref_name_offsets[i + 1] - ref_name_offsets[i]);
    eng->ap = engine::AlnParams{match, mismatch, gap_open, gap_extend, end_bonus};
    eng->aligner.p = eng->ap;
    eng->mp.dropoff_threshold = dropoff;
    eng->mp.max_tries = max_tries;
    eng->mp.max_secondary = max_secondary;
    eng->mp.rescue_level = rescue_level;
    eng->mp.rescue_cutoff = rescue_cutoff;
    eng->mp.is_sam_out = is_sam_out != 0;
    eng->cigar_eqx = cigar_eqx != 0;
    eng->output_unmapped = output_unmapped != 0;
    eng->show_details = show_details != 0;
    eng->rg_tail = rg_tail;
    eng->pe_ref_async = pe_ref_async;
    return eng;
}

void engine_free(void* e) { delete (engine::EngineC*)e; }

// counters: [aligner_calls, tot_all_tried, inconsistent_nams, nam_rescue,
// tot_rescued, fallbacks]
void engine_counters(void* e, i64* out) {
    auto* eng = (engine::EngineC*)e;
    out[0] = eng->aligner.calls;
    out[1] = eng->stats.tot_all_tried;
    out[2] = eng->stats.inconsistent_nams;
    out[3] = eng->stats.nam_rescue;
    out[4] = eng->stats.tot_rescued;
    out[5] = eng->fallbacks;
    out[6] = eng->feed_miss;
}

void engine_timers(void* e, double* out) {
    auto* eng = (engine::EngineC*)e;
    out[0] = eng->t_phase_a;
    out[1] = eng->t_seed_nam;
    out[2] = eng->t_host_align;
    out[3] = eng->t_phase_b;
}

// Reports the ACTIVE estimator: cumulative in monolithic mode; in
// pe_ref_async mode the estimator is per-chunk (reset each chunk, like
// the reference's async workers), so this reports the final state of
// the most recent chunk's estimator — the one that actually gated the
// last pairing decisions. out[3] flags the per-chunk mode.
void engine_isize(void* e, double* out) {
    auto* eng = (engine::EngineC*)e;
    auto& is = eng->pe_ref_async ? eng->last_chunk_isize : eng->isize;
    out[0] = is.mu;
    out[1] = is.sigma;
    out[2] = is.sample_size;
    out[3] = (double)eng->pe_ref_async;
}

static void* engine_chunk_a_impl(void* e, const u8* seqs, const i64* seq_off,
                                 const u8* names, const i64* name_off,
                                 const u8* quals, const i64* qual_off,
                                 i64 n_pairs, i64 n_singles, u64 chunk_seed,
                                 const engine::PreSeed* pre,
                                 const engine::RunFeed* runs = nullptr) {
    auto* eng = (engine::EngineC*)e;
    auto t_start = std::chrono::steady_clock::now();
    auto* ch = new engine::ChunkC();
    ch->eng = eng;
    ch->rng.reseed(chunk_seed);
    ch->n_pairs = n_pairs;
    ch->n_singles = n_singles;
    i64 n_records = 2 * n_pairs + n_singles;
    ch->seqs.assign((const char*)seqs, seq_off[n_records]);
    // the reference uppercases PE read sequences before mapping (and,
    // deliberately, not SE reads): src/pc.cpp:410-411,1193-1194 etc.
    for (char* c = &ch->seqs[0], *e = c + seq_off[2 * n_pairs]; c < e; ++c)
        *c &= (char)~32;
    ch->names.assign((const char*)names, name_off[n_records]);
    ch->quals.assign((const char*)quals, qual_off[n_records]);
    ch->records.resize(n_records);
    ch->reads.resize(n_records);
    ch->read_ready.assign(n_records, 0);
    for (i64 i = 0; i < n_records; ++i) {
        engine::RecordView& r = ch->records[i];
        r.seq = (const u8*)ch->seqs.data() + seq_off[i];
        r.seq_len = seq_off[i + 1] - seq_off[i];
        r.name = (const u8*)ch->names.data() + name_off[i];
        r.name_len = name_off[i + 1] - name_off[i];
        r.qual = (const u8*)ch->quals.data() + qual_off[i];
        r.qual_len = qual_off[i + 1] - qual_off[i];
    }

    engine::SeedScratch ss;
    // batched syncmer pre-pass (8-lane AVX-512 lockstep) for every
    // record that will take the host seeding path below
    engine::SyncPre psync;
    {
        auto t0 = std::chrono::steady_clock::now();
        std::vector<bool> need(n_records);
        bool any = false;
        for (i64 i = 0; i < n_records; ++i) {
            need[i] = !((runs && runs->counts[i] >= 0) ||
                        (pre && pre->counts[i] >= 0));
            any = any || need[i];
        }
        if (any) {
            // std::vector<bool> is packed; presync wants a flat array
            std::vector<char> needc(need.begin(), need.end());
            engine::presync_records(ch->records.data(), n_records,
                                    needc.data(), eng->sp, psync);
        } else {
            psync.start.assign(n_records, -1);
            psync.count.assign(n_records, 0);
        }
        eng->t_seed_nam += std::chrono::duration<double>(
                               std::chrono::steady_clock::now() - t0)
                               .count();
    }
    auto host_nams = [&](i64 rec, engine::DetailsC& det,
                         std::vector<Nam>& nm) {
        i64 st = psync.start[rec];
        engine::nams_for_read(*eng, ch->records[rec].seq,
                              ch->records[rec].seq_len, ss, ch->rng, det, nm,
                              st >= 0 ? psync.flat.data() + st : nullptr,
                              st >= 0 ? psync.count[rec] : -1);
    };
    std::vector<Nam> nams1, nams2;
    ch->work.reserve(n_pairs + n_singles);
    // pe_ref_async: the reference's async PE workers reset the
    // insert-size estimator for EVERY chunk (pc.cpp:1343 declares it
    // inside the loop; the :1505-1510 copy discards align_PE_read_last's
    // updates), so phase A runs against a fresh per-chunk estimator
    if (eng->pe_ref_async) eng->cur_isize = &ch->isize;
    for (i64 p = 0; p < n_pairs; ++p) {
        i64 i1 = 2 * p, i2 = 2 * p + 1;
        ch->work.emplace_back();
        engine::WorkItem& w = ch->work.back();
        w.rec1 = i1;
        w.rec2 = i2;
        if (runs && runs->counts[i1] >= 0)
            engine::nams_for_read_runs(*eng, *runs, i1, ss, ch->rng, w.det1,
                                       nams1);
        else if (pre && pre->counts[i1] >= 0)
            engine::nams_for_read_pre(*eng, *pre, i1, ss, ch->rng, w.det1,
                                      nams1);
        else
            host_nams(i1, w.det1, nams1);
        if (runs && runs->counts[i2] >= 0)
            engine::nams_for_read_runs(*eng, *runs, i2, ss, ch->rng, w.det2,
                                       nams2);
        else if (pre && pre->counts[i2] >= 0)
            engine::nams_for_read_pre(*eng, *pre, i2, ss, ch->rng, w.det2,
                                      nams2);
        else
            host_nams(i2, w.det2, nams2);
        if (!eng->mp.is_sam_out) {
            w.kind = 0;
            Nam b1, b2;
            engine::get_best_map_location(*eng, nams1, nams2, b1, b2);
            engine::output_hits_paf_one(ch->out, b1, ch->records[i1], eng->refs,
                                        ch->records[i1].seq_len);
            engine::output_hits_paf_one(ch->out, b2, ch->records[i2], eng->refs,
                                        ch->records[i2].seq_len);
        } else {
            w.kind = 2;
            engine::align_PE_part(*eng, *ch, w, nams1, nams2, ch->read(i1),
                                  ch->read(i2));
        }
    }
    for (i64 si = 0; si < n_singles; ++si) {
        i64 i = 2 * n_pairs + si;
        ch->work.emplace_back();
        engine::WorkItem& w = ch->work.back();
        w.rec1 = i;
        if (runs && runs->counts[i] >= 0)
            engine::nams_for_read_runs(*eng, *runs, i, ss, ch->rng, w.det1,
                                       nams1);
        else if (pre && pre->counts[i] >= 0)
            engine::nams_for_read_pre(*eng, *pre, i, ss, ch->rng, w.det1,
                                      nams1);
        else
            host_nams(i, w.det1, nams1);
        if (!eng->mp.is_sam_out) {
            w.kind = 0;
            if (!nams1.empty())
                engine::output_hits_paf_one(ch->out, nams1[0], ch->records[i],
                                            eng->refs, ch->records[i].seq_len);
        } else {
            w.kind = 1;
            engine::align_SE_part(*eng, *ch, w, nams1, ch->read(i));
        }
    }
    if (eng->pe_ref_async && !ch->pend_rescue.empty()) {
        // E1 gather semantics (pc.cpp:1228-1229 + part2_rescue_mate_get_str,
        // :333-368): rescue windows are recomputed with the END-of-phase-A
        // mu/sigma; the store step (:291-331) uses the same values, so one
        // recompute here fixes both. The phase-A gate (short window /
        // has_shared_substring) already ran with the decision-time values
        // and is NOT re-evaluated — faithfully including the case where
        // gate and job windows disagree.
        double mu = ch->isize.mu, sigma = ch->isize.sigma;
        for (const auto& pr : ch->pend_rescue) {
            engine::TmpResC& tmp = ch->work[pr.work_idx].tmp;
            const engine::NamT& nam = tmp.todo_nams[pr.j];
            i64 ref_start, ref_end;
            engine::rescue_window(*eng, nam, pr.read->n, mu, sigma,
                                  ref_start, ref_end);
            i64 jid = tmp.job_ids[pr.j];
            ch->jobs[jid].t = eng->refs.seq(nam.ref_id) + ref_start;
            ch->jobs[jid].tn = ref_end - ref_start;
            tmp.job_ref_start[pr.j] = ref_start;
        }
    }
    ch->job_results.resize(ch->jobs.size());
    ch->job_done.assign(ch->jobs.size(), 0);
    // the active-estimator pointer is only valid within a phase call
    // (each phase entry re-points it); never let it outlive the call —
    // the chunk (and in teardown paths even the engine) may be freed
    // before the next one
    eng->cur_isize = nullptr;
    eng->t_phase_a += std::chrono::duration<double>(
                          std::chrono::steady_clock::now() - t_start)
                          .count();
    return ch;
}

void* engine_chunk_a(void* e, const u8* seqs, const i64* seq_off,
                     const u8* names, const i64* name_off, const u8* quals,
                     const i64* qual_off, i64 n_pairs, i64 n_singles,
                     u64 chunk_seed) {
    return engine_chunk_a_impl(e, seqs, seq_off, names, name_off, quals,
                               qual_off, n_pairs, n_singles, chunk_seed,
                               nullptr);
}

i64 chunk_n_jobs(void* c) { return (i64)((engine::ChunkC*)c)->jobs.size(); }

void chunk_job_lens(void* c, int32_t* qlens, int32_t* tlens) {
    auto* ch = (engine::ChunkC*)c;
    for (size_t j = 0; j < ch->jobs.size(); ++j) {
        qlens[j] = (int32_t)ch->jobs[j].qn;
        tlens[j] = (int32_t)ch->jobs[j].tn;
    }
}

// Fill a packed device input buffer (ops/extend_device.py pack_input
// layout): rows 0..Q-1 query codes, Q..Q+T-1 target codes, then qlen
// lo/hi and tlen lo/hi rows. out is (Q+T+4, B) row-major; columns beyond
// n_idx are zero-length.
void chunk_fill_batch(void* c, const i64* idxs, i64 n_idx, i64 B, i64 Q, i64 T,
                      u8* out) {
    auto* ch = (engine::ChunkC*)c;
    i64 rows = Q + T + 4;
    memset(out, 0, (size_t)(rows * B));
    // pad code is 4 ('N')
    memset(out, 4, (size_t)((Q + T) * B));
    for (i64 b = 0; b < n_idx; ++b) {
        const engine::JobC& job = ch->jobs[idxs[b]];
        for (i64 r = 0; r < job.qn; ++r) out[r * B + b] = (u8)nt4(job.q[r]);
        for (i64 r = 0; r < job.tn; ++r)
            out[(Q + r) * B + b] = (u8)nt4(job.t[r]);
        out[(Q + T) * B + b] = (u8)(job.qn & 0xFF);
        out[(Q + T + 1) * B + b] = (u8)((job.qn >> 8) & 0xFF);
        out[(Q + T + 2) * B + b] = (u8)(job.tn & 0xFF);
        out[(Q + T + 3) * B + b] = (u8)((job.tn >> 8) & 0xFF);
    }
}

// Query-only batch fill for the device-resident-reference path: targets
// are always FORWARD slices of the reference blob (extend windows and
// rescue windows, see extend_seed_part/rescue_mate_part), so the device
// gathers them from its resident copy and the host ships only query
// codes + lengths + a u32 global target offset.
// Layout (Q + 8, B): query codes, qlen lo/hi, tlen lo/hi, tstart u32.
void chunk_fill_batch_q(void* e, void* c, const i64* idxs, i64 n_idx, i64 B,
                        i64 Q, u8* out) {
    auto* eng = (engine::EngineC*)e;
    auto* ch = (engine::ChunkC*)c;
    i64 rows = Q + 8;
    memset(out, 0, (size_t)(rows * B));
    memset(out, 4, (size_t)(Q * B));
    const u8* base = eng->refs.seqs;
    for (i64 b = 0; b < n_idx; ++b) {
        const engine::JobC& job = ch->jobs[idxs[b]];
        for (i64 r = 0; r < job.qn; ++r) out[r * B + b] = (u8)nt4(job.q[r]);
        u64 tstart = (u64)(job.t - base);
        out[(Q + 0) * B + b] = (u8)(job.qn & 0xFF);
        out[(Q + 1) * B + b] = (u8)((job.qn >> 8) & 0xFF);
        out[(Q + 2) * B + b] = (u8)(job.tn & 0xFF);
        out[(Q + 3) * B + b] = (u8)((job.tn >> 8) & 0xFF);
        out[(Q + 4) * B + b] = (u8)(tstart & 0xFF);
        out[(Q + 5) * B + b] = (u8)((tstart >> 8) & 0xFF);
        out[(Q + 6) * B + b] = (u8)((tstart >> 16) & 0xFF);
        out[(Q + 7) * B + b] = (u8)((tstart >> 24) & 0xFF);
    }
}

// 2-bit-packed query fill: 4 codes/byte + an N-mask bitmap, shrinking the
// per-batch upload ~2.5x on top of the query-only layout (the dev tunnel
// moves ~30 MB/s, so upload bytes are wall time).
// Layout (ceil(Q/4) + ceil(Q/8) + 8, B): packed codes, N-mask bits,
// qlen u16, tlen u16, tstart u32.
void chunk_fill_batch_q2(void* e, void* c, const i64* idxs, i64 n_idx, i64 B,
                         i64 Q, u8* out) {
    auto* eng = (engine::EngineC*)e;
    auto* ch = (engine::ChunkC*)c;
    i64 Qp = (Q + 3) / 4, Qm = (Q + 7) / 8;
    i64 rows = Qp + Qm + 8;
    memset(out, 0, (size_t)(rows * B));
    const u8* base = eng->refs.seqs;
    u8* nm = out + Qp * B;
    u8* tail = out + (Qp + Qm) * B;
    for (i64 b = 0; b < n_idx; ++b) {
        const engine::JobC& job = ch->jobs[idxs[b]];
        for (i64 r = 0; r < job.qn; ++r) {
            int code = nt4(job.q[r]);
            out[(r >> 2) * B + b] |= (u8)((code & 3) << ((r & 3) << 1));
            if (code >= 4) nm[(r >> 3) * B + b] |= (u8)(1 << (r & 7));
        }
        u64 tstart = (u64)(job.t - base);
        tail[0 * B + b] = (u8)(job.qn & 0xFF);
        tail[1 * B + b] = (u8)((job.qn >> 8) & 0xFF);
        tail[2 * B + b] = (u8)(job.tn & 0xFF);
        tail[3 * B + b] = (u8)((job.tn >> 8) & 0xFF);
        tail[4 * B + b] = (u8)(tstart & 0xFF);
        tail[5 * B + b] = (u8)((tstart >> 8) & 0xFF);
        tail[6 * B + b] = (u8)((tstart >> 16) & 0xFF);
        tail[7 * B + b] = (u8)((tstart >> 24) & 0xFF);
    }
}

// Ingest a device output buffer (ops/extend_device.py packed output):
// RLE_M length-lo rows + RLE_M (op << 5 | length >> 8) rows, then u16
// rows (score, t_end, q_end, t_begin, q_begin, edits, n_runs). Decodes
// cigars, validates, and runs the end-bonus post-processing; jobs that
// fail validation stay unresolved and fall back to the host aligner in
// phase B.
void chunk_set_device_results(void* e, void* c, const u8* dev, i64 B, i64 D,
                              const i64* idxs, i64 n_idx) {
    auto* eng = (engine::EngineC*)e;
    auto* ch = (engine::ChunkC*)c;
    (void)D;  // kernel output is RLE, independent of the diagonal count
    // device-RLE layout (ops/extend_device.py, 2 bytes/run): rows [0,M)
    // length lo byte, rows [M,2M) (op << 5) | (length >> 8), then
    // score/t_end/q_end/t_begin/q_begin/edits/n_runs as u16 (lo,hi)
    // row pairs
    const i64 M = 32;  // = extend_device.RLE_M (2-byte runs, keep in sync)
    // device op code -> cigar op
    static const int OPMAP[5] = {-1, engine::OP_EQ, engine::OP_X, engine::OP_I,
                                 engine::OP_D};
    engine::CigarC cigar;
    for (i64 b = 0; b < n_idx; ++b) {
        i64 j = idxs[b];
        const engine::JobC& job = ch->jobs[j];
        auto u16row = [&](i64 i) -> i64 {
            return (i64)dev[(2 * M + 2 * i) * B + b] |
                   ((i64)dev[(2 * M + 2 * i + 1) * B + b] << 8);
        };
        i64 score = u16row(0), t_end = u16row(1), q_end = u16row(2);
        i64 t_begin = u16row(3), q_begin = u16row(4), edits = u16row(5);
        i64 n_runs = u16row(6);
        engine::AlignmentInfoC& res = ch->job_results[j];
        if (score <= 0) {
            // nothing aligned: same failure values as the host path
            res = engine::AlignmentInfoC();
            res.edit_distance = 100000;
            res.ref_start = 0;
            res.sw_score = -100000;
            ch->job_done[j] = 1;
            continue;
        }
        if (n_runs <= 0 || n_runs > M) {
            eng->fallbacks++;  // >M runs or empty stream -> host re-align
            continue;
        }
        cigar.clear();
        i64 span_q = 0, span_t = 0;
        bool ok = true;
        // runs sit at slots [M - n_runs, M) in forward cigar order (the
        // device walker fills slots descending from M-1 as it discovers
        // the cigar back-to-front, ops/tb_pallas.py)
        i64 off = M - n_runs;
        for (i64 r = off; r < off + n_runs; ++r) {
            u8 hi = dev[(M + r) * B + b];
            u8 v = (u8)(hi >> 5);
            i64 len = (i64)dev[r * B + b] | ((i64)(hi & 0x1F) << 8);
            if (!v || v > 4 || len <= 0) {
                ok = false;
                break;
            }
            int op = OPMAP[v];
            cigar.push(op, (int)len);
            if (op != engine::OP_D) span_q += len;
            if (op != engine::OP_I) span_t += len;
        }
        if (!ok || cigar.empty() || span_q != q_end + 1 - q_begin ||
            span_t != t_end + 1 - t_begin) {
            eng->fallbacks++;  // gasal_fail analog -> host re-align
            continue;
        }
        eng->aligner.align_from_ends(job.q, job.qn, job.t, job.tn, (int)score,
                                     q_begin, q_end + 1, t_begin, t_end + 1,
                                     cigar, (int)edits, res);
        ch->job_done[j] = 1;
    }
}

void engine_chunk_b(void* e, void* c) {
    auto* eng = (engine::EngineC*)e;
    auto* ch = (engine::ChunkC*)c;
    // pe_ref_async: phase B (align_PE_last) READS this chunk's
    // estimator (the reference's pre_isize_est; like the reference's
    // split path, phase B never updates it — all updates happen in
    // phase A, cf. pipeline/batched.py align_PE_last note)
    if (eng->pe_ref_async) eng->cur_isize = &ch->isize;
    auto t_start = std::chrono::steady_clock::now();
    engine::resolve_host_jobs(*eng, *ch);
    auto t_mid = std::chrono::steady_clock::now();
    eng->t_host_align += std::chrono::duration<double>(t_mid - t_start).count();
    engine::SamC sam;
    sam.out = &ch->out;
    sam.refs = &eng->refs;
    sam.eqx = eng->cigar_eqx;
    sam.output_unmapped = eng->output_unmapped;
    sam.show_details = eng->show_details;
    sam.tail = eng->rg_tail;
    for (auto& w : ch->work) {
        if (w.kind == 0) continue;
        engine::fill_results(*ch, w.tmp);
        if (w.kind == 1) {
            engine::align_SE_last(*eng, *ch, w, sam);
            // merge the phase-B replay details (stashed in det2) the way
            // phase_b_chunk does, then record statistics
            w.det1.nam_inconsistent += w.det2.nam_inconsistent;
            w.det1.tried_alignment += w.det2.tried_alignment;
            w.det1.gapped += w.det2.gapped;
            eng->stats.add(w.det1);
        } else {
            engine::align_PE_last(*eng, *ch, w, sam);
            eng->stats.add(w.det1);
            eng->stats.add(w.det2);
        }
    }
    if (eng->pe_ref_async) eng->last_chunk_isize = ch->isize;
    eng->cur_isize = nullptr;  // see engine_chunk_a_impl: per-call only
    eng->t_phase_b += std::chrono::duration<double>(
                          std::chrono::steady_clock::now() - t_mid)
                          .count();
}

i64 chunk_out_len(void* c) { return (i64)((engine::ChunkC*)c)->out.size(); }

void chunk_out_copy(void* c, char* dst) {
    auto* ch = (engine::ChunkC*)c;
    memcpy(dst, ch->out.data(), ch->out.size());
}

void chunk_free(void* c) { delete (engine::ChunkC*)c; }

}  // extern "C"
// ------------------------------------------------------------------
// Native index build: reference-side seeding (canonical syncmers +
// randstrobe linking, forward strand) for all contigs, threaded per
// contig, then one stable sort by (hash, position). Semantics match
// seed/randstrobes.py randstrobes_reference + index/strobemer_index.py
// populate (reference src/index.cpp:141-242 count/assign/pdqsort).

#include <atomic>
#include <thread>

namespace engine {

struct RefRec {
    u64 hash;
    u32 pos;
    u32 packed;
};

struct IndexBuild {
    std::vector<RefRec> recs;
};

// Hybrid radix sort on the UNIQUE (hash, pos) key — reproduces
// stable_sort / np.lexsort((positions, hashes)) order exactly (one
// record per strobe1 position makes the key total, so any correct sort
// yields the same array and the .sti byte-interop contract holds).
//
// Stage 1: MSD scatter by the hash's top 16 bits (parallel per-chunk
// histograms + chunk-private scatter offsets). Stage 2: LSD byte passes
// over (pos 0..3, hash bytes 0..5) INSIDE each partition — a partition
// is ~n/65536 records, so stage-2 scatters stay cache-resident, which a
// flat 12-pass LSD lacks at whole-genome scale (flat LSD measured
// SLOWER than stable_sort at 64M records; this hybrid is 3.1-3.7x
// faster at 8M/64M, order-identical). Partitions are embarrassingly
// parallel. Degenerate hash distributions only cost speed, not
// correctness (one huge partition falls back to its own LSD).
static void sort_recs_radix(std::vector<RefRec>& recs, int nt) {
    const size_t n = recs.size();
    auto by_hash_pos = [](const RefRec& a, const RefRec& b) {
        if (a.hash != b.hash) return a.hash < b.hash;
        return a.pos < b.pos;
    };
    if (n < (1u << 15)) {
        std::stable_sort(recs.begin(), recs.end(), by_hash_pos);
        return;
    }
    constexpr int TB = 16;
    constexpr size_t NPART = (size_t)1 << TB;
    nt = std::max(1, nt);
    const size_t nchunks = (size_t)nt;
    std::vector<RefRec> tmp(n);
    // stage 1a: per-chunk MSD histograms
    std::vector<std::vector<u64>> cnt(nchunks, std::vector<u64>(NPART, 0));
    auto chunk_lo = [&](size_t c) { return n * c / nchunks; };
    auto run_chunks = [&](auto fn) {
        if (nchunks == 1) {
            fn(0);
            return;
        }
        std::vector<std::thread> pool;
        for (size_t c = 0; c < nchunks; ++c) pool.emplace_back(fn, c);
        for (auto& th : pool) th.join();
    };
    run_chunks([&](size_t c) {
        u64* h = cnt[c].data();
        const RefRec* lo = recs.data() + chunk_lo(c);
        const RefRec* hi = recs.data() + chunk_lo(c + 1);
        for (const RefRec* r = lo; r < hi; ++r) h[r->hash >> (64 - TB)]++;
    });
    // stage 1b: partition bounds + chunk-private scatter cursors
    std::vector<u64> bounds(NPART + 1, 0);
    {
        u64 acc = 0;
        for (size_t p = 0; p < NPART; ++p) {
            bounds[p] = acc;
            for (size_t c = 0; c < nchunks; ++c) {
                u64 k = cnt[c][p];
                cnt[c][p] = acc;  // becomes chunk c's cursor for part p
                acc += k;
            }
        }
        bounds[NPART] = acc;
    }
    // stage 1c: parallel scatter (chunks write disjoint cursor ranges)
    run_chunks([&](size_t c) {
        u64* off = cnt[c].data();
        const RefRec* lo = recs.data() + chunk_lo(c);
        const RefRec* hi = recs.data() + chunk_lo(c + 1);
        for (const RefRec* r = lo; r < hi; ++r)
            tmp[off[r->hash >> (64 - TB)]++] = *r;
    });
    // stage 2: per-partition LSD over the remaining 10 key bytes
    std::atomic<size_t> next_part{0};
    auto part_worker = [&]() {
        std::vector<RefRec> buf;
        while (true) {
            size_t p = next_part.fetch_add(1);
            if (p >= NPART) break;
            u64 lo = bounds[p], hi = bounds[p + 1];
            size_t m = (size_t)(hi - lo);
            if (m == 0) continue;
            RefRec* src = tmp.data() + lo;
            RefRec* fin = recs.data() + lo;
            if (m < 64) {
                // stable: (hash, pos) repeats across contigs when the
                // genome contains duplicated sequence, and the contract
                // is np.lexsort's stable order (ref_id rides in packed,
                // not in the key)
                std::stable_sort(src, src + m, by_hash_pos);
                std::copy(src, src + m, fin);
                continue;
            }
            buf.resize(m);
            u64 h[10][256];
            std::memset(h, 0, sizeof h);
            for (size_t i = 0; i < m; ++i) {
                const RefRec& r = src[i];
                h[0][r.pos & 0xFF]++;
                h[1][(r.pos >> 8) & 0xFF]++;
                h[2][(r.pos >> 16) & 0xFF]++;
                h[3][(r.pos >> 24) & 0xFF]++;
                for (int q = 0; q < 6; ++q) h[4 + q][(r.hash >> (8 * q)) & 0xFF]++;
            }
            RefRec* s = src;
            RefRec* d = buf.data();
            for (int pass = 0; pass < 10; ++pass) {
                u64* hp = h[pass];
                int nz = 0;
                for (int dg = 0; dg < 256 && nz < 2; ++dg) nz += hp[dg] != 0;
                if (nz < 2) continue;  // constant byte: order unchanged
                u64 o[256], acc = 0;
                for (int dg = 0; dg < 256; ++dg) {
                    o[dg] = acc;
                    acc += hp[dg];
                }
                int shift = pass < 4 ? 8 * pass : 8 * (pass - 4);
                if (pass < 4)
                    for (size_t i = 0; i < m; ++i)
                        d[o[(s[i].pos >> shift) & 0xFF]++] = s[i];
                else
                    for (size_t i = 0; i < m; ++i)
                        d[o[(s[i].hash >> shift) & 0xFF]++] = s[i];
                std::swap(s, d);
            }
            if (s != fin) std::copy(s, s + m, fin);
        }
    };
    if (nt == 1) {
        part_worker();
    } else {
        std::vector<std::thread> pool;
        for (int i = 0; i < nt; ++i) pool.emplace_back(part_worker);
        for (auto& th : pool) th.join();
    }
}

// link syncmers into reference randstrobes, keeping raw strobe2 positions
static void link_strobes_ref(const std::vector<Syncmer>& sync, int wmin,
                             int wmax, u64 qmask, int max_dist, u32 ref_bits,
                             std::vector<RefRec>& out) {
    const i64 n = (i64)sync.size();
    for (i64 i = 0; i + wmin < n; ++i) {
        const Syncmer& s1 = sync[i];
        i64 wend = std::min(i + (i64)wmax, n - 1);
        i64 max_position = s1.pos + max_dist;
        u64 min_val = UMAX;
        i64 best = i;
        for (i64 j = i + wmin; j <= wend && sync[j].pos <= max_position; ++j) {
            u64 res = (u64)popcount64((s1.hash ^ sync[j].hash) & qmask);
            if (res < min_val) {
                min_val = res;
                best = j;
            }
        }
        out.push_back({s1.hash + sync[best].hash, (u32)s1.pos,
                       ref_bits | (u32)(sync[best].pos - s1.pos)});
    }
}

}  // namespace engine

extern "C" {

void* index_build(const u8* seq_blob, const i64* offsets, i64 n_refs, int k,
                  int s, int t, int wmin, int wmax, u64 qmask, int max_dist,
                  int n_threads) {
    auto* ib = new engine::IndexBuild();
    std::vector<std::vector<engine::RefRec>> per_ref(n_refs);
    std::atomic<i64> next{0};
    auto worker = [&]() {
        std::vector<Syncmer> sync;
        while (true) {
            i64 r = next.fetch_add(1);
            if (r >= n_refs) break;
            const u8* seq = seq_blob + offsets[r];
            i64 len = offsets[r + 1] - offsets[r];
            if (len < wmax) continue;
            // syncmer density is ~1/4.4 bases for the shipped profiles;
            // reserving up front avoids doubling-growth reallocs, whose
            // fresh-page zeroing dominates cold whole-genome builds on
            // lazily-backed VMs (tens of GB of cumulative first touches)
            sync.reserve((size_t)(len / 4) + 1024);
            syncmers_of(seq, len, k, s, t, sync);
            per_ref[r].reserve(sync.size());
            engine::link_strobes_ref(sync, wmin, wmax, qmask, max_dist,
                                     (u32)r << 8, per_ref[r]);
        }
    };
    int nt = std::max(1, n_threads);
    if (nt == 1 || n_refs == 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    if (n_refs == 1) {
        // single contig: adopt the vector instead of copying 16 B/record
        ib->recs = std::move(per_ref[0]);
    } else {
        i64 total = 0;
        for (auto& v : per_ref) total += (i64)v.size();
        ib->recs.reserve(total);
        for (auto& v : per_ref) {
            ib->recs.insert(ib->recs.end(), v.begin(), v.end());
            v.clear();
            v.shrink_to_fit();
        }
    }
    // (hash, position) order == np.lexsort((positions, hashes)); the
    // key is unique, so the hybrid radix reproduces it exactly
    engine::sort_recs_radix(ib->recs, nt);
    return ib;
}

i64 index_build_count(void* h) {
    return (i64)((engine::IndexBuild*)h)->recs.size();
}

void index_build_copy(void* h, u64* hashes, u32* positions, u32* packed) {
    auto* ib = (engine::IndexBuild*)h;
    for (size_t i = 0; i < ib->recs.size(); ++i) {
        hashes[i] = ib->recs[i].hash;
        positions[i] = ib->recs[i].pos;
        packed[i] = ib->recs[i].packed;
    }
}

void index_build_free(void* h) { delete (engine::IndexBuild*)h; }

}  // extern "C"
// ------------------------------------------------------------------
// Native chunked FASTQ/FASTA reader — the RabbitFX-equivalent input
// layer (/root/reference/RabbitFX/io/FastxStream.h readNextChunk /
// readNextPairChunk and src/pc.cpp InputBuffer::read_records): buffered
// gz/plain decompression, record parsing with kseq-style
// name-cut-at-whitespace, SE / PE / interleaved pairing, producing the
// exact blob layout engine_chunk_a consumes (pairs interleaved first,
// then singles).

#include <zlib.h>

namespace engine {

struct ByteReader {
    gzFile f = nullptr;
    std::vector<char> buf;
    size_t pos = 0, lim = 0;
    bool eof = false;

    bool open(const char* path) {
        f = gzopen(path, "rb");
        if (!f) return false;
        gzbuffer(f, 1 << 20);
        buf.resize(1 << 20);
        return true;
    }
    void close() {
        if (f) gzclose(f);
        f = nullptr;
    }
    bool fill() {
        if (eof) return false;
        int n = gzread(f, buf.data(), (unsigned)buf.size());
        if (n <= 0) {
            eof = true;
            return false;
        }
        pos = 0;
        lim = (size_t)n;
        return true;
    }
    int peek() {
        if (pos >= lim && !fill()) return -1;
        return (unsigned char)buf[pos];
    }
    // next line without trailing \n / \r\n; false at EOF with empty line
    bool getline(std::string& out) {
        out.clear();
        while (true) {
            if (pos >= lim && !fill()) return !out.empty();
            char* start = buf.data() + pos;
            char* nl = (char*)memchr(start, '\n', lim - pos);
            if (nl) {
                out.append(start, nl - start);
                pos = (size_t)(nl - buf.data()) + 1;
                if (!out.empty() && out.back() == '\r') out.pop_back();
                return true;
            }
            out.append(start, lim - pos);
            pos = lim;
        }
    }
};

struct FxRecord {
    std::string name, seq, qual;
};

struct FxParser {
    ByteReader rd;
    bool is_fasta = false;
    bool started = false;
    std::string line;       // scratch
    std::string next_name;  // FASTA lookahead header
    bool have_header = false;
    int error = 0;          // 1 = malformed, 2 = unknown format

    bool start() {
        int c = rd.peek();
        if (c < 0) return false;
        if (c == '>')
            is_fasta = true;
        else if (c == '@')
            is_fasta = false;
        else {
            error = 2;
            return false;
        }
        started = true;
        if (is_fasta) {
            rd.getline(line);  // consume header
            next_name = line.substr(1);
            have_header = true;
        }
        return true;
    }

    static void cut_name(std::string& name) {
        size_t w = name.find_first_of(" \t");
        if (w != std::string::npos) name.resize(w);
    }

    // returns false at EOF (or error; check .error)
    bool next(FxRecord& rec) {
        if (!started && !start()) return false;
        if (error) return false;
        if (is_fasta) {
            if (!have_header) return false;
            rec.name = next_name;
            cut_name(rec.name);
            rec.seq.clear();
            rec.qual.clear();
            while (rd.getline(line)) {
                if (!line.empty() && line[0] == '>') {
                    next_name = line.substr(1);
                    return true;
                }
                rec.seq += line;
            }
            have_header = false;
            return true;
        }
        // FASTQ
        // skip blank lines at the header position: trailing newlines
        // are ubiquitous (RabbitFX treats a blank line as EOF; kseq
        // skips junk — skipping blanks covers both without silently
        // truncating at a mid-file blank the way RabbitFX does)
        do {
            if (!rd.getline(line)) return false;  // EOF
        } while (line.empty());
        if (line[0] != '@') {
            error = 1;
            return false;
        }
        rec.name.assign(line, 1, line.size() - 1);
        cut_name(rec.name);
        if (!rd.getline(rec.seq)) return false;
        if (!rd.getline(line)) return false;  // + separator
        if (line.empty() || line[0] != '+') {
            // wrapped-sequence or corrupt records: fail loudly instead
            // of consuming the wrong line as quality
            error = 1;
            return false;
        }
        if (!rd.getline(rec.qual)) {
            rec.qual.clear();
            return true;
        }
        return true;
    }
};

// reference src/pc.cpp:23-36, exactly: length <= 2 compares plainly;
// otherwise equal prefixes, and the trailing 1/2 pairs ONLY after a '/'
// separator (READ_A1/READ_A2 are two singles in the reference)
static bool fx_same_name(const std::string& n1, const std::string& n2) {
    if (n1.size() != n2.size()) return false;
    if (n1.size() <= 2) return n1 == n2;
    size_t last = n1.size() - 1;
    if (n1.compare(0, last, n2, 0, last) != 0) return false;
    if (n1[last - 1] == '/' && n1[last] == '1' && n2[last] == '2')
        return true;
    return n1[last] == n2[last];
}

struct FxChunk {
    std::string names, seqs, quals;
    std::vector<i64> name_off{0}, seq_off{0}, qual_off{0};
    i64 n_pairs = 0, n_singles = 0;

    void push(const FxRecord& r) {
        names += r.name;
        seqs += r.seq;
        quals += r.qual;
        name_off.push_back((i64)names.size());
        seq_off.push_back((i64)seqs.size());
        qual_off.push_back((i64)quals.size());
    }

    // pooled reuse: drop contents, keep the buffers' capacity (the
    // RabbitFX DataPool discipline — steady-state chunk production does
    // no heap allocation, /root/reference/RabbitFX/io/DataPool.h:35-70)
    void reset() {
        names.clear();
        seqs.clear();
        quals.clear();
        name_off.resize(1);
        seq_off.resize(1);
        qual_off.resize(1);
        n_pairs = n_singles = 0;
    }
};

struct FxReader {
    FxParser p1, p2;
    bool paired = false;
    bool interleaved = false;
    i64 chunk_reads = 10000;
    // atomic: the async producer writes it mid-produce while the
    // consumer polls fastx_error_async (codes: 1 malformed, 2 unknown
    // format, 3 paired length mismatch)
    std::atomic<int> error{0};
    bool done = false;
    std::vector<FxRecord> ilv_raw;  // interleaved batch scratch
    std::vector<u8> ilv_pair;
};

}  // namespace engine

extern "C" {

void* fastx_open(const char* path1, const char* path2, int interleaved,
                 i64 chunk_reads) {
    auto* r = new engine::FxReader();
    r->interleaved = interleaved != 0;
    r->chunk_reads = chunk_reads;
    if (!r->p1.rd.open(path1)) {
        delete r;
        return nullptr;
    }
    if (path2 && path2[0]) {
        if (!r->p2.rd.open(path2)) {
            r->p1.rd.close();
            delete r;
            return nullptr;
        }
        r->paired = true;
    }
    return r;
}

int fastx_error(void* r_) {
    // reads ONLY the folded atomic: the per-file error fields are
    // written by the producer thread mid-produce (fx_produce folds them
    // into r->error before returning, so nothing is lost)
    auto* r = (engine::FxReader*)r_;
    return r->error.load(std::memory_order_acquire);
}

// fill `ch` with the next chunk; returns false when nothing was read
// (EOF or error). Shared by the synchronous API and the async producer.
static bool fx_produce(engine::FxReader* r, engine::FxChunk* ch) {
    if (r->done || r->error) return false;
    engine::FxRecord rec1, rec2;
    if (r->paired) {
        // pairs interleaved r1,r2
        for (i64 i = 0; i < r->chunk_reads; ++i) {
            if (!r->p1.next(rec1)) {
                r->done = true;
                // symmetric check: extra mates in file2 are an error
                // too, not silently dropped
                if (r->p2.next(rec2)) r->error = 3;
                break;
            }
            if (!r->p2.next(rec2)) {
                r->error = 3;  // different lengths
                break;
            }
            ch->push(rec1);
            ch->push(rec2);
            ch->n_pairs++;
        }
    } else if (r->interleaved) {
        // reference pc.cpp:90-92 + distribute_interleaved (:42-72): a
        // chunk is EXACTLY 2*chunk_reads RAW records, paired by
        // consecutive same-name WITHIN the batch only — a pair
        // straddling the chunk boundary becomes two single-end reads
        // (the reference's lookahead carry is dead code: the scan loop
        // always consumes the batch's last record into records3 first).
        // Pairs must precede singles in the blob, so mark pair starts
        // first, then push straight into the pooled chunk in two passes
        // (no intermediate chunks or record copies: raw is reusable
        // reader scratch whose strings keep their capacity, preserving
        // the DataPool no-steady-state-allocation discipline).
        auto& raw = r->ilv_raw;
        i64 nraw = 0;
        for (i64 i = 0; i < 2 * r->chunk_reads; ++i) {
            if ((size_t)nraw == raw.size()) raw.emplace_back();
            if (!r->p1.next(raw[nraw])) {
                r->done = true;
                break;
            }
            ++nraw;
        }
        auto& is_pair = r->ilv_pair;  // 1 = first record of a pair
        is_pair.assign((size_t)nraw, 0);
        for (i64 i = 0; i + 1 < nraw;) {
            if (engine::fx_same_name(raw[i].name, raw[i + 1].name)) {
                is_pair[i] = 1;
                i += 2;
            } else {
                i += 1;
            }
        }
        for (i64 i = 0; i < nraw; ++i) {
            if (is_pair[i]) {
                ch->push(raw[i]);
                ch->push(raw[i + 1]);
                ch->n_pairs++;
                ++i;
            }
        }
        for (i64 i = 0; i < nraw; ++i) {
            if (is_pair[i]) {
                ++i;  // skip both members of the pair
                continue;
            }
            ch->push(raw[i]);
            ch->n_singles++;
        }
    } else {
        for (i64 i = 0; i < r->chunk_reads; ++i) {
            if (!r->p1.next(rec1)) {
                r->done = true;
                break;
            }
            ch->push(rec1);
            ch->n_singles++;
        }
    }
    if (r->p1.error || r->p2.error)
        r->error.store(r->p1.error ? r->p1.error : r->p2.error,
                       std::memory_order_release);
    return ch->n_pairs != 0 || ch->n_singles != 0;
}

// returns a chunk handle or NULL at EOF/error
void* fastx_next(void* r_) {
    auto* r = (engine::FxReader*)r_;
    auto* ch = new engine::FxChunk();
    if (!fx_produce(r, ch)) {
        delete ch;
        return nullptr;
    }
    return ch;
}

void fastx_counts(void* c_, i64* n_pairs, i64* n_singles) {
    auto* c = (engine::FxChunk*)c_;
    *n_pairs = c->n_pairs;
    *n_singles = c->n_singles;
}

void fastx_chunk_free(void* c) { delete (engine::FxChunk*)c; }

void fastx_close(void* r_) {
    auto* r = (engine::FxReader*)r_;
    r->p1.rd.close();
    r->p2.rd.close();
    delete r;
}

}  // extern "C"

// ------------------------------------------------------------------
// Async producer + fixed chunk pool — the RabbitFX production input
// design (/root/reference/RabbitFX/io/DataPool.h:35-70 TDataPool,
// FastxStream.h:292-364, DataQueue.h TDataQueue + src/main.cpp:203-237
// producer task): a dedicated reader thread parses and gz-decompresses
// chunks into a bounded pool of reusable buffers while consumer threads
// run phase A. On a multicore host this overlaps input decompression
// with mapping; chunk contents and order are identical to the
// synchronous API (same parser, same chunking).

#include <condition_variable>
#include <deque>
#include <mutex>
#include <thread>

namespace engine {

struct FxAsync {
    FxReader* r = nullptr;
    std::thread producer;
    std::mutex mu;
    std::condition_variable cv_prod, cv_cons;
    std::deque<FxChunk*> ready;   // parsed, in order
    std::vector<FxChunk*> pool;   // reusable empty chunks
    size_t depth = 8;             // max parsed chunks in flight
    size_t allocated = 0, cap = 32;
    bool eof = false, closed = false;

    void run() {
        while (true) {
            FxChunk* ch = nullptr;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_prod.wait(lk, [&] {
                    return closed || !pool.empty() || allocated < cap;
                });
                if (closed) return;
                if (!pool.empty()) {
                    ch = pool.back();
                    pool.pop_back();
                } else {
                    ch = new FxChunk();
                    allocated++;
                }
            }
            ch->reset();
            bool got = fx_produce(r, ch);
            std::unique_lock<std::mutex> lk(mu);
            if (!got || r->error) {
                // an errored produce can carry a PARTIAL chunk — never
                // surface it: the synchronous path frees it and raises,
                // so records from the failing chunk are not emitted and
                // output ends at a chunk boundary in both modes
                pool.push_back(ch);
                eof = true;
                cv_cons.notify_all();
                return;
            }
            ready.push_back(ch);
            cv_cons.notify_all();
            // bound the in-flight chunks (the reference's bounded
            // TDataQueue); pool/cap already bound total memory
            cv_prod.wait(lk, [&] { return closed || ready.size() < depth; });
            if (closed) return;
        }
    }
};

}  // namespace engine

extern "C" {

void* fastx_open_async(const char* path1, const char* path2, int interleaved,
                       i64 chunk_reads, i64 depth) {
    void* r = fastx_open(path1, path2, interleaved, chunk_reads);
    if (!r) return nullptr;
    auto* a = new engine::FxAsync();
    a->r = (engine::FxReader*)r;
    if (depth > 0) a->depth = (size_t)depth;
    a->cap = a->depth + 24;  // free headroom so release never blocks
    a->producer = std::thread([a] {
#ifdef __linux__
        // match pipeline.boost_mapping_thread: the producer's parse work
        // is on the critical path like phase A, so it gets the same CFS
        // share boost over the in-process jax client threads. RSB_RENICE
        // ("0" = off, else the nice level) keeps the two sides in sync.
        const char* env = getenv("RSB_RENICE");
        int level = -5;
        if (env && *env) level = atoi(env);
        if (!env || strcmp(env, "0") != 0)
            setpriority(PRIO_PROCESS, (id_t)syscall(SYS_gettid), level);
#endif
        a->run();
    });
    return a;
}

// blocks until a chunk is ready; NULL at EOF/error
void* fastx_next_async(void* a_) {
    auto* a = (engine::FxAsync*)a_;
    std::unique_lock<std::mutex> lk(a->mu);
    a->cv_cons.wait(lk, [&] { return !a->ready.empty() || a->eof; });
    if (a->ready.empty()) return nullptr;
    engine::FxChunk* ch = a->ready.front();
    a->ready.pop_front();
    a->cv_prod.notify_all();
    return ch;
}

// return a consumed chunk's buffers to the pool
void fastx_release_async(void* a_, void* c_) {
    auto* a = (engine::FxAsync*)a_;
    auto* ch = (engine::FxChunk*)c_;
    std::unique_lock<std::mutex> lk(a->mu);
    a->pool.push_back(ch);
    a->cv_prod.notify_all();
}

int fastx_error_async(void* a_) {
    auto* a = (engine::FxAsync*)a_;
    return fastx_error(a->r);
}

void fastx_close_async(void* a_) {
    auto* a = (engine::FxAsync*)a_;
    {
        std::unique_lock<std::mutex> lk(a->mu);
        a->closed = true;
        a->cv_prod.notify_all();
        a->cv_cons.notify_all();
    }
    if (a->producer.joinable()) a->producer.join();
    for (auto* ch : a->ready) delete ch;
    for (auto* ch : a->pool) delete ch;
    fastx_close(a->r);
    delete a;
}

// phase A directly from a native reader chunk (no Python blob hop)
void* engine_chunk_a_fx(void* e, void* c_, u64 chunk_seed) {
    auto* c = (engine::FxChunk*)c_;
    return engine_chunk_a(
        e, (const u8*)c->seqs.data(), c->seq_off.data(),
        (const u8*)c->names.data(), c->name_off.data(),
        (const u8*)c->quals.data(), c->qual_off.data(), c->n_pairs,
        c->n_singles, chunk_seed);
}

// Export a reader chunk's sequences as an (N, L) nt4 code batch for the
// device seeding kernel (--device-seed). Rows are record order (the same
// order chunk_a maps); reads longer than L get length -1 (caller marks
// them for host-side seeding).
void fx_chunk_codes(void* c_, i64 L, u8* codes, int32_t* lens,
                    i64 n_rows) {
    auto* c = (engine::FxChunk*)c_;
    // never write past the caller's (n_rows, L) buffer, whatever the
    // chunk's own record count is
    i64 n = std::min((i64)c->seq_off.size() - 1, n_rows);
    memset(codes, 4, (size_t)(n * L));
    for (i64 i = 0; i < n; ++i) {
        const u8* seq = (const u8*)c->seqs.data() + c->seq_off[i];
        i64 len = c->seq_off[i + 1] - c->seq_off[i];
        if (len > L) {
            lens[i] = -1;
            continue;
        }
        lens[i] = (int32_t)len;
        for (i64 j = 0; j < len; ++j) codes[i * L + j] = (u8)nt4(seq[j]);
    }
}

// Phase A from a reader chunk with device-precomputed seeding + index
// lookups (see engine::PreSeed). counts[i] < 0 = host seeding for read i.
void* engine_chunk_a_fx_pre(void* e, void* c_, u64 chunk_seed,
                            const int32_t* counts, const i64* offsets,
                            const u64* hashes, const int32_t* starts,
                            const int32_t* ends, const u8* is_rev,
                            const i64* positions) {
    auto* c = (engine::FxChunk*)c_;
    engine::PreSeed pre;
    pre.counts = counts;
    pre.offsets = offsets;
    pre.hashes = hashes;
    pre.starts = starts;
    pre.ends = ends;
    pre.is_rev = is_rev;
    pre.positions = positions;
    return engine_chunk_a_impl(
        e, (const u8*)c->seqs.data(), c->seq_off.data(),
        (const u8*)c->names.data(), c->name_off.data(),
        (const u8*)c->quals.data(), c->qual_off.data(), c->n_pairs,
        c->n_singles, chunk_seed, &pre);
}

// --- sharded-index production mode (--shard-index) ---------------------
//
// Split of phase A around the distributed index: (1) seed every read on
// the host (engine_fx_seed_only: syncmers + randstrobes, NO index
// access), (2) the caller batches all strobe hashes through the
// mesh-sharded index (parallel/sharding.py ShardedIndex.find_runs) and
// assembles a RunFeed, (3) engine_chunk_a_fx_runs maps the chunk with
// NAM building fed exclusively from the prefetched runs — the engine
// never touches host index arrays for lookups, which is what makes a
// host-memory-exceeding (whole-genome, multi-chip) index servable.

namespace engine {
struct SeedOnlyResult {
    std::vector<int32_t> counts;
    std::vector<i64> offsets;
    std::vector<u64> hash;
    std::vector<int32_t> start, end;
    std::vector<u8> rev;
};
}  // namespace engine

void* engine_fx_seed_only(void* e, void* c_) {
    auto* eng = (engine::EngineC*)e;
    auto* c = (engine::FxChunk*)c_;
    auto t0 = std::chrono::steady_clock::now();
    const engine::SeedParams& sp = eng->sp;
    i64 n_records = (i64)c->seq_off.size() - 1;
    auto* res = new engine::SeedOnlyResult();
    res->counts.resize(n_records);
    res->offsets.resize(n_records + 1);
    // batched syncmer pre-pass (8-lane AVX-512 lockstep, bit-exact)
    std::vector<engine::RecordView> rv(n_records);
    for (i64 r = 0; r < n_records; ++r) {
        rv[r].seq = (const u8*)c->seqs.data() + c->seq_off[r];
        rv[r].seq_len = c->seq_off[r + 1] - c->seq_off[r];
    }
    std::vector<char> need(n_records, 1);
    engine::SyncPre psync;
    engine::presync_records(rv.data(), n_records, need.data(), sp, psync);
    std::vector<Syncmer> sync_rc;
    std::vector<QueryRandstrobe> qrs;
    for (i64 r = 0; r < n_records; ++r) {
        i64 len = rv[r].seq_len;
        qrs.clear();
        // seeding is case-insensitive (nt4 maps lowercase), so the PE
        // uppercasing chunk_a applies later does not change the strobes
        if (len >= sp.wmax && psync.start[r] >= 0) {
            const Syncmer* sy = psync.flat.data() + psync.start[r];
            i64 nsy = psync.count[r];
            if (nsy > 0)
                link_query_both(sy, nsy, len, sp.wmin, sp.wmax, sp.qmask,
                                sp.max_dist, sp.k, sync_rc, qrs);
        }
        res->counts[r] = (int32_t)qrs.size();
        res->offsets[r] = (i64)res->hash.size();
        for (const auto& q : qrs) {
            res->hash.push_back(q.hash);
            res->start.push_back(q.start);
            res->end.push_back(q.end);
            res->rev.push_back(q.is_reverse ? 1 : 0);
        }
    }
    res->offsets[n_records] = (i64)res->hash.size();
    eng->t_seed_nam +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
    return res;
}

i64 seedonly_total(void* h) {
    return (i64)((engine::SeedOnlyResult*)h)->hash.size();
}

void seedonly_copy(void* h, int32_t* counts, i64* offsets, u64* hash,
                   int32_t* start, int32_t* end, u8* rev) {
    auto* r = (engine::SeedOnlyResult*)h;
    std::memcpy(counts, r->counts.data(), r->counts.size() * sizeof(int32_t));
    std::memcpy(offsets, r->offsets.data(), r->offsets.size() * sizeof(i64));
    if (!r->hash.empty()) {
        std::memcpy(hash, r->hash.data(), r->hash.size() * sizeof(u64));
        std::memcpy(start, r->start.data(), r->start.size() * sizeof(int32_t));
        std::memcpy(end, r->end.data(), r->end.size() * sizeof(int32_t));
        std::memcpy(rev, r->rev.data(), r->rev.size() * sizeof(u8));
    }
}

void seedonly_free(void* h) { delete (engine::SeedOnlyResult*)h; }

void* engine_chunk_a_fx_runs(void* e, void* c_, u64 chunk_seed,
                             const int32_t* counts, const i64* offsets,
                             const u64* hashes, const int32_t* starts,
                             const int32_t* ends, const u8* is_rev,
                             const i64* count, const u8* filtered,
                             const i64* run_off, const u32* run_pos,
                             const u32* run_packed, const i64* resc_off,
                             const u32* resc_pos, const u32* resc_packed) {
    auto* c = (engine::FxChunk*)c_;
    engine::RunFeed rf;
    rf.counts = counts;
    rf.offsets = offsets;
    rf.hashes = hashes;
    rf.starts = starts;
    rf.ends = ends;
    rf.is_rev = is_rev;
    rf.count = count;
    rf.filtered = filtered;
    rf.run_off = run_off;
    rf.run_pos = run_pos;
    rf.run_packed = run_packed;
    rf.resc_off = resc_off;
    rf.resc_pos = resc_pos;
    rf.resc_packed = resc_packed;
    return engine_chunk_a_impl(
        e, (const u8*)c->seqs.data(), c->seq_off.data(),
        (const u8*)c->names.data(), c->name_off.data(),
        (const u8*)c->quals.data(), c->qual_off.data(), c->n_pairs,
        c->n_singles, chunk_seed, nullptr, &rf);
}

}  // extern "C"
