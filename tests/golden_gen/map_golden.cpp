// Golden end-to-end mapper: drives the REFERENCE's monolithic CPU mapping
// path (align_SE_read / align_PE_read from /root/reference/src/aln.cpp,
// which never touches the GPU) over a FASTA + FASTQ input and prints the
// SAM or PAF records the reference produces. Used by tests/test_concordance.py
// to diff full outputs against this framework's monolithic Python port.
//
// Chunking/RNG discipline matches the framework's runner: the minstd
// engine is re-seeded with the chunk index every <chunk_size> records
// (the reference's async workers do the same, src/pc.cpp:583,706).
//
// usage: map_golden <ref.fa> <reads1.fq> <reads2.fq|-> <chunk_size>
//                    <sam|paf|eqx|details|secondary> [read_length=150]
// read_length selects the reference's own index-parameter profile row
// (src/indexparameters.cpp:37-45) so every (k,s,l,u) profile can be
// golden-tested, not just the r=150 default.

#include <cstdio>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "aln.hpp"
#include "aligner.hpp"
#include "revcomp.hpp"
#include "index.hpp"
#include "indexparameters.hpp"
#include "refs.hpp"
#include "sam.hpp"

// The reference's async-PE gather/store helpers (inline in src/pc.cpp,
// extracted verbatim at build time by build.sh — pc.cpp itself cannot be
// compiled: RabbitFX + CUDA dependencies).
#include "pc_part2.inc"

// The reference's interleaved pairing rules (same_name +
// distribute_interleaved, src/pc.cpp:23-72), extracted the same way.
#include <optional>
#include "pc_interleave.inc"

static bool read_fastq(std::istream& in, klibpp::KSeq& rec) {
    std::string header, seq, plus, qual;
    if (!std::getline(in, header)) return false;
    if (!std::getline(in, seq)) return false;
    if (!std::getline(in, plus)) return false;
    std::getline(in, qual);
    auto strip = [](std::string& s) {
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    };
    strip(header);
    strip(seq);
    strip(qual);
    size_t sp = header.find_first_of(" \t");
    rec.name = header.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
    rec.comment = sp == std::string::npos ? "" : header.substr(sp + 1);
    rec.seq = seq;
    rec.qual = qual;
    return true;
}

int main(int argc, char** argv) {
    if (argc < 6) {
        fprintf(stderr, "usage: %s ref.fa r1.fq r2.fq|- chunk_size mode\n", argv[0]);
        return 2;
    }
    std::string ref_path = argv[1], r1_path = argv[2], r2_path = argv[3];
    int chunk_size = atoi(argv[4]);
    std::string mode = argv[5];
    bool paired = r2_path != "-";

    int read_len = argc > 6 ? atoi(argv[6]) : 150;

    // argv[7..]: key=value overrides for the parameter-space fuzz
    // (tests/test_param_fuzz.py): alignment scores (A,B,O,E,L), index
    // profile overrides (k,s,l,u,c,msl), index fraction (f), and
    // mapping knobs (S=dropoff, M=max_tries, R=rescue_level,
    // N=max_secondary) — the space the reference CLI claims to support
    // (/root/reference/src/cmdline.cpp:9-158)
    int pA = 2, pB = 8, pO = 12, pE = 1, pL = 10;
    int pk = IndexParameters::DEFAULT, ps = IndexParameters::DEFAULT,
        pl = IndexParameters::DEFAULT, pu = IndexParameters::DEFAULT,
        pc = IndexParameters::DEFAULT, pmsl = IndexParameters::DEFAULT;
    float pf = 0.0002f, pS = 0.5f;
    int pM = 20, pR = 2, pN = 0;
    for (int i = 7; i < argc; ++i) {
        std::string kv = argv[i];
        size_t eq = kv.find('=');
        if (eq == std::string::npos) continue;
        std::string key = kv.substr(0, eq);
        std::string val = kv.substr(eq + 1);
        if (key == "A") pA = atoi(val.c_str());
        else if (key == "B") pB = atoi(val.c_str());
        else if (key == "O") pO = atoi(val.c_str());
        else if (key == "E") pE = atoi(val.c_str());
        else if (key == "L") pL = atoi(val.c_str());
        else if (key == "k") pk = atoi(val.c_str());
        else if (key == "s") ps = atoi(val.c_str());
        else if (key == "l") pl = atoi(val.c_str());
        else if (key == "u") pu = atoi(val.c_str());
        else if (key == "c") pc = atoi(val.c_str());
        else if (key == "msl") pmsl = atoi(val.c_str());
        else if (key == "f") pf = (float)atof(val.c_str());
        else if (key == "S") pS = (float)atof(val.c_str());
        else if (key == "M") pM = atoi(val.c_str());
        else if (key == "R") pR = atoi(val.c_str());
        else if (key == "N") pN = atoi(val.c_str());
    }

    References references = References::from_fasta(ref_path);
    IndexParameters ip = IndexParameters::from_read_length(
        read_len, pk, ps, pl, pu, pc, pmsl);
    StrobemerIndex index(references, ip);
    index.populate(pf, 1);

    MappingParameters mp;
    mp.r = read_len;
    mp.dropoff_threshold = pS;
    mp.max_tries = pM;
    mp.rescue_level = pR;
    mp.max_secondary = pN;
    mp.rescue_cutoff = mp.rescue_level < 100
                           ? mp.rescue_level * index.filter_cutoff
                           : 1000;
    if (mode == "paf") mp.is_sam_out = false;
    if (mode == "eqx") mp.cigar_ops = CigarOps::EQX;
    if (mode == "details") mp.details = true;
    if (mode == "secondary") mp.max_secondary = 3;

    AlignmentParameters ap{pA, pB, pO, pE, pL};
    Aligner aligner(ap);
    InsertSizeDistribution isize;
    AlignmentStatistics stats;
    std::minstd_rand engine;

    std::string sam_out;
    Sam sam(sam_out, references, mp.cigar_ops, "", mp.output_unmapped,
            mp.details);
    std::string outstring;  // PAF

    std::ifstream f1(r1_path);
    std::ifstream f2;
    if (paired) f2.open(r2_path);

    klibpp::KSeq rec1, rec2;
    long n_in_chunk = 0;
    long chunk_index = 0;
    engine.seed(0);

    if (mode == "split" && !paired) {
        // the reference's SPLIT production path (align_SE_read_part ->
        // gapped fill -> align_SE_read_last), with the GPU replaced by the
        // CPU aligner exactly as the gasal_fail fallback does
        // (src/pc.cpp:1020-1029); phase ordering matches the async workers:
        // all parts of a chunk first, then the fill, then all lasts.
        std::vector<klibpp::KSeq> records;
        std::vector<AlignTmpRes> tmps;
        auto flush_chunk = [&]() {
            if (records.empty()) return;
            for (size_t i = 0; i < records.size(); ++i) {
                Read rd(records[i].seq);
                AlignTmpRes& tmp = tmps[i];
                for (size_t j = 0; j < tmp.todo_nams.size(); ++j) {
                    if (tmp.done_align[j]) continue;
                    // gather exactly like part2_extend_seed_get_str
                    Nam nam = tmp.todo_nams[j];
                    const std::string query = nam.is_rc ? rd.rc : rd.seq;
                    const std::string& refseq =
                        references.sequences[nam.ref_id];
                    const auto projected_ref_start =
                        std::max(0, nam.ref_start - nam.query_start);
                    const int diff =
                        std::abs(nam.ref_span() - nam.query_span());
                    const int ext_left = std::min(50, projected_ref_start);
                    const int rstart = projected_ref_start - ext_left;
                    const int ext_right = std::min(
                        std::size_t(50), refseq.size() - nam.ref_end);
                    const auto segm_size =
                        rd.size() + diff + ext_left + ext_right;
                    const auto ref_segm = refseq.substr(rstart, segm_size);
                    auto info = aligner.align(query, ref_segm);
                    // store exactly like part2_extend_seed_store_res
                    int softclipped =
                        info.query_start + (query.size() - info.query_end);
                    Alignment& alignment = tmp.align_res[j];
                    alignment.cigar = std::move(info.cigar);
                    alignment.edit_distance = info.edit_distance;
                    alignment.global_ed = info.edit_distance + softclipped;
                    alignment.score = info.sw_score;
                    alignment.ref_start = rstart + info.ref_start;
                    alignment.length = info.ref_span();
                    alignment.is_rc = nam.is_rc;
                    alignment.is_unaligned = false;
                    alignment.ref_id = nam.ref_id;
                    alignment.gapped = true;
                }
            }
            for (size_t i = 0; i < records.size(); ++i) {
                align_SE_read_last(tmps[i], records[i], sam, outstring, stats,
                                   aligner, mp, ip, references, index, engine);
            }
            records.clear();
            tmps.clear();
        };
        while (read_fastq(f1, rec1)) {
            if (n_in_chunk == 0) engine.seed((unsigned)chunk_index);
            records.push_back(rec1);
            tmps.emplace_back();
            align_SE_read_part(tmps.back(), records.back(), stats, aligner,
                               mp, ip, references, index, engine);
            n_in_chunk++;
            if (n_in_chunk >= chunk_size) {
                flush_chunk();
                n_in_chunk = 0;
                chunk_index++;
            }
        }
        flush_chunk();
        fwrite(sam_out.data(), 1, sam_out.size(), stdout);
        return 0;
    }

    if (mode == "pe_split" && paired) {
        // The reference's PRODUCTION async-PE path, sequentialized
        // (perform_task_async_pe_fx, src/pc.cpp:1100-1519). Key
        // semantics replicated exactly:
        //  * the insert-size estimator is created FRESH for every chunk
        //    (pc.cpp:1343 `InsertSizeDistribution isize_est;` inside the
        //    loop; the `pre_isize_est.* = isize_est.*` copy at :1505-1510
        //    discards align_PE_read_last's updates), so phase A of each
        //    chunk starts from the default (mu 300, sigma 100) and
        //    accumulates only within the chunk;
        //  * rescue-mate windows for the GPU jobs are computed at GATHER
        //    time with the END-of-phase-A mu/sigma (pc.cpp:1228-1229
        //    reads pre_isize_est after the whole chunk's
        //    align_PE_read_part calls), not with the running values each
        //    read saw at decision time — the gate (short window /
        //    has_shared_substring, aln.cpp:1015-1078) used the running
        //    values, so gate and job windows can disagree;
        //  * store (E2) recomputes with the same end-of-phase-A values
        //    (pre_isize_est is not touched between gather and store:
        //    phase A of chunk i+1 updates its own fresh estimator);
        //  * the GPU is replaced by the CPU aligner exactly as the
        //    gasal_fail fallback does (pc.cpp:1405-1414).
        // The interleaved rotation (phase A of i+1 between E1(i) and
        // E2(i)) therefore has NO effect on output and a sequential
        // per-chunk schedule reproduces the async binary byte for byte.
        std::vector<klibpp::KSeq> recs1, recs2;
        std::vector<AlignTmpRes> tmps;
        InsertSizeDistribution chunk_isize;
        auto flush_chunk = [&]() {
            if (recs1.empty()) return;
            const float mu = chunk_isize.mu;
            const float sigma = chunk_isize.sigma;
            // E1 gather + CPU fill + E2 store, fused per job (mu/sigma
            // are identical at gather and store, see above)
            for (size_t i = 0; i < recs1.size(); ++i) {
                auto record1 = recs1[i];
                auto record2 = recs2[i];
                to_uppercase(record1.seq);
                to_uppercase(record2.seq);
                Read read1(record1.seq);
                Read read2(record2.seq);
                auto& tmp = tmps[i];
                std::vector<std::string> todo_querys, todo_refs;
                std::vector<size_t> todo_j;
                size_t todo_size = tmp.todo_nams.size();
                if (tmp.type == 1 || tmp.type == 2) {
                    for (size_t j = 0; j < todo_size; j += 2) {
                        if (!tmp.done_align[j]) {
                            part2_extend_seed_get_str(
                                todo_querys, todo_refs, tmp, j, read1, read2,
                                references, aligner);
                            todo_j.push_back(j);
                        }
                        if (!tmp.done_align[j + 1]) {
                            part2_rescue_mate_get_str(
                                todo_querys, todo_refs, tmp, j + 1, read1,
                                read2, references, aligner, mu, sigma);
                            todo_j.push_back(j + 1);
                        }
                    }
                } else if (tmp.type == 3) {
                    for (size_t j = 0; j < 2; ++j) {
                        if (!tmp.done_align[j]) {
                            part2_extend_seed_get_str(
                                todo_querys, todo_refs, tmp, j, read1, read2,
                                references, aligner);
                            todo_j.push_back(j);
                        }
                    }
                } else if (tmp.type == 4) {
                    for (size_t j = 0; j < todo_size; ++j) {
                        if (!tmp.done_align[j]) {
                            if (tmp.is_extend_seed[j]) {
                                part2_extend_seed_get_str(
                                    todo_querys, todo_refs, tmp, j, read1,
                                    read2, references, aligner);
                            } else {
                                part2_rescue_mate_get_str(
                                    todo_querys, todo_refs, tmp, j, read1,
                                    read2, references, aligner, mu, sigma);
                            }
                            todo_j.push_back(j);
                        }
                    }
                }
                for (size_t t = 0; t < todo_j.size(); ++t) {
                    auto info = aligner.align(todo_querys[t], todo_refs[t]);
                    size_t j = todo_j[t];
                    if (tmp.is_extend_seed[j]) {
                        part2_extend_seed_store_res(tmp, j, read1, read2,
                                                    references, info);
                    } else {
                        part2_rescue_mate_store_res(tmp, j, read1, read2,
                                                    references, info, mu,
                                                    sigma);
                    }
                }
            }
            for (size_t i = 0; i < recs1.size(); ++i) {
                auto record1 = recs1[i];
                auto record2 = recs2[i];
                to_uppercase(record1.seq);
                to_uppercase(record2.seq);
                align_PE_read_last(tmps[i], record1, record2, sam, outstring,
                                   stats, chunk_isize, aligner, mp, ip,
                                   references, index, engine);
            }
            recs1.clear();
            recs2.clear();
            tmps.clear();
        };
        while (read_fastq(f1, rec1)) {
            if (!read_fastq(f2, rec2)) {
                fprintf(stderr, "r2 shorter than r1\n");
                return 1;
            }
            if (n_in_chunk == 0) {
                engine.seed((unsigned)chunk_index);
                chunk_isize = InsertSizeDistribution();  // per-chunk reset
            }
            recs1.push_back(rec1);
            recs2.push_back(rec2);
            auto record1 = rec1;
            auto record2 = rec2;
            to_uppercase(record1.seq);
            to_uppercase(record2.seq);
            tmps.emplace_back();
            align_PE_read_part(tmps.back(), record1, record2, stats,
                               chunk_isize, aligner, mp, ip, references,
                               index, engine);
            n_in_chunk += 2;
            if (n_in_chunk >= chunk_size) {
                flush_chunk();
                n_in_chunk = 0;
                chunk_index++;
            }
        }
        flush_chunk();
        fwrite(sam_out.data(), 1, sam_out.size(), stdout);
        return 0;
    }

    if (mode == "ilv") {
        // Interleaved input driven by the REFERENCE's own batching: a
        // chunk is EXACTLY 2*chunk_size raw records (pc.cpp:90-92) and
        // distribute_interleaved (compiled verbatim above) pairs
        // consecutive same-name records batch-locally; per chunk the
        // worker maps pairs first (uppercased) then singles
        // (pc.cpp:408-421), RNG seeded with the chunk index like the
        // async workers (pc.cpp:583,706).
        std::optional<klibpp::KSeq> lookahead1;
        bool eof = false;
        while (!eof) {
            std::vector<klibpp::KSeq> raw;
            for (int i = 0; i < 2 * chunk_size; ++i) {
                if (!read_fastq(f1, rec1)) {
                    eof = true;
                    break;
                }
                raw.push_back(rec1);
            }
            std::vector<klibpp::KSeq> recs1, recs2, recs3;
            distribute_interleaved(raw, recs1, recs2, recs3, lookahead1);
            if (recs1.empty() && recs3.empty()) break;
            engine.seed((unsigned)chunk_index);
            for (size_t i = 0; i < recs1.size(); ++i) {
                auto r1c = recs1[i];
                auto r2c = recs2[i];
                to_uppercase(r1c.seq);
                to_uppercase(r2c.seq);
                align_PE_read(r1c, r2c, sam, outstring, stats, isize,
                              aligner, mp, ip, references, index, engine);
            }
            for (size_t i = 0; i < recs3.size(); ++i) {
                align_SE_read(recs3[i], sam, outstring, stats, aligner, mp,
                              ip, references, index, engine);
            }
            chunk_index++;
        }
        fwrite(sam_out.data(), 1, sam_out.size(), stdout);
        fwrite(outstring.data(), 1, outstring.size(), stdout);
        return 0;
    }

    while (read_fastq(f1, rec1)) {
        if (n_in_chunk == 0) engine.seed((unsigned)chunk_index);
        if (paired) {
            if (!read_fastq(f2, rec2)) {
                fprintf(stderr, "r2 shorter than r1\n");
                return 1;
            }
            to_uppercase(rec1.seq);  // the reference's PE callers do this
            to_uppercase(rec2.seq);  // (src/pc.cpp:410-411)
            align_PE_read(rec1, rec2, sam, outstring, stats, isize, aligner,
                          mp, ip, references, index, engine);
            n_in_chunk += 2;
        } else {
            align_SE_read(rec1, sam, outstring, stats, aligner, mp, ip,
                          references, index, engine);
            n_in_chunk += 1;
        }
        if (n_in_chunk >= chunk_size) {
            n_in_chunk = 0;
            chunk_index++;
        }
    }
    fwrite(sam_out.data(), 1, sam_out.size(), stdout);
    fwrite(outstring.data(), 1, outstring.size(), stdout);
    return 0;
}
