/* Native realignment engine: the exact recursive 8-mer-seeded seed-and-extend
 * aligner of the mismappers filter (behavioral port of
 * arriba_tpu/filters/mismappers.py align()/align_both_strands core), exposed
 * as module-level functions on a singleton engine. The Python filter keeps
 * all orchestration (which reads, which gene sets, min-score math); only the
 * hot recursion runs here. */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "realign.h"

namespace realign_engine {

constexpr int KMER_LENGTH = REALIGN_KMER_LENGTH;

Engine &engine() {
    static Engine instance;
    return instance;
}

static inline uint32_t kmer_code(uint8_t base) {
    switch (base) {
        case 'T': return 0;
        case 'G': return 1;
        case 'C': return 2;
        default: return 3;
    }
}

uint32_t kmer_at(const uint8_t *sequence, Py_ssize_t position) {
    uint32_t value = 0;
    for (int j = 0; j < KMER_LENGTH; ++j)
        value = (value << 2) | kmer_code(sequence[position + j]);
    return value;
}

void append_window_kmers(const uint8_t *data, int64_t start, int64_t end,
                         std::vector<KmerPair> &out) {
    int64_t pos = start;
    if (pos + KMER_LENGTH >= end)
        return;
    constexpr uint32_t mask = (1u << (2 * KMER_LENGTH)) - 1;
    uint32_t value = 0;
    for (int j = 0; j < KMER_LENGTH; ++j)
        value = (value << 2) | kmer_code(data[pos + j]);
    for (;;) {
        if (data[pos] != 'N')
            out.emplace_back(value, (kpos_t)pos);
        ++pos;
        if (pos + KMER_LENGTH >= end)
            break;
        value = ((value << 2) | kmer_code(data[pos + KMER_LENGTH - 1])) & mask;
    }
}

void fill_kmer_bits(const uint8_t *data, int64_t start, int64_t end,
                    std::vector<uint64_t> &bits) {
    if (bits.size() != KMER_BUCKETS / 64)
        bits.assign(KMER_BUCKETS / 64, 0);
    int64_t pos = start;
    if (pos + KMER_LENGTH >= end)
        return;
    constexpr uint32_t mask = (1u << (2 * KMER_LENGTH)) - 1;
    uint32_t value = 0;
    for (int j = 0; j < KMER_LENGTH; ++j)
        value = (value << 2) | kmer_code(data[pos + j]);
    for (;;) {
        bits[value >> 6] |= (uint64_t)1 << (value & 63);
        ++pos;
        if (pos + KMER_LENGTH >= end)
            break;
        value = ((value << 2) | kmer_code(data[pos + KMER_LENGTH - 1])) & mask;
    }
}

void set_contig_raw(int cid, const uint8_t *data, Py_ssize_t length) {
    Contig &contig = engine().contigs[cid];
    Py_XDECREF(contig.owner);
    contig.owner = nullptr;
    contig.data = data;
    contig.length = length;
    contig.pending.clear();
    contig.kmer_offsets.clear();
    contig.kmer_positions.clear();
}

/* multithreaded finalize over the contig's pending pairs plus any number of
 * extra span buffers (per-worker fill outputs consumed in place — no merge
 * copy). Every bucket ends sorted + deduplicated, so the result is
 * byte-identical for any span order, partition, or thread count. */
void finalize_kmer_index_spans(
    Contig &contig,
    const std::vector<const std::vector<KmerPair>*> &extra,
    int threads) {
    typedef KmerPair Pair;
    if (!contig.kmer_offsets.empty()) {
        /* incremental add after a finalize: fold the built index back into
         * the pending pairs so nothing is lost */
        for (uint32_t k = 0; k < KMER_BUCKETS; ++k)
            for (int64_t i = contig.kmer_offsets[k];
                 i < contig.kmer_offsets[k + 1]; ++i)
                contig.pending.emplace_back(k, contig.kmer_positions[i]);
        contig.kmer_offsets.clear();
        contig.kmer_positions.clear();
    }
    std::vector<std::pair<const Pair *, size_t>> spans;
    if (!contig.pending.empty())
        spans.emplace_back(contig.pending.data(), contig.pending.size());
    size_t total = contig.pending.size();
    for (const auto *buffer : extra)
        if (buffer != nullptr && !buffer->empty()) {
            spans.emplace_back(buffer->data(), buffer->size());
            total += buffer->size();
        }
    int W = std::max(1, std::min(threads, (int)((total >> 18) + 1)));

    /* per-worker item ranges over the concatenated spans */
    auto for_range = [&](size_t lo, size_t hi, auto &&body) {
        size_t at = 0;
        for (const auto &span : spans) {
            size_t span_lo = at, span_hi = at + span.second;
            at = span_hi;
            if (span_hi <= lo) continue;
            if (span_lo >= hi) break;
            size_t from = std::max(lo, span_lo) - span_lo;
            size_t to = std::min(hi, span_hi) - span_lo;
            for (size_t i = from; i < to; ++i) body(span.first[i]);
        }
    };

    /* 1. per-worker bucket counts */
    std::vector<std::vector<int64_t>> wcounts(
        W, std::vector<int64_t>(KMER_BUCKETS, 0));
    {
        std::vector<std::thread> pool;
        for (int w = 0; w < W; ++w)
            pool.emplace_back([&, w]() {
                for_range((size_t)w * total / W, (size_t)(w + 1) * total / W,
                          [&](const Pair &entry) {
                              wcounts[w][entry.first] += 1;
                          });
            });
        for (std::thread &worker : pool) worker.join();
    }
    /* global bucket starts + per-worker write cursors */
    std::vector<int64_t> starts(KMER_BUCKETS + 1, 0);
    for (uint32_t k = 0; k < KMER_BUCKETS; ++k) {
        int64_t count = 0;
        for (int w = 0; w < W; ++w) {
            int64_t mine = wcounts[w][k];
            wcounts[w][k] = starts[k] + count;  /* becomes the write cursor */
            count += mine;
        }
        starts[k + 1] = starts[k] + count;
    }
    /* 2. scatter into bucket-grouped raw positions */
    std::vector<kpos_t> raw(total);
    {
        std::vector<std::thread> pool;
        for (int w = 0; w < W; ++w)
            pool.emplace_back([&, w]() {
                std::vector<int64_t> &cursor = wcounts[w];
                for_range((size_t)w * total / W, (size_t)(w + 1) * total / W,
                          [&](const Pair &entry) {
                              raw[cursor[entry.first]++] = entry.second;
                          });
            });
        for (std::thread &worker : pool) worker.join();
    }
    contig.pending.clear();
    contig.pending.shrink_to_fit();

    /* bucket ranges balanced by item count for the sort/compact phases */
    std::vector<uint32_t> cut(W + 1, 0);
    for (int w = 1; w < W; ++w) {
        int64_t want = (int64_t)((size_t)w * total / W);
        cut[w] = (uint32_t)(std::lower_bound(starts.begin(),
                                             starts.begin() + KMER_BUCKETS,
                                             want)
                            - starts.begin());
        if (cut[w] < cut[w - 1]) cut[w] = cut[w - 1];
    }
    cut[W] = KMER_BUCKETS;

    /* 3. sort + dedupe each bucket in place (gaps remain), record sizes */
    std::vector<int64_t> unique_count(KMER_BUCKETS, 0);
    {
        std::vector<std::thread> pool;
        for (int w = 0; w < W; ++w)
            pool.emplace_back([&, w]() {
                for (uint32_t k = cut[w]; k < cut[w + 1]; ++k) {
                    int64_t lo = starts[k], hi = starts[k + 1];
                    if (lo >= hi) continue;
                    std::sort(raw.begin() + lo, raw.begin() + hi);
                    int64_t write = lo;
                    int64_t previous = (int64_t)raw[lo] - 1;
                    for (int64_t i = lo; i < hi; ++i)
                        if (raw[i] != previous) {
                            previous = raw[i];
                            raw[write++] = raw[i];
                        }
                    unique_count[k] = write - lo;
                }
            });
        for (std::thread &worker : pool) worker.join();
    }
    /* 4. final offsets + parallel compaction into a fresh array (in-place
     * left-shifts would alias across worker boundaries) */
    contig.kmer_offsets.assign(KMER_BUCKETS + 1, 0);
    for (uint32_t k = 0; k < KMER_BUCKETS; ++k)
        contig.kmer_offsets[k + 1] = contig.kmer_offsets[k] + unique_count[k];
    std::vector<kpos_t> out((size_t)contig.kmer_offsets[KMER_BUCKETS]);
    {
        std::vector<std::thread> pool;
        for (int w = 0; w < W; ++w)
            pool.emplace_back([&, w]() {
                for (uint32_t k = cut[w]; k < cut[w + 1]; ++k) {
                    int64_t n = unique_count[k];
                    if (n > 0)
                        memcpy(out.data() + contig.kmer_offsets[k],
                               raw.data() + starts[k],
                               (size_t)n * sizeof(kpos_t));
                }
            });
        for (std::thread &worker : pool) worker.join();
    }
    contig.kmer_positions = std::move(out);
}

void finalize_kmer_index(Contig &contig) {
    if (contig.pending.empty() && !contig.kmer_offsets.empty())
        return;  /* already finalized; nothing new to fold in */
    finalize_kmer_index_spans(contig, {}, 1);
}

void reset_engine() {
    for (auto &entry : engine().contigs) {
        if (entry.second.view_held) PyBuffer_Release(&entry.second.view);
        Py_XDECREF(entry.second.owner);
    }
    engine().contigs.clear();
    engine().splice_sites.clear();
    engine().gene_kmer_bits.clear();
}

// filter_homologs.cpp:13-63 core 8+8-mer identity scan
bool is_homolog_core(const uint8_t *small_seq, Py_ssize_t small_size,
                     int small_contig, int64_t small_start, int64_t small_end,
                     int big_contig, int64_t big_start, int64_t big_end,
                     int64_t small_length, double max_identity_fraction) {
    auto found = engine().contigs.find(big_contig);
    if (found == engine().contigs.end())
        return false;
    const Contig &contig = found->second;
    const int k = KMER_LENGTH;
    const int ext = 8;

    long long matching_kmers = 0;
    double threshold = (double)small_length * max_identity_fraction;
    for (Py_ssize_t pos = 0; pos + 2 * k < small_size; pos += k) {
        if (matching_kmers * k + (double)(small_size - pos) < threshold)
            return false;
        if (contig.kmer_offsets.empty())
            continue;
        uint32_t key = kmer_at(small_seq, pos);
        const kpos_t *positions_begin =
            contig.kmer_positions.data() + contig.kmer_offsets[key];
        const kpos_t *positions_end =
            contig.kmer_positions.data() + contig.kmer_offsets[key + 1];
        for (const kpos_t *it = std::lower_bound(positions_begin,
                                                 positions_end,
                                                 (kpos_t)big_start);
             it != positions_end && *it <= big_end; ++it) {
            int64_t hit = *it;
            if (small_contig == big_contig && hit >= small_start && hit <= small_end)
                continue;
            /* strncmp semantics with NUL padding at sequence ends */
            bool equal = true;
            for (int j = 0; j < ext; ++j) {
                uint8_t big_char = (hit + k + j < contig.length)
                                   ? contig.data[hit + k + j] : 0;
                uint8_t small_char = (pos + k + j < small_size)
                                     ? (uint8_t)small_seq[pos + k + j] : 0;
                if (big_char != small_char) { equal = false; break; }
                if (big_char == 0) break;  /* both ended */
            }
            if (equal) {
                matching_kmers += 1;
                if ((double)(matching_kmers * k) >= threshold)
                    return true;
                break;
            }
        }
    }
    return false;
}

/* the recursive seed-and-extend (filter_mismappers.cpp:86-187 semantics as
 * re-expressed in arriba_tpu/filters/mismappers.py) */
bool align_recursive(int score, const uint8_t *read, Py_ssize_t read_length,
                     Py_ssize_t read_pos, const Contig &contig,
                     int64_t gene_pos, int64_t gene_start, int64_t gene_end,
                     const std::vector<int64_t> &splice_sites, int min_score,
                     int max_deletions, const uint64_t *kmer_bits) {
    int skipped_bases = 0;

    /* rolling 2-bit window: one base decode per outer iteration instead of
     * KMER_LENGTH (the loop advances read_pos by exactly 1) */
    constexpr uint32_t roll_mask = (1u << (2 * KMER_LENGTH)) - 1;
    uint32_t rolling = 0;
    bool rolling_valid = false;

    while (read_pos + KMER_LENGTH < read_length &&
           read_pos + min_score <= read_length + score + 2 * KMER_LENGTH) {

        if (!contig.kmer_offsets.empty()) {
            if (rolling_valid)
                rolling = ((rolling << 2)
                           | kmer_code(read[read_pos + KMER_LENGTH - 1]))
                          & roll_mask;
            else {
                rolling = kmer_at(read, read_pos);
                rolling_valid = true;
            }
            uint32_t key = rolling;
            if (kmer_bits != nullptr
                && !((kmer_bits[key >> 6] >> (key & 63)) & 1)) {
                /* the gene's padded window provably contains no copy of
                 * this 8-mer: the bucket search cannot hit */
                read_pos += 1;
                score -= 1;
                skipped_bases += 1;
                continue;
            }
            const kpos_t *positions_begin =
                contig.kmer_positions.data() + contig.kmer_offsets[key];
            const kpos_t *positions_end =
                contig.kmer_positions.data() + contig.kmer_offsets[key + 1];
            /* the bucket is cold (48 MB of positions, random kmer): issue
             * all its cache lines at once so the binary search's probe
             * chain overlaps instead of serializing ~8 DRAM latencies */
            if (positions_end - positions_begin <= 1024)
                for (const kpos_t *p = positions_begin; p < positions_end;
                     p += 16)
                    __builtin_prefetch(p);
            for (const kpos_t *it = std::lower_bound(
                     positions_begin, positions_end,
                     (kpos_t)std::min(gene_pos, (int64_t)INT32_MAX));
                 it != positions_end && *it < gene_end; ++it) {
                int64_t kmer_hit = *it;

                int extended_score = score + KMER_LENGTH;
                if (read_pos == skipped_bases)
                    extended_score += skipped_bases;  /* free leading skips */
                if (extended_score >= min_score)
                    return true;

                /* extend locally to the left */
                {
                    Py_ssize_t extended_read_pos = read_pos - 1;
                    int64_t extended_gene_pos = kmer_hit - 1;
                    int mismatch_count = 0;
                    while (extended_read_pos >= read_pos - skipped_bases &&
                           extended_gene_pos >= gene_start) {
                        if (read[extended_read_pos] == contig.data[extended_gene_pos]) {
                            extended_score += (read_pos == skipped_bases) ? 1 : 2;
                            if (extended_score >= min_score)
                                return true;
                        } else {
                            if (++mismatch_count > 1)
                                break;
                        }
                        extended_read_pos -= 1;
                        extended_gene_pos -= 1;
                    }
                }

                /* extend locally to the right */
                Py_ssize_t extended_read_pos = read_pos + KMER_LENGTH;
                int64_t extended_gene_pos = kmer_hit + KMER_LENGTH;
                int mismatch_count = 0;
                int consecutive_mismatches = 0;
                size_t splice_idx = std::lower_bound(splice_sites.begin(),
                                                     splice_sites.end(),
                                                     extended_gene_pos - 1)
                                    - splice_sites.begin();
                while (extended_read_pos < read_length && extended_gene_pos <= gene_end) {
                    if (splice_idx < splice_sites.size()) {
                        if (extended_gene_pos - 1 > splice_sites[splice_idx])
                            splice_idx += 1;
                        if (splice_idx < splice_sites.size() &&
                            extended_gene_pos - 1 == splice_sites[splice_idx]) {
                            if (align_recursive(extended_score, read, read_length,
                                                extended_read_pos, contig,
                                                extended_gene_pos, gene_start,
                                                gene_end, splice_sites, min_score,
                                                max_deletions, kmer_bits))
                                return true;
                        }
                    }

                    if (read[extended_read_pos] == contig.data[extended_gene_pos]) {
                        extended_score += 1;
                        if (extended_score >= min_score)
                            return true;
                        consecutive_mismatches = 0;
                    } else {
                        mismatch_count += 1;
                        if (mismatch_count == 1) {
                            if (max_deletions > 0 && read_length >= 30 &&
                                align_recursive(extended_score, read, read_length,
                                                extended_read_pos, contig,
                                                extended_gene_pos, gene_start,
                                                gene_end, splice_sites, min_score,
                                                max_deletions - 1, kmer_bits))
                                return true;
                        }
                        extended_score -= 1;
                        consecutive_mismatches += 1;
                        if (consecutive_mismatches >= 4)
                            break;
                    }
                    extended_read_pos += 1;
                    extended_gene_pos += 1;
                }
            }
        }

        read_pos += 1;
        score -= 1;
        skipped_bases += 1;
    }
    return false;
}

}  // namespace realign_engine

using realign_engine::engine;

PyObject *realign_reset(PyObject *, PyObject *) {
    realign_engine::reset_engine();
    Py_RETURN_NONE;
}

PyObject *realign_set_contig(PyObject *, PyObject *args) {
    int cid;
    PyObject *obj;
    if (!PyArg_ParseTuple(args, "iO", &cid, &obj))
        return nullptr;
    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_SIMPLE) != 0)
        return nullptr;
    realign_engine::Contig &contig = engine().contigs[cid];
    Py_XDECREF(contig.owner);
    if (contig.view_held) PyBuffer_Release(&contig.view);
    /* hold the buffer EXPORT (not just an owner reference) for the
     * engine's lifetime: an active export pins resizable exporters
     * (bytearray) in place; released in reset_engine */
    contig.owner = obj;
    Py_INCREF(obj);
    contig.view = view;
    contig.view_held = true;
    contig.data = (const uint8_t *)view.buf;
    contig.length = view.len;
    Py_RETURN_NONE;
}

PyObject *realign_add_kmers(PyObject *, PyObject *args) {
    int cid;
    long long start, end;  /* index positions in [start, end - KMER_LENGTH) */
    if (!PyArg_ParseTuple(args, "iLL", &cid, &start, &end))
        return nullptr;
    auto found = engine().contigs.find(cid);
    if (found == engine().contigs.end()) {
        PyErr_SetString(PyExc_KeyError, "contig not registered");
        return nullptr;
    }
    realign_engine::Contig &contig = found->second;
    if (start < 0) start = 0;
    if (end > contig.length - 1) end = contig.length - 1;
    for (long long pos = start; pos + realign_engine::KMER_LENGTH < end; ++pos)
        if (contig.data[pos] != 'N')
            contig.pending.emplace_back(
                realign_engine::kmer_at(contig.data, pos), (int64_t)pos);
    Py_RETURN_NONE;
}

PyObject *realign_finalize(PyObject *, PyObject *) {
    for (auto &entry : engine().contigs)
        finalize_kmer_index(entry.second);
    Py_RETURN_NONE;
}

PyObject *realign_set_splice_sites(PyObject *, PyObject *args) {
    long gene;
    const char *data;
    Py_ssize_t size;
    if (!PyArg_ParseTuple(args, "ly#", &gene, &data, &size))
        return nullptr;
    const int64_t *values = (const int64_t *)data;
    engine().splice_sites[gene].assign(values, values + size / 8);
    Py_RETURN_NONE;
}

/* recurrent-k-mer (low-entropy) scan: exact port of the per-read loop of
 * filter_low_entropy.cpp:60-100 with its early exit, batched over rows */

/* exact reference threshold types (filter_low_entropy.cpp:67-69): float32
 * product/quotient, +0.5 in double, truncation into unsigned; negative
 * (inverted) windows convert to a huge unsigned value and never filter */
static int64_t kmer_scan_threshold(int64_t segment_length, double kmer_content,
                                   int kmer_length) {
    if (segment_length < 0)
        return (int64_t)1 << 30;
    double value = (double)((float)((float)segment_length
                                    * (float)kmer_content)
                            / (float)kmer_length) + 0.5;
    return (int64_t)value;
}
/* CSR variant of low_entropy_scan: raw ASCII sequences (concatenated blob +
 * int64 offsets) instead of a padded code matrix; the T/G/C/other -> 0/1/2/3
 * mapping of filter_low_entropy.cpp happens inline. */
PyObject *low_entropy_scan_flat(PyObject *, PyObject *args) {
    Py_buffer seq_blob, seq_offsets, a1s, a1e, a2s, a2e, result;
    int kmer_length;
    double kmer_content;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*w*di", &seq_blob, &seq_offsets,
                          &a1s, &a1e, &a2s, &a2e, &result, &kmer_content,
                          &kmer_length))
        return nullptr;
    const uint8_t *blob = (const uint8_t *)seq_blob.buf;
    const int64_t *offsets = (const int64_t *)seq_offsets.buf;
    const int n = (int)(seq_offsets.len / 8) - 1;
    const int32_t *a1s_data = (const int32_t *)a1s.buf;
    const int32_t *a1e_data = (const int32_t *)a1e.buf;
    const int32_t *a2s_data = (const int32_t *)a2s.buf;
    const int32_t *a2e_data = (const int32_t *)a2e.buf;
    uint8_t *result_data = (uint8_t *)result.buf;

    int8_t code_of[256];
    for (int i = 0; i < 256; ++i) code_of[i] = 3;
    code_of['T'] = 0; code_of['G'] = 1; code_of['C'] = 2;

    const int n_kmers = 1 << (2 * kmer_length);
    std::vector<int32_t> kmer_count(n_kmers), count_a1(n_kmers), count_a2(n_kmers);
    std::vector<int32_t> previous_pos(n_kmers);

    for (int row = 0; row < n; ++row) {
        const uint8_t *sequence = blob + offsets[row];
        const int length = (int)(offsets[row + 1] - offsets[row]);
        result_data[row] = 0;
        if (length < kmer_length)
            continue;
        const int64_t max_c = kmer_scan_threshold(length, kmer_content,
                                                  kmer_length);
        const int64_t max_c1 = kmer_scan_threshold(
            (int64_t)a1e_data[row] - a1s_data[row], kmer_content, kmer_length);
        const int64_t max_c2 = kmer_scan_threshold(
            (int64_t)a2e_data[row] - a2s_data[row], kmer_content, kmer_length);
        std::fill(kmer_count.begin(), kmer_count.end(), 0);
        std::fill(count_a1.begin(), count_a1.end(), 0);
        std::fill(count_a2.begin(), count_a2.end(), 0);
        std::fill(previous_pos.begin(), previous_pos.end(), 0);

        for (int pos = 0; pos < length - kmer_length; ++pos) {
            int value = 0;
            for (int j = 0; j < kmer_length; ++j)
                value = (value << 2) | code_of[sequence[pos + j]];
            if (previous_pos[value] <= pos) {
                previous_pos[value] = pos + kmer_length;
                kmer_count[value] += 1;
                if (pos + 1 >= a1s_data[row] && pos < a1e_data[row])
                    count_a1[value] += 1;
                if (pos + 1 >= a2s_data[row] && pos < a2e_data[row])
                    count_a2[value] += 1;
                if (kmer_count[value] >= max_c || count_a1[value] >= max_c1 ||
                    count_a2[value] >= max_c2) {
                    result_data[row] = 1;
                    break;
                }
            }
        }
    }

    PyBuffer_Release(&seq_blob);
    PyBuffer_Release(&seq_offsets);
    PyBuffer_Release(&a1s);
    PyBuffer_Release(&a1e);
    PyBuffer_Release(&a2s);
    PyBuffer_Release(&a2e);
    PyBuffer_Release(&result);
    Py_RETURN_NONE;
}

PyObject *low_entropy_scan(PyObject *, PyObject *args) {
    Py_buffer codes, lengths, a1s, a1e, a2s, a2e, result;
    int n, L, kmer_length;
    double kmer_content;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*w*iidi", &codes, &lengths, &a1s,
                          &a1e, &a2s, &a2e, &result, &n, &L, &kmer_content,
                          &kmer_length))
        return nullptr;
    const uint8_t *codes_data = (const uint8_t *)codes.buf;
    const int32_t *length_data = (const int32_t *)lengths.buf;
    const int32_t *a1s_data = (const int32_t *)a1s.buf;
    const int32_t *a1e_data = (const int32_t *)a1e.buf;
    const int32_t *a2s_data = (const int32_t *)a2s.buf;
    const int32_t *a2e_data = (const int32_t *)a2e.buf;
    uint8_t *result_data = (uint8_t *)result.buf;

    const int n_kmers = 1 << (2 * kmer_length);
    std::vector<int32_t> kmer_count(n_kmers), count_a1(n_kmers), count_a2(n_kmers);
    std::vector<int32_t> previous_pos(n_kmers);

    for (int row = 0; row < n; ++row) {
        const uint8_t *sequence = codes_data + (size_t)row * L;
        const int length = length_data[row];
        result_data[row] = 0;
        if (length < kmer_length)
            continue;
        const int64_t max_c = kmer_scan_threshold(length, kmer_content,
                                                  kmer_length);
        const int64_t max_c1 = kmer_scan_threshold(
            (int64_t)a1e_data[row] - a1s_data[row], kmer_content, kmer_length);
        const int64_t max_c2 = kmer_scan_threshold(
            (int64_t)a2e_data[row] - a2s_data[row], kmer_content, kmer_length);
        std::fill(kmer_count.begin(), kmer_count.end(), 0);
        std::fill(count_a1.begin(), count_a1.end(), 0);
        std::fill(count_a2.begin(), count_a2.end(), 0);
        std::fill(previous_pos.begin(), previous_pos.end(), 0);

        for (int pos = 0; pos < length - kmer_length; ++pos) {
            int value = 0;
            for (int j = 0; j < kmer_length; ++j) {
                int c = sequence[pos + j];
                value = (value << 2) | (c > 3 ? 3 : c);
            }
            if (previous_pos[value] <= pos) {
                previous_pos[value] = pos + kmer_length;
                kmer_count[value] += 1;
                if (pos + 1 >= a1s_data[row] && pos < a1e_data[row])
                    count_a1[value] += 1;
                if (pos + 1 >= a2s_data[row] && pos < a2e_data[row])
                    count_a2[value] += 1;
                if (kmer_count[value] >= max_c || count_a1[value] >= max_c1 ||
                    count_a2[value] >= max_c2) {
                    result_data[row] = 1;
                    break;
                }
            }
        }
    }

    PyBuffer_Release(&codes);
    PyBuffer_Release(&lengths);
    PyBuffer_Release(&a1s);
    PyBuffer_Release(&a1e);
    PyBuffer_Release(&a2s);
    PyBuffer_Release(&a2e);
    PyBuffer_Release(&result);
    Py_RETURN_NONE;
}

/* homology test: count 8+8-mer matches of the small gene inside the big
 * gene (behavioral port of arriba_tpu/filters/homologs.py is_homolog core) */
PyObject *realign_is_homolog(PyObject *, PyObject *args) {
    const char *small_seq;          /* possibly reverse-complemented */
    Py_ssize_t small_size;
    int small_contig, big_contig;
    long long small_start, small_end, big_start, big_end;
    long long small_length;         /* gene length (end - start) */
    double max_identity_fraction;
    if (!PyArg_ParseTuple(args, "y#iLLiLLLd", &small_seq, &small_size,
                          &small_contig, &small_start, &small_end, &big_contig,
                          &big_start, &big_end, &small_length,
                          &max_identity_fraction))
        return nullptr;
    if (realign_engine::is_homolog_core(
            (const uint8_t *)small_seq, small_size, small_contig, small_start,
            small_end, big_contig, big_start, big_end, small_length,
            max_identity_fraction))
        Py_RETURN_TRUE;
    Py_RETURN_FALSE;
}

PyObject *realign_align(PyObject *, PyObject *args) {
    const char *read;
    Py_ssize_t read_length;
    int cid;
    long long gene_start, gene_end;
    long gene;
    int min_score, max_deletions;
    if (!PyArg_ParseTuple(args, "y#iLLlii", &read, &read_length, &cid,
                          &gene_start, &gene_end, &gene, &min_score,
                          &max_deletions))
        return nullptr;
    auto found = engine().contigs.find(cid);
    if (found == engine().contigs.end())
        Py_RETURN_FALSE;
    static const std::vector<int64_t> empty;
    auto splice = engine().splice_sites.find(gene);
    const std::vector<int64_t> &splice_sites =
        (splice == engine().splice_sites.end()) ? empty : splice->second;
    auto bits = engine().gene_kmer_bits.find(gene);
    const uint64_t *kmer_bits =
        (bits != engine().gene_kmer_bits.end()
         && bits->second.start <= gene_start
         && gene_end + realign_engine::REALIGN_KMER_LENGTH <= bits->second.end)
            ? bits->second.bits.data() : nullptr;
    bool result = realign_engine::align_recursive(
        0, (const uint8_t *)read, read_length, 0, found->second, gene_start,
        gene_start, gene_end, splice_sites, min_score, max_deletions,
        kmer_bits);
    if (result)
        Py_RETURN_TRUE;
    Py_RETURN_FALSE;
}
