// Native read-level filter cascade (#1-14) + fragment-length gap collection.
//
// Exact port of arriba_tpu/filters/read_level.py (itself the parity port of
// filter_duplicates.cpp, filter_uninteresting_contigs.cpp,
// filter_viral_contigs.cpp, filter_top_expressed_viral_contigs.cpp,
// filter_low_coverage_viral_contigs.cpp, filter_proximal_read_through.cpp,
// filter_inconsistently_clipped.cpp, filter_homopolymer.cpp,
// filter_small_insert_size.cpp, filter_long_gap.cpp, filter_same_gene.cpp,
// filter_hairpin.cpp, filter_mismatches.cpp, filter_low_entropy.cpp) and of
// the mate-gap collection half of read_stats.cpp:11-92. The Python
// implementations remain the parity reference (ARRIBA_TPU_NO_NATIVE=1 /
// ARRIBA_TPU_NO_NATIVE_CASCADE=1).
//
// Two-phase API because the pipeline computes fragment-length statistics
// between stages 5 and 6 (the hairpin filter needs max_mate_gap):
//   cascade_begin(...)  -> stages 1-5 + mate-gap collection
//   cascade_finish(...) -> stages 6-14, returns filter ids

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <new>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "annotate.h"
#include "cascade.h"
#include "extract.h"

namespace cascade_store {
Cascade &cascade() {
    static Cascade instance;
    return instance;
}

void release_cascade() {
    Cascade &c = cascade();
    // a GIL-released consensus pool may still be reading the store; this
    // can only trigger when a second Python thread tears down mid-batch
    while (c.busy.load(std::memory_order_acquire) != 0) {
    }
    for (Py_buffer &view : c.held) PyBuffer_Release(&view);
    c.~Cascade();
    new (&c) Cascade();
}
}  // namespace cascade_store

using namespace cascade_store;

namespace {

constexpr int CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT_CLIP = 4,
              CHARD_CLIP = 5, CPAD = 6, CEQUAL = 7, CDIFF = 8;
constexpr int COVERAGE_RESOLUTION = 20;
constexpr bool FORWARD = true;
constexpr int MATE1 = 0, MATE2 = 1, SPLIT_READ = 1, SUPPLEMENTARY = 2;

bool stage_enabled(int stage) { return (cascade().params.enabled >> stage) & 1; }
int64_t stage_filter(int stage) { return cascade().params.filter_ids[stage]; }

// ---- shared helpers -------------------------------------------------------

bool genes_intersect(const Mate &a, const Mate &b) {
    // non-empty intersection of two sorted gene arrays
    int64_t i = 0, j = 0;
    while (i < a.n_genes && j < b.n_genes) {
        if (a.genes[i] == b.genes[j]) return true;
        if (a.genes[i] < b.genes[j]) ++i; else ++j;
    }
    return false;
}

void gene_hull(const Mate &mate, const std::vector<int64_t> &gene_start,
               const std::vector<int64_t> &gene_end, int64_t &start, int64_t &end) {
    // annotation.cpp:558-567 get_boundaries_of_biggest_gene
    if (mate.n_genes == 0) { start = -1; end = -1; return; }
    start = gene_start[mate.genes[0]];
    end = gene_end[mate.genes[0]];
    for (int64_t i = 1; i < mate.n_genes; ++i) {
        start = std::min(start, gene_start[mate.genes[i]]);
        end = std::max(end, gene_end[mate.genes[i]]);
    }
}

// ---- stage 1: duplicates (filter_duplicates.cpp:8-55) ---------------------

struct Key4Hash {
    size_t operator()(const std::array<int64_t, 4> &key) const {
        size_t h = 1469598103934665603ull;
        for (int64_t v : key) { h ^= (size_t)v; h *= 1099511628211ull; }
        return h;
    }
};

int64_t filter_duplicates() {
    Cascade &c = cascade();
    int64_t remaining = 0;
    std::unordered_map<std::array<int64_t, 4>, int64_t, Key4Hash> counts;
    counts.reserve(c.fragments.size());
    for (Fragment &fragment : c.fragments) {
        if (fragment.filter != 0) continue;
        if (c.params.external_duplicate_marking) {
            if (fragment.duplicate) fragment.filter = stage_filter(0);
            else remaining += 1;
            continue;
        }
        const Mate &m1 = fragment.mates[MATE1];
        int64_t position1 = (m1.strand == FORWARD) ? m1.start - m1.preclipping()
                                                   : m1.end + m1.postclipping();
        const Mate &m2 = fragment.n_mates == 2 ? fragment.mates[MATE2]
                                               : fragment.mates[SUPPLEMENTARY];
        int64_t position2 = (m2.strand == FORWARD) ? m2.start - m2.preclipping()
                                                   : m2.end + m2.postclipping();
        int64_t contig1 = m1.contig, contig2 = m2.contig;
        if (position1 > position2) {
            std::swap(position1, position2);
            std::swap(contig1, contig2);
        }
        int64_t &count = counts[{contig1, contig2, position1, position2}];
        if (count > 0) fragment.filter = stage_filter(0);
        else remaining += 1;
        count += 1;
    }
    return remaining;
}

// ---- stages 2+3: contig filters ------------------------------------------

int64_t filter_uninteresting_contigs() {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (Fragment &fragment : c.fragments) {
        if (fragment.filter != 0) continue;
        bool all_interesting = true;
        for (int m = 0; m < fragment.n_mates; ++m)
            if (!c.interesting[fragment.mates[m].contig]) { all_interesting = false; break; }
        if (all_interesting) remaining += 1;
        else fragment.filter = stage_filter(1);
    }
    return remaining;
}

int64_t filter_viral_contigs() {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (Fragment &fragment : c.fragments) {
        if (fragment.filter != 0) continue;
        bool any_host = false;
        for (int m = 0; m < fragment.n_mates; ++m)
            if (!c.viral[fragment.mates[m].contig]) { any_host = true; break; }
        if (any_host) remaining += 1;
        else fragment.filter = stage_filter(2);
    }
    return remaining;
}

// ---- stage 4: top expressed viral contigs --------------------------------
// filter_top_expressed_viral_contigs.cpp:23-153

int kmer12(const uint8_t *seq, int64_t pos) {
    int result = 0;
    for (int i = 0; i < 12; ++i) {
        result <<= 2;
        uint8_t base = seq[pos + i];
        if (base == 'T') result += 0;
        else if (base == 'G') result += 1;
        else if (base == 'C') result += 2;
        else result += 3;
    }
    return result;
}

bool related_viral_strains(const uint8_t *v1, int64_t l1, const uint8_t *v2, int64_t l2) {
    const uint8_t *small = v1, *big = v2;
    int64_t small_len = l1, big_len = l2;
    if (l1 > l2) { small = v2; small_len = l2; big = v1; big_len = l1; }
    std::unordered_map<int, uint8_t> small_kmers;
    for (int64_t i = 0; i + 12 <= small_len; ++i)
        small_kmers.emplace(kmer12(small, i), 0);
    int64_t shared = 0;
    int64_t min_shared = (int64_t)small_kmers.size() / 10;
    for (int64_t i = 0; i + 12 <= big_len; ++i) {
        auto found = small_kmers.find(kmer12(big, i));
        if (found != small_kmers.end() && found->second == 0) {
            found->second = 1;
            shared += 1;
            if (shared >= min_shared) return true;
        }
    }
    return false;
}

int64_t filter_top_expressed_viral_contigs() {
    Cascade &c = cascade();
    int64_t n_contigs = (int64_t)c.mapped_viral.size();
    std::vector<float> expression(n_contigs, 0.0f);
    for (int64_t contig = 0; contig < n_contigs; ++contig)
        if (contig < (int64_t)c.assembly.size() && c.assembly[contig] != nullptr
            && c.assembly_len[contig] > 0)
            expression[contig] = (float)((double)c.mapped_viral[contig]
                                         / (double)c.assembly_len[contig]);

    std::vector<int64_t> order(n_contigs);
    for (int64_t i = 0; i < n_contigs; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        if (expression[a] != expression[b]) return expression[a] > expression[b];
        return a > b;
    });

    int64_t corrected_top_count = 0;
    int64_t remaining_top = c.params.top_viral_contigs;
    for (int64_t i = 1; i < (int64_t)order.size()
                        && expression[order[i]] > 0 && remaining_top > 0; ++i) {
        corrected_top_count += 1;
        int64_t a = order[i], b = order[i - 1];
        bool related = a < (int64_t)c.assembly.size() && b < (int64_t)c.assembly.size()
                       && c.assembly[a] != nullptr && c.assembly[b] != nullptr
                       && related_viral_strains(c.assembly[a], c.assembly_len[a],
                                                c.assembly[b], c.assembly_len[b]);
        if (!related) remaining_top -= 1;
    }
    if (corrected_top_count != 0) corrected_top_count -= 1;
    float min_expression_threshold =
        order.empty() ? 0.0f : expression[order[corrected_top_count]];

    const double min_fraction_intergenic = 0.33;
    int64_t top_intergenic = std::min<int64_t>(50, n_contigs);
    top_intergenic = n_contigs - top_intergenic;
    float min_expr_high_intergenic =
        order.empty() ? 0.0f : expression[order[top_intergenic]];

    int64_t n_viral = (int64_t)c.viral.size();
    std::vector<std::unordered_set<int64_t>> integration_sites(n_viral);
    for (Fragment &fragment : c.fragments) {
        const Mate *viral_read = nullptr, *host_read = nullptr;
        const Mate &m1 = fragment.mates[MATE1];
        if (c.viral[m1.contig]) viral_read = &m1;
        else if (c.interesting[m1.contig]) host_read = &m1;
        const Mate &m2 = fragment.n_mates == 3 ? fragment.mates[SUPPLEMENTARY]
                                               : fragment.mates[MATE2];
        if (c.viral[m2.contig]) viral_read = &m2;
        else if (c.interesting[m2.contig]) host_read = &m2;
        if (viral_read != nullptr && host_read != nullptr)
            for (int64_t g = 0; g < host_read->n_genes; ++g)
                integration_sites[viral_read->contig].insert(host_read->genes[g]);
    }

    std::vector<float> fraction_intergenic(n_viral, 0.0f);
    for (int64_t contig = 0; contig < n_viral; ++contig) {
        int64_t intergenic = 0;
        for (int64_t gene : integration_sites[contig])
            if (c.gene_is_dummy[gene]) intergenic += 1;
        int64_t genic = (int64_t)integration_sites[contig].size() - intergenic;
        if (intergenic > 0)
            fraction_intergenic[contig] =
                (float)((double)intergenic / (double)(genic + intergenic));
    }

    int64_t remaining = 0;
    for (Fragment &fragment : c.fragments) {
        if (fragment.filter != 0) continue;
        bool filtered = false;
        for (int m = 0; m < fragment.n_mates; ++m) {
            int64_t contig = fragment.mates[m].contig;
            if (c.viral[contig]) {
                if (expression[contig] == 0 || expression[contig] < min_expression_threshold) {
                    if (fraction_intergenic[contig] < min_fraction_intergenic
                        || expression[contig] == 0
                        || expression[contig] < min_expr_high_intergenic) {
                        fragment.filter = stage_filter(3);
                        filtered = true;
                        break;
                    }
                }
            }
        }
        if (!filtered) remaining += 1;
    }
    return remaining;
}

// ---- stage 5: low coverage viral contigs ---------------------------------
// filter_low_coverage_viral_contigs.cpp:11-51

int64_t filter_low_coverage_viral_contigs() {
    Cascade &c = cascade();
    int64_t n = (int64_t)c.viral.size();
    std::vector<float> windows_sufficient(n, 0.0f);
    std::vector<int64_t> n_windows(n, 0);
    for (int64_t contig = 0; contig < n; ++contig) {
        if (contig >= (int64_t)c.coverage.size() || c.coverage[contig] == nullptr)
            continue;
        int64_t len = c.coverage_len[contig];
        n_windows[contig] = len;
        if (len) {
            double sum = 0;
            for (int64_t i = 0; i < len; ++i) sum += c.coverage[contig][i];
            double avg = sum / (double)len;
            int64_t count = 0;
            for (int64_t i = 0; i < len; ++i)
                if ((double)c.coverage[contig][i] > 0.05 * avg) count += 1;
            windows_sufficient[contig] = (float)count;
        }
    }

    const double min_covered_bases = 100.0;
    int64_t remaining = 0;
    for (Fragment &fragment : c.fragments) {
        if (fragment.filter != 0) continue;
        bool filtered = false;
        for (int m = 0; m < fragment.n_mates; ++m) {
            int64_t contig = fragment.mates[m].contig;
            if (c.viral[contig]) {
                bool insufficient_fraction =
                    n_windows[contig] > 0
                    && (double)windows_sufficient[contig] / (double)n_windows[contig]
                           < c.params.viral_min_covered_fraction;
                if (insufficient_fraction
                    || (double)COVERAGE_RESOLUTION * (double)windows_sufficient[contig]
                           <= min_covered_bases) {
                    fragment.filter = stage_filter(4);
                    filtered = true;
                    break;
                }
            }
        }
        if (!filtered) remaining += 1;
    }
    return remaining;
}

// ---- mate-gap collection (read_stats.cpp:11-92, collection half) ---------

int64_t get_spliced_distance(int64_t contig, int64_t position1, int64_t position2,
                             int64_t gene) {
    // annotation.cpp:570-618 via the annotation engine's exon index
    using annotate_engine::engine;
    if (position1 > position2) std::swap(position1, position2);
    if (contig >= engine().n_contigs)
        return position2 - position1;
    const annotate_engine::ContigIndex &index = engine().exon_index[contig];
    const std::vector<int64_t> &bounds = index.boundaries;
    if (bounds.empty())
        return position2 - position1;
    int64_t n = (int64_t)bounds.size();
    int64_t idx = std::lower_bound(bounds.begin(), bounds.end(), position1)
                  - bounds.begin();
    int64_t distance = 0;
    if (idx < n && bounds[idx] < position2) {
        distance += bounds[idx] - position1;
        position1 = bounds[idx];
    }
    while (idx < n && bounds[idx] < position2) {
        if (bounds[idx] >= position1) {
            int64_t furthest_start = -1, furthest_end = -1, furthest_skip = -1;
            for (int64_t k = index.offsets[idx]; k < index.offsets[idx + 1]; ++k) {
                int64_t e = index.items[k];
                if (engine().exon_gene[e] != gene) continue;
                int64_t next_e = engine().exon_next[e];
                if (next_e >= 0 && engine().exon_start[next_e] <= position2) {
                    int64_t exon_start = std::max(position1, engine().exon_start[e]);
                    int64_t exon_end = std::min(position2, engine().exon_end[e]);
                    int64_t exon_skip = engine().exon_start[next_e] - exon_start + 1;
                    if (furthest_start == -1
                        || (exon_end - exon_start) * furthest_skip
                               < (furthest_end - furthest_start) * exon_skip) {
                        furthest_start = exon_start;
                        furthest_end = exon_end;
                        furthest_skip = exon_skip;
                    }
                }
            }
            if (furthest_start != -1) {
                distance += furthest_end - furthest_start + 1;
                position1 = furthest_start + furthest_skip - 1;
            }
        }
        idx += 1;
    }
    distance += position2 - position1;
    return distance;
}

void collect_mate_gaps(std::vector<int64_t> &gaps, double &read_length_sum,
                       int64_t &read_length_count) {
    Cascade &c = cascade();
    gaps.clear();
    read_length_sum = 0;
    read_length_count = 0;
    for (Fragment &fragment : c.fragments) {
        // integer division like the reference's size_t arithmetic
        // (read_stats.cpp:20); float /2.0 skews odd sums by 0.5
        read_length_sum += (double)((fragment.mates[MATE1].seq_len
                                     + fragment.mates[1].seq_len) / 2);
        read_length_count += 1;
        if (fragment.filter != 0 || fragment.single_end) continue;
        if (fragment.n_mates == 3) {
            const Mate *forward_mate = &fragment.mates[MATE1];
            const Mate *reverse_mate = &fragment.mates[SPLIT_READ];
            if (forward_mate->strand != FORWARD)
                std::swap(forward_mate, reverse_mate);
            int64_t gene = forward_mate->n_genes ? forward_mate->genes[0] : 0;
            int64_t distance = get_spliced_distance(
                forward_mate->contig, forward_mate->end, reverse_mate->start, gene);
            if (forward_mate->end > reverse_mate->start) distance = -distance;
            distance = std::max(distance, -forward_mate->seq_len);
            distance = std::max(distance, -reverse_mate->seq_len);
            gaps.push_back(distance);
            if ((int64_t)gaps.size() > 100000) break;
        }
    }
}

// ---- stage 6: proximal read-through (filter_proximal_read_through.cpp) ---

int64_t filter_proximal_read_through(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        const Mate *forward_mate, *reverse_mate;
        if (fragment.n_mates == 2) {
            forward_mate = fragment.mates[MATE1].strand == FORWARD
                               ? &fragment.mates[MATE1] : &fragment.mates[MATE2];
            reverse_mate = fragment.mates[MATE1].strand == FORWARD
                               ? &fragment.mates[MATE2] : &fragment.mates[MATE1];
        } else {
            forward_mate = fragment.mates[SPLIT_READ].strand == FORWARD
                               ? &fragment.mates[SUPPLEMENTARY] : &fragment.mates[SPLIT_READ];
            reverse_mate = fragment.mates[SPLIT_READ].strand == FORWARD
                               ? &fragment.mates[SPLIT_READ] : &fragment.mates[SUPPLEMENTARY];
        }
        bool proper = (fragment.n_mates == 2
                       && forward_mate->strand != reverse_mate->strand
                       && forward_mate->contig == reverse_mate->contig
                       && forward_mate->end < reverse_mate->start)
                      || (fragment.n_mates == 3
                          && forward_mate->strand == reverse_mate->strand
                          && forward_mate->contig == reverse_mate->contig
                          && forward_mate->end < reverse_mate->start);
        if (proper) {
            int64_t fwd_start, fwd_end, rev_start, rev_end;
            gene_hull(*forward_mate, c.gene_start, c.gene_end, fwd_start, fwd_end);
            gene_hull(*reverse_mate, c.gene_start, c.gene_end, rev_start, rev_end);
            if (forward_mate->end >= rev_start - c.params.min_read_through_distance
                || reverse_mate->start <= fwd_end + c.params.min_read_through_distance) {
                fragment.filter = stage_filter(5);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 7: inconsistently clipped -------------------------------------

int64_t filter_inconsistently_clipped(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        if (fragment.n_mates == 3) {
            const Mate &m1 = fragment.mates[MATE1];
            const Mate &split = fragment.mates[SPLIT_READ];
            if ((m1.strand == FORWARD && m1.end > split.end + 3)
                || (m1.strand != FORWARD && m1.start < split.start - 3)) {
                fragment.filter = stage_filter(6);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 8: homopolymer (filter_homopolymer.cpp:7-62) ------------------

bool is_split_read_spliced(const Mate &split) {
    bool direction = split.strand == FORWARD;  // UPSTREAM if forward
    int64_t breakpoint = split.strand == FORWARD ? split.start : split.end;
    for (int64_t g = 0; g < split.n_genes; ++g)
        if (annotate_engine::is_breakpoint_spliced(split.genes[g], direction, breakpoint))
            return true;
    return false;
}

int64_t filter_homopolymer(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    const int64_t homopolymer_length = c.params.homopolymer_length;
    int64_t remaining = 0;
    std::string sequence;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        bool filtered = false;
        if (fragment.n_mates == 3) {
            const Mate &split = fragment.mates[SPLIT_READ];
            sequence.clear();
            if (split.strand == FORWARD) {
                int64_t pre = split.preclipping();
                if (pre >= homopolymer_length) {
                    sequence.append(split.seq + pre - homopolymer_length,
                                    homopolymer_length);
                    sequence += ' ';
                }
                if (split.seq_len - pre >= homopolymer_length) {
                    sequence.append(split.seq + pre, homopolymer_length);
                    sequence += ' ';
                }
            } else {
                int64_t post = split.postclipping();
                if (post >= homopolymer_length) {
                    sequence.append(split.seq + split.seq_len - post,
                                    homopolymer_length);
                    sequence += ' ';
                }
                if (split.seq_len - post >= homopolymer_length) {
                    sequence.append(split.seq + split.seq_len - post - homopolymer_length,
                                    homopolymer_length);
                    sequence += ' ';
                }
            }
            int64_t run = 1;
            for (int64_t i = 1; i < (int64_t)sequence.size(); ++i) {
                if (sequence[i - 1] == sequence[i]) {
                    run += 1;
                    if (run == homopolymer_length) {
                        if (!is_split_read_spliced(split)) {
                            fragment.filter = stage_filter(7);
                            filtered = true;
                            break;
                        }
                    }
                } else {
                    run = 1;
                }
            }
        }
        if (!filtered) remaining += 1;
    }
    return remaining;
}

// ---- stage 9: small insert size ------------------------------------------

int64_t filter_small_insert_size(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    const int64_t max_overhang = 5;
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        if (fragment.n_mates == 2) {
            const Mate &m1 = fragment.mates[MATE1], &m2 = fragment.mates[MATE2];
            if (m1.strand != m2.strand && m1.contig == m2.contig
                && (std::abs(m1.start - m2.start) <= max_overhang
                    || std::abs(m1.end - m2.end) <= max_overhang)) {
                fragment.filter = stage_filter(8);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 10: long gap (filter_long_gap.cpp:7-89) -----------------------

int64_t filter_long_gap(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    const int64_t min_long_gap = 700000, max_long_gap = 1500000, short_segment = 15;
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        int64_t size_of_deletion = 0;
        if (fragment.n_mates == 3) {
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            if (split.contig == supp.contig) {
                if (split.strand != FORWARD && supp.strand != FORWARD)
                    size_of_deletion = supp.start - split.end;
                else if (split.strand == FORWARD && supp.strand == FORWARD)
                    size_of_deletion = split.start - supp.end;
            }
        }
        bool filtered = false;
        for (int m = 0; m < fragment.n_mates && !filtered; ++m) {
            const Mate &mate = fragment.mates[m];
            for (int64_t i = 1; i + 1 < mate.n_cigar; ++i) {
                uint32_t op = mate.cigar[i] & 0xf;
                int64_t oplen = mate.cigar[i] >> 4;
                if (op == CREF_SKIP
                    && (oplen >= min_long_gap
                        || (min_long_gap <= size_of_deletion
                            && size_of_deletion <= max_long_gap))) {
                    int64_t matching_left = 0;
                    for (int64_t j = i - 1; j >= 0; --j) {
                        uint32_t opj = mate.cigar[j] & 0xf;
                        if (opj == CMATCH || opj == CDIFF || opj == CEQUAL)
                            matching_left += mate.cigar[j] >> 4;
                        else if (opj == CDEL || opj == CINS || opj == CPAD)
                            ;
                        else
                            break;
                    }
                    int64_t matching_right = 0;
                    for (int64_t j = i + 1; j < mate.n_cigar; ++j) {
                        uint32_t opj = mate.cigar[j] & 0xf;
                        if (opj == CMATCH || opj == CDIFF || opj == CEQUAL)
                            matching_right += mate.cigar[j] >> 4;
                        else if (opj == CDEL || opj == CINS || opj == CPAD)
                            ;
                        else
                            break;
                    }
                    if (matching_left <= short_segment && matching_right <= short_segment) {
                        fragment.filter = stage_filter(9);
                        filtered = true;
                        break;
                    }
                }
            }
        }
        if (!filtered) remaining += 1;
    }
    return remaining;
}

// ---- stage 11: same gene -------------------------------------------------

int64_t filter_same_gene(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        bool common;
        if (fragment.n_mates == 2)
            common = genes_intersect(fragment.mates[MATE1], fragment.mates[MATE2]);
        else
            common = genes_intersect(fragment.mates[MATE2], fragment.mates[SUPPLEMENTARY]);
        if (!common) { remaining += 1; continue; }
        if (fragment.n_mates == 2) {
            const Mate &m1 = fragment.mates[MATE1], &m2 = fragment.mates[MATE2];
            if ((m1.strand == FORWARD && m2.strand != FORWARD && m1.start <= m2.end)
                || (m1.strand != FORWARD && m2.strand == FORWARD && m1.end >= m2.start)) {
                fragment.filter = stage_filter(10);
                continue;
            }
        } else {
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            if ((split.strand == FORWARD && supp.strand == FORWARD && split.start >= supp.end)
                || (split.strand != FORWARD && supp.strand != FORWARD && split.end <= supp.start)) {
                fragment.filter = stage_filter(10);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 12: hairpin (filter_hairpin.cpp:8-80) -------------------------

bool breakpoint_within_aligned_segment(int64_t breakpoint, const Mate &alignment) {
    int64_t reference_position = alignment.start;
    for (int64_t i = 0; i < alignment.n_cigar; ++i) {
        uint32_t op = alignment.cigar[i] & 0xf;
        int64_t oplen = alignment.cigar[i] >> 4;
        if (op == CREF_SKIP || op == CDEL) {
            reference_position += oplen;
        } else if (op == CMATCH || op == CDIFF || op == CEQUAL) {
            if (reference_position <= breakpoint
                && breakpoint <= reference_position + oplen)
                return true;
            reference_position += oplen;
        }
    }
    return false;
}

int64_t filter_hairpin(size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        if (fragment.n_mates == 2) {
            if (!genes_intersect(fragment.mates[MATE1], fragment.mates[MATE2])
                && fragment.mates[MATE1].contig != fragment.mates[MATE2].contig) {
                remaining += 1;
                continue;
            }
        } else {
            if (!genes_intersect(fragment.mates[SPLIT_READ], fragment.mates[SUPPLEMENTARY])
                && fragment.mates[SPLIT_READ].contig != fragment.mates[SUPPLEMENTARY].contig) {
                remaining += 1;
                continue;
            }
        }
        if (fragment.n_mates == 2) {
            const Mate &m1 = fragment.mates[MATE1], &m2 = fragment.mates[MATE2];
            int64_t breakpoint1 = m1.strand == FORWARD ? m1.end : m1.start;
            int64_t breakpoint2 = m2.strand == FORWARD ? m2.end : m2.start;
            if (breakpoint_within_aligned_segment(breakpoint1, m2)
                || breakpoint_within_aligned_segment(breakpoint2, m1)) {
                fragment.filter = stage_filter(11);
                continue;
            }
        } else {
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            int64_t bp_split = split.strand == FORWARD ? split.start : split.end;
            int64_t bp_supp = supp.strand == FORWARD ? supp.end : supp.start;
            if (breakpoint_within_aligned_segment(bp_split, supp)
                || breakpoint_within_aligned_segment(bp_supp, split)
                || breakpoint_within_aligned_segment(bp_supp, fragment.mates[MATE1])) {
                fragment.filter = stage_filter(11);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 13: mismatches (filter_mismatches.cpp:12-135) -----------------

void count_mismatches(const Mate &alignment, const char *seq, int64_t seq_len,
                      int64_t &mismatches, int64_t &alignment_length) {
    Cascade &c = cascade();
    mismatches = 0;
    alignment_length = 0;
    int64_t reference_position = alignment.start;
    int64_t read_position = 0;
    const uint8_t *contig_seq = nullptr;
    int64_t contig_len = 0;
    if (alignment.contig >= 0 && alignment.contig < (int64_t)c.assembly.size()) {
        contig_seq = c.assembly[alignment.contig];
        contig_len = c.assembly_len[alignment.contig];
    }
    for (int64_t i = 0; i < alignment.n_cigar; ++i) {
        uint32_t op = alignment.cigar[i] & 0xf;
        int64_t oplen = alignment.cigar[i] >> 4;
        if (op == CSOFT_CLIP || op == CHARD_CLIP) {
            read_position += oplen;
            if (!((i == 0 && alignment.strand != FORWARD)
                  || (i == alignment.n_cigar - 1 && alignment.strand == FORWARD)))
                mismatches += 1;
        } else if (op == CDEL) {
            mismatches += 1;
            reference_position += oplen;
        } else if (op == CREF_SKIP) {
            reference_position += oplen;
        } else if (op == CINS) {
            mismatches += 1;
            read_position += oplen;
        } else if (op == CMATCH || op == CEQUAL || op == CDIFF) {
            for (int64_t j = 0; j < oplen; ++j) {
                if (read_position + j >= seq_len
                    || reference_position + j >= contig_len || contig_seq == nullptr)
                    break;
                uint8_t base = (uint8_t)seq[read_position + j];
                if (base == 'N') continue;
                alignment_length += 1;
                if (base != contig_seq[reference_position + j]) mismatches += 1;
            }
            reference_position += oplen;
            read_position += oplen;
        }
    }
}

double binomial_coefficient(int64_t k, int64_t n) {
    double result = 1.0;
    for (int64_t i = n - k + 1; i <= n; ++i) result *= (double)i;
    for (int64_t i = 1; i <= k; ++i) result /= (double)i;
    return result;
}

struct MismatchParams {
    double mismatch_probability, pvalue_cutoff;
    int64_t genome_size;
};

bool mismatch_decision(int64_t mismatches, int64_t alignment_length,
                       const MismatchParams &p) {
    double pvalue = binomial_coefficient(mismatches, alignment_length)
                    * std::pow(p.mismatch_probability, (double)mismatches)
                    * std::pow(1.0 - p.mismatch_probability,
                               (double)(alignment_length - mismatches));
    if (pvalue < p.pvalue_cutoff) return true;
    if (mismatches > 0) {
        double permutations = std::pow(4.0, (double)(alignment_length - mismatches));
        if ((double)p.genome_size >= permutations) return true;
        return (1.0 - std::pow(1.0 - (double)p.genome_size / permutations,
                               binomial_coefficient(mismatches, alignment_length)))
               > 0.01;
    }
    return false;
}

void reverse_complement(const char *seq, int64_t len, std::string &out) {
    out.resize(len);
    for (int64_t i = 0; i < len; ++i) {
        char base = seq[len - 1 - i];
        switch (base) {
            case 'A': base = 'T'; break;
            case 'T': base = 'A'; break;
            case 'C': base = 'G'; break;
            case 'G': base = 'C'; break;
            case 'a': base = 't'; break;
            case 't': base = 'a'; break;
            case 'c': base = 'g'; break;
            case 'g': base = 'c'; break;
            default: break;
        }
        out[i] = base;
    }
}

int64_t filter_mismatches_stage(const MismatchParams &p, size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    int64_t remaining = 0;
    std::string supp_sequence;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        if (fragment.filter != 0) continue;
        auto test = [&](const Mate &mate, const char *seq, int64_t seq_len,
                        bool is_multimapper) {
            int64_t mismatches, alignment_length;
            count_mismatches(mate, seq, seq_len, mismatches, alignment_length);
            if (is_multimapper) mismatches += 2;
            return mismatch_decision(mismatches, alignment_length, p);
        };
        if (fragment.n_mates == 2) {
            const Mate &m1 = fragment.mates[MATE1], &m2 = fragment.mates[MATE2];
            if ((!c.viral[m1.contig]
                 && test(m1, m1.seq, m1.seq_len,
                         fragment.multimapper && !c.viral[m2.contig]))
                || (!c.viral[m2.contig]
                    && test(m2, m2.seq, m2.seq_len,
                            fragment.multimapper && !c.viral[m1.contig]))) {
                fragment.filter = stage_filter(12);
                continue;
            }
        } else {
            const Mate &m1 = fragment.mates[MATE1];
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            bool filtered = false;
            if (!c.viral[m1.contig]
                && test(m1, m1.seq, m1.seq_len,
                        fragment.multimapper && !c.viral[supp.contig]))
                filtered = true;
            if (!filtered && !c.viral[supp.contig]) {
                const char *seq = split.seq;
                int64_t seq_len = split.seq_len;
                if (supp.strand != split.strand) {
                    reverse_complement(split.seq, split.seq_len, supp_sequence);
                    seq = supp_sequence.data();
                    seq_len = (int64_t)supp_sequence.size();
                }
                if (test(supp, seq, seq_len,
                         fragment.multimapper && !c.viral[m1.contig]))
                    filtered = true;
            }
            if (filtered) {
                fragment.filter = stage_filter(12);
                continue;
            }
        }
        remaining += 1;
    }
    return remaining;
}

// ---- stage 14: low entropy (filter_low_entropy.cpp:9-112) ----------------

bool low_entropy_scan_one(const char *seq, int64_t length, int64_t a1s, int64_t a1e,
                          int64_t a2s, int64_t a2e, double kmer_content,
                          int64_t kmer_length, std::vector<int32_t> &scratch) {
    if (length < kmer_length) return false;
    const int n_kmers = 1 << (2 * kmer_length);
    scratch.assign(4 * n_kmers, 0);
    int32_t *kmer_count = scratch.data();
    int32_t *count_a1 = scratch.data() + n_kmers;
    int32_t *count_a2 = scratch.data() + 2 * n_kmers;
    int32_t *previous_pos = scratch.data() + 3 * n_kmers;
    /* exact reference types (filter_low_entropy.cpp:67-69): float32
     * product/quotient, +0.5 in double, truncation; inverted windows
     * (end < start) get a huge threshold like the reference's
     * negative-to-unsigned conversion (never filters) */
    auto kmer_threshold = [&](int64_t segment_length) -> int64_t {
        if (segment_length < 0) return (int64_t)1 << 30;
        double value = (double)((float)((float)segment_length
                                        * (float)kmer_content)
                                / (float)kmer_length) + 0.5;
        return (int64_t)value;
    };
    const int64_t max_c = kmer_threshold(length);
    const int64_t max_c1 = kmer_threshold(a1e - a1s);
    const int64_t max_c2 = kmer_threshold(a2e - a2s);
    /* rolling 2-bit window: the kmer at pos+1 shares all but its last base
     * with the kmer at pos, so one base decode per position replaces
     * kmer_length of them (identical value sequence) */
    const int roll_mask = (1 << (2 * kmer_length)) - 1;
    auto base_code = [](char base) {
        return base == 'T' ? 0 : base == 'G' ? 1 : base == 'C' ? 2 : 3;
    };
    int value = 0;
    for (int64_t j = 0; j < kmer_length - 1; ++j)
        value = (value << 2) | base_code(seq[j]);
    for (int64_t pos = 0; pos < length - kmer_length; ++pos) {
        value = ((value << 2) | base_code(seq[pos + kmer_length - 1]))
                & roll_mask;
        if (previous_pos[value] <= pos) {
            previous_pos[value] = (int32_t)(pos + kmer_length);
            kmer_count[value] += 1;
            if (pos + 1 >= a1s && pos < a1e) count_a1[value] += 1;
            if (pos + 1 >= a2s && pos < a2e) count_a2[value] += 1;
            if (kmer_count[value] >= max_c || count_a1[value] >= max_c1
                || count_a2[value] >= max_c2)
                return true;
        }
    }
    return false;
}

/* stage-13 row selection shared by the native scan and the device-offload
 * exporter (cascade_low_entropy_rows): emits every (fragment, mate, window)
 * the stage would scan, in stage order */
template <typename Emit>
void collect_low_entropy_rows(int64_t kmer_length, int64_t max_itd_length,
                              int64_t duplicates_filter_id, size_t range_lo,
                              size_t range_hi, Emit emit) {
    Cascade &c = cascade();
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i) {
        Fragment &fragment = c.fragments[frag_i];
        const Mate &split = fragment.mates[SPLIT_READ];
        const Mate &supp = fragment.mates[SUPPLEMENTARY];
        bool is_itd =
            fragment.n_mates == 3 && split.strand == supp.strand
            && split.contig == supp.contig
            && ((split.strand == FORWARD && split.start < supp.end
                 && split.start + max_itd_length >= supp.end)
                || (split.strand != FORWARD && split.end > supp.start
                    && split.end <= supp.start + max_itd_length));
        if (!is_itd || fragment.filter == duplicates_filter_id) {
            if (fragment.filter != 0) continue;
        }

        for (int mate_idx = MATE1; mate_idx <= MATE2; ++mate_idx) {
            const Mate &mate = fragment.mates[mate_idx];
            if (mate.seq_len < kmer_length) continue;
            int64_t aligned_start1 =
                (mate.n_cigar && (mate.cigar[0] & 0xf) == CSOFT_CLIP)
                    ? mate.preclipping() : 0;
            int64_t aligned_end1 = mate.seq_len;
            if (mate.n_cigar && (mate.cigar[mate.n_cigar - 1] & 0xf) == CSOFT_CLIP)
                aligned_end1 -= mate.cigar[mate.n_cigar - 1] >> 4;
            int64_t aligned_start2, aligned_end2;
            if (fragment.n_mates == 3 && mate_idx == SPLIT_READ) {
                aligned_start2 = (supp.n_cigar && (supp.cigar[0] & 0xf) == CSOFT_CLIP)
                                     ? (int64_t)(supp.cigar[0] >> 4) : 0;
                aligned_end2 = split.seq_len;
                if (supp.n_cigar && (supp.cigar[supp.n_cigar - 1] & 0xf) == CSOFT_CLIP)
                    aligned_end2 -= supp.cigar[supp.n_cigar - 1] >> 4;
                if (supp.strand != split.strand) {
                    aligned_start2 = split.seq_len - aligned_start2;
                    aligned_end2 = split.seq_len - aligned_end2;
                    std::swap(aligned_start2, aligned_end2);
                }
            } else {
                aligned_start2 = aligned_start1;
                aligned_end2 = aligned_end1;
            }
            if (!emit(frag_i, fragment, mate, aligned_start1, aligned_end1,
                      aligned_start2, aligned_end2))
                break;  /* fragment filtered — stage skips the second mate */
        }
    }
}

int64_t filter_low_entropy_stage(double kmer_content, int64_t kmer_length,
                                 int64_t max_itd_length, int64_t duplicates_filter_id,
                                 size_t range_lo, size_t range_hi) {
    Cascade &c = cascade();
    std::vector<int32_t> scratch;
    collect_low_entropy_rows(
        kmer_length, max_itd_length, duplicates_filter_id, range_lo, range_hi,
        [&](size_t, Fragment &fragment, const Mate &mate, int64_t a1s,
            int64_t a1e, int64_t a2s, int64_t a2e) -> bool {
            if (low_entropy_scan_one(mate.seq, mate.seq_len, a1s, a1e, a2s,
                                     a2e, kmer_content, kmer_length,
                                     scratch)) {
                fragment.filter = stage_filter(13);
                return false;
            }
            return true;
        });
    int64_t remaining = 0;
    for (size_t frag_i = range_lo; frag_i < range_hi; ++frag_i)
        if (c.fragments[frag_i].filter == 0) remaining += 1;
    return remaining;
}

// ---- marshalling ----------------------------------------------------------

bool bytes_to_i64(PyObject *obj, std::vector<int64_t> &out) {
    char *data;
    Py_ssize_t size;
    if (PyBytes_AsStringAndSize(obj, &data, &size) < 0) return false;
    out.resize(size / 8);
    std::memcpy(out.data(), data, out.size() * 8);
    return true;
}

bool bytes_to_u8(PyObject *obj, std::vector<uint8_t> &out) {
    char *data;
    Py_ssize_t size;
    if (PyBytes_AsStringAndSize(obj, &data, &size) < 0) return false;
    out.assign(data, data + size);
    return true;
}

}  // namespace

namespace cascade_store {

int64_t spliced_distance(int64_t contig, int64_t position1, int64_t position2,
                         int64_t gene) {
    return get_spliced_distance(contig, position1, position2, gene);
}

}  // namespace cascade_store

// cascade_begin(frag_offsets, contig, start, end, strand, cigar_offsets,
//   cigar_words, seq_offsets, seq_blob, genes_offsets, genes_items,
//   frag_flags,                      # bit0 single_end, bit1 dup, bit2 multimapper
//   frag_filter,                     # current filter ids (int64)
//   interesting, viral,              # bytes, 1 byte per contig
//   mapped_viral,                    # int64 per contig
//   gene_start, gene_end, gene_is_dummy,
//   assembly_list, coverage_list,    # per contig: buffer or None
//   (external_dup, top_viral, min_covered_fraction, min_read_through_distance,
//    homopolymer_length, enabled_bitmask),
//   filter_ids)                      # 14 int64 ids, cascade order
// -> (counts_1to5 bytes, gaps bytes, read_length_sum, read_length_count)
PyObject *cascade_begin(PyObject *, PyObject *args) {
    PyObject *frag_offsets_b, *contig_b, *start_b, *end_b, *strand_b,
        *pred_strand_b, *pred_ambig_b, *exonic_b,
        *cigar_offsets_b, *cigar_words_b, *seq_offsets_b, *seq_blob_b,
        *genes_offsets_b, *genes_items_b, *frag_flags_b, *frag_filter_b,
        *interesting_b, *viral_b, *mapped_viral_b, *gene_start_b, *gene_end_b,
        *gene_is_dummy_b, *assembly_obj, *coverage_obj, *params_obj, *ids_obj;
    if (!PyArg_ParseTuple(args, "SSSSSSSSSSSSSSSSSSSSSSOOOO", &frag_offsets_b,
                          &contig_b, &start_b, &end_b, &strand_b,
                          &pred_strand_b, &pred_ambig_b, &exonic_b,
                          &cigar_offsets_b, &cigar_words_b, &seq_offsets_b,
                          &seq_blob_b, &genes_offsets_b, &genes_items_b,
                          &frag_flags_b, &frag_filter_b, &interesting_b,
                          &viral_b, &mapped_viral_b, &gene_start_b, &gene_end_b,
                          &gene_is_dummy_b, &assembly_obj, &coverage_obj,
                          &params_obj, &ids_obj))
        return nullptr;

    release_cascade();
    Cascade &c = cascade();

    std::vector<int64_t> frag_offsets, contig, start, end, strand, pred_strand,
        pred_ambig, exonic, cigar_offsets, seq_offsets, genes_offsets,
        frag_flags, frag_filter;
    if (!bytes_to_i64(frag_offsets_b, frag_offsets) || !bytes_to_i64(contig_b, contig)
        || !bytes_to_i64(start_b, start) || !bytes_to_i64(end_b, end)
        || !bytes_to_i64(strand_b, strand)
        || !bytes_to_i64(pred_strand_b, pred_strand)
        || !bytes_to_i64(pred_ambig_b, pred_ambig)
        || !bytes_to_i64(exonic_b, exonic)
        || !bytes_to_i64(cigar_offsets_b, cigar_offsets)
        || !bytes_to_i64(seq_offsets_b, seq_offsets)
        || !bytes_to_i64(genes_offsets_b, genes_offsets)
        || !bytes_to_i64(frag_flags_b, frag_flags)
        || !bytes_to_i64(frag_filter_b, frag_filter)
        || !bytes_to_u8(interesting_b, c.interesting)
        || !bytes_to_u8(viral_b, c.viral)
        || !bytes_to_i64(mapped_viral_b, c.mapped_viral)
        || !bytes_to_i64(gene_start_b, c.gene_start)
        || !bytes_to_i64(gene_end_b, c.gene_end)
        || !bytes_to_u8(gene_is_dummy_b, c.gene_is_dummy))
        return nullptr;
    {
        char *data;
        Py_ssize_t size;
        if (PyBytes_AsStringAndSize(cigar_words_b, &data, &size) < 0) return nullptr;
        c.cigars.assign((const uint32_t *)data, (const uint32_t *)data + size / 4);
        if (PyBytes_AsStringAndSize(seq_blob_b, &data, &size) < 0) return nullptr;
        c.seqs.assign(data, size);
    }
    if (!bytes_to_i64(genes_items_b, c.genes_items)) return nullptr;

    Py_ssize_t n_contigs = PyList_Size(assembly_obj);
    c.assembly.assign(n_contigs, nullptr);
    c.assembly_len.assign(n_contigs, 0);
    c.coverage.assign(n_contigs, nullptr);
    c.coverage_len.assign(n_contigs, 0);
    for (Py_ssize_t i = 0; i < n_contigs; ++i) {
        PyObject *plane = PyList_GetItem(assembly_obj, i);
        if (plane != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(plane, &view, PyBUF_SIMPLE) != 0) return nullptr;
            c.held.push_back(view);
            c.assembly[i] = (const uint8_t *)view.buf;
            c.assembly_len[i] = view.len;
        }
        PyObject *cov = PyList_GetItem(coverage_obj, i);
        if (cov != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(cov, &view, PyBUF_SIMPLE) != 0) return nullptr;
            c.held.push_back(view);
            c.coverage[i] = (const uint16_t *)view.buf;
            c.coverage_len[i] = view.len / 2;
        }
    }

    int external_dup;
    long long top_viral, min_rt_distance, homopolymer_length;
    double min_covered_fraction;
    unsigned long enabled;
    if (!PyArg_ParseTuple(params_obj, "iLdLLk", &external_dup, &top_viral,
                          &min_covered_fraction, &min_rt_distance,
                          &homopolymer_length, &enabled))
        return nullptr;
    c.params.external_duplicate_marking = external_dup != 0;
    c.params.top_viral_contigs = top_viral;
    c.params.viral_min_covered_fraction = min_covered_fraction;
    c.params.min_read_through_distance = min_rt_distance;
    c.params.homopolymer_length = homopolymer_length;
    c.params.enabled = (uint32_t)enabled;
    for (int i = 0; i < 14; ++i)
        c.params.filter_ids[i] = PyLong_AsLongLong(PyTuple_GetItem(ids_obj, i));

    // build fragments
    size_t n_frags = frag_offsets.size() ? frag_offsets.size() - 1 : 0;
    c.fragments.resize(n_frags);
    for (size_t f = 0; f < n_frags; ++f) {
        Fragment &fragment = c.fragments[f];
        fragment.filter = frag_filter[f];
        fragment.single_end = frag_flags[f] & 1;
        fragment.duplicate = frag_flags[f] & 2;
        fragment.multimapper = frag_flags[f] & 4;
        fragment.n_mates = (int)(frag_offsets[f + 1] - frag_offsets[f]);
        if (fragment.n_mates < 1 || fragment.n_mates > 3) {
            PyErr_SetString(PyExc_ValueError,
                            "cascade_begin: fragment with mate count "
                            "outside 1..3");
            return nullptr;
        }
        for (int m = 0; m < fragment.n_mates; ++m) {
            int64_t row = frag_offsets[f] + m;
            Mate &mate = fragment.mates[m];
            mate.contig = contig[row];
            mate.start = start[row];
            mate.end = end[row];
            mate.strand = strand[row] != 0;
            mate.predicted_strand = pred_strand[row] != 0;
            mate.predicted_strand_ambiguous = pred_ambig[row] != 0;
            mate.exonic = exonic[row] != 0;
            mate.cigar = c.cigars.data() + cigar_offsets[row];
            mate.n_cigar = cigar_offsets[row + 1] - cigar_offsets[row];
            mate.seq = c.seqs.data() + seq_offsets[row];
            mate.seq_len = seq_offsets[row + 1] - seq_offsets[row];
            mate.genes = c.genes_items.data() + genes_offsets[row];
            mate.n_genes = genes_offsets[row + 1] - genes_offsets[row];
        }
    }
    c.ready = true;

    int64_t counts[5] = {-1, -1, -1, -1, -1};
    if (stage_enabled(0)) counts[0] = filter_duplicates();
    if (stage_enabled(1)) counts[1] = filter_uninteresting_contigs();
    if (stage_enabled(2)) counts[2] = filter_viral_contigs();
    if (stage_enabled(3)) counts[3] = filter_top_expressed_viral_contigs();
    if (stage_enabled(4)) counts[4] = filter_low_coverage_viral_contigs();

    std::vector<int64_t> gaps;
    double read_length_sum;
    int64_t read_length_count;
    collect_mate_gaps(gaps, read_length_sum, read_length_count);

    return Py_BuildValue(
        "(y#y#dL)", (const char *)counts, (Py_ssize_t)sizeof(counts),
        gaps.empty() ? "" : (const char *)gaps.data(),
        (Py_ssize_t)(gaps.size() * 8), read_length_sum,
        (long long)read_length_count);
}

// cascade_begin_retained(interesting, viral, mapped_viral, gene_start,
//   gene_end, gene_is_dummy, assembly_list, coverage_list, params, ids)
// Same contract as cascade_begin, but the fragments come from the retained
// extraction store (extract.h) in place of marshalled arrays: Mate payloads
// point into the store's vectors, so no per-fragment data crosses Python.
PyObject *cascade_begin_retained(PyObject *, PyObject *args) {
    PyObject *interesting_b, *viral_b, *mapped_viral_b, *gene_start_b,
        *gene_end_b, *gene_is_dummy_b, *assembly_obj, *coverage_obj,
        *params_obj, *ids_obj;
    if (!PyArg_ParseTuple(args, "SSSSSSOOOO", &interesting_b, &viral_b,
                          &mapped_viral_b, &gene_start_b, &gene_end_b,
                          &gene_is_dummy_b, &assembly_obj, &coverage_obj,
                          &params_obj, &ids_obj))
        return nullptr;
    extract_store::ExtractStore &retained = extract_store::store();
    if (!retained.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }

    release_cascade();
    Cascade &c = cascade();

    if (!bytes_to_u8(interesting_b, c.interesting)
        || !bytes_to_u8(viral_b, c.viral)
        || !bytes_to_i64(mapped_viral_b, c.mapped_viral)
        || !bytes_to_i64(gene_start_b, c.gene_start)
        || !bytes_to_i64(gene_end_b, c.gene_end)
        || !bytes_to_u8(gene_is_dummy_b, c.gene_is_dummy))
        return nullptr;

    Py_ssize_t n_contigs = PyList_Size(assembly_obj);
    c.assembly.assign(n_contigs, nullptr);
    c.assembly_len.assign(n_contigs, 0);
    c.coverage.assign(n_contigs, nullptr);
    c.coverage_len.assign(n_contigs, 0);
    for (Py_ssize_t i = 0; i < n_contigs; ++i) {
        PyObject *plane = PyList_GetItem(assembly_obj, i);
        if (plane != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(plane, &view, PyBUF_SIMPLE) != 0) return nullptr;
            c.held.push_back(view);
            c.assembly[i] = (const uint8_t *)view.buf;
            c.assembly_len[i] = view.len;
        }
        PyObject *cov = PyList_GetItem(coverage_obj, i);
        if (cov != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(cov, &view, PyBUF_SIMPLE) != 0) return nullptr;
            c.held.push_back(view);
            c.coverage[i] = (const uint16_t *)view.buf;
            c.coverage_len[i] = view.len / 2;
        }
    }

    int external_dup;
    long long top_viral, min_rt_distance, homopolymer_length;
    double min_covered_fraction;
    unsigned long enabled;
    if (!PyArg_ParseTuple(params_obj, "iLdLLk", &external_dup, &top_viral,
                          &min_covered_fraction, &min_rt_distance,
                          &homopolymer_length, &enabled))
        return nullptr;
    c.params.external_duplicate_marking = external_dup != 0;
    c.params.top_viral_contigs = top_viral;
    c.params.viral_min_covered_fraction = min_covered_fraction;
    c.params.min_read_through_distance = min_rt_distance;
    c.params.homopolymer_length = homopolymer_length;
    c.params.enabled = (uint32_t)enabled;
    for (int i = 0; i < 14; ++i)
        c.params.filter_ids[i] = PyLong_AsLongLong(PyTuple_GetItem(ids_obj, i));

    // adopt the retained fragments in place
    const bool timing = getenv("ARRIBA_TPU_SCAN_TIMING") != nullptr;
    auto cb_now = []() {
        struct timespec ts;
        clock_gettime(CLOCK_MONOTONIC, &ts);
        return ts.tv_sec + ts.tv_nsec * 1e-9;
    };
    double cb_t0 = timing ? cb_now() : 0;
    size_t n_frags = retained.fragments.size();
    c.fragments.resize(n_frags);
    /* each index writes only its own slot: embarrassingly parallel */
    auto adopt_range = [&](size_t lo, size_t hi) {
    for (size_t f = lo; f < hi; ++f) {
        const extract_store::ExtractFragment &source = retained.fragments[f];
        Fragment &fragment = c.fragments[f];
        fragment.filter = 0;
        fragment.single_end = source.single_end;
        fragment.duplicate = source.duplicate;
        fragment.multimapper = source.multimapper;
        fragment.n_mates = (int)source.mates.size();
        for (int m = 0; m < fragment.n_mates; ++m) {
            const extract_store::ExtractMate &source_mate = source.mates[m];
            Mate &mate = fragment.mates[m];
            mate.contig = source_mate.contig;
            mate.start = source_mate.start;
            mate.end = source_mate.end;
            mate.strand = source_mate.strand;
            mate.predicted_strand = source_mate.predicted_strand;
            mate.predicted_strand_ambiguous =
                source_mate.predicted_strand_ambiguous;
            mate.exonic = source_mate.exonic;
            mate.cigar = source_mate.cigar.data();
            mate.n_cigar = (int64_t)source_mate.cigar.size();
            mate.seq = source_mate.seq.data();
            mate.seq_len = (int64_t)source_mate.seq.size();
            mate.genes = source_mate.genes.data();
            mate.n_genes = (int64_t)source_mate.genes.size();
        }
    }
    };
    {
        unsigned hw = std::thread::hardware_concurrency();
        size_t W = std::max(1u, std::min({hw ? hw : 1u, 8u,
                                          (unsigned)(n_frags / 65536 + 1)}));
        if (W <= 1) {
            adopt_range(0, n_frags);
        } else {
            std::vector<std::thread> pool;
            for (size_t w = 0; w < W; ++w)
                pool.emplace_back(adopt_range, w * n_frags / W,
                                  (w + 1) * n_frags / W);
            for (std::thread &worker : pool) worker.join();
        }
    }
    c.ready = true;
    double cb_t1 = timing ? cb_now() : 0;
    double cb_t2 = 0, cb_t3 = 0;

    int64_t counts[5] = {-1, -1, -1, -1, -1};
    if (stage_enabled(0)) counts[0] = filter_duplicates();
    cb_t2 = timing ? cb_now() : 0;
    if (stage_enabled(1)) counts[1] = filter_uninteresting_contigs();
    if (stage_enabled(2)) counts[2] = filter_viral_contigs();
    if (stage_enabled(3)) counts[3] = filter_top_expressed_viral_contigs();
    if (stage_enabled(4)) counts[4] = filter_low_coverage_viral_contigs();
    cb_t3 = timing ? cb_now() : 0;

    std::vector<int64_t> gaps;
    double read_length_sum;
    int64_t read_length_count;
    collect_mate_gaps(gaps, read_length_sum, read_length_count);
    if (timing)
        fprintf(stderr,
                "cascade_begin timing: adopt=%.3fs dup=%.3fs stages=%.3fs "
                "gaps=%.3fs\n",
                cb_t1 - cb_t0, cb_t2 - cb_t1, cb_t3 - cb_t2,
                cb_now() - cb_t3);

    return Py_BuildValue(
        "(y#y#dL)", (const char *)counts, (Py_ssize_t)sizeof(counts),
        gaps.empty() ? "" : (const char *)gaps.data(),
        (Py_ssize_t)(gaps.size() * 8), read_length_sum,
        (long long)read_length_count);
}

// cascade_finish(max_mate_gap_unused, mismatch_probability, pvalue_cutoff,
//                genome_size, kmer_content, kmer_length, max_itd_length)
// -> (counts_6to14 bytes, filter ids bytes)
// hybrid device offload of stage 13: export the exact rows the native scan
// would visit — (fragment_row, seq, aligned windows) — so the accelerator's
// batched recurrence (ops/readfilters.low_entropy_batch) can decide them,
// and apply the verdicts back with cascade_set_filters.
// Returns (frag_rows int64 bytes, seq_offsets int64 bytes, seq_blob bytes,
// windows int32[n,4] bytes).
PyObject *cascade_low_entropy_rows(PyObject *, PyObject *args) {
    long long kmer_length, max_itd_length;
    if (!PyArg_ParseTuple(args, "LL", &kmer_length, &max_itd_length))
        return nullptr;
    Cascade &c = cascade();
    if (!c.ready) {
        PyErr_SetString(PyExc_RuntimeError, "cascade_begin not called");
        return nullptr;
    }
    std::vector<int64_t> frag_rows;
    std::vector<int64_t> seq_offsets(1, 0);
    std::string seq_blob;
    std::vector<int32_t> windows;
    collect_low_entropy_rows(
        kmer_length, max_itd_length, c.params.filter_ids[0], 0,
        c.fragments.size(),
        [&](size_t frag_i, Fragment &, const Mate &mate, int64_t a1s,
            int64_t a1e, int64_t a2s, int64_t a2e) -> bool {
            frag_rows.push_back((int64_t)frag_i);
            seq_blob.append(mate.seq, (size_t)mate.seq_len);
            seq_offsets.push_back((int64_t)seq_blob.size());
            windows.push_back((int32_t)a1s);
            windows.push_back((int32_t)a1e);
            windows.push_back((int32_t)a2s);
            windows.push_back((int32_t)a2e);
            return true;  /* export both mates; union application is
                             equivalent to the stage's early break */
        });
    return Py_BuildValue(
        "y#y#y#y#",
        (const char *)frag_rows.data(),
        (Py_ssize_t)(frag_rows.size() * 8),
        (const char *)seq_offsets.data(),
        (Py_ssize_t)(seq_offsets.size() * 8),
        seq_blob.data(), (Py_ssize_t)seq_blob.size(),
        (const char *)windows.data(), (Py_ssize_t)(windows.size() * 4));
}

// cascade_set_filters(rows int64 bytes, stage): set the stage's filter id on
// the given fragment rows (stage-13 semantics: unconditional set — the ITD
// special case scans and overwrites already-filtered fragments), returning
// the remaining (filter == 0) count.
PyObject *cascade_set_filters(PyObject *, PyObject *args) {
    PyObject *rows_obj;
    int stage;
    if (!PyArg_ParseTuple(args, "Si", &rows_obj, &stage))
        return nullptr;
    Cascade &c = cascade();
    if (!c.ready) {
        PyErr_SetString(PyExc_RuntimeError, "cascade_begin not called");
        return nullptr;
    }
    char *data; Py_ssize_t size;
    if (PyBytes_AsStringAndSize(rows_obj, &data, &size) != 0)
        return nullptr;
    const int64_t *rows = (const int64_t *)data;
    int64_t filter_id = stage_filter(stage);
    for (Py_ssize_t i = 0; i < size / 8; ++i) {
        int64_t row = rows[i];
        if (row >= 0 && (size_t)row < c.fragments.size())
            c.fragments[row].filter = filter_id;
    }
    int64_t remaining = 0;
    for (const Fragment &fragment : c.fragments)
        if (fragment.filter == 0) remaining += 1;
    return PyLong_FromLongLong(remaining);
}

PyObject *cascade_finish(PyObject *, PyObject *args) {
    long long max_mate_gap, genome_size, kmer_length, max_itd_length;
    double mismatch_probability, pvalue_cutoff, kmer_content;
    int skip_stage13 = 0;  /* hybrid device offload: stage 13 (low entropy)
                              runs on the accelerator via
                              cascade_low_entropy_rows/cascade_set_filters */
    if (!PyArg_ParseTuple(args, "LddLdLL|i", &max_mate_gap,
                          &mismatch_probability, &pvalue_cutoff, &genome_size,
                          &kmer_content, &kmer_length, &max_itd_length,
                          &skip_stage13))
        return nullptr;
    (void)max_mate_gap;  // the hairpin filter takes no distance parameter here;
                         // the Python signature carries it for parity only
    Cascade &c = cascade();
    if (!c.ready) {
        PyErr_SetString(PyExc_RuntimeError, "cascade_begin not called");
        return nullptr;
    }

    // stages 6-14 are per-fragment against read-only tables, so each worker
    // runs the full stage sequence over its own fragment range in one fused
    // pass; per-stage remaining counts are order-independent sums
    int64_t counts[9] = {-1, -1, -1, -1, -1, -1, -1, -1, -1};
    MismatchParams p{mismatch_probability, pvalue_cutoff, genome_size};
    auto run_range = [&](size_t lo, size_t hi, int64_t out[9]) {
        if (stage_enabled(5)) out[0] = filter_proximal_read_through(lo, hi);
        if (stage_enabled(6)) out[1] = filter_inconsistently_clipped(lo, hi);
        if (stage_enabled(7)) out[2] = filter_homopolymer(lo, hi);
        if (stage_enabled(8)) out[3] = filter_small_insert_size(lo, hi);
        if (stage_enabled(9)) out[4] = filter_long_gap(lo, hi);
        if (stage_enabled(10)) out[5] = filter_same_gene(lo, hi);
        if (stage_enabled(11)) out[6] = filter_hairpin(lo, hi);
        if (stage_enabled(12)) out[7] = filter_mismatches_stage(p, lo, hi);
        if (stage_enabled(13) && !skip_stage13)
            out[8] = filter_low_entropy_stage(kmer_content, kmer_length,
                                              max_itd_length,
                                              c.params.filter_ids[0], lo, hi);
    };
    size_t n_frags = c.fragments.size();
    unsigned hw = std::thread::hardware_concurrency();
    size_t W = std::max(1u, std::min({hw ? hw : 1u, 8u,
                                      (unsigned)(n_frags / 32768 + 1)}));
    if (W <= 1) {
        run_range(0, n_frags, counts);
    } else {
        std::vector<std::array<int64_t, 9>> wcounts(
            W, {-1, -1, -1, -1, -1, -1, -1, -1, -1});
        std::vector<std::thread> pool;
        for (size_t w = 0; w < W; ++w)
            pool.emplace_back([&, w]() {
                run_range(w * n_frags / W, (w + 1) * n_frags / W,
                          wcounts[w].data());
            });
        for (std::thread &worker : pool) worker.join();
        for (int k = 0; k < 9; ++k)
            if (stage_enabled(k + 5) && !(k == 8 && skip_stage13)) {
                counts[k] = 0;
                for (size_t w = 0; w < W; ++w) counts[k] += wcounts[w][k];
            }
    }

    std::vector<int64_t> filters(c.fragments.size());
    for (size_t f = 0; f < c.fragments.size(); ++f)
        filters[f] = c.fragments[f].filter;

    // the store stays alive: find_fusions_native consumes it; the Python
    // facade calls cascade_release afterwards (or the next cascade_begin does)
    return Py_BuildValue(
        "(y#y#)", (const char *)counts, (Py_ssize_t)sizeof(counts),
        filters.empty() ? "" : (const char *)filters.data(),
        (Py_ssize_t)(filters.size() * 8));
}
