// Native find_fusions: candidate generation, discordant-mate assignment,
// strand/transcript-start prediction.
//
// Exact port of arriba_tpu/fusions_finder.py (parity port of
// fusions.cpp:15-473), reading fragments from the read-level cascade's
// store (cascade.h) so no re-marshal is needed. Emits the fusion table as
// columnar arrays + fragment-index support lists; Python materializes the
// Fusion objects and applies the pass-2 mate swaps to its own fragments.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "annotate.h"
#include "cascade.h"
#include "extract.h"
#include "event.h"

namespace {

using cascade_store::Fragment;
using cascade_store::Mate;

constexpr bool FORWARD = true;
constexpr bool UPSTREAM = true, DOWNSTREAM = false;
constexpr int MATE1 = 0, MATE2 = 1, SPLIT_READ = 1, SUPPLEMENTARY = 2;
constexpr bool TRANSCRIPT_START_GENE1 = true, TRANSCRIPT_START_GENE2 = false;

using FusionData = event_store::EventFusion;

template <size_t N>
struct KeyHash {
    size_t operator()(const std::array<int64_t, N> &key) const {
        size_t h = 1469598103934665603ull;
        for (int64_t v : key) { h ^= (size_t)v; h *= 1099511628211ull; }
        return h;
    }
};

bool complement_strand_if(bool strand, bool condition) {
    return condition ? !strand : strand;
}

// fusions.cpp:179-189 (_expand_anchor)
void expand_anchor(FusionData &fusion, int which, int64_t anchor_start) {
    if (which == 1) {
        if (fusion.direction1 == DOWNSTREAM
            && (anchor_start < fusion.anchor_start1 || fusion.anchor_start1 == 0))
            fusion.anchor_start1 = anchor_start;
        else if (fusion.direction1 == UPSTREAM
                 && (anchor_start > fusion.anchor_start1 || fusion.anchor_start1 == 0))
            fusion.anchor_start1 = anchor_start;
    } else {
        if (fusion.direction2 == DOWNSTREAM
            && (anchor_start < fusion.anchor_start2 || fusion.anchor_start2 == 0))
            fusion.anchor_start2 = anchor_start;
        else if (fusion.direction2 == UPSTREAM
                 && (anchor_start > fusion.anchor_start2 || fusion.anchor_start2 == 0))
            fusion.anchor_start2 = anchor_start;
    }
}

// fusions.cpp:15-89 (predict_fusion_strands)
void predict_fusion_strands(FusionData &fusion,
                            const std::vector<Fragment> &fragments,
                            int64_t hairpin_filter_id) {
    int64_t strand1_forward = 0, strand1_reverse = 0;

    for (int64_t index : fusion.split_read1_list) {
        const Mate &split = fragments[index].mates[SPLIT_READ];
        if (!split.predicted_strand_ambiguous) {
            if (split.predicted_strand == FORWARD) strand1_forward += 1;
            else strand1_reverse += 1;
        }
    }
    for (int64_t index : fusion.split_read2_list) {
        const Mate &supp = fragments[index].mates[SUPPLEMENTARY];
        if (!supp.predicted_strand_ambiguous) {
            if (supp.predicted_strand == FORWARD) strand1_forward += 1;
            else strand1_reverse += 1;
        }
    }
    for (int64_t index : fusion.discordant_list) {
        const Fragment &fragment = fragments[index];
        if (fragment.mates[MATE1].predicted_strand_ambiguous
            || fragment.filter == hairpin_filter_id)
            continue;
        const Mate *mate1 = &fragment.mates[MATE1];
        const Mate *mate2 = &fragment.mates[MATE2];
        if (mate1->contig != fusion.contig1
            || (mate1->strand == FORWARD) != (fusion.direction1 == DOWNSTREAM)) {
            std::swap(mate1, mate2);
        } else if (mate1->strand == mate2->strand) {
            int64_t mate1_end, mate2_end;
            if (fusion.direction1 == DOWNSTREAM) {
                mate1_end = mate1->end;
                mate2_end = mate2->end;
            } else {
                mate1_end = mate1->start;
                mate2_end = mate2->start;
            }
            int64_t distance1 = std::abs(fusion.breakpoint1 - mate1_end)
                                + std::abs(fusion.breakpoint2 - mate2_end);
            int64_t distance2 = std::abs(fusion.breakpoint2 - mate1_end)
                                + std::abs(fusion.breakpoint1 - mate2_end);
            if (distance1 == distance2) continue;
            if (distance2 < distance1) std::swap(mate1, mate2);
        }
        if (mate1->predicted_strand == FORWARD) strand1_forward += 1;
        else strand1_reverse += 1;
    }

    if (strand1_forward == strand1_reverse) {
        fusion.predicted_strands_ambiguous = true;
    } else {
        fusion.predicted_strands_ambiguous = false;
        fusion.predicted_strand1 =
            strand1_forward > strand1_reverse ? FORWARD : !FORWARD;
        fusion.predicted_strand2 = complement_strand_if(
            fusion.predicted_strand1, fusion.direction1 == fusion.direction2);
    }
}

// fusions.cpp:93-200 (predict_transcript_start)
void predict_transcript_start(FusionData &fusion,
                              const std::vector<uint8_t> &gene_is_dummy) {
    using annotate_engine::engine;
    fusion.transcript_start_ambiguous = false;
    bool g1_strand = engine().gene_strand[fusion.gene1] != 0;
    bool g2_strand = engine().gene_strand[fusion.gene2] != 0;
    bool g1_dummy = gene_is_dummy[fusion.gene1] != 0;
    bool g2_dummy = gene_is_dummy[fusion.gene2] != 0;
    bool is_read_through = fusion.contig1 == fusion.contig2
                           && fusion.breakpoint2 - fusion.breakpoint1 < 400000
                           && fusion.direction1 == DOWNSTREAM
                           && fusion.direction2 == UPSTREAM;

    if (fusion.spliced1 || (!fusion.predicted_strands_ambiguous && !g1_dummy
                            && fusion.predicted_strand1 == g1_strand)) {
        if (g1_strand == FORWARD && fusion.direction1 == DOWNSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else if (g1_strand == FORWARD && fusion.direction1 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        else if (g1_strand != FORWARD && fusion.direction1 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
    } else if (fusion.spliced2
               || (!fusion.predicted_strands_ambiguous && !g2_dummy
                   && fusion.predicted_strand2 == g2_strand)) {
        if (g2_strand == FORWARD && fusion.direction2 == DOWNSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        else if (g2_strand == FORWARD && fusion.direction2 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else if (g2_strand != FORWARD && fusion.direction2 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        else
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
    } else if (!fusion.predicted_strands_ambiguous) {
        if (((fusion.predicted_strand1 == FORWARD && fusion.direction1 == DOWNSTREAM)
             || (fusion.predicted_strand1 != FORWARD && fusion.direction1 == UPSTREAM))
            && ((fusion.predicted_strand2 != FORWARD && fusion.direction2 == DOWNSTREAM)
                || (fusion.predicted_strand2 == FORWARD && fusion.direction2 == UPSTREAM))) {
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        } else if (((fusion.predicted_strand2 == FORWARD && fusion.direction2 == DOWNSTREAM)
                    || (fusion.predicted_strand2 != FORWARD && fusion.direction2 == UPSTREAM))
                   && ((fusion.predicted_strand1 != FORWARD && fusion.direction1 == DOWNSTREAM)
                       || (fusion.predicted_strand1 == FORWARD && fusion.direction1 == UPSTREAM))) {
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        } else {
            fusion.transcript_start_ambiguous = true;
        }
    } else if (!fusion.exonic1 && !fusion.exonic2) {
        fusion.transcript_start_ambiguous = true;
    } else if (!fusion.exonic1 && fusion.exonic2) {
        if (g2_strand == FORWARD && fusion.direction2 == DOWNSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        else if (g2_strand != FORWARD && fusion.direction2 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        else if (fusion.split_reads1 + fusion.split_reads2 == 0 && is_read_through
                 && ((g2_strand == FORWARD && fusion.direction2 == UPSTREAM)
                     || (g2_strand != FORWARD && fusion.direction2 == DOWNSTREAM)))
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else
            fusion.transcript_start_ambiguous = true;
    } else if (!fusion.exonic2 && fusion.exonic1) {
        if (g1_strand == FORWARD && fusion.direction1 == DOWNSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else if (g1_strand != FORWARD && fusion.direction1 == UPSTREAM)
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else if (fusion.split_reads1 + fusion.split_reads2 == 0 && is_read_through
                 && ((g1_strand == FORWARD && fusion.direction1 == UPSTREAM)
                     || (g1_strand != FORWARD && fusion.direction1 == DOWNSTREAM)))
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        else
            fusion.transcript_start_ambiguous = true;
    } else {
        // C++ operator precedence: (!dummy && cond1) || cond2
        if ((!g1_dummy && g1_strand == FORWARD && fusion.direction1 == DOWNSTREAM)
            || (g1_strand != FORWARD && fusion.direction1 == UPSTREAM)) {
            fusion.transcript_start = TRANSCRIPT_START_GENE1;
        } else if ((!g2_dummy && g2_strand == FORWARD && fusion.direction2 == DOWNSTREAM)
                   || (g2_strand != FORWARD && fusion.direction2 == UPSTREAM)) {
            fusion.transcript_start = TRANSCRIPT_START_GENE2;
        } else {
            fusion.transcript_start_ambiguous = true;
        }
    }

    if (fusion.transcript_start_ambiguous)
        fusion.transcript_start = TRANSCRIPT_START_GENE1;

    if (!fusion.transcript_start_ambiguous && fusion.predicted_strands_ambiguous) {
        fusion.predicted_strands_ambiguous = false;
        if (fusion.transcript_start == TRANSCRIPT_START_GENE1) {
            fusion.predicted_strand1 = g1_strand;
            fusion.predicted_strand2 = complement_strand_if(
                fusion.predicted_strand1, fusion.direction1 == fusion.direction2);
        } else {
            fusion.predicted_strand2 = g2_strand;
            fusion.predicted_strand1 = complement_strand_if(
                fusion.predicted_strand2, fusion.direction1 == fusion.direction2);
        }
    }
}

}  // namespace

// find_fusions_native(max_mate_gap, subsampling_threshold, filter_none_unused)
// -> (columns..., lists..., swapped fragment indices, subsampled, remaining)
PyObject *find_fusions_native(PyObject *, PyObject *args) {
    long long max_mate_gap, subsampling_threshold;
    int keep = 0;
    if (!PyArg_ParseTuple(args, "LL|i", &max_mate_gap, &subsampling_threshold,
                          &keep))
        return nullptr;
    cascade_store::Cascade &c = cascade_store::cascade();
    if (!c.ready) {
        PyErr_SetString(PyExc_RuntimeError, "cascade store not populated");
        return nullptr;
    }
    const int64_t hairpin_filter_id = c.params.filter_ids[11];
    const int64_t duplicates_filter_id = c.params.filter_ids[0];

    std::vector<FusionData> fusions;
    std::unordered_map<std::array<int64_t, 8>, size_t, KeyHash<8>> by_key;
    by_key.reserve(c.fragments.size());  /* avoid rehash storms */
    std::unordered_map<std::array<int64_t, 4>, std::vector<std::array<int64_t, 3>>,
                       KeyHash<4>>
        discordant_by_gene_pair;  // (g1,g2,d1,d2) -> [(bp1,bp2,frag_index)]
    bool subsampled = false;
    std::vector<int64_t> swapped;

    // first pass (fusions.cpp:203-366)
    for (size_t fragment_index = 0; fragment_index < c.fragments.size();
         ++fragment_index) {
        Fragment &fragment = c.fragments[fragment_index];
        if (fragment.n_mates == 3) {  // split read
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            int64_t contig1 = split.contig, contig2 = supp.contig;
            int64_t breakpoint1 = split.strand == FORWARD ? split.start : split.end;
            int64_t breakpoint2 = supp.strand == FORWARD ? supp.end : supp.start;
            const int64_t *genes1 = split.genes, *genes2 = supp.genes;
            int64_t n_genes1 = split.n_genes, n_genes2 = supp.n_genes;
            bool direction1 = split.strand == FORWARD ? UPSTREAM : DOWNSTREAM;
            bool direction2 = supp.strand == FORWARD ? DOWNSTREAM : UPSTREAM;
            bool exonic1 = split.exonic, exonic2 = supp.exonic;
            const Mate &m1 = fragment.mates[MATE1];
            int64_t anchor_start1 = m1.strand == FORWARD ? m1.start : m1.end;
            int64_t anchor_start2 = supp.strand == FORWARD ? supp.start : supp.end;

            bool is_swapped = false;
            if (contig1 > contig2
                || (contig1 == contig2 && breakpoint1 > breakpoint2)) {
                std::swap(contig1, contig2);
                std::swap(breakpoint1, breakpoint2);
                std::swap(genes1, genes2);
                std::swap(n_genes1, n_genes2);
                std::swap(direction1, direction2);
                std::swap(exonic1, exonic2);
                std::swap(anchor_start1, anchor_start2);
                is_swapped = true;
            }

            for (int64_t i = 0; i < n_genes1; ++i) {
                for (int64_t j = 0; j < n_genes2; ++j) {
                    int64_t gene1 = genes1[i], gene2 = genes2[j];
                    std::array<int64_t, 8> key{gene1, gene2, contig1, contig2,
                                               breakpoint1, breakpoint2,
                                               direction1, direction2};
                    auto found = by_key.find(key);
                    bool is_new = found == by_key.end();
                    size_t index;
                    if (is_new) {
                        index = fusions.size();
                        by_key.emplace(key, index);
                        fusions.push_back(FusionData{gene1, gene2, contig1,
                                                     contig2, breakpoint1,
                                                     breakpoint2, direction1,
                                                     direction2});
                    } else {
                        index = found->second;
                    }
                    FusionData &fusion = fusions[index];
                    fusion.exonic1 = exonic1 || fusion.exonic1;
                    fusion.exonic2 = exonic2 || fusion.exonic2;
                    if (is_new || fragment.filter == 0
                        || fusion.filter == duplicates_filter_id)
                        fusion.filter = fragment.filter;

                    if ((fusion.split_reads1 >= subsampling_threshold && !is_swapped)
                        || (fusion.split_reads2 >= subsampling_threshold && is_swapped)
                        || (fragment.filter != 0 && !is_swapped
                            && (int64_t)fusion.split_read1_list.size()
                                   >= subsampling_threshold)
                        || (fragment.filter != 0 && is_swapped
                            && (int64_t)fusion.split_read2_list.size()
                                   >= subsampling_threshold)) {
                        subsampled = true;
                    } else {
                        expand_anchor(fusion, 1, anchor_start1);
                        expand_anchor(fusion, 2, anchor_start2);
                        if (is_swapped) {
                            fusion.split_read2_list.push_back((int64_t)fragment_index);
                            if (fragment.filter == 0) fusion.split_reads2 += 1;
                        } else {
                            fusion.split_read1_list.push_back((int64_t)fragment_index);
                            if (fragment.filter == 0) fusion.split_reads1 += 1;
                        }
                    }
                }
            }
        } else if (fragment.n_mates == 2) {  // discordant mates
            const Mate &m1 = fragment.mates[MATE1];
            const Mate &m2 = fragment.mates[MATE2];
            int64_t contig1 = m1.contig, contig2 = m2.contig;
            int64_t breakpoint1 = m1.strand == FORWARD ? m1.end : m1.start;
            int64_t breakpoint2 = m2.strand == FORWARD ? m2.end : m2.start;
            const int64_t *genes1 = m1.genes, *genes2 = m2.genes;
            int64_t n_genes1 = m1.n_genes, n_genes2 = m2.n_genes;
            bool direction1 = m1.strand == FORWARD ? DOWNSTREAM : UPSTREAM;
            bool direction2 = m2.strand == FORWARD ? DOWNSTREAM : UPSTREAM;
            bool exonic1 = m1.exonic, exonic2 = m2.exonic;
            int64_t anchor_start1 = m1.strand == FORWARD ? m1.start : m1.end;
            int64_t anchor_start2 = m2.strand == FORWARD ? m2.start : m2.end;

            if (contig1 > contig2
                || (contig1 == contig2 && breakpoint1 > breakpoint2)) {
                std::swap(contig1, contig2);
                std::swap(breakpoint1, breakpoint2);
                std::swap(genes1, genes2);
                std::swap(n_genes1, n_genes2);
                std::swap(direction1, direction2);
                std::swap(exonic1, exonic2);
                std::swap(anchor_start1, anchor_start2);
            }

            for (int64_t i = 0; i < n_genes1; ++i) {
                for (int64_t j = 0; j < n_genes2; ++j) {
                    int64_t gene1 = genes1[i], gene2 = genes2[j];
                    std::array<int64_t, 8> key{gene1, gene2, contig1, contig2,
                                               breakpoint1, breakpoint2,
                                               direction1, direction2};
                    auto found = by_key.find(key);
                    bool is_new = found == by_key.end();
                    size_t index;
                    if (is_new) {
                        index = fusions.size();
                        by_key.emplace(key, index);
                        fusions.push_back(FusionData{gene1, gene2, contig1,
                                                     contig2, breakpoint1,
                                                     breakpoint2, direction1,
                                                     direction2});
                    } else {
                        index = found->second;
                    }
                    FusionData &fusion = fusions[index];
                    fusion.exonic1 = exonic1 || fusion.exonic1;
                    fusion.exonic2 = exonic2 || fusion.exonic2;
                    if (is_new || fragment.filter == 0
                        || fusion.filter == duplicates_filter_id)
                        fusion.filter = fragment.filter;
                    expand_anchor(fusion, 1, anchor_start1);
                    expand_anchor(fusion, 2, anchor_start2);
                    std::array<int64_t, 4> pair_key{gene1, gene2, direction1,
                                                    direction2};
                    discordant_by_gene_pair[pair_key].push_back(
                        {breakpoint1, breakpoint2, (int64_t)fragment_index});
                }
            }
        }
    }

    // second pass: assign discordant mates to fusions (fusions.cpp:368-437)
    for (FusionData &fusion : fusions) {
        if (fusion.filter != 0) continue;
        auto found = discordant_by_gene_pair.find(
            {fusion.gene1, fusion.gene2, fusion.direction1, fusion.direction2});
        if (found == discordant_by_gene_pair.end()) continue;
        int64_t max_overlap =
            (fusion.split_read1_list.size() + fusion.split_read2_list.size() > 0)
                ? 2 : max_mate_gap;
        int64_t fusion_bp1 = fusion.direction1 == DOWNSTREAM
                                 ? fusion.breakpoint1 + max_overlap
                                 : fusion.breakpoint1 - max_overlap;
        int64_t fusion_bp2 = fusion.direction2 == DOWNSTREAM
                                 ? fusion.breakpoint2 + max_overlap
                                 : fusion.breakpoint2 - max_overlap;

        for (const std::array<int64_t, 3> &candidate : found->second) {
            int64_t bp1 = candidate[0], bp2 = candidate[1];
            int64_t fragment_index = candidate[2];
            if (!(((fusion.direction1 == DOWNSTREAM && bp1 <= fusion_bp1)
                   || (fusion.direction1 == UPSTREAM && bp1 >= fusion_bp1))
                  && ((fusion.direction2 == DOWNSTREAM && bp2 <= fusion_bp2)
                      || (fusion.direction2 == UPSTREAM && bp2 >= fusion_bp2))))
                continue;
            // mate breakpoints must not stray into the partner gene, unless
            // they are close to the fusion breakpoints (fusions.cpp:392-396)
            bool intragenic =
                fusion.gene1 == fusion.gene2
                || (c.gene_start[fusion.gene2] - 10000 <= fusion.breakpoint1
                    && fusion.breakpoint1 <= c.gene_end[fusion.gene2] + 10000
                    && c.gene_start[fusion.gene1] - 10000 <= fusion.breakpoint2
                    && fusion.breakpoint2 <= c.gene_end[fusion.gene1] + 10000);
            bool not_overlapping =
                !intragenic
                && !(c.gene_start[fusion.gene2] <= bp1
                     && bp1 <= c.gene_end[fusion.gene2])
                && !(c.gene_start[fusion.gene1] <= bp2
                     && bp2 <= c.gene_end[fusion.gene1]);
            bool close = std::abs(fusion.breakpoint1 - bp1) <= max_mate_gap
                         && std::abs(fusion.breakpoint2 - bp2) <= max_mate_gap;
            if (!(not_overlapping || close)) continue;

            Fragment &fragment = c.fragments[fragment_index];
            if (fragment.filter != 0
                && (int64_t)fusion.discordant_list.size() >= subsampling_threshold) {
                subsampled = true;
                continue;
            }
            if (fusion.discordant_mates >= subsampling_threshold) {
                subsampled = true;
                break;
            }

            fusion.discordant_list.push_back(fragment_index);
            if (fragment.filter == 0) fusion.discordant_mates += 1;

            // canonicalize the fragment in place: MATE1 = lower coordinate
            Mate &mate1 = fragment.mates[MATE1];
            Mate &mate2 = fragment.mates[MATE2];
            int64_t mate1_bp = mate1.strand == FORWARD ? mate1.end : mate1.start;
            int64_t mate2_bp = mate2.strand == FORWARD ? mate2.end : mate2.start;
            if (mate1.contig > mate2.contig
                || (mate1.contig == mate2.contig && mate1_bp > mate2_bp)) {
                std::swap(fragment.mates[MATE1], fragment.mates[MATE2]);
                // keep the retained extraction store consistent so the lazy
                // Python materialization sees the canonicalized order; then
                // re-anchor the cascade Mate payload pointers (a short
                // std::string swap copies SSO bytes instead of heap pointers,
                // so pointer identity cannot be relied on)
                extract_store::ExtractStore &retained = extract_store::store();
                if (retained.ready
                    && (size_t)fragment_index < retained.fragments.size()) {
                    std::vector<extract_store::ExtractMate> &mates =
                        retained.fragments[fragment_index].mates;
                    if (mates.size() > 1) {
                        std::swap(mates[MATE1], mates[MATE2]);
                        for (int m = 0; m < 2; ++m) {
                            Mate &cascade_mate = fragment.mates[m];
                            const extract_store::ExtractMate &source = mates[m];
                            cascade_mate.cigar = source.cigar.data();
                            cascade_mate.n_cigar = (int64_t)source.cigar.size();
                            cascade_mate.seq = source.seq.data();
                            cascade_mate.seq_len = (int64_t)source.seq.size();
                            cascade_mate.genes = source.genes.data();
                            cascade_mate.n_genes = (int64_t)source.genes.size();
                        }
                    }
                }
                swapped.push_back(fragment_index);
            }
            Mate &swapped_mate1 = fragment.mates[MATE1];
            Mate &swapped_mate2 = fragment.mates[MATE2];

            if (fusion.direction1 == DOWNSTREAM
                && (swapped_mate1.start < fusion.anchor_start1
                    || fusion.anchor_start1 == 0))
                fusion.anchor_start1 = swapped_mate1.start;
            else if (fusion.direction1 == UPSTREAM
                     && (swapped_mate1.end > fusion.anchor_start1
                         || fusion.anchor_start1 == 0))
                fusion.anchor_start1 = swapped_mate1.end;
            if (fusion.direction2 == DOWNSTREAM
                && (swapped_mate2.start < fusion.anchor_start2
                    || fusion.anchor_start2 == 0))
                fusion.anchor_start2 = swapped_mate2.start;
            else if (fusion.direction2 == UPSTREAM
                     && (swapped_mate2.end > fusion.anchor_start2
                         || fusion.anchor_start2 == 0))
                fusion.anchor_start2 = swapped_mate2.end;
        }
    }

    // final pass: strand prediction, splice flags, transcript start
    // (fusions.cpp:364-383 + 15-200, 448-461)
    using annotate_engine::engine;
    int64_t remaining = 0;
    for (FusionData &fusion : fusions) {
        predict_fusion_strands(fusion, c.fragments, hairpin_filter_id);
        if (fusion.split_read1_list.size() + fusion.split_read2_list.size() == 0
            || fusion.predicted_strands_ambiguous) {
            fusion.spliced1 = false;
            fusion.spliced2 = false;
        } else {
            fusion.spliced1 =
                fusion.exonic1
                && (engine().gene_strand[fusion.gene1] != 0) == fusion.predicted_strand1
                && annotate_engine::is_breakpoint_spliced(
                       fusion.gene1, fusion.direction1, fusion.breakpoint1);
            fusion.spliced2 =
                fusion.exonic2
                && (engine().gene_strand[fusion.gene2] != 0) == fusion.predicted_strand2
                && annotate_engine::is_breakpoint_spliced(
                       fusion.gene2, fusion.direction2, fusion.breakpoint2);
        }
        predict_transcript_start(fusion, c.gene_is_dummy);
        if (fusion.filter == 0) remaining += 1;
    }

    // hand the table to the event store: the native event cascade mutates it
    // in place (arriba.cpp:420-585 stage order) and Python materializes the
    // Fusion objects once, at the end, via event_export
    event_store::Store &es = event_store::store();
    es.fusions = std::move(fusions);
    es.ready = true;
    es.subsampled = subsampled;

    if (keep) {
        return Py_BuildValue(
            "(y#iL)",
            swapped.empty() ? "" : (const char *)swapped.data(),
            (Py_ssize_t)(swapped.size() * 8), subsampled ? 1 : 0,
            (long long)remaining);
    }

    // legacy single-call mode: serialize immediately and drop the store
    PyObject *serialized = event_store::serialize_fusions_py();
    if (serialized == nullptr) {
        event_store::release_store();
        return nullptr;
    }
    PyObject *result = Py_BuildValue(
        "(OOOOOOy#iL)", PyTuple_GET_ITEM(serialized, 0),
        PyTuple_GET_ITEM(serialized, 1), PyTuple_GET_ITEM(serialized, 2),
        PyTuple_GET_ITEM(serialized, 3), PyTuple_GET_ITEM(serialized, 4),
        PyTuple_GET_ITEM(serialized, 5),
        swapped.empty() ? "" : (const char *)swapped.data(),
        (Py_ssize_t)(swapped.size() * 8), subsampled ? 1 : 0,
        (long long)remaining);
    Py_DECREF(serialized);
    event_store::release_store();
    return result;
}

PyObject *cascade_release(PyObject *, PyObject *) {
    cascade_store::release_cascade();
    Py_RETURN_NONE;
}
