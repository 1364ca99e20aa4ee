// Shared view of the event-level fusion store. find_fusions (fusions.cpp)
// populates it; the event-cascade stages (event.cpp) mutate it in place so
// the fusion table never round-trips through Python mid-cascade. Python
// materializes Fusion objects once, via event_export, after the last native
// stage (reference pipeline: arriba.cpp:411-612).
#pragma once

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <vector>

namespace event_store {

// fusion_t (reference common.hpp:237-285) in columnar-friendly form; the
// support lists hold fragment indices into the cascade store.
struct EventFusion {
    int64_t gene1, gene2, contig1, contig2, breakpoint1, breakpoint2;
    bool direction1, direction2;
    bool exonic1 = false, exonic2 = false;
    int64_t filter = 0;
    int64_t split_reads1 = 0, split_reads2 = 0, discordant_mates = 0;
    int64_t anchor_start1 = 0, anchor_start2 = 0;
    bool predicted_strand1 = true, predicted_strand2 = true;
    bool predicted_strands_ambiguous = true;
    bool transcript_start = true;  // TRANSCRIPT_START_GENE1
    bool transcript_start_ambiguous = true;
    bool spliced1 = false, spliced2 = false;
    float evalue = 0.0f;
    int64_t confidence = 0;  // CONFIDENCE_LOW
    int64_t closest_genomic_breakpoint1 = -1, closest_genomic_breakpoint2 = -1;
    std::vector<int64_t> split_read1_list, split_read2_list, discordant_list;

    int64_t supporting_reads() const {
        return split_reads1 + split_reads2 + discordant_mates;
    }
    // common.hpp:265-269
    bool is_read_through() const {
        return contig1 == contig2 && breakpoint2 - breakpoint1 < 400000
               && direction1 == /*DOWNSTREAM*/ false
               && direction2 == /*UPSTREAM*/ true;
    }
    // common.hpp:270-274
    bool is_internal_tandem_duplication(int64_t max_itd_length) const {
        return gene1 == gene2 && breakpoint2 - breakpoint1 >= 0
               && breakpoint2 - breakpoint1 < max_itd_length
               && direction1 == /*UPSTREAM*/ true
               && direction2 == /*DOWNSTREAM*/ false;
    }
};

// Interval index mirror of arriba_tpu/annotation/index.py (CSR per contig);
// used for the gene-level point queries of filter_in_vitro.cpp:20-33.
struct GeneIndex {
    int n_contigs = 0;
    std::vector<std::vector<int64_t>> boundaries, offsets, items;
};

// The filter-id array Python passes to event_bind, in this exact order
// (see native_cascade.py EVENT_FILTER_ORDER).
enum FilterName {
    F_DUPLICATES = 0, F_HAIRPIN, F_INCONSISTENTLY_CLIPPED, F_MISMATCHES,
    F_MERGE_ADJACENT, F_MULTIMAPPERS, F_RELATIVE_SUPPORT,
    F_NON_CODING_NEIGHBORS, F_INTRAGENIC_EXONIC, F_MIN_SUPPORT, F_ITD,
    F_INTRONIC, F_IN_VITRO, F_SELECT_BEST, F_MARGINAL_READ_THROUGH,
    F_NO_GENOMIC_SUPPORT, F_BLACKLIST, F_SHORT_ANCHOR, F_END_TO_END,
    F_NO_COVERAGE, F_HOMOLOGS, F_MISMAPPERS, F_ISOFORMS, F_HOMOPOLYMER,
    F_UNINTERESTING_CONTIGS,
    F_COUNT
};

struct Store {
    std::vector<EventFusion> fusions;
    bool ready = false;
    bool subsampled = false;

    // bound context (event_bind)
    std::vector<uint8_t> gene_is_protein_coding;
    std::vector<int64_t> gene_exonic_length;
    GeneIndex gene_index;
    std::vector<const uint8_t *> frag_starts, frag_ends;  // coverage bitmaps
    std::vector<int64_t> frag_starts_len, frag_ends_len;
    std::vector<int64_t> cluster_ids;  // per fragment, multimapper grouping
    std::vector<Py_buffer> held;
    int64_t filter_ids[F_COUNT] = {0};
    bool bound = false;
};

Store &store();
void release_store();

// 6-tuple (columns_b, evalue_b, confidence_b, closest_b, offsets_b, items_b)
// of the current fusion table (implemented in event.cpp)
PyObject *serialize_fusions_py();
PyObject *serialize_fusions_py(bool lists_passing_only);

}  // namespace event_store
