// Native event-level cascade over the fusion table produced by
// find_fusions_native. Each stage is an exact port of its Python twin in
// arriba_tpu/filters/{event_level,multimappers,in_vitro,genomic_support,
// blacklist,homologs,mismappers}.py, which in turn mirror the reference
// filters (file:line cited per stage). The table lives in event_store and
// never round-trips through Python until event_export.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "annotate.h"
#include "cascade.h"
#include "event.h"

namespace event_store {

Store &store() {
    static Store instance;
    return instance;
}

void release_store() {
    Store &s = store();
    for (Py_buffer &view : s.held)
        PyBuffer_Release(&view);
    s.held.clear();
    s.fusions.clear();
    s.fusions.shrink_to_fit();
    s.gene_is_protein_coding.clear();
    s.gene_exonic_length.clear();
    s.gene_index = GeneIndex();
    s.frag_starts.clear();
    s.frag_ends.clear();
    s.frag_starts_len.clear();
    s.frag_ends_len.clear();
    s.cluster_ids.clear();
    s.ready = false;
    s.bound = false;
}

PyObject *serialize_fusions_py() {
    Store &s = store();
    size_t n = s.fusions.size();
    std::vector<int64_t> columns(n * 17);
    std::vector<float> evalues(n);
    std::vector<int64_t> confidences(n);
    std::vector<int64_t> closest(n * 2);
    std::vector<int64_t> list_offsets(3 * (n + 1), 0);
    std::vector<int64_t> list_items;
    for (size_t i = 0; i < n; ++i) {
        const EventFusion &fusion = s.fusions[i];
        int64_t *row = columns.data() + i * 17;
        row[0] = fusion.gene1;
        row[1] = fusion.gene2;
        row[2] = fusion.contig1;
        row[3] = fusion.contig2;
        row[4] = fusion.breakpoint1;
        row[5] = fusion.breakpoint2;
        row[6] = fusion.direction1;
        row[7] = fusion.direction2;
        row[8] = fusion.filter;
        row[9] = fusion.split_reads1;
        row[10] = fusion.split_reads2;
        row[11] = fusion.discordant_mates;
        row[12] = fusion.anchor_start1;
        row[13] = fusion.anchor_start2;
        row[14] = (fusion.exonic1 ? 1 : 0) | (fusion.exonic2 ? 2 : 0)
                  | (fusion.predicted_strand1 ? 4 : 0)
                  | (fusion.predicted_strand2 ? 8 : 0)
                  | (fusion.predicted_strands_ambiguous ? 16 : 0)
                  | (fusion.transcript_start ? 32 : 0)
                  | (fusion.transcript_start_ambiguous ? 64 : 0)
                  | (fusion.spliced1 ? 128 : 0) | (fusion.spliced2 ? 256 : 0);
        row[15] = 0;
        row[16] = 0;
        evalues[i] = fusion.evalue;
        confidences[i] = fusion.confidence;
        closest[i * 2] = fusion.closest_genomic_breakpoint1;
        closest[i * 2 + 1] = fusion.closest_genomic_breakpoint2;
    }
    for (int which = 0; which < 3; ++which) {
        int64_t *offsets = list_offsets.data() + which * (n + 1);
        for (size_t i = 0; i < n; ++i) {
            const std::vector<int64_t> &list =
                which == 0 ? s.fusions[i].split_read1_list
                : which == 1 ? s.fusions[i].split_read2_list
                             : s.fusions[i].discordant_list;
            list_items.insert(list_items.end(), list.begin(), list.end());
            offsets[i + 1] = offsets[i] + (int64_t)list.size();
        }
    }
    {  // convert per-list offsets to absolute positions in list_items
        int64_t base = list_offsets[n];
        for (size_t i = 0; i <= n; ++i)
            list_offsets[(n + 1) + i] += base;
        base = list_offsets[(n + 1) + n];
        for (size_t i = 0; i <= n; ++i)
            list_offsets[2 * (n + 1) + i] += base;
    }
    return Py_BuildValue(
        "(y#y#y#y#y#y#)",
        n ? (const char *)columns.data() : "", (Py_ssize_t)(columns.size() * 8),
        n ? (const char *)evalues.data() : "", (Py_ssize_t)(evalues.size() * 4),
        n ? (const char *)confidences.data() : "",
        (Py_ssize_t)(confidences.size() * 8),
        n ? (const char *)closest.data() : "", (Py_ssize_t)(closest.size() * 8),
        (const char *)list_offsets.data(), (Py_ssize_t)(list_offsets.size() * 8),
        list_items.empty() ? "" : (const char *)list_items.data(),
        (Py_ssize_t)(list_items.size() * 8));
}

}  // namespace event_store

namespace {

using cascade_store::Fragment;
using cascade_store::Mate;
using event_store::EventFusion;
using event_store::Store;

constexpr bool FORWARD = true, REVERSE = false;
constexpr bool UPSTREAM = true, DOWNSTREAM = false;
constexpr int MATE1 = 0, MATE2 = 1, SPLIT_READ = 1, SUPPLEMENTARY = 2;
constexpr int64_t CONFIDENCE_LOW = 0, CONFIDENCE_MEDIUM = 1, CONFIDENCE_HIGH = 2;

int64_t fid(event_store::FilterName name) {
    return event_store::store().filter_ids[name];
}

// common.hpp:260-264
bool breakpoint_overlaps_both_genes(const EventFusion &f, int which = 0) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (which == 1)
        return c.gene_start[f.gene2] <= f.breakpoint1
               && f.breakpoint1 <= c.gene_end[f.gene2];
    if (which == 2)
        return c.gene_start[f.gene1] <= f.breakpoint2
               && f.breakpoint2 <= c.gene_end[f.gene1];
    return breakpoint_overlaps_both_genes(f, 1)
           || breakpoint_overlaps_both_genes(f, 2);
}

// common.hpp:275-279
bool is_intragenic(const EventFusion &f) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    return f.gene1 == f.gene2
           || (c.gene_start[f.gene2] - 10000 <= f.breakpoint1
               && f.breakpoint1 <= c.gene_end[f.gene2] + 10000
               && c.gene_start[f.gene1] - 10000 <= f.breakpoint2
               && f.breakpoint2 <= c.gene_end[f.gene1] + 10000);
}

// common.hpp:280-284
bool both_breakpoints_spliced(const EventFusion &f) {
    using annotate_engine::engine;
    bool same_strand = (engine().gene_strand[f.gene1] != 0)
                       == (engine().gene_strand[f.gene2] != 0);
    return f.spliced1 && f.spliced2
           && (same_strand == (f.direction1 != f.direction2));
}

// read_stats.cpp:295-306 over the cascade store's coverage planes
constexpr int64_t COVERAGE_RESOLUTION = 20;

int64_t get_coverage(int64_t contig, int64_t position, bool direction) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (contig >= (int64_t)c.coverage.size() || c.coverage[contig] == nullptr
        || c.coverage_len[contig] == 0)
        return -1;
    if (direction == UPSTREAM) {
        if (position < COVERAGE_RESOLUTION) return 0;
        return c.coverage[contig][position / COVERAGE_RESOLUTION - 1];
    }
    return c.coverage[contig][position / COVERAGE_RESOLUTION + 1];
}

int64_t coverage_around(const EventFusion &f, int which) {
    // the common get_coverage(breakpoint, opposite-of-direction) idiom
    if (which == 1)
        return get_coverage(f.contig1, f.breakpoint1,
                            f.direction1 == UPSTREAM ? DOWNSTREAM : UPSTREAM);
    return get_coverage(f.contig2, f.breakpoint2,
                        f.direction2 == UPSTREAM ? DOWNSTREAM : UPSTREAM);
}

int64_t count_remaining() {
    int64_t remaining = 0;
    for (const EventFusion &f : event_store::store().fusions)
        if (f.filter == 0) remaining += 1;
    return remaining;
}

bool require_ready() {
    if (!event_store::store().ready || !cascade_store::cascade().ready) {
        PyErr_SetString(PyExc_RuntimeError, "event store not populated");
        return false;
    }
    return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// event_bind: per-run context the event stages need beyond the cascade store

PyObject *event_bind(PyObject *, PyObject *args) {
    PyObject *protein_coding_obj, *exonic_length_obj, *cluster_ids_obj;
    PyObject *gene_boundaries_list, *gene_offsets_list, *gene_items_list;
    PyObject *starts_list, *ends_list, *filter_ids_obj;
    if (!PyArg_ParseTuple(args, "OOOOOOOOO", &protein_coding_obj,
                          &exonic_length_obj, &cluster_ids_obj,
                          &gene_boundaries_list, &gene_offsets_list,
                          &gene_items_list, &starts_list, &ends_list,
                          &filter_ids_obj))
        return nullptr;
    Store &s = event_store::store();
    for (Py_buffer &view : s.held)  // drop pins of any previous run
        PyBuffer_Release(&view);
    s.held.clear();

    auto copy_int64 = [](PyObject *obj, std::vector<int64_t> &out) -> bool {
        Py_buffer view;
        if (PyObject_GetBuffer(obj, &view, PyBUF_SIMPLE) != 0) return false;
        const int64_t *data = (const int64_t *)view.buf;
        out.assign(data, data + view.len / 8);
        PyBuffer_Release(&view);
        return true;
    };

    std::vector<int64_t> protein_coding;
    if (!copy_int64(protein_coding_obj, protein_coding)) return nullptr;
    s.gene_is_protein_coding.assign(protein_coding.begin(), protein_coding.end());
    if (!copy_int64(exonic_length_obj, s.gene_exonic_length)) return nullptr;
    if (!copy_int64(cluster_ids_obj, s.cluster_ids)) return nullptr;

    Py_ssize_t n_contigs = PyList_Size(gene_boundaries_list);
    s.gene_index.n_contigs = (int)n_contigs;
    s.gene_index.boundaries.resize(n_contigs);
    s.gene_index.offsets.resize(n_contigs);
    s.gene_index.items.resize(n_contigs);
    for (Py_ssize_t i = 0; i < n_contigs; ++i) {
        if (!copy_int64(PyList_GET_ITEM(gene_boundaries_list, i),
                        s.gene_index.boundaries[i])
            || !copy_int64(PyList_GET_ITEM(gene_offsets_list, i),
                           s.gene_index.offsets[i])
            || !copy_int64(PyList_GET_ITEM(gene_items_list, i),
                           s.gene_index.items[i]))
            return nullptr;
    }

    // coverage fragment-start/end bitmaps: borrow the numpy buffers
    Py_ssize_t n_cov = PyList_Size(starts_list);
    s.frag_starts.assign(n_cov, nullptr);
    s.frag_ends.assign(n_cov, nullptr);
    s.frag_starts_len.assign(n_cov, 0);
    s.frag_ends_len.assign(n_cov, 0);
    for (Py_ssize_t i = 0; i < n_cov; ++i) {
        PyObject *start_obj = PyList_GET_ITEM(starts_list, i);
        PyObject *end_obj = PyList_GET_ITEM(ends_list, i);
        if (start_obj != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(start_obj, &view, PyBUF_SIMPLE) != 0)
                return nullptr;
            s.frag_starts[i] = (const uint8_t *)view.buf;
            s.frag_starts_len[i] = view.len;
            s.held.push_back(view);
        }
        if (end_obj != Py_None) {
            Py_buffer view;
            if (PyObject_GetBuffer(end_obj, &view, PyBUF_SIMPLE) != 0)
                return nullptr;
            s.frag_ends[i] = (const uint8_t *)view.buf;
            s.frag_ends_len[i] = view.len;
            s.held.push_back(view);
        }
    }

    std::vector<int64_t> filter_ids;
    if (!copy_int64(filter_ids_obj, filter_ids)) return nullptr;
    if ((int)filter_ids.size() != (int)event_store::F_COUNT) {
        PyErr_SetString(PyExc_ValueError, "filter id array size mismatch");
        return nullptr;
    }
    std::copy(filter_ids.begin(), filter_ids.end(), s.filter_ids);
    s.bound = true;
    Py_RETURN_NONE;
}

PyObject *event_export(PyObject *, PyObject *) {
    if (!event_store::store().ready) {
        PyErr_SetString(PyExc_RuntimeError, "event store not populated");
        return nullptr;
    }
    PyObject *serialized = event_store::serialize_fusions_py();
    if (serialized == nullptr) return nullptr;
    // per-fragment filter ids (event stages may have changed them)
    const cascade_store::Cascade &c = cascade_store::cascade();
    std::vector<int64_t> filters(c.fragments.size());
    for (size_t i = 0; i < c.fragments.size(); ++i)
        filters[i] = c.fragments[i].filter;
    PyObject *result = Py_BuildValue(
        "(OOOOOOy#)", PyTuple_GET_ITEM(serialized, 0),
        PyTuple_GET_ITEM(serialized, 1), PyTuple_GET_ITEM(serialized, 2),
        PyTuple_GET_ITEM(serialized, 3), PyTuple_GET_ITEM(serialized, 4),
        PyTuple_GET_ITEM(serialized, 5),
        filters.empty() ? "" : (const char *)filters.data(),
        (Py_ssize_t)(filters.size() * 8));
    Py_DECREF(serialized);
    return result;
}

PyObject *event_release(PyObject *, PyObject *) {
    event_store::release_store();
    cascade_store::release_cascade();
    Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// merge_adjacent_fusions.cpp:19-108 (event_level.py:48-124)

PyObject *ev_merge_adjacent(PyObject *, PyObject *args) {
    long long max_distance, max_itd_length;
    if (!PyArg_ParseTuple(args, "LL", &max_distance, &max_itd_length))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();

    std::vector<EventFusion *> sorted_fusions;
    sorted_fusions.reserve(s.fusions.size());
    for (EventFusion &f : s.fusions)
        if (f.filter == 0 || f.is_internal_tandem_duplication(max_itd_length))
            sorted_fusions.push_back(&f);
    std::stable_sort(sorted_fusions.begin(), sorted_fusions.end(),
                     [](const EventFusion *a, const EventFusion *b) {
                         if (a->contig1 != b->contig1) return a->contig1 < b->contig1;
                         if (a->breakpoint1 != b->breakpoint1)
                             return a->breakpoint1 < b->breakpoint1;
                         if (a->contig2 != b->contig2) return a->contig2 < b->contig2;
                         return a->breakpoint2 < b->breakpoint2;
                     });

    int64_t n = (int64_t)sorted_fusions.size();
    std::vector<EventFusion *> adjacent;
    for (int64_t i = 0; i < n; ++i) {
        EventFusion &fusion = *sorted_fusions[i];
        bool is_itd = fusion.is_internal_tandem_duplication(max_itd_length);
        if ((!is_itd && fusion.split_reads1 + fusion.split_reads2 == 0)
            || (is_itd && fusion.split_read1_list.size()
                              + fusion.split_read2_list.size() == 0))
            continue;  // only merge fusions with exactly known breakpoints

        int64_t shift_sign_up = fusion.direction1 == fusion.direction2 ? 1 : -1;
        adjacent.clear();

        // look upstream for mergeable breakpoints
        for (int64_t j = i - 1;
             j >= 0 && sorted_fusions[j]->contig1 == fusion.contig1
             && sorted_fusions[j]->breakpoint1 >= fusion.breakpoint1 - max_distance;
             --j) {
            EventFusion &prev = *sorted_fusions[j];
            if (prev.gene1 == fusion.gene1 && prev.gene2 == fusion.gene2
                && prev.direction1 == fusion.direction1
                && prev.direction2 == fusion.direction2
                && prev.contig2 == fusion.contig2
                && (prev.breakpoint2
                        == fusion.breakpoint2
                               + (fusion.breakpoint1 - prev.breakpoint1)
                                     * shift_sign_up
                    || (is_itd
                        && std::abs(fusion.breakpoint2 - prev.breakpoint2)
                               <= max_distance))) {
                if (prev.split_reads1 + prev.split_reads2 > 0
                    || (is_itd && prev.split_read1_list.size()
                                      + prev.split_read2_list.size() > 0))
                    adjacent.push_back(&prev);
            }
        }

        // look downstream for mergeable breakpoints
        for (int64_t j = i + 1;
             j < n && sorted_fusions[j]->contig1 == fusion.contig1
             && sorted_fusions[j]->breakpoint1 <= fusion.breakpoint1 + max_distance;
             ++j) {
            EventFusion &foll = *sorted_fusions[j];
            if (foll.gene1 == fusion.gene1 && foll.gene2 == fusion.gene2
                && foll.direction1 == fusion.direction1
                && foll.direction2 == fusion.direction2
                && foll.contig2 == fusion.contig2
                && (foll.breakpoint2
                        == fusion.breakpoint2
                               + (foll.breakpoint1 - fusion.breakpoint1)
                                     * -shift_sign_up
                    || (is_itd
                        && std::abs(fusion.breakpoint2 - foll.breakpoint2)
                               <= max_distance))) {
                if (foll.split_reads1 + foll.split_reads2 > 0
                    || (is_itd && foll.split_read1_list.size()
                                      + foll.split_read2_list.size() > 0))
                    adjacent.push_back(&foll);
            }
        }

        // select the one with the most supporting alignments
        int64_t sum_split_reads1 = 0, sum_split_reads2 = 0;
        bool fusion_has_most_support = true;
        for (EventFusion *other : adjacent) {
            int64_t f_lists = (int64_t)(fusion.split_read1_list.size()
                                        + fusion.split_read2_list.size());
            int64_t o_lists = (int64_t)(other->split_read1_list.size()
                                        + other->split_read2_list.size());
            if (fusion.supporting_reads() < other->supporting_reads()
                || (fusion.supporting_reads() == other->supporting_reads()
                    && f_lists < o_lists)) {
                fusion_has_most_support = false;
                break;
            }
            sum_split_reads1 += other->split_reads1;
            sum_split_reads2 += other->split_reads2;
        }

        if (fusion_has_most_support) {
            fusion.split_reads1 += sum_split_reads1;
            fusion.split_reads2 += sum_split_reads2;
            for (EventFusion *other : adjacent) {
                other->filter = fid(event_store::F_MERGE_ADJACENT);
                if (is_itd) {  // for ITDs, discarded reads are important => copy
                    fusion.split_read1_list.insert(fusion.split_read1_list.end(),
                                                   other->split_read1_list.begin(),
                                                   other->split_read1_list.end());
                    fusion.split_read2_list.insert(fusion.split_read2_list.end(),
                                                   other->split_read2_list.begin(),
                                                   other->split_read2_list.end());
                }
            }
        }
    }
    return PyLong_FromLongLong(count_remaining());
}

// ---------------------------------------------------------------------------
// filter_multimappers.cpp:10-221 (multimappers.py)

namespace {

inline uint8_t complement_base(uint8_t base) {
    switch (base) {
        case 'A': return 'T';
        case 'T': return 'A';
        case 'C': return 'G';
        case 'G': return 'C';
        case 'a': return 't';
        case 't': return 'a';
        case 'c': return 'g';
        case 'g': return 'c';
        default: return base;
    }
}

// filter_multimappers.cpp:10-15
bool is_gap_at_splice_site(int64_t position, bool direction,
                           const int64_t *genes, int64_t n_genes) {
    for (int64_t i = 0; i < n_genes; ++i)
        if (annotate_engine::is_breakpoint_spliced(genes[i], direction, position))
            return true;
    return false;
}

// filter_multimappers.cpp:17-79; `sequence` is the read sequence backing the
// segment (possibly a reverse-complemented copy for the supplementary)
int64_t calculate_segment_score(const Mate &alignment, const uint8_t *sequence,
                                int64_t sequence_len) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (alignment.contig >= (int64_t)c.assembly.size()
        || c.assembly[alignment.contig] == nullptr)
        return 0;
    const uint8_t *contig_seq = c.assembly[alignment.contig];

    int64_t score = 0;
    int64_t reference_position = alignment.start;
    int64_t read_position = 0;
    for (int64_t w = 0; w < alignment.n_cigar; ++w) {
        uint32_t op = alignment.cigar[w] & 0xf;
        int64_t oplen = alignment.cigar[w] >> 4;
        switch (op) {
            case 4: case 5:  // S/H
                read_position += oplen;
                break;
            case 2:  // D
                score -= 1;
                reference_position += oplen;
                break;
            case 3:  // N: free only at splice sites
                if (!is_gap_at_splice_site(reference_position, DOWNSTREAM,
                                           alignment.genes, alignment.n_genes)
                    || !is_gap_at_splice_site(reference_position + oplen, UPSTREAM,
                                              alignment.genes, alignment.n_genes))
                    score -= 1;
                reference_position += oplen;
                break;
            case 1:  // I
                score -= 1;
                read_position += oplen;
                break;
            case 7:  // =
                score += oplen;
                reference_position += oplen;
                read_position += oplen;
                break;
            case 8:  // X
                reference_position += oplen;
                read_position += oplen;
                break;
            case 0: {  // M: count actual matches
                int64_t n = oplen;
                if (read_position + n > sequence_len)
                    n = sequence_len - read_position;
                for (int64_t i = 0; i < n; ++i)
                    if (contig_seq[reference_position + i]
                        == sequence[read_position + i])
                        score += 1;
                reference_position += oplen;
                read_position += oplen;
                break;
            }
            default:
                break;
        }
    }
    return score;
}

// filter_multimappers.cpp:81-110 score over all

 // mates of a fragment
int64_t calculate_alignment_score(const Fragment &fragment,
                                  std::vector<uint8_t> &scratch) {
    const Mate &mate1 = fragment.mates[MATE1];
    const Mate &mate2 = fragment.mates[MATE2];
    int64_t score = calculate_segment_score(mate1, (const uint8_t *)mate1.seq,
                                            mate1.seq_len);
    score += calculate_segment_score(mate2, (const uint8_t *)mate2.seq,
                                     mate2.seq_len);
    if (fragment.n_mates == 3) {
        const Mate &split = fragment.mates[SPLIT_READ];
        const Mate &supp = fragment.mates[SUPPLEMENTARY];
        const uint8_t *supp_sequence = (const uint8_t *)split.seq;
        if (supp.strand != split.strand) {
            scratch.resize(split.seq_len);
            for (int64_t i = 0; i < split.seq_len; ++i)
                scratch[i] = complement_base(
                    (uint8_t)split.seq[split.seq_len - 1 - i]);
            supp_sequence = scratch.data();
        }
        score += calculate_segment_score(supp, supp_sequence, split.seq_len);
        // penalize if the read is not split at a splice site
        int64_t supp_pos = supp.strand == FORWARD ? supp.end : supp.start;
        bool supp_dir = supp.strand == FORWARD ? DOWNSTREAM : UPSTREAM;
        int64_t split_pos = split.strand == FORWARD ? split.start : split.end;
        bool split_dir = split.strand == FORWARD ? UPSTREAM : DOWNSTREAM;
        if (!is_gap_at_splice_site(supp_pos, supp_dir, supp.genes, supp.n_genes)
            || !is_gap_at_splice_site(split_pos, split_dir, split.genes,
                                      split.n_genes))
            score -= 1;
    }
    return score;
}

// filter_multimappers.cpp:82-110 deterministic "more support" order
bool fusion_has_more_support(const EventFusion *fusion,
                             const EventFusion *current_best) {
    if (fusion == nullptr) return false;
    if (current_best == nullptr) return true;
    const Store &s = event_store::store();
    if (current_best->supporting_reads() != fusion->supporting_reads())
        return current_best->supporting_reads() < fusion->supporting_reads();
    if (s.gene_is_protein_coding[fusion->gene1]
        != s.gene_is_protein_coding[current_best->gene1])
        return s.gene_is_protein_coding[fusion->gene1] != 0;
    if (s.gene_is_protein_coding[fusion->gene2]
        != s.gene_is_protein_coding[current_best->gene2])
        return s.gene_is_protein_coding[fusion->gene2] != 0;
    if (fusion->contig1 != current_best->contig1)
        return fusion->contig1 < current_best->contig1;
    if (fusion->contig2 != current_best->contig2)
        return fusion->contig2 < current_best->contig2;
    if (fusion->breakpoint1 != current_best->breakpoint1)
        return fusion->breakpoint1 < current_best->breakpoint1;
    if (fusion->breakpoint2 != current_best->breakpoint2)
        return fusion->breakpoint2 < current_best->breakpoint2;
    if (fusion->direction1 != current_best->direction1)
        return fusion->direction1 < current_best->direction1;
    if (fusion->direction2 != current_best->direction2)
        return fusion->direction2 < current_best->direction2;
    if (fusion->gene1 != current_best->gene1)
        return fusion->gene1 < current_best->gene1;
    return fusion->gene2 < current_best->gene2;
}

}  // namespace

PyObject *ev_multimappers(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    const int64_t n_fragments = (int64_t)c.fragments.size();
    const int64_t multimappers_id = fid(event_store::F_MULTIMAPPERS);

    // for each multi-mapper, the fusion with the most supporting reads
    bool any_multimapper = false;
    for (const Fragment &fragment : c.fragments)
        if (fragment.multimapper) { any_multimapper = true; break; }
    std::unordered_map<int64_t, const EventFusion *> most_supported;
    if (any_multimapper) {
        for (const EventFusion &fusion : s.fusions) {
            for (int which = 0; which < 3; ++which) {
                const std::vector<int64_t> &list =
                    which == 0 ? fusion.split_read1_list
                    : which == 1 ? fusion.split_read2_list
                                 : fusion.discordant_list;
                for (int64_t index : list) {
                    if (!c.fragments[index].multimapper) continue;
                    const EventFusion *&best = most_supported[index];
                    if (fusion_has_more_support(&fusion, best))
                        best = &fusion;
                }
            }
        }
    }

    // per cluster of multi-mapping alignments, keep the highest score
    std::vector<uint8_t> scratch;
    int64_t i = 0;
    while (i < n_fragments) {
        int64_t cluster_end = i + 1;
        while (cluster_end < n_fragments
               && s.cluster_ids[cluster_end] == s.cluster_ids[i])
            cluster_end += 1;
        if (cluster_end - i >= 2) {
            int64_t best_index = -1;
            int64_t best_score = INT64_MIN;
            for (int64_t j = i; j < cluster_end; ++j) {
                int64_t score = calculate_alignment_score(c.fragments[j], scratch);
                if (best_score < score) {
                    best_index = j;
                    best_score = score;
                } else if (best_score == score) {
                    auto f1 = most_supported.find(j);
                    auto f2 = most_supported.find(best_index);
                    if (fusion_has_more_support(
                            f1 == most_supported.end() ? nullptr : f1->second,
                            f2 == most_supported.end() ? nullptr : f2->second))
                        best_index = j;
                }
            }
            if (best_index >= 0) {
                for (int64_t j = i; j < cluster_end; ++j)
                    if (j != best_index && c.fragments[j].filter == 0)
                        c.fragments[j].filter = multimappers_id;
            }
        }
        i = cluster_end;
    }

    // reduce supporting-read counts where reads were discarded
    bool any_discarded = false;
    for (const Fragment &fragment : c.fragments)
        if (fragment.filter == multimappers_id) { any_discarded = true; break; }
    if (any_discarded) {
        for (EventFusion &fusion : s.fusions) {
            if (fusion.filter != 0 || fusion.supporting_reads() == 0) continue;
            for (int64_t index : fusion.split_read1_list)
                if (c.fragments[index].filter == multimappers_id
                    && fusion.split_reads1 > 0)
                    fusion.split_reads1 -= 1;
            for (int64_t index : fusion.split_read2_list)
                if (c.fragments[index].filter == multimappers_id
                    && fusion.split_reads2 > 0)
                    fusion.split_reads2 -= 1;
            for (int64_t index : fusion.discordant_list)
                if (c.fragments[index].filter == multimappers_id
                    && fusion.discordant_mates > 0)
                    fusion.discordant_mates -= 1;
            if (fusion.supporting_reads() == 0)
                fusion.filter = multimappers_id;
        }
    }
    return PyLong_FromLongLong(count_remaining());
}

// ---------------------------------------------------------------------------
// filter_relative_support.cpp:17-207 (event_level.py:131-323). Every in-place
// multiplication rounds through float32 like the reference's `float evalue`;
// pow() is libm pow, as in the reference.

PyObject *ev_estimate_expected(PyObject *, PyObject *args) {
    long long mapped_reads;
    if (!PyArg_ParseTuple(args, "L", &mapped_reads)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    if (s.fusions.empty()) Py_RETURN_NONE;

    // fusion partners per gene, deduplicated by breakpoints
    std::map<std::array<int64_t, 3>, int64_t> first_partner;
    for (const EventFusion &f : s.fusions) {
        if (f.filter != 0 || f.gene1 == f.gene2) continue;
        std::array<int64_t, 3> key2{f.gene2, f.breakpoint1, f.breakpoint2};
        if (first_partner.find(key2) == first_partner.end())
            first_partner.emplace(key2, f.gene1);
        std::array<int64_t, 3> key1{f.gene1, f.breakpoint1, f.breakpoint2};
        if (first_partner.find(key1) == first_partner.end())
            first_partner.emplace(key1, f.gene2);
    }
    std::set<std::pair<int64_t, int64_t>> edges;
    for (const auto &entry : first_partner)
        edges.emplace(entry.first[0], entry.second);
    std::unordered_map<int64_t, int64_t> size_of;
    for (const auto &edge : edges) size_of[edge.first] += 1;
    std::unordered_map<int64_t, int64_t> fusion_partner_count;
    for (const auto &edge : edges) {
        auto other = size_of.find(edge.second);
        if (size_of[edge.first] >= (other == size_of.end() ? 0 : other->second))
            fusion_partner_count[edge.first] += 1;
    }

    // breakpoint-location distribution (spliced/exonic/intronic/mixed)
    int64_t spliced_bp = 0, exonic_bp = 0, intronic_bp = 0, mixed_bp = 0;
    int64_t intragenic_duplications = 0, intragenic_inversions = 0;
    int64_t spliced_same_gene = 0, spliced_diff_genes = 0;
    std::unordered_set<int64_t> genes_with_fusions, genes_with_read_through;
    for (const EventFusion &f : s.fusions) {
        bool none = f.filter == 0;
        bool dummy1 = c.gene_is_dummy[f.gene1] != 0;
        bool dummy2 = c.gene_is_dummy[f.gene2] != 0;
        int64_t split = f.split_reads1 + f.split_reads2;
        int64_t sup = f.supporting_reads();
        if (none
            && (f.contig1 != f.contig2 || f.breakpoint2 - f.breakpoint1 > 500000)
            && sup >= 2 && split > 0 && !dummy1 && !dummy2) {
            if (f.spliced1 || f.spliced2) spliced_bp += 1;
            else if (f.exonic1 && f.exonic2) exonic_bp += 1;
            else if (!f.exonic1 && !f.exonic2) intronic_bp += 1;
            else mixed_bp += 1;
        }
        if (none && f.gene1 == f.gene2 && split >= 2) {
            if (f.direction1 == UPSTREAM && f.direction2 == DOWNSTREAM)
                intragenic_duplications += 1;
            else if (f.direction1 == f.direction2)
                intragenic_inversions += 1;
        }
        if (f.spliced1 && f.spliced2) {
            if (f.gene1 == f.gene2) spliced_same_gene += 1;
            else spliced_diff_genes += 1;
        }
        if (!dummy1 && !dummy2 && split > 0) {
            genes_with_fusions.insert(f.gene1);
            genes_with_fusions.insert(f.gene2);
            if (f.is_read_through()) {
                genes_with_read_through.insert(f.gene1);
                genes_with_read_through.insert(f.gene2);
            }
        }
    }
    if (spliced_bp + exonic_bp + intronic_bp + mixed_bp < 100 || spliced_bp == 0
        || exonic_bp == 0 || intronic_bp == 0 || mixed_bp == 0) {
        spliced_bp = 10;
        exonic_bp = 65;
        intronic_bp = 10;
        mixed_bp = 15;
    }
    if (intragenic_inversions + intragenic_duplications < 100)
        intragenic_inversions = intragenic_duplications = 1;
    if (spliced_same_gene + spliced_diff_genes < 100) {
        spliced_same_gene = 0;
        spliced_diff_genes = 100;
    }
    float fraction_read_through =
        genes_with_fusions.empty()
            ? 0.0f
            : (float)(1.0 * (double)genes_with_read_through.size()
                      / (double)genes_with_fusions.size());

    for (EventFusion &f : s.fusions) {
        int64_t sup = f.supporting_reads();
        int64_t fpc1 = 0, fpc2 = 0;
        {
            auto found = fusion_partner_count.find(f.gene1);
            if (found != fusion_partner_count.end()) fpc1 = found->second;
            found = fusion_partner_count.find(f.gene2);
            if (found != fusion_partner_count.end()) fpc2 = found->second;
        }
        double el1 = (double)s.gene_exonic_length[f.gene1];
        double el2 = (double)s.gene_exonic_length[f.gene2];
        float max_fusion_partners =
            (float)std::max(10000.0 / el1 * (double)std::max(fpc1 - 1, (int64_t)1),
                            10000.0 / el2 * (double)std::max(fpc2 - 1, (int64_t)1));
        double reads_scaling =
            sup >= 2 ? (double)mapped_reads / 20000000.0
                           * pow(0.02, (double)(sup - 2))
                     : 0.0;
        float evalue =
            (float)((double)max_fusion_partners * std::max(1.0, reads_scaling));
        auto step = [&evalue](bool mask, double factor) {
            if (mask) evalue = (float)((double)evalue * factor);
        };

        bool intragenic = is_intragenic(f);
        bool read_through = f.is_read_through();
        step(intragenic,
             2.0 / (double)(intragenic_duplications + intragenic_inversions));
        step(intragenic && f.direction1 == UPSTREAM && f.direction2 == DOWNSTREAM,
             (double)intragenic_duplications);
        step(intragenic && f.direction1 == f.direction2,
             (double)intragenic_inversions);
        if (intragenic && sup >= 1) {
            step(true, pow((double)sup - 0.42, -2.11) * pow(10.0, -1.11));
            int64_t spliced_distance = cascade_store::spliced_distance(
                f.contig1, f.breakpoint1, f.breakpoint2, f.gene1);
            if (spliced_distance < 1000) {
                step(true, pow((double)std::max((int64_t)400, spliced_distance)
                                   / 1000.0,
                               -2.0));
                if (spliced_distance < 400)
                    step(true, pow((double)std::max((int64_t)1, spliced_distance)
                                       / 400.0,
                                   -4.58));
            }
        }
        step(intragenic, std::max(1.0, (double)spliced_same_gene / 0.25
                                           / (double)spliced_diff_genes));

        bool intergenic_sup = !intragenic && sup >= 1;
        step(intergenic_sup, pow((double)sup - 0.73, -2.28) * pow(10.0, -1.75));
        double breakpoint_distance =
            (double)std::max((int64_t)1, f.breakpoint2 - f.breakpoint1) / 400000.0;
        step(intergenic_sup && read_through, pow(breakpoint_distance, -0.63));
        bool close = f.contig1 == f.contig2
                     && f.breakpoint2 - f.breakpoint1 < 400000;
        step(intergenic_sup && !read_through && close,
             pow(breakpoint_distance, -1.53));

        // location bonus
        step(true, 4.0 / (double)(spliced_bp + exonic_bp + intronic_bp + mixed_bp));
        bool spliced_mask = f.spliced1 || f.spliced2;
        bool both_exonic = f.exonic1 && f.exonic2;
        bool neither_exonic = !f.exonic1 && !f.exonic2;
        step(spliced_mask, (double)spliced_bp);
        step(!spliced_mask && both_exonic,
             (double)std::max(spliced_bp, exonic_bp));
        step(!spliced_mask && neither_exonic,
             (double)std::max(spliced_bp, intronic_bp));
        step(!spliced_mask && !both_exonic && !neither_exonic,
             (double)std::max(spliced_bp, mixed_bp));

        if ((double)fraction_read_through > 0.25)
            step(read_through,
                 1.0 + pow(((double)fraction_read_through - 0.25) * 20.0, 2.0));

        f.evalue = evalue;
    }
    Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// the simple event filters (event_level.py twins)

// filter_non_coding_neighbors.cpp:6-20
PyObject *ev_non_coding_neighbors(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (!s.gene_is_protein_coding[f.gene1]
            && !s.gene_is_protein_coding[f.gene2] && f.is_read_through())
            f.filter = fid(event_store::F_NON_CODING_NEIGHBORS);
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// filter_intragenic_both_exonic.cpp:7-35
PyObject *ev_intragenic_exonic(PyObject *, PyObject *args) {
    double exonic_fraction;
    if (!PyArg_ParseTuple(args, "d", &exonic_fraction)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if ((breakpoint_overlaps_both_genes(f) || f.gene1 == f.gene2)
            && f.exonic1 && f.exonic2 && !(f.spliced1 && f.spliced2)) {
            int64_t spliced_distance = cascade_store::spliced_distance(
                f.contig1, f.breakpoint1, f.breakpoint2, f.gene1);
            int64_t distance = f.breakpoint2 - f.breakpoint1;
            if (spliced_distance == distance
                || 1.0 * (double)spliced_distance / (double)distance
                       < exonic_fraction) {
                f.filter = fid(event_store::F_INTRAGENIC_EXONIC);
                continue;
            }
        }
        remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// filter_min_support.cpp:7-21
PyObject *ev_min_support(PyObject *, PyObject *args) {
    long long min_support;
    if (!PyArg_ParseTuple(args, "L", &min_support)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (f.supporting_reads() < min_support
            || (breakpoint_overlaps_both_genes(f)
                && f.split_reads1 + f.split_reads2 < min_support))
            f.filter = fid(event_store::F_MIN_SUPPORT);
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// filter_relative_support.cpp:209-224
PyObject *ev_relative_support(PyObject *, PyObject *args) {
    double evalue_cutoff;
    if (!PyArg_ParseTuple(args, "d", &evalue_cutoff)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (f.evalue < (float)evalue_cutoff
            && !(is_intragenic(f) && f.split_reads1 + f.split_reads2 == 0))
            remaining += 1;
        else
            f.filter = fid(event_store::F_RELATIVE_SUPPORT);
    }
    return PyLong_FromLongLong(remaining);
}
