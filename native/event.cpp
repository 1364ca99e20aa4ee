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
#include <atomic>
#include <thread>
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

PyObject *serialize_fusions_py() { return serialize_fusions_py(false); }

PyObject *serialize_fusions_py(bool lists_passing_only) {
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
            // with lists_passing_only, filtered rows export empty read
            // lists (their Fusion objects are never built): the item
            // stream shrinks from O(total read references) to the passing
            // rows' references
            if (lists_passing_only && s.fusions[i].filter != 0) {
                offsets[i + 1] = offsets[i];
                continue;
            }
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
        int64_t w = position / COVERAGE_RESOLUTION - 1;
        if (w >= (int64_t)c.coverage_len[contig]) return 0;
        return c.coverage[contig][w];
    }
    int64_t w = position / COVERAGE_RESOLUTION + 1;
    if (w >= (int64_t)c.coverage_len[contig]) return 0;
    return c.coverage[contig][w];
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
    if (!event_store::store().bound) {
        PyErr_SetString(PyExc_RuntimeError,
                        "event store not bound (call event_bind first)");
        return false;
    }
    if (event_store::store().cluster_ids.size()
        < cascade_store::cascade().fragments.size()) {
        PyErr_SetString(PyExc_RuntimeError,
                        "event store cluster ids shorter than the cascade "
                        "fragment table (stale event_bind?)");
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

PyObject *event_export(PyObject *, PyObject *args) {
    int lists_passing_only = 0;
    if (!PyArg_ParseTuple(args, "|p", &lists_passing_only)) return nullptr;
    if (!event_store::store().ready) {
        PyErr_SetString(PyExc_RuntimeError, "event store not populated");
        return nullptr;
    }
    PyObject *serialized =
        event_store::serialize_fusions_py(lists_passing_only != 0);
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
        case '[': return ']';  // insertion markers flip so reverse-
        case ']': return '[';  // complemented consensus stays well-formed
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
            case 0: {  // M: count actual matches (clamped against both the
                // read and the contig, like the Python twin's numpy slices)
                int64_t n = oplen;
                if (read_position + n > sequence_len)
                    n = sequence_len - read_position;
                int64_t contig_len = c.assembly_len[alignment.contig];
                if (reference_position + n > contig_len)
                    n = contig_len - reference_position;
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

namespace {
std::vector<int64_t> reference_map_order();  // defined with the writer below
}  // namespace

PyObject *ev_estimate_expected(PyObject *, PyObject *args) {
    long long mapped_reads;
    if (!PyArg_ParseTuple(args, "L", &mapped_reads)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    if (s.fusions.empty()) Py_RETURN_NONE;

    // fusion partners per gene, deduplicated by breakpoints. The
    // reference's first-insertion-wins dedup (overlap_duplicates,
    // filter_relative_support.cpp:21-29) runs in its unordered_map
    // ITERATION order — when two gene pairs share breakpoints, which
    // partner enters the set depends on that order, so the walk must
    // follow reference_map_order(), not store order.
    std::map<std::array<int64_t, 3>, int64_t> first_partner;
    for (int64_t fusion_index : reference_map_order()) {
        const EventFusion &f = s.fusions[fusion_index];
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

// ---------------------------------------------------------------------------
// recover_internal_tandem_duplication.cpp:8-84 (event_level.py:425-493)

PyObject *ev_recover_itd(PyObject *, PyObject *args) {
    long long max_itd_length, min_supporting_reads, subsampling_threshold;
    double min_fraction_of_coverage;
    if (!PyArg_ParseTuple(args, "LLdL", &max_itd_length, &min_supporting_reads,
                          &min_fraction_of_coverage, &subsampling_threshold))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    const int64_t protrude_into_introns = 7;

    const int64_t duplicates_id = fid(event_store::F_DUPLICATES);
    const int64_t hairpin_id = fid(event_store::F_HAIRPIN);
    const int64_t clipped_id = fid(event_store::F_INCONSISTENTLY_CLIPPED);
    const int64_t mismatches_id = fid(event_store::F_MISMATCHES);
    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    const int64_t intragenic_id = fid(event_store::F_INTRAGENIC_EXONIC);

    int64_t duplicates = 0;
    for (const Fragment &fragment : c.fragments)
        if (fragment.filter == duplicates_id) duplicates += 1;
    double duplication_rate =
        c.fragments.empty() ? 0.0
                            : 1.0 * (double)duplicates / (double)c.fragments.size();

    const annotate_engine::Engine &eng = annotate_engine::engine();
    std::vector<int64_t> exon_set;
    for (EventFusion &f : s.fusions) {
        if (f.filter != relative_id && f.filter != intragenic_id
            && f.filter != hairpin_id && f.filter != clipped_id
            && f.filter != mismatches_id)
            continue;
        if (!(f.gene1 == f.gene2 && f.exonic1 && f.exonic2
              && f.direction1 == UPSTREAM && f.direction2 == DOWNSTREAM
              && s.gene_is_protein_coding[f.gene1]
              && f.breakpoint2 - f.breakpoint1 >= 0
              && f.breakpoint2 - f.breakpoint1 < max_itd_length))
            continue;

        annotate_engine::exon_range_query(f.contig1, f.breakpoint1,
                                          f.breakpoint2, exon_set);
        bool is_in_coding_region = false;
        for (int64_t e : exon_set) {
            if (eng.exon_gene[e] == f.gene1
                && eng.exon_cds_start[e] <= f.breakpoint1 + protrude_into_introns
                && eng.exon_cds_end[e] + protrude_into_introns >= f.breakpoint1
                && eng.exon_cds_start[e] <= f.breakpoint2 + protrude_into_introns
                && eng.exon_cds_end[e] + protrude_into_introns >= f.breakpoint2)
                is_in_coding_region = true;
        }
        if (!is_in_coding_region) continue;

        int64_t coverage1 = coverage_around(f, 1);
        int64_t coverage2 = coverage_around(f, 2);
        int64_t split_reads = 0;
        for (int which = 0; which < 2; ++which) {
            const std::vector<int64_t> &list =
                which == 0 ? f.split_read1_list : f.split_read2_list;
            for (int64_t index : list) {
                int64_t frag_filter = c.fragments[index].filter;
                if (frag_filter == 0 || frag_filter == hairpin_id
                    || frag_filter == clipped_id || frag_filter == mismatches_id)
                    split_reads += 1;
            }
        }

        if (split_reads >= min_supporting_reads
            && (1.0 * (double)split_reads
                        / (double)std::max(coverage1, coverage2)
                        / (1 - duplication_rate)
                    > min_fraction_of_coverage
                || split_reads >= subsampling_threshold)) {
            f.filter = 0;
            for (int64_t index : f.split_read1_list) {
                int64_t &frag_filter = c.fragments[index].filter;
                if (frag_filter == hairpin_id || frag_filter == clipped_id
                    || frag_filter == mismatches_id) {
                    frag_filter = 0;
                    f.split_reads1 += 1;
                }
            }
            for (int64_t index : f.split_read2_list) {
                int64_t &frag_filter = c.fragments[index].filter;
                if (frag_filter == hairpin_id || frag_filter == clipped_id
                    || frag_filter == mismatches_id) {
                    frag_filter = 0;
                    f.split_reads2 += 1;
                }
            }
        }
    }
    return PyLong_FromLongLong(count_remaining());
}

// ---------------------------------------------------------------------------
// filter_both_intronic.cpp:8-35 (event_level.py:392-418)

PyObject *ev_both_intronic(PyObject *, PyObject *args) {
    const char *viral;
    Py_ssize_t viral_len;
    if (!PyArg_ParseTuple(args, "y#", &viral, &viral_len)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();

    auto list_contains_exonic_reads =
        [&c](const std::vector<int64_t> &list) -> bool {
        for (int64_t index : list) {
            const Fragment &fragment = c.fragments[index];
            if (fragment.filter != 0) continue;
            for (int m = 0; m < fragment.n_mates; ++m)
                if (fragment.mates[m].exonic) return true;
        }
        return false;
    };

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if ((f.contig1 < viral_len && viral[f.contig1])
            || (f.contig2 < viral_len && viral[f.contig2]))
            continue;  // the reference's `continue` also skips remaining++
        if (!list_contains_exonic_reads(f.split_read1_list)
            && !list_contains_exonic_reads(f.split_read2_list)
            && !list_contains_exonic_reads(f.discordant_list))
            f.filter = fid(event_store::F_INTRONIC);
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_in_vitro.cpp + recover_both_spliced.cpp shared helpers
// (in_vitro.py:28-64)

namespace {

// filter_in_vitro.cpp:48-83 — chimeric-read counts per gene and the
// high-expression quantile threshold (deterministic tie-break on gene id)
void find_top_expressed_genes(double high_expression_quantile,
                              std::unordered_map<int64_t, int64_t> &counts,
                              int64_t &threshold) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    counts.clear();
    for (const Fragment &fragment : c.fragments) {
        const Mate &mate1 = fragment.mates[MATE1];
        for (int64_t g = 0; g < mate1.n_genes; ++g)
            counts[mate1.genes[g]] += 1;
        const Mate &other =
            fragment.mates[fragment.n_mates == 3 ? SUPPLEMENTARY : MATE2];
        for (int64_t g = 0; g < other.n_genes; ++g)
            counts[other.genes[g]] += 1;
    }
    threshold = 0;
    if (!counts.empty()) {
        std::vector<std::pair<int64_t, int64_t>> sorted_genes;  // (count, gene)
        sorted_genes.reserve(counts.size());
        for (const auto &entry : counts)
            sorted_genes.emplace_back(entry.second, entry.first);
        std::sort(sorted_genes.begin(), sorted_genes.end());
        size_t quantile =
            (size_t)std::floor(high_expression_quantile
                               * (double)sorted_genes.size());
        if (quantile >= sorted_genes.size()) quantile = sorted_genes.size() - 1;
        threshold = sorted_genes[quantile].first;
    }
}

int64_t expression_of(const std::unordered_map<int64_t, int64_t> &counts,
                      int64_t gene) {
    auto found = counts.find(gene);
    return found == counts.end() ? 0 : found->second;
}

// filter_in_vitro.cpp:20-33 over the event store's gene interval index
int64_t find_higher_expressed_gene(
    int64_t contig, int64_t breakpoint,
    const std::unordered_map<int64_t, int64_t> &counts,
    int64_t highest_expressed_gene) {
    const event_store::GeneIndex &index = event_store::store().gene_index;
    int64_t highest_expression = expression_of(counts, highest_expressed_gene);
    if (contig < index.n_contigs) {
        const std::vector<int64_t> &bounds = index.boundaries[contig];
        size_t idx = std::lower_bound(bounds.begin(), bounds.end(), breakpoint)
                     - bounds.begin();
        if (idx < bounds.size()) {
            int64_t lo = index.offsets[contig][idx];
            int64_t hi = index.offsets[contig][idx + 1];
            for (int64_t i = lo; i < hi; ++i) {
                int64_t gene = index.items[contig][i];
                int64_t expression = expression_of(counts, gene);
                if (expression > highest_expression) {
                    highest_expression = expression;
                    highest_expressed_gene = gene;
                }
            }
        }
    }
    return highest_expressed_gene;
}

}  // namespace

// filter_in_vitro.cpp:85-227 (in_vitro.py:67-162)
PyObject *ev_in_vitro(PyObject *, PyObject *args) {
    double high_expression_quantile;
    if (!PyArg_ParseTuple(args, "d", &high_expression_quantile)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    const int64_t min_clipped_length = 3;
    const int64_t max_exonic_breakpoints_by_gene_pair = 8;
    const int64_t merge_adjacent_id = fid(event_store::F_MERGE_ADJACENT);
    const int64_t uninteresting_id = fid(event_store::F_UNINTERESTING_CONTIGS);
    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    const int64_t min_support_id = fid(event_store::F_MIN_SUPPORT);
    const int64_t homopolymer_id = fid(event_store::F_HOMOPOLYMER);

    std::map<std::pair<int64_t, int64_t>, int64_t> exonic_breakpoints_by_pair;
    for (const EventFusion &f : s.fusions) {
        if (f.gene1 != f.gene2 && !f.spliced1 && !f.spliced2 && f.exonic1
            && f.exonic2
            && f.split_read1_list.size() + f.split_read2_list.size() > 0
            && f.filter != merge_adjacent_id && f.filter != uninteresting_id) {
            exonic_breakpoints_by_pair[{f.gene1, f.gene2}] += 1;
            exonic_breakpoints_by_pair[{f.gene2, f.gene1}] += 1;
        }
    }

    std::unordered_map<int64_t, int64_t> read_count_by_gene;
    int64_t high_expression_threshold;
    find_top_expressed_genes(high_expression_quantile, read_count_by_gene,
                             high_expression_threshold);

    for (EventFusion &f : s.fusions) {
        if (f.filter != 0
            && !((f.spliced1 || f.spliced2)
                 && (f.filter == relative_id || f.filter == min_support_id
                     || f.filter == homopolymer_id)))
            continue;

        double potential_rt_breakpoints = 0.0;
        if (!f.exonic1) potential_rt_breakpoints += 0.5;
        else if (!f.spliced1) potential_rt_breakpoints += 1;
        if (!f.exonic2) potential_rt_breakpoints += 0.5;
        else if (!f.spliced2) potential_rt_breakpoints += 1;

        int64_t clipped_discordant_mates1 = 0, clipped_discordant_mates2 = 0;
        for (int64_t index : f.discordant_list) {
            const Fragment &fragment = c.fragments[index];
            if (fragment.filter != 0) continue;
            for (int m = 0; m < fragment.n_mates; ++m) {
                const Mate &mate = fragment.mates[m];
                if (mate.strand == FORWARD
                    && mate.postclipping() >= min_clipped_length) {
                    if (mate.contig == f.contig1 && mate.end == f.breakpoint1)
                        clipped_discordant_mates1 += 1;
                    else if (mate.contig == f.contig2
                             && mate.end == f.breakpoint2)
                        clipped_discordant_mates2 += 1;
                } else if (mate.strand == REVERSE
                           && mate.preclipping() >= min_clipped_length) {
                    if (mate.contig == f.contig1 && mate.start == f.breakpoint1)
                        clipped_discordant_mates1 += 1;
                    else if (mate.contig == f.contig2
                             && mate.start == f.breakpoint2)
                        clipped_discordant_mates2 += 1;
                }
            }
        }

        int64_t total_split_reads =
            std::min(clipped_discordant_mates1, clipped_discordant_mates2)
            + f.split_reads1 + f.split_reads2;

        int64_t gene1 = find_higher_expressed_gene(f.contig1, f.breakpoint1,
                                                   read_count_by_gene, f.gene1);
        int64_t gene2 = find_higher_expressed_gene(f.contig2, f.breakpoint2,
                                                   read_count_by_gene, f.gene2);
        int64_t gene1_expression = expression_of(read_count_by_gene, gene1);
        int64_t gene2_expression = expression_of(read_count_by_gene, gene2);

        int64_t exonic_breakpoints = 0;
        {
            auto found = exonic_breakpoints_by_pair.find({gene1, gene2});
            if (found != exonic_breakpoints_by_pair.end())
                exonic_breakpoints = found->second;
            found = exonic_breakpoints_by_pair.find({f.gene1, f.gene2});
            if (found != exonic_breakpoints_by_pair.end())
                exonic_breakpoints = std::max(exonic_breakpoints, found->second);
        }

        int64_t coverage1 = coverage_around(f, 1);
        int64_t coverage2 = coverage_around(f, 2);
        int64_t sup = f.supporting_reads();
        if ((double)total_split_reads
                <= 2 + 0.0001 * (double)(gene1_expression + gene2_expression)
            && (total_split_reads * 2 <= f.discordant_mates
                || total_split_reads <= 2)
            && gene1_expression + gene2_expression > high_expression_threshold
            && !(sup >= 10 && sup * 4 >= std::max(coverage1, coverage2)
                 && coverage1 > sup && coverage2 > sup
                 && (f.spliced1 || f.spliced2)
                 && ((f.spliced1 || !f.exonic1) && (f.spliced2 || !f.exonic2)))
            && (potential_rt_breakpoints > 1
                || (potential_rt_breakpoints > 0
                    && (gene1_expression > high_expression_threshold
                        || gene2_expression > high_expression_threshold))
                || gene1_expression > 2 * high_expression_threshold
                || gene2_expression > 2 * high_expression_threshold
                || (gene1_expression > high_expression_threshold
                    && gene2_expression > high_expression_threshold)
                || exonic_breakpoints > max_exonic_breakpoints_by_gene_pair
                || sup <= 1))
            f.filter = fid(event_store::F_IN_VITRO);
    }
    return PyLong_FromLongLong(count_remaining());
}

// ---------------------------------------------------------------------------
// recover_both_spliced.cpp:17-182 (in_vitro.py:169-295)

namespace {

// recover_both_spliced.cpp:17-76
int64_t count_supporting_reads_for_recovery(
    const EventFusion &f, const std::unordered_map<int64_t, int64_t> &counts,
    int64_t high_expression_threshold, int64_t max_exon_size,
    int64_t max_coverage) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();

    if (expression_of(counts, f.gene1) > high_expression_threshold
        || expression_of(counts, f.gene2) > high_expression_threshold) {
        if (both_breakpoints_spliced(f)
            && f.discordant_mates <= f.split_reads1 + f.split_reads2)
            return 1;
        return 0;
    }

    if (!both_breakpoints_spliced(f)) {
        int64_t coverage1 = coverage_around(f, 1);
        int64_t coverage2 = coverage_around(f, 2);
        if (coverage1 + coverage2 > f.supporting_reads() * max_coverage)
            return 0;
        std::vector<int64_t> exon_set;
        annotate_engine::exon_point_query(f.contig1, f.breakpoint1, exon_set);
        for (int64_t e : exon_set)
            if (eng.exon_end[e] + 1 - eng.exon_start[e] > max_exon_size)
                return 0;
        annotate_engine::exon_point_query(f.contig2, f.breakpoint2, exon_set);
        for (int64_t e : exon_set)
            if (eng.exon_end[e] + 1 - eng.exon_start[e] > max_exon_size)
                return 0;
    }

    int64_t multimappers = 0, unique_mappers = 0;
    for (int which = 0; which < 3; ++which) {
        const std::vector<int64_t> &list = which == 0 ? f.split_read1_list
                                           : which == 1 ? f.split_read2_list
                                                        : f.discordant_list;
        for (int64_t index : list) {
            const Fragment &fragment = c.fragments[index];
            if (fragment.multimapper)
                multimappers += 1;
            else if (fragment.filter == 0)
                unique_mappers += 1;
        }
    }
    int64_t total_list_size = (int64_t)(f.split_read1_list.size()
                                        + f.split_read2_list.size()
                                        + f.discordant_list.size());
    if ((double)multimappers >= 0.5 * (double)total_list_size) return 0;
    if (unique_mappers == 0) return 1;
    return unique_mappers;
}

}  // namespace

// recover_both_spliced.cpp:77-182 — two-mode (dry-run counting, then recover)
// with a dynamic min-supporting-reads threshold
PyObject *ev_recover_both_spliced(PyObject *, PyObject *args) {
    long long max_fusions_to_recover, max_exon_size, max_coverage;
    double high_expression_quantile;
    if (!PyArg_ParseTuple(args, "LdLL", &max_fusions_to_recover,
                          &high_expression_quantile, &max_exon_size,
                          &max_coverage))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t merge_adjacent_id = fid(event_store::F_MERGE_ADJACENT);
    const int64_t in_vitro_id = fid(event_store::F_IN_VITRO);
    const int64_t intronic_id = fid(event_store::F_INTRONIC);
    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    const int64_t min_support_id = fid(event_store::F_MIN_SUPPORT);
    const int64_t clipped_id = fid(event_store::F_INCONSISTENTLY_CLIPPED);

    std::unordered_map<int64_t, int64_t> read_count_by_gene;
    int64_t high_expression_threshold;
    find_top_expressed_genes(high_expression_quantile, read_count_by_gene,
                             high_expression_threshold);

    const size_t n = s.fusions.size();
    std::vector<int64_t> cached_counts(n, -1);
    auto count_reads = [&](size_t index) -> int64_t {
        if (cached_counts[index] < 0)
            cached_counts[index] = count_supporting_reads_for_recovery(
                s.fusions[index], read_count_by_gene, high_expression_threshold,
                max_exon_size, max_coverage);
        return cached_counts[index];
    };

    std::map<std::array<int64_t, 4>, std::vector<size_t>> fusions_by_gene_pair;
    for (size_t i = 0; i < n; ++i) {
        const EventFusion &f = s.fusions[i];
        if (f.filter == merge_adjacent_id) continue;
        if (f.filter == 0 || f.filter == in_vitro_id || f.filter == intronic_id
            || f.filter == relative_id || f.filter == min_support_id
            || (f.filter == clipped_id && both_breakpoints_spliced(f))) {
            if (count_reads(i) > 0)
                fusions_by_gene_pair[{f.gene1, f.gene2, f.direction1,
                                      f.direction2}]
                    .push_back(i);
        }
    }

    int64_t remaining = 0;
    std::map<int64_t, int64_t> recovered_by_supporting_reads;
    int64_t min_supporting_reads = 1;
    for (int mode = 0; mode < 2; ++mode) {  // 0 = counting, 1 = recover
        for (size_t i = 0; i < n; ++i) {
            EventFusion &f = s.fusions[i];
            if (f.filter == 0) {
                if (mode == 1) remaining += 1;
                continue;
            }
            if (!both_breakpoints_spliced(f)) continue;
            if (f.gene1 == f.gene2 || breakpoint_overlaps_both_genes(f))
                continue;
            if (f.is_read_through()) continue;
            if (f.filter != relative_id && f.filter != min_support_id
                && f.filter != in_vitro_id)
                continue;

            int64_t sum_of_supporting_reads = 0;
            {
                auto found = fusions_by_gene_pair.find(
                    {f.gene1, f.gene2, f.direction1, f.direction2});
                if (found != fusions_by_gene_pair.end())
                    for (size_t j : found->second)
                        sum_of_supporting_reads += count_reads(j);
            }
            {
                auto found = fusions_by_gene_pair.find(
                    {f.gene1, f.gene2, !f.direction1, !f.direction2});
                if (found != fusions_by_gene_pair.end()) {
                    for (size_t j : found->second) {
                        const EventFusion &other = s.fusions[j];
                        if (other.is_read_through()) continue;
                        if (both_breakpoints_spliced(other)
                            || (((f.direction1 == DOWNSTREAM)
                                 != (f.breakpoint1 > other.breakpoint1))
                                && ((f.direction2 == DOWNSTREAM)
                                    != (f.breakpoint2 > other.breakpoint2))))
                            sum_of_supporting_reads += count_reads(j);
                    }
                }
            }

            if (sum_of_supporting_reads >= 2) {
                if (mode == 1) {
                    int64_t add_one =
                        (f.contig1 == f.contig2
                         && std::llabs(f.breakpoint1 - f.breakpoint2) < 1000000)
                            ? 1
                            : 0;
                    if (f.supporting_reads() >= min_supporting_reads + add_one) {
                        f.filter = 0;
                        remaining += 1;
                    }
                } else {
                    recovered_by_supporting_reads[f.supporting_reads()] += 1;
                }
            }
        }

        if (mode == 0) {
            int64_t would_be_recovered = 0;
            for (auto it = recovered_by_supporting_reads.rbegin();
                 it != recovered_by_supporting_reads.rend(); ++it) {
                would_be_recovered += it->second;
                if (would_be_recovered >= max_fusions_to_recover) {
                    min_supporting_reads = it->first + 1;
                    break;
                }
            }
        }
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// select_best.cpp:9-79 (event_level.py:500-549)

namespace {

// select_best.cpp:9-19
int64_t rank_fusion(const EventFusion &f) {
    if (f.split_reads1 != 0 && f.split_reads2 != 0) return 3;
    if ((f.split_reads1 != 0 || f.split_reads2 != 0) && f.discordant_mates != 0)
        return 2;
    if (f.split_reads1 != 0 || f.split_reads2 != 0) return 1;
    return 0;
}

}  // namespace

PyObject *ev_select_best(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    std::map<std::array<int64_t, 4>, EventFusion *> best;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        std::array<int64_t, 4> gene_pair{f.gene1, f.gene2, f.direction1,
                                         f.direction2};
        auto found = best.find(gene_pair);
        if (found == best.end()) {
            best.emplace(gene_pair, &f);
            continue;
        }
        EventFusion *&current = found->second;
        if (rank_fusion(f) > rank_fusion(*current)) {
            current = &f;
        } else if (rank_fusion(f) == rank_fusion(*current)) {
            if (f.supporting_reads() > current->supporting_reads()) {
                current = &f;
            } else if (f.supporting_reads() == current->supporting_reads()) {
                if ((f.exonic1 && !current->exonic1)
                    || (f.exonic2 && !current->exonic2)) {
                    current = &f;
                } else if ((!current->exonic1 || f.exonic1 == current->exonic1)
                           && (!current->exonic2
                               || f.exonic2 == current->exonic2)) {
                    if ((f.direction1 == DOWNSTREAM
                         && f.breakpoint1 > current->breakpoint1)
                        || (f.direction1 == UPSTREAM
                            && f.breakpoint1 < current->breakpoint1)) {
                        current = &f;
                    } else if (f.breakpoint1 == current->breakpoint1) {
                        if ((f.direction2 == DOWNSTREAM
                             && f.breakpoint2 > current->breakpoint2)
                            || (f.direction2 == UPSTREAM
                                && f.breakpoint2 < current->breakpoint2))
                            current = &f;
                    }
                }
            }
        }
    }

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (best[{f.gene1, f.gene2, f.direction1, f.direction2}] == &f)
            remaining += 1;
        else
            f.filter = fid(event_store::F_SELECT_BEST);
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_marginal_read_through.cpp:7-45 (event_level.py:556-592)

PyObject *ev_marginal_read_through(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    // float like the reference (filter_marginal_read_through.cpp:9-10):
    // 1-margin and min_vaf*coverage evaluate in float32 there, which
    // decides exact-boundary cases (7 reads at coverage 100)
    const float margin = 0.01f, min_vaf = 0.07f;

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter == 0 && f.is_read_through()) {
            double position_in_donor = 1.0, position_in_acceptor = 1.0;
            int64_t g1 = f.gene1, g2 = f.gene2;
            bool g1_dummy = c.gene_is_dummy[g1] != 0;
            bool g2_dummy = c.gene_is_dummy[g2] != 0;
            bool g1_strand = eng.gene_strand[g1] != 0;
            bool g2_strand = eng.gene_strand[g2] != 0;
            if (!g1_dummy && g1_strand == FORWARD && f.direction1 == DOWNSTREAM)
                position_in_donor =
                    1.0 * (double)(f.breakpoint1 - c.gene_start[g1])
                    / (double)(c.gene_end[g1] - c.gene_start[g1]);
            else if (!g2_dummy && g2_strand == REVERSE
                     && f.direction2 == UPSTREAM)
                position_in_donor =
                    1.0 * (double)(c.gene_end[g2] - f.breakpoint2)
                    / (double)(c.gene_end[g2] - c.gene_start[g2]);
            else if (!g1_dummy && g1_strand == REVERSE
                     && f.direction1 == DOWNSTREAM)
                position_in_acceptor =
                    1.0 * (double)(f.breakpoint1 - c.gene_start[g1])
                    / (double)(c.gene_end[g1] - c.gene_start[g1]);
            else if (!g2_dummy && g2_strand == FORWARD
                     && f.direction2 == UPSTREAM)
                position_in_acceptor =
                    1.0 * (double)(c.gene_end[g2] - f.breakpoint2)
                    / (double)(c.gene_end[g2] - c.gene_start[g2]);
            else {  // both breakpoints intergenic => filter does not apply
                remaining += 1;
                continue;
            }

            int64_t coverage1 = coverage_around(f, 1);
            int64_t coverage2 = coverage_around(f, 2);
            if (position_in_donor > (double)(1 - margin)
                && position_in_acceptor > (double)(1 - margin)
                && (float)f.supporting_reads()
                       < min_vaf * (float)std::max(coverage1, coverage2))
                f.filter = fid(event_store::F_MARGINAL_READ_THROUGH);
        }
        if (f.filter == 0) remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// recover_many_spliced.cpp:8-51 (event_level.py:599-626)

PyObject *ev_recover_many_spliced(PyObject *, PyObject *args) {
    long long min_spliced_events;
    if (!PyArg_ParseTuple(args, "L", &min_spliced_events)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t clipped_id = fid(event_store::F_INCONSISTENTLY_CLIPPED);
    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    const int64_t min_support_id = fid(event_store::F_MIN_SUPPORT);
    const int64_t select_best_id = fid(event_store::F_SELECT_BEST);

    std::map<std::pair<int64_t, int64_t>, std::set<std::pair<int64_t, int64_t>>>
        spliced_by_gene_pair;
    for (const EventFusion &f : s.fusions) {
        if (!f.is_read_through() && (f.spliced1 || f.spliced2)
            && f.gene1 != f.gene2 && !breakpoint_overlaps_both_genes(f)
            && (f.filter == 0 || f.filter == clipped_id
                || f.filter == relative_id || f.filter == min_support_id
                || f.filter == select_best_id))
            spliced_by_gene_pair[{f.gene1, f.gene2}].emplace(
                f.breakpoint1 / 10, f.breakpoint2 / 10);
    }

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter == 0) {
            remaining += 1;
            continue;
        }
        if (f.is_read_through() || f.gene1 == f.gene2
            || breakpoint_overlaps_both_genes(f))
            continue;
        if (f.filter == clipped_id || f.filter == relative_id
            || f.filter == min_support_id || f.filter == select_best_id) {
            if (f.spliced1 || f.spliced2) {
                auto found = spliced_by_gene_pair.find({f.gene1, f.gene2});
                if (found != spliced_by_gene_pair.end()
                    && (int64_t)found->second.size() >= min_spliced_events) {
                    f.filter = 0;
                    remaining += 1;
                }
            }
        }
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_genomic_support.cpp:222-401 (genomic_support.py:219-338)

PyObject *ev_assign_confidence(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();

    std::unordered_map<int64_t, std::vector<const EventFusion *>> fusions_by_gene;
    for (const EventFusion &f : s.fusions) {
        fusions_by_gene[f.gene1].push_back(&f);
        fusions_by_gene[f.gene2].push_back(&f);
    }

    for (EventFusion &f : s.fusions) {
        int64_t coverage1 = coverage_around(f, 1);
        int64_t coverage2 = coverage_around(f, 2);
        double coverage_fraction =
            (double)(f.split_read1_list.size() + f.split_read2_list.size()
                     + f.discordant_list.size())
            / (double)std::max((int64_t)1, std::max(coverage1, coverage2));

        if (f.filter != 0) {
            f.confidence = CONFIDENCE_LOW;
            continue;
        }

        f.confidence = CONFIDENCE_HIGH;

        if (f.evalue > 0.3 || f.supporting_reads() < 2) {
            f.confidence = CONFIDENCE_LOW;

        } else if (f.is_read_through()) {
            f.confidence = CONFIDENCE_LOW;
            if (((f.split_reads1 > 0 && f.split_reads2 > 0)
                 || (f.split_reads1 > 0 && f.discordant_mates > 0)
                 || (f.split_reads2 > 0 && f.discordant_mates > 0))
                && f.supporting_reads() >= 10) {
                if (f.split_reads1 + f.split_reads2 >= 10
                    && coverage_fraction > 0.07)
                    f.confidence = CONFIDENCE_HIGH;
                else
                    f.confidence = CONFIDENCE_MEDIUM;
            } else {
                // look for multiple deletions involving the same gene
                int64_t number_of_deletions = 0;
                for (int which = 0; which < 2; ++which) {
                    int64_t gene = which == 0 ? f.gene1 : f.gene2;
                    for (const EventFusion *other : fusions_by_gene[gene]) {
                        if (other->filter == 0
                            && other->split_reads1 + other->split_reads2 > 0
                            && other->direction1 == DOWNSTREAM
                            && other->direction2 == UPSTREAM
                            && ((other->gene1 == f.gene1
                                 && other->gene2 != f.gene2)
                                || (other->gene1 != f.gene1
                                    && other->gene2 == f.gene2))
                            && (other->breakpoint1 != f.breakpoint1
                                || other->breakpoint2 != f.breakpoint2)
                            && other->breakpoint2 > f.breakpoint1
                            && other->breakpoint1 < f.breakpoint2)
                            number_of_deletions += 1;
                    }
                }
                if (number_of_deletions >= 1)
                    f.confidence = CONFIDENCE_MEDIUM;
            }

        } else if (breakpoint_overlaps_both_genes(f) || f.gene1 == f.gene2) {
            f.confidence = CONFIDENCE_LOW;
            if (f.split_reads1 + f.split_reads2 > 0) {
                if (!f.exonic1 && !f.exonic2) {
                    if (f.split_reads1 > 0 && f.split_reads2 > 0)
                        f.confidence = CONFIDENCE_HIGH;
                    else
                        f.confidence = CONFIDENCE_MEDIUM;
                } else if (!f.exonic1 || !f.exonic2) {
                    if (f.split_reads1 > 3 && f.split_reads2 > 3)
                        f.confidence = CONFIDENCE_HIGH;
                    else
                        f.confidence = CONFIDENCE_MEDIUM;
                }
            }
        }

        // lift confidence of rescued internal tandem duplications
        if (f.confidence == CONFIDENCE_LOW && f.gene1 == f.gene2 && f.exonic1
            && f.exonic2 && !f.spliced1 && !f.spliced2
            && f.breakpoint2 - f.breakpoint1 < 100 && f.split_reads1 > 0
            && f.split_reads2 > 0 && f.split_reads1 + f.split_reads2 >= 10
            && coverage_fraction > 0.15 && f.direction1 == UPSTREAM
            && f.direction2 == DOWNSTREAM)
            f.confidence = CONFIDENCE_MEDIUM;

        // multiple spliced events between the same pair of genes
        if (f.confidence < CONFIDENCE_HIGH && f.spliced1 && f.spliced2
            && !f.is_read_through() && f.gene1 != f.gene2) {
            int64_t number_of_spliced_breakpoints = 0;
            for (int which = 0; which < 2; ++which) {
                int64_t gene = which == 0 ? f.gene1 : f.gene2;
                for (const EventFusion *other : fusions_by_gene[gene]) {
                    if (other->gene1 == f.gene1 && other->gene2 == f.gene2
                        && other->spliced1 && other->spliced2
                        && (std::llabs(other->breakpoint1 - f.breakpoint1) > 2
                            || std::llabs(other->breakpoint2 - f.breakpoint2)
                                   > 2))
                        number_of_spliced_breakpoints += 1;
                }
            }
            if (number_of_spliced_breakpoints > 0) f.confidence += 1;
        }

        // penalize when no breakpoint is spliced (not for intragenic events)
        if (f.gene1 != f.gene2 && f.confidence > CONFIDENCE_LOW && !f.spliced1
            && !f.spliced2)
            f.confidence -= 1;

        // excellent support => high confidence regardless
        if (f.split_reads1 > 20 && f.split_reads2 > 20
            && f.supporting_reads() > 60)
            f.confidence = CONFIDENCE_HIGH;

        // suspicious read-count patterns
        if (f.confidence > CONFIDENCE_LOW) {
            if (f.split_reads1 + f.split_reads2 == 0
                || f.split_reads1 + f.discordant_mates == 0
                || f.split_reads2 + f.discordant_mates == 0)
                f.confidence -= 1;
            else if ((f.split_reads1 + f.split_reads2) * 20 < f.discordant_mates)
                f.confidence -= 1;
            else if (f.evalue > 0.2 || coverage_fraction < 0.01)
                f.confidence = CONFIDENCE_MEDIUM;
        }

        // supporting SV raises confidence
        if (f.confidence < CONFIDENCE_HIGH && f.closest_genomic_breakpoint1 >= 0
            && ((f.evalue < 0.3 && f.supporting_reads() >= 2)
                || (f.spliced1 && f.spliced2 && f.gene1 != f.gene2)
                || (std::llabs(f.breakpoint1 - f.closest_genomic_breakpoint1)
                        + std::llabs(f.breakpoint2
                                     - f.closest_genomic_breakpoint2)
                    < 20000)
                || f.contig1 != f.contig2
                || (std::llabs(f.breakpoint2 - f.breakpoint1) > 1000000
                    && f.gene1 != f.gene2)))
            f.confidence += 1;
    }
    Py_RETURN_NONE;
}

// filter_genomic_support.cpp:404-419 (genomic_support.py:341-351)
PyObject *ev_no_genomic_support(PyObject *, PyObject *args) {
    const char *viral;
    Py_ssize_t viral_len;
    if (!PyArg_ParseTuple(args, "y#", &viral, &viral_len)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (f.closest_genomic_breakpoint1 < 0 && f.confidence == CONFIDENCE_LOW
            && !(f.contig1 < viral_len && viral[f.contig1])
            && !(f.contig2 < viral_len && viral[f.contig2]))
            f.filter = fid(event_store::F_NO_GENOMIC_SUPPORT);
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// filter_genomic_support.cpp:421-444 (genomic_support.py:354-366)
PyObject *ev_recover_genomic_support(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t end_to_end_id = fid(event_store::F_END_TO_END);
    const int64_t intronic_id = fid(event_store::F_INTRONIC);
    const int64_t mismappers_id = fid(event_store::F_MISMAPPERS);
    const int64_t no_coverage_id = fid(event_store::F_NO_COVERAGE);
    const int64_t in_vitro_id = fid(event_store::F_IN_VITRO);
    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter == 0) {
            remaining += 1;
            continue;
        }
        if (f.closest_genomic_breakpoint1 >= 0
            && (f.filter == end_to_end_id || f.filter == intronic_id
                || f.filter == mismappers_id || f.filter == no_coverage_id
                || f.filter == in_vitro_id || f.filter == relative_id)) {
            f.filter = 0;
            remaining += 1;
        }
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_short_anchor.cpp:7-23 (event_level.py:633-645)

PyObject *ev_short_anchor(PyObject *, PyObject *args) {
    long long min_length;
    if (!PyArg_ParseTuple(args, "L", &min_length)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if (!(f.spliced1 && f.spliced2)
            && (std::llabs(f.anchor_start1 - f.breakpoint1) < min_length
                || std::llabs(f.anchor_start2 - f.breakpoint2) < min_length))
            f.filter = fid(event_store::F_SHORT_ANCHOR);
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_end_to_end.cpp:8-77 (event_level.py:652-715)

namespace {

// filter_end_to_end.cpp:8-23 — fraction of the gene not covered by its own
// exons, walking interval-index regions
float calculate_intronic_fraction(int64_t gene) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    int64_t intronic_bases = 0;
    int64_t gene_start = c.gene_start[gene];
    int64_t gene_end = c.gene_end[gene];
    int64_t contig = eng.gene_contig[gene];
    int64_t previous_position = gene_start;
    if (contig < eng.n_contigs) {
        const annotate_engine::ContigIndex &index = eng.exon_index[contig];
        const std::vector<int64_t> &bounds = index.boundaries;
        size_t idx = std::lower_bound(bounds.begin(), bounds.end(), gene_start)
                     - bounds.begin();
        while (idx < bounds.size() && bounds[idx] <= gene_end) {
            int64_t lo = index.offsets[idx], hi = index.offsets[idx + 1];
            for (int64_t i = lo; i < hi; ++i) {
                int64_t e = index.items[i];
                if (eng.exon_gene[e] == gene) {
                    if (previous_position < eng.exon_start[e])
                        intronic_bases += eng.exon_start[e] - previous_position;
                    if (previous_position < eng.exon_end[e])
                        previous_position = eng.exon_end[e] + 1;
                    break;
                }
            }
            idx += 1;
        }
    }
    // float division like the reference (filter_end_to_end.cpp:23)
    return (float)intronic_bases / (float)(gene_end - gene_start + 1);
}

}  // namespace

PyObject *ev_end_to_end(PyObject *, PyObject *args) {
    const char *viral;
    Py_ssize_t viral_len;
    if (!PyArg_ParseTuple(args, "y#", &viral, &viral_len)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    const int64_t many_discordant_mates = 10;
    const int64_t min_breakpoint_distance = 1000000;
    const float max_intronic_fraction = 0.66f;  // const float, cpp:59

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        if ((f.contig1 < viral_len && viral[f.contig1])
            || (f.contig2 < viral_len && viral[f.contig2]))
            continue;  // the reference's `continue` skips remaining++
        if (!f.is_read_through() && f.gene1 != f.gene2
            && (f.spliced1 || f.spliced2)) {
            remaining += 1;
            continue;
        }

        if (f.discordant_mates + f.split_reads1 == 0
            || f.discordant_mates + f.split_reads2 == 0
            || f.split_reads1 + f.split_reads2 == 0
            || (breakpoint_overlaps_both_genes(f)
                && (f.split_reads1 == 0 || f.split_reads2 == 0))) {
            bool g1_dummy = c.gene_is_dummy[f.gene1] != 0;
            bool g2_dummy = c.gene_is_dummy[f.gene2] != 0;
            bool g1_strand = eng.gene_strand[f.gene1] != 0;
            bool g2_strand = eng.gene_strand[f.gene2] != 0;
            if ((g1_dummy || (g1_strand == FORWARD && f.direction1 == UPSTREAM)
                 || (g1_strand == REVERSE && f.direction1 == DOWNSTREAM))
                && (g2_dummy
                    || (g2_strand == FORWARD && f.direction2 == UPSTREAM)
                    || (g2_strand == REVERSE && f.direction2 == DOWNSTREAM))) {
                if (f.discordant_mates < many_discordant_mates
                    || (f.contig1 == f.contig2
                        && std::llabs(f.breakpoint1 - f.breakpoint2)
                               < min_breakpoint_distance)
                    || (f.exonic1 && f.exonic2
                        && calculate_intronic_fraction(f.gene1)
                               > max_intronic_fraction
                        && calculate_intronic_fraction(f.gene2)
                               > max_intronic_fraction)) {
                    f.filter = fid(event_store::F_END_TO_END);
                    continue;
                }
            }
        }
        remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_no_coverage.cpp:8-102 (event_level.py:722-780)

namespace {

// read_stats.cpp:269-279 — note the reference's trunc division and the
// unsigned cast that turns a negative window into an immediate miss
bool fragment_starts_here(int64_t contig, int64_t start, int64_t end) {
    const Store &s = event_store::store();
    if (contig >= (int64_t)s.frag_starts.size()
        || s.frag_starts[contig] == nullptr)
        return false;
    for (int64_t w = start / COVERAGE_RESOLUTION + 1;
         w <= end / COVERAGE_RESOLUTION; ++w) {
        if ((uint64_t)w >= (uint64_t)s.frag_starts_len[contig]) return false;
        if (s.frag_starts[contig][w]) return true;
    }
    return false;
}

// read_stats.cpp:282-292
bool fragment_ends_here(int64_t contig, int64_t start, int64_t end) {
    const Store &s = event_store::store();
    if (contig >= (int64_t)s.frag_ends.size() || s.frag_ends[contig] == nullptr)
        return false;
    for (int64_t w = start / COVERAGE_RESOLUTION;
         w < end / COVERAGE_RESOLUTION; ++w) {
        if ((uint64_t)w >= (uint64_t)s.frag_ends_len[contig]) return false;
        if (s.frag_ends[contig][w]) return true;
    }
    return false;
}

bool breakpoint_in_terminal_exon(int64_t contig, int64_t breakpoint,
                                 int64_t gene) {
    const annotate_engine::Engine &eng = annotate_engine::engine();
    std::vector<int64_t> exon_set;
    annotate_engine::exon_point_query(contig, breakpoint, exon_set);
    for (int64_t e : exon_set)
        if (eng.exon_gene[e] == gene
            && (eng.exon_prev[e] < 0 || eng.exon_next[e] < 0))
            return true;
    return false;
}

}  // namespace

PyObject *ev_no_coverage(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t scan_range = 200;

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;

        if (!f.is_read_through()) {
            if (f.split_reads1 + f.split_reads2 != 0
                && f.split_reads1 + f.discordant_mates != 0
                && f.split_reads2 + f.discordant_mates != 0) {
                remaining += 1;
                continue;
            }
            if (f.spliced1 || f.spliced2) {
                remaining += 1;
                continue;
            }
        } else {
            if (f.spliced1 && f.spliced2) {
                remaining += 1;
                continue;
            }
        }

        bool filtered = false;
        for (int which = 1; which <= 2 && !filtered; ++which) {
            int64_t contig = which == 1 ? f.contig1 : f.contig2;
            int64_t breakpoint = which == 1 ? f.breakpoint1 : f.breakpoint2;
            int64_t gene = which == 1 ? f.gene1 : f.gene2;
            bool direction = which == 1 ? f.direction1 : f.direction2;
            int64_t anchor_start = which == 1 ? f.anchor_start1 : f.anchor_start2;

            if (breakpoint_in_terminal_exon(contig, breakpoint, gene)) continue;
            int64_t start, end;
            if (direction == UPSTREAM) {
                start = breakpoint;
                if (f.split_reads1 + f.split_reads2 == 0) start -= scan_range;
                end = std::max(breakpoint + scan_range, anchor_start);
            } else {
                start = std::min(breakpoint - scan_range, anchor_start);
                end = breakpoint;
                if (f.split_reads1 + f.split_reads2 == 0) end += scan_range;
            }
            if ((direction == UPSTREAM
                 && !fragment_starts_here(contig, start, end))
                || (direction == DOWNSTREAM
                    && !fragment_ends_here(contig, start, end))) {
                f.filter = fid(event_store::F_NO_COVERAGE);
                filtered = true;
            }
        }
        if (!filtered) remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// recover_isoforms.cpp:10-47 (event_level.py:787-810)

PyObject *ev_recover_isoforms(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t MAX_SPLICE_SITE_DISTANCE = 2;
    const int64_t merge_adjacent_id = fid(event_store::F_MERGE_ADJACENT);
    const int64_t blacklist_id = fid(event_store::F_BLACKLIST);
    const int64_t end_to_end_id = fid(event_store::F_END_TO_END);
    const int64_t duplicates_id = fid(event_store::F_DUPLICATES);

    std::map<std::array<int64_t, 4>, const EventFusion *> fused_gene_pairs;
    for (const EventFusion &f : s.fusions)
        if (f.filter == 0)
            fused_gene_pairs[{f.gene1, f.gene2, f.direction1, f.direction2}] =
                &f;

    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter == 0) {
            remaining += 1;
            continue;
        }
        if (f.filter == merge_adjacent_id || f.filter == blacklist_id
            || f.filter == end_to_end_id || f.filter == duplicates_id
            || f.gene1 == f.gene2)
            continue;
        if (f.spliced1 && f.spliced2) {
            auto found = fused_gene_pairs.find(
                {f.gene1, f.gene2, f.direction1, f.direction2});
            if (found != fused_gene_pairs.end()
                && (std::llabs(found->second->breakpoint1 - f.breakpoint1)
                        > MAX_SPLICE_SITE_DISTANCE
                    || std::llabs(found->second->breakpoint2 - f.breakpoint2)
                        > MAX_SPLICE_SITE_DISTANCE)) {
                f.filter = 0;
                remaining += 1;
            }
        }
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_blacklisted_ranges.cpp:124-300 + recover_known_fusions.cpp:14-100
// (blacklist.py). Python parses the item files (gene-name resolution and
// warnings stay in blacklist.py); the native stages receive columnar item
// pairs: 14 int64 per pair = (type, strand_defined, strand, contig, start,
// end, gene) x 2.

namespace {

// filter_blacklisted_ranges.hpp:14
enum BlacklistType {
    BL_RANGE = 0, BL_POSITION, BL_GENE, BL_ANY, BL_SPLIT_READ_DONOR,
    BL_SPLIT_READ_ACCEPTOR, BL_SPLIT_READ_ANY, BL_DISCORDANT_MATES,
    BL_READ_THROUGH, BL_LOW_SUPPORT, BL_FILTER_SPLICED, BL_NOT_BOTH_SPLICED
};

constexpr int64_t GENOME_BIN_SIZE = 100000;  // filter_blacklisted_ranges.cpp:228

struct BlacklistItem {
    int64_t type, strand_defined, strand, contig, start, end, gene;
};

// filter_blacklisted_ranges.cpp:124-136 — fraction of range1 inside range2
double overlapping_fraction(int64_t start1, int64_t end1, int64_t start2,
                            int64_t end2) {
    if (start1 >= start2 && end1 <= end2) return 1.0;
    if (start1 < start2 && end1 > end2)
        return 1.0 * (double)(end2 - start2) / (double)(end1 - start1 + 1);
    if (start2 <= start1 && start1 <= end2)
        return 1.0 * (double)(end2 - start1) / (double)(end1 - start1 + 1);
    if (start2 <= end1 && end1 <= end2)
        return 1.0 * (double)(end1 - start2) / (double)(end1 - start1 + 1);
    return 0.0;
}

// filter_blacklisted_ranges.cpp:139-219
bool matches_blacklist_item(const BlacklistItem &item, const EventFusion &f,
                            int which_breakpoint, int64_t max_mate_gap,
                            double evalue_cutoff) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    switch (item.type) {
        case BL_ANY:
            return true;
        case BL_SPLIT_READ_DONOR:
            return (which_breakpoint == 1
                    && f.discordant_mates + f.split_reads1 == 0)
                   || (which_breakpoint == 2
                       && f.discordant_mates + f.split_reads2 == 0);
        case BL_SPLIT_READ_ACCEPTOR:
            return (which_breakpoint == 1
                    && f.discordant_mates + f.split_reads2 == 0)
                   || (which_breakpoint == 2
                       && f.discordant_mates + f.split_reads1 == 0);
        case BL_SPLIT_READ_ANY:
            return f.discordant_mates == 0;
        case BL_DISCORDANT_MATES:
            return f.split_reads1 + f.split_reads2 == 0;
        case BL_READ_THROUGH:
            return f.is_read_through();
        case BL_LOW_SUPPORT:
            return f.evalue > evalue_cutoff;
        case BL_FILTER_SPLICED:
            return f.evalue > evalue_cutoff && f.spliced1 && f.spliced2;
        case BL_NOT_BOTH_SPLICED:
            return !f.spliced1 || !f.spliced2;
        case BL_GENE:
            return (which_breakpoint == 1 && f.gene1 == item.gene)
                   || (which_breakpoint == 2 && f.gene2 == item.gene);
        default:
            break;
    }

    int64_t contig = which_breakpoint == 1 ? f.contig1 : f.contig2;
    if (contig != item.contig) return false;
    if (item.strand_defined && !f.predicted_strands_ambiguous) {
        bool strand = which_breakpoint == 1 ? f.predicted_strand1
                                            : f.predicted_strand2;
        if (strand != (item.strand != 0)) return false;
    }

    if (item.type == BL_POSITION) {
        int64_t breakpoint = which_breakpoint == 1 ? f.breakpoint1
                                                   : f.breakpoint2;
        if (breakpoint == item.start) return true;
        if (f.split_reads1 + f.split_reads2 == 0) {
            bool direction = which_breakpoint == 1 ? f.direction1
                                                   : f.direction2;
            if ((direction == DOWNSTREAM && item.start - max_mate_gap <= breakpoint
                 && breakpoint <= item.start)
                || (direction == UPSTREAM && item.start <= breakpoint
                    && breakpoint <= item.start + max_mate_gap))
                return true;
        }
        return false;
    }

    // BL_RANGE
    int64_t gene = which_breakpoint == 1 ? f.gene1 : f.gene2;
    return overlapping_fraction(c.gene_start[gene], c.gene_end[gene],
                                item.start, item.end)
           > 0.5;
}

// filter_blacklisted_ranges.cpp:226-230
void get_genome_bins_from_range(int64_t contig, int64_t start, int64_t end,
                                std::vector<std::pair<int64_t, int64_t>> &out) {
    int64_t position = start / GENOME_BIN_SIZE;
    int64_t last = (end + GENOME_BIN_SIZE - 1) / GENOME_BIN_SIZE;
    while (position <= last) {
        out.emplace_back(contig, position * GENOME_BIN_SIZE);
        position += 1;
    }
}

bool parse_item_pairs(PyObject *items_obj, std::vector<BlacklistItem> &out) {
    Py_buffer view;
    if (PyObject_GetBuffer(items_obj, &view, PyBUF_SIMPLE) != 0) return false;
    const int64_t *data = (const int64_t *)view.buf;
    size_t n = (size_t)(view.len / 8) / 7;
    out.resize(n);
    for (size_t i = 0; i < n; ++i) {
        const int64_t *row = data + i * 7;
        out[i] = BlacklistItem{row[0], row[1], row[2], row[3],
                               row[4], row[5], row[6]};
    }
    PyBuffer_Release(&view);
    return true;
}

}  // namespace

// filter_blacklisted_ranges.cpp:233-300 (blacklist.py:239-289)
PyObject *ev_blacklist(PyObject *, PyObject *args) {
    PyObject *items_obj;
    double evalue_cutoff;
    long long max_mate_gap;
    if (!PyArg_ParseTuple(args, "OdL", &items_obj, &evalue_cutoff,
                          &max_mate_gap))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();

    std::vector<BlacklistItem> items;
    if (!parse_item_pairs(items_obj, items)) return nullptr;
    size_t n_pairs = items.size() / 2;

    // index fusions by coordinate (100 kb genome bins); per bin, ascending
    // fusion order with lazy removal — matches the reference's map semantics
    std::map<std::pair<int64_t, int64_t>, std::vector<size_t>>
        fusions_by_coordinate;
    std::vector<std::pair<int64_t, int64_t>> genome_bins;
    for (size_t order = 0; order < s.fusions.size(); ++order) {
        const EventFusion &f = s.fusions[order];
        if (f.filter != 0 && f.closest_genomic_breakpoint1 < 0)
            continue;  // already filtered and not recoverable
        genome_bins.clear();
        get_genome_bins_from_range(f.contig1, f.breakpoint1, f.breakpoint1,
                                   genome_bins);
        get_genome_bins_from_range(f.contig2, f.breakpoint2, f.breakpoint2,
                                   genome_bins);
        get_genome_bins_from_range(f.contig1, c.gene_start[f.gene1],
                                   c.gene_end[f.gene1], genome_bins);
        get_genome_bins_from_range(f.contig2, c.gene_start[f.gene2],
                                   c.gene_end[f.gene2], genome_bins);
        std::sort(genome_bins.begin(), genome_bins.end());
        genome_bins.erase(std::unique(genome_bins.begin(), genome_bins.end()),
                          genome_bins.end());
        for (const auto &genome_bin : genome_bins)
            fusions_by_coordinate[genome_bin].push_back(order);
    }

    const int64_t blacklist_id = fid(event_store::F_BLACKLIST);
    for (size_t p = 0; p < n_pairs; ++p) {
        const BlacklistItem &item1 = items[p * 2];
        const BlacklistItem &item2 = items[p * 2 + 1];
        genome_bins.clear();
        if (item1.type == BL_POSITION || item1.type == BL_RANGE
            || item1.type == BL_GENE)
            get_genome_bins_from_range(item1.contig,
                                       item1.start - max_mate_gap,
                                       item1.end + max_mate_gap, genome_bins);
        if (item2.type == BL_POSITION || item2.type == BL_RANGE
            || item2.type == BL_GENE)
            get_genome_bins_from_range(item2.contig,
                                       item2.start - max_mate_gap,
                                       item2.end + max_mate_gap, genome_bins);
        for (const auto &genome_bin : genome_bins) {
            auto found = fusions_by_coordinate.find(genome_bin);
            if (found == fusions_by_coordinate.end()) continue;
            std::vector<size_t> &bin_fusions = found->second;
            size_t kept = 0;
            for (size_t i = 0; i < bin_fusions.size(); ++i) {
                EventFusion &f = s.fusions[bin_fusions[i]];
                if ((matches_blacklist_item(item1, f, 1, max_mate_gap,
                                            evalue_cutoff)
                     && matches_blacklist_item(item2, f, 2, max_mate_gap,
                                               evalue_cutoff))
                    || (matches_blacklist_item(item1, f, 2, max_mate_gap,
                                               evalue_cutoff)
                        && matches_blacklist_item(item2, f, 1, max_mate_gap,
                                                  evalue_cutoff))) {
                    f.filter = blacklist_id;
                    // removed from this bin (not copied to `kept`)
                } else {
                    bin_fusions[kept++] = bin_fusions[i];
                }
            }
            bin_fusions.resize(kept);
        }
    }
    return PyLong_FromLongLong(count_remaining());
}

// recover_known_fusions.cpp:14-100 (blacklist.py:296-354)
PyObject *ev_known_fusions(PyObject *, PyObject *args) {
    PyObject *items_obj;
    long long max_mate_gap;
    if (!PyArg_ParseTuple(args, "OL", &items_obj, &max_mate_gap))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();

    std::vector<BlacklistItem> items;
    if (!parse_item_pairs(items_obj, items)) return nullptr;
    size_t n_pairs = items.size() / 2;

    std::map<std::pair<int64_t, int64_t>, std::vector<size_t>>
        known_by_coordinate;
    std::vector<std::pair<int64_t, int64_t>> genome_bins;
    for (size_t p = 0; p < n_pairs; ++p) {
        genome_bins.clear();
        get_genome_bins_from_range(items[p * 2].contig, items[p * 2].start,
                                   items[p * 2].end, genome_bins);
        get_genome_bins_from_range(items[p * 2 + 1].contig,
                                   items[p * 2 + 1].start,
                                   items[p * 2 + 1].end, genome_bins);
        for (const auto &genome_bin : genome_bins)
            known_by_coordinate[genome_bin].push_back(p);
    }

    const int64_t relative_id = fid(event_store::F_RELATIVE_SUPPORT);
    const int64_t min_support_id = fid(event_store::F_MIN_SUPPORT);
    for (EventFusion &f : s.fusions) {
        if (f.filter == 0) continue;
        if (f.gene1 == f.gene2) continue;
        if (f.filter != relative_id && f.filter != min_support_id) continue;

        genome_bins.clear();
        get_genome_bins_from_range(f.contig1, f.breakpoint1, f.breakpoint1,
                                   genome_bins);
        get_genome_bins_from_range(f.contig2, f.breakpoint2, f.breakpoint2,
                                   genome_bins);
        get_genome_bins_from_range(f.contig1, c.gene_start[f.gene1],
                                   c.gene_end[f.gene1], genome_bins);
        get_genome_bins_from_range(f.contig2, c.gene_start[f.gene2],
                                   c.gene_end[f.gene2], genome_bins);
        for (const auto &genome_bin : genome_bins) {
            auto found = known_by_coordinate.find(genome_bin);
            if (found == known_by_coordinate.end()) continue;
            for (size_t p : found->second) {
                const BlacklistItem &item1 = items[p * 2];
                const BlacklistItem &item2 = items[p * 2 + 1];
                int gene_5 = f.transcript_start ? 1 : 2;  // TRANSCRIPT_START_GENE1
                int gene_3 = f.transcript_start ? 2 : 1;
                bool match_found =
                    matches_blacklist_item(item1, f, gene_5, max_mate_gap, 0.0)
                    && matches_blacklist_item(item2, f, gene_3, max_mate_gap,
                                              0.0);
                if (!match_found && f.transcript_start_ambiguous
                    && !(f.contig1 == f.contig2
                         && std::llabs(f.breakpoint2 - f.breakpoint1)
                                < 1000000))
                    match_found = matches_blacklist_item(item1, f, gene_3,
                                                         max_mate_gap, 0.0)
                                  && matches_blacklist_item(item2, f, gene_5,
                                                            max_mate_gap, 0.0);
                if (match_found) {
                    if ((item1.type == BL_POSITION && item2.type == BL_POSITION)
                        || f.supporting_reads() >= 2
                        || (both_breakpoints_spliced(f)
                            && coverage_around(f, 1) + coverage_around(f, 2)
                                   < 200
                            && (f.contig1 != f.contig2
                                || std::llabs(f.breakpoint2 - f.breakpoint1)
                                       > 1000000)))
                        f.filter = 0;
                }
            }
        }
    }
    return PyLong_FromLongLong(count_remaining());
}

// ---------------------------------------------------------------------------
// filter_mismappers.cpp:47-84 + filter_homologs.cpp + filter_mismappers.cpp:
// 189-359 over the realignment engine (realign.h), fully native: the event
// store picks the genes, the engine indexes k-mers over the cascade store's
// pinned assembly buffers, and the recursion runs without a Python round-trip.

#include "realign.h"

// filter_mismappers.cpp:47-84 (mismappers.py make_kmer_index)
PyObject *ev_make_kmer_index(PyObject *, PyObject *args) {
    long long padding;
    int threads = 1;
    if (!PyArg_ParseTuple(args, "L|i", &padding, &threads)) return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    if (padding < 0) padding = 0;

    std::set<int64_t> genes_to_filter;
    for (const EventFusion &f : s.fusions) {
        if (f.filter != 0 || f.gene1 == f.gene2) continue;
        genes_to_filter.insert(f.gene1);
        genes_to_filter.insert(f.gene2);
    }

    realign_engine::reset_engine();
    std::set<int64_t> contigs;
    for (int64_t gene : genes_to_filter)
        contigs.insert(eng.gene_contig[gene]);
    for (int64_t contig : contigs)
        if (contig < (int64_t)c.assembly.size() && c.assembly[contig] != nullptr)
            realign_engine::set_contig_raw((int)contig, c.assembly[contig],
                                           (Py_ssize_t)c.assembly_len[contig]);

    // genes grouped per contig: each worker owns whole contigs and writes
    // that contig's kmer_index directly — no cross-thread merge, and the
    // per-contig gene order matches the serial loop (the final sort+unique
    // pass canonicalizes overlapping windows either way), so the index is
    // identical at any thread count
    std::map<int64_t, std::vector<int64_t>> genes_by_contig;
    for (int64_t gene : genes_to_filter)
        genes_by_contig[eng.gene_contig[gene]].push_back(gene);

    auto fill_gene = [&](realign_engine::Contig &engine_contig, int64_t gene,
                         std::vector<realign_engine::KmerPair> &out) {
        int64_t gene_start =
            std::max(c.gene_start[gene] - (int64_t)padding, (int64_t)0);
        int64_t gene_end = std::min(c.gene_end[gene] + (int64_t)padding,
                                    (int64_t)engine_contig.length - 1);
        realign_engine::append_window_kmers(engine_contig.data, gene_start,
                                            gene_end, out);
        /* per-gene presence bitset for align_recursive's seed pre-screen:
         * built from the raw contig bytes over the padded window (+K so
         * every kmer STARTING inside the window is covered) — a superset
         * of any bucket hit a query inside this range could see. The map
         * slot was pre-inserted serially; workers fill disjoint genes. */
        auto found_bits = realign_engine::engine().gene_kmer_bits.find(gene);
        if (found_bits != realign_engine::engine().gene_kmer_bits.end()) {
            found_bits->second.start = gene_start;
            found_bits->second.end = std::min(
                gene_end + 2 * realign_engine::REALIGN_KMER_LENGTH,
                (int64_t)engine_contig.length);
            realign_engine::fill_kmer_bits(engine_contig.data, gene_start,
                                           found_bits->second.end,
                                           found_bits->second.bits);
        }
    };
    /* pre-insert every gene's bitset slot so the parallel fill below never
     * mutates the map structure concurrently */
    realign_engine::engine().gene_kmer_bits.clear();
    for (int64_t gene : genes_to_filter)
        if (realign_engine::engine().contigs.count(
                (int)eng.gene_contig[gene]))
            realign_engine::engine().gene_kmer_bits[gene];

    // gene-level LPT across threads (finer than per-contig: a 2-contig
    // genome still uses every core). finalize_kmer_index sorts + uniques
    // each bucket, so the pending fill order is immaterial — the built
    // index is byte-identical at any thread count / partition.
    std::vector<std::pair<int64_t, int64_t>> items;  /* (weight, gene) */
    for (const auto &entry : genes_by_contig)
        for (int64_t gene : entry.second)
            if (realign_engine::engine().contigs.count((int)entry.first))
                items.emplace_back(c.gene_end[gene] - c.gene_start[gene]
                                       + 2 * (int64_t)padding,
                                   gene);
    int workers = std::max(1, std::min(threads, (int)items.size()));
    if (workers <= 1) {
        for (const auto &item : items) {
            int64_t gene = item.second;
            realign_engine::Contig &engine_contig =
                realign_engine::engine().contigs.at(
                    (int)eng.gene_contig[gene]);
            fill_gene(engine_contig, gene, engine_contig.pending);
        }
        for (const auto &entry : genes_by_contig) {
            auto found = realign_engine::engine().contigs.find(
                (int)entry.first);
            if (found != realign_engine::engine().contigs.end())
                realign_engine::finalize_kmer_index(found->second);
        }
    } else {
        std::sort(items.rbegin(), items.rend());
        std::vector<int64_t> load(workers, 0);
        std::vector<std::vector<int64_t>> assignment(workers);
        for (const auto &item : items) {
            int target = 0;
            for (int w = 1; w < workers; ++w)
                if (load[w] < load[target]) target = w;
            load[target] += item.first;
            assignment[target].push_back(item.second);
        }
        /* per-(worker, contig) private buffers, concatenated after the join */
        std::vector<std::map<int64_t,
                             std::vector<realign_engine::KmerPair>>>
            locals(workers);
        std::vector<std::thread> pool;
        pool.reserve(workers);
        for (int w = 0; w < workers; ++w)
            pool.emplace_back([&, w]() {
                /* reserve each (worker, contig) buffer to its exact upper
                 * bound so the fill never reallocates */
                std::map<int64_t, size_t> bound;
                for (int64_t gene : assignment[w])
                    bound[eng.gene_contig[gene]] +=
                        (size_t)std::max((int64_t)0,
                                         c.gene_end[gene] - c.gene_start[gene]
                                             + 2 * (int64_t)padding + 1);
                for (const auto &entry : bound)
                    locals[w][entry.first].reserve(entry.second);
                for (int64_t gene : assignment[w]) {
                    int64_t contig = eng.gene_contig[gene];
                    realign_engine::Contig &engine_contig =
                        realign_engine::engine().contigs.at((int)contig);
                    fill_gene(engine_contig, gene, locals[w][contig]);
                }
            });
        for (std::thread &worker : pool) worker.join();
        /* finalize each contig straight from the per-worker buffers (no
         * merge copy); the finalize itself runs multithreaded */
        for (const auto &entry : genes_by_contig) {
            auto found = realign_engine::engine().contigs.find(
                (int)entry.first);
            if (found == realign_engine::engine().contigs.end()) continue;
            std::vector<const std::vector<realign_engine::KmerPair>*>
                spans;
            for (int w = 0; w < workers; ++w) {
                auto local = locals[w].find(entry.first);
                if (local != locals[w].end()) spans.push_back(&local->second);
            }
            realign_engine::finalize_kmer_index_spans(found->second, spans,
                                                      threads);
        }
    }
    Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// filter_homologs.cpp:13-140 (homologs.py)

namespace {

// filter_homologs.cpp:13-63 with the caller-side small/big selection and
// reverse complement of homologs.py:23-56
bool ev_is_homolog(int64_t gene1, int64_t gene2, double max_identity_fraction,
                   std::vector<uint8_t> &scratch) {
    if (gene1 == gene2) return false;
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    auto gene_length = [&c](int64_t g) { return c.gene_end[g] - c.gene_start[g]; };

    int64_t small_gene = gene1, big_gene = gene2;
    if (gene_length(small_gene) > gene_length(big_gene))
        std::swap(small_gene, big_gene);

    // overlapping genes trivially share sequence
    if (eng.gene_contig[small_gene] == eng.gene_contig[big_gene]
        && ((c.gene_start[big_gene] <= c.gene_start[small_gene]
             && c.gene_start[small_gene] <= c.gene_end[big_gene])
            || (c.gene_start[big_gene] <= c.gene_end[small_gene]
                && c.gene_end[small_gene] <= c.gene_end[big_gene])))
        return false;

    int64_t small_contig = eng.gene_contig[small_gene];
    int64_t big_contig = eng.gene_contig[big_gene];
    int64_t small_start = c.gene_start[small_gene];
    int64_t small_end = c.gene_end[small_gene];
    int64_t small_length = gene_length(small_gene);
    if (small_contig >= (int64_t)c.assembly.size()
        || c.assembly[small_contig] == nullptr)
        return false;

    const uint8_t *small_seq = c.assembly[small_contig] + small_start;
    if ((eng.gene_strand[small_gene] != 0) != (eng.gene_strand[big_gene] != 0)) {
        scratch.resize(small_length);
        for (int64_t i = 0; i < small_length; ++i)
            scratch[i] = complement_base(small_seq[small_length - 1 - i]);
        small_seq = scratch.data();
    }

    return realign_engine::is_homolog_core(
        small_seq, (Py_ssize_t)small_length, (int)small_contig, small_start,
        small_end, (int)big_contig, c.gene_start[big_gene],
        c.gene_end[big_gene], small_length, max_identity_fraction);
}

}  // namespace

// filter_homologs.cpp:65-140 (homologs.py:96-147)
PyObject *ev_homologs(PyObject *, PyObject *args) {
    double max_identity_fraction;
    int threads = 1;
    if (!PyArg_ParseTuple(args, "d|i", &max_identity_fraction, &threads))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const int64_t homologs_id = fid(event_store::F_HOMOLOGS);

    // the reference collects unfiltered fusions with list::push_front
    // while iterating its unordered_map (filter_homologs.cpp:69-72) — i.e.
    // the REVERSE of the emulated hash-map iteration order, NOT of store
    // order (caught by the constructed homolog-tie parity family: exact
    // support ties arbitrate by this walk order alone)
    std::vector<EventFusion *> remaining_fusions;
    for (int64_t fusion_index : reference_map_order())
        if (s.fusions[fusion_index].filter == 0)
            remaining_fusions.push_back(&s.fusions[fusion_index]);
    std::reverse(remaining_fusions.begin(), remaining_fusions.end());

    // is_homolog is a pure function of a gene pair; precompute every pair
    // the (order-dependent) arbitration loop below could query, in
    // parallel, then run the loop against the cache — identical outcomes.
    // The eager enumeration is O(R^2) and computes homology for pairs the
    // serial loop may never reach (a fusion filtered mid-loop skips its
    // later pairs), so past a size cap we fall back to exact-order lazy
    // memoization instead: no wasted k-mer scans, no quadratic blowup.
    const bool eager = remaining_fusions.size() <= 5000;
    std::map<std::pair<int64_t, int64_t>, bool> homolog_cache;
    std::vector<uint8_t> lazy_scratch;
    if (eager) {
        for (const EventFusion *fp : remaining_fusions)
            homolog_cache[{fp->gene1, fp->gene2}] = false;
        for (size_t i = 0; i < remaining_fusions.size(); ++i)
            for (size_t j = i + 1; j < remaining_fusions.size(); ++j) {
                const EventFusion &a = *remaining_fusions[i];
                const EventFusion &b = *remaining_fusions[j];
                if (a.gene1 == b.gene1 && a.breakpoint2 != b.breakpoint2)
                    homolog_cache[{a.gene2, b.gene2}] = false;
                else if (a.gene1 == b.gene2 && a.breakpoint2 != b.breakpoint1)
                    homolog_cache[{a.gene2, b.gene1}] = false;
                else if (a.gene2 == b.gene1 && a.breakpoint1 != b.breakpoint2)
                    homolog_cache[{a.gene1, b.gene2}] = false;
                else if (a.gene2 == b.gene2 && a.breakpoint1 != b.breakpoint1)
                    homolog_cache[{a.gene1, b.gene1}] = false;
            }
        std::vector<std::pair<int64_t, int64_t>> keys;
        keys.reserve(homolog_cache.size());
        for (const auto &entry : homolog_cache) keys.push_back(entry.first);
        std::vector<uint8_t> results(keys.size(), 0);
        int workers = std::min((size_t)(threads > 1 ? threads : 1),
                               keys.size());
        if (workers <= 1) {
            std::vector<uint8_t> pair_scratch;
            for (size_t k = 0; k < keys.size(); ++k)
                results[k] = ev_is_homolog(keys[k].first, keys[k].second,
                                           max_identity_fraction,
                                           pair_scratch);
        } else {
            std::vector<std::thread> pool;
            pool.reserve(workers);
            for (int w = 0; w < workers; ++w)
                pool.emplace_back([&, w]() {
                    std::vector<uint8_t> pair_scratch;
                    for (size_t k = w; k < keys.size(); k += workers)
                        results[k] = ev_is_homolog(keys[k].first,
                                                   keys[k].second,
                                                   max_identity_fraction,
                                                   pair_scratch);
                });
            for (std::thread &worker : pool) worker.join();
        }
        for (size_t k = 0; k < keys.size(); ++k)
            homolog_cache[keys[k]] = results[k] != 0;
    }
    double cache_identity = max_identity_fraction;
    auto cached_is_homolog = [&](int64_t gene1, int64_t gene2) {
        if (eager)
            return homolog_cache.at({gene1, gene2});
        auto it = homolog_cache.find({gene1, gene2});
        if (it != homolog_cache.end()) return it->second;
        bool value = ev_is_homolog(gene1, gene2, cache_identity,
                                   lazy_scratch) != 0;
        homolog_cache[{gene1, gene2}] = value;
        return value;
    };

    for (size_t i = 0; i < remaining_fusions.size(); ++i) {
        EventFusion &fusion = *remaining_fusions[i];
        if (fusion.filter != 0) continue;

        if (cached_is_homolog(fusion.gene1, fusion.gene2)) {
            fusion.filter = homologs_id;
            continue;
        }

        // cross-fusion homolog arbitration
        for (size_t j = i + 1; j < remaining_fusions.size(); ++j) {
            EventFusion &other = *remaining_fusions[j];
            if (other.filter != 0) continue;
            int64_t homolog1, homolog2;
            if (fusion.gene1 == other.gene1
                && fusion.breakpoint2 != other.breakpoint2) {
                homolog1 = fusion.gene2;
                homolog2 = other.gene2;
            } else if (fusion.gene1 == other.gene2
                       && fusion.breakpoint2 != other.breakpoint1) {
                homolog1 = fusion.gene2;
                homolog2 = other.gene1;
            } else if (fusion.gene2 == other.gene1
                       && fusion.breakpoint1 != other.breakpoint2) {
                homolog1 = fusion.gene1;
                homolog2 = other.gene2;
            } else if (fusion.gene2 == other.gene2
                       && fusion.breakpoint1 != other.breakpoint1) {
                homolog1 = fusion.gene1;
                homolog2 = other.gene1;
            } else {
                continue;
            }

            int anchor1 = (fusion.split_reads1 > 0) + (fusion.split_reads2 > 0)
                          + (fusion.discordant_mates > 0);
            int anchor2 = (other.split_reads1 > 0) + (other.split_reads2 > 0)
                          + (other.discordant_mates > 0);

            if (cached_is_homolog(homolog1, homolog2)) {
                if (anchor1 > anchor2
                    || (anchor1 == anchor2
                        && fusion.supporting_reads() > other.supporting_reads())
                    || (anchor1 == anchor2
                        && fusion.supporting_reads() == other.supporting_reads()
                        && fusion.evalue <= other.evalue)) {
                    other.filter = homologs_id;
                } else {
                    fusion.filter = homologs_id;
                    break;
                }
            }
        }
    }

    int64_t remaining = 0;
    for (const EventFusion *f : remaining_fusions)
        if (f->filter == 0) remaining += 1;
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// filter_mismappers.cpp:189-359 (mismappers.py:145-437)

namespace {

// filter_mismappers.cpp:16-31 — sorted downstream splice sites of a gene
const std::vector<int64_t> &downstream_splice_sites(int64_t gene) {
    auto &cache = realign_engine::engine().splice_sites;
    auto found = cache.find((long)gene);
    if (found != cache.end()) return found->second;
    std::vector<int64_t> &sites = cache[(long)gene];
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    int64_t contig = eng.gene_contig[gene];
    if (contig < eng.n_contigs && !eng.exon_index[contig].boundaries.empty()) {
        const std::vector<int64_t> &bounds = eng.exon_index[contig].boundaries;
        int64_t gene_start = c.gene_start[gene];
        int64_t gene_end = c.gene_end[gene];
        size_t idx = std::lower_bound(bounds.begin(), bounds.end(), gene_start)
                     - bounds.begin();
        while (idx < bounds.size() && bounds[idx] <= gene_end) {
            int64_t position = bounds[idx];
            if (annotate_engine::is_breakpoint_spliced(gene, DOWNSTREAM,
                                                       position))
                sites.push_back(position);
            idx += 1;
        }
    }
    return sites;
}

// filter_mismappers.cpp:189-230
bool align_both_strands_native(const uint8_t *read_seq, Py_ssize_t seq_len,
                               int64_t read_length, int64_t max_mate_gap,
                               bool same_contig, int64_t alignment_start,
                               int64_t alignment_end, const int64_t *gene_set,
                               int64_t n_genes, double min_align_fraction,
                               std::vector<uint8_t> &rc_scratch) {
    if (seq_len >= 300) return false;
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    int min_score = (int)(min_align_fraction * (double)seq_len + 0.5);

    for (int64_t g = 0; g < n_genes; ++g) {
        int64_t gene = gene_set[g];
        int64_t contig = eng.gene_contig[gene];
        auto found = realign_engine::engine().contigs.find((int)contig);
        if (found == realign_engine::engine().contigs.end())
            continue;  // contig not indexed (assembly absent / no fusion gene)
        const realign_engine::Contig &engine_contig = found->second;

        int64_t gene_start = std::max(
            c.gene_start[gene] - max_mate_gap - read_length, (int64_t)0);
        int64_t gene_end = std::min(c.gene_end[gene] + max_mate_gap + read_length,
                                    (int64_t)engine_contig.length - 1);

        // for intragenic events, both genes overlap the breakpoint => skip
        if (same_contig
            && ((gene_start <= alignment_start && alignment_start <= gene_end)
                || (gene_start <= alignment_end && alignment_end <= gene_end)))
            continue;

        const std::vector<int64_t> &splice_sites = downstream_splice_sites(gene);
        const uint64_t *kmer_bits = nullptr;
        {
            auto bits = realign_engine::engine().gene_kmer_bits.find(gene);
            if (bits != realign_engine::engine().gene_kmer_bits.end()
                && bits->second.start <= gene_start
                && gene_end + realign_engine::REALIGN_KMER_LENGTH
                   <= bits->second.end)
                kmer_bits = bits->second.bits.data();
        }
        if (realign_engine::align_recursive(0, read_seq, seq_len, 0,
                                            engine_contig, gene_start,
                                            gene_start, gene_end, splice_sites,
                                            min_score, 1, kmer_bits))
            return true;
        rc_scratch.resize(seq_len);
        for (Py_ssize_t i = 0; i < seq_len; ++i)
            rc_scratch[i] = complement_base(read_seq[seq_len - 1 - i]);
        if (realign_engine::align_recursive(0, rc_scratch.data(), seq_len, 0,
                                            engine_contig, gene_start,
                                            gene_start, gene_end, splice_sites,
                                            min_score, 1, kmer_bits))
            return true;
    }
    return false;
}

// filter_mismappers.cpp:247-270 — check whether STAR clipped prematurely
bool extend_split_read_native(const Mate &split_read, double min_fraction) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (split_read.contig >= (int64_t)c.assembly.size()
        || c.assembly[split_read.contig] == nullptr)
        return false;
    const uint8_t *contig_seq = c.assembly[split_read.contig];
    int64_t contig_len = c.assembly_len[split_read.contig];

    const uint8_t *clipped;
    const uint8_t *reference;
    int64_t clipped_count;
    if (split_read.strand == FORWARD) {
        clipped_count = std::min(split_read.preclipping(), split_read.start);
        clipped = (const uint8_t *)split_read.seq
                  + (split_read.preclipping() - clipped_count);
        reference = contig_seq + (split_read.start - clipped_count);
    } else {
        clipped_count = std::min(split_read.postclipping(),
                                 contig_len - split_read.end - 2);
        clipped = (const uint8_t *)split_read.seq
                  + (split_read.seq_len - split_read.postclipping());
        reference = contig_seq + split_read.end + 1;
    }
    int64_t n = std::max(clipped_count, (int64_t)0);
    int64_t matching_bases = 0;
    for (int64_t i = 0; i < n; ++i)
        if (clipped[i] == reference[i]) matching_bases += 1;
    return matching_bases >= (int64_t)std::floor((double)n * min_fraction);
}

// filter_mismappers.cpp:232-244; counters = {mismappers, total_reads}
int64_t count_mismappers_native(const std::vector<int64_t> &read_list,
                                int64_t mismappers_id, int64_t counters[2],
                                int64_t supporting_reads) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    for (int64_t index : read_list) {
        int64_t frag_filter = c.fragments[index].filter;
        if (frag_filter == 0) {
            counters[1] += 1;
        } else if (frag_filter == mismappers_id) {
            counters[1] += 1;
            counters[0] += 1;
            if (supporting_reads > 0) supporting_reads -= 1;
        }
    }
    return supporting_reads;
}

}  // namespace

// filter_mismappers.cpp:272-359 (mismappers.py:353-437)
// one fragment's realignment verdict: a pure function of the fragment and
// the fusion's same_contig flag (reads only the k-mer index/gene tables),
// so the per-(fragment, same_contig) evaluations can run on any thread in
// any order — the final filter state is the OR over the fusions that would
// have evaluated it, identical to the serial first-hit loop
bool mismapper_verdict(const Fragment &fragment, bool same_contig,
                       long long max_mate_gap, double min_align_fraction,
                       double min_extended_align_fraction,
                       std::vector<uint8_t> &rc_scratch) {
    if (fragment.n_mates == 3) {  // split read
        const Mate &split_read = fragment.mates[SPLIT_READ];
        const Mate &supplementary = fragment.mates[SUPPLEMENTARY];
        const Mate &mate1 = fragment.mates[MATE1];

        const uint8_t *clipped_seq;
        Py_ssize_t clipped_len;
        const uint8_t *mate1_seq;
        Py_ssize_t mate1_len;
        if (split_read.strand == FORWARD) {
            clipped_seq = (const uint8_t *)split_read.seq;
            clipped_len = split_read.preclipping();
            mate1_seq = (const uint8_t *)mate1.seq + mate1.preclipping();
            mate1_len = mate1.seq_len - mate1.preclipping();
        } else {
            clipped_seq = (const uint8_t *)split_read.seq
                          + (split_read.seq_len - split_read.postclipping());
            clipped_len = split_read.postclipping();
            mate1_seq = (const uint8_t *)mate1.seq;
            mate1_len = mate1.seq_len - mate1.postclipping();
        }

        return extend_split_read_native(split_read,
                                        min_extended_align_fraction)
               || align_both_strands_native(
                      clipped_seq, clipped_len, split_read.seq_len,
                      max_mate_gap, same_contig, supplementary.start,
                      supplementary.end, split_read.genes,
                      split_read.n_genes, min_align_fraction, rc_scratch)
               || align_both_strands_native(
                      mate1_seq, mate1_len, mate1.seq_len, max_mate_gap,
                      same_contig, mate1.start, mate1.end,
                      supplementary.genes, supplementary.n_genes,
                      min_align_fraction, rc_scratch);
    }
    const Mate &mate1 = fragment.mates[MATE1];
    const Mate &mate2 = fragment.mates[MATE2];
    double clipped_fraction1 =
        (double)(mate1.preclipping() + mate1.postclipping())
        / (double)mate1.seq_len;
    double clipped_fraction2 =
        (double)(mate2.preclipping() + mate2.postclipping())
        / (double)mate2.seq_len;
    return align_both_strands_native(
               (const uint8_t *)mate1.seq, mate1.seq_len, mate1.seq_len,
               max_mate_gap, same_contig, mate1.start, mate1.end,
               mate2.genes, mate2.n_genes,
               std::min(min_align_fraction,
                        min_align_fraction * (1 - clipped_fraction1)),
               rc_scratch)
           || align_both_strands_native(
                  (const uint8_t *)mate2.seq, mate2.seq_len, mate2.seq_len,
                  max_mate_gap, same_contig, mate2.start, mate2.end,
                  mate1.genes, mate1.n_genes,
                  std::min(min_align_fraction,
                           min_align_fraction * (1 - clipped_fraction2)),
                  rc_scratch);
}

PyObject *ev_mismappers(PyObject *, PyObject *args) {
    double max_mismapper_fraction;
    long long max_mate_gap;
    int threads = 1;
    if (!PyArg_ParseTuple(args, "dL|i", &max_mismapper_fraction,
                          &max_mate_gap, &threads))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    cascade_store::Cascade &c = cascade_store::cascade();
    const double min_align_fraction = 0.8;
    const double min_extended_align_fraction = 0.7;
    const int64_t mismappers_id = fid(event_store::F_MISMAPPERS);

    // gather distinct (fragment, same_contig) work items in fusion order
    struct WorkItem { int64_t index; bool same_contig; };
    std::vector<WorkItem> work;
    std::unordered_map<int64_t, uint8_t> seen;  // bit0: false, bit1: true
    for (const EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        bool same_contig = f.contig1 == f.contig2;
        uint8_t bit = same_contig ? 2 : 1;
        for (const std::vector<int64_t> *list :
             {&f.split_read1_list, &f.split_read2_list, &f.discordant_list})
            for (int64_t index : *list) {
                if (c.fragments[index].filter != 0) continue;
                uint8_t &mask = seen[index];
                if (mask & bit) continue;
                mask |= bit;
                work.push_back({index, same_contig});
            }
    }

    std::vector<uint8_t> verdicts(work.size(), 0);
    int workers = std::min((size_t)std::max(threads, 1), work.size());
    if (workers > 1) {
        // downstream_splice_sites lazily fills a shared per-gene cache;
        // populate it serially for every gene a worker could touch so the
        // parallel phase only reads it
        std::set<int64_t> genes;
        for (const WorkItem &item : work) {
            const Fragment &fragment = c.fragments[item.index];
            for (int m = 0; m < fragment.n_mates; ++m)
                for (int64_t g = 0; g < fragment.mates[m].n_genes; ++g)
                    genes.insert(fragment.mates[m].genes[g]);
        }
        for (int64_t gene : genes) downstream_splice_sites(gene);
    }
    if (workers <= 1) {
        std::vector<uint8_t> rc_scratch;
        for (size_t i = 0; i < work.size(); ++i)
            verdicts[i] = mismapper_verdict(
                c.fragments[work[i].index], work[i].same_contig, max_mate_gap,
                min_align_fraction, min_extended_align_fraction, rc_scratch);
    } else {
        std::vector<std::thread> pool;
        pool.reserve(workers);
        for (int w = 0; w < workers; ++w)
            pool.emplace_back([&, w]() {
                std::vector<uint8_t> rc_scratch;
                for (size_t i = w; i < work.size(); i += workers)
                    verdicts[i] = mismapper_verdict(
                        c.fragments[work[i].index], work[i].same_contig,
                        max_mate_gap, min_align_fraction,
                        min_extended_align_fraction, rc_scratch);
            });
        for (std::thread &worker : pool) worker.join();
    }
    for (size_t i = 0; i < work.size(); ++i)
        if (verdicts[i])
            c.fragments[work[i].index].filter = mismappers_id;

    // discard all fusions with more than max_mismapper_fraction mismappers
    int64_t remaining = 0;
    for (EventFusion &f : s.fusions) {
        if (f.filter != 0) continue;
        int64_t counters[2] = {0, 0};  // {mismappers, total_reads}
        f.split_reads1 = count_mismappers_native(f.split_read1_list,
                                                 mismappers_id, counters,
                                                 f.split_reads1);
        f.split_reads2 = count_mismappers_native(f.split_read2_list,
                                                 mismappers_id, counters,
                                                 f.split_reads2);
        f.discordant_mates = count_mismappers_native(f.discordant_list,
                                                     mismappers_id, counters,
                                                     f.discordant_mates);
        if (counters[0] > 0
            && counters[0] >= (int64_t)std::floor(max_mismapper_fraction
                                                  * (double)counters[1]))
            f.filter = mismappers_id;
        else
            remaining += 1;
    }
    return PyLong_FromLongLong(remaining);
}

// ---------------------------------------------------------------------------
// output_fusions.cpp:498-717 + the discarded-row serialization of
// output_fusions.cpp:820-1060 (output/writer.py write_fusions_to_file for
// write_discarded_fusions=True, print_extra_info=False, no tags/domains).
// The passing rows (with fusion transcript/peptide assembly) stay in Python;
// discarded rows are pure per-row field math over native data, serialized
// here without materializing 100k+ Python Fusion objects.

namespace {

/* append a decimal integer without std::to_string's temporary */
static inline void out_int(std::string &out, long long value) {
    char digits[24];
    int i = 24;
    bool negative = value < 0;
    unsigned long long magnitude =
        negative ? 0ULL - (unsigned long long)value
                 : (unsigned long long)value;
    do {
        digits[--i] = (char)('0' + magnitude % 10);
        magnitude /= 10;
    } while (magnitude != 0);
    if (negative) digits[--i] = '-';
    out.append(digits + i, 24 - i);
}

// output_fusions.cpp:637-709 (writer.py get_fusion_site)
std::string native_fusion_site(int64_t gene, bool spliced, bool exonic,
                               int64_t contig, int64_t breakpoint) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    const Store &s = event_store::store();
    if (c.gene_is_dummy[gene] || breakpoint < c.gene_start[gene]
        || breakpoint > c.gene_end[gene])
        return "intergenic";
    if (!exonic) return "intron";

    std::vector<int64_t> exon_set;
    annotate_engine::exon_point_query(contig, breakpoint, exon_set);
    bool has_overlapping_exon = false;
    bool is_utr = true;
    int64_t is_3_end = 0, is_5_end = 0;
    bool gene_protein_coding = s.gene_is_protein_coding[gene] != 0;
    bool gene_forward = (eng.gene_strand[gene] != 0) == FORWARD;
    for (int64_t e : exon_set) {
        if (eng.exon_gene[e] != gene) continue;
        has_overlapping_exon = true;
        if (eng.exon_cds_start[e] <= breakpoint
            && breakpoint <= eng.exon_cds_end[e])
            is_utr = false;
        if (is_utr && gene_protein_coding) {
            if (eng.exon_cds_start[e] != -1 && eng.exon_cds_start[e] > breakpoint) {
                if (gene_forward) is_5_end += 1;
                else is_3_end += 1;
            } else if (eng.exon_cds_end[e] != -1
                       && eng.exon_cds_end[e] < breakpoint) {
                if (!gene_forward) is_5_end += 1;
                else is_3_end += 1;
            } else {
                int64_t next_exon = eng.exon_next[e];
                while (next_exon >= 0 && eng.exon_cds_start[next_exon] == -1)
                    next_exon = eng.exon_next[next_exon];
                int64_t previous_exon = eng.exon_prev[e];
                while (previous_exon >= 0
                       && eng.exon_cds_start[previous_exon] == -1)
                    previous_exon = eng.exon_prev[previous_exon];
                if (previous_exon >= 0 || next_exon >= 0) {
                    if ((next_exon < 0) != (!gene_forward)) is_3_end += 1;
                    else is_5_end += 1;
                }
            }
        }
    }

    std::string site;
    if (!has_overlapping_exon) {
        site = "intron";
    } else if (gene_protein_coding) {
        if (is_utr) {
            if (is_3_end > is_5_end) site = "3'UTR";
            else if (is_3_end < is_5_end) site = "5'UTR";
            else if (is_3_end + is_5_end == 0) site = "exon";
            else site = "UTR";
        } else {
            site = "CDS";
        }
    } else {
        site = "exon";
    }
    if (spliced && site != "intron") site += "/splice-site";
    return site;
}

// output_fusions.cpp:498-545 (writer.py gene_to_name)
std::string native_gene_to_name(int64_t gene, int64_t contig,
                                int64_t breakpoint,
                                const std::vector<std::string> &gene_names) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const event_store::GeneIndex &index = event_store::store().gene_index;
    if (!c.gene_is_dummy[gene]) return gene_names[gene];

    std::string result;
    if (contig < index.n_contigs) {
        const std::vector<int64_t> &bounds = index.boundaries[contig];
        const std::vector<int64_t> &offsets = index.offsets[contig];
        const std::vector<int64_t> &items = index.items[contig];
        int64_t n = (int64_t)bounds.size();
        int64_t idx2 = std::lower_bound(bounds.begin(), bounds.end(), breakpoint)
                       - bounds.begin();
        int64_t idx1 = idx2 - 1;
        while (idx1 >= 0) {
            int64_t lo = offsets[idx1], hi = offsets[idx1 + 1];
            if (hi > lo && !c.gene_is_dummy[items[lo]]) break;
            idx1 -= 1;
        }
        if (idx1 >= 0) {
            int64_t lo = offsets[idx1], hi = offsets[idx1 + 1];
            for (int64_t i = lo; i < hi; ++i) {
                int64_t g = items[i];
                if (!c.gene_is_dummy[g]) {
                    if (!result.empty()) result += ",";
                    result += gene_names[g] + "("
                              + std::to_string(breakpoint - c.gene_end[g]) + ")";
                }
            }
        }
        while (idx2 < n) {
            int64_t lo = offsets[idx2], hi = offsets[idx2 + 1];
            if (hi > lo && !c.gene_is_dummy[items[lo]]) break;
            idx2 += 1;
        }
        if (idx2 < n) {
            int64_t lo = offsets[idx2], hi = offsets[idx2 + 1];
            for (int64_t i = lo; i < hi; ++i) {
                int64_t g = items[i];
                if (!c.gene_is_dummy[g]) {
                    if (!result.empty()) result += ",";
                    result += gene_names[g] + "("
                              + std::to_string(c.gene_start[g] - breakpoint)
                              + ")";
                }
            }
        }
    }
    return result.empty() ? "." : result;
}

// output_fusions.cpp:547-614 (writer.py get_fusion_type)
std::string native_fusion_type(const EventFusion &f, int64_t max_itd_length) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    bool g1_dummy = c.gene_is_dummy[f.gene1] != 0;
    bool g2_dummy = c.gene_is_dummy[f.gene2] != 0;
    bool g1_strand = eng.gene_strand[f.gene1] != 0;
    bool g2_strand = eng.gene_strand[f.gene2] != 0;
    if (f.contig1 != f.contig2) {
        if (g1_dummy || g2_dummy
            || (f.direction1 == f.direction2 && g1_strand != g2_strand)
            || (f.direction1 != f.direction2 && g1_strand == g2_strand))
            return "translocation";
        if (((f.direction1 == UPSTREAM && g1_strand == FORWARD)
             || (f.direction1 == DOWNSTREAM && g1_strand == REVERSE))
            && ((f.direction2 == UPSTREAM && g2_strand == FORWARD)
                || (f.direction2 == DOWNSTREAM && g2_strand == REVERSE)))
            return "translocation/3'-3'";
        return "translocation/5'-5'";
    }
    if (f.direction1 == DOWNSTREAM && f.direction2 == UPSTREAM) {
        if (g1_dummy || g2_dummy || g1_strand == g2_strand)
            return f.is_read_through() ? "deletion/read-through" : "deletion";
        if (g1_strand == FORWARD || g2_strand == REVERSE)
            return f.is_read_through() ? "deletion/read-through/5'-5'"
                                       : "deletion/5'-5'";
        return f.is_read_through() ? "deletion/read-through/3'-3'"
                                   : "deletion/3'-3'";
    }
    if (f.direction1 == f.direction2) {
        if (g1_dummy || g2_dummy || g1_strand != g2_strand) return "inversion";
        if (f.direction1 == UPSTREAM && g1_strand == REVERSE)
            return "inversion/5'-5'";
        return "inversion/3'-3'";
    }
    if (g1_dummy || g2_dummy || g1_strand == g2_strand) {
        if (f.gene1 == f.gene2 && f.spliced1 && f.spliced2)
            return "duplication/non-canonical_splicing";
        if (f.is_internal_tandem_duplication(max_itd_length))
            return "duplication/ITD";
        return "duplication";
    }
    if (g1_strand == REVERSE) return "duplication/5'-5'";
    return "duplication/3'-3'";
}

// output_fusions.cpp:616-635 (writer.py get_fusion_strand)
std::string native_fusion_strand(bool strand, int64_t gene,
                                 bool predicted_strands_ambiguous) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    std::string result;
    if (c.gene_is_dummy[gene]) result = ".";
    else result = ((eng.gene_strand[gene] != 0) == FORWARD) ? "+" : "-";
    result += "/";
    if (predicted_strands_ambiguous) result += ".";
    else result += (strand == FORWARD) ? "+" : "-";
    return result;
}

bool parse_string_list(PyObject *list, std::vector<std::string> &out) {
    if (!PyList_Check(list)) {
        PyErr_SetString(PyExc_TypeError, "expected a list of bytes");
        return false;
    }
    Py_ssize_t n = PyList_Size(list);
    out.resize(n);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PyList_GET_ITEM(list, i);
        char *data;
        Py_ssize_t size;
        if (PyBytes_AsStringAndSize(item, &data, &size) != 0) return false;
        out[i].assign(data, size);
    }
    return true;
}

// --- reference discarded-row order ------------------------------------------
// The oracle writes discarded fusions in the raw iteration order of its
// fusions_t (common.hpp:286, an unordered_map keyed by the 8-field tuple;
// output_fusions.cpp:1052 "don\'t sort the discarded fusions"). We compile
// against the same libstdc++, so replaying the insertions into an
// unordered_map with the reference\'s exact key types and tuple hash
// (common.hpp:294-310: h(e) = hash(e) ^ (h(rest) << 4), std::hash identity
// on integral types) reproduces that order bit-for-bit. Creation order of
// our fusion store equals the reference\'s first-insert order because both
// enumerate reads from a name-ordered map (common.hpp:220).
struct RefFusionKey {
    unsigned gene1, gene2;
    unsigned short contig1, contig2;
    int breakpoint1, breakpoint2;
    bool direction1, direction2;
    bool operator==(const RefFusionKey &o) const {
        return gene1 == o.gene1 && gene2 == o.gene2 && contig1 == o.contig1
               && contig2 == o.contig2 && breakpoint1 == o.breakpoint1
               && breakpoint2 == o.breakpoint2 && direction1 == o.direction1
               && direction2 == o.direction2;
    }
};

struct RefFusionKeyHash {
    size_t operator()(const RefFusionKey &k) const {
        size_t h = k.direction2 ? 1 : 0;
        h = (size_t)(k.direction1 ? 1 : 0) ^ (h << 4);
        h = (size_t)k.breakpoint2 ^ (h << 4);
        h = (size_t)k.breakpoint1 ^ (h << 4);
        h = (size_t)k.contig2 ^ (h << 4);
        h = (size_t)k.contig1 ^ (h << 4);
        h = (size_t)k.gene2 ^ (h << 4);
        h = (size_t)k.gene1 ^ (h << 4);
        return h;
    }
};

std::vector<int64_t> reference_map_order() {
    Store &s = event_store::store();
    std::unordered_map<RefFusionKey, int64_t, RefFusionKeyHash> replay;
    replay.max_load_factor(1.0f);
    for (size_t i = 0; i < s.fusions.size(); ++i) {
        const EventFusion &f = s.fusions[i];
        replay.emplace(
            RefFusionKey{(unsigned)f.gene1, (unsigned)f.gene2,
                         (unsigned short)f.contig1, (unsigned short)f.contig2,
                         (int)f.breakpoint1, (int)f.breakpoint2,
                         f.direction1, f.direction2},
            (int64_t)i);
    }
    std::vector<int64_t> order;
    order.reserve(replay.size());
    for (const auto &kv : replay) order.push_back(kv.second);
    return order;
}

}  // namespace

// test probe: iteration order of a libstdc++ unordered_map whose keys hash
// to exactly the given values (identity hash on uint64 keys); lets Python
// cross-validate output/stdmap_order.py without an event store
PyObject *ev_stdmap_probe(PyObject *, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    const uint64_t *hashes = (const uint64_t *)buf.buf;
    size_t n = buf.len / sizeof(uint64_t);
    struct IdentityHash {
        size_t operator()(uint64_t v) const { return (size_t)v; }
    };
    std::unordered_map<uint64_t, int64_t, IdentityHash> replay;
    replay.max_load_factor(1.0f);
    for (size_t i = 0; i < n; ++i) replay.emplace(hashes[i], (int64_t)i);
    PyBuffer_Release(&buf);
    std::vector<int64_t> order;
    order.reserve(replay.size());
    for (const auto &kv : replay) order.push_back(kv.second);
    return Py_BuildValue("y#", order.empty() ? "" : (const char *)order.data(),
                         (Py_ssize_t)(order.size() * sizeof(int64_t)));
}

// export the replayed order so Python (writer fallback, tests) can share it
PyObject *ev_map_order(PyObject *, PyObject *) {
    if (!require_ready()) return nullptr;
    std::vector<int64_t> order = reference_map_order();
    return Py_BuildValue("y#", order.empty() ? "" : (const char *)order.data(),
                         (Py_ssize_t)(order.size() * sizeof(int64_t)));
}

PyObject *ev_write_discarded(PyObject *, PyObject *args) {
    const char *path, *header;
    Py_ssize_t path_len, header_len;
    PyObject *contig_names_obj, *gene_names_obj, *gene_ids_obj,
        *filter_names_obj;
    long long max_itd_length;
    if (!PyArg_ParseTuple(args, "s#y#OOOOL", &path, &path_len, &header,
                          &header_len, &contig_names_obj, &gene_names_obj,
                          &gene_ids_obj, &filter_names_obj, &max_itd_length))
        return nullptr;
    if (!require_ready()) return nullptr;
    Store &s = event_store::store();
    const cascade_store::Cascade &c = cascade_store::cascade();

    std::vector<std::string> contig_names, gene_names, gene_ids, filter_names;
    if (!parse_string_list(contig_names_obj, contig_names)
        || !parse_string_list(gene_names_obj, gene_names)
        || !parse_string_list(gene_ids_obj, gene_ids)
        || !parse_string_list(filter_names_obj, filter_names))
        return nullptr;

    std::string out;
    out.reserve(1 << 20);
    out.append(header, header_len);
    std::vector<std::pair<std::string, int64_t>> filter_counts;
    // rows are emitted in the oracle's unordered_map iteration order
    // (output_fusions.cpp:1052), reproduced by reference_map_order()
    for (int64_t fusion_index : reference_map_order()) {
        const EventFusion &f = s.fusions[fusion_index];
        if (f.filter == 0) continue;

        std::string site_5 = native_fusion_site(f.gene1, f.spliced1, f.exonic1,
                                                f.contig1, f.breakpoint1);
        std::string site_3 = native_fusion_site(f.gene2, f.spliced2, f.exonic2,
                                                f.contig2, f.breakpoint2);
        const char *confidence = f.confidence == 2   ? "high"
                                 : f.confidence == 1 ? "medium"
                                                     : "low";

        int64_t gene_5 = f.gene1, gene_3 = f.gene2;
        int64_t contig_5 = f.contig1, contig_3 = f.contig2;
        int64_t breakpoint_5 = f.breakpoint1, breakpoint_3 = f.breakpoint2;
        bool direction_5 = f.direction1, direction_3 = f.direction2;
        int64_t split_reads_5 = f.split_reads1, split_reads_3 = f.split_reads2;
        bool strand_5 = f.predicted_strand1, strand_3 = f.predicted_strand2;
        int64_t closest_5 = f.closest_genomic_breakpoint1;
        int64_t closest_3 = f.closest_genomic_breakpoint2;
        if (!f.transcript_start) {  // TRANSCRIPT_START_GENE2
            std::swap(gene_5, gene_3);
            std::swap(direction_5, direction_3);
            std::swap(contig_5, contig_3);
            std::swap(breakpoint_5, breakpoint_3);
            std::swap(site_5, site_3);
            std::swap(split_reads_5, split_reads_3);
            std::swap(strand_5, strand_3);
            std::swap(closest_5, closest_3);
        }

        int64_t coverage_5 = get_coverage(contig_5, breakpoint_5,
                                          direction_5 == UPSTREAM ? DOWNSTREAM
                                                                  : UPSTREAM);
        int64_t coverage_3 = get_coverage(contig_3, breakpoint_3,
                                          direction_3 == UPSTREAM ? DOWNSTREAM
                                                                  : UPSTREAM);

        out += "\n";
        out += native_gene_to_name(gene_5, contig_5, breakpoint_5, gene_names);
        out += "\t";
        out += native_gene_to_name(gene_3, contig_3, breakpoint_3, gene_names);
        out += "\t";
        out += native_fusion_strand(strand_5, gene_5,
                                    f.predicted_strands_ambiguous);
        out += "\t";
        out += native_fusion_strand(strand_3, gene_3,
                                    f.predicted_strands_ambiguous);
        out += "\t";
        out += contig_names[contig_5];
        out += ':';
        out_int(out, breakpoint_5 + 1);
        out += "\t";
        out += contig_names[contig_3];
        out += ':';
        out_int(out, breakpoint_3 + 1);
        out += '\t';
        out += site_5;
        out += '\t';
        out += site_3;
        out += '\t';
        out += native_fusion_type(f, max_itd_length);
        out += '\t';
        out_int(out, split_reads_5);
        out += '\t';
        out_int(out, split_reads_3);
        out += '\t';
        out_int(out, f.discordant_mates);
        out += "\t";
        if (coverage_5 >= 0) out_int(out, coverage_5); else out += '.';
        out += "\t";
        if (coverage_3 >= 0) out_int(out, coverage_3); else out += '.';
        out += "\t";
        out += confidence;
        out += "\t.\t.\t.";  // reading_frame, tags, protein domains

        if (closest_5 >= 0) {
            out += '\t';
            out += contig_names[contig_5];
            out += ':';
            out_int(out, closest_5 + 1);
            out += '(';
            out_int(out, std::llabs(breakpoint_5 - closest_5));
            out += ')';
        } else {
            out += "\t.";
        }
        if (closest_3 >= 0) {
            out += '\t';
            out += contig_names[contig_3];
            out += ':';
            out_int(out, closest_3 + 1);
            out += '(';
            out_int(out, std::llabs(breakpoint_3 - closest_3));
            out += ')';
        } else {
            out += "\t.";
        }

        // count reads discarded per filter (name-sorted like Python's
        // sorted(dict))
        filter_counts.clear();
        auto bump = [&filter_counts](const std::string &name, int64_t delta) {
            for (auto &entry : filter_counts)
                if (entry.first == name) {
                    entry.second += delta;
                    return;
                }
            filter_counts.emplace_back(name, delta);
        };
        bump(filter_names[f.filter], 0);
        for (int which = 0; which < 3; ++which) {
            const std::vector<int64_t> &list = which == 0 ? f.split_read1_list
                                               : which == 1 ? f.split_read2_list
                                                            : f.discordant_list;
            for (int64_t index : list) {
                int64_t read_filter = c.fragments[index].filter;
                if (read_filter != 0) bump(filter_names[read_filter], 1);
            }
        }
        std::sort(filter_counts.begin(), filter_counts.end());

        out += "\t";
        out += c.gene_is_dummy[gene_5] ? "." : gene_ids[gene_5];
        out += "\t";
        out += c.gene_is_dummy[gene_3] ? "." : gene_ids[gene_3];
        out += "\t.\t.\t";  // transcript ids
        out += direction_5 == UPSTREAM ? "upstream" : "downstream";
        out += "\t";
        out += direction_3 == UPSTREAM ? "upstream" : "downstream";
        out += "\t";
        if (filter_counts.empty()) {
            out += ".";
        } else {
            for (size_t i = 0; i < filter_counts.size(); ++i) {
                if (i) out += ",";
                out += filter_counts[i].first;
                if (filter_counts[i].second != 0) {
                    out += '(';
                    out_int(out, filter_counts[i].second);
                    out += ')';
                }
            }
        }
        out += "\t.\t.\t.";  // transcript sequence, peptide, read ids
    }
    out += "\n";

    FILE *file = fopen(path, "w");
    if (file == nullptr) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return nullptr;
    }
    fwrite(out.data(), 1, out.size(), file);
    fclose(file);
    Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// output_fusions.cpp:25-107 — the transcript-sequence pileup over the
// native fragment store (writer.py pileup_chimeric_alignments /
// get_fusion_transcript_sequence's ten pileup passes + the non-template
// base scan), so the output writer never materializes Python fragments.

namespace {

/* per-position base histogram: the hot add path is one observation per read
 * base, so single-character keys (bases, '-', '<', '>', '_') live in flat
 * slots (no per-base std::string or map node) and only multi-character
 * insertion keys spill to a tiny vector. entries_sorted() materializes the
 * exact lexicographic (string, count) sequence the former
 * std::map<std::string, int64_t> iterated, so the consensus tie-breaks and
 * dict order are unchanged. */
struct PileupBucket {
    /* ASCII-ascending single-char keys: '-' '<' '>' 'A' 'C' 'G' 'N' 'T' '_' */
    static constexpr const char SLOT_CHARS[9] =
        {'-', '<', '>', 'A', 'C', 'G', 'N', 'T', '_'};
    int64_t slots[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
    std::vector<std::pair<std::string, int64_t>> multi;

    static int slot_of(uint8_t ch) {
        switch (ch) {
            case '-': return 0;
            case '<': return 1;
            case '>': return 2;
            case 'A': return 3;
            case 'C': return 4;
            case 'G': return 5;
            case 'N': return 6;
            case 'T': return 7;
            case '_': return 8;
            default: return -1;
        }
    }

    void add(const char *s, size_t len, int64_t k = 1) {
        int slot;
        if (len == 1 && (slot = slot_of((uint8_t)s[0])) >= 0) {
            slots[slot] += k;
            return;
        }
        for (auto &entry : multi)
            if (entry.first.size() == len
                && memcmp(entry.first.data(), s, len) == 0) {
                entry.second += k;
                return;
            }
        multi.emplace_back(std::string(s, len), k);
    }

    int64_t total() const {
        int64_t sum = 0;
        for (int64_t v : slots) sum += v;
        for (const auto &entry : multi) sum += entry.second;
        return sum;
    }

    /* lexicographic (key, count) sequence — identical to the old map walk */
    void entries_sorted(std::vector<std::pair<std::string, int64_t>> &out)
        const {
        out.clear();
        if (multi.empty()) {
            for (int i = 0; i < 9; ++i)
                if (slots[i])
                    out.emplace_back(std::string(1, SLOT_CHARS[i]), slots[i]);
            return;
        }
        for (int i = 0; i < 9; ++i)
            if (slots[i])
                out.emplace_back(std::string(1, SLOT_CHARS[i]), slots[i]);
        for (const auto &entry : multi) out.push_back(entry);
        std::sort(out.begin(), out.end(),
                  [](const std::pair<std::string, int64_t> &a,
                     const std::pair<std::string, int64_t> &b) {
                      return a.first < b.first;
                  });
    }
};

using PileupMap = std::map<int64_t, PileupBucket>;

void pileup_one_list(const std::vector<int64_t> &indices, int mate,
                     bool reverse_complement, bool direction,
                     int64_t breakpoint, int64_t duplicates_id,
                     PileupMap &pileup) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    std::map<std::pair<int64_t, int64_t>, int64_t> introns;
    std::vector<uint8_t> rc_scratch;

    for (int64_t index : indices) {
        const Fragment &fragment = c.fragments[index];
        if (fragment.filter == duplicates_id) continue;
        const Mate &read = fragment.mates[mate];

        if (fragment.n_mates == 2) {  // discordant mate
            if (!((direction == DOWNSTREAM && read.strand == FORWARD
                   && breakpoint - 200 <= read.end && read.end <= breakpoint + 2)
                  || (direction == UPSTREAM && read.strand == REVERSE
                      && breakpoint - 2 <= read.start
                      && read.start <= breakpoint + 200)))
                continue;
        }
        if (fragment.n_mates == 3
            && (mate == SPLIT_READ || mate == SUPPLEMENTARY)) {
            if (read.start != breakpoint && read.end != breakpoint) continue;
        }

        const Mate &sequence_source =
            mate == SUPPLEMENTARY ? fragment.mates[SPLIT_READ] : read;
        const uint8_t *read_sequence = (const uint8_t *)sequence_source.seq;
        int64_t seq_len = sequence_source.seq_len;
        if (reverse_complement) {
            rc_scratch.resize(seq_len);
            for (int64_t i = 0; i < seq_len; ++i)
                rc_scratch[i] =
                    complement_base(read_sequence[seq_len - 1 - i]);
            read_sequence = rc_scratch.data();
        }

        int64_t read_offset = 0;
        int64_t reference_offset = read.start;
        int64_t subtract_from_next_element = 0;
        int64_t n_cigar = read.n_cigar;
        for (int64_t cigar_element = 0; cigar_element < n_cigar;
             ++cigar_element) {
            uint32_t word = read.cigar[cigar_element];
            uint32_t op = word & 0xf;
            int64_t op_length = word >> 4;
            if (op == 1) {  // I
                int64_t from = std::min(read_offset, seq_len);
                int64_t to = std::min(read_offset + op_length + 1, seq_len);
                pileup[reference_offset].add(
                    (const char *)read_sequence + from, (size_t)(to - from));
                read_offset += op_length + 1;  // one base from the next element
                reference_offset += 1;
                subtract_from_next_element = 1;
            } else if (op == 3) {  // N
                int64_t intron_start = reference_offset;
                reference_offset += op_length - subtract_from_next_element;
                introns[{intron_start, reference_offset - 1}] += 1;
                subtract_from_next_element = 0;
            } else if (op == 2) {  // D
                for (int64_t i = 0; i < op_length - subtract_from_next_element;
                     ++i)
                    pileup[reference_offset++].add("-", 1);
                subtract_from_next_element = 0;
            } else if (op == 5) {  // H
                if (mate == SUPPLEMENTARY) read_offset += op_length;
            } else if (op == 4 || op == 0 || op == 7 || op == 8) {  // S/M/=/X
                if (op == 4) {
                    bool keep_clip =
                        fragment.n_mates == 3 && mate == SPLIT_READ
                        && ((cigar_element == 0 && read.strand == FORWARD)
                            || (cigar_element == n_cigar - 1
                                && read.strand == REVERSE));
                    if (keep_clip) {
                        if (cigar_element == 0 && read.strand == FORWARD)
                            reference_offset -= op_length;
                        // fall through: the clipped segment joins the pileup
                    } else {
                        read_offset += op_length - subtract_from_next_element;
                        continue;
                    }
                }
                for (int64_t i = 0; i < op_length - subtract_from_next_element;
                     ++i) {
                    int64_t from = std::min(read_offset, seq_len);
                    int64_t to = std::min(read_offset + 1, seq_len);
                    pileup[reference_offset].add(
                        (const char *)read_sequence + from,
                        (size_t)(to - from));
                    read_offset += 1;
                    reference_offset += 1;
                }
                subtract_from_next_element = 0;
            }
        }
    }

    for (const auto &entry : introns) {
        int64_t intron_start = entry.first.first;
        int64_t intron_end = entry.first.second;
        int64_t frequency = entry.second;
        pileup[intron_start].add(">", 1, frequency);
        pileup[intron_end].add("<", 1, frequency);
        for (int64_t i = intron_start + 1; i < intron_end; ++i)
            pileup[i].add("_", 1, frequency);
    }
}

PyObject *pileup_to_dict(const PileupMap &pileup) {
    PyObject *result = PyDict_New();
    if (result == nullptr) return nullptr;
    std::vector<std::pair<std::string, int64_t>> scratch;
    for (const auto &entry : pileup) {
        PyObject *bucket = PyDict_New();
        if (bucket == nullptr) { Py_DECREF(result); return nullptr; }
        entry.second.entries_sorted(scratch);
        for (const auto &base : scratch) {
            PyObject *count = PyLong_FromLongLong(base.second);
            PyDict_SetItemString(bucket, base.first.c_str(), count);
            Py_DECREF(count);
        }
        PyObject *key = PyLong_FromLongLong(entry.first);
        PyDict_SetItem(result, key, bucket);
        Py_DECREF(key);
        Py_DECREF(bucket);
    }
    return result;
}

bool indices_from_bytes(PyObject *obj, std::vector<int64_t> &out) {
    char *data;
    Py_ssize_t size;
    if (PyBytes_AsStringAndSize(obj, &data, &size) < 0) return false;
    out.assign((const int64_t *)data, (const int64_t *)data + size / 8);
    return true;
}

// the ten pileup passes + non-template-base scan shared by the two entry
// points below (writer.py get_fusion_transcript_sequence:263-304)
void build_transcript_pileups(const std::vector<int64_t> &split1,
                              const std::vector<int64_t> &split2,
                              const std::vector<int64_t> &discordant,
                              bool d1, bool d2, int64_t breakpoint1,
                              int64_t breakpoint2, PileupMap &pileup1,
                              PileupMap &pileup2,
                              int64_t &non_template_bases) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const int64_t duplicates_id = fid(event_store::F_DUPLICATES);
    bool rc = d1 == d2;
    pileup_one_list(split1, SPLIT_READ, false, d1, breakpoint1, duplicates_id,
                    pileup1);
    pileup_one_list(split1, MATE1, false, d1, breakpoint1, duplicates_id,
                    pileup1);
    pileup_one_list(split1, SUPPLEMENTARY, rc, d2, breakpoint2, duplicates_id,
                    pileup2);
    pileup_one_list(split2, SPLIT_READ, false, d2, breakpoint2, duplicates_id,
                    pileup2);
    pileup_one_list(split2, MATE1, false, d2, breakpoint2, duplicates_id,
                    pileup2);
    pileup_one_list(split2, SUPPLEMENTARY, rc, d1, breakpoint1, duplicates_id,
                    pileup1);
    pileup_one_list(discordant, MATE1, false, d1, breakpoint1, duplicates_id,
                    pileup1);
    pileup_one_list(discordant, MATE2, false, d1, breakpoint1, duplicates_id,
                    pileup1);
    pileup_one_list(discordant, MATE1, false, d2, breakpoint2, duplicates_id,
                    pileup2);
    pileup_one_list(discordant, MATE2, false, d2, breakpoint2, duplicates_id,
                    pileup2);

    // non-template bases inserted between the fused genes (writer.py:290-304)
    non_template_bases = 0;
    std::map<int64_t, int64_t> non_template_count;
    for (int which = 0; which < 2; ++which) {
        const std::vector<int64_t> &list = which == 0 ? split1 : split2;
        for (int64_t index : list) {
            const Fragment &fragment = c.fragments[index];
            const Mate &split = fragment.mates[SPLIT_READ];
            const Mate &supp = fragment.mates[SUPPLEMENTARY];
            int64_t clipped_split_read = split.strand == FORWARD
                                             ? split.preclipping()
                                             : split.postclipping();
            int64_t clipped_supplementary = supp.strand == FORWARD
                                                ? supp.postclipping()
                                                : supp.preclipping();
            if (clipped_split_read + clipped_supplementary >= split.seq_len) {
                int64_t unmapped = clipped_split_read + clipped_supplementary
                                   - split.seq_len;
                non_template_count[unmapped] += 1;
                if (non_template_count[unmapped]
                    > non_template_count[non_template_bases])
                    non_template_bases = unmapped;
            }
        }
    }
}

// output_fusions.cpp:109-240 (writer.py get_sequence_from_pileup): pileup ->
// (consensus sequence, per-char reference positions, clipped tail)
void consensus_from_pileup(const PileupMap &pileup, int64_t breakpoint,
                           bool direction, int64_t gene,
                           std::string &sequence,
                           std::vector<int64_t> &positions,
                           std::string &clipped) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    const annotate_engine::Engine &eng = annotate_engine::engine();
    const uint8_t *contig_seq = nullptr;
    int64_t contig_len = 0;
    if (gene >= 0 && gene < (int64_t)eng.gene_contig.size()) {
        int64_t contig = eng.gene_contig[gene];
        if (contig >= 0 && contig < (int64_t)c.assembly.size()
            && c.assembly[contig] != nullptr) {
            contig_seq = c.assembly[contig];
            contig_len = c.assembly_len[contig];
        }
    }

    std::vector<int64_t> sorted_positions;
    std::vector<int64_t> coverages;
    sorted_positions.reserve(pileup.size());
    coverages.reserve(pileup.size());
    int64_t peak_coverage = 0;
    for (const auto &entry : pileup) {
        int64_t total = entry.second.total();
        sorted_positions.push_back(entry.first);
        coverages.push_back(total);
        if (total > peak_coverage) peak_coverage = total;
    }

    const double low_coverage_fraction = 0.10;
    size_t start_idx = 0, end_idx = sorted_positions.size();
    for (size_t i = 0; i < sorted_positions.size(); ++i) {
        if (direction == DOWNSTREAM) {
            if ((double)coverages[i]
                < (double)peak_coverage * low_coverage_fraction)
                start_idx = i;
            else
                break;
        } else {
            if ((double)coverages[i]
                > (double)peak_coverage * low_coverage_fraction)
                end_idx = i;
        }
    }
    if (direction == UPSTREAM && end_idx != sorted_positions.size())
        end_idx += 1;

    bool intron_open = false, intron_closed = true;
    auto it = pileup.begin();
    std::advance(it, start_idx);
    for (size_t i = start_idx; i < end_idx; ++i, ++it) {
        int64_t pos = it->first;
        if (i != start_idx && sorted_positions[i - 1] < pos - 1 && !intron_open) {
            sequence += "...";
            positions.insert(positions.end(), 3, -1);
        }

        // negative keep-clip positions read as 'N', matching the
        // reference's unsigned-cast bounds check (output_fusions.cpp:155)
        char reference_base = (contig_seq != nullptr && pos >= 0
                               && pos < contig_len)
                                  ? (char)contig_seq[pos] : 'N';
        const std::string ref_str(1, reference_base);

        const std::string *most_frequent_base = nullptr;
        int64_t most_frequent_count = 0;
        int64_t coverage = 0;
        static thread_local std::vector<std::pair<std::string, int64_t>>
            bucket_entries;
        it->second.entries_sorted(bucket_entries);
        for (const auto &entry : bucket_entries) {
            const std::string &base = entry.first;
            int64_t count = entry.second;
            bool base_is_intron = base == "_" || base == ">" || base == "<";
            bool mfb_is_intron =
                most_frequent_base != nullptr
                && (*most_frequent_base == "_" || *most_frequent_base == ">"
                    || *most_frequent_base == "<");
            if (most_frequent_base == nullptr || count > most_frequent_count
                || (count == most_frequent_count
                    && ((base == ref_str && !mfb_is_intron)
                        || (base == "<" && *most_frequent_base != "_"
                            && *most_frequent_base != ">")
                        || base == "_" || base == ">"))) {
                most_frequent_base = &base;
                most_frequent_count = count;
            }
            if (!base_is_intron) coverage += count;
        }

        bool mfb_intron = most_frequent_base != nullptr
                          && (*most_frequent_base == "_"
                              || *most_frequent_base == ">"
                              || *most_frequent_base == "<");
        std::string mfb;
        if ((mfb_intron && most_frequent_count >= coverage)
            || (double)most_frequent_count >= 0.75 * (double)coverage
            || (most_frequent_base != nullptr
                && *most_frequent_base == ref_str))
            mfb = most_frequent_base != nullptr ? *most_frequent_base
                                                : std::string();
        else
            mfb = "?";

        if (mfb == "_") {
            if (!intron_open) {
                sequence += "...___";
                positions.insert(positions.end(), 6, -1);
                intron_open = true;
                intron_closed = false;
            }
        } else if (mfb == ">") {
            if (!intron_open) {
                sequence += "___";
                positions.insert(positions.end(), 3, -1);
                intron_open = true;
                intron_closed = false;
            }
        } else if (mfb == "<") {
            if (!intron_open) {
                sequence += "...___";
                positions.insert(positions.end(), 6, -1);
            }
            intron_open = true;
            intron_closed = true;
        } else {
            if (!intron_closed) {
                sequence += "...";
                positions.insert(positions.end(), 3, -1);
            }
            intron_open = false;
            intron_closed = true;

            if (mfb.size() > 1 || (mfb != ref_str && reference_base != 'N'))
                for (char &ch : mfb) ch = (char)tolower((unsigned char)ch);
            if (mfb.size() > 1) {  // insertion
                std::string bracketed = "[";
                bracketed.append(mfb, 0, mfb.size() - 1);
                bracketed += ']';
                bracketed += mfb.back();
                mfb = bracketed;
                positions.insert(positions.end(), (size_t)mfb.size() - 1, -1);
                if (toupper((unsigned char)mfb.back()) == reference_base)
                    mfb.back() = (char)toupper((unsigned char)mfb.back());
            }

            if ((direction == UPSTREAM && pos < breakpoint)
                || (direction == DOWNSTREAM && pos > breakpoint)) {
                clipped += mfb;
            } else {
                sequence += mfb;
                positions.push_back(pos);
            }
        }
    }
}

}  // namespace

// writer.py get_fusion_transcript_sequence:263-304 — the ten pileup passes
// plus the non-template-base scan, all over the native store. Returns
// (pileup1 dict, pileup2 dict, non_template_bases).
PyObject *ev_transcript_pileups(PyObject *, PyObject *args) {
    PyObject *split1_obj, *split2_obj, *discordant_obj;
    int direction1, direction2;
    long long breakpoint1, breakpoint2;
    if (!PyArg_ParseTuple(args, "SSSiiLL", &split1_obj, &split2_obj,
                          &discordant_obj, &direction1, &direction2,
                          &breakpoint1, &breakpoint2))
        return nullptr;
    if (!cascade_store::cascade().ready) {
        PyErr_SetString(PyExc_RuntimeError, "fragment store not populated");
        return nullptr;
    }
    std::vector<int64_t> split1, split2, discordant;
    if (!indices_from_bytes(split1_obj, split1)
        || !indices_from_bytes(split2_obj, split2)
        || !indices_from_bytes(discordant_obj, discordant))
        return nullptr;

    PileupMap pileup1, pileup2;
    int64_t non_template_bases = 0;
    build_transcript_pileups(split1, split2, discordant, direction1 != 0,
                             direction2 != 0, breakpoint1, breakpoint2,
                             pileup1, pileup2, non_template_bases);

    PyObject *dict1 = pileup_to_dict(pileup1);
    if (dict1 == nullptr) return nullptr;
    PyObject *dict2 = pileup_to_dict(pileup2);
    if (dict2 == nullptr) { Py_DECREF(dict1); return nullptr; }
    return Py_BuildValue("(NNL)", dict1, dict2,
                         (long long)non_template_bases);
}

// the pileups AND both consensus sequences in one native call
// (output_fusions.cpp:25-240; writer.py get_fusion_transcript_sequence +
// get_sequence_from_pileup). Returns (sequence1, positions1 int64 bytes,
// clipped1, sequence2, positions2 int64 bytes, clipped2,
// non_template_bases).
PyObject *ev_transcript_consensus(PyObject *, PyObject *args) {
    PyObject *split1_obj, *split2_obj, *discordant_obj;
    int direction1, direction2;
    long long breakpoint1, breakpoint2, gene1, gene2;
    if (!PyArg_ParseTuple(args, "SSSiiLLLL", &split1_obj, &split2_obj,
                          &discordant_obj, &direction1, &direction2,
                          &breakpoint1, &breakpoint2, &gene1, &gene2))
        return nullptr;
    if (!cascade_store::cascade().ready) {
        PyErr_SetString(PyExc_RuntimeError, "fragment store not populated");
        return nullptr;
    }
    std::vector<int64_t> split1, split2, discordant;
    if (!indices_from_bytes(split1_obj, split1)
        || !indices_from_bytes(split2_obj, split2)
        || !indices_from_bytes(discordant_obj, discordant))
        return nullptr;

    PileupMap pileup1, pileup2;
    int64_t non_template_bases = 0;
    bool d1 = direction1 != 0, d2 = direction2 != 0;
    build_transcript_pileups(split1, split2, discordant, d1, d2, breakpoint1,
                             breakpoint2, pileup1, pileup2,
                             non_template_bases);

    std::string sequence1, clipped1, sequence2, clipped2;
    std::vector<int64_t> positions1, positions2;
    consensus_from_pileup(pileup1, breakpoint1, d1, gene1, sequence1,
                          positions1, clipped1);
    consensus_from_pileup(pileup2, breakpoint2, d2, gene2, sequence2,
                          positions2, clipped2);

    /* empty vector data() can be null and "y#" would yield None */
    static const char empty[1] = {0};
    const char *pos1_data = positions1.empty()
                                ? empty : (const char *)positions1.data();
    const char *pos2_data = positions2.empty()
                                ? empty : (const char *)positions2.data();
    return Py_BuildValue(
        "(s#y#s#s#y#s#L)",
        sequence1.data(), (Py_ssize_t)sequence1.size(),
        pos1_data, (Py_ssize_t)(positions1.size() * 8),
        clipped1.data(), (Py_ssize_t)clipped1.size(),
        sequence2.data(), (Py_ssize_t)sequence2.size(),
        pos2_data, (Py_ssize_t)(positions2.size() * 8),
        clipped2.data(), (Py_ssize_t)clipped2.size(),
        (long long)non_template_bases);
}

// batched form of ev_transcript_consensus: one call for the whole fusion
// list, pileup+consensus computed on a thread pool with the GIL released
// (every input is decoded up front; the per-fusion work reads only the
// immutable cascade/engine stores, so cross-fusion parallelism is exact)
PyObject *ev_transcript_consensus_batch(PyObject *, PyObject *args) {
    PyObject *items;
    int threads = 1;
    if (!PyArg_ParseTuple(args, "O|i", &items, &threads)) return nullptr;
    if (!cascade_store::cascade().ready) {
        PyErr_SetString(PyExc_RuntimeError, "fragment store not populated");
        return nullptr;
    }
    if (!PyList_Check(items)) {
        PyErr_SetString(PyExc_TypeError, "expected a list of tuples");
        return nullptr;
    }
    struct Job {
        std::vector<int64_t> split1, split2, discordant;
        bool d1 = false, d2 = false;
        int64_t breakpoint1 = 0, breakpoint2 = 0, gene1 = -1, gene2 = -1;
        std::string sequence1, clipped1, sequence2, clipped2;
        std::vector<int64_t> positions1, positions2;
        int64_t non_template_bases = 0;
    };
    Py_ssize_t n = PyList_Size(items);
    std::vector<Job> jobs((size_t)n);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PyList_GetItem(items, i);
        PyObject *split1_obj, *split2_obj, *discordant_obj;
        int direction1, direction2;
        long long breakpoint1, breakpoint2, gene1, gene2;
        if (!PyArg_ParseTuple(item, "SSSiiLLLL", &split1_obj, &split2_obj,
                              &discordant_obj, &direction1, &direction2,
                              &breakpoint1, &breakpoint2, &gene1, &gene2))
            return nullptr;
        Job &job = jobs[i];
        if (!indices_from_bytes(split1_obj, job.split1)
            || !indices_from_bytes(split2_obj, job.split2)
            || !indices_from_bytes(discordant_obj, job.discordant))
            return nullptr;
        job.d1 = direction1 != 0;
        job.d2 = direction2 != 0;
        job.breakpoint1 = breakpoint1;
        job.breakpoint2 = breakpoint2;
        job.gene1 = gene1;
        job.gene2 = gene2;
    }

    auto run_job = [](Job &job) {
        PileupMap pileup1, pileup2;
        build_transcript_pileups(job.split1, job.split2, job.discordant,
                                 job.d1, job.d2, job.breakpoint1,
                                 job.breakpoint2, pileup1, pileup2,
                                 job.non_template_bases);
        consensus_from_pileup(pileup1, job.breakpoint1, job.d1, job.gene1,
                              job.sequence1, job.positions1, job.clipped1);
        consensus_from_pileup(pileup2, job.breakpoint2, job.d2, job.gene2,
                              job.sequence2, job.positions2, job.clipped2);
    };
    int n_workers = std::min<int>(std::max(threads, 1), 8);
    if (n_workers > 1 && n > 1) {
        // mark the store busy so a concurrent Python thread cannot tear it
        // down (release/rebind) while the GIL is dropped below
        struct BusyGuard {
            std::atomic<int> &flag;
            explicit BusyGuard(std::atomic<int> &f) : flag(f) {
                flag.fetch_add(1, std::memory_order_acq_rel);
            }
            ~BusyGuard() { flag.fetch_sub(1, std::memory_order_acq_rel); }
        } busy_guard(cascade_store::cascade().busy);
        Py_BEGIN_ALLOW_THREADS
        std::atomic<size_t> next{0};
        std::vector<std::thread> pool;
        auto worker = [&jobs, &next, run_job]() {
            for (;;) {
                size_t i = next.fetch_add(1, std::memory_order_relaxed);
                if (i >= jobs.size()) break;
                run_job(jobs[i]);
            }
        };
        for (int w = 1; w < n_workers; ++w) pool.emplace_back(worker);
        worker();
        for (std::thread &thread : pool) thread.join();
        Py_END_ALLOW_THREADS
    } else {
        for (Job &job : jobs) run_job(job);
    }

    static const char empty[1] = {0};
    PyObject *results = PyList_New(n);
    if (results == nullptr) return nullptr;
    for (Py_ssize_t i = 0; i < n; ++i) {
        Job &job = jobs[i];
        const char *pos1_data = job.positions1.empty()
                                    ? empty
                                    : (const char *)job.positions1.data();
        const char *pos2_data = job.positions2.empty()
                                    ? empty
                                    : (const char *)job.positions2.data();
        PyObject *entry = Py_BuildValue(
            "(s#y#s#s#y#s#L)",
            job.sequence1.data(), (Py_ssize_t)job.sequence1.size(),
            pos1_data, (Py_ssize_t)(job.positions1.size() * 8),
            job.clipped1.data(), (Py_ssize_t)job.clipped1.size(),
            job.sequence2.data(), (Py_ssize_t)job.sequence2.size(),
            pos2_data, (Py_ssize_t)(job.positions2.size() * 8),
            job.clipped2.data(), (Py_ssize_t)job.clipped2.size(),
            (long long)job.non_template_bases);
        if (entry == nullptr) {
            Py_DECREF(results);
            return nullptr;
        }
        PyList_SetItem(results, i, entry);
    }
    return results;
}

// ---------------------------------------------------------------------------
// output_fusions.cpp:711-818 (writer.py get_transcripts): the per-base
// transcript scoring walk over the fusion-transcript consensus. Needs the
// transcript tables bound via ev_bind_transcript_tables.

PyObject *ev_bind_transcript_tables(PyObject *, PyObject *args) {
    const char *exon_transcript, *first_exon, *last_exon, *coding_length;
    Py_ssize_t n_exon_transcript, n_first, n_last, n_coding;
    if (!PyArg_ParseTuple(args, "y#y#y#y#", &exon_transcript,
                          &n_exon_transcript, &first_exon, &n_first,
                          &last_exon, &n_last, &coding_length, &n_coding))
        return nullptr;
    annotate_engine::Engine &eng = annotate_engine::engine();
    eng.exon_transcript.assign((const int64_t *)exon_transcript,
                               (const int64_t *)exon_transcript
                                   + n_exon_transcript / 8);
    eng.transcript_first_exon.assign((const int64_t *)first_exon,
                                     (const int64_t *)first_exon + n_first / 8);
    eng.transcript_last_exon.assign((const int64_t *)last_exon,
                                    (const int64_t *)last_exon + n_last / 8);
    eng.transcript_coding_length.assign(
        (const int64_t *)coding_length,
        (const int64_t *)coding_length + n_coding / 8);
    eng.transcript_tables_ready = true;
    Py_RETURN_NONE;
}

PyObject *ev_get_transcripts(PyObject *, PyObject *args) {
    const char *sequence_data;
    Py_ssize_t sequence_len;
    const char *positions_data;
    Py_ssize_t positions_len;
    long long gene;
    int strand, strand_ambiguous, which_end;
    if (!PyArg_ParseTuple(args, "s#y#Liii", &sequence_data, &sequence_len,
                          &positions_data, &positions_len, &gene, &strand,
                          &strand_ambiguous, &which_end))
        return nullptr;
    annotate_engine::Engine &eng = annotate_engine::engine();
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (!eng.transcript_tables_ready || !c.ready) {
        PyErr_SetString(PyExc_RuntimeError, "transcript tables not bound");
        return nullptr;
    }
    const int64_t *tb = (const int64_t *)positions_data;
    int64_t n = positions_len / 8;
    std::string_view sequence(sequence_data, (size_t)sequence_len);

    auto empty_result = []() { return PyBytes_FromStringAndSize("", 0); };
    if (strand_ambiguous || (strand != 0) != (eng.gene_strand[gene] != 0))
        return empty_result();

    int64_t from_, to, breakpoint_idx;
    if (which_end == 5) {
        from_ = 0;
        size_t pipe = sequence.find('|');
        if (pipe == std::string_view::npos) return empty_result();
        to = (int64_t)pipe;
        while (to > 0 && tb[to] == -1) to -= 1;
        if (tb[to] == -1) return empty_result();
        breakpoint_idx = to;
    } else {
        size_t pipe = sequence.rfind('|');
        from_ = pipe == std::string_view::npos ? (int64_t)sequence.size() + 1
                                               : (int64_t)pipe;
        while (from_ < (int64_t)sequence.size() && tb[from_] == -1) from_ += 1;
        if (from_ >= (int64_t)sequence.size()) return empty_result();
        breakpoint_idx = from_;
        to = (int64_t)sequence.size() - 1;
    }
    if (from_ >= n || to >= n) return empty_result();  /* defensive */
    if (tb[from_] > tb[to]) std::swap(from_, to);

    int64_t contig = eng.gene_contig[gene];
    if (contig >= eng.n_contigs) return empty_result();
    const annotate_engine::ContigIndex &index = eng.exon_index[contig];
    const std::vector<int64_t> &bounds = index.boundaries;

    std::unordered_map<int64_t, int64_t> score, peak_score, utr_bases;
    std::unordered_map<int64_t, bool> coding_at_breakpoint;
    std::vector<int64_t> order;  /* peak_score insertion order */

    int64_t lo = std::min(from_, to), hi = std::max(from_, to);
    int64_t step = from_ <= to ? 1 : -1;
    int64_t position = from_;
    size_t idx = std::lower_bound(bounds.begin(), bounds.end(), tb[from_])
                 - bounds.begin();
    while (idx < bounds.size() && lo <= position && position <= hi) {
        int64_t boundary = bounds[idx];
        int64_t set_lo = index.offsets[idx], set_hi = index.offsets[idx + 1];
        int64_t last_transcribed_base = tb[to];
        while (lo <= position && position <= hi && tb[position] <= boundary) {
            int64_t base = tb[position];
            for (int64_t k = set_lo; k < set_hi; ++k) {
                int64_t e = index.items[k];
                if (eng.exon_gene[e] != gene || base < eng.exon_start[e]
                    || base > eng.exon_end[e])
                    continue;
                int64_t t = eng.exon_transcript[e];
                score[t] += 1;
                last_transcribed_base = base;
                if (e == eng.transcript_first_exon[t]
                    || e == eng.transcript_last_exon[t])
                    utr_bases[t] += 1;
                if (position == breakpoint_idx) {
                    if (eng.exon_cds_start[e] <= base
                        && base <= eng.exon_cds_end[e])
                        coding_at_breakpoint[t] = true;
                    if ((std::llabs(base - eng.exon_start[e]) <= 2
                         && e != eng.transcript_first_exon[t])
                        || (std::llabs(base - eng.exon_end[e]) <= 2
                            && e != eng.transcript_last_exon[t]))
                        score[t] += 10;
                }
            }
            position += step;
        }
        for (int64_t k = set_lo; k < set_hi; ++k) {
            int64_t e = index.items[k];
            if (eng.exon_gene[e] != gene) continue;
            int64_t t = eng.exon_transcript[e];
            auto found = peak_score.find(t);
            if (found == peak_score.end()) {
                peak_score.emplace(t, score[t]);
                order.push_back(t);
            } else if (score[t] > found->second) {
                found->second = score[t];
            }
            int64_t exon_start = idx > 0 ? bounds[idx - 1]
                                         : eng.exon_start[e] - 1;
            int64_t exon_length = std::min(boundary, tb[to])
                                  - std::max(last_transcribed_base + 1,
                                             exon_start)
                                  + 1;
            if (exon_length < 0)
                exon_length = ((int64_t)1 << 32) + exon_length;
            score[t] -= std::min(exon_length, score[t]);
        }
        idx += 1;
    }

    if (order.empty()) return empty_result();
    std::vector<int64_t> best{order[0]};
    auto coding_of = [&](int64_t t) {
        auto found = coding_at_breakpoint.find(t);
        return found != coding_at_breakpoint.end() && found->second;
    };
    auto utr_of = [&](int64_t t) {
        auto found = utr_bases.find(t);
        return found != utr_bases.end() ? found->second : (int64_t)0;
    };
    for (size_t i = 1; i < order.size(); ++i) {
        int64_t t = order[i];
        int64_t best0 = best[0];
        if (peak_score[t] == peak_score[best0]
            && coding_of(best0) == coding_of(t)) {
            best.push_back(t);
        } else if (peak_score[t] > peak_score[best0]
                   || (!coding_of(best0) && coding_of(t)
                       && (peak_score[t] == peak_score[best0]
                           || (utr_of(t) > 0 && utr_of(best0) > 0
                               && (uint32_t)(peak_score[t] - utr_of(t))
                                  >= (uint32_t)(peak_score[best0]
                                                - utr_of(best0)))))) {
            best.assign(1, t);
        }
    }
    if (peak_score[best[0]] == 0) return empty_result();

    std::stable_sort(best.begin(), best.end(), [&](int64_t a, int64_t b) {
        int64_t length_a = eng.exon_end[eng.transcript_last_exon[a]]
                           - eng.exon_start[eng.transcript_first_exon[a]];
        int64_t length_b = eng.exon_end[eng.transcript_last_exon[b]]
                           - eng.exon_start[eng.transcript_first_exon[b]];
        if (eng.transcript_coding_length[a] != eng.transcript_coding_length[b])
            return eng.transcript_coding_length[a]
                   > eng.transcript_coding_length[b];
        if (length_a != length_b) return length_a > length_b;
        return a < b;
    });
    if (best.size() > 1) best.push_back(best[0]);
    return PyBytes_FromStringAndSize((const char *)best.data(),
                                     (Py_ssize_t)(best.size() * 8));
}
