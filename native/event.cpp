// Native event-level cascade over the fusion table produced by
// find_fusions_native. Each stage is an exact port of its Python twin in
// arriba_tpu/filters/{event_level,multimappers,in_vitro,genomic_support,
// blacklist,homologs,mismappers}.py, which in turn mirror the reference
// filters (file:line cited per stage). The table lives in event_store and
// never round-trips through Python until event_export.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
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
