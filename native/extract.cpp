// Retained extraction store (extract.h): singleton + the lazy export
// surface Python uses to materialize Fragment objects on demand (only the
// output writer needs them in the default native path). The cascade store
// (cascade.cpp) adopts these fragments in place via cascade_begin_retained;
// per-fragment filters live there once adopted.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <map>
#include <vector>

#include "cascade.h"
#include "extract.h"

namespace extract_store {

ExtractStore &store() {
    static ExtractStore instance;
    return instance;
}

void release_store() {
    ExtractStore &s = store();
    s.fragments.clear();
    s.fragments.shrink_to_fit();
    s.ready = false;
}

}  // namespace extract_store

namespace {

using extract_store::ExtractFragment;
using extract_store::ExtractMate;

int64_t fragment_filter(size_t index) {
    const cascade_store::Cascade &c = cascade_store::cascade();
    if (c.ready && index < c.fragments.size())
        return c.fragments[index].filter;
    return 0;
}

int64_t mate_flags(const ExtractMate &mate) {
    return (mate.supplementary ? 1 : 0) | (mate.first_in_pair ? 2 : 0)
           | (mate.strand ? 4 : 0) | (mate.predicted_strand ? 8 : 0)
           | (mate.predicted_strand_ambiguous ? 16 : 0)
           | (mate.exonic ? 32 : 0);
}

}  // namespace

// Fill `mapping` (a dict or dict subclass) with {name: row} for every
// retained fragment in store order, creating each name string once. The
// row int doubles as the "not yet materialized" sentinel of the lazy view.
PyObject *extract_fill_names(PyObject *, PyObject *args) {
    PyObject *mapping;
    if (!PyArg_ParseTuple(args, "O", &mapping)) return nullptr;
    if (!PyDict_Check(mapping)) {
        PyErr_SetString(PyExc_TypeError, "expected a dict");
        return nullptr;
    }
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    for (size_t f = 0; f < s.fragments.size(); ++f) {
        const std::string &name = s.fragments[f].name;
        PyObject *key = PyUnicode_DecodeLatin1(name.data(),
                                               (Py_ssize_t)name.size(),
                                               nullptr);
        if (key == nullptr) return nullptr;
        PyObject *row = PyLong_FromSsize_t((Py_ssize_t)f);
        if (row == nullptr || PyDict_SetItem(mapping, key, row) < 0) {
            Py_XDECREF(row);
            Py_DECREF(key);
            return nullptr;
        }
        Py_DECREF(row);
        Py_DECREF(key);
    }
    return PyLong_FromSsize_t((Py_ssize_t)s.fragments.size());
}

// Single-fragment export for lazy materialization:
// (frag_flags, filter, [(mate_flags, contig, start, end, cigar_b, seq_b,
//   genes_b), ...])
PyObject *extract_export_fragment(PyObject *, PyObject *args) {
    long long index;
    if (!PyArg_ParseTuple(args, "L", &index)) return nullptr;
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready || index < 0 || (size_t)index >= s.fragments.size()) {
        PyErr_SetString(PyExc_IndexError, "extract store fragment index");
        return nullptr;
    }
    const ExtractFragment &fragment = s.fragments[index];
    PyObject *mates = PyList_New((Py_ssize_t)fragment.mates.size());
    if (mates == nullptr) return nullptr;
    for (size_t m = 0; m < fragment.mates.size(); ++m) {
        const ExtractMate &mate = fragment.mates[m];
        PyObject *row = Py_BuildValue(
            "(LLLLy#y#y#)", (long long)mate_flags(mate), (long long)mate.contig,
            (long long)mate.start, (long long)mate.end,
            mate.cigar.empty() ? "" : (const char *)mate.cigar.data(),
            (Py_ssize_t)(mate.cigar.size() * 4),
            mate.seq.empty() ? "" : mate.seq.data(),
            (Py_ssize_t)mate.seq.size(),
            mate.genes.empty() ? "" : (const char *)mate.genes.data(),
            (Py_ssize_t)(mate.genes.size() * 8));
        if (row == nullptr) {
            Py_DECREF(mates);
            return nullptr;
        }
        PyList_SET_ITEM(mates, m, row);
    }
    int64_t frag_flags = (fragment.single_end ? 1 : 0)
                         | (fragment.duplicate ? 2 : 0)
                         | (fragment.multimapper ? 4 : 0);
    return Py_BuildValue("(LLN)", (long long)frag_flags,
                         (long long)fragment_filter((size_t)index), mates);
}

// Bulk columnar export for the fallback paths that materialize every
// fragment (same layout notion as the non-retained scan_sam extraction
// result, extended with annotation state and filters).
PyObject *extract_export_all(PyObject *, PyObject *) {
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    size_t n_frags = s.fragments.size(), n_mates = 0, cigar_size = 0,
           seq_size = 0, genes_size = 0, names_size = 0;
    for (const ExtractFragment &fragment : s.fragments) {
        names_size += fragment.name.size();
        n_mates += fragment.mates.size();
        for (const ExtractMate &mate : fragment.mates) {
            cigar_size += mate.cigar.size();
            seq_size += mate.seq.size();
            genes_size += mate.genes.size();
        }
    }
    std::string names_blob;
    names_blob.reserve(names_size);
    std::vector<int64_t> name_offsets(n_frags + 1, 0),
        frag_offsets(n_frags + 1, 0), frag_flags(n_frags), frag_filter(n_frags);
    std::vector<int64_t> contig(n_mates), start(n_mates), end(n_mates),
        flags(n_mates), cigar_offsets(n_mates + 1, 0), seq_offsets(n_mates + 1, 0),
        genes_offsets(n_mates + 1, 0);
    std::vector<uint32_t> cigar_words;
    cigar_words.reserve(cigar_size);
    std::string seq_blob;
    seq_blob.reserve(seq_size);
    std::vector<int64_t> genes_items;
    genes_items.reserve(genes_size);

    size_t row = 0;
    for (size_t f = 0; f < n_frags; ++f) {
        const ExtractFragment &fragment = s.fragments[f];
        names_blob += fragment.name;
        name_offsets[f + 1] = (int64_t)names_blob.size();
        frag_flags[f] = (fragment.single_end ? 1 : 0)
                        | (fragment.duplicate ? 2 : 0)
                        | (fragment.multimapper ? 4 : 0);
        frag_filter[f] = fragment_filter(f);
        for (const ExtractMate &mate : fragment.mates) {
            contig[row] = mate.contig;
            start[row] = mate.start;
            end[row] = mate.end;
            flags[row] = mate_flags(mate);
            cigar_words.insert(cigar_words.end(), mate.cigar.begin(),
                               mate.cigar.end());
            cigar_offsets[row + 1] = (int64_t)cigar_words.size();
            seq_blob += mate.seq;
            seq_offsets[row + 1] = (int64_t)seq_blob.size();
            genes_items.insert(genes_items.end(), mate.genes.begin(),
                               mate.genes.end());
            genes_offsets[row + 1] = (int64_t)genes_items.size();
            row += 1;
        }
        frag_offsets[f + 1] = (int64_t)row;
    }

    auto bytes_of = [](const void *data, size_t size) {
        return PyBytes_FromStringAndSize(size ? (const char *)data : "",
                                         (Py_ssize_t)size);
    };
    PyObject *result = PyTuple_New(13);
    int i = 0;
    PyTuple_SET_ITEM(result, i++, bytes_of(names_blob.data(), names_blob.size()));
    PyTuple_SET_ITEM(result, i++, bytes_of(name_offsets.data(), name_offsets.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(frag_offsets.data(), frag_offsets.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(frag_flags.data(), frag_flags.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(frag_filter.data(), frag_filter.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(contig.data(), contig.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(start.data(), start.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(end.data(), end.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(flags.data(), flags.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(cigar_offsets.data(), cigar_offsets.size() * 8));
    PyTuple_SET_ITEM(result, i++, bytes_of(cigar_words.data(), cigar_words.size() * 4));
    PyObject *tail = Py_BuildValue(
        "(y#y#y#y#)", seq_offsets.empty() ? "" : (const char *)seq_offsets.data(),
        (Py_ssize_t)(seq_offsets.size() * 8),
        seq_blob.empty() ? "" : seq_blob.data(), (Py_ssize_t)seq_blob.size(),
        genes_offsets.empty() ? "" : (const char *)genes_offsets.data(),
        (Py_ssize_t)(genes_offsets.size() * 8),
        genes_items.empty() ? "" : (const char *)genes_items.data(),
        (Py_ssize_t)(genes_items.size() * 8));
    PyTuple_SET_ITEM(result, i++, tail);
    PyTuple_SET_ITEM(result, i++, PyLong_FromSize_t(n_frags));
    return result;
}

// Multimapper cluster ids (HI-stripped name adjacency over the sorted store;
// read_chimeric_alignments.cpp:792-802 key adjacency)
PyObject *extract_cluster_ids(PyObject *, PyObject *) {
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    std::vector<int64_t> ids(s.fragments.size());
    std::string previous;
    int64_t current = -1;
    for (size_t i = 0; i < s.fragments.size(); ++i) {
        const std::string &name = s.fragments[i].name;
        size_t comma = name.rfind(',');
        std::string stripped =
            comma == std::string::npos ? name : name.substr(0, comma);
        if (i == 0 || stripped != previous) {
            current += 1;
            previous = stripped;
        }
        ids[i] = current;
    }
    return PyBytes_FromStringAndSize(
        ids.empty() ? "" : (const char *)ids.data(),
        (Py_ssize_t)(ids.size() * 8));
}

PyObject *extract_release(PyObject *, PyObject *) {
    extract_store::release_store();
    Py_RETURN_NONE;
}

// Per-fragment filter ids (from the adopted cascade store when ready) in one
// array, so the writer's per-read filter counts never materialize fragments.
// the writer's supporting-read columns in one call: comma-joined read
// names with the ",HI" suffix stripped (common.hpp:222), plus a
// (filter_id, count) histogram over the reads' cascade filters
// (output_fusions.cpp:820-1060 "filters" / "read_identifiers" columns)
PyObject *extract_supporting_reads(PyObject *, PyObject *args) {
    const char *idx_data;
    Py_ssize_t idx_len;
    if (!PyArg_ParseTuple(args, "y#", &idx_data, &idx_len)) return nullptr;
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    const int64_t *indices = (const int64_t *)idx_data;
    int64_t n = idx_len / 8;
    std::string names;
    std::map<int64_t, int64_t> counts;
    for (int64_t k = 0; k < n; ++k) {
        int64_t index = indices[k];
        if (index < 0 || index >= (int64_t)s.fragments.size()) {
            PyErr_SetString(PyExc_IndexError, "fragment index out of range");
            return nullptr;
        }
        const std::string &name = s.fragments[index].name;
        size_t comma = name.rfind(',');
        if (!names.empty()) names += ',';
        names.append(name, 0,
                     comma == std::string::npos ? name.size() : comma);
        int64_t filter = fragment_filter((size_t)index);
        if (filter != 0) counts[filter] += 1;
    }
    std::vector<int64_t> pairs;
    pairs.reserve(counts.size() * 2);
    for (const auto &entry : counts) {
        pairs.push_back(entry.first);
        pairs.push_back(entry.second);
    }
    return Py_BuildValue(
        "(s#y#)", names.data(), (Py_ssize_t)names.size(),
        pairs.empty() ? "" : (const char *)pairs.data(),
        (Py_ssize_t)(pairs.size() * 8));
}

PyObject *extract_fragment_filters(PyObject *, PyObject *) {
    extract_store::ExtractStore &s = extract_store::store();
    if (!s.ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    std::vector<int64_t> filters(s.fragments.size());
    for (size_t i = 0; i < s.fragments.size(); ++i)
        filters[i] = fragment_filter(i);
    return PyBytes_FromStringAndSize(
        filters.empty() ? "" : (const char *)filters.data(),
        (Py_ssize_t)(filters.size() * 8));
}
