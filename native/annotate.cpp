// Bulk alignment-annotation engine.
//
// Parity: source/annotation.cpp:379-555 (is_breakpoint_spliced,
// annotate_alignment, annotate_alignments) evaluated over the CSR interval
// index of annotation.t.hpp:25-100 — the same structures as
// arriba_tpu/annotation/{index,queries}.py, which remain the reference
// implementation (kill switch ARRIBA_TPU_NO_NATIVE=1). One annotate_bulk()
// call annotates every fragment of the run, eliminating the per-alignment
// Python interpreter cost of the "Annotating alignments" stage.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "annotate.h"

namespace annotate_engine {

static const int64_t MAX_SPLICE_SITE_DISTANCE = 2;  // annotation.hpp:23
static const bool UPSTREAM_DIR = true;              // constants.py UPSTREAM

Engine &engine() {
    static Engine instance;
    return instance;
}

typedef std::vector<int64_t> Set;

static void set_at(const ContigIndex &index, size_t boundary_idx, Set &out) {
    int64_t lo = index.offsets[boundary_idx], hi = index.offsets[boundary_idx + 1];
    out.assign(index.items.begin() + lo, index.items.begin() + hi);
}

static void sorted_union(const Set &set1, const Set &set2, Set &out) {
    out.clear();
    std::set_union(set1.begin(), set1.end(), set2.begin(), set2.end(),
                   std::back_inserter(out));
}

// Intersection of sorted feature sets; union if disjoint (annotation.t.hpp:47-53).
static void combine_annotations(const Set &set1, const Set &set2, Set &out,
                                bool make_union = true) {
    out.clear();
    if (!set1.empty() && !set2.empty())
        std::set_intersection(set1.begin(), set1.end(), set2.begin(), set2.end(),
                              std::back_inserter(out));
    if (out.empty() && make_union) {
        if (set1.empty()) { out = set2; return; }
        if (set2.empty()) { out = set1; return; }
        sorted_union(set1, set2, out);
    }
}

static size_t lower_bound_index(const std::vector<int64_t> &values, int64_t key) {
    return std::lower_bound(values.begin(), values.end(), key) - values.begin();
}

// Features overlapping the region containing pos (annotation.t.hpp:61-68).
static void point_query_in(const std::vector<ContigIndex> &indices,
                           int64_t contig, int64_t pos, Set &out) {
    out.clear();
    if (contig < 0 || contig >= (int64_t)indices.size())
        return;
    const ContigIndex &index = indices[contig];
    size_t idx = lower_bound_index(index.boundaries, pos);
    if (idx >= index.boundaries.size())
        return;
    set_at(index, idx, out);
}

// Features overlapping [start, end] with 2 bp slack at each end; intersection
// of the start/end result sets, union if disjoint (annotation.t.hpp:70-99).
static void range_query_in(const std::vector<ContigIndex> &indices,
                           int64_t contig, int64_t start, int64_t end,
                           Set &out) {
    if (contig < 0 || contig >= (int64_t)indices.size()) {
        out.clear();
        return;
    }
    if (start == end) {
        point_query_in(indices, contig, start, out);
        return;
    }
    if (start > end)
        std::swap(start, end);
    const ContigIndex &index = indices[contig];
    size_t n = index.boundaries.size();

    Set result_start, result_end, scratch;
    size_t idx = lower_bound_index(index.boundaries, start);
    if (idx < n) {
        set_at(index, idx, result_start);
        if (index.boundaries[idx] - start <= 2 && idx + 1 < n) {
            set_at(index, idx + 1, scratch);
            Set merged;
            sorted_union(result_start, scratch, merged);
            result_start.swap(merged);
        }
    }

    idx = lower_bound_index(index.boundaries, end);
    if (idx < n)
        set_at(index, idx, result_end);
    if (idx > 0 && n > 0) {
        size_t prev = std::min(idx, n) - 1;
        if (end - index.boundaries[prev] <= 2) {
            set_at(index, prev, scratch);
            Set merged;
            sorted_union(result_end, scratch, merged);
            result_end.swap(merged);
        }
    }

    combine_annotations(result_start, result_end, out);
}

static void point_query(int64_t contig, int64_t pos, Set &out) {
    point_query_in(engine().exon_index, contig, pos, out);
}

static void range_query(int64_t contig, int64_t start, int64_t end, Set &out) {
    range_query_in(engine().exon_index, contig, start, end, out);
}

void exon_point_query(int64_t contig, int64_t pos, std::vector<int64_t> &out) {
    point_query(contig, pos, out);
}

void exon_range_query(int64_t contig, int64_t start, int64_t end,
                      std::vector<int64_t> &out) {
    range_query(contig, start, end, out);
}

// annotation.cpp:379-401 — does any exon of `gene` in the boundary set have a
// matching boundary within MAX_SPLICE_SITE_DISTANCE of the breakpoint,
// excluding terminal exons (with single-exon-coding and incomplete-annotation
// exceptions)?
static bool exons_near_splice_site(int64_t gene, bool direction,
                                   int64_t breakpoint, const ContigIndex &index,
                                   size_t boundary_idx) {
    int64_t lo = index.offsets[boundary_idx], hi = index.offsets[boundary_idx + 1];
    for (int64_t i = lo; i < hi; ++i) {
        int64_t e = index.items[i];
        if (engine().exon_gene[e] != gene)
            continue;
        int64_t prev_e = engine().exon_prev[e], next_e = engine().exon_next[e];
        if (direction == UPSTREAM_DIR) {
            if (std::abs(engine().exon_start[e] - breakpoint) <= MAX_SPLICE_SITE_DISTANCE &&
                (prev_e >= 0 ||
                 (prev_e < 0 && next_e < 0 && engine().exon_cds_start[e] != -1) ||
                 engine().exon_start[e] == engine().exon_cds_start[e]))
                return true;
        } else {
            if (std::abs(engine().exon_end[e] - breakpoint) <= MAX_SPLICE_SITE_DISTANCE &&
                (next_e >= 0 ||
                 (prev_e < 0 && next_e < 0 && engine().exon_cds_start[e] != -1) ||
                 engine().exon_end[e] == engine().exon_cds_end[e]))
                return true;
        }
    }
    return false;
}

// annotation.cpp:404-429 — check the boundary sets at, after, and before the
// breakpoint.
bool is_breakpoint_spliced(int64_t gene, bool direction, int64_t breakpoint) {
    int64_t contig = engine().gene_contig[gene];
    if (contig >= engine().n_contigs)
        return false;
    const ContigIndex &index = engine().exon_index[contig];
    size_t n = index.boundaries.size();
    if (n == 0)
        return false;
    size_t idx = lower_bound_index(index.boundaries, breakpoint);
    if (idx < n) {
        if (exons_near_splice_site(gene, direction, breakpoint, index, idx))
            return true;
        if (idx + 1 < n &&
            exons_near_splice_site(gene, direction, breakpoint, index, idx + 1))
            return true;
    }
    if (idx > 0 &&
        exons_near_splice_site(gene, direction, breakpoint, index, idx - 1))
        return true;
    return false;
}

struct MateState {
    int64_t contig, start, end;
    bool strand, predicted_strand, predicted_strand_ambiguous, exonic;
    const uint32_t *cigar;
    int64_t n_cigar;
    Set genes;
};

static bool complement_strand_if(bool strand, bool condition) {
    return condition ? !strand : strand;  // annotation.hpp:52-63
}

// annotation.cpp:431-503 — derive the gene set of one alignment from exon
// overlap, then disambiguate via splice-pattern agreement; may also resolve
// the predicted strand for unstranded data.
static void annotate_alignment(MateState &mate) {
    Set exon_set;
    range_query(mate.contig, mate.start, mate.end, exon_set);
    Set &gene_set = mate.genes;
    gene_set.clear();
    for (int64_t e : exon_set)
        gene_set.push_back(engine().exon_gene[e]);
    std::sort(gene_set.begin(), gene_set.end());
    gene_set.erase(std::unique(gene_set.begin(), gene_set.end()), gene_set.end());

    if (mate.n_cigar > 1 && (gene_set.size() > 1 || mate.predicted_strand_ambiguous)) {
        Set supported;
        int64_t reference_position = mate.start;
        for (int64_t i = 0; i < mate.n_cigar; ++i) {
            uint32_t op = mate.cigar[i] & 0xF;
            int64_t oplen = mate.cigar[i] >> 4;
            if (op == 4 /*S*/ || op == 5 /*H*/ || op == 3 /*N*/) {
                supported.clear();
                for (int64_t g : gene_set) {
                    if (op == 4 || op == 5) {
                        bool spliced = is_breakpoint_spliced(
                            g, i == 0 ? UPSTREAM_DIR : !UPSTREAM_DIR,
                            reference_position);
                        if (spliced)
                            supported.push_back(g);
                    } else {  // REF_SKIP: intron must align with exon end AND start
                        if (is_breakpoint_spliced(g, !UPSTREAM_DIR, reference_position) ||
                            is_breakpoint_spliced(g, UPSTREAM_DIR,
                                                  reference_position + oplen))
                            supported.push_back(g);
                    }
                }
                if (!supported.empty())
                    break;
            }
            if (op == 3 /*N*/ || op == 0 /*M*/ || op == 8 /*X*/ || op == 7 /*=*/ ||
                op == 2 /*D*/)
                reference_position += oplen;
        }

        if (!supported.empty()) {
            if (supported.size() < gene_set.size())
                gene_set = supported;
            if (mate.predicted_strand_ambiguous) {
                bool all_same = true;
                bool first = engine().gene_strand[supported[0]] != 0;
                for (int64_t g : supported)
                    if ((engine().gene_strand[g] != 0) != first) {
                        all_same = false;
                        break;
                    }
                if (all_same) {
                    mate.predicted_strand = first;
                    mate.predicted_strand_ambiguous = false;
                }
            }
        }
    }
}

// annotation.cpp:505-555 — annotate each mate, then reconcile strands and
// gene sets across mates.
static void annotate_fragment(MateState *mates, int n_mates) {
    for (int m = 0; m < n_mates; ++m) {
        annotate_alignment(mates[m]);
        mates[m].exonic = !mates[m].genes.empty();
    }

    MateState &m1 = mates[0], &m2 = mates[1];
    if (m1.predicted_strand_ambiguous && !m2.predicted_strand_ambiguous) {
        m1.predicted_strand =
            complement_strand_if(m2.predicted_strand, m1.strand == m2.strand);
        m1.predicted_strand_ambiguous = false;
    } else if (!m1.predicted_strand_ambiguous && m2.predicted_strand_ambiguous) {
        m2.predicted_strand =
            complement_strand_if(m1.predicted_strand, m1.strand == m2.strand);
        m2.predicted_strand_ambiguous = false;
    } else if (!m1.predicted_strand_ambiguous && !m2.predicted_strand_ambiguous) {
        if ((m1.predicted_strand != m2.predicted_strand) != (m1.strand == m2.strand)) {
            m1.predicted_strand_ambiguous = true;
            m2.predicted_strand_ambiguous = true;
        }
    }

    if (n_mates == 3) {  // split read: mates = [MATE1, SPLIT_READ, SUPPLEMENTARY]
        MateState &split = mates[1], &supp = mates[2];
        Set combined;
        combine_annotations(split.genes, m1.genes, combined);
        if (m1.genes.empty() || combined.size() < m1.genes.size())
            m1.genes = combined;
        if (split.genes.empty() || combined.size() < split.genes.size())
            split.genes = combined;

        if (split.predicted_strand_ambiguous && !supp.predicted_strand_ambiguous) {
            m1.predicted_strand = complement_strand_if(supp.predicted_strand,
                                                       supp.strand != split.strand);
            m1.predicted_strand_ambiguous = false;
            split.predicted_strand = m1.predicted_strand;
            split.predicted_strand_ambiguous = false;
        } else if (!split.predicted_strand_ambiguous &&
                   supp.predicted_strand_ambiguous) {
            supp.predicted_strand = complement_strand_if(
                split.predicted_strand, supp.strand != split.strand);
            supp.predicted_strand_ambiguous = false;
        } else if (!split.predicted_strand_ambiguous &&
                   !supp.predicted_strand_ambiguous) {
            if ((split.predicted_strand != supp.predicted_strand) !=
                (supp.strand != split.strand)) {
                m1.predicted_strand_ambiguous = true;
                split.predicted_strand_ambiguous = true;
                supp.predicted_strand_ambiguous = true;
            }
        }
    }
}

// --------------------------------------------------------------------------
// Python bindings

static bool bytes_to_vector(PyObject *obj, std::vector<int64_t> &out) {
    char *data;
    Py_ssize_t size;
    if (PyBytes_AsStringAndSize(obj, &data, &size) < 0)
        return false;
    out.resize(size / 8);
    std::memcpy(out.data(), data, out.size() * 8);
    return true;
}

}  // namespace annotate_engine

using namespace annotate_engine;

// annotate_bind(n_contigs, boundaries_list, offsets_list, items_list,
//               exon_gene, exon_start, exon_end, exon_prev, exon_next,
//               exon_cds_start, exon_cds_end, gene_contig, gene_strand)
// All table arguments are bytes of little-endian int64; the three lists hold
// one bytes object per contig.
PyObject *annotate_bind(PyObject *, PyObject *args) {
    int n_contigs;
    PyObject *boundaries_list, *offsets_list, *items_list;
    PyObject *exon_gene, *exon_start, *exon_end, *exon_prev, *exon_next,
        *exon_cds_start, *exon_cds_end, *gene_contig, *gene_strand;
    if (!PyArg_ParseTuple(args, "iOOOSSSSSSSSS", &n_contigs, &boundaries_list,
                          &offsets_list, &items_list, &exon_gene, &exon_start,
                          &exon_end, &exon_prev, &exon_next, &exon_cds_start,
                          &exon_cds_end, &gene_contig, &gene_strand))
        return nullptr;

    engine() = Engine();
    engine().n_contigs = n_contigs;
    engine().exon_index.resize(n_contigs);
    if (PyList_Size(boundaries_list) != n_contigs ||
        PyList_Size(offsets_list) != n_contigs ||
        PyList_Size(items_list) != n_contigs) {
        PyErr_SetString(PyExc_ValueError, "index list length != n_contigs");
        return nullptr;
    }
    for (int c = 0; c < n_contigs; ++c) {
        if (!bytes_to_vector(PyList_GET_ITEM(boundaries_list, c),
                             engine().exon_index[c].boundaries) ||
            !bytes_to_vector(PyList_GET_ITEM(offsets_list, c),
                             engine().exon_index[c].offsets) ||
            !bytes_to_vector(PyList_GET_ITEM(items_list, c),
                             engine().exon_index[c].items))
            return nullptr;
    }
    if (!bytes_to_vector(exon_gene, engine().exon_gene) ||
        !bytes_to_vector(exon_start, engine().exon_start) ||
        !bytes_to_vector(exon_end, engine().exon_end) ||
        !bytes_to_vector(exon_prev, engine().exon_prev) ||
        !bytes_to_vector(exon_next, engine().exon_next) ||
        !bytes_to_vector(exon_cds_start, engine().exon_cds_start) ||
        !bytes_to_vector(exon_cds_end, engine().exon_cds_end) ||
        !bytes_to_vector(gene_contig, engine().gene_contig) ||
        !bytes_to_vector(gene_strand, engine().gene_strand))
        return nullptr;
    engine().ready = true;
    Py_RETURN_NONE;
}

// annotate_bulk(frag_offsets, mate_contig, mate_start, mate_end, mate_strand,
//               pred_strand, pred_ambiguous, cigar_offsets, cigar_words)
// -> (genes_offsets, genes_items, pred_strand, pred_ambiguous, exonic)
// Scalar arrays are bytes of int64 (one entry per mate, fragments delimited by
// frag_offsets); cigar_words is bytes of uint32. Returns int64 bytes arrays.
PyObject *annotate_bulk(PyObject *, PyObject *args) {
    PyObject *frag_offsets_b, *contig_b, *start_b, *end_b, *strand_b,
        *pred_strand_b, *pred_ambig_b, *cigar_offsets_b, *cigar_words_b;
    if (!PyArg_ParseTuple(args, "SSSSSSSSS", &frag_offsets_b, &contig_b,
                          &start_b, &end_b, &strand_b, &pred_strand_b,
                          &pred_ambig_b, &cigar_offsets_b, &cigar_words_b))
        return nullptr;
    if (!engine().ready) {
        PyErr_SetString(PyExc_RuntimeError, "annotate_bind not called");
        return nullptr;
    }

    std::vector<int64_t> frag_offsets, contig, start, end, strand, pred_strand,
        pred_ambig, cigar_offsets;
    if (!bytes_to_vector(frag_offsets_b, frag_offsets) ||
        !bytes_to_vector(contig_b, contig) || !bytes_to_vector(start_b, start) ||
        !bytes_to_vector(end_b, end) || !bytes_to_vector(strand_b, strand) ||
        !bytes_to_vector(pred_strand_b, pred_strand) ||
        !bytes_to_vector(pred_ambig_b, pred_ambig) ||
        !bytes_to_vector(cigar_offsets_b, cigar_offsets))
        return nullptr;
    char *cigar_data;
    Py_ssize_t cigar_size;
    if (PyBytes_AsStringAndSize(cigar_words_b, &cigar_data, &cigar_size) < 0)
        return nullptr;
    const uint32_t *cigar_words = reinterpret_cast<const uint32_t *>(cigar_data);

    size_t n_mates = contig.size();
    size_t n_frags = frag_offsets.size() ? frag_offsets.size() - 1 : 0;
    std::vector<int64_t> out_offsets(n_mates + 1, 0);
    std::vector<int64_t> out_items;
    out_items.reserve(n_mates * 2);
    std::vector<int64_t> out_exonic(n_mates, 0);

    MateState mates[3];
    for (size_t f = 0; f < n_frags; ++f) {
        int64_t lo = frag_offsets[f], hi = frag_offsets[f + 1];
        int count = static_cast<int>(hi - lo);
        if (count < 2 || count > 3) {
            PyErr_SetString(PyExc_ValueError, "fragment must have 2 or 3 mates");
            return nullptr;
        }
        for (int m = 0; m < count; ++m) {
            int64_t row = lo + m;
            MateState &mate = mates[m];
            mate.contig = contig[row];
            mate.start = start[row];
            mate.end = end[row];
            mate.strand = strand[row] != 0;
            mate.predicted_strand = pred_strand[row] != 0;
            mate.predicted_strand_ambiguous = pred_ambig[row] != 0;
            mate.cigar = cigar_words + cigar_offsets[row];
            mate.n_cigar = cigar_offsets[row + 1] - cigar_offsets[row];
            mate.exonic = false;
        }
        annotate_fragment(mates, count);
        for (int m = 0; m < count; ++m) {
            int64_t row = lo + m;
            MateState &mate = mates[m];
            out_items.insert(out_items.end(), mate.genes.begin(), mate.genes.end());
            out_offsets[row + 1] = static_cast<int64_t>(out_items.size());
            pred_strand[row] = mate.predicted_strand ? 1 : 0;
            pred_ambig[row] = mate.predicted_strand_ambiguous ? 1 : 0;
            out_exonic[row] = mate.exonic ? 1 : 0;
        }
    }

    PyObject *result = Py_BuildValue(
        "(y#y#y#y#y#)", reinterpret_cast<const char *>(out_offsets.data()),
        (Py_ssize_t)(out_offsets.size() * 8),
        reinterpret_cast<const char *>(out_items.data()),
        (Py_ssize_t)(out_items.size() * 8),
        reinterpret_cast<const char *>(pred_strand.data()),
        (Py_ssize_t)(pred_strand.size() * 8),
        reinterpret_cast<const char *>(pred_ambig.data()),
        (Py_ssize_t)(pred_ambig.size() * 8),
        reinterpret_cast<const char *>(out_exonic.data()),
        (Py_ssize_t)(out_exonic.size() * 8));
    return result;
}

// ---------------------------------------------------------------------------
// Retained-store annotation chain (pipeline.py:159-282 over extract.h's
// fragments, no Python materialization): strandedness detection/assignment
// (read_stats.cpp:94-143, read_chimeric_alignments.cpp:775-790), exon
// annotation + gene-level fallback (arriba.cpp:186-205), dummy-gene range
// construction (arriba.cpp:207-260; the Python side appends the rows and
// re-binds), re-annotation and dummy disambiguation (arriba.cpp:262-319).

#include "extract.h"

namespace annotate_engine {

// gene_index_bind(boundaries_list, offsets_list, items_list, gene_start,
//                 gene_end, gene_is_dummy)
PyObject *gene_index_bind_impl(PyObject *args) {
    PyObject *boundaries_list, *offsets_list, *items_list;
    PyObject *gene_start, *gene_end, *gene_is_dummy;
    if (!PyArg_ParseTuple(args, "OOOSSS", &boundaries_list, &offsets_list,
                          &items_list, &gene_start, &gene_end, &gene_is_dummy))
        return nullptr;
    Engine &eng = engine();
    Py_ssize_t n = PyList_Size(boundaries_list);
    eng.gene_index.assign(n, ContigIndex());
    for (Py_ssize_t c = 0; c < n; ++c) {
        if (!bytes_to_vector(PyList_GET_ITEM(boundaries_list, c),
                             eng.gene_index[c].boundaries)
            || !bytes_to_vector(PyList_GET_ITEM(offsets_list, c),
                                eng.gene_index[c].offsets)
            || !bytes_to_vector(PyList_GET_ITEM(items_list, c),
                                eng.gene_index[c].items))
            return nullptr;
    }
    if (!bytes_to_vector(gene_start, eng.gene_start)
        || !bytes_to_vector(gene_end, eng.gene_end))
        return nullptr;
    {
        char *data;
        Py_ssize_t size;
        if (PyBytes_AsStringAndSize(gene_is_dummy, &data, &size) < 0)
            return nullptr;
        eng.gene_is_dummy.assign((const uint8_t *)data,
                                 (const uint8_t *)data + size);
    }
    eng.gene_index_ready = true;
    Py_RETURN_NONE;
}

}  // namespace annotate_engine

using annotate_engine::engine;
using extract_store::ExtractFragment;
using extract_store::ExtractMate;

PyObject *gene_index_bind(PyObject *, PyObject *args) {
    return annotate_engine::gene_index_bind_impl(args);
}

namespace {

bool require_stores() {
    if (!extract_store::store().ready || !engine().ready
        || !engine().gene_index_ready) {
        PyErr_SetString(PyExc_RuntimeError,
                        "extract store / annotation engine not ready");
        return false;
    }
    return true;
}

constexpr bool EXT_FORWARD = true;
constexpr bool EXT_UPSTREAM = true, EXT_DOWNSTREAM = false;
constexpr int EXT_MATE1 = 0, EXT_MATE2 = 1, EXT_SPLIT = 1, EXT_SUPP = 2;

}  // namespace

// read_stats.cpp:94-143 (stats.py detect_strandedness); runs before
// annotation on the initial gene index
PyObject *detect_strandedness_native(PyObject *, PyObject *) {
    if (!require_stores()) return nullptr;
    const extract_store::ExtractStore &s = extract_store::store();
    const annotate_engine::Engine &eng = engine();
    const int64_t sample_size = 100;
    const double threshold = 0.95;
    int64_t count = 0, matching_strand = 0;
    std::vector<int64_t> gene_set;
    for (const ExtractFragment &fragment : s.fragments) {
        if (fragment.mates.size() != 3) continue;
        const ExtractMate &split = fragment.mates[EXT_SPLIT];
        const ExtractMate &supp = fragment.mates[EXT_SUPP];
        if (split.contig == supp.contig && split.strand == supp.strand
            && std::llabs(split.start - supp.start) < 400000) {
            annotate_engine::range_query_in(eng.gene_index, split.contig,
                                            split.start, split.end, gene_set);
            if (gene_set.size() == 1) {
                bool direction = split.strand == EXT_FORWARD ? EXT_UPSTREAM
                                                             : EXT_DOWNSTREAM;
                int64_t position =
                    split.strand == EXT_FORWARD ? split.start : split.end;
                int64_t g = gene_set[0];
                if (annotate_engine::is_breakpoint_spliced(g, direction,
                                                           position)) {
                    bool gene_strand = eng.gene_strand[g] != 0;
                    if ((split.first_in_pair && split.strand == gene_strand)
                        || (fragment.mates[EXT_MATE1].first_in_pair
                            && fragment.mates[EXT_MATE1].strand == gene_strand))
                        matching_strand += 1;
                    count += 1;
                    if (count >= sample_size) break;
                }
            }
        }
    }
    long long result = 0;  // STRANDEDNESS_NO
    if (count >= sample_size) {
        if ((double)matching_strand < (1 - threshold) * (double)count)
            result = 2;  // STRANDEDNESS_REVERSE
        else if ((double)matching_strand > threshold * (double)count)
            result = 1;  // STRANDEDNESS_YES
    }
    return PyLong_FromLongLong(result);
}

// read_chimeric_alignments.cpp:775-790 (chimeric.py
// assign_strands_from_strandedness)
PyObject *assign_strands_native(PyObject *, PyObject *args) {
    long long strandedness;
    if (!PyArg_ParseTuple(args, "L", &strandedness)) return nullptr;
    if (strandedness == 0) Py_RETURN_NONE;
    if (!extract_store::store().ready) {
        PyErr_SetString(PyExc_RuntimeError, "extract store not populated");
        return nullptr;
    }
    auto complement_if = [](bool strand, bool condition) {
        return condition ? !strand : strand;
    };
    for (ExtractFragment &fragment : extract_store::store().fragments) {
        if (fragment.mates.size() < 2) continue;
        int first = fragment.mates[EXT_MATE1].first_in_pair ? EXT_MATE1
                                                            : EXT_MATE2;
        int second = fragment.mates[EXT_MATE1].first_in_pair ? EXT_MATE2
                                                             : EXT_MATE1;
        ExtractMate &first_mate = fragment.mates[first];
        ExtractMate &second_mate = fragment.mates[second];
        first_mate.predicted_strand =
            complement_if(first_mate.strand, strandedness == 2);
        first_mate.predicted_strand_ambiguous = false;
        second_mate.predicted_strand = complement_if(
            first_mate.predicted_strand,
            first_mate.strand == second_mate.strand);
        second_mate.predicted_strand_ambiguous = false;
        if (fragment.mates.size() == 3) {
            ExtractMate &supp = fragment.mates[EXT_SUPP];
            supp.predicted_strand = complement_if(
                fragment.mates[EXT_SPLIT].predicted_strand,
                supp.strand != fragment.mates[EXT_SPLIT].strand);
            supp.predicted_strand_ambiguous = false;
        }
    }
    Py_RETURN_NONE;
}

// arriba.cpp:186-260: exon annotation, gene-level fallback, and dummy-gene
// range construction. Returns (dummy_contig_b, dummy_start_b, dummy_end_b).
PyObject *annotate_store_phase1(PyObject *, PyObject *args) {
    int threads = 1;
    if (!PyArg_ParseTuple(args, "|i", &threads)) return nullptr;
    if (!require_stores()) return nullptr;
    extract_store::ExtractStore &s = extract_store::store();
    const annotate_engine::Engine &eng = engine();

    // each fragment is annotated independently against the immutable engine
    // tables (no lazy caches on this path), so the loop parallelizes over
    // block ranges with per-worker scratch; results land only in the
    // fragment's own mates => byte-identical to the serial walk
    auto annotate_range = [&s, &eng](size_t lo, size_t hi) {
        std::vector<int64_t> scratch;
        for (size_t f = lo; f < hi; ++f) {
            ExtractFragment &fragment = s.fragments[f];
            // exon-level annotation via the shared core
            // (annotation.cpp:505-555)
            annotate_engine::MateState states[3];
            int n_mates = (int)fragment.mates.size();
            for (int m = 0; m < n_mates; ++m) {
                const ExtractMate &mate = fragment.mates[m];
                states[m].contig = mate.contig;
                states[m].start = mate.start;
                states[m].end = mate.end;
                states[m].strand = mate.strand;
                states[m].predicted_strand = mate.predicted_strand;
                states[m].predicted_strand_ambiguous =
                    mate.predicted_strand_ambiguous;
                states[m].cigar = mate.cigar.data();
                states[m].n_cigar = (int64_t)mate.cigar.size();
            }
            annotate_engine::annotate_fragment(states, n_mates);
            for (int m = 0; m < n_mates; ++m) {
                ExtractMate &mate = fragment.mates[m];
                mate.genes = std::move(states[m].genes);
                mate.exonic = states[m].exonic;
                mate.predicted_strand = states[m].predicted_strand;
                mate.predicted_strand_ambiguous =
                    states[m].predicted_strand_ambiguous;
            }

            // gene-level fallback (arriba.cpp:190-205)
            for (ExtractMate &mate : fragment.mates)
                if (mate.genes.empty())
                    annotate_engine::range_query_in(eng.gene_index,
                                                    mate.contig, mate.start,
                                                    mate.end, mate.genes);
            if (n_mates == 3) {
                ExtractMate &split = fragment.mates[EXT_SPLIT];
                ExtractMate &m1 = fragment.mates[EXT_MATE1];
                annotate_engine::combine_annotations(split.genes, m1.genes,
                                                     scratch);
                if (m1.genes.empty() || scratch.size() < m1.genes.size())
                    m1.genes = scratch;
                if (split.genes.empty() || scratch.size() < split.genes.size())
                    split.genes = scratch;
            }
        }
    };
    size_t n_fragments = s.fragments.size();
    int n_workers = threads > 1 ? std::min<int>(threads, 8) : 1;
    if (n_workers > 1 && n_fragments >= 1024) {
        Py_BEGIN_ALLOW_THREADS
        std::vector<std::thread> pool;
        size_t chunk = (n_fragments + n_workers - 1) / n_workers;
        for (int w = 1; w < n_workers; ++w)
            pool.emplace_back(annotate_range,
                              std::min(n_fragments, w * chunk),
                              std::min(n_fragments, (w + 1) * chunk));
        annotate_range(0, std::min(n_fragments, chunk));
        for (std::thread &worker : pool) worker.join();
        Py_END_ALLOW_THREADS
    } else {
        annotate_range(0, n_fragments);
    }

    // unmapped alignment positions (arriba.cpp:207-226)
    std::vector<std::pair<int64_t, int64_t>> unmapped;
    for (const ExtractFragment &fragment : s.fragments) {
        if (fragment.mates.size() == 3) {
            const ExtractMate &split = fragment.mates[EXT_SPLIT];
            const ExtractMate &supp = fragment.mates[EXT_SUPP];
            if (split.genes.empty())
                unmapped.emplace_back(split.contig,
                                      split.strand == EXT_FORWARD ? split.start
                                                                  : split.end);
            if (supp.genes.empty())
                unmapped.emplace_back(supp.contig,
                                      supp.strand == EXT_FORWARD ? supp.end
                                                                 : supp.start);
        } else {
            for (const ExtractMate &mate : fragment.mates)
                if (mate.genes.empty())
                    unmapped.emplace_back(mate.contig,
                                          mate.strand == EXT_FORWARD
                                              ? mate.end
                                              : mate.start);
        }
    }

    std::vector<int64_t> dummy_contig, dummy_start, dummy_end;
    if (!unmapped.empty()) {
        std::sort(unmapped.begin(), unmapped.end());
        auto next_known_gene = [&eng](int64_t contig,
                                      int64_t position) -> int64_t {
            if (contig >= (int64_t)eng.gene_index.size()) return -1;
            const std::vector<int64_t> &bounds =
                eng.gene_index[contig].boundaries;
            auto it = std::lower_bound(bounds.begin(), bounds.end(), position);
            return it == bounds.end() ? -1 : *it;
        };

        int64_t record_contig = unmapped[0].first;
        int64_t record_start = unmapped[0].second;
        int64_t record_end = record_start;
        int64_t nkg = next_known_gene(record_contig, record_start);
        size_t i = 1;
        while (true) {
            bool at_end = i >= unmapped.size();
            int64_t contig = 0, pos = 0;
            if (!at_end) {
                contig = unmapped[i].first;
                pos = unmapped[i].second;
            }
            if (at_end || record_end + 10000 < pos
                || (nkg >= 0 && nkg <= pos) || contig != record_contig) {
                dummy_contig.push_back(record_contig);
                dummy_start.push_back(record_start);
                dummy_end.push_back(record_end);
                if (at_end) break;
                record_contig = contig;
                record_start = pos;
                nkg = next_known_gene(contig, pos);
            }
            record_end = unmapped[i].second;
            i += 1;
        }
    }

    return Py_BuildValue(
        "(y#y#y#)",
        dummy_contig.empty() ? "" : (const char *)dummy_contig.data(),
        (Py_ssize_t)(dummy_contig.size() * 8),
        dummy_start.empty() ? "" : (const char *)dummy_start.data(),
        (Py_ssize_t)(dummy_start.size() * 8),
        dummy_end.empty() ? "" : (const char *)dummy_end.data(),
        (Py_ssize_t)(dummy_end.size() * 8));
}

// arriba.cpp:262-319: re-annotate unmapped alignments against the grown gene
// index (dummy genes included) and disambiguate multiple dummy genes. The
// Python side re-binds the engine + gene index before calling this.
PyObject *annotate_store_phase2(PyObject *, PyObject *) {
    if (!require_stores()) return nullptr;
    extract_store::ExtractStore &s = extract_store::store();
    const annotate_engine::Engine &eng = engine();

    for (ExtractFragment &fragment : s.fragments) {
        if (fragment.mates.size() == 3) {
            ExtractMate &split = fragment.mates[EXT_SPLIT];
            ExtractMate &supp = fragment.mates[EXT_SUPP];
            ExtractMate &m1 = fragment.mates[EXT_MATE1];
            if (m1.genes.empty() || split.genes.empty()) {
                int64_t breakpoint =
                    split.strand == EXT_FORWARD ? split.start : split.end;
                annotate_engine::point_query_in(eng.gene_index, split.contig,
                                                breakpoint, split.genes);
                m1.genes = split.genes;
            }
            if (supp.genes.empty()) {
                int64_t breakpoint =
                    supp.strand == EXT_FORWARD ? supp.end : supp.start;
                annotate_engine::point_query_in(eng.gene_index, supp.contig,
                                                breakpoint, supp.genes);
            }
        } else {
            for (ExtractMate &mate : fragment.mates) {
                if (mate.genes.empty()) {
                    int64_t breakpoint =
                        mate.strand == EXT_FORWARD ? mate.end : mate.start;
                    annotate_engine::point_query_in(eng.gene_index, mate.contig,
                                                    breakpoint, mate.genes);
                }
            }
        }
    }

    // disambiguate multiple dummy genes (arriba.cpp:286-319)
    for (ExtractFragment &fragment : s.fragments) {
        for (ExtractMate &mate : fragment.mates) {
            if (mate.genes.size() > 1 && eng.gene_is_dummy[mate.genes[0]]) {
                int64_t breakpoint =
                    mate.strand == EXT_FORWARD ? mate.start : mate.end;
                int64_t encompassing =
                    fragment.mates[EXT_MATE1].genes.empty()
                        ? mate.genes[0]
                        : fragment.mates[EXT_MATE1].genes[0];
                for (int64_t dummy_gene : mate.genes)
                    if (eng.gene_start[dummy_gene] <= breakpoint
                        && breakpoint <= eng.gene_end[dummy_gene])
                        encompassing = dummy_gene;
                mate.genes.assign(1, encompassing);
            }
        }
        if (fragment.mates.size() == 3) {
            ExtractMate &split = fragment.mates[EXT_SPLIT];
            ExtractMate &m1 = fragment.mates[EXT_MATE1];
            if (!m1.genes.empty() && !split.genes.empty()
                && m1.genes[0] != split.genes[0]
                && eng.gene_is_dummy[m1.genes[0]]
                && eng.gene_is_dummy[split.genes[0]]) {
                int64_t breakpoint =
                    split.strand == EXT_FORWARD ? split.start : split.end;
                int64_t encompassing = m1.genes[0];
                for (const ExtractMate *source : {&m1, &split})
                    for (int64_t dummy_gene : source->genes)
                        if (eng.gene_start[dummy_gene] <= breakpoint
                            && breakpoint <= eng.gene_end[dummy_gene])
                            encompassing = dummy_gene;
                m1.genes.assign(1, encompassing);
                split.genes.assign(1, encompassing);
            }
        }
    }
    Py_RETURN_NONE;
}
