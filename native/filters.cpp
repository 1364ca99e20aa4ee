// Native kernels for read-level filters.
//
// mismatch_scan: bulk port of count_mismatches (filter_mismatches.cpp:12-53,
// arriba_tpu/filters/read_level.py count_mismatches) — one call computes
// (mismatches, alignment_length) for every candidate alignment. The decision
// logic (binomial test) stays in Python where its float semantics are owned.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT_CLIP = 4,
              CHARD_CLIP = 5, CEQUAL = 7, CDIFF = 8;

bool bytes_to_i64(PyObject *obj, std::vector<int64_t> &out) {
    char *data;
    Py_ssize_t size;
    if (PyBytes_AsStringAndSize(obj, &data, &size) < 0)
        return false;
    out.resize(size / 8);
    std::memcpy(out.data(), data, out.size() * 8);
    return true;
}

}  // namespace

// mismatch_scan(contig, start, strand, cigar_offsets, cigar_words, seq_offsets,
//               seq_blob, assembly_list) -> (mismatches, alignment_lengths)
// Scalars are bytes of int64 per candidate; cigar_words is bytes of uint32;
// assembly_list holds one buffer (uint8 contig sequence) or None per contig.
PyObject *mismatch_scan(PyObject *, PyObject *args) {
    PyObject *contig_b, *start_b, *strand_b, *cigar_offsets_b, *cigar_words_b,
        *seq_offsets_b, *seq_blob_b, *assembly_obj;
    if (!PyArg_ParseTuple(args, "SSSSSSSO", &contig_b, &start_b, &strand_b,
                          &cigar_offsets_b, &cigar_words_b, &seq_offsets_b,
                          &seq_blob_b, &assembly_obj))
        return nullptr;

    std::vector<int64_t> contig, start, strand, cigar_offsets, seq_offsets;
    if (!bytes_to_i64(contig_b, contig) || !bytes_to_i64(start_b, start) ||
        !bytes_to_i64(strand_b, strand) ||
        !bytes_to_i64(cigar_offsets_b, cigar_offsets) ||
        !bytes_to_i64(seq_offsets_b, seq_offsets))
        return nullptr;
    char *cigar_data, *seq_data;
    Py_ssize_t cigar_size, seq_size;
    if (PyBytes_AsStringAndSize(cigar_words_b, &cigar_data, &cigar_size) < 0 ||
        PyBytes_AsStringAndSize(seq_blob_b, &seq_data, &seq_size) < 0)
        return nullptr;
    const uint32_t *cigar_words = reinterpret_cast<const uint32_t *>(cigar_data);
    const uint8_t *sequences = reinterpret_cast<const uint8_t *>(seq_data);

    Py_ssize_t n_contigs = PyList_Size(assembly_obj);
    std::vector<const uint8_t *> assembly(n_contigs, nullptr);
    std::vector<Py_ssize_t> assembly_len(n_contigs, 0);
    std::vector<Py_buffer> buffers;
    for (Py_ssize_t c = 0; c < n_contigs; ++c) {
        PyObject *plane = PyList_GetItem(assembly_obj, c);
        if (plane == Py_None)
            continue;
        Py_buffer view;
        if (PyObject_GetBuffer(plane, &view, PyBUF_SIMPLE) != 0) {
            for (Py_buffer &held : buffers) PyBuffer_Release(&held);
            return nullptr;
        }
        buffers.push_back(view);
        assembly[c] = (const uint8_t *)view.buf;
        assembly_len[c] = view.len;
    }

    size_t n = contig.size();
    std::vector<int64_t> mismatches_out(n, 0), lengths_out(n, 0);

    for (size_t row = 0; row < n; ++row) {
        int64_t mismatches = 0, alignment_length = 0;
        int64_t reference_position = start[row];
        int64_t read_position = 0;
        const uint8_t *contig_seq = nullptr;
        Py_ssize_t contig_len = 0;
        if (contig[row] >= 0 && contig[row] < n_contigs) {
            contig_seq = assembly[contig[row]];
            contig_len = assembly_len[contig[row]];
        }
        const uint8_t *seq = sequences + seq_offsets[row];
        int64_t seq_len = seq_offsets[row + 1] - seq_offsets[row];
        const uint32_t *ops = cigar_words + cigar_offsets[row];
        int64_t n_ops = cigar_offsets[row + 1] - cigar_offsets[row];
        bool strand_forward = strand[row] != 0;

        for (int64_t i = 0; i < n_ops; ++i) {
            uint32_t op = ops[i] & 0xf;
            int64_t oplen = ops[i] >> 4;
            if (op == CSOFT_CLIP || op == CHARD_CLIP) {
                read_position += oplen;
                if (!((i == 0 && !strand_forward) ||
                      (i == n_ops - 1 && strand_forward)))
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
                    if (read_position + j >= seq_len ||
                        reference_position + j >= contig_len ||
                        contig_seq == nullptr)
                        break;
                    uint8_t base = seq[read_position + j];
                    if (base == 'N')
                        continue;
                    alignment_length += 1;
                    if (base != contig_seq[reference_position + j])
                        mismatches += 1;
                }
                reference_position += oplen;
                read_position += oplen;
            }
        }
        mismatches_out[row] = mismatches;
        lengths_out[row] = alignment_length;
    }

    for (Py_buffer &held : buffers)
        PyBuffer_Release(&held);

    return Py_BuildValue(
        "(y#y#)", n ? (const char *)mismatches_out.data() : "",
        (Py_ssize_t)(mismatches_out.size() * 8),
        n ? (const char *)lengths_out.data() : "",
        (Py_ssize_t)(lengths_out.size() * 8));
}
