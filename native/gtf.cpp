// Native GTF gene-model parser — the fast path of io/gtf.py
// (reference semantics: /root/reference/source/annotation.cpp:28-377).
//
// The Python implementation in io/gtf.py is the parity reference
// (ARRIBA_TPU_NO_NATIVE=1 falls back to it); this parser reproduces it
// line for line: attribute extraction with the same warning strings,
// contig registration order, gene-bound expansion + malformed-gene
// rejection, CDS->exon mapping, per-transcript doubly-linked exon lists,
// transcript spans, and the hard-coded Gencode fixes. Output is the final
// columnar table set the Python layer wraps into Annotation.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cerrno>
#include <cstdint>
#if defined(__SSE2__)
#include <immintrin.h>
#endif
#include <cstdio>
#include <cstring>
#include <string>
#include <tuple>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int64_t MAX_GENE_SIZE = 3000000;  // annotation.cpp:173

struct StrView {
    const char *p;
    size_t n;
    std::string str() const { return std::string(p, n); }
};

bool view_eq(const StrView &v, const std::string &s) {
    return v.n == s.size() && std::memcmp(v.p, s.data(), v.n) == 0;
}

// attributes.find(name + ' "') ... exactly _get_attribute (io/gtf.py:74-92)
bool get_attribute(const StrView &attributes,
                   const std::vector<std::string> &names, StrView *out) {
    const char *start = nullptr;
    for (const std::string &name : names) {
        std::string needle = name + " \"";
        start = (const char *)memmem(attributes.p, attributes.n,
                                     needle.data(), needle.size());
        if (start != nullptr) break;
    }
    if (start == nullptr) {
        return false;
    }
    const char *quote =
        (const char *)memchr(start, '"', attributes.p + attributes.n - start);
    if (quote == nullptr) return false;
    const char *vstart = quote + 1;
    const char *vend = (const char *)memchr(
        vstart, '"', attributes.p + attributes.n - vstart);
    if (vend == nullptr) return false;
    out->p = vstart;
    out->n = (size_t)(vend - vstart);
    return true;
}

void warn_extract(const std::vector<std::string> &names,
                  const StrView &attributes) {
    std::string joined;
    for (size_t i = 0; i < names.size(); ++i) {
        if (i) joined += "|";
        joined += names[i];
    }
    fprintf(stderr,
            "WARNING: failed to extract %s from line in GTF file: %.*s\n",
            joined.c_str(), (int)attributes.n, attributes.p);
}

// strip_ensembl_version_number (annotation.hpp:27-33)
std::string strip_version(const StrView &id) {
    std::string s = id.str();
    if (s.rfind("ENS", 0) == 0) {
        size_t dot = s.rfind('.');
        if (dot != std::string::npos) return s.substr(0, dot);
    }
    return s;
}

struct KeyHash {
    size_t operator()(const std::tuple<std::string, int64_t, bool> &k) const {
        return std::hash<std::string>()(std::get<0>(k))
               ^ (std::hash<int64_t>()(std::get<1>(k)) * 1315423911u)
               ^ (std::get<2>(k) ? 0x9e3779b9u : 0);
    }
};
using Key = std::tuple<std::string, int64_t, bool>;

struct GeneRec {
    std::string gene_id;
    std::string name;
    int64_t contig;
    int64_t start;
    int64_t end;
    bool strand;
};

struct ExonRec {
    int64_t contig;
    int64_t start;
    int64_t end;
    bool strand;
    int32_t gene;        // index into gene vector
    int32_t transcript;  // index into transcript vector (short id key)
    int32_t full_t;      // index into full-transcript-key vector
    int64_t cstart = -1;
    int64_t cend = -1;
    bool removed = false;
};

PyObject *bytes_list(const std::vector<std::string> &items) {
    PyObject *list = PyList_New((Py_ssize_t)items.size());
    if (list == nullptr) return nullptr;
    for (size_t i = 0; i < items.size(); ++i)
        PyList_SET_ITEM(list, (Py_ssize_t)i,
                        PyBytes_FromStringAndSize(items[i].data(),
                                                  (Py_ssize_t)items[i].size()));
    return list;
}

template <typename T>
PyObject *vec_bytes(const std::vector<T> &v) {
    return PyBytes_FromStringAndSize((const char *)v.data(),
                                     (Py_ssize_t)(v.size() * sizeof(T)));
}

// returns false (with the CPython exception set) on a non-bytes element —
// the caller must propagate nullptr rather than continue with a live
// exception (undefined behavior for further C-API calls)
bool parse_str_list(PyObject *obj, std::vector<std::string> *out) {
    Py_ssize_t n = PyList_Size(obj);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PyList_GetItem(obj, i);
        char *buf;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(item, &buf, &len) != 0)
            return false;
        out->emplace_back(buf, (size_t)len);
    }
    return true;
}

}  // namespace

// gtf_parse(text, gene_name_aliases, gene_id_aliases, transcript_id_aliases,
//           exon_aliases, cds_aliases, contig_names, contig_lens,
//           fixes [(contig_name, transcript_id, strand)...])
PyObject *gtf_parse(PyObject *, PyObject *args) {
    const char *text;
    Py_ssize_t text_len;
    PyObject *gene_name_al, *gene_id_al, *tid_al, *exon_al, *cds_al;
    PyObject *contig_names_obj, *contig_lens_obj, *fixes_obj;
    if (!PyArg_ParseTuple(args, "y#OOOOOOOO", &text, &text_len, &gene_name_al,
                          &gene_id_al, &tid_al, &exon_al, &cds_al,
                          &contig_names_obj, &contig_lens_obj, &fixes_obj))
        return nullptr;

    std::vector<std::string> gene_name_names, gene_id_names, tid_names,
        exon_features, cds_features;
    if (!parse_str_list(gene_name_al, &gene_name_names)
        || !parse_str_list(gene_id_al, &gene_id_names)
        || !parse_str_list(tid_al, &tid_names)
        || !parse_str_list(exon_al, &exon_features)
        || !parse_str_list(cds_al, &cds_features))
        return nullptr;

    // contig registry: existing names -> id; new names appended
    std::unordered_map<std::string, int64_t> contig_ids;
    std::vector<std::string> new_contigs;
    {
        std::vector<std::string> existing;
        if (!parse_str_list(contig_names_obj, &existing)) return nullptr;
        for (size_t i = 0; i < existing.size(); ++i)
            contig_ids.emplace(existing[i], (int64_t)i);
    }
    int64_t n_known_contigs = (int64_t)contig_ids.size();
    if (!PyBytes_Check(contig_lens_obj)) {
        PyErr_SetString(PyExc_TypeError, "contig_lens must be bytes");
        return nullptr;
    }
    const int64_t *contig_lens =
        (const int64_t *)PyBytes_AsString(contig_lens_obj);
    int64_t n_lens = (int64_t)(PyBytes_Size(contig_lens_obj) / 8);

    auto contig_len = [&](int64_t cid) -> int64_t {
        return cid < n_lens ? contig_lens[cid] : -1;
    };
    // contigs.remove_chr normalization (common.hpp:74-80): the registry is
    // keyed by normalized names; new_contigs returns ORIGINAL names so the
    // Python registry reproduces both lists via contigs.add(original)
    auto normalize = [](const StrView &name) -> std::string {
        std::string s = name.str();
        if (s.rfind("chr", 0) == 0) s = s.substr(3);
        if (s == "M") s = "MT";
        return s;
    };
    bool too_many_contigs = false;
    auto contig_add = [&](const StrView &name) -> int64_t {
        std::string key = normalize(name);
        auto it = contig_ids.find(key);
        if (it != contig_ids.end()) return it->second;
        int64_t id = (int64_t)contig_ids.size();
        if (id >= 0xFFFF - 1) {
            too_many_contigs = true;
            return 0;
        }
        contig_ids.emplace(std::move(key), id);
        new_contigs.push_back(name.str());
        return id;
    };

    std::vector<GeneRec> genes;
    std::unordered_map<Key, int32_t, KeyHash> gene_index;
    std::vector<std::string> transcripts;  // full transcript_id at first sight
    std::unordered_map<Key, int32_t, KeyHash> transcript_index;
    std::vector<Key> transcript_keys;      // row -> short-id key
    std::vector<ExonRec> exons;
    std::unordered_map<Key, int32_t, KeyHash> full_t_index;
    std::vector<std::vector<int32_t>> exons_by_full_t;
    std::vector<Key> full_t_keys;
    struct CodingRec {
        bool strand;
        int64_t contig;
        int64_t start;
        int64_t end;
        std::string transcript_id;
    };
    std::vector<CodingRec> coding_regions;
    std::unordered_set<int32_t> malformed_genes;
    std::unordered_set<std::string> non_unique_items;

    const char *pos = text;
    const char *end = text + text_len;
    while (pos < end) {
        const char *nl = (const char *)memchr(pos, '\n', (size_t)(end - pos));
        const char *line_end = nl ? nl : end;
        StrView line{pos, (size_t)(line_end - pos)};
        pos = nl ? nl + 1 : end;
        if (line.n && line.p[line.n - 1] == '\r') line.n -= 1;
        if (line.n == 0 || line.p[0] == '#') continue;

        // split first 9 tab fields
        StrView fields[9];
        const char *f = line.p;
        const char *lend = line.p + line.n;
        int nf = 0;
        while (nf < 9) {
            const char *tab = (const char *)memchr(f, '\t', (size_t)(lend - f));
            if (tab == nullptr) {
                fields[nf++] = {f, (size_t)(lend - f)};
                break;
            }
            fields[nf++] = {f, (size_t)(tab - f)};
            f = tab + 1;
            if (f > lend) break;
        }
        if (nf < 9) {
            fprintf(stderr,
                    "WARNING: failed to parse line in GTF file: %.*s\n",
                    (int)line.n, line.p);
            continue;
        }
        const StrView &contig_name = fields[0];
        const StrView &feature = fields[2];
        const StrView &start_s = fields[3];
        const StrView &end_s = fields[4];
        const StrView &strand_s = fields[6];
        const StrView &attributes = fields[8];

        // int(start) - 1 / int(end) - 1 with Python int() strictness
        auto parse_coord = [](const StrView &v, int64_t *out) -> bool {
            if (v.n == 0 || v.n > 30) return false;
            char buf[32];
            std::memcpy(buf, v.p, v.n);
            buf[v.n] = 0;
            char *endp;
            errno = 0;
            long long value = strtoll(buf, &endp, 10);
            if (errno == ERANGE) return false;  // matches _parse_coord's
                                                // int64 bound (io/gtf.py)
            while (*endp == ' ') ++endp;
            if (endp != buf + v.n) return false;
            *out = (int64_t)value - 1;
            return true;
        };
        int64_t start, end_coord;
        if (!parse_coord(start_s, &start) || !parse_coord(end_s, &end_coord)
            || contig_name.n == 0 || feature.n == 0 || strand_s.n == 0) {
            fprintf(stderr,
                    "WARNING: failed to parse line in GTF file: %.*s\n",
                    (int)line.n, line.p);
            continue;
        }

        StrView gene_name_v, gene_id_v;
        bool have_name = get_attribute(attributes, gene_name_names,
                                       &gene_name_v);
        if (!have_name) warn_extract(gene_name_names, attributes);
        bool have_id = get_attribute(attributes, gene_id_names, &gene_id_v);
        if (!have_id) warn_extract(gene_id_names, attributes);
        if (!have_name || !have_id) continue;
        std::string gene_id = gene_id_v.str();
        std::string short_gene_id = strip_version(gene_id_v);

        int64_t contig = contig_add(contig_name);
        bool strand = strand_s.p[0] == '+';

        bool is_exon = false, is_cds = false;
        for (const std::string &al : exon_features)
            if (view_eq(feature, al)) { is_exon = true; break; }
        if (!is_exon)
            for (const std::string &al : cds_features)
                if (view_eq(feature, al)) { is_cds = true; break; }

        if (is_exon) {
            StrView tid_v;
            if (!get_attribute(attributes, tid_names, &tid_v)) {
                warn_extract(tid_names, attributes);
                continue;
            }
            std::string transcript_id = tid_v.str();
            std::string short_tid = strip_version(tid_v);

            Key tkey{short_tid, contig, strand};
            auto tit = transcript_index.find(tkey);
            int32_t trow;
            if (tit == transcript_index.end()) {
                trow = (int32_t)transcripts.size();
                transcript_index.emplace(tkey, trow);
                transcripts.push_back(transcript_id);
                transcript_keys.push_back(tkey);
            } else {
                trow = tit->second;
            }

            Key gkey{short_gene_id, contig, strand};
            auto git = gene_index.find(gkey);
            int32_t grow;
            if (git == gene_index.end()) {
                grow = (int32_t)genes.size();
                gene_index.emplace(gkey, grow);
                genes.push_back({gene_id, gene_name_v.str(), contig, start,
                                 end_coord, strand});
            } else {
                grow = git->second;
                GeneRec &g = genes[grow];
                if (g.start > start) g.start = start;
                if (g.end < end_coord) g.end = end_coord;
                if (g.contig != contig || g.end - g.start > MAX_GENE_SIZE) {
                    if (non_unique_items.insert(gene_id).second)
                        fprintf(stderr,
                                "WARNING: gene ID '%s' appears to be "
                                "non-unique and will be ignored\n",
                                gene_id.c_str());
                    malformed_genes.insert(grow);
                }
            }
            {
                const GeneRec &g = genes[grow];
                int64_t clen = contig_len(g.contig);
                if (clen >= 0 && g.end >= clen) {
                    if (non_unique_items.insert(gene_id).second)
                        fprintf(stderr,
                                "WARNING: gene with ID '%s' extends beyond "
                                "end of contig and will be ignored\n",
                                gene_id.c_str());
                    malformed_genes.insert(grow);
                }
            }

            Key fkey{transcript_id, contig, strand};
            auto fit = full_t_index.find(fkey);
            int32_t frow;
            if (fit == full_t_index.end()) {
                frow = (int32_t)exons_by_full_t.size();
                full_t_index.emplace(fkey, frow);
                exons_by_full_t.emplace_back();
                full_t_keys.push_back(fkey);
            } else {
                frow = fit->second;
            }
            exons.push_back({contig, start, end_coord, strand, grow, trow,
                             frow});
            exons_by_full_t[frow].push_back((int32_t)exons.size() - 1);

        } else if (is_cds) {
            StrView tid_v;
            if (!get_attribute(attributes, tid_names, &tid_v)) {
                warn_extract(tid_names, attributes);
                continue;
            }
            coding_regions.push_back(
                {strand, contig, start, end_coord, tid_v.str()});
        }
    }

    if (too_many_contigs) {
        PyErr_SetString(PyExc_ValueError, "too many contigs");
        return nullptr;
    }
    if (genes.empty()) {
        PyErr_SetString(PyExc_RuntimeError,
                        "failed to parse GTF file, please consider using -G");
        return nullptr;
    }

    // CDS -> exon mapping (annotation.cpp:302-320)
    std::vector<uint8_t> gene_protein_coding(genes.size(), 0);
    for (const CodingRec &c : coding_regions) {
        auto fit = full_t_index.find(Key{c.transcript_id, c.contig, c.strand});
        if (fit == full_t_index.end()) {
            fprintf(stderr,
                    "WARNING: CDS record has unknown transcript ID: %s\n",
                    c.transcript_id.c_str());
            continue;
        }
        for (int32_t ei : exons_by_full_t[fit->second]) {
            ExonRec &e = exons[ei];
            if ((e.start <= c.start && c.start <= e.end)
                || (e.start <= c.end && c.end <= e.end)
                || (e.start >= c.start && e.end <= c.end)) {
                e.cstart = std::max(c.start, e.start);
                e.cend = std::min(c.end, e.end);
                gene_protein_coding[e.gene] = 1;
            }
        }
    }

    // sort exon groups by (contig, end, start), stable
    for (std::vector<int32_t> &group : exons_by_full_t)
        std::stable_sort(group.begin(), group.end(),
                         [&](int32_t a, int32_t b) {
                             const ExonRec &x = exons[a];
                             const ExonRec &y = exons[b];
                             if (x.contig != y.contig) return x.contig < y.contig;
                             if (x.end != y.end) return x.end < y.end;
                             return x.start < y.start;
                         });

    // malformed transcripts: Gencode fixes first (resolved against the
    // final registry), then over-long short-transcript spans
    std::vector<Key> malformed_transcripts;
    {
        Py_ssize_t n_fixes = PyList_Size(fixes_obj);
        for (Py_ssize_t i = 0; i < n_fixes; ++i) {
            PyObject *fix = PyList_GetItem(fixes_obj, i);
            const char *fc, *fid;
            int fstrand;
            if (!PyArg_ParseTuple(fix, "ssp", &fc, &fid, &fstrand))
                return nullptr;
            StrView fcv{fc, strlen(fc)};
            auto cit = contig_ids.find(normalize(fcv));
            if (cit != contig_ids.end())
                malformed_transcripts.push_back(
                    Key{fid, cit->second, fstrand != 0});
        }
    }
    {
        // transcript spans in first-exon insertion order
        std::vector<int64_t> lo(transcripts.size(), INT64_MAX);
        std::vector<int64_t> hi(transcripts.size(), -1);
        std::vector<int32_t> order;
        std::vector<uint8_t> seen(transcripts.size(), 0);
        for (const ExonRec &e : exons) {
            if (!seen[e.transcript]) {
                seen[e.transcript] = 1;
                order.push_back(e.transcript);
            }
            lo[e.transcript] = std::min(lo[e.transcript], e.start);
            hi[e.transcript] = std::max(hi[e.transcript], e.end);
        }
        for (int32_t t : order) {
            if (hi[t] - lo[t] > MAX_GENE_SIZE) {
                malformed_transcripts.push_back(transcript_keys[t]);
                fprintf(stderr,
                        "WARNING: transcript ID '%s' appears to be "
                        "non-unique and will be ignored\n",
                        std::get<0>(transcript_keys[t]).c_str());
            }
        }
    }

    // remove malformed transcripts: drop exons, shrink or drop gene
    // (io/gtf.py:247-266)
    std::unordered_set<int32_t> removed_genes(malformed_genes.begin(),
                                              malformed_genes.end());
    for (const Key &tkey : malformed_transcripts) {
        auto tit = transcript_index.find(tkey);
        if (tit == transcript_index.end()) continue;
        int32_t trow = tit->second;
        int32_t gene_of_transcript = -1;
        for (ExonRec &e : exons) {
            if (e.transcript == trow && !e.removed) {
                e.removed = true;
                gene_of_transcript = e.gene;
            }
        }
        if (gene_of_transcript < 0) continue;
        int64_t lo = INT64_MAX, hi = -1;
        for (const ExonRec &e : exons) {
            if (e.gene == gene_of_transcript && !e.removed) {
                lo = std::min(lo, e.start);
                hi = std::max(hi, e.end);
            }
        }
        if (hi < 0) {
            removed_genes.insert(gene_of_transcript);
        } else {
            genes[gene_of_transcript].start = lo;
            genes[gene_of_transcript].end = hi;
        }
    }
    for (ExonRec &e : exons)
        if (removed_genes.count(e.gene)) e.removed = true;

    // ---- finalize ----
    std::vector<int32_t> gene_row(genes.size(), -1);
    std::vector<std::string> out_gene_ids, out_gene_names;
    std::vector<int64_t> g_contig, g_start, g_end;
    std::vector<uint8_t> g_strand, g_protein;
    for (size_t i = 0; i < genes.size(); ++i) {
        if (removed_genes.count((int32_t)i)) continue;
        gene_row[i] = (int32_t)out_gene_ids.size();
        out_gene_ids.push_back(genes[i].gene_id);
        out_gene_names.push_back(genes[i].name);
        g_contig.push_back(genes[i].contig);
        g_start.push_back(genes[i].start);
        g_end.push_back(genes[i].end);
        g_strand.push_back(genes[i].strand ? 1 : 0);
        g_protein.push_back(gene_protein_coding[i]);
    }

    std::vector<int32_t> exon_row(exons.size(), -1);
    std::vector<int64_t> e_contig, e_start, e_end, e_gene, e_transcript,
        e_cstart, e_cend;
    std::vector<uint8_t> e_strand;
    for (size_t i = 0; i < exons.size(); ++i) {
        const ExonRec &e = exons[i];
        if (e.removed) continue;
        exon_row[i] = (int32_t)e_contig.size();
        e_contig.push_back(e.contig);
        e_start.push_back(e.start);
        e_end.push_back(e.end);
        e_strand.push_back(e.strand ? 1 : 0);
        e_gene.push_back(gene_row[e.gene]);
        e_transcript.push_back(e.transcript);
        e_cstart.push_back(e.cstart);
        e_cend.push_back(e.cend);
    }
    size_t n_exons = e_contig.size();
    std::vector<int64_t> e_prev(n_exons, -1), e_next(n_exons, -1);
    for (const std::vector<int32_t> &group : exons_by_full_t) {
        std::vector<int32_t> rows;
        for (int32_t ei : group)
            if (exon_row[ei] >= 0) rows.push_back(exon_row[ei]);
        for (size_t i = 0; i < rows.size(); ++i) {
            e_prev[rows[i]] = i > 0 ? rows[i - 1] : -1;
            e_next[rows[i]] = i + 1 < rows.size() ? rows[i + 1] : -1;
        }
    }

    std::vector<int64_t> t_first(transcripts.size(), -1),
        t_last(transcripts.size(), -1), t_coding(transcripts.size(), 0);
    for (size_t row = 0; row < n_exons; ++row) {
        int64_t t = e_transcript[row];
        int64_t fe = t_first[t];
        if (fe < 0 || e_start[row] < e_start[fe]) t_first[t] = (int64_t)row;
        int64_t le = t_last[t];
        if (le < 0 || e_end[row] > e_end[le]) t_last[t] = (int64_t)row;
        if (e_cstart[row] != -1 && e_cend[row] != -1)
            t_coding[t] += e_cend[row] - e_cstart[row] + 1;
    }

    PyObject *result = Py_BuildValue(
        "(NNNNNNNNNNNNNNNNNNNN)", bytes_list(new_contigs),
        bytes_list(out_gene_ids), bytes_list(out_gene_names),
        vec_bytes(g_contig), vec_bytes(g_start), vec_bytes(g_end),
        vec_bytes(g_strand), vec_bytes(g_protein), bytes_list(transcripts),
        vec_bytes(t_first), vec_bytes(t_last), vec_bytes(t_coding),
        vec_bytes(e_contig), vec_bytes(e_start), vec_bytes(e_end),
        vec_bytes(e_strand), vec_bytes(e_gene), vec_bytes(e_transcript),
        vec_bytes(e_cstart), vec_bytes(e_cend));
    if (result == nullptr) return nullptr;
    PyObject *links = Py_BuildValue("(NN)", vec_bytes(e_prev),
                                    vec_bytes(e_next));
    PyObject *full = PySequence_Concat(result, links);
    Py_DECREF(result);
    Py_DECREF(links);
    return full;
}

// ---------------------------------------------------------------------------
// Native FASTA body assembly — the fast path of io/fasta.py
// (reference: assembly.cpp:28-58). Python finds the records and decides
// which contigs are interesting; this entry point does the byte work:
// uppercase + newline-strip each record body into a fresh bytes object,
// records processed by a small thread pool with the GIL released.

#include <thread>

namespace {

struct UpperLut {
    unsigned char map[256];
    UpperLut() {
        for (int i = 0; i < 256; ++i)
            map[i] = (i >= 'a' && i <= 'z') ? (unsigned char)(i - 32)
                                            : (unsigned char)i;
    }
};
const UpperLut kUpper;  // initialized before any thread runs

size_t fill_record(const char *src, size_t n, char *dst) {
    // uppercase + strip ALL \r and \n, matching bytes.translate(_UPPER,
    // b"\r\n") in io/fasta.py; returns the filled length. Lines without
    // interior '\r' (all real FASTA) take a 16-byte SIMD uppercase copy.
    char *out = dst;
    const char *end = src + n;
    while (src < end) {
        const char *nl = (const char *)memchr(src, '\n', (size_t)(end - src));
        const char *stop = nl ? nl : end;
        size_t len = (size_t)(stop - src);
        if (memchr(src, '\r', len) == nullptr) {
            const char *p = src;
#if defined(__SSE2__)
            const __m128i low = _mm_set1_epi8('a' - 1);
            const __m128i high = _mm_set1_epi8('z' + 1);
            const __m128i delta = _mm_set1_epi8(32);
            for (; p + 16 <= stop; p += 16, out += 16) {
                __m128i v = _mm_loadu_si128((const __m128i *)p);
                __m128i is_lower = _mm_and_si128(_mm_cmpgt_epi8(v, low),
                                                 _mm_cmplt_epi8(v, high));
                _mm_storeu_si128(
                    (__m128i *)out,
                    _mm_sub_epi8(v, _mm_and_si128(is_lower, delta)));
            }
#endif
            for (; p < stop; ++p)
                *out++ = (char)kUpper.map[(unsigned char)*p];
        } else {
            for (const char *p = src; p < stop; ++p) {
                if (*p == '\r') continue;
                *out++ = (char)kUpper.map[(unsigned char)*p];
            }
        }
        src = nl ? nl + 1 : end;
    }
    return (size_t)(out - dst);
}

}  // namespace

// fasta_bodies(raw_buffer, offsets_bytes, n_threads) with offsets int64
// pairs (body_start, body_end) per record -> list of bytes. Each output is
// allocated at the body's raw size and shrunk to the filled length
// (newlines stripped), so no counting pre-pass touches the data.
PyObject *fasta_bodies(PyObject *, PyObject *args) {
    Py_buffer raw_buf;
    PyObject *offsets_obj;
    int n_threads;
    if (!PyArg_ParseTuple(args, "y*Oi", &raw_buf, &offsets_obj, &n_threads))
        return nullptr;
    const char *raw = (const char *)raw_buf.buf;
    const int64_t *pairs = (const int64_t *)PyBytes_AsString(offsets_obj);
    Py_ssize_t n_records = PyBytes_Size(offsets_obj) / 16;

    std::vector<PyObject *> bodies(n_records, nullptr);  // owned refs
    std::vector<char *> dsts(n_records);
    std::vector<size_t> filled(n_records, 0);
    auto fail = [&]() -> PyObject * {
        for (PyObject *b : bodies) Py_XDECREF(b);
        PyBuffer_Release(&raw_buf);
        return nullptr;
    };
    for (Py_ssize_t i = 0; i < n_records; ++i) {
        bodies[i] = PyBytes_FromStringAndSize(
            nullptr, pairs[i * 2 + 1] - pairs[i * 2]);
        if (bodies[i] == nullptr) return fail();
        dsts[i] = PyBytes_AS_STRING(bodies[i]);
    }
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::thread> threads;
    int nt = n_threads < 1 ? 1 : n_threads;
    for (int t = 0; t < nt; ++t)
        threads.emplace_back([&, t]() {
            for (Py_ssize_t i = t; i < n_records; i += nt)
                filled[i] = fill_record(
                    raw + pairs[i * 2],
                    (size_t)(pairs[i * 2 + 1] - pairs[i * 2]), dsts[i]);
        });
    for (std::thread &th : threads) th.join();
    Py_END_ALLOW_THREADS;
    for (Py_ssize_t i = 0; i < n_records; ++i) {
        if ((Py_ssize_t)filled[i] != PyBytes_GET_SIZE(bodies[i])
            && _PyBytes_Resize(&bodies[i], (Py_ssize_t)filled[i]) < 0)
            return fail();
    }
    PyBuffer_Release(&raw_buf);
    PyObject *out = PyList_New(n_records);
    if (out == nullptr) {
        for (PyObject *b : bodies) Py_XDECREF(b);
        return nullptr;
    }
    for (Py_ssize_t i = 0; i < n_records; ++i)
        PyList_SET_ITEM(out, i, bodies[i]);  // steals the reference
    return out;
}
