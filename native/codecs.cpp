// Native fast path for the CRAM entropy codecs.
//
// The pure-Python decoders in arriba_tpu/io/cram.py (rANS 4x8, CRAM 3.0
// method 4) and arriba_tpu/io/cram31.py (rANS Nx16, CRAM 3.1 method 5)
// are the parity reference; this TU is a line-for-line port of their
// semantics for throughput (the Python loops decode ~1-2 MB/s, which
// makes real-world CRAM slices impractical). cram.py prefers these
// entry points when the extension is importable and falls back to the
// Python implementations otherwise. Reference dependency being
// replaced: htslib rANS_static / rANS_static4x16pr.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace cram_codecs {

struct Reader {
    const uint8_t *data;
    size_t size;
    size_t pos = 0;

    uint8_t byte() {
        if (pos >= size) throw std::runtime_error("truncated codec stream");
        return data[pos++];
    }
    const uint8_t *take(size_t n) {
        if (pos + n > size) throw std::runtime_error("truncated codec stream");
        const uint8_t *p = data + pos;
        pos += n;
        return p;
    }
    uint32_t uint7() {  // big-endian base-128 varint
        uint32_t value = 0;
        for (;;) {
            uint8_t c = byte();
            value = (value << 7) | (uint32_t)(c & 0x7F);
            if (!(c & 0x80)) return value;
        }
    }
    uint16_t uint16le() {
        const uint8_t *p = take(2);
        return (uint16_t)(p[0] | (p[1] << 8));
    }
    uint32_t uint32le() {
        const uint8_t *p = take(4);
        return (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
               ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
    }
};

/* ---- rANS 4x8 (CRAM 3.0 method 4) -------------------------------------- */

static const int TF_SHIFT_4X8 = 12;
static const uint32_t TOTFREQ_4X8 = 1u << TF_SHIFT_4X8;

struct Lookup4x8 {
    uint8_t sym[1 << 12];
    uint16_t cum[1 << 12];
    uint16_t freq[1 << 12];
};

// symbol -> frequency table in the 4x8 RLE layout (io/cram.py
// _rans_read_freq_table); fills the dense 4096-slot lookup
static void read_freq_table_4x8(Reader &in, Lookup4x8 &lut) {
    uint32_t freqs[256] = {0};
    int sym = in.byte();
    int rle = 0;
    for (;;) {
        uint32_t freq = in.byte();
        if (freq >= 128) freq = ((freq & 127) << 8) | in.byte();
        if (sym >= 0 && sym < 256) freqs[sym] = freq;
        if (rle > 0) {
            rle -= 1;
            sym += 1;
        } else if (sym + 1 < 256 && in.pos < in.size &&
                   in.data[in.pos] == sym + 1) {
            sym = in.byte();
            rle = in.byte();
        } else {
            sym = in.byte();
            if (sym == 0) break;
        }
    }
    uint32_t cum = 0;
    for (int s = 0; s < 256; ++s) {
        if (!freqs[s]) continue;
        uint32_t f = freqs[s];
        if (cum + f > TOTFREQ_4X8) throw std::runtime_error("bad 4x8 table");
        for (uint32_t k = cum; k < cum + f; ++k) {
            lut.sym[k] = (uint8_t)s;
            lut.cum[k] = (uint16_t)cum;
            lut.freq[k] = (uint16_t)f;
        }
        cum += f;
    }
}

static void rans4x8_decode(const uint8_t *data, size_t size,
                           std::string &out) {
    Reader in{data, size};
    int order = in.byte();
    in.take(4);  // compressed size (unused)
    uint32_t out_size = in.uint32le();
    out.resize(out_size);
    if (out_size == 0) return;

    if (order == 0) {
        std::vector<Lookup4x8> tables(1);
        read_freq_table_4x8(in, tables[0]);
        uint32_t x[4];
        for (int j = 0; j < 4; ++j) x[j] = in.uint32le();
        Lookup4x8 &t = tables[0];
        for (uint32_t i = 0; i < out_size; ++i) {
            int j = i & 3;
            uint32_t m = x[j] & (TOTFREQ_4X8 - 1);
            out[i] = (char)t.sym[m];
            x[j] = t.freq[m] * (x[j] >> TF_SHIFT_4X8) + m - t.cum[m];
            while (x[j] < (1u << 23)) x[j] = (x[j] << 8) | in.byte();
        }
        return;
    }
    if (order != 1) throw std::runtime_error("rANS 4x8: unsupported order");

    // order-1: outer symbol list shares the RLE structure; each listed
    // context has its own inner table (io/cram.py rans_decode order 1)
    std::vector<Lookup4x8> tables(256);
    std::vector<uint8_t> have(256, 0);
    int ctx = in.byte();
    int rle = 0;
    for (;;) {
        read_freq_table_4x8(in, tables[ctx & 0xFF]);
        have[ctx & 0xFF] = 1;
        if (rle > 0) {
            rle -= 1;
            ctx += 1;
        } else if (ctx + 1 < 256 && in.pos < in.size &&
                   in.data[in.pos] == ctx + 1) {
            ctx = in.byte();
            rle = in.byte();
        } else {
            ctx = in.byte();
            if (ctx == 0) break;
        }
    }
    uint32_t x[4];
    for (int j = 0; j < 4; ++j) x[j] = in.uint32le();
    uint32_t quarter = out_size >> 2;
    size_t offsets[4] = {0, quarter, 2ull * quarter, 3ull * quarter};
    size_t ends[4] = {quarter, 2ull * quarter, 3ull * quarter, out_size};
    uint8_t last[4] = {0, 0, 0, 0};
    auto step = [&](int j) {
        Lookup4x8 &t = have[last[j]] ? tables[last[j]] : tables[0];
        uint32_t m = x[j] & (TOTFREQ_4X8 - 1);
        if (!t.freq[m])
            throw std::runtime_error("rANS 4x8: empty slot in context table");
        uint8_t s = t.sym[m];
        out[offsets[j]++] = (char)s;
        x[j] = t.freq[m] * (x[j] >> TF_SHIFT_4X8) + m - t.cum[m];
        while (x[j] < (1u << 23)) x[j] = (x[j] << 8) | in.byte();
        last[j] = s;
    };
    for (uint32_t i = 0; i < quarter; ++i)
        for (int j = 0; j < 4; ++j) step(j);
    while (offsets[3] < ends[3]) step(3);
}

/* ---- rANS Nx16 (CRAM 3.1 method 5) ------------------------------------- */

static const uint32_t NX16_LOWER = 1u << 15;

enum {
    F_ORDER1 = 0x01,
    F_X32 = 0x04,
    F_STRIPE = 0x08,
    F_NOSZ = 0x10,
    F_CAT = 0x20,
    F_RLE = 0x40,
    F_PACK = 0x80,
};

static void normalise_freqs(uint32_t *freqs, uint32_t total_to) {
    // exact integer arithmetic of the spec's NormaliseFrequencies
    // (io/cram31.py _normalise_freqs)
    uint64_t tot = 0;
    for (int j = 0; j < 256; ++j) tot += freqs[j];
    if (tot == 0 || tot == total_to) return;
    uint64_t tr = (((uint64_t)total_to << 31) / tot) + ((1ull << 30) / tot);
    uint64_t new_tot = 0;
    uint32_t max_val = 0;
    int max_sym = 0;
    for (int j = 0; j < 256; ++j) {
        if (!freqs[j]) continue;
        if (max_val < freqs[j]) {
            max_val = freqs[j];
            max_sym = j;
        }
        uint32_t scaled = (uint32_t)(((uint64_t)freqs[j] * tr) >> 31);
        if (scaled == 0) scaled = 1;
        freqs[j] = scaled;
        new_tot += scaled;
    }
    freqs[max_sym] += (uint32_t)((int64_t)total_to - (int64_t)new_tot);
}

static std::vector<int> read_alphabet(Reader &in) {
    std::vector<int> alphabet;
    int rle = 0;
    int sym = in.byte();
    for (;;) {
        alphabet.push_back(sym);
        int last_sym = sym;
        if (rle > 0) {
            rle -= 1;
            sym += 1;
        } else {
            sym = in.byte();
            if (sym == last_sym + 1) rle = in.byte();
        }
        if (sym == 0) break;
    }
    return alphabet;
}

static void rans_nx16_o0(Reader &in, size_t out_len, int n_states,
                         std::string &out, size_t out_at);

struct LookupN16 {
    std::vector<uint8_t> sym;
    std::vector<uint32_t> cum;   // per symbol
    std::vector<uint32_t> freq;  // per symbol
    void build(const uint32_t *freqs, int shift) {
        sym.assign((size_t)1 << shift, 0);
        cum.assign(256, 0);
        freq.assign(256, 0);
        uint32_t c = 0;
        for (int s = 0; s < 256; ++s) {
            if (!freqs[s]) continue;
            cum[s] = c;
            freq[s] = freqs[s];
            if (c + freqs[s] > ((uint32_t)1 << shift))
                throw std::runtime_error("bad Nx16 table");
            for (uint32_t k = c; k < c + freqs[s]; ++k) sym[k] = (uint8_t)s;
            c += freqs[s];
        }
    }
};

static void rans_nx16_o0(Reader &in, size_t out_len, int n_states,
                         std::string &out, size_t out_at) {
    std::vector<int> alphabet = read_alphabet(in);
    uint32_t freqs[256] = {0};
    for (int s : alphabet) freqs[s] = in.uint7();
    normalise_freqs(freqs, 1u << 12);
    LookupN16 t;
    t.build(freqs, 12);
    std::vector<uint32_t> x(n_states);
    for (int j = 0; j < n_states; ++j) x[j] = in.uint32le();
    const uint32_t mask = (1u << 12) - 1;
    for (size_t i = 0; i < out_len; ++i) {
        int j = (int)(i % n_states);
        uint32_t m = x[j] & mask;
        uint8_t s = t.sym[m];
        out[out_at + i] = (char)s;
        x[j] = t.freq[s] * (x[j] >> 12) + m - t.cum[s];
        while (x[j] < NX16_LOWER) x[j] = (x[j] << 16) | in.uint16le();
    }
}

static void rans_nx16_o1(Reader &in, size_t out_len, int n_states,
                         std::string &out, size_t out_at) {
    int comp = in.byte();
    int shift = comp >> 4;
    std::string table_buf;
    Reader table_in{nullptr, 0};
    Reader *tbl = &in;
    if (comp & 1) {
        // compressed table: a RAW order-0 4-state body, no container
        // flags (htscodecs rans_uncompress_O0_4x16 framing)
        uint32_t u_size = in.uint7();
        uint32_t c_size = in.uint7();
        const uint8_t *payload = in.take(c_size);
        Reader table_body{payload, c_size};
        table_buf.resize(u_size);
        rans_nx16_o0(table_body, u_size, 4, table_buf, 0);
        table_in = Reader{(const uint8_t *)table_buf.data(), table_buf.size()};
        tbl = &table_in;
    }
    std::vector<int> alphabet = read_alphabet(*tbl);
    std::vector<LookupN16> tables(256);
    std::vector<uint8_t> have(256, 0);
    for (int ctx : alphabet) {
        uint32_t freqs[256] = {0};
        int zero_run = 0;
        for (int s : alphabet) {
            if (zero_run > 0) {
                zero_run -= 1;
                continue;
            }
            uint32_t f = tbl->uint7();
            freqs[s] = f;
            if (f == 0) zero_run = tbl->byte();
        }
        normalise_freqs(freqs, 1u << shift);
        tables[ctx & 0xFF].build(freqs, shift);
        have[ctx & 0xFF] = 1;
    }
    std::vector<uint32_t> x(n_states);
    for (int j = 0; j < n_states; ++j) x[j] = in.uint32le();
    size_t seg = out_len / n_states;
    std::vector<size_t> offsets(n_states), ends(n_states);
    for (int j = 0; j < n_states; ++j) {
        offsets[j] = (size_t)j * seg;
        ends[j] = (size_t)(j + 1) * seg;
    }
    ends[n_states - 1] = out_len;
    std::vector<uint8_t> last(n_states, 0);
    const uint32_t mask = (1u << shift) - 1;
    auto step = [&](int j) {
        LookupN16 &t = have[last[j]] ? tables[last[j]] : tables[0];
        if (t.sym.empty())
            throw std::runtime_error("rANS Nx16: context missing from table");
        uint32_t m = x[j] & mask;
        uint8_t s = t.sym[m];
        out[out_at + offsets[j]++] = (char)s;
        x[j] = t.freq[s] * (x[j] >> shift) + m - t.cum[s];
        while (x[j] < NX16_LOWER) x[j] = (x[j] << 16) | in.uint16le();
        last[j] = s;
    };
    for (size_t i = 0; i < seg; ++i)
        for (int j = 0; j < n_states; ++j) step(j);
    int j = n_states - 1;
    while (offsets[j] < ends[j]) step(j);
}

static void rans4x16_decode(const uint8_t *data, size_t size, int64_t out_len,
                            std::string &out) {
    Reader in{data, size};
    int flags = in.byte();
    uint64_t ulen;
    if (!(flags & F_NOSZ)) {
        ulen = in.uint7();
        if (out_len >= 0 && ulen != (uint64_t)out_len)
            throw std::runtime_error("rans4x16: size field mismatch");
    } else {
        if (out_len < 0)
            throw std::runtime_error("rans4x16: NOSZ without external size");
        ulen = (uint64_t)out_len;
    }

    if (flags & F_STRIPE) {
        int n = in.byte();
        std::vector<uint32_t> clens(n);
        for (int j = 0; j < n; ++j) clens[j] = in.uint7();
        out.resize(ulen);
        for (int j = 0; j < n; ++j) {
            uint64_t sub_len = (ulen - j + n - 1) / n;
            const uint8_t *payload = in.take(clens[j]);
            std::string sub;
            rans4x16_decode(payload, clens[j], (int64_t)sub_len, sub);
            for (uint64_t i = 0; i < sub_len; ++i)
                out[i * n + j] = sub[i];
        }
        return;
    }

    uint64_t cur_len = ulen;
    // PACK metadata
    bool do_pack = (flags & F_PACK) != 0;
    int pack_nsym = 0;
    uint8_t pack_map[16] = {0};
    if (do_pack) {
        pack_nsym = in.byte();
        if (pack_nsym > 16) throw std::runtime_error("PACK: >16 symbols");
        for (int i = 0; i < pack_nsym; ++i) pack_map[i] = in.byte();
        cur_len = in.uint7();
        if (cur_len > ulen)
            throw std::runtime_error("rans4x16: packed length exceeds size");
    }
    // RLE metadata
    bool do_rle = (flags & F_RLE) != 0;
    uint64_t rle_target = 0;
    std::string rle_meta_buf;
    uint8_t rle_flags[256] = {0};
    Reader rle_runs{nullptr, 0};
    if (do_rle) {
        rle_target = cur_len;
        uint32_t rle_meta_len = in.uint7();
        uint64_t lit_len = in.uint7();
        if (rle_meta_len & 1) {
            const uint8_t *meta = in.take(rle_meta_len >> 1);
            rle_meta_buf.assign((const char *)meta, rle_meta_len >> 1);
        } else {
            // raw order-0 4-state body, like the compressed O1 table
            uint32_t comp_len = in.uint7();
            const uint8_t *payload = in.take(comp_len);
            Reader meta_body{payload, comp_len};
            rle_meta_buf.resize(rle_meta_len >> 1);
            rans_nx16_o0(meta_body, rle_meta_len >> 1, 4, rle_meta_buf, 0);
        }
        Reader meta{(const uint8_t *)rle_meta_buf.data(), rle_meta_buf.size()};
        int n = meta.byte();
        if (n == 0) n = 256;
        for (int i = 0; i < n; ++i) rle_flags[meta.byte()] = 1;
        rle_runs = meta;  // remaining bytes = the run-length varints
        if (lit_len > rle_target)
            throw std::runtime_error("rans4x16: literal length exceeds size");
        cur_len = lit_len;
    }

    std::string payload;
    payload.resize(cur_len);
    if (cur_len == 0) {
        // nothing to decode
    } else if (flags & F_CAT) {
        const uint8_t *p = in.take(cur_len);
        memcpy(&payload[0], p, cur_len);
    } else if (flags & F_ORDER1) {
        rans_nx16_o1(in, cur_len, (flags & F_X32) ? 32 : 4, payload, 0);
    } else {
        rans_nx16_o0(in, cur_len, (flags & F_X32) ? 32 : 4, payload, 0);
    }

    if (do_rle) {
        std::string expanded;
        expanded.resize(rle_target);
        size_t j = 0;
        for (size_t i = 0; i < payload.size(); ++i) {
            uint8_t b = (uint8_t)payload[i];
            if (j >= rle_target) throw std::runtime_error("RLE overflow");
            expanded[j++] = (char)b;
            if (rle_flags[b]) {
                uint32_t run = rle_runs.uint7();
                if (j + run > rle_target)
                    throw std::runtime_error("RLE overflow");
                memset(&expanded[j], b, run);
                j += run;
            }
        }
        if (j != rle_target) throw std::runtime_error("RLE size mismatch");
        payload.swap(expanded);
    }
    if (do_pack) {
        std::string unpacked;
        unpacked.resize(ulen);
        const uint8_t *p = (const uint8_t *)payload.data();
        size_t need = pack_nsym <= 1 ? 0
                      : pack_nsym <= 2 ? (ulen + 7) / 8
                      : pack_nsym <= 4 ? (ulen + 3) / 4
                                       : (ulen + 1) / 2;
        if (payload.size() < need)
            throw std::runtime_error("PACK: packed stream too short");
        if (pack_nsym <= 1) {
            memset(&unpacked[0], pack_nsym ? pack_map[0] : 0, ulen);
        } else if (pack_nsym <= 2) {
            for (uint64_t i = 0; i < ulen; ++i)
                unpacked[i] = (char)pack_map[(p[i >> 3] >> (i & 7)) & 1];
        } else if (pack_nsym <= 4) {
            for (uint64_t i = 0; i < ulen; ++i)
                unpacked[i] = (char)pack_map[(p[i >> 2] >> ((i & 3) << 1)) & 3];
        } else {
            for (uint64_t i = 0; i < ulen; ++i)
                unpacked[i] = (char)pack_map[(p[i >> 1] >> ((i & 1) << 2)) & 15];
        }
        payload.swap(unpacked);
    }
    if (payload.size() != ulen)
        throw std::runtime_error("rans4x16: output size mismatch");
    out.swap(payload);
}

}  // namespace cram_codecs

/* ---- Python bindings ----------------------------------------------------- */

PyObject *codec_rans4x8(PyObject *, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    std::string out;
    try {
        cram_codecs::rans4x8_decode((const uint8_t *)buf.buf,
                                    (size_t)buf.len, out);
    } catch (const std::exception &error) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, error.what());
        return nullptr;
    }
    PyBuffer_Release(&buf);
    return PyBytes_FromStringAndSize(out.data(), (Py_ssize_t)out.size());
}

PyObject *codec_rans4x16(PyObject *, PyObject *args) {
    Py_buffer buf;
    long long out_len = -1;
    if (!PyArg_ParseTuple(args, "y*|L", &buf, &out_len)) return nullptr;
    std::string out;
    try {
        cram_codecs::rans4x16_decode((const uint8_t *)buf.buf,
                                     (size_t)buf.len, (int64_t)out_len, out);
    } catch (const std::exception &error) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, error.what());
        return nullptr;
    }
    PyBuffer_Release(&buf);
    return PyBytes_FromStringAndSize(out.data(), (Py_ssize_t)out.size());
}
