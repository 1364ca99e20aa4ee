/* Implementation of the minimal htslib-compatible SAM/BGZF API (see sam.h).
 * Parses plain or gzip-compressed SAM text into BAM-layout bam1_t records
 * so all of arriba's accessor macros work unchanged. */

#include "sam.h"
#include "bgzf.h"
#include "cram.h"

#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

static int8_t nt16_table[256];
static bool nt16_table_ready = false;

static void init_nt16_table() {
    if (nt16_table_ready) return;
    for (int i = 0; i < 256; ++i) nt16_table[i] = 15;  /* N */
    const char *codes = seq_nt16_str;
    for (int i = 0; codes[i]; ++i) {
        nt16_table[(unsigned char)codes[i]] = i;
        nt16_table[(unsigned char)tolower(codes[i])] = i;
    }
    nt16_table_ready = true;
}

extern "C" samFile *sam_open(const char *path, const char *mode) {
    (void)mode;
    gzFile gz = gzopen(path, "rb");
    if (gz == NULL) return NULL;
    samFile *fp = new samFile();
    fp->gz = gz;
    fp->is_cram = 0;
    /* binary BAM: BGZF is gzip, so gzread sees the decompressed stream */
    fp->is_bam = 0;
    char magic[4];
    int magic_got = gzread(gz, magic, 4);
    if (magic_got == 4 && memcmp(magic, "BAM\1", 4) == 0)
        fp->is_bam = 1;
    else
        gzrewind(gz);
    fp->is_write = 0;
    fp->fp.voidp = NULL;
    fp->line_buf = NULL;
    fp->line_cap = 0;
    fp->header = NULL;
    return fp;
}

extern "C" int sam_close(samFile *fp) {
    if (fp == NULL) return -1;
    gzclose(fp->gz);
    free(fp->line_buf);
    delete fp;
    return 0;
}

extern "C" int hts_set_threads(samFile *fp, int n) { (void)fp; (void)n; return 0; }

extern "C" int cram_set_option(cram_fd *fd, enum cram_option opt, ...) {
    (void)fd; (void)opt; return 0;
}

/* read one line (without newline); returns length or -1 on EOF */
static long read_line(samFile *fp) {
    size_t used = 0;
    if (fp->line_cap == 0) {
        fp->line_cap = 65536;
        fp->line_buf = (char *)malloc(fp->line_cap);
    }
    for (;;) {
        int c = gzgetc(fp->gz);
        if (c < 0) {
            if (used == 0) return -1;
            break;
        }
        if (c == '\n') break;
        if (used + 2 > fp->line_cap) {
            fp->line_cap *= 2;
            fp->line_buf = (char *)realloc(fp->line_buf, fp->line_cap);
        }
        fp->line_buf[used++] = (char)c;
    }
    if (used > 0 && fp->line_buf[used - 1] == '\r') used--;
    fp->line_buf[used] = '\0';
    return (long)used;
}

extern "C" bam_hdr_t *sam_hdr_read(samFile *fp) {
    std::vector<std::string> names;
    std::vector<uint32_t> lengths;
    std::string text;

    if (fp->is_bam) {
        int32_t l_text = 0;
        if (gzread(fp->gz, &l_text, 4) != 4 || l_text < 0) return NULL;
        text.resize((size_t)l_text);
        if (l_text > 0 && gzread(fp->gz, &text[0], l_text) != l_text)
            return NULL;
        text.resize(strlen(text.c_str()));  /* NUL-padded in some writers */
        int32_t n_ref = 0;
        if (gzread(fp->gz, &n_ref, 4) != 4 || n_ref < 0) return NULL;
        for (int32_t i = 0; i < n_ref; ++i) {
            int32_t l_name = 0, l_ref = 0;
            if (gzread(fp->gz, &l_name, 4) != 4 || l_name <= 0) return NULL;
            std::string name((size_t)l_name, '\0');
            if (gzread(fp->gz, &name[0], l_name) != l_name) return NULL;
            name.resize(strlen(name.c_str()));
            if (gzread(fp->gz, &l_ref, 4) != 4) return NULL;
            names.push_back(name);
            lengths.push_back((uint32_t)l_ref);
        }
        bam_hdr_t *header = (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
        header->n_targets = (int32_t)names.size();
        header->target_name = (char **)malloc(sizeof(char *) * names.size());
        header->target_len = (uint32_t *)malloc(sizeof(uint32_t)
                                                * names.size());
        for (size_t i = 0; i < names.size(); ++i) {
            header->target_name[i] = strdup(names[i].c_str());
            header->target_len[i] = lengths[i];
        }
        header->text = strdup(text.c_str());
        fp->header = header;
        return header;
    }

    /* header lines start with '@'; stop before the first record by peeking */
    for (;;) {
        int c = gzgetc(fp->gz);
        if (c < 0) break;
        if (c != '@') { gzungetc(c, fp->gz); break; }
        gzungetc(c, fp->gz);
        long len = read_line(fp);
        if (len < 0) break;
        text.append(fp->line_buf, len);
        text.push_back('\n');
        if (strncmp(fp->line_buf, "@SQ", 3) == 0) {
            std::string name;
            uint32_t length = 0;
            char *token = strtok(fp->line_buf + 3, "\t");
            while (token != NULL) {
                if (strncmp(token, "SN:", 3) == 0) name = token + 3;
                else if (strncmp(token, "LN:", 3) == 0) length = strtoul(token + 3, NULL, 10);
                token = strtok(NULL, "\t");
            }
            if (!name.empty()) {
                names.push_back(name);
                lengths.push_back(length);
            }
        }
    }

    bam_hdr_t *header = (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
    header->n_targets = (int32_t)names.size();
    header->target_name = (char **)malloc(sizeof(char *) * names.size());
    header->target_len = (uint32_t *)malloc(sizeof(uint32_t) * names.size());
    for (size_t i = 0; i < names.size(); ++i) {
        header->target_name[i] = strdup(names[i].c_str());
        header->target_len[i] = lengths[i];
    }
    header->text = strdup(text.c_str());
    fp->header = header;
    return header;
}

extern "C" void bam_hdr_destroy(bam_hdr_t *header) {
    if (header == NULL) return;
    for (int i = 0; i < header->n_targets; ++i) free(header->target_name[i]);
    free(header->target_name);
    free(header->target_len);
    free(header->text);
    free(header);
}

extern "C" bam1_t *bam_init1(void) {
    return (bam1_t *)calloc(1, sizeof(bam1_t));
}

extern "C" void bam_destroy1(bam1_t *record) {
    if (record == NULL) return;
    free(record->data);
    free(record);
}

static int tid_of(bam_hdr_t *header, const char *name) {
    if (strcmp(name, "*") == 0) return -1;
    for (int i = 0; i < header->n_targets; ++i)
        if (strcmp(header->target_name[i], name) == 0) return i;
    return -1;
}

static void ensure_data(bam1_t *b, size_t needed) {
    if (b->m_data < needed) {
        b->m_data = (uint32_t)(needed + 32);
        b->data = (uint8_t *)realloc(b->data, b->m_data);
    }
}

extern "C" int sam_read1(samFile *fp, bam_hdr_t *header, bam1_t *b) {
    init_nt16_table();
    if (fp->is_bam) {
        int32_t block_size = 0;
        int got = gzread(fp->gz, &block_size, 4);
        if (got != 4 || block_size < 32) return -1;  /* EOF / EOF block */
        uint8_t fixed[32];
        if (gzread(fp->gz, fixed, 32) != 32) return -2;
        int32_t refID, pos_i, l_seq, next_refID, next_pos, tlen;
        memcpy(&refID, fixed + 0, 4);
        memcpy(&pos_i, fixed + 4, 4);
        uint8_t l_read_name = fixed[8];
        uint8_t mapq = fixed[9];
        uint16_t bin, n_cigar_op, flag;
        memcpy(&bin, fixed + 10, 2);
        memcpy(&n_cigar_op, fixed + 12, 2);
        memcpy(&flag, fixed + 14, 2);
        memcpy(&l_seq, fixed + 16, 4);
        memcpy(&next_refID, fixed + 20, 4);
        memcpy(&next_pos, fixed + 24, 4);
        memcpy(&tlen, fixed + 28, 4);
        int l_data = block_size - 32;
        ensure_data(b, (size_t)l_data + 1);
        if (l_data > 0 && gzread(fp->gz, b->data, l_data) != l_data)
            return -2;
        b->l_data = l_data;
        b->core.tid = refID;
        b->core.pos = pos_i;
        b->core.bin = bin;
        b->core.qual = mapq;
        b->core.l_extranul = 0;
        b->core.flag = flag;
        b->core.l_qname = l_read_name;  /* includes the NUL, no padding */
        b->core.n_cigar = n_cigar_op;
        b->core.l_qseq = l_seq;
        b->core.mtid = next_refID;
        b->core.mpos = next_pos;
        b->core.isize = tlen;
        return l_data;
    }
    long len = read_line(fp);
    if (len < 0) return -1;           /* EOF */
    if (len == 0) return sam_read1(fp, header, b);
    if (fp->line_buf[0] == '@') return sam_read1(fp, header, b);

    /* split into fields */
    std::vector<char *> fields;
    char *saveptr = NULL;
    for (char *token = strtok_r(fp->line_buf, "\t", &saveptr); token != NULL;
         token = strtok_r(NULL, "\t", &saveptr))
        fields.push_back(token);
    if (fields.size() < 11) return -2;

    const char *qname = fields[0];
    uint16_t flag = (uint16_t)strtoul(fields[1], NULL, 10);
    int tid = tid_of(header, fields[2]);
    int64_t pos = strtoll(fields[3], NULL, 10) - 1;
    uint8_t mapq = (uint8_t)strtoul(fields[4], NULL, 10);
    const char *cigar_str = fields[5];
    const char *rnext = fields[6];
    int64_t pnext = strtoll(fields[7], NULL, 10) - 1;
    int64_t tlen = strtoll(fields[8], NULL, 10);
    const char *seq = fields[9];

    /* parse CIGAR */
    std::vector<uint32_t> cigar;
    if (strcmp(cigar_str, "*") != 0) {
        uint32_t oplen = 0;
        for (const char *p = cigar_str; *p; ++p) {
            if (*p >= '0' && *p <= '9') {
                oplen = oplen * 10 + (*p - '0');
            } else {
                const char *op_pos = strchr(BAM_CIGAR_STR, *p);
                if (op_pos == NULL) return -2;
                cigar.push_back(bam_cigar_gen(oplen, (uint32_t)(op_pos - BAM_CIGAR_STR)));
                oplen = 0;
            }
        }
    }

    int32_t l_qseq = (strcmp(seq, "*") == 0) ? 0 : (int32_t)strlen(seq);
    uint16_t l_qname = (uint16_t)(strlen(qname) + 1);

    /* aux: parse TAG:TYPE:VALUE fields into BAM aux format */
    std::string aux;
    for (size_t i = 11; i < fields.size(); ++i) {
        const char *field = fields[i];
        if (strlen(field) < 5 || field[2] != ':' || field[4] != ':') continue;
        char type = field[3];
        aux.push_back(field[0]);
        aux.push_back(field[1]);
        if (type == 'i') {
            int32_t value = (int32_t)strtol(field + 5, NULL, 10);
            aux.push_back('i');
            aux.append((const char *)&value, 4);
        } else if (type == 'A') {
            aux.push_back('A');
            aux.push_back(field[5]);
        } else if (type == 'f') {
            float value = strtof(field + 5, NULL);
            aux.push_back('f');
            aux.append((const char *)&value, 4);
        } else {  /* Z, H and everything else as NUL-terminated string */
            aux.push_back('Z');
            aux.append(field + 5);
            aux.push_back('\0');
        }
    }

    size_t data_len = l_qname + 4 * cigar.size() + (l_qseq + 1) / 2 + l_qseq + aux.size();
    ensure_data(b, data_len);

    b->core.tid = tid;
    b->core.pos = pos;
    b->core.qual = mapq;
    b->core.l_extranul = 0;
    b->core.flag = flag;
    b->core.l_qname = l_qname;
    b->core.n_cigar = (uint32_t)cigar.size();
    b->core.l_qseq = l_qseq;
    b->core.mtid = (strcmp(rnext, "=") == 0) ? tid : tid_of(header, rnext);
    b->core.mpos = pnext;
    b->core.isize = tlen;
    b->l_data = (int)data_len;

    uint8_t *out = b->data;
    memcpy(out, qname, l_qname);
    out += l_qname;
    memcpy(out, cigar.data(), 4 * cigar.size());
    out += 4 * cigar.size();
    memset(out, 0, (l_qseq + 1) / 2);
    for (int32_t i = 0; i < l_qseq; ++i)
        out[i >> 1] |= (uint8_t)(nt16_table[(unsigned char)seq[i]] << ((~i & 1) << 2));
    out += (l_qseq + 1) / 2;
    memset(out, 0xff, l_qseq);  /* qual: 0xff means missing */
    out += l_qseq;
    memcpy(out, aux.data(), aux.size());
    return 0;
}

extern "C" uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    uint8_t *aux = bam_get_aux((bam1_t *)b);
    uint8_t *end = b->data + b->l_data;
    while (aux + 3 <= end) {
        uint8_t type = aux[2];
        uint8_t *value = aux + 2;
        if (aux[0] == tag[0] && aux[1] == tag[1]) return value;
        aux += 3;
        switch (type) {
            case 'A': case 'c': case 'C': aux += 1; break;
            case 's': case 'S': aux += 2; break;
            case 'i': case 'I': case 'f': aux += 4; break;
            case 'd': aux += 8; break;
            case 'Z': case 'H':
                while (aux < end && *aux) ++aux;
                ++aux;
                break;
            default: return NULL;  /* unsupported (B arrays unused here) */
        }
    }
    return NULL;
}

extern "C" int64_t bam_aux2i(const uint8_t *value) {
    switch (*value) {
        case 'c': return *(const int8_t *)(value + 1);
        case 'C': return *(const uint8_t *)(value + 1);
        case 's': { int16_t v; memcpy(&v, value + 1, 2); return v; }
        case 'S': { uint16_t v; memcpy(&v, value + 1, 2); return v; }
        case 'i': { int32_t v; memcpy(&v, value + 1, 4); return v; }
        case 'I': { uint32_t v; memcpy(&v, value + 1, 4); return v; }
        default: return 0;
    }
}

extern "C" int64_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar) {
    int64_t length = 0;
    for (int i = 0; i < n_cigar; ++i)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 1) length += bam_cigar_oplen(cigar[i]);
    return length;
}

extern "C" int64_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar) {
    int64_t length = 0;
    for (int i = 0; i < n_cigar; ++i)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 2) length += bam_cigar_oplen(cigar[i]);
    return length;
}

extern "C" int64_t bam_endpos(const bam1_t *b) {
    if (b->core.n_cigar == 0) return b->core.pos + 1;
    return b->core.pos + bam_cigar2rlen((int)b->core.n_cigar, bam_get_cigar(b));
}

extern "C" BGZF *bgzf_open(const char *path, const char *mode) {
    (void)mode;
    gzFile gz = gzopen(path, "rb");
    if (gz == NULL) return NULL;
    BGZF *fp = new BGZF();
    fp->gz = gz;
    return fp;
}

extern "C" long bgzf_read(BGZF *fp, void *data, size_t length) {
    return gzread(fp->gz, data, (unsigned)length);
}

extern "C" int bgzf_close(BGZF *fp) {
    if (fp == NULL) return -1;
    gzclose(fp->gz);
    delete fp;
    return 0;
}
