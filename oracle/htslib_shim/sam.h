/* Minimal htslib-compatible SAM API, sufficient to build the reference
 * arriba binary as a test oracle in a zero-egress environment (the real
 * htslib cannot be downloaded). Only the subset of the public htslib API
 * that arriba uses is provided; input is plain or gzip-compressed SAM text.
 *
 * This is a clean-room implementation of the public htslib interface
 * (names/macros as documented), not htslib code. */
#ifndef SHIM_SAM_H
#define SHIM_SAM_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- flags ---- */
#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

/* ---- CIGAR ---- */
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9

#define BAM_CIGAR_STR   "MIDNSHP=XB"
#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK  0xf
#define BAM_CIGAR_TYPE  0x3C1A7

#define bam_cigar_op(c) ((c) & BAM_CIGAR_MASK)
#define bam_cigar_oplen(c) ((c) >> BAM_CIGAR_SHIFT)
#define bam_cigar_opchr(c) (BAM_CIGAR_STR "??????" [bam_cigar_op(c)])
#define bam_cigar_gen(l, o) ((uint32_t)(l) << BAM_CIGAR_SHIFT | (o))
#define bam_cigar_type(o) (BAM_CIGAR_TYPE >> ((o) << 1) & 3)

extern const char seq_nt16_str[];

typedef struct {
    int32_t tid;
    int64_t pos;        /* hts_pos_t */
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul;
    uint16_t flag;
    uint16_t l_qname;   /* length of qname incl. NUL and padding */
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int64_t mpos;
    int64_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    uint64_t id;
    uint8_t *data;
    int l_data;
    uint32_t m_data;
} bam1_t;

#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname)
#define bam_get_qual(b)  ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1))
#define bam_get_aux(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1) + (b)->core.l_qseq)
#define bam_get_l_aux(b) ((b)->l_data - ((b)->core.n_cigar<<2) - (b)->core.l_qname - (b)->core.l_qseq - (((b)->core.l_qseq + 1)>>1))
#define bam_seqi(s, i)   ((s)[(i)>>1] >> ((~(i)&1)<<2) & 0xf)

typedef struct {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
    char *text;
} bam_hdr_t;
typedef bam_hdr_t sam_hdr_t;

struct shim_cram_fd;  /* opaque; arriba only passes it to cram_set_option */

typedef struct samFile_shim {
    gzFile gz;
    int is_cram;
    int is_bam;
    int is_write;
    union { struct shim_cram_fd *cram; void *voidp; } fp;
    char *line_buf;
    size_t line_cap;
    /* name -> tid lookup built by sam_hdr_read */
    bam_hdr_t *header;
} samFile;
typedef samFile htsFile;

samFile *sam_open(const char *path, const char *mode);
int sam_close(samFile *fp);
bam_hdr_t *sam_hdr_read(samFile *fp);
void bam_hdr_destroy(bam_hdr_t *header);
int sam_read1(samFile *fp, bam_hdr_t *header, bam1_t *record);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *record);
int hts_set_threads(samFile *fp, int n);

uint8_t *bam_aux_get(const bam1_t *record, const char tag[2]);
int64_t bam_aux2i(const uint8_t *value);

int64_t bam_endpos(const bam1_t *record);
int64_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar);
int64_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar);

#ifdef __cplusplus
}
#endif

#endif /* SHIM_SAM_H */
