/* Minimal BGZF API over zlib's gzFile — enough for arriba's
 * read_compressed_file.cpp (open / read whole file / close).
 * gzread transparently handles both gzip/BGZF and plain files. */
#ifndef SHIM_BGZF_H
#define SHIM_BGZF_H

#include <zlib.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct BGZF_shim {
    gzFile gz;
} BGZF;

BGZF *bgzf_open(const char *path, const char *mode);
long bgzf_read(BGZF *fp, void *data, size_t length);
int bgzf_close(BGZF *fp);

#ifdef __cplusplus
}
#endif

#endif /* SHIM_BGZF_H */
