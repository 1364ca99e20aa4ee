/* CRAM stub: arriba only calls cram_set_option when the input is CRAM,
 * which the shim never reports (is_cram == 0). */
#ifndef SHIM_CRAM_H
#define SHIM_CRAM_H

#ifdef __cplusplus
extern "C" {
#endif

enum cram_option { CRAM_OPT_REFERENCE };
struct shim_cram_fd;
typedef struct shim_cram_fd cram_fd;

int cram_set_option(cram_fd *fd, enum cram_option opt, ...);

#ifdef __cplusplus
}
#endif

#endif /* SHIM_CRAM_H */
