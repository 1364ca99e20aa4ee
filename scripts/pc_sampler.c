/* Tiny SIGPROF program-counter sampler for profiling the native extension
 * in-process (this image ships no perf/gdb). Loaded via ctypes by
 * scripts/profile_native.py: start() arms an ITIMER_PROF tick that records
 * the interrupted RIP of whichever thread is running; stop() disarms and
 * hands the PC buffer back for symbolization against /proc/self/maps +
 * addr2line. Dev tool only — not part of the shipped library. */
#define _GNU_SOURCE
#include <signal.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>
#include <sys/uio.h>
#include <sys/syscall.h>
#include <unistd.h>
#include <ucontext.h>

static uint64_t *g_buf = 0;
static volatile size_t g_n = 0;
static size_t g_cap = 0;

/* with -fno-omit-frame-pointer builds, also record the return address of
 * the current frame (RBP chain, one level) so leaf libc time attributes to
 * its caller; packed as pairs when caller capture is on */
static int g_pairs = 0;

static void handler(int sig, siginfo_t *si, void *uc_) {
    (void)sig; (void)si;
    ucontext_t *uc = (ucontext_t *)uc_;
    if (!g_pairs) {
        size_t i = __sync_fetch_and_add(&g_n, 1);
        if (i < g_cap)
            g_buf[i] = (uint64_t)uc->uc_mcontext.gregs[REG_RIP];
        return;
    }
    size_t i = __sync_fetch_and_add(&g_n, 2);
    if (i + 1 < g_cap) {
        g_buf[i] = (uint64_t)uc->uc_mcontext.gregs[REG_RIP];
        uint64_t rbp = (uint64_t)uc->uc_mcontext.gregs[REG_RBP];
        uint64_t ret = 0;
        if (rbp > 0x1000 && rbp < (uint64_t)1 << 47) {
            /* fault-safe self-read: process_vm_readv returns EFAULT
             * instead of delivering SIGSEGV inside the handler */
            struct iovec local = {&ret, 8};
            struct iovec remote = {(void *)(rbp + 8), 8};
            if (syscall(SYS_process_vm_readv, getpid(), &local, 1, &remote,
                        1, 0) != 8)
                ret = 0;
        }
        g_buf[i + 1] = ret;
    }
}

int sampler_start_pairs(int hz, size_t max_samples);

int sampler_start(int hz, size_t max_samples) {
    free(g_buf);
    g_buf = (uint64_t *)calloc(max_samples, sizeof(uint64_t));
    if (!g_buf) return -1;
    g_cap = max_samples;
    g_n = 0;
    struct sigaction sa;
    memset(&sa, 0, sizeof(sa));
    sa.sa_sigaction = handler;
    sa.sa_flags = SA_SIGINFO | SA_RESTART;
    if (sigaction(SIGPROF, &sa, 0) != 0) return -1;
    struct itimerval it;
    it.it_interval.tv_sec = 0;
    it.it_interval.tv_usec = 1000000 / hz;
    it.it_value = it.it_interval;
    return setitimer(ITIMER_PROF, &it, 0);
}

int sampler_start_pairs(int hz, size_t max_samples) {
    g_pairs = 1;
    return sampler_start(hz, max_samples);
}

size_t sampler_stop(uint64_t *out, size_t max) {
    struct itimerval it;
    memset(&it, 0, sizeof(it));
    setitimer(ITIMER_PROF, &it, 0);
    signal(SIGPROF, SIG_IGN);
    size_t n = g_n < g_cap ? g_n : g_cap;
    if (n > max) n = max;
    if (out) memcpy(out, g_buf, n * sizeof(uint64_t));
    return n;
}
